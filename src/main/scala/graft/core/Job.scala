package graft.core

import org.apache.spark.sql.SparkSession

/** Job harness — rebuild of the reference's `Job`/`Tool` entry model
  * (Job.scala:33-189, Tool.scala:46-133): a job class is instantiated
  * by reflection from a CLI class-name argument with parsed `Args`,
  * builds its (lazy) dataflow, and `run` executes it. The Cascading
  * FlowDef becomes plain lazy DataFrames; `next` keeps the reference's
  * iterate-until-convergence protocol (Job.scala:92,
  * examples/PageRank.scala:54-81).
  */
abstract class GraftJob(val args: Args) {

  /** Execute the job's actions (writes/collects). Lazy DataFrame
    * construction belongs in constructors, actions here.
    */
  def run(spark: SparkSession): Unit

  /** Optional follow-up job for driver-side iteration; return None to
    * stop (reference Job.next).
    */
  def next: Option[GraftJob] = None
}

object Tool {

  /** `Tool.main(Array("com.foo.MyJob", "--input", ...))`: reflectively
    * instantiate the job (constructor taking Args), run it and any
    * `next` successors.
    */
  def main(argv: Array[String]): Unit = {
    require(argv.nonEmpty, "usage: Tool <jobClass> [--args ...]")
    val spark = GraftSession.local()
    try run(argv(0), Args(argv.drop(1).toSeq), spark)
    finally spark.stop()
  }

  def run(jobClass: String, args: Args, spark: SparkSession): Unit = {
    var job = Option(newJob(jobClass, args))
    while (job.isDefined) {
      job.get.run(spark)
      job = job.get.next
    }
  }

  private def newJob(className: String, args: Args): GraftJob =
    Class.forName(className)
      .getConstructor(classOf[Args])
      .newInstance(args)
      .asInstanceOf[GraftJob]
}
