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

/** Multi-flow orchestration — rebuild of the reference's `CascadeJob`
  * (CascadeJob.scala:6-36), which ran several flows with Cascading's
  * topology solver inferring order from shared source/sink taps. Here
  * the dependency DAG is DECLARED (explicit (before, after) index
  * pairs into `jobs`) and the cascade runs members in topological
  * order — deterministic, no path inference; within one SparkSession
  * each member's stages still schedule in parallel where independent.
  * Each member's own `next` chain is honored before its dependents
  * start (the reference ran flows to completion the same way).
  */
abstract class CascadeJob(args: Args) extends GraftJob(args) {

  /** Member jobs of the cascade. */
  def jobs: Seq[GraftJob]

  /** DAG edges (beforeIdx, afterIdx); default = listed order. */
  def dependencies: Seq[(Int, Int)] =
    jobs.indices.dropRight(1).map(i => (i, i + 1))

  final def run(spark: SparkSession): Unit = {
    val n = jobs.size
    val deps = dependencies
    deps.foreach { case (a, b) =>
      require(a >= 0 && a < n && b >= 0 && b < n, s"bad edge ($a,$b)") }
    val indeg = Array.fill(n)(0)
    deps.foreach { case (_, b) => indeg(b) += 1 }
    val order = scala.collection.mutable.ArrayBuffer.empty[Int]
    val ready = scala.collection.mutable.Queue(
      jobs.indices.filter(indeg(_) == 0): _*)
    while (ready.nonEmpty) {
      val i = ready.dequeue()
      order += i
      deps.foreach { case (a, b) =>
        if (a == i) { indeg(b) -= 1; if (indeg(b) == 0) ready.enqueue(b) }
      }
    }
    require(order.size == n,
      s"cascade dependency cycle among jobs ${jobs.indices.toSet -- order.toSet}")
    order.foreach { i =>
      var j = Option(jobs(i))
      while (j.isDefined) { j.get.run(spark); j = j.get.next }
    }
  }
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

  /** Runs the job chain; a failure is re-thrown AFTER printing the
    * [[RichXHandler]] GUESS line (reference Tool.scala's XHandler
    * application), so logs lead with something actionable.
    */
  def run(jobClass: String, args: Args, spark: SparkSession): Unit =
    try {
      var job = Option(newJob(jobClass, args))
      while (job.isDefined) {
        job.get.run(spark)
        job = job.get.next
      }
    } catch {
      case t: Throwable =>
        System.err.println(s"[tool] ${RichXHandler().messageFor(t)}")
        throw t
    }

  private def newJob(className: String, args: Args): GraftJob =
    Class.forName(className)
      .getConstructor(classOf[Args])
      .newInstance(args)
      .asInstanceOf[GraftJob]
}
