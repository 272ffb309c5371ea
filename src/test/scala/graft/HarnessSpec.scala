package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{Args, GraftJob, Tool}
import graft.ml.Similarity
import graft.testing.JobTest

/** Job/Tool reflective harness, JobTest facade, IVF ANN. */

/** A tiny job counting rows of an in-memory range — used by the Tool
  * reflection test (must be a top-level class for Class.forName).
  */
class CountJob(args: Args) extends GraftJob(args) {
  def run(spark: SparkSession): Unit = {
    val n = spark.range(args.int("n").toLong).count()
    CountJob.observed = CountJob.observed :+ n
  }
  override def next: Option[GraftJob] =
    if (args.boolean("chain") && CountJob.observed.size < 2)
      Some(new CountJob(args))
    else None
}
object CountJob {
  @volatile var observed: Seq[Long] = Nil
}

/** Cascade members recording execution order (top-level for clarity). */
class StepJob(args: Args, tagged: String) extends GraftJob(args) {
  def run(spark: SparkSession): Unit = { StepJob.trace = StepJob.trace :+ tagged }
}
object StepJob {
  @volatile var trace: Seq[String] = Nil
}

class HarnessSpec extends SparkSpec {

  test("CascadeJob runs members in declared-dependency topological order") {
    import graft.core.CascadeJob
    StepJob.trace = Nil
    val a = Args("")
    // declared out of order: C listed first but depends on A and B
    val cascade = new CascadeJob(a) {
      val jobs = Seq(new StepJob(a, "C"), new StepJob(a, "A"), new StepJob(a, "B"))
      override def dependencies = Seq((1, 2), (2, 0)) // A -> B -> C
    }
    cascade.run(spark)
    assert(StepJob.trace == Seq("A", "B", "C"), s"order: ${StepJob.trace}")
    // a cycle must be rejected loudly, not silently dropped
    val cyclic = new CascadeJob(a) {
      val jobs = Seq(new StepJob(a, "X"), new StepJob(a, "Y"))
      override def dependencies = Seq((0, 1), (1, 0))
    }
    intercept[IllegalArgumentException] { cyclic.run(spark) }
  }

  test("Tool instantiates jobs by reflection and follows next") {
    CountJob.observed = Nil
    Tool.run("graft.CountJob", Args("--n 5 --chain"), spark)
    assert(CountJob.observed == Seq(5L, 5L))
  }

  test("JobTest harness: mocked sources in, asserted sink out") {
    import spark.implicits._
    JobTest(spark)
      .source("events", Seq((1L, "click"), (2L, "view"), (3L, "click")))
      .run { (_, src) => src("events").groupBy("_2").count().orderBy("_2") }
      .sink { rows =>
        assert(rows.map(r => (r.getString(0), r.getLong(1))) ==
          Seq(("click", 2L), ("view", 1L)))
      }
  }

  test("IVF ANN recalls neighbors on clustered vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(4)(Array.fill(16)(rnd.nextGaussian()))
    val vecs = (0 until 120).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.05).toFloat))
    }
    val df = vecs.toDF("id", "vec")
    val queries = df.filter(col("id") < 4)
    val exact = Similarity.bruteForceTopK(queries, df, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(queries, df, k = 5, nCentroids = 8, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
    // the int8-list variant probes the same centroid structure; the
    // only extra error is the ≤0.03 quantized-cosine wobble, so its
    // recall must stay in the same band
    val ivfQ = Similarity.ivfTopKQuantized(queries, df, k = 5,
      nCentroids = 8, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recallQ = (exact & ivfQ).size.toDouble / exact.size
    assert(recallQ >= 0.5, s"quantized IVF recall too low: $recallQ (float: $recall)")
  }
}
