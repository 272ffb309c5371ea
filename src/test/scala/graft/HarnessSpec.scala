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

/** Planted failure for the XHandler message test (top-level for
  * Class.forName).
  */
class MissingSourceJob(args: Args) extends GraftJob(args) {
  def run(spark: SparkSession): Unit =
    spark.read.parquet("/no/such/graft/path-harness-spec").count()
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

  test("Tool failures lead with the RichXHandler GUESS line, then " +
      "rethrow (reference XHandler at the tool boundary)") {
    import graft.core.RichXHandler
    val bos = new java.io.ByteArrayOutputStream()
    val orig = System.err
    System.setErr(new java.io.PrintStream(bos, true))
    val thrown =
      try intercept[Throwable] {
        Tool.run("graft.MissingSourceJob", Args(""), spark)
      } finally System.setErr(orig)
    assert(thrown.isInstanceOf[org.apache.spark.sql.AnalysisException])
    assert(bos.toString.contains("[tool] " + RichXHandler.UnresolvedPlan),
      s"no GUESS line on stderr: ${bos.toString.take(400)}")
    assert(RichXHandler().messageFor(thrown) == RichXHandler.UnresolvedPlan)
    assert(RichXHandler().messageFor(new NoSuchMethodError("m")) ==
      RichXHandler.BinaryProblem)
    assert(RichXHandler().messageFor(new RuntimeException(
      new java.io.FileNotFoundException("f"))) ==
      RichXHandler.DataIsMissing) // cause-chain walk
    assert(RichXHandler().messageFor(new IllegalStateException("x")) ==
      RichXHandler.Default)
    // reference-shape surface: handlers are class-equality predicates
    val h = RichXHandler()
    assert(h.handlers.exists(_(new NoSuchMethodError("m"))))
    assert(h.mapping(classOf[NoClassDefFoundError]) ==
      RichXHandler.BinaryProblem)
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

  test("JobTest.runBoth executes in broadcast AND exchange mode, demands agreement") {
    import spark.implicits._
    // a join + aggregate flow: broadcast-joined in normal mode,
    // sort-merge-joined with AQE off and broadcast disabled — results
    // must agree
    val jt = JobTest(spark)
      .source("facts", (1L to 200L).map(i => (i, i % 7)))
      .source("dim", Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"),
        (4L, "e"), (5L, "f"), (6L, "g")))
    jt.runBoth { (_, src) =>
        src("facts").join(src("dim"),
            src("facts")("_2") === src("dim")("_1"))
          .groupBy(src("dim")("_2")).count().orderBy("count", "_2")
      }
      .sink { rows =>
        assert(rows.size == 7)
        assert(rows.map(_.getLong(1)).sum == 200L)
      }
    // the exchange-mode conf tweaks must not leak into the session
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    // a flow whose two modes DISAGREE must fail loudly: a plan that
    // leaks the physical partition layout differs between AQE
    // (post-shuffle coalescing) and exchange mode (raw 32 shuffle
    // partitions)
    val bad = intercept[AssertionError] {
      jt.runBoth { (_, src) =>
        src("facts").groupBy("_2").count()
          .select(org.apache.spark.sql.functions.spark_partition_id()
            .as("pid"))
          .distinct()
      }
    }
    assert(bad.getMessage.contains("disagree"))
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
