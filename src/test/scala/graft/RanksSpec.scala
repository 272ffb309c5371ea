package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Ranks

/** The distributed order-statistics helper must replay the
  * single-partition window kernels EXACTLY — rank for rank, prefix
  * sum for prefix sum — since callers (zipfFit, burrowsDelta,
  * quantileNormalize, heapsFit) switch between the two paths on a
  * flag and their gates are hash-compared against a DuckDB oracle.
  */
class RanksSpec extends SparkSpec {

  private def base = {
    import spark.implicits._
    // keys with duplicates in the weight column so the tie-break
    // column is load-bearing, spread over enough rows to occupy
    // several range partitions
    (1 to 5000).map(i => (s"k${i % 997}_$i", (i % 37).toLong))
      .toDF("tk", "c")
  }

  test("distributedRank equals row_number over the same total order") {
    val df = base
    val win = df.withColumn("rank",
      row_number().over(Window.orderBy(col("c").desc, col("tk")))
        .cast("long"))
    val dist = Ranks.distributedRank(df, Seq(col("c").desc, col("tk")))
    assert(dist.schema("rank").dataType ==
      org.apache.spark.sql.types.LongType)
    val diff = win.join(dist.withColumnRenamed("rank", "drank"),
        Seq("tk", "c"))
      .filter(col("rank") =!= col("drank"))
    assert(diff.count() == 0L)
    assert(dist.count() == 5000L)
  }

  test("distributedPrefixSum inclusive/exclusive equal the window forms") {
    val df = base.groupBy("c").agg(count(lit(1)).as("n"))
    val W = Window.orderBy("c")
    val win = df
      .withColumn("incl", sum("n").over(
        W.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("excl", coalesce(sum("n").over(
        W.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val incl = Ranks.distributedPrefixSum(df, Seq(col("c")), col("n"),
      "dincl", inclusive = true)
    val excl = Ranks.distributedPrefixSum(df, Seq(col("c")), col("n"),
      "dexcl", inclusive = false)
    val joined = win.join(incl, Seq("c", "n")).join(excl, Seq("c", "n"))
    assert(joined.filter(col("incl") =!= col("dincl") ||
      col("excl") =!= col("dexcl")).count() == 0L)
  }

  test("null weights count as zero; empty input yields empty output") {
    import spark.implicits._
    val df = Seq(("a", Some(2L)), ("b", None), ("c", Some(3L)))
      .toDF("k", "w")
    val out = Ranks.distributedPrefixSum(df, Seq(col("k")), col("w"),
      "s", inclusive = true).collect().sortBy(_.getString(0))
    assert(out.map(_.getLong(2)).toSeq == Seq(2L, 2L, 5L))
    val empty = Ranks.distributedRank(df.filter(lit(false)), Seq(col("k")))
    assert(empty.count() == 0L)
  }

  test("guards: existing output column and empty order are rejected") {
    import spark.implicits._
    val df = Seq(("a", 1L)).toDF("k", "rank")
    intercept[IllegalArgumentException] {
      Ranks.distributedRank(df, Seq(col("k")))
    }
    intercept[IllegalArgumentException] {
      Ranks.distributedRank(df, Nil, "r")
    }
  }

  test("no single-partition WindowExec in the distributed-rank plan") {
    val dist = Ranks.distributedRank(base, Seq(col("c").desc, col("tk")))
    val findings = graft.tools.PlanLint.lint(dist)
    assert(!findings.exists(_.rule.startsWith("global-window")),
      findings.mkString(", "))
  }
}
