package graft

import org.apache.spark.sql.functions._
import graft.sources.ZOrder

/** Z-order layout: a 2-D box predicate over a z-clustered table must
  * skip far more row groups (scan emits fewer rows) than the same
  * query over a singly-sorted layout — the multi-dimensional pruning
  * the layout exists for.
  */
class ZOrderSpec extends SparkSpec {

  private def scanOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
    // execute THIS QueryExecution (df.write would plan a fresh one and
    // leave these metrics untouched), then unwrap AQE's final plan
    val plan = df.queryExecution.executedPlan
    plan.execute().count()
    val finalPlan = plan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    finalPlan.collectLeaves()
      .flatMap(_.metrics.get("numOutputRows").map(_.value)).sum
  }

  test("z-ordered layout prunes 2-D box queries far better than 1-D sort") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val n = 200000
    val data = (1 to n).map(_ => (rnd.nextInt(1000), rnd.nextInt(1000)))
      .toDF("x", "y")
    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString

    // layout A: sorted by x only (the single-dimension best case).
    // 512 files in both layouts: pruning resolution = file count, and
    // the x-stripe survivor count is density-bound (~10% of rows)
    // regardless of granularity, while the z-layout's boundary
    // overhang shrinks with file size — the margin must not hinge on
    // where the range-sampler (seeded by session-history RDD ids)
    // happens to cut boundaries.
    data.repartitionByRange(512, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$base/xsort")
    // layout B: z-ordered on (x, y)
    ZOrder.writeZOrdered(data, s"$base/zorder", Seq("x", "y"), nFiles = 512)

    def box(path: String) = spark.read.parquet(path)
      .filter(col("x") >= 100 && col("x") < 200 &&
        col("y") >= 100 && col("y") < 200)

    // both return the identical result…
    val exact = box(s"$base/xsort").count()
    assert(box(s"$base/zorder").count() == exact)
    assert(exact > 0)

    // …but the z-ordered scan reads a fraction of the rows: the x-sort
    // layout prunes only the x dimension (~10% of row groups survive,
    // each full of out-of-box y values), while z-clustered row groups
    // are tight boxes in BOTH dimensions. Granularity matters: each
    // file is one row group, so pruning resolution = file count —
    // 200 files ⇒ each z-file covers ~0.5% of the plane vs the 1% box
    val rowsX = scanOutputRows(box(s"$base/xsort"))
    val rowsZ = scanOutputRows(box(s"$base/zorder"))
    assert(rowsZ < rowsX / 2,
      s"z-order pruned poorly: z=$rowsZ vs xsort=$rowsX (exact=$exact)")
  }

  test("zValue interleaves bits with locality (adjacent cells share prefixes)") {
    import spark.implicits._
    val df = Seq((0.0, 0.0), (1023.0, 1023.0), (0.0, 1023.0), (1023.0, 0.0))
      .toDF("x", "y")
    val zs = df.select(ZOrder.zValue(Seq(col("x"), col("y")),
      Seq(0.0, 0.0), Seq(1023.0, 1023.0), bits = 10).as("z"))
      .collect().map(_.getLong(0))
    assert(zs(0) == 0L)
    assert(zs(1) == (1L << 20) - 1, s"max corner: ${zs(1)}")
    // opposite corners differ in alternating bit positions
    assert(zs(2) != zs(3) && zs(2) + zs(3) == (1L << 20) - 1)
  }
}
