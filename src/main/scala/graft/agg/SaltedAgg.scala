package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted two-phase aggregation for NON-algebraic aggregates on
  * skewed keys.
  *
  * Algebraic aggs (sum/count/min/max) never need this — Catalyst's
  * partial/final split already combines map-side. But collect-type
  * aggs concentrate every row of a hot key on one reducer; at 100 TB
  * a single viral key OOMs that task. Salting splits phase 1 into
  * (key, salt) groups — bounding any single task's state to ~1/nSalts
  * of the hot key — and phase 2 merges the per-salt partials, which
  * is one row per (key, salt), not per input row.
  *
  * This is the reference's skew-join replication idea
  * (JoinAlgorithms.scala:265-341) applied to aggregation. The salt is
  * a deterministic value hash, so reruns route identically; the
  * merged list is sorted, so the output is independent of routing
  * entirely.
  */
object SaltedAgg {

  def saltedCollectList(df: DataFrame, keyCols: Seq[String], valCol: String,
      nSalts: Int): DataFrame = {
    require(nSalts > 0)
    val parts = df
      .withColumn("__salt", pmod(xxhash64(col(valCol)), lit(nSalts)))
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(collect_list(col(valCol)).as("__part"))
    parts
      .groupBy(keyCols.map(col): _*)
      .agg(array_sort(flatten(collect_list(col("__part"))))
        .as(s"${valCol}_list"))
  }

  /** Salted distinct-collect: same two-phase shape with per-salt
    * dedup in phase 1, so phase 2 merges already-thinned partials
    * (values route to one salt each, so cross-salt dups can't occur).
    */
  def saltedCollectSet(df: DataFrame, keyCols: Seq[String], valCol: String,
      nSalts: Int): DataFrame = {
    require(nSalts > 0)
    val parts = df
      .withColumn("__salt", pmod(xxhash64(col(valCol)), lit(nSalts)))
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(collect_set(col(valCol)).as("__part"))
    parts
      .groupBy(keyCols.map(col): _*)
      .agg(array_sort(flatten(collect_list(col("__part"))))
        .as(s"${valCol}_set"))
  }
}
