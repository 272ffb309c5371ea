package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout management — the 100 TB co-location story.
  *
  * The reference's only co-location tool was choosing which side of a
  * MapReduce join streamed (JoinAlgorithms.scala:155-189). On Spark
  * the durable equivalent is *bucketing*: write a fact table
  * pre-hash-partitioned (and optionally pre-sorted) on its join/group
  * keys, and every subsequent join or aggregation on those keys skips
  * both the exchange and (when sorted) the sort — the dominant cost of
  * repeated big-table joins at scale. One shuffle at write time is
  * amortized over every downstream read.
  *
  * Sizing rule of thumb at 100 TB: pick `nBuckets` so a single bucket
  * is a few hundred MB–1 GB post-compression (e.g. 100 TB / 512 MB ≈
  * 200k buckets is too many files per partition dir — bucket the
  * *partitioned* table instead: date-partition × 1024 buckets).
  */
object Bucketing {

  /** Write `df` as a bucketed (+ sorted) managed parquet table. Spark
    * records bucket spec in the catalog; readers get
    * `HashPartitioning(keys, nBuckets)` (and per-bucket sort order)
    * for free.
    */
  def writeBucketed(df: DataFrame, table: String, nBuckets: Int,
      keys: Seq[String], sortCols: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(keys.nonEmpty, "bucketing needs at least one key")
    val w = df.write.mode(mode).format("parquet")
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
    val sorted =
      if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** True when the session would exploit bucket layout (on by
    * default; users sometimes disable it globally).
    */
  def bucketingEnabled(spark: SparkSession): Boolean =
    spark.conf.get("spark.sql.sources.bucketing.enabled", "true").toBoolean
}
