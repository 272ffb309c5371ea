package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic
import org.apache.spark.storage.StorageLevel

/** Tracked lineage truncation: `localCheckpoint`'s plan cut without
  * its cache leak. Iterative DataFrame algorithms (PageRank-style
  * loops) need each iterate's LOGICAL plan truncated — Catalyst
  * re-analyzes the whole growing chain per iteration otherwise — but
  * `localCheckpoint` persists an RDD that `Dataset.unpersist` cannot
  * reach, so every loop leaves untracked resident blocks behind (the
  * bench-hygiene failure class). This helper materializes the rows
  * into an explicitly-persisted InternalRow RDD, registers it with
  * [[graft.core.PipelineCaches]] for the standard end-of-pipeline
  * drop, and returns a DataFrame whose plan is just the RDD scan.
  */
object Lineage {

  def truncateTracked(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    // rows must be copied out of the unsafe buffer before caching
    val rdd = df.queryExecution.toRdd.map(_.copy())
      .persist(StorageLevel.MEMORY_AND_DISK)
    _root_.graft.core.PipelineCaches.trackRdd(rdd)
    rdd.count() // eager, like localCheckpoint(eager = true)
    spark.internalCreateDataFrame(rdd, df.schema)
  }
}
