package graft.core

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism floor for CPU-bound kernels (guide §2 /
  * §6, VERDICT r11 item 8): a per-row-expensive kernel (image codec,
  * char-gram DP, brute-force dot products) downstream of a SMALL scan
  * inherits the scan's split count — one ~MB parquet file is one
  * split, so the whole kernel runs in ONE task while 31 cores idle;
  * lowering `maxPartitionBytes` cannot help because parquet splits at
  * row-group boundaries. AQE makes it worse by coalescing the tiny
  * exchanges feeding such kernels down to one partition (bytes-based
  * advisory — it cannot see compute cost).
  *
  * `ensure` round-robins the input up to the session's default
  * parallelism ONLY when the incoming partition count is lower —
  * derived from the runtime core count, so the same code is a no-op
  * at 100 TB (scans already carry thousands of splits) and a 32-way
  * fan-out on the local bench. The rows it shuffles are the KERNEL
  * INPUTS (ids, text, small vectors), never kernel outputs.
  */
object Parallelism {

  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
