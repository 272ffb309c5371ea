package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.{coalesce, lit}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed order statistics — the scale-path replacement for the
  * single-partition `row_number().over(Window.orderBy(...))` /
  * `sum(...).over(Window.orderBy(...))` kernels used on vocabulary- or
  * distinct-value-sized aggregates. Those windows are fine while the
  * ordered table is |V|-bounded (the documented tradeoff in
  * TextAnalysis.zipfFit etc.), but an open vocabulary (n-grams, URLs,
  * billions of doc ids) pushes every row through ONE WindowExec task.
  *
  * This helper is the classic two-pass zipWithIndex shape instead:
  * range-partition on the order (a distributed sort — each partition
  * holds a contiguous key range), count/sum each partition once,
  * broadcast the per-partition offsets (one long per partition — KB,
  * not data), then stream each partition adding its offset. Both
  * passes are fully parallel; the sort shuffle is computed once (the
  * two jobs share the same RDD lineage, so Spark reuses the shuffle
  * files).
  *
  * Requirements: `orderBy` must totally order the rows (provide a
  * unique tie-break column — every call site here orders distinct
  * keys, so this holds by construction); otherwise tied rows receive
  * an arbitrary but consistent order within the tie. Construction is
  * EAGER (the offsets job runs when the method is called), like every
  * multi-pass kernel in this repo.
  */
object Ranks {

  /** `df` + a 1-based dense row index `as` assigned in `orderBy`
    * order — exactly `row_number().over(Window.orderBy(orderBy))`
    * without the single-partition window.
    */
  def distributedRank(df: DataFrame, orderBy: Seq[Column],
      as: String = "rank"): DataFrame =
    distributedPrefixSum(df, orderBy, lit(1L), as, inclusive = true)

  /** `df` + a running sum of `weight` in `orderBy` order.
    * `inclusive = true` includes the current row (cumulative count /
    * rank semantics); `false` gives the exclusive prefix (rows-before
    * semantics, the `rowsBetween(unboundedPreceding, -1)` shape).
    * Null weights count as 0.
    */
  def distributedPrefixSum(df: DataFrame, orderBy: Seq[Column],
      weight: Column, as: String, inclusive: Boolean): DataFrame = {
    require(orderBy.nonEmpty, "distributedPrefixSum: empty order")
    val wCol = "__graft_psum_w"
    require(!df.columns.contains(as),
      s"distributedPrefixSum: output column $as already exists")
    require(!df.columns.contains(wCol),
      s"distributedPrefixSum: reserved column $wCol in input")
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val sorted = df
      .withColumn(wCol, coalesce(weight.cast("long"), lit(0L)))
      .repartitionByRange(parts, orderBy: _*)
      .sortWithinPartitions(orderBy: _*)
    val wIdx = df.columns.length // wCol appended last
    val rdd = sorted.rdd
    // pass 1: one long per partition (bounded by the partition count)
    val partSums = rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(wIdx))
      Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    // pass 2: stream each partition adding its exclusive offset; the
    // sort shuffle from pass 1 is reused (same RDD lineage)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets(i)
      it.map { r =>
        val w = r.getLong(wIdx)
        val v = if (inclusive) acc + w else acc
        acc += w
        Row.fromSeq(r.toSeq.dropRight(1) :+ v)
      }
    }
    spark.createDataFrame(out,
      StructType(df.schema.fields :+ StructField(as, LongType, false)))
  }
}
