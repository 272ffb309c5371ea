package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional range
  * pruning at the storage layer.
  *
  * Sorting a table by one column makes parquet min/max statistics
  * prune scans on THAT column only; a query filtering two dimensions
  * still reads every row group for the unsorted one. Clustering by the
  * Morton interleave of both columns bounds every file/row-group to a
  * small hyper-rectangle, so a 2-D box predicate skips most of the
  * table — the layout trick behind Delta/Iceberg OPTIMIZE ZORDER,
  * rebuilt here on plain parquet with `repartitionByRange` + per-file
  * sort. At 100 TB this is the difference between touching ~√s and s
  * of the table for an s-selective 2-D box.
  */
object ZOrder {

  /** Morton z-value of `cols`, each rank-scaled into [0, 2^bits) with
    * the given per-column [min, max] envelopes. Bit i of column j
    * lands at position i·nCols + j. Pure Column arithmetic (codegen).
    */
  def zValue(cols: Seq[Column], mins: Seq[Double], maxs: Seq[Double],
      bits: Int = 12): Column = {
    require(cols.nonEmpty && cols.size == mins.size && cols.size == maxs.size)
    require(bits * cols.size <= 62, "z-value must fit a signed long")
    val top = (1L << bits) - 1
    val n = cols.size
    val scaled = cols.zipWithIndex.map { case (c, j) =>
      val span = math.max(maxs(j) - mins(j), java.lang.Double.MIN_NORMAL)
      least(greatest(
        (((c.cast("double") - mins(j)) / span) * top).cast("long"),
        lit(0L)), lit(top))
    }
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      scaled.zipWithIndex.foldLeft(acc) { case (a, (v, j)) =>
        a.bitwiseOR(shiftleft(shiftright(v, i).bitwiseAND(lit(1L)), i * n + j))
      }
    }
  }

  /** Write `df` clustered on the z-curve of `zCols`: one stats pass
    * computes the column envelopes, rows are range-partitioned by
    * z-value into `nFiles` output files and sorted within each, so
    * every file covers a tight z-range (⇒ a tight box in the original
    * dimensions) and its parquet min/max stats prune multi-dimensional
    * range queries.
    */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
      nFiles: Int, bits: Int = 12): Unit = {
    val statsRow = df.agg(
      zCols.flatMap(c => Seq(min(col(c).cast("double")).as(s"mn_$c"),
        max(col(c).cast("double")).as(s"mx_$c"))).head,
      zCols.flatMap(c => Seq(min(col(c).cast("double")).as(s"mn_$c"),
        max(col(c).cast("double")).as(s"mx_$c"))).tail: _*).head()
    val mins = zCols.indices.map(i => statsRow.getDouble(2 * i))
    val maxs = zCols.indices.map(i => statsRow.getDouble(2 * i + 1))
    df.withColumn("__z", zValue(zCols.map(col), mins, maxs, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
