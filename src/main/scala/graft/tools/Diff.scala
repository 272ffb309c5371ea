package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset regression diff: key-aligned comparison of two DataFrames
  * with the same schema — the operational "did the migration /
  * refactor / backfill change results" check, generalizing
  * `Corpus.diffSnapshots`' (id, md5) corpus diff to full rows with
  * per-column attribution.
  *
  * One full-outer hash join on the key plus column-equality Columns;
  * both sides are reduced to (key, compared columns) before the
  * join, null-safe (`<=>`) throughout. Scale shape: a single keyed
  * shuffle per side; the per-column report is a tiny aggregate over
  * the joined stream.
  */
object Diff {

  /** Per-row classification: (key cols..., status) with status ∈
    * {left_only, right_only, changed, unchanged}; `changed` rows also
    * carry `changed_cols` (the names of differing columns, sorted).
    */
  def rows(left: DataFrame, right: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val compare = left.columns.toSeq.filterNot(keyCols.contains)
    require(compare.nonEmpty, "no non-key columns to compare")
    require(right.columns.toSet == left.columns.toSet,
      "schemas must carry the same column names")
    val l = left.select(keyCols.map(col) :+
      struct(compare.map(col): _*).as("__l") :+ lit(1).as("__lt"): _*)
    val r = right.select(keyCols.map(col) :+
      struct(compare.map(col): _*).as("__r") :+ lit(1).as("__rt"): _*)
    val joined = l.join(r, keyCols, "full_outer")
    val changedCols = array_sort(filter(
      array(compare.map(c => when(
        !(col(s"__l.$c") <=> col(s"__r.$c")), lit(c))): _*),
      c => c.isNotNull))
    joined.select(keyCols.map(col) :+
      when(col("__rt").isNull, "left_only")
        .when(col("__lt").isNull, "right_only")
        .when(col("__l") <=> col("__r"), "unchanged")
        .otherwise("changed").as("status") :+
      when(col("__lt").isNotNull && col("__rt").isNotNull &&
        !(col("__l") <=> col("__r")), changedCols)
        .otherwise(array().cast("array<string>")).as("changed_cols"): _*)
  }

  /** One-row totals + per-column mismatch counts: (n_left_only,
    * n_right_only, n_changed, n_unchanged, diff_<col>...) — the
    * regression-gate summary a CI step asserts on.
    */
  def summary(left: DataFrame, right: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val compare = left.columns.toSeq.filterNot(keyCols.contains)
    val classified = rows(left, right, keyCols)
    classified.agg(
      sum(when(col("status") === "left_only", 1L).otherwise(0L))
        .as("n_left_only"),
      (sum(when(col("status") === "right_only", 1L).otherwise(0L))
        .as("n_right_only") +:
        sum(when(col("status") === "changed", 1L).otherwise(0L))
          .as("n_changed") +:
        sum(when(col("status") === "unchanged", 1L).otherwise(0L))
          .as("n_unchanged") +:
        compare.map(c =>
          sum(when(array_contains(col("changed_cols"), c), 1L)
            .otherwise(0L)).as(s"diff_$c"))): _*)
  }

  /** Hard regression gate: throws unless the two sides are
    * key-aligned and value-identical.
    */
  /** Schema diff between two datasets: one row per column that was
    * added, removed, or changed type/nullability — the first check a
    * pipeline migration runs before any row diff (a silent widening
    * or drop shows up here for free). Driver-only metadata; no job.
    */
  def schemas(left: DataFrame, right: DataFrame): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    val l = left.schema.map(f => f.name -> f).toMap
    val r = right.schema.map(f => f.name -> f).toMap
    val rows = (l.keySet ++ r.keySet).toSeq.sorted.flatMap { name =>
      (l.get(name), r.get(name)) match {
        case (Some(_), None) => Some((name, "removed",
          l(name).dataType.simpleString, null: String))
        case (None, Some(_)) => Some((name, "added",
          null: String, r(name).dataType.simpleString))
        case (Some(a), Some(b))
            if a.dataType != b.dataType || a.nullable != b.nullable =>
          Some((name, "changed",
            s"${a.dataType.simpleString}${if (a.nullable) "" else " not null"}",
            s"${b.dataType.simpleString}${if (b.nullable) "" else " not null"}"))
        case _ => None
      }
    }
    rows.toDF("column", "status", "left_type", "right_type")
  }

  def assertIdentical(left: DataFrame, right: DataFrame,
      keyCols: Seq[String]): Unit = {
    val bad = rows(left, right, keyCols)
      .filter(col("status") =!= "unchanged")
    val sample = bad.limit(5).collect()
    if (sample.nonEmpty)
      throw new AssertionError(
        s"datasets differ; first rows: ${sample.mkString("; ")}")
  }
}
