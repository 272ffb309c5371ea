package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history maintenance: turn an
  * attribute event log — or an existing SCD2 table plus a delta —
  * into versioned rows with [valid_from, valid_to) intervals, one row
  * per key per CHANGE of the tracked attributes (consecutive
  * duplicates collapse into the earlier row). The warehouse-side
  * companion to [[VersionedKeyValStore]]'s monoid merge: that store
  * folds values, this one tracks attribute history.
  *
  * Everything is a union + two keyed windows — one shuffle on the
  * key, no self-join, no per-key collect; out-of-order deltas are
  * handled by construction because the rebuild sorts per key.
  * Deterministic: ties on (key, ts) resolve by the tie-break column
  * list, and a later duplicate timestamp with different attributes
  * takes the interval (last-writer-wins within the tie order).
  */
object Scd2 {

  /** Rebuild the full SCD2 history from attribute observations
    * (`tsCol` = when the attributes were observed). Emits one row per
    * surviving version: key cols, attr cols, `valid_from`,
    * `valid_to` (null = currently open).
    */
  def fromEvents(events: DataFrame, keyCols: Seq[String],
      attrCols: Seq[String], tsCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty,
      "keyCols and attrCols must be non-empty")
    val ordering = (col(tsCol) +: tieCols.map(col)).toSeq
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ordering: _*)
    val attrs = struct(attrCols.map(col): _*)
    // a duplicate (key, ts) pair keeps only the LAST row in tie order
    // (last-writer-wins; attribute struct order as the final
    // deterministic tie-break); then versions start where attributes
    // change
    val lastPerTs = events
      .withColumn("__attrs", attrs)
      .withColumn("__rn", row_number().over(
        Window.partitionBy((keyCols :+ tsCol).map(col): _*)
          .orderBy(tieCols.map(col(_).desc) :+ col("__attrs").desc: _*)))
      .filter(col("__rn") === 1).drop("__rn")
    val marked = lastPerTs
      .withColumn("__prev", lag(col("__attrs"), 1).over(w))
      .withColumn("__change",
        col("__prev").isNull || !(col("__attrs") <=> col("__prev")))
    val versions = marked.filter(col("__change"))
    val w2 = Window.partitionBy(keyCols.map(col): _*).orderBy(ordering: _*)
    versions
      .withColumn("valid_from", col(tsCol).cast("long"))
      .withColumn("valid_to", lead(col(tsCol).cast("long"), 1).over(w2))
      .select((keyCols ++ attrCols).map(col) :+
        col("valid_from") :+ col("valid_to"): _*)
  }

  /** Apply a delta of new observations to an existing SCD2 table:
    * re-derive each key's history from its versions' `valid_from`
    * observations plus the delta rows. Keys untouched by the delta
    * still flow through (their history is reconstructed unchanged —
    * the rebuild is idempotent), so this is a full-history merge, not
    * an append-only fast path.
    */
  def applyDelta(current: DataFrame, delta: DataFrame,
      keyCols: Seq[String], attrCols: Seq[String],
      tsCol: String): DataFrame = {
    val asEvents = current.select(
      (keyCols ++ attrCols).map(col) :+ col("valid_from").as(tsCol): _*)
    fromEvents(
      asEvents.unionByName(
        delta.select((keyCols ++ attrCols).map(col) :+ col(tsCol): _*)),
      keyCols, attrCols, tsCol)
  }

  /** Point-in-time lookup: the version of each key valid at `asOfTs`
    * (valid_from ≤ ts < valid_to, open intervals unbounded).
    */
  def asOf(scd2: DataFrame, asOfTs: Long): DataFrame =
    scd2.filter(col("valid_from") <= asOfTs &&
      (col("valid_to").isNull || col("valid_to") > asOfTs))

  /** CDC snapshot apply (the batch `MERGE INTO` / Debezium-compact
    * shape): fold a change log of upserts and deletes into a base
    * snapshot, latest-writer-wins per key. `changes` rows carry
    * `tsCol`, the `opCol` marker (`'d'` = delete, anything else =
    * upsert) and the full value columns; base rows rank below every
    * change (they're the state before the log). Ties on `tsCol`
    * resolve by `tieCols` descending (base rows carry nulls there,
    * ranking last). Returns the post-log snapshot with `base`'s
    * schema — keys whose latest op is a delete are gone, unseen keys
    * flow through.
    *
    * One union + one keyed window (single shuffle on the key) — no
    * join, no per-key collect; idempotent under replay of an
    * already-applied log.
    */
  def applyCdc(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      tsCol: String, opCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val valueCols = base.columns.filterNot(keyCols.contains).toSeq
    val b = tieCols.foldLeft(
        base.withColumn(tsCol, lit(Long.MinValue))
          .withColumn(opCol, lit("u"))) { (df, t) =>
        df.withColumn(t, lit(null).cast(changes.schema(t).dataType))
      }
    val ordered = (keyCols ++ valueCols) :+ tsCol :+ opCol
    val all = b.select((ordered ++ tieCols).map(col): _*)
      .unionByName(changes.select((ordered ++ tieCols).map(col): _*))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((col(tsCol).desc +: tieCols.map(col(_).desc)): _*)
    all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= "d")
      .select((keyCols ++ valueCols).map(col): _*)
  }
}
