package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Structured-Streaming surface. The reference is strictly batch
  * (SURVEY §2.8): its incremental idioms are time-partitioned inputs,
  * `Job.next` iteration, and monoid-merged stores. This module is the
  * Spark-native upgrade of those idioms — the same logical operations
  * as unbounded streams with watermarks and managed state.
  */
object Streaming {

  /** Tumbling-window aggregation (the streaming form of the batch
    * time-bucket groupBy): count + sum per (window, key) with a
    * watermark bounding state.
    */
  def tumblingAgg(events: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_value"))

  /** Sliding-window aggregation: windows of `windowLen` advancing by
    * `slide` (each event lands in windowLen/slide windows).
    */
  def slidingAgg(events: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, windowLen: String, slide: String,
      watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen, slide), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_value"))

  /** Streaming exact dedup: drop rows whose `keyCols` were already
    * seen within the watermark horizon — the unbounded form of the
    * batch fingerprint dedup, with state bounded by the watermark.
    */
  def dedupStream(events: DataFrame, tsCol: String, watermark: String,
      keyCols: String*): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.toSeq)

  /** Stream-stream event-time interval join: match left and right
    * rows with equal `keyCol` whose right timestamp lies within
    * [leftTs - maxDelay, leftTs]. The watermarks plus the time-range
    * condition let Spark prune both state stores — state is bounded by
    * (watermark + maxDelay), never unbounded. The streaming
    * counterpart of the batch as-of/range joins (a streaming join
    * without a time bound would accumulate state forever; Spark
    * rejects unbounded outer variants outright).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, watermark: String, maxDelay: String,
      how: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark).alias("l")
    val r = right.withWatermark(rightTs, watermark).alias("r")
    l.join(r,
      expr(s"l.$keyCol = r.$keyCol AND " +
        s"r.$rightTs >= l.$leftTs - interval '$maxDelay' AND " +
        s"r.$rightTs <= l.$leftTs"),
      how)
  }

  /** Stream-static enrichment: join a stream against a slowly-changing
    * dimension, broadcast so the streaming side never shuffles. The
    * static side is re-read per micro-batch, so an updated dimension
    * table is picked up without restarting the query.
    */
  def enrich(stream: DataFrame, dim: DataFrame, keys: Seq[String],
      how: String = "left"): DataFrame =
    stream.join(broadcast(dim), keys, how)

  /** Incremental monoid merge into a keyed store — the streaming form
    * of `writeIncremental` (VersionedKeyValSource.scala:163-210):
    * each micro-batch is monoid-merged into the versioned store.
    */
  def incrementalMerge(deltas: DataFrame, store: graft.sources.VersionedKeyValStore,
      mergeAgg: Option[Column] = None): StreamingQuery =
    deltas.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) { store.writeIncremental(batch, mergeAgg); () }
      }
      .start()

  /** Per-key session state for gap-based sessionization. */
  case class SessionState(sessionId: Long, lastSec: Long)
  case class SessionEvent(key: Long, sec: Long)
  case class SessionAssignment(key: Long, sec: Long, sessionId: Long)

  /** Stateful gap sessionization via mapGroupsWithState — the
    * streaming form of the batch lag+cumsum sessionize (assigns
    * monotone per-key session ids with a 30-min* gap rule).
    * (*gapSeconds.)
    */
  def sessionize(events: Dataset[SessionEvent], gapSeconds: Long)(
      implicit e: Encoder[SessionAssignment],
      se: Encoder[SessionState]): Dataset[SessionAssignment] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[SessionState, SessionAssignment](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
          val out = rows.toSeq.sortBy(_.sec).map { ev =>
            st =
              if (st.lastSec == Long.MinValue || ev.sec - st.lastSec > gapSeconds)
                SessionState(st.sessionId + 1, ev.sec)
              else st.copy(lastSec = ev.sec)
            SessionAssignment(key, ev.sec, st.sessionId)
          }
          state.update(st)
          out.iterator
      }
  }
}
