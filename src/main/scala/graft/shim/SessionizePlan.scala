package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, BoundReference, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.LongType

/** Native gap sessionization — the same whole-operator Catalyst
  * extension path as [[AsOfJoin]] (LogicalPlan + Strategy + SparkPlan).
  * Labels every row with a per-key `session_id` (1-based): a new
  * session starts at a key's first row and whenever the gap to the
  * previous row's timestamp exceeds `gapSec`.
  *
  * The declarative batch form costs two full window passes over the
  * sorted partition (a `lag` to flag boundaries + a running sum to
  * number them) before the caller's aggregation; this operator is ONE
  * shuffle by key, one in-partition sort, and a single streaming pass
  * with O(1) state — the shape Structured Streaming's session windows
  * use, available to batch plans. The output preserves the child's
  * hash partitioning and sort order, so the canonical follow-up
  * (aggregate per key or per (key, session)) adds no exchange.
  *
  * Null semantics match the lag-window formulation exactly
  * (`lag(ts) IS NULL OR ts - lag(ts) > gap`): a null PREVIOUS
  * timestamp always opens a new session — nulls sort first, so they
  * cluster at the head of each key run and each null-ts row starts
  * its own session, exactly like the lag form — while a null CURRENT
  * timestamp after a non-null one continues the session (SQL:
  * `null > gap` is not true). Timestamps must be LongType (epoch
  * seconds — normalize with
  * `graft.core.Ts.seconds`); reference: the scalding idiom was a
  * hand-rolled `GroupBuilder.scanLeft` over secondary-sorted tuples
  * (GroupBuilder.scala:121-140), one of the closure escapes this
  * engine re-expresses as a native operator.
  */
case class Sessionize(
    child: LogicalPlan,
    keys: Seq[Expression],
    ts: Expression,
    gapSec: Long,
    sessionAttr: AttributeReference) extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ sessionAttr

  // session_id is minted here, not drawn from the child
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(sessionAttr)

  override lazy val resolved: Boolean = childrenResolved &&
    (keys :+ ts).forall(_.resolved) && ts.dataType == LongType

  override protected def withNewChildInternal(newChild: LogicalPlan): Sessionize =
    copy(child = newChild)
}

/** Plans [[Sessionize]] as [[SessionizeExec]]; injected via
  * `GraftExtensions.injectPlannerStrategy`.
  */
class SessionizeStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Sessionize(child, keys, ts, gap, attr) =>
      SessionizeExec(planLater(child), keys, ts, gap, attr) :: Nil
    case _ => Nil
  }
}

/** Single-pass session labeling over a key-clustered, (key, ts)-sorted
  * child. EnsureRequirements inserts the exchange/sort only when the
  * child layout doesn't already satisfy them — pre-bucketed input
  * sessionizes with zero shuffle.
  */
case class SessionizeExec(
    child: SparkPlan,
    keys: Seq[Expression],
    ts: Expression,
    gapSec: Long,
    sessionAttr: AttributeReference) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ sessionAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(sessionAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq((keys :+ ts).map(SortOrder(_, Ascending)))

  // labeling adds a column and never moves or reorders rows
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numSessions" -> SQLMetrics.createMetric(sparkContext, "number of sessions"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numSessions = longMetric("numSessions")
    val sortExprs = keys :+ ts
    val nKeys = keys.size
    val childOutput = child.output
    val allOutput = output
    val gap = gapSec
    child.execute().mapPartitions({ iter =>
      val sortProj = UnsafeProjection.create(sortExprs, childOutput)
      val sortRefs = sortExprs.map(_.dataType).zipWithIndex.map {
        case (dt, i) => BoundReference(i, dt, nullable = true)
      }
      val keyOrd =
        RowOrdering.create(sortRefs.take(nKeys).map(SortOrder(_, Ascending)), Nil)
      val resultProj = UnsafeProjection.create(allOutput,
        childOutput :+ sessionAttr)
      val joined = new JoinedRow
      val sidRow = new GenericInternalRow(1)

      new Iterator[InternalRow] {
        private var prevSort: InternalRow = null
        // the shared batch/streaming state machine (graft.core
        // .SessionGap) — reset at each key boundary
        private var st = graft.core.SessionGap.empty

        override def hasNext: Boolean = iter.hasNext

        override def next(): InternalRow = {
          val row = iter.next()
          val sort = sortProj(row)
          val tsNull = sort.isNullAt(nKeys)
          val tsVal = if (tsNull) 0L else sort.getLong(nKeys)
          if (prevSort == null || keyOrd.compare(sort, prevSort) != 0)
            st = graft.core.SessionGap.empty
          val st1 = graft.core.SessionGap.advance(st, tsVal, tsNull, gap)
          if (st1.sessionId != st.sessionId) numSessions += 1
          st = st1
          prevSort = sort.copy()
          sidRow.setLong(0, st.sessionId)
          numOutputRows += 1
          resultProj(joined(row, sidRow))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SessionizeExec =
    copy(child = newChild)
}

/** DataFrame-level entry for native sessionization (hosted in this
  * package for `Dataset.ofRows` / analyzed-plan access).
  */
object SessionizeNative {

  /** Append `session_id` (1-based per key) to `df`: a new session
    * starts at each key's first row and at every gap > `gapSec`
    * between consecutive `tsCol` values (epoch-second LongType —
    * normalize with `graft.core.Ts.seconds` first).
    */
  def sessionize(df: DataFrame, keyCols: Seq[String], tsCol: String,
      gapSec: Long): DataFrame = {
    require(keyCols.nonEmpty, "sessionize needs at least one key column")
    val session = df.sparkSession.asInstanceOf[classic.SparkSession]
    val plan = df.queryExecution.analyzed
    def attr(n: String): Attribute =
      plan.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"sessionize: column $n not in [${plan.output.map(_.name).mkString(", ")}]"))
    require(!plan.output.exists(_.name == "session_id"),
      "sessionize: input already has a session_id column")
    val node = Sessionize(plan, keyCols.map(attr), attr(tsCol), gapSec,
      AttributeReference("session_id", LongType, nullable = false)())
    classic.Dataset.ofRows(session, node)
  }
}
