package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, BoundReference, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Native as-of join — the guide's preference (c): a whole-operator
  * Catalyst extension (LogicalPlan + Strategy + SparkPlan) for a
  * semantic Spark cannot express as one relational operator. The
  * reference engine has only equi-joins (JoinAlgorithms.scala:155-182);
  * as-of is part of this engine's superset surface.
  *
  * For every left row, attach the single latest right row with an
  * equal key and `rightTs <= leftTs` (ties at equal timestamps match —
  * ASOF's `>=` semantics). Physical execution co-partitions both sides
  * by key and sorts by (key, ts) — then a single forward merge pass
  * per partition attaches matches with O(1) state (one buffered right
  * row), no union, no window buffering, no interval explosion. At
  * 100 TB this is one shuffle per side and a streaming pass, and the
  * output preserves the left side's hash partitioning so a downstream
  * per-key aggregation adds no further shuffle.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    isInner: Boolean) extends BinaryNode {

  override def output: Seq[Attribute] =
    if (isInner) left.output ++ right.output
    else left.output ++ right.output.map(_.withNullability(true))

  override lazy val resolved: Boolean = childrenResolved &&
    (leftKeys ++ rightKeys :+ leftTs :+ rightTs).forall(_.resolved) &&
    leftKeys.map(_.dataType) == rightKeys.map(_.dataType) &&
    leftTs.dataType == rightTs.dataType

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] as [[AsOfJoinExec]]; injected via
  * `GraftExtensions.injectPlannerStrategy`.
  */
class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lts, rts, inner) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, inner) :: Nil
    case _ => Nil
  }
}

/** Sorted-merge as-of join. Children are hash-clustered on the keys
  * and sorted by (keys, ts) — EnsureRequirements inserts the
  * exchanges/sorts only when the child layout doesn't already satisfy
  * them (a pre-bucketed or pre-sorted input joins with zero extra
  * shuffle). Per partition: advance the right iterator while its
  * (key, ts) is <= the left row's, remembering the last non-null-key
  * right row; emit the remembered row iff its key equals the left key.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    isInner: Boolean) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    if (isInner) left.output ++ right.output
    else left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  // merge emits in left order and never moves rows across partitions
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lSortExprs = leftKeys :+ leftTs
    val rSortExprs = rightKeys :+ rightTs
    val nKeys = leftKeys.size
    val lOutput = left.output
    val rOutput = right.output
    val allOutput = output
    val inner = isInner
    val lRdd = left.execute()
    val rRdd = right.execute()
    // EnsureRequirements co-partitions the children; guard the merge's
    // zip assumption anyway so a future planner change (e.g. one-sided
    // AQE coalescing) fails loudly instead of zipping wrong partitions
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"AsOfJoinExec children not co-partitioned: " +
        s"${lRdd.getNumPartitions} vs ${rRdd.getNumPartitions}")
    lRdd.zipPartitions(rRdd, preservesPartitioning = true) {
      (lIter, rIter) =>
        val lProj = UnsafeProjection.create(lSortExprs, lOutput)
        val rProj = UnsafeProjection.create(rSortExprs, rOutput)
        // compiled comparators (codegen, interpreted fallback); a
        // natural ascending ordering compares ordinal-by-ordinal, so
        // the key ordering simply ignores the trailing ts ordinal
        val sortRefs = lSortExprs.map(_.dataType).zipWithIndex.map {
          case (dt, i) => BoundReference(i, dt, nullable = true)
        }
        val fullOrd = RowOrdering.create(sortRefs.map(SortOrder(_, Ascending)), Nil)
        val keyOrd =
          RowOrdering.create(sortRefs.take(nKeys).map(SortOrder(_, Ascending)), Nil)
        // in left-outer mode the right side of the JoinedRow can be
        // all-null, so the projection must treat every right column as
        // nullable — otherwise codegen reads raw zeros from null slots
        val rProjInput = if (inner) rOutput else rOutput.map(_.withNullability(true))
        val resultProj = UnsafeProjection.create(allOutput, lOutput ++ rProjInput)
        val nullRight = new GenericInternalRow(rOutput.size)
        val joined = new JoinedRow
        val rBuf = rIter.buffered

        new Iterator[InternalRow] {
          private var lastRight: InternalRow = null
          private var lastRightSort: InternalRow = null
          private var out: InternalRow = null

          private def keyIsNull(row: InternalRow): Boolean = {
            var i = 0
            while (i < nKeys) {
              if (row.isNullAt(i)) return true
              i += 1
            }
            row.isNullAt(nKeys) // null ts never satisfies rightTs <= leftTs
          }

          // pull left rows until one produces output (inner mode skips
          // unmatched lefts, so a single left row is not 1:1 with output)
          private def advance(): Unit = {
            while (out == null && lIter.hasNext) {
              val lrow = lIter.next()
              val lSort = lProj(lrow)
              if (keyIsNull(lSort)) {
                // SQL join semantics: null keys match nothing
                if (!inner) out = resultProj(joined(lrow, nullRight))
              } else {
                var scanning = true
                while (scanning && rBuf.hasNext) {
                  val rSort = rProj(rBuf.head)
                  if (keyIsNull(rSort)) { rBuf.next() } // matches no left
                  else if (fullOrd.compare(rSort, lSort) <= 0) {
                    lastRightSort = rSort.copy()
                    lastRight = rBuf.next().copy()
                  } else scanning = false
                }
                if (lastRight != null &&
                    keyOrd.compare(lastRightSort, lSort) == 0) {
                  out = resultProj(joined(lrow, lastRight))
                } else if (!inner) {
                  out = resultProj(joined(lrow, nullRight))
                }
              }
            }
          }

          override def hasNext: Boolean = {
            if (out == null) advance()
            out != null
          }

          override def next(): InternalRow = {
            if (out == null) advance()
            val r = out
            out = null
            numOutputRows += 1
            r
          }
        }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level entry for the native as-of join (hosted in this
  * package for `Dataset.ofRows` / analyzed-plan access).
  */
object AsOfNative {

  /** Join `left` to the latest `right` row per key with
    * `right(rightTs) <= left(leftTs)`. Output = all left columns ++
    * all right columns (caller controls right's projection/naming).
    * Key and ts column data types must match pairwise.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTs: String, rightTs: String, how: String = "inner"): DataFrame = {
    require(how == "inner" || how == "left", s"asofJoin: inner/left, got $how")
    require(leftKeys.size == rightKeys.size, "key lists must align")
    val session = left.sparkSession.asInstanceOf[classic.SparkSession]
    val lPlan = left.queryExecution.analyzed
    val rPlan0 = right.queryExecution.analyzed
    // self-join safety: re-alias the right side when attribute ids collide
    val rPlan =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).isEmpty) rPlan0
      else Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"asofJoin: column $n not in [${p.output.map(_.name).mkString(", ")}]"))
    val node = AsOfJoin(lPlan, rPlan,
      leftKeys.map(attr(lPlan, _)), rightKeys.map(attr(rPlan, _)),
      attr(lPlan, leftTs), attr(rPlan, rightTs), how == "inner")
    classic.Dataset.ofRows(session, node)
  }
}
