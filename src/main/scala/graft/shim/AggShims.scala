package org.apache.spark.sql.graft

// Hosted inside the org.apache.spark.sql namespace (like
// VectorExpressions) because ExpressionUtils is private[sql].

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK
import org.apache.spark.sql.classic.ExpressionUtils

/** Column wrappers over Spark's internal bounded aggregates.
  *
  * `CollectTopK` is Catalyst's BoundedPriorityQueue aggregate: each
  * map-side partial buffer holds at most k elements, so the shuffle
  * carries k rows per (group, task) instead of the whole group — the
  * semantics of the reference's `sortedTake`
  * (ReduceOperations.scala:420-444) with the scale shape of
  * `agg/Aggregators.sortedTake`, but producing a properly-typed array
  * column usable from the untyped fields API (the typed aggregator's
  * kryo buffer encoding is opaque to SQL).
  */
object AggShims {

  /** Bounded top-k of the k SMALLEST values, ascending — reference
    * `sortedTake` ordering.
    */
  def sortedTakeAsc(e: Column, k: Int): Column =
    ExpressionUtils.column(
      new CollectTopK(ExpressionUtils.expression(e), k, true, 0, 0)
        .toAggregateExpression())

  /** Bounded top-k of the k LARGEST values, descending — reference
    * `sortedReverseTake` ordering.
    */
  def sortedTakeDesc(e: Column, k: Int): Column =
    ExpressionUtils.column(
      new CollectTopK(ExpressionUtils.expression(e), k, false, 0, 0)
        .toAggregateExpression())
}
