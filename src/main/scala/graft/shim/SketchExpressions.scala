package org.apache.spark.sql.graft

// Hosted inside the org.apache.spark.sql namespace because
// ExpressionUtils is private[sql] — same pattern as VectorExpressions.

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.classic.ExpressionUtils

/** Column wrappers over Spark's runtime-filter bloom expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the pair
  * Catalyst's own `InjectRuntimeFilter` rule plants). Exposing them as
  * first-class Columns lets [[graft.join.Joins.bloomJoin]] build the
  * filter where the planner's heuristics would not have (e.g. the
  * build side's selectivity comes from the user's knowledge, not
  * stats), while keeping the probe inside whole-stage codegen —
  * `BloomFilterMightContain` has `doGenCode`, unlike a Scala UDF over
  * `util.sketch.BloomFilter`.
  */
object SketchColumns {

  /** Aggregate the (xxhash64-hashed, LongType) values of `value` into
    * a serialized bloom filter (BinaryType, one row).
    */
  def bloomFilterAgg(value: Column, expectedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(new BloomFilterAggregate(
      ExpressionUtils.expression(value),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Probe: true if `value` (LongType, same hashing as the build side)
    * might be in `bloom`. `bloom` must be foldable or a scalar
    * subquery — pass `bfDf.scalar()`.
    */
  def bloomMightContain(bloom: Column, value: Column): Column =
    ExpressionUtils.column(new BloomFilterMightContain(
      ExpressionUtils.expression(bloom), ExpressionUtils.expression(value)))
}
