package org.apache.spark.sql.graft

// Hosted inside the org.apache.spark.sql namespace because
// AbstractDataType / ExpressionUtils are private[sql] — the same
// pattern as VectorExpressions.

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.classic.ExpressionUtils

/** Pair-generation expressions for the co-occurrence hot paths.
  *
  * The classic "all unordered pairs inside one group" step (co-purchase
  * edges, wedge enumeration, basket pair counting) was a relational
  * self-join: shuffle the incidence list twice, hash-join on the group
  * key, emit the quadratic pair stream through the join operator, then
  * aggregate on a two-column key. These expressions move the pair
  * enumeration INSIDE whole-stage codegen over a per-group sorted
  * array — one exchange (the group-by that builds the array) instead
  * of the join's two, and the downstream aggregate gets a single
  * packed-long key (8-byte hash/compare) instead of a two-long struct.
  * The quadratic volume itself is unchanged — it is inherent to the
  * operation — but it now flows generator → partial aggregate inside
  * one codegen stage, never through a join.
  */

/** All ordered pairs (x, y) with x before y from a SORTED ascending
  * long array, packed as (x << 32) | y. Input values MUST be distinct,
  * sorted ascending, and fit in a non-negative 32-bit int (checked —
  * fails loudly rather than corrupting keys). Unpack with
  * `shiftrightunsigned(p, 32)` and `p & 0xFFFFFFFFL`.
  */
case class PackedPairs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(ArrayType(LongType))
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    // pair count in LONG: n >= 65536 overflows 32-bit n*(n-1)/2, and a
    // group that large means a degenerate mega-group upstream — fail
    // with the remedy, never a NegativeArraySizeException
    val cnt = n.toLong * (n - 1) / 2
    if (cnt > PackedPairs.maxPairsPerGroup)
      throw new IllegalArgumentException(
        s"packed_pairs: group of $n items would emit $cnt pairs " +
          s"(> ${PackedPairs.maxPairsPerGroup}); cap group sizes " +
          "upstream (maxBasketSize / maxGroupSize / maxDegree)")
    val out = new Array[Long](cnt.toInt)
    var k = 0
    var i = 0
    while (i < n) {
      val xi = x.getLong(i)
      if (xi < 0L || xi > 0x7FFFFFFFL)
        throw new IllegalArgumentException(
          s"packed_pairs: value $xi outside [0, 2^31)")
      val hi = xi << 32
      var j = i + 1
      while (j < n) { out(k) = hi | x.getLong(j); k += 1; j += 1 }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val xi = ctx.freshName("xi")
      val hi = ctx.freshName("hi")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $n = $a.numElements();
         |long $cnt = (long) $n * ($n - 1) / 2;
         |if ($cnt > org.apache.spark.sql.graft.PackedPairs.maxPairsPerGroup())
         |  throw new IllegalArgumentException(
         |    "packed_pairs: group of " + $n + " items would emit " + $cnt +
         |    " pairs (> " +
         |    org.apache.spark.sql.graft.PackedPairs.maxPairsPerGroup() +
         |    "); cap group sizes upstream (maxBasketSize / maxGroupSize" +
         |    " / maxDegree)");
         |long[] $out = new long[(int) $cnt];
         |int $k = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $xi = $a.getLong($i);
         |  if ($xi < 0L || $xi > 0x7FFFFFFFL)
         |    throw new IllegalArgumentException(
         |      "packed_pairs: value " + $xi + " outside [0, 2^31)");
         |  long $hi = $xi << 32;
         |  for (int $j = $i + 1; $j < $n; $j++) {
         |    $out[$k] = $hi | $a.getLong($j); $k++;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(newChild)
}

object PackedPairs {
  /** Hard per-group pair ceiling: 128M pairs = a 1 GB long array in
    * ONE row — far past any sane group, well inside int indexing.
    * Callers are expected to cap group sizes long before this fires;
    * it exists so a degenerate mega-group fails with a remedy instead
    * of a NegativeArraySizeException (int overflow at n >= 65536) or a
    * silent multi-GB row.
    */
  val maxPairsPerGroup: Long = 128L * 1024 * 1024
}

/** Integer-exact dot product of two sparse count vectors held as
  * SORTED struct arrays (key: string ascending binary order, count:
  * long) — Σ aₙ·bₙ over equal keys by a merge walk, the adjacent-block
  * similarity kernel of textTiling. Replaces a token-level self-join
  * (two shuffles of the (id, blk, tok, n) table + join + re-aggregate)
  * with one expression over per-block arrays. Inputs MUST be sorted by
  * key ascending with distinct keys (sort_array(collect_list(struct(
  * tok, n))) provides exactly that; struct ordering is field-order,
  * key first).
  */
case class SortedDot(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n1 = x.numElements()
    val n2 = y.numElements()
    var acc = 0L
    var i = 0
    var j = 0
    while (i < n1 && j < n2) {
      val rx = x.getStruct(i, 2)
      val ry = y.getStruct(j, 2)
      val c = rx.getUTF8String(0).compareTo(ry.getUTF8String(0))
      if (c < 0) i += 1
      else if (c > 0) j += 1
      else { acc += rx.getLong(1) * ry.getLong(1); i += 1; j += 1 }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n1 = ctx.freshName("n1")
      val n2 = ctx.freshName("n2")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val c = ctx.freshName("c")
      s"""
         |int $n1 = $a.numElements();
         |int $n2 = $b.numElements();
         |long $acc = 0L;
         |int $i = 0; int $j = 0;
         |while ($i < $n1 && $j < $n2) {
         |  org.apache.spark.sql.catalyst.InternalRow $rx = $a.getStruct($i, 2);
         |  org.apache.spark.sql.catalyst.InternalRow $ry = $b.getStruct($j, 2);
         |  int $c = $rx.getUTF8String(0).compareTo($ry.getUTF8String(0));
         |  if ($c < 0) { $i++; }
         |  else if ($c > 0) { $j++; }
         |  else { $acc += $rx.getLong(1) * $ry.getLong(1); $i++; $j++; }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object PairFunctions {
  def packed_pairs(a: Column): Column =
    ExpressionUtils.column(PackedPairs(ExpressionUtils.expression(a)))
  def sorted_dot(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
