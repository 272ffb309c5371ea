package org.apache.spark.sql.graft

// Hosted inside the org.apache.spark.sql namespace because
// AbstractDataType / ExpressionUtils are private[sql] — the standard
// pattern for Spark-native expression extensions.

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.catalyst.expressions.{Expression => CatalystExpression}
import org.apache.spark.sql.classic.ExpressionUtils

/** Native Catalyst expressions for the embedding hot path.
  *
  * `zip_with`/`aggregate` lambdas are interpreted per element; for a
  * 100 TB corpus scan the dot product must live inside whole-stage
  * codegen. These are standard BinaryExpressions with `doGenCode`
  * emitting a tight primitive loop over the float arrays.
  */
abstract class VectorBinaryExpression extends BinaryExpression
    with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
}

/** Σ aᵢ·bᵢ in double precision (index-ordered, matching the DuckDB
  * oracle's sequential accumulation).
  */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}Acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}Acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

/** dot(a,b) / (‖a‖·‖b‖), one fused pass over both arrays. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

/** cosine(x, x) without the redundant dot/norm accumulators: 1.0 when
  * the vector has positive norm, NaN when it is empty or all-zero
  * (matching `CosineSimilarity`'s 0/0), null propagated. Produced by
  * the `SimplifySelfCosine` optimizer rule — never constructed by
  * users directly.
  */
case class SelfCosine(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var na = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      na += xi * xi
      i += 1
    }
    if (na > 0.0) 1.0 else Double.NaN
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val na = ctx.freshName("na")
      val xi = ctx.freshName("xi")
      s"""
         |int $n = $a.numElements();
         |double $na = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  $na += $xi * $xi;
         |}
         |${ev.value} = ($na > 0.0) ? 1.0 : Double.NaN;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(newChild)
}

/** Intersection of two SORTED distinct long arrays by a merge walk —
  * O(|a|+|b|) with no per-row hash-set allocation, vs Spark's
  * `array_intersect` which builds a hash set per call. The triangle
  * kernel's hot inner operation: adjacency lists arrive sorted from
  * `sort_array(collect_list(...))`, so the merge is exact. Inputs
  * MUST be sorted ascending and duplicate-free (the caller's
  * contract); output is sorted ascending.
  */
case class SortedIntersect(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.LongType),
      ArrayType(org.apache.spark.sql.types.LongType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n1 = x.numElements()
    val n2 = y.numElements()
    val tmp = new Array[Long](math.min(n1, n2))
    var i = 0
    var j = 0
    var k = 0
    while (i < n1 && j < n2) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { tmp(k) = xv; k += 1; i += 1; j += 1 }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(tmp, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val n1 = ctx.freshName("n1")
      val n2 = ctx.freshName("n2")
      val tmp = ctx.freshName("tmp")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n1 = $a.numElements();
         |int $n2 = $b.numElements();
         |long[] $tmp = new long[java.lang.Math.min($n1, $n2)];
         |int $i = 0; int $j = 0; int $k = 0;
         |while ($i < $n1 && $j < $n2) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { $tmp[$k] = $xv; $k++; $i++; $j++; }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(java.util.Arrays.copyOf($tmp, $k));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

/** [[SortedIntersect]] over int arrays — same merge-walk contract
  * (sorted ascending, distinct), half the bytes per element. The
  * triangle kernel's adjacency lists are node ids; when they fit in
  * 32 bits (the [[PackedPairs]] id contract) the int form halves the
  * one array-carrying exchange in the triangle plan.
  */
case class SortedIntersectInt(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.IntegerType),
      ArrayType(org.apache.spark.sql.types.IntegerType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n1 = x.numElements()
    val n2 = y.numElements()
    val tmp = new Array[Int](math.min(n1, n2))
    var i = 0
    var j = 0
    var k = 0
    while (i < n1 && j < n2) {
      val xv = x.getInt(i)
      val yv = y.getInt(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { tmp(k) = xv; k += 1; i += 1; j += 1 }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(tmp, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val n1 = ctx.freshName("n1")
      val n2 = ctx.freshName("n2")
      val tmp = ctx.freshName("tmp")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n1 = $a.numElements();
         |int $n2 = $b.numElements();
         |int[] $tmp = new int[java.lang.Math.min($n1, $n2)];
         |int $i = 0; int $j = 0; int $k = 0;
         |while ($i < $n1 && $j < $n2) {
         |  int $xv = $a.getInt($i);
         |  int $yv = $b.getInt($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { $tmp[$k] = $xv; $k++; $i++; $j++; }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(java.util.Arrays.copyOf($tmp, $k));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object VectorFunctions {
  def dot_f(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def cosine_f(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def sorted_intersect(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersect(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def sorted_intersect_int(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersectInt(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Register for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_cosine", exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
  }
}
