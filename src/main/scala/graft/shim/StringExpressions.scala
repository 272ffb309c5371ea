package org.apache.spark.sql.graft

// Hosted inside org.apache.spark.sql for the same reason as
// VectorExpressions: ExpressionUtils / AbstractDataType are
// private[sql].

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro and Jaro–Winkler similarity, the record-linkage verify
  * kernel. Spark has `levenshtein` but no Jaro family; this is the
  * standard definition (match window ⌊max/2⌋−1, transpositions =
  * half the out-of-order matches, Winkler boost p=0.1 over the ≤4
  * common-prefix chars applied only when jaro > 0.7) — byte-for-byte
  * the semantics of DuckDB's `jaro_winkler_similarity`, including
  * the empty-string → 0.0 convention, which the oracle gate pins.
  */
object JaroWinklerUtil {

  /** Plain Jaro similarity in [0, 1]; 0.0 if either side is empty. */
  def jaro(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString
    val t = b.toString
    val la = s.length
    val lb = t.length
    if (la == 0 || lb == 0) return 0.0
    if (s == t) return 1.0
    val window = math.max(la, lb) / 2 - 1
    val sMatched = new Array[Boolean](la)
    val tMatched = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatched(j) && s.charAt(i) == t.charAt(j)) {
          sMatched(i) = true
          tMatched(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var halfT = 0
    var k = 0
    i = 0
    while (i < la) {
      if (sMatched(i)) {
        while (!tMatched(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) halfT += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    (md / la + md / lb + (md - halfT / 2.0) / md) / 3.0
  }

  /** Jaro–Winkler: [[jaro]] plus the common-prefix boost. */
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    val s = a.toString
    val t = b.toString
    val maxP = math.min(4, math.min(s.length, t.length))
    var l = 0
    while (l < maxP && s.charAt(l) == t.charAt(l)) l += 1
    j + 0.1 * l * (1.0 - j)
  }
}

case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType,
      org.apache.spark.sql.types.StringType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerUtil.similarity(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  // one static call inside whole-stage codegen — the loop lives in
  // compiled bytecode either way, so the generated code stays tiny
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.JaroWinklerUtil" +
        s".similarity($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object StringFunctions {
  def jaro_winkler(a: Column, b: Column): Column =
    ExpressionUtils.column(JaroWinkler(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Register for SQL use (`jaro_winkler(a, b)`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler", exprs => JaroWinkler(exprs(0), exprs(1)), "scala_udf")
}
