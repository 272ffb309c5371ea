package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form linear / ridge regression over scan-time features —
  * the workhorse "fit a line to telemetry" next to
  * [[QualityModel]]'s iterative logistic: for d features the normal
  * equations (ZᵀZ + λI′)β = Zᵀy (Z = [1, x], I′ not penalizing the
  * intercept — the standard convention) are EXACT, so one pass
  * replaces gradient descent entirely.
  *
  * 100 TB shape: the only distributed work is ONE map-side-combined
  * aggregate producing the (d+1)²+(d+1)+1 moment buffer — the
  * [[Pca]] moments discipline; the (d+1)×(d+1) solve is driver-local
  * (d ≤ ~1k by contract), scoring is a codegen'd literal-weight
  * Column. Rank deficiency without ridge (λ = 0, collinear features)
  * throws rather than returning a silently unstable fit.
  */
object Regression {

  /** weights aligned with featureCols; prediction = intercept + w·x. */
  final case class Model(intercept: Double, weights: Array[Double],
      lambda: Double)

  /** One-pass normal-equation moments + driver Gauss–Jordan solve. */
  def ridgeFit(df: DataFrame, featureCols: Seq[String],
      labelCol: String, lambda: Double = 0.0): Model = {
    require(featureCols.nonEmpty, "need at least one feature")
    require(featureCols.size <= 1000,
      s"ridgeFit: ${featureCols.size} features exceeds the d <= 1000 " +
        "driver-solve contract (the normal-equation solve is O(d^3) " +
        "on the driver) - reduce dimensionality first")
    require(lambda >= 0, s"lambda must be >= 0, got $lambda")
    val d = featureCols.size + 1 // [1, x...]
    val spark = df.sparkSession
    import spark.implicits._
    val cols = featureCols.map(c => col(c).cast("double")) :+
      col(labelCol).cast("double")
    val m = df.select(array(cols: _*).as("v")).as[Array[Double]]
      .mapPartitions { it =>
        // buffer = [n, Zᵀy (d), ZᵀZ upper triangle (d(d+1)/2)]
        val acc = new Array[Double](1 + d + d * (d + 1) / 2)
        val z = new Array[Double](d)
        var any = false
        it.foreach { row =>
          any = true
          z(0) = 1.0
          var i = 0
          while (i < d - 1) { z(i + 1) = row(i); i += 1 }
          val y = row(d - 1)
          acc(0) += 1.0
          i = 0
          var t = 1 + d
          while (i < d) {
            acc(1 + i) += z(i) * y
            var j = i
            while (j < d) { acc(t) += z(i) * z(j); j += 1; t += 1 }
            i += 1
          }
        }
        if (any) Iterator.single(acc) else Iterator.empty
      }
      .reduce { (a, b) =>
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
    // expand to the full symmetric system, add the ridge (skip the
    // intercept diagonal), then Gauss–Jordan with partial pivoting
    val aMat = Array.ofDim[Double](d, d)
    var t = 1 + d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        aMat(i)(j) = m(t); aMat(j)(i) = m(t); j += 1; t += 1
      }
      i += 1
    }
    i = 1
    while (i < d) { aMat(i)(i) += lambda; i += 1 }
    val b = Array.tabulate(d)(k => m(1 + k))
    var colIdx = 0
    while (colIdx < d) {
      var p = colIdx
      var r = colIdx + 1
      while (r < d) {
        if (math.abs(aMat(r)(colIdx)) > math.abs(aMat(p)(colIdx))) p = r
        r += 1
      }
      if (math.abs(aMat(p)(colIdx)) < 1e-12 * math.max(1.0, m(0)))
        throw new IllegalStateException(
          "ridgeFit: singular normal equations (collinear features " +
            "with lambda = 0) — add ridge or drop a feature")
      if (p != colIdx) {
        val tmp = aMat(p); aMat(p) = aMat(colIdx); aMat(colIdx) = tmp
        val tb = b(p); b(p) = b(colIdx); b(colIdx) = tb
      }
      val piv = aMat(colIdx)(colIdx)
      var j = colIdx
      while (j < d) { aMat(colIdx)(j) /= piv; j += 1 }
      b(colIdx) /= piv
      r = 0
      while (r < d) {
        if (r != colIdx) {
          val f = aMat(r)(colIdx)
          if (f != 0.0) {
            var j2 = colIdx
            while (j2 < d) { aMat(r)(j2) -= f * aMat(colIdx)(j2); j2 += 1 }
            b(r) -= f * b(colIdx)
          }
        }
        r += 1
      }
      colIdx += 1
    }
    Model(b(0), b.drop(1), lambda)
  }

  /** Prediction as a codegen'd literal-weight Column program. */
  def predictCol(featureCols: Seq[String], model: Model): Column = {
    require(featureCols.size == model.weights.length, "arity mismatch")
    featureCols.zip(model.weights).foldLeft(lit(model.intercept)) {
      case (acc, (c, w)) => acc + col(c).cast("double") * w
    }
  }

  /** R² + error report of a fitted model over a (possibly different)
    * dataset: one aggregate — SS_res, SS_tot (population), n.
    */
  def r2Report(df: DataFrame, featureCols: Seq[String],
      labelCol: String, model: Model): DataFrame = {
    val y = col(labelCol).cast("double")
    val pred = predictCol(featureCols, model)
    df.select(y.as("y"), pred.as("p"))
      .agg(count(lit(1)).as("n"),
        sum((col("y") - col("p")) * (col("y") - col("p"))).as("ss_res"),
        (sum(col("y") * col("y")) -
          sum(col("y")) * sum(col("y")) / count(lit(1))).as("ss_tot"))
      .select(col("n"), col("ss_res"), col("ss_tot"),
        when(col("ss_tot") > 0,
          lit(1.0) - col("ss_res") / col("ss_tot")).as("r2"))
  }
}
