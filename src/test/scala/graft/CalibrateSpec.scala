package graft

import org.apache.spark.sql.functions._
import graft.ml.Calibrate

/** Isotonic calibration: PAV equals a naive fixpoint reference,
  * monotone output, end-to-end with the quality classifier.
  */
class CalibrateSpec extends SparkSpec {

  // naive PAV: repeatedly merge any adjacent violating pools until
  // the sequence of pooled means is non-decreasing
  private def naivePav(w0: Array[Double], s0: Array[Double]): Array[Double] = {
    var pools = w0.indices.map(i => (w0(i), s0(i), 1)).toList
    def mean(p: (Double, Double, Int)) =
      if (p._1 == 0) Double.NaN else p._2 / p._1
    var changed = true
    while (changed) {
      changed = false
      val out = scala.collection.mutable.ListBuffer.empty[(Double, Double, Int)]
      pools.foreach { p =>
        var cur = p
        while (out.nonEmpty && {
          val t = out.last
          t._1 == 0 || cur._1 == 0 || mean(t) > mean(cur)
        }) {
          val t = out.remove(out.size - 1)
          cur = (t._1 + cur._1, t._2 + cur._2, t._3 + cur._3)
          changed = true
        }
        out += cur
      }
      pools = out.toList
    }
    pools.toArray.flatMap { case (pw, ps, span) =>
      Array.fill(span)(if (pw == 0) 0.0 else ps / pw)
    }
  }

  test("pav equals the fixpoint reference on random weighted sequences") {
    val rnd = new scala.util.Random(23)
    (0 until 50).foreach { _ =>
      val b = 1 + rnd.nextInt(12)
      val w = Array.fill(b)(if (rnd.nextDouble() < 0.2) 0.0
        else (1 + rnd.nextInt(20)).toDouble)
      val s = w.map(wi => if (wi == 0) 0.0 else wi * rnd.nextDouble())
      val got = Calibrate.pav(w, s)
      val exp = naivePav(w, s)
      assert(got.toSeq == exp.toSeq, s"w=${w.toSeq} s=${s.toSeq}")
      // monotone non-decreasing
      got.sliding(2).foreach(p =>
        if (p.length == 2) assert(p(0) <= p(1) + 1e-12))
      // total mass preserved: sum of v*w = sum of s
      val mass = got.zip(w).map { case (v, wi) => v * wi }.sum
      assert(math.abs(mass - s.sum) < 1e-9)
    }
  }

  test("isotonicBins + applyBins: hand fixture and empty-bin inheritance") {
    import spark.implicits._
    // cuts (1,2,3): bin means 0.8, 0.2, (empty), 0.9 ->
    // PAV pools bins 1-2 (mean .5), empty bin 3 joins a pool, bin 4 .9
    val rows =
      Seq.fill(5)((0.5, 1.0)) ++ Seq.fill(5)((0.7, 0.6)) ++   // bin1: 8/10
      Seq.fill(10)((1.5, 0.2)) ++                              // bin2: 2/10
      Seq.fill(4)((9.0, 0.9))                                  // bin4
    val df = rows.zipWithIndex
      .map { case ((sc, p), i) => (i.toLong, sc, if (p >= 0.5) 1.0 else 0.0) }
      .toDF("id", "score", "label")
    // labels: bin1 10 rows label 1; bin2 0; bin4 1 -> means 1.0, 0.0, -, 1.0
    val cuts = Seq(1.0, 2.0, 3.0)
    val cal = Calibrate.isotonicBins(df, "score", "label", cuts)
    assert(cal.length == 4)
    // violation bins 1-2 pool to (10*1 + 10*0)/20 = 0.5
    assert(math.abs(cal(0) - 0.5) < 1e-12 && math.abs(cal(1) - 0.5) < 1e-12)
    assert(math.abs(cal(3) - 1.0) < 1e-12)
    // empty bin 3 inherited a neighboring pool's value, stays monotone
    assert(cal(2) >= cal(1) - 1e-12 && cal(2) <= cal(3) + 1e-12)

    val applied = df.withColumn("p",
        Calibrate.applyBins(col("score"), cuts, cal))
      .select("score", "p").distinct().collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(applied(0.5) == cal(0) && applied(1.5) == cal(1) &&
      applied(9.0) == cal(3))
    intercept[IllegalArgumentException](
      Calibrate.isotonicBins(df, "score", "label", Seq(2.0, 1.0)))
  }

  test("plattScale matches a driver GD replica and is monotone in the score") {
    import spark.implicits._
    // overconfident scores: high s mostly-positive, low s mostly-negative
    val rows = (0 until 200).map { i =>
      val s = i / 200.0
      val y = if ((i * 2654435761L % 97) / 97.0 < 0.2 + 0.6 * s) 1.0 else 0.0
      (i.toLong, s, y)
    }
    val (iters, lr) = (8, 2.0)
    // driver replica: identical update rule
    var (a, b) = (0.0, 0.0)
    def sg(z: Double) = 1.0 / (1.0 + math.exp(-z))
    for (_ <- 1 to iters) {
      val da = rows.map { case (_, s, y) => (sg(a * s + b) - y) * s }.sum / rows.size
      val db = rows.map { case (_, s, y) => sg(a * s + b) - y }.sum / rows.size
      a -= lr * da; b -= lr * db
    }
    val got = graft.ml.Calibrate.plattScale(
        rows.toDF("id", "s", "y"), "s", "y", iters, lr)
      .select("id", "s", "calibrated").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    rows.zip(got).foreach { case ((_, s, y), (_, _, p)) =>
      assert(math.abs(p - sg(a * s + b)) < 1e-9)
    }
    // sigmoid map ⇒ strictly monotone in s (a fit on this data is > 0)
    assert(a > 0)
    val ps = got.sortBy(_._2).map(_._3)
    assert(ps.zip(ps.tail).forall { case (x, y2) => x <= y2 })
    intercept[IllegalArgumentException](
      graft.ml.Calibrate.plattScale(rows.toDF("id", "s", "y"), "s", "y",
        iters = 0))
  }

  test("calibrating quality-model scores yields monotone probabilities with the base rate preserved") {
    import graft.ml.QualityModel
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val feats = QualityModel.featurize(docs, "text").persist()
    try {
      val w = QualityModel.trainOnFeatures(feats, iters = 3, lr = 0.5)
      val scored = QualityModel.scoreOnFeatures(feats, w)
        .select(col("score"), col("label"))
      val cuts = (1 to 9).map(_ / 10.0)
      val cal = Calibrate.isotonicBins(scored, "score", "label", cuts)
      cal.sliding(2).foreach(p =>
        if (p.length == 2) assert(p(0) <= p(1) + 1e-12))
      assert(cal.forall(v => v >= 0.0 && v <= 1.0))
      // weighted mean of calibrated probs = corpus base rate
      val stats = scored.agg(count(lit(1)).cast("double"), sum("label"))
        .head()
      val baseRate = stats.getDouble(1) / stats.getDouble(0)
      val calMean = scored.withColumn("p",
          Calibrate.applyBins(col("score"), cuts, cal))
        .agg(avg("p")).head().getDouble(0)
      assert(math.abs(calMean - baseRate) < 1e-9, s"$calMean vs $baseRate")
    } finally feats.unpersist(blocking = false)
  }
  test("ece: weighted gap average, MCE max, perfect calibration = 0") {
    import spark.implicits._
    // bin 1 (<=0.5): scores 0.2/0.4 (mean .3), rate 0.5 -> gap 0.2, n=2
    // bin 2 (>0.5):  scores 0.8 x2  (mean .8), rate 1.0 -> gap 0.2, n=2
    val df = Seq((0.2, 0), (0.4, 1), (0.8, 1), (0.8, 1)).toDF("p", "y")
    val r = Calibrate.ece(df, "p", "y", Seq(0.5)).head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L)
    assert(math.abs(r.getDouble(2) - 0.2) < 1e-12)
    assert(math.abs(r.getDouble(3) - 0.2) < 1e-12)
    // perfectly calibrated degenerate scores
    val ok = Seq((1.0, 1), (1.0, 1), (0.0, 0)).toDF("p", "y")
    val r2 = Calibrate.ece(ok, "p", "y", Seq(0.5)).head()
    assert(r2.getDouble(2) == 0.0 && r2.getDouble(3) == 0.0)
  }

}
