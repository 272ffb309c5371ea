package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multiclass softmax (multinomial logistic) classifier trained by
  * exact full-batch gradient descent — the K-class companion to
  * [[QualityModel]]'s binary trainer, for learned DOMAIN/LANGUAGE
  * routing (the fastText-classifier role in CCNet/FineWeb-style
  * pipelines, here with scan-time features and engine-replayable
  * arithmetic instead of an external model binary).
  *
  * Exactly like the binary trainer, each GD iteration is ONE tiny
  * aggregate: the current weights are baked into the scan as codegen'd
  * literals, the per-row class probabilities are a max-subtracted
  * softmax Column program, and the K·D gradient sums come back in a
  * single K·D-column row — per iteration the corpus is scanned once
  * and nothing but a K·D-double vector reaches the driver. Scoring is
  * a pure Column program (no UDF, no shuffle).
  *
  * Deterministic: full-batch (no sampling, no row order dependence —
  * `sum` of doubles is the one FP-order-sensitive step, and scores
  * are rounded at the gate like every other FP gate in the suite).
  */
object Softmax {

  /** z_k = Σ_d w(k)(d)·f_d as literal-weight Columns, one per class. */
  private def logits(weights: Array[Array[Double]],
      featureCols: Seq[String]): Seq[Column] =
    weights.toSeq.map { wk =>
      wk.zip(featureCols).map { case (w, f) => lit(w) * col(f) }
        .reduce(_ + _)
    }

  /** Max-subtracted softmax probabilities p_0..p_{K-1} (numerically
    * stable, and bit-replayable by any engine with greatest/exp).
    */
  private def probs(weights: Array[Array[Double]],
      featureCols: Seq[String]): Seq[Column] = {
    val zs = logits(weights, featureCols)
    val zMax = if (zs.size == 1) zs.head else greatest(zs: _*)
    val es = zs.map(z => exp(z - zMax))
    val tot = es.reduce(_ + _)
    es.map(_ / tot)
  }

  /** Train K-class weights over `featureCols` with labels in
    * `labelCol` ∈ {0..k-1}. Returns a k × |featureCols| weight
    * matrix; `iters` full-batch GD steps at learning rate `lr` from
    * zero initialization. One corpus scan per iteration.
    */
  def train(feats: DataFrame, featureCols: Seq[String], labelCol: String,
      k: Int, iters: Int = 3, lr: Double = 1.0): Array[Array[Double]] = {
    require(k >= 2, "k must be at least 2")
    require(featureCols.nonEmpty, "featureCols must be non-empty")
    require(iters >= 0 && lr > 0, "iters must be >= 0 and lr positive")
    var w = Array.fill(k, featureCols.size)(0.0)
    var i = 0
    while (i < iters) {
      val ps = probs(w, featureCols)
      val gradCols = for {
        ki <- 0 until k
        f <- featureCols
      } yield sum(
        (ps(ki) - when(col(labelCol) === ki, 1.0).otherwise(0.0)) *
          col(f)).as(s"g_${ki}_$f")
      val row = feats.agg(count(lit(1)).cast("double").as("n"),
        gradCols: _*).head()
      val n = row.getDouble(0)
      w = Array.tabulate(k, featureCols.size) { (ki, d) =>
        w(ki)(d) - lr * row.getDouble(1 + ki * featureCols.size + d) / n
      }
      i += 1
    }
    w
  }

  /** Score with a trained weight matrix: appends `p_0..p_{k-1}`
    * (softmax probabilities) and `pred` (argmax class, ties to the
    * lowest class id) as pure Column expressions.
    */
  def score(feats: DataFrame, featureCols: Seq[String],
      weights: Array[Array[Double]]): DataFrame = {
    val ps = probs(weights, featureCols)
    val withP = ps.zipWithIndex.foldLeft(feats) { case (df, (p, ki)) =>
      df.withColumn(s"p_$ki", p)
    }
    // argmax with ties to the lowest class: class ki wins iff its p
    // is strictly greater than every earlier class's and >= every
    // later class's
    val pred = ps.indices.map { ki =>
      val beatsEarlier = (0 until ki)
        .map(j => col(s"p_$ki") > col(s"p_$j"))
        .foldLeft(lit(true))(_ && _)
      val holdsLater = (ki + 1 until ps.size)
        .map(j => col(s"p_$ki") >= col(s"p_$j"))
        .foldLeft(lit(true))(_ && _)
      (ki, beatsEarlier && holdsLater)
    }.foldRight(lit(ps.size - 1)) { case ((ki, cond), acc) =>
      when(cond, ki).otherwise(acc)
    }
    withP.withColumn("pred", pred.cast("int"))
  }

  /** [[QualityModel]]'s scan-time features plus a 3-way quality-TIER
    * label `y` (0 = low / 1 = mid / 2 = high, thresholded at `lo` and
    * `hi` on the same composite score the binary model thresholds
    * once) — multiclass distant supervision for tiered routing (keep
    * / down-weight / drop) instead of a single keep gate.
    */
  def qualityTierFeaturize(docs: DataFrame, textCol: String,
      lo: Double = 0.6, hi: Double = 0.9): DataFrame = {
    val text = col(textCol)
    val toks = TextAnalysis.tokens(text)
    val composite = TextAnalysis.qualityFromComponents(
      size(col("__toks")), col("f_mwl"), col("f_stop"), col("f_punct"))
    docs
      .withColumn("__toks", toks)
      .withColumn("f_bias", lit(1.0))
      .withColumn("f_words", size(col("__toks")).cast("double") / 100.0)
      .withColumn("f_mwl", TextAnalysis.meanWordLengthOf(col("__toks")))
      .withColumn("f_stop", TextAnalysis.stopwordRatioOf(col("__toks")))
      .withColumn("f_punct", TextAnalysis.punctRatio(text))
      .withColumn("y",
        when(composite >= hi, 2).when(composite >= lo, 1).otherwise(0))
      .drop("__toks")
  }

  /** Scan-time language features over a text column — cheap
    * character-class and stopword evidence that linearly separates
    * the corpus languages (the learned counterpart of
    * [[TextAnalysis.languageId]]'s fixed-rule scoring). All pure
    * Column programs; char-class fractions use code-point counts so
    * multi-byte scripts measure identically across engines.
    * Appends f_bias, f_cjk, f_fr, f_de, f_es, f_en_stop.
    */
  val langFeatureCols: Seq[String] =
    Seq("f_bias", "f_cjk", "f_fr", "f_de", "f_es", "f_en_stop")

  def langFeaturize(docs: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    val nChars = greatest(length(text), lit(1)).cast("double")
    def classFrac(pattern: String): Column =
      (length(text) -
        length(regexp_replace(text, pattern, ""))).cast("double") / nChars
    val toks = TextAnalysis.tokens(text)
    val nToks = greatest(size(toks), lit(1)).cast("double")
    val enStop = Seq("the", "and", "of", "to", "is", "that", "it",
      "with", "for", "was")
    docs
      .withColumn("f_bias", lit(1.0))
      .withColumn("f_cjk", classFrac("[一-鿿]"))
      .withColumn("f_fr", classFrac("[àâçèéêëîïôùûœ]"))
      .withColumn("f_de", classFrac("[äöüß]"))
      .withColumn("f_es", classFrac("[áíóúñ¿¡]"))
      .withColumn("f_en_stop",
        size(filter(toks, t => lower(t).isin(enStop: _*))).cast("double") /
          nToks)
  }
}
