package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A trainable document-quality classifier — the model-based stage
  * that follows rule filters in public pipelines (CCNet's fasttext
  * wiki-vs-crawl scorer, LLaMA's "looks like a reference" classifier).
  * Here: logistic regression over the cheap scan-time text features,
  * trained by full-batch gradient descent with distant-supervision
  * labels from the rule heuristics.
  *
  * Scale shape: each GD iteration is ONE map-side-partial aggregation
  * producing d+1 doubles (d = feature count) — the corpus is scanned
  * `iters` times, nothing corpus-sized ever shuffles, and the model
  * rides into the scoring scan as literals inside a codegen'd Column
  * expression. At 100 TB the feature pass can also be cached/
  * checkpointed once and the tiny feature table re-aggregated per
  * iteration instead (see [[trainOnFeatures]] — `featurize` output is
  * reusable).
  *
  * Determinism: fixed iteration count and learning rate, no sampling,
  * float64 throughout — the whole trainer is replayable as unrolled
  * SQL, which is how the correctness gate oracles it.
  */
object QualityModel {

  /** Feature names, in weight order: bias first. */
  val featureNames: Seq[String] =
    Seq("f_bias", "f_words", "f_mwl", "f_stop", "f_punct")

  /** One codegen'd pass: scan-time features plus the heuristic
    * distant-supervision label (top quality bucket = positive). The
    * word count is scaled to O(1) so one learning rate suits every
    * dimension.
    */
  def featurize(docs: DataFrame, textCol: String,
      labelThreshold: Double = 0.9): DataFrame = {
    val text = col(textCol)
    val toks = TextAnalysis.tokens(text)
    docs
      .withColumn("__toks", toks)
      .withColumn("f_bias", lit(1.0))
      .withColumn("f_words", size(col("__toks")).cast("double") / 100.0)
      .withColumn("f_mwl", TextAnalysis.meanWordLengthOf(col("__toks")))
      .withColumn("f_stop", TextAnalysis.stopwordRatioOf(col("__toks")))
      .withColumn("f_punct", TextAnalysis.punctRatio(text))
      .withColumn("label",
        when(TextAnalysis.qualityFromComponents(
          size(col("__toks")), col("f_mwl"), col("f_stop"),
          col("f_punct")) >= labelThreshold, 1.0).otherwise(0.0))
      .drop("__toks")
  }

  private def dot(ws: Array[Double]): Column =
    featureNames.zip(ws).map { case (f, w) => col(f) * w }
      .reduce(_ + _)

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** Full-batch GD on a featurized table: w ← w − lr · Xᵀ(σ(Xw) − y)/n.
    * One d+1-double aggregate per iteration; the driver applies the
    * update (the `readAtSubmitter` idiom — the aggregate IS the
    * convergence data, there is nothing distributed to keep).
    */
  def trainOnFeatures(feats: DataFrame, iters: Int = 3,
      lr: Double = 0.5): Array[Double] = {
    var w = Array.fill(featureNames.size)(0.0)
    var i = 0
    while (i < iters) {
      val err = sigmoid(dot(w)) - col("label")
      val sums = feats.agg(
        count(lit(1)).cast("double").as("n"),
        featureNames.map(f => sum(err * col(f)).as(s"g_$f")): _*)
        .head()
      val n = sums.getDouble(0)
      // an empty training set yields NULL gradient sums — fail loudly
      // instead of NPEing inside the update (an upstream filter that
      // annihilated the corpus is a pipeline bug, not a model state)
      require(n > 0, "QualityModel.trainOnFeatures: empty training set")
      w = w.zipWithIndex.map { case (wk, k) =>
        wk - lr * sums.getDouble(k + 1) / n
      }
      i += 1
    }
    w
  }

  /** Featurize + train in one call. */
  def train(docs: DataFrame, textCol: String, iters: Int = 3,
      lr: Double = 0.5, labelThreshold: Double = 0.9): Array[Double] =
    trainOnFeatures(featurize(docs, textCol, labelThreshold), iters, lr)

  /** Score a featurized table with a trained model: the weights are
    * literals in one codegen'd expression — a model application over
    * 100 TB is just a scan.
    */
  def scoreOnFeatures(feats: DataFrame, weights: Array[Double]): DataFrame =
    feats.withColumn("score", sigmoid(dot(weights)))

  /** Featurize + score raw documents with a trained model. */
  def score(docs: DataFrame, textCol: String,
      weights: Array[Double]): DataFrame =
    scoreOnFeatures(featurize(docs, textCol), weights)

  /** Smoothed target (mean) encoding of a categorical column — the
    * standard high-cardinality categorical feature for the quality/
    * preference models here (domain, source, language): encoded =
    * (Σ label_in_category + prior·smoothing) / (n_category +
    * smoothing), shrinking rare categories toward the global prior.
    * `loo = true` excludes each row's OWN label (leave-one-out), the
    * leakage-safe variant for training folds; categories of size 1
    * then fall back to the pure prior.
    *
    * Returns the input plus `(catCol)_te`. Scale shape: one category
    * hash aggregate + a broadcast 1-row prior, joined back on the
    * category key; LOO is per-row arithmetic on the joined totals —
    * no second scan, no window.
    */
  def targetEncode(df: DataFrame, catCol: String, labelCol: String,
      smoothing: Double = 20.0, loo: Boolean = false): DataFrame = {
    require(smoothing >= 0, s"smoothing must be >= 0, got $smoothing")
    val y = col(labelCol).cast("double")
    val stats = df.groupBy(col(catCol))
      .agg(sum(y).as("__sum"), count(lit(1)).as("__n"))
    val prior = df.agg((sum(y) / count(lit(1))).as("__prior"))
    val joined = df.join(broadcast(prior))
      .join(stats, Seq(catCol), "left")
    val (num, den) =
      if (loo) (col("__sum") - y, col("__n") - 1)
      else (col("__sum"), col("__n"))
    joined.withColumn(s"${catCol}_te",
        when(den + smoothing > 0,
          (num + col("__prior") * smoothing) / (den + smoothing))
          .otherwise(col("__prior")))
      .drop("__sum", "__n", "__prior")
  }
}
