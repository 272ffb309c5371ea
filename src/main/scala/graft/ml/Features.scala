package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-engineering primitives for training classical models
  * (quality scorers, rerankers, propensity models) straight off the
  * corpus — the step between raw text/categories and
  * [[QualityModel]]/[[Softmax]] training. Everything is hash
  * aggregation over (doc, feature) keys; the hashing is md5-prefix
  * based so any engine replays it bit-for-bit (the
  * [[Privacy]] seeded-noise idiom — xxhash64 has no DuckDB
  * counterpart).
  */
object Features {

  private def toks(c: Column): Column =
    filter(split(TextAnalysis.normalize(c), " "), t => length(t) > 0)

  /** Deterministic 32-bit hash of a token: the first 8 md5 hex chars
    * as an integer — engine-portable, unlike xxhash64/murmur.
    */
  def tokenHash(t: Column): Column =
    conv(substring(md5(t), 1, 8), 16, 10).cast("long")

  /** Signed feature hashing (the "hashing trick", Weinberger et al.
    * 2009): token counts folded into a fixed `dim`-wide space at
    * bucket = hash mod dim, with a ±1 sign from the hash's 9th hex
    * char so colliding tokens cancel in expectation instead of
    * biasing the bucket upward. Returns sparse (id, idx, value)
    * triples (zero buckets absent, exact-zero cancellations kept —
    * the oracle must see identical rows).
    *
    * Scale shape: one explode + one (id, idx) hash aggregate; the
    * vector space never materializes densely.
    */
  def featureHash(df: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame = {
    require(dim >= 2, "dim must be >= 2")
    val tok = df.select(col(idCol).as("id"),
      explode(toks(col(textCol))).as("t"))
    tok
      .withColumn("idx", pmod(tokenHash(col("t")), lit(dim)))
      .withColumn("sign",
        when(substring(md5(col("t")), 9, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7"), 1L)
          .otherwise(-1L))
      .groupBy("id", "idx")
      .agg(sum("sign").as("value"))
  }

  /** Mutual information (nats) between token PRESENCE and a document
    * label — the classic filter-method feature ranking for
    * label-discriminative vocabulary (which tokens identify a
    * language / source / quality tier). For each token the 2×L
    * contingency table over (present, label) is assembled from
    * distinct-presence counts; absent cells derive as n_label −
    * present, so the corpus is scanned once. 0·log(0) cells
    * contribute 0. Returns (token, doc_freq, mi).
    *
    * Scale shape: one distinct (doc, token) explode → (token, label)
    * hash counts → broadcast label totals; per-token arithmetic over
    * L cells.
    */
  def tokenLabelMI(df: DataFrame, idCol: String, textCol: String,
      labelCol: String): DataFrame = {
    val docTok = df.select(col(idCol).as("id"),
        col(labelCol).cast("string").as("lab"),
        explode(array_distinct(toks(col(textCol)))).as("t"))
    val present = docTok.groupBy("t", "lab").agg(count(lit(1)).as("a"))
    val labTot = df.groupBy(col(labelCol).cast("string").as("lab"))
      .agg(count(lit(1)).as("nl"))
    val n = df.count().toDouble
    // a token×label grid with zero-present cells restored (a token
    // absent from a label still has an absent-cell contribution)
    val tokens = present.groupBy("t").agg(sum("a").as("nt"))
    val grid = tokens.crossJoin(broadcast(labTot))
      .join(present, Seq("t", "lab"), "left")
      .select(col("t"), col("nt"), col("nl"),
        coalesce(col("a"), lit(0L)).as("a"))
    def term(cell: Column, rowTot: Column, colTot: Column): Column = {
      val p = cell.cast("double") / n
      val e = (rowTot.cast("double") / n) * (colTot.cast("double") / n)
      when(cell > 0, p * log(p / e)).otherwise(0.0)
    }
    grid
      .select(col("t"), col("nt"),
        (term(col("a"), col("nt"), col("nl")) +
          term(col("nl") - col("a"), lit(n) - col("nt"), col("nl")))
          .as("cell_mi"))
      .groupBy("t")
      .agg(first("nt").as("doc_freq"), sum("cell_mi").as("mi"))
      .select(col("t").as("token"), col("doc_freq"), col("mi"))
  }

  /** Weight-of-evidence encoding + information value per category
    * (the credit-scoring standard for categorical→numeric encoding
    * with a built-in predictiveness measure): WOE_i =
    * ln(((good_i + 0.5)/G) / ((bad_i + 0.5)/B)) with the ±0.5
    * Laplace guard for empty cells, IV_i = (good%_i − bad%_i)·WOE_i
    * using the same smoothed shares. Returns
    * (category, n, good, bad, woe, iv).
    *
    * Scale shape: one category hash aggregate + one broadcast of the
    * 1-row totals.
    */
  def woeEncode(df: DataFrame, catCol: String, labelCol: String)
      : DataFrame = {
    val per = df.select(col(catCol).as("category"),
        col(labelCol).cast("int").as("y"))
      .groupBy("category")
      .agg(count(lit(1)).as("n"), sum("y").cast("long").as("good"))
      .withColumn("bad", col("n") - col("good"))
    val tot = per.agg(sum("good").as("gt"), sum("bad").as("bt"))
    per.crossJoin(broadcast(tot))
      .withColumn("gshare",
        (col("good") + lit(0.5)) / col("gt").cast("double"))
      .withColumn("bshare",
        (col("bad") + lit(0.5)) / col("bt").cast("double"))
      .withColumn("woe", log(col("gshare") / col("bshare")))
      .withColumn("iv", (col("gshare") - col("bshare")) * col("woe"))
      .select("category", "n", "good", "bad", "woe", "iv")
  }

  /** Skip-gram (center, context) training pairs with word2vec's
    * frequent-word subsampling (Mikolov et al. 2013 eq. 5 as
    * published: P(keep w) = √(t/f(w)) + t/f(w), clipped to 1) — the
    * pair generator feeding any embedding trainer. Subsampling is
    * decided PER TOKEN OCCURRENCE with the deterministic md5 coin
    * md5(doc|pos) (replayable anywhere, no RNG state), and a dropped
    * occurrence disappears as BOTH center and context — the paper's
    * semantics, which shrinks effective windows around frequent
    * words rather than merely dropping their centers. Window is
    * symmetric ±window over the SURVIVING token sequence.
    *
    * Scale shape: one tokenize scan + one frequency aggregate
    * (broadcast back), the keep-filter, a per-doc surviving-position
    * renumber window, then the offset-join pair build (the PPMI
    * machinery) — pairs ≤ 2·window per surviving token, never
    * quadratic.
    */
  def skipGramPairs(df: DataFrame, idCol: String, textCol: String,
      window: Int, subsampleT: Double = 1e-3): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(subsampleT > 0, s"subsampleT must be positive")
    val toks = graft.core.PipelineCaches.persistTracked(
      df.select(col(idCol).as("doc"),
          posexplode(split(TextAnalysis.normalize(col(textCol)), " "))
            .as(Seq("pos", "w")))
        .filter(length(col("w")) > 0))
    val tot = toks.agg(count(lit(1)).cast("double").as("nt"))
    val freq = toks.groupBy("w").agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(tot))
      .select(col("w"), (col("c") / col("nt")).as("f"))
    // md5 coin in [0,1): first 8 hex digits / 2^32
    val u = conv(substring(md5(concat_ws("|",
      col("doc").cast("string"), col("pos").cast("string"))), 1, 8),
      16, 10).cast("double") / 4294967296.0
    val keepP = least(lit(1.0),
      sqrt(lit(subsampleT) / col("f")) + lit(subsampleT) / col("f"))
    val survivors = graft.core.PipelineCaches.persistTracked(
      toks.join(broadcast(freq), "w")
        .filter(u < keepP)
        .withColumn("spos", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("doc").orderBy("pos")))
        .select("doc", "spos", "w"))
    // offset-exploded EQUI join (the PPMI machinery): never a range
    // condition, so the pair build stays a hash join
    val offs = (-window to window).filter(_ != 0).toArray
    val withOff = survivors
      .select(col("doc"), col("spos"), col("w").as("center"),
        explode(lit(offs)).as("offset"))
      .withColumn("cpos", col("spos") + col("offset"))
    withOff.join(survivors.select(col("doc"),
        col("spos").as("cpos"), col("w").as("context")),
      Seq("doc", "cpos"))
      .select(col("doc"), col("spos").as("pos"), col("center"),
        col("context"), col("offset"))
  }

  /** Unigram^power negative-sampling table (word2vec's 0.75
    * smoothing): (word, count, prob) with prob normalized over the
    * vocabulary — the draw distribution every negative sampler needs
    * precomputed. One token scan + one vocab-sized normalization.
    */
  def negativeSamplingTable(df: DataFrame, textCol: String,
      power: Double = 0.75): DataFrame = {
    require(power > 0 && power <= 1, s"power in (0,1], got $power")
    val counts = graft.core.PipelineCaches.persistTracked(
      df.select(explode(split(TextAnalysis.normalize(col(textCol)),
          " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("c")))
    val z = counts.agg(sum(pow(col("c").cast("double"), power)).as("z"))
    counts.crossJoin(broadcast(z))
      .select(col("w").as("word"), col("c").as("count"),
        (pow(col("c").cast("double"), power) / col("z")).as("prob"))
  }
}
