package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model- and ranking-evaluation metrics over pipeline outputs: the
  * numbers a training-data team reads before trusting a quality
  * classifier (ROC AUC, average precision), a retrieval index
  * (NDCG@k), or a labeling workflow (Cohen's kappa). All are exact
  * closed forms computed with aggregates and bounded windows — no
  * per-row driver work, no sampling.
  */
object Eval {

  /** ROC AUC via the Mann–Whitney U statistic with midrank tie
    * handling — the exact area under the ROC curve, identical to the
    * trapezoidal integral over the empirical curve. `labelCol` must
    * be 0/1 (or boolean); `scoreCol` any orderable numeric. Returns
    * one row (n_pos, n_neg, auc); `auc` is NULL when either class is
    * empty.
    *
    * Scale shape: one hash aggregate collapses the scan to DISTINCT
    * scores (each carrying total/positive counts), then a running-sum
    * window over that score table assigns midranks. The window is
    * single-partition but over the SCORE VOCABULARY, not the corpus —
    * for calibrated model scores rounded to a few decimals that is
    * thousands of rows regardless of input size (the same
    * vocab-window tradeoff [[TextAnalysis.zipfFit]] documents).
    */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val lab = col(labelCol).cast("int")
    val byScore = df.select(col(scoreCol).as("s"), lab.as("y"))
      .groupBy("s").agg(count(lit(1)).as("n"), sum("y").as("p"))
    val before = coalesce(sum("n").over(Window.orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    // midrank of a tie block starting after `before` rows with n
    // members = before + (n+1)/2; U = sum of positive midranks
    byScore
      .withColumn("midrank", before + (col("n") + 1) / 2.0)
      .agg(sum("p").as("n_pos"), (sum("n") - sum("p")).as("n_neg"),
        sum(col("p") * col("midrank")).as("rank_sum"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          (col("rank_sum") - col("n_pos") * (col("n_pos") + 1) / 2.0) /
            (col("n_pos") * col("n_neg"))).as("auc"))
  }

  /** Average precision (area under the precision–recall curve, step
    * convention) with ties grouped: score blocks are taken whole in
    * descending-score order, each block contributing its recall mass
    * at the block-end precision. Equals the classic
    * Σ P(k)·Δrel(k) / n_pos when scores are distinct. Returns one row
    * (n_pos, ap); NULL ap when there are no positives.
    *
    * Same scale shape as [[rocAuc]]: the window runs over distinct
    * scores only.
    */
  def averagePrecision(df: DataFrame, scoreCol: String,
      labelCol: String): DataFrame = {
    val lab = col(labelCol).cast("int")
    val byScore = df.select(col(scoreCol).as("s"), lab.as("y"))
      .groupBy("s").agg(count(lit(1)).as("n"), sum("y").as("p"))
    val w = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    byScore
      .withColumn("cum_n", sum("n").over(w))
      .withColumn("cum_p", sum("p").over(w))
      .agg(sum("p").as("n_pos"),
        sum(col("p") * col("cum_p") / col("cum_n")).as("wsum"))
      .select(col("n_pos"),
        when(col("n_pos") > 0, col("wsum") / col("n_pos")).as("ap"))
  }

  /** NDCG@k per query: rank items by `scoreCol` descending (ties
    * broken by `itemCol` ascending so every engine ranks
    * identically), gain = graded `relCol` (identity gain — use
    * 2^rel−1 upstream if exponential gain is wanted), discount =
    * 1/log2(rank+1). The ideal ordering re-ranks the SAME candidate
    * set by relevance, so ndcg ≤ 1 and = 1 iff the predicted order is
    * relevance-sorted. Returns (query, dcg, idcg, ndcg); ndcg is NULL
    * when idcg = 0 (no relevant candidates).
    *
    * Scale shape: one exchange on the query key, two in-partition
    * sorts (predicted + ideal rank), one aggregate — per-query state
    * is the candidate list the caller already materialized (top-k
    * sized, bounded).
    */
  def ndcgAtK(df: DataFrame, queryCol: String, itemCol: String,
      scoreCol: String, relCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val wPred = Window.partitionBy(queryCol)
      .orderBy(col(scoreCol).desc, col(itemCol).asc)
    val wIdeal = Window.partitionBy(queryCol)
      .orderBy(col(relCol).desc, col(itemCol).asc)
    def gainAt(rank: org.apache.spark.sql.Column) =
      when(rank <= k,
        col(relCol).cast("double") / log2(rank.cast("double") + 1.0))
        .otherwise(0.0)
    df.select(col(queryCol), col(itemCol), col(scoreCol), col(relCol))
      .withColumn("g_pred", gainAt(row_number().over(wPred)))
      .withColumn("g_ideal", gainAt(row_number().over(wIdeal)))
      .groupBy(col(queryCol).as("query"))
      .agg(sum("g_pred").as("dcg"), sum("g_ideal").as("idcg"))
      .select(col("query"), col("dcg"), col("idcg"),
        when(col("idcg") > 0, col("dcg") / col("idcg")).as("ndcg"))
  }

  /** Rank-biased overlap (Webber, Moffat & Zobel 2010), truncated at
    * depth `d`: RBO@d = (1−p) Σ_{k=1..d} p^{k−1} · |A_k ∩ B_k| / k,
    * the top-weighted agreement between two rankings of the same
    * query — the standard "did the cheap index change what the user
    * sees" number for comparing retrieval variants. `a` and `b` are
    * (query, item, rank) tables with 1-based dense ranks; the
    * truncated form is reported (no extrapolation residual). Returns
    * (query, rbo) for every query in `a`, 0.0 when the top-d sets are
    * disjoint; rbo = 1 iff the top-d lists agree exactly.
    *
    * Scale shape: rewrite Σ_k weight·X_k/k as a per-ITEM tail sum —
    * an item first counted at depth m = max(rank_a, rank_b)
    * contributes p^{k−1}/k for every k in [m, d] — so the work is one
    * (query, item) equi-join plus a ≤d-wide generate per overlapping
    * item. No per-depth re-scan, no window.
    */
  def rbo(a: DataFrame, b: DataFrame, queryCol: String, itemCol: String,
      rankCol: String, p: Double, d: Int): DataFrame = {
    require(p > 0 && p < 1, s"p must be in (0,1), got $p")
    require(d >= 1, s"d must be >= 1, got $d")
    val ra = a.select(col(queryCol).as("query"), col(itemCol).as("item"),
      col(rankCol).as("ra"))
    val rb = b.select(col(queryCol).as("query"), col(itemCol).as("item"),
      col(rankCol).as("rb"))
    val tails = ra.join(rb, Seq("query", "item"))
      .filter(greatest(col("ra"), col("rb")) <= d)
      .select(col("query"),
        explode(sequence(greatest(col("ra"), col("rb")).cast("int"),
          lit(d))).as("k"))
      .groupBy("query")
      .agg((sum(pow(lit(p), col("k") - 1) / col("k")) * (1 - p)).as("rbo"))
    ra.select("query").distinct()
      .join(tails, Seq("query"), "left")
      .select(col("query"), coalesce(col("rbo"), lit(0.0)).as("rbo"))
  }

  /** Fleiss' kappa for m raters over categorical labels: the
    * multi-rater generalization of [[cohenKappa]]. `df` holds one row
    * per (item, rating); every item must carry exactly the same
    * number of ratings m ≥ 2 (validated with one tiny aggregate —
    * Fleiss is undefined otherwise). Returns one row
    * (n_items, m, p_bar, pe_bar, kappa); kappa NULL when pe = 1.
    *
    * Scale shape: one (item, category) hash aggregate, one per-item
    * aggregate of Σn_ij², one category-marginal aggregate — the
    * corpus is scanned once and everything downstream is
    * items + categories sized.
    */
  def fleissKappa(df: DataFrame, itemCol: String,
      categoryCol: String): DataFrame = {
    val cells = graft.core.PipelineCaches.persistTracked(
      df.groupBy(col(itemCol).as("item"), col(categoryCol).as("cat"))
        .agg(count(lit(1)).as("c")))
    val perItem = graft.core.PipelineCaches.persistTracked(
      cells.groupBy("item")
        .agg(sum("c").as("m"), sum(col("c") * col("c")).as("sq")))
    val ms = perItem.agg(min("m").as("lo"), max("m").as("hi")).head()
    val m = ms.getLong(0)
    require(m == ms.getLong(1) && m >= 2,
      s"fleissKappa needs a constant rating count >= 2 per item, " +
        s"got [${ms.getLong(0)}, ${ms.getLong(1)}]")
    val pbar = perItem.agg(count(lit(1)).as("n_items"),
      avg((col("sq") - m).cast("double") / (m * (m - 1.0))).as("p_bar"))
    val pe = cells.groupBy("cat").agg(sum("c").as("cj"))
      .agg(sum(pow(col("cj").cast("double"), 2.0)).as("sq2"),
        sum("cj").as("tot"))
      .select((col("sq2") / (col("tot").cast("double") * col("tot")))
        .as("pe_bar"))
    pbar.crossJoin(pe)
      .select(col("n_items"), lit(m).as("m"), col("p_bar"), col("pe_bar"),
        when(col("pe_bar") < 1.0, (col("p_bar") - col("pe_bar")) /
          (lit(1.0) - col("pe_bar"))).as("kappa"))
  }

  /** Cohen's kappa for two raters over the same items: observed
    * agreement p_o corrected for the chance agreement p_e of the
    * raters' marginal label distributions — the standard
    * inter-annotator reliability number for labeling pipelines.
    * Returns one row (n, po, pe, kappa); kappa is NULL in the
    * degenerate pe = 1 case (both raters constant and equal).
    *
    * Scale shape: one (r1, r2) contingency aggregate collapses the
    * corpus to |labels|² cells; everything after runs on that tiny
    * table (marginal sums + one label-keyed join), so the input is
    * scanned exactly once.
    */
  def cohenKappa(df: DataFrame, r1Col: String, r2Col: String): DataFrame = {
    val cells = graft.core.PipelineCaches.persistTracked(
      df.groupBy(col(r1Col).as("r1"), col(r2Col).as("r2"))
        .agg(count(lit(1)).as("c")))
    val totals = cells.agg(sum("c").as("n"),
      sum(when(col("r1") === col("r2"), col("c")).otherwise(0L)).as("agree"))
    val m1 = cells.groupBy("r1").agg(sum("c").as("c1"))
    val m2 = cells.groupBy("r2").agg(sum("c").as("c2"))
    val chance = m1.join(m2, col("r1") === col("r2"))
      .agg(sum(col("c1").cast("double") * col("c2")).as("cross"))
    totals.crossJoin(chance)
      .select(col("n"),
        (col("agree").cast("double") / col("n")).as("po"),
        (col("cross") / (col("n").cast("double") * col("n"))).as("pe"))
      .select(col("n"), col("po"), col("pe"),
        when(col("pe") < 1.0,
          (col("po") - col("pe")) / (lit(1.0) - col("pe"))).as("kappa"))
  }
}
