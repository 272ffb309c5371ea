package graft.queries

import org.apache.spark.sql.functions._
import graft.ml.{Eval, Similarity, TextAnalysis => TA}

/** Gates for the evaluation-metric operators ([[graft.ml.Eval]]):
  * ROC AUC (Mann–Whitney midranks), average precision, NDCG@k over a
  * retrieval shortlist, and Cohen's kappa — each replayed by the
  * DuckDB oracle from the same closed forms.
  */
object EvalQueries extends QueryGroup {

  // DuckDB mirror of TextAnalysis.normalize (the TextQueries idiom)
  private val normSql =
    """trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
      |'\s+', ' ', 'g'))""".stripMargin.replace("\n", " ")

  // DuckDB mirror of TextAnalysis.tokenCount (the q_text_pack idiom)
  private val tokSql =
    "CASE WHEN strlen(trim(text)) = 0 THEN 0 " +
      "ELSE len(string_split_regex(trim(text), '\\s+')) END"

  // DuckDB mirror of the heuristic quality score + is-English label
  // (the q_text_reliability construction) — shared by the scored-
  // classifier metric gates below.
  private val scoredSql =
    """sc AS (
      |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
      |   (CASE WHEN len(string_split_regex(trim(text), '\s+')) BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.3 END * 0.3
      |    + CASE WHEN list_aggregate(list_transform(string_split_regex(trim(text), '\s+'), w -> strlen(w)), 'sum') * 1.0::DOUBLE
      |        / len(string_split_regex(trim(text), '\s+')) BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.4 END * 0.2
      |    + CASE WHEN len(list_filter(string_split_regex(lower(text), '\s+'),
      |        w -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','at','by','be','this'], w)))
      |        * 1.0::DOUBLE / len(string_split_regex(trim(text), '\s+')) > 0.05 THEN 1.0 ELSE 0.6 END * 0.3
      |    + CASE WHEN len(regexp_extract_all(text, '[!-/:-@\[-`{-~]')) * 1.0::DOUBLE / strlen(text) < 0.2 THEN 1.0 ELSE 0.5 END * 0.2
      |   )::DOUBLE AS p
      |  FROM documents
      |)""".stripMargin

  private def scoredDocs(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val d = t(s, dir, "documents").withColumn("toks", TA.tokens(col("text")))
    d.select(
      TA.qualityFromComponents(size(col("toks")),
        TA.meanWordLengthOf(col("toks")),
        TA.stopwordRatioOf(col("toks")),
        TA.punctRatio(col("text"))).as("p"),
      when(col("lang") === "en", 1).otherwise(0).as("y"))
  }

  val all: Seq[QueryDef] = Seq(

    // expected calibration error over the frozen reliability bins
    // (strict-> cutoffs, matching Calibrate.reliability): n-weighted
    // average gap + the worst-bin MCE companion.
    q("q_eval_ece",
      s"""WITH $scoredSql, b AS (
         |  SELECT p, y,
         |    1 + (CASE WHEN p > 0.6 THEN 1 ELSE 0 END)
         |      + (CASE WHEN p > 0.8 THEN 1 ELSE 0 END)
         |      + (CASE WHEN p > 0.9 THEN 1 ELSE 0 END) AS bucket
         |  FROM sc
         |), bins AS (
         |  SELECT bucket, count(*)::BIGINT AS n, avg(p) AS ms, avg(y) AS r
         |  FROM b GROUP BY 1
         |)
         |SELECT sum(n)::BIGINT AS n, count(*)::BIGINT AS n_bins,
         |  round(sum(abs(ms - r) * n) / sum(n), 6) AS ece,
         |  round(max(abs(ms - r)), 6) AS max_gap
         |FROM bins""".stripMargin) { (s, dir) =>
      graft.ml.Calibrate.ece(scoredDocs(s, dir), "p", "y",
          Seq(0.6, 0.8, 0.9))
        .select(col("n"), col("n_bins"), round(col("ece"), 6).as("ece"),
          round(col("max_gap"), 6).as("max_gap"))
    },

    // ROC AUC of event value (rounded to 1 decimal so tie blocks are
    // real and the midrank arithmetic is exercised) against the
    // "click" label: one distinct-score aggregate + one vocab-sized
    // running-sum window — the exact Mann-Whitney closed form.
    q("q_eval_auc",
      """WITH e AS (
        |  SELECT round(value, 1) AS s,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS y
        |  FROM events
        |), g AS (
        |  SELECT s, count(*)::BIGINT AS n, sum(y)::BIGINT AS p
        |  FROM e GROUP BY s
        |), r AS (
        |  SELECT p, n,
        |    coalesce(sum(n) OVER (ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + (n + 1) / 2.0 AS midrank
        |  FROM g
        |)
        |SELECT sum(p)::BIGINT AS n_pos, (sum(n) - sum(p))::BIGINT AS n_neg,
        |  round((sum(p * midrank) - sum(p) * (sum(p) + 1) / 2.0)
        |    / (sum(p) * (sum(n) - sum(p))), 6) AS auc
        |FROM r""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "events").select(
        round(col("value"), 1).as("score"),
        (col("event_type") === "click").cast("int").as("y"))
      Eval.rocAuc(e, "score", "y")
        .select(col("n_pos"), col("n_neg"), round(col("auc"), 6).as("auc"))
    },

    // average precision over the same scores/labels: tie blocks taken
    // whole in descending-score order, block-end precision weighted
    // by the block's recall mass.
    q("q_eval_pr",
      """WITH e AS (
        |  SELECT round(value, 1) AS s,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS y
        |  FROM events
        |), g AS (
        |  SELECT s, count(*)::BIGINT AS n, sum(y)::BIGINT AS p
        |  FROM e GROUP BY s
        |), r AS (
        |  SELECT p,
        |    sum(n) OVER (ORDER BY s DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
        |    sum(p) OVER (ORDER BY s DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_p
        |  FROM g
        |)
        |SELECT sum(p)::BIGINT AS n_pos,
        |  round(sum(p * cum_p / cum_n) / sum(p), 6) AS ap
        |FROM r""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "events").select(
        round(col("value"), 1).as("score"),
        (col("event_type") === "click").cast("int").as("y"))
      Eval.averagePrecision(e, "score", "y")
        .select(col("n_pos"), round(col("ap"), 6).as("ap"))
    },

    // NDCG@10 of the exact-cosine top-20 shortlist ranked by rounded
    // cosine, with binary label-match relevance: does the embedding
    // ranking put same-label neighbors first. Ranks use round(cos, 6)
    // + id tie-break so both engines rank on agreed values (the
    // shortlist SELECTION mirrors q_ann_bruteforce's unrounded
    // ordering, already proven engine-identical).
    q("q_eval_ndcg",
      """WITH top AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS cid,
        |    round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |      CAST(c.embedding AS DOUBLE[])), 6) AS score,
        |    CASE WHEN q.label = c.label THEN 1 ELSE 0 END AS rel
        |  FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
        |  WHERE q.vec_id < 20
        |  QUALIFY row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |      CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) <= 20
        |), ranked AS (
        |  SELECT qid, rel,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY score DESC, cid) AS rp,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY rel DESC, cid) AS ri
        |  FROM top
        |), agg AS (
        |  SELECT qid AS query,
        |    sum(CASE WHEN rp <= 10 THEN rel / log2(rp + 1.0) ELSE 0.0 END) AS dcg,
        |    sum(CASE WHEN ri <= 10 THEN rel / log2(ri + 1.0) ELSE 0.0 END) AS idcg
        |  FROM ranked GROUP BY qid
        |)
        |SELECT query, round(dcg, 6) AS dcg, round(idcg, 6) AS idcg,
        |  round(CASE WHEN idcg > 0 THEN dcg / idcg END, 6) AS ndcg
        |FROM agg ORDER BY query""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val labels = t(s, dir, "embeddings").select(col("vec_id"), col("label"))
      val short = Similarity.bruteForceTopK(e.filter(col("id") < 20), e, 20)
        .join(labels.select(col("vec_id").as("qid"),
          col("label").as("ql")), "qid")
        .join(labels.select(col("vec_id").as("cid"),
          col("label").as("cl")), "cid")
        .select(col("qid"), col("cid"), round(col("cos"), 6).as("score"),
          (col("ql") === col("cl")).cast("int").as("rel"))
      Eval.ndcgAtK(short, "qid", "cid", "score", "rel", 10)
        .select(col("query"), round(col("dcg"), 6).as("dcg"),
          round(col("idcg"), 6).as("idcg"), round(col("ndcg"), 6).as("ndcg"))
        .orderBy("query")
    },

    // binary log-loss (clipped cross-entropy) of the heuristic
    // quality score against the is-English label — the proper scoring
    // rule companion to AUC/Brier.
    q("q_eval_logloss",
      s"""WITH $scoredSql, c AS (
         |  SELECT least(greatest(p, 1e-15), 1.0 - 1e-15) AS p, y FROM sc
         |)
         |SELECT count(*)::BIGINT AS n,
         |  round(-avg(y * ln(p) + (1 - y) * ln(1.0 - p)), 6) AS log_loss
         |FROM c""".stripMargin) { (s, dir) =>
      Eval.logLoss(scoredDocs(s, dir), "p", "y")
        .select(col("n"), round(col("log_loss"), 6).as("log_loss"))
    },

    // confusion-matrix report at the 0.75 decision threshold:
    // tp/fp/fn/tn + precision/recall/F1/accuracy.
    q("q_eval_confusion",
      s"""WITH $scoredSql, c AS (
         |  SELECT CASE WHEN p >= 0.75 THEN 1 ELSE 0 END AS pr, y FROM sc
         |), agg AS (
         |  SELECT count(*)::BIGINT AS n,
         |    sum(pr * y)::BIGINT AS tp, sum(pr * (1 - y))::BIGINT AS fp,
         |    sum((1 - pr) * y)::BIGINT AS fn,
         |    sum((1 - pr) * (1 - y))::BIGINT AS tn
         |  FROM c
         |)
         |SELECT n, tp, fp, fn, tn,
         |  round(CASE WHEN tp + fp > 0 THEN tp::DOUBLE / (tp + fp) END, 6)
         |    AS precision,
         |  round(CASE WHEN tp + fn > 0 THEN tp::DOUBLE / (tp + fn) END, 6)
         |    AS recall,
         |  round(CASE WHEN 2 * tp + fp + fn > 0
         |    THEN 2.0 * tp / (2 * tp + fp + fn) END, 6) AS f1,
         |  round((tp + tn)::DOUBLE / n, 6) AS accuracy
         |FROM agg""".stripMargin) { (s, dir) =>
      Eval.binaryConfusion(scoredDocs(s, dir), "p", "y", threshold = 0.75)
        .select(col("n"), col("tp"), col("fp"), col("fn"), col("tn"),
          round(col("precision"), 6).as("precision"),
          round(col("recall"), 6).as("recall"),
          round(col("f1"), 6).as("f1"),
          round(col("accuracy"), 6).as("accuracy"))
    },

    // Brier score + Murphy decomposition of the heuristic quality
    // score against the is-English label over the frozen
    // {0.6, 0.8, 0.9} bins (the q_text_reliability setup): REL − RES
    // + UNC must reproduce the binned Brier exactly.
    q("q_eval_brier",
      """WITH sc AS (
        |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
        |   (CASE WHEN len(string_split_regex(trim(text), '\s+')) BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.3 END * 0.3
        |    + CASE WHEN list_aggregate(list_transform(string_split_regex(trim(text), '\s+'), w -> strlen(w)), 'sum') * 1.0::DOUBLE
        |        / len(string_split_regex(trim(text), '\s+')) BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.4 END * 0.2
        |    + CASE WHEN len(list_filter(string_split_regex(lower(text), '\s+'),
        |        w -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','at','by','be','this'], w)))
        |        * 1.0::DOUBLE / len(string_split_regex(trim(text), '\s+')) > 0.05 THEN 1.0 ELSE 0.6 END * 0.3
        |    + CASE WHEN len(regexp_extract_all(text, '[!-/:-@\[-`{-~]')) * 1.0::DOUBLE / strlen(text) < 0.2 THEN 1.0 ELSE 0.5 END * 0.2
        |   )::DOUBLE AS p
        |  FROM documents
        |), b AS (
        |  SELECT p, y,
        |    (CASE WHEN p >= 0.6 THEN 1 ELSE 0 END)
        |      + (CASE WHEN p >= 0.8 THEN 1 ELSE 0 END)
        |      + (CASE WHEN p >= 0.9 THEN 1 ELSE 0 END) AS bin
        |  FROM sc
        |), bins AS (
        |  SELECT bin, count(*)::BIGINT AS nk, avg(p) AS pk, avg(y) AS yk,
        |    sum((p - y) * (p - y)) AS sq
        |  FROM b GROUP BY 1
        |), tot AS (
        |  SELECT sum(nk)::BIGINT AS n, sum(yk * nk) / sum(nk) AS ybar,
        |    sum(sq) / sum(nk) AS brier
        |  FROM bins
        |), agg AS (
        |  SELECT max(n) AS n, max(brier) AS brier,
        |    sum(nk * (pk - yk) * (pk - yk)) / max(n) AS reliability,
        |    sum(nk * (yk - ybar) * (yk - ybar)) / max(n) AS resolution,
        |    max(ybar * (1.0 - ybar)) AS uncertainty
        |  FROM bins, tot
        |)
        |SELECT n, round(brier, 6) AS brier,
        |  round(reliability, 6) AS reliability,
        |  round(resolution, 6) AS resolution,
        |  round(uncertainty, 6) AS uncertainty,
        |  round(reliability - resolution + uncertainty, 6) AS brier_binned
        |FROM agg""".stripMargin) { (s, dir) =>
      val scored = t(s, dir, "documents")
        .withColumn("toks", TA.tokens(col("text")))
        .select(
          TA.qualityFromComponents(size(col("toks")),
            TA.meanWordLengthOf(col("toks")),
            TA.stopwordRatioOf(col("toks")),
            TA.punctRatio(col("text"))).as("p"),
          when(col("lang") === "en", 1).otherwise(0).as("y"))
      Eval.brierDecomposition(scored, "p", "y", Seq(0.6, 0.8, 0.9))
        .select(col("n"), round(col("brier"), 6).as("brier"),
          round(col("reliability"), 6).as("reliability"),
          round(col("resolution"), 6).as("resolution"),
          round(col("uncertainty"), 6).as("uncertainty"),
          round(col("brier_binned"), 6).as("brier_binned"))
    },

    // quadratic-weighted kappa over ordinal 0/1/2 size levels: the
    // same two raters as q_eval_kappa but disagreement discounted by
    // squared level distance.
    q("q_eval_weighted_kappa",
      s"""WITH r AS (
         |  SELECT
         |    CASE WHEN n_chars < 200 THEN 0
         |         WHEN n_chars < 400 THEN 1 ELSE 2 END AS i,
         |    CASE WHEN $tokSql < 40 THEN 0
         |         WHEN $tokSql < 70 THEN 1 ELSE 2 END AS j
         |  FROM documents
         |), cells AS (
         |  SELECT i, j, count(*)::BIGINT AS c FROM r GROUP BY 1, 2
         |), kt AS (
         |  SELECT greatest(max(i), max(j)) + 1 AS k, sum(c)::BIGINT AS n
         |  FROM cells
         |), po AS (
         |  SELECT sum((1.0 - (abs(i - j)::DOUBLE / (k - 1)::DOUBLE)
         |    * (abs(i - j)::DOUBLE / (k - 1)::DOUBLE)) * c) / max(n) AS po_w,
         |    max(n) AS n, max(k) AS k
         |  FROM cells, kt
         |), m1 AS (SELECT i, sum(c)::BIGINT AS ci FROM cells GROUP BY 1
         |), m2 AS (SELECT j, sum(c)::BIGINT AS cj FROM cells GROUP BY 1
         |), pe AS (
         |  SELECT sum((1.0 - (abs(i - j)::DOUBLE / (k - 1)::DOUBLE)
         |    * (abs(i - j)::DOUBLE / (k - 1)::DOUBLE))
         |    * (ci::DOUBLE * cj)) / (max(n)::DOUBLE * max(n)) AS pe_w
         |  FROM m1, m2, kt
         |)
         |SELECT n, k AS k_levels, round(po_w, 6) AS po_w,
         |  round(pe_w, 6) AS pe_w,
         |  round((po_w - pe_w) / (1.0 - pe_w), 6) AS kappa
         |FROM po, pe""".stripMargin) { (s, dir) =>
      val tok = TA.tokenCount(col("text"))
      val d = t(s, dir, "documents").select(
        when(col("n_chars") < 200, 0)
          .when(col("n_chars") < 400, 1).otherwise(2).as("r1"),
        when(tok < 40, 0).when(tok < 70, 1).otherwise(2).as("r2"))
      Eval.weightedKappa(d, "r1", "r2", quadratic = true)
        .select(col("n"), col("k_levels"),
          round(col("po_w"), 6).as("po_w"), round(col("pe_w"), 6).as("pe_w"),
          round(col("kappa"), 6).as("kappa"))
    },

    // Krippendorff's alpha with MISSING ratings: rater2 skips every
    // 7th doc, rater3 rates only even docs, so units carry 1-3
    // ratings and the single-rating exclusion path is exercised.
    q("q_eval_krippendorff",
      s"""WITH r AS (
         |  SELECT doc_id,
         |    CASE WHEN n_chars < 200 THEN 'short'
         |         WHEN n_chars < 400 THEN 'mid' ELSE 'long' END AS cat
         |  FROM documents
         |  UNION ALL
         |  SELECT doc_id,
         |    CASE WHEN $tokSql < 40 THEN 'short'
         |         WHEN $tokSql < 70 THEN 'mid' ELSE 'long' END
         |  FROM documents WHERE doc_id % 7 <> 0
         |  UNION ALL
         |  SELECT doc_id,
         |    CASE WHEN len(regexp_extract_all(text,
         |        '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) < 45 THEN 'short'
         |      WHEN len(regexp_extract_all(text,
         |        '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) < 75 THEN 'mid'
         |      ELSE 'long' END
         |  FROM documents WHERE doc_id % 2 = 0
         |), cells AS (
         |  SELECT doc_id, cat, count(*)::BIGINT AS c FROM r GROUP BY 1, 2
         |), pu AS (
         |  SELECT doc_id, sum(c) AS m, sum(c * c) AS sq FROM cells
         |  GROUP BY 1 HAVING sum(c) >= 2
         |), obs AS (
         |  SELECT count(*)::BIGINT AS n_units, sum(m)::BIGINT AS n_values,
         |    sum((m * m - sq)::DOUBLE / (m - 1)) AS d_o
         |  FROM pu
         |), marg AS (
         |  SELECT cat, sum(c)::BIGINT AS nc
         |  FROM cells JOIN pu USING (doc_id) GROUP BY 1
         |), ex AS (
         |  SELECT (sum(nc) * sum(nc) - sum(nc * nc))::DOUBLE
         |    / (sum(nc) - 1) AS d_e
         |  FROM marg
         |)
         |SELECT n_units, n_values, round(d_o, 6) AS d_o,
         |  round(d_e, 6) AS d_e, round(1.0 - d_o / d_e, 6) AS alpha
         |FROM obs, ex""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents")
      val tok = TA.tokenCount(col("text"))
      val bp = TA.bpeishTokenCount(col("text"))
      val r1 = d.select(col("doc_id"),
        when(col("n_chars") < 200, "short")
          .when(col("n_chars") < 400, "mid").otherwise("long").as("cat"))
      val r2 = d.filter(col("doc_id") % 7 =!= 0).select(col("doc_id"),
        when(tok < 40, "short").when(tok < 70, "mid")
          .otherwise("long").as("cat"))
      val r3 = d.filter(col("doc_id") % 2 === 0).select(col("doc_id"),
        when(bp < 45, "short").when(bp < 75, "mid")
          .otherwise("long").as("cat"))
      Eval.krippendorffAlpha(r1.unionAll(r2).unionAll(r3), "doc_id", "cat")
        .select(col("n_units"), col("n_values"),
          round(col("d_o"), 6).as("d_o"), round(col("d_e"), 6).as("d_e"),
          round(col("alpha"), 6).as("alpha"))
    },

    // Mann-Whitney U with the tie-corrected normal approximation
    // (no continuity correction) on 1-decimal values: clicks vs rest.
    q("q_eval_mannwhitney",
      """WITH e AS (
        |  SELECT round(value, 1) AS s,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS y
        |  FROM events
        |), g AS (
        |  SELECT s, count(*)::BIGINT AS n, sum(y)::BIGINT AS p
        |  FROM e GROUP BY s
        |), r AS (
        |  SELECT p, n,
        |    coalesce(sum(n) OVER (ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + (n + 1) / 2.0 AS midrank
        |  FROM g
        |), agg AS (
        |  SELECT sum(p)::BIGINT AS n1, (sum(n) - sum(p))::BIGINT AS n2,
        |    sum(n)::BIGINT AS nt,
        |    sum(p * midrank) - sum(p) * (sum(p) + 1) / 2.0 AS u,
        |    sum(n * n * n - n)::BIGINT AS ties
        |  FROM r
        |)
        |SELECT n1, n2, round(u, 6) AS u,
        |  round((u - n1::DOUBLE * n2 / 2.0)
        |    / sqrt(n1::DOUBLE * n2 / 12.0 * ((nt + 1)
        |      - ties::DOUBLE / (nt::DOUBLE * (nt - 1)))), 6) AS z,
        |  round(2.0 * u / (n1::DOUBLE * n2) - 1.0, 6) AS cliffs_delta
        |FROM agg""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "events").select(
        round(col("value"), 1).as("score"),
        (col("event_type") === "click").cast("int").as("y"))
      Eval.mannWhitney(e, "score", "y")
        .select(col("n1"), col("n2"), round(col("u"), 6).as("u"),
          round(col("z"), 6).as("z"),
          round(col("cliffs_delta"), 6).as("cliffs_delta"))
    },

    // chi-squared independence of event type vs a fixed value bucket,
    // with Cramér's V effect size; statistic and dof exact, p-value
    // left to a CDF downstream.
    q("q_eval_chi2",
      """WITH r AS (
        |  SELECT event_type AS a,
        |    CASE WHEN value < 15 THEN 'low'
        |         WHEN value < 60 THEN 'mid' ELSE 'high' END AS b
        |  FROM events
        |), cells AS (
        |  SELECT a, b, count(*)::BIGINT AS c FROM r GROUP BY 1, 2
        |), ra AS (SELECT a, sum(c)::BIGINT AS ca FROM cells GROUP BY 1
        |), cb AS (SELECT b, sum(c)::BIGINT AS cb FROM cells GROUP BY 1
        |), tot AS (
        |  SELECT sum(c)::BIGINT AS n, count(DISTINCT a)::BIGINT AS nr,
        |    count(DISTINCT b)::BIGINT AS nc
        |  FROM cells
        |), x AS (
        |  SELECT max(n) AS n, max(nr) AS n_rows, max(nc) AS n_cols,
        |    sum((c - ca::DOUBLE * cb.cb / n) * (c - ca::DOUBLE * cb.cb / n)
        |      / (ca::DOUBLE * cb.cb / n)) AS chi2
        |  FROM cells JOIN ra USING (a) JOIN cb USING (b), tot
        |)
        |SELECT n, n_rows, n_cols, (n_rows - 1) * (n_cols - 1) AS dof,
        |  round(chi2, 6) AS chi2,
        |  round(sqrt(chi2 / (n::DOUBLE * (least(n_rows, n_cols) - 1))), 6)
        |    AS cramers_v
        |FROM x""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "events").select(col("event_type").as("a"),
        when(col("value") < 15, "low").when(col("value") < 60, "mid")
          .otherwise("high").as("b"))
      Eval.chiSquared(e, "a", "b")
        .select(col("n"), col("n_rows"), col("n_cols"), col("dof"),
          round(col("chi2"), 6).as("chi2"),
          round(col("cramers_v"), 6).as("cramers_v"))
    },

    // rank-biased overlap between the full-cosine ranking and the
    // first-16-dims prefix ranking (the cheap-probe-vs-full-scan
    // comparison): RBO@10 at p=0.9 per query, 1.0 iff the top-10
    // lists agree exactly. Both rankings order by unrounded cosine
    // (the q_ann_bruteforce-proven convention) with id tie-break.
    q("q_eval_rbo",
      """WITH p AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS cid,
        |    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |      CAST(c.embedding AS DOUBLE[])) AS cf,
        |    list_cosine_similarity(CAST(q.embedding[1:16] AS DOUBLE[]),
        |      CAST(c.embedding[1:16] AS DOUBLE[])) AS cp
        |  FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
        |  WHERE q.vec_id < 10
        |), ra AS (
        |  SELECT qid, cid, row_number() OVER (PARTITION BY qid
        |    ORDER BY cf DESC, cid) AS r
        |  FROM p QUALIFY r <= 10
        |), rb AS (
        |  SELECT qid, cid, row_number() OVER (PARTITION BY qid
        |    ORDER BY cp DESC, cid) AS r
        |  FROM p QUALIFY r <= 10
        |), tails AS (
        |  SELECT ra.qid, u.k
        |  FROM ra JOIN rb ON ra.qid = rb.qid AND ra.cid = rb.cid,
        |    unnest(range(greatest(ra.r, rb.r), 11)) AS u(k)
        |), s AS (
        |  SELECT qid, sum(pow(0.9, k - 1) / k) * (1 - 0.9) AS rbo
        |  FROM tails GROUP BY qid
        |), qs AS (
        |  SELECT DISTINCT vec_id AS query FROM embeddings WHERE vec_id < 10
        |)
        |SELECT query, round(coalesce(rbo, 0.0), 6) AS rbo
        |FROM qs LEFT JOIN s ON qs.query = s.qid
        |ORDER BY query""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val e = t(s, dir, "embeddings")
      val qs = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val cs = e.select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val cos = graft.functions.VectorFunctions.cosine_f _
      val pairs = cs.crossJoin(broadcast(qs))
        .filter(col("qid") =!= col("cid"))
        .select(col("qid"), col("cid"),
          cos(col("qv"), col("cv")).as("cf"),
          cos(slice(col("qv"), 1, 16), slice(col("cv"), 1, 16)).as("cp"))
      def top(scoreCol: String) = pairs
        .withColumn("rank", row_number().over(Window.partitionBy("qid")
          .orderBy(col(scoreCol).desc, col("cid").asc)))
        .filter(col("rank") <= 10)
        .select("qid", "cid", "rank")
      graft.ml.Eval.rbo(top("cf"), top("cp"), "qid", "cid", "rank",
          p = 0.9, d = 10)
        .select(col("query"), round(col("rbo"), 6).as("rbo"))
        .orderBy("query")
    },

    // Fleiss' kappa across THREE deterministic raters (character,
    // token, and subword-count buckets over the same 3-level scale):
    // the multi-rater agreement form, exercised where m > 2.
    q("q_eval_fleiss",
      s"""WITH r AS (
         |  SELECT doc_id,
         |    CASE WHEN n_chars < 200 THEN 'short'
         |         WHEN n_chars < 400 THEN 'mid' ELSE 'long' END AS cat
         |  FROM documents
         |  UNION ALL
         |  SELECT doc_id,
         |    CASE WHEN $tokSql < 40 THEN 'short'
         |         WHEN $tokSql < 70 THEN 'mid' ELSE 'long' END
         |  FROM documents
         |  UNION ALL
         |  SELECT doc_id,
         |    CASE WHEN len(regexp_extract_all(text,
         |        '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) < 45 THEN 'short'
         |      WHEN len(regexp_extract_all(text,
         |        '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) < 75 THEN 'mid'
         |      ELSE 'long' END
         |  FROM documents
         |), cells AS (
         |  SELECT doc_id, cat, count(*)::BIGINT AS c FROM r GROUP BY 1, 2
         |), per_item AS (
         |  SELECT doc_id, sum(c * c) AS sq FROM cells GROUP BY 1
         |), pbar AS (
         |  SELECT count(*)::BIGINT AS n_items,
         |    avg((sq - 3)::DOUBLE / 6.0) AS p_bar
         |  FROM per_item
         |), pe AS (
         |  SELECT sum(pow(cj::DOUBLE, 2.0)) /
         |    (sum(cj)::DOUBLE * sum(cj)) AS pe_bar
         |  FROM (SELECT cat, sum(c)::BIGINT AS cj FROM cells GROUP BY 1)
         |)
         |SELECT n_items, 3::BIGINT AS m, round(p_bar, 6) AS p_bar,
         |  round(pe_bar, 6) AS pe_bar,
         |  round((p_bar - pe_bar) / (1.0 - pe_bar), 6) AS kappa
         |FROM pbar, pe""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents")
      val byChars = d.select(col("doc_id"),
        when(col("n_chars") < 200, "short")
          .when(col("n_chars") < 400, "mid").otherwise("long").as("cat"))
      val tok = TA.tokenCount(col("text"))
      val byTokens = d.select(col("doc_id"),
        when(tok < 40, "short").when(tok < 70, "mid")
          .otherwise("long").as("cat"))
      val bp = TA.bpeishTokenCount(col("text"))
      val bySubwords = d.select(col("doc_id"),
        when(bp < 45, "short").when(bp < 75, "mid")
          .otherwise("long").as("cat"))
      Eval.fleissKappa(byChars.unionAll(byTokens).unionAll(bySubwords),
          "doc_id", "cat")
        .select(col("n_items"), col("m"), round(col("p_bar"), 6).as("p_bar"),
          round(col("pe_bar"), 6).as("pe_bar"),
          round(col("kappa"), 6).as("kappa"))
    },

    // Cohen's kappa between two deterministic "raters" of document
    // size (character buckets vs token buckets): correlated but
    // imperfect, so kappa lands strictly inside (0, 1) and the
    // chance-agreement correction is exercised.
    q("q_eval_kappa",
      s"""WITH r AS (
         |  SELECT
         |    CASE WHEN n_chars < 200 THEN 'short'
         |         WHEN n_chars < 400 THEN 'mid' ELSE 'long' END AS r1,
         |    CASE WHEN $tokSql < 40 THEN 'short'
         |         WHEN $tokSql < 70 THEN 'mid' ELSE 'long' END AS r2
         |  FROM documents
         |), tot AS (
         |  SELECT count(*)::BIGINT AS n,
         |    sum(CASE WHEN r1 = r2 THEN 1 ELSE 0 END)::BIGINT AS agree
         |  FROM r
         |), m1 AS (
         |  SELECT r1 AS cat, count(*)::BIGINT AS c1 FROM r GROUP BY 1
         |), m2 AS (
         |  SELECT r2 AS cat, count(*)::BIGINT AS c2 FROM r GROUP BY 1
         |), ch AS (
         |  SELECT sum(c1::DOUBLE * c2) AS cx FROM m1 JOIN m2 USING (cat)
         |)
         |SELECT n, round(agree::DOUBLE / n, 6) AS po,
         |  round(cx / (n::DOUBLE * n), 6) AS pe,
         |  round((agree::DOUBLE / n - cx / (n::DOUBLE * n))
         |    / (1.0 - cx / (n::DOUBLE * n)), 6) AS kappa
         |FROM tot, ch""".stripMargin) { (s, dir) =>
      val tok = TA.tokenCount(col("text"))
      val d = t(s, dir, "documents").select(
        when(col("n_chars") < 200, "short")
          .when(col("n_chars") < 400, "mid").otherwise("long").as("r1"),
        when(tok < 40, "short").when(tok < 70, "mid")
          .otherwise("long").as("r2"))
      Eval.cohenKappa(d, "r1", "r2")
        .select(col("n"), round(col("po"), 6).as("po"),
          round(col("pe"), 6).as("pe"), round(col("kappa"), 6).as("kappa"))
    },

    // Mean reciprocal rank: documents ranked per source by (n_chars
    // desc, doc_id) with relevance = doc_id % 7 = 0; per-query
    // first-relevant ranks and the corpus MRR replay exactly.
    q("q_eval_mrr",
      """WITH r AS (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rank,
        |    doc_id % 7 = 0 AS rel
        |  FROM documents
        |), pq AS (
        |  SELECT source, count(*) AS n_ranked,
        |    min(CASE WHEN rel THEN rank END) AS first_relevant_rank
        |  FROM r GROUP BY 1
        |)
        |SELECT source AS query, CAST(n_ranked AS BIGINT) AS n_ranked,
        |  CAST(first_relevant_rank AS BIGINT) AS first_relevant_rank,
        |  round(coalesce(1.0::DOUBLE / first_relevant_rank, 0.0), 6) AS rr
        |FROM pq ORDER BY query""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.{Window => W}
      val ranked = t(s, dir, "documents")
        .withColumn("rank", row_number().over(
          W.partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))))
        .withColumn("rel", col("doc_id") % 7 === 0)
      Eval.reciprocalRanks(ranked, "source", "rank", "rel")
        .select(col("query"), col("n_ranked"),
          col("first_relevant_rank").cast("long").as("first_relevant_rank"),
          round(col("rr"), 6).as("rr"))
        .orderBy("query")
    },

    // precision@10 / recall@10 per query over the same ranked setup
    // as q_eval_mrr: one conditional aggregate per query key.
    q("q_eval_pr_at_k",
      """WITH r AS (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rank,
        |    doc_id % 7 = 0 AS rel
        |  FROM documents
        |)
        |SELECT source AS query,
        |  CAST(sum(CASE WHEN rel AND rank <= 10 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS rel_at_k,
        |  CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT) AS rel_total,
        |  round(sum(CASE WHEN rel AND rank <= 10 THEN 1 ELSE 0 END)
        |    * 1.0::DOUBLE / 10, 6) AS precision_at_k,
        |  round(CASE WHEN sum(CASE WHEN rel THEN 1 ELSE 0 END) > 0
        |    THEN sum(CASE WHEN rel AND rank <= 10 THEN 1 ELSE 0 END)
        |      * 1.0::DOUBLE / sum(CASE WHEN rel THEN 1 ELSE 0 END)
        |    END, 6) AS recall_at_k
        |FROM r GROUP BY 1 ORDER BY query""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.{Window => W}
      val ranked = t(s, dir, "documents")
        .withColumn("rank", row_number().over(
          W.partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))))
        .withColumn("rel", col("doc_id") % 7 === 0)
      Eval.precisionRecallAtK(ranked, "source", "rank", "rel", k = 10)
        .select(col("query"), col("rel_at_k"), col("rel_total"),
          round(col("precision_at_k"), 6).as("precision_at_k"),
          round(col("recall_at_k"), 6).as("recall_at_k"))
        .orderBy("query")
    },

    // Seeded Poisson bootstrap CI of mean document length: replicate
    // weights are Poisson(1) counts decoded from md5(seed:id:rep) via
    // fixed-width hex thresholds (string compare = numeric compare),
    // so all 200 replicate means are exact integer-ratio arithmetic
    // both engines replay bit-for-bit. lo/hi = 5th/196th smallest
    // replicate mean (= the 2.5%/97.5% empirical quantiles).
    q("q_eval_bootstrap", {
      val ts = graft.events.Events.poissonHexThresholds
      val cases = ts.zipWithIndex
        .map { case (h, k) => s"WHEN h < '$h' THEN $k" }.mkString(" ")
      s"""WITH w AS (
        |  SELECT r.range AS rep, d.n_chars,
        |    CASE $cases ELSE ${ts.length} END AS w
        |  FROM documents d CROSS JOIN range(200) r,
        |    LATERAL (SELECT substr(md5(concat_ws(':', 'boot',
        |      d.doc_id, r.range)), 1, 8) AS h) x
        |), means AS (
        |  SELECT rep, sum(w * n_chars)::DOUBLE / sum(w) AS m
        |  FROM w GROUP BY 1
        |), ranked AS (
        |  SELECT m, row_number() OVER (ORDER BY m, rep) AS rk FROM means
        |)
        |SELECT (SELECT count(*) FROM documents) AS n,
        |  round((SELECT sum(n_chars)::DOUBLE / count(*) FROM documents), 6)
        |    AS mean,
        |  round((SELECT m FROM ranked WHERE rk = 5), 6) AS lo,
        |  round((SELECT m FROM ranked WHERE rk = 196), 6) AS hi""".stripMargin
    }) { (s, dir) =>
      Eval.bootstrapMeanCI(t(s, dir, "documents"), "doc_id", "n_chars",
          b = 200, seed = "boot", alpha = 0.05)
        .select(col("n"), round(col("mean"), 6).as("mean"),
          round(col("lo"), 6).as("lo"), round(col("hi"), 6).as("hi"))
    },

    // Corpus BLEU-2 of a planted "generation": the candidate drops
    // every 3rd token of the reference (both engines construct it),
    // so the clipped n-gram precisions, brevity penalty, and the
    // geometric mean are fully replayable relationally — the oracle
    // recomputes modified precision with explode + clip joins, never
    // calling a BLEU function.
    q("q_eval_bleu",
      s"""WITH tk AS (
         |  SELECT doc_id, list_filter(string_split($normSql, ' '),
         |    t -> t <> '') AS rt
         |  FROM documents
         |), pr AS (
         |  SELECT doc_id, rt,
         |    list_filter(rt, (t, i) -> i % 3 != 0) AS ct FROM tk
         |), cu AS (
         |  SELECT doc_id, u.g AS g, count(*) AS cc
         |  FROM pr, unnest(ct) AS u(g) GROUP BY 1, 2
         |), ru AS (
         |  SELECT doc_id, u.g AS g, count(*) AS rc
         |  FROM pr, unnest(rt) AS u(g) GROUP BY 1, 2
         |), o1 AS (
         |  SELECT sum(least(cc, coalesce(rc, 0)))::DOUBLE AS num
         |  FROM cu LEFT JOIN ru USING (doc_id, g)
         |), cb AS (
         |  SELECT doc_id, u.g AS g, count(*) AS cc FROM (
         |    SELECT doc_id, list_transform(range(1, len(ct)),
         |      i -> ct[i] || ' ' || ct[i+1]) AS bs FROM pr
         |  ), unnest(bs) AS u(g) GROUP BY 1, 2
         |), rb AS (
         |  SELECT doc_id, u.g AS g, count(*) AS rc FROM (
         |    SELECT doc_id, list_transform(range(1, len(rt)),
         |      i -> rt[i] || ' ' || rt[i+1]) AS bs FROM pr
         |  ), unnest(bs) AS u(g) GROUP BY 1, 2
         |), o2 AS (
         |  SELECT sum(least(cc, coalesce(rc, 0)))::DOUBLE AS num
         |  FROM cb LEFT JOIN rb USING (doc_id, g)
         |), lens AS (
         |  SELECT sum(len(ct))::DOUBLE AS clen, sum(len(rt))::DOUBLE AS rlen,
         |    sum(greatest(len(ct) - 1, 0))::DOUBLE AS bden
         |  FROM pr
         |), fin AS (
         |  SELECT o1.num / lens.clen AS p1, o2.num / lens.bden AS p2,
         |    CASE WHEN lens.clen >= lens.rlen THEN 1.0::DOUBLE
         |      ELSE exp(1.0 - lens.rlen / lens.clen) END AS bp,
         |    lens.clen AS clen, lens.rlen AS rlen
         |  FROM o1, o2, lens
         |)
         |SELECT round(CASE WHEN p1 > 0 AND p2 > 0
         |    THEN exp((ln(p1) + ln(p2)) / 2) * bp ELSE 0.0 END, 6) AS bleu,
         |  round(p1, 6) AS p1, round(p2, 6) AS p2, round(bp, 6) AS bp,
         |  CAST(clen AS BIGINT) AS cand_tokens,
         |  CAST(rlen AS BIGINT) AS ref_tokens
         |FROM fin""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents").select(col("doc_id").as("id"),
        col("text").as("ref"),
        concat_ws(" ", filter(
          filter(split(TA.normalize(col("text")), " "), t => length(t) > 0),
          (t, i) => (i + 1) % 3 =!= 0)).as("cand"))
      graft.ml.GenEval.bleu(d, "id", "cand", "ref", maxN = 2)
        .select(round(col("bleu"), 6).as("bleu"),
          round(col("p1"), 6).as("p1"), round(col("p2"), 6).as("p2"),
          round(col("bp"), 6).as("bp"),
          col("cand_tokens"), col("ref_tokens"))
    },

    // ROUGE-2 per document over the same dropped-token candidate:
    // clipped bigram overlap as precision/recall/F1, replayed
    // relationally per document by the oracle.
    q("q_eval_rouge2",
      s"""WITH tk AS (
         |  SELECT doc_id, list_filter(string_split($normSql, ' '),
         |    t -> t <> '') AS rt
         |  FROM documents
         |), pr AS (
         |  SELECT doc_id, rt,
         |    list_filter(rt, (t, i) -> i % 3 != 0) AS ct FROM tk
         |), cb AS (
         |  SELECT doc_id, u.g AS g, count(*) AS cc FROM (
         |    SELECT doc_id, list_transform(range(1, len(ct)),
         |      i -> ct[i] || ' ' || ct[i+1]) AS bs FROM pr
         |  ), unnest(bs) AS u(g) GROUP BY 1, 2
         |), rb AS (
         |  SELECT doc_id, u.g AS g, count(*) AS rc FROM (
         |    SELECT doc_id, list_transform(range(1, len(rt)),
         |      i -> rt[i] || ' ' || rt[i+1]) AS bs FROM pr
         |  ), unnest(bs) AS u(g) GROUP BY 1, 2
         |), ov AS (
         |  SELECT doc_id, sum(least(cc, rc)) AS overlap
         |  FROM cb JOIN rb USING (doc_id, g) GROUP BY 1
         |), tot AS (
         |  SELECT doc_id, greatest(len(ct) - 1, 0) AS cn,
         |    greatest(len(rt) - 1, 0) AS rn FROM pr
         |)
         |SELECT t.doc_id AS id,
         |  CAST(coalesce(o.overlap, 0) AS BIGINT) AS overlap,
         |  CAST(t.cn AS BIGINT) AS cand_ngrams,
         |  CAST(t.rn AS BIGINT) AS ref_ngrams,
         |  round(CASE WHEN t.cn > 0
         |    THEN coalesce(o.overlap, 0)::DOUBLE / t.cn ELSE 0.0 END, 6)
         |    AS precision,
         |  round(coalesce(o.overlap, 0)::DOUBLE / t.rn, 6) AS recall,
         |  round(CASE WHEN coalesce(o.overlap, 0) > 0 THEN
         |    2.0 * (coalesce(o.overlap, 0)::DOUBLE / t.cn)
         |        * (coalesce(o.overlap, 0)::DOUBLE / t.rn)
         |      / (coalesce(o.overlap, 0)::DOUBLE / t.cn
         |        + coalesce(o.overlap, 0)::DOUBLE / t.rn)
         |    ELSE 0.0 END, 6) AS f1
         |FROM tot t LEFT JOIN ov o USING (doc_id)
         |WHERE t.rn > 0 ORDER BY id""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents").select(col("doc_id").as("id"),
        col("text").as("ref"),
        concat_ws(" ", filter(
          filter(split(TA.normalize(col("text")), " "), t => length(t) > 0),
          (t, i) => (i + 1) % 3 =!= 0)).as("cand"))
      graft.ml.GenEval.rougeN(d, "id", "cand", "ref", n = 2)
        .select(col("id"), col("overlap"), col("cand_ngrams"),
          col("ref_ngrams"), round(col("precision"), 6).as("precision"),
          round(col("recall"), 6).as("recall"), round(col("f1"), 6).as("f1"))
        .orderBy("id")
    },

    // ROUGE-L per document: dropping tokens makes the candidate an
    // EXACT SUBSEQUENCE of the reference, so LCS = |cand| and every
    // output of the O(c·r) DP kernel is arithmetically replayable —
    // precision 1, recall |cand|/|ref| — without the oracle running
    // any DP.
    // word error rate of the dropped-token candidate: a subsequence's
    // Levenshtein alignment is pure deletions, so distance = dropped
    // count, S = I = 0 — the whole S/D/I decomposition replays
    // arithmetically.
    q("q_eval_wer",
      s"""WITH tk AS (
         |  SELECT doc_id, list_filter(string_split($normSql, ' '),
         |    t -> t <> '') AS rt
         |  FROM documents
         |), pr AS (
         |  SELECT doc_id, len(rt) AS rn,
         |    len(list_filter(rt, (t, i) -> i % 3 != 0)) AS cn FROM tk
         |)
         |SELECT doc_id AS id, CAST(rn - cn AS BIGINT) AS distance,
         |  CAST(0 AS BIGINT) AS subs, CAST(rn - cn AS BIGINT) AS dels,
         |  CAST(0 AS BIGINT) AS ins, CAST(cn AS BIGINT) AS cand_tokens,
         |  CAST(rn AS BIGINT) AS ref_tokens,
         |  round((rn - cn)::DOUBLE / rn, 6) AS wer
         |FROM pr WHERE rn > 0 ORDER BY id""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents").select(col("doc_id").as("id"),
        col("text").as("ref"),
        concat_ws(" ", filter(
          filter(split(TA.normalize(col("text")), " "), t => length(t) > 0),
          (t, i) => (i + 1) % 3 =!= 0)).as("cand"))
      graft.ml.GenEval.wer(d, "id", "cand", "ref")
        .select(col("id"), col("distance").cast("long").as("distance"),
          col("subs").cast("long").as("subs"),
          col("dels").cast("long").as("dels"),
          col("ins").cast("long").as("ins"),
          col("cand_tokens").cast("long").as("cand_tokens"),
          col("ref_tokens").cast("long").as("ref_tokens"),
          round(col("wer"), 6).as("wer"))
        .orderBy("id")
    },

    q("q_eval_rouge_l",
      s"""WITH tk AS (
         |  SELECT doc_id, list_filter(string_split($normSql, ' '),
         |    t -> t <> '') AS rt
         |  FROM documents
         |), pr AS (
         |  SELECT doc_id, len(rt) AS rn,
         |    len(list_filter(rt, (t, i) -> i % 3 != 0)) AS cn FROM tk
         |)
         |SELECT doc_id AS id, CAST(cn AS INT) AS lcs,
         |  CAST(cn AS INT) AS cand_tokens, CAST(rn AS INT) AS ref_tokens,
         |  CASE WHEN cn > 0 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END AS precision,
         |  round(cn::DOUBLE / rn, 6) AS recall,
         |  round(CASE WHEN cn > 0
         |    THEN 2.0 * (cn::DOUBLE / rn) / (1.0 + cn::DOUBLE / rn)
         |    ELSE 0.0 END, 6) AS f1
         |FROM pr WHERE rn > 0 ORDER BY id""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents").select(col("doc_id").as("id"),
        col("text").as("ref"),
        concat_ws(" ", filter(
          filter(split(TA.normalize(col("text")), " "), t => length(t) > 0),
          (t, i) => (i + 1) % 3 =!= 0)).as("cand"))
      graft.ml.GenEval.rougeL(d, "id", "cand", "ref")
        .select(col("id"), col("lcs"), col("cand_tokens"),
          col("ref_tokens"), round(col("precision"), 6).as("precision"),
          round(col("recall"), 6).as("recall"), round(col("f1"), 6).as("f1"))
        .orderBy("id")
    },

    // Kendall's tau-b per source over a bounded document sample
    // (doc_id % 13 = 0 — the bounded-group contract of the O(n²)
    // kernel): x = n_chars, y = a deterministic pseudo-score; the
    // oracle recomputes concordant/discordant/tie pairs with a
    // within-group pairwise self-join.
    q("q_eval_kendall",
      """WITH d AS (
        |  SELECT source, doc_id, n_chars::DOUBLE AS x,
        |    ((doc_id * 37) % 101)::DOUBLE AS y
        |  FROM documents WHERE doc_id % 13 = 0
        |), p AS (
        |  SELECT a.source,
        |    CASE WHEN (a.x < b.x AND a.y < b.y) OR (a.x > b.x AND a.y > b.y)
        |      THEN 1 ELSE 0 END AS c,
        |    CASE WHEN (a.x < b.x AND a.y > b.y) OR (a.x > b.x AND a.y < b.y)
        |      THEN 1 ELSE 0 END AS dd,
        |    CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
        |    CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
        |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
        |), g AS (
        |  SELECT source, count(*) AS n FROM d GROUP BY 1
        |), s AS (
        |  SELECT source, sum(c)::BIGINT AS concordant,
        |    sum(dd)::BIGINT AS discordant, sum(tx) AS txs, sum(ty) AS tys
        |  FROM p GROUP BY 1
        |)
        |SELECT g.source, g.n, coalesce(s.concordant, 0) AS concordant,
        |  coalesce(s.discordant, 0) AS discordant,
        |  round((coalesce(s.concordant, 0) - coalesce(s.discordant, 0))
        |    / sqrt((g.n * (g.n - 1) / 2.0 - coalesce(s.txs, 0))
        |         * (g.n * (g.n - 1) / 2.0 - coalesce(s.tys, 0))), 6) AS tau
        |FROM g LEFT JOIN s USING (source) ORDER BY source""".stripMargin) {
      (s, dir) =>
      val d = t(s, dir, "documents").filter(col("doc_id") % 13 === 0)
        .select(col("source"), col("n_chars").cast("double").as("x"),
          ((col("doc_id") * 37) % 101).cast("double").as("y"))
      graft.ml.GenEval.kendallTau(d, "source", "x", "y")
        .select(col("source"), col("n"), col("concordant"),
          col("discordant"), round(col("tau"), 6).as("tau"))
        .orderBy("source")
    }
  )
}
