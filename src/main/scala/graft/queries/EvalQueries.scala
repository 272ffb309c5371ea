package graft.queries

import org.apache.spark.sql.functions._
import graft.ml.{Eval, Similarity, TextAnalysis => TA}

/** Gates for the evaluation-metric operators ([[graft.ml.Eval]]):
  * ROC AUC (Mann–Whitney midranks), average precision, NDCG@k over a
  * retrieval shortlist, and Cohen's kappa — each replayed by the
  * DuckDB oracle from the same closed forms.
  */
object EvalQueries extends QueryGroup {

  // DuckDB mirror of TextAnalysis.tokenCount (the q_text_pack idiom)
  private val tokSql =
    "CASE WHEN strlen(trim(text)) = 0 THEN 0 " +
      "ELSE len(string_split_regex(trim(text), '\\s+')) END"

  val all: Seq[QueryDef] = Seq(

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
    }
  )
}
