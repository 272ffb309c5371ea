package graft.queries

import org.apache.spark.sql.functions._
import graft.ml.Similarity

/** Similarity-search coverage over `embeddings` (64-dim float
  * vectors). Cosine math runs in double precision on both engines
  * (Spark casts the floats up; DuckDB's list_cosine_similarity
  * computes in double), so rounded scores hash-match.
  */
object EmbeddingQueries extends QueryGroup {

  val all: Seq[QueryDef] = Seq(

    // exact brute-force top-k: 10 query vectors against the full
    // corpus — broadcast queries, one linear corpus scan, per-query
    // bounded top-k.
    q("q_ann_bruteforce",
      """SELECT q.vec_id AS qid, c.vec_id AS cid,
        |  round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS cos
        |FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
        |WHERE q.vec_id < 10
        |QUALIFY row_number() OVER (PARTITION BY q.vec_id
        |  ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) <= 5
        |ORDER BY qid, cid""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity.bruteForceTopK(e.filter(col("id") < 10), e, 5)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("qid", "cid")
    },

    // embedding near-duplicate pairs: exact all-pairs cosine >= 0.9
    // by label block (labels partition the corpus like an IVF coarse
    // quantizer would).
    q("q_embed_neardup",
      """SELECT a.vec_id AS id1, b.vec_id AS id2,
        |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cos
        |FROM embeddings a JOIN embeddings b
        |  ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.9
        |ORDER BY id1, id2""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val a = e.select(col("vec_id").as("id1"), col("embedding").as("v1"),
        col("label"))
      val b = e.select(col("vec_id").as("id2"), col("embedding").as("v2"),
        col("label"))
      a.join(b, "label")
        .filter(col("id1") < col("id2"))
        .withColumn("cos", Similarity.cosine(col("v1"), col("v2")))
        .filter(col("cos") >= 0.9)
        .select(col("id1"), col("id2"), round(col("cos"), 6).as("cos"))
        .orderBy("id1", "id2")
    },

    // LSH-bucketed ANN (the 100 TB path: bucket join instead of cross
    // join). Probabilistic recall ⇒ no SQL oracle; the driver records
    // a rows-only check, and the spec suite checks recall >= 0.4
    // against brute force.
    qNoOracle("q_ann_lsh") { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity.lshTopK(e.filter(col("id") < 10), e, dim = 64, k = 5, nBits = 4)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("qid", "cid")
    },

    // IVF ANN: recall-bounded contract vs brute force — the query
    // reports whether IVF(nProbe=4) recovers >= 40% of the exact
    // top-5 per query; the oracle asserts the bound.
    q("q_ann_ivf",
      """SELECT q.vec_id AS qid, true AS recall_ok
        |FROM embeddings q WHERE q.vec_id < 10 ORDER BY qid""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val queries = e.filter(col("id") < 10)
      val exact = Similarity.bruteForceTopK(queries, e, 5)
        .select(col("qid"), col("cid").as("exact_cid"))
      val ivf = Similarity.ivfTopK(queries, e, k = 5, nCentroids = 16, nProbe = 8)
        .select(col("qid"), col("cid"))
      val hits = exact.join(ivf,
          exact("qid") === ivf("qid") && col("exact_cid") === col("cid"), "left_semi")
        .groupBy("qid").agg(count(lit(1)).as("n_hit"))
      queries.select(col("id").as("qid")).join(hits, Seq("qid"), "left")
        .select(col("qid"),
          (coalesce(col("n_hit"), lit(0L)) >= 2).as("recall_ok"))
        .orderBy("qid")
    }
  )
}
