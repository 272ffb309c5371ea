package graft.queries

import org.apache.spark.sql.functions._
import graft.ml.{Pq, Similarity}

/** Similarity-search coverage over `embeddings` (64-dim float
  * vectors). Cosine math runs in double precision on both engines
  * (Spark casts the floats up; DuckDB's list_cosine_similarity
  * computes in double), so rounded scores hash-match.
  */
object EmbeddingQueries extends QueryGroup {

  /** DuckDB replica of `Similarity.bandedLshTopK(k=5, 4 bands × 8
    * bits)`: per-band signatures from the same axis-pair sign bits
    * (1-indexed list access; CAST to DOUBLE[] makes the adds identical
    * to Spark's float→double arithmetic), OR-amplified candidate join,
    * exact cosine re-score, top-5 by (cos DESC, cid).
    */
  private def lshOracleSql: String = {
    val bands = (0 until 4).map { b =>
      val sig = (0 until 8).map { j =>
        val i = b * 8 + j
        s"(CASE WHEN v[${2 * i + 1}] + v[${2 * i + 2}] > 0 THEN ${1L << j} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, $b AS band, CAST($sig AS BIGINT) AS sig FROM e"
    }.mkString("\n  UNION ALL ")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), sigs AS (
       |  $bands
       |), cand AS (
       |  SELECT DISTINCT qs.vec_id AS qid, cs.vec_id AS cid
       |  FROM sigs qs JOIN sigs cs ON qs.band = cs.band AND qs.sig = cs.sig
       |  WHERE qs.vec_id < 10 AND cs.vec_id <> qs.vec_id
       |), scored AS (
       |  SELECT c.qid, c.cid,
       |    list_cosine_similarity(qe.v, ce.v) AS cos_exact
       |  FROM cand c
       |  JOIN e qe ON qe.vec_id = c.qid
       |  JOIN e ce ON ce.vec_id = c.cid
       |)
       |SELECT qid, cid, round(cos_exact, 6) AS cos FROM scored
       |QUALIFY row_number() OVER (PARTITION BY qid
       |  ORDER BY cos_exact DESC, cid) <= 5
       |ORDER BY qid, cid""".stripMargin
  }

  /** DuckDB replica of `Similarity.randomProject(64→16, seed "jl42")`:
    * the oracle is generated from the SAME Achlioptas matrix the
    * Spark plan compiles in, each output component the identical
    * left-associated 0.0-seeded ± chain, so the doubles match
    * exactly before rounding.
    */
  private def jlOracleSql: String = {
    val r = Similarity.achlioptasMatrix(64, 16, "jl42")
    val scale = math.sqrt(3.0 / 16)
    val comps = (0 until 16).map { i =>
      val terms = (0 until 64).flatMap { j =>
        r(j)(i) match {
          case 1 => Some(s"+ v[${j + 1}]")
          case -1 => Some(s"- v[${j + 1}]")
          case _ => None
        }
      }
      val chain =
        if (terms.isEmpty) "0.0" else "0.0 " + terms.mkString(" ")
      val name = f"y$i%02d"
      s"round(CAST('$scale' AS DOUBLE) * ($chain), 6) AS $name"
    }
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |)
       |SELECT vec_id, ${comps.mkString(",\n  ")}
       |FROM e ORDER BY vec_id""".stripMargin
  }

  /** DuckDB replica of `Similarity.projectedTopK(k=5, 64→16,
    * oversample=4)`: the projection CTE shares the Achlioptas matrix
    * with the Spark plan (identical ± chains), the coarse cosine is
    * the same ascending-component dot/norm arithmetic, the shortlist
    * is the projected-cosine top-20 per query (cid tie-break), and
    * the exact re-rank mirrors the LSH gate's cosine re-score.
    */
  private def jlTopKOracleSql: String = {
    val r = Similarity.achlioptasMatrix(64, 16, "jl42")
    val scale = math.sqrt(3.0 / 16)
    val comps = (0 until 16).map { i =>
      val terms = (0 until 64).flatMap { j =>
        r(j)(i) match {
          case 1 => Some(s"+ v[${j + 1}]")
          case -1 => Some(s"- v[${j + 1}]")
          case _ => None
        }
      }
      val chain =
        if (terms.isEmpty) "0.0" else "0.0 " + terms.mkString(" ")
      val name = f"y$i%02d"
      s"CAST('$scale' AS DOUBLE) * ($chain) AS $name"
    }
    val names = (0 until 16).map(i => f"y$i%02d")
    def dot(a: String, b: String) =
      names.map(n => s"$a.$n * $b.$n").mkString(" + ")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), proj AS MATERIALIZED (
       |  SELECT vec_id, ${comps.mkString(",\n  ")} FROM e
       |), coarse AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS cid,
       |    (${dot("q", "c")}) /
       |      (sqrt(${dot("q", "q")}) * sqrt(${dot("c", "c")})) AS pcos
       |  FROM proj q JOIN proj c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id < 10
       |), short AS (
       |  SELECT qid, cid FROM coarse
       |  QUALIFY row_number() OVER (PARTITION BY qid
       |    ORDER BY pcos DESC, cid) <= 20
       |), rer AS (
       |  SELECT s.qid, s.cid,
       |    list_cosine_similarity(qe.v, ce.v) AS cos_exact
       |  FROM short s
       |  JOIN e qe ON qe.vec_id = s.qid
       |  JOIN e ce ON ce.vec_id = s.cid
       |)
       |SELECT qid, cid, round(cos_exact, 6) AS cos FROM rer
       |QUALIFY row_number() OVER (PARTITION BY qid
       |  ORDER BY cos_exact DESC, cid) <= 5
       |ORDER BY qid, cid""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(

    // projected ANN end-to-end: JL 64→16 coarse scan + oversampled
    // exact re-rank, vs the matrix-sharing full replay.
    q("q_embed_jl_topk", EmbeddingQueries.jlTopKOracleSql) { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity.projectedTopK(e.filter(col("id") < 10), e, k = 5,
          inDim = 64, outDim = 16, seed = "jl42", oversample = 4)
        .select(col("qid"), col("cid"), round(col("cos"), 6).as("cos"))
        .orderBy("qid", "cid")
    },

    // Achlioptas sparse JL projection 64→16: the ANN pre-step at
    // scale, gated component-by-component against the matrix-sharing
    // oracle.
    q("q_embed_jl_project", EmbeddingQueries.jlOracleSql) { (s, dir) =>
      val out = Similarity.randomProject(t(s, dir, "embeddings"),
        "embedding", inDim = 64, outDim = 16, seed = "jl42")
      out.select(
        (col("vec_id") +: (0 until 16).map(i =>
          round(element_at(col("proj"), i + 1), 6)
            .as(f"y$i%02d"))): _*)
        .orderBy("vec_id")
    },

    // PCA's distributed heart: the one-pass (count, Σx, Σxxᵀ) moments
    // aggregate, exposed as the full population covariance matrix and
    // checked cell-by-cell against DuckDB's covar_pop over unnested
    // components. The eigen/projection steps on top are driver-local
    // and spec-gated (PcaSpec); this gate pins the only part that
    // touches the corpus at scale.
    q("q_embed_pca_cov",
      """WITH comp AS (
        |  SELECT vec_id, CAST(r.range - 1 AS BIGINT) AS i,
        |    CAST(embedding[CAST(r.range AS INT)] AS DOUBLE) AS x
        |  FROM embeddings CROSS JOIN range(1, 65) r
        |)
        |SELECT a.i AS i, b.i AS j,
        |  round(covar_pop(a.x, b.x), 6) + 0.0::DOUBLE AS cov
        |FROM comp a JOIN comp b ON a.vec_id = b.vec_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      graft.ml.Pca.covarianceMatrix(t(s, dir, "embeddings"), "embedding", 64)
        // + 0.0 collapses IEEE signed zero before the value-hash compare
        .withColumn("cov", round(col("cov"), 6) + lit(0.0))
        .orderBy("i", "j")
    },

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

    // exact cosine range search: every (query, corpus) pair at or
    // above a similarity floor — the threshold companion to
    // q_ann_bruteforce's fixed-k. Probe batch = vec_id < 10.
    q("q_ann_range",
      """SELECT q.vec_id AS qid, c.vec_id AS cid,
        |  round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS cos
        |FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
        |WHERE q.vec_id < 10
        |  AND list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) >= 0.35
        |ORDER BY qid, cid""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity.rangeSearch(e.filter(col("id") < 10), e, 0.35)
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

    // the SQL-injected native expression path: the same near-dup
    // pairs computed through `spark.sql` with the codegen'd
    // `vec_cosine` Catalyst expression registered by GraftExtensions
    // (SparkSessionExtensions) — exercising SQL function injection
    // end-to-end through the gate, not just in a spec.
    q("q_sql_vec_cosine",
      """SELECT a.vec_id AS id1, b.vec_id AS id2,
        |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cos
        |FROM embeddings a JOIN embeddings b
        |  ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE a.vec_id < 40 AND b.vec_id < 40
        |  AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.5
        |ORDER BY id1, id2""".stripMargin) { (s, dir) =>
      t(s, dir, "embeddings").createOrReplaceTempView("graft_embeddings")
      s.sql(
        """SELECT a.vec_id AS id1, b.vec_id AS id2,
          |  round(vec_cosine(a.embedding, b.embedding), 6) AS cos
          |FROM graft_embeddings a JOIN graft_embeddings b
          |  ON a.label = b.label AND a.vec_id < b.vec_id
          |WHERE a.vec_id < 40 AND b.vec_id < 40
          |  AND vec_cosine(a.embedding, b.embedding) >= 0.5
          |ORDER BY id1, id2""".stripMargin)
    },

    // LSH-bucketed ANN (the 100 TB path: bucket join instead of cross
    // join), with the DETERMINISTIC axis-pair signature so the full
    // candidate generation + exact re-score is replicated in the
    // DuckDB oracle bit-for-bit (4 bands × 8 bits over 64 dims; bit j
    // of band b = sign(v[2i]+v[2i+1]), i = 8b+j — pure double
    // adds, no RNG). The Gaussian-hyperplane lshTopK stays as the
    // API-parity variant, recall-tested in MlSpec.
    q("q_ann_lsh", EmbeddingQueries.lshOracleSql) { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity.bandedLshTopK(e.filter(col("id") < 10), e, k = 5,
          nBands = 4, bitsPerBand = 8)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("qid", "cid")
    },

    // SemDeDup-style semantic dedup: k-means blocks + in-block exact
    // cosine. Two-part contract: (a) n_exact — the full exact pair
    // count at cos >= 0.5 — must equal DuckDB's (a cross-engine check
    // of the cosine arithmetic itself), and (b) the blocked path must
    // recover >= 85% of those pairs (integer compare, no float
    // boundary; 0.5-cosine pairs are 60° apart, the hardest case for
    // any blocking scheme — precision is exact by construction, the
    // planted-cluster MlSpec proves 100% recall on actual near-dups).
    q("q_dedup_semantic",
      """SELECT CAST(count(*) AS BIGINT) AS n_exact, true AS recall_ok
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.5""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val exact = e.select(col("id").as("id1"), col("vec").as("v1"))
        .join(e.select(col("id").as("id2"), col("vec").as("v2")),
          col("id1") < col("id2"))
        .filter(Similarity.cosine(col("v1"), col("v2")) >= 0.5)
        .select("id1", "id2")
      val found = graft.ml.Dedup.semanticDuplicates(e, "id", "vec",
          threshold = 0.5, nCentroids = 16, softAssign = 4)
        .select("id1", "id2").withColumn("__f", lit(true))
      exact.join(found, Seq("id1", "id2"), "left")
        .agg(count(lit(1)).as("n_exact"),
          coalesce(sum(when(col("__f"), 1L).otherwise(0L)), lit(0L)).as("__hit"))
        .select(col("n_exact"),
          (col("__hit") * 100 >= col("n_exact") * 85).as("recall_ok"))
    },

    // IVF ANN: recall-bounded contract vs brute force — the query
    // reports whether IVF(nProbe=4) recovers >= 40% of the exact
    // top-5 per query; the oracle asserts the bound.
    // int8 scalar quantization (4× smaller ANN corpus): for the EXACT
    // top-5 pairs, the quantized cosine must sit within 0.03 of the
    // float cosine — a deterministic tolerance contract (recall-style
    // gates are SF-sensitive; numeric error bounds are not).
    q("q_ann_quantized",
      """SELECT q.vec_id AS qid, true AS quant_ok
        |FROM embeddings q WHERE q.vec_id < 10 ORDER BY qid""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val queries = e.filter(col("id") < 10)
      val exact = Similarity.bruteForceTopK(queries, e, 5)
      val corpusQ = Similarity.quantizeInt8(e)
      val qq = corpusQ.select(col("id").as("qid"), col("qvec").as("qv"),
        col("qnorm").as("qn"))
      val cq = corpusQ.select(col("id").as("cid"), col("qvec").as("cv"),
        col("qnorm").as("cn"))
      exact.join(qq, "qid").join(cq, "cid")
        .select(col("qid"), col("cos"), col("qv"), col("qn"), col("cv"), col("cn"))
        .as[(Long, Double, Array[Byte], Double, Array[Byte], Double)]
        .map { case (qid, cos, qv, qn, cv, cn) =>
          (qid,
            math.abs(Similarity.QuantUtil.intDot(qv, cv) / (qn * cn) - cos))
        }
        .toDF("qid", "err")
        .groupBy("qid").agg((max("err") <= 0.03).as("quant_ok"))
        .orderBy("qid")
    },

    q("q_ann_ivf",
      """SELECT q.vec_id AS qid, true AS recall_ok
        |FROM embeddings q WHERE q.vec_id < 10 ORDER BY qid""".stripMargin) { (s, dir) =>
      ivfRecallContract(s, dir, quantized = false)
    },

    // same probe structure over int8 lists (¼ the scan bytes): the
    // only added error is the bounded quantized-cosine wobble, so the
    // identical recall contract must hold.
    q("q_ann_ivf_quantized",
      """SELECT q.vec_id AS qid, true AS recall_ok
        |FROM embeddings q WHERE q.vec_id < 10 ORDER BY qid""".stripMargin) { (s, dir) =>
      ivfRecallContract(s, dir, quantized = true)
    },

    // product quantization: 8-byte codes (32× vs float32), ADC scan +
    // exact re-rank of a 50-deep shortlist — the compressed-scan shape
    // for a 100 TB embedding corpus. Same ≥2-of-top-5 recall contract
    // as the IVF gates.
    q("q_ann_pq",
      """SELECT q.vec_id AS qid, true AS recall_ok
        |FROM embeddings q WHERE q.vec_id < 10 ORDER BY qid""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val queries = e.filter(col("id") < 10)
      val exact = Similarity.bruteForceTopK(queries, e, 5)
        .select(col("qid"), col("cid").as("exact_cid"))
      val pq = Pq.pqTopK(queries, e, k = 5, m = 8, kCodes = 16,
          iters = 2, rerank = 50)
        .select(col("qid"), col("cid"))
      val hits = exact.join(pq,
          exact("qid") === pq("qid") && col("exact_cid") === col("cid"),
          "left_semi")
        .groupBy("qid").agg(count(lit(1)).as("n_hit"))
      queries.select(col("id").as("qid")).join(hits, Seq("qid"), "left")
        .select(col("qid"),
          (coalesce(col("n_hit"), lit(0L)) >= 2).as("recall_ok"))
        .orderBy("qid")
    },

    // IVF-PQ: coarse inverted lists + residual PQ codes (FAISS's
    // production index shape) — probes 8/16 lists, ADC-scans 8-byte
    // residual codes, exact-re-ranks a 50-deep shortlist. Same
    // ≥2-of-top-5 recall contract.
    q("q_ann_ivfpq",
      """SELECT q.vec_id AS qid, true AS recall_ok
        |FROM embeddings q WHERE q.vec_id < 10 ORDER BY qid""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val queries = e.filter(col("id") < 10)
      val exact = Similarity.bruteForceTopK(queries, e, 5)
        .select(col("qid"), col("cid").as("exact_cid"))
      val ivfpq = Pq.ivfPqTopK(queries, e, k = 5, nCentroids = 16,
          nProbe = 8, m = 8, kCodes = 16, rerank = 50, softAssign = 2)
        .select(col("qid"), col("cid"))
      val hits = exact.join(ivfpq,
          exact("qid") === ivfpq("qid") && col("exact_cid") === col("cid"),
          "left_semi")
        .groupBy("qid").agg(count(lit(1)).as("n_hit"))
      queries.select(col("id").as("qid")).join(hits, Seq("qid"), "left")
        .select(col("qid"),
          (coalesce(col("n_hit"), lit(0L)) >= 2).as("recall_ok"))
        .orderBy("qid")
    },

    // explicit-centroid assignment (the block under prototypicality
    // pruning and incremental IVF maintenance): argmax-cosine over a
    // broadcast (cid, cvec) table, one corpus scan, no shuffle. With
    // the centroid table pinned to vec_id < 8 the whole op is
    // SQL-expressible, so this is a full hash-match oracle (not a
    // recall contract): every id's centroid and rounded score.
    q("q_embed_assign",
      """WITH c AS (
        |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
        |  FROM embeddings WHERE vec_id < 8
        |), s AS (
        |  SELECT e.vec_id AS id, c.cid,
        |    list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec) AS cos
        |  FROM embeddings e CROSS JOIN c
        |)
        |SELECT id, cid AS centroid, round(cos, 6) + 0.0 AS proto FROM s
        |QUALIFY row_number() OVER (PARTITION BY id ORDER BY cos DESC, cid) = 1
        |ORDER BY id""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val cents = e.filter(col("id") < 8)
        .select(col("id").as("cid"), col("vec").as("cvec"))
      Similarity.assignToCentroids(e, cents)
        .select(col("id"), col("centroid"),
          (round(col("proto"), 6) + lit(0.0)).as("proto"))
        .orderBy("id")
    },

    // margin-based parallel-pair mining (LASER / Artetxe & Schwenk
    // ratio margin): even vec_ids play corpus A, odd play corpus B;
    // candidates are each side's 8-NN in the other, cosine rescaled
    // by the mean of both endpoints' neighborhood similarities, and a
    // pair is mined when the sides pick each other (mutual argmax)
    // above margin 1.0. Full hash-match oracle: DuckDB replays the
    // exact k-NN, neighborhood means, margin, and mutual-argmax.
    q("q_embed_margin_mine",
      """WITH a AS (
        |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id % 2 = 0
        |), b AS (
        |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id % 2 = 1
        |), pairs AS (
        |  SELECT a.id AS a_id, b.id AS b_id,
        |    list_cosine_similarity(a.v, b.v) AS cos
        |  FROM a CROSS JOIN b
        |), fwd AS (
        |  SELECT * FROM pairs QUALIFY row_number() OVER (
        |    PARTITION BY a_id ORDER BY cos DESC, b_id) <= 8
        |), bwd AS (
        |  SELECT * FROM pairs QUALIFY row_number() OVER (
        |    PARTITION BY b_id ORDER BY cos DESC, a_id) <= 8
        |), nna AS (SELECT a_id, avg(cos) AS nn_a FROM fwd GROUP BY 1
        |), nnb AS (SELECT b_id, avg(cos) AS nn_b FROM bwd GROUP BY 1
        |), cand AS (
        |  SELECT a_id, b_id, max(cos) AS cos
        |  FROM (SELECT * FROM fwd UNION ALL SELECT * FROM bwd)
        |  GROUP BY 1, 2
        |), m AS (
        |  SELECT c.a_id, c.b_id, c.cos,
        |    c.cos / ((nn_a + nn_b) / 2) AS margin
        |  FROM cand c JOIN nna USING (a_id) JOIN nnb USING (b_id)
        |)
        |SELECT a_id, b_id, round(cos, 6) + 0.0 AS cos,
        |  round(margin, 6) + 0.0 AS margin
        |FROM m
        |WHERE margin >= 1.0
        |QUALIFY row_number() OVER (PARTITION BY a_id
        |    ORDER BY margin DESC, b_id) = 1
        |  AND row_number() OVER (PARTITION BY b_id
        |    ORDER BY margin DESC, a_id) = 1
        |ORDER BY a_id""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity.marginMining(
          e.filter(col("id") % 2 === 0), e.filter(col("id") % 2 === 1),
          k = 8, minMargin = 1.0)
        .select(col("a_id"), col("b_id"),
          (round(col("cos"), 6) + lit(0.0)).as("cos"),
          (round(col("margin"), 6) + lit(0.0)).as("margin"))
        .orderBy("a_id")
    },

    // the mining scale path: same margin algebra with IVF retrieval
    // (16 lists, probe 4, x2 soft assignment) instead of brute-force
    // k-NN. Contract: the IVF-mined pair set recovers >= 70% of the
    // exact mined pairs (recall), and every IVF-mined pair that IS
    // exact-mined carries the identical margin (the algebra downstream
    // of retrieval is retrieval-agnostic).
    q("q_embed_margin_ivf",
      """SELECT CAST(1 AS BIGINT) AS one, true AS recall_ok""") { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val a = e.filter(col("id") % 2 === 0)
      val b = e.filter(col("id") % 2 === 1)
      val exact = Similarity.marginMining(a, b, k = 8, minMargin = 1.0)
      val ivf = Similarity.marginMining(a, b, k = 8, minMargin = 1.0,
        knn = (q, c, k) => Similarity.ivfTopK(q, c, k, nCentroids = 16,
          nProbe = 4, corpusAssign = 2))
      exact.join(ivf.select(col("a_id"), col("b_id"), lit(1).as("__hit")),
          Seq("a_id", "b_id"), "left")
        .agg((sum(coalesce(col("__hit"), lit(0))).cast("double") /
          count(lit(1))).as("recall"))
        .select(lit(1L).as("one"), (col("recall") >= 0.7).as("recall_ok"))
    },

    // pairwise cosine between per-label embedding centroids — the
    // source-similarity matrix behind mixing decisions; fully
    // relational ((label, dim) mean table, dim-joined dot products).
    q("q_embed_strata_sim",
      """WITH comp AS (
        |  SELECT CAST(label AS VARCHAR) AS s,
        |    CAST(r.range - 1 AS BIGINT) AS i,
        |    CAST(embedding[CAST(r.range AS INT)] AS DOUBLE) AS x
        |  FROM embeddings CROSS JOIN range(1, 65) r
        |), m AS (
        |  SELECT s, i, avg(x) AS m FROM comp GROUP BY 1, 2
        |), n AS (
        |  SELECT s, sqrt(sum(m * m)) AS nrm FROM m GROUP BY 1
        |), d AS (
        |  SELECT a.s AS sa, b.s AS sb, sum(a.m * b.m) AS dot
        |  FROM m a JOIN m b ON a.i = b.i AND a.s < b.s GROUP BY 1, 2
        |)
        |SELECT sa AS stratum_a, sb AS stratum_b,
        |  round(dot / (na.nrm * nb.nrm), 6) + 0.0 AS cos
        |FROM d JOIN n na ON na.s = d.sa JOIN n nb ON nb.s = d.sb
        |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      Similarity.strataCentroidSimilarity(
          t(s, dir, "embeddings"), "label", "embedding")
        .select(col("stratum_a"), col("stratum_b"),
          (round(col("cos"), 6) + lit(0.0)).as("cos"))
        .orderBy("stratum_a", "stratum_b")
    },

    // per-dimension embedding drift (standardized mean difference)
    // between the even- and odd-id halves of the corpus: two
    // dim-keyed moment aggregates + a 64-row join, checked
    // cell-by-cell against DuckDB's avg/var_pop over unnested
    // components.
    q("q_embed_drift",
      """WITH comp AS (
        |  SELECT vec_id, CAST(r.range - 1 AS BIGINT) AS i,
        |    CAST(embedding[CAST(r.range AS INT)] AS DOUBLE) AS x
        |  FROM embeddings CROSS JOIN range(1, 65) r
        |), a AS (
        |  SELECT i, avg(x) AS mean_a, var_pop(x) AS var_a
        |  FROM comp WHERE vec_id % 2 = 0 GROUP BY 1
        |), b AS (
        |  SELECT i, avg(x) AS mean_b, var_pop(x) AS var_b
        |  FROM comp WHERE vec_id % 2 = 1 GROUP BY 1
        |)
        |SELECT a.i AS i,
        |  round(mean_a, 6) + 0.0 AS mean_a, round(mean_b, 6) + 0.0 AS mean_b,
        |  round(var_a, 6) + 0.0 AS var_a, round(var_b, 6) + 0.0 AS var_b,
        |  round(CASE WHEN sqrt((var_a + var_b) / 2) > 0
        |    THEN abs(mean_a - mean_b) / sqrt((var_a + var_b) / 2)
        |    ELSE 0.0 END, 6) + 0.0 AS smd
        |FROM a JOIN b USING (i) ORDER BY i""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      graft.ml.Profile.embeddingDrift(
          e.filter(col("vec_id") % 2 === 0),
          e.filter(col("vec_id") % 2 === 1), "embedding")
        .select(col("i"),
          (round(col("mean_a"), 6) + lit(0.0)).as("mean_a"),
          (round(col("mean_b"), 6) + lit(0.0)).as("mean_b"),
          (round(col("var_a"), 6) + lit(0.0)).as("var_a"),
          (round(col("var_b"), 6) + lit(0.0)).as("var_b"),
          (round(col("smd"), 6) + lit(0.0)).as("smd"))
        .orderBy("i")
    }
  )

  /** ≥2-of-top-5 exact neighbors recovered, per query — shared by the
    * float and int8 IVF gates.
    */
  private def ivfRecallContract(s: org.apache.spark.sql.SparkSession,
      dir: String, quantized: Boolean): org.apache.spark.sql.DataFrame = {
    val e = t(s, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = e.filter(col("id") < 10)
    val exact = Similarity.bruteForceTopK(queries, e, 5)
      .select(col("qid"), col("cid").as("exact_cid"))
    val ivf = (if (quantized)
        Similarity.ivfTopKQuantized(queries, e, k = 5, nCentroids = 16,
          nProbe = 8, corpusAssign = 2)
      else
        Similarity.ivfTopK(queries, e, k = 5, nCentroids = 16, nProbe = 8,
          corpusAssign = 2))
      .select(col("qid"), col("cid"))
    val hits = exact.join(ivf,
        exact("qid") === ivf("qid") && col("exact_cid") === col("cid"), "left_semi")
      .groupBy("qid").agg(count(lit(1)).as("n_hit"))
    queries.select(col("id").as("qid")).join(hits, Seq("qid"), "left")
      .select(col("qid"),
        (coalesce(col("n_hit"), lit(0L)) >= 2).as("recall_ok"))
      .orderBy("qid")
  }
}
