package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ml.Dedup

/** Deduplication coverage over `documents`. The raw synthetic corpus
  * has no duplicates, so each query first *augments* it
  * deterministically — exact copies (doc_id+1000000) for every 10th
  * doc, 90%-prefix near-copies (doc_id+2000000) for every 7th — in
  * both engines, then runs the dedup operator. The probabilistic
  * paths (MinHash LSH, SimHash) verify candidates with true Jaccard,
  * so their confirmed-pairs output equals the exact all-pairs answer
  * whenever recall holds — with 32 bands × 4 rows, a Jaccard-0.8 pair
  * is missed with p ≈ 5e-8 (the prefix copies sit ≥ 0.8).
  */
object DedupQueries extends QueryGroup {

  /** documents ∪ exact copies ∪ prefix near-copies. */
  private def augmented(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select("doc_id", "text", "lang", "source")
    val exact = d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
        col("lang"), col("source"))
    val prefix = d.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        substring(col("text"), 1, 10000).substr(lit(1),
          floor(length(col("text")) * 0.9).cast("int")).as("text"),
        col("lang"), col("source"))
    d.unionByName(exact).unionByName(prefix)
  }

  private val augmentedSql =
    """WITH docs AS (
      |  SELECT doc_id, text, lang, source FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text, lang, source FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 2000000,
      |         substr(text, 1, CAST(floor(strlen(text) * 0.9) AS INT)),
      |         lang, source
      |  FROM documents WHERE doc_id % 7 = 0
      |)""".stripMargin

  // DuckDB mirror of Dedup.shingles (2-word shingles of normalized
  // text, as strings — Jaccard over string sets equals Jaccard over
  // the 64-bit shingle hashes Spark uses, absent collisions).
  private val shinglesSql =
    """list_distinct(list_transform(
      |  range(1, greatest(len(string_split(trim(regexp_replace(regexp_replace(lower(text),
      |    '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ')), 2)),
      |  i -> string_split(trim(regexp_replace(regexp_replace(lower(text),
      |    '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ')[i] || ' ' ||
      |       string_split(trim(regexp_replace(regexp_replace(lower(text),
      |    '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ')[i+1]))""".stripMargin
      .replace("\n", " ")

  /** All near-dup pairs by exact 2-shingle Jaccard >= 0.7, blocked by
    * (lang, source) — the shared oracle for all three near-dup paths.
    */
  private val exactPairsSql =
    s"""$augmentedSql, sh AS (
       |  SELECT doc_id, lang, source, $shinglesSql AS s FROM docs
       |)
       |SELECT a.doc_id AS id1, b.doc_id AS id2,
       |  round(len(list_intersect(a.s, b.s)) * 1.0::DOUBLE /
       |        len(list_distinct(a.s || b.s)), 6) AS jaccard
       |FROM sh a JOIN sh b ON a.lang = b.lang AND a.source = b.source
       |WHERE a.doc_id < b.doc_id
       |  AND len(list_intersect(a.s, b.s)) * 1.0::DOUBLE /
       |      len(list_distinct(a.s || b.s)) >= 0.7
       |ORDER BY id1, id2""".stripMargin

  /** All near-dup pairs by exact 2-shingle Jaccard >= 0.7 with NO
    * blocking — shared oracle for the paths that must recover the
    * full unblocked answer (MinHash LSH, prefix-filter join).
    */
  private val unblockedPairsSql =
    s"""$augmentedSql, sh AS (
       |  SELECT doc_id, $shinglesSql AS s FROM docs
       |)
       |SELECT a.doc_id AS id1, b.doc_id AS id2,
       |  round(len(list_intersect(a.s, b.s)) * 1.0::DOUBLE /
       |        len(list_distinct(a.s || b.s)), 6) AS jaccard
       |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |WHERE len(list_intersect(a.s, b.s)) * 1.0::DOUBLE /
       |      len(list_distinct(a.s || b.s)) >= 0.7
       |ORDER BY id1, id2""".stripMargin

  /** Transitive closure over the exact-Jaccard pair set (recursive
    * CTE) — shared oracle for both connected-components algorithms.
    */
  // pairs/edges are AS MATERIALIZED: both are referenced twice and
  // DuckDB's default CTE inlining recomputes the quadratic shingle
  // pair join per reference — measured 26 s inlined vs ~10 s at
  // sf0.01 (round-8; `sh` stays inline — materializing the big list
  // column measured SLOWER than recomputing it)
  private val componentsCteSql =
    s"""${augmentedSql.replaceFirst("WITH ", "WITH RECURSIVE ")}, sh AS (
       |  SELECT doc_id, $shinglesSql AS s FROM docs
       |), pairs AS MATERIALIZED (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |  WHERE len(list_intersect(a.s, b.s)) * 1.0::DOUBLE /
       |        len(list_distinct(a.s || b.s)) >= 0.7
       |), edges AS MATERIALIZED (
       |  SELECT id1 AS src, id2 AS dst FROM pairs
       |  UNION ALL SELECT id2, id1 FROM pairs
       |), reach(id, r) AS (
       |  SELECT DISTINCT src, src FROM edges
       |  UNION
       |  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
       |)""".stripMargin

  private val componentsOracleSql =
    s"""$componentsCteSql
       |SELECT id, min(r) AS component FROM reach
       |GROUP BY id ORDER BY id""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // exact dedup: fingerprint hash group-by, min-id representative.
    q("q_dedup_exact",
      s"""$augmentedSql, fp AS (
         |  SELECT doc_id AS id,
         |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'),
         |      '\\s+', ' ', 'g'))) AS fingerprint
         |  FROM docs
         |)
         |SELECT id, min(id) OVER (PARTITION BY fingerprint) AS canonical_id, fingerprint
         |FROM fp ORDER BY id""".stripMargin) { (s, dir) =>
      Dedup.exactDuplicates(augmented(s, dir), "doc_id", "text")
        .orderBy("id")
    },

    // soft dedup: every copy kept, weighted 1/cluster_size (Σweight =
    // distinct-content count); the planted exact dups get weight 0.5.
    q("q_dedup_weights",
      s"""$augmentedSql, fp AS (
         |  SELECT doc_id AS id,
         |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'),
         |      '\\s+', ' ', 'g'))) AS fingerprint
         |  FROM docs
         |)
         |SELECT id, fingerprint,
         |  count(*) OVER (PARTITION BY fingerprint) AS cluster_size,
         |  round(1.0::DOUBLE / count(*) OVER (PARTITION BY fingerprint), 6)
         |    AS weight
         |FROM fp ORDER BY id""".stripMargin) { (s, dir) =>
      Dedup.dedupWeights(augmented(s, dir), "doc_id", "text")
        .select(col("id"), col("fingerprint"), col("cluster_size"),
          round(col("weight"), 6).as("weight"))
        .orderBy("id")
    },

    // exact all-pairs n-gram Jaccard within (lang, source) blocks.
    q("q_dedup_ngram_jaccard", exactPairsSql) { (s, dir) =>
      Dedup.ngramJaccardPairs(augmented(s, dir), "doc_id", "text",
        Seq("lang", "source"), 0.7)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy("id1", "id2")
    },

    // MinHash LSH near-dups, Jaccard-verified: must equal the exact
    // answer (restricted to the same blocks is NOT applied here — LSH
    // finds cross-block pairs too, so the oracle drops blocking).
    q("q_dedup_minhash", unblockedPairsSql) { (s, dir) =>
      Dedup.minHashNearDuplicates(augmented(s, dir), "doc_id", "text",
        threshold = 0.7)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy("id1", "id2")
    },

    // prefix-filtered exact similarity join (SSJoin/All-Pairs): the
    // lossless deterministic path to the SAME unblocked all-pairs
    // answer — rarest-first prefixes + length filter + verification,
    // no probabilistic recall, no blocking keys.
    q("q_dedup_prefix_jaccard", unblockedPairsSql) { (s, dir) =>
      Dedup.prefixFilterJaccardPairs(augmented(s, dir), "doc_id",
        "text", threshold = 0.7)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy("id1", "id2")
    },

    // blocked prefix-filter join: same exact semantics within
    // (lang, source) blocks — the configuration a corpus with a
    // dense gram distribution runs at scale; shares the blocked
    // all-pairs oracle with q_dedup_ngram_jaccard.
    q("q_dedup_prefix_blocked", exactPairsSql) { (s, dir) =>
      Dedup.prefixFilterJaccardPairs(augmented(s, dir), "doc_id",
        "text", threshold = 0.7, blockCols = Seq("lang", "source"))
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy("id1", "id2")
    },

    // asymmetric containment (quote/excerpt detection): ordered pairs
    // with |sh1 ∩ sh2| / |sh1| ≥ 0.9 within (lang, source) blocks —
    // the prefix-truncation copies score ≈ 1 inside their source doc
    // while their symmetric Jaccard sits near 0.8.
    q("q_dedup_containment",
      s"""$augmentedSql, sh AS (
         |  SELECT doc_id, lang, source, $shinglesSql AS s FROM docs
         |)
         |SELECT a.doc_id AS id1, b.doc_id AS id2,
         |  round(len(list_intersect(a.s, b.s)) * 1.0::DOUBLE /
         |        len(a.s), 6) AS containment
         |FROM sh a JOIN sh b
         |  ON a.lang = b.lang AND a.source = b.source
         |  AND a.doc_id <> b.doc_id
         |WHERE len(list_intersect(a.s, b.s)) * 1.0::DOUBLE /
         |      len(a.s) >= 0.9
         |ORDER BY id1, id2""".stripMargin) { (s, dir) =>
      Dedup.containmentPairs(augmented(s, dir), "doc_id", "text",
        blockCols = Seq("lang", "source"), threshold = 0.9)
        .withColumn("containment", round(col("containment"), 6))
        .orderBy("id1", "id2")
    },

    // dedup-quality audit: banded-MinHash recall against the exact
    // blocked pair set. n_found/recall are engine-side only (the
    // signature hash has no DuckDB counterpart); the oracle pins the
    // ground-truth pair count and the recall contract — the
    // q_embed_margin_ivf invariant-pin pattern.
    q("q_dedup_lsh_quality",
      s"""SELECT CAST(count(*) AS BIGINT) AS n_truth, true AS recall_ok
         |FROM ($exactPairsSql)""".stripMargin) { (s, dir) =>
      Dedup.lshQualityReport(augmented(s, dir), "doc_id", "text",
          threshold = 0.7, blockCols = Seq("lang", "source"),
          minRecall = 0.9)
        .select(col("n_truth"), col("recall_ok"))
    },

    // near-dup pairs → connected components → canonical doc per
    // cluster (Dedup.connectedComponents: min-label propagation with
    // pointer jumping). Oracle: transitive closure via recursive CTE
    // over the same exact-Jaccard pair set.
    q("q_dedup_components", componentsOracleSql) { (s, dir) =>
      Dedup.connectedComponents(
        Dedup.minHashNearDuplicates(augmented(s, dir), "doc_id", "text",
          threshold = 0.7))
        .orderBy("id")
    },

    // same clusters via alternating large/small-star (Kiveris et al.)
    // — the skew-robust web-graph-scale algorithm; identical oracle.
    q("q_dedup_components_star", componentsOracleSql) { (s, dir) =>
      Dedup.connectedComponentsStar(
        Dedup.minHashNearDuplicates(augmented(s, dir), "doc_id", "text",
          threshold = 0.7))
        .orderBy("id")
    },

    // keep-best representative selection ("soft dedup"): each near-dup
    // cluster elects its argmax-score member (longest text here, ties
    // to lowest id); unclustered docs survive as singletons.
    q("q_dedup_keep_best",
      s"""$componentsCteSql, comp AS (
         |  SELECT id, min(r) AS component FROM reach GROUP BY id
         |)
         |SELECT d.doc_id, coalesce(c.component, d.doc_id) AS cluster,
         |  (row_number() OVER (
         |     PARTITION BY coalesce(c.component, d.doc_id)
         |     ORDER BY strlen(d.text) DESC, d.doc_id ASC)) = 1 AS keep
         |FROM docs d LEFT JOIN comp c ON c.id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val aug = augmented(s, dir)
      val comps = Dedup.connectedComponents(
        Dedup.minHashNearDuplicates(aug, "doc_id", "text", threshold = 0.7))
      Dedup.keepBest(aug, "doc_id", comps, length(col("text")))
        .select(col("doc_id"), col("cluster"), col("keep"))
        .orderBy("doc_id")
    },

    // the composition real pipelines run: MinHash near-dup clustering
    // → connected components → keep-best by the composite QUALITY
    // score (not length) — a near-dup cluster keeps its
    // highest-quality member; the prefix near-copies usually LOSE to
    // their full-length originals only when quality says so. Scores
    // are the same discrete component-weighted sums in both engines,
    // ties broken by lowest id.
    q("q_dedup_keep_best_quality",
      s"""$componentsCteSql, comp AS (
         |  SELECT id, min(r) AS component FROM reach GROUP BY id
         |), qual AS (
         |  SELECT doc_id,
         |    (CASE WHEN len(string_split_regex(trim(text), '\\s+')) BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.3 END * 0.3
         |     + CASE WHEN list_aggregate(list_transform(string_split_regex(trim(text), '\\s+'), w -> strlen(w)), 'sum') * 1.0::DOUBLE
         |         / len(string_split_regex(trim(text), '\\s+')) BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.4 END * 0.2
         |     + CASE WHEN len(list_filter(string_split_regex(lower(text), '\\s+'),
         |         w -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','at','by','be','this'], w)))
         |         * 1.0::DOUBLE / len(string_split_regex(trim(text), '\\s+')) > 0.05 THEN 1.0 ELSE 0.6 END * 0.3
         |     + CASE WHEN len(regexp_extract_all(text, '[!-/:-@\\[-`{-~]')) * 1.0::DOUBLE / strlen(text) < 0.2 THEN 1.0 ELSE 0.5 END * 0.2
         |    )::DOUBLE AS quality
         |  FROM docs
         |)
         |SELECT d.doc_id, coalesce(c.component, d.doc_id) AS cluster,
         |  round(q.quality, 6) AS quality,
         |  (row_number() OVER (
         |     PARTITION BY coalesce(c.component, d.doc_id)
         |     ORDER BY q.quality DESC, d.doc_id ASC)) = 1 AS keep
         |FROM docs d JOIN qual q ON q.doc_id = d.doc_id
         |LEFT JOIN comp c ON c.id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      import graft.ml.{TextAnalysis => TA}
      val aug = augmented(s, dir)
      val comps = Dedup.connectedComponents(
        Dedup.minHashNearDuplicates(aug, "doc_id", "text", threshold = 0.7))
      Dedup.keepBest(aug, "doc_id", comps, TA.qualityScore(col("text")))
        .select(col("doc_id"), col("cluster"),
          round(TA.qualityScore(col("text")), 6).as("quality"), col("keep"))
        .orderBy("doc_id")
    },

    // incremental dedup: originals form the signature STORE, the
    // planted copies arrive as a new batch — dedup the batch against
    // the store without re-reading corpus text. Every qualifying pair
    // touches a new doc (copies have ids ≥ 1000000, so with id1 < id2
    // that's exactly the pairs with id2 ≥ 1000000: new×old and
    // new×new); old×old pairs must NOT appear.
    q("q_dedup_incremental",
      s"""$augmentedSql, sh AS (
         |  SELECT doc_id, $shinglesSql AS s FROM docs
         |)
         |SELECT a.doc_id AS id1, b.doc_id AS id2,
         |  round(len(list_intersect(a.s, b.s)) * 1.0::DOUBLE /
         |        len(list_distinct(a.s || b.s)), 6) AS jaccard
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE b.doc_id >= 1000000
         |  AND len(list_intersect(a.s, b.s)) * 1.0::DOUBLE /
         |      len(list_distinct(a.s || b.s)) >= 0.7
         |ORDER BY id1, id2""".stripMargin) { (s, dir) =>
      val aug = augmented(s, dir)
      val store = Dedup.buildSignatureStore(
        aug.filter(col("doc_id") < 1000000L), "doc_id", "text")
      Dedup.incrementalNearDuplicates(
        aug.filter(col("doc_id") >= 1000000L), store, "doc_id", "text",
        threshold = 0.7)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy("id1", "id2")
    },

    // eval-set contamination: probes are mid-document substrings of
    // every 13th doc (planted leakage); a pair is contaminated at ≥3
    // shared distinct 8-grams. Both engines build identical probes
    // (character-based substr/length) and identical gram sets.
    q("q_dedup_contamination", {
      val words = "string_split(trim(regexp_replace(regexp_replace(lower(text), " +
        "'[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ')"
      val gram8 = (0 until 8).map(j => s"w[i+$j]").mkString(" || ' ' || ")
      s"""WITH probes AS (
         |  SELECT doc_id + 3000000 AS doc_id,
         |    substr(text, CAST(floor(length(text) * 0.25) AS INT) + 1,
         |      CAST(floor(length(text) * 0.5) AS INT)) AS text
         |  FROM documents WHERE doc_id % 13 = 0
         |), cw AS (
         |  SELECT doc_id, $words AS w FROM documents
         |), pw AS (
         |  SELECT doc_id, $words AS w FROM probes
         |), cg AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(1, greatest(len(w) - 6, 2)), i -> $gram8))) AS g
         |  FROM cw WHERE len(w) >= 8
         |), pg AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(1, greatest(len(w) - 6, 2)), i -> $gram8))) AS g
         |  FROM pw WHERE len(w) >= 8
         |)
         |SELECT c.doc_id AS corpus_id, p.doc_id AS probe_id,
         |  count(*) AS n_shared
         |FROM cg c JOIN pg p ON c.g = p.g
         |GROUP BY 1, 2 HAVING count(*) >= 3
         |ORDER BY corpus_id, probe_id""".stripMargin
    }) { (s, dir) =>
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val probes = d.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          col("text").substr(
            floor(length(col("text")) * 0.25).cast("int") + 1,
            floor(length(col("text")) * 0.5).cast("int")).as("text"))
      Dedup.contamination(d, probes, "doc_id", "text", n = 8, minShared = 3)
        .orderBy("corpus_id", "probe_id")
    },

    // fuzzy entity-resolution join: all customer-name pairs within
    // levenshtein distance 1 (filter-verify: length band + char-bag
    // prune + exact verify). Oracle: direct blocked join — both
    // engines' levenshtein is the standard edit distance.
    q("q_join_editdist",
      """SELECT a.c_custkey AS id1, b.c_custkey AS id2,
        |  CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
        |FROM customer a JOIN customer b
        |  ON a.c_custkey < b.c_custkey
        |  AND abs(strlen(a.c_name) - strlen(b.c_name)) <= 1
        |WHERE levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY id1, id2""".stripMargin) { (s, dir) =>
      Dedup.editDistancePairs(t(s, dir, "customer"), "c_custkey", "c_name",
        maxDist = 1)
        .orderBy("id1", "id2")
    },

    // exact duplicated-substring spans (suffix-array dedup semantics
    // via k-gram fingerprints): maximal runs of 8-token grams shared
    // by >= 2 docs. The oracle rebuilds the same gram/position/merge
    // pipeline on gram *strings*; Spark groups on xxhash64 of the
    // gram (the 100 TB path) — equal outputs absent 64-bit collisions.
    // winnowing fingerprints (MOSS): k=4-token grams, w=4 windows,
    // per-window minimal md5 (rightmost on ties) — the oracle replays
    // the selection relationally with the same md5-string ordering and
    // the same composite tie-break key.
    q("q_dedup_winnowing", {
      val words = "list_filter(string_split(trim(regexp_replace(" +
        "regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), " +
        "'\\s+', ' ', 'g')), ' '), t -> t <> '')"
      s"""WITH cw AS (
         |  SELECT doc_id, $words AS tk FROM documents
         |), g AS (
         |  SELECT doc_id, u.i AS pos, len(tk) - 3 AS ng,
         |    tk[u.i] || ' ' || tk[u.i+1] || ' ' || tk[u.i+2]
         |      || ' ' || tk[u.i+3] AS gram
         |  FROM cw, unnest(range(1, len(tk) - 2)) AS u(i)
         |  WHERE len(tk) >= 4
         |), m AS (
         |  SELECT doc_id, pos, ng, gram,
         |    md5(gram) || '@' ||
         |      lpad(CAST(10000000 - pos AS VARCHAR), 7, '0') AS key
         |  FROM g
         |), mem AS MATERIALIZED (
         |  -- MATERIALIZED: referenced by sel AND the final join-back;
         |  -- default inlining recomputes the unnest twice (4.1 s vs
         |  -- 1.3 s at sf0.01, round-8)
         |  SELECT doc_id, w.wp AS wp, pos, gram, key
         |  FROM m, unnest(range(greatest(pos, 4),
         |    least(pos + 3, ng) + 1)) AS w(wp)
         |), sel AS MATERIALIZED (
         |  -- min(key) + join-back instead of arg_min(struct_pack, key):
         |  -- same selection (key is unique within a window), but
         |  -- DuckDB 1.0's struct-payload arg_min materialization blows
         |  -- memory at sf0.1 (observed: nondeterministic OOM under a
         |  -- 60-90 GB limit on a ~1M-row input; min+join runs in <1 GB)
         |  SELECT doc_id, wp, min(key) AS mkey FROM mem GROUP BY 1, 2
         |)
         |SELECT DISTINCT mem.doc_id AS id, CAST(mem.pos AS INT) AS pos,
         |  mem.gram AS gram
         |FROM sel JOIN mem ON mem.doc_id = sel.doc_id
         |  AND mem.wp = sel.wp AND mem.key = sel.mkey
         |ORDER BY id, pos""".stripMargin
    }) { (s, dir) =>
      Dedup.winnowingFingerprints(t(s, dir, "documents"),
          "doc_id", "text", k = 4, w = 4)
        .select(col("id"), col("pos").cast("int").as("pos"), col("gram"))
        .orderBy("id", "pos")
    },

    q("q_dedup_spans", {
      val words = "string_split(trim(regexp_replace(regexp_replace(lower(text), " +
        "'[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ')"
      val gram8 = (0 until 8)
        .map(j => if (j == 0) "w[u.i]" else s"w[u.i+$j]")
        .mkString(" || ' ' || ")
      s"""$augmentedSql, cw AS (
         |  SELECT doc_id, $words AS w FROM docs
         |), g AS (
         |  SELECT doc_id, u.i AS pos, $gram8 AS gm
         |  FROM cw, unnest(range(1, len(w) - 6)) AS u(i)
         |  WHERE len(w) >= 8
         |), dup AS (
         |  SELECT gm FROM (SELECT DISTINCT gm, doc_id FROM g)
         |  GROUP BY gm HAVING count(*) >= 2
         |), p AS (
         |  SELECT g.doc_id, g.pos FROM g JOIN dup USING (gm)
         |), m AS (
         |  SELECT doc_id, pos,
         |    CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
         |      OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
         |      THEN 1 ELSE 0 END AS brk
         |  FROM p
         |), s AS (
         |  SELECT doc_id, pos,
         |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS UNBOUNDED PRECEDING) AS grp
         |  FROM m
         |)
         |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
         |  CAST(max(pos) + 7 AS BIGINT) AS span_end,
         |  CAST(max(pos) + 8 - min(pos) AS BIGINT) AS span_tokens
         |FROM s GROUP BY doc_id, grp ORDER BY doc_id, span_start""".stripMargin
    }) { (s, dir) =>
      Dedup.duplicateSpans(augmented(s, dir), "doc_id", "text", k = 8)
        .orderBy("doc_id", "span_start")
    },

    // the APPLY step of substring-span dedup: cut every found span
    // out of the normalized token stream (Lee et al.'s removal),
    // composed directly on duplicateSpans' output. Oracle extends
    // the spans CTE with a correlated NOT EXISTS rebuild.
    q("q_dedup_spans_remove", {
      val words = "string_split(trim(regexp_replace(regexp_replace(lower(text), " +
        "'[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ')"
      val gram8 = (0 until 8)
        .map(j => if (j == 0) "w[u.i]" else s"w[u.i+$j]")
        .mkString(" || ' ' || ")
      s"""$augmentedSql, cw AS (
         |  SELECT doc_id, $words AS w FROM docs
         |), g AS (
         |  SELECT doc_id, u.i AS pos, $gram8 AS gm
         |  FROM cw, unnest(range(1, len(w) - 6)) AS u(i)
         |  WHERE len(w) >= 8
         |), dup AS (
         |  SELECT gm FROM (SELECT DISTINCT gm, doc_id FROM g)
         |  GROUP BY gm HAVING count(*) >= 2
         |), p AS (
         |  SELECT g.doc_id, g.pos FROM g JOIN dup USING (gm)
         |), m AS (
         |  SELECT doc_id, pos,
         |    CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
         |      OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
         |      THEN 1 ELSE 0 END AS brk
         |  FROM p
         |), s AS (
         |  SELECT doc_id, pos,
         |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS UNBOUNDED PRECEDING) AS grp
         |  FROM m
         |), sp AS (
         |  SELECT doc_id, min(pos) AS st, max(pos) + 7 AS en
         |  FROM s GROUP BY doc_id, grp
         |), tokpos AS (
         |  SELECT doc_id, u.i AS p, w[u.i] AS t, len(w) AS n
         |  FROM cw, unnest(range(1, len(w) + 1)) AS u(i)
         |), keep AS (
         |  SELECT tk.doc_id, tk.p, tk.t FROM tokpos tk
         |  WHERE NOT EXISTS (SELECT 1 FROM sp
         |    WHERE sp.doc_id = tk.doc_id AND tk.p BETWEEN sp.st AND sp.en)
         |)
         |SELECT c.doc_id, CAST(len(c.w) AS BIGINT) AS n_tokens,
         |  CAST(len(c.w) - coalesce(k.n_kept, 0) AS BIGINT) AS n_removed,
         |  md5(coalesce(k.txt, '')) AS h
         |FROM cw c LEFT JOIN (
         |  SELECT doc_id, count(*) AS n_kept,
         |    string_agg(t, ' ' ORDER BY p) AS txt
         |  FROM keep GROUP BY doc_id
         |) k ON k.doc_id = c.doc_id
         |ORDER BY c.doc_id""".stripMargin
    }) { (s, dir) =>
      val aug = augmented(s, dir)
      val spans = Dedup.duplicateSpans(aug, "doc_id", "text", k = 8)
      Dedup.removeDuplicateSpans(aug, "doc_id", "text", spans)
        .select(col("doc_id"), col("n_tokens"), col("n_removed"),
          md5(col("cleaned")).as("h"))
        .orderBy("doc_id")
    },

    // SimHash property gate: the pigeonhole candidate step is
    // recall-lossy by construction, so instead of a set-equality
    // oracle this checks the deterministic *contract*: an exact copy
    // has Hamming distance 0 and a 90%-prefix copy stays within a
    // small Hamming radius of its original. (The discovery pipeline
    // `simHashNearDuplicates` is exercised in the test suite.)
    q("q_dedup_simhash",
      s"""$augmentedSql
         |SELECT a.doc_id,
         |  (b.doc_id = a.doc_id + 1000000) AS is_exact_copy,
         |  true AS hamming_ok
         |FROM docs a JOIN docs b
         |  ON b.doc_id = a.doc_id + 1000000 OR b.doc_id = a.doc_id + 2000000
         |WHERE a.doc_id < 1000000
         |ORDER BY a.doc_id, is_exact_copy""".stripMargin) { (s, dir) =>
      import s.implicits._
      val sigs = augmented(s, dir)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, text) => (id, Dedup.MinHashUtil.simHash64(text)) }
        .toDF("doc_id", "sim")
      val orig = sigs.filter(col("doc_id") < 1000000L)
        .select(col("doc_id"), col("sim").as("sim_a"))
      // copy ids are doc_id + 1e6 (exact copy) and doc_id + 2e6
      // (perturbed); deriving the original id makes this an EQUI join
      // (hash-joinable) instead of an OR-disjunction nested-loop join
      val copies = sigs.filter(col("doc_id") >= 1000000L)
        .select(col("doc_id").as("copy_id"), col("sim").as("sim_b"),
          (col("doc_id") % 1000000L).as("doc_id"))
      orig.join(copies, "doc_id")
        .select(col("doc_id"),
          (col("copy_id") === col("doc_id") + 1000000L).as("is_exact_copy"),
          when(col("copy_id") === col("doc_id") + 1000000L,
            Dedup.hammingDistance(col("sim_a"), col("sim_b")) === 0)
            .otherwise(Dedup.hammingDistance(col("sim_a"), col("sim_b")) <= 24)
            .as("hamming_ok"))
        .orderBy("doc_id", "is_exact_copy")
    },

    // exact-duplicate savings report over the augmented corpus (the
    // planted exact copies make the numbers non-trivial): docs,
    // duplicated docs, groups, redundant copies/chars, largest group.
    q("q_dedup_report",
      s"""$augmentedSql, byh AS (
         |  SELECT md5(trim(regexp_replace(regexp_replace(lower(text),
         |      '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))) AS h,
         |    count(*) AS n, min(length(text)) AS rep_chars,
         |    sum(length(text)) AS tot_chars
         |  FROM docs GROUP BY 1
         |)
         |SELECT CAST(sum(n) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT)
         |    AS n_duplicated,
         |  CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_groups,
         |  CAST(sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT)
         |    AS n_redundant,
         |  CAST(sum(CASE WHEN n > 1 THEN tot_chars - rep_chars ELSE 0 END)
         |    AS BIGINT) AS redundant_chars,
         |  CAST(max(n) AS BIGINT) AS largest_group
         |FROM byh""".stripMargin) { (s, dir) =>
      Dedup.exactDupReport(augmented(s, dir), "doc_id", "text")
    },

    // exact-dup cluster-size histogram over the same augmented
    // corpus: is redundancy a few huge groups or a tail of pairs?
    q("q_dedup_size_hist",
      s"""$augmentedSql, byh AS (
         |  SELECT md5(trim(regexp_replace(regexp_replace(lower(text),
         |      '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))) AS h,
         |    count(*) AS size
         |  FROM docs GROUP BY 1
         |)
         |SELECT size, count(*) AS n_groups
         |FROM byh GROUP BY 1 ORDER BY size""".stripMargin) { (s, dir) =>
      Dedup.dupClusterSizeHistogram(augmented(s, dir), "doc_id", "text")
    },

    // Fellegi–Sunter probabilistic record linkage: EM-estimated
    // agreement probabilities over candidate pairs (self pairs +
    // id+7 noise pairs), log2 match weights, three-way decision.
    // The oracle unrolls the EM exactly (7 parameter columns per
    // CTE level, clamped like the engine).
    q("q_dedup_linkage", DedupQueries.linkageOracleSql(3)) { (s, dir) =>
      import graft.ml.Linkage
      val docs = t(s, dir, "documents")
      def side(n: String) = docs.select(col("doc_id").as(s"id$n"),
        col("lang").as(s"lang$n"), col("source").as(s"source$n"),
        expr("n_chars div 100").as(s"bucket$n"))
      val l = side("a")
      val r = side("b")
      val pairs = l.join(r, col("idb") === col("ida"))
        .unionByName(l.join(r, col("idb") === col("ida") + 7L))
        .select(col("ida"), col("idb"),
          (col("langa") === col("langb")).as("g1"),
          (col("sourcea") === col("sourceb")).as("g2"),
          (col("bucketa") === col("bucketb")).as("g3"))
        .persist()
      try {
        val params = Linkage.emTrain(pairs, Seq("g1", "g2", "g3"),
          iters = 3)
        Linkage.classify(
            Linkage.score(pairs, Seq("g1", "g2", "g3"), params),
            upper = 2.0, lower = 0.0)
          .select(col("ida"), col("idb"), col("g1"), col("g2"), col("g3"),
            round(col("match_weight"), 6).as("match_weight"),
            round(col("posterior"), 6).as("posterior"),
            col("decision"))
          .orderBy("ida", "idb")
      } finally pairs.unpersist(blocking = false)
    },

    // Jaro-Winkler record linkage over part names: (first-token,
    // length±1) blocking, native JaroWinkler expression verify at
    // ≥ 0.9, identical names excluded so the gate exercises the
    // fuzzy arithmetic (the oracle replays the same blocking and
    // DuckDB's jaro_winkler_similarity — semantics pinned to match).
    q("q_join_jarowinkler",
      """WITH p AS (
        |  SELECT p_partkey AS id, p_name AS nm,
        |    string_split(p_name, ' ')[1] AS blk, strlen(p_name) AS ln
        |  FROM part
        |)
        |SELECT a.id AS id1, b.id AS id2,
        |  round(jaro_winkler_similarity(a.nm, b.nm), 6) AS jw
        |FROM p a JOIN p b
        |  ON a.blk = b.blk AND abs(a.ln - b.ln) <= 1 AND a.id < b.id
        |WHERE jaro_winkler_similarity(a.nm, b.nm) >= 0.9
        |  AND a.nm <> b.nm
        |ORDER BY id1, id2""".stripMargin) { (s, dir) =>
      graft.ml.Dedup.jaroWinklerLinkage(t(s, dir, "part"),
          "p_partkey", "p_name", threshold = 0.9, lenBand = 1,
          includeIdentical = false)
        .select(col("id1"), col("id2"), round(col("jw"), 6).as("jw"))
        .orderBy("id1", "id2")
    }
  )

  /** DuckDB SQL replaying [[graft.ml.Linkage]]'s EM + scoring over
    * the self/+7 candidate fixture: `iters` unrolled CTE levels of
    * (p, m1..3, u1..3), each from one E+M aggregate with the same
    * [1e-6, 1−1e-6] clamp, then log2 weights and the three-way
    * decision at (2.0, 0.0).
    */
  def linkageOracleSql(iters: Int): String = {
    val gs = Seq("g1", "g2", "g3")
    def clamp(x: String) = s"greatest(1e-6, least(1.0 - 1e-6, $x))"
    def massW(t: String) = gs.zipWithIndex.map { case (g, k) =>
      s"(CASE WHEN $g THEN $t.m${k + 1} ELSE 1.0 - $t.m${k + 1} END)"
    }.mkString(s"$t.p * ", " * ", "")
    def massV(t: String) = gs.zipWithIndex.map { case (g, k) =>
      s"(CASE WHEN $g THEN $t.u${k + 1} ELSE 1.0 - $t.u${k + 1} END)"
    }.mkString(s"(1.0 - $t.p) * ", " * ", "")
    val pairs =
      """pairs AS MATERIALIZED (
        |  SELECT a.doc_id AS ida, b.doc_id AS idb,
        |    a.lang = b.lang AS g1, a.source = b.source AS g2,
        |    (a.n_chars // 100) = (b.n_chars // 100) AS g3
        |  FROM documents a JOIN documents b
        |    ON b.doc_id = a.doc_id OR b.doc_id = a.doc_id + 7
        |)""".stripMargin
    val it0 = "it0 AS (SELECT 0.1::DOUBLE AS p, " +
      gs.indices.map(k => s"0.9::DOUBLE AS m${k + 1}").mkString(", ") +
      ", " + gs.indices.map(k => s"0.1::DOUBLE AS u${k + 1}")
        .mkString(", ") + ")"
    val steps = (1 to iters).map { i =>
      val e =
        s"""e$i AS MATERIALIZED (
           |  SELECT count(*) * 1.0::DOUBLE AS n, sum(g) AS sg,
           |    sum(1.0 - g) AS sn,
           |    ${gs.zipWithIndex.map { case (g, k) =>
                  s"sum(CASE WHEN $g THEN g ELSE 0.0::DOUBLE END) AS a${k + 1}, " +
                    s"sum(CASE WHEN $g THEN 1.0 - g ELSE 0.0::DOUBLE END) AS b${k + 1}"
                }.mkString(", ")}
           |  FROM (
           |    SELECT pr.*, ${massW("t")} / (${massW("t")} + ${massV("t")}) AS g
           |    FROM pairs pr, it${i - 1} t
           |  )
           |)""".stripMargin
      val it =
        s"""it$i AS (
           |  SELECT ${clamp("sg / n")} AS p,
           |    ${gs.indices.map(k =>
                  s"${clamp(s"a${k + 1} / sg")} AS m${k + 1}").mkString(", ")},
           |    ${gs.indices.map(k =>
                  s"${clamp(s"b${k + 1} / sn")} AS u${k + 1}").mkString(", ")}
           |  FROM e$i
           |)""".stripMargin
      s"$e, $it"
    }
    val weight = gs.zipWithIndex.map { case (g, k) =>
      s"CASE WHEN $g THEN ln(t.m${k + 1} / t.u${k + 1}) / ln(2.0) " +
        s"ELSE ln((1.0 - t.m${k + 1}) / (1.0 - t.u${k + 1})) / ln(2.0) END"
    }.mkString(" + ")
    s"""WITH $pairs, $it0, ${steps.mkString(", ")}
       |SELECT ida, idb, g1, g2, g3,
       |  round(w, 6) AS match_weight,
       |  round(wm / (wm + wv), 6) AS posterior,
       |  CASE WHEN w >= 2.0 THEN 'match' WHEN w < 0.0 THEN 'non_match'
       |    ELSE 'possible' END AS decision
       |FROM (
       |  SELECT pr.*, ($weight) AS w,
       |    ${massW("t")} AS wm, ${massV("t")} AS wv
       |  FROM pairs pr, it$iters t
       |)
       |ORDER BY ida, idb""".stripMargin
  }
}
