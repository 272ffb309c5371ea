package graft.queries

import org.apache.spark.sql.functions._
import graft.ml.{Corpus, Multimodal, TextAnalysis => TA}

/** Text-analysis + multimodal-plumbing coverage over the `documents`
  * table. Every operator here is a pure Column expression (no UDFs) —
  * these run at parquet scan speed, which is what a 100 TB
  * training-data pipeline needs.
  */
object TextQueries extends QueryGroup {

  // DuckDB mirror of TextAnalysis.normalize (regexp_replace needs the
  // 'g' flag there; Spark's is global by default).
  private val normSql =
    """trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
      |'\s+', ' ', 'g'))""".stripMargin.replace("\n", " ")

  val all: Seq[QueryDef] = Seq(

    // token counting: whitespace tokens + BPE-ish subword estimate.
    q("q_text_tokens",
      s"""SELECT doc_id,
         |  len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
         |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS n_bpeish
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          TA.tokenCount(col("text")).as("n_tokens"),
          TA.bpeishTokenCount(col("text")).as("n_bpeish"))
        .orderBy("doc_id")
    },

    // quality scoring: length/punct/stopword components + composite.
    q("q_text_quality",
      s"""SELECT doc_id,
         |  len(string_split_regex(trim(text), '\\s+')) AS n_words,
         |  round(len(list_filter(string_split_regex(lower(text), '\\s+'),
         |    w -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','at','by','be','this'], w)))
         |    * 1.0::DOUBLE / len(string_split_regex(trim(text), '\\s+')), 6) AS stop_ratio,
         |  round((CASE WHEN len(string_split_regex(trim(text), '\\s+')) BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.3 END * 0.3
         |    + CASE WHEN list_aggregate(list_transform(string_split_regex(trim(text), '\\s+'), w -> strlen(w)), 'sum') * 1.0::DOUBLE
         |        / len(string_split_regex(trim(text), '\\s+')) BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.4 END * 0.2
         |    + CASE WHEN len(list_filter(string_split_regex(lower(text), '\\s+'),
         |        w -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','at','by','be','this'], w)))
         |        * 1.0::DOUBLE / len(string_split_regex(trim(text), '\\s+')) > 0.05 THEN 1.0 ELSE 0.6 END * 0.3
         |    + CASE WHEN len(regexp_extract_all(text, '[!-/:-@\\[-`{-~]')) * 1.0::DOUBLE / strlen(text) < 0.2 THEN 1.0 ELSE 0.5 END * 0.2
         |  )::DOUBLE, 6) AS quality
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("toks", TA.tokens(col("text")))
        .withColumn("n_words", size(col("toks")))
        .withColumn("mwl", TA.meanWordLengthOf(col("toks")))
        .withColumn("sr", TA.stopwordRatioOf(col("toks")))
        .withColumn("pr", TA.punctRatio(col("text")))
        .select(col("doc_id"), col("n_words"),
          round(col("sr"), 6).as("stop_ratio"),
          round(TA.qualityFromComponents(col("n_words"), col("mwl"),
            col("sr"), col("pr")), 6).as("quality"))
        .orderBy("doc_id")
    },

    // corpus-trained unigram LM score (CCNet-style perplexity
    // bucketing, deterministic unigram special case): mean token NLL
    // under an add-0.5-smoothed model fit on the whole corpus.
    q("q_text_richness", {
      val words = "string_split(trim(regexp_replace(regexp_replace(lower(text), " +
        "'[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ')"
      s"""WITH cw AS (
         |  SELECT lang, $words AS w FROM documents
         |), tok AS (
         |  SELECT lang, tk FROM (SELECT lang, unnest(w) AS tk FROM cw)
         |  WHERE strlen(tk) > 0
         |), tc AS (
         |  SELECT lang, tk, CAST(count(*) AS BIGINT) AS c
         |  FROM tok GROUP BY 1, 2
         |)
         |SELECT lang AS stratum, CAST(sum(c) AS BIGINT) AS n_tokens,
         |  CAST(count(*) AS BIGINT) AS n_types,
         |  CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS n_hapax,
         |  round(CAST(count(*) FILTER (WHERE c = 1) AS DOUBLE)
         |    / count(*), 6) AS hapax_share,
         |  round(1e4 * CAST(sum(c * c) - sum(c) AS DOUBLE)
         |    / (CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE)), 6)
         |    AS yule_k,
         |  round(CASE WHEN sum(c) > 1 THEN
         |    CAST(sum(c * (c - 1)) AS DOUBLE)
         |      / (CAST(sum(c) AS DOUBLE) * CAST(sum(c) - 1 AS DOUBLE))
         |    END, 6) AS simpson
         |FROM tc GROUP BY 1 ORDER BY stratum""".stripMargin
    }) { (s, dir) =>
      TA.vocabularyRichness(t(s, dir, "documents"), "lang", "text")
        .select(col("stratum"), col("n_tokens"), col("n_types"),
          col("n_hapax"),
          round(col("hapax_share"), 6).as("hapax_share"),
          round(col("yule_k"), 6).as("yule_k"),
          round(col("simpson"), 6).as("simpson"))
        .orderBy("stratum")
    },

    q("q_text_unigram_nll", {
      val words = "string_split(trim(regexp_replace(regexp_replace(lower(text), " +
        "'[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ')"
      s"""WITH cw AS (
         |  SELECT doc_id, $words AS w FROM documents
         |), tok AS (
         |  SELECT doc_id, tk FROM (SELECT doc_id, unnest(w) AS tk FROM cw)
         |  WHERE strlen(tk) > 0
         |), tc AS (
         |  SELECT tk, count(*) AS c FROM tok GROUP BY tk
         |), tot AS (
         |  SELECT sum(c) AS n, count(*) AS v FROM tc
         |)
         |SELECT doc_id, round(avg(-ln((c + 0.5) / (n + 0.5 * v))), 6) AS nll
         |FROM tok JOIN tc USING (tk), tot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      TA.unigramNll(t(s, dir, "documents"), "doc_id", "text")
        .withColumn("nll", round(col("nll"), 6))
        .orderBy("doc_id")
    },

    // per-source vocabulary health: token/type counts, type-token
    // ratio, hapax fraction.
    q("q_text_vocab_stats", {
      val words = "string_split(trim(regexp_replace(regexp_replace(lower(text), " +
        "'[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ')"
      s"""WITH tok AS (
         |  SELECT source AS stratum, tk FROM (
         |    SELECT source, unnest($words) AS tk FROM documents
         |  ) WHERE strlen(tk) > 0
         |), tc AS (
         |  SELECT stratum, tk, count(*) AS c FROM tok GROUP BY 1, 2
         |)
         |SELECT stratum, CAST(sum(c) AS BIGINT) AS n_tokens,
         |  count(*) AS n_types,
         |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_hapax,
         |  round(count(*) * 1.0::DOUBLE / sum(c), 6) AS ttr,
         |  round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1.0::DOUBLE
         |    / count(*), 6) AS hapax_frac
         |FROM tc GROUP BY stratum ORDER BY stratum""".stripMargin
    }) { (s, dir) =>
      TA.vocabStats(t(s, dir, "documents"), "source", "text")
        .select(col("stratum"), col("n_tokens"), col("n_types"),
          col("n_hapax"), round(col("ttr"), 6).as("ttr"),
          round(col("hapax_frac"), 6).as("hapax_frac"))
        .orderBy("stratum")
    },

    // PMI collocations: adjacent-bigram pointwise mutual information
    // over token occurrences, count floor 3, global top-20 — phrase
    // mining's core statistic.
    q("q_text_collocations", {
      val words = "string_split(trim(regexp_replace(regexp_replace(lower(text), " +
        "'[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ')"
      s"""WITH cw AS (
         |  SELECT doc_id, $words AS w FROM documents
         |), tok AS (
         |  SELECT doc_id, u.i AS pos, w[u.i] AS tk
         |  FROM cw, unnest(range(1, len(w) + 1)) AS u(i)
         |  WHERE strlen(w[u.i]) > 0
         |), uni AS (SELECT tk, count(*) AS c FROM tok GROUP BY tk),
         |tot AS (SELECT count(*) AS n FROM tok),
         |big AS (
         |  SELECT prev AS w1, tk AS w2, count(*) AS cab FROM (
         |    SELECT tk, lag(tk) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
         |    FROM tok
         |  ) WHERE prev IS NOT NULL GROUP BY 1, 2 HAVING count(*) >= 3
         |)
         |SELECT w1, w2, cab,
         |  round(ln(n * 1.0::DOUBLE * cab / (a.c * b.c)), 6) AS pmi
         |FROM big JOIN uni a ON big.w1 = a.tk
         |JOIN uni b ON big.w2 = b.tk, tot
         |ORDER BY ln(n * 1.0::DOUBLE * cab / (a.c * b.c)) DESC, w1, w2
         |LIMIT 20""".stripMargin
    }) { (s, dir) =>
      TA.collocations(t(s, dir, "documents"), "doc_id", "text",
          minCount = 3, topK = 20)
        .withColumn("pmi", round(col("pmi"), 6))
    },

    // CCNet-style perplexity bucketing: per-LANGUAGE unigram LM,
    // per-doc mean NLL under the doc's own language model, then an
    // equal-frequency 3-way split per language (1 = head = most
    // fluent). The split orders by round(nll, 6) then doc_id on both
    // sides, so bucket boundaries are engine-replayable.
    q("q_text_ppl_bucket", {
      val words = "string_split(trim(regexp_replace(regexp_replace(lower(text), " +
        "'[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ')"
      s"""WITH cw AS (
         |  SELECT doc_id, lang, $words AS w FROM documents
         |), tok AS (
         |  SELECT doc_id, lang, tk
         |  FROM (SELECT doc_id, lang, unnest(w) AS tk FROM cw)
         |  WHERE strlen(tk) > 0
         |), tc AS (
         |  SELECT lang, tk, count(*) AS c FROM tok GROUP BY lang, tk
         |), tot AS (
         |  SELECT lang, sum(c) AS n, count(*) AS v FROM tc GROUP BY lang
         |), nll AS (
         |  SELECT doc_id, lang, avg(-ln((c + 0.5) / (n + 0.5 * v))) AS nll
         |  FROM tok JOIN tc USING (lang, tk) JOIN tot USING (lang)
         |  GROUP BY doc_id, lang
         |)
         |SELECT doc_id, lang,
         |  CAST(ntile(3) OVER (PARTITION BY lang
         |    ORDER BY round(nll, 6), doc_id) AS BIGINT) AS bucket,
         |  round(nll, 6) AS nll
         |FROM nll ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      TA.perplexityBuckets(t(s, dir, "documents"), "doc_id", "text", "lang")
        .select(col("doc_id"), col("lang"), col("bucket"),
          round(col("nll"), 6).as("nll"))
        .orderBy("doc_id")
    },

    // cross-document n-gram novelty / boilerplate profile: per doc,
    // the fraction of its 3-gram occurrences unique in the corpus and
    // the fraction appearing in >= 3 distinct docs — the template/
    // boilerplate signal per-doc quality scores can't see.
    q("q_text_ngram_novelty", {
      val words = "string_split(trim(regexp_replace(regexp_replace(lower(text), " +
        "'[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ')"
      s"""WITH cw AS (
         |  SELECT doc_id, CASE WHEN strlen(trim(regexp_replace(regexp_replace(lower(text),
         |    '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))) = 0
         |    THEN [] ELSE $words END AS w
         |  FROM documents
         |), g AS (
         |  SELECT doc_id, array_to_string(w[u.i:u.i + 2], ' ') AS gram
         |  FROM cw, unnest(range(1, greatest(len(w) - 2, 0) + 1)) AS u(i)
         |), st AS (
         |  SELECT gram, count(*) AS occ, count(DISTINCT doc_id) AS docs
         |  FROM g GROUP BY gram
         |), per AS (
         |  SELECT g.doc_id, count(*) AS n_grams,
         |    sum(CASE WHEN st.occ = 1 THEN 1 ELSE 0 END) AS novel,
         |    sum(CASE WHEN st.docs >= 3 THEN 1 ELSE 0 END) AS common
         |  FROM g JOIN st USING (gram) GROUP BY g.doc_id
         |)
         |SELECT d.doc_id,
         |  coalesce(per.n_grams, 0) AS n_grams,
         |  round(coalesce(per.novel * 1.0::DOUBLE / per.n_grams, 0.0), 6) AS novel_frac,
         |  round(coalesce(per.common * 1.0::DOUBLE / per.n_grams, 0.0), 6) AS common_frac
         |FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin
    }) { (s, dir) =>
      TA.ngramNovelty(t(s, dir, "documents"), "doc_id", "text",
          n = 3, commonDocs = 3)
        .orderBy("doc_id")
    },

    // DSIR importance weights (Xie et al. 2023, unigram case): one
    // smoothed LM on the target sample (sources 0-2) vs one on the
    // raw corpus, both over the shared raw vocabulary; each doc's
    // weight = mean per-token log-likelihood ratio. Higher weight =
    // closer to the target distribution — the data-selection signal.
    q("q_text_dsir", {
      val words = "string_split(trim(regexp_replace(regexp_replace(lower(text), " +
        "'[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ')"
      s"""WITH cw AS (
         |  SELECT doc_id, source, $words AS w FROM documents
         |), tok AS (
         |  SELECT doc_id, source IN ('src0', 'src1', 'src2') AS tgt, tk
         |  FROM (SELECT doc_id, source, unnest(w) AS tk FROM cw)
         |  WHERE strlen(tk) > 0
         |), tc AS (
         |  SELECT tk, count(*) AS cr,
         |    sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct
         |  FROM tok GROUP BY tk
         |), tot AS (
         |  SELECT sum(cr) AS nr, sum(ct) AS nt, count(*) AS v FROM tc
         |)
         |SELECT doc_id,
         |  round(avg(ln((ct + 0.5::DOUBLE) / (nt + 0.5::DOUBLE * v))
         |          - ln((cr + 0.5::DOUBLE) / (nr + 0.5::DOUBLE * v))), 6)
         |    + 0.0::DOUBLE AS weight
         |FROM tok JOIN tc USING (tk), tot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      TA.importanceWeights(t(s, dir, "documents"), "doc_id", "text",
          col("source").isInCollection(Seq("src0", "src1", "src2")))
        // + 0.0 normalizes IEEE signed zero: a tiny negative weight
        // rounds to -0.0 here and 0.0 in the oracle otherwise
        .withColumn("weight", round(col("weight"), 6) + lit(0.0))
        .orderBy("doc_id")
    },

    // context-sensitive fluency: bigram-model NLL (the n-gram step up
    // from the unigram gate; same add-0.5 smoothing over V unigrams).
    q("q_text_bigram_nll", {
      val words = "string_split(trim(regexp_replace(regexp_replace(lower(text), " +
        "'[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ')"
      s"""WITH cw AS (
         |  SELECT doc_id, $words AS w FROM documents
         |), tok AS (
         |  SELECT doc_id, u.i AS pos, w[u.i] AS tk
         |  FROM cw, unnest(range(1, len(w) + 1)) AS u(i)
         |  WHERE strlen(w[u.i]) > 0
         |), big AS (
         |  SELECT doc_id, pos, tk,
         |    lag(tk) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
         |  FROM tok
         |), uni AS (SELECT tk, count(*) AS c FROM tok GROUP BY tk),
         |vv AS (SELECT count(*) AS v FROM uni),
         |bc AS (SELECT prev, tk, count(*) AS cb FROM big
         |       WHERE prev IS NOT NULL GROUP BY 1, 2),
         |pc AS (SELECT prev, sum(cb) AS cp FROM bc GROUP BY prev)
         |SELECT b.doc_id,
         |  round(avg(-ln((cb + 0.5) / (cp + 0.5 * v))), 6) AS bigram_nll,
         |  count(*) AS n_bigrams
         |FROM big b JOIN bc ON b.prev = bc.prev AND b.tk = bc.tk
         |JOIN pc ON b.prev = pc.prev, vv
         |WHERE b.prev IS NOT NULL
         |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin
    }) { (s, dir) =>
      TA.bigramNll(t(s, dir, "documents"), "doc_id", "text")
        .withColumn("bigram_nll", round(col("bigram_nll"), 6))
        .orderBy("doc_id")
    },

    // interpolated Kneser–Ney bigram NLL (d = 0.75): backoff mass
    // routed to continuation counts, exact count-table replay with the
    // same left-associated arithmetic as the Spark plan.
    q("q_text_kn_nll", {
      val words = "string_split(trim(regexp_replace(regexp_replace(lower(text), " +
        "'[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ')"
      s"""WITH cw AS (
         |  SELECT doc_id, $words AS w FROM documents
         |), tok AS (
         |  SELECT doc_id, u.i AS pos, w[u.i] AS tk
         |  FROM cw, unnest(range(1, len(w) + 1)) AS u(i)
         |  WHERE strlen(w[u.i]) > 0
         |), big AS (
         |  SELECT doc_id, pos, tk,
         |    lag(tk) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
         |  FROM tok
         |), bc AS (SELECT prev, tk, count(*) AS cb FROM big
         |          WHERE prev IS NOT NULL GROUP BY 1, 2),
         |pc AS (SELECT prev, sum(cb) AS cp, count(*) AS n1p
         |       FROM bc GROUP BY prev),
         |cw2 AS (SELECT tk, count(*) AS n1w FROM bc GROUP BY tk),
         |tot AS (SELECT count(*) AS nbt FROM bc)
         |SELECT b.doc_id,
         |  round(avg(-ln(
         |    greatest(CAST(cb AS DOUBLE) - 0.75::DOUBLE, 0.0::DOUBLE) / cp
         |    + 0.75::DOUBLE * n1p / cp * (CAST(n1w AS DOUBLE) / nbt))), 6)
         |    AS kn_nll,
         |  count(*) AS n_bigrams
         |FROM big b JOIN bc ON b.prev = bc.prev AND b.tk = bc.tk
         |JOIN pc ON b.prev = pc.prev
         |JOIN cw2 ON b.tk = cw2.tk, tot
         |WHERE b.prev IS NOT NULL
         |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin
    }) { (s, dir) =>
      TA.kneserNeyNll(t(s, dir, "documents"), "doc_id", "text")
        .withColumn("kn_nll", round(col("kn_nll"), 6))
        .orderBy("doc_id")
    },

    // per-doc top-5 terms by corpus TF-IDF (smoothed idf,
    // lexicographic tie-break) — keyword extraction / relevance.
    q("q_text_tfidf", {
      val words = "string_split(trim(regexp_replace(regexp_replace(lower(text), " +
        "'[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ')"
      s"""WITH cw AS (
         |  SELECT doc_id, $words AS w FROM documents
         |), tok AS (
         |  SELECT doc_id, tk FROM (SELECT doc_id, unnest(w) AS tk FROM cw)
         |  WHERE strlen(tk) > 0
         |), tf AS (
         |  SELECT doc_id, tk, count(*) AS tf FROM tok GROUP BY 1, 2
         |), dfreq AS (
         |  SELECT tk, count(*) AS df FROM tf GROUP BY tk
         |), n AS (
         |  SELECT count(DISTINCT doc_id) AS n FROM documents
         |), scored AS (
         |  SELECT doc_id, tk, tf,
         |    tf * (ln((n + 1.0::DOUBLE) / (df + 1.0::DOUBLE)) + 1.0::DOUBLE) AS tfidf
         |  FROM tf JOIN dfreq USING (tk), n
         |), r AS (
         |  SELECT doc_id, tk, tf, tfidf,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tk) AS rank
         |  FROM scored
         |)
         |SELECT doc_id, CAST(rank AS BIGINT) AS rank, tk, tf,
         |  round(tfidf, 6) AS tfidf
         |FROM r WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin
    }) { (s, dir) =>
      TA.tfidfTopTerms(t(s, dir, "documents"), "doc_id", "text", k = 5)
        .withColumn("tfidf", round(col("tfidf"), 6))
        .orderBy("doc_id", "rank")
    },

    // content fingerprint for exact dedup: md5 of normalized text.
    q("q_text_fingerprint",
      s"""SELECT doc_id, md5($normSql) AS fingerprint
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TA.fingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id")
    },

    // language-ID heuristic: marker-word scores, deterministic
    // tie-break (max score, then lexicographically-last language —
    // the struct-max semantics), CJK short-circuit.
    q("q_text_langid", {
      // per-language marker-hit counts; argmax with ties going to the
      // lexicographically-last language — exactly the Spark
      // array_max(struct(score, lang)) semantics.
      def score(ms: Seq[String]): String = {
        val lst = ms.map("'" + _ + "'").mkString("[", ",", "]")
        s"len(list_filter(string_split_regex(lower(text), '\\s+'), w -> list_contains($lst, w)))"
      }
      val m = TA.langMarkers.toMap
      val (sDe, sEn, sEs, sFr) =
        (score(m("de")), score(m("en")), score(m("es")), score(m("fr")))
      s"""SELECT doc_id, CASE
         |  WHEN len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) > 0 THEN 'zh'
         |  WHEN greatest($sDe, $sEn, $sEs, $sFr) = 0 THEN 'unknown'
         |  WHEN $sFr >= $sEs AND $sFr >= $sEn AND $sFr >= $sDe THEN 'fr'
         |  WHEN $sEs >= $sEn AND $sEs >= $sDe THEN 'es'
         |  WHEN $sEn >= $sDe THEN 'en'
         |  ELSE 'de' END AS pred_lang
         |FROM documents ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TA.langId(col("text")).as("pred_lang"))
        .orderBy("doc_id")
    },

    // multimodal plumbing: text bytes as the opaque binary column,
    // deterministic stub decode (byte length, content hash, fake
    // dimensions derived from the hash) through the typed
    // mapPartitions batch path.
    // EXACT heavy hitters at sketch cost (Misra-Gries candidates +
    // candidate-only exact verify — TextAnalysis.heavyHitters). The
    // token stream mixes unigrams and word bigrams, so the 947-term
    // vocabulary overflows the k=64 sketch and compaction really
    // fires, yet the final answer is exact and the oracle recomputes
    // it with a full GROUP BY. Integer threshold compare
    // (cnt * 64 > total) — no float boundary.
    q("q_text_heavy_hitters",
      """WITH words AS (
        |  SELECT string_split_regex(trim(lower(text)), '\s+') AS ws
        |  FROM documents
        |), toks AS (
        |  SELECT unnest(ws) AS term FROM words
        |  UNION ALL
        |  SELECT unnest(list_transform(range(1, len(ws)),
        |    i -> ws[i] || ' ' || ws[i + 1])) AS term FROM words
        |)
        |SELECT term, count(*) AS cnt FROM toks WHERE term <> ''
        |GROUP BY term
        |HAVING count(*) * 64 > (SELECT count(*) FROM toks WHERE term <> '')
        |ORDER BY term""".stripMargin) { (s, dir) =>
      import s.implicits._
      val toks = t(s, dir, "documents")
        .select(lower(trim(col("text"))).as("t")).as[String]
        .flatMap { txt =>
          val ws = txt.split("\\s+").filter(_.nonEmpty)
          ws.iterator ++
            ws.sliding(2).filter(_.length == 2).map(_.mkString(" "))
        }
      TA.heavyHitters(toks, k = 64, denom = 64).orderBy("term")
    },

    q("q_multimodal_meta",
      """SELECT doc_id AS id,
        |  octet_length(CAST(text AS BLOB)) AS byteLen,
        |  md5(text) AS contentHash,
        |  64 + (ascii(substr(md5(text), 1, 1)) % 16) * 64 AS width,
        |  64 + (ascii(substr(md5(text), 2, 1)) % 16) * 64 AS height,
        |  ['jpeg','png','webp'][(ascii(substr(md5(text), 3, 1)) % 3) + 1] AS format
        |FROM documents ORDER BY id""".stripMargin) { (s, dir) =>
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("id"), col("text").cast("binary").as("media"))
      Multimodal.decodeMetadata(media).toDF()
        .select("id", "byteLen", "contentHash", "width", "height", "format")
        .orderBy("id")
    },

    // REAL image decode through the gate: both engines construct the
    // same deterministic P6 (binary PPM) payload per document —
    // w = 4 + id%13, h = 4 + id%7, pixel byte i = (id*31 + i) % 256 —
    // then the Spark side parses the header and pixels with the
    // hand-rolled ImageCodec, nearest-neighbor-resizes to 2×2,
    // re-encodes, and decodes AGAIN (an encode→decode round-trip),
    // while the oracle replays the construction and the resize index
    // arithmetic ((tx*w)//2, (ty*h)//2) without ever touching bytes.
    // Hash equality means header parse, pixel extraction and the
    // resample index map are all exact.
    // WebDataset tar shards round-trip CONTRACT: every document's
    // text packed as a `<doc_id>.txt` member into size-capped ustar
    // shards, written as real .tar files, re-read through the
    // tar parser — per-doc byte md5s must survive, shard payloads
    // must respect the cap. (No SQL engine reads tar; the oracle
    // pins the invariants.)
    q("q_multimodal_tar",
      """SELECT count(*) AS n_docs, true AS all_match, true AS caps_ok
        |FROM documents""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
        .select(concat(col("doc_id"), lit(".txt")).as("name"),
          encode(col("text"), "UTF-8").as("bytes"))
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_tar_gate").toString
      val shards = graft.sources.TarSource
        .packShards(docs, "name", "bytes", maxBytes = 1L << 20)
        .persist()
      try {
        graft.sources.TarSource.writeShardFiles(shards, tmp)
        // the packer checks the cap BEFORE adding, so a shard may
        // overshoot by at most one member
        val maxDoc = docs.agg(max(length(col("bytes"))).as("max_doc"))
        val capsOk = shards
          .agg(max(when(col("n_entries") > 1,
            col("n_bytes") - (1L << 20)).otherwise(0L)).as("over"))
          .crossJoin(maxDoc)
          .select((col("over") <= col("max_doc")).as("caps_ok"))
        val back = graft.sources.TarSource.read(s, tmp)
          .select(col("name"), md5(col("bytes")).as("h_back"))
        val matches = docs
          .select(col("name"), md5(col("bytes")).as("h_in"))
          .join(back, Seq("name"), "left")
          .agg(count(lit(1)).as("n_docs"),
            (count(lit(1)) === sum(when(col("h_in") === col("h_back"), 1L)
              .otherwise(0L))).as("all_match"))
        // force the single summary row now so the shard directory can
        // be deleted before returning (lazy evaluation would need the
        // files to outlive this gate — they leaked one dir per run)
        val out = matches.crossJoin(capsOk)
          .select(col("n_docs"), col("all_match"), col("caps_ok"))
        val rows = out.collect().toSeq
        s.createDataFrame(
          s.sparkContext.parallelize(rows, 1), out.schema)
      } finally {
        shards.unpersist(blocking = false)
        val root = java.nio.file.Paths.get(tmp)
        java.nio.file.Files.walk(root).sorted(
          java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
    },

    q("q_multimodal_decode",
      """WITH d AS (
        |  SELECT doc_id AS id, 4 + doc_id % 13 AS w, 4 + doc_id % 7 AS h
        |  FROM documents
        |), px AS (
        |  SELECT id, w, h,
        |    string_agg(lpad(hex((id * 31 + u.i) % 256), 2, '0'), ''
        |      ORDER BY u.i) AS hx
        |  FROM d, unnest(range(0, w * h * 3)) AS u(i) GROUP BY id, w, h
        |), rs AS (
        |  SELECT id,
        |    string_agg(lpad(hex((id * 31 +
        |      (((u.k // 6) * h // 2) * w + ((u.k % 6) // 3) * w // 2) * 3
        |      + u.k % 3) % 256), 2, '0'), '' ORDER BY u.k) AS rhx
        |  FROM d, unnest(range(0, 12)) AS u(k) GROUP BY id, w, h
        |)
        |SELECT p.id, CAST(p.w AS INT) AS width, CAST(p.h AS INT) AS height,
        |  3 AS channels, CAST(p.w * p.h * 3 AS BIGINT) AS n_bytes,
        |  md5(p.hx) AS pix_h, md5(r.rhx) AS resized_h
        |FROM px p JOIN rs r ON p.id = r.id ORDER BY p.id""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      import graft.ml.ImageCodec
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val w = (4 + id % 13).toInt
          val h = (4 + id % 7).toInt
          val px = Array.tabulate(w * h * 3)(i => ((id * 31 + i) % 256).toByte)
          (id, ImageCodec.encodePnm(ImageCodec.Image(w, h, 3, px)))
        }.toDF("id", "media")
      val dec = Multimodal.decodeImages(media).toDF()
        .select(col("id"), col("width"), col("height"), col("channels"),
          octet_length(col("pixels")).cast("long").as("n_bytes"),
          md5(hex(col("pixels"))).as("pix_h"))
      val rdec = Multimodal.decodeImages(
          Multimodal.resizeImages(media, 2, 2)
            .select(col("id"), col("resized").as("media"))).toDF()
        .select(col("id"), md5(hex(col("pixels"))).as("resized_h"))
      dec.join(rdec, "id").orderBy("id")
    },

    // Perceptual dHash dedup through the gate: every doc gets a
    // deterministic image (w = 9+id%8 × h = 8+id%5 — at least 9×8 so
    // every dHash grid cell reads a DISTINCT source pixel; byte bi =
    // ((id*2654435761 XOR bi*2246822519)/64) % 200, xor-mixed so
    // different ids decorrelate — a linear pixel ramp would make
    // neighboring ids look like brightness shifts of each other,
    // which dHash is invariant to BY DESIGN); every 10th doc also a
    // BRIGHTNESS-SHIFTED copy (+25 on every byte — different bytes,
    // identical dHash: integer luma shifts by exactly 25, comparisons
    // unchanged) and every (10k+5)th a ONE-PIXEL edit ((b0+100)%200
    // on the first red byte — flips at most dHash bit 0). The engine
    // DISCOVERS the pairs via the banded Hamming join at maxHamming=4
    // (simulated accidental floor at sf0.1 scale is 7 bits — a 3-bit
    // margin); the oracle replays the whole pixel → BT.601 luma →
    // 9×8 nearest-resize → comparison-bit pipeline arithmetically and
    // emits the planted pairs with their exact Hamming distance — so
    // the gate fails on any false positive, any missed pair, or any
    // kernel-arithmetic drift.
    q("q_multimodal_dhash",
      """WITH d AS (
        |  SELECT doc_id AS id, 9 + doc_id % 8 AS w, 8 + doc_id % 5 AS h,
        |    CASE WHEN doc_id % 10 = 0 THEN doc_id + 10000000
        |         ELSE doc_id + 20000000 END AS dup_id,
        |    CASE WHEN doc_id % 10 = 0 THEN 25 ELSE 0 END AS shift,
        |    CASE WHEN doc_id % 10 = 5 THEN 1 ELSE 0 END AS onepix
        |  FROM documents WHERE doc_id % 10 IN (0, 5)
        |), cells AS (
        |  SELECT d.id, d.dup_id, d.shift, d.onepix, g.ty, g.tx,
        |    (((g.ty * d.h) // 8) * d.w + ((g.tx * d.w) // 9)) * 3 AS bi
        |  FROM d, (SELECT a.x AS tx, b.y AS ty
        |           FROM unnest(range(0, 9)) a(x),
        |                unnest(range(0, 8)) b(y)) g
        |), bytes AS (
        |  SELECT id, dup_id, shift, onepix, ty, tx, bi,
        |    (xor(id * 2654435761, bi * 2246822519) // 64) % 200 AS b0,
        |    (xor(id * 2654435761, (bi + 1) * 2246822519) // 64) % 200 AS b1,
        |    (xor(id * 2654435761, (bi + 2) * 2246822519) // 64) % 200 AS b2
        |  FROM cells
        |), gray AS (
        |  SELECT id, dup_id, ty, tx,
        |    (299 * b0 + 587 * b1 + 114 * b2) // 1000 AS gb,
        |    (299 * (CASE WHEN onepix = 1 AND bi = 0 THEN (b0 + 100) % 200
        |                 ELSE b0 + shift END)
        |     + 587 * (b1 + shift) + 114 * (b2 + shift)) // 1000 AS gd
        |  FROM bytes
        |), bits AS (
        |  SELECT l.id, l.dup_id,
        |    CASE WHEN l.gb < r.gb THEN 1 ELSE 0 END AS bb,
        |    CASE WHEN l.gd < r.gd THEN 1 ELSE 0 END AS bd
        |  FROM gray l JOIN gray r
        |    ON l.id = r.id AND l.ty = r.ty AND r.tx = l.tx + 1
        |  WHERE l.tx < 8
        |)
        |SELECT id, dup_id,
        |  CAST(sum(CASE WHEN bb != bd THEN 1 ELSE 0 END) AS BIGINT) AS hamming
        |FROM bits GROUP BY id, dup_id ORDER BY id, dup_id""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      import graft.ml.ImageCodec
      def px(id: Long, bi: Long): Int =
        ((((id * 2654435761L) ^ (bi * 2246822519L)) / 64L) % 200L).toInt
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .flatMap { id =>
          val w = (9 + id % 8).toInt
          val h = (8 + id % 5).toInt
          def enc(p: Array[Byte]) =
            ImageCodec.encodePnm(ImageCodec.Image(w, h, 3, p))
          val base = Array.tabulate(w * h * 3)(i => px(id, i.toLong).toByte)
          val dup =
            if (id % 10 == 0) Some(id + 10000000L -> base.map(b => (b + 25).toByte))
            else if (id % 10 == 5) {
              val p = base.clone()
              p(0) = ((px(id, 0L) + 100) % 200).toByte
              Some(id + 20000000L -> p)
            } else None
          (id -> enc(base)) :: dup.map { case (di, p) => di -> enc(p) }.toList
        }.toDF("id", "media")
      Multimodal.dhashNearDuplicates(media, maxHamming = 4)
        .orderBy("id", "dup_id")
    },

    // Perceptual AUDIO dedup through the gate — the audio twin of
    // q_multimodal_dhash: both engines construct the same 16-bit mono
    // WAV per document (n = 520 + id%7*130 samples, sample f =
    // (xor(id*2654435761, f*2246822519)//64) % 4001 - 2000), plant a
    // gain-x3 re-encode for id%10=0 (energy-envelope print IDENTICAL
    // — every span energy scales by 9, preserving all 64 adjacent
    // comparisons) and a one-span noise burst (+500 on span 10) for
    // id%10=5 (flips at most the two bits touching span 10). The
    // engine decodes the WAVs, prints them (Multimodal.audioFp64) and
    // discovers pairs via the banded-Hamming self-join; the oracle
    // replays the integer span-energy arithmetic. Fails on any false
    // positive, missed pair, or kernel drift.
    q("q_multimodal_audiofp",
      """WITH d AS (
        |  SELECT doc_id AS id, 520 + doc_id % 7 * 130 AS n,
        |    CASE WHEN doc_id % 10 = 0 THEN doc_id + 30000000
        |         ELSE doc_id + 40000000 END AS dup_id,
        |    CASE WHEN doc_id % 10 = 0 THEN 3 ELSE 1 END AS gain,
        |    CASE WHEN doc_id % 10 = 5 THEN 500 ELSE 0 END AS bump
        |  FROM documents WHERE doc_id % 10 IN (0, 5)
        |), s AS (
        |  SELECT id, dup_id, gain, bump, u.f AS f, (u.f * 65) // n AS k,
        |    (xor(id * 2654435761, u.f * 2246822519) // 64) % 4001 - 2000 AS v
        |  FROM d, unnest(range(0, n)) AS u(f)
        |), e AS (
        |  SELECT id, dup_id, k, sum(v * v) AS eb,
        |    sum((v * gain + CASE WHEN k = 10 THEN bump ELSE 0 END)
        |      * (v * gain + CASE WHEN k = 10 THEN bump ELSE 0 END)) AS ed
        |  FROM s GROUP BY id, dup_id, k
        |), bits AS (
        |  SELECT l.id, l.dup_id,
        |    CASE WHEN l.eb > r.eb THEN 1 ELSE 0 END AS bb,
        |    CASE WHEN l.ed > r.ed THEN 1 ELSE 0 END AS bd
        |  FROM e l JOIN e r ON l.id = r.id AND r.k = l.k + 1
        |  WHERE l.k < 64
        |)
        |SELECT id, dup_id,
        |  CAST(sum(CASE WHEN bb != bd THEN 1 ELSE 0 END) AS BIGINT) AS hamming
        |FROM bits GROUP BY id, dup_id ORDER BY id, dup_id""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      import graft.ml.AudioCodec
      def smp(id: Long, f: Long): Int =
        ((((id * 2654435761L) ^ (f * 2246822519L)) / 64L) % 4001L).toInt - 2000
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .flatMap { id =>
          val n = (520 + id % 7 * 130).toInt
          val base = Array.tabulate(n)(f => smp(id, f.toLong))
          def enc(v: Array[Int]) =
            AudioCodec.encodeWav(AudioCodec.Audio(8000, 1, 16, v))
          val dup =
            if (id % 10 == 0) Some(id + 30000000L -> base.map(_ * 3))
            else if (id % 10 == 5) Some(id + 40000000L -> Array.tabulate(n)(
              f => if (f.toLong * 65 / n == 10) base(f) + 500 else base(f)))
            else None
          (id -> enc(base)) :: dup.map { case (di, v) => di -> enc(v) }.toList
        }.toDF("id", "media")
      Multimodal.audioFpNearDuplicates(media, maxHamming = 4)
        .orderBy("id", "dup_id")
    },

    // Temporal perceptual VIDEO dedup through the gate: same AVI
    // construction discipline as q_multimodal_video (nf = 3 + id%3
    // netpbm frames, w = 9 + id%4, h = 8 + id%3, pixel byte i of
    // frame f = (xor(id*2654435761, (f*100000 + i)*2246822519)//64)
    // % 200), planting a +25-brightness transcode for id%10=0 (every
    // frame's dHash identical — the 299/587/114 weights sum to 1000,
    // so grays shift uniformly by 25) and a one-pixel frame-1 edit
    // for id%10=5 (flips at most one bit of one frame). The engine
    // walks the RIFF tree, dHashes every frame, finds candidates via
    // the (frame_idx, hash-slice) equi-join and verifies the exact
    // Hamming sum over aligned frames; the oracle replays the 9x8
    // grid sample + grayscale + comparison arithmetic per frame.
    q("q_multimodal_vhash",
      """WITH d AS (
        |  SELECT doc_id AS id, 3 + doc_id % 3 AS nf, 9 + doc_id % 4 AS w,
        |    8 + doc_id % 3 AS h,
        |    CASE WHEN doc_id % 10 = 0 THEN doc_id + 50000000
        |         ELSE doc_id + 60000000 END AS dup_id,
        |    CASE WHEN doc_id % 10 = 0 THEN 25 ELSE 0 END AS shift,
        |    CASE WHEN doc_id % 10 = 5 THEN 1 ELSE 0 END AS onepix
        |  FROM documents WHERE doc_id % 10 IN (0, 5)
        |), fr AS (
        |  SELECT id, dup_id, nf, w, h, shift, onepix, u.f AS f
        |  FROM d, unnest(range(0, nf)) AS u(f)
        |), cells AS (
        |  SELECT id, dup_id, nf, shift, onepix, f, g.ty, g.tx,
        |    (((g.ty * h) // 8) * w + ((g.tx * w) // 9)) * 3 AS bi
        |  FROM fr, (SELECT a.x AS tx, b.y AS ty
        |            FROM unnest(range(0, 9)) a(x),
        |                 unnest(range(0, 8)) b(y)) g
        |), bytes AS (
        |  SELECT id, dup_id, nf, shift, onepix, f, ty, tx, bi,
        |    (xor(id * 2654435761, (f * 100000 + bi) * 2246822519) // 64)
        |      % 200 AS b0,
        |    (xor(id * 2654435761, (f * 100000 + bi + 1) * 2246822519) // 64)
        |      % 200 AS b1,
        |    (xor(id * 2654435761, (f * 100000 + bi + 2) * 2246822519) // 64)
        |      % 200 AS b2
        |  FROM cells
        |), gray AS (
        |  SELECT id, dup_id, nf, f, ty, tx,
        |    (299 * b0 + 587 * b1 + 114 * b2) // 1000 AS gb,
        |    (299 * (CASE WHEN onepix = 1 AND f = 1 AND bi = 0
        |                 THEN (b0 + 100) % 200 ELSE b0 + shift END)
        |     + 587 * (b1 + shift) + 114 * (b2 + shift)) // 1000 AS gd
        |  FROM bytes
        |), bits AS (
        |  SELECT l.id, l.dup_id, l.nf,
        |    CASE WHEN l.gb < r.gb THEN 1 ELSE 0 END AS bb,
        |    CASE WHEN l.gd < r.gd THEN 1 ELSE 0 END AS bd
        |  FROM gray l JOIN gray r
        |    ON l.id = r.id AND l.f = r.f AND l.ty = r.ty
        |      AND r.tx = l.tx + 1
        |  WHERE l.tx < 8
        |)
        |SELECT id, dup_id, CAST(min(nf) AS BIGINT) AS n_aligned,
        |  CAST(sum(CASE WHEN bb != bd THEN 1 ELSE 0 END) AS BIGINT) AS hamming
        |FROM bits GROUP BY id, dup_id ORDER BY id, dup_id""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      import graft.ml.{AviCodec, ImageCodec}
      def px(id: Long, f: Int, i: Int): Int =
        ((((id * 2654435761L) ^ ((f * 100000L + i) * 2246822519L)) / 64L)
          % 200L).toInt
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .flatMap { id =>
          val nf = (3 + id % 3).toInt
          val w = (9 + id % 4).toInt
          val h = (8 + id % 3).toInt
          def avi(edit: (Int, Array[Byte]) => Array[Byte]) =
            AviCodec.encodeAvi((0 until nf).map { f =>
              val p = Array.tabulate(w * h * 3)(i => px(id, f, i).toByte)
              ImageCodec.encodePnm(ImageCodec.Image(w, h, 3, edit(f, p)))
            }, w, h, 40000)
          val dup =
            if (id % 10 == 0) Some(id + 50000000L ->
              avi((_, p) => p.map(b => (b + 25).toByte)))
            else if (id % 10 == 5) Some(id + 60000000L -> avi { (f, p) =>
              if (f == 1) {
                val q = p.clone()
                q(0) = ((px(id, 1, 0) + 100) % 200).toByte
                q
              } else p
            })
            else None
          (id -> avi((_, p) => p)) ::
            dup.map { case (di, b) => di -> b }.toList
        }.toDF("id", "media")
      Multimodal.videoFpNearDuplicates(media, maxTotalHamming = 8)
        .orderBy("id", "dup_id")
    },

    // REAL video container parse through the gate: both engines
    // construct the same AVI per document — nf = 2 + id%3 netpbm
    // frames of w = 3 + id%5 × h = 2 + id%4, pixel byte i of frame f
    // = (id*13 + f*101 + i*17) % 256 — then the Spark side walks the
    // RIFF/AVI chunk tree (LIST hdrl → avih, LIST movi → 00dc),
    // decodes each frame's pixels with ImageCodec, and reports per-frame
    // dimensions + pixel hashes plus the container's frame count,
    // while the oracle replays the construction arithmetically.
    q("q_multimodal_video",
      """WITH d AS (
        |  SELECT doc_id AS id, 2 + doc_id % 3 AS nf,
        |    3 + doc_id % 5 AS w, 2 + doc_id % 4 AS h
        |  FROM documents
        |), fr AS (
        |  SELECT id, w, h, nf, u.f AS frame_idx FROM d,
        |  unnest(range(0, nf)) AS u(f)
        |), px AS (
        |  SELECT id, frame_idx, w, h, nf,
        |    string_agg(lpad(hex((id * 13 + frame_idx * 101 + v.i * 17) % 256),
        |      2, '0'), '' ORDER BY v.i) AS hx
        |  FROM fr, unnest(range(0, w * h * 3)) AS v(i)
        |  GROUP BY id, frame_idx, w, h, nf
        |)
        |SELECT id, CAST(frame_idx AS INT) AS frame_idx,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(nf AS INT) AS n_frames, md5(hx) AS pix_h
        |FROM px ORDER BY id, frame_idx""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.ml.{AviCodec, ImageCodec}
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val nf = (2 + id % 3).toInt
          val w = (3 + id % 5).toInt
          val h = (2 + id % 4).toInt
          val frames = (0 until nf).map { f =>
            val px = Array.tabulate(w * h * 3)(i =>
              ((id * 13 + f * 101L + i * 17L) % 256).toByte)
            ImageCodec.encodePnm(ImageCodec.Image(w, h, 3, px))
          }
          (id, AviCodec.encodeAvi(frames, w, h, 40000))
        }.toDF("id", "media")
      val meta = Multimodal.decodeVideoMeta(media).toDF()
        .select(col("id"), col("nFrames").as("n_frames"))
      val dec = Multimodal.videoFrames(media)
        .map { v =>
          val img = ImageCodec.decode(v.frame).get
          (v.id, v.frameIdx, img.width, img.height, img.pixels)
        }.toDF("id", "frame_idx", "width", "height", "pixels")
      dec.join(meta, "id")
        .select(col("id"), col("frame_idx"), col("width"), col("height"),
          col("n_frames"), md5(hex(col("pixels"))).as("pix_h"))
        .orderBy("id", "frame_idx")
    },

    // REAL PNG decode through the gate: per document a deterministic
    // raster — w = 4 + id%13, h = 4 + id%7, source channels
    // [1 gray, 3 RGB, 4 RGBA][id%3], pixel byte i = (id*37 + i) % 256
    // — is PNG-ENCODED by the Spark side (real zlib stream, real
    // CRCs, scanline filter type id%5, so all five filters cross the
    // gate; odd ids written Adam7-INTERLACED so the 7-pass
    // deinterlace crosses it too) and then fully DECODED back
    // (inflate + defilter + scatter + alpha
    // drop), while the oracle replays the planted pixels
    // arithmetically (RGBA keeps bytes (i/3)*4 + i%3 after the alpha
    // drop) without ever touching PNG bytes. Hash equality pins the
    // whole inflate/defilter/reassembly path bit-exact.
    q("q_multimodal_png",
      """WITH d AS (
        |  SELECT doc_id AS id, 4 + doc_id % 13 AS w, 4 + doc_id % 7 AS h,
        |    CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 3 END AS och,
        |    doc_id % 3 AS m
        |  FROM documents
        |), px AS (
        |  SELECT id, w, h, och,
        |    string_agg(lpad(hex((id * 37 +
        |      CASE WHEN m = 2 THEN (u.i // 3) * 4 + u.i % 3 ELSE u.i END
        |      ) % 256), 2, '0'), '' ORDER BY u.i) AS hx
        |  FROM d, unnest(range(0, w * h * och)) AS u(i)
        |  GROUP BY id, w, h, och
        |)
        |SELECT id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(och AS INT) AS channels,
        |  CAST(w * h * och AS BIGINT) AS n_bytes, md5(hx) AS pix_h
        |FROM px ORDER BY id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.ml.ImageCodec
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val w = (4 + id % 13).toInt
          val h = (4 + id % 7).toInt
          val ch = Array(1, 3, 4)((id % 3).toInt)
          val filter = (id % 5).toInt
          val px = Array.tabulate(w * h * ch)(i => ((id * 37 + i) % 256).toByte)
          (id, ImageCodec.encodePng(w, h, ch, px, filter,
            interlaced = id % 2 == 1))
        }.toDF("id", "media")
      Multimodal.decodeImages(media).toDF()
        .select(col("id"), col("width"), col("height"), col("channels"),
          octet_length(col("pixels")).cast("long").as("n_bytes"),
          md5(hex(col("pixels"))).as("pix_h"))
        .orderBy("id")
    },

    // REAL GIF decode through the gate: per document a deterministic
    // 256-entry palette (entry i = (i, 255−i, i XOR 0x5A)) and index
    // raster (w = 4 + id%11, h = 4 + id%5, index byte i =
    // (id*41 + i) % 256) are GIF-ENCODED by the Spark side (LZW data
    // stream, odd ids written INTERLACED so the 4-pass deinterlace
    // crosses the gate too) and decoded back through the real LZW
    // decoder; the oracle resolves each planted index through the
    // palette arithmetically.
    q("q_multimodal_gif",
      """WITH d AS (
        |  SELECT doc_id AS id, 4 + doc_id % 11 AS w, 4 + doc_id % 5 AS h
        |  FROM documents
        |), px AS (
        |  SELECT id, w, h,
        |    string_agg(lpad(hex(
        |      CASE u.i % 3
        |        WHEN 0 THEN (id * 41 + u.i // 3) % 256
        |        WHEN 1 THEN 255 - (id * 41 + u.i // 3) % 256
        |        ELSE xor((id * 41 + u.i // 3) % 256, 90)
        |      END), 2, '0'), '' ORDER BY u.i) AS hx
        |  FROM d, unnest(range(0, w * h * 3)) AS u(i)
        |  GROUP BY id, w, h
        |)
        |SELECT id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  3 AS channels, md5(hx) AS pix_h
        |FROM px ORDER BY id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.ml.ImageCodec
      val pal = Array.tabulate(768) { j =>
        val i = j / 3
        (j % 3 match {
          case 0 => i; case 1 => 255 - i; case _ => i ^ 0x5A
        }).toByte
      }
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val w = (4 + id % 11).toInt
          val h = (4 + id % 5).toInt
          val idx = Array.tabulate(w * h)(i => ((id * 41 + i) % 256).toByte)
          (id, ImageCodec.encodeGif(w, h, pal, idx, interlaced = id % 2 == 1))
        }.toDF("id", "media")
      Multimodal.decodeImages(media).toDF()
        .select(col("id"), col("width"), col("height"), col("channels"),
          md5(hex(col("pixels"))).as("pix_h"))
        .orderBy("id")
    },

    // REAL JPEG through the gate: per document a deterministic smooth
    // raster (w = 16 + id%17, h = 16 + id%13, gray when id%4 = 0,
    // pixel = 2x + 3y + 17c + id%64 — bounded 245, so the plane has NO
    // mod-256 wrap discontinuities: a genuine gradient, not a
    // sawtooth) is encoded with the
    // hand-rolled baseline JPEG encoder (quality [100, 92, 85][id%3],
    // 4:2:0 subsampling on odd color ids, restart markers every 2 MCUs
    // when id%5 = 0) and decoded back through the full Huffman + IDCT
    // path. JPEG is lossy, so the gate is a SELF-VERIFYING CONTRACT
    // (the semantic-dedup-recall style): dims/channels replay exactly
    // in the oracle and the reconstruction-error bound is reported as
    // a boolean that must be uniformly true. A broken Huffman table,
    // dequant, IDCT, upsampler, or color convert produces mean errors
    // an order of magnitude over the bound.
    q("q_multimodal_jpeg",
      """SELECT doc_id AS id,
        |  CAST(16 + doc_id % 17 AS INT) AS width,
        |  CAST(16 + doc_id % 13 AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 3 END AS INT) AS channels,
        |  true AS within_tol
        |FROM documents ORDER BY id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.ml.{ImageCodec, JpegCodec}
      // parallelism floor: the encode→decode codec kernel is pure CPU
      // over a one-split scan — without it the whole pass is 1 task
      graft.core.Parallelism
        .ensure(t(s, dir, "documents").select(col("doc_id"))).as[Long]
        .map { id =>
          val w = (16 + id % 17).toInt
          val h = (16 + id % 13).toInt
          val ch = if (id % 4 == 0) 1 else 3
          val px = Array.tabulate(w * h * ch) { i =>
            val c = i % ch
            val x = (i / ch) % w
            val y = i / (ch * w)
            (2 * x + 3 * y + 17 * c + (id % 64)).toByte // max 245: no wrap
          }
          val quality = Array(100, 92, 85)((id % 3).toInt)
          val bytes = JpegCodec.encode(ImageCodec.Image(w, h, ch, px),
            quality = quality,
            chromaSubsample = ch == 3 && id % 2 == 1,
            restartInterval = if (id % 5 == 0) 2 else 0)
          val dec = JpegCodec.decode(bytes)
          val ok = dec.exists { d =>
            if (d.width != w || d.height != h || d.channels != ch) false
            else {
              var sum = 0L
              var i = 0
              while (i < px.length) {
                sum += math.abs((px(i) & 0xFF) - (d.pixels(i) & 0xFF))
                i += 1
              }
              sum.toDouble / px.length <= 10.0
            }
          }
          (id, dec.map(_.width).getOrElse(-1),
            dec.map(_.height).getOrElse(-1),
            dec.map(_.channels).getOrElse(-1), ok)
        }.toDF("id", "width", "height", "channels", "within_tol")
        .orderBy("id")
    },

    // FFT spectral features through the gate: per document a planted
    // pure tone (f = 500 + (id%20)·250 Hz at 16 kHz, amplitude 8000,
    // 2048 samples → 15 Hann frames at 256/128) is WAV-encoded and
    // analyzed by the hand-rolled FFT path; the tone's frequency must
    // land in the right 62.5 Hz bin and the centroid nearby — a
    // self-verifying contract boolean (a broken FFT, window, or bin
    // map puts the peak elsewhere), with frame count replayed exactly.
    q("q_multimodal_spectral",
      """SELECT doc_id AS id, 15 AS n_frames, true AS tone_localized
        |FROM documents ORDER BY id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.ml.AudioCodec
      val media = graft.core.Parallelism
        .ensure(t(s, dir, "documents").select(col("doc_id"))).as[Long]
        .map { id =>
          val f = 500.0 + (id % 20) * 250.0
          val sine = Array.tabulate(2048)(i =>
            math.round(8000 * math.sin(2 * math.Pi * f * i / 16000)).toInt)
          (id, AudioCodec.encodeWav(
            AudioCodec.Audio(16000, 1, 16, sine)))
        }.toDF("id", "media")
      Multimodal.audioSpectral(media).toDF()
        .withColumn("f0", lit(500.0) + (col("id") % 20) * 250.0)
        .select(col("id"), col("nFrames").as("n_frames"),
          (abs(col("dominantHz") - col("f0")) <= lit(16000.0 / 256) &&
            abs(col("centroidHz") - col("f0")) <= lit(2 * 16000.0 / 256))
            .as("tone_localized"))
        .orderBy("id")
    },

    // Scene-cut detection through the gate: per document an AVI whose
    // frames hold constant value a = 50 + id%50 until the planted cut
    // at frame c = 2 + id%3, then a + 120 — the mean-abs-diff kernel
    // must fire EXACTLY at frame c with diff exactly 120 (constant
    // frames make the mean exact), replayed arithmetically by the
    // oracle.
    q("q_multimodal_scenecut",
      """SELECT doc_id AS id,
        |  CAST(2 + doc_id % 3 AS INT) AS frame_idx,
        |  120.0::DOUBLE AS diff
        |FROM documents ORDER BY id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.ml.{AviCodec, ImageCodec}
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val nf = (5 + id % 4).toInt
          val c = (2 + id % 3).toInt
          val a = (50 + id % 50).toInt
          val frames = (0 until nf).map { fidx =>
            val v = if (fidx < c) a else a + 120
            ImageCodec.encodePnm(ImageCodec.Image(6, 4,
              3, Array.fill(6 * 4 * 3)(v.toByte)))
          }
          (id, AviCodec.encodeAvi(frames, 6, 4, 40000))
        }.toDF("id", "media")
      Multimodal.sceneCuts(media, threshold = 30.0).toDF()
        .select(col("id"), col("frameIdx").as("frame_idx"), col("diff"))
        .orderBy("id")
    },

    // HTML -> text extraction through the gate: both engines build the
    // same page skeleton around a fragment of the document's
    // normalized text (title, dropped script content, an entity, a
    // comment, an anchor); the Spark side runs the one-pass extractor
    // + markup stats, the oracle reconstructs the expected readable
    // text by string arithmetic (it never parses HTML). Tag/anchor
    // counts are exact (18 tags, 1 anchor by construction).
    q("q_web_extract",
      s"""SELECT doc_id AS id,
         |  trim(regexp_replace(
         |    'T' || doc_id || ' Doc & ' || doc_id || ' ' ||
         |    substr($normSql, 1, 40) || ' go ' || doc_id ||
         |    ' tail ' || doc_id, '\\s+', ' ', 'g')) AS text,
         |  18 AS tags, 1 AS anchors
         |FROM documents ORDER BY id""".stripMargin) { (s, dir) =>
      val html = t(s, dir, "documents").select(col("doc_id").as("id"),
        concat(
          lit("<html><head><title>T"), col("doc_id"),
          lit("</title><script type=\"t\">var j="), col("doc_id"),
          lit(";</script></head><body><h1>Doc &amp; "), col("doc_id"),
          lit("</h1><p>"),
          substring(TA.normalize(col("text")), 1, 40),
          lit("</p><!-- hidden --><a href=\"/l\">go "), col("doc_id"),
          lit("</a><div>tail "), col("doc_id"),
          lit("</div></body></html>")).as("html"))
      graft.ml.Web.extractHtml(html, "id", "html")
        .select(col("id"), col("text"), col("tags"), col("anchors"))
        .orderBy("id")
    },

    // URL parse / registered-domain / canonicalization through the
    // gate: deterministic URL variants (plain TLD, co.uk second-level
    // suffix, IPv4 literal; absent / default-https / explicit ports;
    // unsorted query params; a fragment) — the oracle replays every
    // expected field arithmetically, including the sorted-query
    // default-port-dropped canonical form.
    q("q_web_url",
      """SELECT doc_id AS id, 'https' AS scheme,
        |  CASE doc_id % 4 WHEN 0 THEN 'www.example.com'
        |    WHEN 1 THEN 'news.bbc.co.uk' WHEN 2 THEN 'sub.host.org'
        |    ELSE '10.0.0.' || (doc_id % 250) END AS host,
        |  CASE doc_id % 4 WHEN 0 THEN 'example.com'
        |    WHEN 1 THEN 'bbc.co.uk' WHEN 2 THEN 'host.org'
        |    ELSE '10.0.0.' || (doc_id % 250) END AS domain,
        |  '/p/' || doc_id AS path,
        |  'https://' ||
        |  CASE doc_id % 4 WHEN 0 THEN 'www.example.com'
        |    WHEN 1 THEN 'news.bbc.co.uk' WHEN 2 THEN 'sub.host.org'
        |    ELSE '10.0.0.' || (doc_id % 250) END ||
        |  CASE doc_id % 3 WHEN 2 THEN ':8080' ELSE '' END ||
        |  '/p/' || doc_id ||
        |  CASE doc_id % 2 WHEN 1 THEN '?a=1&b=' || doc_id ELSE '' END
        |  AS normalized
        |FROM documents ORDER BY id""".stripMargin) { (s, dir) =>
      val urls = t(s, dir, "documents").select(col("doc_id").as("id"),
        concat(lit("https://"),
          when(col("doc_id") % 4 === 0, lit("www.example.com"))
            .when(col("doc_id") % 4 === 1, lit("news.bbc.co.uk"))
            .when(col("doc_id") % 4 === 2, lit("sub.host.org"))
            .otherwise(concat(lit("10.0.0."), col("doc_id") % 250)),
          when(col("doc_id") % 3 === 1, lit(":443"))
            .when(col("doc_id") % 3 === 2, lit(":8080"))
            .otherwise(lit("")),
          lit("/p/"), col("doc_id"),
          when(col("doc_id") % 2 === 1,
            concat(lit("?b="), col("doc_id"), lit("&a=1")))
            .otherwise(lit("")),
          lit("#s")).as("url"))
      graft.ml.Web.parseUrls(urls, "id", "url").orderBy("id")
    },

    // outlink extraction + resolution: each doc's planted HTML holds
    // one absolute, one single-quoted root-relative, one
    // path-relative, and one protocol-relative link plus fragment /
    // mailto pseudo-links that must drop. The oracle constructs the
    // expected edge rows arithmetically (absolute passthrough, scheme
    // inheritance, host-root and directory resolution) — 4 rows per
    // doc, pseudo-links absent.
    q("q_web_links",
      """WITH d AS (
        |  SELECT doc_id AS id,
        |    'site' || (doc_id % 20) || '.example.org' AS sh,
        |    doc_id % 7 AS ek
        |  FROM documents
        |)
        |SELECT id, src_host, href, resolved, dst_host FROM (
        |  SELECT id, sh AS src_host,
        |    'https://ext' || ek || '.com/x' AS href,
        |    'https://ext' || ek || '.com/x' AS resolved,
        |    'ext' || ek || '.com' AS dst_host
        |  FROM d
        |  UNION ALL
        |  SELECT id, sh, '/r/' || id,
        |    'https://' || sh || '/r/' || id, sh FROM d
        |  UNION ALL
        |  SELECT id, sh, 'next' || id || '.html',
        |    'https://' || sh || '/dir/next' || id || '.html', sh FROM d
        |  UNION ALL
        |  SELECT id, sh, '//cdn.example.net/l.js',
        |    'https://cdn.example.net/l.js', 'cdn.example.net' FROM d
        |)
        |ORDER BY id, href""".stripMargin) { (s, dir) =>
      val pages = t(s, dir, "documents").select(col("doc_id").as("id"),
        concat(lit("https://site"), col("doc_id") % 20,
          lit(".example.org/dir/page"), col("doc_id"), lit(".html"))
          .as("url"),
        concat(
          lit("<html><body><a href=\"https://ext"), col("doc_id") % 7,
          lit(".com/x\">A</a><a href='/r/"), col("doc_id"),
          lit("'>B</a><p><a class=\"z\" href=\"next"), col("doc_id"),
          lit(".html\">C</a></p><a href=\"//cdn.example.net/l.js\">D</a>" +
            "<a href=\"#top\">E</a><a href=\"mailto:a@b.example\">F</a>" +
            "</body></html>")).as("html"))
      graft.ml.Web.linkEdges(pages, "id", "url", "html")
        .orderBy("id", "href")
    },

    // HTML table extraction through the gate: a 3×2 table with
    // planted arithmetic cells plus a NESTED decoy table (whose cells
    // must NOT surface as outer rows) — every cell replayed
    // arithmetically.
    q("q_web_tables",
      """SELECT doc_id AS id, CAST(u.r AS INT) AS row, CAST(v.c AS INT) AS col,
        |  'c' || (doc_id + u.r * 2 + v.c) AS cell
        |FROM documents, unnest(range(0, 3)) AS u(r),
        |  unnest(range(0, 2)) AS v(c)
        |ORDER BY id, row, col""".stripMargin) { (s, dir) =>
      import s.implicits._
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val rows = (0 until 3).map { r =>
            val cells = (0 until 2).map(c => s"<td>c${id + r * 2 + c}</td>")
              .mkString
            s"<tr>$cells</tr>"
          }.mkString
          val nested = "<table><tr><td>decoy</td></tr></table>"
          (id, s"<html><body><p>x</p><table>$rows</table>" +
            s"<div><table><tr><td>n1$nested</td></tr></table></div></body></html>")
        }.toDF("id", "html")
      media.as[(Long, String)].flatMap { case (id, html) =>
        val tables = graft.ml.Web.extractTables(html)
        // first table only (the second holds the nested decoy)
        tables.headOption.toSeq.flatMap(_.zipWithIndex.flatMap {
          case (cells, r) => cells.zipWithIndex.map {
            case (cell, c) => (id, r, c, cell)
          }
        })
      }.toDF("id", "row", "col", "cell")
        .orderBy("id", "row", "col")
    },

    // robots.txt evaluation through the gate: per document a policy
    // with group stacking, wildcard and anchored rules, and 6 probe
    // paths whose allow/deny decisions the oracle replays as CASE
    // arithmetic (both engines construct the same policy).
    q("q_web_robots",
      """SELECT doc_id AS id, CAST(u.p AS INT) AS probe,
        |  CASE u.p
        |    WHEN 0 THEN false  -- /private/<id>      : disallowed
        |    WHEN 1 THEN true   -- /private/ok/<id>   : longest allow
        |    WHEN 2 THEN true   -- /public/<id>       : no rule
        |    WHEN 3 THEN false  -- /files/doc<id>.pdf : *.pdf$ denies
        |    WHEN 4 THEN true   -- /files/doc<id>.pdfx: $ anchor saves
        |    ELSE false         -- /tmp<id>/x         : /tmp*/x denies
        |  END AS allowed
        |FROM documents, unnest(range(0, 6)) AS u(p)
        |ORDER BY id, probe""".stripMargin) { (s, dir) =>
      import s.implicits._
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .flatMap { id =>
          val txt = s"""User-agent: graftbot
                       |Disallow: /private/
                       |Allow: /private/ok
                       |Disallow: /*.pdf$$
                       |Disallow: /tmp*/x
                       |
                       |User-agent: *
                       |Disallow: /
                       |""".stripMargin
          val rules = graft.ml.Web.parseRobots(txt, "graftbot/1.0")
          val probes = Seq(
            s"/private/$id", s"/private/ok/$id", s"/public/$id",
            s"/files/doc$id.pdf", s"/files/doc$id.pdfx", s"/tmp$id/x")
          probes.zipWithIndex.map { case (p, i) =>
            (id, i, graft.ml.Web.robotsAllowed(rules, p))
          }
        }.toDF("id", "probe", "allowed")
        .orderBy("id", "probe")
    },

    // TextCat language ID through the gate: profiles trained on even
    // doc_ids (top-200 padded char trigrams per language, count-desc /
    // gram-asc ranks), odd doc_ids classified by the ALL-INTEGER
    // out-of-place distance (absent gram charges k) — the oracle
    // replays the entire train + classify pipeline relationally, so
    // every prediction and distance hash-matches regardless of how
    // separable the synthetic languages are.
    q("q_text_langid_textcat",
      s"""WITH norm AS (
         |  SELECT doc_id, lang, ' ' || $normSql || ' ' AS p FROM documents
         |), tg AS (
         |  SELECT doc_id, lang, substr(p, u.i, 3) AS gram
         |  FROM norm, unnest(range(1, strlen(p) - 1)) AS u(i)
         |  WHERE strlen(p) >= 3
         |), prof AS (
         |  SELECT lang, gram,
         |    row_number() OVER (PARTITION BY lang ORDER BY c DESC, gram)
         |      AS rank
         |  FROM (SELECT lang, gram, count(*) AS c FROM tg
         |        WHERE doc_id % 2 = 0 GROUP BY 1, 2)
         |  QUALIFY rank <= 200
         |), dg AS (
         |  SELECT doc_id, gram,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram)
         |      AS dr
         |  FROM (SELECT doc_id, gram, count(*) AS c FROM tg
         |        WHERE doc_id % 2 = 1 GROUP BY 1, 2)
         |  QUALIFY dr <= 20
         |), langs AS (SELECT DISTINCT lang FROM prof
         |), dist AS (
         |  SELECT d.doc_id, l.lang,
         |    sum(coalesce(abs(d.dr - p.rank), 200))::BIGINT AS distance
         |  FROM dg d CROSS JOIN langs l
         |  LEFT JOIN prof p ON p.lang = l.lang AND p.gram = d.gram
         |  GROUP BY 1, 2
         |)
         |SELECT doc_id AS id, lang, distance FROM dist
         |QUALIFY row_number() OVER (PARTITION BY doc_id
         |  ORDER BY distance, lang) = 1
         |ORDER BY id""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents")
      val profiles = graft.ml.LangId.trainProfiles(
        d.filter(col("doc_id") % 2 === 0), "lang", "text", k = 200)
      graft.ml.LangId.classify(
          d.filter(col("doc_id") % 2 === 1), "doc_id", "text",
          profiles, k = 200, docTop = 20)
        .orderBy("id")
    },

    // Unicode cleaning through the gate: each document's fragment is
    // wrapped in BOM + zero-width + smart quotes + em-dash + nbsp +
    // ellipsis + a control char; the scan-speed cleanUnicode pass must
    // produce EXACTLY the ASCII-punctuation form the oracle constructs
    // directly (controls stripped, typography normalized, whitespace
    // otherwise untouched).
    q("q_text_fix_unicode",
      s"""SELECT doc_id AS id,
         |  '"' || substr($normSql, 1, 30) || '" -  tail...' AS cleaned
         |FROM documents ORDER BY id""".stripMargin) { (s, dir) =>
      val frag = substring(TA.normalize(col("text")), 1, 30)
      t(s, dir, "documents").select(col("doc_id").as("id"),
          graft.ml.TextFix.cleanUnicode(concat(
            lit("﻿“"), frag,
            lit("”​ —  tail…")))
            .as("cleaned"))
        .orderBy("id")
    },

    // Mojibake repair through the gate (contract — the Latin-1
    // misread can't be constructed in SQL): per document a planted
    // accented phrase is UTF-8-encoded and misread as Latin-1 once
    // (even ids) or twice (odd ids); repairMojibake must restore the
    // exact original and flag the change.
    // rule-based sentence segmentation on planted three-sentence
    // texts (title abbreviation + decimal point + exclamation): the
    // splitter must protect "Dr." and "$N.50" and cut exactly twice.
    // Oracle emits the three expected sentences arithmetically
    // (lookaround regex stays engine-side).
    q("q_text_sentences",
      """SELECT doc_id, 3 AS n_sentences,
        |  md5('Dr. Smith saw ' || doc_id || ' items.' || chr(2) ||
        |    'It cost $' || (doc_id % 100) || '.50 today!' || chr(2) ||
        |    'Done.') AS h
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val planted = concat(
        lit("Dr. Smith saw "), col("doc_id"), lit(" items. It cost $"),
        col("doc_id") % 100, lit(".50 today! Done."))
      t(s, dir, "documents")
        .withColumn("sents", TA.splitSentences(planted))
        .select(col("doc_id"),
          size(col("sents")).cast("int").as("n_sentences"),
          md5(array_join(col("sents"), "\u0002")).as("h"))
        .orderBy("doc_id")
    },

    // unicode canonical composition (NFC) — cross-engine gate against
    // DuckDB's nfc_normalize: combining-mark suffixes planted on
    // every (pure-ASCII) doc must collapse to the precomposed forms
    // byte-identically in both engines before any fingerprint/dedup.
    q("q_text_nfc",
      """SELECT doc_id, true AS composed,
        |  md5(nfc_normalize(text || ' cafe' || chr(769) || ' A'
        |    || chr(778))) AS h
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.ml.TextFix.normalizeNfc(
          t(s, dir, "documents").withColumn("t",
            // decomposed: e + U+0301 combining acute, A + U+030A ring
            concat(col("text"), lit(" cafe\u0301 A\u030a"))),
          "doc_id", "t")
        .select(col("doc_id"), col("composed"), md5(col("t_nfc")).as("h"))
        .orderBy("doc_id")
    },

    q("q_text_mojibake",
      """SELECT doc_id AS id, true AS repaired_ok, true AS changed
        |FROM documents ORDER BY id""".stripMargin) { (s, dir) =>
      import s.implicits._
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val planted = s"café $id über naïve"
          def garble(x: String): String = new String(
            x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
            java.nio.charset.StandardCharsets.ISO_8859_1)
          val broken = if (id % 2 == 0) garble(planted)
            else garble(garble(planted))
          (id, broken, planted)
        }.toDF("id", "text", "planted")
        .transform(d => graft.ml.TextFix.fixText(d.select("id", "text"),
          "id", "text")
          .join(d.select("id", "planted"), "id"))
        .select(col("id"),
          (col("repaired") === col("planted")).as("repaired_ok"),
          col("changed"))
        .orderBy("id")
    },

    // Deflate compression-ratio quality signal through the gate (a
    // self-verifying contract — DuckDB has no deflate): per document,
    // a planted highly-repetitive string must compress below 0.1, the
    // document's own text must land in (0, 1.2], and the repetitive
    // string must compress strictly better than the natural text.
    q("q_web_compression",
      """SELECT doc_id AS id, true AS rep_tiny, true AS doc_sane,
        |  true AS rep_beats_doc
        |FROM documents ORDER BY id""".stripMargin) { (s, dir) =>
      import graft.ml.Web
      val docs = t(s, dir, "documents")
        .select(col("doc_id").as("id"), col("text"))
      val repDf = docs.select(col("id"),
        concat(lit(("lorem ipsum boilerplate " * 80).trim)).as("rep"))
      val rDoc = Web.compressionSignals(docs, "id", "text")
        .select(col("id"), col("ratio").as("r_doc"))
      val rRep = Web.compressionSignals(repDf, "id", "rep")
        .select(col("id"), col("ratio").as("r_rep"))
      rDoc.join(rRep, "id")
        .select(col("id"),
          (col("r_rep") < 0.1).as("rep_tiny"),
          (col("r_doc") > 0.0 && col("r_doc") <= 1.2).as("doc_sane"),
          (col("r_rep") < col("r_doc")).as("rep_beats_doc"))
        .orderBy("id")
    },

    // Voice-activity segmentation through the gate: per document an
    // alternating silence/tone clip (blocks of 640 samples = 4 VAD
    // frames; nseg = 2 + id%3 tone blocks, ±4000 square tone) — the
    // energy VAD must report EXACTLY the tone blocks as segments,
    // with sample-exact boundaries replayed arithmetically.
    q("q_multimodal_vad",
      """WITH d AS (
        |  SELECT doc_id AS id, 2 + doc_id % 3 AS nseg FROM documents
        |)
        |SELECT id, CAST(u.j AS INT) AS seg_idx,
        |  CAST((2 * u.j + 1) * 640 AS INT) AS start_sample,
        |  CAST((2 * u.j + 2) * 640 AS INT) AS end_sample
        |FROM d, unnest(range(0, nseg)) AS u(j)
        |ORDER BY id, seg_idx""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.ml.AudioCodec
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val nseg = (2 + id % 3).toInt
          val sig = (0 until 2 * nseg + 1).flatMap { b =>
            if (b % 2 == 1) Array.tabulate(640)(i =>
              if (i % 2 == 0) 4000 else -4000)
            else new Array[Int](640)
          }.toArray
          (id, AudioCodec.encodeWav(AudioCodec.Audio(16000, 1, 16, sig)))
        }.toDF("id", "media")
      Multimodal.vad(media, frameSamples = 160, energyThresh = 500.0).toDF()
        .select(col("id"), col("segIdx").as("seg_idx"),
          col("startSample").as("start_sample"),
          col("endSample").as("end_sample"))
        .orderBy("id", "seg_idx")
    },

    // G.711 telephony decode through the gate: 64 planted mu-law and
    // A-law codes per document (code i = (id*7 + i*13) % 256), decoded
    // through the WAV container (format tags 7 and 6) — the oracle
    // replays the ITU closed forms bit-exactly in SQL (complement /
    // xor-0x55, exponent-mantissa expansion, sign).
    q("q_multimodal_g711",
      """WITH d AS (
        |  SELECT doc_id AS id, u.i AS i, (doc_id * 7 + u.i * 13) % 256 AS code
        |  FROM documents, unnest(range(0, 64)) AS u(i)
        |), ul AS (
        |  SELECT id, i, 255 - code AS c FROM d
        |), ud AS (
        |  SELECT id, i,
        |    CASE WHEN c >= 128 THEN -(((c % 16) * 8 + 132)
        |        * CAST(power(2, (c // 16) % 8) AS BIGINT) - 132)
        |      ELSE ((c % 16) * 8 + 132)
        |        * CAST(power(2, (c // 16) % 8) AS BIGINT) - 132 END AS ulin
        |  FROM ul
        |), al AS (
        |  SELECT id, i, xor(code, 85) AS a FROM d
        |), ad AS (
        |  SELECT id, i,
        |    CASE WHEN a >= 128 THEN mag ELSE -mag END AS alin
        |  FROM (
        |    SELECT id, i, a,
        |      CASE WHEN (a // 16) % 8 = 0 THEN (a % 16) * 16 + 8
        |        ELSE ((a % 16) * 16 + 264)
        |          * CAST(power(2, (a // 16) % 8 - 1) AS BIGINT) END AS mag
        |    FROM al)
        |)
        |SELECT ud.id AS id, CAST(ud.i AS INT) AS i,
        |  CAST(ud.ulin AS INT) AS ulin, CAST(ad.alin AS INT) AS alin
        |FROM ud JOIN ad ON ud.id = ad.id AND ud.i = ad.i
        |ORDER BY ud.id, ud.i""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.ml.AudioCodec
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .flatMap { id =>
          val codes = Array.tabulate(64)(i => ((id * 7 + i * 13) % 256).toByte)
          val u = AudioCodec.decode(
            AudioCodec.encodeWavCompanded(codes, 8000, 1, uLaw = true)).get
          val a = AudioCodec.decode(
            AudioCodec.encodeWavCompanded(codes, 8000, 1, uLaw = false)).get
          (0 until 64).map(i => (id, i, u.samples(i), a.samples(i)))
        }.toDF("id", "i", "ulin", "alin")
        .orderBy("id", "i")
    },

    // REAL audio decode through the gate: both engines construct the
    // same stereo 16-bit PCM WAV per document — n = 40 + id%30 frames
    // at 16 kHz, interleaved sample i = ((id*37 + i*797) % 4001) - 2000
    // — then the Spark side parses the RIFF chunks with AudioCodec,
    // mono-mixes (floor of the channel mean), and reports exact signal
    // features plus a nearest-neighbor 8-frame resample, while the
    // oracle replays the construction and the kernels arithmetically.
    // linear resample 8 kHz -> 12 kHz of per-doc integer ramps: every
    // interpolated sample replays arithmetically (identical lerp
    // expression shape on both sides), md5 over the joined series.
    q("q_multimodal_resample",
      """WITH d AS (
        |  SELECT doc_id AS id, CAST(50 + doc_id % 20 AS BIGINT) AS n,
        |    CAST(doc_id % 17 + 1 AS BIGINT) AS k
        |  FROM documents
        |), o AS (
        |  SELECT id, n, k,
        |    CAST(round(n * 12000 / 8000.0) AS BIGINT) AS n_out
        |  FROM d
        |), rs AS (
        |  SELECT id, n, k, n_out, u.t AS t,
        |    CASE WHEN n_out = 1 THEN 0.0
        |      ELSE u.t * (n - 1) / (n_out - 1.0) END AS p
        |  FROM o, unnest(range(0, n_out)) AS u(t)
        |), v AS (
        |  SELECT id, n, n_out, t,
        |    CAST(floor(
        |      k * CAST(floor(p) AS BIGINT) * (1.0 - (p - floor(p)))
        |      + k * least(n - 1, CAST(floor(p) AS BIGINT) + 1)
        |        * (p - floor(p)) + 0.5) AS BIGINT) AS val
        |  FROM rs
        |)
        |SELECT id, n AS n_in, n_out,
        |  md5(string_agg(CAST(val AS VARCHAR), ',' ORDER BY t)) AS res_h
        |FROM v GROUP BY 1, 2, 3 ORDER BY id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.ml.AudioCodec
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val n = (50 + id % 20).toInt
          val k = (id % 17 + 1).toInt
          val a = AudioCodec.Audio(8000, 1, 16,
            Array.tabulate(n)(j => k * j))
          val r = AudioCodec.resampleLinear(a, 12000)
          (id, n.toLong, r.nFrames.toLong, r.samples.mkString(","))
        }
        .toDF("id", "n_in", "n_out", "res")
        .select(col("id"), col("n_in"), col("n_out"),
          md5(col("res")).as("res_h"))
        .orderBy("id")
    },

    q("q_multimodal_audio",
      """WITH d AS (
        |  SELECT doc_id AS id, 40 + doc_id % 30 AS n FROM documents
        |), s AS (
        |  SELECT id, n, u.f AS f,
        |    CAST(floor((((id * 37 + (u.f * 2) * 797) % 4001 - 2000)
        |      + ((id * 37 + (u.f * 2 + 1) * 797) % 4001 - 2000)) / 2.0)
        |      AS BIGINT) AS v
        |  FROM d, unnest(range(0, n)) AS u(f)
        |), feat AS (
        |  SELECT id, min(n) AS n,
        |    round(sqrt(sum(v * v * 1.0::DOUBLE) / min(n)), 6) AS rms,
        |    CAST(sum(CASE WHEN abs(v) < 512 THEN 1 ELSE 0 END) AS BIGINT)
        |      * 1.0::DOUBLE AS n_silent,
        |    CAST(max(abs(v)) AS INT) AS peak
        |  FROM s GROUP BY id
        |), zc AS (
        |  SELECT id, CAST(coalesce(sum(CASE WHEN sg != prev THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) AS zero_crossings
        |  FROM (
        |    SELECT id, sign(v) AS sg,
        |      lag(sign(v)) OVER (PARTITION BY id ORDER BY f) AS prev
        |    FROM s WHERE sign(v) != 0) t
        |  WHERE prev IS NOT NULL GROUP BY id
        |), rs AS (
        |  SELECT d.id,
        |    md5(string_agg(CAST((SELECT v FROM s
        |      WHERE s.id = d.id AND s.f = (u.t * d.n) // 8) AS VARCHAR),
        |      ',' ORDER BY u.t)) AS res_h
        |  FROM d, unnest(range(0, 8)) AS u(t) GROUP BY d.id
        |)
        |SELECT f.id, 16000 AS sample_rate, 2 AS channels,
        |  CAST(f.n AS BIGINT) AS n_frames,
        |  CAST(f.n * 1000 // 16000 AS BIGINT) AS duration_ms,
        |  f.rms, coalesce(z.zero_crossings, 0) AS zero_crossings,
        |  round(f.n_silent / f.n, 6) AS silence_ratio, f.peak, r.res_h
        |FROM feat f LEFT JOIN zc z ON f.id = z.id JOIN rs r ON f.id = r.id
        |ORDER BY f.id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.ml.AudioCodec
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val n = (40 + id % 30).toInt
          val samples = Array.tabulate(n * 2)(i =>
            ((id * 37 + i.toLong * 797) % 4001 - 2000).toInt)
          (id, AudioCodec.encodeWav(AudioCodec.Audio(16000, 2, 16, samples)))
        }.toDF("id", "media")
      val meta = Multimodal.decodeAudioMeta(media).toDF()
        .select(col("id"), col("sampleRate").as("sample_rate"),
          col("channels"), col("nFrames").as("n_frames"),
          col("durationMs").as("duration_ms"))
      val feats = Multimodal.audioFeatures(media).toDF()
        .select(col("id"), round(col("rms"), 6).as("rms"),
          col("zeroCrossings").as("zero_crossings"),
          round(col("silenceRatio"), 6).as("silence_ratio"), col("peak"))
      val res = Multimodal.resampleAudio(media, 8)
        .select(col("id"),
          md5(array_join(transform(col("samples"), _.cast("string")), ","))
            .as("res_h"))
      meta.join(feats, "id").join(res, "id").orderBy("id")
    },

    // GPT-style sequence packing: shard → md5-permute → concat →
    // chunk every ctxLen tokens. Pure integer window math (exact in
    // both engines); one hashpartitioning(shard) exchange at scale.
    // sliding-window chunking: 64-token windows, 16-token overlap
    // (stride 48) — long-document splitting for context limits.
    q("q_text_chunk",
      """WITH cw AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
        |), meta AS (
        |  SELECT doc_id, w, len(w) AS n,
        |    CAST(1 + ceil(greatest(len(w) - 64, 0) / 48.0) AS BIGINT) AS n_chunks
        |  FROM cw WHERE len(w) > 0
        |), ch AS (
        |  SELECT doc_id, u.i AS chunk_idx,
        |    array_to_string(w[(u.i * 48 + 1):(u.i * 48 + 64)], ' ') AS chunk_text,
        |    least(CAST(n AS BIGINT) - u.i * 48, 64) AS n_tokens
        |  FROM meta, unnest(range(0, n_chunks)) AS u(i)
        |)
        |SELECT doc_id, chunk_idx, n_tokens, chunk_text FROM ch
        |ORDER BY doc_id, chunk_idx""".stripMargin) { (s, dir) =>
      graft.ml.Corpus.chunkByTokens(t(s, dir, "documents"), "doc_id", "text",
        maxTokens = 64, overlap = 16)
        .orderBy("doc_id", "chunk_idx")
    },

    // deterministic T5-style span corruption: 3-token blocks, 25% of
    // blocks masked by md5(doc:block) prefix threshold, each masked
    // block collapsing to one sentinel. Both engines replay the
    // identical hash decisions; the (large) masked text compares as a
    // hash.
    q("q_text_mask_spans", {
      val thr = graft.ml.Profile.strongThreshold(0.25)
      s"""WITH cw AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
         |  FROM documents WHERE strlen(trim(text)) > 0
         |), blk AS (
         |  SELECT doc_id, w, len(w) AS n, u.b AS b,
         |    substr(md5(doc_id::VARCHAR || ':' || u.b::VARCHAR), 1, 8) < '$thr' AS m
         |  FROM cw, unnest(range(0, CAST(ceil(len(w) / 3.0) AS BIGINT))) AS u(b)
         |), seg AS (
         |  SELECT doc_id, n, b, m,
         |    CASE WHEN m THEN '<X>'
         |      ELSE array_to_string(w[(b * 3 + 1):(b * 3 + 3)], ' ') END AS piece,
         |    CASE WHEN m THEN least(3, n - b * 3) ELSE 0 END AS masked_toks
         |  FROM blk
         |)
         |SELECT doc_id, min(n) AS n_tokens,
         |  CAST(sum(masked_toks) AS BIGINT) AS n_masked,
         |  md5(string_agg(piece, ' ' ORDER BY b)) AS h
         |FROM seg GROUP BY doc_id ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      // Match the oracle's WHERE strlen(trim(text)) > 0: maskSpans itself
      // emits a (doc_id, 0, 0, md5('')) row for blank docs, which the
      // oracle's unnest(range(0, 0)) silently drops — filter the same
      // blanks here so both sides agree even if the testdata gains one.
      graft.ml.Corpus.maskSpans(
          t(s, dir, "documents").filter(length(trim(col("text"))) > 0),
          "doc_id", "text", rate = 0.25, spanLen = 3)
        .select(col("doc_id"), col("n_tokens"), col("n_masked"),
          md5(col("masked_text")).as("h"))
        .orderBy("doc_id")
    },

    // fill-in-the-middle (PSM) infilling transform: seeded md5-digit
    // cut points split each doc's tokens into prefix/middle/suffix,
    // re-emitted as <PRE> prefix <SUF> suffix <MID> middle. The
    // oracle replays the cut-point polynomial and the exact segment
    // order; md5 of the transformed text proves byte fidelity.
    q("q_text_fim",
      """WITH cw AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents WHERE strlen(trim(text)) > 0
        |), uv AS (
        |  SELECT doc_id, w, len(w) AS n,
        |    (ascii(substr(h,1,1))*251 + ascii(substr(h,2,1))*31 +
        |      ascii(substr(h,3,1))) % (len(w)+1) AS u1,
        |    (ascii(substr(h,4,1))*251 + ascii(substr(h,5,1))*31 +
        |      ascii(substr(h,6,1))) % (len(w)+1) AS u2
        |  FROM cw, LATERAL (SELECT md5('fim:' || doc_id::VARCHAR) AS h) x
        |), cc AS (
        |  SELECT doc_id, w, n, least(u1, u2) AS cut1,
        |    greatest(u1, u2) AS cut2
        |  FROM uv
        |)
        |SELECT doc_id, n AS n_tokens, cut1, cut2,
        |  md5(array_to_string(flatten([['<PRE>'], w[1:cut1], ['<SUF>'],
        |    w[cut2+1:n], ['<MID>'], w[cut1+1:cut2]]), ' ')) AS h
        |FROM cc ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.ml.Corpus.fimTransform(
          t(s, dir, "documents").filter(length(trim(col("text"))) > 0),
          "doc_id", "text", seed = "fim")
        .select(col("doc_id"), col("n_tokens"), col("cut1"), col("cut2"),
          md5(col("fim_text")).as("h"))
        .orderBy("doc_id")
    },

    // chat flattening: six planted conversation variants per doc_id
    // class — valid with/without system turn, broken alternation,
    // truncated JSON, empty array, empty content. The ENGINE runs the
    // real from_json parse + protocol validation + rendering; the
    // oracle emits each class's expected classification and rendered
    // text arithmetically.
    q("q_chat_flatten",
      """SELECT doc_id AS id,
        |  CASE doc_id % 6 WHEN 0 THEN 3 WHEN 1 THEN 3 WHEN 2 THEN 2
        |    WHEN 3 THEN 0 WHEN 4 THEN 0 ELSE 1 END AS n_turns,
        |  doc_id % 6 IN (0, 1) AS valid,
        |  CASE doc_id % 6 WHEN 0 THEN 'ok' WHEN 1 THEN 'ok'
        |    WHEN 2 THEN 'role' WHEN 3 THEN 'parse' WHEN 4 THEN 'empty'
        |    ELSE 'content' END AS reason,
        |  CASE doc_id % 6
        |    WHEN 0 THEN '<|system|> s' || doc_id || chr(10) ||
        |      '<|user|> a' || doc_id || chr(10) ||
        |      '<|assistant|> b' || doc_id
        |    WHEN 1 THEN '<|user|> a' || doc_id || chr(10) ||
        |      '<|assistant|> b' || doc_id || chr(10) ||
        |      '<|user|> c' || doc_id
        |    ELSE NULL END AS text
        |FROM documents ORDER BY id""".stripMargin) { (s, dir) =>
      val id = col("doc_id")
      val conv = when(id % 6 === 0, concat(
          lit("[{\"role\":\"system\",\"content\":\"s"), id,
          lit("\"},{\"role\":\"user\",\"content\":\"a"), id,
          lit("\"},{\"role\":\"assistant\",\"content\":\"b"), id,
          lit("\"}]")))
        .when(id % 6 === 1, concat(
          lit("[{\"role\":\"user\",\"content\":\"a"), id,
          lit("\"},{\"role\":\"assistant\",\"content\":\"b"), id,
          lit("\"},{\"role\":\"user\",\"content\":\"c"), id, lit("\"}]")))
        .when(id % 6 === 2, concat(
          lit("[{\"role\":\"user\",\"content\":\"a"), id,
          lit("\"},{\"role\":\"user\",\"content\":\"b"), id, lit("\"}]")))
        .when(id % 6 === 3, concat(
          lit("[{\"role\":\"user\",\"content\":\"a"), id))
        .when(id % 6 === 4, lit("[]"))
        .otherwise(lit("[{\"role\":\"user\",\"content\":\"\"}]"))
      graft.ml.Chat.flattenChat(
          t(s, dir, "documents").withColumn("conv", conv),
          "doc_id", "conv")
        .orderBy("id")
    },

    q("q_text_pack",
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN strlen(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS tok,
        |    doc_id % 8 AS shard,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, shard, tok,
        |    sum(tok) OVER (PARTITION BY shard ORDER BY h, doc_id) AS cum
        |  FROM d
        |)
        |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
        |  CAST((cum - tok) // 128 AS BIGINT) AS seq_id,
        |  CAST((cum - tok) % 128 AS BIGINT) AS seq_offset,
        |  CAST(CASE WHEN tok <= 0 THEN 1
        |       ELSE (cum - 1) // 128 - (cum - tok) // 128 + 1 END AS BIGINT) AS n_seqs
        |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), TA.tokenCount(col("text")).cast("long").as("tok"))
      graft.ml.Corpus.packSequences(docs, "doc_id", "tok",
          ctxLen = 128, nShards = 8)
        .orderBy("doc_id")
    },

    // the writer-side view of packing: per (shard, sequence), the
    // stream-ordered doc list a trainer row is assembled from.
    q("q_text_pack_manifest",
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN strlen(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS tok,
        |    doc_id % 8 AS shard,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, shard, tok,
        |    sum(tok) OVER (PARTITION BY shard ORDER BY h, doc_id) AS cum
        |  FROM d
        |), p AS (
        |  SELECT doc_id, shard,
        |    (cum - tok) // 128 AS seq_id, (cum - tok) % 128 AS seq_offset
        |  FROM c
        |)
        |SELECT CAST(shard AS BIGINT) AS shard, CAST(seq_id AS BIGINT) AS seq_id,
        |  count(*) AS n_docs,
        |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY seq_offset, doc_id) AS doc_ids
        |FROM p GROUP BY shard, seq_id
        |ORDER BY shard, seq_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), TA.tokenCount(col("text")).cast("long").as("tok"))
      graft.ml.Corpus.sequenceManifest(docs, "doc_id", "tok",
          ctxLen = 128, nShards = 8)
        .orderBy("shard", "seq_id")
    },

    // Gopher-style repetition filters: duplicate-token fraction and
    // the share of the most common bigram — both pure per-row Column
    // expressions (single scan, no shuffle). The oracle recomputes the
    // top-bigram share with an explicit unnest + GROUP BY mode count;
    // the engine's sorted-run fold must agree exactly.
    q("q_text_repetition",
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents
        |), big AS (
        |  SELECT doc_id, t,
        |    list_transform(generate_series(1, len(t) - 1),
        |      i -> t[i] || ' ' || t[i + 1]) AS g
        |  FROM toks
        |), cnt AS (
        |  SELECT doc_id, max(c) AS maxc, sum(c) AS ng FROM (
        |    SELECT doc_id, count(*) AS c
        |    FROM (SELECT doc_id, unnest(g) AS gram FROM big)
        |    GROUP BY doc_id, gram
        |  ) GROUP BY doc_id
        |)
        |SELECT b.doc_id,
        |  round((len(b.t) - len(list_distinct(b.t))) * 1.0::DOUBLE / len(b.t), 6)
        |    AS dup_tok_frac,
        |  round(COALESCE(c.maxc * 1.0::DOUBLE / c.ng, 0.0), 6) AS top_bigram_frac
        |FROM big b LEFT JOIN cnt c USING (doc_id)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("toks", TA.tokens(col("text")))
        .withColumn("g", TA.bigramsOf(col("toks")))
        .select(col("doc_id"),
          round(TA.duplicateTokenFraction(col("toks")), 6).as("dup_tok_frac"),
          round(TA.topBigramFractionOf(col("g")), 6).as("top_bigram_frac"))
        .orderBy("doc_id")
    },

    // PII scrubbing: deterministic synthetic emails/phones/IPs are
    // appended to some docs (the corpus itself is PII-free), then
    // counted and replaced with typed placeholders. Both engines run
    // the same RE2-safe patterns; the md5 of the scrubbed text proves
    // byte-identical replacement, not just equal counts.
    q("q_text_pii", {
      val email = TA.emailPattern
      s"""WITH s AS (
         |  SELECT doc_id, text
         |    || CASE WHEN doc_id % 3 = 0 THEN ' reach me at user' ||
         |         CAST(doc_id AS VARCHAR) || '@mail' ||
         |         CAST(doc_id % 7 AS VARCHAR) || '.com' ELSE '' END
         |    || CASE WHEN doc_id % 4 = 0 THEN ' call 415-555-' ||
         |         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
         |    || CASE WHEN doc_id % 5 = 0 THEN ' host 10.0.' ||
         |         CAST(doc_id % 256 AS VARCHAR) || '.' ||
         |         CAST(doc_id % 100 AS VARCHAR) ELSE '' END AS t
         |  FROM documents
         |)
         |SELECT doc_id,
         |  len(regexp_extract_all(t, '$email')) AS n_email,
         |  len(regexp_extract_all(t, '\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b')) AS n_phone,
         |  len(regexp_extract_all(t, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS n_ip,
         |  md5(regexp_replace(regexp_replace(regexp_replace(t,
         |    '$email', '<EMAIL>', 'g'),
         |    '\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b', '<PHONE>', 'g'),
         |    '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g'))
         |    AS scrubbed_md5
         |FROM s ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val synth = concat(col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" reach me at user"), col("doc_id").cast("string"),
            lit("@mail"), (col("doc_id") % 7).cast("string"), lit(".com")))
          .otherwise(lit("")),
        when(col("doc_id") % 4 === 0,
          concat(lit(" call 415-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" host 10.0."), (col("doc_id") % 256).cast("string"),
            lit("."), (col("doc_id") % 100).cast("string")))
          .otherwise(lit("")))
      t(s, dir, "documents")
        .withColumn("t", synth)
        .withColumn("pii", TA.piiCounts(col("t")))
        .select(col("doc_id"),
          col("pii.n_email").as("n_email"),
          col("pii.n_phone").as("n_phone"),
          col("pii.n_ip").as("n_ip"),
          md5(TA.scrubPii(col("t"))).as("scrubbed_md5"))
        .orderBy("doc_id")
    },

    // Luhn-gated payment-card PII: every doc gets a 16-digit "ref"
    // number (Luhn-valid or not depending on doc_id), docs % 6 also a
    // known-valid spaced card. The candidate regex alone over-fires
    // on the refs; the Luhn checksum (indexed-lambda replay in both
    // engines) keeps only real PANs, and the scrubbed-text md5 proves
    // the checksum-gated fold replaced exactly the valid ones.
    q("q_text_card_pii", {
      val card = TA.cardPattern
      val luhn = "list_sum(list_transform(regexp_extract_all(" +
        "regexp_replace(q, '[ -]', '', 'g'), '[0-9]'), (ch, i) -> " +
        "CASE WHEN (length(regexp_replace(q, '[ -]', '', 'g')) - i) % 2 = 1 " +
        "THEN CASE WHEN ch::INT * 2 > 9 THEN ch::INT * 2 - 9 " +
        "ELSE ch::INT * 2 END ELSE ch::INT END)) % 10 = 0"
      s"""WITH s AS (
         |  SELECT doc_id, text
         |    || ' ref ' || lpad(CAST(doc_id AS VARCHAR), 16, '1')
         |    || CASE WHEN doc_id % 6 = 0
         |         THEN ' pay 4539 5787 6362 1486 now' ELSE '' END AS t
         |  FROM documents
         |), c AS (
         |  SELECT doc_id, t, regexp_extract_all(t, '$card') AS cands
         |  FROM s
         |), v AS (
         |  SELECT doc_id, t, len(cands) AS n_candidate,
         |    list_filter(cands, q -> $luhn) AS valid
         |  FROM c
         |)
         |SELECT doc_id, n_candidate, len(valid) AS n_card,
         |  md5(list_reduce(list_prepend(t, valid),
         |    (acc, x) -> replace(acc, x, '<CARD>'))) AS scrubbed_md5
         |FROM v ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val synth = concat(col("text"),
        lit(" ref "), lpad(col("doc_id").cast("string"), 16, "1"),
        when(col("doc_id") % 6 === 0, lit(" pay 4539 5787 6362 1486 now"))
          .otherwise(lit("")))
      t(s, dir, "documents")
        .withColumn("t", synth)
        .withColumn("cc", TA.cardCounts(col("t")))
        .select(col("doc_id"),
          col("cc.n_candidate").cast("long").as("n_candidate"),
          col("cc.n_card").cast("long").as("n_card"),
          md5(TA.scrubCards(col("t"))).as("scrubbed_md5"))
        .orderBy("doc_id")
    },

    // temperature-based domain mixing (mBERT/XLM-R sampling rule):
    // alpha=0.5 up-samples small sources toward a 4000-token target;
    // membership is the engine-portable md5-prefix rule, so the oracle
    // replays the exact kept set, not just its size.
    q("q_corpus_mix_temperature",
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CASE WHEN strlen(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS tok
        |  FROM documents
        |), w AS (
        |  SELECT source, CAST(sum(tok) AS DOUBLE) AS mass FROM d GROUP BY source
        |), r AS (
        |  SELECT source,
        |    CASE WHEN mass > 0 THEN round(least(1.0,
        |      4000 * pow(mass, 0.5) / (sum(pow(mass, 0.5)) OVER ()) / mass), 6)
        |    ELSE 0.0 END AS rate
        |  FROM w
        |)
        |SELECT d.doc_id, d.source, CAST(d.tok AS BIGINT) AS tok, r.rate
        |FROM d JOIN r USING (source)
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
        |  printf('%08x', CAST(least(round(rate * 4294967296.0), 4294967295) AS BIGINT))
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TA.tokenCount(col("text")).cast("long").as("tok"))
      graft.ml.Corpus.mixByTemperature(docs, "doc_id", "source", "tok",
          alpha = 0.5, tokenBudget = 4000L)
        .select(col("doc_id"), col("source"), col("tok"), col("rate"))
        .orderBy("doc_id")
    },

    // per-stratum quantile gate: drop the shortest 20% of each
    // language's documents — exact percent_rank semantics, so the cut
    // point is deterministic under ties and replayable in SQL.
    q("q_corpus_quality_filter",
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |    percent_rank() OVER (PARTITION BY lang
        |      ORDER BY n_chars, doc_id) AS pr
        |  FROM documents
        |) WHERE pr >= 0.2 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.ml.Corpus.dropBottomByScore(
          t(s, dir, "documents").select("doc_id", "lang", "n_chars"),
          "lang", "n_chars", "doc_id", fraction = 0.2)
        .orderBy("doc_id")
    },

    // BPE vocabulary induction: 12 merges learned from the corpus.
    // Iterative (argmax + re-merge per round) so not SQL-expressible —
    // rows-only gate; BpeSpec proves byte-equality against a
    // single-node reference implementation on the same table.
    // distributed BPE vocabulary induction. The oracle replays the
    // full sequential algorithm in SQL: 12 unrolled stages over a
    // separator-encoded symbol string per word, each stage = pair
    // count + (count desc, left, right) argmax + merge application.
    // The merge applies as an explicit greedy left-to-right
    // list_reduce scan (merge the incoming symbol into the
    // accumulator's tail when the tail is the merge's left) — string
    // replace() tricks cannot reproduce greedy tokenization of
    // self-pair runs like "aaaaa". CTEs are MATERIALIZED: each stage
    // is referenced twice (pairs + next state), and inlining would
    // double the work per stage.
    q("q_text_bpe", TextQueries.bpeOracleSql(12)) { (s, dir) =>
      import s.implicits._
      val docs = t(s, dir, "documents").select("text").as[String]
      graft.ml.Bpe.train(docs, nMerges = 12)
        .toDF().select("rank", "left", "right").orderBy("rank")
    },

    // tokenizer application at corpus scale: train 12 merges, encode
    // every document (shuffle-free memoized mapPartitions — the ranked
    // merge table ships in the closure), count tokens per document.
    // The oracle reuses the training stages and reads each word's
    // token count off the final merged-state table, which is exactly
    // what ranked-greedy encoding produces for corpus words.
    q("q_text_bpe_encode", TextQueries.bpeEncodeOracleSql(12)) { (s, dir) =>
      import s.implicits._
      val docs = t(s, dir, "documents")
      val merges = graft.ml.Bpe.train(docs.select("text").as[String], 12)
      graft.ml.Bpe.encode(
          docs.select(col("doc_id").cast("long"), col("text"))
            .as[(Long, String)], merges)
        .toDF("doc_id", "toks")
        .select(col("doc_id"), size(col("toks")).cast("long").as("n_bpe_tokens"))
        .orderBy("doc_id")
    },

    // unigram-LM tokenizer (SentencePiece-style, hard-EM): train a
    // 512-piece vocabulary on the corpus, Viterbi-encode every
    // document (shuffle-free memoized mapPartitions like Bpe.encode).
    // EM optimality is spec-gated against brute-force segmentation
    // (UnigramLmSpec); the cross-engine gate checks the lossless
    // contract — concatenated pieces reproduce the normalized text
    // exactly and every emitted piece is in the learned vocabulary.
    q("q_text_unigram_encode",
      """SELECT doc_id,
        |  regexp_replace(lower(text), '\s+', '', 'g') AS detok,
        |  true AS in_vocab
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val docs = t(s, dir, "documents")
      val vocab = graft.ml.UnigramLm.train(
        docs.select("text").as[String], vocabSize = 512, maxPieceLen = 6)
      val pieces = vocab.map(_.piece).toSet
      graft.ml.UnigramLm.encode(
          docs.select(col("doc_id").cast("long"), col("text"))
            .as[(Long, String)], vocab, maxPieceLen = 6)
        .map { case (id, toks) =>
          (id, toks.mkString(""), toks.forall(pieces.contains))
        }
        .toDF("doc_id", "detok", "in_vocab")
        .orderBy("doc_id")
    },

    // realistic-vocabulary BPE: 256 merges, exercising the batched
    // merge rounds / hybrid dispatch (see Bpe.trainFromCounts). The
    // recursive-CTE oracle iterates to any depth (the unrolled form
    // hit DuckDB's max_expression_depth), so this gate is fully
    // hash-checked too; BpeSpec additionally pins 256-merge
    // byte-equality against a single-node reference.
    q("q_text_bpe_deep", TextQueries.bpeOracleSql(256)) { (s, dir) =>
      import s.implicits._
      val docs = t(s, dir, "documents").select("text").as[String]
      graft.ml.Bpe.train(docs, nMerges = 256)
        .toDF().select("rank", "left", "right").orderBy("rank")
    },

    // exact-count stratified sample: 5 pseudo-random docs per source
    // (balanced-set construction; count-capped vs q_corpus_mix's
    // token-capped selection).
    q("q_sample_stratified",
      """SELECT doc_id, source, sample_rank FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS sample_rank
        |  FROM documents
        |) WHERE sample_rank <= 5
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.ml.Corpus.stratifiedTake(
          t(s, dir, "documents"), "doc_id", "source", n = 5)
        .select("doc_id", "source", "sample_rank")
        .orderBy("doc_id")
    },

    // corpus snapshot diff: classify every doc id across two corpus
    // versions (today's = yesterday's minus every 7th id, with every
    // 5th edited and every 11th re-added under a shifted id). Both
    // sides are reduced to (id, md5) before the one narrow join — the
    // incremental-pipeline audit step.
    q("q_corpus_diff",
      """WITH old AS (SELECT doc_id, text FROM documents),
        |new AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' edited' ELSE text END AS text
        |  FROM documents WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 11 = 0
        |)
        |SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
        |  CASE WHEN old.doc_id IS NULL THEN 'added'
        |       WHEN new.doc_id IS NULL THEN 'removed'
        |       WHEN md5(old.text) = md5(new.text) THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM old FULL JOIN new ON old.doc_id = new.doc_id
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val neu = docs.filter(col("doc_id") % 7 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" edited")))
            .otherwise(col("text")))
        .unionByName(docs.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      graft.ml.Corpus.diffSnapshots(docs, neu, "doc_id", "text")
        .orderBy("doc_id")
    },

    // deterministic k-fold assignment (Fibonacci scramble mod k): the
    // oracle replays the integer arithmetic exactly — folds stable
    // across engines, runs, and appends.
    q("q_corpus_kfold",
      """SELECT doc_id,
        |  CAST(((doc_id % 2147483647) * 1327217885 % 2147483647) % 5 AS INT) AS fold
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.ml.Corpus.kFold(t(s, dir, "documents"), "doc_id", k = 5)
        .select("doc_id", "fold")
        .orderBy("doc_id")
    },

    // per-domain quality cap: each source keeps only its k best docs
    // by score (n_chars here), deterministic tie-break on doc_id. The
    // oracle is the window row_number form; the engine side is the
    // scale shape — bounded-PQ top-k aggregation (shuffle carries ≤ k
    // pairs per domain) + broadcast join-back, so the doc table itself
    // never shuffles.
    q("q_corpus_domain_cap",
      """SELECT doc_id, source, domain_rank FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS domain_rank
        |  FROM documents
        |) WHERE domain_rank <= 5
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.ml.Corpus.capPerDomain(
          t(s, dir, "documents"), "doc_id", "source", "n_chars", k = 5)
        .select("doc_id", "source", "domain_rank")
        .orderBy("doc_id")
    },

    // domain-quota corpus mixing: per source, keep the md5-ordered
    // prefix whose running token total stays within the budget — the
    // deterministic, replayable form of "shuffle and take until full".
    q("q_corpus_mix",
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CASE WHEN strlen(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS tok,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, source, tok,
        |    sum(tok) OVER (PARTITION BY source ORDER BY h, doc_id) AS cum
        |  FROM d
        |)
        |SELECT doc_id, source, CAST(tok AS BIGINT) AS tok,
        |  CAST(cum AS BIGINT) AS cum_tokens
        |FROM c WHERE cum <= 800 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TA.tokenCount(col("text")).cast("long").as("tok"))
      graft.ml.Corpus.mixByBudget(docs, "doc_id", "source", "tok",
          tokenBudget = 800L)
        .select("doc_id", "source", "tok", "cum_tokens")
        .orderBy("doc_id")
    },

    // quality-ordered budget mix: best-first (n_chars desc) per-source
    // running token cut at 800 — the budget buys the best material.
    q("q_corpus_mix_ordered",
      """WITH d AS (
        |  SELECT doc_id, source, n_chars,
        |    CASE WHEN strlen(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS tok
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, source, tok,
        |    sum(tok) OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS cum
        |  FROM d
        |)
        |SELECT doc_id, source, CAST(tok AS BIGINT) AS tok,
        |  CAST(cum AS BIGINT) AS cum_tokens
        |FROM c WHERE cum <= 800 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.ml.Corpus.mixByBudgetOrdered(
          t(s, dir, "documents")
            .select(col("doc_id"), col("source"), col("n_chars"),
              TA.tokenCount(col("text")).cast("long").as("tok")),
          "doc_id", "source", "tok", "n_chars", tokenBudget = 800L)
        .select("doc_id", "source", "tok", "cum_tokens")
        .orderBy("doc_id")
    },

    // per-stratum weighted sampling: the E-S key ranked inside each
    // source, top 5 per stratum — balanced weighted selection.
    q("q_corpus_weighted_stratified",
      """SELECT doc_id, source, sample_rank FROM (
        |  SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY ln(((doc_id % 2147483647) * 1327217885 % 2147483647
        |        + 1) / 2147483648.0) / (length(text) + 1) DESC, doc_id)
        |      AS BIGINT) AS sample_rank
        |  FROM documents
        |) WHERE sample_rank <= 5 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.ml.Corpus.weightedSamplePerStratum(
          t(s, dir, "documents")
            .select(col("doc_id"), col("source"),
              (length(col("text")) + 1L).as("w")),
          "doc_id", "source", "w", n = 5)
        .select("doc_id", "source", "sample_rank")
        .orderBy("doc_id")
    },

    // weighted sampling without replacement (Efraimidis–Spirakis):
    // rank by ln(u)/w with the integer-arithmetic pseudo-uniform
    // u = (fibScramble(id)+1)/2^31, take the top 50 — inclusion odds
    // proportional to the weight (here doc length + 1), deterministic
    // and engine-replayable.
    q("q_corpus_weighted_sample",
      """SELECT doc_id, w, sample_key FROM (
        |  SELECT doc_id, CAST(length(text) + 1 AS BIGINT) AS w,
        |    round(ln(((doc_id % 2147483647) * 1327217885 % 2147483647 + 1)
        |      / 2147483648.0) / (length(text) + 1), 6) AS sample_key,
        |    ln(((doc_id % 2147483647) * 1327217885 % 2147483647 + 1)
        |      / 2147483648.0) / (length(text) + 1) AS raw_key
        |  FROM documents
        |  ORDER BY raw_key DESC, doc_id LIMIT 50
        |) ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.ml.Corpus.weightedSample(
          t(s, dir, "documents")
            .select(col("doc_id"), (length(col("text")) + 1L).as("w")),
          "doc_id", "w", n = 50)
        .select(col("doc_id"), col("w").cast("long").as("w"),
          round(col("sample_key"), 6).as("sample_key"))
        .orderBy("doc_id")
    },

    // deterministic augmentation: word dropout + adjacent swaps, both
    // decided by md5(salt, doc, position) coins so the augmented copy
    // is an artifact of the dataset (replayed exactly by the oracle's
    // list ops; DuckDB lambda indices are 1-based, hence i-1).
    q("q_text_augment", {
      val thrD = graft.ml.Profile.strongThreshold(0.15)
      val thrS = graft.ml.Profile.strongThreshold(0.25)
      s"""WITH d AS (
         |  SELECT doc_id,
         |    CASE WHEN trim(text) = '' THEN []::VARCHAR[]
         |      ELSE string_split_regex(trim(text), '\\s+') END AS w
         |  FROM documents
         |), dr AS (
         |  SELECT doc_id, w,
         |    list_filter(w, (x, i) -> NOT (substring(md5('wd:' ||
         |      CAST(doc_id AS VARCHAR) || ':' ||
         |      CAST(i - 1 AS VARCHAR)), 1, 8) < '$thrD')) AS kept
         |  FROM d
         |), sw AS (
         |  SELECT doc_id, w,
         |    flatten(list_transform(range(len(w) // 2), b ->
         |      CASE WHEN substring(md5('sw:' ||
         |          CAST(doc_id AS VARCHAR) || ':' ||
         |          CAST(b AS VARCHAR)), 1, 8) < '$thrS'
         |        THEN [w[b * 2 + 2], w[b * 2 + 1]]
         |        ELSE [w[b * 2 + 1], w[b * 2 + 2]] END))
         |    || CASE WHEN len(w) % 2 = 1 THEN [w[len(w)]]
         |        ELSE []::VARCHAR[] END AS sw_w
         |  FROM d
         |)
         |SELECT dr.doc_id, CAST(len(dr.w) AS BIGINT) AS n_tokens,
         |  CAST(len(dr.w) - len(dr.kept) AS BIGINT) AS n_dropped,
         |  md5(array_to_string(dr.kept, ' ')) AS drop_h,
         |  md5(array_to_string(sw.sw_w, ' ')) AS swap_h
         |FROM dr JOIN sw ON dr.doc_id = sw.doc_id
         |ORDER BY dr.doc_id""".stripMargin
    }) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val dropped = Corpus.dropWords(docs, "doc_id", "text", rate = 0.15)
        .select(col("doc_id"), col("n_tokens"), col("n_dropped"),
          md5(col("aug_text")).as("drop_h"))
      val swapped = Corpus.swapAdjacentWords(docs, "doc_id", "text",
          rate = 0.25)
        .select(col("doc_id"), md5(col("aug_text")).as("swap_h"))
      dropped.join(swapped, "doc_id").orderBy("doc_id")
    },

    // within-document line dedup (apply form of the Gopher duplicate-
    // line flag): first occurrence of each non-blank line survives,
    // blanks always survive. Documents are single-line in this
    // corpus, so the fixture lines are the words (space -> newline) —
    // repeated words within a doc actually dedup.
    q("q_text_line_dedup_doc",
      """WITH d AS (
        |  SELECT doc_id, string_split(replace(text, ' ', chr(10)),
        |    chr(10)) AS l
        |  FROM documents
        |), k AS (
        |  SELECT doc_id, l,
        |    list_filter(l, (x, i) -> trim(x) = ''
        |      OR NOT list_contains(l[1:i-1], x)) AS kept
        |  FROM d
        |)
        |SELECT doc_id, CAST(len(kept) AS BIGINT) AS n_kept,
        |  CAST(len(l) - len(kept) AS BIGINT) AS n_dropped,
        |  md5(array_to_string(kept, chr(10))) AS cleaned_h
        |FROM k ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.ml.Filters
      Filters.dedupLinesWithinDoc(
          t(s, dir, "documents")
            .select(col("doc_id"),
              regexp_replace(col("text"), " ", "\n").as("text")),
          "doc_id", "text")
        .select(col("doc_id"), col("n_kept"), col("n_dropped"),
          md5(col("cleaned")).as("cleaned_h"))
        .orderBy("doc_id")
    },

    // contrastive triplet mining: deterministic in-corpus negative
    // draws via integer hashing onto the md5-permutation index;
    // accidental anchor/positive hits dropped, 3 draws per pair.
    q("q_corpus_triplets",
      """WITH idx AS (
        |  SELECT doc_id AS negative,
        |    ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)),
        |      doc_id) - 1 AS pos
        |  FROM documents
        |), n AS (SELECT count(*) AS n FROM documents),
        |pairs AS (
        |  SELECT a.doc_id AS anchor, a.doc_id + 1 AS positive
        |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |  WHERE a.doc_id % 50 = 0
        |), draws AS (
        |  SELECT anchor, positive, j AS neg_rank,
        |    ((anchor % 2147483647) * 1327217885 % 2147483647
        |      + (j + 1) * 104729) % 2147483647 % n.n AS pos
        |  FROM pairs, n, (SELECT unnest([0, 1, 2]) AS j)
        |)
        |SELECT anchor, positive, CAST(neg_rank AS BIGINT) AS neg_rank,
        |  negative
        |FROM draws JOIN idx USING (pos)
        |WHERE negative != anchor AND negative != positive
        |ORDER BY anchor, neg_rank""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val a = docs.select(col("doc_id").as("anchor"))
        .filter(col("anchor") % 50 === 0)
      val pairs = a.join(
        docs.select(col("doc_id").as("positive")),
        col("positive") === col("anchor") + 1L)
      graft.ml.Corpus.contrastiveTriplets(pairs, docs, "doc_id", nNeg = 3)
        .orderBy("anchor", "neg_rank")
    },

    // deterministic global training order: rank under the md5
    // permutation, computed WITHOUT a global sort (hash-prefix
    // shards + broadcast offsets); the oracle is the plain global
    // ROW_NUMBER the construction must equal.
    q("q_corpus_train_order",
      """SELECT doc_id,
        |  CAST(ROW_NUMBER() OVER (
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1
        |    AS BIGINT) AS global_pos
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.ml.Corpus.orderForTraining(
          t(s, dir, "documents").select("doc_id"), "doc_id")
        .select("doc_id", "global_pos")
        .orderBy("doc_id")
    },

    // BM25 retrieval scoring: Lucene-default formula, literal query
    // term list, top-10 docs. The scan keeps only query-term hits.
    q("q_text_bm25", {
      val words = "string_split(trim(regexp_replace(regexp_replace(lower(text), " +
        "'[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ')"
      s"""WITH base AS (
         |  SELECT doc_id, len(w) AS dl,
         |    list_filter(w, t -> t IN ('data', 'table', 'server', 'value')) AS qt
         |  FROM (SELECT doc_id, $words AS w FROM documents)
         |), stats AS (
         |  SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM base
         |), tf AS (
         |  SELECT doc_id, dl, tk, count(*) AS tf
         |  FROM (SELECT doc_id, dl, unnest(qt) AS tk FROM base)
         |  GROUP BY 1, 2, 3
         |), dfreq AS (
         |  SELECT tk, count(*) AS df FROM tf GROUP BY 1
         |)
         |SELECT doc_id,
         |  floor(sum(
         |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0::DOUBLE) * tf * 2.2
         |    / (tf + 1.2 * (0.25 + 0.75 * dl / (sum_dl * 1.0::DOUBLE / n_docs)))
         |  ) * 1e6 + 0.5) / 1e6 AS bm25
         |FROM tf JOIN dfreq USING (tk), stats
         |GROUP BY doc_id
         |ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin
    }) { (s, dir) =>
      TA.bm25(t(s, dir, "documents"), "doc_id", "text",
        queryTerms = Seq("data", "table", "server", "value"))
    },

    // length-bucketed sortish training order: frozen token cutoffs
    // (32/64/96) + salted md5 in-bucket keys — both pure arithmetic,
    // fully replayable.
    q("q_text_sortish_order",
      """WITH tc AS (
        |  SELECT doc_id, CASE WHEN strlen(trim(text)) = 0 THEN 0
        |    ELSE len(string_split_regex(trim(text), '\s+')) END AS nt
        |  FROM documents
        |)
        |SELECT doc_id, CAST(nt AS BIGINT) AS n_tokens,
        |  1 + (CASE WHEN nt > 32 THEN 1 ELSE 0 END)
        |    + (CASE WHEN nt > 64 THEN 1 ELSE 0 END)
        |    + (CASE WHEN nt > 96 THEN 1 ELSE 0 END)
        |    AS bucket,
        |  md5('7:' || CAST(doc_id AS VARCHAR)) AS sort_key
        |FROM tc
        |ORDER BY bucket, sort_key, doc_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
        .select(col("doc_id"),
          TA.tokenCount(col("text")).cast("long").as("n_tokens"))
      graft.ml.Corpus.lengthBucketedOrder(docs, "doc_id", "n_tokens",
          cutoffs = Seq(32.0, 64.0, 96.0), salt = 7L)
        .select("doc_id", "n_tokens", "bucket", "sort_key")
        .orderBy("bucket", "sort_key", "doc_id")
    },

    // reliability diagram of the heuristic quality score as a
    // predictor of "is English": per frozen score bin, count,
    // mean score, observed rate and the calibration gap.
    q("q_text_reliability",
      s"""WITH sc AS (
         |  SELECT CASE WHEN lang = 'en' THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END AS y,
         |   (CASE WHEN len(string_split_regex(trim(text), '\\s+')) BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.3 END * 0.3
         |    + CASE WHEN list_aggregate(list_transform(string_split_regex(trim(text), '\\s+'), w -> strlen(w)), 'sum') * 1.0::DOUBLE
         |        / len(string_split_regex(trim(text), '\\s+')) BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.4 END * 0.2
         |    + CASE WHEN len(list_filter(string_split_regex(lower(text), '\\s+'),
         |        w -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','at','by','be','this'], w)))
         |        * 1.0::DOUBLE / len(string_split_regex(trim(text), '\\s+')) > 0.05 THEN 1.0 ELSE 0.6 END * 0.3
         |    + CASE WHEN len(regexp_extract_all(text, '[!-/:-@\\[-`{-~]')) * 1.0::DOUBLE / strlen(text) < 0.2 THEN 1.0 ELSE 0.5 END * 0.2
         |   )::DOUBLE AS s
         |  FROM documents
         |), b AS (
         |  SELECT 1 + (CASE WHEN s > 0.6 THEN 1 ELSE 0 END)
         |    + (CASE WHEN s > 0.8 THEN 1 ELSE 0 END)
         |    + (CASE WHEN s > 0.9 THEN 1 ELSE 0 END) AS bucket, s, y
         |  FROM sc
         |)
         |SELECT bucket, count(*) AS n, round(avg(s), 6) AS mean_score,
         |  round(avg(y), 6) AS rate,
         |  round(abs(avg(s) - avg(y)), 6) AS gap
         |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, dir) =>
      val scored = t(s, dir, "documents")
        .withColumn("toks", TA.tokens(col("text")))
        .select(
          TA.qualityFromComponents(size(col("toks")),
            TA.meanWordLengthOf(col("toks")),
            TA.stopwordRatioOf(col("toks")),
            TA.punctRatio(col("text"))).as("s"),
          when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
      graft.ml.Calibrate.reliability(scored, "s", "y",
          cuts = Seq(0.6, 0.8, 0.9))
        .withColumn("mean_score", round(col("mean_score"), 6))
        .withColumn("rate", round(col("rate"), 6))
        .withColumn("gap", round(col("gap"), 6))
        .orderBy("bucket")
    },

    // per-source Jensen–Shannon divergence vs the corpus unigram
    // distribution: absent-word mass via the closed-form ln2 ·
    // (1 − Σ present q) identity on both sides — no source ×
    // vocabulary cross product in either engine.
    q("q_text_js_divergence", {
      val words = "string_split(trim(regexp_replace(regexp_replace(lower(text), " +
        "'[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ')"
      s"""WITH cw AS (
         |  SELECT source, $words AS w FROM documents
         |), tok AS (
         |  SELECT source AS stratum, tk
         |  FROM (SELECT source, unnest(w) AS tk FROM cw)
         |  WHERE strlen(tk) > 0
         |), sw AS (
         |  SELECT stratum, tk, count(*) AS c FROM tok GROUP BY 1, 2
         |), st AS (SELECT stratum, sum(c) AS nt FROM sw GROUP BY 1),
         |cwc AS (SELECT tk, sum(c) AS cc FROM sw GROUP BY 1),
         |tot AS (SELECT sum(cc) AS nn FROM cwc)
         |SELECT sw.stratum, CAST(max(st.nt) AS BIGINT) AS n_tokens,
         |  round(0.5::DOUBLE * sum(
         |      (CAST(c AS DOUBLE) / nt) * ln(2.0::DOUBLE * (CAST(c AS DOUBLE) / nt)
         |        / ((CAST(c AS DOUBLE) / nt) + (CAST(cc AS DOUBLE) / nn)))
         |      + (CAST(cc AS DOUBLE) / nn) * ln(2.0::DOUBLE * (CAST(cc AS DOUBLE) / nn)
         |        / ((CAST(c AS DOUBLE) / nt) + (CAST(cc AS DOUBLE) / nn))))
         |    + 0.5::DOUBLE * CAST('0.6931471805599453' AS DOUBLE)
         |      * (1.0::DOUBLE - sum(CAST(cc AS DOUBLE) / nn)), 6) AS jsd
         |FROM sw JOIN st USING (stratum) JOIN cwc USING (tk), tot
         |GROUP BY sw.stratum ORDER BY sw.stratum""".stripMargin
    }) { (s, dir) =>
      TA.jsDivergenceByStratum(t(s, dir, "documents"), "source", "text")
        .select(col("stratum"), col("n_tokens"),
          round(col("jsd"), 6).as("jsd"))
        .orderBy("stratum")
    },

    // Platt scaling of the quality score against is-English (the
    // reliability gate's setup): 8 unrolled exact GD steps on the
    // 2-parameter sigmoid, per-doc calibrated probabilities.
    q("q_text_platt", TextQueries.plattOracleSql(8, 2.0)) { (s, dir) =>
      val scored = t(s, dir, "documents")
        .withColumn("toks", TA.tokens(col("text")))
        .select(col("doc_id"),
          TA.qualityFromComponents(size(col("toks")),
            TA.meanWordLengthOf(col("toks")),
            TA.stopwordRatioOf(col("toks")),
            TA.punctRatio(col("text"))).as("s"),
          when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
      graft.ml.Calibrate.plattScale(scored, "s", "y",
          iters = 8, lr = 2.0)
        .select(col("doc_id"), round(col("calibrated"), 6).as("calibrated"))
        .orderBy("doc_id")
    },

    // readability grade per document: the Flesch-Kincaid formula over
    // engine-replayable word/sentence/syllable approximations.
    q("q_text_readability",
      """WITH c AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN strlen(trim(text)) = 0 THEN 0
        |      ELSE len(string_split_regex(trim(text), '\s+')) END AS DOUBLE) AS w,
        |    CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS DOUBLE) AS s,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS DOUBLE) AS sy
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CASE WHEN w > 0 THEN
        |    round(0.39 * (w / s) + 11.8 * (sy / w) - 15.59, 6) END AS grade
        |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          round(TA.readabilityGrade(col("text")), 6).as("grade"))
        .orderBy("doc_id")
    },

    // padding-efficiency stats over the sortish buckets: the waste
    // bound that justifies (or rejects) the cutoff choice.
    q("q_text_bucket_stats",
      """WITH tc AS (
        |  SELECT doc_id, CASE WHEN strlen(trim(text)) = 0 THEN 0
        |    ELSE len(string_split_regex(trim(text), '\s+')) END AS nt
        |  FROM documents
        |), b AS (
        |  SELECT doc_id, CAST(nt AS BIGINT) AS nt,
        |    1 + (CASE WHEN nt > 32 THEN 1 ELSE 0 END)
        |      + (CASE WHEN nt > 64 THEN 1 ELSE 0 END)
        |      + (CASE WHEN nt > 96 THEN 1 ELSE 0 END) AS bucket
        |  FROM tc
        |)
        |SELECT bucket, count(*) AS n_docs,
        |  min(nt) AS min_tok, max(nt) AS max_tok,
        |  CAST(sum(nt) AS BIGINT) AS sum_tok,
        |  CASE WHEN max(nt) > 0 THEN
        |    round((count(*) * max(nt) - sum(nt)) * 1.0::DOUBLE
        |      / (count(*) * max(nt)), 6) ELSE 0.0::DOUBLE END AS pad_frac_bound
        |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
        .select(col("doc_id"),
          TA.tokenCount(col("text")).cast("long").as("n_tokens"))
      val bucketed = graft.ml.Corpus.lengthBucketedOrder(docs, "doc_id",
        "n_tokens", cutoffs = Seq(32.0, 64.0, 96.0))
      graft.ml.Corpus.lengthBucketStats(bucketed, "n_tokens")
        .withColumn("pad_frac_bound", round(col("pad_frac_bound"), 6))
        .orderBy("bucket")
    },

    // hybrid retrieval: the q_text_bm25 lexical top-20 fused with the
    // vec_id=0 cosine top-20 by reciprocal-rank fusion (k=60). Both
    // branch rankings replay exactly (BM25 scores are 1e-6-floored on
    // both engines, cosine ranks come from identical double math), so
    // the fused scores are exact rational sums.
    q("q_text_hybrid", {
      val words = "string_split(trim(regexp_replace(regexp_replace(lower(text), " +
        "'[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ')"
      s"""WITH base AS (
         |  SELECT doc_id, len(w) AS dl,
         |    list_filter(w, t -> t IN ('data', 'table', 'server', 'value')) AS qt
         |  FROM (SELECT doc_id, $words AS w FROM documents)
         |), stats AS (
         |  SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM base
         |), tf AS (
         |  SELECT doc_id, dl, tk, count(*) AS tf
         |  FROM (SELECT doc_id, dl, unnest(qt) AS tk FROM base)
         |  GROUP BY 1, 2, 3
         |), dfreq AS (
         |  SELECT tk, count(*) AS df FROM tf GROUP BY 1
         |), scored AS (
         |  SELECT doc_id,
         |    floor(sum(
         |      ln((n_docs - df + 0.5) / (df + 0.5) + 1.0::DOUBLE) * tf * 2.2
         |      / (tf + 1.2 * (0.25 + 0.75 * dl / (sum_dl * 1.0::DOUBLE / n_docs)))
         |    ) * 1e6 + 0.5) / 1e6 AS bm25
         |  FROM tf JOIN dfreq USING (tk), stats GROUP BY doc_id
         |), lex AS (
         |  SELECT doc_id,
         |    row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
         |  FROM scored QUALIFY rank <= 20
         |), sem AS (
         |  SELECT c.vec_id AS doc_id,
         |    row_number() OVER (ORDER BY list_cosine_similarity(
         |      CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
         |      DESC, c.vec_id) AS rank
         |  FROM embeddings q JOIN embeddings c
         |    ON q.vec_id = 0 AND c.vec_id != 0
         |  QUALIFY rank <= 20
         |), un AS (
         |  SELECT * FROM lex UNION ALL SELECT * FROM sem
         |)
         |SELECT doc_id, round(sum(1.0::DOUBLE / (60 + rank)), 9) AS rrf,
         |  count(*) AS n_lists
         |FROM un GROUP BY 1
         |ORDER BY sum(1.0::DOUBLE / (60 + rank)) DESC, doc_id
         |LIMIT 10""".stripMargin
    }) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      graft.ml.Hybrid.hybridSearch(t(s, dir, "documents"), "doc_id", "text",
          emb, Seq("data", "table", "server", "value"),
          queryVec = emb.filter(col("id") === 0), nCand = 20, topK = 10)
        .withColumn("rrf", round(col("rrf"), 9))
        .orderBy(col("rrf").desc, col("doc_id"))
    },

    // the SAME BM25 answer through the persisted inverted index:
    // build the term-bucketed layout, then query reading only the
    // query terms' buckets (directory-pruned scan, df recounted on
    // the pruned read). Oracle identical to q_text_bm25 — the index
    // path must not change a single score.
    q("q_text_bm25_index", {
      val words = "string_split(trim(regexp_replace(regexp_replace(lower(text), " +
        "'[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ')"
      s"""WITH base AS (
         |  SELECT doc_id, len(w) AS dl,
         |    list_filter(w, t -> t IN ('data', 'table', 'server', 'value')) AS qt
         |  FROM (SELECT doc_id, $words AS w FROM documents)
         |), stats AS (
         |  SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM base
         |), tf AS (
         |  SELECT doc_id, dl, tk, count(*) AS tf
         |  FROM (SELECT doc_id, dl, unnest(qt) AS tk FROM base)
         |  GROUP BY 1, 2, 3
         |), dfreq AS (
         |  SELECT tk, count(*) AS df FROM tf GROUP BY 1
         |)
         |SELECT doc_id,
         |  floor(sum(
         |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0::DOUBLE) * tf * 2.2
         |    / (tf + 1.2 * (0.25 + 0.75 * dl / (sum_dl * 1.0::DOUBLE / n_docs)))
         |  ) * 1e6 + 0.5) / 1e6 AS bm25
         |FROM tf JOIN dfreq USING (tk), stats
         |GROUP BY doc_id
         |ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin
    }) { (s, dir) =>
      import graft.ml.TextIndex
      val idx = java.nio.file.Files
        .createTempDirectory("graft-textindex").toString
      TextIndex.build(t(s, dir, "documents"), "doc_id", "text", idx)
      TextIndex.query(s, idx,
        terms = Seq("data", "table", "server", "value"))
    },

    // per-domain score calibration: percent rank of the raw score
    // within its source stratum — the cut a global threshold makes
    // after calibration is quantile-fair across domains.
    q("q_corpus_calibrate",
      """SELECT doc_id, source,
        |  floor(percent_rank() OVER (PARTITION BY source
        |    ORDER BY n_chars, doc_id) * 1e6 + 0.5) / 1e6 AS score_pct
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.ml.Profile.rankNormalize(t(s, dir, "documents"),
          "n_chars", "source", "doc_id")
        .select("doc_id", "source", "score_pct")
        .orderBy("doc_id")
    },

    // leakage-free split: split is a function of the GROUP (source),
    // so correlated documents can never straddle train/val/test.
    q("q_corpus_split", {
      val t1 = graft.ml.Profile.strongThreshold(0.8)
      val t2 = graft.ml.Profile.strongThreshold(0.9)
      s"""WITH s AS (
         |  SELECT doc_id, source,
         |    CASE WHEN substr(md5(source), 1, 8) < '$t1' THEN 'train'
         |         WHEN substr(md5(source), 1, 8) < '$t2' THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM documents)
         |SELECT split, count(*) AS n_docs,
         |  count(DISTINCT source) AS n_groups
         |FROM s GROUP BY 1 ORDER BY split""".stripMargin
    }) { (s, dir) =>
      graft.ml.Corpus.splitByGroup(t(s, dir, "documents"), "source",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct("source").as("n_groups"))
        .orderBy("split")
    },

    // C4 line-level cleaning (Raffel et al. 2020 §2.2): keep lines
    // ending in terminal punctuation with ≥3 words and no
    // "javascript"; page survives with ≥2 sentences left and no
    // lorem-ipsum/brace tells. The synthetic corpus has no newlines
    // or punctuation, so both engines first derive a multi-line form
    // deterministically (every 'table' becomes a sentence break).
    q("q_text_c4",
      s"""WITH d AS (
         |  SELECT doc_id, replace(text, 'table', '.' || chr(10)) AS t
         |  FROM documents
         |), k AS (
         |  SELECT doc_id, t,
         |    list_filter(string_split(t, chr(10)), l ->
         |      regexp_matches(l, '[.!?"'']\\s*$$')
         |      AND len(string_split_regex(trim(l), '\\s+')) >= 3
         |      AND NOT contains(lower(l), 'javascript')) AS kept
         |  FROM d
         |)
         |SELECT doc_id, len(kept) AS n_kept,
         |  strlen(coalesce(array_to_string(kept, chr(10)), '')) AS cleaned_chars,
         |  (len(regexp_extract_all(coalesce(array_to_string(kept, chr(10)), ''),
         |     '[.!?]')) >= 2
         |   AND NOT contains(lower(t), 'lorem ipsum')
         |   AND NOT contains(t, '{')) AS page_keep
         |FROM k ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.ml.Filters
      t(s, dir, "documents")
        .withColumn("t", expr("replace(text, 'table', concat('.', chr(10)))"))
        .withColumn("cleaned", Filters.c4CleanText(col("t"), minWords = 3))
        .select(col("doc_id"),
          size(filter(split(col("t"), "\n"),
            l => Filters.c4LineKeep(l, 3))).as("n_kept"),
          length(col("cleaned")).as("cleaned_chars"),
          Filters.c4PageKeep(col("t"), col("cleaned"),
            minSentences = 2).as("page_keep"))
        .orderBy("doc_id")
    },

    // Gopher document-quality rules (Rae et al. 2021 §A.1.1) as named
    // flags: word-count bounds, mean-word-length band, symbol ratio,
    // bullet/ellipsis line ratios, alpha-word fraction, stopword
    // presence — one codegen'd scan, no shuffle.
    q("q_text_gopher", {
      val toks = "string_split_regex(trim(text), '\\s+')"
      val toksLower = "string_split_regex(trim(lower(text)), '\\s+')"
      val nw = s"len($toks)"
      val nws = s"greatest($nw, 1) * 1.0::DOUBLE"
      s"""SELECT doc_id, $nw AS n_words,
         |  ($nw BETWEEN 50 AND 100000) AS word_count_ok,
         |  (list_aggregate(list_transform($toks, w -> strlen(w)), 'sum')
         |     / $nws BETWEEN 3.0 AND 10.0) AS mwl_ok,
         |  (len(regexp_extract_all(text, '#|\\.\\.\\.|…')) / $nws <= 0.1) AS symbol_ok,
         |  (len(list_filter($toks, w -> regexp_matches(w, '[A-Za-zÀ-ÿ]')))
         |     / $nws >= 0.8) AS alpha_ok,
         |  (len(list_filter(['the','be','to','of','and','that','have','with'],
         |     w -> list_contains($toksLower, w))) >= 2) AS stopword_ok,
         |  (($nw BETWEEN 50 AND 100000)
         |   AND (list_aggregate(list_transform($toks, w -> strlen(w)), 'sum')
         |     / $nws BETWEEN 3.0 AND 10.0)
         |   AND (len(regexp_extract_all(text, '#|\\.\\.\\.|…')) / $nws <= 0.1)
         |   AND (len(list_filter($toks, w -> regexp_matches(w, '[A-Za-zÀ-ÿ]')))
         |     / $nws >= 0.8)
         |   AND (len(list_filter(['the','be','to','of','and','that','have','with'],
         |     w -> list_contains($toksLower, w))) >= 2)) AS keep
         |FROM documents ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      import graft.ml.Filters
      t(s, dir, "documents")
        .withColumn("g", Filters.gopherFlags(col("text")))
        .select(col("doc_id"),
          col("g.n_words").as("n_words"),
          col("g.word_count_ok").as("word_count_ok"),
          col("g.mwl_ok").as("mwl_ok"),
          col("g.symbol_ok").as("symbol_ok"),
          col("g.alpha_ok").as("alpha_ok"),
          col("g.stopword_ok").as("stopword_ok"),
          // the two line-ratio rules are vacuous on single-line docs
          // and excluded from the gate's projection; `keep` includes
          // them (they hold trivially here)
          col("g.keep").as("keep"))
        .orderBy("doc_id")
    },

    // rule-attrition report: for the C4 page rule and each named
    // Gopher rule over the C4-cleaned text, how many docs fail it —
    // the observability that tells a corpus owner WHICH rule eats
    // their data before the filter goes live. ONE single-scan
    // aggregate; the alternating closing line makes the stopword rule
    // discriminate.
    q("q_text_attrition", {
      val toks = "string_split_regex(trim(c), '\\s+')"
      val toksLower = "string_split_regex(trim(lower(c)), '\\s+')"
      val nw = s"(CASE WHEN strlen(trim(c)) = 0 THEN 0 ELSE len($toks) END)"
      val nws = s"(greatest($nw, 1) * 1.0::DOUBLE)"
      val lines = "string_split(c, chr(10))"
      val nls = s"(greatest(len($lines), 1) * 1.0::DOUBLE)"
      s"""WITH d AS (
         |  SELECT doc_id, concat(replace(text, 'table', '.' || chr(10)), chr(10),
         |    CASE WHEN doc_id % 2 = 0
         |      THEN 'they have to be of and with that same mind.'
         |      ELSE 'closing line to end the page here.' END) AS t
         |  FROM documents
         |), cl AS (
         |  SELECT doc_id, t, coalesce(array_to_string(
         |    list_filter(string_split(t, chr(10)), l ->
         |      regexp_matches(l, '[.!?"'']\\s*$$')
         |      AND len(string_split_regex(trim(l), '\\s+')) >= 3
         |      AND NOT contains(lower(l), 'javascript')), chr(10)), '') AS c
         |  FROM d
         |), f AS (
         |  SELECT doc_id,
         |    (len(regexp_extract_all(c, '[.!?]')) >= 5
         |      AND NOT contains(lower(t), 'lorem ipsum')
         |      AND NOT contains(t, '{')) AS c4_page,
         |    ($nw BETWEEN 50 AND 100000) AS wc_ok,
         |    (list_aggregate(list_transform($toks, w -> strlen(w)), 'sum')
         |       / $nws BETWEEN 3.0 AND 10.0) AS mwl_ok,
         |    (len(regexp_extract_all(c, '#|\\.\\.\\.|…')) / $nws <= 0.1) AS sym_ok,
         |    (len(list_filter($lines, l -> regexp_matches(trim(l), '^[-*•‣▶]')))
         |       / $nls <= 0.9) AS bullet_ok,
         |    (len(list_filter($lines, l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$$')))
         |       / $nls <= 0.3) AS ellipsis_ok,
         |    (len(list_filter($toks, w -> regexp_matches(w, '[A-Za-zÀ-ÿ]')))
         |       / $nws >= 0.8) AS alpha_ok,
         |    (len(list_filter(['the','be','to','of','and','that','have','with'],
         |       w -> list_contains($toksLower, w))) >= 2) AS stop_ok
         |  FROM cl
         |)
         |SELECT count(*) AS n_docs,
         |  CAST(sum(CASE WHEN NOT c4_page THEN 1 ELSE 0 END) AS BIGINT) AS fail_c4_page,
         |  CAST(sum(CASE WHEN NOT wc_ok THEN 1 ELSE 0 END) AS BIGINT) AS fail_word_count,
         |  CAST(sum(CASE WHEN NOT mwl_ok THEN 1 ELSE 0 END) AS BIGINT) AS fail_mwl,
         |  CAST(sum(CASE WHEN NOT sym_ok THEN 1 ELSE 0 END) AS BIGINT) AS fail_symbol,
         |  CAST(sum(CASE WHEN NOT bullet_ok THEN 1 ELSE 0 END) AS BIGINT) AS fail_bullet,
         |  CAST(sum(CASE WHEN NOT ellipsis_ok THEN 1 ELSE 0 END) AS BIGINT) AS fail_ellipsis,
         |  CAST(sum(CASE WHEN NOT alpha_ok THEN 1 ELSE 0 END) AS BIGINT) AS fail_alpha,
         |  CAST(sum(CASE WHEN NOT stop_ok THEN 1 ELSE 0 END) AS BIGINT) AS fail_stopword,
         |  CAST(sum(CASE WHEN c4_page AND wc_ok AND mwl_ok AND sym_ok
         |    AND bullet_ok AND ellipsis_ok AND alpha_ok AND stop_ok
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors
         |FROM f""".stripMargin
    }) { (s, dir) =>
      import graft.ml.Filters
      Filters.attritionReport(
        t(s, dir, "documents").withColumn("t2", expr(
          "concat(replace(text, 'table', concat('.', chr(10))), chr(10), " +
            "CASE WHEN doc_id % 2 = 0 " +
            "THEN 'they have to be of and with that same mind.' " +
            "ELSE 'closing line to end the page here.' END)")),
        "t2")
    },

    // corpus-wide exact line dedup (C4's global step): a non-blank
    // line survives only at its first (doc, pos) occurrence anywhere.
    // Multi-line form derived as in q_text_c4.
    q("q_text_line_dedup",
      s"""WITH d AS (
         |  SELECT doc_id, replace(text, 'table', '.' || chr(10)) AS t
         |  FROM documents
         |), ls AS (
         |  SELECT doc_id, string_split(t, chr(10)) AS ll FROM d
         |), l AS (
         |  SELECT doc_id, unnest(ll) AS line, unnest(range(0, len(ll))) AS pos
         |  FROM ls
         |), k AS (
         |  SELECT doc_id, pos, line,
         |    (trim(line) = '' OR
         |     row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) = 1)
         |    AS keep
         |  FROM l
         |)
         |SELECT doc_id,
         |  count(*) FILTER (WHERE keep) AS n_kept,
         |  md5(coalesce(string_agg(line, chr(10) ORDER BY pos)
         |    FILTER (WHERE keep), '')) AS h
         |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.ml.Filters
      val docs = t(s, dir, "documents")
        .withColumn("t", expr("replace(text, 'table', concat('.', chr(10)))"))
      Filters.dedupLinesAcrossCorpus(docs, "doc_id", "t")
        .select(col("doc_id"), col("n_kept"),
          md5(col("cleaned")).as("h"))
        .orderBy("doc_id")
    },

    // epoch-cap upsampling mix (LLaMA-recipe shape): weighted domains
    // repeat for full epochs (capped at 3) plus a deterministic
    // partial-epoch prefix; one row per (doc, epoch).
    q("q_corpus_mix_epochs", {
      val tok = """CASE WHEN strlen(trim(text)) = 0 THEN 0
                  |    ELSE len(string_split_regex(trim(text), '\s+')) END"""
        .stripMargin.replace("\n", " ")
      s"""WITH d AS (
         |  SELECT doc_id, source, $tok AS tok FROM documents
         |), t AS (
         |  SELECT source, CAST(sum(tok) AS BIGINT) AS T FROM d GROUP BY source
         |), wts(source, wt) AS (
         |  VALUES ('src0', 0.30), ('src1', 0.25), ('src2', 0.20), ('src3', 0.15)
         |), p AS (
         |  SELECT t.source,
         |    least(CAST(floor(20000.0 * wt) AS BIGINT) // T, 3) AS f,
         |    CASE WHEN least(CAST(floor(20000.0 * wt) AS BIGINT) // T, 3) < 3
         |      THEN CAST(floor(20000.0 * wt) AS BIGINT)
         |           - least(CAST(floor(20000.0 * wt) AS BIGINT) // T, 3) * T
         |      ELSE 0 END AS rem
         |  FROM t JOIN wts USING (source)
         |), c AS (
         |  SELECT d.doc_id, d.source, d.tok, p.f, p.rem,
         |    sum(d.tok) OVER (PARTITION BY d.source
         |      ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS cum
         |  FROM d JOIN p USING (source)
         |), n AS (
         |  SELECT doc_id, source, tok,
         |    f + CASE WHEN cum <= rem THEN 1 ELSE 0 END AS n_epochs FROM c
         |)
         |SELECT doc_id, source, CAST(tok AS BIGINT) AS tok,
         |  CAST(unnest(range(1, n_epochs + 1)) AS BIGINT) AS epoch,
         |  CAST(n_epochs AS BIGINT) AS n_epochs
         |FROM n WHERE n_epochs >= 1 ORDER BY doc_id, epoch""".stripMargin
    }) { (s, dir) =>
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TA.tokenCount(col("text")).cast("long").as("tok"))
      graft.ml.Corpus.mixByEpochs(docs, "doc_id", "source", "tok",
          weights = Map("src0" -> 0.30, "src1" -> 0.25,
            "src2" -> 0.20, "src3" -> 0.15),
          tokenBudget = 20000L, maxEpochs = 3)
        .orderBy("doc_id", "epoch")
    },

    // model-based quality scoring: logistic regression on scan-time
    // features with distant-supervision labels, trained by 3 exact
    // full-batch GD steps — the oracle replays the identical trainer
    // as unrolled SQL (weights are data-determined in both engines).
    // smoothed target encoding of `source` against a planted binary
    // label, plain AND leave-one-out — the high-cardinality
    // categorical feature for the quality models; one category
    // aggregate + broadcast prior, LOO pure row arithmetic.
    q("q_text_target_encode",
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 3 = 0 THEN 1.0 ELSE 0.0 END AS y
        |  FROM documents
        |), s AS (
        |  SELECT source, sum(y) AS sy, count(*) AS n FROM d GROUP BY 1
        |), p AS (SELECT sum(y) / count(*) AS prior FROM d)
        |SELECT doc_id,
        |  round((sy + prior * 20) / (n + 20), 6) AS te,
        |  round((sy - y + prior * 20) / (n - 1 + 20), 6) AS te_loo
        |FROM d JOIN s USING (source) CROSS JOIN p
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.ml.QualityModel
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          when(col("doc_id") % 3 === 0, 1.0).otherwise(0.0).as("y"))
      val plain = QualityModel.targetEncode(d, "source", "y", smoothing = 20)
        .select(col("doc_id"), round(col("source_te"), 6).as("te"))
      val loo = QualityModel.targetEncode(d, "source", "y", smoothing = 20,
          loo = true)
        .select(col("doc_id"), round(col("source_te"), 6).as("te_loo"))
      plain.join(loo, "doc_id").orderBy("doc_id")
    },

    q("q_text_quality_model", TextQueries.qualityModelOracleSql(3, 0.5)) {
      (s, dir) =>
      import graft.ml.QualityModel
      val feats = QualityModel.featurize(t(s, dir, "documents"), "text")
        .persist()
      try {
        val w = QualityModel.trainOnFeatures(feats, iters = 3, lr = 0.5)
        QualityModel.scoreOnFeatures(feats, w)
          .select(col("doc_id"), round(col("score"), 6).as("score"),
            col("label"))
          .orderBy("doc_id")
      } finally feats.unpersist(blocking = false)
    },

    // learned multiclass quality-TIER classifier (keep / down-weight
    // / drop routing): QualityModel's scan-time features, 3-way tier
    // label on the same composite (distant supervision), 2 full-batch
    // softmax-GD steps — one tiny K·D aggregate per step — then a
    // codegen'd scoring scan. The oracle replays the identical
    // trainer as unrolled SQL (15 weight columns per CTE level).
    q("q_text_quality_tiers", TextQueries.softmaxTierOracleSql(2, 2.0)) {
      (s, dir) =>
      import graft.ml.{QualityModel, Softmax}
      val feats = Softmax.qualityTierFeaturize(
        t(s, dir, "documents"), "text").persist()
      try {
        val w = Softmax.train(feats, QualityModel.featureNames, "y",
          k = 3, iters = 2, lr = 2.0)
        val scored = Softmax.score(feats, QualityModel.featureNames, w)
        scored.select(
          Seq(col("doc_id"), col("y"), col("pred")) ++
            (0 until 3).map(k => round(col(s"p_$k"), 6).as(s"p_$k")): _*)
          .orderBy("doc_id")
      } finally feats.unpersist(blocking = false)
    },

    // whole-doc best-fit-decreasing packing (the no-split SFT regime):
    // per-shard contract — every doc placed exactly once, every
    // multi-doc bin within ctxLen, and BFD never uses more bins than
    // the naive id-order next-fit a sequential writer would produce
    // (recomputed in-engine). The oracle pins the per-shard doc
    // counts and asserts the contract booleans.
    q("q_corpus_pack_fit",
      """SELECT CAST(doc_id % 8 AS BIGINT) AS shard,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  true AS all_placed, true AS no_overflow, true AS within_naive
        |FROM documents GROUP BY 1 ORDER BY shard""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ctx = 200
      val nSh = 8
      val docs = t(s, dir, "documents").select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("tok"))
      val packed = Corpus.packWholeDocs(docs, "doc_id", "tok", ctx, nSh)
      val bins = packed.groupBy("shard", "bin_id")
        .agg(sum("n_tokens").as("fill"), count(lit(1)).as("nd"))
      val binStats = bins.groupBy("shard").agg(
        count(lit(1)).as("n_bins"),
        max(when(col("nd") > 1, col("fill")).otherwise(0L))
          .as("max_multi_fill"))
      val placed = packed.groupBy("shard")
        .agg(count(lit(1)).as("n_placed"),
          countDistinct(col("id")).as("n_distinct"))
      // naive sequential next-fit in id order, oversize clamped to ctx
      val naive = docs.select(
          pmod(col("doc_id"), lit(nSh)).cast("long").as("shard"),
          col("doc_id").cast("long").as("id"), col("tok"))
        .as[(Long, Long, Long)]
        .groupByKey(_._1).mapGroups { (shard, it) =>
          val ds = it.map(t => (t._2,
            math.min(math.max(t._3, 0L), ctx.toLong))).toArray.sortBy(_._1)
          var nBins = 0L
          var rem = 0L
          ds.foreach { case (_, tok) =>
            if (tok > rem) { nBins += 1; rem = ctx.toLong }
            rem -= tok
          }
          (shard, nBins)
        }.toDF("shard", "naive_bins")
      val inCounts = docs.groupBy(
          pmod(col("doc_id"), lit(nSh)).cast("long").as("shard"))
        .agg(count(lit(1)).as("n_docs"))
      inCounts.join(binStats, "shard").join(placed, "shard")
        .join(naive, "shard")
        .select(col("shard"), col("n_docs"),
          (col("n_placed") === col("n_docs") &&
            col("n_distinct") === col("n_docs")).as("all_placed"),
          (col("max_multi_fill") <= ctx).as("no_overflow"),
          (col("n_bins") <= col("naive_bins")).as("within_naive"))
        .orderBy("shard")
    },

    // Aho-Corasick multi-pattern blocklist scan: one broadcast
    // automaton, one corpus pass, per-(doc, pattern) occurrence
    // counts. The oracle replays each NON-SELF-OVERLAPPING pattern's
    // count with the replace-length identity (occurrences counted at
    // every end position coincide with it exactly for such patterns).
    q("q_text_blocklist",
      """SELECT doc_id, p AS pattern,
        |  CAST((strlen(text) - strlen(replace(text, p, ''))) / strlen(p)
        |    AS BIGINT) AS n_hits
        |FROM documents
        |CROSS JOIN (VALUES ('spark'), ('merge batch'), ('slow')) t(p)
        |WHERE strlen(text) <> strlen(replace(text, p, ''))
        |ORDER BY doc_id, pattern""".stripMargin) { (s, dir) =>
      graft.ml.Blocklist.matchCounts(t(s, dir, "documents"),
          "doc_id", "text", Seq("spark", "merge batch", "slow"))
        .orderBy("doc_id", "pattern")
    },

    // Zipf-law fit of the corpus token distribution: closed-form OLS
    // of ln(freq) on ln(rank) — slope ≈ -1 for natural text, the
    // one-number corpus-health signal. Oracle replays the identical
    // deterministic ranking (count desc, token asc) and regression.
    q("q_text_zipf",
      s"""WITH cw AS (
         |  SELECT string_split($normSql, ' ') AS w FROM documents
         |), tok AS (
         |  SELECT tk FROM (SELECT unnest(w) AS tk FROM cw)
         |  WHERE strlen(tk) > 0
         |), cnt AS (
         |  SELECT tk, count(*)::BIGINT AS c FROM tok GROUP BY tk
         |), rk AS (
         |  SELECT c, row_number() OVER (ORDER BY c DESC, tk) AS rank
         |  FROM cnt
         |), s AS (
         |  SELECT count(*)::BIGINT AS n_types, CAST(sum(c) AS BIGINT)
         |      AS n_tokens,
         |    count(*)::DOUBLE AS n, sum(ln(rank)) AS sx, sum(ln(c)) AS sy,
         |    sum(ln(rank) * ln(c)) AS sxy, sum(ln(rank) * ln(rank)) AS sxx,
         |    sum(ln(c) * ln(c)) AS syy
         |  FROM rk
         |)
         |SELECT n_types, n_tokens,
         |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
         |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
         |    6) AS intercept,
         |  round(pow(n * sxy - sx * sy, 2) /
         |    ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
         |FROM s""".stripMargin) { (s, dir) =>
      TA.zipfFit(t(s, dir, "documents"), "text")
        .select(col("n_types"), col("n_tokens"),
          round(col("slope"), 6).as("slope"),
          round(col("intercept"), 6).as("intercept"),
          round(col("r2"), 6).as("r2"))
    },

    // per-source token-distribution diversity: Shannon entropy,
    // Simpson concentration, Gini coefficient, type/token counts —
    // the corpus-mix dashboard row. Gini uses the sorted-frequency
    // closed form with a deterministic (count asc, token asc) rank.
    q("q_text_diversity",
      s"""WITH cw AS (
         |  SELECT source, string_split($normSql, ' ') AS w FROM documents
         |), tok AS (
         |  SELECT source, tk
         |  FROM (SELECT source, unnest(w) AS tk FROM cw)
         |  WHERE strlen(tk) > 0
         |), cnt AS (
         |  SELECT source, tk, count(*)::BIGINT AS c FROM tok GROUP BY 1, 2
         |), rk AS (
         |  SELECT source, tk, c,
         |    row_number() OVER (PARTITION BY source ORDER BY c ASC, tk)
         |      AS i,
         |    CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS nt
         |  FROM cnt
         |)
         |SELECT source AS stratum, max(nt) AS n_tokens,
         |  count(*)::BIGINT AS n_types,
         |  round(-sum((c / nt::DOUBLE) * ln(c / nt::DOUBLE)), 6) AS shannon,
         |  round(sum(pow(c / nt::DOUBLE, 2)), 6) AS simpson,
         |  round(2.0 * CAST(sum(i * c) AS DOUBLE) /
         |      (count(*)::DOUBLE * max(nt)::DOUBLE) -
         |    (count(*) + 1.0) / count(*), 6) AS gini
         |FROM rk GROUP BY source ORDER BY stratum""".stripMargin) {
      (s, dir) =>
        TA.tokenDiversity(t(s, dir, "documents"), "source", "text")
          .select(col("stratum"), col("n_tokens"), col("n_types"),
            round(col("shannon"), 6).as("shannon"),
            round(col("simpson"), 6).as("simpson"),
            round(col("gini"), 6).as("gini"))
          .orderBy("stratum")
    },

    // per-source boilerplate-line removal: a non-blank line in ≥ 3
    // distinct docs of the same source is dropped EVERYWHERE (the
    // complement of first-occurrence line dedup). Newlines are
    // synthesized the same way as q_text_line_dedup.
    q("q_text_boilerplate",
      """WITH d AS (
        |  SELECT doc_id, source, replace(text, 'table', '.' || chr(10)) AS t
        |  FROM documents
        |), ls AS (
        |  SELECT doc_id, source, string_split(t, chr(10)) AS ll FROM d
        |), l AS (
        |  SELECT doc_id, source, unnest(ll) AS line,
        |    unnest(range(0, len(ll))) AS pos
        |  FROM ls
        |), b AS (
        |  SELECT source, line FROM l WHERE trim(line) <> ''
        |  GROUP BY source, line HAVING count(DISTINCT doc_id) >= 3
        |), k AS (
        |  SELECT l.doc_id, l.pos, l.line, b.line IS NULL AS keep
        |  FROM l LEFT JOIN b ON l.source = b.source AND l.line = b.line
        |)
        |SELECT doc_id,
        |  count(*) FILTER (WHERE keep) AS n_kept,
        |  count(*) FILTER (WHERE NOT keep) AS n_dropped,
        |  md5(coalesce(string_agg(line, chr(10) ORDER BY pos)
        |    FILTER (WHERE keep), '')) AS h
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.ml.Filters
      val docs = t(s, dir, "documents")
        .withColumn("t", expr("replace(text, 'table', concat('.', chr(10)))"))
      Filters.removeBoilerplate(docs, "doc_id", "t", "source", minDocs = 3)
        .select(col("doc_id"), col("n_kept"), col("n_dropped"),
          md5(col("cleaned")).as("h"))
        .orderBy("doc_id")
    },

    // PPMI skip-gram co-occurrence (window 2, top-3 contexts/word,
    // min pair count 3): the count-based association matrix behind
    // distributional embeddings. Ranking uses the rational ratio
    // c_wc/(c_w·c_c) — monotone in ppmi, engine-exact — not the log.
    q("q_text_ppmi",
      s"""WITH cw AS (
         |  SELECT doc_id, string_split($normSql, ' ') AS w FROM documents
         |), toks AS (
         |  SELECT doc_id, w[u.i + 1] AS tk, u.i AS pos
         |  FROM cw, unnest(range(0, len(w))) AS u(i)
         |  WHERE w[u.i + 1] <> ''
         |), op AS (
         |  SELECT a.tk AS w, b.tk AS c
         |  FROM toks a JOIN toks b ON a.doc_id = b.doc_id
         |    AND b.pos > a.pos AND b.pos <= a.pos + 2
         |), pairs_all AS (
         |  SELECT w, c, count(*)::BIGINT AS n_pair FROM (
         |    SELECT w, c FROM op UNION ALL SELECT c, w FROM op
         |  ) GROUP BY w, c
         |), pairs AS (
         |  SELECT * FROM pairs_all WHERE n_pair >= 3
         |), wt AS (
         |  SELECT w, sum(n_pair)::BIGINT AS cw FROM pairs_all GROUP BY w
         |), n AS (SELECT sum(cw)::BIGINT AS nn FROM wt
         |), sc AS (
         |  SELECT p.w, p.c, p.n_pair,
         |    p.n_pair::DOUBLE / (wt.cw::DOUBLE * ct.cw::DOUBLE) AS ratio,
         |    greatest(0.0, ln(n.nn::DOUBLE *
         |      (p.n_pair::DOUBLE / (wt.cw::DOUBLE * ct.cw::DOUBLE)))) AS ppmi
         |  FROM pairs p JOIN wt ON p.w = wt.w JOIN wt ct ON p.c = ct.w, n
         |), top AS (
         |  SELECT w AS word, c AS context, n_pair, ppmi FROM sc
         |  QUALIFY row_number() OVER (PARTITION BY w
         |    ORDER BY ratio DESC, c) <= 3
         |)
         |SELECT word, context, n_pair, round(ppmi, 6) AS ppmi
         |FROM top WHERE ppmi > 0 ORDER BY word, context""".stripMargin) {
      (s, dir) =>
        TA.ppmiCooccurrence(t(s, dir, "documents"), "doc_id", "text",
            window = 2, topK = 3, minPair = 3L)
          .select(col("word"), col("context"), col("n_pair"),
            round(col("ppmi"), 6).as("ppmi"))
          .orderBy("word", "context")
    },

    // per-language keyness: top-5 enriched words by the Monroe et al.
    // informative-Dirichlet log-odds z-statistic, each language vs
    // the rest of the corpus with the corpus unigram LM (scaled to 50
    // pseudo-counts) as prior.
    q("q_text_keyness",
      s"""WITH tk AS (
         |  SELECT lang AS stratum, u.tk AS w FROM (
         |    SELECT lang, string_split($normSql, ' ') AS wl FROM documents
         |  ), unnest(wl) AS u(tk) WHERE u.tk <> ''
         |), c AS (
         |  SELECT stratum, w, count(*)::BIGINT AS yws FROM tk GROUP BY 1, 2
         |), wt AS (SELECT w, sum(yws)::BIGINT AS yw FROM c GROUP BY 1
         |), st AS (SELECT stratum, sum(yws)::BIGINT AS ns FROM c GROUP BY 1
         |), n AS (SELECT sum(yw)::BIGINT AS nn FROM wt
         |), z AS (
         |  SELECT c.stratum, c.w, c.yws, wt.yw - c.yws AS n_rest,
         |    (ln((c.yws + (50.0 * wt.yw::DOUBLE / n.nn))
         |        / (st.ns + 50.0 - c.yws - (50.0 * wt.yw::DOUBLE / n.nn)))
         |     - ln(((wt.yw - c.yws)::DOUBLE + (50.0 * wt.yw::DOUBLE / n.nn))
         |        / ((n.nn - st.ns)::DOUBLE + 50.0 - (wt.yw - c.yws)::DOUBLE
         |           - (50.0 * wt.yw::DOUBLE / n.nn))))
         |    / sqrt(1.0 / (c.yws + (50.0 * wt.yw::DOUBLE / n.nn))
         |         + 1.0 / ((wt.yw - c.yws)::DOUBLE
         |                  + (50.0 * wt.yw::DOUBLE / n.nn))) AS z
         |  FROM c JOIN wt ON c.w = wt.w JOIN st ON c.stratum = st.stratum, n
         |), top AS (
         |  SELECT stratum, w AS word, yws AS n_stratum, n_rest, z FROM z
         |  QUALIFY row_number() OVER (PARTITION BY stratum
         |    ORDER BY z DESC, w) <= 5
         |)
         |SELECT stratum, word, n_stratum, n_rest, round(z, 6) AS z
         |FROM top WHERE z > 0 ORDER BY stratum, word""".stripMargin) {
      (s, dir) =>
        TA.keyness(t(s, dir, "documents"), "lang", "text",
            alpha0 = 50.0, topK = 5)
          .select(col("stratum"), col("word"), col("n_stratum"),
            col("n_rest"), round(col("z"), 6).as("z"))
          .orderBy("stratum", "word")
    },

    // Good-Turing smoothed unigram counts (LGT regression over the
    // count-of-counts, closed form), renormalized to reserve the
    // N1/N unseen mass. Reported for words with count >= 5; the
    // regression itself runs over the full vocabulary.
    q("q_text_good_turing",
      s"""WITH tks AS (
         |  SELECT u.tk AS w FROM (
         |    SELECT string_split($normSql, ' ') AS wl FROM documents
         |  ), unnest(wl) AS u(tk) WHERE u.tk <> ''
         |), c AS (
         |  SELECT w, count(*)::BIGINT AS c FROM tks GROUP BY 1
         |), nr AS (
         |  SELECT c, count(*)::BIGINT AS nr FROM c GROUP BY 1
         |), fit AS (
         |  SELECT count(*)::DOUBLE AS k,
         |    sum(ln(c::DOUBLE)) AS sx, sum(ln(nr::DOUBLE)) AS sy,
         |    sum(ln(c::DOUBLE) * ln(nr::DOUBLE)) AS sxy,
         |    sum(ln(c::DOUBLE) * ln(c::DOUBLE)) AS sxx,
         |    sum(c * nr)::BIGINT AS n_tokens,
         |    sum(CASE WHEN c = 1 THEN nr ELSE 0 END)::BIGINT AS n1
         |  FROM nr
         |), b AS (
         |  SELECT (k * sxy - sx * sy) / (k * sxx - sx * sx) AS b,
         |    n_tokens, n1
         |  FROM fit
         |), sc AS (
         |  SELECT w, c,
         |    (c + 1)::DOUBLE * pow((c + 1)::DOUBLE / c::DOUBLE, b.b) AS c_star,
         |    n_tokens, n1
         |  FROM c, b
         |), z AS (SELECT sum(c_star) AS z FROM sc)
         |SELECT w AS word, c, round(c_star, 6) AS c_star,
         |  round((1.0 - n1::DOUBLE / n_tokens) * c_star / z.z, 8) AS p_gt
         |FROM sc, z WHERE c >= 5 ORDER BY word""".stripMargin) { (s, dir) =>
      TA.goodTuringUnigram(t(s, dir, "documents"), "text")
        .filter(col("c") >= 5)
        .select(col("word"), col("c"), round(col("c_star"), 6).as("c_star"),
          round(col("p_gt"), 8).as("p_gt"))
        .orderBy("word")
    },

    // Gries' deviation-of-proportions dispersion across the 20
    // sources: 0 = spread like the corpus, ->1 = clumped in one
    // source. The absent-(word, source) grid is exercised by
    // construction (every word misses some source).
    q("q_text_dispersion",
      s"""WITH tk AS (
         |  SELECT source AS stratum, u.tk AS w FROM (
         |    SELECT source, string_split($normSql, ' ') AS wl FROM documents
         |  ), unnest(wl) AS u(tk) WHERE u.tk <> ''
         |), c AS (
         |  SELECT stratum, w, count(*)::BIGINT AS yws FROM tk GROUP BY 1, 2
         |), words AS (
         |  SELECT w, sum(yws)::BIGINT AS yw FROM c GROUP BY 1
         |  HAVING sum(yws) >= 10
         |), st AS (SELECT stratum, sum(yws)::BIGINT AS ns FROM c GROUP BY 1
         |), n AS (SELECT sum(ns)::BIGINT AS nn FROM st
         |), ts AS (SELECT stratum, ns::DOUBLE / nn AS ts FROM st, n
         |), j AS (
         |  SELECT g.w, g.yw,
         |    abs(coalesce(c.yws, 0)::DOUBLE / g.yw - g.ts) AS term
         |  FROM (SELECT w, yw, stratum, ts FROM words, ts) g
         |  LEFT JOIN c ON c.stratum = g.stratum AND c.w = g.w
         |)
         |SELECT w AS word, yw AS c, round(sum(term) / 2.0, 6) AS dp
         |FROM j GROUP BY 1, 2 ORDER BY word""".stripMargin) { (s, dir) =>
      TA.dispersion(t(s, dir, "documents"), "source", "text", minCount = 10L)
        .select(col("word"), col("c"), round(col("dp"), 6).as("dp"))
        .orderBy("word")
    },

    // per-document character entropy over normalized text via the
    // H = ln n − (Σ c·ln c)/n identity — single scan, no per-doc
    // normalization pass.
    q("q_text_char_entropy",
      s"""WITH nm AS (
         |  SELECT doc_id, $normSql AS norm FROM documents
         |), ch AS (
         |  SELECT doc_id, substr(norm, u.i + 1, 1) AS c
         |  FROM nm, unnest(range(0, strlen(norm))) AS u(i)
         |), cnt AS (
         |  SELECT doc_id, c, count(*)::BIGINT AS k FROM ch GROUP BY 1, 2
         |)
         |SELECT doc_id, sum(k)::BIGINT AS n_chars,
         |  count(*)::BIGINT AS n_distinct,
         |  round(ln(sum(k)::DOUBLE) - sum(k * ln(k::DOUBLE)) / sum(k), 6)
         |    AS entropy
         |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin) {
      (s, dir) =>
        TA.charEntropy(t(s, dir, "documents"), "doc_id", "text")
          .select(col("id").as("doc_id"), col("n_chars"), col("n_distinct"),
            round(col("entropy"), 6).as("entropy"))
          .orderBy("doc_id")
    },

    // pairwise source-vocabulary Jaccard overlap (all 190 source
    // pairs, zero-overlap pairs included): the mixing-dashboard
    // "are these sources actually different" matrix.
    q("q_text_vocab_overlap",
      s"""WITH tk AS (
         |  SELECT source AS s, u.tk AS w FROM (
         |    SELECT source, string_split($normSql, ' ') AS wl FROM documents
         |  ), unnest(wl) AS u(tk) WHERE u.tk <> ''
         |), vocab AS (
         |  SELECT DISTINCT s, w FROM tk
         |), sizes AS (SELECT s, count(*)::BIGINT AS v FROM vocab GROUP BY 1
         |), common AS (
         |  SELECT a.s AS sa, b.s AS sb, count(*)::BIGINT AS n_common
         |  FROM vocab a JOIN vocab b ON a.w = b.w AND a.s < b.s
         |  GROUP BY 1, 2
         |)
         |SELECT x.s AS stratum_a, y.s AS stratum_b, x.v AS v_a, y.v AS v_b,
         |  coalesce(n_common, 0) AS n_common,
         |  round(coalesce(n_common, 0)::DOUBLE
         |    / (x.v + y.v - coalesce(n_common, 0)), 6) AS jaccard
         |FROM sizes x JOIN sizes y ON x.s < y.s
         |LEFT JOIN common ON common.sa = x.s AND common.sb = y.s
         |ORDER BY stratum_a, stratum_b""".stripMargin) { (s, dir) =>
      TA.vocabularyOverlap(t(s, dir, "documents"), "source", "text")
        .select(col("stratum_a"), col("stratum_b"), col("v_a"), col("v_b"),
          col("n_common"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("stratum_a", "stratum_b")
    }
  )

  /** DuckDB SQL replaying [[graft.ml.QualityModel]]'s fixed-iteration
    * full-batch GD exactly: features + heuristic label in one CTE,
    * then one (gradient, weights) CTE pair per iteration, then the
    * scoring projection. Chained CTEs are MATERIALIZED (inlining
    * doubles work per stage).
    */
  /** DuckDB SQL replaying [[graft.ml.Softmax]]'s K=3 quality-TIER
    * classifier exactly: [[graft.ml.QualityModel]]'s scan-time
    * features, a 3-way tier label thresholded on the same composite
    * quality score (distant supervision, the multiclass analogue of
    * the binary model's y), zero init, `iters` full-batch softmax-GD
    * steps unrolled as CTE levels (15 weight columns per level), then
    * max-subtracted softmax scoring and lowest-argmax prediction.
    */
  def softmaxTierOracleSql(iters: Int, lr: Double): String = {
    val toks = "string_split_regex(trim(text), '\\s+')"
    val nw = s"len($toks)"
    val stopList =
      "['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','at','by','be','this']"
    val composite =
      s"""(CASE WHEN $nw BETWEEN 10 AND 100000 THEN 1.0::DOUBLE ELSE 0.3 END * 0.3
         |       + CASE WHEN list_aggregate(list_transform($toks, w -> strlen(w)), 'sum')
         |           * 1.0::DOUBLE / $nw BETWEEN 2.0 AND 12.0 THEN 1.0::DOUBLE ELSE 0.4 END * 0.2
         |       + CASE WHEN len(list_filter($toks, w -> list_contains($stopList, lower(w))))
         |           * 1.0::DOUBLE / $nw > 0.05 THEN 1.0::DOUBLE ELSE 0.6 END * 0.3
         |       + CASE WHEN len(regexp_extract_all(text, '[!-/:-@\\[-`{-~]')) * 1.0::DOUBLE
         |           / strlen(text) < 0.2 THEN 1.0::DOUBLE ELSE 0.5 END * 0.2)""".stripMargin
    val feat =
      s"""feat AS MATERIALIZED (
         |  SELECT doc_id,
         |    1.0::DOUBLE AS f0,
         |    $nw / 100.0 AS f1,
         |    list_aggregate(list_transform($toks, w -> strlen(w)), 'sum')
         |      * 1.0::DOUBLE / $nw AS f2,
         |    len(list_filter($toks, w -> list_contains($stopList, lower(w))))
         |      * 1.0::DOUBLE / $nw AS f3,
         |    len(regexp_extract_all(text, '[!-/:-@\\[-`{-~]')) * 1.0::DOUBLE
         |      / strlen(text) AS f4,
         |    CASE WHEN $composite >= 0.9 THEN 2
         |         WHEN $composite >= 0.6 THEN 1 ELSE 0 END AS y
         |  FROM documents
         |)""".stripMargin
    val ks = 0 until 3
    val fs = (0 to 4).map(d => s"f$d")
    def zk(w: String, k: Int) =
      fs.zipWithIndex.map { case (f, d) => s"$w.w_${k}_$d * $f" }
        .mkString(" + ")
    val it0 = s"it0 AS (SELECT ${ks.flatMap(k =>
      fs.indices.map(d => s"0.0::DOUBLE AS w_${k}_$d")).mkString(", ")})"
    def pk(w: String, k: Int) =
      s"(exp((${zk(w, k)}) - zm) / (${ks.map(j =>
        s"exp((${zk(w, j)}) - zm)").mkString(" + ")}))"
    val steps = (1 to iters).map { i =>
      val g =
        s"""g$i AS MATERIALIZED (
           |  SELECT ${ks.flatMap(k => fs.zipWithIndex.map { case (f, d) =>
                s"sum((${pk("w", k)} - CASE WHEN y = $k THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END) * $f) / count(*) AS d_${k}_$d"
              }).mkString(", ")}
           |  FROM (SELECT feat.*, greatest(${ks.map(k => s"(${zk("w", k)})")
                .mkString(", ")}) AS zm FROM feat, it${i - 1} w), it${i - 1} w
           |)""".stripMargin
      val it =
        s"""it$i AS (
           |  SELECT ${ks.flatMap(k => fs.indices.map(d =>
                s"w.w_${k}_$d - $lr * g.d_${k}_$d AS w_${k}_$d"))
                .mkString(", ")}
           |  FROM it${i - 1} w, g$i g
           |)""".stripMargin
      s"$g, $it"
    }
    val kMax = ks.last
    val predCase = (ks.init.map { k =>
      val later = (k + 1 to kMax).map(j => s"p_$k >= p_$j").mkString(" AND ")
      s"WHEN $later THEN $k"
    } :+ s"ELSE $kMax").mkString(" ")
    s"""WITH $feat, $it0, ${steps.mkString(", ")}
       |SELECT doc_id, y,
       |  CAST(CASE $predCase END AS INT) AS pred,
       |  ${ks.map(k => s"round(p_$k, 6) AS p_$k").mkString(", ")}
       |FROM (
       |  SELECT doc_id, y, ${ks.map(k => s"${pk("w", k)} AS p_$k")
            .mkString(", ")}
       |  FROM (SELECT feat.*, greatest(${ks.map(k => s"(${zk("w", k)})")
            .mkString(", ")}) AS zm FROM feat, it$iters w), it$iters w
       |)
       |ORDER BY doc_id""".stripMargin
  }

  /** DuckDB replica of `Calibrate.plattScale`: the (score, label)
    * construction is the q_text_reliability `sc` CTE plus doc_id; the
    * GD steps unroll like [[qualityModelOracleSql]] with the same
    * left-associated arithmetic the Spark trainer compiles.
    */
  def plattOracleSql(iters: Int, lr: Double): String = {
    val sc =
      """sc AS MATERIALIZED (
        |  SELECT doc_id,
        |   CASE WHEN lang = 'en' THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END AS y,
        |   (CASE WHEN len(string_split_regex(trim(text), '\s+')) BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.3 END * 0.3
        |    + CASE WHEN list_aggregate(list_transform(string_split_regex(trim(text), '\s+'), w -> strlen(w)), 'sum') * 1.0::DOUBLE
        |        / len(string_split_regex(trim(text), '\s+')) BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.4 END * 0.2
        |    + CASE WHEN len(list_filter(string_split_regex(lower(text), '\s+'),
        |        w -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','at','by','be','this'], w)))
        |        * 1.0::DOUBLE / len(string_split_regex(trim(text), '\s+')) > 0.05 THEN 1.0 ELSE 0.6 END * 0.3
        |    + CASE WHEN len(regexp_extract_all(text, '[!-/:-@\[-`{-~]')) * 1.0::DOUBLE / strlen(text) < 0.2 THEN 1.0 ELSE 0.5 END * 0.2
        |   )::DOUBLE AS s
        |  FROM documents
        |)""".stripMargin
    val sig = "1.0::DOUBLE / (1.0::DOUBLE + exp(-(w.a * s + w.b)))"
    val it0 = "it0 AS (SELECT 0.0::DOUBLE AS a, 0.0::DOUBLE AS b)"
    val steps = (1 to iters).map { i =>
      s"""g$i AS MATERIALIZED (
         |  SELECT sum(($sig - y) * s) / count(*) AS da,
         |    sum($sig - y) / count(*) AS db
         |  FROM sc, it${i - 1} w
         |), it$i AS (
         |  SELECT w.a - $lr * g.da AS a, w.b - $lr * g.db AS b
         |  FROM it${i - 1} w, g$i g
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH $sc, $it0, $steps
       |SELECT doc_id, round($sig, 6) AS calibrated
       |FROM sc, it$iters w ORDER BY doc_id""".stripMargin
  }

  def qualityModelOracleSql(iters: Int, lr: Double): String = {
    val toks = "string_split_regex(trim(text), '\\s+')"
    val nw = s"len($toks)"
    val stopList =
      "['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','at','by','be','this']"
    val feat =
      s"""feat AS MATERIALIZED (
         |  SELECT doc_id,
         |    1.0::DOUBLE AS f0,
         |    $nw / 100.0 AS f1,
         |    list_aggregate(list_transform($toks, w -> strlen(w)), 'sum')
         |      * 1.0::DOUBLE / $nw AS f2,
         |    len(list_filter($toks, w -> list_contains($stopList, lower(w))))
         |      * 1.0::DOUBLE / $nw AS f3,
         |    len(regexp_extract_all(text, '[!-/:-@\\[-`{-~]')) * 1.0::DOUBLE
         |      / strlen(text) AS f4,
         |    CASE WHEN
         |      (CASE WHEN $nw BETWEEN 10 AND 100000 THEN 1.0::DOUBLE ELSE 0.3 END * 0.3
         |       + CASE WHEN list_aggregate(list_transform($toks, w -> strlen(w)), 'sum')
         |           * 1.0::DOUBLE / $nw BETWEEN 2.0 AND 12.0 THEN 1.0::DOUBLE ELSE 0.4 END * 0.2
         |       + CASE WHEN len(list_filter($toks, w -> list_contains($stopList, lower(w))))
         |           * 1.0::DOUBLE / $nw > 0.05 THEN 1.0::DOUBLE ELSE 0.6 END * 0.3
         |       + CASE WHEN len(regexp_extract_all(text, '[!-/:-@\\[-`{-~]')) * 1.0::DOUBLE
         |           / strlen(text) < 0.2 THEN 1.0::DOUBLE ELSE 0.5 END * 0.2) >= 0.9
         |    THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END AS y
         |  FROM documents
         |)""".stripMargin
    val fs = (0 to 4).map(k => s"f$k")
    def z(w: String) = fs.map(f => s"$w.w_$f * $f").mkString(" + ")
    val it0 = s"it0 AS (SELECT ${fs.map(f => s"0.0::DOUBLE AS w_$f").mkString(", ")})"
    val steps = (1 to iters).map { i =>
      val g =
        s"""g$i AS MATERIALIZED (
           |  SELECT ${fs.map(f =>
                s"sum((1.0::DOUBLE / (1.0::DOUBLE + exp(-(${z("w")}))) - y) * $f) / count(*) AS d_$f")
                .mkString(", ")}
           |  FROM feat, it${i - 1} w
           |)""".stripMargin
      val it =
        s"""it$i AS (
           |  SELECT ${fs.map(f => s"w.w_$f - $lr * g.d_$f AS w_$f").mkString(", ")}
           |  FROM it${i - 1} w, g$i g
           |)""".stripMargin
      s"$g, $it"
    }
    s"""WITH $feat, $it0, ${steps.mkString(", ")}
       |SELECT doc_id,
       |  round(1.0::DOUBLE / (1.0::DOUBLE + exp(-(${z("w")}))), 6) AS score,
       |  y AS label
       |FROM feat, it$iters w ORDER BY doc_id""".stripMargin
  }

  /** DuckDB SQL computing `nMerges` sequential BPE merges over the
    * documents table — the q_text_bpe oracle. Per-word state is the
    * symbol sequence joined on the 0x1f unit separator with leading/
    * trailing separators; each stage counts adjacent pairs, takes the
    * (count desc, left, right) argmax, and re-tokenizes by a greedy
    * left-to-right list_reduce (append the symbol, or fuse it into the
    * accumulator's tail exactly when the tail is the merge's left —
    * the fused tail can never re-fuse, which is greedy semantics,
    * self-pair runs included).
    */
  def bpeOracleSql(nMerges: Int): String =
    bpeRecursiveSql(nMerges) +
      """
        |SELECT DISTINCT iter - 1 AS rank, ml AS left, mr AS right
        |FROM st WHERE iter >= 1 ORDER BY rank""".stripMargin

  /** DuckDB SQL for the q_text_bpe_encode oracle: run the same
    * `nMerges` training iterations, then read each word's token count
    * off the FINAL state level (the fully-merged symbol sequence —
    * exactly what ranked-greedy `Bpe.encodeWord` produces for corpus
    * words) and sum per document. Left join: a whitespace-only
    * document has zero tokens, not a missing row.
    */
  def bpeEncodeOracleSql(nMerges: Int): String =
    bpeRecursiveSql(nMerges) + """,
       |wtok AS (
       |  SELECT word, len(list_filter(string_split(state, chr(31)),
       |    x -> x <> '')) AS ntok
       |  FROM st WHERE iter = (SELECT max(iter) FROM st)
       |),
       |docw AS (
       |  SELECT doc_id, w AS word FROM (
       |    SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS w
       |    FROM documents
       |  ) WHERE w <> ''
       |)
       |SELECT base.doc_id,
       |  coalesce(sum(wt.ntok), 0)::BIGINT AS n_bpe_tokens
       |FROM (SELECT doc_id FROM documents) base
       |LEFT JOIN docw d USING (doc_id)
       |LEFT JOIN wtok wt ON d.word = wt.word
       |GROUP BY 1 ORDER BY base.doc_id""".stripMargin

  /** The training loop as ONE recursive CTE: each level is the full
    * per-word state table after `iter` merges, the level's argmax pair
    * comes from a 1-row join subquery over the working table (legal
    * where a plain aggregate in the recursive term is not), and the
    * greedy list_reduce scan applies it. Depth-safe at any merge count
    * — the unrolled-CTE form hit DuckDB's max_expression_depth (the
    * binder counts the stage dependency chain) beyond ~100 stages.
    * Recursion stops early when no pairs remain (every word fully
    * merged), matching the engine's exhaustion behavior; each level's
    * rows carry the (ml, mr) pair that produced them.
    */
  private def bpeRecursiveSql(nMerges: Int): String =
    s"""WITH RECURSIVE w0 AS (
       |  SELECT w AS word, count(*)::BIGINT AS cnt FROM (
       |    SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
       |    FROM documents
       |  ) WHERE w <> '' GROUP BY 1
       |),
       |st(iter, word, cnt, state, ml, mr) AS (
       |  SELECT 0, word, cnt, chr(31) || array_to_string(
       |      list_transform(generate_series(1, length(word)), i -> word[i:i]),
       |      chr(31)) || chr(31) || '</w>' || chr(31),
       |    NULL::VARCHAR, NULL::VARCHAR
       |  FROM w0
       |  UNION ALL
       |  SELECT iter + 1, word, cnt,
       |    list_reduce(
       |      list_prepend(chr(31),
       |        list_filter(string_split(state, chr(31)), x -> x <> '')),
       |      (acc, x) -> CASE
       |        WHEN x = best.r AND ends_with(acc, chr(31)||best.l||chr(31))
       |        THEN substr(acc, 1, length(acc)-1) || best.r || chr(31)
       |        ELSE acc || x || chr(31) END),
       |    best.l, best.r
       |  FROM st, (
       |    SELECT p[1] AS l, p[2] AS r
       |    FROM (SELECT cnt AS c2, list_filter(string_split(state, chr(31)),
       |            x -> x <> '') AS ss FROM st),
       |      unnest(list_zip(ss[1:-2], ss[2:-1])) AS t(p)
       |    GROUP BY 1, 2 ORDER BY sum(c2) DESC, l ASC, r ASC LIMIT 1
       |  ) best
       |  WHERE iter < $nMerges
       |)""".stripMargin
}
