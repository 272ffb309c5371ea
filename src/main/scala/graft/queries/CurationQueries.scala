package graft.queries

import org.apache.spark.sql.functions._
import graft.ml.{Calibrate, GenEval, Keywords, Preference}
import graft.events.Events

/** Round-8 curation/eval superset gates: keyword extraction (RAKE,
  * corpus TextRank), chrF generation scoring, Holt–Winters triple
  * smoothing, DPO preference-pair construction, and split-conformal
  * prediction intervals. Every gate has a full DuckDB value-hash
  * oracle (the recursive/iterative ones replay the exact float
  * expression order; multi-referenced CTEs are AS MATERIALIZED per
  * the round-8 CTE-inlining postmortem).
  */
object CurationQueries extends QueryGroup {

  private val normSql =
    """trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
      |'\s+', ' ', 'g'))""".stripMargin.replace("\n", " ")

  private val stopSql = graft.ml.TextAnalysis.stopwords
    .map(w => s"'$w'").mkString(", ")

  /** Shared retrieval setup for the ranking-metric gates (the
    * q_eval_ndcg construction): probes vec_id < 20, top-20 cosine
    * ranking, binary label-match relevance, rank by (rounded score
    * desc, cid) so both engines break ties identically.
    */
  private def rankedRetrieval(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val e = t(s, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val labels = t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("score").desc, col("cid"))
    graft.ml.Similarity.bruteForceTopK(e.filter(col("id") < 20), e, 20)
      .join(labels.select(col("vec_id").as("qid"),
        col("label").as("ql")), "qid")
      .join(labels.select(col("vec_id").as("cid"),
        col("label").as("cl")), "cid")
      .select(col("qid"), col("cid"), round(col("cos"), 6).as("score"),
        when(col("ql") === col("cl"), 1).otherwise(0).as("rel"))
      .withColumn("r", row_number().over(w))
  }

  val all: Seq[QueryDef] = Seq(

    // RAKE candidate phrases + scores per document (stopword-
    // delimited islands; deg/freq word scores; phrase = Σ wscore).
    q("q_text_rake",
      s"""WITH tk AS (
         |  SELECT doc_id, list_filter(string_split($normSql, ' '),
         |    t -> t <> '') AS ws FROM documents
         |), w AS (
         |  SELECT doc_id, ws[u.i] AS word, u.i AS pos,
         |    ws[u.i] IN ($stopSql) AS stop
         |  FROM tk, unnest(range(1, len(ws) + 1)) AS u(i)
         |), isl AS (
         |  SELECT doc_id, word, pos,
         |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
         |      AS grp
         |  FROM w WHERE NOT stop
         |), ph AS (
         |  SELECT doc_id, grp, list(word ORDER BY pos) AS pws,
         |    count(*) AS len,
         |    array_to_string(list(word ORDER BY pos), ' ') AS phrase
         |  FROM isl GROUP BY 1, 2
         |), phf AS (
         |  SELECT * FROM ph WHERE len <= 4
         |), phw AS (
         |  SELECT doc_id, phrase, len, u.w AS word
         |  FROM phf, unnest(phf.pws) AS u(w)
         |), wstat AS (
         |  SELECT doc_id, word, count(*) AS freq, sum(len) AS deg
         |  FROM phw GROUP BY 1, 2
         |), scored AS (
         |  SELECT p.doc_id, p.phrase, p.len,
         |    s.deg * 1.0::DOUBLE / s.freq AS wscore
         |  FROM phw p
         |  JOIN wstat s ON s.doc_id = p.doc_id AND s.word = p.word
         |)
         |SELECT doc_id AS id, phrase, CAST(min(len) AS BIGINT) AS n_words,
         |  round(sum(wscore) / (count(*) * 1.0 / min(len)), 6) AS score
         |FROM scored GROUP BY 1, 2 ORDER BY id, phrase""".stripMargin) {
      (s, dir) =>
      Keywords.rake(t(s, dir, "documents"), "doc_id", "text",
          maxPhraseLen = 4)
        .withColumn("score", round(col("score"), 6))
        .orderBy("id", "phrase")
    },

    // corpus-level TextRank: 10 PageRank iterations over the window-2
    // co-occurrence word graph. The oracle unrolls the iteration with
    // MATERIALIZED CTEs (each pr_k is referenced by pr_{k+1}'s join —
    // default inlining would expand the chain multiplicatively).
    q("q_text_textrank", {
      val steps = (1 to 10).map { k =>
        s"""pr$k AS MATERIALIZED (
           |  SELECT v.word, (1 - 0.85) / nv.n + 0.85 * coalesce(m.mass,
           |    0.0) AS score
           |  FROM vocab v CROSS JOIN nv
           |  LEFT JOIN (
           |    SELECT t.v AS word, sum(t.t * p.score) AS mass
           |    FROM trans t JOIN pr${k - 1} p ON t.u = p.word GROUP BY 1
           |  ) m ON m.word = v.word
           |)""".stripMargin
      }
      s"""WITH tk AS MATERIALIZED (
         |  SELECT doc_id, list_filter(string_split($normSql, ' '),
         |    t -> t <> '' AND t NOT IN ($stopSql)) AS ws FROM documents
         |), w AS MATERIALIZED (
         |  SELECT doc_id, ws[u.i] AS word, u.i AS pos
         |  FROM tk, unnest(range(1, len(ws) + 1)) AS u(i)
         |), co AS (
         |  SELECT a.word AS u, b.word AS v
         |  FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |  WHERE a.word <> b.word
         |), und AS MATERIALIZED (
         |  SELECT u, v, count(*) * 1.0::DOUBLE AS w FROM (
         |    SELECT u, v FROM co UNION ALL SELECT v, u FROM co
         |  ) GROUP BY 1, 2
         |), vocab AS MATERIALIZED (SELECT DISTINCT word FROM w),
         |nv AS MATERIALIZED (SELECT count(*) * 1.0::DOUBLE AS n FROM vocab),
         |trans AS MATERIALIZED (
         |  SELECT und.u, und.v, und.w / d.wd AS t
         |  FROM und JOIN (SELECT u, sum(w) AS wd FROM und GROUP BY 1) d
         |    ON und.u = d.u
         |), pr0 AS MATERIALIZED (
         |  SELECT word, 1.0 / nv.n AS score FROM vocab CROSS JOIN nv
         |), ${steps.mkString(", ")}
         |SELECT word, round(score, 6) AS score FROM pr10
         |ORDER BY word""".stripMargin
    }) { (s, dir) =>
      Keywords.textRank(t(s, dir, "documents"), "doc_id", "text",
          damping = 0.85, iters = 10)
        .withColumn("score", round(col("score"), 6))
        .orderBy("word")
    },

    // chrF (β=2, orders 1..6) of the every-3rd-token-dropped
    // candidate vs the document itself — same synthetic pair
    // construction as q_eval_wer, full gram-count replay.
    q("q_eval_chrf",
      s"""WITH base AS MATERIALIZED (
         |  SELECT doc_id,
         |    replace($normSql, ' ', '') AS r,
         |    array_to_string(list_filter(string_split($normSql, ' '),
         |      (t, i) -> i % 3 != 0), '') AS c
         |  FROM documents
         |), cg AS (
         |  SELECT doc_id, n.n AS n, substr(c, u.i, n.n) AS gram
         |  FROM base, unnest(range(1, 7)) AS n(n),
         |    unnest(range(1, greatest(strlen(c) - n.n + 2, 1))) AS u(i)
         |), rg AS (
         |  SELECT doc_id, n.n AS n, substr(r, u.i, n.n) AS gram
         |  FROM base, unnest(range(1, 7)) AS n(n),
         |    unnest(range(1, greatest(strlen(r) - n.n + 2, 1))) AS u(i)
         |), cc AS (SELECT doc_id, n, gram, count(*) AS cc
         |  FROM cg GROUP BY 1, 2, 3),
         |rc AS (SELECT doc_id, n, gram, count(*) AS rc
         |  FROM rg GROUP BY 1, 2, 3),
         |po AS (
         |  SELECT coalesce(cc.doc_id, rc.doc_id) AS doc_id,
         |    coalesce(cc.n, rc.n) AS n,
         |    sum(least(coalesce(cc.cc, 0), coalesce(rc.rc, 0))) AS m,
         |    sum(coalesce(cc.cc, 0)) AS tc, sum(coalesce(rc.rc, 0)) AS tr
         |  FROM cc FULL OUTER JOIN rc
         |    ON cc.doc_id = rc.doc_id AND cc.n = rc.n AND cc.gram = rc.gram
         |  GROUP BY 1, 2
         |), pr AS (
         |  SELECT doc_id, n,
         |    CASE WHEN tc > 0 THEN m * 1.0::DOUBLE / tc ELSE 0.0 END AS p,
         |    CASE WHEN tr > 0 THEN m * 1.0::DOUBLE / tr ELSE 0.0 END AS r
         |  FROM po
         |), piv AS (
         |  SELECT doc_id,
         |    coalesce(max(CASE WHEN n=1 THEN p END), 0) AS p1,
         |    coalesce(max(CASE WHEN n=2 THEN p END), 0) AS p2,
         |    coalesce(max(CASE WHEN n=3 THEN p END), 0) AS p3,
         |    coalesce(max(CASE WHEN n=4 THEN p END), 0) AS p4,
         |    coalesce(max(CASE WHEN n=5 THEN p END), 0) AS p5,
         |    coalesce(max(CASE WHEN n=6 THEN p END), 0) AS p6,
         |    coalesce(max(CASE WHEN n=1 THEN r END), 0) AS r1,
         |    coalesce(max(CASE WHEN n=2 THEN r END), 0) AS r2,
         |    coalesce(max(CASE WHEN n=3 THEN r END), 0) AS r3,
         |    coalesce(max(CASE WHEN n=4 THEN r END), 0) AS r4,
         |    coalesce(max(CASE WHEN n=5 THEN r END), 0) AS r5,
         |    coalesce(max(CASE WHEN n=6 THEN r END), 0) AS r6
         |  FROM pr GROUP BY 1
         |), fin AS (
         |  SELECT b.doc_id AS id,
         |    coalesce(((((((0.0 + p1) + p2) + p3) + p4) + p5) + p6) / 6,
         |      0.0) AS chr_p,
         |    coalesce(((((((0.0 + r1) + r2) + r3) + r4) + r5) + r6) / 6,
         |      0.0) AS chr_r
         |  FROM base b LEFT JOIN piv ON piv.doc_id = b.doc_id
         |)
         |SELECT id, round(chr_p, 6) AS chr_p, round(chr_r, 6) AS chr_r,
         |  round(CASE WHEN chr_p + chr_r > 0
         |    THEN 5.0 * chr_p * chr_r / (4.0 * chr_p + chr_r)
         |    ELSE 0.0 END, 6) AS chrf
         |FROM fin ORDER BY id""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents").select(col("doc_id").as("id"),
        col("text").as("ref"),
        concat_ws(" ", filter(
          filter(split(graft.ml.TextAnalysis.normalize(col("text")), " "),
            x => length(x) > 0),
          (x, i) => (i + 1) % 3 =!= 0)).as("cand"))
      GenEval.chrF(d, "id", "cand", "ref", maxN = 6, beta = 2.0)
        .select(col("id"), round(col("chr_p"), 6).as("chr_p"),
          round(col("chr_r"), 6).as("chr_r"),
          round(col("chrf"), 6).as("chrf"))
        .orderBy("id")
    },

    // Holt–Winters additive (α=0.3 β=0.1 γ=0.2, daily buckets, weekly
    // season) per event type. The oracle's recursive CTE carries the
    // seasonal ring as a LIST and spells (1 − α) etc. literally so
    // the float expression tree matches the kernel bit-for-bit.
    q("q_events_holtwinters",
      """WITH RECURSIVE counts AS MATERIALIZED (
        |  SELECT event_type AS key,
        |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS bucket,
        |    count(*) * 1.0::DOUBLE AS y
        |  FROM events GROUP BY 1, 2
        |), spans AS (
        |  SELECT key, min(bucket) AS b0, max(bucket) AS b1
        |  FROM counts GROUP BY 1
        |), grid AS MATERIALIZED (
        |  SELECT s.key, u.b AS bucket
        |  FROM spans s, unnest(range(s.b0, s.b1 + 1)) AS u(b)
        |), dense AS MATERIALIZED (
        |  SELECT g.key, g.bucket, coalesce(c.y, 0.0) AS y
        |  FROM grid g
        |  LEFT JOIN counts c ON c.key = g.key AND c.bucket = g.bucket
        |), ys AS MATERIALIZED (
        |  SELECT key, list(y ORDER BY bucket) AS yl,
        |    list(bucket ORDER BY bucket) AS bl, count(*) AS tn
        |  FROM dense GROUP BY 1
        |), init AS (
        |  SELECT key, yl, bl, tn,
        |    list_sum(yl[1:7]) / 7 AS mean1,
        |    list_sum(yl[8:14]) / 7 AS mean2
        |  FROM ys WHERE tn >= 14
        |), rec(key, yl, bl, tn, t, l, b, sl, yt, st, fitted) AS (
        |  SELECT key, yl, bl, tn, 6, mean1, (mean2 - mean1) / 7,
        |    list_transform(yl[1:7], x -> x - mean1),
        |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |    CAST(NULL AS DOUBLE)
        |  FROM init
        |  UNION ALL
        |  SELECT key, yl, bl, tn, t + 1,
        |    0.3 * (yl[t + 2] - sl[1]) + (1 - 0.3) * (l + b),
        |    0.1 * ((0.3 * (yl[t + 2] - sl[1]) + (1 - 0.3) * (l + b)) - l)
        |      + (1 - 0.1) * b,
        |    sl[2:7] || [0.2 * (yl[t + 2] - (0.3 * (yl[t + 2] - sl[1])
        |      + (1 - 0.3) * (l + b))) + (1 - 0.2) * sl[1]],
        |    yl[t + 2],
        |    0.2 * (yl[t + 2] - (0.3 * (yl[t + 2] - sl[1])
        |      + (1 - 0.3) * (l + b))) + (1 - 0.2) * sl[1],
        |    l + b + sl[1]
        |  FROM rec WHERE t + 1 <= tn - 1
        |)
        |SELECT key, bl[t + 1] AS bucket, yt AS y,
        |  round(l, 6) AS level, round(b, 6) AS trend,
        |  round(st, 6) AS seasonal, round(fitted, 6) AS fitted
        |FROM rec WHERE t >= 7 ORDER BY key, bucket""".stripMargin) {
      (s, dir) =>
      val evd = t(s, dir, "events")
      Events.holtWinters(
          evd.select(col("event_type"),
            graft.core.Ts.seconds(evd).as("sec")),
          "event_type", "sec", periodSec = 86400L, seasonLen = 7,
          alpha = 0.3, beta = 0.1, gamma = 0.2)
        .select(col("key"), col("bucket"), col("y"),
          round(col("level"), 6).as("level"),
          round(col("trend"), 6).as("trend"),
          round(col("seasonal"), 6).as("seasonal"),
          round(col("fitted"), 6).as("fitted"))
        .orderBy("key", "bucket")
    },

    // DPO preference pairs: outside-in (k-th best vs k-th worst)
    // pairing per prompt with a margin floor.
    q("q_pref_dpo",
      """WITH base AS (
        |  SELECT user_id AS prompt, event_id AS resp, value AS score
        |  FROM events
        |), ranked AS (
        |  SELECT prompt, resp, score,
        |    row_number() OVER (PARTITION BY prompt
        |      ORDER BY score DESC, resp ASC) AS rb,
        |    row_number() OVER (PARTITION BY prompt
        |      ORDER BY score ASC, resp DESC) AS rw,
        |    count(*) OVER (PARTITION BY prompt) AS n
        |  FROM base
        |), chosen AS (
        |  SELECT prompt, rb AS pair_rank, resp AS chosen,
        |    score AS chosen_score
        |  FROM ranked WHERE rb <= 2 AND rb * 2 <= n
        |), rejected AS (
        |  SELECT prompt AS rprompt, rw AS rpair_rank, resp AS rejected,
        |    score AS rejected_score
        |  FROM ranked WHERE rw <= 2 AND rw * 2 <= n
        |)
        |SELECT c.prompt, CAST(c.pair_rank AS BIGINT) AS pair_rank,
        |  c.chosen, r.rejected, c.chosen_score, r.rejected_score,
        |  round(c.chosen_score - r.rejected_score, 6) AS margin
        |FROM chosen c JOIN rejected r
        |  ON c.prompt = r.rprompt AND c.pair_rank = r.rpair_rank
        |WHERE c.chosen_score - r.rejected_score >= 5.0
        |ORDER BY c.prompt, pair_rank""".stripMargin) { (s, dir) =>
      Preference.dpoPairs(
          t(s, dir, "events").select(col("user_id"), col("event_id"),
            col("value")),
          "user_id", "event_id", "value", minMargin = 5.0,
          maxPairsPerPrompt = 2)
        .select(col("prompt"), col("pair_rank").cast("long").as("pair_rank"),
          col("chosen"), col("rejected"), col("chosen_score"),
          col("rejected_score"), round(col("margin"), 6).as("margin"))
        .orderBy("prompt", "pair_rank")
    },

    // split conformal: per event type, calibration = 4/5 of events,
    // eval = the held-out fifth, α = 0.1 → k-th order statistic
    // radius + measured eval coverage (≈ 0.9 by the guarantee).
    q("q_eval_conformal",
      """WITH cal AS (
        |  SELECT event_type AS grp, value AS s FROM events
        |  WHERE event_id % 5 != 0
        |), ev AS (
        |  SELECT event_type AS egrp, value AS es FROM events
        |  WHERE event_id % 5 = 0
        |), stats AS (
        |  SELECT grp, count(*) AS n_cal,
        |    CAST(ceil((count(*) + 1) * (1.0 - 0.1)) AS BIGINT) AS k
        |  FROM cal GROUP BY 1
        |), ranked AS (
        |  SELECT grp AS rgrp, s,
        |    row_number() OVER (PARTITION BY grp ORDER BY s) AS rk
        |  FROM cal
        |), qh AS (
        |  SELECT st.grp, st.n_cal, st.k, r.s AS qhat
        |  FROM stats st
        |  LEFT JOIN ranked r ON r.rgrp = st.grp AND r.rk = st.k
        |)
        |SELECT q.grp AS "group", q.n_cal, q.k, round(q.qhat, 6) AS qhat,
        |  count(e.es) AS n_eval,
        |  CAST(sum(CASE WHEN e.es IS NOT NULL AND (q.qhat IS NULL
        |    OR e.es <= q.qhat) THEN 1 ELSE 0 END) AS BIGINT) AS covered,
        |  round(sum(CASE WHEN e.es IS NOT NULL AND (q.qhat IS NULL
        |    OR e.es <= q.qhat) THEN 1 ELSE 0 END) * 1.0::DOUBLE
        |    / count(e.es), 6) AS coverage
        |FROM qh q LEFT JOIN ev e ON e.egrp = q.grp
        |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val cal = ev.filter(col("event_id") % 5 =!= 0)
        .select(col("event_type"), col("value"))
      val hold = ev.filter(col("event_id") % 5 === 0)
        .select(col("event_type"), col("value"))
      Calibrate.conformal(cal, "event_type", "value", alpha = 0.1,
          evalDf = Some(hold))
        .select(col("group"), col("n_cal"), col("k"),
          round(col("qhat"), 6).as("qhat"), col("n_eval"), col("covered"),
          round(col("coverage"), 6).as("coverage"))
        .orderBy("group")
    },

    // one-way ANOVA F across event types. Group sums are rounded to
    // their exact decimal grid (values have 2 decimals → sums are
    // 0.01-multiples) before the SS algebra so engine summation-order
    // ulps can't leak into the 6-decimal compare.
    q("q_eval_anova",
      """WITH per AS (
        |  SELECT event_type AS g, count(*) AS ng,
        |    round(sum(value), 2) AS sg, round(sum(value * value), 4) AS qg
        |  FROM events GROUP BY 1
        |), agg AS (
        |  SELECT count(*) AS k, CAST(sum(ng) AS BIGINT) AS n, sum(sg * sg / ng) AS gs,
        |    sum(sg) AS s, sum(qg) AS q FROM per
        |)
        |SELECT k, n, round(gs - s * s / n, 3) AS ss_between,
        |  round(q - gs, 3) AS ss_within,
        |  round(CASE WHEN k > 1 AND n > k AND q - gs > 0
        |    THEN ((gs - s * s / n) / (k - 1)) / ((q - gs) / (n - k))
        |    END, 6) AS f,
        |  round(CASE WHEN (gs - s * s / n) + (q - gs) > 0
        |    THEN (gs - s * s / n) / ((gs - s * s / n) + (q - gs))
        |    END, 6) AS eta_sq
        |FROM agg""".stripMargin) { (s, dir) =>
      // the kernel computes raw sums; replicate the decimal-grid
      // rounding by pre-collapsing to the same rounded group stats
      val per = t(s, dir, "events")
        .groupBy(col("event_type").as("g"))
        .agg(count(lit(1)).as("ng"), round(sum("value"), 2).as("sg"),
          round(sum(col("value") * col("value")), 4).as("qg"))
      per.agg(count(lit(1)).as("k"), sum("ng").as("n"),
          sum(col("sg") * col("sg") / col("ng")).as("gs"),
          sum("sg").as("s"), sum("qg").as("q"))
        .select(col("k"), col("n"),
          round(col("gs") - col("s") * col("s") / col("n"), 3)
            .as("ss_between"),
          round(col("q") - col("gs"), 3).as("ss_within"),
          round(when(col("k") > 1 && col("n") > col("k") &&
              col("q") - col("gs") > 0,
            ((col("gs") - col("s") * col("s") / col("n")) / (col("k") - 1)) /
              ((col("q") - col("gs")) / (col("n") - col("k")))), 6).as("f"),
          round(when((col("gs") - col("s") * col("s") / col("n")) +
              (col("q") - col("gs")) > 0,
            (col("gs") - col("s") * col("s") / col("n")) /
              ((col("gs") - col("s") * col("s") / col("n")) +
                (col("q") - col("gs")))), 6).as("eta_sq"))
    },

    // Benjamini–Hochberg step-up over 20 per-source pseudo p-values
    // (deterministic construction from the data itself).
    q("q_eval_bh_fdr",
      """WITH tests AS (
        |  SELECT source AS test, (sum(doc_id) % 1000) / 1000.0 AS p
        |  FROM documents GROUP BY 1
        |), ranked AS (
        |  SELECT test, p, row_number() OVER (ORDER BY p, test) AS rank,
        |    count(*) OVER () AS m
        |  FROM tests
        |)
        |SELECT test, round(p, 6) AS p, CAST(rank AS BIGINT) AS rank,
        |  round(least(min(p * m / rank) OVER (ORDER BY rank
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 1.0), 6)
        |    AS p_adj,
        |  least(min(p * m / rank) OVER (ORDER BY rank
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 1.0) <= 0.05
        |    AS significant
        |FROM ranked ORDER BY test""".stripMargin) { (s, dir) =>
      val tests = t(s, dir, "documents")
        .groupBy(col("source").as("test"))
        .agg((sum("doc_id") % 1000 / 1000.0).as("p"))
      graft.ml.Eval.bhFdr(tests, "test", "p", alpha = 0.05)
        .select(col("test"), round(col("p"), 6).as("p"),
          col("rank").cast("long").as("rank"),
          round(col("p_adj"), 6).as("p_adj"), col("significant"))
        .orderBy("test")
    },

    // RFM quintile segmentation as of 2024-01-31 00:00 UTC
    // (1706659200): tie-coherent buckets from distinct-value
    // cumulative counts — never an ntile over arbitrary row order.
    q("q_events_rfm_exactq",
      """WITH u AS (
        |  SELECT user_id AS "user",
        |    1706659200 - max(CAST(floor(epoch(ts)) AS BIGINT)) AS recency,
        |    count(*) AS frequency, round(sum(value), 2) AS monetary
        |  FROM events GROUP BY 1
        |), rv AS (SELECT recency AS v, count(*) AS c FROM u GROUP BY 1),
        |rs AS (
        |  SELECT v AS recency, CAST(1 + floor(coalesce(sum(c) OVER (
        |    ORDER BY v DESC ROWS BETWEEN UNBOUNDED PRECEDING AND
        |    1 PRECEDING), 0) * 5 / (sum(c) OVER ())) AS INT) AS r_score
        |  FROM rv
        |), fv AS (SELECT frequency AS v, count(*) AS c FROM u GROUP BY 1),
        |fs AS (
        |  SELECT v AS frequency, CAST(1 + floor(coalesce(sum(c) OVER (
        |    ORDER BY v ASC ROWS BETWEEN UNBOUNDED PRECEDING AND
        |    1 PRECEDING), 0) * 5 / (sum(c) OVER ())) AS INT) AS f_score
        |  FROM fv
        |), mv AS (SELECT monetary AS v, count(*) AS c FROM u GROUP BY 1),
        |ms AS (
        |  SELECT v AS monetary, CAST(1 + floor(coalesce(sum(c) OVER (
        |    ORDER BY v ASC ROWS BETWEEN UNBOUNDED PRECEDING AND
        |    1 PRECEDING), 0) * 5 / (sum(c) OVER ())) AS INT) AS m_score
        |  FROM mv
        |)
        |SELECT u."user", u.recency, u.frequency, u.monetary,
        |  rs.r_score, fs.f_score, ms.m_score,
        |  rs.r_score || '' || fs.f_score || '' || ms.m_score AS rfm
        |FROM u JOIN rs USING (recency) JOIN fs USING (frequency)
        |  JOIN ms USING (monetary)
        |ORDER BY u."user"""".stripMargin) { (s, dir) =>
      val evd = t(s, dir, "events")
      Events.rfmSegments(
          evd.select(col("user_id"), graft.core.Ts.seconds(evd).as("sec"),
            col("value")),
          "user_id", "sec", "value", asOfSec = 1706659200L, k = 5)
        .orderBy("user")
    },

    // ordered event-type trigram mining (PrefixSpan-lite) with
    // distinct-user support >= 50.
    q("q_events_seqpat",
      """WITH e AS (
        |  SELECT user_id AS u, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |    event_id AS eid, event_type AS t0
        |  FROM events
        |), led AS (
        |  SELECT u, t0,
        |    lead(t0, 1) OVER (PARTITION BY u ORDER BY sec, eid) AS t1,
        |    lead(t0, 2) OVER (PARTITION BY u ORDER BY sec, eid) AS t2
        |  FROM e
        |)
        |SELECT t0 || '>' || t1 || '>' || t2 AS pattern,
        |  count(*) AS occurrences, count(DISTINCT u) AS users
        |FROM led WHERE t2 IS NOT NULL
        |GROUP BY 1 HAVING count(DISTINCT u) >= 50
        |ORDER BY pattern""".stripMargin) { (s, dir) =>
      val evd = t(s, dir, "events")
      Events.sequentialPatterns(
          evd.select(col("user_id"), graft.core.Ts.seconds(evd).as("sec"),
            col("event_id"), col("event_type")),
          "user_id", "sec", "event_id", "event_type", n = 3,
          minSupport = 50L)
        .orderBy("pattern")
    },

    // quantile normalization of n_chars across sources: discrete
    // rank→pooled-order-statistic mapping, all-integer values so the
    // compare is exact.
    q("q_text_quantile_norm",
      """WITH base AS (
        |  SELECT doc_id AS id, source AS stratum,
        |    CAST(n_chars AS DOUBLE) AS v
        |  FROM documents
        |), sized AS (
        |  SELECT id, stratum, v,
        |    row_number() OVER (PARTITION BY stratum ORDER BY v, id)
        |      AS stratum_rank,
        |    count(*) OVER (PARTITION BY stratum) AS ng,
        |    (SELECT count(*) FROM base) AS n_total
        |  FROM base
        |), pooled AS (
        |  SELECT v AS pv, count(*) AS c,
        |    coalesce(sum(count(*)) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |  FROM base GROUP BY v
        |), pos AS (
        |  SELECT id, stratum, v, stratum_rank,
        |    CAST(ceil(CAST(stratum_rank AS DOUBLE) * n_total / ng)
        |      AS BIGINT) AS pooled_pos
        |  FROM sized
        |)
        |SELECT p.id, p.stratum, p.v,
        |  CAST(p.stratum_rank AS BIGINT) AS stratum_rank, p.pooled_pos,
        |  pl.pv AS normalized
        |FROM pos p JOIN pooled pl
        |  ON pl.cb < p.pooled_pos AND p.pooled_pos <= pl.cb + pl.c
        |ORDER BY p.id""".stripMargin) { (s, dir) =>
      graft.ml.Profile.quantileNormalize(
          t(s, dir, "documents").select(col("doc_id"), col("source"),
            col("n_chars")),
          "doc_id", "source", "n_chars")
        .select(col("id"), col("stratum"), col("v"),
          col("stratum_rank").cast("long").as("stratum_rank"),
          col("pooled_pos"), col("normalized"))
        .orderBy("id")
    },

    // Matryoshka truncation eval: brute-force recall@5 at prefix
    // widths 8/16/32 vs the full 64-dim top-5, probes = vec_id < 10.
    q("q_embed_matryoshka", {
      def topk(dim: Option[Int]): String = {
        val v = dim.map(d => s"CAST(q.embedding[1:$d] AS DOUBLE[])")
          .getOrElse("CAST(q.embedding AS DOUBLE[])")
        val c = dim.map(d => s"CAST(c.embedding[1:$d] AS DOUBLE[])")
          .getOrElse("CAST(c.embedding AS DOUBLE[])")
        s"""SELECT q.vec_id AS qid, c.vec_id AS cid
           |  FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
           |  WHERE q.vec_id < 10
           |  QUALIFY row_number() OVER (PARTITION BY q.vec_id
           |    ORDER BY list_cosine_similarity($v, $c) DESC, c.vec_id)
           |    <= 5""".stripMargin
      }
      val parts = Seq(8, 16, 32).map(d =>
        s"SELECT $d AS dim, qid AS tqid, cid AS tcid FROM (${topk(Some(d))})")
        .mkString(" UNION ALL ")
      s"""WITH full_top AS MATERIALIZED (${topk(None)}),
         |trunc_top AS ($parts)
         |SELECT t.dim, t.tqid AS qid, CAST(count(f.cid) AS BIGINT) AS hits,
         |  round(count(f.cid) * 1.0::DOUBLE / 5, 6) AS recall
         |FROM trunc_top t
         |LEFT JOIN full_top f ON f.qid = t.tqid AND f.cid = t.tcid
         |GROUP BY 1, 2 ORDER BY dim, qid""".stripMargin
    }) { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      graft.ml.Similarity.matryoshkaRecall(e, e.filter(col("id") < 10),
          dims = Seq(8, 16, 32), k = 5)
        .select(col("dim"), col("qid"), col("hits"),
          round(col("recall"), 6).as("recall"))
        .orderBy("dim", "qid")
    },

    // signed feature hashing into 64 buckets (md5-prefix hash — the
    // engine-portable hash; exact-zero cancellations kept).
    q("q_text_feature_hash",
      s"""WITH tok AS (
         |  SELECT doc_id AS id, u.t AS t FROM (
         |    SELECT doc_id, list_filter(string_split($normSql, ' '),
         |      x -> x <> '') AS ws
         |    FROM documents), unnest(ws) AS u(t)
         |)
         |SELECT id,
         |  CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 64 AS idx,
         |  CAST(sum(CASE WHEN substr(md5(t), 9, 1) IN
         |    ('0','1','2','3','4','5','6','7') THEN 1 ELSE -1 END)
         |    AS BIGINT) AS value
         |FROM tok GROUP BY 1, 2 ORDER BY id, idx""".stripMargin) {
      (s, dir) =>
      graft.ml.Features.featureHash(t(s, dir, "documents"), "doc_id",
          "text", dim = 64)
        .orderBy("id", "idx")
    },

    // token↔language mutual information (presence-based 2×L
    // contingency per token, absent cells derived).
    q("q_text_token_mi",
      s"""WITH dt AS (
         |  SELECT DISTINCT doc_id AS id, lang AS lab, u.t AS t FROM (
         |    SELECT doc_id, lang,
         |      list_distinct(list_filter(string_split($normSql, ' '),
         |        x -> x <> '')) AS ws FROM documents), unnest(ws) AS u(t)
         |), present AS (
         |  SELECT t, lab, count(*) AS a FROM dt GROUP BY 1, 2
         |), labtot AS (
         |  SELECT lang AS lab, count(*) AS nl FROM documents GROUP BY 1
         |), ntot AS (SELECT count(*) * 1.0::DOUBLE AS n FROM documents),
         |tokens AS (SELECT t, sum(a) AS nt FROM present GROUP BY 1),
         |grid AS (
         |  SELECT tk.t, tk.nt, lt.nl, coalesce(p.a, 0) AS a, ntot.n
         |  FROM tokens tk CROSS JOIN labtot lt CROSS JOIN ntot
         |  LEFT JOIN present p ON p.t = tk.t AND p.lab = lt.lab
         |)
         |SELECT t AS token, CAST(min(nt) AS BIGINT) AS doc_freq,
         |  round(sum(
         |    (CASE WHEN a > 0 THEN (a / n) *
         |      ln((a / n) / ((nt / n) * (nl / n))) ELSE 0.0 END) +
         |    (CASE WHEN nl - a > 0 THEN ((nl - a) / n) *
         |      ln(((nl - a) / n) / (((n - nt) / n) * (nl / n)))
         |      ELSE 0.0 END)
         |  ), 6) AS mi
         |FROM grid GROUP BY 1 ORDER BY token""".stripMargin) { (s, dir) =>
      graft.ml.Features.tokenLabelMI(t(s, dir, "documents"), "doc_id",
          "text", "lang")
        .select(col("token"), col("doc_freq"),
          round(col("mi"), 6).as("mi"))
        .orderBy("token")
    },

    // Heaps' law V = k·N^β: vocabulary at 10 equal-doc-count
    // checkpoints (doc-id order) + log-log OLS fit.
    q("q_text_heaps",
      s"""WITH d AS (
         |  SELECT doc_id AS id, list_filter(string_split($normSql, ' '),
         |    t -> t <> '') AS ws FROM documents
         |), pd AS (
         |  SELECT id, CAST(sum(len(ws)) AS BIGINT) AS ntok
         |  FROM d GROUP BY id
         |), fd AS (
         |  SELECT u.t AS tk, min(id) AS first_id
         |  FROM d, unnest(ws) AS u(t) GROUP BY 1
         |), nn AS (SELECT count(*) AS n FROM pd),
         |rk AS (
         |  SELECT id, row_number() OVER (ORDER BY id) AS rk FROM pd
         |), thr AS (
         |  SELECT cp.cp, rk.id AS thr
         |  FROM rk, nn, unnest(range(1, 11)) AS cp(cp)
         |  WHERE rk.rk = CAST(ceil(cp.cp * nn.n / 10) AS BIGINT)
         |), vocab AS (
         |  SELECT t.cp, count(*) AS vocab FROM fd, thr t
         |  WHERE fd.first_id <= t.thr GROUP BY 1
         |), toks AS (
         |  SELECT t.cp, sum(ntok) AS n_tokens FROM pd, thr t
         |  WHERE pd.id <= t.thr GROUP BY 1
         |), points AS (
         |  SELECT toks.cp AS checkpoint, toks.n_tokens, vocab.vocab
         |  FROM toks JOIN vocab ON toks.cp = vocab.cp
         |), fit AS (
         |  SELECT count(*) * 1.0::DOUBLE AS m,
         |    sum(ln(n_tokens)) AS sx, sum(ln(vocab)) AS sy,
         |    sum(ln(n_tokens) * ln(vocab)) AS sxy,
         |    sum(ln(n_tokens) * ln(n_tokens)) AS sxx,
         |    sum(ln(vocab) * ln(vocab)) AS syy
         |  FROM points
         |), params AS (
         |  SELECT (m * sxy - sx * sy) / (m * sxx - sx * sx) AS beta,
         |    m, sx, sy, sxy, sxx, syy FROM fit
         |)
         |SELECT p.checkpoint, CAST(p.n_tokens AS BIGINT) AS n_tokens,
         |  CAST(p.vocab AS BIGINT) AS vocab,
         |  round(q.beta, 6) + 0.0 AS beta,
         |  round((q.sy - q.beta * q.sx) / q.m, 6) + 0.0 AS log_k,
         |  round(pow(q.m * q.sxy - q.sx * q.sy, 2.0) /
         |    ((q.m * q.sxx - q.sx * q.sx) * (q.m * q.syy - q.sy * q.sy)),
         |    6) + 0.0 AS r2
         |FROM points p CROSS JOIN params q
         |ORDER BY checkpoint""".stripMargin) { (s, dir) =>
      graft.ml.TextAnalysis.heapsFit(t(s, dir, "documents"), "doc_id",
          "text", checkpoints = 10)
        .select(col("checkpoint"), col("n_tokens"),
          col("vocab").cast("long").as("vocab"),
          // + 0.0 collapses IEEE -0.0 (the degenerate constant-vocab
          // fit) to 0.0 on both sides — the signed-zero gotcha
          (round(col("beta"), 6) + 0.0).as("beta"),
          (round(col("log_k"), 6) + 0.0).as("log_k"),
          (round(col("r2"), 6) + 0.0).as("r2"))
        .orderBy("checkpoint")
    },

    // Burrows' Delta stylometric distance between sources over the
    // top-50 corpus words (zero cells included, explicit population
    // sigma so the expression tree is engine-identical).
    q("q_text_burrows",
      s"""WITH tok AS (
         |  SELECT source AS s, u.t AS tk FROM (
         |    SELECT source, list_filter(string_split($normSql, ' '),
         |      t -> t <> '') AS ws FROM documents), unnest(ws) AS u(t)
         |), sw AS (
         |  SELECT s, tk, count(*) AS c FROM tok GROUP BY 1, 2
         |), stot AS (SELECT s, sum(c) AS tot FROM sw GROUP BY 1),
         |top AS (
         |  SELECT tk FROM (
         |    SELECT tk, row_number() OVER (ORDER BY sum(c) DESC, tk) AS r
         |    FROM sw GROUP BY tk
         |  ) WHERE r <= 50
         |), grid AS (
         |  SELECT st.s, tp.tk,
         |    coalesce(sw.c, 0) * 1.0::DOUBLE / st.tot AS f
         |  FROM top tp CROSS JOIN stot st
         |  LEFT JOIN sw ON sw.s = st.s AND sw.tk = tp.tk
         |), stats AS (
         |  SELECT tk, avg(f) AS mu,
         |    sqrt(greatest(avg(f * f) - avg(f) * avg(f), 0.0)) AS sigma
         |  FROM grid GROUP BY 1
         |), z AS (
         |  SELECT g.s, g.tk,
         |    CASE WHEN st.sigma > 0 THEN (g.f - st.mu) / st.sigma
         |      ELSE 0.0 END AS z
         |  FROM grid g JOIN stats st USING (tk)
         |)
         |SELECT a.s AS s1, b.s AS s2,
         |  round(avg(abs(a.z - b.z)), 6) AS delta
         |FROM z a JOIN z b ON a.tk = b.tk AND a.s < b.s
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      graft.ml.TextAnalysis.burrowsDelta(t(s, dir, "documents"),
          "source", "text", topM = 50)
        .select(col("s1"), col("s2"), round(col("delta"), 6).as("delta"))
        .orderBy("s1", "s2")
    },

    // weight-of-evidence + information value per event type against
    // the high-value label (value > 100).
    q("q_events_woe",
      """WITH per AS (
        |  SELECT event_type AS category, count(*) AS n,
        |    CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS good
        |  FROM events GROUP BY 1
        |), tot AS (SELECT sum(good) AS gt, sum(n - good) AS bt FROM per)
        |SELECT category, n, good, n - good AS bad,
        |  round(ln(((good + 0.5) / gt) / (((n - good) + 0.5) / bt)), 6)
        |    AS woe,
        |  round((((good + 0.5) / gt) - (((n - good) + 0.5) / bt)) *
        |    ln(((good + 0.5) / gt) / (((n - good) + 0.5) / bt)), 6) AS iv
        |FROM per CROSS JOIN tot ORDER BY category""".stripMargin) {
      (s, dir) =>
      graft.ml.Features.woeEncode(
          t(s, dir, "events").select(col("event_type"),
            (col("value") > 100).cast("int").as("y")),
          "event_type", "y")
        .select(col("category"), col("n"), col("good"), col("bad"),
          round(col("woe"), 6).as("woe"), round(col("iv"), 6).as("iv"))
        .orderBy("category")
    },

    // sample autocorrelation of the hourly event-count series at
    // lags 1..24 + cumulative Ljung–Box Q — dense zero-filled grid,
    // full pair-join replay.
    q("q_events_acf",
      """WITH c AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS bucket,
        |    count(*) AS y
        |  FROM events GROUP BY 1
        |), sp AS (SELECT min(bucket) AS b0, max(bucket) AS b1 FROM c),
        |dense AS MATERIALIZED (
        |  SELECT g.bucket, coalesce(c.y, 0)::DOUBLE AS y
        |  FROM (SELECT unnest(range(b0, b1 + 1)) AS bucket FROM sp) g
        |  LEFT JOIN c USING (bucket)
        |), st AS (SELECT count(*)::BIGINT AS n, avg(y) AS m FROM dense),
        |d AS MATERIALIZED (
        |  SELECT bucket, y - m AS dy, n FROM dense CROSS JOIN st
        |), den AS (SELECT sum(dy * dy) AS ss FROM d),
        |pl AS (
        |  SELECT (b.bucket - a.bucket) AS lag, sum(a.dy * b.dy) AS num,
        |    max(a.n) AS n
        |  FROM d a JOIN d b ON b.bucket - a.bucket BETWEEN 1 AND 24
        |  GROUP BY 1
        |), cum AS (
        |  SELECT lag, num, n, sum(num * num / (n - lag)) OVER (
        |    ORDER BY lag
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM pl
        |)
        |SELECT lag, round(num / ss, 6) + 0.0 AS r,
        |  round(n * (n + 2) * cum / (ss * ss), 6) + 0.0 AS lb_q
        |FROM cum CROSS JOIN den ORDER BY lag""".stripMargin) { (s, dir) =>
      val raw = t(s, dir, "events")
      Events.autocorrelation(
          raw.withColumn("sec", graft.core.Ts.seconds(raw)),
          "sec", periodSec = 3600L, maxLag = 24)
        .select(col("lag"),
          (round(col("r"), 6) + 0.0).as("r"),
          (round(col("lb_q"), 6) + 0.0).as("lb_q"))
        .orderBy("lag")
    },

    // Mann–Kendall monotone-trend test + Theil–Sen slope over the
    // hourly count series — tie-corrected Var(S), continuity-
    // corrected Z, lower-median slope as a discrete order statistic.
    q("q_events_mann_kendall",
      """WITH c AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS bucket,
        |    count(*) AS y
        |  FROM events GROUP BY 1
        |), sp AS (SELECT min(bucket) AS b0, max(bucket) AS b1 FROM c),
        |dense AS MATERIALIZED (
        |  SELECT g.bucket, coalesce(c.y, 0)::DOUBLE AS y
        |  FROM (SELECT unnest(range(b0, b1 + 1)) AS bucket FROM sp) g
        |  LEFT JOIN c USING (bucket)
        |), p AS MATERIALIZED (
        |  SELECT sign(b.y - a.y) AS sgn,
        |    (b.y - a.y) / (b.bucket - a.bucket)::DOUBLE AS slope
        |  FROM dense a JOIN dense b ON b.bucket > a.bucket
        |), s AS MATERIALIZED (
        |  SELECT sum(sgn) AS s, count(*)::BIGINT AS m FROM p
        |), tt AS (
        |  SELECT coalesce(sum(CASE WHEN t > 1
        |      THEN t * (t - 1) * (2 * t + 5) END), 0)::BIGINT AS tie_term
        |  FROM (SELECT count(*)::BIGINT AS t FROM dense GROUP BY y)
        |), nn AS (SELECT count(*)::BIGINT AS n FROM dense),
        |sc AS (SELECT slope, count(*)::BIGINT AS c FROM p GROUP BY 1),
        |cu AS (
        |  SELECT slope, c, sum(c) OVER (ORDER BY slope
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM sc
        |), med AS (
        |  SELECT slope AS sen_slope FROM cu
        |  CROSS JOIN (SELECT CAST(ceil(m / 2.0) AS BIGINT) AS k FROM s)
        |  WHERE cum >= k AND cum - c < k
        |), vs AS (
        |  SELECT n, s, (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
        |    AS var_s
        |  FROM s CROSS JOIN tt CROSS JOIN nn
        |)
        |SELECT n, CAST(s AS BIGINT) AS s_stat,
        |  round(var_s, 6) AS var_s,
        |  round(CASE WHEN s > 0 THEN (s - 1) / sqrt(var_s)
        |    WHEN s < 0 THEN (s + 1) / sqrt(var_s) ELSE 0.0 END, 6) + 0.0
        |    AS z,
        |  round(sen_slope, 6) + 0.0 AS sen_slope
        |FROM vs CROSS JOIN med""".stripMargin) { (s, dir) =>
      val raw = t(s, dir, "events")
      Events.mannKendall(
          raw.withColumn("sec", graft.core.Ts.seconds(raw)),
          "sec", periodSec = 3600L)
        .select(col("n"), col("s_stat"),
          round(col("var_s"), 6).as("var_s"),
          (round(col("z"), 6) + 0.0).as("z"),
          (round(col("sen_slope"), 6) + 0.0).as("sen_slope"))
    },

    // post-stratified ATE: users stratified by event-count decile
    // band, variant = user parity, metric = mean event value —
    // within-stratum arm diffs recombined by stratum weight.
    q("q_events_poststrat_ate",
      """WITH pu AS (
        |  SELECT user_id, user_id % 2 AS variant,
        |    count(*) // 10 AS stratum, avg(value) AS metric
        |  FROM events GROUP BY user_id
        |), arm AS (
        |  SELECT stratum, variant, count(*)::BIGINT AS n,
        |    avg(metric) AS m, var_pop(metric) AS v
        |  FROM pu GROUP BY 1, 2
        |), grid AS MATERIALIZED (
        |  SELECT stratum, sum(n)::BIGINT AS n_all,
        |    max(CASE WHEN variant = 1 THEN n END) AS n_t,
        |    max(CASE WHEN variant = 1 THEN m END) AS mean_t,
        |    max(CASE WHEN variant = 1 THEN v END) AS var_t,
        |    max(CASE WHEN variant = 0 THEN n END) AS n_c,
        |    max(CASE WHEN variant = 0 THEN m END) AS mean_c,
        |    max(CASE WHEN variant = 0 THEN v END) AS var_c
        |  FROM arm GROUP BY 1
        |), g2 AS MATERIALIZED (
        |  SELECT *, (n_t IS NOT NULL AND n_c IS NOT NULL) AS used
        |  FROM grid
        |), tot AS (SELECT sum(n_all) AS n_used FROM g2 WHERE used),
        |parts AS MATERIALIZED (
        |  SELECT g2.*, CASE WHEN used
        |      THEN n_all::DOUBLE / n_used END AS weight,
        |    mean_t - mean_c AS diff
        |  FROM g2 CROSS JOIN tot
        |), pooled AS (
        |  SELECT sum(weight * diff) AS ate,
        |    sqrt(sum(weight * weight *
        |      (var_t / n_t + var_c / n_c))) AS se
        |  FROM parts WHERE used
        |)
        |SELECT stratum, n_all, n_t, n_c,
        |  round(mean_t, 6) AS mean_t, round(mean_c, 6) AS mean_c,
        |  round(diff, 6) + 0.0 AS diff, round(weight, 6) AS weight,
        |  used, round(ate, 6) + 0.0 AS ate, round(se, 6) AS se
        |FROM parts CROSS JOIN pooled ORDER BY stratum""".stripMargin) {
      (s, dir) =>
      val perUser = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("freq"), avg("value").as("metric"))
        .select(col("user_id"), (col("user_id") % 2).as("variant"),
          floor(col("freq") / 10).cast("long").as("stratum"),
          col("metric"))
      Events.postStratifiedAte(perUser, "variant", "metric", "stratum")
        .select(col("stratum"), col("n_all"), col("n_t"), col("n_c"),
          round(col("mean_t"), 6).as("mean_t"),
          round(col("mean_c"), 6).as("mean_c"),
          (round(col("diff"), 6) + 0.0).as("diff"),
          round(col("weight"), 6).as("weight"), col("used"),
          (round(col("ate"), 6) + 0.0).as("ate"),
          round(col("se"), 6).as("se"))
        .orderBy("stratum")
    },

    // American Soundex phonetic key over the corpus vocabulary —
    // the record-linkage blocking key, replayed step-for-step
    // (letters / H-W drop / digit classes / per-class collapse /
    // zero removal / pad) in pure string SQL on both engines.
    q("q_text_soundex", {
      val collapsed = (0 to 6).foldLeft("digits") { (e, i) =>
        s"regexp_replace($e, '$i$i+', '$i', 'g')"
      }
      s"""WITH w AS (
         |  SELECT DISTINCT u.t AS word FROM (
         |    SELECT list_filter(string_split($normSql, ' '),
         |      t -> t <> '') AS ws FROM documents), unnest(ws) AS u(t)
         |), k AS (
         |  SELECT word, regexp_replace(upper(word), '[^A-Z]', '', 'g')
         |    AS letters
         |  FROM w
         |), b AS (
         |  SELECT word, substring(letters, 1, 1) AS f,
         |    substring(letters, 1, 1) ||
         |      translate(substring(letters, 2, 1048576), 'HW', '')
         |      AS body
         |  FROM k WHERE length(letters) > 0
         |), d AS (
         |  SELECT word, f, translate(body,
         |    'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
         |    '01230120022455012623010202') AS digits
         |  FROM b
         |)
         |SELECT word, f || rpad(substring(replace(
         |    substring($collapsed, 2, 1048576), '0', ''), 1, 3), 3, '0')
         |  AS code
         |FROM d ORDER BY word""".stripMargin
    }) { (s, dir) =>
      import graft.ml.TextAnalysis
      val words = t(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(
          TextAnalysis.normalize(col("text")))).as("word"))
        .filter(col("word") =!= "").distinct()
      words
        .select(col("word"),
          graft.ml.Linkage.soundex(col("word")).as("code"))
        .filter(col("code").isNotNull)
        .orderBy("word")
    },

    // simplified (centroid-based) silhouette of the label partition
    // of the embedding corpus — one corpus scan against the k
    // broadcast centroids, full explode-join replay.
    q("q_embed_silhouette",
      """WITH v AS MATERIALIZED (
        |  SELECT vec_id, label, u.i AS i,
        |    CAST(embedding[u.i] AS DOUBLE) AS x
        |  FROM embeddings,
        |    unnest(range(1, len(embedding) + 1)) AS u(i)
        |), cent AS MATERIALIZED (
        |  SELECT label AS c, i, avg(x) AS m FROM v GROUP BY 1, 2
        |), dist AS MATERIALIZED (
        |  SELECT v.vec_id, v.label, cent.c,
        |    sqrt(sum((v.x - cent.m) * (v.x - cent.m))) AS dist
        |  FROM v JOIN cent USING (i)
        |  GROUP BY 1, 2, 3
        |), ab AS (
        |  SELECT vec_id, label,
        |    max(CASE WHEN c = label THEN dist END) AS a,
        |    min(CASE WHEN c <> label THEN dist END) AS b
        |  FROM dist GROUP BY 1, 2
        |)
        |SELECT label::BIGINT AS cluster, count(*)::BIGINT AS n,
        |  round(avg(a), 6) AS mean_a, round(avg(b), 6) AS mean_b,
        |  round(avg(CASE WHEN greatest(a, b) = 0 THEN 0.0
        |    ELSE (b - a) / greatest(a, b) END), 6) + 0.0 AS mean_sil
        |FROM ab GROUP BY 1 ORDER BY cluster""".stripMargin) { (s, dir) =>
      graft.ml.Similarity.simplifiedSilhouette(
          t(s, dir, "embeddings"), "label", "embedding")
        .select(col("cluster"), col("n"),
          round(col("mean_a"), 6).as("mean_a"),
          round(col("mean_b"), 6).as("mean_b"),
          (round(col("mean_sil"), 6) + 0.0).as("mean_sil"))
        .orderBy("cluster")
    },

    // binary sign-bit ANN: Hamming top-20 over 32-dim-per-word
    // packed vectors (integer selection — bit-identical across
    // engines), exact-cosine rerank to top-5. Probe batch =
    // vec_id < 10, the ANN contract.
    q("q_ann_binary",
      """WITH pk AS MATERIALIZED (
        |  SELECT vec_id, (u.i - 1) // 32 AS w,
        |    sum(CASE WHEN embedding[u.i] >= 0
        |      THEN (1::BIGINT << ((u.i - 1) % 32)) ELSE 0 END)::BIGINT
        |      AS word
        |  FROM embeddings,
        |    unnest(range(1, len(embedding) + 1)) AS u(i)
        |  GROUP BY 1, 2
        |), ham AS MATERIALIZED (
        |  SELECT a.vec_id AS qid, b.vec_id AS cid,
        |    sum(bit_count(xor(a.word, b.word)))::BIGINT AS hamming
        |  FROM pk a JOIN pk b
        |    ON a.w = b.w AND a.vec_id < 10 AND b.vec_id <> a.vec_id
        |  GROUP BY 1, 2
        |), cand AS (
        |  SELECT qid, cid, hamming FROM ham
        |  QUALIFY row_number() OVER (PARTITION BY qid
        |    ORDER BY hamming, cid) <= 20
        |), rer AS (
        |  SELECT cand.qid, cand.cid, cand.hamming,
        |    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |      CAST(c.embedding AS DOUBLE[])) AS cos
        |  FROM cand JOIN embeddings q ON q.vec_id = cand.qid
        |  JOIN embeddings c ON c.vec_id = cand.cid
        |), rk AS (
        |  SELECT qid, cid, hamming, cos, row_number() OVER (
        |    PARTITION BY qid ORDER BY cos DESC, cid) AS r
        |  FROM rer
        |)
        |SELECT qid, cid, hamming, round(cos, 6) + 0.0 AS cos
        |FROM rk WHERE r <= 5 ORDER BY qid, cid""".stripMargin) {
      (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      graft.ml.Similarity.binaryTopK(
          e.filter(col("id") < 10), e, k = 5, rerankMult = 4)
        .select(col("qid"), col("cid"), col("hamming").cast("long")
          .as("hamming"), (round(col("cos"), 6) + 0.0).as("cos"))
        .orderBy("qid", "cid")
    },

    // Harman S-stemmer over the corpus vocabulary: three guarded
    // plural rules, first match wins — CASE-for-CASE replay.
    q("q_text_sstem",
      s"""WITH w AS (
         |  SELECT DISTINCT u.t AS word FROM (
         |    SELECT list_filter(string_split($normSql, ' '),
         |      t -> t <> '') AS ws FROM documents), unnest(ws) AS u(t)
         |)
         |SELECT word, CASE
         |  WHEN word LIKE '%ies' AND word NOT LIKE '%eies'
         |    AND word NOT LIKE '%aies'
         |    THEN substring(word, 1, length(word) - 3) || 'y'
         |  WHEN word LIKE '%es' AND word NOT LIKE '%aes'
         |    AND word NOT LIKE '%ees' AND word NOT LIKE '%oes'
         |    THEN substring(word, 1, length(word) - 1)
         |  WHEN word LIKE '%s' AND word NOT LIKE '%us'
         |    AND word NOT LIKE '%ss'
         |    THEN substring(word, 1, length(word) - 1)
         |  ELSE word END AS stem
         |FROM w ORDER BY word""".stripMargin) { (s, dir) =>
      import graft.ml.TextAnalysis
      t(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(
          TextAnalysis.normalize(col("text")))).as("word"))
        .filter(col("word") =!= "").distinct()
        .select(col("word"),
          TextAnalysis.sStem(col("word")).as("stem"))
        .orderBy("word")
    },

    // keyword-in-context concordance for "spark", ±3 tokens — the
    // context slices replayed by list slicing on both engines.
    q("q_text_kwic",
      s"""WITH tk AS (
         |  SELECT doc_id, string_split($normSql, ' ') AS ws
         |  FROM documents
         |), w AS (
         |  SELECT doc_id, ws, u.i - 1 AS pos, ws[u.i] AS tok
         |  FROM tk, unnest(range(1, len(ws) + 1)) AS u(i)
         |)
         |SELECT doc_id AS id, CAST(pos AS BIGINT) AS pos,
         |  -- DuckDB yields NULL (not []) for empty/inverted slices;
         |  -- the engine's slice/array_join contract is ''
         |  coalesce(array_to_string(ws[greatest(1, pos - 2) : pos],
         |    ' '), '') AS l_ctx,
         |  coalesce(array_to_string(ws[pos + 2 : pos + 4], ' '), '')
         |    AS r_ctx
         |FROM w WHERE tok = 'spark'
         |ORDER BY id, pos""".stripMargin) { (s, dir) =>
      graft.ml.TextAnalysis.kwic(t(s, dir, "documents"), "doc_id",
          "text", term = "spark", window = 3)
        .select(col("id"), col("pos").cast("long").as("pos"),
          col("left").as("l_ctx"), col("right").as("r_ctx"))
        .orderBy("id", "pos")
    },

    // exact phrase search over positional postings: "fast table" as
    // consecutive tokens via the position equi-join.
    q("q_text_phrase",
      s"""WITH tk AS (
         |  SELECT doc_id, string_split($normSql, ' ') AS ws
         |  FROM documents
         |), w AS MATERIALIZED (
         |  SELECT doc_id, u.i - 1 AS pos, ws[u.i] AS tok
         |  FROM tk, unnest(range(1, len(ws) + 1)) AS u(i)
         |  WHERE ws[u.i] IN ('fast', 'table')
         |), a AS (SELECT doc_id, pos FROM w WHERE tok = 'fast'),
         |b AS (SELECT doc_id, pos - 1 AS pos FROM w WHERE tok = 'table'),
         |h AS (SELECT doc_id, pos FROM a JOIN b USING (doc_id, pos))
         |SELECT doc_id, count(*)::BIGINT AS n_hits,
         |  CAST(min(pos) AS BIGINT) AS first_pos
         |FROM h GROUP BY 1 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.ml.TextIndex.phraseSearch(t(s, dir, "documents"), "doc_id",
          "text", Seq("fast", "table"))
        .orderBy("doc_id")
    },

    // Hill/discrete-MLE power-law exponent of the co-purchase
    // graph's degree tail (xmin = 2) — closed-form replay.
    q("q_graph_powerlaw",
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        |), e AS (
        |  SELECT DISTINCT a.p AS u, b.p AS v
        |  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
        |), deg AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
        |    SELECT u AS node FROM e UNION ALL SELECT v FROM e
        |  ) GROUP BY node
        |), tail AS (SELECT degree FROM deg WHERE degree >= 2)
        |SELECT 2::BIGINT AS xmin, count(*)::BIGINT AS n_tail,
        |  round(1.0 + count(*) / sum(ln(degree / 1.5)), 6) AS alpha,
        |  round((1.0 + count(*) / sum(ln(degree / 1.5)) - 1)
        |    / sqrt(count(*)), 6) AS sigma
        |FROM tail""".stripMargin) { (s, dir) =>
      val edges = graft.graph.Graphs.coOccurrenceEdges(
          t(s, dir, "lineitem"), "l_orderkey", "l_partkey")
        .distinct()
      graft.graph.Graphs.powerLawAlpha(edges, xmin = 2L)
        .select(col("xmin"), col("n_tail"),
          round(col("alpha"), 6).as("alpha"),
          round(col("sigma"), 6).as("sigma"))
    },

    // Cronbach's alpha of the 5 event types as an item battery
    // (subject = user, item score = mean event value).
    q("q_eval_cronbach",
      """WITH cell AS MATERIALIZED (
        |  SELECT user_id AS subj, event_type AS item, avg(value) AS x
        |  FROM events GROUP BY 1, 2
        |), k AS (SELECT count(DISTINCT item)::BIGINT AS k FROM cell),
        |comp AS MATERIALIZED (
        |  SELECT subj, count(*)::BIGINT AS ki, sum(x) AS total
        |  FROM cell GROUP BY 1
        |), compf AS MATERIALIZED (
        |  SELECT comp.* FROM comp CROSS JOIN k WHERE ki = k.k
        |), iv AS (
        |  SELECT sum(v) AS siv FROM (
        |    SELECT var_pop(x) AS v FROM cell
        |    JOIN compf USING (subj) GROUP BY item)
        |), tv AS (
        |  SELECT var_pop(total) AS vt, count(*)::BIGINT AS n_subjects
        |  FROM compf
        |)
        |SELECT k.k, tv.n_subjects,
        |  round(k.k / (k.k - 1.0) * (1 - iv.siv / tv.vt), 6) AS alpha
        |FROM k CROSS JOIN iv CROSS JOIN tv""".stripMargin) { (s, dir) =>
      graft.ml.Eval.cronbachAlpha(t(s, dir, "events"), "user_id",
          "event_type", "value")
        .select(col("k"), col("n_subjects"),
          round(col("alpha"), 6).as("alpha"))
    },

    // unbiased pass@k (Chen et al. 2021): problem = user, attempt
    // passes when value > 100; k = 1/5/10/200 exercises the
    // all-fail-short path, the exact product, and the k > n NULL.
    q("q_eval_passk",
      """WITH per AS MATERIALIZED (
        |  SELECT user_id AS problem, count(*)::BIGINT AS n,
        |    sum(CASE WHEN value > 100 THEN 1 ELSE 0 END)::BIGINT AS c
        |  FROM events GROUP BY 1
        |), grid AS MATERIALIZED (
        |  SELECT problem, n, c, u.k
        |  FROM per, unnest([1, 5, 10, 200]) AS u(k)
        |), terms AS (
        |  SELECT problem, k,
        |    1.0 - exp(sum(ln((n - c - i.i)::DOUBLE / (n - i.i)))) AS p
        |  FROM grid, unnest(range(0, k)) AS i(i)
        |  WHERE k <= n AND n - c >= k
        |  GROUP BY 1, 2
        |)
        |SELECT g.problem, g.k, g.n, g.c,
        |  round(CASE WHEN g.k > g.n THEN NULL
        |    WHEN g.n - g.c < g.k THEN 1.0::DOUBLE
        |    ELSE t.p END, 6) + 0.0 AS pass_at_k
        |FROM grid g LEFT JOIN terms t USING (problem, k)
        |ORDER BY problem, k""".stripMargin) { (s, dir) =>
      graft.ml.Eval.passAtK(
          t(s, dir, "events").select(col("user_id"),
            (col("value") > 100).as("ok")),
          "user_id", "ok", ks = Seq(1, 5, 10, 200))
        .select(col("problem"), col("k"), col("n"), col("c"),
          (round(col("pass_at_k"), 6) + 0.0).as("pass_at_k"))
        .orderBy("problem", "k")
    },

    // OOV rate per source against the corpus top-20 vocabulary —
    // the tokenizer-coverage read, stratum-keyed.
    q("q_text_oov",
      s"""WITH tok AS MATERIALIZED (
         |  SELECT source, u.t AS tk FROM (
         |    SELECT source, list_filter(string_split($normSql, ' '),
         |      t -> t <> '') AS ws FROM documents), unnest(ws) AS u(t)
         |), vocab AS MATERIALIZED (
         |  SELECT tk FROM (
         |    SELECT tk, row_number() OVER (ORDER BY count(*) DESC, tk)
         |      AS r
         |    FROM tok GROUP BY tk
         |  ) WHERE r <= 20
         |), cnt AS (
         |  SELECT source AS stratum, tk, count(*)::BIGINT AS c
         |  FROM tok GROUP BY 1, 2
         |)
         |SELECT stratum, sum(c)::BIGINT AS n_tokens,
         |  sum(CASE WHEN v.tk IS NULL THEN c ELSE 0 END)::BIGINT
         |    AS n_oov,
         |  round(sum(CASE WHEN v.tk IS NULL THEN c ELSE 0 END)
         |    * 1.0::DOUBLE / sum(c), 6) AS oov_rate
         |FROM cnt LEFT JOIN vocab v USING (tk)
         |GROUP BY 1 ORDER BY stratum""".stripMargin) { (s, dir) =>
      import graft.ml.TextAnalysis
      val docs = t(s, dir, "documents")
      val counts = docs
        .select(explode(TextAnalysis.tokens(
          TextAnalysis.normalize(col("text")))).as("tk"))
        .filter(col("tk") =!= "")
        .groupBy("tk").agg(count(lit(1)).as("n"))
      val vocab = counts.orderBy(col("n").desc, col("tk")).limit(20)
      TextAnalysis.oovRate(docs, "source", "text", vocab, "tk")
        .select(col("stratum"), col("n_tokens"), col("n_oov"),
          round(col("oov_rate"), 6).as("oov_rate"))
        .orderBy("stratum")
    },

    // orthogonal Procrustes alignment: the b-space is the a-space
    // under a known rotation+sign-flip permutation; the gate pins
    // the recovery contract (mean cosine of aligned-vs-target ≈ 1,
    // WᵀW ≈ I) — the SVD itself is driver-side and spec-tested.
    q("q_embed_procrustes",
      """SELECT count(*)::BIGINT AS n_pairs, 1.0::DOUBLE AS mean_cos,
        |  0.0::DOUBLE AS orth_err, true AS recovered
        |FROM embeddings""".stripMargin) { (s, dir) =>
      import s.implicits._
      val dim = 64
      val signs = Array.tabulate(dim)(j => if (j % 2 == 1) -1f else 1f)
      val base = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("a"))
        .as[(Long, Array[Float])]
      val pairs = base.map { case (id, x) =>
        val y = Array.tabulate(dim)(j => x((j + 7) % dim) * signs(j))
        (id, x, y)
      }.toDF("id", "a", "b")
      val w = graft.ml.Similarity.procrustesAlign(pairs, "a", "b", dim)
      var orthErr = 0.0
      var i = 0
      while (i < dim) {
        var j = 0
        while (j < dim) {
          var sdot = 0.0
          var k = 0
          while (k < dim) { sdot += w(k)(i) * w(k)(j); k += 1 }
          val target = if (i == j) 1.0 else 0.0
          orthErr = math.max(orthErr, math.abs(sdot - target))
          j += 1
        }
        i += 1
      }
      val aligned = graft.ml.Similarity.applyAlign(
        pairs.select(col("id"), col("a").as("vec")), "id", "vec", w)
      aligned
        .join(pairs.select(col("id"), col("b")), "id")
        .agg(count(lit(1)).as("n_pairs"),
          avg(graft.ml.Similarity.cosine(col("vec"), col("b")))
            .as("mc"))
        .select(col("n_pairs"),
          (round(col("mc"), 4) + 0.0).as("mean_cos"),
          (round(lit(orthErr), 4) + 0.0).as("orth_err"),
          (col("mc") >= 0.999 && lit(orthErr) < 1e-4).as("recovered"))
    },

    // seasonal-adjusted anomaly flags on the hourly count series:
    // q_events_seasonal's decomposition + a global residual-sigma
    // standardization, |z| > 3.
    q("q_events_anomaly",
      """WITH c AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS bucket,
        |    count(*) AS y
        |  FROM events GROUP BY 1
        |), tr AS (
        |  SELECT bucket, y, bucket % 24 AS phase,
        |    avg(y) OVER (ORDER BY bucket
        |      ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS trend
        |  FROM c
        |), pm AS (
        |  SELECT phase, avg(y - trend) AS s_raw FROM tr GROUP BY 1
        |), ctr AS (SELECT avg(s_raw) AS s_mean FROM pm),
        |dec AS MATERIALIZED (
        |  SELECT bucket, phase, y, trend,
        |    s_raw - s_mean AS seasonal,
        |    y - trend - (s_raw - s_mean) AS residual
        |  FROM tr JOIN pm USING (phase) CROSS JOIN ctr
        |), sd AS (SELECT stddev_pop(residual) AS sigma FROM dec)
        |SELECT bucket, phase, y,
        |  round(residual, 6) + 0.0 AS residual,
        |  round(CASE WHEN sigma > 0 THEN residual / sigma
        |    ELSE 0.0 END, 6) + 0.0 AS zscore,
        |  CASE WHEN sigma > 0 THEN abs(residual / sigma) > 3.0
        |    ELSE false END AS is_anomaly
        |FROM dec CROSS JOIN sd ORDER BY bucket""".stripMargin) {
      (s, dir) =>
      val raw = t(s, dir, "events")
      Events.seasonalAnomalies(
          raw.withColumn("sec", graft.core.Ts.seconds(raw)),
          "sec", periodSec = 3600L, seasonLen = 24, zThreshold = 3.0)
        .select(col("bucket"), col("phase"), col("y"),
          (round(col("residual"), 6) + 0.0).as("residual"),
          (round(col("zscore"), 6) + 0.0).as("zscore"),
          col("is_anomaly"))
        .orderBy("bucket")
    },

    // expected reciprocal rank (cascade model) over the same
    // retrieval setup as q_eval_ndcg: top-20 cosine ranking, binary
    // label-match relevance (maxGrade 1).
    q("q_eval_err",
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
        |  SELECT qid, rel, row_number() OVER (PARTITION BY qid
        |    ORDER BY score DESC, cid) AS r
        |  FROM top
        |), rr AS (
        |  SELECT qid, r, (pow(2.0, rel) - 1) / 2.0 AS rv FROM ranked
        |), w AS (
        |  SELECT qid, r, rv,
        |    coalesce(sum(CASE WHEN rv >= 1.0 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY qid ORDER BY r
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS satb,
        |    coalesce(sum(CASE WHEN rv < 1.0 THEN ln(1.0 - rv)
        |        ELSE 0.0 END)
        |      OVER (PARTITION BY qid ORDER BY r
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
        |      AS lsv
        |  FROM rr
        |)
        |SELECT qid AS query, count(*)::BIGINT AS n,
        |  round(sum(CASE WHEN satb > 0 THEN 0.0
        |    ELSE rv / r * exp(lsv) END), 6) + 0.0 AS err
        |FROM w GROUP BY 1 ORDER BY query""".stripMargin) { (s, dir) =>
      val ranked = rankedRetrieval(s, dir)
      graft.ml.Eval.expectedReciprocalRank(ranked, "qid", "r", "rel",
          maxGrade = 1)
        .select(col("query"), col("n"),
          (round(col("err"), 6) + 0.0).as("err"))
        .orderBy("query")
    },

    // rank-biased precision (persistence 0.8) over the same ranking.
    q("q_eval_rbp",
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
        |  SELECT qid, rel, row_number() OVER (PARTITION BY qid
        |    ORDER BY score DESC, cid) AS r
        |  FROM top
        |)
        |SELECT qid AS query, count(*)::BIGINT AS n,
        |  round(0.2 * sum(rel * pow(0.8, r - 1)), 6) + 0.0 AS rbp
        |FROM ranked GROUP BY 1 ORDER BY query""".stripMargin) {
      (s, dir) =>
      val ranked = rankedRetrieval(s, dir)
      graft.ml.Eval.rankBiasedPrecision(ranked, "qid", "r", "rel",
          p = 0.8)
        .select(col("query"), col("n"),
          (round(col("rbp"), 6) + 0.0).as("rbp"))
        .orderBy("query")
    },

    // query-likelihood retrieval with Dirichlet smoothing (μ=1000)
    // for the 2-term query — candidate × term grid so absent terms
    // contribute their smoothing mass, full score replay.
    q("q_text_qld",
      s"""WITH tk AS MATERIALIZED (
         |  SELECT doc_id, string_split($normSql, ' ') AS ws
         |  FROM documents
         |), base AS MATERIALIZED (
         |  SELECT doc_id, len(ws)::BIGINT AS dl, u.t AS tok
         |  FROM tk, unnest(ws) AS u(t) WHERE u.t <> ''
         |), ctot AS (SELECT count(*)::DOUBLE AS c_tokens FROM base),
         |cf AS MATERIALIZED (
         |  SELECT tok, count(*)::DOUBLE AS cf FROM base
         |  WHERE tok IN ('fast', 'table') GROUP BY 1
         |), tf AS MATERIALIZED (
         |  SELECT doc_id, dl, tok, count(*)::DOUBLE AS tf FROM base
         |  WHERE tok IN ('fast', 'table') GROUP BY 1, 2, 3
         |), cand AS (SELECT DISTINCT doc_id, dl FROM tf),
         |grid AS (
         |  SELECT c.doc_id, c.dl, q.tok,
         |    coalesce(tf.tf, 0.0) AS tf, coalesce(cf.cf, 0.0) AS cf
         |  FROM cand c
         |  CROSS JOIN (SELECT unnest(['fast', 'table']) AS tok) q
         |  LEFT JOIN tf ON tf.doc_id = c.doc_id AND tf.tok = q.tok
         |  LEFT JOIN cf ON cf.tok = q.tok
         |), sc AS (
         |  SELECT doc_id, sum(ln((tf + 1000.0 * (cf / c_tokens))
         |    / (dl + 1000.0))) AS ql
         |  FROM grid CROSS JOIN ctot
         |  WHERE cf > 0 OR tf > 0
         |  GROUP BY 1
         |), rk AS (
         |  SELECT doc_id, ql,
         |    row_number() OVER (ORDER BY ql DESC, doc_id) AS r
         |  FROM sc
         |)
         |SELECT doc_id, round(ql, 6) AS ql FROM rk WHERE r <= 10
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.ml.TextIndex.queryLikelihood(t(s, dir, "documents"),
          "doc_id", "text", Seq("fast", "table"), mu = 1000.0,
          topK = 10)
        .select(col("doc_id"), round(col("ql"), 6).as("ql"))
        .orderBy("doc_id")
    },

    // MMR diversified top-4 (λ=0.7) over the 10-candidate cosine
    // shortlist — the greedy argmax unrolled as one CTE level per
    // pick. The gate quantizes vectors to integers (×1000,
    // round-half-up) so every dot/norm is an EXACT integer sum
    // (order-free in double) and both engines' cosines are
    // bit-identical: no 1e-6-boundary flakes in the selection; the
    // oracle also spells (1 - 0.7), never 0.3, matching the
    // kernel's float tree exactly.
    q("q_embed_mmr", {
      val steps = (2 to 4).map { r =>
        val prev = s"picked${r - 1}"
        s"""r$r AS (
           |  SELECT c.qid, c.cid, c.rel,
           |    0.7 * c.rel - (1 - 0.7) * max(s.s) AS mmr
           |  FROM cand c
           |  JOIN sim s ON s.qid = c.qid AND s.x = c.cid
           |  JOIN $prev p ON p.qid = s.qid AND p.cid = s.y
           |  WHERE NOT EXISTS (SELECT 1 FROM $prev e
           |    WHERE e.qid = c.qid AND e.cid = c.cid)
           |  GROUP BY 1, 2, 3
           |), p$r AS MATERIALIZED (
           |  SELECT qid, cid, rel, mmr FROM r$r
           |  QUALIFY row_number() OVER (PARTITION BY qid
           |    ORDER BY mmr DESC, cid) = 1
           |), picked$r AS MATERIALIZED (
           |  SELECT qid, cid FROM picked${r - 1}
           |  UNION ALL SELECT qid, cid FROM p$r
           |)""".stripMargin
      }
      val out = (1 to 4).map(r =>
        s"SELECT qid, $r AS rank, cid, rel, mmr FROM p$r")
        .mkString(" UNION ALL ")
      s"""WITH eq AS MATERIALIZED (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> floor(CAST(x AS DOUBLE) * 1000 + 0.5)) AS v
         |  FROM embeddings
         |), dots AS MATERIALIZED (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    sum(q.v[u.i] * c.v[u.i]) AS dot,
         |    sum(q.v[u.i] * q.v[u.i]) AS sa,
         |    sum(c.v[u.i] * c.v[u.i]) AS sb
         |  FROM eq q JOIN eq c
         |    ON q.vec_id < 10 AND c.vec_id <> q.vec_id,
         |    unnest(range(1, len(q.v) + 1)) AS u(i)
         |  GROUP BY 1, 2
         |), cand AS MATERIALIZED (
         |  SELECT qid, cid,
         |    dot / (sqrt(CAST(sa AS DOUBLE)) * sqrt(CAST(sb AS DOUBLE)))
         |      AS rel
         |  FROM dots
         |  QUALIFY row_number() OVER (PARTITION BY qid
         |    ORDER BY dot / (sqrt(CAST(sa AS DOUBLE))
         |      * sqrt(CAST(sb AS DOUBLE))) DESC, cid) <= 10
         |), simd AS MATERIALIZED (
         |  SELECT a.qid, a.cid AS x, b.cid AS y,
         |    sum(ea.v[u.i] * eb.v[u.i]) AS dot,
         |    sum(ea.v[u.i] * ea.v[u.i]) AS sa,
         |    sum(eb.v[u.i] * eb.v[u.i]) AS sb
         |  FROM cand a JOIN cand b ON a.qid = b.qid AND a.cid <> b.cid
         |  JOIN eq ea ON ea.vec_id = a.cid
         |  JOIN eq eb ON eb.vec_id = b.cid,
         |  unnest(range(1, len(ea.v) + 1)) AS u(i)
         |  GROUP BY 1, 2, 3
         |), sim AS MATERIALIZED (
         |  SELECT qid, x, y, floor(dot / (sqrt(CAST(sa AS DOUBLE))
         |    * sqrt(CAST(sb AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS s
         |  FROM simd
         |), p1 AS MATERIALIZED (
         |  SELECT qid, cid, rel, 0.7 * rel AS mmr FROM cand
         |  QUALIFY row_number() OVER (PARTITION BY qid
         |    ORDER BY rel DESC, cid) = 1
         |), picked1 AS MATERIALIZED (SELECT qid, cid FROM p1),
         |${steps.mkString(", ")}
         |SELECT qid AS query, rank, cid AS id,
         |  floor(rel * 1e6 + 0.5) / 1e6 AS rel,
         |  floor(mmr * 1e6 + 0.5) / 1e6 AS mmr
         |FROM ($out)
         |ORDER BY query, rank""".stripMargin
    }) { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"),
          transform(col("embedding"),
            x => floor(x.cast("double") * 1000 + lit(0.5)))
            .cast("array<float>").as("vec"))
      val shortlist = graft.ml.Similarity.bruteForceTopK(
          e.filter(col("id") < 10), e, 10)
        .select(col("qid"), col("cid"), col("cos").as("rel"))
        .join(e.select(col("id").as("cid"), col("vec")), "cid")
      graft.ml.Similarity.mmrSelect(shortlist, "qid", "cid", "rel",
          "vec", k = 4, lambda = 0.7)
        .select(col("query"), col("rank"), col("id"),
          (floor(col("rel") * 1e6 + 0.5) / 1e6).as("rel"),
          (floor(col("mmr") * 1e6 + 0.5) / 1e6).as("mmr"))
        .orderBy("query", "rank")
    },

    // SCD Type 2 history: event_type observation runs per user
    // collapsed into validity intervals — full lag/lead replay.
    q("q_events_scd2",
      """WITH e AS (
        |  SELECT user_id AS key, event_type AS value,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id AS obs
        |  FROM events
        |), r AS (
        |  SELECT key, value, sec, obs,
        |    row_number() OVER w AS rn, lag(value) OVER w AS prev
        |  FROM e WINDOW w AS (PARTITION BY key ORDER BY sec, obs)
        |), ch AS MATERIALIZED (
        |  SELECT * FROM r WHERE rn = 1 OR prev IS DISTINCT FROM value
        |)
        |SELECT key, value,
        |  row_number() OVER w2 AS version,
        |  sec AS valid_from, lead(sec) OVER w2 AS valid_to
        |FROM ch WINDOW w2 AS (PARTITION BY key ORDER BY sec, obs)
        |ORDER BY key, version""".stripMargin) { (s, dir) =>
      val raw = t(s, dir, "events")
      Events.scd2(raw.withColumn("sec", graft.core.Ts.seconds(raw)),
          "user_id", "event_type", "sec", "event_id")
        .select(col("key"), col("value"),
          col("version").cast("long").as("version"),
          col("valid_from"), col("valid_to"))
        .orderBy("key", "version")
    },

    // temporal AS-OF lookup against the SCD2 dimension: every event
    // resolves to the version whose interval contains it.
    q("q_events_scd2_lookup",
      """WITH e AS (
        |  SELECT user_id AS key, event_type AS value,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id AS obs
        |  FROM events
        |), r AS (
        |  SELECT key, value, sec, obs,
        |    row_number() OVER w AS rn, lag(value) OVER w AS prev
        |  FROM e WINDOW w AS (PARTITION BY key ORDER BY sec, obs)
        |), ch AS MATERIALIZED (
        |  SELECT * FROM r WHERE rn = 1 OR prev IS DISTINCT FROM value
        |), dim AS MATERIALIZED (
        |  SELECT key, value, row_number() OVER w2 AS version,
        |    sec AS valid_from, lead(sec) OVER w2 AS valid_to
        |  FROM ch WINDOW w2 AS (PARTITION BY key ORDER BY sec, obs)
        |)
        |SELECT f.obs AS event_id, d.version, d.value
        |FROM e f LEFT JOIN dim d ON f.key = d.key
        |  AND f.sec >= d.valid_from
        |  AND (d.valid_to IS NULL OR f.sec < d.valid_to)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val raw = t(s, dir, "events")
      val withSec = raw.withColumn("sec", graft.core.Ts.seconds(raw))
      val dim = Events.scd2(withSec, "user_id", "event_type", "sec",
        "event_id")
      Events.scd2Lookup(
          withSec.select(col("event_id"),
            col("user_id"), col("sec")),
          dim.withColumnRenamed("key", "key")
            .select(col("key"), col("value"),
              col("version").cast("long").as("version"),
              col("valid_from"), col("valid_to")),
          "user_id", "sec")
        .select(col("event_id"), col("version"), col("value"))
        .orderBy("event_id")
    },

    // position-bias (examination) curve from synthesized impression
    // logs: rank-1-normalized CTR under the position-based model.
    q("q_eval_position_bias",
      """WITH logs AS (
        |  SELECT 1 + event_id % 10 AS rank, value > 150 AS clicked
        |  FROM events
        |), per AS (
        |  SELECT rank::BIGINT AS rank, count(*)::BIGINT AS n,
        |    sum(CASE WHEN clicked THEN 1 ELSE 0 END)::BIGINT AS clicks
        |  FROM logs GROUP BY 1
        |), top AS (
        |  SELECT clicks * 1.0::DOUBLE / n AS ctr1 FROM per
        |  WHERE rank = 1
        |)
        |SELECT rank, n, clicks,
        |  round(clicks * 1.0::DOUBLE / n, 6) AS ctr,
        |  round(CASE WHEN ctr1 > 0
        |    THEN (clicks * 1.0::DOUBLE / n) / ctr1 END, 6) AS propensity
        |FROM per CROSS JOIN top ORDER BY rank""".stripMargin) {
      (s, dir) =>
      graft.ml.Eval.positionBias(
          t(s, dir, "events").select(
            (lit(1) + col("event_id") % 10).as("rank"),
            (col("value") > 150).as("clicked")),
          "rank", "clicked")
        .select(col("rank"), col("n"), col("clicks"),
          round(col("ctr"), 6).as("ctr"),
          round(col("propensity"), 6).as("propensity"))
        .orderBy("rank")
    },

    // IPS counterfactual value of a synthetic new ranking against
    // the same logged clicks, k = 10 — the offline "would the new
    // ranker have earned these clicks" number.
    q("q_eval_ips",
      """WITH logs AS MATERIALIZED (
        |  SELECT user_id % 20 AS query, event_id % 50 AS doc,
        |    (1 + event_id % 10)::BIGINT AS rank,
        |    value > 150 AS clicked
        |  FROM events
        |), per AS MATERIALIZED (
        |  SELECT rank, count(*)::BIGINT AS n,
        |    sum(CASE WHEN clicked THEN 1 ELSE 0 END)::BIGINT AS clicks
        |  FROM logs GROUP BY 1
        |), prop AS MATERIALIZED (
        |  SELECT rank, (clicks * 1.0::DOUBLE / n) /
        |    (SELECT clicks * 1.0::DOUBLE / n FROM per WHERE rank = 1)
        |    AS propensity
        |  FROM per
        |), nr AS MATERIALIZED (
        |  SELECT DISTINCT query, doc,
        |    (1 + (doc * 7 + query) % 25)::BIGINT AS new_rank
        |  FROM logs
        |), ck AS (
        |  SELECT l.query, l.doc, l.rank FROM logs l WHERE clicked
        |)
        |SELECT count(*)::BIGINT AS n_clicks,
        |  round(sum(CASE WHEN nr.new_rank IS NOT NULL
        |      AND nr.new_rank <= 10 AND p.propensity > 0
        |      THEN 1.0 / p.propensity ELSE 0.0 END) / count(*), 6)
        |    AS ips_value,
        |  sum(CASE WHEN nr.new_rank IS NOT NULL AND nr.new_rank <= 10
        |    THEN 1 ELSE 0 END)::BIGINT AS matched_clicks
        |FROM ck LEFT JOIN prop p USING (rank)
        |LEFT JOIN nr ON nr.query = ck.query AND nr.doc = ck.doc"""
        .stripMargin) { (s, dir) =>
      val logs = t(s, dir, "events").select(
        (col("user_id") % 20).as("query"),
        (col("event_id") % 50).as("doc"),
        (lit(1) + col("event_id") % 10).cast("long").as("rank"),
        (col("value") > 150).as("clicked"))
      val prop = graft.ml.Eval.positionBias(logs, "rank", "clicked")
      val newRanks = logs.select("query", "doc").distinct()
        .withColumn("new_rank",
          (lit(1) + (col("doc") * 7 + col("query")) % 25).cast("long"))
      graft.ml.Eval.ipsValue(logs, newRanks, prop, k = 10)
        .select(col("n_clicks"),
          round(col("ips_value"), 6).as("ips_value"),
          col("matched_clicks"))
    },

    // team-draft interleaving of two overlapping top-8 rankings
    // (md5 per-round coin) — the draft unrolled pick-by-pick with
    // the picked-set cap, bit-exact on both engines.
    q("q_eval_interleave", {
      val levels = (1 to 8).flatMap { r =>
        val c = s"(CASE WHEN strpos('02468ace', " +
          s"substring(md5('0|$r'), 1, 1)) > 0 THEN 'A' ELSE 'B' END)"
        Seq(
          s"""pk${2 * r - 1} AS MATERIALIZED (
             |  SELECT doc, team, ${2 * r - 1} AS lvl FROM ranks
             |  WHERE team = $c
             |    AND doc NOT IN (SELECT doc FROM picked${2 * r - 2})
             |    AND (SELECT count(*) FROM picked${2 * r - 2}) < 8
             |  ORDER BY rank, doc LIMIT 1
             |)""".stripMargin,
          s"""picked${2 * r - 1} AS MATERIALIZED (
             |  SELECT * FROM picked${2 * r - 2}
             |  UNION ALL SELECT * FROM pk${2 * r - 1}
             |)""".stripMargin,
          s"""pk${2 * r} AS MATERIALIZED (
             |  SELECT doc, team, ${2 * r} AS lvl FROM ranks
             |  WHERE team <> $c
             |    AND doc NOT IN (SELECT doc FROM picked${2 * r - 1})
             |    AND (SELECT count(*) FROM picked${2 * r - 1}) < 8
             |  ORDER BY rank, doc LIMIT 1
             |)""".stripMargin,
          s"""picked${2 * r} AS MATERIALIZED (
             |  SELECT * FROM picked${2 * r - 1}
             |  UNION ALL SELECT * FROM pk${2 * r}
             |)""".stripMargin)
      }
      s"""WITH ra AS (
         |  SELECT doc_id AS doc,
         |    row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rank
         |  FROM documents QUALIFY rank <= 8
         |), rb AS (
         |  SELECT doc_id AS doc,
         |    row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rank
         |  FROM documents WHERE doc_id % 2 = 0 QUALIFY rank <= 8
         |), ranks AS MATERIALIZED (
         |  SELECT doc, rank, 'A' AS team FROM ra
         |  UNION ALL SELECT doc, rank, 'B' FROM rb
         |), picked0 AS MATERIALIZED (
         |  SELECT NULL::BIGINT AS doc, NULL::VARCHAR AS team,
         |    0 AS lvl WHERE false
         |), ${levels.mkString(", ")}
         |SELECT 0::BIGINT AS query,
         |  row_number() OVER (ORDER BY lvl) AS pos, doc, team
         |FROM picked16 ORDER BY pos""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      val docs = t(s, dir, "documents")
      // bounded-PQ top-8 (never a raw global window): per the
      // sortedTake pattern, largest n_chars first, doc_id tie-break
      implicit val byLenDesc: Ordering[(Long, Long)] =
        Ordering.by((t: (Long, Long)) => (-t._1, t._2))(
          Ordering.Tuple2(Ordering.Long, Ordering.Long))
      def top8(df: org.apache.spark.sql.DataFrame) = {
        val keyed = df
          .select(col("n_chars").cast("long"), col("doc_id"))
          .as[(Long, Long)].map(t => (0L, t))
        new graft.typed.Grouped(keyed).sortedTake(8).ds
          .flatMap { case (_, tops) =>
            tops.zipWithIndex.map { case ((_, id), i) =>
              (0L, id, (i + 1).toLong)
            }
          }
          .toDF("query", "doc", "rank")
      }
      graft.ml.Eval.teamDraftInterleave(top8(docs),
          top8(docs.filter(col("doc_id") % 2 === 0)),
          "query", "doc", "rank", depth = 8)
        .orderBy("pos")
    },

    // item-item cosine neighbors (related items) from co-purchase
    // counts, top-5 per item — exact integer-count cosines, so the
    // per-item ranking replays bit-identically.
    q("q_assoc_item_cosine",
      """WITH inc AS (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
        |), ic AS (SELECT i, count(*)::BIGINT AS n FROM inc GROUP BY 1
        |), p AS (
        |  SELECT a.i AS ia, c.i AS ib, count(*)::BIGINT AS n_ab
        |  FROM inc a JOIN inc c ON a.b = c.b AND a.i < c.i
        |  GROUP BY 1, 2 HAVING count(*) >= 2
        |), sym AS (
        |  SELECT p.ia AS item, p.ib AS neighbor, x.n AS n_a,
        |    y.n AS n_b, p.n_ab
        |  FROM p JOIN ic x ON p.ia = x.i JOIN ic y ON p.ib = y.i
        |  UNION ALL
        |  SELECT p.ib, p.ia, y.n, x.n, p.n_ab
        |  FROM p JOIN ic x ON p.ia = x.i JOIN ic y ON p.ib = y.i
        |), rk AS (
        |  SELECT item, neighbor, n_ab,
        |    n_ab::DOUBLE / sqrt(n_a::DOUBLE * n_b) AS cosine,
        |    row_number() OVER (PARTITION BY item
        |      ORDER BY n_ab::DOUBLE / sqrt(n_a::DOUBLE * n_b) DESC,
        |        neighbor) AS r
        |  FROM sym
        |)
        |SELECT item, neighbor, n_ab, round(cosine, 6) AS cosine
        |FROM rk WHERE r <= 5
        |ORDER BY item, neighbor""".stripMargin) { (s, dir) =>
      graft.ml.Associations.itemCosineNeighbors(
          t(s, dir, "lineitem")
            .select(col("l_orderkey"), col("l_partkey")),
          "l_orderkey", "l_partkey", topK = 5, minSupport = 2L)
        .select(col("item"), col("neighbor"), col("n_ab"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("item", "neighbor")
    },

    // hubness diagnostic of the embedding space: k-occurrence
    // skewness at k = 10 over the self-kNN of the BOUNDED
    // deterministic sample vec_id < 2000 (the whole table at sf0.01;
    // hubness is a distributional diagnostic, so a fixed-size sample
    // answers it at every scale — the sf1 probe measured the
    // unbounded brute self-kNN at 429 s, the n-squared shape).
    q("q_embed_hubness",
      """WITH knn AS MATERIALIZED (
        |  SELECT q.vec_id AS qid, c.vec_id AS cid
        |  FROM embeddings q JOIN embeddings c
        |    ON q.vec_id <> c.vec_id AND q.vec_id < 2000
        |      AND c.vec_id < 2000
        |  QUALIFY row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(
        |      CAST(q.embedding AS DOUBLE[]),
        |      CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) <= 10
        |), occ AS (
        |  SELECT cid AS id, count(*)::BIGINT AS nk FROM knn GROUP BY 1
        |), allp AS (
        |  SELECT coalesce(occ.nk, 0)::DOUBLE AS nk
        |  FROM embeddings e LEFT JOIN occ ON occ.id = e.vec_id
        |  WHERE e.vec_id < 2000
        |), m AS (
        |  SELECT count(*)::BIGINT AS n, avg(nk) AS m,
        |    stddev_pop(nk) AS sd, avg(nk * nk * nk) AS m3raw,
        |    avg(nk * nk) AS m2raw
        |  FROM allp
        |)
        |SELECT 10::BIGINT AS k, n, round(m, 6) AS mean_nk,
        |  round(CASE WHEN sd > 0 THEN
        |    (m3raw - 3 * m * m2raw + 2 * m * m * m) / (sd * sd * sd)
        |    END, 6) + 0.0 AS skewness
        |FROM m""".stripMargin) { (s, dir) =>
      graft.ml.Similarity.hubness(
          t(s, dir, "embeddings").filter(col("vec_id") < 2000)
            .select(col("vec_id").as("id"),
              col("embedding").as("vec")), k = 10)
        .select(col("k").cast("long").as("k"), col("n"),
          round(col("mean_nk"), 6).as("mean_nk"),
          (round(col("skewness"), 6) + 0.0).as("skewness"))
    },

    // RBF-kernel MMD² between the label<5 and label≥5 embedding
    // SAMPLES — the bounded-sample contract is explicit in the gate
    // (vec_id < 1000; the whole table at sf0.01): the sf1 probe
    // measured the unbounded all-pairs grid at 45 s, the quadratic
    // shape the operator's own doc warns about. σ = 2.
    q("q_embed_mmd",
      """WITH x AS (SELECT embedding AS v FROM embeddings
        |  WHERE label < 5 AND vec_id < 1000),
        |y AS (SELECT embedding AS v FROM embeddings
        |  WHERE label >= 5 AND vec_id < 1000),
        |kxx AS (
        |  SELECT avg(exp(-(list_inner_product(CAST(a.v AS DOUBLE[]),
        |      CAST(a.v AS DOUBLE[]))
        |    + list_inner_product(CAST(b.v AS DOUBLE[]),
        |      CAST(b.v AS DOUBLE[]))
        |    - 2 * list_inner_product(CAST(a.v AS DOUBLE[]),
        |      CAST(b.v AS DOUBLE[]))) / (2 * 2.0 * 2.0))) AS kxx
        |  FROM x a CROSS JOIN x b
        |), kyy AS (
        |  SELECT avg(exp(-(list_inner_product(CAST(a.v AS DOUBLE[]),
        |      CAST(a.v AS DOUBLE[]))
        |    + list_inner_product(CAST(b.v AS DOUBLE[]),
        |      CAST(b.v AS DOUBLE[]))
        |    - 2 * list_inner_product(CAST(a.v AS DOUBLE[]),
        |      CAST(b.v AS DOUBLE[]))) / (2 * 2.0 * 2.0))) AS kyy
        |  FROM y a CROSS JOIN y b
        |), kxy AS (
        |  SELECT avg(exp(-(list_inner_product(CAST(a.v AS DOUBLE[]),
        |      CAST(a.v AS DOUBLE[]))
        |    + list_inner_product(CAST(b.v AS DOUBLE[]),
        |      CAST(b.v AS DOUBLE[]))
        |    - 2 * list_inner_product(CAST(a.v AS DOUBLE[]),
        |      CAST(b.v AS DOUBLE[]))) / (2 * 2.0 * 2.0))) AS kxy
        |  FROM x a CROSS JOIN y b
        |), nx AS (SELECT count(*)::BIGINT AS n_x FROM x),
        |ny AS (SELECT count(*)::BIGINT AS n_y FROM y)
        |SELECT n_x, n_y, round(kxx, 6) AS kxx, round(kyy, 6) AS kyy,
        |  round(kxy, 6) AS kxy,
        |  round(kxx + kyy - 2 * kxy, 6) + 0.0 AS mmd2
        |FROM nx CROSS JOIN ny CROSS JOIN kxx CROSS JOIN kyy
        |CROSS JOIN kxy""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings").filter(col("vec_id") < 1000)
      graft.ml.Similarity.mmdRbf(
          e.filter(col("label") < 5).select(col("embedding").as("v")),
          e.filter(col("label") >= 5).select(col("embedding").as("v")),
          "v", sigma = 2.0)
        .select(col("n_x"), col("n_y"),
          round(col("kxx"), 6).as("kxx"),
          round(col("kyy"), 6).as("kyy"),
          round(col("kxy"), 6).as("kxy"),
          (round(col("mmd2"), 6) + 0.0).as("mmd2"))
    },

    // group-fairness audit of a threshold classifier across event
    // types: per-group rates + demographic-parity / equalized-odds
    // gaps — closed-form replay.
    q("q_eval_fairness",
      """WITH per AS MATERIALIZED (
        |  SELECT event_type AS grp, count(*)::BIGINT AS n,
        |    sum(CASE WHEN value > 100 THEN 1 ELSE 0 END)::BIGINT
        |      AS pos,
        |    sum(CASE WHEN value > 80 THEN 1 ELSE 0 END)::BIGINT
        |      AS pred_pos,
        |    sum(CASE WHEN value > 100 AND value > 80 THEN 1 ELSE 0
        |      END)::BIGINT AS tp,
        |    sum(CASE WHEN value <= 100 AND value > 80 THEN 1 ELSE 0
        |      END)::BIGINT AS fp
        |  FROM events GROUP BY 1
        |), rates AS MATERIALIZED (
        |  SELECT grp, n, pos::DOUBLE / n AS base_rate,
        |    pred_pos::DOUBLE / n AS ppr,
        |    CASE WHEN pos > 0 THEN tp::DOUBLE / pos END AS tpr,
        |    CASE WHEN n - pos > 0 THEN fp::DOUBLE / (n - pos) END
        |      AS fpr,
        |    CASE WHEN pred_pos > 0 THEN tp::DOUBLE / pred_pos END
        |      AS prec
        |  FROM per
        |), gaps AS (
        |  SELECT max(ppr) - min(ppr) AS dp_gap,
        |    greatest(coalesce(max(tpr) - min(tpr), 0.0),
        |      coalesce(max(fpr) - min(fpr), 0.0)) AS eo_gap
        |  FROM rates
        |)
        |SELECT grp, n, round(base_rate, 6) AS base_rate,
        |  round(ppr, 6) AS ppr, round(tpr, 6) AS tpr,
        |  round(fpr, 6) AS fpr, round(prec, 6) AS prec,
        |  round(dp_gap, 6) AS dp_gap, round(eo_gap, 6) AS eo_gap
        |FROM rates CROSS JOIN gaps ORDER BY grp""".stripMargin) {
      (s, dir) =>
      graft.ml.Eval.fairnessReport(
          t(s, dir, "events").select(col("event_type"),
            (col("value") > 100).as("label"),
            (col("value") > 80).as("pred")),
          "event_type", "label", "pred")
        .select(col("group").as("grp"), col("n"),
          round(col("base_rate"), 6).as("base_rate"),
          round(col("ppr"), 6).as("ppr"),
          round(col("tpr"), 6).as("tpr"),
          round(col("fpr"), 6).as("fpr"),
          round(col("precision"), 6).as("prec"),
          round(col("dp_gap"), 6).as("dp_gap"),
          round(col("eo_gap"), 6).as("eo_gap"))
        .orderBy("grp")
    },

    // LSH banding planner: choose (bands, rows) for threshold 0.8
    // under a 128-hash budget and emit the full S-curve.
    q("q_dedup_lsh_plan",
      """WITH g AS (
        |  SELECT b, 128 // b AS r
        |  FROM (SELECT unnest(range(1, 129)) AS b)
        |  WHERE 128 % b = 0
        |), t AS (
        |  SELECT b, r, pow(1.0::DOUBLE / b, 1.0::DOUBLE / r) AS t_star,
        |    abs(ln(pow(1.0::DOUBLE / b, 1.0::DOUBLE / r))
        |      - ln(0.8::DOUBLE)) AS dist
        |  FROM g
        |), best AS (
        |  SELECT b, r, t_star FROM t ORDER BY dist, b LIMIT 1
        |)
        |SELECT b::BIGINT AS bands, r::BIGINT AS rows_per,
        |  round(t_star, 6) AS t_star,
        |  round(u.i * 0.05::DOUBLE, 6) AS s,
        |  round(1.0::DOUBLE - pow(1.0::DOUBLE
        |    - pow(u.i * 0.05::DOUBLE, r), b), 6) + 0.0 AS p_candidate
        |FROM best, unnest(range(1, 20)) AS u(i)
        |ORDER BY s""".stripMargin) { (s, dir) =>
      graft.ml.Dedup.lshPlan(s, threshold = 0.8, nHashes = 128)
        .select(col("bands").cast("long").as("bands"),
          col("rows_per").cast("long").as("rows_per"),
          round(col("t_star"), 6).as("t_star"),
          round(col("s"), 6).as("s"),
          (round(col("p_candidate"), 6) + 0.0).as("p_candidate"))
        .orderBy("s")
    },

    // forecast accuracy of the STL-lite fitted values (trend +
    // seasonal) on the hourly series: MAE/RMSE/sMAPE + MASE vs the
    // 24-lag seasonal-naive — full decomposition + window replay.
    q("q_events_forecast_acc",
      """WITH c AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS bucket,
        |    count(*) AS y
        |  FROM events GROUP BY 1
        |), tr AS (
        |  SELECT bucket, y, bucket % 24 AS phase,
        |    avg(y) OVER (ORDER BY bucket
        |      ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS trend
        |  FROM c
        |), pm AS (
        |  SELECT phase, avg(y - trend) AS s_raw FROM tr GROUP BY 1
        |), ctr AS (SELECT avg(s_raw) AS s_mean FROM pm),
        |dec AS MATERIALIZED (
        |  SELECT bucket, y::DOUBLE AS y,
        |    trend + (s_raw - s_mean) AS f
        |  FROM tr JOIN pm USING (phase) CROSS JOIN ctr
        |), acc AS (
        |  SELECT d.bucket, d.y, d.f, n.y AS naive
        |  FROM dec d LEFT JOIN dec n ON n.bucket = d.bucket - 24
        |)
        |SELECT 'all' AS key, count(*)::BIGINT AS n,
        |  round(avg(abs(y - f)), 6) AS mae,
        |  round(sqrt(avg((y - f) * (y - f))), 6) AS rmse,
        |  round(avg(CASE WHEN abs(y) + abs(f) > 0
        |    THEN 2.0 * abs(y - f) / (abs(y) + abs(f))
        |    ELSE 0.0 END), 6) AS smape,
        |  round(avg(CASE WHEN naive IS NOT NULL
        |    THEN abs(y - naive) END), 6) AS naive_mae,
        |  round(CASE WHEN avg(CASE WHEN naive IS NOT NULL
        |      THEN abs(y - naive) END) > 0
        |    THEN avg(abs(y - f)) / avg(CASE WHEN naive IS NOT NULL
        |      THEN abs(y - naive) END) END, 6) AS mase
        |FROM acc""".stripMargin) { (s, dir) =>
      val raw = t(s, dir, "events")
      val dec = Events.seasonalDecompose(
        raw.withColumn("sec", graft.core.Ts.seconds(raw)),
        "sec", periodSec = 3600L, seasonLen = 24)
      Events.forecastAccuracy(
          dec.select(lit("all").as("key"), col("bucket"),
            col("y").cast("double").as("y"),
            (col("trend") + col("seasonal")).as("f")),
          "key", "bucket", "y", "f", seasonLen = 24)
        .select(col("key"), col("n"),
          round(col("mae"), 6).as("mae"),
          round(col("rmse"), 6).as("rmse"),
          round(col("smape"), 6).as("smape"),
          round(col("naive_mae"), 6).as("naive_mae"),
          round(col("mase"), 6).as("mase"))
    },

    // tokenizer fertility per source (tokens-per-word and bytes-per-
    // token) under the deterministic 3-char-chunk tokenizer — the
    // cross-language cost sheet a vocab ships with.
    q("q_text_fertility",
      s"""WITH d AS (
         |  SELECT source, $normSql AS norm,
         |    strlen(text)::BIGINT AS n_bytes
         |  FROM documents
         |), p AS (
         |  SELECT source, n_bytes,
         |    len(list_filter(string_split_regex(
         |      regexp_replace(norm, '(\\S{3})', '\\1' || chr(1), 'g'),
         |      '[ ' || chr(1) || ']+'), t -> t <> ''))::BIGINT
         |      AS n_pieces,
         |    len(list_filter(string_split(norm, ' '),
         |      t -> t <> ''))::BIGINT AS n_words
         |  FROM d
         |)
         |SELECT source AS stratum, count(*)::BIGINT AS n_docs,
         |  sum(n_pieces)::BIGINT AS n_pieces,
         |  sum(n_words)::BIGINT AS n_words,
         |  sum(n_bytes)::BIGINT AS n_bytes,
         |  round(CASE WHEN sum(n_words) > 0
         |    THEN sum(n_pieces)::DOUBLE / sum(n_words) END, 6)
         |    AS fertility,
         |  round(CASE WHEN sum(n_pieces) > 0
         |    THEN sum(n_bytes)::DOUBLE / sum(n_pieces) END, 6)
         |    AS bytes_per_token
         |FROM p GROUP BY 1 ORDER BY stratum""".stripMargin) {
      (s, dir) =>
      import graft.ml.TextAnalysis
      val norm = TextAnalysis.normalize(col("text"))
      val encoded = t(s, dir, "documents")
        .withColumn("pieces", array_remove(
          split(regexp_replace(norm, "(\\S{3})", "$1\u0001"),
            "[ \u0001]+"), ""))
      TextAnalysis.fertilityReport(encoded, "source", "text", "pieces")
        .select(col("stratum"), col("n_docs"), col("n_pieces"),
          col("n_words"), col("n_bytes"),
          round(col("fertility"), 6).as("fertility"),
          round(col("bytes_per_token"), 6).as("bytes_per_token"))
        .orderBy("stratum")
    },

    // closed-form ridge regression recovers a planted linear signal
    // (y = 3 + 2·x1 − x2 + tiny md5 noise): one normal-equation
    // moments pass + driver solve; the gate pins the recovered
    // coefficients and R² (contract oracle — the solve is driver-
    // side and spec-tested exactly).
    q("q_eval_ridge",
      """SELECT count(*)::BIGINT AS n, 3.0::DOUBLE AS intercept,
        |  2.0::DOUBLE AS w_x1, -1.0::DOUBLE AS w_x2,
        |  1.0::DOUBLE AS r2
        |FROM events""".stripMargin) { (s, dir) =>
      val feats = t(s, dir, "events").select(
        ((col("event_id") % 100) / 10.0).as("x1"),
        (col("user_id") % 7).cast("double").as("x2"),
        ((conv(substring(md5(col("event_id").cast("string")), 1, 8),
          16, 10).cast("double") / 4294967296.0 - 0.5) * 0.01)
          .as("noise"))
        .withColumn("y",
          lit(3.0) + lit(2.0) * col("x1") - col("x2") + col("noise"))
      val model = graft.ml.Regression.ridgeFit(feats, Seq("x1", "x2"),
        "y", lambda = 0.0)
      graft.ml.Regression.r2Report(feats, Seq("x1", "x2"), "y", model)
        .select(col("n"),
          round(lit(model.intercept), 2).as("intercept"),
          round(lit(model.weights(0)), 2).as("w_x1"),
          round(lit(model.weights(1)), 2).as("w_x2"),
          round(col("r2"), 4).as("r2"))
    },

    // skip-gram (center, context) pair counts, window ±2, word2vec
    // frequent-word subsampling with the deterministic md5(doc|pos)
    // coin — full keep-decision + offset-join replay.
    q("q_text_skipgram",
      s"""WITH tok AS MATERIALIZED (
         |  SELECT doc, u.i - 1 AS pos, ws[u.i] AS w
         |  FROM (SELECT doc_id AS doc, string_split($normSql, ' ')
         |    AS ws FROM documents),
         |    unnest(range(1, len(ws) + 1)) AS u(i)
         |  WHERE ws[u.i] <> ''
         |), tot AS (SELECT count(*)::DOUBLE AS nt FROM tok),
         |freq AS MATERIALIZED (
         |  SELECT w, count(*) / nt AS f
         |  FROM tok CROSS JOIN tot GROUP BY w, nt
         |), surv AS MATERIALIZED (
         |  SELECT doc, w,
         |    row_number() OVER (PARTITION BY doc ORDER BY pos)
         |      AS spos
         |  FROM tok JOIN freq USING (w)
         |  WHERE list_sum(list_transform(range(1, 9),
         |      i -> (strpos('0123456789abcdef',
         |        substr(md5(doc::VARCHAR || '|' || pos::VARCHAR),
         |          1, 8)[i]) - 1) * 16 ** (8 - i))) / 4294967296.0
         |    < least(1.0::DOUBLE,
         |        sqrt(0.001::DOUBLE / f) + 0.001::DOUBLE / f)
         |)
         |SELECT a.w AS center, b.w AS context, count(*)::BIGINT AS n
         |FROM surv a JOIN surv b
         |  ON a.doc = b.doc AND b.spos <> a.spos
         |  AND b.spos BETWEEN a.spos - 2 AND a.spos + 2
         |GROUP BY 1, 2 ORDER BY center, context""".stripMargin) {
      (s, dir) =>
      graft.ml.Features.skipGramPairs(t(s, dir, "documents"),
          "doc_id", "text", window = 2, subsampleT = 0.001)
        .groupBy("center", "context")
        .agg(count(lit(1)).as("n"))
        .orderBy("center", "context")
    },

    // unigram^0.75 negative-sampling table over the corpus
    // vocabulary — closed-form replay.
    q("q_text_negsample",
      s"""WITH tok AS (
         |  SELECT u.t AS w FROM (
         |    SELECT list_filter(string_split($normSql, ' '),
         |      t -> t <> '') AS ws FROM documents), unnest(ws) AS u(t)
         |), c AS MATERIALIZED (
         |  SELECT w, count(*)::BIGINT AS c FROM tok GROUP BY 1
         |), z AS (SELECT sum(pow(c::DOUBLE, 0.75)) AS z FROM c)
         |SELECT w AS word, c AS count,
         |  round(pow(c::DOUBLE, 0.75) / z, 6) AS prob
         |FROM c CROSS JOIN z ORDER BY word""".stripMargin) { (s, dir) =>
      graft.ml.Features.negativeSamplingTable(t(s, dir, "documents"),
          "text", power = 0.75)
        .select(col("word"), col("count"),
          round(col("prob"), 6).as("prob"))
        .orderBy("word")
    },

    // sample-ratio-mismatch guardrail: user-parity arms against a
    // deliberately wrong 60/40 design, plus an undesigned arm probe
    // — χ² replay.
    q("q_events_srm",
      """WITH obs AS (
        |  SELECT CAST(user_id % 2 AS VARCHAR) AS arm,
        |    count(DISTINCT user_id)::BIGINT AS n_observed
        |  FROM events GROUP BY 1
        |), design AS (
        |  SELECT unnest(['0', '1']) AS arm,
        |    unnest([0.6::DOUBLE, 0.4::DOUBLE]) AS share
        |), tot AS (SELECT sum(n_observed) AS n_total FROM obs),
        |grid AS MATERIALIZED (
        |  SELECT coalesce(d.arm, o.arm) AS arm,
        |    coalesce(o.n_observed, 0) AS n_observed,
        |    coalesce(d.share, 0.0) * n_total AS n_expected
        |  FROM design d FULL OUTER JOIN obs o ON d.arm = o.arm
        |  CROSS JOIN tot
        |), g2 AS MATERIALIZED (
        |  SELECT arm, n_observed, n_expected,
        |    CASE WHEN n_expected > 0
        |      THEN (n_observed - n_expected) * (n_observed - n_expected)
        |        / n_expected END AS chi2_term,
        |    n_expected > 0 AS designed
        |  FROM grid
        |), t2 AS (
        |  SELECT sum(chi2_term) AS chi2,
        |    sum(CASE WHEN designed THEN 1 ELSE 0 END) - 1 AS df,
        |    bool_or(NOT designed) AS undesigned_arm
        |  FROM g2
        |)
        |SELECT arm, n_observed, round(n_expected, 6) AS n_expected,
        |  round(chi2_term, 6) AS chi2_term, designed,
        |  round(chi2, 6) AS chi2, CAST(df AS BIGINT) AS df,
        |  undesigned_arm
        |FROM g2 CROSS JOIN t2 ORDER BY arm""".stripMargin) { (s, dir) =>
      val perUser = t(s, dir, "events")
        .select(col("user_id")).distinct()
        .select((col("user_id") % 2).cast("string").as("arm"))
      Events.srmCheck(perUser, "arm",
          Map("0" -> 0.6, "1" -> 0.4))
        .select(col("arm"), col("n_observed"),
          round(col("n_expected"), 6).as("n_expected"),
          round(col("chi2_term"), 6).as("chi2_term"), col("designed"),
          round(col("chi2"), 6).as("chi2"), col("df"),
          col("undesigned_arm"))
        .orderBy("arm")
    },

    // RMS gain normalization to target 1000 over synthesized ramp
    // signals — scale/round/clamp replayed arithmetically, md5 over
    // the joined sample series.
    q("q_multimodal_gain",
      """WITH d AS (
        |  SELECT doc_id AS id, CAST(50 + doc_id % 20 AS BIGINT) AS n,
        |    CAST(doc_id % 17 + 1 AS BIGINT) AS k
        |  FROM documents
        |), rms AS (
        |  SELECT id, n, k,
        |    sqrt(sum((k * u.j)::DOUBLE * (k * u.j)) / n) AS r
        |  FROM d, unnest(range(0, n)) AS u(j)
        |  GROUP BY 1, 2, 3
        |), v AS (
        |  SELECT id, n, u.j AS j,
        |    greatest(-32768, least(32767, CAST(floor(
        |      k * u.j * (1000.0 / r) + 0.5) AS BIGINT))) AS val
        |  FROM rms, unnest(range(0, n)) AS u(j)
        |)
        |SELECT id, n AS n_in,
        |  md5(string_agg(CAST(val AS VARCHAR), ',' ORDER BY j)) AS g_h
        |FROM v GROUP BY 1, 2 ORDER BY id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.ml.AudioCodec
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val n = (50 + id % 20).toInt
          val k = (id % 17 + 1).toInt
          val a = AudioCodec.Audio(8000, 1, 16,
            Array.tabulate(n)(j => k * j))
          val g = AudioCodec.normalizeGain(a, 1000.0)
          (id, n.toLong, g.samples.mkString(","))
        }
        .toDF("id", "n_in", "g")
        .select(col("id"), col("n_in"), md5(col("g")).as("g_h"))
        .orderBy("id")
    }
  )
}
