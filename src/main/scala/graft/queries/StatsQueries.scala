package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Ts
import graft.ml.{Eval, TextAnalysis => TA}
import graft.events.Events

/** Gates for the round-9 statistics batch: paired-model comparison
  * (McNemar), rank-based group tests (Kruskal–Wallis, Brown–Forsythe),
  * selective-prediction risk–coverage, rank agreement (Kendall τ-b),
  * survival comparison (log-rank), sequential drift (Page–Hinkley),
  * stratified 2×2 pooling (CMH), and TextTiling-lite segmentation —
  * each replayed closed-form by its DuckDB oracle.
  */
object StatsQueries extends QueryGroup {

  private val normSql =
    """trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
      |'\s+', ' ', 'g'))""".stripMargin.replace("\n", " ")

  def all: Seq[QueryDef] = Seq(

    // McNemar paired comparison of two deterministic pseudo-models
    // over the shared document set: A = n_chars%3!=0, B = doc_id%2=0.
    q("q_eval_mcnemar",
      """WITH d AS (
        |  SELECT (n_chars % 3 != 0) AS a_ok, (doc_id % 2 = 0) AS b_ok
        |  FROM documents
        |), agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN a_ok AND NOT b_ok THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n01,
        |    CAST(sum(CASE WHEN NOT a_ok AND b_ok THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n10
        |  FROM d
        |)
        |SELECT n, n01, n10,
        |  round(CASE WHEN n01 + n10 > 0 THEN
        |    pow(abs(n01 - n10) - 1.0::DOUBLE, 2.0)
        |      / CAST(n01 + n10 AS DOUBLE) END, 6) AS chi2
        |FROM agg""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents").select(
        (col("n_chars") % 3 =!= 0).as("a_ok"),
        (col("doc_id") % 2 === 0).as("b_ok"))
      Eval.mcnemarTest(d, "a_ok", "b_ok")
        .select(col("n"), col("n01"), col("n10"),
          round(col("chi2"), 6).as("chi2"))
    },

    // Kruskal–Wallis across event types on the 0.1-quantized value
    // (the quantization bounds the distinct-value midrank table and
    // sidesteps the round() half-up/half-even divergence).
    q("q_eval_kruskal",
      """WITH v AS (
        |  SELECT floor(value * 10 + 0.5::DOUBLE) / 10 AS s,
        |    event_type AS g
        |  FROM events
        |), bv AS (
        |  SELECT s, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1
        |), rk AS (
        |  SELECT s, n,
        |    coalesce(sum(n) OVER (ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + (n + 1) / 2.0::DOUBLE AS midrank
        |  FROM bv
        |), gv AS (
        |  SELECT g, s, CAST(count(*) AS BIGINT) AS gn FROM v GROUP BY 1, 2
        |), pg AS (
        |  SELECT g, CAST(sum(gn) AS BIGINT) AS ng,
        |    sum(gn * rk.midrank) AS rg
        |  FROM gv JOIN rk USING (s) GROUP BY 1
        |), ties AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS nt,
        |    CAST(sum(n * n * n - n) AS BIGINT) AS tsum
        |  FROM bv
        |), hh AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    sum(rg * rg / ng) AS rr FROM pg
        |)
        |SELECT k, nt AS n,
        |  round(12.0::DOUBLE / (CAST(nt AS DOUBLE) * (nt + 1)) * rr
        |    - 3.0::DOUBLE * (nt + 1), 6) AS h,
        |  round((12.0::DOUBLE / (CAST(nt AS DOUBLE) * (nt + 1)) * rr
        |    - 3.0::DOUBLE * (nt + 1)) /
        |    (1.0::DOUBLE - CAST(tsum AS DOUBLE) /
        |      (CAST(nt AS DOUBLE) * nt * nt - nt)), 6) AS h_adj
        |FROM hh, ties""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val d = ev.select((floor(col("value") * 10 + 0.5) / 10).as("v"),
        col("event_type").as("g"))
      Eval.kruskalWallis(d, "v", "g")
        .select(col("k"), col("n"), round(col("h"), 6).as("h"),
          round(col("h_adj"), 6).as("h_adj"))
    },

    // Brown–Forsythe variance-homogeneity across event types on the
    // same 0.1 grid; F rounded at 4dp (the anovaF cancellation-margin
    // discipline).
    q("q_eval_brown_forsythe",
      """WITH v AS (
        |  SELECT floor(value * 10 + 0.5::DOUBLE) / 10 AS x,
        |    event_type AS g
        |  FROM events
        |), bgv AS (
        |  SELECT g, x, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1, 2
        |), cum AS (
        |  SELECT g, x, c,
        |    sum(c) OVER (PARTITION BY g ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(c) OVER (PARTITION BY g) AS ng
        |  FROM bgv
        |), med AS (
        |  SELECT g, x AS med FROM cum
        |  WHERE cum >= ceil(ng / 2) AND cum - c < ceil(ng / 2)
        |), z AS (
        |  SELECT v.g, abs(v.x - med.med) AS z
        |  FROM v JOIN med ON v.g = med.g
        |), per AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS ng, sum(z) AS sg,
        |    sum(z * z) AS qg
        |  FROM z GROUP BY 1
        |), agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(ng) AS BIGINT) AS n,
        |    sum(sg * sg / ng) AS gs, sum(sg) AS s, sum(qg) AS q
        |  FROM per
        |)
        |SELECT k, n,
        |  round(CASE WHEN k > 1 AND n > k AND q - gs > 0 THEN
        |    ((gs - s * s / n) / (k - 1)) / ((q - gs) / (n - k))
        |    END, 4) AS f
        |FROM agg""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "events")
        .select((floor(col("value") * 10 + 0.5) / 10).as("v"),
          col("event_type").as("g"))
      Eval.brownForsythe(d, "v", "g")
        .select(col("k"), col("n"), round(col("f"), 4).as("f"))
    },

    // Risk–coverage over a deterministic confidence (n_chars % 100,
    // heavily tied — exercises the tie-coherent threshold sweep) and
    // correctness doc_id % 3 != 0.
    q("q_eval_risk_coverage",
      """WITH d AS (
        |  SELECT n_chars % 100 AS confidence, (doc_id % 3 != 0) AS ok
        |  FROM documents
        |), bc AS (
        |  SELECT confidence, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN NOT ok THEN 1 ELSE 0 END) AS BIGINT) AS err
        |  FROM d GROUP BY 1
        |), cv AS (
        |  SELECT confidence, n,
        |    sum(n) OVER (ORDER BY confidence DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
        |    sum(err) OVER (ORDER BY confidence DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cerr
        |  FROM bc
        |), tot AS (
        |  SELECT max(cn) AS nt,
        |    sum(CAST(n AS DOUBLE) * cerr / cn) AS wr
        |  FROM cv
        |)
        |SELECT confidence, n,
        |  round(CAST(cn AS DOUBLE) / nt, 6) AS coverage,
        |  round(CAST(cerr AS DOUBLE) / cn, 6) AS risk,
        |  round(wr / nt, 6) AS aurc
        |FROM cv, tot ORDER BY confidence""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents").select(
        (col("n_chars") % 100).as("conf"),
        (col("doc_id") % 3 =!= 0).as("ok"))
      Eval.riskCoverage(d, "conf", "ok")
        .select(col("confidence"), col("n"),
          round(col("coverage"), 6).as("coverage"),
          round(col("risk"), 6).as("risk"),
          round(col("aurc"), 6).as("aurc"))
        .orderBy("confidence")
    },

    // Log-rank churn comparison between the user_id-parity arms,
    // daily buckets, 1-day censor gap (the synthetic users are active for nearly the whole 30-day window, so a longer gap censors everyone) — the kaplanMeier lifetime
    // convention.
    q("q_events_logrank",
      """WITH pu AS (
        |  SELECT user_id, CAST(user_id % 2 AS VARCHAR) AS g,
        |    min(CAST(floor(epoch(ts)) AS BIGINT)) AS fs,
        |    max(CAST(floor(epoch(ts)) AS BIGINT)) AS ls
        |  FROM events GROUP BY 1, 2
        |), hz AS (SELECT max(ls) AS horizon FROM pu),
        |lt AS (
        |  SELECT g, (ls - fs) // 86400 AS t,
        |    (ls < horizon - 86400) AS event
        |  FROM pu, hz
        |), lv AS (
        |  SELECT g, t, CAST(count(*) AS BIGINT) AS leaving,
        |    CAST(sum(CASE WHEN event THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM lt GROUP BY 1, 2
        |), et AS (SELECT DISTINCT t AS et FROM lv WHERE d > 0),
        |risk AS (
        |  SELECT l.g, e.et, CAST(sum(l.leaving) AS BIGINT) AS n_gt
        |  FROM lv l JOIN et e ON l.t >= e.et GROUP BY 1, 2
        |), cell AS (
        |  SELECT r.g, r.et, r.n_gt, coalesce(dv.d, 0) AS d_gt
        |  FROM risk r LEFT JOIN
        |    (SELECT g, t AS et, d FROM lv WHERE d > 0) dv USING (g, et)
        |), tt AS (
        |  SELECT et, CAST(sum(n_gt) AS BIGINT) AS n_t,
        |    CAST(sum(d_gt) AS BIGINT) AS d_t
        |  FROM cell GROUP BY 1
        |), wt AS (
        |  SELECT c.g, c.et, c.n_gt, c.d_gt, t.n_t, t.d_t,
        |    t.d_t * CAST(c.n_gt AS DOUBLE) / t.n_t AS e_gt
        |  FROM cell c JOIN tt t USING (et)
        |), pg AS (
        |  SELECT g, CAST(sum(d_gt) AS BIGINT) AS observed,
        |    sum(e_gt) AS expected
        |  FROM wt GROUP BY 1
        |), ch AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    sum(pow(observed - expected, 2.0) / expected) AS chi2
        |  FROM pg
        |), g1 AS (SELECT min(g) AS g1 FROM (SELECT DISTINCT g FROM lv)),
        |vv AS (
        |  SELECT coalesce(sum(CASE WHEN n_t > 1 THEN
        |    CAST(d_t AS DOUBLE) * (n_t - d_t) / (n_t - 1) * n_1t
        |      * (n_t - n_1t) / (CAST(n_t AS DOUBLE) * n_t) END),
        |    0.0::DOUBLE) AS v
        |  FROM (SELECT et, max(d_t) AS d_t, max(n_t) AS n_t,
        |      sum(CASE WHEN g = (SELECT g1 FROM g1) THEN n_gt END) AS n_1t
        |    FROM wt GROUP BY 1)
        |), zz AS (
        |  SELECT CASE WHEN (SELECT k FROM ch) = 2 AND v > 0 THEN
        |    (SELECT observed - expected FROM pg, g1 WHERE g = g1)
        |      / sqrt(v) END AS z
        |  FROM vv
        |), nu AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n_users FROM lt GROUP BY 1
        |)
        |SELECT nu.g AS grp, nu.n_users, pg.observed,
        |  round(pg.expected, 6) AS expected,
        |  round((SELECT chi2 FROM ch), 6) AS chi2,
        |  round((SELECT z FROM zz), 6) + 0.0 AS z
        |FROM nu JOIN pg USING (g) ORDER BY grp""".stripMargin) { (s, dir) =>
      val raw = t(s, dir, "events")
      val ev = raw.select(col("user_id"),
        (col("user_id") % 2).cast("string").as("grp"),
        Ts.seconds(raw).as("sec"))
      Events.logRankTest(ev, "user_id", "grp", "sec", 86400L, 86400L)
        .select(col("group").as("grp"), col("n_users"), col("observed"),
          round(col("expected"), 6).as("expected"),
          round(col("chi2"), 6).as("chi2"),
          (round(col("z"), 6) + 0.0).as("z"))
        .orderBy("grp")
    },

    // Page–Hinkley trace over the hourly count series, δ=0.5, λ=50.
    q("q_events_page_hinkley",
      """WITH c AS (
        |  SELECT CAST(floor(CAST(floor(epoch(ts)) AS BIGINT)
        |    / 3600) AS BIGINT) AS bucket, count(*) AS y
        |  FROM events GROUP BY 1
        |), sp AS (SELECT min(bucket) AS b0, max(bucket) AS b1 FROM c),
        |d AS (
        |  SELECT gs.b AS bucket, CAST(coalesce(c.y, 0) AS DOUBLE) AS x
        |  FROM (SELECT unnest(range(b0, b1 + 1)) AS b FROM sp) gs
        |  LEFT JOIN c ON c.bucket = gs.b
        |), w AS (
        |  SELECT bucket, x, sum(x) OVER win / count(*) OVER win AS rm
        |  FROM d WINDOW win AS (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |), m AS (
        |  SELECT bucket, x, rm,
        |    sum(x - rm - 0.5::DOUBLE) OVER (ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m_t
        |  FROM w
        |), p AS (
        |  SELECT bucket, x, rm, m_t,
        |    m_t - min(m_t) OVER (ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph
        |  FROM m
        |)
        |SELECT bucket, x,
        |  floor(rm * 1e6 + 0.5::DOUBLE) / 1e6 AS running_mean,
        |  floor(m_t * 1e6 + 0.5::DOUBLE) / 1e6 AS m_t,
        |  floor(ph * 1e6 + 0.5::DOUBLE) / 1e6 AS ph,
        |  ph > 50.0::DOUBLE AS alarm
        |FROM p ORDER BY bucket""".stripMargin) { (s, dir) =>
      val raw = t(s, dir, "events")
      val ev = raw.select(Ts.seconds(raw).as("sec"))
      Events.pageHinkley(ev, "sec", 3600L, 0.5, 50.0)
        .orderBy("bucket")
    },

    // CMH pooled 2×2 over event-type strata: arm = user parity,
    // outcome = value > 50.
    q("q_events_cmh",
      """WITH d AS (
        |  SELECT event_type AS stratum, (user_id % 2 = 0) AS arm,
        |    (value > 50) AS outc
        |  FROM events
        |), per AS (
        |  SELECT stratum, CAST(count(*) AS BIGINT) AS tt,
        |    CAST(sum(CASE WHEN arm AND outc THEN 1 ELSE 0 END)
        |      AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN arm AND NOT outc THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN NOT arm AND outc THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN NOT arm AND NOT outc THEN 1 ELSE 0 END)
        |      AS BIGINT) AS d
        |  FROM d GROUP BY 1
        |), pm AS (
        |  SELECT *, a + b AS n1, c + d AS n2, a + c AS m1 FROM per
        |), agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS strata,
        |    CAST(sum(a) AS BIGINT) AS a_sum,
        |    sum(CAST(n1 AS DOUBLE) * m1 / tt) AS e_sum,
        |    coalesce(sum(CASE WHEN tt > 1 THEN
        |      CAST(n1 AS DOUBLE) * n2 * m1 * (tt - m1)
        |        / (CAST(tt AS DOUBLE) * tt * (tt - 1)) END),
        |      0.0::DOUBLE) AS v_sum,
        |    sum(CAST(a AS DOUBLE) * d / tt) AS ad,
        |    sum(CAST(b AS DOUBLE) * c / tt) AS bc
        |  FROM pm
        |)
        |SELECT strata, a_sum, round(e_sum, 6) AS e_sum,
        |  round(v_sum, 6) AS v_sum,
        |  round(CASE WHEN v_sum > 0 THEN
        |    pow(abs(a_sum - e_sum) - 0.5::DOUBLE, 2.0) / v_sum END, 6)
        |    AS chi2_cmh,
        |  round(CASE WHEN bc > 0 THEN ad / bc END, 6) AS or_mh
        |FROM agg""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "events").select(col("event_type"),
        (col("user_id") % 2 === 0).as("arm"),
        (col("value") > 50).as("outc"))
      Events.cmhTest(d, "event_type", "arm", "outc")
        .select(col("strata"), col("a_sum"),
          round(col("e_sum"), 6).as("e_sum"),
          round(col("v_sum"), 6).as("v_sum"),
          round(col("chi2_cmh"), 6).as("chi2_cmh"),
          round(col("or_mh"), 6).as("or_mh"))
    },

    // Distinct-n generation diversity per source, orders 1..3.
    q("q_text_distinct_n",
      s"""WITH tk AS (
         |  SELECT source, list_filter(string_split($normSql, ' '),
         |    x -> x <> '') AS ws
         |  FROM documents
         |), g1 AS (
         |  SELECT source, 1 AS n, u.g AS g FROM tk, unnest(ws) AS u(g)
         |), g2 AS (
         |  SELECT source, 2 AS n, u.g AS g FROM (
         |    SELECT source, list_transform(range(1, len(ws)),
         |      i -> ws[i] || ' ' || ws[i+1]) AS bs FROM tk
         |  ), unnest(bs) AS u(g)
         |), g3 AS (
         |  SELECT source, 3 AS n, u.g AS g FROM (
         |    SELECT source, list_transform(range(1, len(ws) - 1),
         |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS bs
         |    FROM tk
         |  ), unnest(bs) AS u(g)
         |), al AS (
         |  SELECT * FROM g1 UNION ALL SELECT * FROM g2
         |  UNION ALL SELECT * FROM g3
         |), cnt AS (
         |  SELECT source, n, g, count(*) AS c FROM al GROUP BY 1, 2, 3
         |)
         |SELECT source AS grp, CAST(n AS BIGINT) AS n,
         |  CAST(sum(c) AS BIGINT) AS total_ngrams,
         |  CAST(count(*) AS BIGINT) AS distinct_ngrams,
         |  round(CAST(count(*) AS BIGINT) * 1.0::DOUBLE
         |    / CAST(sum(c) AS BIGINT), 6) AS distinct_ratio
         |FROM cnt GROUP BY 1, 2 ORDER BY grp, n""".stripMargin) {
      (s, dir) =>
      graft.ml.GenEval.distinctN(t(s, dir, "documents"), "source",
          "text", maxN = 3)
        .select(col("group").as("grp"), col("n").cast("long").as("n"),
          col("total_ngrams"), col("distinct_ngrams"),
          round(col("distinct_ratio"), 6).as("distinct_ratio"))
        .orderBy("grp", "n")
    },

    // Self-BLEU over the deterministic md5 top-100 document sample,
    // orders 1..4, multi-reference clipping via top-2 gram counts.
    q("q_eval_self_bleu",
      s"""WITH samp AS (
         |  SELECT doc_id AS id, list_filter(string_split($normSql, ' '),
         |    x -> x <> '') AS ws
         |  FROM documents
         |  QUALIFY row_number() OVER (ORDER BY
         |    md5('selfbleu:' || CAST(doc_id AS VARCHAR)), doc_id) <= 100
         |), lens AS (SELECT id, len(ws) AS len FROM samp),
         |rl AS (
         |  SELECT a.id, b.len AS rlen FROM lens a
         |  JOIN lens b ON a.id != b.id
         |  QUALIFY row_number() OVER (PARTITION BY a.id
         |    ORDER BY abs(b.len - a.len), b.len) = 1
         |), g1 AS (
         |  SELECT id, u.g AS g, CAST(count(*) AS BIGINT) AS c
         |  FROM samp, unnest(ws) AS u(g) GROUP BY 1, 2
         |), g2 AS (
         |  SELECT id, u.g AS g, CAST(count(*) AS BIGINT) AS c FROM (
         |    SELECT id, list_transform(range(1, len(ws)),
         |      i -> ws[i] || ' ' || ws[i+1]) AS bs FROM samp
         |  ), unnest(bs) AS u(g) GROUP BY 1, 2
         |), g3 AS (
         |  SELECT id, u.g AS g, CAST(count(*) AS BIGINT) AS c FROM (
         |    SELECT id, list_transform(range(1, len(ws) - 1),
         |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS bs
         |    FROM samp
         |  ), unnest(bs) AS u(g) GROUP BY 1, 2
         |), g4 AS (
         |  SELECT id, u.g AS g, CAST(count(*) AS BIGINT) AS c FROM (
         |    SELECT id, list_transform(range(1, len(ws) - 2),
         |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
         |        || ws[i+3]) AS bs FROM samp
         |  ), unnest(bs) AS u(g) GROUP BY 1, 2
         |), t1 AS (
         |  SELECT g, max(CASE WHEN rk = 1 THEN c END) AS c1,
         |    max(CASE WHEN rk = 1 THEN id END) AS id1,
         |    coalesce(max(CASE WHEN rk = 2 THEN c END), 0) AS c2
         |  FROM (SELECT g, id, c, row_number() OVER (PARTITION BY g
         |    ORDER BY c DESC, id) AS rk FROM g1) WHERE rk <= 2 GROUP BY 1
         |), t2 AS (
         |  SELECT g, max(CASE WHEN rk = 1 THEN c END) AS c1,
         |    max(CASE WHEN rk = 1 THEN id END) AS id1,
         |    coalesce(max(CASE WHEN rk = 2 THEN c END), 0) AS c2
         |  FROM (SELECT g, id, c, row_number() OVER (PARTITION BY g
         |    ORDER BY c DESC, id) AS rk FROM g2) WHERE rk <= 2 GROUP BY 1
         |), t3 AS (
         |  SELECT g, max(CASE WHEN rk = 1 THEN c END) AS c1,
         |    max(CASE WHEN rk = 1 THEN id END) AS id1,
         |    coalesce(max(CASE WHEN rk = 2 THEN c END), 0) AS c2
         |  FROM (SELECT g, id, c, row_number() OVER (PARTITION BY g
         |    ORDER BY c DESC, id) AS rk FROM g3) WHERE rk <= 2 GROUP BY 1
         |), t4 AS (
         |  SELECT g, max(CASE WHEN rk = 1 THEN c END) AS c1,
         |    max(CASE WHEN rk = 1 THEN id END) AS id1,
         |    coalesce(max(CASE WHEN rk = 2 THEN c END), 0) AS c2
         |  FROM (SELECT g, id, c, row_number() OVER (PARTITION BY g
         |    ORDER BY c DESC, id) AS rk FROM g4) WHERE rk <= 2 GROUP BY 1
         |), p1 AS (
         |  SELECT g1.id, CAST(sum(least(c, CASE WHEN id1 = g1.id
         |    THEN c2 ELSE c1 END)) AS BIGINT) * 1.0::DOUBLE
         |    / CAST(sum(c) AS BIGINT) AS p
         |  FROM g1 JOIN t1 USING (g) GROUP BY 1
         |), p2 AS (
         |  SELECT g2.id, CAST(sum(least(c, CASE WHEN id1 = g2.id
         |    THEN c2 ELSE c1 END)) AS BIGINT) * 1.0::DOUBLE
         |    / CAST(sum(c) AS BIGINT) AS p
         |  FROM g2 JOIN t2 USING (g) GROUP BY 1
         |), p3 AS (
         |  SELECT g3.id, CAST(sum(least(c, CASE WHEN id1 = g3.id
         |    THEN c2 ELSE c1 END)) AS BIGINT) * 1.0::DOUBLE
         |    / CAST(sum(c) AS BIGINT) AS p
         |  FROM g3 JOIN t3 USING (g) GROUP BY 1
         |), p4 AS (
         |  SELECT g4.id, CAST(sum(least(c, CASE WHEN id1 = g4.id
         |    THEN c2 ELSE c1 END)) AS BIGINT) * 1.0::DOUBLE
         |    / CAST(sum(c) AS BIGINT) AS p
         |  FROM g4 JOIN t4 USING (g) GROUP BY 1
         |), fin AS (
         |  SELECT l.id, coalesce(p1.p, 0.0::DOUBLE) AS p1,
         |    coalesce(p2.p, 0.0::DOUBLE) AS p2,
         |    coalesce(p3.p, 0.0::DOUBLE) AS p3,
         |    coalesce(p4.p, 0.0::DOUBLE) AS p4,
         |    CASE WHEN l.len >= rl.rlen THEN 1.0::DOUBLE
         |      ELSE exp(1.0::DOUBLE - rl.rlen * 1.0::DOUBLE / l.len)
         |      END AS bp
         |  FROM lens l JOIN p1 ON p1.id = l.id
         |  LEFT JOIN p2 ON p2.id = l.id
         |  LEFT JOIN p3 ON p3.id = l.id
         |  LEFT JOIN p4 ON p4.id = l.id
         |  JOIN rl ON rl.id = l.id
         |)
         |SELECT id, round(p1, 6) AS p1, round(p2, 6) AS p2,
         |  round(p3, 6) AS p3, round(p4, 6) AS p4,
         |  round(bp, 6) AS bp,
         |  round(CASE WHEN p1 > 0 AND p2 > 0 AND p3 > 0 AND p4 > 0
         |    THEN exp((ln(p1) + ln(p2) + ln(p3) + ln(p4)) / 4) * bp
         |    ELSE 0.0::DOUBLE END, 6) AS self_bleu
         |FROM fin ORDER BY id""".stripMargin) { (s, dir) =>
      graft.ml.GenEval.selfBleu(t(s, dir, "documents")
          .select(col("doc_id").as("id"), col("text")),
          "id", "text", sampleK = 100, maxN = 4)
        .select(col("id"), round(col("p1"), 6).as("p1"),
          round(col("p2"), 6).as("p2"), round(col("p3"), 6).as("p3"),
          round(col("p4"), 6).as("p4"), round(col("bp"), 6).as("bp"),
          round(col("self_bleu"), 6).as("self_bleu"))
        .orderBy("id")
    },

    // Chao1 vocabulary-richness estimator per source.
    q("q_text_chao1",
      s"""WITH tok AS (
         |  SELECT source AS stratum, u.t AS t FROM (
         |    SELECT source, list_filter(string_split($normSql, ' '),
         |      x -> x <> '') AS ws FROM documents
         |  ), unnest(ws) AS u(t)
         |), c AS (
         |  SELECT stratum, t, count(*) AS c FROM tok GROUP BY 1, 2
         |)
         |SELECT stratum, CAST(sum(c) AS BIGINT) AS n_tokens,
         |  CAST(count(*) AS BIGINT) AS vocab,
         |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         |  CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
         |  round(count(*) + sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
         |    * 1.0::DOUBLE
         |    * (sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) - 1)
         |    / (2.0::DOUBLE
         |      * (sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) + 1)), 6)
         |    AS chao1
         |FROM c GROUP BY 1 ORDER BY stratum""".stripMargin) { (s, dir) =>
      graft.ml.TextAnalysis.chao1(t(s, dir, "documents"), "source",
          "text")
        .select(col("stratum"), col("n_tokens"), col("vocab"), col("f1"),
          col("f2"), round(col("chao1"), 6).as("chao1"))
        .orderBy("stratum")
    },

    // Cumulative gains / lift over tie-coherent score deciles
    // (score = n_chars % 100, label = doc_id % 7 = 0).
    q("q_eval_gains",
      """WITH d AS (
        |  SELECT n_chars % 100 AS s,
        |    CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS y
        |  FROM documents
        |), bs AS (
        |  SELECT s, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS p
        |  FROM d GROUP BY 1
        |), cum AS (
        |  SELECT s, n, p,
        |    coalesce(sum(n) OVER (ORDER BY s DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS before,
        |    sum(n) OVER () AS nt, sum(p) OVER () AS pt
        |  FROM bs
        |), bk AS (
        |  SELECT CAST(1 + floor(before * 10 / nt) AS BIGINT) AS bucket,
        |    n, p, nt, pt
        |  FROM cum
        |), pb AS (
        |  SELECT bucket, CAST(sum(n) AS BIGINT) AS n,
        |    CAST(sum(p) AS BIGINT) AS positives,
        |    CAST(max(nt) AS BIGINT) AS nt, CAST(max(pt) AS BIGINT) AS pt
        |  FROM bk GROUP BY 1
        |)
        |SELECT bucket, n, positives,
        |  round(CASE WHEN pt > 0 THEN
        |    CAST(sum(positives) OVER (ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS DOUBLE) / pt END, 6) AS cum_gain,
        |  round(CASE WHEN pt > 0 THEN
        |    (positives * 1.0::DOUBLE / n) / (pt * 1.0::DOUBLE / nt)
        |    END, 6) AS lift
        |FROM pb ORDER BY bucket""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents").select(
        (col("n_chars") % 100).as("score"),
        (col("doc_id") % 7 === 0).as("y"))
      Eval.gainsTable(d, "score", "y", k = 10)
        .select(col("bucket"), col("n"), col("positives"),
          round(col("cum_gain"), 6).as("cum_gain"),
          round(col("lift"), 6).as("lift"))
        .orderBy("bucket")
    },

    // Cohen's d / Hedges' g between the user-parity arms on the
    // 0.1-quantized event value.
    q("q_eval_cohens_d",
      """WITH v AS (
        |  SELECT CAST(user_id % 2 AS VARCHAR) AS g,
        |    floor(value * 10 + 0.5::DOUBLE) / 10 AS x
        |  FROM events
        |), per AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n, sum(x) AS s,
        |    sum(x * x) AS q
        |  FROM v GROUP BY 1
        |), w AS (
        |  SELECT (SELECT min(g) FROM per) AS g1,
        |    (SELECT CAST(count(*) AS BIGINT) FROM per) AS k FROM per
        |  LIMIT 1
        |), wide AS (
        |  SELECT w.g1, w.k,
        |    (SELECT n FROM per WHERE g = w.g1) AS n1,
        |    (SELECT s FROM per WHERE g = w.g1) AS s1,
        |    (SELECT q FROM per WHERE g = w.g1) AS q1,
        |    CASE WHEN w.k = 2 THEN
        |      (SELECT max(g) FROM per WHERE g != w.g1) END AS g2,
        |    CASE WHEN w.k = 2 THEN
        |      (SELECT max(n) FROM per WHERE g != w.g1) END AS n2,
        |    CASE WHEN w.k = 2 THEN
        |      (SELECT max(s) FROM per WHERE g != w.g1) END AS s2,
        |    CASE WHEN w.k = 2 THEN
        |      (SELECT max(q) FROM per WHERE g != w.g1) END AS q2
        |  FROM w
        |), fin AS (
        |  SELECT g1, g2, k, n1, n2, s1 / n1 AS mean1, s2 / n2 AS mean2,
        |    (q1 - s1 * s1 / n1) + (q2 - s2 * s2 / n2) AS ssw
        |  FROM wide
        |), dd AS (
        |  SELECT g1, g2, k, n1, n2, mean1, mean2,
        |    CASE WHEN k = 2 AND n1 >= 2 AND n2 >= 2 AND ssw > 0 THEN
        |      (mean1 - mean2) / sqrt(ssw / (n1 + n2 - 2)) END AS d
        |  FROM fin
        |)
        |SELECT g1, g2, k, n1, n2, round(mean1, 6) AS mean1,
        |  round(mean2, 6) AS mean2, round(d, 6) + 0.0 AS d,
        |  round(d * (1.0::DOUBLE - 3.0::DOUBLE
        |    / (4.0::DOUBLE * (n1 + n2) - 9)), 6) + 0.0 AS hedges_g
        |FROM dd""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "events").select(
        (col("user_id") % 2).cast("string").as("g"),
        (floor(col("value") * 10 + 0.5) / 10).as("x"))
      Eval.cohensD(d, "x", "g")
        .select(col("g1"), col("g2"), col("k"), col("n1"), col("n2"),
          round(col("mean1"), 6).as("mean1"),
          round(col("mean2"), 6).as("mean2"),
          (round(col("d"), 6) + 0.0).as("d"),
          (round(col("hedges_g"), 6) + 0.0).as("hedges_g"))
    },

    // Hellinger / Bhattacharyya between the user-parity arms' value
    // bucket distributions (bucket = floor(value/10), 11 buckets).
    q("q_events_hellinger",
      """WITH b AS (
        |  SELECT CAST(floor(value / 10) AS BIGINT) AS bucket,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE user_id % 2 = 0 GROUP BY 1
        |), c AS (
        |  SELECT CAST(floor(value / 10) AS BIGINT) AS bucket,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE user_id % 2 = 1 GROUP BY 1
        |), j AS (
        |  SELECT coalesce(b.bucket, c.bucket) AS bucket,
        |    coalesce(b.n, 0) AS bn, coalesce(c.n, 0) AS cn
        |  FROM b FULL OUTER JOIN c ON b.bucket = c.bucket
        |), t AS (
        |  SELECT CAST(sum(bn) AS BIGINT) AS bt,
        |    CAST(sum(cn) AS BIGINT) AS ct FROM j
        |), f AS (
        |  SELECT (bn + 0.5::DOUBLE) / (bt + 0.5::DOUBLE * 11) AS bf,
        |    (cn + 0.5::DOUBLE) / (ct + 0.5::DOUBLE * 11) AS cf
        |  FROM j, t
        |), a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_buckets,
        |    sum(sqrt(bf * cf)) AS bc
        |  FROM f
        |)
        |SELECT n_buckets, round(bc, 6) AS bc,
        |  round(sqrt(greatest(1.0::DOUBLE - bc, 0.0::DOUBLE)), 6)
        |    AS hellinger,
        |  round(-ln(bc), 6) AS bhattacharyya
        |FROM a""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      def side(parity: Int) = ev.filter(col("user_id") % 2 === parity)
        .groupBy(floor(col("value") / 10).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"))
      graft.ml.Profile.hellingerFromCounts(side(0), side(1),
          nBuckets = 11)
        .select(col("n_buckets"), round(col("bc"), 6).as("bc"),
          round(col("hellinger"), 6).as("hellinger"),
          round(col("bhattacharyya"), 6).as("bhattacharyya"))
    },

    // Propensity radius matching on the 0.03 caliper grid: score =
    // (user_id % 97)/100, treated = user parity, outcome = any event
    // value > 90.
    q("q_events_psm",
      """WITH pu AS (
        |  SELECT user_id AS unit, (user_id % 2 = 1) AS t,
        |    (user_id % 97) / 100.0::DOUBLE AS score,
        |    CAST(CASE WHEN max(value) > 90 THEN 1 ELSE 0 END AS DOUBLE)
        |      AS y
        |  FROM events GROUP BY 1, 2, 3
        |), b AS (
        |  SELECT *, CAST(floor(score / 0.03::DOUBLE) AS BIGINT) AS g
        |  FROM pu
        |), ctl AS (
        |  SELECT g, score AS cscore, CAST(count(*) AS BIGINT) AS nc,
        |    avg(y) AS cy
        |  FROM b WHERE NOT t GROUP BY 1, 2
        |), tr AS (SELECT unit, score, y FROM b WHERE t),
        |cand AS (
        |  SELECT tr.unit, tr.score, tr.y, c.cscore, c.nc, c.cy
        |  FROM tr, unnest([
        |    CAST(floor(tr.score / 0.03::DOUBLE) AS BIGINT) - 1,
        |    CAST(floor(tr.score / 0.03::DOUBLE) AS BIGINT),
        |    CAST(floor(tr.score / 0.03::DOUBLE) AS BIGINT) + 1]) AS u(g)
        |  JOIN ctl c ON c.g = u.g
        |  WHERE abs(tr.score - c.cscore) <= 0.03::DOUBLE
        |), best AS (
        |  SELECT unit, cscore AS matched_score, nc, cy FROM cand
        |  QUALIFY row_number() OVER (PARTITION BY unit
        |    ORDER BY abs(score - cscore), cscore) = 1
        |), m AS (
        |  SELECT tr.unit, tr.score, tr.y AS treated_y,
        |    best.matched_score, best.nc, best.cy,
        |    best.matched_score IS NOT NULL AS matched
        |  FROM tr LEFT JOIN best USING (unit)
        |), agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_treated,
        |    CAST(sum(CASE WHEN matched THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_matched,
        |    avg(CASE WHEN matched THEN treated_y - cy END) AS att
        |  FROM m
        |)
        |SELECT m.unit, round(m.score, 6) AS score, m.treated_y,
        |  round(m.matched_score, 6) + 0.0 AS matched_score,
        |  m.nc AS n_controls_at_match,
        |  round(m.cy, 6) + 0.0 AS control_y_mean, m.matched,
        |  round(agg.att, 6) + 0.0 AS att, agg.n_treated, agg.n_matched
        |FROM m, agg ORDER BY unit""".stripMargin) { (s, dir) =>
      val pu = t(s, dir, "events")
        .groupBy(col("user_id").as("unit"),
          (col("user_id") % 2 === 1).as("t"),
          ((col("user_id") % 97) / 100.0).as("score"))
        .agg(when(max(col("value")) > 90, 1.0).otherwise(0.0).as("y"))
      Events.propensityMatch(pu, "unit", "t", "score", "y",
          caliper = 0.03)
        .select(col("unit"), round(col("score"), 6).as("score"),
          col("treated_y"),
          (round(col("matched_score"), 6) + 0.0).as("matched_score"),
          col("n_controls_at_match"),
          (round(col("control_y_mean"), 6) + 0.0).as("control_y_mean"),
          col("matched"), (round(col("att"), 6) + 0.0).as("att"),
          col("n_treated"), col("n_matched"))
        .orderBy("unit")
    },

    // Qini uplift deciles: score = user_id % 89, treated = parity,
    // outcome = any event value > 90.
    q("q_eval_qini",
      """WITH pu AS (
        |  SELECT user_id, user_id % 89 AS s, (user_id % 2 = 1) AS t,
        |    CASE WHEN max(value) > 90 THEN 1 ELSE 0 END AS y
        |  FROM events GROUP BY 1, 2, 3
        |), bs AS (
        |  SELECT s, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        |    CAST(sum(CASE WHEN t THEN y ELSE 0 END) AS BIGINT) AS ct,
        |    CAST(sum(CASE WHEN NOT t THEN y ELSE 0 END) AS BIGINT) AS cc
        |  FROM pu GROUP BY 1
        |), cum AS (
        |  SELECT s, n, nt, ct, cc,
        |    coalesce(sum(n) OVER (ORDER BY s DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS before,
        |    sum(n) OVER () AS tot
        |  FROM bs
        |), bk AS (
        |  SELECT CAST(1 + floor(before * 10 / tot) AS BIGINT) AS bucket,
        |    n, nt, ct, cc, tot
        |  FROM cum
        |), pb AS (
        |  SELECT bucket, CAST(sum(n) AS BIGINT) AS n,
        |    CAST(sum(nt) AS BIGINT) AS n_t,
        |    CAST(sum(n) - sum(nt) AS BIGINT) AS n_c,
        |    CAST(sum(ct) AS BIGINT) AS conv_t,
        |    CAST(sum(cc) AS BIGINT) AS conv_c,
        |    CAST(max(tot) AS BIGINT) AS tot
        |  FROM bk GROUP BY 1
        |), cc2 AS (
        |  SELECT *,
        |    sum(n_t) OVER wb AS cnt, sum(n_c) OVER wb AS cnc,
        |    sum(conv_t) OVER wb AS cct, sum(conv_c) OVER wb AS ccc,
        |    sum(n) OVER wb AS cn,
        |    sum(n_t) OVER () AS tnt, sum(n_c) OVER () AS tnc,
        |    sum(conv_t) OVER () AS tct, sum(conv_c) OVER () AS tcc
        |  FROM pb WINDOW wb AS (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)
        |SELECT bucket, n_t, n_c, conv_t, conv_c,
        |  round(CASE WHEN cnc > 0 THEN
        |    cct - ccc * CAST(cnt AS DOUBLE) / cnc END, 6) + 0.0 AS qini,
        |  round(CASE WHEN tnc > 0 THEN
        |    (tct - tcc * CAST(tnt AS DOUBLE) / tnc)
        |      * CAST(cn AS DOUBLE) / tot END, 6) + 0.0 AS qini_random
        |FROM cc2 ORDER BY bucket""".stripMargin) { (s, dir) =>
      val pu = t(s, dir, "events")
        .groupBy(col("user_id"), (col("user_id") % 89).as("score"),
          (col("user_id") % 2 === 1).as("t"))
        .agg(when(max(col("value")) > 90, 1).otherwise(0).as("y"))
      Eval.qiniCurve(pu, "score", "t", "y", k = 10)
        .select(col("bucket"), col("n_t"), col("n_c"), col("conv_t"),
          col("conv_c"), (round(col("qini"), 6) + 0.0).as("qini"),
          (round(col("qini_random"), 6) + 0.0).as("qini_random"))
        .orderBy("bucket")
    },

    // Exposure-fairness audit: per-source ranking by n_chars, groups
    // = language, top-20 exposure vs item share.
    q("q_eval_exposure",
      """WITH r AS (
        |  SELECT lang,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rank
        |  FROM documents
        |), per AS (
        |  SELECT lang AS grp, CAST(count(*) AS BIGINT) AS n_items,
        |    CAST(sum(CASE WHEN rank <= 20 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_in_topk,
        |    coalesce(sum(CASE WHEN rank <= 20 THEN
        |      1.0::DOUBLE / log2(CAST(rank AS DOUBLE) + 1.0::DOUBLE)
        |      END), 0.0::DOUBLE) AS exposure
        |  FROM r GROUP BY 1
        |), tot AS (
        |  SELECT CAST(sum(n_items) AS BIGINT) AS ti,
        |    sum(exposure) AS te FROM per
        |)
        |SELECT grp, n_items, n_in_topk, round(exposure, 6) AS exposure,
        |  round(CASE WHEN te > 0 THEN exposure / te END, 6)
        |    AS exposure_share,
        |  round(CAST(n_items AS DOUBLE) / ti, 6) AS item_share,
        |  round(CASE WHEN te > 0 THEN (exposure / te)
        |    / (CAST(n_items AS DOUBLE) / ti) END, 6) AS disparity
        |FROM per, tot ORDER BY grp""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("source")
        .orderBy(col("n_chars").desc, col("doc_id"))
      val ranked = t(s, dir, "documents")
        .withColumn("rank", row_number().over(w))
      Eval.exposureReport(ranked, "rank", "lang", k = 20)
        .select(col("group").as("grp"), col("n_items"), col("n_in_topk"),
          round(col("exposure"), 6).as("exposure"),
          round(col("exposure_share"), 6).as("exposure_share"),
          round(col("item_share"), 6).as("item_share"),
          round(col("disparity"), 6).as("disparity"))
        .orderBy("grp")
    },

    // Delta-method ratio metric (value per event) per variant under
    // user-level randomization; control = variant '0'.
    q("q_events_delta_ratio",
      """WITH pu AS (
        |  SELECT user_id, CAST(user_id % 3 AS VARCHAR) AS variant,
        |    sum(value) AS y, sum(1.0::DOUBLE) AS n
        |  FROM events GROUP BY 1, 2
        |), per AS (
        |  SELECT variant, CAST(count(*) AS BIGINT) AS users,
        |    sum(y) AS ys, sum(n) AS ns, sum(y * y) AS yy,
        |    sum(y * n) AS yn, sum(n * n) AS nn
        |  FROM pu GROUP BY 1
        |), d AS (
        |  SELECT *, ys / ns AS ratio, ns / users AS nbar,
        |    (yy - ys * ys / users) / (users - 1) AS syy,
        |    (yn - ys * ns / users) / (users - 1) AS syn,
        |    (nn - ns * ns / users) / (users - 1) AS snn
        |  FROM per
        |), e AS (
        |  SELECT variant, users, ys, ns, ratio,
        |    CASE WHEN users > 1 AND ns > 0 THEN
        |      sqrt(greatest((syy - 2.0::DOUBLE * ratio * syn
        |        + ratio * ratio * snn) / (users * nbar * nbar),
        |        0.0::DOUBLE)) END AS se
        |  FROM d
        |), ctl AS (
        |  SELECT ratio AS c_ratio, se AS c_se FROM e WHERE variant = '0'
        |)
        |SELECT variant, users, round(ys, 4) AS num_sum,
        |  round(ns, 4) AS den_sum, round(ratio, 6) AS ratio,
        |  round(se, 6) AS se,
        |  round(CASE WHEN variant != '0' AND se IS NOT NULL
        |      AND c_se IS NOT NULL AND se * se + c_se * c_se > 0 THEN
        |    (ratio - c_ratio) / sqrt(se * se + c_se * c_se) END, 6)
        |    + 0.0 AS z_vs_control
        |FROM e, ctl ORDER BY variant""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events").select(col("user_id"),
        (col("user_id") % 3).cast("string").as("variant"),
        col("value"), lit(1.0).as("one"))
      Events.deltaMethodRatio(ev, "user_id", "variant", "value", "one",
          controlVariant = "0")
        .select(col("variant"), col("users"),
          round(col("num_sum"), 4).as("num_sum"),
          round(col("den_sum"), 4).as("den_sum"),
          round(col("ratio"), 6).as("ratio"), round(col("se"), 6).as("se"),
          (round(col("z_vs_control"), 6) + 0.0).as("z_vs_control"))
        .orderBy("variant")
    },

    // Replay off-policy evaluation: logged arm = event_type, policy
    // chooses by value threshold, reward = value/100.
    q("q_eval_bandit_replay",
      """WITH d AS (
        |  SELECT event_type AS logged,
        |    CASE WHEN value > 50 THEN 'purchase' ELSE 'click' END
        |      AS policy,
        |    value / 100.0::DOUBLE AS reward
        |  FROM events
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_logged,
        |  CAST(sum(CASE WHEN logged = policy THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_matched,
        |  round(sum(CASE WHEN logged = policy THEN 1 ELSE 0 END)
        |    * 1.0::DOUBLE / count(*), 6) AS match_rate,
        |  round(avg(CASE WHEN logged = policy THEN reward END), 6)
        |    AS value
        |FROM d""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "events").select(
        col("event_type").as("logged"),
        when(col("value") > 50, "purchase").otherwise("click")
          .as("policy"),
        (col("value") / 100.0).as("reward"))
      Eval.banditReplay(d, "logged", "policy", "reward")
        .select(col("n_logged"), col("n_matched"),
          round(col("match_rate"), 6).as("match_rate"),
          round(col("value"), 6).as("value"))
    },

    // Per-arm replay diagnostics for the same policy.
    q("q_eval_bandit_arm",
      """WITH d AS (
        |  SELECT event_type AS logged,
        |    CASE WHEN value > 50 THEN 'purchase' ELSE 'click' END
        |      AS policy,
        |    value / 100.0::DOUBLE AS reward
        |  FROM events
        |)
        |SELECT policy AS arm, CAST(count(*) AS BIGINT) AS n_policy,
        |  CAST(sum(CASE WHEN logged = policy THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_matched,
        |  round(avg(CASE WHEN logged = policy THEN reward END), 6)
        |    + 0.0 AS value
        |FROM d GROUP BY 1 ORDER BY arm""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "events").select(
        col("event_type").as("logged"),
        when(col("value") > 50, "purchase").otherwise("click")
          .as("policy"),
        (col("value") / 100.0).as("reward"))
      Eval.banditReplayByArm(d, "logged", "policy", "reward")
        .select(col("arm"), col("n_policy"), col("n_matched"),
          (round(col("value"), 6) + 0.0).as("value"))
        .orderBy("arm")
    },

    // TwoNN intrinsic dimension of the vec_id<1000 embedding sample,
    // integer-quantized so both engines select identical neighbors.
    q("q_embed_twonn",
      """WITH samp AS (
        |  SELECT vec_id AS id,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> floor(x * 1000 + 0.5::DOUBLE)) AS q
        |  FROM embeddings WHERE vec_id < 1000
        |), pair AS (
        |  SELECT a.id AS aid,
        |    list_aggregate(list_transform(range(1, len(a.q) + 1),
        |      i -> (a.q[i] - b.q[i]) * (a.q[i] - b.q[i])), 'sum') AS d2
        |  FROM samp a JOIN samp b ON a.id != b.id
        |), top2 AS (
        |  SELECT aid, d2,
        |    row_number() OVER (PARTITION BY aid ORDER BY d2) AS rk
        |  FROM pair QUALIFY rk <= 2
        |), mu AS (
        |  SELECT aid, CASE WHEN min(d2) > 0 THEN
        |    0.5::DOUBLE * ln(max(d2) / min(d2)) END AS mu
        |  FROM top2 GROUP BY 1
        |)
        |SELECT CAST(sum(CASE WHEN mu IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_used,
        |  CAST(sum(CASE WHEN mu IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dropped,
        |  round(sum(mu) / sum(CASE WHEN mu IS NOT NULL THEN 1 ELSE 0
        |    END), 6) AS mu_mean,
        |  round(CASE WHEN sum(mu) > 0 THEN
        |    sum(CASE WHEN mu IS NOT NULL THEN 1 ELSE 0 END)
        |      * 1.0::DOUBLE / sum(mu) END, 6) AS intrinsic_dim
        |FROM mu""".stripMargin) { (s, dir) =>
      val samp = t(s, dir, "embeddings").filter(col("vec_id") < 1000)
        .select(col("vec_id").as("id"),
          // cast to double BEFORE scaling: float*1000 rounds at float
          // precision and can quantize differently from the oracle's
          // CAST(embedding AS DOUBLE[]) path
          transform(col("embedding").cast("array<double>"),
            x => floor(x * 1000 + 0.5)).cast("array<float>").as("vec"))
      graft.ml.Similarity.intrinsicDimension(samp)
        .select(col("n_used"), col("n_dropped"),
          round(col("mu_mean"), 6).as("mu_mean"),
          round(col("intrinsic_dim"), 6).as("intrinsic_dim"))
    },

    // Covariance spectrum shape of the vec_id<2000 embedding sample:
    // the eigen-free participation ratio replays in SQL; the
    // eigen-dependent effective rank / top share stay spec-gated.
    q("q_embed_effrank",
      """WITH samp AS (
        |  SELECT CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id < 2000
        |), cell AS (
        |  SELECT i.i AS i, j.j AS j, avg(v[i.i] * v[j.j]) AS exy,
        |    avg(v[i.i]) AS exi, avg(v[j.j]) AS exj
        |  FROM samp, range(1, 65) AS i(i), range(1, 65) AS j(j)
        |  GROUP BY 1, 2
        |), cov AS (
        |  SELECT i, j, exy - exi * exj AS c FROM cell
        |), agg AS (
        |  SELECT sum(CASE WHEN i = j THEN c ELSE 0.0::DOUBLE END)
        |      AS trace,
        |    sum(c * c) AS frob2, CAST(max(i) AS BIGINT) AS dim
        |  FROM cov
        |), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM samp)
        |SELECT dim, n, round(trace, 4) AS trace,
        |  round(trace * trace / frob2, 4) AS participation_ratio
        |FROM agg, nn""".stripMargin) { (s, dir) =>
      graft.ml.Pca.effectiveRank(
          t(s, dir, "embeddings").filter(col("vec_id") < 2000)
            .select(col("embedding").as("vec")), "vec", 64)
        .select(col("dim"), col("n"), round(col("trace"), 4).as("trace"),
          round(col("participation_ratio"), 4).as("participation_ratio"))
    },

    // Pk / WindowDiff segmentation eval: textTiling predictions vs a
    // deterministic every-third-gap reference, window k = 2.
    q("q_text_windowdiff",
      s"""WITH tk AS (
         |  SELECT doc_id AS id,
         |    list_filter(string_split($normSql, ' '), x -> x <> '') AS ws
         |  FROM documents
         |), tok AS (
         |  SELECT id, CAST(floor((u.i - 1) / 20) AS BIGINT) AS blk,
         |    ws[u.i] AS tok
         |  FROM tk, unnest(range(1, len(ws) + 1)) AS u(i)
         |), cnt AS (
         |  SELECT id, blk, tok, CAST(count(*) AS BIGINT) AS n
         |  FROM tok GROUP BY 1, 2, 3
         |), norms AS (
         |  SELECT id, blk, CAST(sum(n * n) AS BIGINT) AS sq
         |  FROM cnt GROUP BY 1, 2
         |), dots AS (
         |  SELECT a.id, a.blk AS gap, CAST(sum(a.n * b.n) AS BIGINT) AS dot
         |  FROM cnt a JOIN cnt b ON a.id = b.id AND a.tok = b.tok
         |    AND b.blk = a.blk + 1
         |  GROUP BY 1, 2
         |), sims AS (
         |  SELECT x.id, x.blk AS gap,
         |    CAST(coalesce(d.dot, 0) AS DOUBLE)
         |      / sqrt(CAST(x.sq AS DOUBLE) * y.sq) AS sim
         |  FROM norms x JOIN norms y
         |    ON x.id = y.id AND y.blk = x.blk + 1
         |  LEFT JOIN dots d ON d.id = x.id AND d.gap = x.blk
         |), dep AS (
         |  SELECT id, gap, sim,
         |    greatest(coalesce(lag(sim) OVER w, sim) - sim, 0.0::DOUBLE)
         |    + greatest(coalesce(lead(sim) OVER w, sim) - sim,
         |        0.0::DOUBLE) AS depth
         |  FROM sims WINDOW w AS (PARTITION BY id ORDER BY gap)
         |), st AS (
         |  SELECT id, gap,
         |    floor(depth * 1e6 + 0.5::DOUBLE)
         |      > floor((avg(depth) OVER (PARTITION BY id)
         |        + 1.0::DOUBLE * stddev_pop(depth) OVER (PARTITION BY id))
         |        * 1e6 + 0.5::DOUBLE) AS p,
         |    gap % 3 = 2 AS r
         |  FROM dep
         |), sw AS (
         |  SELECT id, gap, p, r,
         |    sum(CASE WHEN p THEN 1 ELSE 0 END) OVER wk AS pw,
         |    sum(CASE WHEN r THEN 1 ELSE 0 END) OVER wk AS rw,
         |    count(*) OVER (PARTITION BY id) AS n_gaps,
         |    row_number() OVER (PARTITION BY id ORDER BY gap) AS pos
         |  FROM st WINDOW wk AS (PARTITION BY id ORDER BY gap
         |    ROWS BETWEEN CURRENT ROW AND 1 FOLLOWING)
         |)
         |SELECT id, CAST(max(n_gaps) AS BIGINT) AS n_gaps,
         |  CAST(count(*) AS BIGINT) AS n_windows,
         |  round(sum(CASE WHEN (pw > 0) != (rw > 0) THEN 1 ELSE 0 END)
         |    * 1.0::DOUBLE / count(*), 6) AS pk,
         |  round(sum(CASE WHEN pw != rw THEN 1 ELSE 0 END)
         |    * 1.0::DOUBLE / count(*), 6) AS window_diff
         |FROM sw WHERE pos <= n_gaps - 1
         |GROUP BY 1 ORDER BY id""".stripMargin) { (s, dir) =>
      val tl = TA.textTiling(t(s, dir, "documents"), "doc_id", "text",
          blockSize = 20, c = 1.0)
        .withColumn("ref", col("gap") % 3 === 2)
      TA.windowDiff(tl, "id", "gap", "boundary", "ref", k = 2)
        .select(col("id"), col("n_gaps"), col("n_windows"),
          round(col("pk"), 6).as("pk"),
          round(col("window_diff"), 6).as("window_diff"))
        .orderBy("id")
    },

    // Markov entropy rate of the event-type process.
    q("q_events_markov_entropy",
      """WITH e AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |    event_id, event_type
        |  FROM events
        |), tr AS (
        |  SELECT event_type AS src,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY sec, event_id) AS nxt
        |  FROM e
        |), cnt AS (
        |  SELECT src, nxt, CAST(count(*) AS BIGINT) AS nij
        |  FROM tr WHERE nxt IS NOT NULL GROUP BY 1, 2
        |), sc AS (
        |  SELECT src, CAST(sum(nij) AS BIGINT) AS ni FROM cnt GROUP BY 1
        |), tot AS (
        |  SELECT CAST(sum(ni) AS BIGINT) AS nt,
        |    CAST(count(*) AS BIGINT) AS n_states
        |  FROM sc
        |), h1 AS (
        |  SELECT sum(nij * ln(nij * 1.0::DOUBLE / sc.ni)) AS sum_n_lnp
        |  FROM cnt JOIN sc USING (src)
        |), h0 AS (
        |  SELECT 0.0::DOUBLE
        |    - sum(ni * 1.0::DOUBLE / nt * ln(ni * 1.0::DOUBLE / nt))
        |    AS h0
        |  FROM sc, tot
        |)
        |SELECT tot.nt AS n_transitions, tot.n_states,
        |  round(h0.h0, 6) + 0.0 AS h0,
        |  round(0.0::DOUBLE - h1.sum_n_lnp / tot.nt, 6) + 0.0 AS h_rate,
        |  round(h0.h0 - (0.0::DOUBLE - h1.sum_n_lnp / tot.nt), 6) + 0.0
        |    AS predictability_gain
        |FROM tot, h0, h1""".stripMargin) { (s, dir) =>
      val raw = t(s, dir, "events")
      val ev = raw.select(col("user_id"), Ts.seconds(raw).as("sec"),
        col("event_id"), col("event_type"))
      Events.markovEntropy(ev, "user_id", "sec", "event_type",
          "event_id")
        .select(col("n_transitions"), col("n_states"),
          (round(col("h0"), 6) + 0.0).as("h0"),
          (round(col("h_rate"), 6) + 0.0).as("h_rate"),
          (round(col("predictability_gain"), 6) + 0.0)
            .as("predictability_gain"))
    },

    // Per-source unigram-LM cross-entropy matrix (alpha = 0.5).
    q("q_text_xent",
      s"""WITH cnt AS (
         |  SELECT source AS stratum, u.t AS tok,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT source, list_filter(string_split($normSql, ' '),
         |      x -> x <> '') AS ws FROM documents), unnest(ws) AS u(t)
         |  GROUP BY 1, 2
         |), tt AS (
         |  SELECT stratum, CAST(sum(c) AS BIGINT) AS n
         |  FROM cnt GROUP BY 1
         |), vb AS (
         |  SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM cnt
         |), shr AS (
         |  SELECT a.stratum AS sa, b.stratum AS sb,
         |    CAST(count(*) AS BIGINT) AS shared_types,
         |    CAST(sum(a.c) AS BIGINT) AS ca_shared,
         |    sum(a.c * ln(b.c + 0.5::DOUBLE)) AS num_part
         |  FROM cnt a JOIN cnt b USING (tok) GROUP BY 1, 2
         |), grid AS (
         |  SELECT ta.stratum AS sa, ta.n AS na, tb.stratum AS sb,
         |    tb.n AS nb, vb.v
         |  FROM tt ta, tt tb, vb
         |)
         |SELECT g.sa AS stratum_a, g.sb AS stratum_b,
         |  coalesce(s.shared_types, 0) AS shared_types,
         |  round(ln(g.nb + 0.5::DOUBLE * g.v)
         |    - (coalesce(s.num_part, 0.0::DOUBLE)
         |      + (g.na - coalesce(s.ca_shared, 0)) * ln(0.5::DOUBLE))
         |      / g.na, 6) AS cross_entropy
         |FROM grid g LEFT JOIN shr s ON s.sa = g.sa AND s.sb = g.sb
         |ORDER BY stratum_a, stratum_b""".stripMargin) { (s, dir) =>
      TA.crossEntropyMatrix(t(s, dir, "documents"), "source", "text",
          smoothing = 0.5)
        .select(col("stratum_a"), col("stratum_b"), col("shared_types"),
          round(col("cross_entropy"), 6).as("cross_entropy"))
        .orderBy("stratum_a", "stratum_b")
    },

    // Directed reciprocity of the event-type transition graph.
    q("q_graph_reciprocity",
      """WITH e AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT event_type AS src,
        |      lead(event_type) OVER (PARTITION BY user_id
        |        ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
        |        AS dst
        |    FROM events
        |  ) WHERE dst IS NOT NULL AND src != dst
        |), p AS (
        |  SELECT least(src, dst) AS a, greatest(src, dst) AS b,
        |    CAST(count(*) AS BIGINT) AS dirs
        |  FROM e GROUP BY 1, 2
        |)
        |SELECT CAST(sum(dirs) AS BIGINT) AS n_edges,
        |  CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(CASE WHEN dirs = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_mutual,
        |  CAST(sum(CASE WHEN dirs = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_asym,
        |  round(2.0::DOUBLE * sum(CASE WHEN dirs = 2 THEN 1 ELSE 0 END)
        |    / sum(dirs), 6) AS reciprocity
        |FROM p""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.{Window => W}
      val raw = t(s, dir, "events")
      val w = W.partitionBy("user_id")
        .orderBy(Ts.seconds(raw), col("event_id"))
      val edges = raw
        .withColumn("dst", lead(col("event_type"), 1).over(w))
        .filter(col("dst").isNotNull)
        .select(col("event_type").as("src"), col("dst"))
      graft.graph.Graphs.reciprocity(edges)
        .select(col("n_edges"), col("n_pairs"), col("n_mutual"),
          col("n_asym"), round(col("reciprocity"), 6).as("reciprocity"))
    },

    // Exact DAU/MAU stickiness (7-day window on the 30-day corpus so
    // the ratio actually moves).
    q("q_events_stickiness",
      """WITH ud AS (
        |  SELECT DISTINCT user_id AS u,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
        |  FROM events
        |), iv AS (
        |  SELECT u, min(day) AS start, max(day) + 6 AS fin FROM (
        |    SELECT u, day,
        |      sum(CASE WHEN prev IS NULL OR day - prev >= 7
        |        THEN 1 ELSE 0 END) OVER (PARTITION BY u ORDER BY day
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |        AS int_id
        |    FROM (SELECT u, day, lag(day) OVER (PARTITION BY u
        |      ORDER BY day) AS prev FROM ud)
        |  ) GROUP BY u, int_id
        |), deltas AS (
        |  SELECT start AS day, 1 AS d FROM iv
        |  UNION ALL SELECT fin + 1, -1 FROM iv
        |  UNION ALL SELECT gs.day, 0 FROM (
        |    SELECT unnest(range((SELECT min(day) FROM ud),
        |      (SELECT max(day) FROM ud) + 1)) AS day) gs
        |), grid AS (
        |  SELECT day, CAST(sum(d) AS BIGINT) AS delta
        |  FROM deltas GROUP BY 1
        |), mau AS (
        |  SELECT day, sum(delta) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mau
        |  FROM grid
        |), dau AS (
        |  SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY 1
        |)
        |SELECT m.day, coalesce(d.dau, 0) AS dau,
        |  CAST(m.mau AS BIGINT) AS mau,
        |  round(coalesce(d.dau, 0) * 1.0::DOUBLE / m.mau, 6)
        |    AS stickiness
        |FROM mau m LEFT JOIN dau d USING (day)
        |WHERE m.day <= (SELECT max(day) FROM ud)
        |ORDER BY m.day""".stripMargin) { (s, dir) =>
      val raw = t(s, dir, "events")
      val ev = raw.select(col("user_id"), Ts.seconds(raw).as("sec"))
      Events.stickiness(ev, "user_id", "sec", windowDays = 7)
        .select(col("day"), col("dau"), col("mau"),
          round(col("stickiness"), 6).as("stickiness"))
        .orderBy("day")
    },

    // TextTiling-lite gaps over 20-token blocks, c = 1.0 — the full
    // similarity/depth/boundary trace per document.
    q("q_text_tiling",
      s"""WITH tk AS (
         |  SELECT doc_id AS id,
         |    list_filter(string_split($normSql, ' '), x -> x <> '') AS ws
         |  FROM documents
         |), tok AS (
         |  SELECT id, CAST(floor((u.i - 1) / 20) AS BIGINT) AS blk,
         |    ws[u.i] AS tok
         |  FROM tk, unnest(range(1, len(ws) + 1)) AS u(i)
         |), cnt AS (
         |  SELECT id, blk, tok, CAST(count(*) AS BIGINT) AS n
         |  FROM tok GROUP BY 1, 2, 3
         |), norms AS (
         |  SELECT id, blk, CAST(sum(n * n) AS BIGINT) AS sq
         |  FROM cnt GROUP BY 1, 2
         |), dots AS (
         |  SELECT a.id, a.blk AS gap, CAST(sum(a.n * b.n) AS BIGINT) AS dot
         |  FROM cnt a JOIN cnt b ON a.id = b.id AND a.tok = b.tok
         |    AND b.blk = a.blk + 1
         |  GROUP BY 1, 2
         |), sims AS (
         |  SELECT x.id, x.blk AS gap,
         |    CAST(coalesce(d.dot, 0) AS DOUBLE)
         |      / sqrt(CAST(x.sq AS DOUBLE) * y.sq) AS sim
         |  FROM norms x JOIN norms y
         |    ON x.id = y.id AND y.blk = x.blk + 1
         |  LEFT JOIN dots d ON d.id = x.id AND d.gap = x.blk
         |), dep AS (
         |  SELECT id, gap, sim,
         |    greatest(coalesce(lag(sim) OVER w, sim) - sim, 0.0::DOUBLE)
         |    + greatest(coalesce(lead(sim) OVER w, sim) - sim,
         |        0.0::DOUBLE) AS depth
         |  FROM sims WINDOW w AS (PARTITION BY id ORDER BY gap)
         |), st AS (
         |  SELECT id, gap, sim, depth,
         |    avg(depth) OVER (PARTITION BY id) AS mu,
         |    stddev_pop(depth) OVER (PARTITION BY id) AS sd
         |  FROM dep
         |)
         |SELECT id, gap, round(sim, 6) AS sim, round(depth, 6) AS depth,
         |  floor(depth * 1e6 + 0.5::DOUBLE)
         |    > floor((mu + 1.0::DOUBLE * sd) * 1e6 + 0.5::DOUBLE)
         |    AS boundary
         |FROM st ORDER BY id, gap""".stripMargin) { (s, dir) =>
      TA.textTiling(t(s, dir, "documents"), "doc_id", "text",
          blockSize = 20, c = 1.0)
        .select(col("id"), col("gap"), round(col("sim"), 6).as("sim"),
          round(col("depth"), 6).as("depth"), col("boundary"))
        .orderBy("id", "gap")
    }
  )
}
