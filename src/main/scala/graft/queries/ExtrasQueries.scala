package graft.queries

import org.apache.spark.sql.functions._
import graft.agg.{Aggregators, Hll, Monoid}
import graft.dsl.FieldsApi._
import graft.matrix.Combinatorics
import graft.typed.TypedPipe

/** Coverage for the remaining SURVEY §2 operators: ring product,
  * sketch-valued HLL, custom Aggregator through the DataFrame udaf
  * path, combinatorics streams, resource-lifecycle maps, pack/unpack.
  */
object ExtrasQueries extends QueryGroup {

  val all: Seq[QueryDef] = Seq(

    // one-pass multi-column profile (rows / non-nulls / distincts /
    // min / max stringified and stacked): pipeline hygiene at scale —
    // the approx (HLL) variant is the 100 TB path, the exact form is
    // gate-matched here.
    q("q_profile",
      """WITH p AS (
        |  SELECT 'o_custkey' AS col_name, count(*) AS n_rows,
        |    count(o_custkey) AS n_non_null,
        |    count(DISTINCT o_custkey) AS n_distinct,
        |    CAST(min(o_custkey) AS VARCHAR) AS min_value,
        |    CAST(max(o_custkey) AS VARCHAR) AS max_value
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice', count(*), count(o_totalprice),
        |    count(DISTINCT o_totalprice),
        |    CAST(min(o_totalprice) AS VARCHAR), CAST(max(o_totalprice) AS VARCHAR)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', count(*), count(o_orderpriority),
        |    count(DISTINCT o_orderpriority),
        |    CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR)
        |  FROM orders
        |)
        |SELECT * FROM p ORDER BY col_name""".stripMargin) { (s, dir) =>
      graft.ml.Profile.profile(t(s, dir, "orders"),
        Seq("o_custkey", "o_totalprice", "o_orderpriority"))
        .orderBy("col_name")
    },

    // declarative data-quality expectations: five row-level rules in
    // ONE conditional-count aggregate (shared scan), plus the grouped
    // uniqueness pass and the anti-join referential probe — the
    // ingest gate shape. The synthetic lineitem's (l_orderkey,
    // l_linenumber) is deliberately non-unique, so the report carries
    // a genuine failure next to the passes; the oracle replays every
    // count.
    q("q_quality_expectations",
      """SELECT 'in_range(l_discount,0.0,0.1)' AS rule,
        |  CAST(count(*) AS BIGINT) AS n_checked,
        |  CAST(sum(CASE WHEN l_discount IS NOT NULL
        |    AND (l_discount < 0.0 OR l_discount > 0.1) THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
        |  sum(CASE WHEN l_discount IS NOT NULL
        |    AND (l_discount < 0.0 OR l_discount > 0.1) THEN 1 ELSE 0 END) = 0 AS pass
        |FROM lineitem
        |UNION ALL
        |SELECT 'in_range(l_quantity,1.0,50.0)', CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) = 0
        |FROM lineitem
        |UNION ALL
        |SELECT 'is_in(l_returnflag)', CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) = 0
        |FROM lineitem
        |UNION ALL
        |SELECT 'not_null(l_orderkey)', CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) = 0
        |FROM lineitem
        |UNION ALL
        |SELECT 'price_positive', CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN NOT coalesce(l_extendedprice > 0, false) THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN NOT coalesce(l_extendedprice > 0, false) THEN 1 ELSE 0 END) = 0
        |FROM lineitem
        |UNION ALL
        |SELECT 'subset_of(l_orderkey,o_orderkey)',
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem WHERE l_orderkey IS NOT NULL),
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem
        |     WHERE l_orderkey IS NOT NULL
        |       AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
        |  (SELECT count(*) FROM lineitem
        |     WHERE l_orderkey IS NOT NULL
        |       AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)) = 0
        |UNION ALL
        |SELECT 'unique(l_orderkey,l_linenumber)',
        |  CAST(sum(c) AS BIGINT),
        |  CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS BIGINT),
        |  coalesce(sum(CASE WHEN c > 1 THEN c END), 0) = 0
        |FROM (SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber)
        |ORDER BY rule""".stripMargin) { (s, dir) =>
      import graft.ml.Expectations
      import graft.ml.Expectations.Expect
      val li = t(s, dir, "lineitem")
      val rows = Expectations.report(li, Seq(
        Expect.notNull("l_orderkey"),
        Expect.inRange("l_quantity", 1.0, 50.0),
        Expect.inRange("l_discount", 0.0, 0.1),
        Expect.isIn("l_returnflag", Seq("A", "N", "R")),
        Expect.satisfies("price_positive", col("l_extendedprice") > 0)))
      val uniq = Expectations.uniqueReport(li, Seq("l_orderkey", "l_linenumber"))
      val fk = Expectations.subsetReport(li, "l_orderkey",
        t(s, dir, "orders"), "o_orderkey")
      rows.unionByName(uniq).unionByName(fk).orderBy("rule")
    },

    // mergeable quantile sketch (deterministic-KLL): one distributed
    // sketch over every l_extendedprice, probed at four quantiles;
    // each estimate's tie-aware exact rank must land within 2% of n
    // of its target (the sketch contract), checked engine-side in one
    // conditional-count aggregate — the oracle asserts the bound.
    q("q_profile_quantile_sketch",
      """SELECT CAST(p AS DOUBLE) AS p, true AS within_eps
        |FROM (VALUES (0.25), (0.5), (0.75), (0.95)) t(p) ORDER BY p""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.agg.Qsketch
      val li = t(s, dir, "lineitem")
        .select(col("l_extendedprice").cast("double").as("v"))
      val sk = li.as[Double].select(Qsketch.aggregator(200).toColumn).head()
      val ps = Seq(0.25, 0.5, 0.75, 0.95)
      val ests = ps.map(p => p -> sk.quantile(p))
      val aggs = ests.zipWithIndex.flatMap { case ((_, e), i) =>
        Seq(count(when(col("v") < e, 1)).as(s"b$i"),
          count(when(col("v") <= e, 1)).as(s"ab$i"))
      }
      val row = li.agg(aggs.head, aggs.tail: _*).head()
      val n = sk.n.toDouble
      ests.zipWithIndex.map { case ((p, _), i) =>
        val below = row.getLong(2 * i)
        val atOrBelow = row.getLong(2 * i + 1)
        val err = math.max(0.0,
          math.max(below - p * n, p * n - atOrBelow)) / n
        (p, err <= 0.02)
      }.toDF("p", "within_eps").orderBy("p")
    },

    // robust per-group outlier detection (Hampel MAD rule): flag rows
    // whose |x − median| exceeds threshold × the median absolute
    // deviation — both statistics have 50% breakdown, so outliers
    // can't mask the cut. Exact medians here (value-count map per
    // group); the approx_percentile sketch is the 100 TB switch.
    q("q_profile_outliers",
      """WITH med AS (
        |  SELECT l_returnflag AS k, median(l_extendedprice) AS m
        |  FROM lineitem GROUP BY 1
        |), dev AS (
        |  SELECT l_returnflag AS k, l_extendedprice AS x,
        |    abs(l_extendedprice - m) AS d
        |  FROM lineitem JOIN med ON l_returnflag = med.k
        |), mad AS (
        |  SELECT k, median(d) AS md FROM dev GROUP BY k
        |)
        |SELECT dev.k AS l_returnflag, round(dev.x, 2) AS price
        |FROM dev JOIN mad ON dev.k = mad.k
        |WHERE dev.d > 1.8::DOUBLE * mad.md
        |ORDER BY l_returnflag, price""".stripMargin) { (s, dir) =>
      graft.ml.Profile.madOutliers(
          t(s, dir, "lineitem").select("l_returnflag", "l_extendedprice"),
          Seq("l_returnflag"), "l_extendedprice", threshold = 1.8)
        .filter(col("is_outlier"))
        .select(col("l_returnflag"),
          round(col("l_extendedprice"), 2).as("price"))
        .orderBy("l_returnflag", "price")
    },

    // per-stratum winsorization at the exact [5%, 95%] interpolated
    // quantiles (Spark `percentile` and DuckDB `quantile_cont` share
    // the p·(n−1) linear-interpolation definition): clip counts and
    // the clipped distribution's envelope per group.
    q("q_profile_winsorize",
      """WITH cuts AS (
        |  SELECT l_returnflag AS k,
        |    quantile_cont(l_extendedprice, 0.05) AS lo,
        |    quantile_cont(l_extendedprice, 0.95) AS hi
        |  FROM lineitem GROUP BY 1
        |), w AS (
        |  SELECT l_returnflag AS k,
        |    least(greatest(l_extendedprice, lo), hi) AS wv,
        |    (l_extendedprice < lo OR l_extendedprice > hi) AS clip
        |  FROM lineitem JOIN cuts ON l_returnflag = cuts.k
        |)
        |SELECT k AS l_returnflag, count(*)::BIGINT AS n,
        |  count(*) FILTER (WHERE clip) AS n_clipped,
        |  round(min(wv), 2) AS lo_cut, round(max(wv), 2) AS hi_cut
        |FROM w GROUP BY k ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      graft.ml.Profile.winsorize(
          t(s, dir, "lineitem").select("l_returnflag", "l_extendedprice"),
          "l_extendedprice", "l_returnflag")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(when(col("clipped"), 1L).otherwise(0L)).as("n_clipped"),
          round(min("l_extendedprice_winsorized"), 2).as("lo_cut"),
          round(max("l_extendedprice_winsorized"), 2).as("hi_cut"))
        .orderBy("l_returnflag")
    },

    // Spearman rank correlation (midrank ties) of quantity vs
    // extended price: both columns collapse to distinct values for
    // ranking, so the corpus is never globally sorted. l_quantity has
    // 50 distinct values over 60k rows — heavy tie blocks, so the
    // midrank arithmetic is the whole test.
    q("q_profile_spearman",
      """WITH x AS (
        |  SELECT l_quantity AS v, count(*)::BIGINT AS n
        |  FROM lineitem GROUP BY 1
        |), xr AS (
        |  SELECT v, coalesce(sum(n) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + (n + 1) / 2.0 AS rx
        |  FROM x
        |), y AS (
        |  SELECT l_extendedprice AS v, count(*)::BIGINT AS n
        |  FROM lineitem GROUP BY 1
        |), yr AS (
        |  SELECT v, coalesce(sum(n) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + (n + 1) / 2.0 AS ry
        |  FROM y
        |)
        |SELECT count(*)::BIGINT AS n, round(corr(rx, ry), 6) AS rho
        |FROM lineitem
        |JOIN xr ON l_quantity = xr.v
        |JOIN yr ON l_extendedprice = yr.v""".stripMargin) { (s, dir) =>
      graft.ml.Profile.spearman(
          t(s, dir, "lineitem").select("l_quantity", "l_extendedprice"),
          "l_quantity", "l_extendedprice")
        .select(col("n"), round(col("rho"), 6).as("rho"))
    },

    // Gini concentration of per-document token counts: is the corpus
    // mass owned by a few giant docs. Grouped closed form over the
    // distinct-count table.
    q("q_profile_gini",
      """WITH d AS (
        |  SELECT (CASE WHEN strlen(trim(text)) = 0 THEN 0
        |    ELSE len(string_split_regex(trim(text), '\s+')) END)::DOUBLE AS v
        |  FROM documents
        |), g AS (
        |  SELECT v, count(*)::BIGINT AS c FROM d WHERE v >= 0 GROUP BY 1
        |), r AS (
        |  SELECT v, c,
        |    coalesce(sum(c) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
        |  FROM g
        |), agg AS (
        |  SELECT sum(c)::BIGINT AS n, sum(v * c) AS total,
        |    sum(v * (c * before + c * (c + 1) / 2.0)) AS rs
        |  FROM r
        |)
        |SELECT n, round(total, 6) AS total,
        |  round(2.0 * rs / (n * total) - (n + 1)::DOUBLE / n, 6) AS gini
        |FROM agg""".stripMargin) { (s, dir) =>
      graft.ml.Profile.giniConcentration(
          t(s, dir, "documents")
            .select(graft.ml.TextAnalysis.tokenCount(col("text")).as("v")),
          "v")
        .select(col("n"), round(col("total"), 6).as("total"),
          round(col("gini"), 6).as("gini"))
    },

    // lang × source mutual information with the full entropy
    // decomposition — joint hash aggregate + marginals OF the joint,
    // term-identical ln arithmetic on both sides.
    q("q_profile_mi",
      """WITH j AS (
        |  SELECT lang AS a, source AS b, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2
        |), ma AS (
        |  SELECT a, CAST(sum(c) AS BIGINT) AS ca FROM j GROUP BY 1
        |), mb AS (
        |  SELECT b, CAST(sum(c) AS BIGINT) AS cb FROM j GROUP BY 1
        |), t AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n FROM j
        |), ent AS (
        |  SELECT max(n) AS n,
        |    (SELECT sum(-(ca::DOUBLE / n) * ln(ca::DOUBLE / n))
        |      FROM ma, t) AS h_a,
        |    (SELECT sum(-(cb::DOUBLE / n) * ln(cb::DOUBLE / n))
        |      FROM mb, t) AS h_b,
        |    sum(-(c::DOUBLE / n) * ln(c::DOUBLE / n)) AS h_ab,
        |    sum((c::DOUBLE / n)
        |      * ln((c::DOUBLE * n) / (ca::DOUBLE * cb))) AS mi
        |  FROM j JOIN ma USING (a) JOIN mb USING (b), t
        |)
        |SELECT n, round(h_a, 6) AS h_a, round(h_b, 6) AS h_b,
        |  round(h_ab, 6) AS h_ab, round(mi, 6) + 0.0 AS mi,
        |  round(h_ab - h_b, 6) AS h_a_given_b,
        |  round(h_ab - h_a, 6) AS h_b_given_a,
        |  round(CASE WHEN h_a > 0 AND h_b > 0
        |    THEN mi / sqrt(h_a * h_b) END, 6) + 0.0 AS nmi
        |FROM ent""".stripMargin) { (s, dir) =>
      graft.ml.Profile.mutualInformation(
          t(s, dir, "documents"), "lang", "source")
        .select(col("n"), round(col("h_a"), 6).as("h_a"),
          round(col("h_b"), 6).as("h_b"),
          round(col("h_ab"), 6).as("h_ab"),
          (round(col("mi"), 6) + 0.0).as("mi"),
          round(col("h_a_given_b"), 6).as("h_a_given_b"),
          round(col("h_b_given_a"), 6).as("h_b_given_a"),
          (round(col("nmi"), 6) + 0.0).as("nmi"))
    },

    // deterministic per-language uniform sample of 20 docs (md5-rank
    // bounded-PQ top-k — the reservoir-sampling replacement): exact
    // row_number replay.
    q("q_profile_sample",
      """WITH h AS (
        |  SELECT lang, doc_id,
        |    md5(concat_ws(chr(1), 'graft', lang,
        |      CAST(doc_id AS VARCHAR))) AS hh
        |  FROM documents
        |), r AS (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang ORDER BY hh, doc_id)
        |      AS rn
        |  FROM h
        |)
        |SELECT lang, doc_id FROM r WHERE rn <= 20
        |ORDER BY lang, doc_id""".stripMargin) { (s, dir) =>
      graft.ml.Profile.uniformSampleByKey(
          t(s, dir, "documents"), Seq("lang"), "doc_id", k = 20)
        .select(col("lang"), col("doc_id"))
        .orderBy("lang", "doc_id")
    },

    // Herfindahl–Hirschman source concentration per language: two
    // hash aggregates, integer-exact squared-count sum.
    q("q_profile_hhi",
      """WITH c AS (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1, 2
        |)
        |SELECT lang AS grp, CAST(sum(n) AS BIGINT) AS n,
        |  CAST(count(*) AS BIGINT) AS n_cats,
        |  round(CAST(sum(n * n) AS DOUBLE)
        |    / (CAST(sum(n) AS DOUBLE) * CAST(sum(n) AS DOUBLE)), 6)
        |    AS hhi
        |FROM c GROUP BY 1 ORDER BY grp""".stripMargin) { (s, dir) =>
      graft.ml.Profile.herfindahl(t(s, dir, "documents"), "lang", "source")
        .select(col("grp"), col("n"), col("n_cats"),
          round(col("hhi"), 6).as("hhi"))
        .orderBy("grp")
    },

    // top-fraction mass concentration of per-doc token counts: the
    // share of corpus tokens owned by the top 1%/10%/50% of docs,
    // tie groups at the cut counted pro-rata.
    q("q_profile_mass",
      """WITH d AS (
        |  SELECT (CASE WHEN strlen(trim(text)) = 0 THEN 0
        |    ELSE len(string_split_regex(trim(text), '\s+')) END)::DOUBLE AS v
        |  FROM documents
        |), g AS (
        |  SELECT v, count(*)::BIGINT AS c FROM d WHERE v >= 0 GROUP BY 1
        |), r AS (
        |  SELECT v, c,
        |    coalesce(sum(c) OVER (ORDER BY v DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS rows_before,
        |    coalesce(sum(v * c) OVER (ORDER BY v DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
        |      AS mass_before
        |  FROM g
        |), t AS (
        |  SELECT sum(c)::BIGINT AS n, sum(v * c) AS total FROM g
        |), f AS (
        |  SELECT unnest([0.01::DOUBLE, 0.1::DOUBLE, 0.5::DOUBLE]) AS frac
        |)
        |SELECT frac, CAST(ceil(frac * n) AS BIGINT) AS k_rows,
        |  round(mass_before + v * (ceil(frac * n) - rows_before), 6) AS mass,
        |  round((mass_before + v * (ceil(frac * n) - rows_before)) / total, 6)
        |    AS share
        |FROM r, t, f
        |WHERE rows_before < ceil(frac * n)
        |  AND ceil(frac * n) <= rows_before + c
        |ORDER BY frac""".stripMargin) { (s, dir) =>
      graft.ml.Profile.massConcentration(
          t(s, dir, "documents")
            .select(graft.ml.TextAnalysis.tokenCount(col("text")).as("v")),
          "v", Seq(0.01, 0.1, 0.5))
        .select(col("frac"), col("k_rows"), round(col("mass"), 6).as("mass"),
          round(col("share"), 6).as("share"))
        .orderBy("frac")
    },

    // Benford first-digit profile of extended prices: observed vs
    // log10(1+1/d) shares + per-digit chi-squared terms. First digit
    // from the STRING form of floor(v) — no log10 edge cases.
    q("q_profile_benford",
      """WITH d AS (
        |  SELECT CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT)
        |    AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM lineitem WHERE l_extendedprice >= 1.0
        |), c AS (
        |  SELECT digit, count(*)::BIGINT AS n FROM d GROUP BY 1
        |), t AS (SELECT sum(n)::BIGINT AS nt FROM c)
        |SELECT digit, n,
        |  round(n::DOUBLE / nt, 6) AS observed,
        |  round(ln(1.0 + 1.0 / digit) / ln(10.0), 6) AS expected,
        |  round((n::DOUBLE / nt - ln(1.0 + 1.0 / digit) / ln(10.0))
        |    * (n::DOUBLE / nt - ln(1.0 + 1.0 / digit) / ln(10.0))
        |    / (ln(1.0 + 1.0 / digit) / ln(10.0)) * nt, 6) AS chi2_term
        |FROM c, t ORDER BY digit""".stripMargin) { (s, dir) =>
      graft.ml.Profile.benford(t(s, dir, "lineitem"), "l_extendedprice")
        .select(col("digit"), col("n"), round(col("observed"), 6).as("observed"),
          round(col("expected"), 6).as("expected"),
          round(col("chi2_term"), 6).as("chi2_term"))
        .orderBy("digit")
    },

    // market-basket association pairs over co-purchased parts:
    // support/confidence/lift of part pairs sharing >= 3 orders.
    // Pair generation is basket-keyed (quadratic only within an
    // order); statistics run on the pair-count table.
    q("q_assoc_pairs",
      """WITH inc AS (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
        |), nb AS (SELECT count(DISTINCT b)::BIGINT AS nb FROM inc
        |), ic AS (SELECT i, count(*)::BIGINT AS n FROM inc GROUP BY 1
        |), p AS (
        |  SELECT a.i AS ia, c.i AS ib, count(*)::BIGINT AS n_ab
        |  FROM inc a JOIN inc c ON a.b = c.b AND a.i < c.i
        |  GROUP BY 1, 2 HAVING count(*) >= 3
        |)
        |SELECT p.ia AS item_a, p.ib AS item_b, x.n AS n_a, y.n AS n_b,
        |  p.n_ab,
        |  round(p.n_ab::DOUBLE / nb.nb, 6) AS support,
        |  round(p.n_ab::DOUBLE / x.n, 6) AS conf_a_b,
        |  round(p.n_ab::DOUBLE / y.n, 6) AS conf_b_a,
        |  round(p.n_ab::DOUBLE * nb.nb / (x.n::DOUBLE * y.n), 6) AS lift
        |FROM p JOIN ic x ON p.ia = x.i JOIN ic y ON p.ib = y.i, nb
        |ORDER BY item_a, item_b""".stripMargin) { (s, dir) =>
      graft.ml.Associations.frequentPairs(
          t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey")),
          "l_orderkey", "l_partkey", minSupport = 3L)
        .select(col("item_a"), col("item_b"), col("n_a"), col("n_b"),
          col("n_ab"), round(col("support"), 6).as("support"),
          round(col("conf_a_b"), 6).as("conf_a_b"),
          round(col("conf_b_a"), 6).as("conf_b_a"),
          round(col("lift"), 6).as("lift"))
        .orderBy("item_a", "item_b")
    },

    // deterministic hash sampling (Fibonacci multiplicative scramble,
    // pure integer arithmetic): the same keys are kept on every engine
    // and every run — reproducible holdout splits without RNG state.
    // The oracle replays the identical arithmetic.
    q("q_sample_hash",
      """SELECT o_orderkey, o_custkey
        |FROM orders
        |WHERE (o_orderkey % 2147483647) * 1327217885 % 2147483647
        |      < CAST(0.1 * 2147483647 AS BIGINT)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      graft.ml.Profile.hashSample(t(s, dir, "orders"), "o_orderkey", 0.1)
        .select("o_orderkey", "o_custkey")
        .orderBy("o_orderkey")
    },

    // key-skew diagnostic (the pre-join planning tool): top-10 heavy
    // keys with share + uniform-relative skew. Rounding uses
    // floor(x·10^d + 0.5) on the Spark side — binary half-up,
    // matching DuckDB's round() on doubles at every representable
    // boundary (Spark's round() re-rounds the decimal string and
    // disagrees on .xx5 edges).
    q("q_profile_skew",
      """WITH c AS (
        |  SELECT l_suppkey AS key, count(*) AS n FROM lineitem GROUP BY 1
        |), t AS (SELECT sum(n) AS total, count(*) AS nkeys FROM c)
        |SELECT key, n,
        |  round(n * 1.0::DOUBLE / t.total, 6) AS share,
        |  round(n * t.nkeys * 1.0::DOUBLE / t.total, 2) AS skew_vs_uniform
        |FROM c, t ORDER BY n DESC, key LIMIT 10""".stripMargin) { (s, dir) =>
      graft.ml.Profile.keySkew(t(s, dir, "lineitem"), "l_suppkey", topN = 10)
        .withColumn("share", floor(col("share") * 1e6 + 0.5) / 1e6)
        .withColumn("skew_vs_uniform",
          floor(col("skew_vs_uniform") * 100 + 0.5) / 100)
    },

    // pre-flight join-cardinality report: exact per-key output sizes
    // of a lineitem ⋈ lineitem self-join on supplier — the explosion
    // check run BEFORE a big join, for the cost of two count
    // aggregates.
    q("q_profile_join_card",
      """WITH cl AS (
        |  SELECT l_suppkey, count(*) AS n_left FROM lineitem GROUP BY 1
        |), cr AS (
        |  SELECT l_suppkey, count(*) AS n_right FROM lineitem GROUP BY 1
        |), per AS (
        |  SELECT cl.l_suppkey, n_left, n_right,
        |    n_left * n_right AS pairs
        |  FROM cl JOIN cr USING (l_suppkey)
        |), t AS (SELECT sum(pairs) AS tt FROM per)
        |SELECT l_suppkey, n_left, n_right, pairs,
        |  round(pairs * 1.0::DOUBLE / t.tt, 9) AS share
        |FROM per, t ORDER BY pairs DESC, l_suppkey LIMIT 10""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
      graft.ml.Profile.joinCardinality(li, li, Seq("l_suppkey"), topN = 10)
        .withColumn("share", round(col("share"), 9))
    },

    // dataset regression diff: documents vs a perturbed copy (every
    // 7th dropped, every 5th uppercased, every 11th re-keyed as new)
    // — full-outer key alignment, per-row status + changed-column
    // attribution.
    q("q_tool_diff",
      """WITH l AS (SELECT doc_id, text, lang FROM documents),
        |r AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN upper(text) ELSE text END AS text,
        |    lang
        |  FROM documents WHERE doc_id % 7 != 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, 'new', 'xx'
        |  FROM documents WHERE doc_id % 11 = 0
        |), j AS (
        |  SELECT coalesce(l.doc_id, r.doc_id) AS doc_id,
        |    l.text AS lt, l.lang AS ll, r.text AS rt, r.lang AS rl,
        |    l.doc_id IS NOT NULL AS hl, r.doc_id IS NOT NULL AS hr
        |  FROM l FULL JOIN r ON l.doc_id = r.doc_id
        |)
        |SELECT doc_id,
        |  CASE WHEN NOT hr THEN 'left_only' WHEN NOT hl THEN 'right_only'
        |    WHEN lt IS NOT DISTINCT FROM rt AND ll IS NOT DISTINCT FROM rl
        |      THEN 'unchanged' ELSE 'changed' END AS status,
        |  CASE WHEN hl AND hr AND NOT (lt IS NOT DISTINCT FROM rt
        |      AND ll IS NOT DISTINCT FROM rl)
        |    THEN array_to_string(list_sort(list_filter(
        |      [CASE WHEN ll IS DISTINCT FROM rl THEN 'lang' END,
        |       CASE WHEN lt IS DISTINCT FROM rt THEN 'text' END],
        |      x -> x IS NOT NULL)), ',')
        |    ELSE '' END AS changed_cols
        |FROM j ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents").select("doc_id", "text", "lang")
      val right = docs.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0, upper(col("text")))
            .otherwise(col("text")).as("text"),
          col("lang"))
        .unionByName(docs.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            lit("new").as("text"), lit("xx").as("lang")))
      graft.tools.Diff.rows(docs, right, Seq("doc_id"))
        .select(col("doc_id"), col("status"),
          array_join(col("changed_cols"), ",").as("changed_cols"))
        .orderBy("doc_id")
    },

    // distribution-drift report: frozen-cutoff bucketing of baseline
    // (all docs) vs current (every third doc), Laplace-smoothed
    // fractions, per-bucket PSI/KL/TVD terms — the ingest monitor.
    q("q_profile_drift", {
      val cuts = Seq(100, 200, 400, 800)
      val bucket = "1 + " + cuts.map(c =>
        s"(CASE WHEN n_chars > $c THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH bc AS (
         |  SELECT $bucket AS bucket, count(*) AS base_n
         |  FROM documents GROUP BY 1
         |), cc AS (
         |  SELECT $bucket AS bucket, count(*) AS cur_n
         |  FROM documents WHERE doc_id % 3 = 0 GROUP BY 1
         |), j AS (
         |  SELECT coalesce(bc.bucket, cc.bucket) AS bucket,
         |    coalesce(base_n, 0) AS base_n, coalesce(cur_n, 0) AS cur_n
         |  FROM bc FULL OUTER JOIN cc ON bc.bucket = cc.bucket
         |), t AS (
         |  SELECT *,
         |    (base_n + 0.5) / (sum(base_n) OVER () + 2.5) AS bf,
         |    (cur_n + 0.5) / (sum(cur_n) OVER () + 2.5) AS cf
         |  FROM j
         |)
         |SELECT CAST(bucket AS BIGINT) AS bucket,
         |  CAST(base_n AS BIGINT) AS base_n, CAST(cur_n AS BIGINT) AS cur_n,
         |  round(bf, 6) AS base_frac, round(cf, 6) AS cur_frac,
         |  round((cf - bf) * ln(cf / bf), 6) + 0.0 AS psi_term,
         |  round(cf * ln(cf / bf), 6) + 0.0 AS kl_term,
         |  round(abs(cf - bf) / 2, 6) AS tv_term
         |FROM t ORDER BY bucket""".stripMargin
    }) { (s, dir) =>
      val docs = t(s, dir, "documents")
      graft.ml.Profile.driftReport(docs,
          docs.filter(col("doc_id") % 3 === 0), "n_chars",
          Seq(100.0, 200.0, 400.0, 800.0))
        .select(col("bucket"), col("base_n"), col("cur_n"),
          round(col("base_frac"), 6).as("base_frac"),
          round(col("cur_frac"), 6).as("cur_frac"),
          (round(col("psi_term"), 6) + 0.0).as("psi_term"),
          (round(col("kl_term"), 6) + 0.0).as("kl_term"),
          round(col("tv_term"), 6).as("tv_term"))
        .orderBy("bucket")
    },

    // one-pass approximate quantiles: rank-error contract (the
    // quantile's true rank within accuracy bounds), checked by
    // re-counting — the oracle asserts the bound holds.
    q("q_profile_quantiles", {
      val rows = for {
        c <- Seq("l_extendedprice", "l_quantity")
        p <- Seq(0.25, 0.5, 0.75)
      } yield s"SELECT '$c' AS col_name, ${p}::DOUBLE AS p, true AS within_bound"
      rows.mkString("", " UNION ALL ", " ORDER BY col_name, p")
    }) { (s, dir) =>
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val cols = Seq("l_extendedprice", "l_quantity")
      val probs = Seq(0.25, 0.5, 0.75)
      val qs = graft.ml.Profile.quantiles(li, cols, probs).collect()
        .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
      val n = li.count().toDouble
      // tie-aware rank check: a discrete column's count(<= v) jumps
      // by whole tie blocks, so v is a valid p-quantile when the rank
      // INTERVAL [count(< v), count(<= v)] intersects the target band
      val rankAggs = qs.toSeq.flatMap { case ((c, p), v) =>
        Seq(
          sum(when(col(c).cast("double") < v, 1L).otherwise(0L))
            .as(s"${c}__lo__$p"),
          sum(when(col(c).cast("double") <= v, 1L).otherwise(0L))
            .as(s"${c}__hi__$p"))
      }
      val ranks = li.agg(rankAggs.head, rankAggs.tail: _*).head()
      val tol = n * 0.001 + 2
      qs.keys.toSeq.map { case (c, p) =>
        val lo = ranks.getAs[Long](s"${c}__lo__$p").toDouble
        val hi = ranks.getAs[Long](s"${c}__hi__$p").toDouble
        (c, p, lo <= p * n + tol && hi >= p * n - tol)
      }.toDF("col_name", "p", "within_bound")
        .orderBy("col_name", "p")
    },

    // adversarial-grade deterministic sampling: membership by md5-hex
    // PREFIX comparison — portable because every engine md5s the same
    // decimal string to the same lowercase hex, and fixed-width hex
    // compares lexicographically as numerically. (The Fibonacci
    // sampler above is faster but arithmetic-structured; this one is
    // safe for key spaces you don't control.)
    q("q_sample_hash_strong",
      s"""SELECT o_orderkey, o_custkey
         |FROM orders
         |WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) <
         |      '${graft.ml.Profile.strongThreshold(0.1)}'
         |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      graft.ml.Profile.hashSampleStrong(t(s, dir, "orders"), "o_orderkey", 0.1)
        .select("o_orderkey", "o_custkey")
        .orderBy("o_orderkey")
    },

    // Morton z-value (the ZOrder clustered-layout key): pure integer/
    // double Column arithmetic, so the oracle replays it exactly —
    // rank-scale both dimensions into [0,255] (floor matches Spark's
    // truncating cast on the clamped non-negative range) and
    // interleave the 8 bits of each. Ordering a table by this key is
    // what writeZOrdered does before range-partitioning into files.
    q("q_zorder_value", {
      val terms = (for { i <- 0 until 8; j <- 0 until 2 } yield
        s"(((s$j >> $i) & 1) << ${i * 2 + j})").mkString(" + ")
      s"""WITH s AS (
         |  SELECT p_partkey,
         |    LEAST(GREATEST(CAST(FLOOR(((CAST(p_size AS DOUBLE) - 1.0::DOUBLE)
         |      / 49.0::DOUBLE) * 255) AS BIGINT), 0), 255) AS s0,
         |    LEAST(GREATEST(CAST(FLOOR(((CAST(p_retailprice AS DOUBLE) - 900.0::DOUBLE)
         |      / 1200.0::DOUBLE) * 255) AS BIGINT), 0), 255) AS s1
         |  FROM part
         |)
         |SELECT p_partkey, $terms AS z
         |FROM s ORDER BY p_partkey""".stripMargin
    }) { (s, dir) =>
      t(s, dir, "part").select(col("p_partkey"),
        graft.sources.ZOrder.zValue(
          Seq(col("p_size"), col("p_retailprice")),
          mins = Seq(1.0, 900.0), maxs = Seq(50.0, 2100.0),
          bits = 8).as("z"))
        .orderBy("p_partkey")
    },

    // times[T: Ring] — product over a group via the generic monoid
    // aggregator (ReduceOperations.scala:357-370).
    q("q_agg_times",
      """SELECT l_orderkey, round(product(1 + l_tax), 6) AS tax_factor
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      implicit val prod: Monoid[Double] = Monoid.product[Double]
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), (lit(1.0) + col("l_tax")).as("f"))
        .as[(Long, Double)]
      TypedPipe.from(li).group[Long, Double].sum
        // half-up rounding to match the oracle's round()
        .ds.map { case (k, v) => (k, math.floor(v * 1e6 + 0.5) / 1e6) }
        .toDF("l_orderkey", "tax_factor")
        .orderBy("l_orderkey")
    },

    // hyperLogLog — mergeable sketch-valued aggregation
    // (ReduceOperations.scala:108-111): the estimate must sit within
    // 5% of exact; the oracle asserts the bound (portable contract,
    // like q_agg_approx_distinct).
    q("q_agg_hll_sketch",
      """SELECT l_returnflag, true AS within_5pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      import s.implicits._
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_partkey").cast("string"))
        .as[(String, String)]
      val est = TypedPipe.from(li).group[String, String]
        .aggregate(Hll.countAggregator(0.01))(
          org.apache.spark.sql.Encoders.scalaLong)
        .toDF("l_returnflag", "estimate")
      val exact = t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct("l_partkey").as("exact"))
      est.join(exact, "l_returnflag")
        .select(col("l_returnflag"),
          (abs(col("estimate") - col("exact")) <= col("exact") * 0.05)
            .as("within_5pct"))
        .orderBy("l_returnflag")
    },

    // sketch set algebra: HLL inclusion–exclusion intersection
    // estimate between the even- and odd-order halves of lineitem's
    // part keys. n_exact cross-checks the true intersection against
    // DuckDB INTERSECT; the estimate must land within 15% (+5 absolute
    // slack) — integer arithmetic, no float boundary. The union sketch
    // is exact at the register level (pointwise max), so only the
    // three estimates contribute error.
    q("q_agg_hll_intersect",
      """SELECT CAST(count(*) AS BIGINT) AS n_exact, true AS within_tol FROM (
        |  SELECT l_partkey FROM lineitem WHERE l_orderkey % 2 = 0
        |  INTERSECT
        |  SELECT l_partkey FROM lineitem WHERE l_orderkey % 2 = 1
        |)""".stripMargin) { (s, dir) =>
      import s.implicits._
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      def half(r: Int) = li.filter(col("l_orderkey") % 2 === r)
        .select(col("l_partkey").cast("string").as("value")).as[String]
      val ha = half(0).select(Hll.aggregator(0.01).toColumn).head()
      val hb = half(1).select(Hll.aggregator(0.01).toColumn).head()
      val est = ha.intersectionEstimate(hb)
      val exact = half(0).distinct().intersect(half(1).distinct()).count()
      Seq((exact, math.abs(est - exact) * 100 <= exact * 15 + 500))
        .toDF("n_exact", "within_tol")
    },

    // KMV/theta sketch set algebra — same exact-intersection oracle as
    // the HLL gate, but through the theta path: cut both retained
    // samples at min(θa, θb) and count common hashes. Unlike HLL
    // inclusion–exclusion this stays accurate for small overlaps of
    // large sets (ThetaSpec pins that regime); here the tolerance
    // mirrors the HLL gate's 15% + 5 absolute.
    q("q_agg_theta_intersect",
      """SELECT CAST(count(*) AS BIGINT) AS n_exact, true AS within_tol FROM (
        |  SELECT l_partkey FROM lineitem WHERE l_orderkey % 2 = 0
        |  INTERSECT
        |  SELECT l_partkey FROM lineitem WHERE l_orderkey % 2 = 1
        |)""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.agg.Theta
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      def half(r: Int) = li.filter(col("l_orderkey") % 2 === r)
        .select(col("l_partkey").cast("string").as("value")).as[String]
      val ta = half(0).select(Theta.aggregator(1024).toColumn).head()
      val tb = half(1).select(Theta.aggregator(1024).toColumn).head()
      val est = ta.intersectionEstimate(tb)
      val exact = half(0).distinct().intersect(half(1).distinct()).count()
      Seq((exact, math.abs(est - exact) * 100 <= exact * 15 + 500))
        .toDF("n_exact", "within_tol")
    },

    // Count–Min sketch — the third mergeable summary (upper-bounded
    // point frequencies for arbitrary keys, vs HLL's distincts and
    // Misra–Gries' heavy hitters). One global sketch over every
    // l_partkey occurrence; the CMS guarantee (est ≥ exact always,
    // est ≤ exact + ε·N w.h.p.) is checked per probed key against the
    // exact counts, which the oracle recomputes. The ≤25-key probe set
    // is bounded by construction, so the driver-side estimate loop is
    // O(25) — the same pattern as q_agg_hll_intersect's driver-side
    // sketch algebra.
    q("q_agg_cms",
      """SELECT CAST(l_partkey AS BIGINT) AS key, count(*) AS exact_n,
        |  true AS within_bound
        |FROM lineitem WHERE l_partkey <= 25
        |GROUP BY 1 ORDER BY key""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.agg.Cms
      val li = t(s, dir, "lineitem")
      val sketch = li.select(col("l_partkey").cast("string").as("value"))
        .as[String]
        .select(Cms.aggregator(eps = 0.0005, delta = 0.001).toColumn)
        .head()
      val exact = li.filter(col("l_partkey") <= 25)
        .groupBy(col("l_partkey").cast("long").as("key"))
        .agg(count(lit(1)).as("exact_n"))
        .as[(Long, Long)]
        .collect().sortBy(_._1).toSeq
      val bound = sketch.errorBound
      exact.map { case (k, n) =>
        val est = sketch.estimate(k.toString)
        (k, n, est >= n && est <= n + bound)
      }.toDF("key", "exact_n", "within_bound").orderBy("key")
    },

    // custom Aggregator[IN,BUF,OUT] through the DataFrame udaf path
    // (the reference's mapReduceMap as a UDAF,
    // ReduceOperations.scala:46-74): one-pass moments vs the SQL
    // var_pop oracle.
    q("q_agg_moments_udaf",
      """SELECT o_orderpriority, count(*) AS cnt,
        |  round(avg(o_totalprice), 4) AS mean,
        |  round(var_pop(o_totalprice), 2) AS variance
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val momentsUdaf = udaf(Aggregators.moments)
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(momentsUdaf(col("o_totalprice")).as("m"))
        .select(col("o_orderpriority"),
          col("m.count").as("cnt"),
          round(col("m.mean"), 4).as("mean"),
          round(col("m.m2") / col("m.count"), 2).as("variance"))
        .orderBy("o_orderpriority")
    },

    // combinatorics streams (mathematics/Combinatorics.scala:46-127):
    // C(6,3) enumerated distributively.
    q("q_combinations",
      """SELECT a.range AS c1, b.range AS c2, c.range AS c3
        |FROM range(1,7) a, range(1,7) b, range(1,7) c
        |WHERE a.range < b.range AND b.range < c.range
        |ORDER BY c1, c2, c3""".stripMargin) { (s, _) =>
      Combinatorics.combinations(s, 6, 3).orderBy("c1", "c2", "c3")
    },

    // per-stratum weighted sampling — the training-mix ratio knob
    // ("downweight src X to 5%"): deterministic Fibonacci-scramble
    // thresholds per domain, replayed exactly by the oracle.
    q("q_sample_weighted",
      """SELECT doc_id, source FROM documents
        |WHERE (doc_id % 2147483647) * 1327217885 % 2147483647 <
        |  (CASE WHEN source IN ('src0','src4','src8','src12','src16') THEN 0.5::DOUBLE
        |        WHEN source IN ('src1','src5','src9','src13','src17') THEN 0.2::DOUBLE
        |        WHEN source IN ('src2','src6','src10','src14','src18') THEN 0.1::DOUBLE
        |        ELSE 0.05::DOUBLE END) * 2147483647
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val weights = (0 until 20)
        .map(i => s"src$i" -> Seq(0.5, 0.2, 0.1, 0.05)(i % 4)).toMap
      graft.ml.Profile.stratifiedHashSample(
          t(s, dir, "documents"), "doc_id", "source", weights)
        .select("doc_id", "source")
        .orderBy("doc_id")
    },

    // salted two-phase collect: non-algebraic agg on a skewed key
    // without concentrating a hot key on one reducer. Result sorted,
    // so it's routing-independent and equals the plain collect.
    q("q_agg_salted_collect",
      """SELECT l_suppkey,
        |  array_to_string(list_sort(list(l_partkey)), ',') AS parts
        |FROM lineitem GROUP BY l_suppkey
        |ORDER BY l_suppkey""".stripMargin) { (s, dir) =>
      graft.agg.SaltedAgg.saltedCollectList(
          t(s, dir, "lineitem"), Seq("l_suppkey"), "l_partkey", nSalts = 16)
        .select(col("l_suppkey"),
          concat_ws(",", transform(col("l_partkey_list"),
            x => x.cast("string"))).as("parts"))
        .orderBy("l_suppkey")
    },

    // fields-API bounded top-k (`sortedTake`/`sortedReverseTake`,
    // ReduceOperations.scala:420-444): Catalyst's BoundedPriorityQueue
    // aggregate — the plan's partial aggregation carries ≤ k elements
    // per (key, task), the skew-safe shape (see PlanAuditSpec).
    q("q_fields_sortedtake",
      """SELECT l_suppkey,
        |  array_to_string((list_sort(list(l_partkey)))[1:5], ',') AS low5,
        |  array_to_string((list_reverse_sort(list(l_partkey)))[1:5], ',') AS high5
        |FROM lineitem GROUP BY l_suppkey
        |ORDER BY l_suppkey""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupByFields("l_suppkey")(
          _.sortedTake("l_partkey", 5, "low5_a")
            .sortedReverseTake("l_partkey", 5, "high5_a"))
        .select(col("l_suppkey"),
          concat_ws(",", transform(col("low5_a"),
            x => x.cast("string"))).as("low5"),
          concat_ws(",", transform(col("high5_a"),
            x => x.cast("string"))).as("high5"))
        .orderBy("l_suppkey")
    },

    // knapsack-style enumeration (`weightedSum`,
    // mathematics/Combinatorics.scala:170-219): all non-negative
    // integer solutions of 3·x1 + 5·x2 + 7·x3 = 100.
    q("q_weighted_sum",
      """SELECT a.range AS x1, b.range AS x2, c.range AS x3
        |FROM range(0, 34) a, range(0, 21) b, range(0, 15) c
        |WHERE a.range * 3 + b.range * 5 + c.range * 7 = 100
        |ORDER BY x1, x2, x3""".stripMargin) { (s, _) =>
      Combinatorics.weightedSum(s, Seq(3L, 5L, 7L), 100L)
        .orderBy("x1", "x2", "x3")
    },

    // per-task resource lifecycle (`using`, RichPipe.scala:73-119):
    // a "connection" formats rows; open once per partition, released
    // at exhaustion.
    q("q_typed_using",
      """SELECT o_orderkey, 'order-' || CAST(o_orderkey AS VARCHAR) AS tag
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      val orders = t(s, dir, "orders").select(col("o_orderkey")).as[Long]
      TypedPipe.from(orders)
        .usingMap(() => new java.lang.StringBuilder, (_: java.lang.StringBuilder) => ())(
          (sb, k) => {
            sb.setLength(0)
            (k, sb.append("order-").append(k).toString)
          })
        .toDF("o_orderkey", "tag")
        .orderBy("o_orderkey")
    },

    // pack/unpack round trip (RichPipe.pack/unpack,
    // RichPipe.scala:550-594): fields → struct → fields.
    q("q_pack_unpack",
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .pack("packed", "c_name", "c_acctbal")
        .unpack("packed")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    },

    // dataset-level re-identification audit: k-anonymity class sizes +
    // l-diversity of the sensitive column over quasi-identifier
    // (nation, segment) classes — one hash-aggregate over the QI key.
    q("q_privacy_kanon",
      """WITH cls AS (
        |  SELECT c_nationkey, c_mktsegment, count(*) AS n,
        |    count(DISTINCT c_acctbal > 0) AS ldiv
        |  FROM customer GROUP BY 1, 2
        |)
        |SELECT CAST(5 AS BIGINT) AS k,
        |  CAST(sum(n) AS BIGINT) AS n_rows,
        |  CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(min(n) AS BIGINT) AS min_class_size,
        |  CAST(coalesce(sum(CASE WHEN n < 5 THEN n END), 0) AS BIGINT)
        |    AS n_violating_rows,
        |  CAST(min(ldiv) AS BIGINT) AS min_l_diversity,
        |  coalesce(sum(CASE WHEN n < 5 THEN n END), 0) = 0
        |    AND min(ldiv) >= 2 AS pass
        |FROM cls""".stripMargin) { (s, dir) =>
      graft.ml.Privacy.kAnonymityReport(
        t(s, dir, "customer").withColumn("pos_bal", col("c_acctbal") > 0),
        Seq("c_nationkey", "c_mktsegment"), k = 5,
        sensitive = Some("pos_bal"), l = 2)
    },

    // suppression enforcement: the released subset keeps only rows in
    // QI classes of >= k members (k-anonymous by construction); one
    // window count over the QI key, no join-back.
    q("q_privacy_suppress",
      """WITH sized AS (
        |  SELECT c_custkey, c_nationkey, c_mktsegment,
        |    count(*) OVER (PARTITION BY c_nationkey, c_mktsegment) AS n
        |  FROM customer
        |)
        |SELECT c_custkey, c_nationkey, c_mktsegment FROM sized
        |WHERE n >= 12 ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      graft.ml.Privacy.suppressSmallClasses(
          t(s, dir, "customer")
            .select("c_custkey", "c_nationkey", "c_mktsegment"),
          Seq("c_nationkey", "c_mktsegment"), k = 12)
        .orderBy("c_custkey")
    },

    // t-closeness: per-nation TVD between the class's market-segment
    // distribution and the global one. Absent segments contribute via
    // the (1 - sum of present P) identity on both sides, so neither
    // engine materializes the class x domain cross product.
    q("q_privacy_tcloseness",
      """WITH joint AS (
        |  SELECT c_nationkey, c_mktsegment AS s, count(*) AS ns
        |  FROM customer GROUP BY 1, 2
        |), cls AS (
        |  SELECT c_nationkey, s, ns,
        |    sum(ns) OVER (PARTITION BY c_nationkey) AS nc
        |  FROM joint
        |), globp AS (
        |  SELECT c_mktsegment AS s,
        |    CAST(count(*) AS DOUBLE)
        |      / (SELECT count(*) FROM customer) AS p
        |  FROM customer GROUP BY 1
        |)
        |SELECT cls.c_nationkey, CAST(max(cls.nc) AS BIGINT) AS n,
        |  round((sum(abs(CAST(cls.ns AS DOUBLE) / cls.nc - globp.p))
        |    + (1.0::DOUBLE - sum(globp.p))) / 2.0::DOUBLE, 6) AS tvd,
        |  round((sum(abs(CAST(cls.ns AS DOUBLE) / cls.nc - globp.p))
        |    + (1.0::DOUBLE - sum(globp.p))) / 2.0::DOUBLE, 6)
        |    <= 0.1::DOUBLE AS pass
        |FROM cls JOIN globp USING (s)
        |GROUP BY cls.c_nationkey
        |ORDER BY cls.c_nationkey""".stripMargin) { (s, dir) =>
      // the gate compares pass on the ROUNDED tvd: one nationkey's
      // true TVD sits exactly at the 0.1 threshold, so the raw-double
      // compare flips with parallel summation order (observed flaky
      // across otherwise-green runs); the operator keeps the raw
      // compare, the cross-engine contract pins the rounded one
      graft.ml.Privacy.tClosenessReport(t(s, dir, "customer"),
          Seq("c_nationkey"), "c_mktsegment", t = 0.1)
        .select(col("c_nationkey"), col("n"),
          round(col("tvd"), 6).as("tvd"),
          (round(col("tvd"), 6) <= 0.1).as("pass"))
        .orderBy("c_nationkey")
    },

    // ε-DP Laplace counts with seeded deterministic noise: the md5
    // uniform replays digit-by-digit (strpos over the hex alphabet),
    // then the same inverse-CDF arithmetic on both engines.
    q("q_privacy_dp_counts",
      """WITH g AS (
        |  SELECT event_type, count(*) AS n FROM events GROUP BY 1
        |), h AS (
        |  SELECT event_type, n,
        |    substr(md5('42:' || event_type), 1, 8) AS hx
        |  FROM g
        |), uu AS (
        |  SELECT event_type, n,
        |    (list_sum(list_transform(range(1, 9),
        |       i -> (strpos('0123456789abcdef', hx[i]) - 1)
        |            * 16 ** (8 - i))) + 0.5) / 4294967296.0 AS u
        |  FROM h
        |)
        |SELECT event_type, n,
        |  round(n + -1.0::DOUBLE * sign(u - 0.5) *
        |    ln(1.0::DOUBLE - 2.0::DOUBLE * abs(u - 0.5)), 6) AS noised_n
        |FROM uu ORDER BY event_type""".stripMargin) { (s, dir) =>
      graft.ml.Privacy.laplaceNoisedCounts(t(s, dir, "events"),
          Seq("event_type"), epsilon = 1.0, seed = "42")
        .select(col("event_type"), col("n"),
          round(col("noised_n"), 6).as("noised_n"))
        .orderBy("event_type")
    },

    // ε-DP clipped sums: per-row value clipped to [0, 50] (sensitivity
    // 50), then the same seeded inverse-CDF Laplace noise at scale
    // sensitivity/ε.
    q("q_privacy_dp_sums",
      """WITH g AS (
        |  SELECT event_type,
        |    sum(least(greatest(value, 0.0::DOUBLE), 50.0::DOUBLE))
        |      AS clipped_sum
        |  FROM events GROUP BY 1
        |), h AS (
        |  SELECT event_type, clipped_sum,
        |    substr(md5('42s:' || event_type), 1, 8) AS hx
        |  FROM g
        |), uu AS (
        |  SELECT event_type, clipped_sum,
        |    (list_sum(list_transform(range(1, 9),
        |       i -> (strpos('0123456789abcdef', hx[i]) - 1)
        |            * 16 ** (8 - i))) + 0.5) / 4294967296.0 AS u
        |  FROM h
        |)
        |SELECT event_type, round(clipped_sum, 6) AS clipped_sum,
        |  round(clipped_sum + -100.0::DOUBLE * sign(u - 0.5) *
        |    ln(1.0::DOUBLE - 2.0::DOUBLE * abs(u - 0.5)), 6)
        |    AS noised_sum
        |FROM uu ORDER BY event_type""".stripMargin) { (s, dir) =>
      graft.ml.Privacy.laplaceNoisedSums(t(s, dir, "events"),
          Seq("event_type"), "value", clipLo = 0.0, clipHi = 50.0,
          epsilon = 0.5, seed = "42s")
        .select(col("event_type"),
          round(col("clipped_sum"), 6).as("clipped_sum"),
          round(col("noised_sum"), 6).as("noised_sum"))
        .orderBy("event_type")
    }
  )
}
