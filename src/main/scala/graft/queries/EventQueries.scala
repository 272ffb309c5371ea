package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Ts

/** Time/event coverage over `events` and `orders`: date truncation,
  * tumbling windows (batch form), JSON extraction, gap-based
  * sessionization — the reference's time-partitioned idioms
  * (scalding-date, SURVEY §2.7-2.8) plus the streaming-shaped
  * aggregations its batch model could only approximate.
  *
  * `events.ts` has shipped as both TIMESTAMP(NANOS) (read as epoch-nano
  * longs) and `timestamp[us]` parquet; [[graft.core.Ts.seconds]]
  * normalizes whichever representation the scan produces to epoch
  * seconds, matching the oracle's `CAST(floor(epoch(ts)) AS BIGINT)`,
  * so all arithmetic below is representation-independent.
  */
object EventQueries extends QueryGroup {

  /** DuckDB replica of `Graphs.personalizedPageRank(alpha=0.15,
    * iters=10)` over the event-type transition graph seeded at
    * 'view': the 10 iterations unroll as generated CTE triples
    * (contribution aggregate, dangling scalar, restart-blended
    * update) with the exact arithmetic association the Spark plan
    * compiles.
    */
  private def pprOracleSql: String = {
    val restart = "CASE WHEN n.node = 'view' THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END"
    val iters = (1 to 10).map { k =>
      s"""c$k AS MATERIALIZED (
         |  SELECT en.dst AS node, sum(r.r * en.p) AS c
         |  FROM r${k - 1} r JOIN en ON r.node = en.src GROUP BY 1
         |), d$k AS MATERIALIZED (
         |  SELECT 1.0::DOUBLE - coalesce(sum(c), 0.0::DOUBLE) AS dead FROM c$k
         |), r$k AS MATERIALIZED (
         |  SELECT n.node,
         |    0.15 * $restart
         |    + 0.85 * (coalesce(c$k.c, 0.0::DOUBLE) + d$k.dead * $restart) AS r
         |  FROM nodes n LEFT JOIN c$k ON n.node = c$k.node, d$k
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH e AS (
       |  SELECT user_id, event_type,
       |    CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id
       |  FROM events
       |), t AS (
       |  SELECT lag(event_type) OVER (PARTITION BY user_id
       |      ORDER BY sec, event_id) AS from_type,
       |    event_type AS to_type
       |  FROM e
       |), cnt AS (
       |  SELECT from_type, to_type, count(*) AS n FROM t
       |  WHERE from_type IS NOT NULL GROUP BY 1, 2
       |), ow AS (
       |  SELECT from_type, sum(n) AS outw FROM cnt GROUP BY 1
       |), en AS MATERIALIZED (
       |  SELECT cnt.from_type AS src, cnt.to_type AS dst,
       |    cnt.n * 1.0::DOUBLE / ow.outw AS p
       |  FROM cnt JOIN ow USING (from_type)
       |), nodes AS MATERIALIZED (
       |  SELECT DISTINCT src AS node FROM en
       |  UNION SELECT DISTINCT dst FROM en
       |  UNION SELECT 'view'
       |), r0 AS MATERIALIZED (
       |  SELECT n.node, $restart AS r FROM nodes n
       |), $iters
       |SELECT node AS event_type, round(r, 6) AS ppr
       |FROM r10 ORDER BY event_type""".stripMargin
  }

  /** DuckDB replica of `Graphs.kTruss(k=3)` over the undirected
    * event-type transition graph sparsified at pair count ≥ 770:
    * four unrolled peel rounds (adjacency CTE, support join-
    * aggregate, filter) — idempotent past the fixpoint, so a
    * convergent engine run equals the fixed unroll.
    */
  private def kTrussOracleSql: String = {
    val rounds = (1 to 4).map { r =>
      s"""adj$r AS MATERIALIZED (
         |  SELECT u AS n, v AS nb FROM e${r - 1}
         |  UNION ALL SELECT v, u FROM e${r - 1}
         |), e$r AS MATERIALIZED (
         |  SELECT e.u, e.v
         |  FROM e${r - 1} e JOIN adj$r x ON x.n = e.u
         |    JOIN adj$r y ON y.n = e.v AND y.nb = x.nb
         |  GROUP BY e.u, e.v
         |  HAVING count(*) >= 1
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH ev AS (
       |  SELECT user_id, event_type,
       |    CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id
       |  FROM events
       |), tr AS (
       |  SELECT lag(event_type) OVER (PARTITION BY user_id
       |      ORDER BY sec, event_id) AS f, event_type AS tt
       |  FROM ev
       |), e0 AS MATERIALIZED (
       |  SELECT least(f, tt) AS u, greatest(f, tt) AS v
       |  FROM tr WHERE f IS NOT NULL AND f <> tt
       |  GROUP BY 1, 2 HAVING count(*) >= 770
       |), $rounds, adjF AS (
       |  SELECT u AS n, v AS nb FROM e4 UNION ALL SELECT v, u FROM e4
       |)
       |SELECT e.u AS src, e.v AS dst, count(*) AS support
       |FROM e4 e JOIN adjF x ON x.n = e.u
       |  JOIN adjF y ON y.n = e.v AND y.nb = x.nb
       |GROUP BY e.u, e.v
       |ORDER BY src, dst""".stripMargin
  }

  /** DuckDB replica of `Graphs.hits(iters=10)` over the distinct
    * event-type transition edge set: each iteration unrolls as six
    * generated CTEs (authority join-aggregate, left-join fill,
    * normalizer scalar, normalized authority; then the same for
    * hubs) with the exact arithmetic the Spark plan compiles.
    */
  private def hitsOracleSql: String = {
    val iters = (1 to 10).map { k =>
      s"""ar$k AS MATERIALIZED (
         |  SELECT en.dst AS node, sum(h.h) AS a
         |  FROM en JOIN h${k - 1} h ON en.src = h.node GROUP BY 1
         |), af$k AS MATERIALIZED (
         |  SELECT n.node, coalesce(ar.a, 0.0::DOUBLE) AS a
         |  FROM nodes n LEFT JOIN ar$k ar USING (node)
         |), asm$k AS (SELECT sum(a) AS s FROM af$k),
         |a$k AS MATERIALIZED (
         |  SELECT node, a / s AS a FROM af$k, asm$k
         |), hr$k AS MATERIALIZED (
         |  SELECT en.src AS node, sum(a.a) AS h
         |  FROM en JOIN a$k a ON en.dst = a.node GROUP BY 1
         |), hf$k AS MATERIALIZED (
         |  SELECT n.node, coalesce(hr.h, 0.0::DOUBLE) AS h
         |  FROM nodes n LEFT JOIN hr$k hr USING (node)
         |), hsm$k AS (SELECT sum(h) AS s FROM hf$k),
         |h$k AS MATERIALIZED (
         |  SELECT node, h / s AS h FROM hf$k, hsm$k
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH e AS (
       |  SELECT user_id, event_type,
       |    CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id
       |  FROM events
       |), tr AS (
       |  SELECT lag(event_type) OVER (PARTITION BY user_id
       |      ORDER BY sec, event_id) AS from_type,
       |    event_type AS to_type
       |  FROM e
       |), en AS MATERIALIZED (
       |  SELECT DISTINCT from_type AS src, to_type AS dst FROM tr
       |  WHERE from_type IS NOT NULL
       |), nodes AS MATERIALIZED (
       |  SELECT DISTINCT src AS node FROM en
       |  UNION SELECT DISTINCT dst FROM en
       |), h0 AS MATERIALIZED (
       |  SELECT node, 1.0::DOUBLE AS h FROM nodes
       |), $iters
       |SELECT n.node AS event_type, round(a10.a, 6) AS authority,
       |  round(h10.h, 6) AS hub
       |FROM nodes n JOIN a10 USING (node) JOIN h10 USING (node)
       |ORDER BY event_type""".stripMargin
  }

  /** DuckDB replica of `Preference.bradleyTerry(iters=10)` over the
    * event-type transition comparisons: the MM iterations unroll as
    * generated CTE quadruples (denominator join-aggregate, unnormalized
    * update, normalizer scalar, renormalized ratings) with the exact
    * casts the Spark plan compiles.
    */
  private def bradleyTerryOracleSql: String = {
    val iters = (1 to 10).map { k =>
      s"""d$k AS MATERIALIZED (
         |  SELECT p.a AS item,
         |    sum(CAST(p.n AS DOUBLE) / (ra.th + rb.th)) AS den
         |  FROM pairs p JOIN r${k - 1} ra ON p.a = ra.item
         |    JOIN r${k - 1} rb ON p.b = rb.item
         |  GROUP BY 1
         |), u$k AS MATERIALIZED (
         |  SELECT w.item, CAST(w.wins AS DOUBLE) / d.den AS t
         |  FROM wins w JOIN d$k d USING (item)
         |), s$k AS MATERIALIZED (SELECT sum(t) AS s FROM u$k),
         |r$k AS MATERIALIZED (
         |  SELECT item, t / s AS th FROM u$k, s$k
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH e AS (
       |  SELECT user_id, event_type,
       |    CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id
       |  FROM events
       |), tr AS (
       |  SELECT lag(event_type) OVER (PARTITION BY user_id
       |      ORDER BY sec, event_id) AS from_type,
       |    event_type AS to_type
       |  FROM e
       |), cnt AS (
       |  SELECT from_type, to_type, count(*) AS c FROM tr
       |  WHERE from_type IS NOT NULL AND from_type <> to_type
       |  GROUP BY 1, 2
       |), pairs AS MATERIALIZED (
       |  SELECT a, b, sum(c) AS n FROM (
       |    SELECT to_type AS a, from_type AS b, c FROM cnt
       |    UNION ALL SELECT from_type AS a, to_type AS b, c FROM cnt
       |  ) GROUP BY 1, 2
       |), wins AS MATERIALIZED (
       |  SELECT i.item, coalesce(w.wins, 0) AS wins
       |  FROM (SELECT DISTINCT a AS item FROM pairs) i
       |  LEFT JOIN (SELECT to_type AS item, sum(c) AS wins
       |             FROM cnt GROUP BY 1) w USING (item)
       |), mc AS (
       |  SELECT a AS item, sum(n) AS matches FROM pairs GROUP BY 1
       |), r0 AS MATERIALIZED (
       |  SELECT item, 1.0::DOUBLE AS th FROM wins
       |), $iters
       |SELECT w.item AS event_type, CAST(w.wins AS BIGINT) AS wins,
       |  CAST(mc.matches AS BIGINT) AS matches,
       |  round(r10.th, 6) AS rating
       |FROM wins w JOIN mc USING (item) JOIN r10 USING (item)
       |ORDER BY event_type""".stripMargin
  }

  /** DuckDB replica of `Events.bootstrapCI(nReps=100, alpha=0.05,
    * seed=42)` over user_id%3 variants: the Poisson-weight CASE chain
    * is generated from the SAME `Events.poissonHexThresholds`
    * constants the Spark plan compiles in, the replicate means are
    * exact integer-ratio doubles on both engines, and the interval is
    * order statistics (ranks 3 and 98), so the gate is
    * interpolation-free.
    */
  private def bootstrapOracleSql: String = {
    val ts = graft.events.Events.poissonHexThresholds
    val cases = ts.zipWithIndex
      .map { case (h, k) => s"WHEN h < '$h' THEN $k" }.mkString(" ")
    s"""WITH pu AS (
       |  SELECT user_id, CAST(user_id % 3 AS VARCHAR) AS variant,
       |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      AS DOUBLE) AS x
       |  FROM events GROUP BY 1, 2
       |), drawn AS (
       |  SELECT variant, rr.range AS r, x,
       |    substr(md5('42:' || CAST(user_id AS VARCHAR) || ':'
       |      || CAST(rr.range AS VARCHAR)), 1, 8) AS h
       |  FROM pu CROSS JOIN range(0, 100) rr
       |), weighted AS (
       |  SELECT variant, r, x,
       |    CAST(CASE $cases ELSE ${ts.length} END AS DOUBLE) AS w
       |  FROM drawn
       |), reps AS (
       |  SELECT variant, r, sum(w * x) / nullif(sum(w), 0) AS est
       |  FROM weighted GROUP BY 1, 2
       |), ranked AS (
       |  SELECT variant, est, row_number() OVER (PARTITION BY variant
       |    ORDER BY est ASC NULLS LAST, r) AS rk
       |  FROM reps
       |), ci AS (
       |  SELECT variant,
       |    max(CASE WHEN rk = 3 THEN est END) AS ci_lo,
       |    max(CASE WHEN rk = 98 THEN est END) AS ci_hi
       |  FROM ranked GROUP BY 1
       |)
       |SELECT pv.variant, pv.n_users, round(pv.mean, 6) AS mean,
       |  round(ci.ci_lo, 6) AS ci_lo, round(ci.ci_hi, 6) AS ci_hi,
       |  100 AS n_reps
       |FROM (SELECT variant, count(*) AS n_users, avg(x) AS mean
       |      FROM pu GROUP BY 1) pv
       |JOIN ci USING (variant)
       |ORDER BY variant""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(

    // exponentially time-decayed sum per user (algebird DecayedValue
    // analogue): value mass decays with a 1-hour half-life, evaluated
    // at each user's newest event. The typed aggregator's merge
    // rescales to the newer timestamp; the oracle computes the closed
    // form directly.
    q("q_agg_decayed",
      """WITH e AS (
        |  SELECT user_id, value, CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events
        |), m AS (SELECT user_id, max(sec) AS mx FROM e GROUP BY user_id)
        |SELECT e.user_id,
        |  round(sum(e.value * exp((e.sec - m.mx) * ln(2) / 3600.0)), 4) AS decayed
        |FROM e JOIN m ON e.user_id = m.user_id
        |GROUP BY e.user_id ORDER BY e.user_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.agg.Aggregators
      val ev = t(s, dir, "events")
      val events = ev
        .select(col("user_id"), col("value"),
          Ts.seconds(ev).cast("double").as("sec"))
        .as[(Long, Double, Double)]
      graft.typed.TypedPipe.from(events)
        .map { case (u, v, sec) => (u, (v, sec)) }
        .group[Long, (Double, Double)]
        .aggregate(Aggregators.decayedSum(3600.0))(
          org.apache.spark.sql.Encoders.product[Aggregators.DecayedValue])
        .ds.map { case (u, dv) =>
          (u, math.floor(dv.value * 1e4 + 0.5) / 1e4)
        }
        .toDF("user_id", "decayed")
        .orderBy("user_id")
    },

    // as-of join (superset operator — Spark lacks it natively; DuckDB
    // 1.0 has ASOF JOIN as the oracle): each click picks up the value
    // of the user's most recent view at-or-before it. One union + one
    // window pass — a single shuffle by key, no range-join blowup.
    q("q_join_asof",
      """WITH clicks AS (
        |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events WHERE event_type = 'click'
        |), views AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |    max(value) AS view_value
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2
        |)
        |SELECT c.user_id, c.event_id, round(v.view_value, 4) AS view_value
        |FROM clicks c ASOF JOIN views v
        |  ON c.user_id = v.user_id AND c.sec >= v.sec
        |ORDER BY c.user_id, c.event_id""".stripMargin) { (s, dir) =>
      val raw = t(s, dir, "events")
      val ev = raw.withColumn("sec", Ts.seconds(raw))
      val clicks = ev.filter(col("event_type") === "click")
        .select("user_id", "event_id", "sec")
      // dedupe views per (user, sec) so as-of ties are deterministic
      val views = ev.filter(col("event_type") === "view")
        .groupBy("user_id", "sec")
        .agg(max("value").as("view_value"))
      graft.join.Joins.asofJoin(clicks, views, Seq("user_id"),
          "sec", "sec", Seq("view_value"))
        .select(col("user_id"), col("event_id"),
          round(col("view_value"), 4).as("view_value"))
        .orderBy("user_id", "event_id")
    },

    // FORWARD as-of: each click picks the user's NEXT view at-or-
    // after it (the look-ahead direction pandas/kdb call 'forward').
    q("q_join_asof_forward",
      """WITH clicks AS (
        |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events WHERE event_type = 'click'
        |), views AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |    max(value) AS view_value
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2
        |)
        |SELECT c.user_id, c.event_id, round(v.view_value, 4) AS view_value
        |FROM clicks c ASOF JOIN views v
        |  ON c.user_id = v.user_id AND c.sec <= v.sec
        |ORDER BY c.user_id, c.event_id""".stripMargin) { (s, dir) =>
      val raw = t(s, dir, "events")
      val ev = raw.withColumn("sec", Ts.seconds(raw))
      val clicks = ev.filter(col("event_type") === "click")
        .select("user_id", "event_id", "sec")
      val views = ev.filter(col("event_type") === "view")
        .groupBy("user_id", "sec")
        .agg(max("value").as("view_value"))
      graft.join.Joins.asofJoin(clicks, views, Seq("user_id"),
          "sec", "sec", Seq("view_value"), direction = "forward")
        .select(col("user_id"), col("event_id"),
          round(col("view_value"), 4).as("view_value"))
        .orderBy("user_id", "event_id")
    },

    // NEAREST as-of: whichever of the previous/next view is closer in
    // time wins; exact ties go to the backward (earlier) match. One
    // keyed shuffle, two in-partition sorted fills.
    q("q_join_asof_nearest",
      """WITH clicks AS (
        |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events WHERE event_type = 'click'
        |), views AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |    max(value) AS view_value
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2
        |), b AS (
        |  SELECT c.user_id, c.event_id, c.sec,
        |    v.sec AS bsec, v.view_value AS bval
        |  FROM clicks c ASOF LEFT JOIN views v
        |    ON c.user_id = v.user_id AND c.sec >= v.sec
        |), f AS (
        |  SELECT c.user_id, c.event_id,
        |    v.sec AS fsec, v.view_value AS fval
        |  FROM clicks c ASOF LEFT JOIN views v
        |    ON c.user_id = v.user_id AND c.sec <= v.sec
        |)
        |SELECT b.user_id, b.event_id,
        |  round(CASE WHEN bval IS NULL THEN fval
        |    WHEN fval IS NULL THEN bval
        |    WHEN abs(b.sec - fsec) < abs(b.sec - bsec) THEN fval
        |    ELSE bval END, 4) AS view_value
        |FROM b JOIN f USING (user_id, event_id)
        |WHERE bval IS NOT NULL OR fval IS NOT NULL
        |ORDER BY b.user_id, b.event_id""".stripMargin) { (s, dir) =>
      val raw = t(s, dir, "events")
      val ev = raw.withColumn("sec", Ts.seconds(raw))
      val clicks = ev.filter(col("event_type") === "click")
        .select("user_id", "event_id", "sec")
      val views = ev.filter(col("event_type") === "view")
        .groupBy("user_id", "sec")
        .agg(max("value").as("view_value"))
      graft.join.Joins.asofJoin(clicks, views, Seq("user_id"),
          "sec", "sec", Seq("view_value"), direction = "nearest")
        .select(col("user_id"), col("event_id"),
          round(col("view_value"), 4).as("view_value"))
        .orderBy("user_id", "event_id")
    },

    // the same as-of semantics through the NATIVE Catalyst operator
    // (AsOfJoinPlan.scala: LogicalPlan + Strategy + sorted-merge
    // SparkPlan injected by GraftExtensions) — gate-verifies the
    // custom exec against DuckDB's ASOF JOIN.
    q("q_join_asof_native",
      """WITH clicks AS (
        |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events WHERE event_type = 'click'
        |), views AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |    max(value) AS view_value
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2
        |)
        |SELECT c.user_id, c.event_id, round(v.view_value, 4) AS view_value
        |FROM clicks c ASOF JOIN views v
        |  ON c.user_id = v.user_id AND c.sec >= v.sec
        |ORDER BY c.user_id, c.event_id""".stripMargin) { (s, dir) =>
      val raw = t(s, dir, "events")
      val ev = raw.withColumn("sec", Ts.seconds(raw))
      val clicks = ev.filter(col("event_type") === "click")
        .select("user_id", "event_id", "sec")
      val views = ev.filter(col("event_type") === "view")
        .groupBy("user_id", "sec")
        .agg(max("value").as("view_value"))
      graft.join.Joins.asofJoinNative(clicks, views, Seq("user_id"),
          "sec", "sec", Seq("view_value"))
        .select(col("user_id"), col("event_id"),
          round(col("view_value"), 4).as("view_value"))
        .orderBy("user_id", "event_id")
    },

    // range (interval) join — bucketed composition vs the exact
    // inequality-join oracle: lineitem quantities classified into
    // irregular quadratic bands [b², (b+1)²).
    q("q_join_range",
      """WITH bands AS (
        |  SELECT range AS band, CAST(range * range AS DOUBLE) AS lo,
        |    CAST((range + 1) * (range + 1) AS DOUBLE) AS hi
        |  FROM range(0, 8)
        |)
        |SELECT band, count(*) AS n, round(sum(l_extendedprice), 2) AS price
        |FROM lineitem JOIN bands
        |  ON l_quantity >= lo AND l_quantity < hi
        |GROUP BY band ORDER BY band""".stripMargin) { (s, dir) =>
      val bands = s.range(0, 8).toDF("band")
        .withColumn("lo", (col("band") * col("band")).cast("double"))
        .withColumn("hi", ((col("band") + 1) * (col("band") + 1)).cast("double"))
      graft.join.Joins.rangeJoin(
          t(s, dir, "lineitem").select("l_quantity", "l_extendedprice"),
          bands, "l_quantity", "lo", "hi", bucketWidth = 5.0)
        .groupBy("band")
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("price"))
        .orderBy("band")
    },

    // interval-overlap join (both sides intervals, bucketed dedup-free
    // composition) vs the exact inequality-join oracle: two disjoint
    // samples of events expanded to activity windows, matched when the
    // windows overlap for the same user-group key.
    q("q_join_interval",
      """WITH l AS (
        |  SELECT user_id % 10 AS k, event_id AS l_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ls,
        |    CAST(floor(epoch(ts)) AS BIGINT) + (event_id % 5 + 1) * 3600 AS le
        |  FROM events WHERE event_id % 17 = 0
        |), r AS (
        |  SELECT user_id % 10 AS k, event_id AS r_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS rs,
        |    CAST(floor(epoch(ts)) AS BIGINT) + (event_id % 7 + 1) * 1800 AS re
        |  FROM events WHERE event_id % 23 = 0
        |)
        |SELECT l.k, l_id, r_id,
        |  greatest(ls, rs) AS o_start, least(le, re) AS o_end
        |FROM l JOIN r ON l.k = r.k AND ls < re AND rs < le
        |ORDER BY l.k, l_id, r_id""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val sec = Ts.seconds(ev)
      val l = ev.filter(col("event_id") % 17 === 0)
        .select((col("user_id") % 10).as("k"), col("event_id").as("l_id"),
          sec.as("ls"), (sec + (col("event_id") % 5 + 1) * 3600).as("le"))
      val r = ev.filter(col("event_id") % 23 === 0)
        .select((col("user_id") % 10).as("k"), col("event_id").as("r_id"),
          sec.as("rs"), (sec + (col("event_id") % 7 + 1) * 1800).as("re"))
      graft.join.Joins.intervalJoin(l, r, "ls", "le", "rs", "re",
          bucketWidth = 21600.0, keys = Seq("k"))
        .select(col("k"), col("l_id"), col("r_id"),
          greatest(col("ls"), col("rs")).as("o_start"),
          least(col("le"), col("re")).as("o_end"))
        .orderBy("k", "l_id", "r_id")
    },

    // sessionization through the secondary-sort machinery
    // (SortedGrouped.mapValueStream): same answer as the window-based
    // q_events_sessionize, via one shuffle + in-partition sorted runs
    // instead of two window passes.
    q("q_typed_sessionize",
      """WITH evts AS (
        |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events
        |), gaps AS (
        |  SELECT user_id,
        |    CASE WHEN lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) IS NULL
        |      OR sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) > 1800
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM evts
        |)
        |SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM gaps GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ev = t(s, dir, "events")
      val events = ev
        .select(col("user_id"), Ts.seconds(ev).as("sec"), col("event_id"))
        .as[(Long, Long, Long)]
      graft.typed.TypedPipe.from(events)
        .map { case (u, sec, eid) => (u, (sec, eid)) }
        .group[Long, (Long, Long)]
        .sortBy(identity)
        .mapValueStream[(Long, Long)] { (_, vs) =>
          var sessions = 0L
          var events = 0L
          var lastSec = Long.MinValue
          vs.foreach { case (sec, _) =>
            if (lastSec == Long.MinValue || sec - lastSec > 1800) sessions += 1
            lastSec = sec
            events += 1
          }
          Iterator.single((sessions, events))
        }
        .ds.map { case (u, (ns, ne)) => (u, ns, ne) }
        .toDF("user_id", "n_sessions", "n_events")
        .orderBy("user_id")
    },

    // calendar truncation (RichDate/Duration.floorOf,
    // Duration.scala:56): monthly revenue.
    q("q_date_trunc_month",
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("revenue"))
        .orderBy("month")
    },

    // DateRange-driven partition filter (TimePathedSource semantics:
    // only the selected interval is scanned — here as a pushed-down
    // predicate on the date column).
    q("q_date_range_filter",
      """SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1995-04-01'
        |GROUP BY 1 ORDER BY day""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(count(lit(1)).as("n"))
        .orderBy("day")
    },

    // tumbling window aggregation (Structured Streaming
    // window(ts, "1 hour") in its batch form): hourly event counts.
    // Hour bucket = epoch seconds floored to 3600, formatted
    // identically on both engines.
    q("q_events_tumbling",
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
        |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      ev.withColumn("hour",
          date_format(timestamp_seconds(floor(Ts.seconds(ev) / 3600L) * 3600L),
            "yyyy-MM-dd HH:00:00"))
        .groupBy("hour", "event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("hour", "event_type")
    },

    // difference-in-differences: per-user pre/post value sums (split
    // mid-range), user_id % 3 arms with arm 0 as control.
    q("q_events_did",
      """WITH pu AS (
        |  SELECT user_id, CAST(user_id % 3 AS VARCHAR) AS variant,
        |    sum(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) < 1705363200
        |      THEN value ELSE 0.0::DOUBLE END) AS pre,
        |    sum(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) >= 1705363200
        |      THEN value ELSE 0.0::DOUBLE END) AS post
        |  FROM events GROUP BY 1, 2
        |), pv AS (
        |  SELECT variant, count(*) AS n_users,
        |    avg(pre) AS pre_mean, avg(post) AS post_mean
        |  FROM pu GROUP BY 1
        |), c AS (
        |  SELECT pre_mean AS c_pre, post_mean AS c_post
        |  FROM pv WHERE variant = '0'
        |)
        |SELECT variant, n_users,
        |  round(pre_mean, 4) AS pre_mean, round(post_mean, 4) AS post_mean,
        |  round(c_pre, 4) AS c_pre, round(c_post, 4) AS c_post,
        |  round((post_mean - pre_mean) - (c_post - c_pre), 4) AS did
        |FROM pv, c WHERE variant != '0'
        |ORDER BY variant""".stripMargin) { (s, dir) =>
      val raw = t(s, dir, "events")
      graft.events.Events.diffInDiff(
          raw.withColumn("variant", (col("user_id") % 3).cast("string"))
            .withColumn("sec", Ts.seconds(raw)),
          "user_id", "variant", "sec", "value",
          splitSec = 1705363200L, controlVariant = "0")
        .select(col("variant"), col("n_users"),
          round(col("pre_mean"), 4).as("pre_mean"),
          round(col("post_mean"), 4).as("post_mean"),
          round(col("c_pre"), 4).as("c_pre"),
          round(col("c_post"), 4).as("c_post"),
          round(col("did"), 4).as("did"))
        .orderBy("variant")
    },

    // Kaplan–Meier churn curves: daily cohorts/durations, users whose
    // last event is within 3 days of the horizon are censored (alive).
    q("q_events_survival",
      """WITH pu AS (
        |  SELECT user_id, min(sec) AS fs, max(sec) AS ls FROM (
        |    SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |    FROM events
        |  ) GROUP BY 1
        |), h AS (SELECT max(ls) AS horizon FROM pu),
        |lt AS (
        |  SELECT fs // 86400 AS cohort, (ls - fs) // 86400 AS t,
        |    ls >= horizon - 259200 AS censored
        |  FROM pu, h
        |), bd AS (
        |  SELECT cohort, t,
        |    CAST(sum(CASE WHEN censored THEN 0 ELSE 1 END) AS BIGINT)
        |      AS churned,
        |    count(*) AS leaving
        |  FROM lt GROUP BY 1, 2
        |), r AS (
        |  SELECT *, sum(leaving) OVER (PARTITION BY cohort ORDER BY t
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS at_risk
        |  FROM bd
        |), s AS (
        |  SELECT *,
        |    max(CASE WHEN churned = at_risk THEN 1 ELSE 0 END) OVER wp
        |      AS dead,
        |    sum(CASE WHEN churned < at_risk
        |      THEN ln(1 - churned * 1.0::DOUBLE / at_risk)
        |      ELSE 0.0::DOUBLE END) OVER wp AS lsum
        |  FROM r WINDOW wp AS (PARTITION BY cohort ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)
        |SELECT cohort, t, CAST(at_risk AS BIGINT) AS at_risk, churned,
        |  round(CASE WHEN dead = 1 THEN 0.0::DOUBLE ELSE exp(lsum) END, 6)
        |    AS survival
        |FROM s ORDER BY cohort, t""".stripMargin) { (s, dir) =>
      val raw = t(s, dir, "events")
      graft.events.Events.kaplanMeier(
          raw.withColumn("sec", Ts.seconds(raw)),
          "user_id", "sec", periodSec = 86400L, censorGap = 259200L)
        .select(col("cohort"), col("t"), col("at_risk"), col("churned"),
          round(col("survival"), 6).as("survival"))
        .orderBy("cohort", "t")
    },

    // CUPED variance reduction: pre-period value sums as the
    // covariate (split at 2024-01-16), pooled theta, per-variant raw
    // vs adjusted means/variances — adjusted variance must shrink.
    q("q_events_cuped",
      """WITH pu AS (
        |  SELECT user_id, CAST(user_id % 2 AS VARCHAR) AS variant,
        |    sum(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) < 1705363200
        |      THEN value ELSE 0.0::DOUBLE END) AS x,
        |    sum(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) >= 1705363200
        |      THEN value ELSE 0.0::DOUBLE END) AS y
        |  FROM events GROUP BY 1, 2
        |), st AS (
        |  SELECT covar_pop(x, y) AS cxy, var_pop(x) AS vx, avg(x) AS mx
        |  FROM pu
        |), adj AS (
        |  SELECT pu.*,
        |    CASE WHEN vx > 0 THEN cxy / vx ELSE 0.0::DOUBLE END AS theta,
        |    y - (CASE WHEN vx > 0 THEN cxy / vx ELSE 0.0::DOUBLE END)
        |      * (x - mx) AS y_adj
        |  FROM pu, st
        |)
        |SELECT variant, count(*) AS n_users,
        |  round(avg(y), 4) AS mean_raw, round(avg(y_adj), 4) AS mean_adj,
        |  round(var_pop(y), 2) AS var_raw,
        |  round(var_pop(y_adj), 2) AS var_adj,
        |  round(any_value(theta), 6) AS theta
        |FROM adj GROUP BY variant ORDER BY variant""".stripMargin) { (s, dir) =>
      val raw = t(s, dir, "events")
      graft.events.Events.cuped(
          raw.withColumn("variant", (col("user_id") % 2).cast("string"))
            .withColumn("sec", Ts.seconds(raw)),
          "user_id", "variant", "sec", "value",
          splitSec = 1705363200L)
        .select(col("variant"), col("n_users"),
          round(col("mean_raw"), 4).as("mean_raw"),
          round(col("mean_adj"), 4).as("mean_adj"),
          round(col("var_raw"), 2).as("var_raw"),
          round(col("var_adj"), 2).as("var_adj"),
          round(col("theta"), 6).as("theta"))
        .orderBy("variant")
    },

    // experiment power analysis: MDE at current sample sizes and the
    // per-arm n required to detect the observed lift, closed-form
    // normal-approximation arithmetic with literal z quantiles
    // (two-sided alpha=0.05, power=0.8) shared by both engines.
    q("q_events_power",
      """WITH pu AS (
        |  SELECT user_id, CAST(user_id % 3 AS VARCHAR) AS variant,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS converted
        |  FROM events GROUP BY 1, 2
        |), pv AS (
        |  SELECT variant, count(*) AS n_users,
        |    CAST(sum(converted) AS BIGINT) AS n_converted
        |  FROM pu GROUP BY 1
        |), c AS (
        |  SELECT n_users AS c_users, n_converted AS c_converted
        |  FROM pv WHERE variant = '0'
        |), j AS (
        |  SELECT variant, n_users, c_users,
        |    (n_converted + c_converted) * 1.0::DOUBLE
        |      / (n_users + c_users) AS pbar,
        |    n_converted * 1.0::DOUBLE / n_users
        |      - c_converted * 1.0::DOUBLE / c_users AS lift
        |  FROM pv, c WHERE variant != '0'
        |)
        |SELECT variant, n_users, c_users,
        |  round(lift, 6) + 0.0::DOUBLE AS lift,
        |  round(2.8015852181129688 * sqrt(pbar * (1.0::DOUBLE - pbar)
        |    * (1.0::DOUBLE / n_users + 1.0::DOUBLE / c_users)), 6) AS mde_abs,
        |  CASE WHEN abs(lift) > 0 THEN CAST(ceil(
        |    7.848879734349091 * 2.0::DOUBLE * pbar * (1.0::DOUBLE - pbar)
        |    / (lift * lift)) AS BIGINT) END AS n_required
        |FROM j ORDER BY variant""".stripMargin) { (s, dir) =>
      graft.events.Events.powerAnalysis(
          t(s, dir, "events")
            .withColumn("variant", (col("user_id") % 3).cast("string")),
          "user_id", "variant", "event_type", "purchase",
          controlVariant = "0")
        .withColumn("lift", round(col("lift"), 6) + lit(0.0))
        .withColumn("mde_abs", round(col("mde_abs"), 6))
        .orderBy("variant")
    },

    // always-valid sequential test (mSPRT, normal mixture τ²=1e-4):
    // cumulative per-period two-sample statistics per treatment arm,
    // closed-form log mixture-likelihood ratio, running-min always-
    // valid p. Ratios are exact integer-quotient doubles on both
    // engines; ln/exp differences wash out at the 1e-6 rounding.
    q("q_events_sequential",
      """WITH pu AS (
        |  SELECT user_id, CAST(user_id % 3 AS VARCHAR) AS variant,
        |    CAST(floor(min(CAST(floor(epoch(ts)) AS BIGINT)) / 86400.0) AS BIGINT) AS entry_p,
        |    CAST(floor(min(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(epoch(ts)) AS BIGINT) END) / 86400.0) AS BIGINT) AS conv_p
        |  FROM events GROUP BY 1, 2
        |), periods AS (
        |  SELECT DISTINCT entry_p AS period FROM pu
        |  UNION SELECT DISTINCT conv_p FROM pu WHERE conv_p IS NOT NULL
        |), grid AS (
        |  SELECT v.variant, p.period
        |  FROM (SELECT DISTINCT variant FROM pu) v, periods p
        |), ent AS (
        |  SELECT variant, entry_p AS period, count(*) AS entered
        |  FROM pu GROUP BY 1, 2
        |), cv AS (
        |  SELECT variant, conv_p AS period, count(*) AS converted
        |  FROM pu WHERE conv_p IS NOT NULL GROUP BY 1, 2
        |), cum AS (
        |  SELECT g.variant, g.period,
        |    sum(coalesce(ent.entered, 0)) OVER (PARTITION BY g.variant
        |      ORDER BY g.period) AS n,
        |    sum(coalesce(cv.converted, 0)) OVER (PARTITION BY g.variant
        |      ORDER BY g.period) AS c
        |  FROM grid g
        |  LEFT JOIN ent ON ent.variant = g.variant AND ent.period = g.period
        |  LEFT JOIN cv ON cv.variant = g.variant AND cv.period = g.period
        |), ctl AS (
        |  SELECT period, n AS n_c, c AS conv_c FROM cum WHERE variant = '0'
        |), j AS (
        |  SELECT cum.variant, cum.period, cum.n AS n_t, cum.c AS conv_t,
        |    ctl.n_c, ctl.conv_c
        |  FROM cum JOIN ctl USING (period) WHERE cum.variant != '0'
        |), s AS (
        |  SELECT *,
        |    CASE WHEN n_t > 0 AND n_c > 0 THEN
        |      conv_t * 1.0::DOUBLE / n_t - conv_c * 1.0::DOUBLE / n_c END AS theta,
        |    CASE WHEN n_t > 0 AND n_c > 0 THEN
        |      (conv_t + conv_c) * 1.0::DOUBLE / (n_t + n_c) END AS pbar
        |  FROM j
        |), s2 AS (
        |  SELECT *, CASE WHEN theta IS NOT NULL
        |      AND pbar * (1.0::DOUBLE - pbar)
        |        * (1.0::DOUBLE / n_t + 1.0::DOUBLE / n_c) > 0
        |    THEN pbar * (1.0::DOUBLE - pbar)
        |        * (1.0::DOUBLE / n_t + 1.0::DOUBLE / n_c) END AS v
        |  FROM s
        |), s3 AS (
        |  SELECT *, CASE WHEN v IS NOT NULL THEN
        |    0.5 * ln(v / (v + 0.0001)) +
        |    theta * theta * 0.0001 / (2.0::DOUBLE * v * (v + 0.0001))
        |    END AS log_lambda
        |  FROM s2
        |)
        |SELECT variant, period,
        |  CAST(n_t AS BIGINT) AS n_t, CAST(conv_t AS BIGINT) AS conv_t,
        |  CAST(n_c AS BIGINT) AS n_c, CAST(conv_c AS BIGINT) AS conv_c,
        |  round(theta, 6) + 0.0::DOUBLE AS theta,
        |  round(log_lambda, 6) + 0.0::DOUBLE AS log_lambda,
        |  round(min(CASE WHEN log_lambda IS NOT NULL
        |      THEN least(1.0::DOUBLE, exp(-log_lambda)) END)
        |    OVER (PARTITION BY variant ORDER BY period), 6) AS p_value
        |FROM s3 ORDER BY variant, period""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      graft.events.Events.sequentialTest(
          ev.withColumn("variant", (col("user_id") % 3).cast("string"))
            .withColumn("sec", Ts.seconds(ev)),
          "user_id", "variant", "sec", "event_type", "purchase",
          controlVariant = "0", periodSec = 86400L, tau2 = 0.0001)
        .withColumn("theta", round(col("theta"), 6) + lit(0.0))
        .withColumn("log_lambda", round(col("log_lambda"), 6) + lit(0.0))
        .withColumn("p_value", round(col("p_value"), 6))
        .orderBy("variant", "period")
    },

    // Poisson-bootstrap CI for per-variant conversion: deterministic
    // md5-hash Poisson(1) weights (the CASE thresholds below are
    // GENERATED from the same Events.poissonHexThresholds constants
    // the Spark plan compiles in), 100 replicates, exact order-
    // statistic 95% interval.
    q("q_events_bootstrap", EventQueries.bootstrapOracleSql) { (s, dir) =>
      val perUser = t(s, dir, "events")
        .withColumn("variant", (col("user_id") % 3).cast("string"))
        .groupBy("user_id", "variant")
        .agg(max(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("converted"))
      graft.events.Events.bootstrapCI(perUser, "user_id", "variant",
          "converted", nReps = 100, alpha = 0.05, seed = 42L)
        .select(col("variant"), col("n_users"),
          round(col("mean"), 6).as("mean"),
          round(col("ci_lo"), 6).as("ci_lo"),
          round(col("ci_hi"), 6).as("ci_hi"), col("n_reps"))
        .orderBy("variant")
    },

    // two-proportion z-test: synthetic variants (user_id % 3, variant
    // 0 as control), conversion = any purchase event; rates, lift and
    // pooled z per treatment arm.
    q("q_events_abtest",
      """WITH pu AS (
        |  SELECT user_id, CAST(user_id % 3 AS VARCHAR) AS variant,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS converted
        |  FROM events GROUP BY 1, 2
        |), pv AS (
        |  SELECT variant, count(*) AS n_users,
        |    CAST(sum(converted) AS BIGINT) AS n_converted,
        |    sum(converted) * 1.0::DOUBLE / count(*) AS rate
        |  FROM pu GROUP BY 1
        |), c AS (
        |  SELECT n_users AS c_users, n_converted AS c_converted,
        |    rate AS c_rate
        |  FROM pv WHERE variant = '0'
        |)
        |SELECT variant, n_users, n_converted,
        |  round(rate, 6) AS rate, round(c_rate, 6) AS c_rate,
        |  round(rate - c_rate, 6) AS lift,
        |  round((rate - c_rate) / sqrt(
        |    ((n_converted + c_converted) * 1.0::DOUBLE / (n_users + c_users))
        |    * (1.0 - (n_converted + c_converted) * 1.0::DOUBLE
        |        / (n_users + c_users))
        |    * (1.0 / n_users + 1.0 / c_users)), 6) AS z_score
        |FROM pv, c WHERE variant != '0'
        |ORDER BY variant""".stripMargin) { (s, dir) =>
      graft.events.Events.abTest(
          t(s, dir, "events")
            .withColumn("variant", (col("user_id") % 3).cast("string")),
          "user_id", "variant", "event_type", "purchase",
          controlVariant = "0")
        .select(col("variant"), col("n_users"), col("n_converted"),
          round(col("rate"), 6).as("rate"),
          round(col("c_rate"), 6).as("c_rate"),
          round(col("lift"), 6).as("lift"),
          round(col("z_score"), 6).as("z_score"))
        .orderBy("variant")
    },

    // per-SESSION VALUE aggregates through the native sessionize exec:
    // the (key, session_id) groupBy rides SessionizeExec's preserved
    // partitioning, so the whole query is ONE exchange end-to-end
    // (pinned in PlanAuditSpec). 30-minute gap sessions. (Renamed in
    // round 8: this gate and the later per-session summary both
    // registered as q_events_session_stats, so this one was silently
    // shadowed in the queries Map — the uniqueness guard in
    // CurationSpec now fails the build on any recurrence.)
    q("q_events_session_value",
      """WITH e AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |    event_id, value
        |  FROM events
        |), gaps AS (
        |  SELECT *, CASE WHEN lag(sec) OVER w IS NULL
        |      OR sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
        |), s AS (
        |  SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id
        |    ORDER BY sec, event_id) AS BIGINT) AS session_id
        |  FROM gaps
        |)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  max(sec) - min(sec) AS duration_sec,
        |  round(sum(value), 4) AS total_value
        |FROM s GROUP BY 1, 2
        |ORDER BY user_id, session_id""".stripMargin) { (s, dir) =>
      val raw = t(s, dir, "events")
      val ev = raw.select(col("user_id"), Ts.seconds(raw).as("sec"),
        col("event_id"), col("value"))
      org.apache.spark.sql.graft.SessionizeNative.sessionize(ev, Seq("user_id"), "sec",
          gapSec = 1800L)
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          (max("sec") - min("sec")).as("duration_sec"),
          round(sum("value"), 4).as("total_value"))
        .orderBy("user_id", "session_id")
    },

    // first-order Markov transition probabilities over the per-user
    // event sequence: P(to | from) with a deterministic (sec, id)
    // order — the next-event model behind path prediction.
    q("q_events_markov",
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id
        |  FROM events
        |), t AS (
        |  SELECT lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY sec, event_id) AS from_type,
        |    event_type AS to_type
        |  FROM e
        |), c AS (
        |  SELECT from_type, to_type, count(*) AS n FROM t
        |  WHERE from_type IS NOT NULL GROUP BY 1, 2
        |), tot AS (
        |  SELECT from_type, sum(n) AS tn FROM c GROUP BY 1
        |)
        |SELECT c.from_type, c.to_type, c.n,
        |  round(c.n * 1.0::DOUBLE / tot.tn, 6) AS p
        |FROM c JOIN tot USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val raw = t(s, dir, "events")
      val counts = graft.events.Events.transitionCounts(
        raw.withColumn("sec", Ts.seconds(raw)),
        "user_id", "sec", "event_type", "event_id")
      val tot = counts.groupBy("from_type").agg(sum("n").as("tn"))
      counts.join(tot, "from_type")
        .select(col("from_type"), col("to_type"), col("n"),
          round(col("n").cast("double") / col("tn"), 6).as("p"))
        .orderBy("from_type", "to_type")
    },

    // SCD2 history rebuild: per-user event_type as the tracked
    // attribute — one version row per change, [valid_from, valid_to)
    // intervals, open tail null; duplicate timestamps resolve
    // last-writer-wins on (event_id, attrs).
    q("q_scd2_history",
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id
        |  FROM events
        |), dedup AS (
        |  SELECT user_id, event_type, sec FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, sec
        |      ORDER BY event_id DESC, event_type DESC) AS rn
        |    FROM e
        |  ) WHERE rn = 1
        |), marked AS (
        |  SELECT *, lag(event_type) OVER (
        |    PARTITION BY user_id ORDER BY sec) AS prev
        |  FROM dedup
        |), versions AS (
        |  SELECT user_id, event_type, sec AS valid_from
        |  FROM marked WHERE prev IS NULL OR event_type != prev
        |)
        |SELECT user_id, event_type, valid_from,
        |  lead(valid_from) OVER (
        |    PARTITION BY user_id ORDER BY valid_from) AS valid_to
        |FROM versions
        |ORDER BY user_id, valid_from""".stripMargin) { (s, dir) =>
      val raw = t(s, dir, "events")
      graft.sources.Scd2.fromEvents(
          raw.withColumn("sec", Ts.seconds(raw)),
          Seq("user_id"), Seq("event_type"), "sec",
          tieCols = Seq("event_id"))
        .orderBy("user_id", "valid_from")
    },

    // per-user EWMA along the event stream (pandas ewm(adjust=false)
    // seed rule): the oracle folds each row's ordered value prefix
    // with list_reduce — the identical left-fold arithmetic the
    // engine's O(1)-state sorted stream runs.
    q("q_events_ewma",
      """WITH e AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |    event_id, value
        |  FROM events
        |), w AS (
        |  SELECT user_id, sec, event_id,
        |    list(value) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix
        |  FROM e
        |)
        |SELECT user_id, sec, event_id,
        |  floor(list_reduce(prefix, (acc, x) -> 0.3 * x + 0.7 * acc)
        |    * 1000000 + 0.5) / 1000000 AS ewma
        |FROM w ORDER BY user_id, sec, event_id""".stripMargin) { (s, dir) =>
      // multiply-based half-up rounding on BOTH sides: engine round()
      // implementations disagree on exact shortest-repr boundaries
      // (Spark rounds Double.toString's "…725", DuckDB the binary
      // "…7249999…" — observed at sf0.1 on 3 of 100k rows), while
      // IEEE multiply/floor is bit-identical everywhere
      val raw = t(s, dir, "events")
      graft.events.Events.ewma(
          raw.withColumn("sec", Ts.seconds(raw)),
          "user_id", "sec", "event_id", "value", alpha = 0.3)
        .select(col("user_id"), col("sec"), col("event_id"),
          (floor(col("ewma") * 1000000 + 0.5) / 1000000).as("ewma"))
        .orderBy("user_id", "sec", "event_id")
    },

    // inter-event gap stats per arriving event type — the dwell-time
    // read that picks a sessionize gap.
    q("q_events_gaps",
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events
        |), g AS (
        |  SELECT event_type,
        |    sec - lag(sec) OVER (PARTITION BY user_id
        |      ORDER BY sec, event_id) AS gap
        |  FROM e
        |)
        |SELECT event_type, count(*) AS n,
        |  min(gap) AS min_gap, max(gap) AS max_gap,
        |  round(avg(gap), 6) AS mean_gap
        |FROM g WHERE gap IS NOT NULL
        |GROUP BY 1 ORDER BY event_type""".stripMargin) { (s, dir) =>
      val raw = t(s, dir, "events")
      graft.events.Events.interEventGaps(
          raw.withColumn("sec", Ts.seconds(raw)),
          "user_id", "sec", "event_id", "event_type")
        .withColumn("mean_gap", round(col("mean_gap"), 6))
        .orderBy("event_type")
    },

    // Goh–Barabási burstiness + memory coefficient of inter-event
    // times per arriving type: two lag windows + one moments/corr
    // aggregate (Events.burstiness).
    q("q_events_burstiness",
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events
        |), g AS (
        |  SELECT event_type,
        |    CAST(sec - lag(sec) OVER w AS DOUBLE) AS gap,
        |    CAST(lag(sec) OVER w - lag(sec, 2) OVER w AS DOUBLE)
        |      AS prev_gap
        |  FROM e WINDOW w AS (PARTITION BY user_id
        |    ORDER BY sec, event_id)
        |)
        |SELECT event_type, count(*) AS n_gaps,
        |  round(avg(gap), 6) AS mean_gap,
        |  round(stddev_pop(gap), 6) AS sd_gap,
        |  round(CASE WHEN stddev_pop(gap) + avg(gap) > 0 THEN
        |    (stddev_pop(gap) - avg(gap))
        |      / (stddev_pop(gap) + avg(gap)) END, 6) + 0.0
        |    AS burstiness,
        |  round(corr(prev_gap, gap), 6) + 0.0 AS memory
        |FROM g WHERE gap IS NOT NULL
        |GROUP BY 1 ORDER BY event_type""".stripMargin) { (s, dir) =>
      val raw = t(s, dir, "events")
      graft.events.Events.burstiness(
          raw.withColumn("sec", Ts.seconds(raw)),
          "user_id", "sec", "event_id", "event_type")
        .select(col("event_type"), col("n_gaps"),
          round(col("mean_gap"), 6).as("mean_gap"),
          round(col("sd_gap"), 6).as("sd_gap"),
          (round(col("burstiness"), 6) + 0.0).as("burstiness"),
          (round(col("memory"), 6) + 0.0).as("memory"))
        .orderBy("event_type")
    },

    // Wilson score interval per event type for the "high-value event"
    // rate (value > 50): the small-sample-safe rate CI; pure
    // closed-form replay off the per-group counts.
    q("q_events_wilson",
      """WITH g AS (
        |  SELECT event_type AS grp, count(*) AS n,
        |    CAST(sum(CASE WHEN value > 50 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS s
        |  FROM events GROUP BY 1
        |), r AS (
        |  SELECT grp, n, s, s * 1.0::DOUBLE / n AS rate,
        |    1.0::DOUBLE + (1.96 * 1.96) / n AS dn
        |  FROM g
        |)
        |SELECT grp, n, s, round(rate, 6) AS rate,
        |  round(greatest((rate + (1.96 * 1.96) / (2.0 * n)) / dn
        |    - 1.96 * sqrt(rate * (1.0::DOUBLE - rate) / n
        |      + (1.96 * 1.96) / (4.0 * n * n)) / dn, 0.0::DOUBLE), 6) + 0.0
        |    AS wilson_lo,
        |  round(least((rate + (1.96 * 1.96) / (2.0 * n)) / dn
        |    + 1.96 * sqrt(rate * (1.0::DOUBLE - rate) / n
        |      + (1.96 * 1.96) / (4.0 * n * n)) / dn, 1.0::DOUBLE), 6) + 0.0
        |    AS wilson_hi
        |FROM r ORDER BY grp""".stripMargin) { (s, dir) =>
      graft.events.Events.wilsonInterval(
          t(s, dir, "events").withColumn("hi", col("value") > 50),
          "event_type", "hi", z = 1.96)
        .select(col("group").as("grp"), col("n"), col("s"),
          round(col("rate"), 6).as("rate"),
          (round(col("wilson_lo"), 6) + lit(0.0)).as("wilson_lo"),
          (round(col("wilson_hi"), 6) + lit(0.0)).as("wilson_hi"))
        .orderBy("grp")
    },

    // STL-lite seasonal decomposition of the hourly event-count
    // series (24-phase season): trend = ±12-bucket centered moving
    // average, seasonal = centered per-phase mean of the detrended
    // counts, residual = remainder — full window/aggregate replay.
    q("q_events_seasonal",
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
        |), ctr AS (SELECT avg(s_raw) AS s_mean FROM pm)
        |SELECT bucket, phase, y, round(trend, 6) + 0.0 AS trend,
        |  round(s_raw - s_mean, 6) + 0.0 AS seasonal,
        |  round(y - trend - (s_raw - s_mean), 6) + 0.0 AS residual
        |FROM tr JOIN pm USING (phase) CROSS JOIN ctr
        |ORDER BY bucket""".stripMargin) { (s, dir) =>
      val raw = t(s, dir, "events")
      graft.events.Events.seasonalDecompose(
          raw.withColumn("sec", Ts.seconds(raw)),
          "sec", periodSec = 3600L, seasonLen = 24)
        .select(col("bucket"), col("phase"), col("y"),
          (round(col("trend"), 6) + lit(0.0)).as("trend"),
          (round(col("seasonal"), 6) + lit(0.0)).as("seasonal"),
          (round(col("residual"), 6) + lit(0.0)).as("residual"))
        .orderBy("bucket")
    },

    // interval concurrency sweep: each event holds for ceil(value)
    // seconds; the sweep reports the active count at every boundary.
    q("q_events_concurrency",
      """WITH e AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS s,
        |    CAST(floor(epoch(ts)) AS BIGINT)
        |      + CAST(ceil(value) AS BIGINT) AS en
        |  FROM events
        |), d AS (
        |  SELECT s AS sec, 1::BIGINT AS d FROM e
        |  UNION ALL
        |  SELECT en, -1::BIGINT FROM e
        |), g AS (
        |  SELECT sec, sum(d)::BIGINT AS delta FROM d GROUP BY sec
        |)
        |SELECT sec, delta,
        |  sum(delta) OVER (ORDER BY sec
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
        |    AS active
        |FROM g ORDER BY sec""".stripMargin) { (s, dir) =>
      val raw = t(s, dir, "events")
      val iv = raw.select(Ts.seconds(raw).as("s"),
        (Ts.seconds(raw) + ceil(col("value")).cast("long")).as("en"))
      graft.events.Events.concurrency(iv, "s", "en")
        .orderBy("sec")
    },

    // time-weighted average value per user: each observation holds
    // until the next one, the last carries no weight — the right mean
    // for irregularly-sampled state metrics.
    q("q_events_twa",
      """WITH e AS (
        |  SELECT user_id, event_id, value,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events
        |), w AS (
        |  SELECT user_id, value, sec,
        |    lead(sec) OVER (PARTITION BY user_id
        |      ORDER BY sec, event_id) AS nxt
        |  FROM e
        |)
        |SELECT user_id AS key, count(*)::BIGINT AS n_obs,
        |  (max(sec) - min(sec))::BIGINT AS span_sec,
        |  round(CASE WHEN sum((nxt - sec)::DOUBLE) > 0
        |    THEN sum(value * (nxt - sec)::DOUBLE)
        |      / sum((nxt - sec)::DOUBLE) END, 6) AS twa
        |FROM w GROUP BY 1 ORDER BY key""".stripMargin) { (s, dir) =>
      val raw = t(s, dir, "events")
      graft.events.Events.timeWeightedAverage(
          raw.withColumn("sec", Ts.seconds(raw)),
          "user_id", "sec", "event_id", "value")
        .select(col("key"), col("n_obs"), col("span_sec"),
          round(col("twa"), 6).as("twa"))
        .orderBy("key")
    },

    // RFM segmentation: per-user recency/frequency/monetary, each
    // bucketed 1-5 against the exact interpolated quintile cuts of
    // the user-level distribution (recency inverted: most recent = 5).
    q("q_events_rfm",
      """WITH e AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, value
        |  FROM events
        |), u AS (
        |  SELECT user_id AS u, max(sec) AS last_, count(*)::BIGINT AS f,
        |    sum(value) AS m
        |  FROM e GROUP BY 1
        |), a AS (SELECT max(last_) AS as_of FROM u
        |), w AS (
        |  SELECT u, (as_of - last_) AS r, f, m FROM u, a
        |), cuts AS (
        |  SELECT
        |    quantile_cont(r::DOUBLE, 0.2) AS rq0, quantile_cont(r::DOUBLE, 0.4) AS rq1,
        |    quantile_cont(r::DOUBLE, 0.6) AS rq2, quantile_cont(r::DOUBLE, 0.8) AS rq3,
        |    quantile_cont(f::DOUBLE, 0.2) AS fq0, quantile_cont(f::DOUBLE, 0.4) AS fq1,
        |    quantile_cont(f::DOUBLE, 0.6) AS fq2, quantile_cont(f::DOUBLE, 0.8) AS fq3,
        |    quantile_cont(m, 0.2) AS mq0, quantile_cont(m, 0.4) AS mq1,
        |    quantile_cont(m, 0.6) AS mq2, quantile_cont(m, 0.8) AS mq3
        |  FROM w
        |)
        |SELECT u AS user, r AS recency_sec, f AS frequency,
        |  round(m, 6) AS monetary,
        |  6 - (1 + (CASE WHEN r::DOUBLE >= rq0 THEN 1 ELSE 0 END)
        |         + (CASE WHEN r::DOUBLE >= rq1 THEN 1 ELSE 0 END)
        |         + (CASE WHEN r::DOUBLE >= rq2 THEN 1 ELSE 0 END)
        |         + (CASE WHEN r::DOUBLE >= rq3 THEN 1 ELSE 0 END)) AS r_score,
        |  1 + (CASE WHEN f::DOUBLE >= fq0 THEN 1 ELSE 0 END)
        |    + (CASE WHEN f::DOUBLE >= fq1 THEN 1 ELSE 0 END)
        |    + (CASE WHEN f::DOUBLE >= fq2 THEN 1 ELSE 0 END)
        |    + (CASE WHEN f::DOUBLE >= fq3 THEN 1 ELSE 0 END) AS f_score,
        |  1 + (CASE WHEN m >= mq0 THEN 1 ELSE 0 END)
        |    + (CASE WHEN m >= mq1 THEN 1 ELSE 0 END)
        |    + (CASE WHEN m >= mq2 THEN 1 ELSE 0 END)
        |    + (CASE WHEN m >= mq3 THEN 1 ELSE 0 END) AS m_score
        |FROM w, cuts ORDER BY user""".stripMargin) { (s, dir) =>
      val raw = t(s, dir, "events")
      graft.events.Events.rfm(
          raw.withColumn("sec", Ts.seconds(raw)),
          "user_id", "sec", "value")
        .select(col("user"), col("recency_sec"), col("frequency"),
          round(col("monetary"), 6).as("monetary"),
          col("r_score"), col("f_score"), col("m_score"))
        .orderBy("user")
    },

    // multi-touch attribution: linear + 6h-halflife time-decay credit
    // split over view/click/signup touches in a 24h lookback before
    // each purchase.
    q("q_events_multitouch",
      """WITH e AS (
        |  SELECT event_id, user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_type
        |  FROM events
        |), conv AS (
        |  SELECT user_id, event_id AS conv_id, sec AS conv_sec
        |  FROM e WHERE event_type = 'purchase'
        |), tch AS (
        |  SELECT user_id, event_id AS touch_id, sec AS touch_sec,
        |    event_type AS touch_type
        |  FROM e WHERE event_type IN ('view', 'click', 'signup')
        |), paired AS (
        |  SELECT conv_id, touch_type,
        |    pow(2.0::DOUBLE, -(conv_sec - touch_sec) * 1.0::DOUBLE / 21600) AS w
        |  FROM conv JOIN tch USING (user_id)
        |  WHERE touch_sec <= conv_sec AND touch_sec > conv_sec - 86400
        |    AND touch_id != conv_id
        |), nw AS (
        |  SELECT conv_id, touch_type, w,
        |    count(*) OVER (PARTITION BY conv_id) AS n,
        |    sum(w) OVER (PARTITION BY conv_id) AS wsum
        |  FROM paired
        |)
        |SELECT touch_type, count(*) AS n_touches,
        |  round(sum(1.0::DOUBLE / n), 6) AS linear_credit,
        |  round(sum(w / wsum), 6) AS decay_credit
        |FROM nw GROUP BY 1 ORDER BY touch_type""".stripMargin) { (s, dir) =>
      val raw = t(s, dir, "events")
      graft.events.Events.multiTouchAttribution(
          raw.withColumn("sec", Ts.seconds(raw)),
          "user_id", "sec", "event_id", "event_type", "purchase",
          Seq("view", "click", "signup"), lookbackSec = 86400L,
          halflifeSec = 21600L)
        .withColumn("linear_credit", round(col("linear_credit"), 6))
        .withColumn("decay_credit", round(col("decay_credit"), 6))
        .orderBy("touch_type")
    },

    // cohort LTV: cumulative value per user by days-since-cohort, per
    // first-active-day cohort.
    q("q_events_ltv",
      """WITH e AS (
        |  SELECT user_id AS u,
        |    CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 86400.0) AS BIGINT) AS period,
        |    value AS v
        |  FROM events
        |), c AS (
        |  SELECT u, min(period) AS cohort FROM e GROUP BY 1
        |), pa AS (
        |  SELECT c.cohort, e.period - c.cohort AS age, sum(e.v) AS value
        |  FROM e JOIN c USING (u) GROUP BY 1, 2
        |), sz AS (
        |  SELECT cohort, count(*) AS n_users FROM c GROUP BY 1
        |)
        |SELECT pa.cohort, pa.age, sz.n_users,
        |  round(pa.value, 6) AS value,
        |  round(sum(pa.value) OVER (PARTITION BY pa.cohort ORDER BY pa.age
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    / sz.n_users, 6) AS cum_value_per_user
        |FROM pa JOIN sz USING (cohort)
        |ORDER BY cohort, age""".stripMargin) { (s, dir) =>
      val raw = t(s, dir, "events")
      graft.events.Events.cohortLtv(
          raw.withColumn("sec", Ts.seconds(raw)),
          "user_id", "sec", "value", periodSec = 86400L)
        .withColumn("value", round(col("value"), 6))
        .withColumn("cum_value_per_user", round(col("cum_value_per_user"), 6))
        .orderBy("cohort", "age")
    },

    // growth accounting: per-day new/retained/resurrected/churned
    // decomposition of the active-user count (churn charged to the
    // first inactive day; the final observed day is censored — no
    // churn row past the horizon).
    q("q_events_growth",
      """WITH ap AS (
        |  SELECT DISTINCT user_id AS u,
        |    CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 86400.0) AS BIGINT) AS period
        |  FROM events
        |), st AS (
        |  SELECT period,
        |    CASE WHEN lag(period) OVER (PARTITION BY u ORDER BY period) IS NULL
        |      THEN 'new_users'
        |      WHEN lag(period) OVER (PARTITION BY u ORDER BY period) = period - 1
        |      THEN 'retained' ELSE 'resurrected' END AS state
        |  FROM ap
        |), ch AS (
        |  SELECT period + 1 AS period, 'churned' AS state
        |  FROM (SELECT period, lead(period) OVER (PARTITION BY u
        |      ORDER BY period) AS nxt FROM ap)
        |  WHERE (nxt IS NULL OR nxt > period + 1)
        |    AND period + 1 <= (SELECT max(period) FROM ap)
        |), un AS (SELECT * FROM st UNION ALL SELECT * FROM ch)
        |SELECT period,
        |  CAST(sum(CASE WHEN state = 'new_users' THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
        |  CAST(sum(CASE WHEN state = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS retained,
        |  CAST(sum(CASE WHEN state = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS resurrected,
        |  CAST(sum(CASE WHEN state = 'churned' THEN 1 ELSE 0 END) AS BIGINT) AS churned
        |FROM un GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val raw = t(s, dir, "events")
      graft.events.Events.growthAccounting(
        raw.withColumn("sec", Ts.seconds(raw)),
        "user_id", "sec", periodSec = 86400L)
    },

    // top-20 most frequent 3-step event paths (contiguous per-user
    // type subsequences): the path-mining summary above the Markov
    // single-step view.
    q("q_events_paths",
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id
        |  FROM events
        |), p AS (
        |  SELECT
        |    lag(event_type, 2) OVER w AS t0,
        |    lag(event_type, 1) OVER w AS t1,
        |    event_type AS t2
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
        |)
        |SELECT t0 || ' > ' || t1 || ' > ' || t2 AS path, count(*) AS n
        |FROM p WHERE t0 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin) { (s, dir) =>
      val raw = t(s, dir, "events")
      graft.events.Events.commonPaths(
        raw.withColumn("sec", Ts.seconds(raw)),
        "user_id", "sec", "event_id", "event_type", len = 3, topK = 20)
    },

    // personalized PageRank over the event-type transition graph,
    // seeded at 'view' — local relevance on a graph DERIVED in-engine
    // (transition counts = the q_events_markov machinery), vs the
    // generated 10-iteration unrolled oracle.
    q("q_events_ppr", EventQueries.pprOracleSql) { (s, dir) =>
      import s.implicits._
      val raw = t(s, dir, "events")
      val counts = graft.events.Events.transitionCounts(
        raw.withColumn("sec", Ts.seconds(raw)),
        "user_id", "sec", "event_type", "event_id")
      // tiny node-id mapping (≤ |event types| rows, driver-bounded)
      val types = counts.select(col("from_type").as("t"))
        .union(counts.select(col("to_type")))
        .union(Seq("view").toDF("t"))
        .distinct().as[String].collect().sorted
      val idOf = types.zipWithIndex.map { case (n, i) => (n, i.toLong) }
      val mapping = idOf.toSeq.toDF("name", "id")
      val edges = counts
        .join(mapping.select(col("name").as("from_type"), col("id").as("src")), "from_type")
        .join(mapping.select(col("name").as("to_type"), col("id").as("dst")), "to_type")
        .select(col("src"), col("dst"), col("n").cast("double").as("w"))
      val seeds = Seq((idOf.find(_._1 == "view").get._2, 1.0))
        .toDF("node", "weight")
      graft.graph.Graphs.personalizedPageRank(edges, seeds,
          alpha = 0.15, iters = 10, weightCol = Some("w"))
        .join(mapping.select(col("id").as("node"), col("name")), "node")
        .select(col("name").as("event_type"), round(col("ppr"), 6).as("ppr"))
        .orderBy("event_type")
    },

    // per-key CUSUM change-point statistics: the one-sided fold
    // recursions replay in DuckDB as two list_reduce prefix folds with
    // a 0 sentinel seed (list_reduce seeds from the first element, and
    // s0 = 0 by definition).
    q("q_events_cusum",
      """WITH e AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |    event_id, value
        |  FROM events
        |), w AS (
        |  SELECT user_id, sec, event_id,
        |    list_prepend(0.0::DOUBLE,
        |      list(value) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS prefix
        |  FROM e
        |), f AS (
        |  SELECT user_id, sec, event_id,
        |    list_reduce(prefix,
        |      (acc, x) -> greatest(0.0::DOUBLE, acc + x - 5.0::DOUBLE - 0.5::DOUBLE)) AS s_pos,
        |    list_reduce(prefix,
        |      (acc, x) -> greatest(0.0::DOUBLE, acc + 5.0::DOUBLE - 0.5::DOUBLE - x)) AS s_neg
        |  FROM w
        |)
        |SELECT user_id, sec, event_id,
        |  round(s_pos, 6) AS s_pos, round(s_neg, 6) AS s_neg,
        |  (s_pos > 20.0::DOUBLE OR s_neg > 20.0::DOUBLE) AS alarm
        |FROM f ORDER BY user_id, sec, event_id""".stripMargin) { (s, dir) =>
      val raw = t(s, dir, "events")
      graft.events.Events.cusum(
          raw.withColumn("sec", Ts.seconds(raw)),
          "user_id", "sec", "event_id", "value",
          mu0 = 5.0, slack = 0.5, h = 20.0)
        .select(col("user_id"), col("sec"), col("event_id"),
          round(col("s_pos"), 6).as("s_pos"),
          round(col("s_neg"), 6).as("s_neg"), col("alarm"))
        .orderBy("user_id", "sec", "event_id")
    },

    // windowed trending: per-hour top-3 event types by count with the
    // previous hour's count and the lift ratio (null for entrants) —
    // bounded-PQ top-k per window in the engine, never a full
    // per-window sort.
    q("q_events_trending",
      """WITH s AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_type
        |  FROM events
        |), c AS (
        |  SELECT sec // 3600 AS win, event_type AS etype, count(*) AS n
        |  FROM s GROUP BY 1, 2
        |), r AS (
        |  SELECT win, etype, n, CAST(row_number() OVER (
        |    PARTITION BY win ORDER BY n DESC, etype) AS BIGINT) AS rank
        |  FROM c
        |)
        |SELECT r.win, r.etype, r.n, r.rank,
        |  coalesce(p.n, 0) AS prev_n,
        |  round(r.n * 1.0::DOUBLE / p.n, 6) AS lift
        |FROM r LEFT JOIN c p ON p.win = r.win - 1 AND p.etype = r.etype
        |WHERE r.rank <= 3
        |ORDER BY r.win, r.rank""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      graft.events.Events.trending(
          ev.withColumn("sec", Ts.seconds(ev)), "sec", "event_type",
          windowSec = 3600L, k = 3)
        .select(col("win"), col("etype"), col("n"), col("rank"),
          col("prev_n"), round(col("lift"), 6).as("lift"))
        .orderBy("win", "rank")
    },

    // JSON column extraction (JsonLine, FileSource.scala:450-503):
    // pull a field out of the props JSON string.
    q("q_events_json",
      """SELECT event_id,
        |  json_extract_string(props, '$.device') AS device
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.device").as("device"))
        .orderBy("event_id")
    },

    // gap-based sessionization (30-min inactivity): the canonical
    // stateful-streaming op, batch form = lag + cumulative-sum
    // windows, on floored epoch seconds in both engines.
    q("q_events_sessionize",
      """WITH evts AS (
        |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events
        |), gaps AS (
        |  SELECT user_id, event_id, sec,
        |    CASE WHEN lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) IS NULL
        |      OR sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) > 1800
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM evts
        |), sessions AS (
        |  SELECT user_id,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM gaps
        |)
        |SELECT user_id, count(DISTINCT session_id) AS n_sessions,
        |  count(*) AS n_events
        |FROM sessions GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      val byUser = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
      val cum = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ev = t(s, dir, "events")
      ev.withColumn("sec", Ts.seconds(ev))
        .withColumn("prev_sec", lag(col("sec"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_sec").isNull || col("sec") - col("prev_sec") > 1800, 1)
            .otherwise(0))
        .withColumn("session_id", sum("new_session").over(cum))
        .groupBy("user_id")
        .agg(countDistinct("session_id").as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id")
    },

    // the same gap-sessionization through the NATIVE Catalyst operator
    // (SessionizePlan.scala: one shuffle + one sort + a single
    // streaming pass with O(1) state, vs the window form's lag +
    // running-sum double pass) — gate-verifies the custom exec
    // against the same DuckDB oracle.
    q("q_events_sessionize_native",
      """WITH evts AS (
        |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events
        |), gaps AS (
        |  SELECT user_id, event_id, sec,
        |    CASE WHEN lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) IS NULL
        |      OR sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) > 1800
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM evts
        |)
        |SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM gaps GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val labeled = org.apache.spark.sql.graft.SessionizeNative.sessionize(
        ev.select(col("user_id"), Ts.seconds(ev).as("sec")),
        Seq("user_id"), "sec", 1800L)
      // session_id is a 1-based per-user counter, so max = the count;
      // the groupBy rides the exec's preserved hash partitioning —
      // ONE exchange in the whole plan
      labeled.groupBy("user_id")
        .agg(max("session_id").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    },

    // per-session summaries composed on the native operator: the
    // (user, session) aggregate is satisfied by the exec's preserved
    // hashpartitioning(user) — a subset clustering — so the whole
    // summary costs ONE hash exchange (plus the ORDER BY's range
    // partitioning). The window form needs its two window passes AND
    // the aggregate on top.
    q("q_events_session_stats",
      """WITH evts AS (
        |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events
        |), gaps AS (
        |  SELECT user_id, event_id, sec,
        |    CASE WHEN lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) IS NULL
        |      OR sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) > 1800
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM evts
        |), sessions AS (
        |  SELECT user_id, sec,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM gaps
        |)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(sec) AS start_sec, max(sec) AS end_sec,
        |  max(sec) - min(sec) AS duration
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val labeled = org.apache.spark.sql.graft.SessionizeNative.sessionize(
        ev.select(col("user_id"), Ts.seconds(ev).as("sec")),
        Seq("user_id"), "sec", 1800L)
      labeled.groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min("sec").as("start_sec"), max("sec").as("end_sec"),
          (max("sec") - min("sec")).as("duration"))
        .orderBy("user_id", "session_id")
    },

    // ordered funnel view → click → purchase within a 7-day window of
    // the first view: greedy earliest matching (step k = earliest
    // occurrence ≥ step k-1's time), so chained mins replay it
    // exactly. One shuffle by user regardless of depth.
    q("q_events_funnel",
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events
        |), s1 AS (
        |  SELECT user_id, min(sec) AS t FROM e WHERE event_type = 'view'
        |  GROUP BY user_id
        |), s2 AS (
        |  SELECT e.user_id, min(e.sec) AS t, min(s1.t) AS t1
        |  FROM e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.sec >= s1.t
        |    AND e.sec <= s1.t + 604800
        |  GROUP BY e.user_id
        |), s3 AS (
        |  SELECT e.user_id FROM e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.sec >= s2.t
        |    AND e.sec <= s2.t1 + 604800
        |  GROUP BY e.user_id
        |)
        |SELECT 1 AS step, 'view' AS step_name,
        |  (SELECT count(*) FROM s1) AS n_users
        |UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
        |UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)
        |ORDER BY step""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val e = ev.select(col("user_id"), Ts.seconds(ev).as("sec"),
        col("event_type"))
      graft.events.Events.funnelCounts(e, "user_id", "sec", "event_type",
        Seq("view", "click", "purchase"), windowSec = 604800L)
        .orderBy("step")
    },

    // per-step funnel timing: gap distribution between consecutive
    // greedy-matched steps — the SQL replays the exact chained-min
    // rule of q_events_funnel and keeps each user's matched times, so
    // gap = t_k - t_{k-1}; mean is exact sum/count division on both
    // engines.
    q("q_events_funnel_timing",
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events
        |), s1 AS (
        |  SELECT user_id, min(sec) AS t1 FROM e WHERE event_type = 'view'
        |  GROUP BY user_id
        |), s2 AS (
        |  SELECT e.user_id, min(e.sec) AS t2, min(s1.t1) AS t1
        |  FROM e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.sec >= s1.t1
        |    AND e.sec <= s1.t1 + 604800
        |  GROUP BY e.user_id
        |), s3 AS (
        |  SELECT e.user_id, min(e.sec) AS t3, min(s2.t2) AS t2
        |  FROM e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.sec >= s2.t2
        |    AND e.sec <= s2.t1 + 604800
        |  GROUP BY e.user_id
        |), g AS (
        |  SELECT 2 AS step, t2 - t1 AS gap FROM s2
        |  UNION ALL SELECT 3, t3 - t2 FROM s3
        |), steps AS (
        |  SELECT 2 AS step, 'click' AS step_name
        |  UNION ALL SELECT 3, 'purchase'
        |)
        |SELECT steps.step, steps.step_name, count(g.gap) AS n_users,
        |  min(g.gap) AS min_gap, max(g.gap) AS max_gap,
        |  CAST(sum(g.gap) AS BIGINT) / count(g.gap) AS mean_gap
        |FROM steps LEFT JOIN g ON steps.step = g.step
        |GROUP BY steps.step, steps.step_name
        |ORDER BY steps.step""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val e = ev.select(col("user_id"), Ts.seconds(ev).as("sec"),
        col("event_type"))
      graft.events.Events.funnelStepStats(e, "user_id", "sec",
        "event_type", Seq("view", "click", "purchase"),
        windowSec = 604800L)
    },

    // conversion latency: first 'view' → first 'purchase' at-or-after
    // it, per user. Join-form (no ordered window), so same-second
    // ties need no cross-engine order contract.
    q("q_events_latency",
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events
        |), ff AS (
        |  SELECT user_id, min(sec) AS f FROM e WHERE event_type = 'view'
        |  GROUP BY user_id
        |)
        |SELECT e.user_id, min(e.sec) - min(ff.f) AS latency_sec
        |FROM e JOIN ff ON e.user_id = ff.user_id
        |WHERE e.event_type = 'purchase' AND e.sec >= ff.f
        |GROUP BY e.user_id
        |ORDER BY e.user_id""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val e = ev.select(col("user_id"), Ts.seconds(ev).as("sec"),
        col("event_type"))
      graft.events.Events.conversionLatency(e, "user_id", "sec",
          "event_type", from = "view", to = "purchase")
        .orderBy("user_id")
    },

    // event-transition counts (path analysis): consecutive (from→to)
    // event-type pairs per user, one window pass, tie-broken by
    // event_id so both engines see identical sequences.
    q("q_events_transitions",
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events
        |), seq AS (
        |  SELECT event_type AS to_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY sec, event_id)
        |      AS from_type
        |  FROM e
        |)
        |SELECT from_type, to_type, count(*) AS n FROM seq
        |WHERE from_type IS NOT NULL
        |GROUP BY from_type, to_type ORDER BY from_type, to_type""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val e = ev.select(col("user_id"), col("event_id"),
        Ts.seconds(ev).as("sec"), col("event_type"))
      graft.events.Events.transitionCounts(e, "user_id", "sec",
        "event_type", "event_id")
        .orderBy("from_type", "to_type")
    },

    // weekly cohort retention: cohort = week of first signup, a user
    // lands in (cohort, p) when they click/purchase p weeks later.
    q("q_events_retention",
      """WITH e AS (
        |  SELECT user_id,
        |    CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 604800) AS BIGINT) AS w,
        |    event_type
        |  FROM events
        |), a AS (
        |  SELECT user_id, min(w) AS cohort FROM e WHERE event_type = 'signup'
        |  GROUP BY user_id
        |), r AS (
        |  SELECT DISTINCT a.cohort, e.w - a.cohort AS period, e.user_id
        |  FROM e JOIN a ON e.user_id = a.user_id
        |  WHERE e.event_type IN ('click', 'purchase') AND e.w >= a.cohort
        |)
        |SELECT cohort, period, count(*) AS n_users FROM r
        |GROUP BY cohort, period ORDER BY cohort, period""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val e = ev.select(col("user_id"), Ts.seconds(ev).as("sec"),
        col("event_type"))
      graft.events.Events.retention(e, "user_id", "sec", "event_type",
        "signup", Seq("click", "purchase"), 604800L)
        .orderBy("cohort", "period")
    },

    // last-touch attribution: each purchase attributed to the user's
    // most recent click/view within a 1-hour lookback (ASOF >=
    // semantics at equal seconds; canonical touch per second = max
    // event_id, so both engines resolve ties identically).
    q("q_events_attribution",
      """WITH e AS (
        |  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |    event_type
        |  FROM events
        |), conv AS (
        |  SELECT user_id, event_id AS conv_id, sec AS conv_sec
        |  FROM e WHERE event_type = 'purchase'
        |), tch AS (
        |  SELECT user_id, sec AS touch_sec, max(event_id) AS touch_id,
        |    arg_max(event_type, event_id) AS touch_type
        |  FROM e WHERE event_type IN ('click', 'view') GROUP BY 1, 2
        |), best AS (
        |  SELECT c.user_id, c.conv_id, c.conv_sec,
        |    t.touch_id, t.touch_type, t.touch_sec,
        |    row_number() OVER (PARTITION BY c.user_id, c.conv_id
        |      ORDER BY t.touch_sec DESC) AS rn
        |  FROM conv c JOIN tch t
        |    ON c.user_id = t.user_id AND t.touch_sec <= c.conv_sec
        |)
        |SELECT c.user_id, c.conv_id, c.conv_sec,
        |  CASE WHEN b.touch_sec IS NOT NULL AND c.conv_sec - b.touch_sec <= 3600
        |    THEN b.touch_id END AS touch_id,
        |  CASE WHEN b.touch_sec IS NOT NULL AND c.conv_sec - b.touch_sec <= 3600
        |    THEN b.touch_type END AS touch_type,
        |  CASE WHEN b.touch_sec IS NOT NULL AND c.conv_sec - b.touch_sec <= 3600
        |    THEN b.touch_sec END AS touch_sec,
        |  COALESCE(b.touch_sec IS NOT NULL AND c.conv_sec - b.touch_sec <= 3600,
        |    false) AS attributed
        |FROM conv c LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
        |  ON c.user_id = b.user_id AND c.conv_id = b.conv_id
        |ORDER BY c.user_id, c.conv_id""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val e = ev.select(col("event_id"), col("user_id"),
        Ts.seconds(ev).as("sec"), col("event_type"))
      graft.events.Events.lastTouchAttribution(e, "user_id", "sec",
        "event_id", "event_type", "purchase", Seq("click", "view"),
        lookbackSec = 3600L)
        .orderBy("user_id", "conv_id")
    },

    // Bradley–Terry preference ratings over event-type "comparisons"
    // (each transition a→b counts as b beating a — the engagement-
    // progression reading): the distributed MM iterations vs the
    // generated 10-iteration unrolled oracle. The comparison counts
    // reuse the q_events_markov transition machinery.
    q("q_events_bradley_terry", EventQueries.bradleyTerryOracleSql) {
      (s, dir) =>
        val raw = t(s, dir, "events")
        val counts = graft.events.Events.transitionCounts(
            raw.withColumn("sec", Ts.seconds(raw)),
            "user_id", "sec", "event_type", "event_id")
          .filter(col("from_type") =!= col("to_type"))
        graft.ml.Preference.bradleyTerry(
            counts.select(col("to_type").as("winner"),
              col("from_type").as("loser"), col("n")),
            "winner", "loser", iters = 10, countCol = Some("n"))
          .select(col("item").as("event_type"), col("wins"),
            col("matches"), round(col("rating"), 6).as("rating"))
          .orderBy("event_type")
    },

    // CDC latest-wins snapshot: each user's earliest event is the
    // base profile, every later event an upsert (delete when
    // event_type = 'error'); applyCdc folds the log in one keyed
    // window.
    q("q_events_cdc_apply",
      """WITH e AS (
        |  SELECT user_id, event_type, value,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id
        |  FROM events
        |), rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY sec, event_id) AS rn
        |  FROM e
        |), base AS (
        |  SELECT user_id, event_type, value FROM rk WHERE rn = 1
        |), chg AS (
        |  SELECT user_id, event_type, value, sec, event_id,
        |    CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op
        |  FROM rk WHERE rn > 1
        |), unioned AS (
        |  SELECT user_id, event_type, value,
        |    -9223372036854775807 - 1 AS sec, NULL::BIGINT AS event_id,
        |    'u' AS op
        |  FROM base
        |  UNION ALL
        |  SELECT user_id, event_type, value, sec, event_id, op FROM chg
        |), last_ AS (
        |  SELECT * FROM unioned QUALIFY row_number() OVER (
        |    PARTITION BY user_id
        |    ORDER BY sec DESC, event_id DESC NULLS LAST) = 1
        |)
        |SELECT user_id, event_type, round(value, 6) AS value
        |FROM last_ WHERE op <> 'd' ORDER BY user_id""".stripMargin) {
      (s, dir) =>
        val raw = t(s, dir, "events")
        val e = raw.select(col("user_id"), col("event_type"),
          col("value"), Ts.seconds(raw).as("sec"), col("event_id"))
        val w = Window.partitionBy("user_id").orderBy("sec", "event_id")
        val ranked = e.withColumn("rn", row_number().over(w))
        val base = ranked.filter(col("rn") === 1)
          .select("user_id", "event_type", "value")
        val changes = ranked.filter(col("rn") > 1)
          .withColumn("op",
            when(col("event_type") === "error", "d").otherwise("u"))
          .select("user_id", "event_type", "value", "sec", "event_id", "op")
        graft.sources.Scd2.applyCdc(base, changes, Seq("user_id"),
            "sec", "op", tieCols = Seq("event_id"))
          .select(col("user_id"), col("event_type"),
            round(col("value"), 6).as("value"))
          .orderBy("user_id")
    },

    // temporal split with a 1-day embargo before the cutoff: embargo
    // rows dropped, boundary arithmetic validated by per-split
    // count/min/max.
    q("q_events_time_split",
      """WITH e AS (
        |  SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events
        |), s AS (
        |  SELECT event_id, sec,
        |    CASE WHEN sec >= 1706000000 THEN 'test' ELSE 'train' END AS split
        |  FROM e
        |  WHERE sec < 1706000000 - 86400 OR sec >= 1706000000
        |)
        |SELECT split, count(*) AS n, min(sec) AS min_sec,
        |  max(sec) AS max_sec
        |FROM s GROUP BY split ORDER BY split""".stripMargin) { (s, dir) =>
      val raw = t(s, dir, "events")
      graft.ml.Corpus.timeSplit(
          raw.select(col("event_id"), Ts.seconds(raw).as("sec")),
          "sec", cutoffSec = 1706000000L, embargoSec = 86400L)
        .groupBy("split")
        .agg(count(lit(1)).as("n"), min("sec").as("min_sec"),
          max("sec").as("max_sec"))
        .orderBy("split")
    },

    // HITS hubs/authorities on the distinct event-type transition
    // edges — vs the generated 10-iteration unrolled oracle.
    q("q_events_hits", EventQueries.hitsOracleSql) { (s, dir) =>
      import s.implicits._
      val raw = t(s, dir, "events")
      val counts = graft.events.Events.transitionCounts(
        raw.withColumn("sec", Ts.seconds(raw)),
        "user_id", "sec", "event_type", "event_id")
      // tiny node-id mapping (≤ |event types| rows, driver-bounded)
      val types = counts.select(col("from_type").as("t"))
        .union(counts.select(col("to_type")))
        .distinct().as[String].collect().sorted
      val mapping = types.zipWithIndex
        .map { case (n, i) => (n, i.toLong) }.toSeq.toDF("name", "id")
      val edges = counts
        .join(mapping.select(col("name").as("from_type"), col("id").as("src")), "from_type")
        .join(mapping.select(col("name").as("to_type"), col("id").as("dst")), "to_type")
        .select("src", "dst")
      graft.graph.Graphs.hits(edges, iters = 10)
        .join(mapping.select(col("id").as("node"), col("name")), "node")
        .select(col("name").as("event_type"),
          round(col("authority"), 6).as("authority"),
          round(col("hub"), 6).as("hub"))
        .orderBy("event_type")
    },

    // 3-truss of the count-sparsified undirected transition graph —
    // vs the generated 4-round unrolled peel oracle. The alphabetical
    // node-id mapping is order-preserving, so engine least/greatest
    // on ids equals the oracle's least/greatest on names.
    q("q_events_ktruss", EventQueries.kTrussOracleSql) { (s, dir) =>
      import s.implicits._
      val raw = t(s, dir, "events")
      val und = graft.events.Events.transitionCounts(
          raw.withColumn("sec", Ts.seconds(raw)),
          "user_id", "sec", "event_type", "event_id")
        .filter(col("from_type") =!= col("to_type"))
        .select(least(col("from_type"), col("to_type")).as("a"),
          greatest(col("from_type"), col("to_type")).as("b"), col("n"))
        .groupBy("a", "b").agg(sum("n").as("n"))
        .filter(col("n") >= 770)
      val types = und.select(col("a").as("t"))
        .union(und.select(col("b")))
        .distinct().as[String].collect().sorted
      val mapping = types.zipWithIndex
        .map { case (nm, i) => (nm, i.toLong) }.toSeq.toDF("name", "id")
      val edges = und
        .join(mapping.select(col("name").as("a"), col("id").as("src")), "a")
        .join(mapping.select(col("name").as("b"), col("id").as("dst")), "b")
        .select("src", "dst")
      graft.graph.Graphs.kTruss(edges, k = 3)
        .join(mapping.select(col("id").as("u"), col("name").as("src")), "u")
        .join(mapping.select(col("id").as("v"), col("name").as("dst")), "v")
        .select(col("src"), col("dst"), col("support"))
        .orderBy("src", "dst")
    }
  )
}
