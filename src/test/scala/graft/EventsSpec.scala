package graft

import org.apache.spark.sql.functions._
import graft.events.Events

/** Funnel / retention semantics on constructed sequences. */
class EventsSpec extends SparkSpec {

  private def ev(rows: (Long, Long, String)*) = {
    import spark.implicits._
    rows.toDF("u", "sec", "tp")
  }

  test("funnel matches greedily in order, honors the window, ties at same second") {
    val steps = Seq("A", "B", "C")
    val events = ev(
      // user 1: clean A→B→C
      (1L, 100L, "A"), (1L, 200L, "B"), (1L, 300L, "C"),
      // user 2: B only BEFORE A — order matters, depth 1
      (2L, 100L, "B"), (2L, 200L, "A"),
      // user 3: C falls outside the window anchored at A — depth 2
      (3L, 100L, "A"), (3L, 150L, "B"), (3L, 9999L, "C"),
      // user 4: never does A — absent from the funnel
      (4L, 100L, "B"), (4L, 200L, "C"),
      // user 5: B at the SAME second as A matches (>= semantics)
      (5L, 100L, "A"), (5L, 100L, "B"))
    val depths = Events.funnel(events, "u", "sec", "tp", steps,
      windowSec = 1000L).collect().toMap
    assert(depths == Map(1L -> 3, 2L -> 1, 3L -> 2, 5L -> 2), s"got $depths")
    val counts = Events.funnelCounts(events, "u", "sec", "tp", steps,
      windowSec = 1000L).orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    // 4 users start; 3 reach B; only user 1 finishes
    assert(counts == Seq((1, "A", 4L), (2, "B", 3L), (3, "C", 1L)), s"got $counts")
  }

  test("funnelStepStats reports per-step gap stats under the same greedy rule") {
    val steps = Seq("A", "B", "C")
    val events = ev(
      (1L, 100L, "A"), (1L, 200L, "B"), (1L, 300L, "C"), // gaps 100, 100
      (2L, 100L, "A"), (2L, 400L, "B"),                  // gap 300, no C
      (3L, 100L, "A"),                                   // depth 1: no gaps
      (4L, 100L, "A"), (4L, 150L, "B"), (4L, 9999L, "C")) // C outside window
    val rows = Events.funnelStepStats(events, "u", "sec", "tp", steps,
      windowSec = 1000L).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toSeq
    // step 2 (B): users 1, 2, 4 → gaps 100, 300, 50
    // step 3 (C): user 1 only → gap 100
    assert(rows == Seq((2, "B", 3L, 50L, 300L), (3, "C", 1L, 100L, 100L)),
      s"got $rows")
    val mean2 = Events.funnelStepStats(events, "u", "sec", "tp", steps,
      windowSec = 1000L).filter(col("step") === 2)
      .collect().head.getDouble(5)
    assert(mean2 == 150.0, s"got $mean2")
  }

  test("funnelStepStats emits zero-user rows for unreached steps") {
    val events = ev((1L, 100L, "A"), (1L, 200L, "B"))
    val rows = Events.funnelStepStats(events, "u", "sec", "tp",
      Seq("A", "B", "C")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.isNullAt(3)))
      .toSeq
    assert(rows == Seq((2, "B", 1L, false), (3, "C", 0L, true)), s"got $rows")
  }

  test("funnel greedy picks the earliest first step even when a later one would convert") {
    // documents the greedy contract: anchor = EARLIEST step-1 event;
    // user 6's second A at 5000 would let C convert, but the window
    // anchors at the first A
    val events = ev((6L, 100L, "A"), (6L, 5000L, "A"),
      (6L, 5100L, "B"), (6L, 5200L, "C"))
    val d = Events.funnel(events, "u", "sec", "tp", Seq("A", "B", "C"),
      windowSec = 1000L).collect().toMap
    assert(d == Map(6L -> 1), s"got $d")
  }

  test("transition counts follow per-user order with deterministic tie-breaks") {
    import spark.implicits._
    val events = Seq(
      (1L, 1L, 100L, "A"), (1L, 2L, 200L, "B"), (1L, 3L, 300L, "A"),
      (2L, 4L, 100L, "A"), (2L, 5L, 100L, "B"), // tie → id order A then B
      (3L, 6L, 50L, "C")) // single event: no transition
      .toDF("u", "id", "sec", "tp")
    val counts = Events.transitionCounts(events, "u", "sec", "tp", "id")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(counts == Map(("A", "B") -> 2L, ("B", "A") -> 1L), s"got $counts")
  }

  test("retention cohorts users by first anchor period and counts distinct returners") {
    // period = 100 s; user 1 anchors in period 1, returns periods 1 and 3
    // (duplicate returns in one period count once); user 2 anchors in
    // period 2, returns period 2 (offset 0); user 3 never anchors
    val events = ev(
      (1L, 100L, "signup"), (1L, 150L, "click"), (1L, 160L, "click"),
      (1L, 350L, "click"),
      (2L, 200L, "signup"), (2L, 250L, "purchase"),
      (3L, 100L, "click"))
    val grid = Events.retention(events, "u", "sec", "tp",
      "signup", Seq("click", "purchase"), 100L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(grid == Map((1L, 0L) -> 1L, (1L, 2L) -> 1L, (2L, 0L) -> 1L),
      s"got $grid")
  }

  test("last-touch attribution picks the latest in-window touch, ties by max id") {
    import spark.implicits._
    val e = Seq(
      // (id, user, sec, type)
      (1L, 1L, 100L, "view"),
      (2L, 1L, 150L, "click"),
      (3L, 1L, 200L, "purchase"),  // → click@150
      (4L, 1L, 5000L, "purchase"), // latest touch 150, outside 1000s → null
      (5L, 2L, 300L, "view"),
      (6L, 2L, 300L, "click"),     // same second: max id wins
      (7L, 2L, 300L, "purchase"),  // equal-second touch counts (>= asof)
      (8L, 3L, 400L, "purchase"))  // no touches at all
      .toDF("id", "u", "sec", "tp")
    val got = Events.lastTouchAttribution(e, "u", "sec", "id", "tp",
      "purchase", Seq("view", "click"), lookbackSec = 1000L)
      .collect()
      .map(r => r.getLong(1) -> (Option(r.get(3)), Option(r.get(4)),
        r.getBoolean(6)))
      .toMap
    assert(got(3L) == ((Some(2L), Some("click"), true)))
    assert(got(4L) == ((None, None, false)))
    assert(got(7L) == ((Some(6L), Some("click"), true)))
    assert(got(8L) == ((None, None, false)))
  }

  test("conversionLatency: first from → first to at-or-after, edge cases") {
    import spark.implicits._
    val ev = Seq(
      // u1: view@10, purchase@25 → 15
      (1L, 10L, "view"), (1L, 25L, "purchase"),
      // u2: purchase BEFORE any view, then after → counts the later one
      (2L, 5L, "purchase"), (2L, 10L, "view"), (2L, 30L, "purchase"),
      // u3: same-second conversion → 0
      (3L, 7L, "view"), (3L, 7L, "purchase"),
      // u4: view only → omitted; u5: purchase only → omitted
      (4L, 1L, "view"), (5L, 1L, "purchase"),
      // u6: second view earlier than first? first view = min(sec)
      (6L, 20L, "view"), (6L, 12L, "view"), (6L, 18L, "purchase"))
      .toDF("user_id", "sec", "event_type")
    val got = graft.events.Events.conversionLatency(
        ev, "user_id", "sec", "event_type", "view", "purchase")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 15L, 2L -> 20L, 3L -> 0L, 6L -> 6L))

    // cohort latency distribution via the mergeable quantile sketch —
    // the scale path for "time-to-convert per segment"
    val lat = graft.events.Events.conversionLatency(
        ev, "user_id", "sec", "event_type", "view", "purchase")
      .select(col("latency_sec").cast("double")).as[Double]
    val sk = lat.select(graft.agg.Qsketch.aggregator(32).toColumn).head()
    assert(sk.n == 4L)
    assert(sk.quantile(1.0) == 20.0 && sk.quantile(0.0) == 0.0)
  }

  test("trending: per-window top-k with prev counts and lift") {
    import spark.implicits._
    // window 10s: win0 = a:3 b:2 c:1, win1 = b:4 a:1 d:1
    val ev = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "b"), (6L, "c"),
      (11L, "b"), (12L, "b"), (13L, "b"), (14L, "b"), (15L, "a"), (16L, "d"))
      .toDF("sec", "etype")
    val got = graft.events.Events.trending(ev, "sec", "etype",
        windowSec = 10L, k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          Option(r.get(5)).map(_.asInstanceOf[Double]))).toMap
    assert(got.keySet == Set((0L, "a"), (0L, "b"), (1L, "b"), (1L, "a")))
    assert(got((0L, "a")) == ((3L, 1L, 0L, None)))      // entrant: no lift
    assert(got((0L, "b")) == ((2L, 2L, 0L, None)))
    assert(got((1L, "b")) == ((4L, 1L, 2L, Some(2.0)))) // rising 2 -> 4
    assert(got((1L, "a")) == ((1L, 2L, 3L, Some(1.0 / 3.0))))
    intercept[IllegalArgumentException](
      graft.events.Events.trending(ev, "sec", "etype", 0L, 2))
  }

  test("ewma: seeded left fold per key in event order") {
    import spark.implicits._
    val ev = Seq(
      (1L, 10L, 100L, 4.0), (1L, 20L, 101L, 8.0), (1L, 20L, 102L, 2.0),
      (2L, 5L, 200L, 10.0))
      .toDF("user_id", "sec", "event_id", "value")
    val got = graft.events.Events.ewma(ev, "user_id", "sec", "event_id",
        "value", alpha = 0.5)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    // user 1: seed 4.0; then .5*8+.5*4 = 6.0; tie at sec 20 ordered by
    // id: .5*2+.5*6 = 4.0
    assert(got(100L) == 4.0 && got(101L) == 6.0 && got(102L) == 4.0)
    assert(got(200L) == 10.0)
    intercept[IllegalArgumentException](
      graft.events.Events.ewma(ev, "user_id", "sec", "event_id", "value", 0.0))
  }

  test("abTest: hand-computed z on a planted experiment") {
    import spark.implicits._
    // control: 4 users, 1 converts; treat: 4 users, 3 convert
    val ev = Seq(
      (1L, "ctl", "view"), (1L, "ctl", "purchase"), (2L, "ctl", "view"),
      (3L, "ctl", "view"), (4L, "ctl", "view"),
      (11L, "trt", "purchase"), (12L, "trt", "purchase"),
      (13L, "trt", "purchase"), (14L, "trt", "view"))
      .toDF("user_id", "variant", "event_type")
    val r = graft.events.Events.abTest(ev, "user_id", "variant",
      "event_type", "purchase", controlVariant = "ctl").head()
    assert(r.getAs[String]("variant") == "trt")
    assert(r.getAs[Long]("n_users") == 4L &&
      r.getAs[Long]("n_converted") == 3L)
    assert(math.abs(r.getAs[Double]("lift") - 0.5) < 1e-12)
    val p = 4.0 / 8.0
    val expZ = 0.5 / math.sqrt(p * (1 - p) * (1.0 / 4 + 1.0 / 4))
    assert(math.abs(r.getAs[Double]("z_score") - expZ) < 1e-12)
  }

  test("growthAccounting classifies new/retained/resurrected/churned") {
    import spark.implicits._
    val day = 86400L
    // u1: days 0,1 (retained), gone day 2 (churned at 2)
    // u2: days 0, 2 (resurrected at 2), gone after (churned at 3)
    // u3: day 1 only (new at 1, churned at 2)
    val ev = Seq(
      (1L, 10L), (1L, day + 5L),
      (2L, 20L), (2L, 2 * day + 7L),
      (3L, day + 30L)).toDF("user_id", "sec")
    val got = graft.events.Events.growthAccounting(ev, "user_id", "sec", day)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(0L) == ((2L, 0L, 0L, 0L))) // u1, u2 new
    assert(got(1L) == ((1L, 1L, 0L, 1L))) // u3 new, u1 retained, u2's skip churns here
    assert(got(2L) == ((0L, 0L, 1L, 2L))) // u2 back; u1, u3 churn
    // u2 is active in the final observed period (2): whether it
    // churns in 3 is right-censored — no phantom row past the horizon
    assert(!got.contains(3L))
  }

  test("quantileTreatmentEffects localizes a planted tail-only lift") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    // both arms ~U(0, 10); treatment arm's top decile gets +50
    val users = (0 until 2000).map { u =>
      val base = rnd.nextDouble() * 10
      val v = (u % 2).toString
      val x = if (v == "1" && base > 9.0) base + 50 else base
      (u.toLong, v, x)
    }
    val got = graft.events.Events.quantileTreatmentEffects(
      users.toDF("user_id", "variant", "x"), "variant", "x",
      controlVariant = "0", ps = Seq(0.25, 0.5, 0.9, 0.97))
      .collect().map(r => r.getDouble(1) -> r.getDouble(4)).toMap
    assert(math.abs(got(0.25)) < 1.0 && math.abs(got(0.5)) < 1.0,
      s"body must be flat: $got")
    assert(got(0.97) > 30, s"tail lift must surface at p=0.97: $got")
    intercept[IllegalArgumentException](
      graft.events.Events.quantileTreatmentEffects(
        users.toDF("user_id", "variant", "x"), "variant", "x",
        controlVariant = "nope"))
  }

  test("activeUsers: exact DAU, trailing-window HLL within error bound") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    // 30 days; each day a random subset of 500 users is active
    val rows = for {
      d <- 0 until 30
      u <- 0 until 500
      if rnd.nextDouble() < 0.3
    } yield (u.toLong, d * 86400L + u)
    val ev = rows.toDF("user_id", "sec")
    val got = graft.events.Events.activeUsers(ev, "user_id", "sec",
      windows = Seq(7)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // exact replays
    val byDay = rows.groupBy(_._2 / 86400).map { case (d, rs) =>
      d -> rs.map(_._1).toSet
    }
    for ((d, users) <- byDay) {
      val (dau, w7) = got(d)
      assert(dau == users.size, s"day $d DAU")
      val exact7 = (math.max(0, d - 6) to d)
        .flatMap(dd => byDay.getOrElse(dd, Set.empty)).toSet.size
      assert(math.abs(w7 - exact7) <= math.max(3.0, 0.05 * exact7),
        s"day $d: hll $w7 vs exact $exact7")
    }
  }

  test("winsorizedMeans tames a planted whale without moving the base rates") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // two arms with identical ~N(10,1) spend, plus ONE whale in arm 1
    val users = (0 until 400).map { u =>
      (u.toLong, (u % 2).toString, 10.0 + rnd.nextGaussian())
    } :+ ((1000L, "1", 100000.0))
    val perUser = users.toDF("user_id", "variant", "x")
    val got = graft.events.Events
      .winsorizedMeans(perUser, "variant", "x", pLo = 0.01, pHi = 0.99)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getLong(7))).toMap
    val (raw0, wins0, _) = got("0")
    val (raw1, wins1, clamped1) = got("1")
    assert(raw1 - raw0 > 100, "the whale dominates the raw diff")
    assert(math.abs(wins1 - wins0) < 1.0,
      s"winsorized means must be comparable: $wins0 vs $wins1")
    assert(clamped1 >= 1, "the whale must be clamped")
    assert(math.abs(wins0 - raw0) < 0.5, "clean arm barely moves")
    // deterministic: same input, same cutoffs and means
    val again = graft.events.Events
      .winsorizedMeans(perUser, "variant", "x", pLo = 0.01, pHi = 0.99)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(again("0") == wins0 && again("1") == wins1)
  }

  test("cusum: hand-computed change-point statistics and alarm") {
    import spark.implicits._
    // mu0=10, k=1: values sit at 10 then jump to 14 — s_pos ramps by 3
    // per step after the shift and crosses h=5 on the second shifted
    // point; a later dip to 2 ramps s_neg by 7
    val ev = Seq(
      (1L, 10L, 1L, 10.0), (1L, 20L, 2L, 10.0), (1L, 30L, 3L, 14.0),
      (1L, 40L, 4L, 14.0), (1L, 50L, 5L, 14.0), (1L, 60L, 6L, 2.0))
      .toDF("user_id", "sec", "event_id", "value")
    val got = graft.events.Events.cusum(ev, "user_id", "sec", "event_id",
        "value", mu0 = 10.0, slack = 1.0, h = 5.0)
      .collect().map(r => r.getLong(2) ->
        (r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toMap
    assert(got(1L) == ((0.0, 0.0, false)))
    assert(got(2L) == ((0.0, 0.0, false)))
    assert(got(3L) == ((3.0, 0.0, false))) // 14-10-1 = +3
    assert(got(4L) == ((6.0, 0.0, true))) // crosses h=5
    assert(got(5L) == ((9.0, 0.0, true)))
    assert(got(6L) == ((0.0, 7.0, true))) // s_pos resets (9+2-11=0), s_neg = 10-1-2
  }

  test("powerAnalysis: hand-computed MDE and required n") {
    import spark.implicits._
    // ctl: 4 users, 1 converts; trt: 4 users, 3 convert (same planted
    // experiment as the abTest fixture → pbar = 0.5, lift = 0.5)
    val ev = Seq(
      (1L, "ctl", "purchase"), (2L, "ctl", "view"),
      (3L, "ctl", "view"), (4L, "ctl", "view"),
      (11L, "trt", "purchase"), (12L, "trt", "purchase"),
      (13L, "trt", "purchase"), (14L, "trt", "view"))
      .toDF("user_id", "variant", "event_type")
    val r = graft.events.Events.powerAnalysis(ev, "user_id", "variant",
      "event_type", "purchase", controlVariant = "ctl").head()
    val zSum = 1.9599639845400545 + 0.8416212335729143
    val expMde = zSum * math.sqrt(0.5 * 0.5 * (0.25 + 0.25))
    assert(math.abs(r.getAs[Double]("mde_abs") - expMde) < 1e-12)
    val expN = math.ceil(zSum * zSum * 2.0 * 0.25 / 0.25).toLong
    assert(r.getAs[Long]("n_required") == expN) // = ceil(2·zSum²) = 16
    assert(math.abs(r.getAs[Double]("lift") - 0.5) < 1e-12)
    // zero observed lift → no finite required n
    val flat = ev.withColumn("event_type",
      when(col("user_id").isin(1L, 11L), "purchase").otherwise("view"))
    val r2 = graft.events.Events.powerAnalysis(flat, "user_id", "variant",
      "event_type", "purchase", controlVariant = "ctl").head()
    assert(r2.isNullAt(r2.fieldIndex("n_required")))
  }

  test("sequentialTest: hand-computed mSPRT on a two-period experiment") {
    import spark.implicits._
    // period 0: ctl 2 users (0 conv), trt 2 users (1 conv)
    // period 1: ctl +1 user (1 conv), trt +1 user (1 conv)
    val day = 86400L
    val evs = Seq(
      (1L, "0", 10L, "view"), (2L, "0", 20L, "view"),
      (11L, "t", 30L, "view"), (12L, "t", 40L, "purchase"),
      (3L, "0", day + 10L, "purchase"),
      (13L, "t", day + 20L, "purchase"))
      .toDF("user_id", "variant", "sec", "event_type")
    val tau2 = 0.0001
    val got = graft.events.Events.sequentialTest(evs, "user_id", "variant",
        "sec", "event_type", "purchase", "0", day, tau2)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getDouble(7), r.getDouble(8))).toMap
    // period 0: n_t=2 c_t=1, n_c=2 c_c=0
    val (n0t, c0t, n0c, c0c, th0, ll0, p0) = got(0L)
    assert((n0t, c0t, n0c, c0c) == ((2L, 1L, 2L, 0L)))
    assert(math.abs(th0 - 0.5) < 1e-12)
    val v0 = 0.25 * (1.0 - 0.25) * (0.5 + 0.5)
    val expLl0 = 0.5 * math.log(v0 / (v0 + tau2)) +
      0.25 * tau2 / (2 * v0 * (v0 + tau2))
    assert(math.abs(ll0 - expLl0) < 1e-9, s"$ll0 vs $expLl0")
    assert(math.abs(p0 - math.min(1.0, math.exp(-expLl0))) < 1e-9)
    // period 1: cumulative n_t=3 c_t=2, n_c=3 c_c=1; p is running min
    val (n1t, c1t, n1c, c1c, th1, _, p1) = got(1L)
    assert((n1t, c1t, n1c, c1c) == ((3L, 2L, 3L, 1L)))
    assert(math.abs(th1 - (2.0 / 3 - 1.0 / 3)) < 1e-12)
    assert(p1 <= p0 + 1e-15, "always-valid p must be non-increasing")
  }

  test("bootstrapCI equals a full driver replay of the hash-Poisson draw") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val users = (0 until 120).map { u =>
      (u.toLong, (u % 2).toString, if (rnd.nextDouble() < 0.3 + 0.2 * (u % 2)) 1.0 else 0.0)
    }
    val perUser = users.toDF("user_id", "variant", "x")
    val nReps = 60
    val got = graft.events.Events
      .bootstrapCI(perUser, "user_id", "variant", "x", nReps, 0.05, seed = 7L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap

    // driver replay with java's own md5 against the shared thresholds
    val md = java.security.MessageDigest.getInstance("MD5")
    def weight(u: Long, r: Int): Int = {
      val hex = md.digest(s"7:$u:$r".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 8)
      val ts = graft.events.Events.poissonHexThresholds
      val i = ts.indexWhere(hex < _)
      if (i < 0) ts.length else i
    }
    val loRank = math.max(1, math.ceil(0.025 * nReps).toInt)
    for (v <- Seq("0", "1")) {
      val vs = users.filter(_._2 == v)
      val ests = (0 until nReps).map { r =>
        val ws = vs.map { case (u, _, x) => (weight(u, r), x) }
        (ws.map { case (w, x) => w * x }.sum / ws.map(_._1).sum, r)
      }.sortBy(identity)
      val lo = ests(loRank - 1)._1
      val hi = ests(nReps - loRank)._1
      val (n, mean, gLo, gHi) = got(v)
      assert(n == vs.size)
      assert(math.abs(mean - vs.map(_._3).sum / vs.size) < 1e-12)
      assert(math.abs(gLo - lo) < 1e-12, s"variant $v lo: $gLo vs $lo")
      assert(math.abs(gHi - hi) < 1e-12, s"variant $v hi: $gHi vs $hi")
      assert(gLo <= mean && mean <= gHi, "planted rates are well inside the CI")
    }
  }

  test("cuped: adjusted variance shrinks when pre-period correlates") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // users with a persistent activity level: pre and post both track
    // it, so the covariate explains most between-user variance
    val ev = (0 until 200).flatMap { u =>
      val base = 5.0 + rnd.nextDouble() * 20
      val variant = (u % 2).toString
      Seq((u.toLong, variant, 10L, base + rnd.nextDouble()),
        (u.toLong, variant, 20L, base + rnd.nextDouble()),
        (u.toLong, variant, 110L, base + rnd.nextDouble()),
        (u.toLong, variant, 120L, base + rnd.nextDouble()))
    }.toDF("user_id", "variant", "sec", "value")
    val r = graft.events.Events.cuped(ev, "user_id", "variant",
      "sec", "value", splitSec = 100L)
      .collect().map(row => row.getAs[String]("variant") ->
        (row.getAs[Double]("var_raw"), row.getAs[Double]("var_adj"),
          row.getAs[Double]("mean_raw"), row.getAs[Double]("mean_adj")))
      .toMap
    r.values.foreach { case (vr, va, _, _) =>
      assert(va < vr * 0.2, s"CUPED should slash variance: $va vs $vr")
    }
    // adjustment is mean-preserving ACROSS the pooled population
    // (per-variant means shift by theta*(mean_x_variant - mx), but the
    // equal-n pooled average is exactly unchanged)
    val pooledRaw = r.values.map(_._3).sum / r.size
    val pooledAdj = r.values.map(_._4).sum / r.size
    assert(math.abs(pooledRaw - pooledAdj) < 1e-9,
      s"$pooledRaw vs $pooledAdj")
  }

  test("kaplanMeier: hand-computed curve with censoring") {
    import spark.implicits._
    // period 10; horizon = 100; censorGap 15 -> users with last >= 85
    // are censored. One cohort (all first at 0-9).
    // u1: 0..100 censored (t=10); u2: 0..50 churn t=5; u3: 5..55 churn
    // t=5; u4: 0..20 churn t=2; u5: 2..92 censored (t=9)
    val ev = Seq(
      (1L, 0L), (1L, 100L), (2L, 0L), (2L, 50L), (3L, 5L), (3L, 55L),
      (4L, 0L), (4L, 20L), (5L, 2L), (5L, 92L))
      .toDF("user_id", "sec")
    val got = graft.events.Events.kaplanMeier(ev, "user_id", "sec",
        periodSec = 10L, censorGap = 15L)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // durations: u1 t=10 cens, u2 t=5 churn, u3 t=5 churn, u4 t=2
    // churn, u5 t=9 cens. at-risk(2)=5 d=1 -> S=0.8; at-risk(5)=4 d=2
    // -> S=0.8*0.5=0.4; t=9 cens d=0 -> S=0.4; t=10 d=0 -> S=0.4
    assert(got(2L) == ((5L, 1L, 0.8)))
    assert(got(5L)._1 == 4L && got(5L)._2 == 2L)
    assert(math.abs(got(5L)._3 - 0.4) < 1e-12)
    assert(got(9L) == ((2L, 0L, got(9L)._3)) &&
      math.abs(got(9L)._3 - 0.4) < 1e-12)
    assert(math.abs(got(10L)._3 - 0.4) < 1e-12)
    // survival is non-increasing in t
    val curve = got.toSeq.sortBy(_._1).map(_._2._3)
    curve.sliding(2).foreach(p =>
      if (p.length == 2) assert(p(0) >= p(1) - 1e-12))
    intercept[IllegalArgumentException](
      graft.events.Events.kaplanMeier(ev, "user_id", "sec", 0L, 5L))
  }

  test("diffInDiff: hand-computed estimate on planted trends") {
    import spark.implicits._
    // control drifts +1 pre->post; treatment drifts +3 -> DiD = +2
    val ev = Seq(
      (1L, "c", 10L, 5.0), (1L, "c", 110L, 6.0),
      (2L, "c", 10L, 7.0), (2L, "c", 110L, 8.0),
      (11L, "t", 10L, 4.0), (11L, "t", 110L, 7.0),
      (12L, "t", 10L, 6.0), (12L, "t", 110L, 9.0))
      .toDF("user_id", "variant", "sec", "value")
    val r = graft.events.Events.diffInDiff(ev, "user_id", "variant",
      "sec", "value", splitSec = 100L, controlVariant = "c").head()
    assert(r.getAs[String]("variant") == "t")
    assert(math.abs(r.getAs[Double]("did") - 2.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("pre_mean") - 5.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("c_post") - 7.0) < 1e-12)
  }

  test("concurrency: sweep-line active counts, exclusive ends, returns to 0") {
    import spark.implicits._
    // [0,10), [2,5), [5,7): at 2 -> 2 active; 5 ends one and starts
    // one (net 0); everything closed by 10
    val iv = Seq((0L, 10L), (2L, 5L), (5L, 7L)).toDF("s", "e")
    val got = graft.events.Events.concurrency(iv, "s", "e")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got(0L) == ((1L, 1L)))
    assert(got(2L) == ((1L, 2L)))
    assert(got(5L) == ((0L, 2L)), "exclusive end + new start net to 0")
    assert(got(7L) == ((-1L, 1L)))
    assert(got(10L) == ((-1L, 0L)), "sweep must return to zero")
    assert(got.size == 5)
  }

  test("timeWeightedAverage: gap weights, last obs unweighted, NULL cases") {
    import spark.implicits._
    // user 1: v=10 held 2s, v=20 held 8s, v=99 unweighted
    // TWA = (10*2 + 20*8)/10 = 18
    val ev = Seq(
      (1L, 0L, 1L, 10.0), (1L, 2L, 2L, 20.0), (1L, 10L, 3L, 99.0),
      (2L, 5L, 4L, 7.0),                       // single obs -> NULL
      (3L, 1L, 5L, 1.0), (3L, 1L, 6L, 3.0)     // zero span -> NULL
    ).toDF("user_id", "sec", "event_id", "value")
    val got = graft.events.Events.timeWeightedAverage(ev, "user_id",
        "sec", "event_id", "value")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(1) == 3L && got(1L).getLong(2) == 10L)
    assert(math.abs(got(1L).getDouble(3) - 18.0) < 1e-12)
    assert(got(2L).isNullAt(3) && got(2L).getLong(2) == 0L)
    assert(got(3L).isNullAt(3), "zero-duration weights must not divide")
  }

  test("rfm: quintile scores, recency inverted, exact cut arithmetic") {
    import spark.implicits._
    // 5 users with strictly increasing f/m and decreasing recency;
    // quintile cuts at p in {.2,.4,.6,.8} over 5 values interpolate
    // between sorted neighbors, and score = 1 + #cuts at-or-below
    val ev = (1 to 5).flatMap { u =>
      (1 to u).map(k => (u.toLong, (u * 100 + k).toLong, u * 10.0))
    }.toDF("user_id", "sec", "value")
    val got = graft.events.Events.rfm(ev, "user_id", "sec", "value")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4), r.getInt(5), r.getInt(6)))).toMap
    // as_of = 505 (user 5's last); user 5: recency 0, f=5, m=250
    val (r5, f5, m5, rs5, fs5, ms5) = got(5L)
    assert(r5 == 0L && f5 == 5L && m5 == 250.0)
    assert(rs5 == 5 && fs5 == 5 && ms5 == 5)
    // user 1: recency 505-101=404 (max), f=1, m=10 -> all worst
    val (r1, f1, m1, rs1, fs1, ms1) = got(1L)
    assert(r1 == 404L && f1 == 1L && m1 == 10.0)
    assert(rs1 == 1 && fs1 == 1 && ms1 == 1)
    // monotone: higher user index never scores lower on f/m,
    // never lower on recency score either (more recent activity)
    val byU = (1 to 5).map(u => got(u.toLong))
    assert(byU.map(_._5).sorted == byU.map(_._5))
    assert(byU.map(_._6).sorted == byU.map(_._6))
    assert(byU.map(_._4).sorted == byU.map(_._4))
    // every score is in 1..5
    byU.foreach { t =>
      assert(t._4 >= 1 && t._4 <= 5 && t._5 >= 1 && t._5 <= 5 &&
        t._6 >= 1 && t._6 <= 5)
    }
  }

  test("wilsonInterval: textbook values, bounds in [0,1], degenerate ends") {
    import spark.implicits._
    val df = (Seq.fill(8)(("a", true)) ++ Seq.fill(2)(("a", false)) ++
      Seq.fill(5)(("z", false)) ++ Seq.fill(3)(("all1", true)))
      .toDF("g", "ok")
    val got = Events.wilsonInterval(df, "g", "ok")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    // 8/10 at z=1.96: Wilson interval ≈ [0.490, 0.943]
    val (n, s, rate, lo, hi) = got("a")
    assert(n == 10L && s == 8L && rate == 0.8)
    assert(math.abs(lo - 0.4901) < 5e-4 && math.abs(hi - 0.9433) < 5e-4)
    // s=0 and s=n stay inside [0,1] with nonzero width (Wald would not)
    val (_, _, _, lo0, hi0) = got("z")
    assert(lo0 == 0.0 && hi0 > 0.0 && hi0 < 1.0)
    val (_, _, _, lo1, hi1) = got("all1")
    assert(hi1 == 1.0 && lo1 < 1.0 && lo1 > 0.0)
  }

  test("seasonalDecompose recovers a planted pure seasonal pattern") {
    import spark.implicits._
    // 8 full days of hourly events, count = 10 + phase pattern:
    // +5 at phase 0, -5 at phase 12, flat elsewhere. No trend.
    val phasePat = (p: Long) => if (p == 0L) 5 else if (p == 12L) -5 else 0
    val rows = for {
      bucket <- 0L until (8 * 24).toLong
      n = 10 + phasePat(bucket % 24)
      i <- 0 until n
    } yield (bucket * 3600 + i, 1)
    val df = rows.toDF("sec", "one")
    val out = Events.seasonalDecompose(df, "sec", 3600L, 24)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(out.size == 8 * 24)
    // interior buckets: trend ≈ overall mean 10, seasonal carries the
    // pattern, residual ≈ 0 (edges are partial-window, skip them)
    val interior = out.filter { case (b, _) => b >= 24 && b < 7 * 24 }
    interior.foreach { case (b, (phase, y, trend, seasonal, resid)) =>
      assert(phase == b % 24)
      assert(y == 10 + phasePat(phase), s"bucket $b")
      assert(math.abs(trend - 10.0) < 0.25, s"bucket $b trend $trend")
      assert(math.abs(seasonal - phasePat(phase)) < 0.5,
        s"bucket $b seasonal $seasonal")
      assert(math.abs(resid) < 0.6, s"bucket $b residual $resid")
    }
    // seasonal indices (one per phase) sum to ~0 by centering
    val idx = interior.values.groupBy(_._1).map(_._2.head._4)
    assert(math.abs(idx.sum) < 1e-6)
    intercept[IllegalArgumentException](
      Events.seasonalDecompose(df, "sec", 0L, 24))
    intercept[IllegalArgumentException](
      Events.seasonalDecompose(df, "sec", 3600L, 1))
  }
}
