package graft

import org.apache.spark.sql.functions._
import graft.ml.{Eval, TextAnalysis}
import graft.events.Events

/** Hand-computed fixtures for the round-9 statistics batch: McNemar,
  * Kruskal–Wallis, Brown–Forsythe, risk–coverage,
  * log-rank, Page–Hinkley, CMH, and TextTiling-lite.
  */
class StatsSpec extends SparkSpec {

  test("mcnemarTest: continuity-corrected chi2 off the discordant cells") {
    import spark.implicits._
    // n01 = 2 (A right, B wrong), n10 = 1 → (|2-1|-1)²/3 = 0
    val d = Seq((true, true), (true, false), (true, false),
      (false, true), (false, false)).toDF("a", "b")
    val r = Eval.mcnemarTest(d, "a", "b").collect().head
    assert(r.getLong(0) === 5L && r.getLong(1) === 2L && r.getLong(2) === 1L)
    assert(r.getDouble(3) === 0.0)
    // n01 = 5, n10 = 1 → (|5-1|-1)²/6 = 1.5
    val d2 = ((1 to 5).map(_ => (true, false)) :+ ((false, true)))
      .toDF("a", "b")
    assert(Eval.mcnemarTest(d2, "a", "b").collect().head.getDouble(3) === 1.5)
    // no discordant pairs → NULL, not 0
    val d3 = Seq((true, true), (false, false)).toDF("a", "b")
    assert(Eval.mcnemarTest(d3, "a", "b").collect().head.isNullAt(3))
  }

  test("kruskalWallis: textbook two-group H, tie-corrected variant") {
    import spark.implicits._
    // a = (1,2), b = (3,4): R_a = 3, R_b = 7, H = 2.4, no ties
    val d = Seq((1.0, "a"), (2.0, "a"), (3.0, "b"), (4.0, "b"))
      .toDF("v", "g")
    val r = Eval.kruskalWallis(d, "v", "g").collect().head
    assert(r.getLong(0) === 2L && r.getLong(1) === 4L)
    assert(math.abs(r.getDouble(2) - 2.4) < 1e-12)
    assert(math.abs(r.getDouble(3) - 2.4) < 1e-12)
    // full ties inside groups: midranks 1.5/3.5, C = 1 - 12/60 = 0.8
    val t = Seq((1.0, "a"), (1.0, "a"), (2.0, "b"), (2.0, "b"))
      .toDF("v", "g")
    val rt = Eval.kruskalWallis(t, "v", "g").collect().head
    assert(math.abs(rt.getDouble(2) - 2.4) < 1e-12)
    assert(math.abs(rt.getDouble(3) - 3.0) < 1e-12)
    // every value identical → C = 0 → h_adj NULL
    val c = Seq((5.0, "a"), (5.0, "b")).toDF("v", "g")
    assert(Eval.kruskalWallis(c, "v", "g").collect().head.isNullAt(3))
  }

  test("brownForsythe: median-centered F on a hand fixture") {
    import spark.implicits._
    // a = (0,0,4,4): lower median 0, z = (0,0,4,4)
    // b = (1,1,1,1): median 1, z = 0 → F = (8/1)/(16/6) = 3.0
    val d = (Seq(0.0, 0.0, 4.0, 4.0).map(("a", _)) ++
      Seq(1.0, 1.0, 1.0, 1.0).map(("b", _))).toDF("g", "v")
    val r = Eval.brownForsythe(d, "v", "g").collect().head
    assert(r.getLong(0) === 2L && r.getLong(1) === 8L)
    assert(math.abs(r.getDouble(2) - 3.0) < 1e-12)
    // single group → NULL F
    val one = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    assert(Eval.brownForsythe(one, "v", "g").collect().head.isNullAt(2))
  }

  test("riskCoverage: tie-coherent curve and step-weighted AURC") {
    import spark.implicits._
    // conf 3: 2 ok; conf 2: 1 err; conf 1: 1 ok + 1 err
    val d = Seq((3, true), (3, true), (2, false), (1, true), (1, false))
      .toDF("conf", "ok")
    val rows = Eval.riskCoverage(d, "conf", "ok")
      .orderBy(desc("confidence")).collect()
    assert(rows.length === 3)
    assert(rows(0).getDouble(2) === 0.4 && rows(0).getDouble(3) === 0.0)
    assert(rows(1).getDouble(2) === 0.6 &&
      math.abs(rows(1).getDouble(3) - 1.0 / 3) < 1e-12)
    assert(rows(2).getDouble(2) === 1.0 && rows(2).getDouble(3) === 0.4)
    // aurc = (2·0 + 1·(1/3) + 2·0.4)/5
    val aurc = (1.0 / 3 + 0.8) / 5
    rows.foreach(r => assert(math.abs(r.getDouble(4) - aurc) < 1e-12))
  }

  test("logRankTest: hand two-arm fixture with censoring") {
    import spark.implicits._
    // A: u1 (0..2, event), u2 (0..5, censored at horizon)
    // B: u3 (0..3, event), u4 (0..5, censored)
    val ev = Seq((1L, "a", 0L), (1L, "a", 2L), (2L, "a", 0L),
      (2L, "a", 5L), (3L, "b", 0L), (3L, "b", 3L), (4L, "b", 0L),
      (4L, "b", 5L)).toDF("user", "grp", "sec")
    val rows = Events.logRankTest(ev, "user", "grp", "sec", 1L, 0L)
      .orderBy("group").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("a", "b"))
    assert(rows.map(_.getLong(1)).toSeq === Seq(2L, 2L))
    assert(rows.map(_.getLong(2)).toSeq === Seq(1L, 1L))
    // E_a = 1/2 + 1/3 = 5/6; E_b = 1/2 + 2/3 = 7/6
    assert(math.abs(rows(0).getDouble(3) - 5.0 / 6) < 1e-12)
    assert(math.abs(rows(1).getDouble(3) - 7.0 / 6) < 1e-12)
    // chi2 = (1/36)/(5/6) + (1/36)/(7/6) = 12/210
    assert(math.abs(rows(0).getDouble(4) - 12.0 / 210) < 1e-12)
    // V = 0.25 + 2/9; z = (1 - 5/6)/sqrt(17/36)
    val z = (1.0 / 6) / math.sqrt(17.0 / 36)
    assert(math.abs(rows(0).getDouble(5) - z) < 1e-12)
    // no churn at all (everyone censored) → NULL chi2/z, zero counts
    val flat = Seq((1L, "a", 0L), (1L, "a", 9L), (2L, "b", 0L),
      (2L, "b", 9L)).toDF("user", "grp", "sec")
    val fr = Events.logRankTest(flat, "user", "grp", "sec", 1L, 0L)
      .orderBy("group").collect()
    assert(fr.forall(r => r.getLong(2) === 0L && r.getDouble(3) === 0.0))
    assert(fr.forall(r => r.isNullAt(4) && r.isNullAt(5)))
    // a group never at risk at any event time (all members censored
    // before the first event) contributes no 0/0 term: chi2 stays
    // finite instead of going NaN
    val zer = Seq((1L, "a", 0L), (1L, "a", 5L), (3L, "a", 0L),
      (3L, "a", 9L), (2L, "c", 8L), (2L, "c", 9L))
      .toDF("user", "grp", "sec")
    val zr = Events.logRankTest(zer, "user", "grp", "sec", 1L, 0L)
      .orderBy("group").collect()
    assert(zr.map(_.getString(0)).toSeq === Seq("a", "c"))
    assert(zr(1).getDouble(3) === 0.0) // expected(c) == 0
    assert(!zr(0).isNullAt(4) && !zr(0).getDouble(4).isNaN)
    assert(zr(0).getDouble(4) === 0.0)
    // over-cap bucket table (periodSec too small for the range)
    // fails loudly before the driver collect
    val eb = intercept[IllegalArgumentException] {
      Events.logRankTest(ev, "user", "grp", "sec", 1L, 0L,
        maxBuckets = 2)
    }
    assert(eb.getMessage.contains("duration-bucket"))
  }

  test("pageHinkley: hand trace with a planted level shift") {
    import spark.implicits._
    // buckets (counts): 1, 1, 4 — delta 0, lambda 1
    val ev = (Seq(0L, 10L) ++ Seq.fill(4)(20L)).map(Tuple1(_)).toDF("sec")
    val rows = Events.pageHinkley(ev, "sec", 10L, 0.0, 1.0)
      .orderBy("bucket").collect()
    assert(rows.map(_.getDouble(1)).toSeq === Seq(1.0, 1.0, 4.0))
    assert(rows.map(_.getDouble(2)).toSeq === Seq(1.0, 1.0, 2.0))
    assert(rows.map(_.getDouble(3)).toSeq === Seq(0.0, 0.0, 2.0))
    assert(rows.map(_.getDouble(4)).toSeq === Seq(0.0, 0.0, 2.0))
    assert(rows.map(_.getBoolean(5)).toSeq === Seq(false, false, true))
  }

  test("cmhTest: textbook stratified 2x2 with a zero-margin stratum") {
    import spark.implicits._
    // s1: balanced 10/10/10/10; s2: outcome-always-true (V = 0)
    val rows = Seq.fill(10)(("s1", true, true)) ++
      Seq.fill(10)(("s1", true, false)) ++
      Seq.fill(10)(("s1", false, true)) ++
      Seq.fill(10)(("s1", false, false)) ++
      Seq.fill(5)(("s2", true, true)) ++ Seq.fill(5)(("s2", false, true))
    val r = Events.cmhTest(rows.toDF("s", "arm", "outc"), "s", "arm", "outc")
      .collect().head
    assert(r.getLong(0) === 2L && r.getLong(1) === 15L)
    assert(math.abs(r.getDouble(2) - 15.0) < 1e-12)
    val v = 20.0 * 20 * 20 * 20 / (40.0 * 40 * 39)
    assert(math.abs(r.getDouble(3) - v) < 1e-12)
    assert(math.abs(r.getDouble(4) - 0.25 / v) < 1e-12)
    assert(math.abs(r.getDouble(5) - 1.0) < 1e-12)
  }

  test("distinctN: hand gram counts per order") {
    import spark.implicits._
    val d = Seq(("a", "x y x"), ("a", "x z")).toDF("g", "text")
    val rows = graft.ml.GenEval.distinctN(d, "g", "text", maxN = 3)
      .orderBy("n").collect()
    // 1-grams: 5 total / 3 distinct; 2-grams: 3/3; 3-grams: 1/1
    assert(rows.map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq === Seq((1, 5L, 3L), (2, 3L, 3L), (3, 1L, 1L)))
    assert(rows(0).getDouble(4) === 0.6)
  }

  test("selfBleu: duplicate pair scores 1, the odd one out 0") {
    import spark.implicits._
    val d = Seq((1L, "a b"), (2L, "a b"), (3L, "c d")).toDF("id", "text")
    val rows = graft.ml.GenEval.selfBleu(d, "id", "text", sampleK = 3,
        maxN = 2).orderBy("id").collect()
    // d1/d2 are exact copies of each other -> BLEU 1; d3 shares no
    // gram with anyone -> 0. All lengths equal -> bp = 1.
    // maxN = 2 -> columns (id, p1, p2, bp, self_bleu)
    assert(rows.map(_.getDouble(4)).toSeq === Seq(1.0, 1.0, 0.0))
    assert(rows.forall(_.getDouble(3) === 1.0))
    // the clip must EXCLUDE the candidate itself: d3's own grams
    // can't match it
    assert(rows(2).getDouble(1) === 0.0 && rows(2).getDouble(2) === 0.0)
  }

  test("chao1: bias-corrected estimator off singleton/doubleton counts") {
    import spark.implicits._
    val d = Seq(("s", "a a b c")).toDF("src", "text")
    val r = graft.ml.TextAnalysis.chao1(d, "src", "text").collect().head
    assert(r.getLong(1) === 4L && r.getLong(2) === 3L)
    assert(r.getLong(3) === 2L && r.getLong(4) === 1L)
    // chao1 = 3 + 2*1/(2*(1+1)) = 3.5
    assert(r.getDouble(5) === 3.5)
  }

  test("gainsTable: tie-coherent buckets, cumulative gain, lift") {
    import spark.implicits._
    val d = Seq((3, 1), (3, 0), (2, 0), (1, 1)).toDF("s", "y")
    val rows = Eval.gainsTable(d, "s", "y", k = 2)
      .orderBy("bucket").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq === Seq((1L, 2L, 1L), (2L, 2L, 1L)))
    assert(rows.map(_.getDouble(3)).toSeq === Seq(0.5, 1.0))
    assert(rows.map(_.getDouble(4)).toSeq === Seq(1.0, 1.0))
  }

  test("cohensD: pooled-SD effect size + Hedges correction") {
    import spark.implicits._
    val d = (Seq(0.0, 0.0, 4.0, 4.0).map(("a", _)) ++
      Seq(5.0, 7.0).map(("b", _))).toDF("g", "v")
    val r = Eval.cohensD(d, "v", "g").collect().head
    assert(r.getString(0) === "a" && r.getString(1) === "b")
    assert(r.getLong(3) === 4L && r.getLong(4) === 2L)
    val expD = (2.0 - 6.0) / math.sqrt(18.0 / 4)
    assert(math.abs(r.getDouble(7) - expD) < 1e-12)
    assert(math.abs(r.getDouble(8) - expD * 0.8) < 1e-12)
    // three groups -> NULL d (contract violation surfaced via k)
    val tri = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0),
      ("c", 1.0), ("c", 2.0)).toDF("g", "v")
    val rt = Eval.cohensD(tri, "v", "g").collect().head
    assert(rt.getLong(2) === 3L && rt.isNullAt(7))
  }

  test("hellingerFromCounts: hand smoothed Bhattacharyya coefficient") {
    import spark.implicits._
    val base = Seq((0L, 3L), (1L, 1L)).toDF("bucket", "n")
    val cur = Seq((0L, 1L), (2L, 1L)).toDF("bucket", "n")
    val r = graft.ml.Profile.hellingerFromCounts(base, cur, nBuckets = 3)
      .collect().head
    assert(r.getLong(0) === 3L)
    val bc = math.sqrt(3.5 * 1.5 / (5.5 * 3.5)) +
      math.sqrt(1.5 * 0.5 / (5.5 * 3.5)) +
      math.sqrt(0.5 * 1.5 / (5.5 * 3.5))
    assert(math.abs(r.getDouble(1) - bc) < 1e-12)
    assert(math.abs(r.getDouble(2) - math.sqrt(1 - bc)) < 1e-12)
    assert(math.abs(r.getDouble(3) + math.log(bc)) < 1e-12)
    // identical sides -> hellinger exactly 0 (clamped, not NaN)
    val same = graft.ml.Profile.hellingerFromCounts(base, base, 2)
      .collect().head
    assert(same.getDouble(2) === 0.0)
  }

  test("propensityMatch: nearest grid control, overlap diagnostic, ATT") {
    import spark.implicits._
    // treated u1 (0.10) matches the 0.09 control pair (mean y 0.5);
    // treated u2 (0.50) has nothing within the 0.05 caliper
    val d = Seq(
      (1L, true, 0.10, 1.0), (2L, true, 0.50, 1.0),
      (3L, false, 0.09, 0.0), (4L, false, 0.09, 1.0),
      (5L, false, 0.13, 0.0)).toDF("unit", "t", "score", "y")
    val rows = Events.propensityMatch(d, "unit", "t", "score", "y",
        caliper = 0.05).orderBy("unit").collect()
    assert(rows.length === 2)
    val u1 = rows(0)
    assert(u1.getDouble(3) === 0.09 && u1.getLong(4) === 2L &&
      u1.getDouble(5) === 0.5 && u1.getBoolean(6))
    assert(rows(1).isNullAt(3) && !rows(1).getBoolean(6))
    rows.foreach { r =>
      assert(r.getDouble(7) === 0.5) // ATT over the matched unit only
      assert(r.getLong(8) === 2L && r.getLong(9) === 1L)
    }
  }

  test("qiniCurve: cumulative uplift above the scaled-control baseline") {
    import spark.implicits._
    // top score: treated converter vs silent control (qini 1);
    // full population: both arms 1 conversion (qini back to 0)
    val d = Seq((2, true, 1), (2, false, 0), (1, true, 0),
      (1, false, 1)).toDF("s", "t", "y")
    val rows = Eval.qiniCurve(d, "s", "t", "y", k = 2)
      .orderBy("bucket").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(rows.map(_.getDouble(5)).toSeq === Seq(1.0, 0.0))
    assert(rows.map(_.getDouble(6)).toSeq === Seq(0.0, 0.0))
  }

  test("exposureReport: position-discounted share vs item share") {
    import spark.implicits._
    val d = Seq((1, "a"), (2, "b"), (3, "a")).toDF("rank", "g")
    val rows = Eval.exposureReport(d, "rank", "g", k = 2)
      .orderBy("group").collect()
    val ea = 1.0 / (math.log(2.0) / math.log(2.0)) // rank 1
    val eb = 1.0 / (math.log(3.0) / math.log(2.0)) // rank 2
    val a = rows(0); val b = rows(1)
    assert(a.getLong(1) === 2L && a.getLong(2) === 1L)
    assert(math.abs(a.getDouble(3) - ea) < 1e-12)
    assert(math.abs(b.getDouble(3) - eb) < 1e-12)
    assert(math.abs(a.getDouble(4) - ea / (ea + eb)) < 1e-12)
    assert(math.abs(a.getDouble(6) -
      (ea / (ea + eb)) / (2.0 / 3)) < 1e-12)
  }

  test("deltaMethodRatio: clustered SE, z vs control") {
    import spark.implicits._
    // two users per arm; ratio = total y / total n
    val d = Seq(
      (1L, "0", 2.0, 1.0), (1L, "0", 2.0, 1.0), (2L, "0", 1.0, 1.0),
      (3L, "1", 4.0, 1.0), (4L, "1", 6.0, 1.0)).toDF("u", "v", "y", "n")
    val rows = Events.deltaMethodRatio(d, "u", "v", "y", "n", "0")
      .orderBy("variant").collect()
    val c = rows(0); val t = rows(1)
    // control: users (4,1) over (2,1) events -> ratio 5/3
    assert(math.abs(c.getDouble(4) - 5.0 / 3) < 1e-12)
    assert(c.isNullAt(6)) // control has no z
    assert(math.abs(t.getDouble(4) - 5.0) < 1e-12)
    // treated per-user sums (4,1), (6,1): syy = 2, syn = 0, snn = 0
    // se = sqrt(2 / (2 * 1)) = 1
    assert(math.abs(t.getDouble(5) - 1.0) < 1e-12)
    // control: y_u = (4, 1), n_u = (2, 1): syy = 4.5, syn = 1.5,
    // snn = 0.5, nbar = 1.5 -> var = (4.5 - 2R*1.5 + R^2*0.5)/(2*2.25)
    val r = 5.0 / 3
    val cv = (4.5 - 2 * r * 1.5 + r * r * 0.5) / (2 * 2.25)
    assert(math.abs(c.getDouble(5) - math.sqrt(cv)) < 1e-12)
    assert(math.abs(t.getDouble(6) -
      (5.0 - r) / math.sqrt(1.0 + cv)) < 1e-12)
  }

  test("deltaMethodRatio: missing control surfaces NULL z, not 0 rows") {
    import spark.implicits._
    val d = Seq((1L, "a", 2.0, 1.0), (2L, "a", 1.0, 1.0),
      (3L, "b", 4.0, 1.0), (4L, "b", 6.0, 1.0)).toDF("u", "v", "y", "n")
    val rows = Events.deltaMethodRatio(d, "u", "v", "y", "n",
      "no-such-arm").orderBy("variant").collect()
    assert(rows.length === 2)
    rows.foreach(r => assert(r.isNullAt(6)))
  }

  test("banditReplay: matched-round value, per-arm diagnostics") {
    import spark.implicits._
    val d = Seq(("a", "a", 1.0), ("a", "b", 9.0), ("b", "b", 0.5),
      ("b", "a", 9.0)).toDF("logged", "policy", "r")
    val r = Eval.banditReplay(d, "logged", "policy", "r").collect().head
    assert(r.getLong(0) === 4L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === 0.5 && r.getDouble(3) === 0.75)
    val arms = Eval.banditReplayByArm(d, "logged", "policy", "r")
      .orderBy("arm").collect()
    assert(arms.map(a => (a.getString(0), a.getLong(1), a.getLong(2)))
      .toSeq === Seq(("a", 2L, 1L), ("b", 2L, 1L)))
    assert(arms.map(_.getDouble(3)).toSeq === Seq(1.0, 0.5))
    // no matches -> NULL value
    val none = Seq(("a", "b", 1.0)).toDF("logged", "policy", "r")
    assert(Eval.banditReplay(none, "logged", "policy", "r")
      .collect().head.isNullAt(3))
  }

  test("burstiness: hand gaps — Goh–Barabási B and memory coefficient") {
    import spark.implicits._
    // user 1: events at t = 0(a), 1(b), 4(b), 6(b) → gaps 1, 3, 2,
    // all attributed to arriving type b; type a has no gap row
    val ev = Seq((1L, 10L, 0L, "a"), (1L, 11L, 1L, "b"),
      (1L, 12L, 4L, "b"), (1L, 13L, 6L, "b"))
      .toDF("user", "id", "sec", "typ")
    val rows = Events.burstiness(ev, "user", "sec", "id", "typ")
      .collect()
    assert(rows.length === 1 && rows.head.getString(0) === "b")
    val r = rows.head
    assert(r.getLong(1) === 3L)
    assert(math.abs(r.getDouble(2) - 2.0) < 1e-12) // mean gap
    val sd = math.sqrt(2.0 / 3) // pop sd of {1,3,2}
    assert(math.abs(r.getDouble(3) - sd) < 1e-12)
    assert(math.abs(r.getDouble(4) - (sd - 2) / (sd + 2)) < 1e-12)
    // consecutive pairs (1,3),(3,2): two points → Pearson r = −1
    assert(math.abs(r.getDouble(5) - (-1.0)) < 1e-12)
    // perfectly periodic stream → B = −1
    val per = Seq((2L, 20L, 0L, "c"), (2L, 21L, 5L, "c"),
      (2L, 22L, 10L, "c"), (2L, 23L, 15L, "c"))
      .toDF("user", "id", "sec", "typ")
    val pr = Events.burstiness(per, "user", "sec", "id", "typ")
      .collect().head
    assert(math.abs(pr.getDouble(4) - (-1.0)) < 1e-12)
  }

  test("intrinsicDimension: hand TwoNN on a 1-D grid + duplicate drop") {
    import spark.implicits._
    val pts = Seq((0L, Array(0f, 0f)), (1L, Array(1f, 0f)),
      (2L, Array(2f, 0f)), (3L, Array(4f, 0f))).toDF("id", "vec")
    val r = graft.ml.Similarity.intrinsicDimension(pts).collect().head
    // mu = (ln2, 0, ln2, ln(3/2)); d = 4 / sum
    val muSum = 2 * math.log(2.0) + math.log(1.5)
    assert(r.getLong(0) === 4L && r.getLong(1) === 0L)
    assert(math.abs(r.getDouble(3) - 4.0 / muSum) < 1e-12)
    // exact duplicate -> dropped, counted
    val dup = Seq((0L, Array(0f)), (1L, Array(0f)), (2L, Array(1f)))
      .toDF("id", "vec")
    val rd = graft.ml.Similarity.intrinsicDimension(dup).collect().head
    assert(rd.getLong(1) === 2L && rd.getLong(0) === 1L)
    // over-cap sample fails loudly before the quadratic scan
    val e = intercept[IllegalArgumentException] {
      graft.ml.Similarity.intrinsicDimension(pts, maxSample = 3)
    }
    assert(e.getMessage.contains("quadratic"))
  }

  test("effectiveRank: planted 1-D and isotropic 2-D spectra") {
    import spark.implicits._
    val flat = Seq(Array(1f, 0f), Array(-1f, 0f), Array(2f, 0f),
      Array(-2f, 0f)).map(Tuple1(_)).toDF("vec")
    val f = graft.ml.Pca.effectiveRank(flat, "vec", 2).collect().head
    assert(math.abs(f.getDouble(3) - 1.0) < 1e-9) // participation
    assert(math.abs(f.getDouble(4) - 1.0) < 1e-9) // effective rank
    assert(math.abs(f.getDouble(5) - 1.0) < 1e-9) // top share
    val iso = Seq(Array(1f, 0f), Array(-1f, 0f), Array(0f, 1f),
      Array(0f, -1f)).map(Tuple1(_)).toDF("vec")
    val i = graft.ml.Pca.effectiveRank(iso, "vec", 2).collect().head
    assert(math.abs(i.getDouble(3) - 2.0) < 1e-9)
    assert(math.abs(i.getDouble(4) - 2.0) < 1e-9)
    assert(math.abs(i.getDouble(5) - 0.5) < 1e-9)
  }

  test("windowDiff: hand Pk and WindowDiff over a 5-gap document") {
    import spark.implicits._
    // pred boundary at gap 1; ref at gaps 1 and 3; k = 2
    val d = (0 to 4).map(g => (1L, g.toLong, g == 1, g == 1 || g == 3))
      .toDF("id", "gap", "p", "r")
    val r = graft.ml.TextAnalysis.windowDiff(d, "id", "gap", "p", "r",
      k = 2).collect().head
    assert(r.getLong(1) === 5L && r.getLong(2) === 4L)
    // windows over gaps (0,1)(1,2)(2,3)(3,4): the last two disagree
    assert(r.getDouble(3) === 0.5 && r.getDouble(4) === 0.5)
    // sub-k documents emit no row
    val tiny = Seq((1L, 0L, true, false)).toDF("id", "gap", "p", "r")
    assert(graft.ml.TextAnalysis.windowDiff(tiny, "id", "gap", "p", "r",
      k = 2).collect().isEmpty)
  }

  test("markovEntropy: deterministic alternation has zero entropy rate") {
    import spark.implicits._
    val d = Seq((1L, 0L, 1L, "a"), (1L, 1L, 2L, "b"), (1L, 2L, 3L, "a"),
      (1L, 3L, 4L, "b")).toDF("u", "sec", "eid", "t")
    val r = Events.markovEntropy(d, "u", "sec", "t", "eid")
      .collect().head
    assert(r.getLong(0) === 3L && r.getLong(1) === 2L)
    val h0 = -(2.0 / 3 * math.log(2.0 / 3) + 1.0 / 3 * math.log(1.0 / 3))
    assert(math.abs(r.getDouble(2) - h0) < 1e-12)
    assert(r.getDouble(3) === 0.0) // perfectly predictable next step
    assert(math.abs(r.getDouble(4) - h0) < 1e-12)
    // a->a / a->b split: h_rate = (2/3) ln 2
    val d2 = Seq((1L, 0L, 1L, "a"), (1L, 1L, 2L, "a"), (1L, 2L, 3L, "b"),
      (1L, 3L, 4L, "a")).toDF("u", "sec", "eid", "t")
    val r2 = Events.markovEntropy(d2, "u", "sec", "t", "eid")
      .collect().head
    assert(math.abs(r2.getDouble(3) - 2.0 / 3 * math.log(2.0)) < 1e-12)
  }

  test("crossEntropyMatrix: hand smoothed cross-entropy pair") {
    import spark.implicits._
    val d = Seq(("A", "x x y"), ("B", "x z")).toDF("s", "text")
    val m = graft.ml.TextAnalysis.crossEntropyMatrix(d, "s", "text",
        smoothing = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // vocab = {x,y,z}; H(A,B) = ln 3.5 - (2 ln 1.5 + ln 0.5)/3
    val hab = math.log(3.5) -
      (2 * math.log(1.5) + math.log(0.5)) / 3
    assert(m(("A", "B"))._1 === 1L)
    assert(math.abs(m(("A", "B"))._2 - hab) < 1e-12)
    // self: H(A,A) = ln 4.5 - (2 ln 2.5 + ln 1.5)/3
    val haa = math.log(4.5) - (2 * math.log(2.5) + math.log(1.5)) / 3
    assert(math.abs(m(("A", "A"))._2 - haa) < 1e-12)
    // a model predicts itself at least as well as the other corpus
    assert(m(("A", "A"))._2 < m(("A", "B"))._2)
  }

  test("reciprocity: dyad census on a hand directed graph") {
    import spark.implicits._
    // 1<->2 mutual, 1->3 asymmetric, self-loop + duplicate dropped
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 3L), (1L, 2L))
      .toDF("src", "dst")
    val r = graft.graph.Graphs.reciprocity(e).collect().head
    assert(r.getLong(0) === 3L && r.getLong(1) === 2L)
    assert(r.getLong(2) === 1L && r.getLong(3) === 1L)
    assert(math.abs(r.getDouble(4) - 2.0 / 3) < 1e-12)
    // degenerate: only self-loops → zero counts (not NULL), with
    // reciprocity alone NULL (0/0)
    val lonely = Seq((7L, 7L), (8L, 8L)).toDF("src", "dst")
    val lr = graft.graph.Graphs.reciprocity(lonely).collect().head
    assert(lr.getLong(0) === 0L && lr.getLong(1) === 0L)
    assert(lr.getLong(2) === 0L && lr.getLong(3) === 0L)
    assert(lr.isNullAt(4))
  }

  test("stickiness: interval sweep equals brute-force trailing distinct") {
    import spark.implicits._
    // u1 active days 0, 2, 10; u2 active day 1 — window 3 days
    val secs = Seq((1L, 0L), (1L, 2L), (1L, 10L), (2L, 1L))
      .map { case (u, d) => (u, d * 86400L) }
    val ev = secs.toDF("user", "sec")
    val rows = Events.stickiness(ev, "user", "sec", windowDays = 3)
      .orderBy("day").collect()
    assert(rows.length === 11)
    val byDay = rows.map(r => r.getLong(0) -> (r.getLong(1),
      r.getLong(2))).toMap
    // brute-force trailing-3-day distinct per day
    val active = Map(1L -> Set(0L, 2L, 10L), 2L -> Set(1L))
    (0L to 10L).foreach { d =>
      val mau = active.count { case (_, ds) =>
        ds.exists(a => a <= d && a > d - 3) }
      val dau = active.count { case (_, ds) => ds.contains(d) }
      assert(byDay(d) === ((dau.toLong, mau.toLong)), s"day $d")
    }
  }

  test("textTiling: vocabulary-shift boundary on a hand document") {
    import spark.implicits._
    // blocks [a b][a b][x y][a b]: sims (1, 0, 0), depth (0, 1, 0)
    val d = Seq((1L, "a b a b x y a b")).toDF("id", "text")
    val rows = TextAnalysis.textTiling(d, "id", "text", blockSize = 2)
      .orderBy("gap").collect()
    assert(rows.map(_.getDouble(2)).toSeq === Seq(1.0, 0.0, 0.0))
    assert(rows.map(_.getDouble(3)).toSeq === Seq(0.0, 1.0, 0.0))
    // mu = 1/3, sd = sqrt(2/9) → only the middle gap crosses mu + sd
    assert(rows.map(_.getBoolean(4)).toSeq === Seq(false, true, false))
    // single-gap doc: depth 0, no boundary; sub-2-block doc: no rows
    val one = Seq((1L, "a b a c")).toDF("id", "text")
    val or = TextAnalysis.textTiling(one, "id", "text", blockSize = 2)
      .collect()
    assert(or.length === 1 && or.head.getDouble(2) === 0.5 &&
      !or.head.getBoolean(4))
    val tiny = Seq((1L, "a b")).toDF("id", "text")
    assert(TextAnalysis.textTiling(tiny, "id", "text", blockSize = 2)
      .collect().isEmpty)
  }
}
