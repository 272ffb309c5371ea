package graft

import org.apache.spark.sql.functions._
import graft.ml.Eval

class EvalSpec extends SparkSpec {

  test("rocAuc equals the concordance probability (brute force, ties)") {
    import spark.implicits._
    val rows = Seq( // (score, label) with tie blocks spanning classes
      (0.1, 0), (0.1, 0), (0.2, 0), (0.2, 1), (0.3, 0),
      (0.3, 1), (0.3, 1), (0.5, 1), (0.5, 0), (0.9, 1))
    val df = rows.toDF("s", "y")
    val got = Eval.rocAuc(df, "s", "y").head()
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    val brute = (for { p <- pos; n <- neg } yield
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum / (pos.size * neg.size)
    assert(got.getLong(0) == pos.size && got.getLong(1) == neg.size)
    assert(math.abs(got.getDouble(2) - brute) < 1e-12,
      s"got ${got.getDouble(2)} want $brute")
    // degenerate single-class input -> NULL auc
    val one = Eval.rocAuc(Seq((0.1, 1), (0.2, 1)).toDF("s", "y"), "s", "y")
      .head()
    assert(one.isNullAt(2))
    // perfect separation -> 1.0
    val sep = Eval.rocAuc(
      Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)).toDF("s", "y"), "s", "y")
      .head()
    assert(sep.getDouble(2) == 1.0)
  }

  test("averagePrecision: tie blocks at block-end precision") {
    import spark.implicits._
    // distinct scores, classic AP: hits at ranks 1 and 3
    // AP = (1/1 + 2/3) / 2
    val ap1 = Eval.averagePrecision(
      Seq((0.9, 1), (0.8, 0), (0.7, 1), (0.6, 0)).toDF("s", "y"), "s", "y")
      .head().getDouble(1)
    assert(math.abs(ap1 - (1.0 + 2.0 / 3) / 2) < 1e-12, ap1)
    // one tie block holding both positives: block of 3 rows (2 pos)
    // after one negative at a higher score:
    // AP = 2 * (3/4) / 2 = 3/4 (block-end precision 3/4... cum_p=2? )
    // cum at block: cum_n = 4, cum_p = 2 -> contribution 2 * (2/4) / 2
    val ap2 = Eval.averagePrecision(
      Seq((0.9, 0), (0.5, 1), (0.5, 1), (0.5, 0)).toDF("s", "y"), "s", "y")
      .head().getDouble(1)
    assert(math.abs(ap2 - 0.5) < 1e-12, ap2)
    // no positives -> NULL
    assert(Eval.averagePrecision(
      Seq((0.9, 0), (0.5, 0)).toDF("s", "y"), "s", "y").head().isNullAt(1))
  }

  test("ndcgAtK: hand-computed grades, k cutoff, idcg=0 NULL") {
    import spark.implicits._
    // one query, 4 items, predicted order i1,i2,i3,i4 (score desc),
    // rels 0,2,3,1; k=3: dcg = 0 + 2/log2(3) + 3/2
    // ideal order rels 3,2,1: idcg = 3 + 2/log2(3) + 1/2
    val df = Seq(
      ("q", "i1", 0.9, 0), ("q", "i2", 0.8, 2),
      ("q", "i3", 0.7, 3), ("q", "i4", 0.6, 1),
      ("z", "i1", 0.9, 0), ("z", "i2", 0.8, 0) // no relevant -> NULL
    ).toDF("query", "item", "score", "rel")
    val got = Eval.ndcgAtK(df, "query", "item", "score", "rel", 3)
      .collect().map(r => r.getString(0) -> r).toMap
    val dcg = 2.0 / (math.log(3) / math.log(2)) + 3.0 / 2
    val idcg = 3.0 + 2.0 / (math.log(3) / math.log(2)) + 1.0 / 2
    val gq = got("q")
    assert(math.abs(gq.getDouble(1) - dcg) < 1e-12)
    assert(math.abs(gq.getDouble(2) - idcg) < 1e-12)
    assert(math.abs(gq.getDouble(3) - dcg / idcg) < 1e-12)
    assert(got("z").isNullAt(3) && got("z").getDouble(2) == 0.0)
    // perfect ranking -> ndcg 1
    val perfect = Eval.ndcgAtK(
      Seq(("q", "a", 0.9, 3), ("q", "b", 0.8, 2), ("q", "c", 0.7, 1))
        .toDF("query", "item", "score", "rel"),
      "query", "item", "score", "rel", 3).head()
    assert(math.abs(perfect.getDouble(3) - 1.0) < 1e-12)
  }

  test("rbo: identical lists = 1, disjoint = 0, brute force otherwise") {
    import spark.implicits._
    def ranked(q: String, items: Seq[String]) =
      items.zipWithIndex.map { case (it, i) => (q, it, i + 1) }
    val la = ranked("q", Seq("a", "b", "c", "d")) ++
      ranked("r", Seq("a", "b")) ++ ranked("s", Seq("x", "y"))
    val lb = ranked("q", Seq("b", "a", "e", "c")) ++
      ranked("r", Seq("a", "b")) ++ ranked("s", Seq("u", "v"))
    val a = la.toDF("query", "item", "rank")
    val b = lb.toDF("query", "item", "rank")
    val got = graft.ml.Eval.rbo(a, b, "query", "item", "rank", 0.9, 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // brute force: (1-p) sum p^(k-1) |A_k ∩ B_k| / k
    def brute(xa: Seq[String], xb: Seq[String], d: Int): Double =
      (1 to d).map { k =>
        val x = xa.take(k).toSet.intersect(xb.take(k).toSet).size
        math.pow(0.9, k - 1) * x / k
      }.sum * (1 - 0.9)
    assert(math.abs(got("q") -
      brute(Seq("a", "b", "c", "d"), Seq("b", "a", "e", "c"), 4)) < 1e-12)
    assert(math.abs(got("r") - brute(Seq("a", "b"), Seq("a", "b"), 4)) < 1e-12)
    assert(got("s") == 0.0)
    // identical lists at full depth d: RBO = 1 - p^d
    val full = graft.ml.Eval.rbo(
      ranked("t", Seq("a", "b", "c", "d")).toDF("query", "item", "rank"),
      ranked("t", Seq("a", "b", "c", "d")).toDF("query", "item", "rank"),
      "query", "item", "rank", 0.9, 4)
      .head().getDouble(1)
    assert(math.abs(full - (1 - math.pow(0.9, 4))) < 1e-12, full)
    intercept[IllegalArgumentException](
      graft.ml.Eval.rbo(a, b, "query", "item", "rank", 1.0, 4))
  }

  test("fleissKappa matches the Wikipedia worked example") {
    import spark.implicits._
    // the classic 10-item, 14-rater, 5-category table (Fleiss 1971);
    // known result: kappa ≈ 0.2099
    val table = Seq(
      Seq(0, 0, 0, 0, 14), Seq(0, 2, 6, 4, 2), Seq(0, 0, 3, 5, 6),
      Seq(0, 3, 9, 2, 0), Seq(2, 2, 8, 1, 1), Seq(7, 7, 0, 0, 0),
      Seq(3, 2, 6, 3, 0), Seq(2, 5, 3, 2, 2), Seq(6, 5, 2, 1, 0),
      Seq(0, 2, 2, 3, 7))
    val rows = table.zipWithIndex.flatMap { case (cnts, item) =>
      cnts.zipWithIndex.flatMap { case (c, cat) =>
        Seq.fill(c)((item.toLong, s"c$cat"))
      }
    }
    val got = graft.ml.Eval.fleissKappa(rows.toDF("item", "cat"),
      "item", "cat").head()
    assert(got.getLong(0) == 10L && got.getLong(1) == 14L)
    // P_bar = 688/1820, Pe = sum of squared marginal shares,
    // kappa = (P_bar - Pe)/(1 - Pe) ~ 0.20994
    assert(math.abs(got.getDouble(2) - 688.0 / 1820) < 1e-12, got.getDouble(2))
    assert(math.abs(got.getDouble(4) - 0.209937) < 1e-5, got.getDouble(4))
    // unequal rating counts rejected
    intercept[IllegalArgumentException](graft.ml.Eval.fleissKappa(
      Seq((1L, "a"), (1L, "b"), (2L, "a")).toDF("item", "cat"),
      "item", "cat"))
  }

  test("weightedKappa: quadratic weights, reduces to cohen on 0/1") {
    import spark.implicits._
    // 3-level ordinal: off-by-one disagreements weigh 3/4
    // (quadratic, K=3), off-by-two weigh 0
    val rows = Seq.fill(40)((0, 0)) ++ Seq.fill(10)((0, 1)) ++
      Seq.fill(5)((0, 2)) ++ Seq.fill(30)((1, 1)) ++
      Seq.fill(10)((2, 1)) ++ Seq.fill(5)((2, 2))
    val got = graft.ml.Eval.weightedKappa(rows.toDF("r1", "r2"), "r1", "r2",
      quadratic = true).head()
    // brute force
    def w(i: Int, j: Int) = 1.0 - math.pow((i - j) / 2.0, 2)
    val n = rows.size.toDouble
    val po = rows.map { case (i, j) => w(i, j) }.sum / n
    val m1 = rows.groupBy(_._1).view.mapValues(_.size).toMap
    val m2 = rows.groupBy(_._2).view.mapValues(_.size).toMap
    val pe = (for { (i, ci) <- m1; (j, cj) <- m2 }
      yield w(i, j) * ci * cj).sum / (n * n)
    assert(got.getLong(0) == 100L && got.getLong(1) == 3L)
    assert(math.abs(got.getDouble(2) - po) < 1e-12)
    assert(math.abs(got.getDouble(3) - pe) < 1e-12)
    assert(math.abs(got.getDouble(4) - (po - pe) / (1 - pe)) < 1e-12)
    // on a binary scale both weightings equal unweighted Cohen
    val bin = Seq.fill(45)((0, 0)) ++ Seq.fill(15)((0, 1)) ++
      Seq.fill(25)((1, 0)) ++ Seq.fill(15)((1, 1))
    val wk = graft.ml.Eval.weightedKappa(bin.toDF("r1", "r2"), "r1", "r2")
      .head().getDouble(4)
    val ck = graft.ml.Eval.cohenKappa(
      bin.map { case (a, b) => (a.toString, b.toString) }.toDF("r1", "r2"),
      "r1", "r2").head().getDouble(3)
    assert(math.abs(wk - ck) < 1e-12, s"$wk vs $ck")
    // degenerate scale (both raters only ever use level 0): K = 1
    // makes the 1/(K−1) weight normalizer 0/0 — must raise clearly,
    // not return NaN
    val ex = intercept[Exception] {
      graft.ml.Eval.weightedKappa(
        Seq.fill(5)((0, 0)).toDF("r1", "r2"), "r1", "r2").head()
    }
    assert(ex.getMessage.contains("2 distinct rating levels"),
      ex.getMessage)
    // negative levels violate the [0, K) contract
    val ex2 = intercept[Exception] {
      graft.ml.Eval.weightedKappa(
        (Seq.fill(3)((-1, 0)) ++ Seq.fill(3)((1, 1)))
          .toDF("r1", "r2"), "r1", "r2").head()
    }
    assert(ex2.getMessage.contains("non-negative"), ex2.getMessage)
  }

  test("meanReciprocalRank: first-relevant ranks, no-relevant zero, exact mean") {
    import spark.implicits._
    val rows = Seq(
      // q1: first relevant at rank 2
      ("q1", 1, false), ("q1", 2, true), ("q1", 3, true),
      // q2: first relevant at rank 1
      ("q2", 1, true), ("q2", 2, false),
      // q3: nothing relevant -> rr 0
      ("q3", 1, false), ("q3", 2, false))
      .toDF("q", "rank", "rel")
    val s = graft.ml.Eval.meanReciprocalRank(rows, "q", "rank", "rel").head()
    assert(s.getLong(0) == 3L && s.getLong(1) == 2L)
    assert(math.abs(s.getDouble(2) - (0.5 + 1.0 + 0.0) / 3) < 1e-12)
    val per = graft.ml.Eval.reciprocalRanks(rows, "q", "rank", "rel")
      .collect().map(r => r.getString(0) ->
        ((r.isNullAt(2), r.getDouble(3)))).toMap
    assert(per("q1") == ((false, 0.5)))
    assert(per("q3") == ((true, 0.0)))
  }

  test("precisionRecallAtK: top-k counting, no-relevant NULL recall") {
    import spark.implicits._
    val rows = Seq(
      // q1: 3 relevant total, 2 inside top-3
      ("q1", 1, true), ("q1", 2, false), ("q1", 3, true), ("q1", 4, true),
      // q2: nothing relevant
      ("q2", 1, false), ("q2", 2, false))
      .toDF("q", "rank", "rel")
    val got = graft.ml.Eval.precisionRecallAtK(rows, "q", "rank", "rel", 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3),
          if (r.isNullAt(4)) -1.0 else r.getDouble(4)))).toMap
    assert(got("q1") == ((2L, 3L, 2.0 / 3, 2.0 / 3)))
    assert(got("q2") == ((0L, 0L, 0.0, -1.0))) // recall NULL
    intercept[IllegalArgumentException](
      graft.ml.Eval.precisionRecallAtK(rows, "q", "rank", "rel", 0))
  }

  test("bootstrapMeanCI: CI brackets the mean, narrows with n, deterministic") {
    import spark.implicits._
    val small = (1L to 50L).map(i => (i, (i % 10) + 1)).toDF("id", "x")
    val big = (1L to 2000L).map(i => (i, (i % 10) + 1)).toDF("id", "x")
    def ci(df: org.apache.spark.sql.DataFrame) = {
      val r = graft.ml.Eval.bootstrapMeanCI(df, "id", "x", b = 100).head()
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    }
    val (n1, m1, lo1, hi1) = ci(small)
    assert(n1 == 50L && math.abs(m1 - 5.5) < 1e-12)
    assert(lo1 < m1 && m1 < hi1 && lo1 < hi1)
    // 40x the data -> a much tighter interval around the same mean
    val (n2, m2, lo2, hi2) = ci(big)
    assert(n2 == 2000L && math.abs(m2 - 5.5) < 1e-12)
    assert((hi2 - lo2) < (hi1 - lo1) / 3, s"big [$lo2,$hi2] vs small [$lo1,$hi1]")
    // seeded -> bit-identical on rerun; different seed -> different CI
    assert(ci(small) == ((n1, m1, lo1, hi1)))
    val other = graft.ml.Eval.bootstrapMeanCI(small, "id", "x", b = 100,
      seed = "other").head()
    assert(other.getDouble(2) != lo1 || other.getDouble(3) != hi1)
    // degenerate constant column -> zero-width interval at the constant
    val const = (1L to 100L).map(i => (i, 7)).toDF("id", "x")
    val (_, mc, loc, hic) = ci(const)
    assert(mc == 7.0 && loc == 7.0 && hic == 7.0)
  }

  test("krippendorffAlpha: perfect = 1, missing data, single-rating drop") {
    import spark.implicits._
    // perfect agreement with variable m (2 and 3 ratings per unit)
    val perfect = Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"), (2L, "b"))
    val p = graft.ml.Eval.krippendorffAlpha(perfect.toDF("u", "c"), "u", "c")
      .head()
    assert(p.getDouble(4) == 1.0 && p.getLong(0) == 2L && p.getLong(1) == 5L)
    // Krippendorff's own worked nominal example (2004):
    // coincidences for units with >= 2 ratings give alpha = 0.095...
    // use a small hand-checked case instead: 4 units, 2 raters,
    // half agree -> D_o/D_e from brute force
    val rows = Seq(
      (1L, "x"), (1L, "x"), (2L, "x"), (2L, "y"),
      (3L, "y"), (3L, "y"), (4L, "y"), (4L, "x"),
      (5L, "x")) // unit 5 has one rating -> excluded
    val got = graft.ml.Eval.krippendorffAlpha(rows.toDF("u", "c"), "u", "c")
      .head()
    assert(got.getLong(0) == 4L && got.getLong(1) == 8L)
    // D_o = sum (m^2 - sum n_uc^2)/(m-1): agree units 0, disagree 2
    val dO = 0.0 + 2.0 + 0.0 + 2.0
    // marginals over pairable: x=4, y=4, n=8
    val dE = (8.0 * 8 - (16 + 16)) / 7
    assert(math.abs(got.getDouble(2) - dO) < 1e-12)
    assert(math.abs(got.getDouble(3) - dE) < 1e-12)
    assert(math.abs(got.getDouble(4) - (1 - dO / dE)) < 1e-12)
  }

  test("mannWhitney matches scipy's tie-corrected z on a hand case") {
    import spark.implicits._
    // group1 = {3, 5, 5}, group0 = {1, 2, 5, 7}
    val rows = Seq((3.0, 1), (5.0, 1), (5.0, 1), (1.0, 0), (2.0, 0),
      (5.0, 0), (7.0, 0))
    val got = graft.ml.Eval.mannWhitney(rows.toDF("v", "y"), "v", "y").head()
    // midranks: 1->1, 2->2, 3->3, 5->(4+5+6)/3=5, 7->7
    // rank_sum(group1) = 3 + 5 + 5 = 13; U = 13 - 3*4/2 = 7
    assert(got.getLong(0) == 3L && got.getLong(1) == 4L)
    assert(math.abs(got.getDouble(2) - 7.0) < 1e-12)
    // var = (12/12) * ((8) - (27-3)/(7*6)) = 8 - 24/42
    val v = 1.0 * (8.0 - 24.0 / 42)
    val z = (7.0 - 6.0) / math.sqrt(v)
    assert(math.abs(got.getDouble(3) - z) < 1e-12)
    // Cliff's delta = 2U/(n1 n2) - 1; brute force over pairs:
    // (#g1>g0 - #g1<g0)/(n1 n2) = (7 - 5)/12 ... with ties at 5
    // counted half each way in U: 2*7/12 - 1 = 1/6
    assert(math.abs(got.getAs[Double]("cliffs_delta") - 1.0 / 6) < 1e-12)
    // all-tied input -> NULL z
    val tied = Seq((1.0, 1), (1.0, 0), (1.0, 0))
    assert(graft.ml.Eval.mannWhitney(tied.toDF("v", "y"), "v", "y")
      .head().isNullAt(3))
  }

  test("chiSquared matches the closed form on a 2x2 table") {
    import spark.implicits._
    // classic 2x2: [[10, 20], [30, 40]]
    val rows = Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(30)(("b", "x")) ++ Seq.fill(40)(("b", "y"))
    val got = graft.ml.Eval.chiSquared(rows.toDF("r", "c"), "r", "c").head()
    val n = 100.0
    val e = Map(("a", "x") -> 30.0 * 40 / n, ("a", "y") -> 30.0 * 60 / n,
      ("b", "x") -> 70.0 * 40 / n, ("b", "y") -> 70.0 * 60 / n)
    val o = Map(("a", "x") -> 10.0, ("a", "y") -> 20.0,
      ("b", "x") -> 30.0, ("b", "y") -> 40.0)
    val chi2 = o.map { case (k, ov) =>
      (ov - e(k)) * (ov - e(k)) / e(k) }.sum
    assert(got.getLong(0) == 100L && got.getLong(3) == 1L)
    assert(math.abs(got.getDouble(4) - chi2) < 1e-12)
    assert(math.abs(got.getDouble(5) - math.sqrt(chi2 / 100)) < 1e-12)
    // single-column table: chi2 = 0, V NULL
    val degen = graft.ml.Eval.chiSquared(
      Seq(("a", "x"), ("b", "x")).toDF("r", "c"), "r", "c").head()
    assert(degen.getDouble(4) == 0.0 && degen.isNullAt(5))
  }

  test("logLoss: closed form, clipping saves certain-wrong predictions") {
    import spark.implicits._
    val rows = Seq((0.9, 1), (0.1, 0), (0.6, 1), (0.4, 0))
    val got = graft.ml.Eval.logLoss(rows.toDF("p", "y"), "p", "y").head()
    val brute = -rows.map { case (p, y) =>
      if (y == 1) math.log(p) else math.log(1 - p) }.sum / 4
    assert(got.getLong(0) == 4L)
    assert(math.abs(got.getDouble(1) - brute) < 1e-12)
    // p = 0 with y = 1 would be -ln(0) = inf; clipping bounds it
    val clipped = graft.ml.Eval.logLoss(
      Seq((0.0, 1)).toDF("p", "y"), "p", "y").head().getDouble(1)
    assert(math.abs(clipped - (-math.log(1e-15))) < 1e-9)
    intercept[IllegalArgumentException](graft.ml.Eval.logLoss(
      rows.toDF("p", "y"), "p", "y", eps = 0.7))
  }

  test("binaryConfusion: counts, rates, and empty-denominator NULLs") {
    import spark.implicits._
    // threshold 0.5: preds 1,1,0,0 vs labels 1,0,1,0
    val rows = Seq((0.9, 1), (0.8, 0), (0.2, 1), (0.1, 0))
    val got = graft.ml.Eval.binaryConfusion(rows.toDF("p", "y"), "p", "y",
      0.5).head()
    assert((got.getLong(1), got.getLong(2), got.getLong(3), got.getLong(4))
      == ((1L, 1L, 1L, 1L)))
    assert(got.getDouble(5) == 0.5 && got.getDouble(6) == 0.5)
    assert(math.abs(got.getDouble(7) - 0.5) < 1e-12)
    assert(got.getDouble(8) == 0.5)
    // nothing predicted positive -> precision NULL, recall 0
    val none = graft.ml.Eval.binaryConfusion(
      Seq((0.1, 1), (0.2, 1)).toDF("p", "y"), "p", "y", 0.5).head()
    assert(none.isNullAt(5) && none.getDouble(6) == 0.0)
    // no positives at all -> recall NULL
    val noPos = graft.ml.Eval.binaryConfusion(
      Seq((0.9, 0), (0.1, 0)).toDF("p", "y"), "p", "y", 0.5).head()
    assert(noPos.isNullAt(6))
  }

  test("brierDecomposition: Murphy identity and closed-form values") {
    import spark.implicits._
    // two bins via cut at 0.5: low bin p={0.2,0.4}, y={0,1};
    // high bin p={0.7,0.9}, y={1,1}
    val rows = Seq((0.2, 0), (0.4, 1), (0.7, 1), (0.9, 1))
    val got = graft.ml.Eval.brierDecomposition(
      rows.toDF("p", "y"), "p", "y", Seq(0.5)).head()
    val brier = rows.map { case (p, y) => (p - y) * (p - y) }.sum / 4
    val (pk0, yk0) = (0.3, 0.5)
    val (pk1, yk1) = (0.8, 1.0)
    val ybar = 0.75
    val rel = (2 * (pk0 - yk0) * (pk0 - yk0) +
      2 * (pk1 - yk1) * (pk1 - yk1)) / 4
    val res = (2 * (yk0 - ybar) * (yk0 - ybar) +
      2 * (yk1 - ybar) * (yk1 - ybar)) / 4
    val unc = ybar * (1 - ybar)
    assert(got.getLong(0) == 4L)
    assert(math.abs(got.getDouble(1) - brier) < 1e-12)
    assert(math.abs(got.getDouble(2) - rel) < 1e-12)
    assert(math.abs(got.getDouble(3) - res) < 1e-12)
    assert(math.abs(got.getDouble(4) - unc) < 1e-12)
    // Murphy identity: binned Brier = REL - RES + UNC, and it equals
    // the Brier of the BINNED forecasts
    val binnedBrier = (2 * ((pk0 - 0) * (pk0 - 0) + (pk0 - 1) * (pk0 - 1)) / 2
      + 2 * (pk1 - 1) * (pk1 - 1)) / 4
    assert(math.abs(got.getDouble(5) - (rel - res + unc)) < 1e-12)
    assert(math.abs(got.getDouble(5) - binnedBrier) < 1e-12)
    intercept[IllegalArgumentException](graft.ml.Eval.brierDecomposition(
      rows.toDF("p", "y"), "p", "y", Seq(0.8, 0.5)))
  }

  test("cohenKappa matches the textbook 2x2 example") {
    import spark.implicits._
    // classic example: 45 yes/yes, 15 yes/no, 25 no/yes, 15 no/no
    val rows =
      Seq.fill(45)(("y", "y")) ++ Seq.fill(15)(("y", "n")) ++
        Seq.fill(25)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val got = Eval.cohenKappa(rows.toDF("r1", "r2"), "r1", "r2").head()
    val po = 60.0 / 100
    val pe = (60.0 / 100) * (70.0 / 100) + (40.0 / 100) * (30.0 / 100)
    assert(got.getLong(0) == 100L)
    assert(math.abs(got.getDouble(1) - po) < 1e-12)
    assert(math.abs(got.getDouble(2) - pe) < 1e-12)
    assert(math.abs(got.getDouble(3) - (po - pe) / (1 - pe)) < 1e-12)
    // both raters constant and equal: pe = 1 -> NULL kappa
    val const = Eval.cohenKappa(
      Seq(("a", "a"), ("a", "a")).toDF("r1", "r2"), "r1", "r2").head()
    assert(const.isNullAt(3) && const.getDouble(1) == 1.0)
    // disjoint raters: po = 0, kappa < 0
    val dis = Eval.cohenKappa(
      Seq(("a", "b"), ("b", "a")).toDF("r1", "r2"), "r1", "r2").head()
    assert(dis.getDouble(1) == 0.0 && dis.getDouble(3) < 0)
  }
}
