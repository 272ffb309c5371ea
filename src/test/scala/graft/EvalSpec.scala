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
