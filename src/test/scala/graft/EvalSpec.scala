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
