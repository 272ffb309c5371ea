package graft

import org.apache.spark.sql.functions._
import graft.ml.Preference

class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  test("bradleyTerry: two items hit the closed form in one step") {
    // A beats B 3x, B beats A 1x → MLE P(A>B) = 3/4 → θ = (.75, .25)
    val m = Seq(("A", "B"), ("A", "B"), ("A", "B"), ("B", "A"))
      .toDF("w", "l")
    val r = Preference.bradleyTerry(m, "w", "l", iters = 3).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r("A")._1 == 3L && r("A")._2 == 4L)
    assert(r("B")._1 == 1L && r("B")._2 == 4L)
    assert(math.abs(r("A")._3 - 0.75) < 1e-12)
    assert(math.abs(r("B")._3 - 0.25) < 1e-12)
  }

  test("bradleyTerry matches a local MM replica on a 4-item graph") {
    val games = Seq(
      ("A", "B", 5L), ("B", "A", 2L), ("B", "C", 4L), ("C", "B", 3L),
      ("C", "D", 6L), ("D", "C", 1L), ("A", "D", 2L), ("D", "A", 2L),
      ("A", "C", 1L), ("C", "A", 3L))
    val iters = 10
    // driver-side MM replica: same update, same normalization
    val items = games.flatMap(g => Seq(g._1, g._2)).distinct.sorted
    val nij = scala.collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    val winsOf = scala.collection.mutable.Map[String, Long]()
      .withDefaultValue(0L)
    games.foreach { case (w, l, c) =>
      nij((w, l)) += c; nij((l, w)) += c; winsOf(w) += c
    }
    var th = items.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      val un = items.map { i =>
        val den = items.filter(_ != i)
          .map(j => nij((i, j)).toDouble / (th(i) + th(j))).sum
        i -> winsOf(i) / den
      }.toMap
      val s = un.values.sum
      th = un.map { case (k, v) => k -> v / s }
    }
    val got = Preference.bradleyTerry(
        games.toDF("w", "l", "c"), "w", "l", iters, countCol = Some("c"))
      .collect()
      .map(x => (x.getString(0), (x.getLong(1), x.getLong(2),
        x.getDouble(3)))).toMap
    items.foreach { i =>
      assert(math.abs(got(i)._3 - th(i)) < 1e-9, s"item $i")
    }
    assert(got("A")._1 == 8L && got("A")._2 == 15L)
    // ratings sum to 1 and stronger record ⇒ higher rating
    assert(math.abs(got.values.map(_._3).sum - 1.0) < 1e-9)
  }

  test("bradleyTerry: items with zero wins stay in the table at θ≈0") {
    val m = Seq(("A", "B"), ("A", "B"), ("C", "B")).toDF("w", "l")
    val r = Preference.bradleyTerry(m, "w", "l", iters = 10).collect()
      .map(x => x.getString(0) -> x.getDouble(3)).toMap
    assert(r.contains("B") && r("B") < 1e-3)
    // A vs C is unidentifiable (they never meet; both only beat B), so
    // the MM fixed point splits the mass evenly between them
    assert(math.abs(r("A") - r("C")) < 1e-6)
    assert(math.abs(r("A") - 0.5) < 1e-3)
  }

  test("bradleyTerry validates iteration count") {
    intercept[IllegalArgumentException] {
      Preference.bradleyTerry(Seq(("A", "B")).toDF("w", "l"), "w", "l",
        iters = 0)
    }
  }
}
