package graft

import graft.agg.Qsketch
import org.apache.spark.sql.functions._

/** Deterministic-KLL quantile sketch: rank error across distributions
  * and merge shapes, byte round-trip, udaf path.
  */
class QuantileSketchSpec extends SparkSpec {

  /** Max rank error of the p-quantile estimates: distance from the
    * target rank p·n to the interval [count(< est), count(≤ est)] —
    * the tie-aware definition (a value spanning many duplicates is a
    * correct answer for ANY target inside its run).
    */
  private def rankErr(xs: Seq[Double], sk: Qsketch, ps: Seq[Double]): Double = {
    ps.map { p =>
      val est = sk.quantile(p)
      val below = xs.count(_ < est).toDouble
      val atOrBelow = xs.count(_ <= est).toDouble
      val target = p * xs.size
      math.max(0.0, math.max(below - target, target - atOrBelow)) / xs.size
    }.max
  }

  private val probes = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)

  test("rank error stays ~1% at k=200 across distributions and input orders") {
    val n = 50000
    val uniform = (1 to n).map(_.toDouble)
    val zipf = (1 to n).map(i => 1.0 / i)
    val clustered = (1 to n).map(i => (i % 17).toDouble)
    for ((name, xs) <- Seq(
        ("sorted", uniform),
        ("reversed", uniform.reverse),
        ("interleaved", uniform.grouped(2).toSeq.reverse.flatten),
        ("zipf", zipf),
        ("clustered", clustered))) {
      val sk = xs.foldLeft(Qsketch.empty(200))(_.add(_))
      assert(sk.n == n)
      val err = rankErr(xs, sk, probes)
      assert(err < 0.02, s"$name: max rank error $err")
      // sketch stays sublinear: O(k log(n/k)) items, not O(n)
      assert(sk.retained < 200 * 16, s"$name retained ${sk.retained}")
    }
  }

  test("merged partitions match the single-pass error bound") {
    val xs = (1 to 30000).map(i => math.pow(1.0003, i))
    val parts = xs.grouped(1000).toSeq
    val merged = parts.map(_.foldLeft(Qsketch.empty(200))(_.add(_)))
      .reduce(_.merge(_))
    assert(merged.n == xs.size)
    assert(rankErr(xs, merged, probes) < 0.03)
    // fold in the reverse order: same bound (determinism per fixed order)
    val reversedFold = parts.reverse.map(_.foldLeft(Qsketch.empty(200))(_.add(_)))
      .reduce(_.merge(_))
    assert(rankErr(xs, reversedFold, probes) < 0.03)
  }

  test("rank and quantile are consistent; extremes are exact-ish") {
    val xs = (1 to 10000).map(_.toDouble)
    val sk = xs.foldLeft(Qsketch.empty(128))(_.add(_))
    assert(sk.quantile(0.0) <= 200.0)
    assert(sk.quantile(1.0) == 10000.0 ||
      math.abs(sk.rank(sk.quantile(1.0)) - 10000.0) < 200)
    assert(math.abs(sk.rank(5000.0) - 5000.0) < 200)
  }

  test("byte round-trip preserves the sketch exactly") {
    val sk = (1 to 5000).map(i => math.sin(i).abs)
      .foldLeft(Qsketch.empty(64))(_.add(_))
    val rt = Qsketch.fromBytes(Qsketch.toBytes(sk))
    assert(rt.k == sk.k && rt.n == sk.n)
    assert(rt.levels == sk.levels && rt.parities == sk.parities)
  }

  test("validation: NaN, tiny k, k mismatch, empty quantile") {
    intercept[IllegalArgumentException](Qsketch.empty(4))
    intercept[IllegalArgumentException](Qsketch.empty(8).add(Double.NaN))
    intercept[IllegalArgumentException](
      Qsketch.empty(8).merge(Qsketch.empty(16)))
    intercept[IllegalArgumentException](Qsketch.empty(8).quantile(0.5))
    intercept[IllegalArgumentException](
      Qsketch.empty(8).add(1.0).quantile(1.5))
  }

  test("mergeBytesUdaf folds per-key serialized sketches in a DataFrame") {
    import spark.implicits._
    val d1 = (1 to 500).map(_.toDouble).foldLeft(Qsketch.empty(64))(_.add(_))
    val d2 = (501 to 1000).map(_.toDouble).foldLeft(Qsketch.empty(64))(_.add(_))
    val df = Seq(("k1", Qsketch.toBytes(d1)), ("k1", Qsketch.toBytes(d2)))
      .toDF("key", "sketch")
    val merged = df.groupBy("key")
      .agg(Qsketch.mergeBytesUdaf(64)(col("sketch")).as("m"))
      .select("m").as[Array[Byte]].head()
    val sk = Qsketch.fromBytes(merged)
    assert(sk.n == 1000L)
    assert(math.abs(sk.quantile(0.5) - 500.0) < 50.0)
  }
}
