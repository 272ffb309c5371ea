package graft

import graft.agg.Theta
import org.apache.spark.sql.functions._

/** KMV / theta sketch: exact mode, estimation accuracy, the
  * small-intersection regime where HLL inclusion–exclusion fails,
  * merge algebra, byte round-trip, and the udaf merge path.
  */
class ThetaSpec extends SparkSpec {

  private def sketch(items: Iterable[String], k: Int = 256): Theta =
    items.foldLeft(Theta.empty(k))((t, s) => t.add(Theta.hash(s)))

  test("exact below k: estimate is the true distinct count") {
    val t = sketch((1 to 100).map("x" + _) ++ (1 to 50).map("x" + _), k = 256)
    assert(t.isExact)
    assert(t.estimate == 100L)
    assert(t.theta == 1.0)
  }

  test("estimation mode: distinct estimate within ~3/sqrt(k)") {
    val n = 20000
    val t = sketch((1 to n).map("item" + _), k = 1024)
    assert(!t.isExact)
    val err = math.abs(t.estimate - n.toDouble) / n
    assert(err < 3.0 / math.sqrt(1024), s"estimate ${t.estimate} vs $n (err $err)")
  }

  test("small intersection of large sets: theta stays accurate where HLL degrades") {
    // 50k vs 50k with only 500 common — intersection is 1% of either set
    val a = sketch((1 to 50000).map("a" + _) ++ (1 to 500).map("c" + _), k = 4096)
    val b = sketch((1 to 50000).map("b" + _) ++ (1 to 500).map("c" + _), k = 4096)
    val est = a.intersectionEstimate(b)
    assert(math.abs(est - 500.0) / 500.0 < 0.5,
      s"theta intersection $est vs 500")
    // difference estimate: ~50000 items unique to a
    val diff = a.differenceEstimate(b)
    assert(math.abs(diff - 50000.0) / 50000.0 < 0.1, s"difference $diff")
    // jaccard ≈ 500 / 100500
    val j = a.jaccardEstimate(b)
    assert(j > 0.0 && math.abs(j - 500.0 / 100500.0) < 0.005, s"jaccard $j")
  }

  test("merge is commutative, idempotent, and matches the single-pass sketch") {
    val xs = (1 to 5000).map("m" + _)
    val (l, r) = xs.splitAt(2000)
    val merged = sketch(l, 512).merge(sketch(r, 512))
    val direct = sketch(xs, 512)
    assert(merged.thetaLong == direct.thetaLong ||
      math.abs(merged.estimate - direct.estimate).toDouble / direct.estimate < 0.05)
    val ab = sketch(l, 512).merge(sketch(r, 512))
    val ba = sketch(r, 512).merge(sketch(l, 512))
    assert(ab.thetaLong == ba.thetaLong && ab.hashes.sameElements(ba.hashes))
    val self = direct.merge(direct)
    assert(self.estimate == direct.estimate)
  }

  test("byte round-trip preserves the sketch exactly") {
    val t = sketch((1 to 3000).map("r" + _), 512)
    val rt = Theta.fromBytes(Theta.toBytes(t))
    assert(rt.k == t.k && rt.thetaLong == t.thetaLong)
    assert(rt.hashes.sameElements(t.hashes))
  }

  test("k mismatch and tiny k are rejected") {
    intercept[IllegalArgumentException](Theta.empty(8))
    intercept[IllegalArgumentException](
      Theta.empty(16).merge(Theta.empty(32)))
  }

  test("mergeBytesUdaf folds per-key serialized sketches in a DataFrame") {
    import spark.implicits._
    val day1 = sketch(Seq("a", "b", "c"), 64)
    val day2 = sketch(Seq("b", "c", "d", "e"), 64)
    val df = Seq(("k1", Theta.toBytes(day1)), ("k1", Theta.toBytes(day2)))
      .toDF("key", "sketch")
    val merged = df.groupBy("key")
      .agg(Theta.mergeBytesUdaf(64)(col("sketch")).as("m"))
      .select("m").as[Array[Byte]].head()
    assert(Theta.fromBytes(merged).estimate == 5L) // a b c d e, exact mode
  }
}
