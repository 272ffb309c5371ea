package graft

import graft.agg.Cms
import org.apache.spark.sql.functions._

/** Count–Min sketch: guarantee bounds vs exact counts, linearity
  * (partition-order independence), byte round-trip, inner-product
  * upper bound, and the udaf merge path.
  */
class CmsSpec extends SparkSpec {

  // deterministic skewed stream: item i appears ~N/i times (Zipf-ish)
  private val stream: Seq[String] =
    (1 to 100).flatMap(i => Seq.fill(1 + 2000 / i)(s"item$i"))

  private val exact: Map[String, Long] =
    stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("estimate is an upper bound and within eps*total for all keys") {
    val c = stream.foldLeft(Cms.empty(0.005, 0.001))(_.add(_))
    assert(c.total == stream.size)
    val bound = c.errorBound
    exact.foreach { case (k, n) =>
      val est = c.estimate(k)
      assert(est >= n, s"$k: est $est < exact $n")
      assert(est <= n + bound, s"$k: est $est > exact $n + $bound")
    }
    // an absent key estimates at most the error bound
    assert(c.estimate("never-seen") <= bound)
  }

  test("sketch is linear: any partition-merge equals the sequential build") {
    val seq = stream.foldLeft(Cms.empty(3, 64))(_.add(_))
    val parts = stream.grouped(97).toSeq.map(
      _.foldLeft(Cms.empty(3, 64))(_.add(_)))
    val merged = parts.reduce(_.merge(_))
    assert(merged.total == seq.total)
    assert(merged.table.sameElements(seq.table))
  }

  test("byte round-trip preserves the sketch exactly") {
    val c = stream.take(500).foldLeft(Cms.empty(4, 32))(_.add(_))
    val rt = Cms.fromBytes(Cms.toBytes(c))
    assert(rt.depth == c.depth && rt.width == c.width && rt.total == c.total)
    assert(rt.table.sameElements(c.table))
  }

  test("weighted adds count weight, reject negative weight") {
    val c = Cms.empty(3, 16).add("x", 10L).add("y", 5L)
    assert(c.total == 15L)
    assert(c.estimate("x") >= 10L)
    intercept[IllegalArgumentException](c.add("z", -1L))
  }

  test("inner product upper-bounds the exact join size") {
    val a = stream.foldLeft(Cms.empty(5, 256))(_.add(_))
    val other = (1 to 50).flatMap(i => Seq.fill(i)(s"item$i"))
    val b = other.foldLeft(Cms.empty(5, 256))(_.add(_))
    val exactDot = exact.map { case (k, n) =>
      n * other.count(_ == k)
    }.sum
    val est = a.innerProductEstimate(b)
    assert(est >= exactDot, s"inner product $est < exact $exactDot")
    // sanity: within eps*|A|*|B| of exact (e/width = ~1.06%)
    val tol = math.ceil(math.E / 256.0 * a.total * b.total).toLong
    assert(est <= exactDot + tol)
  }

  test("dimension mismatch is rejected") {
    intercept[IllegalArgumentException](
      Cms.empty(3, 16).merge(Cms.empty(3, 32)))
    intercept[IllegalArgumentException](
      Cms.empty(3, 16).innerProductEstimate(Cms.empty(4, 16)))
  }

  test("dims follows the standard (eps, delta) sizing") {
    val (d, w) = Cms.dims(0.001, 0.01)
    assert(w == math.ceil(math.E / 0.001).toInt)
    assert(d == math.ceil(math.log(100.0)).toInt)
  }

  test("mergeBytesUdaf folds per-key serialized sketches in a DataFrame") {
    import spark.implicits._
    // two "days" of per-domain sketches, merged by the udaf; the merged
    // estimate must equal a sketch built over the union (linearity).
    val (eps, delta) = (0.1, 0.05)
    val (d, w) = Cms.dims(eps, delta)
    val day1 = Seq("a", "a", "b").foldLeft(Cms.empty(d, w))(_.add(_))
    val day2 = Seq("a", "c").foldLeft(Cms.empty(d, w))(_.add(_))
    val df = Seq(("d1", Cms.toBytes(day1)), ("d1", Cms.toBytes(day2)))
      .toDF("domain", "sketch")
    val merged = df.groupBy("domain")
      .agg(Cms.mergeBytesUdaf(eps, delta)(col("sketch")).as("merged"))
      .select("merged").as[Array[Byte]].head()
    val all = Seq("a", "a", "b", "a", "c").foldLeft(Cms.empty(d, w))(_.add(_))
    assert(Cms.fromBytes(merged).table.sameElements(all.table))
    assert(Cms.fromBytes(merged).total == all.total)
  }
}
