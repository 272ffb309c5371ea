package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{Encoder, Encoders}
import graft.agg._

/** Monoid laws + aggregator semantics (the reference's algebird-law
  * reliance, AlgebraicReductionsTest.scala).
  */
class AggregatorsSpec extends AnyFunSuite {

  private def laws[T](m: Monoid[T], samples: Seq[T]): Unit = {
    for (a <- samples; b <- samples; c <- samples) {
      assert(m.plus(m.plus(a, b), c) == m.plus(a, m.plus(b, c)), "associativity")
    }
    samples.foreach { a =>
      assert(m.plus(m.zero, a) == a, "left identity")
      assert(m.plus(a, m.zero) == a, "right identity")
    }
  }

  test("numeric / collection monoid laws") {
    laws(Monoid.longMonoid, Seq(-3L, 0L, 7L, 100L))
    laws(Monoid.doubleMonoid, Seq(-1.5, 0.0, 2.25))
    laws(Monoid.listMonoid[Int], Seq(Nil, List(1), List(2, 3)))
    laws(Monoid.setMonoid[Int], Seq(Set.empty[Int], Set(1), Set(1, 2)))
    laws(Monoid.mapMonoid[String, Long], Seq(
      Map.empty[String, Long], Map("a" -> 1L), Map("a" -> 2L, "b" -> 3L)))
  }

  test("map monoid merges values by semigroup") {
    val m = Monoid.mapMonoid[String, Long]
    assert(m.plus(Map("a" -> 1L, "b" -> 2L), Map("a" -> 10L, "c" -> 3L)) ==
      Map("a" -> 11L, "b" -> 2L, "c" -> 3L))
  }

  test("moments merge matches direct computation") {
    val xs = Seq(1.0, 2.0, 3.0, 4.0, 10.0)
    val (l, r) = xs.splitAt(2)
    def of(s: Seq[Double]) = s.map(x => Aggregators.Moments(1, x, 0.0))
      .reduce(Aggregators.momentsMonoid.plus)
    val merged = Aggregators.momentsMonoid.plus(of(l), of(r))
    val mean = xs.sum / xs.size
    val variance = xs.map(x => (x - mean) * (x - mean)).sum / xs.size
    assert(merged.count == 5)
    assert(math.abs(merged.mean - mean) < 1e-12)
    assert(math.abs(merged.variance - variance) < 1e-12)
  }

  test("averaged value merges to the true mean") {
    val xs = Seq(1.0, 2.0, 3.0, 10.0)
    val (l, r) = xs.splitAt(1)
    def of(s: Seq[Double]) = s.map(Aggregators.AveragedValue(1L, _))
      .reduce(Aggregators.averagedMonoid.plus)
    val merged = Aggregators.averagedMonoid.plus(of(l), of(r))
    assert(merged.count == 4)
    assert(math.abs(merged.value - 4.0) < 1e-12)
  }

  test("decayed value halves over one half-life, any merge order") {
    import Aggregators.DecayedValue
    val hl = 10.0
    val a = DecayedValue.build(8.0, 0.0, hl) // at t=0
    val b = DecayedValue.build(1.0, 10.0, hl) // one half-life later
    val ab = DecayedValue.monoid.plus(a, b)
    val ba = DecayedValue.monoid.plus(b, a)
    // 8 decayed to 4 plus the fresh 1
    assert(math.abs(ab.value - 5.0) < 1e-9)
    assert(ab == ba) // commutative
    // associative across a third point
    val c = DecayedValue.build(2.0, 20.0, hl)
    val abc1 = DecayedValue.monoid.plus(DecayedValue.monoid.plus(a, b), c)
    val abc2 = DecayedValue.monoid.plus(a, DecayedValue.monoid.plus(b, c))
    assert(math.abs(abc1.value - abc2.value) < 1e-9)
    // 8→2, 1→0.5, +2 = 4.5
    assert(math.abs(abc1.value - 4.5) < 1e-9)
  }

  test("sortedTake keeps k smallest in order under arbitrary merge trees") {
    implicit val intEnc: Encoder[Int] = Encoders.scalaInt
    val agg = Aggregators.sortedTake[Int](3)
    val xs = Seq(9, 1, 8, 4, 7, 3, 2, 6, 5)
    // sequential reduce
    val seqBuf = xs.foldLeft(agg.zero)(agg.reduce)
    assert(seqBuf == Seq(1, 2, 3))
    // split-merge
    val (a, b) = xs.splitAt(4)
    val merged = agg.merge(
      a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
    assert(merged == Seq(1, 2, 3))
    // reversed ordering = top-k
    val top = Aggregators.sortedTake[Int](3)(
      implicitly, implicitly, Ordering.Int.reverse)
    assert(xs.foldLeft(top.zero)(top.reduce) == Seq(9, 8, 7))
  }

  test("FreqSketch: exact total, bounded undercount, no false negatives") {
    // Zipf-ish stream: item i appears 1000/i times, over a long
    // uniform tail — far more distinct items than counters.
    val stream = new scala.util.Random(7).shuffle(
      (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"head$i")) ++
        (1 to 2000).map(i => s"tail$i"))
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size.toLong
    val k = 20

    def check(sk: FreqSketch): Unit = {
      assert(sk.total == n)
      assert(sk.counters.size <= 2 * k)
      assert(sk.errorBound == n / (k + 1))
      sk.counters.foreach { case (t, c) =>
        assert(c <= truth(t), s"$t overcounted: $c > ${truth(t)}")
        assert(truth(t) - c <= sk.errorBound,
          s"$t undercount ${truth(t) - c} > bound ${sk.errorBound}")
      }
      // the heavy-hitter guarantee: true count above the error bound
      // ⇒ the item is tracked
      truth.foreach { case (t, c) =>
        if (c > sk.errorBound)
          assert(sk.counters.contains(t), s"lost heavy hitter $t ($c)")
      }
    }

    check(stream.foldLeft(FreqSketch.empty(k))(_.add(_)))
    // arbitrary merge tree keeps every guarantee
    val parts = stream.grouped(700).toSeq
      .map(_.foldLeft(FreqSketch.empty(k))(_.add(_)))
    check(parts.reduce(_.merge(_)))
  }
}
