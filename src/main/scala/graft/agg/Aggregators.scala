package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.reflect.ClassTag

/** Spark `Aggregator`s replacing the reference's algebird machinery.
  *
  * The reference expresses *every* aggregation as
  * `mapReduceMap[T,X,U]` (map → commutative reduce → present,
  * ReduceOperations.scala:46-62), executed as Cascading `AggregateBy`
  * with a map-side cache (Operations.scala:303-363). Spark's
  * `Aggregator[IN,BUF,OUT]` is the same contract (prepare ↔ reduce-in,
  * reduce ↔ merge, present ↔ finish) and Catalyst plans partial+final
  * hash aggregation automatically — so one generic class per algebra
  * covers dozens of reference ops at full scale.
  */
object Aggregators {

  /** Typed `Seq[T]` encoder derived from the element encoder, so
    * list-valued aggregator columns surface as Catalyst `array<...>`
    * (downstream Column ops stay in Tungsten) instead of opaque kryo
    * binary.
    */
  def seqEncoder[T](implicit et: Encoder[T]): Encoder[Seq[T]] = {
    import org.apache.spark.sql.catalyst.encoders.{encoderFor, ExpressionEncoder}
    import org.apache.spark.sql.catalyst.encoders.AgnosticEncoders.IterableEncoder
    val elem = encoderFor(et).encoder
    ExpressionEncoder(IterableEncoder(
      scala.reflect.classTag[Seq[T]], elem, elem.nullable,
      lenientSerialization = false))
  }

  /** [[seqEncoder]] deserializing to `List` (Grouped.toList). */
  def listEncoder[T](implicit et: Encoder[T]): Encoder[List[T]] = {
    import org.apache.spark.sql.catalyst.encoders.{encoderFor, ExpressionEncoder}
    import org.apache.spark.sql.catalyst.encoders.AgnosticEncoders.IterableEncoder
    val elem = encoderFor(et).encoder
    ExpressionEncoder(IterableEncoder(
      scala.reflect.classTag[List[T]], elem, elem.nullable,
      lenientSerialization = false))
  }

  /** `sum[T: Semigroup]` over any monoid (numbers, maps, sets, lists,
    * sketches — ReduceOperations.scala:327-352). Map-side partial
    * aggregation comes from Spark's partial/final planning.
    */
  def monoidSum[T: Encoder](implicit m: Monoid[T]): Aggregator[T, T, T] =
    new Aggregator[T, T, T] {
      def zero: T = m.zero
      def reduce(b: T, a: T): T = m.plus(b, a)
      def merge(b1: T, b2: T): T = m.plus(b1, b2)
      def finish(b: T): T = b
      def bufferEncoder: Encoder[T] = implicitly[Encoder[T]]
      def outputEncoder: Encoder[T] = implicitly[Encoder[T]]
    }

  /** General `aggregate(Aggregator[A,B,C])` (ReduceOperations.scala:69):
    * prepare/reduce/present with an explicit monoid on the buffer.
    */
  def mapReduceMap[A, B: Encoder, C: Encoder](prepare: A => B, present: B => C)(
      implicit m: Monoid[B]): Aggregator[A, B, C] =
    new Aggregator[A, B, C] {
      def zero: B = m.zero
      def reduce(b: B, a: A): B = m.plus(b, prepare(a))
      def merge(b1: B, b2: B): B = m.plus(b1, b2)
      def finish(b: B): C = present(b)
      def bufferEncoder: Encoder[B] = implicitly[Encoder[B]]
      def outputEncoder: Encoder[C] = implicitly[Encoder[C]]
    }

  /** Bounded per-group top-k (`sortedTake`/`sortWithTake`,
    * ReduceOperations.scala:420-444): a PriorityQueue-monoid
    * aggregation that keeps at most k elements per task, so the
    * shuffle carries k rows per group instead of all rows — the
    * scalable alternative to a window `row_number() <= k` full sort.
    * Ordering: ascending `ord`; the k smallest survive (pass
    * `ord.reverse` for top-by-descending).
    */
  def sortedTake[T: Encoder: ClassTag](k: Int)(
      implicit ord: Ordering[T]): Aggregator[T, Seq[T], Seq[T]] =
    new Aggregator[T, Seq[T], Seq[T]] {
      // Buffer is a sorted Vector of ≤ k elements; k is small by
      // contract (reference switches strategy at k >= 1000,
      // Matrix.scala:296-309).
      def zero: Seq[T] = Vector.empty[T]
      def reduce(b: Seq[T], a: T): Seq[T] =
        if (b.length >= k && ord.gteq(a, b.last)) b
        else insert(b, a)
      def merge(b1: Seq[T], b2: Seq[T]): Seq[T] = {
        val merged = (b1 ++ b2).sorted(ord)
        if (merged.length > k) merged.take(k) else merged
      }
      def finish(b: Seq[T]): Seq[T] = b
      private def insert(b: Seq[T], a: T): Seq[T] = {
        val i = b.indexWhere(x => ord.lt(a, x)) match {
          case -1 => b.length
          case j => j
        }
        val grown = (b.take(i) :+ a) ++ b.drop(i)
        if (grown.length > k) grown.take(k) else grown
      }
      def bufferEncoder: Encoder[Seq[T]] = seqEncoder[T]
      def outputEncoder: Encoder[Seq[T]] = seqEncoder[T]
    }

  /** One-pass (count, mean, variance) via parallel moment merging —
    * the reference's algebird `Moments` behind `sizeAveStdev`
    * (ReduceOperations.scala:192-195). Standard Chan/Welford parallel
    * update (public algorithm).
    */
  case class Moments(count: Long, mean: Double, m2: Double) {
    def variance: Double = if (count == 0) Double.NaN else m2 / count
    def stddev: Double = math.sqrt(variance)
  }

  implicit val momentsMonoid: Monoid[Moments] =
    Monoid.from(Moments(0L, 0.0, 0.0)) { (a, b) =>
      if (a.count == 0) b
      else if (b.count == 0) a
      else {
        val n = a.count + b.count
        val delta = b.mean - a.mean
        Moments(
          n,
          a.mean + delta * b.count / n,
          a.m2 + b.m2 + delta * delta * a.count * b.count / n)
      }
    }

  def moments: Aggregator[Double, Moments, Moments] =
    mapReduceMap[Double, Moments, Moments](
      x => Moments(1L, x, 0.0), identity)(
      Encoders.product[Moments], Encoders.product[Moments], momentsMonoid)

  /** Numerically-stable running mean — the reference's algebird
    * `AveragedValue` behind `average` (ReduceOperations.scala:83-84).
    */
  case class AveragedValue(count: Long, value: Double)

  implicit val averagedMonoid: Monoid[AveragedValue] =
    Monoid.from(AveragedValue(0L, 0.0)) { (a, b) =>
      if (a.count == 0) b
      else if (b.count == 0) a
      else {
        val n = a.count + b.count
        AveragedValue(n, a.value + (b.value - a.value) * b.count / n)
      }
    }

  def averaged: Aggregator[Double, AveragedValue, Double] =
    mapReduceMap[Double, AveragedValue, Double](
      x => AveragedValue(1L, x), _.value)(
      Encoders.product[AveragedValue], Encoders.scalaDouble, averagedMonoid)

  /** Exponentially time-decayed sum — the reference's algebird
    * `DecayedValue` (Kryo-registered aggregation value,
    * KryoHadoop.scala:79-121): each contribution decays with the
    * configured half-life; merging rescales both sides to the newer
    * timestamp, so the merge is associative and commutative.
    */
  case class DecayedValue(value: Double, scaledTime: Double)

  object DecayedValue {
    def build(value: Double, time: Double, halfLife: Double): DecayedValue =
      DecayedValue(value, time * math.log(2.0) / halfLife)

    implicit val monoid: Monoid[DecayedValue] =
      Monoid.from(DecayedValue(0.0, Double.NegativeInfinity)) { (a, b) =>
        if (a.scaledTime == Double.NegativeInfinity) b
        else if (b.scaledTime == Double.NegativeInfinity) a
        else {
          val (older, newer) =
            if (a.scaledTime <= b.scaledTime) (a, b) else (b, a)
          DecayedValue(
            newer.value + older.value * math.exp(older.scaledTime - newer.scaledTime),
            newer.scaledTime)
        }
      }
  }

  /** Decayed-sum aggregator over (value, epochTime) pairs. */
  def decayedSum(halfLife: Double): Aggregator[(Double, Double), DecayedValue, DecayedValue] =
    mapReduceMap[(Double, Double), DecayedValue, DecayedValue](
      { case (v, t) => DecayedValue.build(v, t, halfLife) }, identity)(
      Encoders.product[DecayedValue], Encoders.product[DecayedValue],
      DecayedValue.monoid)
}
