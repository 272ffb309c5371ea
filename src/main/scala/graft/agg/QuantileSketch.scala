package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable quantile sketch — a deterministic variant of the KLL
  * compactor hierarchy (Karnin, Lang & Liberty '16 — public
  * algorithm). Completes the mergeable-summary family: [[Hll]]
  * distincts, [[FreqSketch]] heavy hitters, [[Cms]] point
  * frequencies, [[Theta]] distinct samples, and now rank/quantile
  * queries — per-key order statistics that fold across batches in the
  * `writeIncremental` idiom, which `approx_percentile` (sketch
  * discarded at query end) cannot do.
  *
  * Structure: level i holds items of weight 2^i in a buffer of
  * capacity `k`. Inserts land in level 0; an over-full level is
  * sorted and every second item promoted (halving count, doubling
  * weight). Where the paper flips a coin for the keep-parity, this
  * variant alternates parity per level deterministically — same
  * one-level rank perturbation of ≤ w/2 per compaction, but
  * reproducible across runs and engines (the property every gate in
  * this engine builds on). Empirical rank error stays ~1% of n at
  * k = 200 (QuantileSketchSpec pins it across distributions); the
  * randomized bound's constants no longer apply verbatim, so treat
  * `k` as the knob and the spec as the contract.
  *
  * Merge concatenates per-level buffers and re-compacts — associative
  * up to compaction order (both orders satisfy the same error bound;
  * byte-identical determinism holds for any FIXED fold order, e.g.
  * Spark's sorted-partition reduce).
  */
final case class Qsketch(k: Int, n: Long, levels: Vector[Vector[Double]],
    parities: Vector[Boolean]) {

  def add(x: Double): Qsketch = {
    require(!x.isNaN, "cannot add NaN")
    val l0 = if (levels.isEmpty) Vector(Vector(x))
             else levels.updated(0, levels(0) :+ x)
    Qsketch(k, n + 1, l0, if (parities.isEmpty) Vector(false) else parities)
      .compactAll()
  }

  def merge(other: Qsketch): Qsketch = {
    require(other.k == k, s"cannot merge Qsketch(k=$k) with Qsketch(k=${other.k})")
    val depth = math.max(levels.length, other.levels.length)
    val ls = Vector.tabulate(depth) { i =>
      levels.lift(i).getOrElse(Vector.empty) ++
        other.levels.lift(i).getOrElse(Vector.empty)
    }
    val ps = Vector.tabulate(depth) { i =>
      parities.lift(i).getOrElse(false) || other.parities.lift(i).getOrElse(false)
    }
    Qsketch(k, n + other.n, ls, ps).compactAll()
  }

  /** Compact every over-full level bottom-up: sort, keep alternate
    * items (parity flips per compaction), promote to the next level
    * at doubled weight.
    */
  private def compactAll(): Qsketch = {
    var ls = levels
    var ps = parities
    var i = 0
    while (i < ls.length) {
      if (ls(i).length > k) {
        val sorted = ls(i).sorted
        val keepOdd = ps(i)
        // the kept half promotes at doubled weight; the other half is
        // DISCARDED — that is the (bounded) lossy step of the sketch
        val kept = sorted.zipWithIndex.collect {
          case (v, j) if (j % 2 == 1) == keepOdd => v
        }
        ls = ls.updated(i, Vector.empty)
        ps = ps.updated(i, !keepOdd)
        if (i + 1 >= ls.length) {
          ls = ls :+ Vector.empty
          ps = ps :+ false
        }
        ls = ls.updated(i + 1, ls(i + 1) ++ kept)
      }
      i += 1
    }
    Qsketch(k, n, ls, ps)
  }

  /** All retained (value, weight) pairs, value-sorted. */
  private def weighted: Array[(Double, Long)] =
    levels.zipWithIndex.flatMap { case (buf, i) =>
      buf.map(v => (v, 1L << i))
    }.sortBy(_._1).toArray

  /** Estimated number of stream items ≤ x. */
  def rank(x: Double): Long = {
    var r = 0L
    weighted.foreach { case (v, w) => if (v <= x) r += w }
    r
  }

  /** Estimated p-quantile: the smallest retained value whose running
    * weight reaches p·n (p in [0, 1]).
    */
  def quantile(p: Double): Double = {
    require(p >= 0 && p <= 1, s"quantile out of range: $p")
    val w = weighted
    require(w.nonEmpty, "empty sketch")
    val target = p * n
    var cum = 0L
    var i = 0
    while (i < w.length) {
      cum += w(i)._2
      if (cum >= target) return w(i)._1
      i += 1
    }
    w.last._1
  }

  /** Retained item count (sketch size is O(k·log(n/k))). */
  def retained: Int = levels.map(_.length).sum
}

object Qsketch {

  def empty(k: Int): Qsketch = {
    require(k >= 8, s"k must be >= 8 for usable estimates, got $k")
    Qsketch(k, 0L, Vector.empty, Vector.empty)
  }

  /** Sketch-valued Aggregator over a numeric column. */
  def aggregator(k: Int = 200): Aggregator[Double, Qsketch, Qsketch] =
    new Aggregator[Double, Qsketch, Qsketch] {
      def zero: Qsketch = empty(k)
      def reduce(b: Qsketch, a: Double): Qsketch = b.add(a)
      def merge(a: Qsketch, b: Qsketch): Qsketch = a.merge(b)
      def finish(b: Qsketch): Qsketch = b
      def bufferEncoder: Encoder[Qsketch] = Encoders.kryo[Qsketch]
      def outputEncoder: Encoder[Qsketch] = Encoders.kryo[Qsketch]
    }

  /** Stable binary form: k, n, #levels, then per level (parity,
    * count, doubles) — big-endian.
    */
  def toBytes(q: Qsketch): Array[Byte] = {
    val size = 4 + 8 + 4 +
      q.levels.map(l => 1 + 4 + 8 * l.length).sum
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(q.k).putLong(q.n).putInt(q.levels.length)
    q.levels.zip(q.parities).foreach { case (l, p) =>
      bb.put(if (p) 1.toByte else 0.toByte).putInt(l.length)
      l.foreach(bb.putDouble)
    }
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Qsketch = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val n = bb.getLong
    val depth = bb.getInt
    val (ls, ps) = (0 until depth).map { _ =>
      val p = bb.get() == 1.toByte
      val cnt = bb.getInt
      (Vector.fill(cnt)(bb.getDouble), p)
    }.unzip
    Qsketch(k, n, ls.toVector, ps.toVector)
  }

  /** Untyped aggregate merging serialized sketches — per-key order
    * statistics that keep folding across batches (daily latency
    * distributions per endpoint, doc-length distributions per domain)
    * in O(k·log n) state per key.
    */
  def mergeBytesUdaf(k: Int = 200): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new Aggregator[Array[Byte], Qsketch, Array[Byte]] {
        def zero: Qsketch = empty(k)
        def reduce(b: Qsketch, a: Array[Byte]): Qsketch = b.merge(fromBytes(a))
        def merge(a: Qsketch, b: Qsketch): Qsketch = a.merge(b)
        def finish(b: Qsketch): Array[Byte] = toBytes(b)
        def bufferEncoder: Encoder[Qsketch] = Encoders.kryo[Qsketch]
        def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
      }, Encoders.BINARY)
}
