package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Count–Min sketch (Cormode & Muthukrishnan '05 — public
  * algorithm). Complements the two existing mergeable summaries: [[Hll]]
  * answers "how many DISTINCT", [[FreqSketch]] (Misra–Gries) answers
  * "which items are heavy" with lower-bounded counts, while Count–Min
  * answers "how often does item x occur" for ARBITRARY x with an
  * upper-bounded estimate, and estimates inner products between two
  * frequency vectors — the classic join-size estimator.
  *
  * Guarantees (depth d = ⌈ln 1/δ⌉ rows, width w = ⌈e/ε⌉ counters):
  * `estimate(x) ≥ true(x)` always (each row only ever over-counts via
  * collisions), and `estimate(x) ≤ true(x) + ε·total` with probability
  * ≥ 1−δ. Merge is element-wise addition — a commutative monoid — so
  * sketches fold across batches/days in the `writeIncremental` idiom
  * exactly like [[Hll.mergeBytesUdaf]] (reference analogue:
  * ReduceOperations.scala:108-111's sketch-valued aggregations).
  *
  * The table is a flat `Array[Long]` of d·w counters (row-major); per-row
  * hashing is seeded MurmurHash3, so estimates are deterministic across
  * runs and partitionings.
  */
final case class Cms(depth: Int, width: Int, total: Long, table: Array[Long]) {

  /** Additive error bound ε·total with ε = e/width. */
  def errorBound: Long =
    math.ceil(math.E / width * total).toLong

  private def bucket(row: Int, x: String): Int = {
    val h = scala.util.hashing.MurmurHash3.stringHash(x, Cms.rowSeed(row))
    // floor-mod keeps the bucket non-negative for negative hashes
    ((h % width) + width) % width
  }

  def add(x: String, w: Long = 1L): Cms = {
    require(w >= 0, s"negative weight: $w")
    val t = table.clone()
    var r = 0
    while (r < depth) {
      t(r * width + bucket(r, x)) += w
      r += 1
    }
    Cms(depth, width, total + w, t)
  }

  /** Point estimate: min over rows — an upper bound on the true count. */
  def estimate(x: String): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = table(r * width + bucket(r, x))
      if (c < best) best = c
      r += 1
    }
    if (best == Long.MaxValue) 0L else best
  }

  def merge(other: Cms): Cms = {
    require(other.depth == depth && other.width == width,
      s"cannot merge Cms(${depth}x$width) with Cms(${other.depth}x${other.width})")
    val t = new Array[Long](table.length)
    var i = 0
    while (i < table.length) {
      t(i) = table(i) + other.table(i)
      i += 1
    }
    Cms(depth, width, total + other.total, t)
  }

  /** Inner-product estimate Σ_x fA(x)·fB(x): min over rows of the
    * row-wise dot product — an upper bound on the true inner product,
    * within ε·|A|·|B| with probability ≥ 1−δ. This is the classic
    * sketch-based equi-join SIZE estimator (|A ⋈ B| for single-column
    * keys), usable to pick broadcast-vs-shuffle before running the join.
    */
  def innerProductEstimate(other: Cms): Long = {
    require(other.depth == depth && other.width == width,
      s"cannot dot Cms(${depth}x$width) with Cms(${other.depth}x${other.width})")
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      var sum = 0L
      var c = 0
      while (c < width) {
        sum += table(r * width + c) * other.table(r * width + c)
        c += 1
      }
      if (sum < best) best = sum
      r += 1
    }
    if (best == Long.MaxValue) 0L else best
  }
}

object Cms {

  private[agg] def rowSeed(row: Int): Int = 0x7f4a7c15 + row * 0x9e3779b9

  /** Standard sizing: width = ⌈e/ε⌉ (additive error ε·total),
    * depth = ⌈ln 1/δ⌉ (failure probability δ).
    */
  def dims(eps: Double, delta: Double): (Int, Int) = {
    require(eps > 0 && eps < 1, s"eps out of range: $eps")
    require(delta > 0 && delta < 1, s"delta out of range: $delta")
    (math.ceil(math.log(1.0 / delta)).toInt.max(1),
      math.ceil(math.E / eps).toInt.max(1))
  }

  def empty(depth: Int, width: Int): Cms = {
    require(depth > 0 && width > 0, s"bad dims ${depth}x$width")
    Cms(depth, width, 0L, new Array[Long](depth * width))
  }

  def empty(eps: Double, delta: Double): Cms = {
    val (d, w) = dims(eps, delta)
    empty(d, w)
  }

  /** Sketch-valued Aggregator: fold strings into a CMS, return the
    * mergeable sketch (same shape as [[Hll.aggregator]]).
    */
  def aggregator(eps: Double = 0.001, delta: Double = 0.01): Aggregator[String, Cms, Cms] = {
    val (d, w) = dims(eps, delta)
    new Aggregator[String, Cms, Cms] {
      def zero: Cms = empty(d, w)
      def reduce(b: Cms, a: String): Cms = b.add(a)
      def merge(a: Cms, b: Cms): Cms = a.merge(b)
      def finish(b: Cms): Cms = b
      def bufferEncoder: Encoder[Cms] = Encoders.kryo[Cms]
      def outputEncoder: Encoder[Cms] = Encoders.kryo[Cms]
    }
  }

  /** Stable binary form (depth, width, total, counters — big-endian)
    * for persisting sketches in a versioned store's binary column.
    */
  def toBytes(c: Cms): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 4 + 8 + 8 * c.table.length)
    bb.putInt(c.depth).putInt(c.width).putLong(c.total)
    c.table.foreach(bb.putLong)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Cms = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val d = bb.getInt
    val w = bb.getInt
    val total = bb.getLong
    val t = new Array[Long](d * w)
    var i = 0
    while (i < t.length) { t(i) = bb.getLong; i += 1 }
    Cms(d, w, total, t)
  }

  /** Untyped aggregate merging serialized sketches — the `merge` column
    * for `VersionedKeyValStore.writeIncremental`, so per-key frequency
    * tables (token counts per domain, event counts per user cohort, …)
    * fold forever in O(d·w) state per key with the (ε, δ) bound intact.
    */
  def mergeBytesUdaf(eps: Double = 0.001, delta: Double = 0.01): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val (d, w) = dims(eps, delta)
    org.apache.spark.sql.functions.udaf(
      new Aggregator[Array[Byte], Cms, Array[Byte]] {
        def zero: Cms = empty(d, w)
        def reduce(b: Cms, a: Array[Byte]): Cms = b.merge(fromBytes(a))
        def merge(a: Cms, b: Cms): Cms = a.merge(b)
        def finish(b: Cms): Array[Byte] = toBytes(b)
        def bufferEncoder: Encoder[Cms] = Encoders.kryo[Cms]
        def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
      }, Encoders.BINARY)
  }
}
