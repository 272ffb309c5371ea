package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable KMV / theta sketch (Bar-Yossef et al. '02 k-minimum
  * values; Dasgupta et al. '16 theta unification — public algorithms):
  * retain the k smallest distinct 64-bit hash values seen. Fourth
  * member of the mergeable-summary family ([[Hll]] distincts,
  * [[FreqSketch]] heavy hitters, [[Cms]] point frequencies): KMV also
  * estimates distincts, but unlike HLL its retained SAMPLE supports
  * direct set algebra — intersection and difference estimates stay
  * accurate for SMALL overlaps of large sets, exactly the regime
  * where HLL inclusion–exclusion degrades (the documented limitation
  * at [[Hll.intersectionEstimate]]).
  *
  * θ semantics: a sketch holding fewer than k values is EXACT (θ = 1,
  * every distinct hash retained); at k and beyond, θ is the (k+1)-th
  * smallest value's position in [0, 1) and the retained set is a
  * uniform sample of the distincts below θ. Merge intersects θs and
  * re-trims — a commutative, associative, idempotent monoid, so
  * sketches fold across batches/days like the other three (the
  * `writeIncremental` idiom).
  *
  * Hashes are compared UNSIGNED (the order every engine agrees on for
  * a 64-bit universe); normalization to [0, 1) uses the top 53 bits,
  * so arithmetic is plain double math on deterministic inputs.
  */
final case class Theta(k: Int, thetaLong: Long, hashes: Array[Long]) {

  import Theta.{unsignedLt, toUnit}

  /** θ as a fraction of the hash universe (1.0 = exact mode). */
  def theta: Double = toUnit(thetaLong)

  def isExact: Boolean = thetaLong == -1L // unsigned max = universe top

  /** The O(k) array insert below happens only when the item actually
    * enters the sketch — once full, P(enter) = θ ≈ k/n, so a stream of
    * n items performs ~k·ln(n/k) inserts total (harmonic sum); every
    * other add is the one unsigned compare against θ. Amortized O(1)
    * per item at any scale.
    */
  def add(hash64: Long): Theta = {
    if (!unsignedLt(hash64, thetaLong)) this
    else {
      val idx = Theta.search(hashes, hash64)
      if (idx >= 0) this // duplicate
      else {
        val at = -idx - 1
        val grown = new Array[Long](hashes.length + 1)
        System.arraycopy(hashes, 0, grown, 0, at)
        grown(at) = hash64
        System.arraycopy(hashes, at, grown, at + 1, hashes.length - at)
        Theta(k, thetaLong, grown).trim()
      }
    }
  }

  /** Keep the k smallest; the evicted (k+1)-th value becomes θ. */
  private def trim(): Theta =
    if (hashes.length <= k) this
    else Theta(k, hashes(k), java.util.Arrays.copyOf(hashes, k))

  def merge(other: Theta): Theta = {
    require(other.k == k, s"cannot merge Theta(k=$k) with Theta(k=${other.k})")
    val t = if (unsignedLt(thetaLong, other.thetaLong)) thetaLong
            else other.thetaLong
    val set = new java.util.TreeSet[java.lang.Long](Theta.unsignedOrder)
    hashes.foreach(h => if (unsignedLt(h, t)) set.add(h))
    other.hashes.foreach(h => if (unsignedLt(h, t)) set.add(h))
    val merged = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { merged(i) = it.next(); i += 1 }
    Theta(k, t, merged).trim()
  }

  /** Distinct-count estimate: exact below k, else |retained| / θ. */
  def estimate: Long =
    if (isExact) hashes.length
    else math.round(hashes.length / theta)

  /** Intersection estimate — the theta-sketch set operation: cut both
    * retained sets at θ∩ = min(θa, θb); the hashes present in BOTH are
    * a uniform θ∩-sample of the true intersection, so |A∩B| ≈
    * |common| / θ∩. Stays accurate when the intersection is a tiny
    * fraction of either set (relative error ~ 1/√|common|), where
    * HLL's |A|+|B|−|A∪B| difference-of-large-numbers blows up.
    */
  def intersectionEstimate(other: Theta): Long = {
    require(other.k == k, s"cannot intersect Theta(k=$k) with Theta(k=${other.k})")
    val t = if (unsignedLt(thetaLong, other.thetaLong)) thetaLong
            else other.thetaLong
    val mine = hashes.filter(h => unsignedLt(h, t))
    val common = other.hashes.count(h =>
      unsignedLt(h, t) && Theta.search(mine, h) >= 0)
    if (t == -1L) common.toLong
    else math.round(common / toUnit(t))
  }

  /** A-not-B estimate (distincts in this sketch absent from `other`). */
  def differenceEstimate(other: Theta): Long = {
    require(other.k == k, s"cannot diff Theta(k=$k) with Theta(k=${other.k})")
    val t = if (unsignedLt(thetaLong, other.thetaLong)) thetaLong
            else other.thetaLong
    val theirs = other.hashes.filter(h => unsignedLt(h, t))
    val only = hashes.count(h =>
      unsignedLt(h, t) && Theta.search(theirs, h) < 0)
    if (t == -1L) only.toLong
    else math.round(only / toUnit(t))
  }

  /** Jaccard similarity estimate over the θ∩-cut samples. */
  def jaccardEstimate(other: Theta): Double = {
    val inter = intersectionEstimate(other)
    val union = merge(other).estimate
    if (union == 0L) 0.0 else inter.toDouble / union
  }
}

object Theta {

  private[agg] def unsignedLt(a: Long, b: Long): Boolean =
    java.lang.Long.compareUnsigned(a, b) < 0

  private[agg] val unsignedOrder: java.util.Comparator[java.lang.Long] =
    (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.compareUnsigned(a, b)

  /** Map an unsigned 64-bit hash to [0, 1) via its top 53 bits.
    * thetaLong = -1 (unsigned max) maps to 1.0 by convention.
    */
  private[agg] def toUnit(h: Long): Double =
    if (h == -1L) 1.0 else (h >>> 11).toDouble / (1L << 53).toDouble

  /** Unsigned binary search (mirrors `Arrays.binarySearch` contract:
    * index if found, -(insertion point)-1 otherwise).
    */
  private[agg] def search(sorted: Array[Long], key: Long): Int = {
    var lo = 0
    var hi = sorted.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = java.lang.Long.compareUnsigned(sorted(mid), key)
      if (c < 0) lo = mid + 1
      else if (c > 0) hi = mid - 1
      else return mid
    }
    -(lo + 1)
  }

  def empty(k: Int): Theta = {
    require(k >= 16, s"k must be >= 16 for usable estimates, got $k")
    Theta(k, -1L, Array.empty)
  }

  /** Same 64-bit string hash as [[Hll.hash]], so the two sketch
    * families agree on item identity.
    */
  def hash(s: String): Long = Hll.hash(s)

  /** Sketch-valued Aggregator: fold strings into a KMV sketch. */
  def aggregator(k: Int = 1024): Aggregator[String, Theta, Theta] =
    new Aggregator[String, Theta, Theta] {
      def zero: Theta = empty(k)
      def reduce(b: Theta, a: String): Theta = b.add(hash(a))
      def merge(a: Theta, b: Theta): Theta = a.merge(b)
      def finish(b: Theta): Theta = b
      def bufferEncoder: Encoder[Theta] = Encoders.kryo[Theta]
      def outputEncoder: Encoder[Theta] = Encoders.kryo[Theta]
    }

  /** Stable binary form (k, thetaLong, count, hashes — big-endian). */
  def toBytes(t: Theta): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 + 4 + 8 * t.hashes.length)
    bb.putInt(t.k).putLong(t.thetaLong).putInt(t.hashes.length)
    t.hashes.foreach(bb.putLong)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Theta = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val tl = bb.getLong
    val n = bb.getInt
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = bb.getLong; i += 1 }
    Theta(k, tl, hs)
  }

  /** Untyped aggregate merging serialized sketches — the `merge`
    * column for `VersionedKeyValStore.writeIncremental`: per-key
    * distinct SAMPLES (not just counts) fold forever in O(k) state, so
    * downstream set algebra (overlap between any two days/domains)
    * stays a driver-side O(k) operation.
    */
  def mergeBytesUdaf(k: Int = 1024): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new Aggregator[Array[Byte], Theta, Array[Byte]] {
        def zero: Theta = empty(k)
        def reduce(b: Theta, a: Array[Byte]): Theta = b.merge(fromBytes(a))
        def merge(a: Theta, b: Theta): Theta = a.merge(b)
        def finish(b: Theta): Array[Byte] = toBytes(b)
        def bufferEncoder: Encoder[Theta] = Encoders.kryo[Theta]
        def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
      }, Encoders.BINARY)
}
