package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable HyperLogLog sketch — the reference's `hyperLogLog[T]`
  * returns the sketch object itself so stores can keep merging it
  * incrementally (ReduceOperations.scala:108-111, algebird HLL).
  *
  * Standard public HLL (Flajolet et al. '07): m = 2^p registers, each
  * the max leading-zero rank of hashed values routed to it; merge =
  * register-wise max (commutative, associative, idempotent — a true
  * monoid). `approximateUniqueCount`-style scalar estimates should use
  * Spark's built-in `approx_count_distinct`; this class exists for
  * sketch-VALUED pipelines (store the bytes, merge across batches —
  * the `writeIncremental` idiom).
  */
final case class Hll(p: Int, registers: Array[Byte]) {

  def m: Int = 1 << p

  def add(hash64: Long): Hll = {
    val idx = (hash64 >>> (64 - p)).toInt
    val rest = hash64 << p
    val rank = (java.lang.Long.numberOfLeadingZeros(rest | 1L) + 1).min(64 - p)
    if (rank > registers(idx)) {
      val r = registers.clone()
      r(idx) = rank.toByte
      Hll(p, r)
    } else this
  }

  def merge(other: Hll): Hll = {
    require(other.p == p, s"cannot merge HLL(p=$p) with HLL(p=${other.p})")
    val r = new Array[Byte](m)
    var i = 0
    while (i < m) {
      r(i) = math.max(registers(i), other.registers(i)).toByte
      i += 1
    }
    Hll(p, r)
  }

  /** Cardinality estimate with the standard small/large-range
    * corrections.
    */
  /** Inclusion–exclusion overlap estimate: |A∩B| ≈ |A| + |B| − |A∪B|
    * (the union is exact at the sketch level — register-wise max).
    * Relative error compounds (~3× the per-sketch error vs the UNION
    * size, so small intersections of huge sets are noisy — the known
    * HLL limitation; use a theta-style sample-and-intersect sketch
    * when that regime matters). Clamped at 0 since the difference can
    * go slightly negative under estimation noise.
    */
  def intersectionEstimate(other: Hll): Long =
    math.max(0L, estimate + other.estimate - merge(other).estimate)

  def estimate: Long = {
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += 1.0 / (1L << registers(i))
      if (registers(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m * m / invSum
    val corrected =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    math.round(corrected)
  }
}

object Hll {
  /** Reference default error 1% ⇒ p from the standard rsd ≈
    * 1.04/sqrt(m) relation (the reference's own bits formula is
    * ReduceOperations.scala:124-127).
    */
  def pForError(err: Double): Int = {
    val m = math.pow(1.04 / err, 2)
    math.max(4, math.ceil(math.log(m) / math.log(2)).toInt)
  }

  def empty(p: Int): Hll = Hll(p, new Array[Byte](1 << p))

  def hash(s: String): Long = {
    import scala.util.hashing.MurmurHash3
    (MurmurHash3.stringHash(s, 0x2e1b2141).toLong << 32) |
      (MurmurHash3.stringHash(s, 0x633b2b4a).toLong & 0xffffffffL)
  }

  /** Sketch-valued Aggregator: fold strings into an HLL, return the
    * mergeable sketch.
    */
  def aggregator(err: Double = 0.01): Aggregator[String, Hll, Hll] = {
    val p = pForError(err)
    new Aggregator[String, Hll, Hll] {
      def zero: Hll = empty(p)
      def reduce(b: Hll, a: String): Hll = b.add(hash(a))
      def merge(a: Hll, b: Hll): Hll = a.merge(b)
      def finish(b: Hll): Hll = b
      def bufferEncoder: Encoder[Hll] = Encoders.kryo[Hll]
      def outputEncoder: Encoder[Hll] = Encoders.kryo[Hll]
    }
  }

  /** Stable binary form (p + registers) for persisting sketches in a
    * versioned store's binary column — same idiom as
    * [[FreqSketch.toBytes]].
    */
  def toBytes(h: Hll): Array[Byte] = {
    val out = new Array[Byte](1 + h.registers.length)
    out(0) = h.p.toByte
    System.arraycopy(h.registers, 0, out, 1, h.registers.length)
    out
  }

  def fromBytes(bytes: Array[Byte]): Hll =
    Hll(bytes(0).toInt, java.util.Arrays.copyOfRange(bytes, 1, bytes.length))

  /** Untyped aggregate merging serialized sketches — the `merge`
    * column for `VersionedKeyValStore.writeIncremental`, so per-key
    * distinct counts (daily uniques per domain, per language, …) fold
    * forever in O(2^p) state per key with the rsd bound intact.
    */
  def mergeBytesUdaf(err: Double = 0.01): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val p = pForError(err)
    org.apache.spark.sql.functions.udaf(
      new Aggregator[Array[Byte], Hll, Array[Byte]] {
        def zero: Hll = empty(p)
        def reduce(b: Hll, a: Array[Byte]): Hll = b.merge(fromBytes(a))
        def merge(a: Hll, b: Hll): Hll = a.merge(b)
        def finish(b: Hll): Array[Byte] = toBytes(b)
        def bufferEncoder: Encoder[Hll] = Encoders.kryo[Hll]
        def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
      }, Encoders.BINARY)
  }

  /** Estimate-valued variant for direct use in typed pipelines. */
  def countAggregator(err: Double = 0.01): Aggregator[String, Hll, Long] = {
    val p = pForError(err)
    new Aggregator[String, Hll, Long] {
      def zero: Hll = empty(p)
      def reduce(b: Hll, a: String): Hll = b.add(hash(a))
      def merge(a: Hll, b: Hll): Hll = a.merge(b)
      def finish(b: Hll): Long = b.estimate
      def bufferEncoder: Encoder[Hll] = Encoders.kryo[Hll]
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }
  }
}
