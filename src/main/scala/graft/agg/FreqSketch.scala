package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra-Gries frequency summary (Misra & Gries '82;
  * mergeability per Agarwal et al., "Mergeable Summaries", PODS '12 —
  * public algorithms). Like [[Hll]], the sketch itself is the
  * aggregation value, so stores can keep merging it incrementally
  * (the reference's sketch-valued `writeIncremental` idiom,
  * ReduceOperations.scala:108-111 for the HLL analogue).
  *
  * Invariants: `total` is the EXACT number of adds (weights summed);
  * every counter is a lower bound on its item's true count; the
  * undercount of any item is at most `total / (k + 1)` — each
  * compaction that subtracts m from the surviving counters removes at
  * least m·(k+1) mass, and no more than `total` mass can ever be
  * removed. Consequently every item with true count > total/(k+1) is
  * guaranteed present in `counters` (no false negatives above the
  * error bound) — the property heavy-hitter pipelines build on.
  *
  * The counter map is allowed to grow to 2k between compactions so the
  * O(size·log size) selection of the (k+1)-th largest count amortizes
  * to O(log k) per distinct insertion; the bound above is independent
  * of the buffer size.
  */
final case class FreqSketch(k: Int, total: Long, counters: Map[String, Long]) {

  /** Maximum undercount of any counter (and of any absent item). */
  def errorBound: Long = total / (k + 1)

  /** Lower bound on the true count of `x` (0 if not tracked). */
  def lowerBound(x: String): Long = counters.getOrElse(x, 0L)

  def add(x: String, w: Long = 1L): FreqSketch =
    FreqSketch.compact(
      FreqSketch(k, total + w,
        counters.updated(x, counters.getOrElse(x, 0L) + w)), k)

  def merge(other: FreqSketch): FreqSketch = {
    require(other.k == k,
      s"cannot merge FreqSketch(k=$k) with FreqSketch(k=${other.k})")
    val combined = other.counters.foldLeft(counters) {
      case (m, (t, n)) => m.updated(t, m.getOrElse(t, 0L) + n)
    }
    FreqSketch.compact(FreqSketch(k, total + other.total, combined), k)
  }
}

object FreqSketch {

  def empty(k: Int): FreqSketch = {
    require(k > 0, s"need at least one counter, got $k")
    FreqSketch(k, 0L, Map.empty)
  }

  /** If more than 2k counters are live, subtract the (k+1)-th largest
    * count from every counter and drop the non-positive ones — at most
    * k survive. (Classic MG decrements by 1 per overflowing add; the
    * batch form subtracts once per ~k distinct insertions with the
    * same total-mass accounting.)
    */
  private[agg] def compact(s: FreqSketch, k: Int): FreqSketch =
    if (s.counters.size <= 2 * k) s
    else {
      val m = s.counters.valuesIterator.toArray.sortBy(-_).apply(k)
      FreqSketch(s.k, s.total,
        s.counters.collect { case (t, n) if n > m => (t, n - m) })
    }

  /** Sketch-valued Aggregator: Catalyst plans it partial/final, so the
    * shuffle carries at most 2k counters per task instead of the full
    * vocabulary.
    */
  def aggregator(k: Int): Aggregator[String, FreqSketch, FreqSketch] =
    new Aggregator[String, FreqSketch, FreqSketch] {
      def zero: FreqSketch = empty(k)
      def reduce(b: FreqSketch, a: String): FreqSketch = b.add(a)
      def merge(a: FreqSketch, b: FreqSketch): FreqSketch = a.merge(b)
      def finish(b: FreqSketch): FreqSketch = b
      def bufferEncoder: Encoder[FreqSketch] = Encoders.kryo[FreqSketch]
      def outputEncoder: Encoder[FreqSketch] = Encoders.kryo[FreqSketch]
    }

  /** Stable binary form for persisting sketches in stores (versioned
    * parquet binary column): k, total, then (term, count) pairs.
    */
  def toBytes(s: FreqSketch): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(s.k)
    out.writeLong(s.total)
    out.writeInt(s.counters.size)
    s.counters.foreach { case (t, n) => out.writeUTF(t); out.writeLong(n) }
    out.flush()
    bos.toByteArray
  }

  def fromBytes(bytes: Array[Byte]): FreqSketch = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val k = in.readInt()
    val total = in.readLong()
    val size = in.readInt()
    val counters = (1 to size).map(_ => (in.readUTF(), in.readLong())).toMap
    FreqSketch(k, total, counters)
  }

  /** Untyped (DataFrame) aggregate merging serialized sketches — the
    * `merge` column for `VersionedKeyValStore.writeIncremental`, so a
    * store can keep folding per-batch sketches forever with the
    * error bound intact.
    */
  def mergeBytesUdaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new Aggregator[Array[Byte], FreqSketch, Array[Byte]] {
        def zero: FreqSketch = empty(k)
        def reduce(b: FreqSketch, a: Array[Byte]): FreqSketch =
          b.merge(fromBytes(a))
        def merge(a: FreqSketch, b: FreqSketch): FreqSketch = a.merge(b)
        def finish(b: FreqSketch): Array[Byte] = toBytes(b)
        def bufferEncoder: Encoder[FreqSketch] = Encoders.kryo[FreqSketch]
        def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
      }, Encoders.BINARY)
}
