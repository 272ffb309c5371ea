package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-pattern blocklist scanning via Aho-Corasick (Aho & Corasick
  * 1975): one automaton over ALL patterns, one pass over each
  * document — O(text + matches) per doc regardless of pattern count,
  * vs O(text · patterns) for per-pattern contains(). The standard
  * ingest screen for banned phrases / compliance terms, where real
  * blocklists run to thousands of entries: the automaton (bounded by
  * total pattern length) is built once on the driver and broadcast;
  * the corpus is scanned once, never shuffled.
  *
  * Matches are counted at every ending position (the classic AC
  * output function), so overlapping occurrences of DIFFERENT patterns
  * all count, and a pattern overlapping itself ("aa" in "aaa") counts
  * once per end position.
  */
object Blocklist {

  /** Immutable, serializable automaton. Node 0 is the root; `next`
    * holds per-node goto edges, `fail` the failure links, `out` the
    * pattern indices ending at each node (own + inherited via fail).
    */
  final class Automaton private[Blocklist] (
      val patterns: Array[String],
      next: Array[Map[Char, Int]],
      fail: Array[Int],
      out: Array[Array[Int]]) extends Serializable {

    private def step(state: Int, c: Char): Int = {
      var s = state
      while (s != 0 && !next(s).contains(c)) s = fail(s)
      next(s).getOrElse(c, 0)
    }

    /** Per-pattern occurrence counts in one pass. */
    def countAll(text: String): Array[Long] = {
      val counts = new Array[Long](patterns.length)
      var s = 0
      var i = 0
      while (i < text.length) {
        s = step(s, text.charAt(i))
        val hits = out(s)
        var j = 0
        while (j < hits.length) { counts(hits(j)) += 1; j += 1 }
        i += 1
      }
      counts
    }

    /** Total occurrences across all patterns. */
    def countTotal(text: String): Long = countAll(text).sum

    /** Does any pattern occur? Early-exits on the first hit. */
    def containsAny(text: String): Boolean = {
      var s = 0
      var i = 0
      while (i < text.length) {
        s = step(s, text.charAt(i))
        if (out(s).nonEmpty) return true
        i += 1
      }
      false
    }
  }

  /** Build the goto/fail/output automaton (BFS over the trie). */
  def build(patterns: Seq[String]): Automaton = {
    require(patterns.nonEmpty, "empty blocklist")
    require(patterns.forall(_.nonEmpty), "empty pattern in blocklist")
    val pats = patterns.toArray
    val next = scala.collection.mutable.ArrayBuffer(Map.empty[Char, Int])
    val ownOut = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    pats.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        next(s).get(c) match {
          case Some(t) => s = t
          case None =>
            next += Map.empty
            ownOut += Nil
            next(s) = next(s) + (c -> (next.length - 1))
            s = next.length - 1
        }
      }
      ownOut(s) = pi :: ownOut(s)
    }
    val n = next.length
    val fail = new Array[Int](n)
    val out = Array.fill(n)(List.empty[Int])
    for (i <- 0 until n) out(i) = ownOut(i)
    val queue = scala.collection.mutable.Queue.empty[Int]
    next(0).values.foreach { s => fail(s) = 0; queue.enqueue(s) }
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      next(r).foreach { case (c, s) =>
        queue.enqueue(s)
        var f = fail(r)
        while (f != 0 && !next(f).contains(c)) f = fail(f)
        fail(s) = if (next(f).contains(c) && next(f)(c) != s) next(f)(c) else 0
        out(s) = out(s) ++ out(fail(s))
      }
    }
    new Automaton(pats, next.toArray, fail, out.map(_.toArray))
  }

  /** Per-document per-pattern hit counts: (id, pattern, n_hits), one
    * row per pattern that OCCURS (zero-count pairs are omitted — the
    * output is match-sized, not docs×patterns-sized). One corpus
    * scan against the broadcast automaton.
    */
  def matchCounts(docs: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(build(patterns))
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val ac = bc.value
        val counts = ac.countAll(if (text == null) "" else text)
        counts.indices.iterator.filter(counts(_) > 0)
          .map(i => (id, ac.patterns(i), counts(i)))
      }
      .toDF(idCol, "pattern", "n_hits")
  }

  /** Keep documents with at most `maxHits` total blocklist
    * occurrences (0 = the strict screen). Same single-scan shape.
    */
  def filterClean(docs: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String], maxHits: Long = 0L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(build(patterns))
    val total = docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        (id, bc.value.countTotal(if (text == null) "" else text))
      }
      .toDF("__rid", "__hits")
    docs.join(total.filter(col("__hits") <= maxHits)
        .select(col("__rid").as(idCol)),
      Seq(idCol), "left_semi")
  }
}
