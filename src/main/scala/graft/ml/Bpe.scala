package graft.ml

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) vocabulary induction — the
  * tokenizer-training step of a pretraining pipeline.
  *
  * Shape matters more than the loop body: the corpus is reduced ONCE
  * to a (word, count) frequency table (one shuffle over the token
  * stream — the only pass whose cost scales with corpus size), and all
  * `nMerges` iterations then run over that small vocabulary table.
  * Each iteration is one partial/final aggregation over weighted
  * symbol pairs plus a broadcast-applied merge; lineage is cut by
  * re-persisting the symbol table each round (the reference's
  * iterative-job idiom, Job.next / examples/PageRank.scala:54-81,
  * restated as a driver loop).
  *
  * Determinism contract: merge selection orders by (count desc, left
  * asc, right asc), so the learned merge list is exactly reproducible
  * — the gate can hash it.
  */
object Bpe {

  /** End-of-word sentinel appended to each word's symbol sequence
    * (standard BPE, so merges don't cross word boundaries).
    */
  val Eow = "</w>"

  final case class Merge(rank: Int, left: String, right: String)

  /** Learn `nMerges` merges from a corpus of documents. */
  def train(docs: Dataset[String], nMerges: Int): Seq[Merge] = {
    val spark = docs.sparkSession
    val words = wordCounts(docs)
    trainFromCounts(spark, words, nMerges)
  }

  /** One corpus-sized pass: whitespace words of normalized text →
    * (word, count). Everything after this runs on the vocabulary.
    */
  def wordCounts(docs: Dataset[String]): Dataset[(String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.flatMap(t => t.toLowerCase.split("\\s+").iterator.filter(_.nonEmpty))
      .groupByKey(identity).count()
  }

  /** The merge loop over a (word, count) table. */
  def trainFromCounts(spark: SparkSession, words: Dataset[(String, Long)],
      nMerges: Int): Seq[Merge] = {
    import spark.implicits._

    var symbols: Dataset[(Array[String], Long)] = words
      .map { case (w, c) => (w.map(_.toString).toArray :+ Eow, c) }
      .persist()
    symbols.count() // materialize before the loop

    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var i = 0
    var done = false
    while (i < nMerges && !done) {
      // weighted adjacent-pair counts: partial/final agg, vocabulary-
      // sized shuffle
      val best = symbols.flatMap { case (syms, c) =>
        (0 until syms.length - 1).iterator.map(j => (syms(j), syms(j + 1), c))
      }
        .toDF("l", "r", "c")
        .groupBy("l", "r").agg(sum("c").as("n"))
        // TakeOrderedAndProject: global top-1, no full sort materialized
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .head(1)

      if (best.isEmpty) done = true
      else {
        val (l, r) = (best.head.getString(0), best.head.getString(1))
        merges += Merge(i, l, r)
        val bl = l; val br = r // stable locals for the closure
        val next = symbols
          .map { case (syms, c) => (applyMerge(syms, bl, br), c) }
          .persist()
        next.count() // materialize, then drop the previous lineage
        symbols.unpersist(blocking = false)
        symbols = next
        i += 1
      }
    }
    symbols.unpersist(blocking = false)
    merges.toSeq
  }

  /** Replace every adjacent (l, r) with l+r, left-to-right greedy —
    * the standard single-merge application.
    */
  def applyMerge(syms: Array[String], l: String, r: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
        out += (l + r); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.toArray
  }

  /** Segment a word with a learned merge list (ranked greedy: apply
    * merges in rank order) — the encode side of the tokenizer.
    */
  def encodeWord(word: String, merges: Seq[Merge]): Array[String] = {
    var syms = word.toLowerCase.map(_.toString).toArray :+ Eow
    merges.sortBy(_.rank).foreach(m => syms = applyMerge(syms, m.left, m.right))
    syms
  }

  /** Distributed tokenizer application: encode every document with a
    * learned merge list. Returns (id, tokens).
    *
    * Scale shape: the ranked merge table is tiny (`nMerges` rows) and
    * ships inside the task closure, so encoding is a single
    * mapPartitions scan — no shuffle at any corpus size. Within a
    * partition the per-word merge loop is memoized per *distinct*
    * word (capped at 100k entries, the reference's map-side cache
    * constant, GroupBuilder.scala:83), so hot vocabulary words are
    * segmented once per partition rather than once per occurrence.
    */
  def encode(docs: Dataset[(Long, String)],
      merges: Seq[Merge]): Dataset[(Long, Array[String])] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranked = merges.sortBy(_.rank).map(m => (m.left, m.right)).toArray
    docs.mapPartitions { it =>
      val memo = new java.util.HashMap[String, Array[String]]()
      def enc(word: String): Array[String] = {
        val hit = memo.get(word)
        if (hit != null) hit
        else {
          var syms = word.map(_.toString).toArray :+ Eow
          var i = 0
          while (i < ranked.length) {
            syms = applyMerge(syms, ranked(i)._1, ranked(i)._2); i += 1
          }
          if (memo.size < 100000) memo.put(word, syms)
          syms
        }
      }
      it.map { case (id, text) =>
        (id, text.toLowerCase.split("\\s+").iterator
          .filter(_.nonEmpty).flatMap(enc).toArray)
      }
    }
  }
}
