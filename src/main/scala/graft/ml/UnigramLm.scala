package graft.ml

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (the SentencePiece unigram model,
  * Kudo '18 — public algorithm), as deterministic hard-EM: seed a
  * large candidate vocabulary from substring counts, iterate
  * Viterbi-segment → re-count → prune until the target size, and
  * encode by Viterbi under the final piece log-probs. Complements
  * [[Bpe]]: BPE grows a vocabulary bottom-up by merge frequency;
  * unigram shrinks top-down by likelihood — the two standard subword
  * trainers.
  *
  * Deviations from the paper, chosen for engine-exactness (same
  * spirit as [[Bpe]]'s batched-but-sequential-equivalent design):
  * Viterbi (hard) counts instead of forward–backward expected counts,
  * and count-based pruning instead of likelihood-loss ranking. All
  * aggregated statistics are LONG counts, so the local and distributed
  * training paths produce byte-identical vocabularies — doubles only
  * appear in Viterbi scoring, where both paths run the identical code
  * on the identical piece table.
  *
  * Scale shape (mirrors [[Bpe.trainFromCounts]]): the corpus is
  * reduced ONCE to a (word, count) table — the only corpus-sized
  * shuffle; every EM pass is a flatMap over that table with the piece
  * table broadcast, aggregating piece counts (vocabulary-bounded
  * shuffle). The number of passes is logarithmic in seed/target size
  * (each prunes a fixed fraction). Encoding is a shuffle-free
  * mapPartitions scan with a per-partition memo, like [[Bpe.encode]].
  */
object UnigramLm {

  final case class Piece(piece: String, logProb: Double)

  /** Log-prob floor for characters outside the vocabulary at encode
    * time (training always covers its own alphabet; this only fires on
    * unseen text). Any in-vocab path beats an UNK path of equal
    * length, and ties between UNK paths resolve like normal ties.
    */
  val UnkLogProb: Double = -1e4

  /** Code-point boundaries of `w`: offsets 0..n in char units, one per
    * code point + the end — substrings sliced on these never shear a
    * surrogate pair (same contract as [[Bpe.charSymbols]]).
    */
  private[ml] def cpBoundaries(w: String): Array[Int] = {
    val out = new Array[Int](w.codePointCount(0, w.length) + 1)
    var i = 0; var k = 0
    while (i < w.length) {
      out(k) = i; k += 1
      i += Character.charCount(w.codePointAt(i))
    }
    out(k) = w.length
    out
  }

  /** Viterbi segmentation of `word` under `lp` (piece → log-prob, or
    * NaN if absent): the max-score tiling by pieces of ≤ `maxPieceLen`
    * code points, scored as the sum of piece log-probs; unknown SINGLE
    * code points fall back to [[UnkLogProb]] so every word has a path.
    * Tie-break (exact double equality): the longer last piece wins —
    * biases ties toward fewer tokens and is deterministic.
    */
  def viterbi(word: String, lp: String => Double, maxPieceLen: Int): Array[String] = {
    if (word.isEmpty) return Array.empty
    val b = cpBoundaries(word)
    val n = b.length - 1 // code points
    val score = new Array[Double](n + 1)
    val back = new Array[Int](n + 1) // back(i) = start cp-index of the piece ending at i
    java.util.Arrays.fill(score, Double.NegativeInfinity)
    score(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      // walk candidate starts ascending: longer pieces first, so on a
      // tie the FIRST (longest) candidate is kept by the strict `>`
      while (j < i) {
        val piece = word.substring(b(j), b(i))
        val plp =
          if (i - j == 1) { val x = lp(piece); if (x.isNaN) UnkLogProb else x }
          else lp(piece)
        if (!plp.isNaN && score(j) != Double.NegativeInfinity) {
          val s = score(j) + plp
          if (s > score(i)) { score(i) = s; back(i) = j }
        }
        j += 1
      }
      i += 1
    }
    // reconstruct
    var parts = List.empty[String]
    var at = n
    while (at > 0) {
      val j = back(at)
      parts = word.substring(b(j), b(at)) :: parts
      at = j
    }
    parts.toArray
  }

  /** Learn a vocabulary of ≤ `vocabSize` pieces from a corpus. */
  def train(docs: Dataset[String], vocabSize: Int, maxPieceLen: Int = 8,
      seedMultiplier: Int = 4, localVocabThreshold: Long = 1000000L): Seq[Piece] =
    trainFromCounts(docs.sparkSession, Bpe.wordCounts(docs), vocabSize,
      maxPieceLen, seedMultiplier, localVocabThreshold)

  /** The EM loop over a (word, count) table. Hybrid dispatch like
    * [[Bpe.trainFromCounts]]: below `localVocabThreshold` distinct
    * words the whole loop runs driver-local with zero further Spark
    * jobs; above it, each seed/count pass is a distributed aggregation
    * with the piece table broadcast. Both paths yield byte-identical
    * vocabularies (all aggregates are exact longs).
    */
  def trainFromCounts(spark: SparkSession, words: Dataset[(String, Long)],
      vocabSize: Int, maxPieceLen: Int = 8, seedMultiplier: Int = 4,
      localVocabThreshold: Long = 1000000L): Seq[Piece] = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    if (localVocabThreshold <= 0)
      trainDistributed(spark, words, vocabSize, maxPieceLen, seedMultiplier)
    else {
      val w = words.persist()
      try {
        if (w.count() <= localVocabThreshold)
          trainLocal(w.collect(), vocabSize, maxPieceLen, seedMultiplier)
        else trainDistributed(spark, w, vocabSize, maxPieceLen, seedMultiplier)
      } finally w.unpersist(blocking = false)
    }
  }

  /** Per-round prune fraction of multi-char pieces (fixed; the loop is
    * therefore O(log(seed/target)) rounds).
    */
  private val PruneRate = 0.25

  /** All-substrings seed counts for one word: every substring of 1..
    * `maxPieceLen` code points, each occurrence weighted by the word
    * count.
    */
  private def seedPairs(word: String, c: Long, maxPieceLen: Int): Iterator[(String, Long)] = {
    val b = cpBoundaries(word)
    val n = b.length - 1
    (0 until n).iterator.flatMap { j =>
      ((j + 1) to math.min(n, j + maxPieceLen)).iterator
        .map(i => (word.substring(b(j), b(i)), c))
    }
  }

  private def isSingleCp(s: String): Boolean =
    s.nonEmpty && Character.charCount(s.codePointAt(0)) == s.length

  private def topMultis(multis: Seq[(String, Long)], k: Int): Seq[(String, Long)] =
    multis.sortWith { case ((p1, n1), (p2, n2)) =>
      n1 > n2 || (n1 == n2 && Bpe.ltUtf8(p1, p2))
    }.take(k)

  private def logProbs(counts: Map[String, Long]): Map[String, Double] = {
    val total = counts.valuesIterator.sum.toDouble
    // zero-count pieces (alphabet singles currently covered only by
    // multis) get the finite UNK floor, not -∞ — every word must keep
    // a finite-score Viterbi path even if its covering multi is pruned
    counts.map { case (p, n) =>
      p -> (if (n == 0L) UnkLogProb else math.log(n / total))
    }
  }

  /** One hard-EM count pass: Viterbi-segment every word under the
    * current log-probs and sum piece occurrences weighted by word
    * count. Pure — shared verbatim by both training paths.
    */
  private def countPass(words: Iterator[(String, Long)],
      lp: Map[String, Double], maxPieceLen: Int): Iterator[(String, Long)] =
    words.flatMap { case (w, c) =>
      viterbi(w, p => lp.getOrElse(p, Double.NaN), maxPieceLen)
        .iterator.map(p => (p, c))
    }

  /** Prune toward the target: keep all single-code-point pieces, drop
    * the lowest-count `PruneRate` of multi-char pieces (never below
    * the target multi budget), and drop zero-count multis outright.
    */
  private def pruneStep(counts: Map[String, Long], vocabSize: Int): Map[String, Long] = {
    val singles = counts.filter { case (p, _) => isSingleCp(p) }
    val multis = counts.toSeq.filter { case (p, _) => !isSingleCp(p) }
    val targetMulti = math.max(0, vocabSize - singles.size)
    if (multis.size <= targetMulti) singles ++ multis
    else {
      // strictly decreasing (min size-1) so the loop always terminates
      val keep = math.min(multis.size - 1, math.max(targetMulti,
        math.ceil(multis.size * (1.0 - PruneRate)).toInt))
      singles ++ topMultis(multis, keep)
    }
  }

  private def emLoop(countOnce: Map[String, Double] => Map[String, Long],
      seed: Map[String, Long], vocabSize: Int): Seq[Piece] = {
    var counts = seed
    var done = false
    // multi budget shrinks strictly per round, so rounds are bounded by
    // the multi seed size; the cap is an invariant belt, never the exit
    var rounds = 0
    while (!done && rounds < 10000) {
      rounds += 1
      val sizeBefore = counts.size
      val recounted = countOnce(logProbs(counts))
      // pieces unused by any Viterbi path drop out here (count 0);
      // singles are retained at count 0 for alphabet coverage
      val withSingles = counts.keysIterator
        .filter(isSingleCp)
        .map(p => p -> recounted.getOrElse(p, 0L))
        .toMap ++ recounted
      counts = pruneStep(withSingles, vocabSize)
      done = counts.size <= vocabSize ||
        (counts.size == sizeBefore && counts == withSingles)
    }
    // final re-estimation over the surviving vocabulary; zero-count
    // singles get the UNK floor so log-probs stay finite
    val finalCounts = countOnce(logProbs(counts))
    val kept = counts.keySet
    val lp = logProbs(finalCounts.filter { case (p, _) => kept(p) })
    kept.toSeq.sortWith(Bpe.ltUtf8)
      .map(p => Piece(p, lp.getOrElse(p, UnkLogProb)))
  }

  /** Driver-local trainer (the common path: distinct-word tables fit
    * on the driver even for very large corpora).
    */
  def trainLocal(wordCounts: Array[(String, Long)], vocabSize: Int,
      maxPieceLen: Int = 8, seedMultiplier: Int = 4): Seq[Piece] = {
    val seedCounts = scala.collection.mutable.HashMap.empty[String, Long]
    wordCounts.foreach { case (w, c) =>
      seedPairs(w, c, maxPieceLen).foreach { case (p, n) =>
        seedCounts.update(p, seedCounts.getOrElse(p, 0L) + n)
      }
    }
    val seed = seedVocab(seedCounts.toSeq, vocabSize, seedMultiplier)
    emLoop(lp => {
      val acc = scala.collection.mutable.HashMap.empty[String, Long]
      countPass(wordCounts.iterator, lp, maxPieceLen).foreach { case (p, n) =>
        acc.update(p, acc.getOrElse(p, 0L) + n)
      }
      acc.toMap
    }, seed, vocabSize)
  }

  private def seedVocab(counts: Seq[(String, Long)], vocabSize: Int,
      seedMultiplier: Int): Map[String, Long] = {
    val (singles, multis) = counts.partition { case (p, _) => isSingleCp(p) }
    val seedSize = vocabSize.toLong * seedMultiplier
    val multiBudget = math.max(0L, seedSize - singles.size).toInt
    (singles ++ topMultis(multis, multiBudget)).toMap
  }

  /** The distributed loop: seed pass + one aggregation per EM round,
    * piece table broadcast each round.
    */
  private def trainDistributed(spark: SparkSession,
      words: Dataset[(String, Long)], vocabSize: Int, maxPieceLen: Int,
      seedMultiplier: Int): Seq[Piece] = {
    import spark.implicits._
    val w = words.persist()
    try {
      // vocabulary-bounded collect: the seed is capped at
      // vocabSize * seedMultiplier multis + the alphabet
      val seedAll = w.flatMap { case (word, c) => seedPairs(word, c, maxPieceLen) }
        .toDF("p", "c").groupBy("p").agg(sum("c").as("n"))
        .as[(String, Long)]
      val singles = seedAll.filter(r => isSingleCp(r._1)).collect()
      val multiBudget =
        math.max(0L, vocabSize.toLong * seedMultiplier - singles.length).toInt
      val multis = seedAll.filter(r => !isSingleCp(r._1))
        .orderBy(col("n").desc, col("p").asc)
        .head(multiBudget)
      val seed = (singles ++ multis).toMap
      emLoop(lp => {
        val bc = spark.sparkContext.broadcast(lp)
        val out = w.mapPartitions(it => countPass(it, bc.value, maxPieceLen))
          .toDF("p", "c").groupBy("p").agg(sum("c").as("n"))
          .as[(String, Long)].collect().toMap
        bc.destroy()
        out
      }, seed, vocabSize)
    } finally w.unpersist(blocking = false)
  }

  /** Corpus negative log-likelihood under a vocabulary (sum over words
    * of count × Viterbi score, negated) — the quantity hard-EM
    * decreases; exposed for invariant tests and training telemetry.
    */
  def corpusNll(wordCounts: Array[(String, Long)], vocab: Seq[Piece],
      maxPieceLen: Int = 8): Double = {
    val lp = vocab.map(p => p.piece -> p.logProb).toMap
    wordCounts.map { case (w, c) =>
      val pieces = viterbi(w, p => lp.getOrElse(p, Double.NaN), maxPieceLen)
      -c * pieces.map(p => lp.getOrElse(p, UnkLogProb)).sum
    }.sum
  }

  /** Distributed tokenizer application — encode every document with a
    * learned vocabulary. Same shuffle-free mapPartitions + per-
    * partition distinct-word memo shape as [[Bpe.encode]] (cache cap
    * 100k, the reference's map-side cache constant,
    * GroupBuilder.scala:83).
    */
  def encode(docs: Dataset[(Long, String)], vocab: Seq[Piece],
      maxPieceLen: Int = 8): Dataset[(Long, Array[String])] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val lp = vocab.map(p => p.piece -> p.logProb).toMap
    docs.mapPartitions { it =>
      val memo = new java.util.HashMap[String, Array[String]]()
      def enc(word: String): Array[String] = {
        val hit = memo.get(word)
        if (hit != null) hit
        else {
          val pieces = viterbi(word, p => lp.getOrElse(p, Double.NaN), maxPieceLen)
          if (memo.size < 100000) memo.put(word, pieces)
          pieces
        }
      }
      it.map { case (id, text) =>
        (id, text.toLowerCase(java.util.Locale.ROOT).split("\\s+").iterator
          .filter(_.nonEmpty).flatMap(enc).toArray)
      }
    }
  }
}
