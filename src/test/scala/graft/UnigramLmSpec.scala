package graft

import graft.ml.UnigramLm
import graft.ml.UnigramLm.Piece

/** Unigram-LM tokenizer: Viterbi optimality vs brute force, training
  * invariants, local/distributed path equality, encode round-trip.
  */
class UnigramLmSpec extends SparkSpec {

  /** All segmentations of `word` into vocab pieces (≤ maxLen cps),
    * with unknown single chars allowed at the UNK floor — the
    * reference semantics viterbi must match.
    */
  private def allSegmentations(word: String, lp: Map[String, Double],
      maxLen: Int): Seq[(Seq[String], Double)] = {
    if (word.isEmpty) return Seq((Seq.empty, 0.0))
    (1 to math.min(maxLen, word.length)).flatMap { take =>
      val head = word.substring(0, take)
      val hlp = lp.get(head).orElse(
        if (take == 1) Some(UnigramLm.UnkLogProb) else None)
      hlp.toSeq.flatMap { s =>
        allSegmentations(word.substring(take), lp, maxLen)
          .map { case (rest, rs) => (head +: rest, s + rs) }
      }
    }
  }

  test("viterbi matches brute-force max-likelihood segmentation") {
    val lp = Map(
      "a" -> -3.0, "b" -> -3.0, "c" -> -3.0, "ab" -> -2.0,
      "bc" -> -1.5, "abc" -> -4.0, "cab" -> -2.5)
    for (w <- Seq("abc", "abcabc", "cabab", "aaab", "b", "")) {
      val got = UnigramLm.viterbi(w, p => lp.getOrElse(p, Double.NaN), 3)
      assert(got.mkString("") == w, s"lossless for $w")
      val best = allSegmentations(w, lp, 3).map(_._2).maxOption.getOrElse(0.0)
      val gotScore = got.map(p => lp.getOrElse(p, UnigramLm.UnkLogProb)).sum
      assert(math.abs(gotScore - best) < 1e-12,
        s"$w: viterbi score $gotScore vs brute-force best $best")
    }
  }

  test("viterbi handles unknown characters via single-cp UNK fallback") {
    val lp = Map("a" -> -1.0, "aa" -> -0.5)
    val got = UnigramLm.viterbi("aXa", p => lp.getOrElse(p, Double.NaN), 2)
    assert(got.toSeq == Seq("a", "X", "a"))
  }

  test("supplementary-plane characters are never sheared") {
    val clef = new String(Character.toChars(0x1D11E)) // 𝄞, 2 chars
    val lp = Map("a" -> -1.0, clef -> -1.0, (clef + "a") -> -0.5)
    val got = UnigramLm.viterbi(clef + "a" + clef, p => lp.getOrElse(p, Double.NaN), 2)
    assert(got.toSeq == Seq(clef + "a", clef))
  }

  private val corpus = Seq(
    "the quick brown fox", "the lazy dog", "the the the quick quick",
    "brown dogs and brown foxes", "lazy quick lazy quick the")

  test("train: vocab within target, full alphabet coverage, better than char baseline") {
    import spark.implicits._
    val docs = spark.createDataset(corpus)
    val vocab = UnigramLm.train(docs, vocabSize = 40, maxPieceLen = 5)
    assert(vocab.size <= 40)
    assert(vocab.map(_.piece).distinct.size == vocab.size)
    val chars = corpus.flatMap(_.toLowerCase.split("\\s+")).flatMap(_.toSeq)
      .map(_.toString).toSet
    assert(chars.subsetOf(vocab.map(_.piece).toSet), "alphabet must survive")
    // multi-char pieces were actually learned
    assert(vocab.exists(_.piece.length > 1))
    // the learned vocab segments the corpus at least as well as
    // characters alone (hard-EM objective)
    val wc = corpus.flatMap(_.toLowerCase.split("\\s+"))
      .groupBy(identity).map { case (w, v) => (w, v.size.toLong) }.toArray
    val charVocab = {
      val n = chars.size.toDouble
      chars.toSeq.map(c => Piece(c, math.log(1.0 / n)))
    }
    assert(UnigramLm.corpusNll(wc, vocab, 5) <
      UnigramLm.corpusNll(wc, charVocab, 5))
  }

  test("local and distributed training paths are byte-identical") {
    import spark.implicits._
    val docs = spark.createDataset(corpus)
    val wc = graft.ml.Bpe.wordCounts(docs)
    val local = UnigramLm.trainFromCounts(spark, wc, vocabSize = 30,
      maxPieceLen = 4, localVocabThreshold = 1000000L)
    val dist = UnigramLm.trainFromCounts(spark, wc, vocabSize = 30,
      maxPieceLen = 4, localVocabThreshold = 0L)
    assert(local.map(_.piece) == dist.map(_.piece))
    local.zip(dist).foreach { case (a, b) =>
      assert(a.logProb == b.logProb, s"${a.piece}: ${a.logProb} vs ${b.logProb}")
    }
  }

  test("encode: lossless round-trip over a Dataset, memoized path") {
    import spark.implicits._
    val docs = spark.createDataset(corpus)
    val vocab = UnigramLm.train(docs, vocabSize = 40, maxPieceLen = 5)
    val ids = spark.createDataset(
      corpus.zipWithIndex.map { case (tx, i) => (i.toLong, tx) })
    val enc = UnigramLm.encode(ids, vocab, maxPieceLen = 5).collect().toMap
    corpus.zipWithIndex.foreach { case (tx, i) =>
      val norm = tx.toLowerCase.split("\\s+").filter(_.nonEmpty).mkString("")
      assert(enc(i.toLong).mkString("") == norm)
    }
    // empty + whitespace-only docs encode to no tokens
    val edge = UnigramLm.encode(
      spark.createDataset(Seq((9L, ""), (10L, "   "))), vocab, 5)
      .collect().toMap
    assert(edge(9L).isEmpty && edge(10L).isEmpty)
  }

  test("parameter validation") {
    import spark.implicits._
    val docs = spark.createDataset(corpus)
    intercept[IllegalArgumentException](UnigramLm.train(docs, 0))
    intercept[IllegalArgumentException](UnigramLm.train(docs, 10, maxPieceLen = 0))
  }
}
