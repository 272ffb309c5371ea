package graft

import graft.ml.Bpe

/** Distributed BPE trainer vs an exact driver-side reference
  * implementation over the same corpus.
  */
class BpeSpec extends SparkSpec {

  /** Single-node reference BPE with the same determinism contract
    * (count desc, left asc, right asc).
    */
  private def localBpe(words: Map[String, Long], n: Int): Seq[(String, String)] = {
    var syms: Seq[(Vector[String], Long)] =
      words.toSeq.map { case (w, c) => (w.map(_.toString).toVector :+ Bpe.Eow, c) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (out.size < n && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      syms.foreach { case (s, c) =>
        s.sliding(2).filter(_.size == 2).foreach { p =>
          val k = (p(0), p(1)); counts(k) = counts.getOrElse(k, 0L) + c
        }
      }
      if (counts.isEmpty) done = true
      else {
        // production collation: UTF-8 byte tie-break, not UTF-16 `<`
        val best = counts.toSeq.sortWith {
          case (((l1, r1), c1), ((l2, r2), c2)) =>
            c1 > c2 || (c1 == c2 && (Bpe.ltUtf8(l1, l2) ||
              (l1 == l2 && Bpe.ltUtf8(r1, r2))))
        }.head._1
        out += best
        syms = syms.map { case (s, c) =>
          (Bpe.applyMerge(s.toArray, best._1, best._2).toVector, c)
        }
      }
    }
    out.toSeq
  }

  test("applyMerge is greedy left-to-right on overlaps") {
    assert(Bpe.applyMerge(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(Bpe.applyMerge(Array("a", "b", "a", "b"), "a", "b").toSeq == Seq("ab", "ab"))
    assert(Bpe.applyMerge(Array("x"), "a", "b").toSeq == Seq("x"))
  }

  test("distributed BPE learns exactly the reference merge sequence on real documents") {
    import spark.implicits._
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("text").as[String]
    val got = Bpe.train(docs, nMerges = 15)

    val wc = scala.collection.mutable.Map.empty[String, Long]
    docs.collect().foreach(
      _.toLowerCase.split("\\s+").filter(_.nonEmpty).foreach(w =>
        wc(w) = wc.getOrElse(w, 0L) + 1))
    val expected = localBpe(wc.toMap, 15)

    assert(got.map(m => (m.left, m.right)) == expected)
    assert(got.map(_.rank) == (0 until 15))
  }

  test("batched rounds (any batchCap) learn byte-identical merge lists") {
    import spark.implicits._
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("text").as[String]
    val words = Bpe.wordCounts(docs)
    // localVocabThreshold = 0 forces the distributed loop: this test
    // pins the batch-selection proof, not the hybrid dispatch
    def dist(cap: Int) = Bpe.trainFromCounts(spark, words, nMerges = 40,
      batchCap = cap, localVocabThreshold = 0L)
    val sequential = dist(1)
    assert(dist(4) == sequential)
    assert(dist(64) == sequential)
    // and the driver-local trainer (the small-vocabulary fast path)
    // lands on the same bytes
    assert(Bpe.trainFromCounts(spark, words, nMerges = 40) == sequential)
    assert(sequential.map(_.rank) == (0 until sequential.size))
  }

  test("batching stops at cross-share conflicts (chained pairs stay sequential)") {
    import spark.implicits._
    // "abc" x100: the top three pairs all tie at 100 and chain
    // (a,b)-(b,c)-(c,</w>); a batcher that merely skipped conflicts
    // would take {(a,b),(c,</w>)} and miss that sequential BPE mints
    // (ab,c) as its true second merge.
    val docs = Seq.fill(100)("abc").toDS()
    val got = Bpe.train(docs, nMerges = 3).map(m => (m.left, m.right))
    val expected = localBpe(Map("abc" -> 100L), 3)
    assert(got == expected)
    assert(expected == Seq(("a", "b"), ("ab", "c"), ("abc", Bpe.Eow)))
  }

  test("deep batched training matches the reference at 256 merges") {
    import spark.implicits._
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("text").as[String]
    val got = Bpe.train(docs, nMerges = 256)

    val wc = scala.collection.mutable.Map.empty[String, Long]
    docs.collect().foreach(
      _.toLowerCase.split("\\s+").filter(_.nonEmpty).foreach(w =>
        wc(w) = wc.getOrElse(w, 0L) + 1))
    val expected = localBpe(wc.toMap, 256)

    assert(got.map(m => (m.left, m.right)) == expected)
    assert(got.map(_.rank) == (0 until got.size))

    // distributed loop at depth: same 256 merges as the naive
    // single-node reference and the incremental local trainer
    val distributed = Bpe.trainFromCounts(spark, Bpe.wordCounts(docs),
      nMerges = 256, localVocabThreshold = 0L)
    assert(distributed.map(m => (m.left, m.right)) == expected)
  }

  test("a selected self-pair closes the batch (its mints out-count the excluded bound)") {
    import spark.implicits._
    // (a,a) wins round 1 at 700; (p,q) at 200 is symbol-disjoint and
    // above the 100 bound, so an unguarded batcher would pair them —
    // but merging (a,a) mints (aa,aa) at 300, the true second merge.
    val corpus = Seq.fill(100)("xaaaaaaaay pqpqz").toDS()
    val words = Bpe.wordCounts(corpus)
    val got = Bpe.trainFromCounts(spark, words, nMerges = 4,
      batchCap = 64, localVocabThreshold = 0L)
    val expected = localBpe(Map("xaaaaaaaay" -> 100L, "pqpqz" -> 100L), 4)
    assert(got.map(m => (m.left, m.right)) == expected)
    assert(expected.take(2) == Seq(("a", "a"), ("aa", "aa")))
    // and the driver-local trainer agrees
    assert(Bpe.trainFromCounts(spark, words, nMerges = 4)
      .map(m => (m.left, m.right)) == expected)
  }

  test("a duplicate in-batch mint closes the batch") {
    // (a,bc) and (ab,c) both mint "abc": after both merges a pair
    // (x,abc) could sum count from both sources past the truncation
    // bound, so the second minting pair must be the batch's last
    // member. (Believed unreachable from a real corpus — same-round
    // double-mint needs two tilings of one substring — but the guard
    // is pinned here directly.)
    val ranked = Array(
      ("a", "bc", 100L), ("ab", "c", 90L), ("x", "y", 80L), ("p", "q", 10L))
    val batch = Bpe.selectBatch(ranked, 64, Set("a", "b", "c", "x", "y", "p", "q"))
    assert(batch.toSeq == Seq(("a", "bc", 100L), ("ab", "c", 90L)))
    // without the collision the walk takes the whole independent list
    // (batch == every existing pair: nothing outside can interleave)
    val ranked2 = Array(
      ("a", "bc", 100L), ("d", "e", 90L), ("x", "y", 80L), ("p", "q", 10L))
    val batch2 = Bpe.selectBatch(ranked2, 64,
      Set("a", "b", "c", "d", "e", "x", "y", "p", "q"))
    assert(batch2.toSeq == ranked2.toSeq)
  }

  test("charSymbols splits by code point, not UTF-16 code unit") {
    val w = "a😀b" // a, U+1F600 (emoji, surrogate pair), b
    assert(Bpe.charSymbols(w).toSeq ==
      Seq("a", "😀", "b", Bpe.Eow))
    assert(Bpe.encodeWord(w, Seq.empty).mkString == w.toLowerCase + Bpe.Eow)
  }

  test("randomized corpora: distributed batching == sequential reference (fixed seed)") {
    import spark.implicits._
    val rng = new scala.util.Random(0xb9e5eed)
    (1 to 3).foreach { trial =>
      // tiny alphabet → dense ties, chains, self-pair runs
      val words = (1 to 30).map { _ =>
        val w = (1 to (1 + rng.nextInt(6)))
          .map(_ => "ab" (rng.nextInt(2))).mkString
        w -> (1L + rng.nextInt(300))
      }.groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).sum }
      val ds = words.toSeq.toDS()
      val got = Bpe.trainFromCounts(spark, ds, nMerges = 12,
        batchCap = 64, localVocabThreshold = 0L)
      val expected = localBpe(words, 12)
      assert(got.map(m => (m.left, m.right)) == expected, s"trial $trial: $words")
    }
  }

  test("encodeWord applies merges in rank order") {
    import spark.implicits._
    val docs = Seq.fill(50)("low lower lowest").toDS()
    val merges = Bpe.train(docs, nMerges = 6)
    val enc = Bpe.encodeWord("lower", merges)
    // all merges learned from 'low*' words: encoding must reconstruct
    // the word and contain the fused 'low' prefix unit
    assert(enc.mkString == "lower" + Bpe.Eow)
    assert(enc.exists(_.startsWith("low")))
    assert(enc.length < "lower".length + 1)
  }

  test("distributed encode equals per-word encodeWord on every document") {
    import spark.implicits._
    val corpus = Seq("low lower lowest", "newer wider lower", "low low newest")
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDS()
    val merges = Bpe.train(corpus.toDS(), nMerges = 8)
    val got = Bpe.encode(docs, merges).collect().toMap
    corpus.zipWithIndex.foreach { case (text, i) =>
      val expected = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .flatMap(w => Bpe.encodeWord(w, merges))
      assert(got(i.toLong).toSeq == expected.toSeq, s"doc $i")
    }
  }

  test("BPE-dropout: rate extremes, determinism, occurrence-keyed coins") {
    import spark.implicits._
    val corpus = Seq("the cat sat", "the the the", "banana bandana")
    val merges = Bpe.trainFromCounts(spark,
      Bpe.wordCounts(corpus.toDS()), nMerges = 20)
    // rate 0 == plain encode
    corpus.flatMap(_.split(" ")).distinct.foreach { w =>
      assert(Bpe.encodeWordDropout(w, merges, 0.0).toSeq ==
        Bpe.encodeWord(w, merges).toSeq, w)
    }
    // rate 1 == character symbols (every merge skipped)
    assert(Bpe.encodeWordDropout("the", merges, 1.0).toSeq ==
      Bpe.encodeWord("the", Seq.empty).toSeq)
    // deterministic per (word, occurrence); occurrences draw
    // independent coins so SOME word/rate shows a difference
    val a = Bpe.encodeWordDropout("banana", merges, 0.5, occurrence = 0L)
    val b = Bpe.encodeWordDropout("banana", merges, 0.5, occurrence = 0L)
    assert(a.toSeq == b.toSeq, "same occurrence must be deterministic")
    val diffs = (0L until 8L).map(o =>
      Bpe.encodeWordDropout("banana", merges, 0.5, o).toSeq).distinct
    assert(diffs.size > 1, "occurrences should sample different segmentations")
    // round trip: concatenation always reproduces the word
    (0L until 8L).foreach { o =>
      val toks = Bpe.encodeWordDropout("bandana", merges, 0.5, o)
      assert(toks.mkString("").replace(Bpe.Eow, "") == "bandana")
    }
    // distributed path == driver replay with per-doc occurrence counters
    val docs = Seq((1L, "the the cat"), (2L, "banana banana banana"))
      .toDS()
    val got = Bpe.encodeDropout(docs, merges, 0.5).collect().toMap
    docs.collect().foreach { case (id, text) =>
      val seen = scala.collection.mutable.Map.empty[String, Long]
      val exp = text.split(" ").flatMap { w =>
        val occ = seen.getOrElse(w, 0L)
        seen(w) = occ + 1
        Bpe.encodeWordDropout(w, merges, 0.5, occ)
      }
      assert(got(id).toSeq == exp.toSeq, s"doc $id")
    }
    intercept[IllegalArgumentException](
      Bpe.encodeWordDropout("x", merges, 1.5))
  }
}
