package graft

import org.apache.spark.sql.functions._
import graft.ml.Corpus

/** Sequence packing + corpus mixing, verified against a driver-side
  * replay of the exact same md5-permutation arithmetic.
  */
class CorpusSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  // (id, tok) corpus with short docs, an empty doc, and one doc longer
  // than the context window
  private val docs = Seq(
    (0L, 7L), (1L, 40L), (2L, 3L), (3L, 0L), (4L, 12L),
    (5L, 9L), (6L, 25L), (7L, 5L), (8L, 11L), (9L, 2L))

  test("packSequences matches an exact driver-side replay") {
    import spark.implicits._
    val ctx = 10
    val nShards = 2
    val got = Corpus.packSequences(docs.toDF("doc_id", "tok"),
        "doc_id", "tok", ctxLen = ctx, nShards = nShards)
      .select("doc_id", "shard", "seq_id", "seq_offset", "n_seqs")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)

    val expected = docs.groupBy { case (id, _) => id % nShards }.toSeq
      .flatMap { case (shard, ds) =>
        var cum = 0L
        ds.sortBy { case (id, _) => (md5hex(id.toString), id) }
          .map { case (id, tok) =>
            val start = cum
            cum += tok
            val seqId = start / ctx
            val nSeqs = if (tok <= 0) 1L else (cum - 1) / ctx - seqId + 1
            (id, shard, seqId, start % ctx, nSeqs)
          }
      }.sortBy(_._1)
    assert(got.toSeq == expected)
    // the 40-token doc spans multiple context windows
    assert(expected.find(_._1 == 1L).get._5 == 4 + (expected.find(_._1 == 1L).get._4 min 1))
  }

  test("packSequences conserves tokens: chunk cuts tile the shard stream") {
    import spark.implicits._
    val packed = Corpus.packSequences(docs.toDF("doc_id", "tok"),
      "doc_id", "tok", ctxLen = 10, nShards = 1)
    val joined = packed.join(docs.toDF("doc_id", "tok"), "doc_id")
    // reconstruct each doc's absolute start from (seq_id, seq_offset)
    // and check the shard stream is gapless: sorted starts chain
    // exactly by token length
    // sort by (start, tok) so the zero-length doc, which shares its
    // start with its successor, sits first and the chain stays exact
    val rows = joined.select(col("seq_id") * 10 + col("seq_offset"), col("tok"))
      .as[(Long, Long)].collect().sortBy(r => (r._1, r._2))
    rows.zip(rows.scanLeft(0L) { case (acc, (_, tok)) => acc + tok }).foreach {
      case ((start, _), expectedStart) => assert(start == expectedStart)
    }
  }

  test("sequenceManifest lists starting docs in stream order per sequence") {
    import spark.implicits._
    val manifest = Corpus.sequenceManifest(docs.toDF("doc_id", "tok"),
        "doc_id", "tok", ctxLen = 10, nShards = 1)
      .select("seq_id", "n_docs", "doc_ids")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    // replay: same permutation as packSequences, group by start/10
    val md5 = (id: Long) => md5hex(id.toString)
    var cum = 0L
    val packed = docs.sortBy { case (id, _) => (md5(id), id) }.map { case (id, tok) =>
      val start = cum; cum += tok; (start / 10, start % 10, id)
    }
    // the manifest orders by (seq_offset, doc_id) — a zero-length doc
    // shares its offset with its successor, so replay that exact sort
    val expected = packed.groupBy(_._1).toSeq.sortBy(_._1).map { case (seq, ds) =>
      val ordered = ds.sortBy { case (_, off, id) => (off, id) }.map(_._3)
      (seq, ds.size.toLong, ordered.mkString(","))
    }
    assert(manifest.toSeq == expected)
    // every doc appears exactly once across the manifest
    assert(manifest.flatMap(_._3.split(",")).length == docs.size)
  }

  test("mixByBudget keeps exactly the within-budget md5-ordered prefix per domain") {
    import spark.implicits._
    val dd = Seq(
      (0L, "a", 30L), (1L, "a", 30L), (2L, "a", 30L), (3L, "a", 30L),
      (4L, "b", 80L), (5L, "b", 10L), (6L, "b", 10L))
    val budget = 70L
    val got = Corpus.mixByBudget(dd.toDF("doc_id", "source", "tok"),
        "doc_id", "source", "tok", budget)
      .select("doc_id", "cum_tokens").as[(Long, Long)].collect().toMap

    val expected = dd.groupBy(_._2).toSeq.flatMap { case (_, ds) =>
      var cum = 0L
      ds.sortBy { case (id, _, _) => (md5hex(id.toString), id) }
        .flatMap { case (id, _, tok) =>
          cum += tok
          if (cum <= budget) Some(id -> cum) else None
        }
    }.toMap
    assert(got == expected)
    // budget binds: domain a fits only 2 of 4 docs (30+30 ≤ 70 < 90)
    assert(expected.count { case (id, _) => id <= 3 } == 2)
  }

  test("stratifiedTake returns exactly n per stratum, deterministic across runs") {
    import spark.implicits._
    val dd = (0L until 40L).map(i => (i, s"s${i % 4}")).toDF("doc_id", "source")
    val got = Corpus.stratifiedTake(dd, "doc_id", "source", n = 3)
      .select("doc_id", "source", "sample_rank")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.groupBy(_._2).forall(_._2.length == 3))
    assert(got.forall(r => r._3 >= 1 && r._3 <= 3))
    // exact driver replay of the md5 permutation
    val expected = (0L until 40L).groupBy(i => s"s${i % 4}").flatMap { case (src, ids) =>
      ids.sortBy(i => (md5hex(i.toString), i)).take(3).zipWithIndex
        .map { case (id, k) => (id, src, k + 1L) }
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == expected)
    // a stratum smaller than n yields its full population
    val small = Corpus.stratifiedTake(
      Seq((1L, "x"), (2L, "x")).toDF("doc_id", "source"), "doc_id", "source", 5)
    assert(small.count() == 2)
  }

  test("edge cases: empty corpus, all-zero tokens, ctxLen 1") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "tok")
    assert(Corpus.packSequences(empty, "doc_id", "tok", 10, 2).count() == 0)
    assert(Corpus.sequenceManifest(empty, "doc_id", "tok", 10, 2).count() == 0)
    assert(Corpus.mixByBudget(
      Seq.empty[(Long, String, Long)].toDF("doc_id", "source", "tok"),
      "doc_id", "source", "tok", 10L).count() == 0)
    // all-zero tokens: everything lands in seq 0 at offset 0, one seq
    val zeros = (0L until 5L).map((_, 0L)).toDF("doc_id", "tok")
    val pz = Corpus.packSequences(zeros, "doc_id", "tok", 10, 1)
      .select("seq_id", "seq_offset", "n_seqs")
      .as[(Long, Long, Long)].collect()
    assert(pz.forall(_ == ((0L, 0L, 1L))))
    // ctxLen 1: each token is its own sequence; a 3-token doc spans 3
    val one = Seq((1L, 3L), (2L, 2L)).toDF("doc_id", "tok")
    val p1 = Corpus.packSequences(one, "doc_id", "tok", ctxLen = 1, nShards = 1)
      .select("doc_id", "n_seqs").as[(Long, Long)].collect().toMap
    assert(p1 == Map(1L -> 3L, 2L -> 2L))
  }

  test("mixByTemperature: clamped temperature rates + exact md5 membership") {
    import spark.implicits._
    // domain a: 100 docs × 1 token (W=100); domain b: 300 docs × 1 token
    val docs = ((0L until 100L).map((_, "a", 1L)) ++
      (100L until 400L).map((_, "b", 1L))).toDF("doc_id", "source", "tok")

    // alpha=1 (natural proportions), budget 200: p=(0.25,0.75) →
    // both rates = budget·p_d/W_d = 0.5
    val nat = Corpus.mixByTemperature(docs, "doc_id", "source", "tok",
      alpha = 1.0, tokenBudget = 200L)
    val natRates = nat.select("source", "rate").distinct()
      .as[(String, Double)].collect().toMap
    assert(natRates == Map("a" -> 0.5, "b" -> 0.5))

    // alpha=0 (uniform target), budget 200: p=(0.5,0.5) → rate_a =
    // min(1, 100/100) = 1.0 (clamped), rate_b = 100/300 ≈ 0.333333
    val flat = Corpus.mixByTemperature(docs, "doc_id", "source", "tok",
      alpha = 0.0, tokenBudget = 200L)
    val flatRates = flat.select("source", "rate").distinct()
      .as[(String, Double)].collect().toMap
    assert(flatRates == Map("a" -> 1.0, "b" -> 0.333333))
    // every domain-a doc survives a rate-1.0 threshold
    assert(flat.filter(col("source") === "a").count() == 100)

    // membership replays the strongBucket rule exactly
    val kept = flat.select("doc_id").as[Long].collect().toSet
    val expected = ((0L until 100L) ++ (100L until 400L).filter { id =>
      md5hex(id.toString).take(8) <
        f"${math.round(0.333333 * 4294967296.0).min(4294967295L)}%08x"
    }).toSet
    assert(kept == expected)
  }

  test("dropBottomByScore cuts exactly the bottom fraction per stratum, ties broken by id") {
    import spark.implicits._
    // stratum a: scores 1..10 → pr >= 0.3 keeps ranks 4..10 (pr of
    // rank r is (r-1)/9); stratum b: all-tied scores → order falls to
    // id, same keep count
    val docs = ((1L to 10L).map(i => (i, "a", i * 10.0)) ++
      (11L to 20L).map(i => (i, "b", 5.0))).toDF("id", "st", "score")
    val kept = Corpus.dropBottomByScore(docs, "st", "score", "id", 0.3)
      .select("id").as[Long].collect().toSet
    assert(kept == ((4L to 10L) ++ (14L to 20L)).toSet)
    // fraction 0 keeps everything; 1.0 keeps exactly the per-stratum max
    assert(Corpus.dropBottomByScore(docs, "st", "score", "id", 0.0).count() == 20)
    assert(Corpus.dropBottomByScore(docs, "st", "score", "id", 1.0)
      .select("id").as[Long].collect().toSet == Set(10L, 20L))
  }

  test("chunkByTokens tiles documents with the requested overlap") {
    import spark.implicits._
    val text10 = (1 to 10).map(i => s"t$i").mkString(" ")
    val d = Seq((1L, text10), (2L, "a b c")).toDF("doc_id", "text")
    val got = Corpus.chunkByTokens(d, "doc_id", "text",
      maxTokens = 4, overlap = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3)))
      .toMap
    // doc 1: stride 2 → chunks at 1,3,5,7 (ceil((10-4)/2)=3 extra)
    assert(got((1L, 0L)) == (4L, "t1 t2 t3 t4"))
    assert(got((1L, 1L)) == (4L, "t3 t4 t5 t6"))
    assert(got((1L, 3L)) == (4L, "t7 t8 t9 t10"))
    // short doc: one chunk, untruncated
    assert(got((2L, 0L)) == (3L, "a b c"))
    assert(got.size == 5)
    // consecutive chunks share exactly `overlap` tokens
    val c0 = got((1L, 0L))._2.split(" ").takeRight(2).toSeq
    val c1 = got((1L, 1L))._2.split(" ").take(2).toSeq
    assert(c0 == c1)
  }

  test("chunkByTokens reconstruction: overlap-stripped chunks tile the document") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val params = Seq((5, 0), (5, 2), (8, 7), (3, 1))
    params.foreach { case (maxTokens, overlap) =>
      val docs = (1L to 25L).map { id =>
        id -> Array.fill(1 + rnd.nextInt(30))(s"w${rnd.nextInt(9)}")
      }
      val got = Corpus.chunkByTokens(
        docs.map { case (id, w) => (id, w.mkString(" ")) }.toDF("doc_id", "text"),
        "doc_id", "text", maxTokens, overlap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .groupBy(_._1)
      docs.foreach { case (id, w) =>
        val chunks = got(id).sortBy(_._2)
        // every chunk obeys the size bound and reports its true count
        chunks.foreach { case (_, _, n, text) =>
          val toks = text.split(" ")
          assert(toks.length <= maxTokens && toks.length == n)
        }
        // dropping the first `overlap` tokens of every chunk after the
        // first reconstructs the document exactly
        val rebuilt = chunks.head._4.split(" ") ++
          chunks.tail.flatMap(_._4.split(" ").drop(overlap))
        assert(rebuilt.toSeq == w.toSeq,
          s"doc $id maxTokens=$maxTokens overlap=$overlap")
      }
    }
  }

  test("gate queries run and pack output covers every document once") {
    val pack = graft.queries.TextQueries.all.find(_.name == "q_text_pack").get
    val out = pack.run(spark, sf())
    val n = spark.read.parquet(s"${sf()}/documents.parquet").count()
    assert(out.count() == n)
    assert(out.select("doc_id").distinct().count() == n)
    val mix = graft.queries.TextQueries.all.find(_.name == "q_corpus_mix").get
    val m = mix.run(spark, sf())
    assert(m.count() > 0 && m.count() < n)
    assert(m.filter(col("cum_tokens") > 800).count() == 0)
  }

  test("mixByEpochs: full epochs replicate whole domains, caps and partials hold") {
    import spark.implicits._
    val docs = Seq(
      // domain "big": 3 docs of 100 tokens (T=300)
      (1L, "big", 100L), (2L, "big", 100L), (3L, "big", 100L),
      // domain "small": 2 docs of 10 tokens (T=20)
      (10L, "small", 10L), (11L, "small", 10L),
      // unlisted domain: excluded entirely
      (20L, "other", 50L)).toDF("id", "dom", "tok")
    // budget 1000: big gets 500 -> 1 full epoch + 200-token partial;
    // small gets 500 -> 25 epochs uncapped, capped at 3 full, no partial
    val out = graft.ml.Corpus.mixByEpochs(docs, "id", "dom", "tok",
        weights = Map("big" -> 0.5, "small" -> 0.5),
        tokenBudget = 1000L, maxEpochs = 3)
      .select("id", "dom", "epoch", "n_epochs")
      .as[(Long, String, Long, Long)].collect()
    assert(!out.exists(_._2 == "other"))
    val small = out.filter(_._2 == "small")
    assert(small.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap ==
      Map(10L -> Seq(1L, 2L, 3L), 11L -> Seq(1L, 2L, 3L)))
    val big = out.filter(_._2 == "big")
    // every big doc runs epoch 1; exactly two of the three (200 of 300
    // remainder tokens, md5-permutation prefix) run epoch 2
    assert(big.count(_._3 == 1L) == 3)
    assert(big.count(_._3 == 2L) == 2)
    assert(big.forall(_._3 <= 2L))
    // n_epochs is consistent with the emitted epoch rows
    big.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).max == rows.head._4)
    }
  }

  test("timeSplit: boundary arithmetic, embargo drop, zero-embargo keeps all") {
    import spark.implicits._
    val rows = Seq(90L, 99L, 100L, 101L, 110L, 89L).toDF("sec")
      .withColumn("id", col("sec"))
    // cutoff 100, embargo 10: train < 90, embargo [90, 100) dropped
    val out = graft.ml.Corpus.timeSplit(rows, "sec", 100L, 10L)
      .collect().map(r => r.getAs[Long]("sec") -> r.getAs[String]("split"))
      .toMap
    assert(out == Map(89L -> "train", 100L -> "test", 101L -> "test",
      110L -> "test"))
    // zero embargo: nothing dropped, boundary row is test
    val all = graft.ml.Corpus.timeSplit(rows, "sec", 100L)
      .collect().map(r => r.getAs[Long]("sec") -> r.getAs[String]("split"))
      .toMap
    assert(all.size == 6 && all(99L) == "train" && all(100L) == "test")
    intercept[IllegalArgumentException](
      graft.ml.Corpus.timeSplit(rows, "sec", 100L, -1L))
  }

  test("splitByGroup: one split per group, deterministic, fractions normalized") {
    import spark.implicits._
    val docs = (1 to 500).map(i => (i.toLong, s"host${i % 37}"))
      .toDF("id", "dom")
    val out = graft.ml.Corpus.splitByGroup(docs, "dom",
        Seq("train" -> 8.0, "val" -> 1.0, "test" -> 1.0))
      .select("id", "dom", "split").as[(Long, String, String)].collect()
    assert(out.length == 500)
    // leakage-free: every group lands in exactly one split
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).distinct.length == 1)
    }
    assert(out.map(_._3).distinct.toSet.subsetOf(Set("train", "val", "test")))
    // unnormalized weights behave like 0.8/0.1/0.1
    val norm = graft.ml.Corpus.splitByGroup(docs, "dom",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("id", "dom", "split").as[(Long, String, String)].collect()
    assert(out.sortBy(_._1).toSeq == norm.sortBy(_._1).toSeq)
    // deterministic across invocations
    val again = graft.ml.Corpus.splitByGroup(docs, "dom",
        Seq("train" -> 8.0, "val" -> 1.0, "test" -> 1.0))
      .select("id", "dom", "split").as[(Long, String, String)].collect()
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("maskSpans: rate edges, block arithmetic, and a replayed hash decision") {
    import spark.implicits._
    val docs = Seq((7L, "a b c d e f g"), (8L, "x y"), (9L, "   "))
      .toDF("doc_id", "text")
    // rate 0: nothing masked, text round-trips (single-space rejoin)
    val none = Corpus.maskSpans(docs, "doc_id", "text", rate = 0.0, spanLen = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(none(7L) == ((7L, 0L, "a b c d e f g")))
    assert(none(8L) == ((2L, 0L, "x y")))
    assert(none(9L) == ((0L, 0L, ""))) // whitespace-only doc is total, empty
    // rate 1: every block masked; one sentinel per block, partial
    // blocks count their real token number
    val all = Corpus.maskSpans(docs, "doc_id", "text", rate = 1.0, spanLen = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(all(7L) == ((7L, 7L, "<X> <X> <X>"))) // blocks: 3+3+1 tokens
    assert(all(8L) == ((2L, 2L, "<X>")))
    // mid rate: replay the md5 threshold per block by hand
    val thr = graft.ml.Profile.strongThreshold(0.25)
    val mid = Corpus.maskSpans(docs, "doc_id", "text", rate = 0.25, spanLen = 3)
      .filter(col("doc_id") === 7L).head()
    val expected = (0 to 2).map { b =>
      if (md5hex(s"7:$b").take(8) < thr) "<X>"
      else Seq("a b c", "d e f", "g")(b)
    }.mkString(" ")
    assert(mid.getString(3) == expected)
    // determinism across reruns (the whole point of hash decisions)
    val rerun = Corpus.maskSpans(docs, "doc_id", "text", rate = 0.25, spanLen = 3)
      .filter(col("doc_id") === 7L).head()
    assert(rerun.getString(3) == expected)
  }

  test("capPerDomain keeps the k best per domain, rank-annotated, ties by id") {
    import spark.implicits._
    // domain a: 5 docs with a score tie at 30; domain b: 2 docs (< k)
    val docs = Seq(
      (1L, "a", 30.0, "p1"), (2L, "a", 30.0, "p2"), (3L, "a", 50.0, "p3"),
      (4L, "a", 10.0, "p4"), (5L, "a", 40.0, "p5"),
      (6L, "b", 1.0, "p6"), (7L, "b", 2.0, "p7"))
      .toDF("id", "dom", "score", "payload")
    val out = Corpus.capPerDomain(docs, "id", "dom", "score", k = 3)
      .select("id", "dom", "payload", "domain_rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(r => (r._2, r._4))
    // a: 50 (id 3), 40 (id 5), then the tie at 30 broken by id → 1
    // b: both survive (group smaller than k), ranked by score desc
    assert(out.toSeq == Seq(
      (3L, "a", "p3", 1L), (5L, "a", "p5", 2L), (1L, "a", "p1", 3L),
      (7L, "b", "p7", 1L), (6L, "b", "p6", 2L)))
    // original columns (payload) survive the join-back
    intercept[IllegalArgumentException](
      Corpus.capPerDomain(docs, "id", "dom", "score", k = 0))
  }

  test("diffSnapshots classifies added/removed/changed/unchanged") {
    import spark.implicits._
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val neu = Seq((2L, "b"), (3L, "C!"), (4L, "d")).toDF("id", "text")
    val got = Corpus.diffSnapshots(old, neu, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("kFold: stable folds in [0,k), append-invariant, roughly balanced") {
    import spark.implicits._
    val df = (1L to 3000L).toDF("id")
    val folds = Corpus.kFold(df, "id", 5).select("id", "fold")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(folds.values.forall(f => f >= 0 && f < 5))
    // appending rows never moves existing assignments
    val more = Corpus.kFold((1L to 6000L).toDF("id"), "id", 5)
      .select("id", "fold").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    folds.foreach { case (id, f) => assert(more(id) == f) }
    // balance within 20% of n/k (Fibonacci equidistribution)
    val sizes = folds.values.groupBy(identity).map(_._2.size)
    assert(sizes.forall(s => math.abs(s - 600) < 120), sizes.toSeq.sorted)
    intercept[IllegalArgumentException](Corpus.kFold(df, "id", 1))
  }

  test("packWholeDocs: best-fit decreasing fills bins tightly") {
    import spark.implicits._
    // ctx=10, sizes 6,5,4,3,2 -> BFD gives two full bins (6+4, 5+3+2);
    // naive id-order next-fit would need three
    val docs = Seq((0L, 6L), (1L, 5L), (2L, 4L), (3L, 3L), (4L, 2L))
      .toDF("doc_id", "tok")
    val got = Corpus.packWholeDocs(docs, "doc_id", "tok", ctxLen = 10,
        nShards = 1)
      .select("bin_id", "id", "n_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._2).sorted.toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    val fills = got.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(fills.values.toSeq.sorted == Seq(10L, 10L), s"fills: $fills")
  }

  test("packWholeDocs: oversize and exact-fit docs get bins of their own") {
    import spark.implicits._
    val docs = Seq((0L, 15L), (1L, 10L), (2L, 3L), (3L, 4L))
      .toDF("doc_id", "tok")
    val got = Corpus.packWholeDocs(docs, "doc_id", "tok", ctxLen = 10,
        nShards = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val byBin = got.groupBy(_._1)
    val binOf = got.map(t => t._2 -> t._1).toMap
    assert(byBin(binOf(0L)).length == 1, "oversize doc alone in its bin")
    assert(byBin(binOf(1L)).length == 1, "exact-fit doc alone in its bin")
    // 3 and 4 share the remaining bin
    assert(binOf(2L) == binOf(3L))
    assert(byBin.size == 3)
  }

  test("packWholeDocs: deterministic, sharded, and within ctxLen") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val docs = (0L until 500L).map(i => (i, 10L + rnd.nextInt(120)))
      .toDF("doc_id", "tok")
    def run() = Corpus.packWholeDocs(docs, "doc_id", "tok", ctxLen = 256,
        nShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._3)
    val a = run()
    assert(a.toSeq == run().toSeq, "must be deterministic")
    assert(a.length == 500)
    assert(a.forall { case (shard, _, id, _) => id % 4 == shard })
    val fills = a.groupBy(t => (t._1, t._2)).values.map(_.map(_._4).sum)
    assert(fills.forall(_ <= 256))
    intercept[IllegalArgumentException](
      Corpus.packWholeDocs(docs, "doc_id", "tok", 0, 4))
  }

  test("orderForTraining: dense md5-permutation ranks, prefix-shard == global sort") {
    import spark.implicits._
    val ids = (0L until 300L).toDF("doc_id")
    val got = Corpus.orderForTraining(ids, "doc_id", prefixLen = 2)
      .select("doc_id", "global_pos")
      .as[(Long, Long)].collect().toMap
    // dense 0..n-1
    assert(got.values.toSeq.sorted == (0L until 300L).toList)
    // equals the direct global sort by (md5(id), id)
    val expect = (0L until 300L)
      .sortBy(id => (java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, id))
      .zipWithIndex.map { case (id, i) => id -> i.toLong }.toMap
    assert(got == expect)
    // different prefix lengths agree (the shard scheme is internal)
    val got1 = Corpus.orderForTraining(ids, "doc_id", prefixLen = 1)
      .select("doc_id", "global_pos").as[(Long, Long)].collect().toMap
    assert(got1 == got)
    intercept[IllegalArgumentException](
      Corpus.orderForTraining(ids, "doc_id", prefixLen = 0))
  }

  test("weightedSample: exact E-S replay, weight bias, no replacement") {
    import spark.implicits._
    def fib(id: Long) = (id % 2147483647L) * 1327217885L % 2147483647L
    // 200 light rows (w=1) + one heavy row (w=10000)
    val rows = (0L until 200L).map(i => (i, 1L)) :+ (999L, 10000L)
    val df = rows.toDF("id", "w")
    val got = Corpus.weightedSample(df, "id", "w", n = 20)
      .select("id", "w").as[(Long, Long)].collect().sortBy(_._1)
    // exact driver-side replay of the key ranking
    val expect = rows
      .map { case (id, w) =>
        (id, w, math.log((fib(id) + 1).toDouble / 2147483648.0) / w)
      }
      .sortBy { case (id, _, k) => (-k, id) }.take(20)
      .map(t => (t._1, t._2)).sortBy(_._1)
    assert(got.toSeq == expect)
    // no duplicates; the heavy row is (nearly surely) included
    assert(got.map(_._1).distinct.length == got.length)
    assert(got.exists(_._1 == 999L), "weight-10000 row missed")
    // non-positive weights are excluded entirely
    val withZero = (rows :+ (998L, 0L) :+ (997L, -3L)).toDF("id", "w")
    val ids = Corpus.weightedSample(withZero, "id", "w", n = 300)
      .select("id").as[Long].collect().toSet
    assert(!ids.contains(998L) && !ids.contains(997L))
    intercept[IllegalArgumentException](Corpus.weightedSample(df, "id", "w", 0))
  }

  test("contrastiveTriplets: exact hash-draw replay, anchor/positive excluded") {
    import spark.implicits._
    def fib(id: Long) = (id % 2147483647L) * 1327217885L % 2147483647L
    val corpus = (0L until 50L).toDF("doc_id")
    val pairs = Seq((0L, 1L), (10L, 11L), (20L, 21L))
      .toDF("anchor", "positive")
    val got = Corpus.contrastiveTriplets(pairs, corpus, "doc_id", nNeg = 4)
      .select("anchor", "positive", "neg_rank", "negative")
      .as[(Long, Long, Long, Long)].collect().sortBy(t => (t._1, t._3))

    // driver replay: rank corpus by (md5, id), draw, drop collisions
    val ranked = (0L until 50L)
      .sortBy(id => (java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, id))
    val expect = for {
      (a, p) <- Seq((0L, 1L), (10L, 11L), (20L, 21L))
      j <- 0L until 4L
      neg = ranked((((fib(a) + (j + 1) * 104729L) % 2147483647L) % 50L).toInt)
      if neg != a && neg != p
    } yield (a, p, j, neg)
    assert(got.toSeq == expect.sortBy(t => (t._1, t._3)))
    // draws are in-corpus and never the anchor or its positive
    assert(got.forall(t => t._4 >= 0L && t._4 < 50L))
    assert(got.forall(t => t._4 != t._1 && t._4 != t._2))
    intercept[IllegalArgumentException](
      Corpus.contrastiveTriplets(pairs, corpus, "doc_id", 0))
  }

  test("dropWords / swapAdjacentWords: deterministic coins, exact replay") {
    import spark.implicits._
    def md5hex8(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
    val thr = graft.ml.Profile.strongThreshold(0.5)
    val docs = Seq((1L, "a b c d e"), (2L, ""), (3L, "x y"))
      .toDF("doc_id", "text")

    val dr = Corpus.dropWords(docs, "doc_id", "text", rate = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // driver replay of the same coins
    def keep(id: Long, i: Int) = md5hex8(s"wd:$id:$i") >= thr
    val exp1 = "a b c d e".split(" ").zipWithIndex
      .filter { case (_, i) => keep(1L, i) }.map(_._1).mkString(" ")
    assert(dr(1L)._3 == exp1, s"got ${dr(1L)}")
    assert(dr(1L)._1 == 5L && dr(1L)._2 == 5L - exp1.split(" ")
      .count(_.nonEmpty))
    assert(dr(2L) == ((0L, 0L, "")))
    // determinism across runs
    val again = Corpus.dropWords(docs, "doc_id", "text", rate = 0.5)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(again(1L) == dr(1L)._3)
    // rate 0 / 1 extremes
    val none = Corpus.dropWords(docs, "doc_id", "text", rate = 0.0)
      .filter(col("n_dropped") > 0).count()
    assert(none == 0)

    val sw = Corpus.swapAdjacentWords(docs, "doc_id", "text", rate = 1.0)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getString(3))).toMap
    // rate 1: every pair swaps, odd tail fixed
    assert(sw(1L) == ((2L, "b a d c e")))
    assert(sw(3L) == ((1L, "y x")))
    assert(sw(2L) == ((0L, "")))
    // swapping is a permutation: token multiset preserved
    val sw2 = Corpus.swapAdjacentWords(docs, "doc_id", "text", rate = 0.5)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(sw2(1L).split(" ").sorted.toSeq == Seq("a", "b", "c", "d", "e"))
    intercept[IllegalArgumentException](
      Corpus.dropWords(docs, "doc_id", "text", 1.5))
  }

  test("weightedSamplePerStratum: independent E-S draws per stratum") {
    import spark.implicits._
    val rows = (0L until 60L).map(i => (i, if (i % 2 == 0) "a" else "b", 1L + i % 3))
    val df = rows.toDF("id", "src", "w")
    val got = Corpus.weightedSamplePerStratum(df, "id", "src", "w", n = 4)
      .select("id", "src", "sample_rank").as[(Long, String, Long)]
      .collect()
    // exactly 4 per stratum, ranks dense 1..4
    val bySrc = got.groupBy(_._2)
    assert(bySrc.keySet == Set("a", "b"))
    bySrc.values.foreach { g =>
      assert(g.length == 4)
      assert(g.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    }
    // matches the global rule applied within each stratum
    def fib(id: Long) = (id % 2147483647L) * 1327217885L % 2147483647L
    def key(id: Long, w: Long) =
      math.log((fib(id) + 1).toDouble / 2147483648.0) / w
    val expect = rows.groupBy(_._2).flatMap { case (src, g) =>
      g.sortBy { case (id, _, w) => (-key(id, w), id) }.take(4).map(_._1)
    }.toSet
    assert(got.map(_._1).toSet == expect)
    intercept[IllegalArgumentException](
      Corpus.weightedSamplePerStratum(df, "id", "src", "w", 0))
  }

  test("fimTransform: cut invariants, token preservation, exact reassembly") {
    import spark.implicits._
    val docs = (1L to 40L)
      .map(i => (i, (0 until (i % 11).toInt + 1).map(j => s"t$j").mkString(" ")))
      .toDF("id", "text")
    val rows = Corpus.fimTransform(docs, "id", "text").collect()
    assert(rows.length == 40)
    val orig = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val (id, n, c1, c2, fim) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))
      assert(0 <= c1 && c1 <= c2 && c2 <= n, s"id=$id cuts $c1 $c2 n=$n")
      // PSM layout: <PRE> p <SUF> s <MID> m — reassembling p+m+s
      // restores the original token sequence exactly
      val w = orig(id).split("\\s+").toSeq
      assert(n == w.length)
      val afterPre = fim.stripPrefix("<PRE>")
      val Array(p, rest) = afterPre.split("<SUF>", 2)
      val Array(sfx, m) = rest.split("<MID>", 2)
      def toks(s: String) = s.trim.split("\\s+").filter(_.nonEmpty).toSeq
      assert(toks(p) ++ toks(m) ++ toks(sfx) == w, s"id=$id fim=$fim")
      assert(toks(p).length == c1 && toks(m).length == (c2 - c1))
    }
    // determinism + seed sensitivity
    val again = Corpus.fimTransform(docs, "id", "text").collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    val other = Corpus.fimTransform(docs, "id", "text", seed = "other")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val mine = rows.map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(other != mine)
  }
}
