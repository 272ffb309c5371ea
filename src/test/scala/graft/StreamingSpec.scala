package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streaming
import graft.streaming.Streaming.{SessionAssignment, SessionEvent, SessionState}

/** Structured-Streaming shapes against MemoryStream micro-batches. */
class StreamingSpec extends SparkSpec {

  test("tumbling window aggregation over a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "k", "v")
    val agg = Streaming.tumblingAgg(events, "ts", "k", "v", "1 hour", "2 hours")
    val query = agg.writeStream.format("memory").queryName("tumbling")
      .outputMode("update").start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2020-01-01 $h%02d:$m%02d:00")
    input.addData((ts(10, 5), "a", 1.0), (ts(10, 40), "a", 2.0), (ts(11, 5), "a", 4.0))
    query.processAllAvailable()
    val rows = spark.table("tumbling")
      .select(col("window.start").cast("string"), col("k"), col("n"), col("sum_value"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    query.stop()
    assert(rows == Set(
      ("2020-01-01 10:00:00", "a", 2L, 3.0),
      ("2020-01-01 11:00:00", "a", 1L, 4.0)))
  }

  test("sliding windows place events into overlapping windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "k", "v")
    val agg = Streaming.slidingAgg(events, "ts", "k", "v",
      "1 hour", "30 minutes", "2 hours")
    val query = agg.writeStream.format("memory").queryName("sliding")
      .outputMode("update").start()
    input.addData((java.sql.Timestamp.valueOf("2020-01-01 10:40:00"), "a", 1.0))
    query.processAllAvailable()
    val windows = spark.table("sliding")
      .select(col("window.start").cast("string")).collect().map(_.getString(0)).toSet
    query.stop()
    // 10:40 lands in [10:00,11:00) and [10:30,11:30)
    assert(windows == Set("2020-01-01 10:00:00", "2020-01-01 10:30:00"))
  }

  test("streaming dedup drops repeats within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val events = input.toDF().toDF("ts", "id")
    val out = Streaming.dedupStream(events, "ts", "1 hour", "id")
    val query = out.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    val t0 = java.sql.Timestamp.valueOf("2020-01-01 10:00:00")
    input.addData((t0, 1L), (t0, 1L), (t0, 2L))
    query.processAllAvailable()
    input.addData((java.sql.Timestamp.valueOf("2020-01-01 10:10:00"), 1L))
    query.processAllAvailable()
    val ids = spark.table("dedup").select("id").collect().map(_.getLong(0)).toSeq
    query.stop()
    assert(ids.sorted == Seq(1L, 2L)) // the repeats were dropped
  }

  test("stream-stream interval join matches within the delay bound only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(java.sql.Timestamp, Long, String)]
    val views = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val out = Streaming.intervalJoin(
      clicks.toDF().toDF("cts", "k", "cid"),
      views.toDF().toDF("vts", "k", "v"),
      "k", "cts", "vts", watermark = "1 hour", maxDelay = "30 minutes")
    val query = out.writeStream.format("memory").queryName("ivjoin")
      .outputMode("append").start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2020-01-01 $h%02d:$m%02d:00")
    views.addData((ts(10, 0), 1L, 5.0), (ts(9, 0), 1L, 7.0), (ts(10, 10), 2L, 9.0))
    clicks.addData((ts(10, 20), 1L, "c1"), (ts(10, 20), 2L, "c2"))
    query.processAllAvailable()
    val rows = spark.table("ivjoin").select("cid", "v").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet
    query.stop()
    // c1 matches only the 10:00 view (9:00 is outside the 30-min bound);
    // c2 matches the 10:10 view on key 2
    assert(rows == Set(("c1", 5.0), ("c2", 9.0)))
  }

  test("stream-stream as-of join attaches the single latest right row, across batches and out of order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val trades = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val quotes = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val out = Streaming.asofJoinStream(
      trades.toDF().toDF("tts", "k", "qty"),
      quotes.toDF().toDF("qts", "k", "px"),
      "k", "tts", "qty", "qts", "px",
      watermark = "10 seconds", lookbackSec = 3600L)
    val query = out.writeStream.format("memory").queryName("asofstream")
      .outputMode("append").start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2020-01-01 $h%02d:$m%02d:00")
    // batch 1: quotes arrive OUT OF ORDER (10:05 before 10:02), plus a
    // trade between them and one on a quote-less key
    quotes.addData((ts(10, 5), 1L, 105.0), (ts(10, 2), 1L, 102.0))
    trades.addData((ts(10, 3), 1L, 7.0), (ts(10, 4), 2L, 9.0))
    query.processAllAvailable()
    // batch 2: later events push the watermark past the batch-1 trades
    quotes.addData((ts(10, 30), 1L, 130.0))
    trades.addData((ts(10, 31), 1L, 8.0))
    query.processAllAvailable()
    // batch 3: advance the watermark past 10:31 so trade 2 flushes
    trades.addData((ts(11, 0), 3L, 1.0))
    quotes.addData((ts(11, 0), 3L, 50.0))
    query.processAllAvailable()
    trades.addData((ts(11, 30), 3L, 2.0))
    query.processAllAvailable()
    // batch 5: unrelated key pushes the watermark past 11:00, so key
    // 3's EVENT-TIME TIMER fires inside a data batch (no-data batches
    // can run after processAllAvailable returns) and flushes its
    // pending trade with no new rows for that key
    quotes.addData((ts(12, 0), 9L, 1.0))
    query.processAllAvailable()
    val rows = spark.table("asofstream")
      .select("key", "sec", "value", "rightSec", "rightValue").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toSet
    query.stop()
    def s(h: Int, m: Int) = ts(h, m).getTime / 1000
    // the 10:03 trade matches the 10:02 quote (NOT the later 10:05 one
    // that arrived first); the key-2 trade has no quote (left outer);
    // the 10:31 trade matches the 10:30 quote across batches
    assert(rows.contains((1L, s(10, 3), 7.0, Some(s(10, 2)), Some(102.0))),
      s"out-of-order as-of wrong: $rows")
    assert(rows.contains((2L, s(10, 4), 9.0, None, None)))
    assert(rows.contains((1L, s(10, 31), 8.0, Some(s(10, 30)), Some(130.0))))
    assert(rows.contains((3L, s(11, 0), 1.0, Some(s(11, 0)), Some(50.0))))
  }

  test("streaming funnel advances greedily across out-of-order batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val out = Streaming.funnelStream(input.toDF().toDF("ts", "u", "tp"),
      "u", "ts", "tp", Seq("A", "B", "C"), windowSec = 3600L,
      watermark = "500 seconds")
    val query = out.writeStream.format("memory").queryName("funnelstream")
      .outputMode("append").start()
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    // batch 1: user 1's A and C arrive FIRST (B missing); user 2's A.
    // Watermark stays 500 s behind the max event so B isn't late.
    input.addData((ts(1000100), 1L, "A"), (ts(1000250), 1L, "C"),
      (ts(1000100), 2L, "A"))
    query.processAllAvailable()
    // batch 2: the missing B arrives out of order, above the watermark
    input.addData((ts(1000200), 1L, "B"))
    query.processAllAvailable()
    // batch 3: key 9 starts; user 2's B lands outside the 1 h window
    input.addData((ts(1001500), 9L, "A"), (ts(1007300), 2L, "B"))
    query.processAllAvailable()
    // batches 4-5: advance the watermark so every buffered event and
    // timer flushes inside data batches
    input.addData((ts(1007900), 8L, "B"))
    query.processAllAvailable()
    input.addData((ts(1050000), 8L, "B"))
    query.processAllAvailable()
    val rows = spark.table("funnelstream")
      .as[Streaming.FunnelProgress].collect()
      .map(p => (p.key, p.step, p.sec)).toSet
    query.stop()
    // user 1 completes all three steps despite C arriving before B;
    // user 2 stops at step 1 (their B is outside the window); key 9
    // reaches step 1; key 8's lone Bs never start a funnel
    assert(rows == Set(
      (1L, 1, 1000100L), (1L, 2, 1000200L), (1L, 3, 1000250L),
      (2L, 1, 1000100L), (9L, 1, 1001500L)), s"got $rows")
  }

  test("stream-static enrichment joins each micro-batch to the dimension") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("k", "tier")
    val out = Streaming.enrich(input.toDF().toDF("ts", "k"), dim, Seq("k"))
    val query = out.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    input.addData(
      (java.sql.Timestamp.valueOf("2020-01-01 10:00:00"), 1L),
      (java.sql.Timestamp.valueOf("2020-01-01 10:01:00"), 3L))
    query.processAllAvailable()
    val rows = spark.table("enriched").select("k", "tier").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    query.stop()
    assert(rows == Set((1L, Some("gold")), (3L, None))) // left join keeps unmatched
  }

  test("incremental frequency sketch merges per-batch partials into the versioned store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-freq").toString
    val store = graft.sources.VersionedKeyValStore(dir)
    val input = MemoryStream[String]
    val query = Streaming.incrementalFreqSketch(input.toDS(), store, k = 8)
    // three skewed batches over a vocabulary wider than the sketch
    input.addData(Seq.fill(40)("hot") ++ (1 to 10).map(i => s"a$i"): _*)
    query.processAllAvailable()
    input.addData(Seq.fill(35)("hot") ++ (1 to 10).map(i => s"b$i"): _*)
    query.processAllAvailable()
    input.addData(Seq.fill(25)("warm") ++ (1 to 10).map(i => s"c$i"): _*)
    query.processAllAvailable()
    query.stop()

    val sk = graft.agg.FreqSketch.fromBytes(
      store.read(spark).select(store.valCol).head().getAs[Array[Byte]](0))
    val n = 40 + 35 + 25 + 30
    assert(sk.total == n, s"total must stay exact, got ${sk.total}")
    assert(sk.counters.size <= 16)
    // the error bound survives cross-batch merging: hot (75) and warm
    // (25) both clear n/(k+1) = 14 and must be tracked within bound
    assert(sk.errorBound == n / 9)
    Seq("hot" -> 75L, "warm" -> 25L).foreach { case (t, c) =>
      assert(sk.counters.contains(t), s"lost $t")
      assert(sk.lowerBound(t) <= c && c - sk.lowerBound(t) <= sk.errorBound)
    }
    // three incremental writes => three store versions
    assert(store.versions(spark).size == 3)
  }

  test("incremental quantiles maintain per-key order statistics across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-qsk").toString
    val store = graft.sources.VersionedKeyValStore(dir)
    val input = MemoryStream[(String, Double)]
    val query = Streaming.incrementalQuantiles(input.toDS(), store, k = 64)
    // endpoint a: two batches covering 1..1000; endpoint b: constant
    input.addData((1 to 500).map(i => ("a", i.toDouble)) ++
      (1 to 50).map(_ => ("b", 42.0)): _*)
    query.processAllAvailable()
    input.addData((501 to 1000).map(i => ("a", i.toDouble)): _*)
    query.processAllAvailable()
    query.stop()

    val sks = store.read(spark).collect().map(r => r.getString(0) ->
      graft.agg.Qsketch.fromBytes(r.getAs[Array[Byte]](1))).toMap
    assert(sks("a").n == 1000L)
    assert(math.abs(sks("a").quantile(0.5) - 500.0) < 60.0,
      s"a median ${sks("a").quantile(0.5)}")
    assert(math.abs(sks("a").quantile(0.9) - 900.0) < 60.0)
    assert(sks("b").n == 50L && sks("b").quantile(0.5) == 42.0)
  }

  test("incremental distinct maintains per-key HLL uniques across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-hll").toString
    val store = graft.sources.VersionedKeyValStore(dir)
    val input = MemoryStream[(String, String)]
    val query = Streaming.incrementalDistinct(input.toDS(), store)
    // batch 1: a sees u1..u80, b sees u1..u30
    input.addData((1 to 80).map(i => ("a", s"u$i")) ++
      (1 to 30).map(i => ("b", s"u$i")): _*)
    query.processAllAvailable()
    // batch 2: a re-sees u41..u80 (no new) plus u81..u120 (new)
    input.addData((41 to 120).map(i => ("a", s"u$i")): _*)
    query.processAllAvailable()
    query.stop()

    val est = store.read(spark).collect().map(r => r.getString(0) ->
      graft.agg.Hll.fromBytes(r.getAs[Array[Byte]](1)).estimate).toMap
    // union across batches, not sum: a = |u1..u120| = 120 (±1% rsd)
    assert(math.abs(est("a") - 120L) <= 6, s"a: ${est("a")}")
    assert(math.abs(est("b") - 30L) <= 3, s"b: ${est("b")}")
  }

  test("streaming corpus ingest filters, dedups vs batch and store, appends corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val sigDir = s"$root/sigs"
    val corpusDir = s"$root/corpus"
    val base = "the quick brown fox jumps over the lazy dog and it is a " +
      "good day for running in the park with friends"
    val other = "many people enjoy reading books about science and history " +
      "because they offer new ideas and it is fun to learn something"
    val input = MemoryStream[(Long, String)]
    val query = Streaming.corpusIngest(input.toDS().toDF("doc_id", "text"),
      sigDir, corpusDir, lang = "en", minQuality = 0.9, threshold = 0.7)
    // batch 1: near-dup within batch (2 vs 1) and a junk doc
    input.addData((1L, base), (2L, base + " indeed"), (3L, "zzz zzz zzz"))
    query.processAllAvailable()
    // batch 2: near-dup of an ACCEPTED doc across batches + a fresh doc
    input.addData((10L, base + " really truly"), (11L, other))
    query.processAllAvailable()
    query.stop()

    val corpus = spark.read.parquet(corpusDir)
    assert(corpus.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 11L))
    // the store carries exactly the accepted signatures
    val sigs = spark.read.parquet(sigDir)
    assert(sigs.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 11L))
    // restart-safety: a new query over the same store still drops
    // near-dups of previously accepted docs (state lives in the store)
    val input2 = MemoryStream[(Long, String)]
    val query2 = Streaming.corpusIngest(input2.toDS().toDF("doc_id", "text"),
      sigDir, corpusDir, lang = "en", minQuality = 0.9, threshold = 0.7)
    input2.addData((20L, base + " once more"))
    query2.processAllAvailable()
    query2.stop()
    assert(spark.read.parquet(corpusDir).select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 11L))
  }

  test("streaming vector ingest appends only fresh ids, encoded against frozen artifacts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val indexDir =
      java.nio.file.Files.createTempDirectory("graft-vecidx").toString + "/index"
    val rnd = new scala.util.Random(13)
    val vecsSeq = (0L until 40L).map(i => (i, Array.fill(16)(rnd.nextFloat())))
    val corpus = vecsSeq.toDF("id", "vec")
    val cents = graft.ml.Similarity.kmeansCentroids(corpus, nCentroids = 4)
      .cache()
    val cbBytes = graft.ml.Pq.train(corpus, m = 4, k = 8).toBytes

    val input = MemoryStream[(Long, Array[Float])]
    val query = Streaming.vectorIngest(input.toDS().toDF("id", "vec"),
      cents, cbBytes, indexDir)
    input.addData(vecsSeq.take(10): _*)
    query.processAllAvailable()
    // batch 2: 5 repeats (already indexed) + 10 fresh + an in-batch dup
    input.addData(vecsSeq.slice(5, 20) :+ vecsSeq(15): _*)
    query.processAllAvailable()
    query.stop()

    val index = spark.read.parquet(indexDir)
    assert(index.select("id").as[Long].collect().sorted.toSeq ==
      (0L until 20L).toSeq, "each id indexed exactly once")
    // every appended row must byte-match the batch encode against the
    // same frozen artifacts (split-order invariance, streaming form)
    val batch = graft.ml.Pq.appendToIndex(
        vecsSeq.take(20).toDF("id", "vec"), cents,
        graft.ml.Pq.codebooksFromBytes(cbBytes))
      .as[(Int, Long, Array[Byte])].collect()
      .map { case (c, id, codes) => (c, id, codes.toSeq) }.toSet
    val streamed = index.select(col("centroid").cast("int"), col("id"),
        col("codes"))
      .as[(Int, Long, Array[Byte])].collect()
      .map { case (c, id, codes) => (c, id, codes.toSeq) }.toSet
    assert(streamed == batch)
    graft.core.PipelineCaches.unpersistAll()
  }

  test("stateful gap sessionization across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val out = Streaming.sessionize(input.toDS(), gapSeconds = 1800)
    val query = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    // batch 1: two events 10 min apart (same session)
    input.addData(SessionEvent(1L, 1000L), SessionEvent(1L, 1600L))
    query.processAllAvailable()
    // batch 2: an event 2h later (new session) — state carries over
    input.addData(SessionEvent(1L, 9000L))
    query.processAllAvailable()
    val rows = spark.table("sessions").as[SessionAssignment].collect()
      .sortBy(_.sec).map(a => (a.sec, a.sessionId)).toSeq
    query.stop()
    assert(rows == Seq((1000L, 1L), (1600L, 1L), (9000L, 2L)))
  }

  test("drift monitor: running ingest distribution vs frozen baseline per batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-drift").toString
    val store = graft.sources.VersionedKeyValStore(dir)
    // baseline: 4 low + 4 high around the single cut at 10
    val baseline = Seq(1.0, 2.0, 3.0, 4.0, 11.0, 12.0, 13.0, 14.0).toDF("v")
    val input = MemoryStream[Double]
    val alerts = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double, Double)]
    val query = Streaming.driftMonitor(input.toDF().withColumnRenamed("value", "v"),
      "v", baseline, Seq(10.0), store) { (id, psi, kl, tvd) =>
      alerts.synchronized { alerts += ((id, psi, kl, tvd)); () }
    }
    // batch 1 mirrors the baseline mix -> drift ~ 0
    input.addData(1.0, 2.0, 11.0, 12.0)
    query.processAllAvailable()
    // batch 2 is all-high -> the RUNNING distribution shifts and every
    // measure must strictly increase
    input.addData(20.0, 21.0, 22.0, 23.0, 24.0, 25.0, 26.0, 27.0)
    query.processAllAvailable()
    query.stop()

    val got = alerts.synchronized(alerts.sortBy(_._1).toList)
    assert(got.size == 2, s"two batches -> two alerts, got $got")
    val (_, psi1, kl1, tvd1) = got(0)
    val (_, psi2, kl2, tvd2) = got(1)
    assert(math.abs(psi1) < 1e-12 && math.abs(tvd1) < 1e-12,
      s"identical mix must read as zero drift: $psi1 / $tvd1")
    assert(psi2 > psi1 && kl2 > kl1 && tvd2 > tvd1, s"$got")
    // running counts in the store: low 2+0=2, high 2+8=10
    val counts = store.read(spark).collect()
      .map(r => r.getAs[Long]("key") -> r.getAs[Long]("value")).toMap
    assert(counts == Map(1L -> 2L, 2L -> 10L), s"$counts")
    // exact driver-side replay of the batch-2 summary
    val (b1, b2) = ((4 + 0.5) / 9.0, (4 + 0.5) / 9.0)
    val (c1, c2) = ((2 + 0.5) / 13.0, (10 + 0.5) / 13.0)
    val expPsi = (c1 - b1) * math.log(c1 / b1) + (c2 - b2) * math.log(c2 / b2)
    val expTvd = (math.abs(c1 - b1) + math.abs(c2 - b2)) / 2
    assert(math.abs(psi2 - expPsi) < 1e-12)
    assert(math.abs(tvd2 - expTvd) < 1e-12)
  }

  test("sequential monitor: users count once across batches, p runs down") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-seq").toString
    val store = graft.sources.VersionedKeyValStore(dir)
    val input = MemoryStream[(Long, String, String)] // (user, variant, type)
    val results = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Long, Long, Long, Long, Option[Double], Double)]
    val query = Streaming.sequentialMonitor(
      input.toDF().toDF("user_id", "variant", "event_type"),
      "user_id", "variant", "event_type", "purchase", "ctl", store) {
      (id, v, nT, cT, nC, cC, ll, p) =>
        results.synchronized { results += ((id, v, nT, cT, nC, cC, ll, p)); () }
    }
    // batch 1: ctl {1,2} no conv; trt {11 converts, 12}
    input.addData((1L, "ctl", "view"), (2L, "ctl", "view"),
      (11L, "trt", "purchase"), (12L, "trt", "view"))
    query.processAllAvailable()
    // batch 2: user 11 reappears (must NOT double-count), user 12
    // converts late (flag upgrade), ctl gains user 3
    input.addData((11L, "trt", "view"), (12L, "trt", "purchase"),
      (3L, "ctl", "view"))
    query.processAllAvailable()
    query.stop()

    val got = results.synchronized(results.sortBy(_._1).toList)
    assert(got.size == 2, s"$got")
    val (_, v1, n1t, c1t, n1c, c1c, ll1, p1) = got(0)
    assert(v1 == "trt" && (n1t, c1t, n1c, c1c) == ((2L, 1L, 2L, 0L)))
    val expLl1 = graft.events.Events.msprtLogLambda(1, 2, 0, 2, 0.0001)
    assert(ll1 == expLl1)
    assert(math.abs(p1 - math.min(1.0, math.exp(-expLl1.get))) < 1e-12)
    val (_, _, n2t, c2t, n2c, c2c, _, p2) = got(1)
    assert((n2t, c2t, n2c, c2c) == ((2L, 2L, 3L, 0L)),
      s"re-seen user must not double-count: ${got(1)}")
    assert(p2 <= p1 + 1e-15, "always-valid p must be non-increasing")
  }

  test("trending stream: store-merged window counts, late events included") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-trend").toString
    val store = graft.sources.VersionedKeyValStore(dir)
    val input = MemoryStream[(Long, String)]
    val batches = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Seq[(Long, String, Long, Long)])]
    val query = Streaming.trendingStream(
      input.toDF().toDF("sec", "etype"), "sec", "etype",
      windowSec = 10L, k = 2, store) { (id, top) =>
      batches.synchronized { batches += ((id, top)); () }
    }
    // batch 1: win0 has a:2 b:1
    input.addData((1L, "a"), (2L, "a"), (3L, "b"))
    query.processAllAvailable()
    // batch 2: LATE win0 b:2 (overtakes a) + win1 c:1
    input.addData((4L, "b"), (5L, "b"), (12L, "c"))
    query.processAllAvailable()
    query.stop()

    val got = batches.synchronized(batches.sortBy(_._1).toList)
    assert(got.size == 2)
    assert(got(0)._2 == Seq((0L, "a", 2L, 1L), (0L, "b", 1L, 2L)))
    // after the late batch, win0 totals are a:2 b:3 -> b leads; win1 c
    assert(got(1)._2 == Seq((0L, "b", 3L, 1L), (0L, "a", 2L, 2L),
      (1L, "c", 1L, 1L)))
  }

  test("scd2 stream: late observation splits history across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-scd2").toString
    val input = MemoryStream[(Long, Long, String)]
    val query = Streaming.scd2Stream(
      input.toDF().toDF("k", "ts", "tier"), dir,
      Seq("k"), Seq("tier"), "ts")
    input.addData((1L, 10L, "bronze"), (1L, 50L, "gold"))
    query.processAllAvailable()
    // LATE middle observation arrives in a later batch
    input.addData((1L, 30L, "silver"))
    query.processAllAvailable()
    query.stop()

    val latest = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("v")).map(_.drop(1).toLong).max
    val got = spark.read.parquet(s"$dir/v$latest")
      .collect().map(r => (r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).sortBy(_._2)
    assert(got.toSeq == Seq(
      ("bronze", 10L, Some(30L)),
      ("silver", 30L, Some(50L)),
      ("gold", 50L, None)), got.toSeq.toString)
  }
}
