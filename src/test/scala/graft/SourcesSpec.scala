package graft

import org.apache.spark.sql.functions._
import graft.sources._
import java.nio.file.Files

/** Source layer round-trips and the versioned-store protocol
  * (reference FileSourceTest.scala, VersionedKeyValSource semantics).
  */
class SourcesSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft-src").toString

  test("Tsv/Csv round trip") {
    import spark.implicits._
    val dir = tmp() + "/t"
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    Tsv(dir, header = true).write(df)
    val back = Tsv(dir, header = true).read(spark)
      .select(col("k").cast("int"), col("v"))
    assert(back.collect().map(r => (r.getInt(0), r.getString(1))).toSet ==
      Set((1, "a"), (2, "b")))
  }

  test("SequenceFileSource interops with Hadoop's own writer/reader " +
      "classes across all three Writable shapes") {
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import org.apache.hadoop.io.{BytesWritable, LongWritable, SequenceFile, Text}
    import spark.implicits._
    val dir = tmp()
    val conf = new Configuration()
    // 1) a file written by Hadoop's OWN writer reads back
    val tt = new Path(dir, "text.seq")
    val w1 = SequenceFile.createWriter(conf,
      SequenceFile.Writer.file(tt),
      SequenceFile.Writer.keyClass(classOf[Text]),
      SequenceFile.Writer.valueClass(classOf[Text]))
    Seq("a" -> "1", "b" -> "2", "c" -> "3")
      .foreach { case (k, v) => w1.append(new Text(k), new Text(v)) }
    w1.close()
    assert(SequenceFileSource(tt.toString).readText(spark).collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq ==
      Seq("a" -> "1", "b" -> "2", "c" -> "3"))
    // 2) LongWritable/Text (TextLine shape)
    val lt = new Path(dir, "lines.seq")
    val w2 = SequenceFile.createWriter(conf,
      SequenceFile.Writer.file(lt),
      SequenceFile.Writer.keyClass(classOf[LongWritable]),
      SequenceFile.Writer.valueClass(classOf[Text]))
    Seq(0L -> "first", 6L -> "second").foreach { case (k, v) =>
      w2.append(new LongWritable(k), new Text(v)) }
    w2.close()
    assert(SequenceFileSource(lt.toString).readLines(spark).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ==
      Seq(0L -> "first", 6L -> "second"))
    // 3) engine write → Hadoop's OWN reader sees the records
    val out = s"$dir/out"
    SequenceFileSource(out).writeText(
      Seq(("x", "10"), ("y", "20")).toDF("key", "value"))
    val parts = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    val got = scala.collection.mutable.ListBuffer[(String, String)]()
    parts.foreach { f =>
      val r = new SequenceFile.Reader(conf,
        SequenceFile.Reader.file(new Path(f.getAbsolutePath)))
      val k = new Text(); val v = new Text()
      while (r.next(k, v)) got += ((k.toString, v.toString))
      r.close()
    }
    assert(got.sorted.toList == List(("x", "10"), ("y", "20")))
    // 4) binary shape round-trips through the engine both ways
    val bin = s"$dir/bin"
    SequenceFileSource(bin).writeBytes(
      Seq((Array[Byte](1, 2), Array[Byte](3)),
        (Array[Byte](4), Array[Byte](5, 6))).toDF("key", "value"))
    assert(SequenceFileSource(bin).readBytes(spark).collect()
      .map(r => (r.getAs[Array[Byte]](0).toSeq,
        r.getAs[Array[Byte]](1).toSeq)).sortBy(_._1.head).toSeq ==
      Seq((Seq[Byte](1, 2), Seq[Byte](3)), (Seq[Byte](4), Seq[Byte](5, 6))))
    // 5) Overwrite replaces, Ignore is a no-op
    SequenceFileSource(out).writeText(
      Seq(("z", "30")).toDF("key", "value"))
    assert(SequenceFileSource(out).readText(spark).collect()
      .map(r => r.getString(0)).toSeq == Seq("z"))
    SequenceFileSource(out).writeText(
      Seq(("q", "40")).toDF("key", "value"),
      org.apache.spark.sql.SaveMode.Ignore)
    assert(SequenceFileSource(out).readText(spark).collect()
      .map(r => r.getString(0)).toSeq == Seq("z"))
  }

  test("SequenceFileSource write guards: <2 columns rejected with a " +
      "clear message, nulls coalesce, writeBytes type-checked") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-seqguard").toString
    val narrow = intercept[IllegalArgumentException] {
      SequenceFileSource(s"$dir/one").writeText(Seq("a").toDF("only"))
    }
    assert(narrow.getMessage.contains("(key, value)") &&
      narrow.getMessage.contains("1 column"))
    // null key/value cells become empty strings, not NPEs
    val out = s"$dir/nulls"
    SequenceFileSource(out).writeText(
      Seq((null: String, "v1"), ("k2", null: String))
        .toDF("key", "value"))
    assert(SequenceFileSource(out).readText(spark).collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq ==
      Seq(("", "v1"), ("k2", "")))
    val typed = intercept[IllegalArgumentException] {
      SequenceFileSource(s"$dir/typed").writeBytes(
        Seq(("s", Array[Byte](1))).toDF("key", "value"))
    }
    assert(typed.getMessage.contains("expected binary"))
    // null binary cells become empty byte arrays
    val binOut = s"$dir/binnulls"
    SequenceFileSource(binOut).writeBytes(
      Seq((Array[Byte](7), null: Array[Byte])).toDF("key", "value"))
    assert(SequenceFileSource(binOut).readBytes(spark).collect()
      .map(r => (r.getAs[Array[Byte]](0).toSeq,
        r.getAs[Array[Byte]](1).toSeq)).toSeq ==
      Seq((Seq[Byte](7), Seq.empty[Byte])))
  }

  test("DistributedCacheFile ships a lookup file to tasks under a " +
      "stable collision-proof name (reference filecache contract)") {
    import spark.implicits._
    implicit val s: org.apache.spark.sql.SparkSession = spark
    def mk(dir: java.nio.file.Path, content: String): String = {
      val f = dir.resolve("lookup.txt")
      java.nio.file.Files.writeString(f, content)
      f.toString
    }
    val p1 = mk(java.nio.file.Files.createTempDirectory("graft-dcf1"), "alpha")
    val p2 = mk(java.nio.file.Files.createTempDirectory("graft-dcf2"), "beta")
    val c1 = graft.sources.DistributedCacheFile(p1)
    val c2 = graft.sources.DistributedCacheFile(p2)
    // same basename, different sources -> different shipped names
    assert(c1.name != c2.name)
    assert(c1.name.startsWith("lookup.txt-") && c1.name.length > 12)
    // the handle is Serializable and resolves INSIDE task closures
    val got = spark.range(3).as[Long].map { i =>
      val src = scala.io.Source.fromFile(c1.file)
      try s"$i:${src.mkString}" finally src.close()
    }.collect().sorted.toSeq
    assert(got == Seq("0:alpha", "1:alpha", "2:alpha"))
    // both files coexist; driver-side resolution reads the right one
    assert(scala.io.Source.fromFile(c2.file).mkString == "beta")
    // re-adding the same source is idempotent (same name, no clash)
    assert(graft.sources.DistributedCacheFile(p1) == c1)
    // a missing source fails loudly at registration, not in a task
    intercept[IllegalArgumentException] {
      graft.sources.DistributedCacheFile("/no/such/file.txt")
    }
  }

  test("Orc round trip preserves schema and pushes filters to the scan") {
    import spark.implicits._
    val dir = tmp() + "/o"
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
      .toDF("id", "name", "score")
    OrcSource(dir).write(df)
    val back = OrcSource(dir).read(spark)
    // files read back nullable; names and types must survive
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.collect().map(r => (r.getLong(0), r.getString(1),
      r.getDouble(2))).toSet ==
      Set((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)))
    // predicate pushdown reaches the ORC scan like parquet
    val plan = back.filter(col("id") > 1L).queryExecution.executedPlan
      .toString
    assert(plan.contains("PushedFilters") && plan.contains("id"),
      plan.take(500))
  }

  test("JsonLine round trip") {
    import spark.implicits._
    val dir = tmp() + "/j"
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "name")
    JsonLine(dir).write(df)
    assert(JsonLine(dir).read(spark).count() == 2)
  }

  test("TextLine reads lines, optional offsets") {
    import spark.implicits._
    val dir = tmp() + "/txt"
    Seq("hello world", "goodbye world").toDF("value").write.text(dir)
    val lines = TextLine(dir).read(spark).as[String].collect().toSet
    assert(lines == Set("hello world", "goodbye world"))
    assert(TextLine(dir, withOffset = true).read(spark).columns.toSet ==
      Set("line", "offset"))
  }

  test("IterableSource and NullSink") {
    import spark.implicits._
    val ds = IterableSource(spark, Seq(1, 2, 3))
    assert(ds.count() == 3)
    NullSink.write(ds.toDF()) // must not throw
  }

  test("versioned KV store: write/read/incremental merge/prune") {
    import spark.implicits._
    val store = VersionedKeyValStore(tmp() + "/kv", versionsToKeep = 2)
    val v0 = store.write(Seq(("a", 1L), ("b", 2L)).toDF("key", "value"))
    assert(v0 == 0L)
    // incremental: monoid-sum overlapping keys (reference
    // writeIncremental, VersionedKeyValSource.scala:163-210)
    val v1 = store.writeIncremental(Seq(("a", 10L), ("c", 3L)).toDF("key", "value"))
    assert(v1 == 1L)
    val latest = store.read(spark).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(latest == Map("a" -> 11L, "b" -> 2L, "c" -> 3L))
    // third version prunes v0 (keep 2)
    store.writeIncremental(Seq(("a", 100L)).toDF("key", "value"))
    assert(store.versions(spark) == Seq(1L, 2L))
  }

  test("versioned store maintains per-key HLL distinct sketches across versions") {
    import spark.implicits._
    import graft.agg.Hll
    val store = VersionedKeyValStore(tmp() + "/hll")
    def sketchOf(values: Seq[String]): Array[Byte] =
      Hll.toBytes(values.foldLeft(Hll.empty(Hll.pForError(0.01)))(
        (h, v) => h.add(Hll.hash(v))))
    // day 1: domain a sees u1..u100, domain b sees u1..u50
    store.write(Seq(
      ("a", sketchOf((1 to 100).map(i => s"u$i"))),
      ("b", sketchOf((1 to 50).map(i => s"u$i")))).toDF("key", "value"))
    // day 2: overlapping + new visitors
    store.writeIncremental(
      Seq(("a", sketchOf((51 to 150).map(i => s"u$i"))),
          ("c", sketchOf((1 to 10).map(i => s"u$i")))).toDF("key", "value"),
      Some(Hll.mergeBytesUdaf(0.01)(col("value")).as("value")))
    val est = store.read(spark).collect()
      .map(r => r.getString(0) ->
        Hll.fromBytes(r.getAs[Array[Byte]](1)).estimate).toMap
    // union semantics with ~1% rsd: a = |u1..u150| = 150, not 200
    assert(math.abs(est("a") - 150L) <= 8, s"a: ${est("a")}")
    assert(math.abs(est("b") - 50L) <= 4, s"b: ${est("b")}")
    assert(math.abs(est("c") - 10L) <= 2, s"c: ${est("c")}")
  }

  test("versioned store folds CMS, theta and quantile sketches across versions") {
    import spark.implicits._
    import graft.agg.{Cms, Qsketch, Theta}
    // one store per sketch kind; two days of per-domain deltas each —
    // the full incremental-summary family through one idiom
    val cmsStore = VersionedKeyValStore(tmp() + "/cms")
    val (d, w) = Cms.dims(0.01, 0.01)
    def cms(xs: Seq[String]) = Cms.toBytes(xs.foldLeft(Cms.empty(d, w))(_.add(_)))
    cmsStore.write(Seq(("a", cms(Seq("x", "x", "y")))).toDF("key", "value"))
    cmsStore.writeIncremental(
      Seq(("a", cms(Seq("x", "z")))).toDF("key", "value"),
      Some(Cms.mergeBytesUdaf(0.01, 0.01)(col("value")).as("value")))
    val mergedCms = Cms.fromBytes(cmsStore.read(spark)
      .collect().head.getAs[Array[Byte]](1))
    assert(mergedCms.total == 5L && mergedCms.estimate("x") >= 3L)

    val thetaStore = VersionedKeyValStore(tmp() + "/theta")
    def th(xs: Seq[String]) =
      Theta.toBytes(xs.foldLeft(Theta.empty(64))((t, s) => t.add(Theta.hash(s))))
    thetaStore.write(Seq(("a", th(Seq("u1", "u2", "u3")))).toDF("key", "value"))
    thetaStore.writeIncremental(
      Seq(("a", th(Seq("u3", "u4")))).toDF("key", "value"),
      Some(Theta.mergeBytesUdaf(64)(col("value")).as("value")))
    val mergedTheta = Theta.fromBytes(thetaStore.read(spark)
      .collect().head.getAs[Array[Byte]](1))
    assert(mergedTheta.estimate == 4L) // u1..u4, exact mode

    val qStore = VersionedKeyValStore(tmp() + "/qsk")
    def qs(xs: Seq[Double]) =
      Qsketch.toBytes(xs.foldLeft(Qsketch.empty(64))(_.add(_)))
    qStore.write(Seq(("a", qs((1 to 500).map(_.toDouble)))).toDF("key", "value"))
    qStore.writeIncremental(
      Seq(("a", qs((501 to 1000).map(_.toDouble)))).toDF("key", "value"),
      Some(Qsketch.mergeBytesUdaf(64)(col("value")).as("value")))
    val mergedQ = Qsketch.fromBytes(qStore.read(spark)
      .collect().head.getAs[Array[Byte]](1))
    assert(mergedQ.n == 1000L)
    assert(math.abs(mergedQ.quantile(0.5) - 500.0) < 50.0)
  }

  test("codec source round trip and tolerated decode errors") {
    import spark.implicits._
    val dir = tmp() + "/codec"
    val ds = spark.createDataset(Seq("alpha", "beta", "x"))
    CodecSource.write[String](ds, dir, _.getBytes("UTF-8"))
    val back = CodecSource.read[String](spark, dir,
      bytes => new String(bytes, "UTF-8"))
    assert(back.collect().toSet == Set("alpha", "beta", "x"))
    // decoder that rejects short records: 1 error tolerated
    val (tolerant, check) = CodecSource.readTolerant[String](spark, dir, { b =>
      val s = new String(b, "UTF-8")
      require(s.length > 1, "too short")
      s
    })
    assert(tolerant.collect().toSet == Set("alpha", "beta"))
    check.assertUnder(1)
    intercept[IllegalArgumentException] { check.assertUnder(0) }
  }

  test("protobuf wire-format injection round-trips through the codec source") {
    import spark.implicits._
    import graft.sources.ProtoWire, ProtoWire.UserEvent
    val dir = tmp() + "/proto_codec"
    val events = Seq(
      UserEvent(1L, "ada", 0.75, Seq("a", "b")),
      UserEvent(-3L, "böb", -2.5, Nil), // negative varint + non-ASCII UTF-8
      UserEvent(0L, "", 0.0, Seq("only-tags"))) // default-valued fields omitted
    // the LzoProtobuf plug-in shape: Message#toByteArray / #parseFrom
    // handed to the codec source verbatim
    CodecSource.write[UserEvent](spark.createDataset(events), dir, ProtoWire.encode)
    val back = CodecSource.read[UserEvent](spark, dir, ProtoWire.decode)
    assert(back.collect().toSet == events.toSet)
    // forward compatibility: a WRITER with an extra field (5: fixed64)
    // must still decode under this (older) schema — unknown fields skip
    // by wire type, exactly protobuf's contract
    val withExtra = events.map { e =>
      val base = ProtoWire.encode(e)
      val out = new java.io.ByteArrayOutputStream()
      out.write(base, 0, base.length)
      out.write((5 << 3) | 1) // tag: field 5, fixed64
      (0 until 8).foreach(_ => out.write(0x11))
      out.toByteArray
    }
    assert(withExtra.map(ProtoWire.decode).toSet == events.toSet)
    // corrupt record: tolerated-threshold path counts it, others decode
    val corruptDir = tmp() + "/proto_corrupt"
    val raw = events.map(ProtoWire.encode) :+ Array[Byte](0x0A, 0x7F) // truncated
    spark.createDataset(raw)(org.apache.spark.sql.Encoders.BINARY)
      .toDF(CodecSource.bytesCol).write.mode("overwrite").parquet(corruptDir)
    val (tolerant, check) =
      CodecSource.readTolerant[UserEvent](spark, corruptDir, ProtoWire.decode)
    assert(tolerant.collect().toSet == events.toSet)
    check.assertUnder(1)
  }

  test("thrift compact-protocol injection round-trips through the codec source") {
    import spark.implicits._
    import graft.sources.ThriftCompactWire, ThriftCompactWire.TrackRecord
    val dir = tmp() + "/thrift_codec"
    val records = Seq(
      TrackRecord(42L, "ada", 0.125, Seq("x", "y")),
      TrackRecord(-7L, "böb", -3.5, Nil), // zigzag negative + UTF-8
      TrackRecord(Long.MaxValue, "", 0.0, (1 to 20).map(i => s"t$i"))) // long-form list
    CodecSource.write[TrackRecord](spark.createDataset(records), dir,
      ThriftCompactWire.encode)
    val back = CodecSource.read[TrackRecord](spark, dir, ThriftCompactWire.decode)
    assert(back.collect().toSet == records.toSet)
    // forward compatibility: splice an unknown field 5 (i32, short-form
    // header, delta 1 after field 4) before STOP — the old reader
    // must skip it by type id
    val withExtra = records.map { r =>
      val base = ThriftCompactWire.encode(r)
      val out = new java.io.ByteArrayOutputStream()
      out.write(base, 0, base.length - 1) // drop STOP
      out.write((1 << 4) | 5)             // field delta 1, type I32
      out.write(0x07)                      // zigzag varint
      out.write(0)                         // STOP
      out.toByteArray
    }
    assert(withExtra.map(ThriftCompactWire.decode).toSet == records.toSet)
  }

  test("checkpoint computes once, then reads back") {
    import spark.implicits._
    val dir = tmp() + "/ck"
    var computes = 0
    def expensive = { computes += 1; Seq(1, 2, 3).toDF("x") }
    val first = Checkpoint(spark, dir)(expensive)
    assert(first.count() == 3 && computes == 1)
    val second = Checkpoint(spark, dir)(expensive)
    assert(second.count() == 3 && computes == 1) // not recomputed
  }

  test("partitioned sink writes hive-style partitions") {
    import spark.implicits._
    val dir = tmp() + "/p"
    val df = Seq((1, "x", "2020"), (2, "y", "2021")).toDF("id", "v", "year")
    PartitionedSink.write(df, dir, Seq("year"))
    assert(new java.io.File(dir, "year=2020").exists())
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("compaction rewrites many small files into few target-sized ones, per partition") {
    import spark.implicits._
    import graft.sources.Compaction
    val in = tmp()
    // 64 tiny files per partition (a month of hourly micro-batches)
    (1 to 2000).map(i => (i.toLong, "p" + (i % 2), "x" * 50))
      .toDF("id", "part", "payload")
      .repartition(64).write.mode("overwrite").partitionBy("part").parquet(in)
    def files(d: String) = new java.io.File(d).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(files(s"$in/part=p0") > 30, "setup should create many small files")
    val out = tmp()
    val counts = Compaction.compactPartitioned(spark, in, out,
      targetBytes = 512L * 1024)
    assert(counts.keySet == Set("part=p0", "part=p1"))
    assert(counts.values.forall(_ == 1), s"should bin-pack to one file: $counts")
    assert(files(s"$out/part=p0") == 1, "on-disk file count must match plan")
    // contents survive byte-identical row-wise
    val a = spark.read.parquet(in).select("id", "payload")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = spark.read.option("basePath", out).parquet(out)
      .select("id", "payload")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)
  }

  test("time-pathed source resolves only existing paths and reads them") {
    import spark.implicits._
    import graft.dates._
    implicit val utc: java.time.ZoneId = java.time.ZoneId.of("UTC")
    val root = tmp()
    // write two daily partitions, leave a gap
    Seq(1).toDF("x").write.parquet(s"$root/2020/01/01")
    Seq(2).toDF("x").write.parquet(s"$root/2020/01/03")
    val src = TimePathedSource(s"$root/%1$$tY/%1$$tm/%1$$td",
      DateRange.parse("2020-01-01", "2020-01-03"), Days(1))
    assert(src.resolvedPaths(spark).size == 2)
    assert(src.read(spark).count() == 2)
    assert(MostRecentGood(spark, Seq(s"$root/2020/01/01", s"$root/2020/01/02",
      s"$root/2020/01/03")).contains(s"$root/2020/01/03"))
  }
}
