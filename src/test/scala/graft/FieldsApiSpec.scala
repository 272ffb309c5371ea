package graft

import org.apache.spark.sql.functions._
import graft.dsl.FieldsApi._
import graft.join.Joins

/** Fields DSL + join-strategy semantics over in-memory frames
  * (reference CoreTest.scala operator jobs).
  */
class FieldsApiSpec extends SparkSpec {

  private lazy val kv = {
    import spark.implicits._
    Seq(("a", 1, 10.0), ("a", 2, 20.0), ("b", 3, 30.0)).toDF("k", "n", "x")
  }

  test("project/discard/rename/insert") {
    assert(kv.project("k", "n").columns.toSeq == Seq("k", "n"))
    assert(kv.discard("x").columns.toSeq == Seq("k", "n"))
    assert(kv.rename("n" -> "m").columns.contains("m"))
    assert(kv.insert("one", lit(1)).select("one").head().getInt(0) == 1)
  }

  test("mapStreamByKey streams sorted group runs through a " +
      "Buffer-style closure (keep/drop/expand)") {
    import org.apache.spark.sql.types.{IntegerType, StringType, StructField}
    import spark.implicits._
    val df = Seq(("a", 3, "x3"), ("a", 1, "x1"), ("a", 2, "x2"),
      ("b", 9, "y9"), ("b", 8, "y8")).toDF("k", "ord", "v")
    // the Cascading Buffer contract: lazily scan the sorted run,
    // drop the first row, keep the rest with positions, then expand
    // with a trailing count row — all in one pass of group state
    val out = df.mapStreamByKey(Seq("k"), Seq("ord"))(Seq("v"),
      Seq(StructField("pos", IntegerType), StructField("v", StringType))) {
      rows =>
        var n = 0
        val kept = rows.flatMap { r =>
          n += 1
          if (n == 1) None else Some(Seq(n, r.head))
        }.toList
        kept :+ Seq(0, s"count=$n")
    }
    assert(out.columns.toSeq == Seq("k", "pos", "v"))
    val got = out.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).sorted.toSeq
    assert(got == Seq(("a", 0, "count=3"), ("a", 2, "x2"), ("a", 3, "x3"),
      ("b", 0, "count=2"), ("b", 2, "y9")).sorted)
  }

  test("trapThrows routes closure-throwing rows to the trap " +
      "(reference CoreTest ItsATrapTest scenario)") {
    import org.apache.spark.sql.types.{IntegerType, StructField}
    import spark.implicits._
    // CoreTest.scala:1366-1399: map ('letter,'x) -> 'yPrime throws on
    // x == 1; output keeps the rest, trap carries the operation's
    // input fields (+ the error message — our addition).
    val input = Seq(("a", 1), ("b", 2), ("c", 3), ("d", 1), ("e", 2))
      .toDF("letter", "x")
    val (good, trapped) = input.trapThrows(Seq("letter", "x"),
      Seq(StructField("yPrime", IntegerType))) { xs =>
      val x = xs(1).asInstanceOf[Int]
      if (x == 1) throw new Exception("Erroneous Ones") else Seq(x)
    }
    assert(good.columns.toSeq == Seq("letter", "x", "yPrime"))
    assert(good.collect().map(r =>
      (r.getString(0), r.getInt(1), r.getInt(2))).sorted.toSeq ==
      Seq(("b", 2, 2), ("c", 3, 3), ("e", 2, 2)))
    assert(trapped.columns.toSeq == Seq("letter", "x", "error"))
    val t = trapped.collect().sortBy(_.getString(0))
    assert(t.map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("a", 1), ("d", 1)))
    assert(t.forall(_.getString(2) == "Erroneous Ones"))
  }

  test("trapThrows runs the closure ONCE per row even when both " +
      "branches are consumed (single-pass persisted split)") {
    import org.apache.spark.sql.types.{IntegerType, StructField}
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("trap-evals")
    val input = Seq(1, 2, 3, 4, 5).toDF("x")
    val (good, trapped) = input.trapThrows(Seq("x"),
      Seq(StructField("y", IntegerType))) { xs =>
      acc.add(1)
      val x = xs.head.asInstanceOf[Int]
      if (x % 2 == 0) throw new Exception("even") else Seq(x * 10)
    }
    assert(good.count() == 3L && trapped.count() == 2L)
    assert(acc.value == 5L,
      s"closure ran ${acc.value} times for 5 rows — the split must " +
        "evaluate once and both branches read the persisted tag")
    graft.core.PipelineCaches.unpersistAll()
  }

  test("trapThrows falls back to the exception class when the " +
      "message is null (a null tag would mis-route the row)") {
    import org.apache.spark.sql.types.{IntegerType, StructField}
    import spark.implicits._
    val (good, trapped) = Seq(1, 2).toDF("x").trapThrows(Seq("x"),
      Seq(StructField("y", IntegerType))) { xs =>
      val x = xs.head.asInstanceOf[Int]
      if (x == 2) throw new RuntimeException() else Seq(x)
    }
    assert(good.count() == 1L)
    val t = trapped.collect()
    assert(t.length == 1 && t.head.getString(1) ==
      "java.lang.RuntimeException")
    graft.core.PipelineCaches.unpersistAll()
  }

  test("mapStreamByKey groups binary keys by VALUE, not array " +
      "reference") {
    import org.apache.spark.sql.types.{IntegerType, StructField}
    import spark.implicits._
    val df = Seq((Array[Byte](1, 2), 10), (Array[Byte](1, 2), 20),
      (Array[Byte](3), 30)).toDF("bk", "v")
    val out = df.mapStreamByKey(Seq("bk"), Seq("v"))(Seq("v"),
      Seq(StructField("n", IntegerType),
        StructField("sum", IntegerType))) { rows =>
      val xs = rows.map(_.head.asInstanceOf[Int]).toList
      Seq(Seq(xs.length, xs.sum))
    }.collect().map(r =>
      (r.getAs[Array[Byte]](0).toSeq, r.getInt(1), r.getInt(2))).sortBy(_._2)
    // the two Array(1,2) rows must form ONE group of size 2
    assert(out.toSeq == Seq((Seq[Byte](3), 1, 30), (Seq[Byte](1, 2), 2, 30)))
  }

  test("mapStreamByKey validates sortBy columns and rejects out " +
      "fields that shadow keys") {
    import org.apache.spark.sql.types.{IntegerType, StructField}
    import spark.implicits._
    val df = Seq(("a", 1)).toDF("k", "v")
    val typo = intercept[IllegalArgumentException] {
      df.mapStreamByKey(Seq("k"), Seq("nope"))(Seq("v"),
        Seq(StructField("n", IntegerType)))(_.map(identity))
    }
    assert(typo.getMessage.contains("nope"))
    val shadow = intercept[IllegalArgumentException] {
      df.mapStreamByKey(Seq("k"))(Seq("v"),
        Seq(StructField("k", IntegerType)))(_.map(identity))
    }
    assert(shadow.getMessage.contains("shadow"))
  }

  test("groupByFields builder chains aggregates into one agg") {
    val out = kv.groupByFields("k") {
      _.size("cnt").sum("x", "sum_x").max("n", "max_n")
        .countIf(col("n") > 1, "n_big").mkString("n", ",", "ns")
    }.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(2), r.getInt(3), r.getLong(4), r.getString(5)))
      .toMap
    assert(out("a") == ((2L, 30.0, 2, 1L, "1,2")))
    assert(out("b") == ((1L, 30.0, 3, 1L, "3")))
  }

  test("groupAllFields aggregates globally without a key") {
    val r = kv.groupAllFields(_.size("cnt").average("x", "avg_x")).head()
    assert(r.getLong(0) == 3L && r.getDouble(1) == 20.0)
  }

  test("normalize divides by the global sum") {
    val shares = kv.normalize("x").select("k", "x").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(math.abs(shares("b") - 0.5) < 1e-12)
  }

  test("unpivot produces long form") {
    val long = kv.unpivotTo(Seq("k"), Seq("n", "x"))
    assert(long.columns.toSeq == Seq("k", "feature", "value"))
    assert(long.count() == 6)
  }

  test("group sortedTake and histogramBy") {
    import spark.implicits._
    val df = (1 to 20).map(i => (i % 2, i.toDouble)).toDF("k", "v")
    val tops = df.groupByFields("k")(_.sortedTake("v", 3, "smallest"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(tops(0) == Seq(2.0, 4.0, 6.0))
    assert(tops(1) == Seq(1.0, 3.0, 5.0))
    val hist = df.histogramBy("v", 10.0, "k")
      .collect().map(r => (r.getInt(0), r.getDouble(1)) -> r.getLong(2)).toMap
    assert(hist((0, 0.0)) == 4L) // evens 2..8
    assert(hist((0, 10.0)) == 5L) // evens 10..18
    assert(hist((0, 20.0)) == 1L) // 20
  }

  test("pivotStrict fills defaults and rejects duplicate cells") {
    import spark.implicits._
    val long = Seq((1, "w", 10.0), (1, "x", 11.0), (2, "w", 20.0))
      .toDF("key", "feature", "value")
    val wide = long.pivotStrict("key", "feature", "value",
      Seq("w", "x"), lit(0.0)).orderBy("key")
    assert(wide.collect().map(r =>
      (r.getInt(0), r.getDouble(1), r.getDouble(2))).toSeq ==
      Seq((1, 10.0, 11.0), (2, 20.0, 0.0))) // default fills the hole
    val dup = long.unionAll(Seq((1, "w", 99.0)).toDF("key", "feature", "value"))
    intercept[Exception] { // SparkRuntimeException from raise_error
      dup.pivotStrict("key", "feature", "value", Seq("w", "x"), lit(0.0))
        .collect()
    }
  }

  test("trap splits valid and invalid rows without failing the flow") {
    import spark.implicits._
    val df = Seq(("1", 1), ("boom", 2), ("3", 3)).toDF("s", "n")
    val (good, bad) = df.trap(col("s").cast("int").isNotNull)
    assert(good.count() == 2)
    assert(bad.select("s").as[String].collect().toSeq == Seq("boom"))
  }

  test("shard/shuffleRows/limit/sample keep row multiset") {
    import spark.implicits._
    val df = (1 to 100).toDF("x")
    assert(df.shard(4).rdd.getNumPartitions == 4)
    assert(df.shuffleRows(7L).as[Int].collect().sorted.toSeq == (1 to 100))
    assert(df.limitTo(10).count() == 10)
    val s = df.sampleRows(0.5, 42L).count()
    assert(s > 20 && s < 80)
  }

  test("block join equals plain join (reference differential contract)") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val l = (1 to 1000).map(_ => (rnd.nextInt(100), rnd.nextInt(10))).toDF("k", "a")
    val r = (1 to 300).map(_ => (rnd.nextInt(100), rnd.nextInt(10))).toDF("k", "b")
    val plain = l.join(r, "k").groupBy("k").count()
      .collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
    val block = Joins.blockJoin(l, r, Seq("k"), rightReplication = 5)
      .groupBy("k").count().collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(block == plain)
    val skew = Joins.skewJoin(l, r, Seq("k"))
      .groupBy("k").count().collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(skew == plain)
  }

  test("joinWithTiny broadcasts and rejects unsupported modes") {
    import spark.implicits._
    val l = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val r = Seq((1, 1.0)).toDF("k", "w")
    assert(Joins.joinWithTiny(l, r, Seq("k")).count() == 1)
    assert(Joins.joinWithTiny(l, r, Seq("k"), "left").count() == 2)
    intercept[IllegalArgumentException] {
      Joins.joinWithTiny(l, r, Seq("k"), "full_outer")
    }
  }

  test("asofJoin attaches the latest right row at-or-before each left row") {
    import spark.implicits._
    val quotes = Seq((1, 10L, 100.0), (1, 20L, 110.0), (2, 5L, 50.0))
      .toDF("k", "qts", "px")
    val trades = Seq((1, 15L, "t1"), (1, 20L, "t2"), (1, 5L, "t0"), (2, 9L, "t3"))
      .toDF("k", "tts", "tid")
    val inner = graft.join.Joins.asofJoin(trades, quotes, Seq("k"),
      "tts", "qts", Seq("px"))
      .select("tid", "px").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // t0 (ts 5) has no quote at-or-before → dropped by inner
    assert(inner == Map("t1" -> 100.0, "t2" -> 110.0, "t3" -> 50.0))
    val left = graft.join.Joins.asofJoin(trades, quotes, Seq("k"),
      "tts", "qts", Seq("px"), how = "left")
    assert(left.count() == 4)
    assert(left.filter(col("tid") === "t0").head().isNullAt(
      left.columns.indexOf("px")))
  }

  test("asofJoin attaches one complete right row even when rightCols have nulls") {
    import spark.implicits._
    // latest quote has px=null: the left row must see (null, 2.0) from
    // THAT row, not mix the older row's px with the newer row's sz
    val quotes = Seq(
      (1, 10L, Option(100.0), Option(1.0)),
      (1, 20L, Option.empty[Double], Option(2.0))
    ).toDF("k", "qts", "px", "sz")
    val trades = Seq((1, 25L, "t1")).toDF("k", "tts", "tid")
    val row = graft.join.Joins.asofJoin(trades, quotes, Seq("k"),
      "tts", "qts", Seq("px", "sz")).head()
    assert(row.isNullAt(row.fieldIndex("px")),
      "px must come from the as-of row (null), not an older row")
    assert(row.getDouble(row.fieldIndex("sz")) == 2.0)
  }

  test("rangeJoin equals the naive inequality join") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val pts = (1 to 500).map(_ => rnd.nextDouble() * 100).toDF("v")
    // includes an empty (e) and an inverted (f) interval — both must
    // match nothing and must not explode spurious bucket rows
    val ivs = Seq((0.0, 10.0, "a"), (5.0, 40.0, "b"), (39.9, 100.0, "c"),
      (97.0, 98.0, "d"), (50.0, 50.0, "e"), (80.0, 20.0, "f"))
      .toDF("lo", "hi", "label")
    val naive = pts.join(ivs, col("v") >= col("lo") && col("v") < col("hi"))
      .groupBy("label").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bucketed = graft.join.Joins.rangeJoin(pts, ivs, "v", "lo", "hi", 7.0)
      .groupBy("label").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bucketed == naive)
  }

  test("intervalJoin equals the naive overlap join, duplicate-free") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // random [start, start+len) intervals spanning MANY buckets (len up
    // to 40 vs bucketWidth 7) so the dedup-free emission rule is
    // exercised; a few keys so both keyed and bucket matching matter
    def mk(n: Int, tag: String) = (1 to n).map { i =>
      val s = rnd.nextDouble() * 200
      (rnd.nextInt(3), s"$tag$i", s, s + rnd.nextDouble() * 40)
    }
    val l = mk(120, "l").toDF("k", "lid", "ls", "le")
    val r = mk(150, "r").toDF("k", "rid", "rs", "re")
    // add an empty and an inverted right interval: must match nothing
    val rAll = r.union(Seq((0, "rEmpty", 5.0, 5.0), (1, "rInv", 9.0, 2.0)).toDF("k", "rid", "rs", "re"))
    val naive = l.join(rAll, l("k") === rAll("k") &&
        col("ls") < col("re") && col("rs") < col("le"))
      .select("lid", "rid").as[(String, String)].collect().sorted.toSeq
    val bucketed = graft.join.Joins
      .intervalJoin(l, rAll, "ls", "le", "rs", "re", 7.0, Seq("k"))
      .select("lid", "rid").as[(String, String)].collect().sorted.toSeq
    assert(bucketed == naive) // equality (not set-equality): also proves no duplicate pairs
  }

  test("coGroup chains joins with per-pipe modes (star join)") {
    import spark.implicits._
    val a = Seq((1, "a1"), (2, "a2")).toDF("x", "a")
    val b = Seq((1, "b1")).toDF("x", "b")
    val c = Seq((1, "c1"), (3, "c3")).toDF("x", "c")
    val star = Joins.coGroup(Seq(a, b, c), "x", Seq("left", "full_outer"))
    assert(star.count() == 3) // keys 1, 2 (left-kept), 3 (outer-added)
  }
}
