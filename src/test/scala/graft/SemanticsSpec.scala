package graft

import org.apache.spark.sql.functions._
import graft.join.Joins

/** Semantic-parity tests for the reference's subtle contracts:
  * cross-width integral join keys (IntegralComparator,
  * CoreTest.scala:25-52 NumberJoinerJob), lenient string→numeric
  * coercion (TupleGetter.scala:108-154), null ordering, skew-join
  * differential sweep (SkewJoinTest.scala:26-130), encoder
  * round-trips (KryoTest analog).
  */
class SemanticsSpec extends SparkSpec {

  test("cross-width integral keys join (Int vs Long — NumberJoinerJob)") {
    import spark.implicits._
    val ints = Seq((0, 1), (1, 2), (2, 4)).toDF("x0", "y0") // int keys
    val longs = Seq((0L, 1L), (1L, 3L), (2L, 9L)).toDF("x1", "y1") // long keys
    val joined = ints.join(longs, col("x0") === col("x1"))
    assert(joined.count() == 3) // implicit upcast matches IntegralComparator
  }

  test("lenient string→numeric coercion on delimited read (safe mode)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-coerce").toString + "/data"
    Seq("1\t10", "2\tnotanumber", "3\t30").toDF("value").write.text(dir)
    val df = graft.sources.Delimited(dir, "\t",
      schema = Some(org.apache.spark.sql.types.StructType.fromDDL(
        "k INT, v INT")))
      .read(spark)
    // PERMISSIVE: bad cell → null, row survives (TupleGetter leniency)
    val rows = df.collect().map(r =>
      (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getInt(1)))).toSet
    assert(rows == Set((1, Some(10)), (2, None), (3, Some(30))))
    // strict: FAILFAST throws
    intercept[org.apache.spark.SparkException] {
      graft.sources.Delimited(dir, "\t",
        schema = Some(org.apache.spark.sql.types.StructType.fromDDL(
          "k INT, v INT")), strict = true).read(spark).collect()
    }
  }

  test("nulls sort lowest ascending (IntegralComparator null rule)") {
    import spark.implicits._
    val df = Seq(Some(3), None, Some(1)).toDF("x")
    val sorted = df.orderBy("x").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq
    assert(sorted == Seq(None, Some(1), Some(3)))
  }

  test("skew join differential sweep (replication x key-skew — SkewJoinTest)") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // heavy collisions: keys from a small domain, one very hot key
    val l = ((1 to 2000).map(_ => (if (rnd.nextInt(4) == 0) 7 else rnd.nextInt(50),
      rnd.nextInt(100)))).toDF("k", "a")
    val r = ((1 to 600).map(_ => (rnd.nextInt(50), rnd.nextInt(100)))).toDF("k", "b")
    val expected = l.join(r, "k").groupBy("k").count()
      .collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
    for (rep <- Seq(2, 5, 9)) {
      val got = Joins.blockJoin(l, r, Seq("k"), rightReplication = rep)
        .groupBy("k").count().collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
      assert(got == expected, s"blockJoin(rep=$rep) diverged")
    }
  }

  test("skewJoin on an AQE-off session routes to the salted fallback and stays correct") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val l = (1 to 1500).map(_ =>
      (if (rnd.nextInt(3) == 0) 7 else rnd.nextInt(40), rnd.nextInt(100)))
      .toDF("k", "a")
    val r = (1 to 400).map(_ => (rnd.nextInt(40), rnd.nextInt(100))).toDF("k", "b")
    val expected = l.join(r, "k").groupBy("k").count()
      .collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val got = Joins.skewJoin(l, r, Seq("k"))
        .groupBy("k").count().collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
      assert(got == expected, "AQE-off skewJoin fallback diverged")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("bloomJoin equals the plain join and plants a codegen bloom probe") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val l = (1 to 2000).map(_ => (rnd.nextInt(500), rnd.nextInt(100))).toDF("k", "a")
    val r = (1 to 80).map(_ => (rnd.nextInt(500), rnd.nextInt(100))).toDF("k", "b")
    val expected = l.join(r, "k").groupBy("k").count()
      .collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
    val bj = Joins.bloomJoin(l, r, Seq("k"), expectedItems = 1000L)
    val got = bj.groupBy("k").count()
      .collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(got == expected, "bloomJoin diverged from the plain join")
    val plan = bj.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom probe in plan:\n$plan")
    // semi form: pruned left rows only, no right columns
    val semi = Joins.bloomJoin(l, r, Seq("k"), how = "left_semi")
    val semiExpected = l.join(r, Seq("k"), "left_semi").count()
    assert(semi.count() == semiExpected, "left_semi bloomJoin diverged")
    intercept[IllegalArgumentException] {
      Joins.bloomJoin(l, r, Seq("k"), how = "left")
    }
  }

  test("encoder round-trips for the aggregation value types (KryoTest analog)") {
    import spark.implicits._
    // tuples, options, collections — the types the reference shipped
    // through Kryo (KryoHadoop.scala:79-121), here through Encoders
    val tuples = Seq((1, ("a", 2.5)), (2, ("b", -1.0)))
    assert(spark.createDataset(tuples).collect().toSeq == tuples)
    val maps = Seq(Map("a" -> 1L), Map.empty[String, Long])
    assert(spark.createDataset(maps).collect().toSeq == maps)
    val arrays = Seq(Array(1.5f, 2.5f), Array.empty[Float])
    val back = spark.createDataset(arrays).collect()
    assert(back.map(_.toSeq).toSeq == arrays.map(_.toSeq).toSeq)
    // kryo for opaque types (HLL sketch)
    implicit val hllEnc = org.apache.spark.sql.Encoders.kryo[graft.agg.Hll]
    val sketch = graft.agg.Hll.empty(6).add(graft.agg.Hll.hash("x"))
    val rt = spark.createDataset(Seq(sketch)).collect().head
    assert(rt.estimate == sketch.estimate)
  }

  test("duplicate join-key names resolve like the reference's collision rename") {
    import spark.implicits._
    // reference auto-renamed colliding names then dropped (inner only,
    // JoinAlgorithms.scala:92-113); Spark's Seq-key join merges them
    val l = Seq((1, "a")).toDF("k", "v1")
    val r = Seq((1, "b")).toDF("k", "v2")
    val j = l.join(r, Seq("k"), "inner")
    assert(j.columns.toSeq == Seq("k", "v1", "v2")) // single k, no dup
  }
}
