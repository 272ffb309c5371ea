package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PairFunctions
import graft.graph.Graphs

/** Round-11 optimization kernels: packed pair enumeration, the sorted
  * sparse-vector dot, and the packed/compact vs wide fallback paths of
  * the operators that switched to them. Each optimized path must equal
  * its pre-optimization (join/struct/long) form row-for-row.
  */
class PairKernelsSpec extends SparkSpec {

  test("packed_pairs: all ordered pairs, packed hi/lo; range checked") {
    import spark.implicits._
    val out = Seq(Seq(1L, 5L, 7L)).toDF("xs")
      .select(explode(PairFunctions.packed_pairs(col("xs"))).as("pk"))
      .select(shiftrightunsigned(col("pk"), 32).as("a"),
        col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("b"))
      .as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 5L), (1L, 7L), (5L, 7L)))
    // empty and singleton arrays emit no pairs
    assert(Seq(Seq.empty[Long], Seq(9L)).toDF("xs")
      .select(explode(PairFunctions.packed_pairs(col("xs"))))
      .count() == 0L)
    // ids beyond 31 bits fail loudly instead of corrupting keys
    val e = intercept[Exception] {
      Seq(Seq(1L, 1L << 31)).toDF("xs")
        .select(explode(PairFunctions.packed_pairs(col("xs")))).collect()
    }
    assert(e.getMessage != null)
  }

  test("sorted_dot: integer-exact merge dot of sorted (key, n) arrays") {
    import spark.implicits._
    val df = Seq((
      Seq(("apple", 2L), ("kiwi", 3L), ("pear", 5L)),
      Seq(("apple", 7L), ("lime", 1L), ("pear", 2L)))).toDF("a", "b")
    val got = df.select(PairFunctions.sorted_dot(col("a"), col("b")))
      .as[Long].head()
    assert(got == 2L * 7L + 5L * 2L)
    // disjoint keys -> 0; empty side -> 0
    assert(Seq((Seq(("x", 4L)), Seq(("y", 9L)))).toDF("a", "b")
      .select(PairFunctions.sorted_dot(col("a"), col("b")))
      .as[Long].head() == 0L)
    assert(Seq((Seq.empty[(String, Long)], Seq(("y", 9L)))).toDF("a", "b")
      .select(PairFunctions.sorted_dot(col("a"), col("b")))
      .as[Long].head() == 0L)
  }

  test("coOccurrenceEdges: packed and wide paths equal the join form") {
    import spark.implicits._
    // duplicate incidences and singleton groups included
    val inc = Seq((10L, 3L), (10L, 1L), (10L, 3L), (10L, 2L),
      (11L, 2L), (11L, 7L), (12L, 5L)).toDF("g", "i")
    val items = inc.select(col("g").as("o"), col("i").as("p")).distinct()
    val joinForm = items.alias("a").join(items.alias("b"), Seq("o"))
      .filter(col("a.p") < col("b.p"))
      .select(col("a.p").as("src"), col("b.p").as("dst"))
      .as[(Long, Long)].collect().sorted.toSeq
    val packed = Graphs.coOccurrenceEdges(inc, "g", "i")
      .as[(Long, Long)].collect().sorted.toSeq
    val wide = Graphs.coOccurrenceEdges(inc, "g", "i", packedIds = false)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(packed == joinForm)
    assert(wide == joinForm)
  }

  test("linkPrediction: packed and wide paths agree exactly") {
    import spark.implicits._
    // two overlapping 4-cliques plus a hub to exercise the cap
    val cliq = for {
      c <- Seq(Seq(1L, 2L, 3L, 4L), Seq(3L, 4L, 5L, 6L))
      i <- c; j <- c if i < j
    } yield (i, j)
    val hub = (1L to 8L).map(x => (100L, x))
    val edges = (cliq ++ hub).toDF("src", "dst")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("a", "b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e9),
        math.round(r.getDouble(4) * 1e9)))
      .toSeq
    val p = canon(Graphs.linkPrediction(edges, maxDegree = 7,
      minCommon = 2))
    val w = canon(Graphs.linkPrediction(edges, maxDegree = 7,
      minCommon = 2, packedIds = false))
    assert(p.nonEmpty)
    assert(p == w)
  }

  test("triangleCounts: compact int adjacency equals the long path") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val edges = (1 to 300).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)).toDF("src", "dst")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e9))).toSeq
    assert(canon(Graphs.triangleCounts(edges)) ==
      canon(Graphs.triangleCounts(edges, compactIds = false)))
  }

  test("frequentPairs: packed-array form equals the relational replay") {
    import spark.implicits._
    val inc = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L), (2L, 20L),
      (2L, 20L), (3L, 10L), (3L, 20L), (3L, 40L), (4L, 50L))
      .toDF("b", "i")
    val got = graft.ml.Associations
      .frequentPairs(inc, "b", "i", minSupport = 2L)
      .orderBy("item_a", "item_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    // (10,20) co-occurs in baskets 1,2,3 of 4 baskets
    assert(got.length == 1)
    assert(got.head == ((10L, 20L, 3L, 3L, 3L, 0.75)))
    graft.core.PipelineCaches.unpersistAll()
  }

  test("frequentPairs: maxBasketSize caps baskets before pairing") {
    import spark.implicits._
    val inc = (Seq.tabulate(5)(i => (1L, i.toLong + 1)) ++
      Seq((2L, 1L), (2L, 2L), (3L, 1L), (3L, 2L))).toDF("b", "i")
    val got = graft.ml.Associations
      .frequentPairs(inc, "b", "i", minSupport = 2L, maxBasketSize = 3)
      .collect()
    // the 5-item basket is dropped; (1,2) then co-occurs twice of 2
    // surviving baskets
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
      .toSeq == Seq((1L, 2L, 2L)))
    graft.core.PipelineCaches.unpersistAll()
  }
}
