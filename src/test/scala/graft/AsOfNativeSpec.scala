package graft

import org.apache.spark.sql.functions._
import graft.join.Joins

/** Native Catalyst as-of join (AsOfJoinPlan.scala): the custom
  * LogicalPlan + Strategy + SparkPlan path must agree with the
  * window-composition `asofJoin` on random data, handle nulls and
  * plan as a single merge (no union/window in the physical plan).
  */
class AsOfNativeSpec extends SparkSpec {

  private def randomSides(seed: Int, nLeft: Int, nRight: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val left = (1 to nLeft)
      .map(i => (rnd.nextInt(8), rnd.nextInt(100).toLong, s"l$i"))
      .toDF("k", "ts", "lv")
    val right = (1 to nRight)
      .map(i => (rnd.nextInt(8), rnd.nextInt(100).toLong, i.toDouble))
      .toDF("k", "ts", "rv")
    // dedupe right per (k, ts) so both implementations' tie-breaks
    // cannot differ (as-of at equal ts is otherwise nondeterministic)
    (left, right.groupBy("k", "ts").agg(max("rv").as("rv")))
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("k", "ts", "lv").collect().map(_.toSeq).toSeq

  test("native asof matches the window composition on random data (inner+left)") {
    for (seed <- 1 to 3; how <- Seq("inner", "left")) {
      val (l, r) = randomSides(seed, 300, 120)
      val windowed = Joins.asofJoin(l, r, Seq("k"), "ts", "ts", Seq("rv"), how)
        .select("k", "ts", "lv", "rv")
      val native = Joins.asofJoinNative(l, r, Seq("k"), "ts", "ts", Seq("rv"), how)
        .select("k", "ts", "lv", "rv")
      assert(sortedRows(native) == sortedRows(windowed),
        s"seed=$seed how=$how diverged")
    }
  }

  test("native asof plans as AsOfJoinExec with no window or union") {
    val (l, r) = randomSides(7, 50, 20)
    val plan = Joins.asofJoinNative(l, r, Seq("k"), "ts", "ts", Seq("rv"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"native node missing:\n$plan")
    assert(!plan.toLowerCase.contains("window"), s"unexpected window:\n$plan")
  }

  test("native asof: equal timestamps match (>= semantics)") {
    import spark.implicits._
    val l = Seq((1, 10L, "a")).toDF("k", "ts", "lv")
    val r = Seq((1, 10L, 5.0)).toDF("k", "ts", "rv")
    val out = Joins.asofJoinNative(l, r, Seq("k"), "ts", "ts", Seq("rv")).collect()
    assert(out.length == 1 && out(0).getDouble(out(0).fieldIndex("rv")) == 5.0)
  }

  test("native asof: null keys never match; left keeps them with null values") {
    import spark.implicits._
    val l = Seq((Option(1), 10L, "a"), (Option.empty[Int], 10L, "b"))
      .toDF("k", "ts", "lv")
    val r = Seq((Option(1), 5L, 7.0), (Option.empty[Int], 1L, 9.0))
      .toDF("k", "ts", "rv")
    val inner = Joins.asofJoinNative(l, r, Seq("k"), "ts", "ts", Seq("rv"), "inner")
      .collect()
    assert(inner.length == 1 && inner(0).getString(2) == "a")
    val left = Joins.asofJoinNative(l, r, Seq("k"), "ts", "ts", Seq("rv"), "left")
      .orderBy("lv").collect()
    assert(left.length == 2)
    assert(left(1).getString(2) == "b" && left(1).isNullAt(left(1).fieldIndex("rv")))
  }

  test("native asof: attaches one complete right row when rightCols have nulls") {
    import spark.implicits._
    val quotes = Seq(
      (1, 10L, Option(100.0), Option(1.0)),
      (1, 20L, Option.empty[Double], Option(2.0))
    ).toDF("k", "qts", "px", "sz")
    val trades = Seq((1, 25L, "t1")).toDF("k", "tts", "tid")
    val row = Joins.asofJoinNative(trades, quotes, Seq("k"),
      "tts", "qts", Seq("px", "sz")).head()
    assert(row.isNullAt(row.fieldIndex("px")),
      "px must come from the as-of row (null), not an older right row")
    assert(row.getDouble(row.fieldIndex("sz")) == 2.0)
  }

  test("native asof: empty right side") {
    import spark.implicits._
    val l = Seq((1, 10L, "a")).toDF("k", "ts", "lv")
    val r = Seq.empty[(Int, Long, Double)].toDF("k", "ts", "rv")
    assert(Joins.asofJoinNative(l, r, Seq("k"), "ts", "ts", Seq("rv"), "inner")
      .count() == 0)
    val left = Joins.asofJoinNative(l, r, Seq("k"), "ts", "ts", Seq("rv"), "left")
      .collect()
    assert(left.length == 1 && left(0).isNullAt(left(0).fieldIndex("rv")))
  }

  test("native asof: multi-column keys and a self as-of join") {
    import spark.implicits._
    val df = Seq((1, "x", 10L, 1.0), (1, "x", 20L, 2.0), (1, "y", 15L, 3.0))
      .toDF("k1", "k2", "ts", "v")
    val out = Joins.asofJoinNative(
      df.select(col("k1"), col("k2"), col("ts"), col("v").as("lv")),
      df.select(col("k1"), col("k2"), col("ts"), col("v").as("rv")),
      Seq("k1", "k2"), "ts", "ts", Seq("rv"))
      .orderBy("k2", "ts").collect()
    assert(out.map(_.getDouble(out.head.fieldIndex("rv"))).toSeq ==
      Seq(1.0, 2.0, 3.0))
  }

  test("native asof output keeps left hash partitioning (no re-shuffle downstream)") {
    val (l, r) = randomSides(9, 200, 80)
    def nExchanges(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Exchange hashpartitioning"))
    val joined = Joins.asofJoinNative(l, r, Seq("k"), "ts", "ts", Seq("rv"))
    val joinedAgg = joined.groupBy("k").agg(sum("rv").as("s"))
    // the groupBy on the join keys must reuse the join's partitioning —
    // same exchange count with and without the aggregation
    assert(nExchanges(joinedAgg) == nExchanges(joined),
      s"downstream agg re-shuffled:\n${joinedAgg.queryExecution.executedPlan}")
  }

  test("asof directions: forward looks ahead, nearest picks closer, ties backward") {
    import spark.implicits._
    import graft.join.Joins
    val l = Seq((1L, 10L, "a"), (1L, 25L, "b"), (1L, 100L, "c"), (2L, 5L, "d"))
      .toDF("k", "ts", "tag")
    val r = Seq((1L, 8L, 1.0), (1L, 20L, 2.0), (1L, 30L, 3.0), (2L, 50L, 9.0))
      .toDF("k", "ts", "rv")
    def run(dir: String) =
      Joins.asofJoin(l, r, Seq("k"), "ts", "ts", Seq("rv"), "left", dir)
        .collect().map(row => row.getAs[String]("tag") ->
          Option(row.get(row.fieldIndex("rv"))).map(_.asInstanceOf[Double]))
        .toMap
    val back = run("backward")
    assert(back == Map("a" -> Some(1.0), "b" -> Some(2.0),
      "c" -> Some(3.0), "d" -> None))
    val fwd = run("forward")
    // a(10) -> next right 20; b(25) -> 30; c(100) -> none; d(5) -> 50
    assert(fwd == Map("a" -> Some(2.0), "b" -> Some(3.0),
      "c" -> None, "d" -> Some(9.0)))
    val near = run("nearest")
    // a(10): back 8 (d2) vs fwd 20 (d10) -> 1.0; b(25): back 20 (d5) vs
    // fwd 30 (d5) TIE -> backward 2.0; c(100): only back 3.0; d(5): only fwd
    assert(near == Map("a" -> Some(1.0), "b" -> Some(2.0),
      "c" -> Some(3.0), "d" -> Some(9.0)))
    intercept[IllegalArgumentException](run("sideways"))
  }
}
