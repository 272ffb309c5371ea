package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.graft.SessionizeNative

/** Native gap sessionization (SessionizePlan.scala): the custom
  * LogicalPlan + Strategy + SparkPlan path must agree with the
  * lag + running-sum window formulation on random data, match its
  * null semantics, and plan as a single pass (no Window operator,
  * one exchange).
  */
class SessionizeNativeSpec extends SparkSpec {

  private def windowForm(df: org.apache.spark.sql.DataFrame,
      gap: Long): org.apache.spark.sql.DataFrame = {
    val byKey = Window.partitionBy("k").orderBy(col("ts"))
    val cum = byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("prev", lag(col("ts"), 1).over(byKey))
      .withColumn("new_session",
        when(col("prev").isNull || col("ts") - col("prev") > gap, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("new_session").over(cum))
      .drop("prev", "new_session")
  }

  test("native sessionize matches the window formulation on random data") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      // distinct ts per key so row identity is unambiguous (equal ts
      // always land in the same session either way, but per-row
      // comparison needs a stable join key)
      val rows = (for (k <- 0 until 6) yield rnd.shuffle((0 until 200).toList)
        .take(40).map(t => (k, t.toLong * 7))).flatten
      val df = rows.toDF("k", "ts")
      val native = SessionizeNative.sessionize(df, Seq("k"), "ts", 50L)
        .select("k", "ts", "session_id")
      val windowed = windowForm(df, 50L).select("k", "ts", "session_id")
      assert(native.except(windowed).isEmpty && windowed.except(native).isEmpty,
        s"seed=$seed diverged")
    }
  }

  test("the shared SessionGap kernel replays the lag formulation on random null-bearing streams") {
    // the batch exec and the streaming stateful form both run
    // graft.core.SessionGap — pin the kernel itself against an
    // independent fold of the lag rule, including null patterns
    import graft.core.SessionGap
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val events: Seq[Option[Long]] =
        // nulls sort first (like the exec's null-first sort order)
        Seq.fill(rnd.nextInt(4))(None) ++
          Seq.iterate(0L, 60)(t => t + rnd.nextInt(80)).sorted.map(Some(_))
      // reference: the SQL lag rule, folded directly
      var prev: Option[Option[Long]] = None
      val expected = events.map { cur =>
        val opens = prev match {
          case None => true                       // first row
          case Some(None) => true                 // lag(ts) IS NULL
          case Some(Some(p)) =>
            cur.exists(c => c - p > 30L)          // ts - lag(ts) > gap
        }
        prev = Some(cur)
        opens
      }.scanLeft(0L) { case (sid, opens) => if (opens) sid + 1 else sid }.tail
      val got = events.scanLeft(SessionGap.empty) { (st, cur) =>
        SessionGap.advance(st, cur.getOrElse(0L), cur.isEmpty, 30L)
      }.tail.map(_.sessionId)
      assert(got == expected, s"seed=$seed: $got vs $expected on $events")
    }
  }

  test("gap boundary: exactly gap continues, gap+1 starts a new session") {
    import spark.implicits._
    val df = Seq((1, 0L), (1, 30L), (1, 61L), (1, 91L)).toDF("k", "ts")
    val out = SessionizeNative.sessionize(df, Seq("k"), "ts", 30L)
      .select("ts", "session_id").as[(Long, Long)].collect().sortBy(_._1)
    // 0 -> s1; 30 (gap = 30, not >) -> s1; 61 (gap 31 > 30) -> s2;
    // 91 (gap 30) -> s2
    assert(out.toSeq == Seq((0L, 1L), (30L, 1L), (61L, 2L), (91L, 2L)))
  }

  test("null timestamps replay the lag formulation: null prev opens, null curr continues") {
    import spark.implicits._
    val df = Seq((1, Some(100L)), (1, None), (1, Some(5000L)),
      (2, None), (2, None)).toDF("k", "ts")
    val out = SessionizeNative.sessionize(df, Seq("k"), "ts", 30L)
      .select("k", "ts", "session_id").as[(Int, Option[Long], Long)]
      .collect().sortBy(r => (r._1, r._2.getOrElse(Long.MinValue)))
    // k=1: null first (s1); 100 follows a null ts (lag IS NULL -> s2);
    // 5000 - 100 > gap -> s3. k=2: each null-ts row opens a session
    assert(out.toSeq == Seq((1, None, 1L), (1, Some(100L), 2L),
      (1, Some(5000L), 3L), (2, None, 1L), (2, None, 2L)))
    // matches the lag-window null arithmetic exactly
    val w = windowForm(df, 30L).select("k", "ts", "session_id")
      .as[(Int, Option[Long], Long)].collect()
      .sortBy(r => (r._1, r._2.getOrElse(Long.MinValue)))
    assert(out.toSeq == w.toSeq)
  }

  test("per-(key, session) aggregate rides the preserved partitioning — still one exchange") {
    val ev = spark.read.parquet(sf() + "/events.parquet")
    val labeled = SessionizeNative.sessionize(
      ev.select(col("user_id"), graft.core.Ts.seconds(ev).as("sec")),
      Seq("user_id"), "sec", 1800L)
    val stats = labeled.groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"), min("sec").as("start_sec"))
    val p = stats.queryExecution.executedPlan.toString
    // hashpartitioning(user_id) is a subset clustering of
    // (user_id, session_id), so the aggregate adds NO exchange
    val nEx = p.linesIterator.count(_.contains("Exchange"))
    assert(nEx == 1, s"expected 1 exchange, got $nEx:\n$p")
  }

  test("native batch labels agree with the streaming mapGroupsWithState form") {
    import spark.implicits._
    import graft.streaming.Streaming
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(11)
    val rows = (for (k <- 0 until 5) yield rnd.shuffle((0 until 300).toList)
      .take(60).map(t => (k.toLong, t.toLong * 97))).flatten
    // streaming: feed everything in one micro-batch per key ordering
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streaming.SessionEvent]
    val out = Streaming.sessionize(input.toDS(), gapSeconds = 500L)
    val query = out.writeStream.format("memory").queryName("xsessions")
      .outputMode("append").start()
    input.addData(rows.map { case (k, s) => Streaming.SessionEvent(k, s) })
    query.processAllAvailable()
    val streamed = spark.table("xsessions").as[Streaming.SessionAssignment]
      .collect().map(a => (a.key, a.sec) -> a.sessionId).toMap
    query.stop()
    // batch native on the same rows
    val native = SessionizeNative.sessionize(
        rows.toDF("k", "ts"), Seq("k"), "ts", 500L)
      .select("k", "ts", "session_id").as[(Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(native == streamed,
      s"diverged on ${native.keySet.filter(k => native(k) != streamed.getOrElse(k, -1L)).take(5)}")
  }

  test("plans as a single pass: SessionizeExec present, no Window, one exchange") {
    val ev = spark.read.parquet(sf() + "/events.parquet")
    val labeled = SessionizeNative.sessionize(
      ev.select(col("user_id"), graft.core.Ts.seconds(ev).as("sec")),
      Seq("user_id"), "sec", 1800L)
    val agg = labeled.groupBy("user_id")
      .agg(max("session_id").as("n_sessions"), count(lit(1)).as("n_events"))
    val p = agg.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in plan strings
    assert(p.contains("Sessionize "), s"native exec missing:\n$p")
    assert(!p.contains("Window"), s"window pass crept in:\n$p")
    // the downstream per-key aggregate rides the exec's preserved
    // partitioning: exactly one exchange in the whole plan
    val nEx = p.linesIterator.count(_.contains("Exchange"))
    assert(nEx == 1, s"expected 1 exchange, got $nEx:\n$p")
  }
}
