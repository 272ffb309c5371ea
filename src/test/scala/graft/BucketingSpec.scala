package graft

import org.apache.spark.sql.functions._
import graft.sources.Bucketing

/** Bucketed-table co-location: joins and aggregations on the bucket
  * keys must run with NO shuffle exchange (the write-time shuffle is
  * the only one that ever happens). Auto-broadcast is disabled inside
  * the join tests so the shuffle path is actually exercised — with
  * broadcast on, Catalyst would hide a missing bucket layout.
  */
class BucketingSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def noShuffle(plan: String): Boolean =
    !plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Exchange rangepartitioning")

  private def withoutAutoBroadcast[T](body: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try body finally spark.conf.set(key, prev)
  }

  override def afterAll(): Unit = {
    Seq("b_orders", "b_custs", "b_lead", "b_ref", "b_sess")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    super.afterAll()
  }

  test("bucketed-bucketed join on the bucket key plans without shuffle") {
    import spark.implicits._
    assume(Bucketing.bucketingEnabled(spark))
    val orders = (1 to 2000).map(i => (i.toLong % 97, i.toLong, i * 1.5))
      .toDF("cust", "oid", "amt")
    val custs = (0 to 96).map(i => (i.toLong, s"c$i")).toDF("cust", "name")
    Bucketing.writeBucketed(orders, "b_orders", 8, Seq("cust"), Seq("cust"))
    Bucketing.writeBucketed(custs, "b_custs", 8, Seq("cust"), Seq("cust"))
    withoutAutoBroadcast {
      val joined = Bucketing.readTable(spark, "b_orders")
        .join(Bucketing.readTable(spark, "b_custs"), "cust")
      val plan = planOf(joined)
      assert(noShuffle(plan), s"bucketed join shuffled:\n$plan")
      assert(joined.count() == 2000)
    }
  }

  test("aggregation on the bucket key plans without shuffle") {
    assume(Bucketing.bucketingEnabled(spark))
    val agg = Bucketing.readTable(spark, "b_orders")
      .groupBy("cust").agg(sum("amt").as("total"))
    val plan = planOf(agg)
    assert(noShuffle(plan), s"bucketed agg shuffled:\n$plan")
    assert(agg.count() == 97)
  }

  test("native asof join over bucketed inputs adds no shuffle") {
    import spark.implicits._
    assume(Bucketing.bucketingEnabled(spark))
    val lead = (1 to 500).map(i => (i.toLong % 13, (i * 7L) % 100, s"l$i"))
      .toDF("k", "ts", "lv")
    val ref = (1 to 200).map(i => (i.toLong % 13, (i * 3L) % 100, i.toDouble))
      .toDF("k", "ts", "rv").groupBy("k", "ts").agg(max("rv").as("rv"))
    Bucketing.writeBucketed(lead, "b_lead", 4, Seq("k"), Seq("k", "ts"))
    Bucketing.writeBucketed(ref, "b_ref", 4, Seq("k"), Seq("k", "ts"))
    val joined = graft.join.Joins.asofJoinNative(
      Bucketing.readTable(spark, "b_lead"), Bucketing.readTable(spark, "b_ref"),
      Seq("k"), "ts", "ts", Seq("rv"))
    val plan = planOf(joined)
    assert(noShuffle(plan), s"asof over bucketed inputs shuffled:\n$plan")
    // compare against the window-composition implementation for truth
    val expected = graft.join.Joins.asofJoin(
      Bucketing.readTable(spark, "b_lead"), Bucketing.readTable(spark, "b_ref"),
      Seq("k"), "ts", "ts", Seq("rv"))
      .select("k", "ts", "lv", "rv")
      .orderBy("k", "ts", "lv").collect().map(_.toSeq).toSeq
    val got = joined.select("k", "ts", "lv", "rv")
      .orderBy("k", "ts", "lv").collect().map(_.toSeq).toSeq
    assert(got == expected)
  }

  test("native sessionize over a bucketed, sorted layout adds no shuffle at all") {
    import spark.implicits._
    assume(Bucketing.bucketingEnabled(spark))
    // a daily event table bucketed by user and sorted by (user, ts):
    // the write-time shuffle is the ONLY one that ever happens — the
    // session labeling and the per-(user, session) summary both ride
    // the bucket layout
    val events = (1 to 800).map(i => (i.toLong % 17, (i * 137L) % 5000))
      .toDF("user", "ts")
    Bucketing.writeBucketed(events, "b_sess", 4, Seq("user"), Seq("user", "ts"))
    val labeled = org.apache.spark.sql.graft.SessionizeNative.sessionize(
      Bucketing.readTable(spark, "b_sess"), Seq("user"), "ts", 200L)
    val stats = labeled.groupBy("user", "session_id")
      .agg(count(lit(1)).as("n_events"), min("ts").as("start_ts"))
    val plan = planOf(stats)
    assert(noShuffle(plan), s"bucketed sessionize shuffled:\n$plan")
    // truth: the lag + running-sum window formulation
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user").orderBy("ts")
    val cum = w.rowsBetween(org.apache.spark.sql.expressions.Window
      .unboundedPreceding, org.apache.spark.sql.expressions.Window.currentRow)
    val expected = Bucketing.readTable(spark, "b_sess")
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("ns",
        when(col("prev").isNull || col("ts") - col("prev") > 200L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("ns").over(cum))
      .groupBy("user", "session_id")
      .agg(count(lit(1)).as("n_events"), min("ts").as("start_ts"))
      .orderBy("user", "session_id").collect().map(_.toSeq).toSeq
    val got = stats.orderBy("user", "session_id").collect().map(_.toSeq).toSeq
    assert(got == expected)
  }
}
