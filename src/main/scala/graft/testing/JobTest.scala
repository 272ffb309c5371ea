package graft.testing

import org.apache.spark.sql.{DataFrame, Encoder, Row, SparkSession}

/** JobTest-style harness — the reference's in-memory end-to-end test
  * pattern (JobTest.scala:38-152): mock named sources with in-memory
  * data, run the flow, assert on collected sinks. Here sources are a
  * name → DataFrame map handed to the flow under test; sinks are the
  * returned DataFrames, collected.
  *
  * {{{
  * JobTest(spark)
  *   .source("events", Seq((1L, "click"), (2L, "view")))
  *   .run { (s, src) => src("events").groupBy("_2").count() }
  *   .sink { rows => assert(rows.size == 2) }
  * }}}
  *
  * [[run]] executes once in the session's normal configuration.
  * [[runBoth]] is the analogue of the reference's dual `.run` +
  * `.runHadoop` (JobTest.scala:38-149, local vs cluster execution):
  * the flow executes a second time with AQE and broadcast joins
  * DISABLED — every join becomes a real exchange + sort-merge and
  * every aggregate a full shuffle, exercising the serialization and
  * exchange paths that a broadcast-happy local plan skips — and both
  * executions must produce the same multiset of rows. Flows whose
  * outputs depend on float summation order should round before
  * returning (same caveat as the reference's Hadoop mode).
  */
final class JobTest private (spark: SparkSession,
    sources: Map[String, DataFrame]) {

  def source[T <: Product: Encoder](name: String, rows: Seq[T]): JobTest =
    new JobTest(spark, sources + (name -> spark.createDataset(rows).toDF()))

  def sourceDF(name: String, df: DataFrame): JobTest =
    new JobTest(spark, sources + (name -> df))

  def run(flow: (SparkSession, Map[String, DataFrame]) => DataFrame): JobTestResult =
    new JobTestResult(flow(spark, sources).collect().toSeq)

  def runBoth(flow: (SparkSession, Map[String, DataFrame]) => DataFrame): JobTestResult = {
    val local = flow(spark, sources).collect().toSeq
    val conf = spark.conf
    val keys = Seq("spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    val exchange =
      try {
        conf.set("spark.sql.adaptive.enabled", "false")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        flow(spark, sources).collect().toSeq
      } finally saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    val a = local.map(_.toString).sorted
    val b = exchange.map(_.toString).sorted
    if (a != b) {
      val onlyLocal = a.diff(b).take(5)
      val onlyExchange = b.diff(a).take(5)
      throw new AssertionError(
        "runBoth: local and exchange-mode executions disagree — " +
          s"${local.size} vs ${exchange.size} rows; " +
          s"only-local sample: $onlyLocal; only-exchange sample: $onlyExchange")
    }
    new JobTestResult(local)
  }
}

final class JobTestResult(val rows: Seq[Row]) {
  def sink(assertion: Seq[Row] => Unit): JobTestResult = { assertion(rows); this }
}

object JobTest {
  def apply(spark: SparkSession): JobTest = new JobTest(spark, Map.empty)
}
