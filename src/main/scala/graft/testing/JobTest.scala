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
  */
final class JobTest private (spark: SparkSession,
    sources: Map[String, DataFrame]) {

  def source[T <: Product: Encoder](name: String, rows: Seq[T]): JobTest =
    new JobTest(spark, sources + (name -> spark.createDataset(rows).toDF()))

  def sourceDF(name: String, df: DataFrame): JobTest =
    new JobTest(spark, sources + (name -> df))

  def run(flow: (SparkSession, Map[String, DataFrame]) => DataFrame): JobTestResult =
    new JobTestResult(flow(spark, sources).collect().toSeq)
}

final class JobTestResult(val rows: Seq[Row]) {
  def sink(assertion: Seq[Row] => Unit): JobTestResult = { assertion(rows); this }
}

object JobTest {
  def apply(spark: SparkSession): JobTest = new JobTest(spark, Map.empty)
}
