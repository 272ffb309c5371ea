package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.core.Ts

/** The timestamp-normalization contract (core/Ts.scala): the driver
  * has shipped `events.ts` under different parquet encodings across
  * data drops, and a hardcoded representation silently killed every
  * ts-arithmetic gate when the encoding flipped. Ts.seconds must
  * produce identical epoch seconds for every encoding Spark can hand
  * us — so the engine survives the NEXT flip too.
  */
class TsSpec extends SparkSpec {

  private val instants = Seq(
    "1970-01-01 00:00:00", "1995-06-17 08:30:15", "2026-08-13 23:59:59")

  test("epoch-nano longs, TIMESTAMP and TIMESTAMP_NTZ all normalize identically") {
    import spark.implicits._
    val expected = instants.map(i =>
      java.time.LocalDateTime.parse(i.replace(' ', 'T'))
        .toEpochSecond(java.time.ZoneOffset.UTC))

    // epoch-nano long (the nanosAsLong read path)
    val asLong = expected.map(_ * 1000000000L + 123456789L).toDF("ts")
    assert(asLong.select(Ts.seconds(asLong)).as[Long].collect().toSeq.sorted == expected.sorted)

    // TIMESTAMP (session TZ is UTC, so wall clock == instant)
    val asTs = instants.toDF("s")
      .select(col("s").cast("timestamp").as("ts"))
    assert(asTs.select(Ts.seconds(asTs)).as[Long].collect().toSeq.sorted == expected.sorted)

    // TIMESTAMP_NTZ — the encoding the current events.parquet scans
    // produce; round-trip through parquet to exercise the real reader
    val dir = Files.createTempDirectory("ts_ntz").toString
    instants.toDF("s")
      .select(col("s").cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(dir)
    val asNtz = spark.read.parquet(dir)
    assert(asNtz.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    assert(asNtz.select(Ts.seconds(asNtz)).as[Long].collect().toSeq.sorted == expected.sorted)
  }

  test("sub-second fractions floor toward the earlier second") {
    import spark.implicits._
    // 10.9 s as nanos -> 10; 10.9 s as timestamp -> 10
    val asLong = Seq(10900000000L).toDF("ts")
    assert(asLong.select(Ts.seconds(asLong)).as[Long].head() == 10L)
    val asTs = Seq("1970-01-01 00:00:10.9").toDF("s")
      .select(col("s").cast("timestamp").as("ts"))
    assert(asTs.select(Ts.seconds(asTs)).as[Long].head() == 10L)
  }

  test("nanos beyond 2^53 floor exactly, including just below a boundary") {
    import spark.implicits._
    // 1699999999999999999 ns = 1 ns before the 1.7e9-second boundary.
    // Double division rounds the numerator up (ulp at 1.7e18 is 256 ns)
    // and floors to 1700000000; exact long arithmetic must give
    // 1699999999. Also check pre-epoch floor-toward-negative-infinity.
    val df = Seq(
      1699999999999999999L, // boundary - 1 ns
      1700000000000000000L, // exact boundary
      -1L,                  // 1 ns before epoch -> second -1
      -1000000001L          // 1 ns before -1 s -> second -2
    ).toDF("ts")
    assert(df.select(Ts.seconds(df)).as[Long].collect().toSeq ==
      Seq(1699999999L, 1700000000L, -1L, -2L))
  }

  test("unsupported column types fail loudly, not silently") {
    import spark.implicits._
    val df = Seq("not a time").toDF("ts")
    val e = intercept[IllegalArgumentException] {
      Ts.seconds(df)
    }
    assert(e.getMessage.contains("unsupported type"))
  }
}
