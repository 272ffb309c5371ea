package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Epoch-second extraction that is robust to how the writer encoded a
  * timestamp column in parquet.
  *
  * The `events.ts` column has shipped as both TIMESTAMP(NANOS) (which
  * Spark can only read as an epoch-nano long, via
  * `spark.sql.legacy.parquet.nanosAsLong`) and as `timestamp[us]`
  * (which Spark reads natively as TIMESTAMP / TIMESTAMP_NTZ). Hardcoding
  * either representation breaks the moment the input contract moves —
  * exactly what happened when the testdata was regenerated with
  * microsecond timestamps. All engine code goes through this helper,
  * which inspects the actual read schema and normalizes to epoch
  * seconds (matching the DuckDB oracle's
  * `CAST(floor(epoch(ts)) AS BIGINT)` on every representation).
  *
  * The session time zone is UTC (set in [[GraftSession.configure]]), so
  * casting TIMESTAMP_NTZ → TIMESTAMP is wall-clock-identity and
  * `unix_seconds` is exact.
  */
object Ts {

  /** Epoch seconds of `df(name)` as a LongType column (floor semantics,
    * i.e. truncation toward negative infinity for pre-epoch instants —
    * `floor` on the long-nanos path, `unix_seconds` on the timestamp
    * path, which both floor).
    */
  def seconds(df: DataFrame, name: String = "ts"): Column =
    df.schema(name).dataType match {
      // TIMESTAMP(NANOS) parquet read as epoch-nano long. Spark's `/` on
      // longs is double division and epoch-nanos exceed 2^53, so a value
      // within ~256 ns below a whole-second boundary could round up and
      // floor to the wrong second. Stay in exact long arithmetic:
      // subtract the (non-negative) pmod remainder so the numerator is an
      // exact multiple of 1e9, then integral `div` — truncation equals
      // floor on an exact multiple, including pre-epoch instants.
      case LongType =>
        val q = s"`${name.replace("`", "``")}`"
        expr(s"($q - pmod($q, 1000000000L)) div 1000000000L").cast(LongType)
      case TimestampType | TimestampNTZType =>
        unix_seconds(col(name).cast(TimestampType))
      case other =>
        throw new IllegalArgumentException(
          s"Ts.seconds: column '$name' has unsupported type $other " +
            "(expected LongType epoch-nanos or a timestamp type)")
    }
}
