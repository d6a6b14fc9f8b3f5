package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unit adaptation for the events table's `ts` column.
  *
  * The testdata generator has shipped `events.ts` under two different
  * parquet physical annotations across regenerations:
  *
  *   - `TIMESTAMP(NANOS, isAdjustedToUTC=false)` — Spark cannot decode
  *     nanos timestamps natively and reads the raw int64 as a nanos
  *     `LongType` under `spark.sql.legacy.parquet.nanosAsLong=true`;
  *   - `TIMESTAMP(MICROS, isAdjustedToUTC=false)` — Spark reads this as
  *     `TIMESTAMP_NTZ` (schema inference) and DuckDB as a naive
  *     `TIMESTAMP`, both micros precision.
  *
  * Everything downstream works in ONE canonical unit — epoch MICROSECONDS
  * (integer-exact cross-engine, and what DuckDB's `epoch_us()` yields on
  * either file) — and this object is the single place that inspects the
  * scanned type and converts. A future regeneration in either unit is a
  * no-op for every consumer: batch queries normalize through
  * [[withTsMicros]]/[[microsCol]], the streaming source declares its
  * schema from [[tsTypeOf]], and slice predicates build their literals
  * with [[tsLiteral]] so they stay pushdown-eligible against the RAW
  * column in either unit.
  */
object EventTime {

  /** True when the scanned `ts` is the legacy nanos-as-Long representation
    * (parquet TIMESTAMP(NANOS) under `nanosAsLong`); false for the micros
    * timestamp forms. Any other type is a corrupt/foreign events table —
    * fail loudly rather than mis-scale every event time. */
  def isNanosLong(dt: DataType): Boolean = dt match {
    case LongType                         => true
    case TimestampNTZType | TimestampType => false
    case other => throw new IllegalArgumentException(
      s"events.ts has unsupported type $other: expected LongType " +
        "(TIMESTAMP(NANOS) under spark.sql.legacy.parquet.nanosAsLong) " +
        "or TIMESTAMP/TIMESTAMP_NTZ (micros)")
  }

  /** The scanned type of `dir/events.parquet`'s `ts` column — a
    * footer-only batch read. File-source STREAMS cannot infer a schema, so
    * the streaming reader probes the unit here and declares the matching
    * schema ([[graft.streaming.EventStream.readEvents]]). */
  def tsTypeOf(spark: SparkSession, dir: String): DataType =
    spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType

  /** Raw `ts` (by name — integral division needs the SQL `DIV` form) →
    * epoch-micros Long. Exact integer arithmetic in both branches: `DIV`
    * truncates nanos, `unix_micros` is the identity on a micros-precision
    * timestamp. The NTZ→TZ cast is value-preserving under the UTC session
    * every Graft entry point validates/sets. */
  def microsCol(dt: DataType, tsName: String = "ts"): Column =
    if (isNanosLong(dt)) expr(s"`$tsName` DIV 1000")
    else unix_micros(col(tsName).cast(TimestampType))

  /** Raw `ts` → a `TimestampType` event-time column (micros precision).
    * TimestampType (not NTZ) so watermarks, `window()`/`session_window`,
    * and `date_format` rendering behave identically in both units. */
  def eventTimeCol(dt: DataType, tsName: String = "ts"): Column =
    if (isNanosLong(dt)) timestamp_micros(expr(s"`$tsName` DIV 1000"))
    else col(tsName).cast(TimestampType)

  /** Normalize a frame's `ts` column to canonical epoch-micros Long. */
  def withTsMicros(df: DataFrame, tsName: String = "ts"): DataFrame =
    df.withColumn(tsName, microsCol(df.schema(tsName).dataType, tsName))

  /** A slice-bound literal comparable against the RAW `ts` column. The
    * comparison stays a plain column-vs-literal predicate — never an
    * expression wrapped around the column — so it reaches the parquet scan
    * as PushedFilters (row-group/page pruning) in every unit: nanos Long
    * vs a nanos literal, TIMESTAMP_NTZ vs a LocalDateTime literal,
    * TIMESTAMP vs an Instant literal. */
  def tsLiteral(dt: DataType, instant: java.time.Instant): Column = dt match {
    case LongType =>
      lit(instant.getEpochSecond * 1000000000L + instant.getNano)
    case TimestampNTZType =>
      lit(java.time.LocalDateTime.ofInstant(instant, java.time.ZoneOffset.UTC))
    case TimestampType => lit(instant)
    case other => throw new IllegalArgumentException(
      s"events.ts has unsupported type $other for slice literals")
  }
}
