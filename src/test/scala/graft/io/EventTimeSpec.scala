package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftSpec

/** Unit adaptation for events.ts (TIMESTAMP(NANOS)-as-Long vs
  * TIMESTAMP(MICROS)): same instants must normalize identically through
  * every EventTime surface whatever the raw representation.
  */
class EventTimeSpec extends GraftSpec {
  import spark.implicits._

  // three instants around the slice boundary used by dq103
  private val instants = Seq(
    "2024-01-09T23:59:59.123456Z",
    "2024-01-10T00:00:00Z",
    "2024-01-10T12:34:56.789012Z").map(java.time.Instant.parse)
  private def us(i: java.time.Instant): Long =
    i.getEpochSecond * 1000000L + i.getNano / 1000L

  /** The legacy shape: raw Long nanos. */
  private def nanosFrame: DataFrame =
    instants.map(i => Tuple1(us(i) * 1000L)).toDF("ts")

  /** The current shape: TIMESTAMP_NTZ micros (cast is value-preserving
    * under the suite's UTC session). */
  private def ntzFrame: DataFrame =
    instants.map(i => Tuple1(us(i))).toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))

  it("withTsMicros normalizes both raw units to the same epoch micros") {
    val expected = instants.map(us)
    for (f <- Seq(nanosFrame, ntzFrame))
      EventTime.withTsMicros(f).as[Long].collect().toSeq shouldBe expected
  }

  it("eventTimeCol renders the same TimestampType instants in both units") {
    def times(f: DataFrame): Seq[String] = {
      val et = EventTime.eventTimeCol(f.schema("ts").dataType, "ts")
      f.select(date_format(et, "yyyy-MM-dd HH:mm:ss.SSSSSS").as("t"))
        .as[String].collect().toSeq
    }
    times(nanosFrame) shouldBe times(ntzFrame)
    times(ntzFrame).head shouldBe "2024-01-09 23:59:59.123456"
  }

  it("tsLiteral slices the RAW column identically in both units (the " +
     "pushdown-eligible predicate shape)") {
    val lo = java.time.Instant.parse("2024-01-10T00:00:00Z")
    def sliced(f: DataFrame): Long = {
      val dt = f.schema("ts").dataType
      f.filter(col("ts") >= EventTime.tsLiteral(dt, lo)).count()
    }
    sliced(nanosFrame) shouldBe 2L
    sliced(ntzFrame) shouldBe 2L
  }

  it("rejects a foreign ts type loudly instead of mis-scaling") {
    an[IllegalArgumentException] should be thrownBy
      EventTime.isNanosLong(StringType)
    an[IllegalArgumentException] should be thrownBy
      EventTime.tsLiteral(StringType, java.time.Instant.EPOCH)
  }

  it("normalizes the shipped testdata into its generated era (a 1000x " +
     "unit error would land in 1970 or year 55927)") {
    val ts = EventTime.withTsMicros(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
      .agg(min(col("ts")), max(col("ts"))).as[(Long, Long)].head()
    val lo = java.time.Instant.parse("2020-01-01T00:00:00Z")
    val hi = java.time.Instant.parse("2030-01-01T00:00:00Z")
    ts._1 should be >= us(lo)
    ts._2 should be <= us(hi)
  }
}
