package graft.streaming

import org.apache.spark.sql.functions._

import graft.GraftSpec

/** EXT streaming operators, exercised in batch mode (the transformations are
  * stream/batch unified; DQ25/DQ26 run them as real availableNow streams).
  */
class EventStreamSpec extends GraftSpec {
  import spark.implicits._

  private val us = 1000000L
  // user 1: two sessions (gap > 10 min); user 2: one session
  private def events = Seq(
    (1L, 0L * us, 1L, "click", 1.0, ""),
    (2L, 300L * us, 1L, "view", 2.0, ""),   // +5 min → same session
    (3L, 1000L * us, 1L, "click", 3.0, ""), // +11.7 min → new session
    (4L, 60L * us, 2L, "view", 4.0, "")
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    .withColumn("ts", $"ts" * 1000) // to nanos
    .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))

  describe("sessionize (flatMapGroupsWithState)") {
    it("splits on the inactivity gap and aggregates per session") {
      val s = EventStream.sessionize(events, gapMinutes = 10)
        .collect().sortBy(x => (x.user_id, x.session_start))
      s.map(x => (x.user_id, x.n_events, x.duration_sec)) shouldBe
        Array((1L, 2L, 300.0), (1L, 1L, 0.0), (2L, 1L, 0.0))
      s(0).session_start shouldBe "1970-01-01 00:00:00"
      s(1).session_start shouldBe "1970-01-01 00:16:40"
    }
  }

  describe("hourlyTypeCounts") {
    it("tumbling hourly windows per type") {
      val r = EventStream.hourlyTypeCounts(events)
        .orderBy("window_start", "event_type")
        .as[(String, String, Long, Double)].collect()
      r shouldBe Array(
        ("1970-01-01 00:00:00", "click", 2L, 4.0),
        ("1970-01-01 00:00:00", "view", 2L, 6.0))
    }
  }

  describe("RocksDB state store (the production backend for state > heap)") {
    it("stateful windowed aggregation produces identical results on RocksDB") {
      import org.apache.spark.sql.streaming.OutputMode
      def run(name: String): Set[(String, String, Long, Double)] =
        EventStream.runToTable(
          EventStream.hourlyTypeCounts(
            EventStream.readEvents(spark, "/root/testdata/sf0.001")),
          name, OutputMode.Complete())
          .as[(String, String, Long, Double)].collect().toSet

      val default = run("ss_default")
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val rocks = run("ss_rocksdb")
        rocks shouldBe default
        rocks should not be empty
      } finally prev.fold(spark.conf.unset(key))(v => spark.conf.set(key, v))
    }
  }
}
