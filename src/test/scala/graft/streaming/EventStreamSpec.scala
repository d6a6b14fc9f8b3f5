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

  describe("streaming observability (what a 100 TB pipeline alarms on)") {
    it("observe() metrics surface per-batch row counts and sums in progress") {
      import org.apache.spark.sql.streaming.Trigger
      val base = java.nio.file.Files.createTempDirectory("graft-obs").toString
      events.drop("event_time").write.mode("overwrite")
        .parquet(s"$base/in/data.parquet")
      val stream = spark.readStream
        .schema(EventStream.eventsSchema)
        .parquet(s"$base/in/*")
        .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
        .observe("ingest", count(lit(1)).as("rows"),
          sum(col("value")).as("sum_value"))
        .groupBy("event_type").agg(count(lit(1)).as("n"))
      val q = stream.writeStream
        .outputMode("complete")
        .format("noop")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val observed = q.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("ingest")))
      observed should not be empty
      observed.map(_.getAs[Long]("rows")).sum shouldBe 4L
      observed.map(_.getAs[Double]("sum_value")).sum shouldBe 10.0
    }

    it("watermark drops late arrivals and ACCOUNTS for them " +
       "(numRowsDroppedByWatermark)") {
      import org.apache.spark.sql.streaming.Trigger
      val base = java.nio.file.Files.createTempDirectory("graft-late").toString
      val in = s"$base/in"
      // batch 1: events at t=2h,3h → watermark advances to 3h - 1h = 2h
      Seq((1L, 7200L * us, 1L, "click", 1.0, ""),
          (2L, 10800L * us, 1L, "click", 1.0, ""))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .withColumn("ts", $"ts" * 1000)
        .write.parquet(s"$in/f1.parquet")
      // batch 2: an event at t=0 — an hour behind the watermark → dropped
      Seq((3L, 0L * us, 1L, "click", 1.0, ""),
          (4L, 10900L * us, 1L, "click", 1.0, ""))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .withColumn("ts", $"ts" * 1000)
        .write.parquet(s"$in/f2.parquet")
      val stream = spark.readStream
        .schema(EventStream.eventsSchema)
        .option("maxFilesPerTrigger", "1") // one file per micro-batch
        .parquet(s"$in/*")
        .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
        .withWatermark("event_time", "1 hour")
        .groupBy(window(col("event_time"), "1 hour"))
        .agg(count(lit(1)).as("n"))
      val q = stream.writeStream
        .outputMode("append")
        .format("noop")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val dropped = q.recentProgress
        .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
      dropped shouldBe 1L
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
