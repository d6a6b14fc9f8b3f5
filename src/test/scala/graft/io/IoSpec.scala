package graft.io

import java.nio.file.Files

import org.apache.avro.Schema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftSpec

/** S2–S4 (SURVEY §2.1): avro sink round-trip, schema derivation rules,
  * result cache hit/invalidate semantics.
  */
class IoSpec extends GraftSpec {
  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  describe("AvroSchemas (ProtoMessageToAvroMappings.scala:221-269)") {
    val st = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("tags", ArrayType(StringType, containsNull = false), nullable = true),
      StructField("meta", StructType(Seq(
        StructField("flag", BooleanType, nullable = false))), nullable = true)))
    val avro = AvroSchemas.toAvro(st, "Rec")

    it("nullable field → union [null, T], null first (:241,:266)") {
      val f = avro.getField("name").schema()
      f.getType shouldBe Schema.Type.UNION
      f.getTypes.get(0).getType shouldBe Schema.Type.NULL
      f.getTypes.get(1).getType shouldBe Schema.Type.STRING
    }
    it("non-nullable scalar → bare type with zero default (:70-83)") {
      avro.getField("id").schema().getType shouldBe Schema.Type.LONG
      avro.getField("id").defaultVal() shouldBe 0
    }
    it("struct → record, array → array") {
      val meta = avro.getField("meta").schema().getTypes.get(1)
      meta.getType shouldBe Schema.Type.RECORD
      meta.getField("flag").schema().getType shouldBe Schema.Type.BOOLEAN
      avro.getField("tags").schema().getTypes.get(1).getType shouldBe Schema.Type.ARRAY
    }
    it("unsupported type → IllegalStateException (:234-237)") {
      intercept[IllegalStateException](
        AvroSchemas.toAvro(StructType(Seq(
          StructField("x", CalendarIntervalType))), "Bad"))
    }
  }

  describe("named-enum schema fidelity (:230-233,:51-53)") {
    it("an enum-tagged string column becomes a NAMED Avro enum and the " +
       "written container carries it, symbols round-tripping") {
      val dir = tmp("avro-enum") + "/out"
      val df = AvroSchemas.markEnum(
        Seq((1L, "ENABLED"), (2L, "PAUSED")).toDF("id", "status"),
        "status", "CampaignStatus", Seq("UNSPECIFIED", "ENABLED", "PAUSED"))
      AvroSink.write(df.coalesce(1), dir, "Report")

      // the WRITTEN file's embedded schema, not just the derived one
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(dir), new org.apache.hadoop.conf.Configuration())
      val avroFile = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .map(_.getPath).find(_.getName.endsWith(".avro")).get
      val reader = new org.apache.avro.file.DataFileReader(
        new org.apache.avro.mapred.FsInput(avroFile, new org.apache.hadoop.conf.Configuration()),
        new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
      try {
        val statusSchema = reader.getSchema.getField("status").schema()
          .getTypes.get(1) // [null, enum]
        statusSchema.getType shouldBe Schema.Type.ENUM
        statusSchema.getName shouldBe "CampaignStatus"
        statusSchema.getEnumSymbols.toArray.toSeq shouldBe
          Seq("UNSPECIFIED", "ENABLED", "PAUSED")
        val rows = new scala.collection.mutable.ArrayBuffer[(Long, String)]
        while (reader.hasNext) {
          val r = reader.next()
          rows += ((r.get("id").asInstanceOf[Long], r.get("status").toString))
        }
        rows.sortBy(_._1).toSeq shouldBe Seq((1L, "ENABLED"), (2L, "PAUSED"))
      } finally reader.close()
    }
    it("ProtoIngest enum fields arrive pre-tagged for the Avro sink") {
      import ProtoIngest._
      val msg = PMessage("m", Seq(
        PField(1, "status", PEnum(Map(0 -> "UNKNOWN", 1 -> "OK"), "StatusEnum"))))
      val st = structTypeOf(msg)
      val avro = AvroSchemas.toAvro(st, "M")
      val en = avro.getField("status").schema().getTypes.get(1)
      en.getType shouldBe Schema.Type.ENUM
      en.getName shouldBe "StatusEnum"
      en.getEnumSymbols.toArray.toSeq shouldBe Seq("UNKNOWN", "OK")
    }
    it("nested messages keep their proto type name and nest the namespace " +
       "under the enclosing record (ProtobufData naming convention)") {
      import ProtoIngest._
      val msg = PMessage("AdsRow", Seq(
        PField(1, "campaign", PNested(PMessage("Campaign", Seq(
          PField(1, "id", PInt64),
          PField(2, "status", PEnum(Map(0 -> "UNKNOWN"), "Status"))))))))
      val avro = AvroSchemas.toAvro(structTypeOf(msg), "AdsRow")
      avro.getFullName shouldBe "graft.AdsRow"
      val campaign = avro.getField("campaign").schema().getTypes.get(1)
      campaign.getType shouldBe Schema.Type.RECORD
      campaign.getName shouldBe "Campaign"        // proto type name, not a path
      campaign.getNamespace shouldBe "graft.AdsRow"
      val status = campaign.getField("status").schema().getTypes.get(1)
      status.getFullName shouldBe "graft.AdsRow.Campaign.Status"
    }
  }

  describe("AvroSink (Main.scala:205-217)") {
    it("writes container files per partition and round-trips values") {
      val dir = tmp("avro") + "/out"
      val df = Seq(
        (1L, "alpha", Seq("x", "y"), ("2021-02-01", 10.5)),
        (2L, null.asInstanceOf[String], Seq.empty[String], ("2021-02-02", 0.0)))
        .toDF("id", "name", "tags", "info")
      AvroSink.write(df.repartition(2), dir, "Report")

      val lines = AvroSink.readToJsonStrings(spark, dir)
      lines should have size 2
      val all = lines.mkString("\n")
      all should include(""""id": 1""")
      all should include(""""alpha"""")
      all should include(""""name": null""") // nullable union renders null
      all should include(""""_2": 10.5""")
    }
  }

  describe("AvroSink type coverage") {
    it("dates, timestamps, decimals, and maps round-trip as declared") {
      val dir = tmp("avro2") + "/out"
      val df = spark.sql(
        """SELECT DATE'2021-02-03' AS d, TIMESTAMP'2021-02-03 04:05:06' AS ts,
          |CAST(12.34 AS DECIMAL(10,2)) AS dec, map('k', 42L) AS m""".stripMargin)
      AvroSink.write(df, dir, "Typed")
      val line = AvroSink.readToJsonStrings(spark, dir).head
      line should include("2021-02-03")       // date as ISO string
      line should include("2021-02-03T04:05:06Z") // timestamp as instant
      line should include("12.34")            // decimal as plain string
      line should include(""""k": 42""")      // map value
    }
  }

  describe("ResultCache (Main.scala:67-121)") {
    it("same plan → cache hit; different plan → recompute") {
      val dir = tmp("cache") + "/c"
      val base = spark.range(100).toDF("n")
      val q1 = base.filter($"n" % 2 === 0)

      ResultCache.readThrough(q1, dir).count() shouldBe 50
      // hit: underlying data unchanged even if we tamper with the store
      val fp1 = ResultCache.fingerprint(q1)
      ResultCache.fingerprint(base.filter($"n" % 2 === 0)) shouldBe fp1
      ResultCache.readThrough(base.filter($"n" % 2 === 0), dir).count() shouldBe 50

      // a different query must NOT replay the stale cache
      val q2 = base.filter($"n" % 2 === 1).withColumn("m", $"n" * 2)
      ResultCache.fingerprint(q2) should not be fp1
      val out = ResultCache.readThrough(q2, dir)
      out.count() shouldBe 50
      out.columns.toSeq shouldBe Seq("n", "m")
    }
  }

  describe("JsonSink (Main.scala:234-246)") {
    it("emits one JSON object per row") {
      val df = Seq((1L, "a")).toDF("id", "name")
      df.select(JsonSink.toJsonColumn(df).as("j")).as[String].head() shouldBe
        """{"id":1,"name":"a"}"""
    }
  }

  describe("streaming parquet sink (exactly-once via checkpoint)") {
    it("writes once and a restart with the same checkpoint adds nothing") {
      val base = java.nio.file.Files.createTempDirectory("graft-stream-pq").toString
      def runOnce(): Unit = {
        val q = graft.streaming.EventStream.readEvents(spark, "/root/testdata/sf0.001")
          .select("event_id", "event_type")
          .writeStream
          .format("parquet")
          .option("path", s"$base/out")
          .option("checkpointLocation", s"$base/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      val expected = spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()
      runOnce()
      spark.read.parquet(s"$base/out").count() shouldBe expected
      runOnce() // same checkpoint, no new input → exactly-once: no duplicates
      spark.read.parquet(s"$base/out").count() shouldBe expected
    }
  }

  describe("streaming into the Avro sink (foreachBatch)") {
    it("streams events through foreachBatch into Avro container files") {
      val dir = java.nio.file.Files.createTempDirectory("graft-stream-avro").toString
      val src = graft.streaming.EventStream.readEvents(spark, "/root/testdata/sf0.001")
        .select("event_id", "event_type")
      val q = src.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          AvroSink.write(batch, s"$dir/batch_$id", "Event")
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val expected = spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()
      val lines = AvroSink.readToJsonStrings(spark, s"$dir/batch_0")
      lines.size.toLong shouldBe expected
      lines.head should include("event_id")
    }
  }
}
