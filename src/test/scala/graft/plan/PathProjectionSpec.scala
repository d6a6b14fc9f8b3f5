package graft.plan

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftSpec

/** P1–P3, P8 (SURVEY §2.2): nested path projection semantics, mirrored from
  * the reference's buildChildren/splitFields behavior
  * (ProtoMessageToAvroMappings.scala:87-145).
  */
class PathProjectionSpec extends GraftSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("campaign", StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("labels", ArrayType(StringType)))), nullable = true),
    StructField("metrics", StructType(Seq(
      StructField("impressions", LongType),
      StructField("clicks", LongType))), nullable = true),
    StructField("empty_msg", StructType(Seq.empty), nullable = true),
    StructField("status", StringType)))

  private def fixture = {
    val rows = Seq(
      Row(Row(1L, "camp-a", Seq("x", "y")), Row(10L, 2L), Row(), "ENABLED"),
      Row(Row(2L, "", null), null, Row(), ""),
      Row(null, Row(0L, 0L), Row(), "PAUSED"))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  describe("splitFields (reference :87-92)") {
    it("groups by head segment preserving first-seen order") {
      PathProjection.splitFields(List("a.b", "c", "a.d.e")) shouldBe
        List("a" -> List("b", "d.e"), "c" -> Nil)
    }
  }

  describe("path projection (P1)") {
    it("keeps exactly the selected leaves, preserving nesting") {
      val df = Translator(List("campaign.id", "status"))(fixture)
      df.schema.fieldNames.toSeq shouldBe Seq("campaign", "status")
      df.schema("campaign").dataType.asInstanceOf[StructType].fieldNames.toSeq shouldBe Seq("id")
      df.where($"status" === "ENABLED").select($"campaign.id").as[Long].head() shouldBe 1L
    }
    it("orders struct children lexicographically (O2, reference :281-284)") {
      val df = Translator(List("campaign.name", "campaign.id"))(fixture)
      df.schema("campaign").dataType.asInstanceOf[StructType].fieldNames.toSeq shouldBe
        Seq("id", "name")
    }
  }

  describe("select-all expansion (P2, reference :100-101,135)") {
    it("a path ending at a struct keeps the whole subtree") {
      val df = Translator(List("metrics"))(fixture)
      df.schema("metrics").dataType.asInstanceOf[StructType].fieldNames.toSeq shouldBe
        Seq("clicks", "impressions")
    }
    it("empty field list selects everything except empty structs (reference :138)") {
      val df = Translator(Nil)(fixture)
      df.schema.fieldNames.toSeq shouldBe Seq("campaign", "metrics", "status")
    }
  }

  describe("validation (P3, reference :124-134)") {
    it("unknown field → IllegalArgumentException('has no field')") {
      val e = intercept[IllegalArgumentException](
        Translator(List("campaign.nope"))(fixture))
      e.getMessage should include("has no field")
    }
    it("explicitly selected empty struct → error (reference :129-132)") {
      val e = intercept[IllegalArgumentException](
        Translator(List("empty_msg"))(fixture))
      e.getMessage should include("empty message")
    }
  }

  describe("null/default semantics at leaves (P8)") {
    it("missing submessage → null, not empty struct (reference :314-318)") {
      val df = Translator(List("campaign.id", "status"))(fixture)
      df.where($"status" === "PAUSED").select($"campaign").head().isNullAt(0) shouldBe true
    }
    it("empty string → null (reference :210)") {
      // top-level empty status and nested empty campaign.name both coerced
      Translator(List("status"))(fixture).where($"status".isNull).count() shouldBe 1
      Translator(List("campaign.name", "campaign.id"))(fixture)
        .where($"campaign.id" === 2L && $"campaign.name".isNull).count() shouldBe 1
    }
    it("unset repeated → empty array (reference getDefault :75)") {
      val df = Translator(List("campaign.labels", "campaign.id"))(fixture)
      df.where($"campaign.id" === 2L)
        .select(org.apache.spark.sql.functions.size($"campaign.labels"))
        .as[Int].head() shouldBe 0
    }
    it("semantics can be disabled for passthrough use") {
      val df = Translator(List("status"), protoSemantics = false)(fixture)
      df.where($"status" === "").count() shouldBe 1
    }
  }

  describe("projectedSchema (plan-time schema, ProtoToAvroTranslator.scala:12-17)") {
    it("derives the pruned nested shape without executing") {
      PathProjection.projectedSchema(schema, List("campaign.id", "metrics")) shouldBe
        StructType(Seq(
          StructField("campaign", StructType(Seq(StructField("id", LongType))), nullable = true),
          StructField("metrics", StructType(Seq(
            StructField("clicks", LongType),
            StructField("impressions", LongType))), nullable = true)))
    }
  }

  describe("field metadata through projection") {
    val enumMd = graft.io.AvroSchemas.enumMetadata("Status", Seq("A", "B"))
    val mdSchema = StructType(Seq(
      StructField("campaign", StructType(Seq(
        StructField("id", LongType),
        StructField("status", StringType, nullable = true, enumMd))), nullable = true),
      StructField("kind", StringType, nullable = true, enumMd)))

    it("survives struct rebuilding (nested) and top-level aliasing") {
      val df = spark.createDataFrame(
        java.util.List.of(Row(Row(1L, "A"), "B")), mdSchema)
      val out = Translator(List("campaign.status", "kind"))(df)
      out.schema("kind").metadata shouldBe enumMd
      out.schema("campaign").dataType.asInstanceOf[StructType]("status")
        .metadata shouldBe enumMd
      // and the plan-time schema agrees
      val ps = PathProjection.projectedSchema(mdSchema, List("campaign.status", "kind"))
      ps("kind").metadata shouldBe enumMd
      ps("campaign").dataType.asInstanceOf[StructType]("status").metadata shouldBe enumMd
    }
  }
}
