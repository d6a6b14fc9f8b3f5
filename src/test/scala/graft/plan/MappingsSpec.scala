package graft.plan

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.GraftSpec
import graft.plan.MappingNode.{Constant, Message, Scalar}

/** P4–P6, U1 (SURVEY §2.2): the user-defined mapping algebra, mirroring the
  * reference's UserDefinedMappings.scala validation and value semantics.
  */
class MappingsSpec extends GraftSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("campaign", StructType(Seq(
      StructField("id", LongType),
      StructField("stats", StructType(Seq(StructField("clicks", LongType)))),
      StructField("labels", ArrayType(StringType)))), nullable = true),
    StructField("date", StringType)))

  private def fixture = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row(Row(7L, Row(3L), Seq("a")), "2021-02-01"),
      Row(null, "2021-02-02"))),
    schema)

  describe("Constant (P5, UserDefinedMappings.scala:40-44)") {
    it("emits a typed literal") {
      val df = Translator(List("date"),
        userDefinedMappings = List("author" -> Constant(StringType, "Ben"),
          "run" -> Constant(IntegerType, 1)))(fixture)
      df.select($"author", $"run").distinct().as[(String, Int)].head() shouldBe ("Ben", 1)
    }
  }

  describe("Scalar (P4, UserDefinedMappings.scala:46-107)") {
    it("lifts a nested leaf to the top level") {
      val df = Translator(List("date"),
        userDefinedMappings = List("clicks" -> Scalar("campaign.stats.clicks")))(fixture)
      df.where($"date" === "2021-02-01").select($"clicks").as[Long].head() shouldBe 3L
    }
    it("unset numeric along the path → proto zero-default, not null") {
      val df = Translator(List("date"),
        userDefinedMappings = List("clicks" -> Scalar("campaign.stats.clicks")))(fixture)
      df.where($"date" === "2021-02-02").select($"clicks").as[Long].head() shouldBe 0L
    }
    it("rejects an empty path (reference :54)") {
      intercept[IllegalArgumentException](Scalar("").toColumn(schema))
        .getMessage should include("non empty")
    }
    it("rejects a discontinuous path (reference :64-70)") {
      intercept[IllegalArgumentException](Scalar("campaign.nope").toColumn(schema))
        .getMessage should include("continuous")
    }
    it("rejects a repeated segment (reference :71-74)") {
      intercept[IllegalArgumentException](Scalar("campaign.labels").toColumn(schema))
        .getMessage should include("repeated")
    }
    it("rejects a struct terminal (reference :75-79)") {
      intercept[IllegalArgumentException](Scalar("campaign.stats").toColumn(schema))
        .getMessage should include("scalar")
    }
  }

  describe("Custom (U1, UserDefinedMappings.scala:20-33)") {
    import graft.plan.MappingNode.Custom
    import org.apache.spark.sql.functions._
    it("user-supplied Column logic composes with the translator") {
      val df = Translator(List("date"),
        userDefinedMappings = List(
          "date_len" -> Custom(_ => org.apache.spark.sql.functions.length(col("date"))),
          "wrapped" -> Message("wrapped", Seq(
            "upper_date" -> Custom(_ => upper(col("date")))))))(fixture)
      df.where($"date" === "2021-02-01")
        .select($"date_len", $"wrapped.upper_date").as[(Int, String)]
        .head() shouldBe ((10, "2021-02-01"))
    }
    it("can use the schema for validation") {
      val c = Custom(st => {
        require(st.fieldNames.contains("date"), "needs a date column")
        col("date")
      })
      an[IllegalArgumentException] should be thrownBy
        c.toColumn(org.apache.spark.sql.types.StructType(Nil))
    }
  }

  describe("Message (P6, UserDefinedMappings.scala:128-154)") {
    it("builds a nested struct from constants and scalars, sorted by name") {
      val df = Translator(Nil,
        userDefinedMappings = List("metadata" -> Message("metadata", Seq(
          "zz" -> Constant(StringType, "last"),
          "author" -> Constant(StringType, "Ben"),
          "clicks" -> Scalar("campaign.stats.clicks")))))(fixture)
      df.schema("metadata").dataType.asInstanceOf[StructType].fieldNames.toSeq shouldBe
        Seq("author", "clicks", "zz")
      df.where($"date" === "2021-02-01")
        .select($"metadata.author", $"metadata.clicks").as[(String, Long)]
        .head() shouldBe ("Ben", 3L)
    }
    it("nests recursively") {
      val df = Translator(Nil,
        userDefinedMappings = List("outer" -> Message("outer", Seq(
          "inner" -> Message("inner", Seq("x" -> Constant(IntegerType, 5)))))))(fixture)
      df.select($"outer.inner.x").as[Int].head() shouldBe 5
    }
  }
}
