package graft.plan

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.GraftSpec
import graft.plan.MappingNode.{Constant, Message, Scalar}

/** The reference's own end-to-end spec, re-expressed on a DataFrame fixture
  * (ProtoToAvroMappingTest.scala:11-103): selected fields + all three UDM
  * kinds; asserts constants round-trip, lifted ids equal nested originals,
  * metadata scalars, leaf values, and exact projected field sets.
  */
class TranslatorSpec extends GraftSpec {
  import spark.implicits._

  // the GoogleAdsRow-shaped fixture (ProtoToAvroMappingTest.scala:12-41)
  private val schema = StructType(Seq(
    StructField("campaign", StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("status", StringType)))),
    StructField("campaign_criterion", StructType(Seq(
      StructField("criterion_id", LongType),
      StructField("negative", BooleanType),
      StructField("keyword", StructType(Seq(
        StructField("text", StringType),
        StructField("match_type", StringType))))))),
    StructField("segments", StructType(Seq(
      StructField("date", StringType))))))

  private def fixture = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(Row(
      Row(123L, "my-campaign", "ENABLED"),
      Row(456L, true, Row("shoes", "EXACT")),
      Row("2021-02-03")))),
    schema)

  private val translated = Translator(
    fields = List(
      "campaign.id", "campaign.name",
      "campaign_criterion.criterion_id", "campaign_criterion.negative",
      "campaign_criterion.keyword.text"),
    userDefinedMappings = List(
      "author" -> Constant(StringType, "Ben"),                     // :61
      "campaign_id" -> Scalar("campaign.id"),                      // :64
      "criterion_id" -> Scalar("campaign_criterion.criterion_id"), // :65
      "metadata" -> Message("metadata", Seq(                       // :67-72
        "download_date" -> Constant(StringType, "2021-02-04"),
        "report_date" -> Scalar("segments.date")))))(fixture)

  it("constants round-trip (:83)") {
    translated.select($"author").as[String].head() shouldBe "Ben"
  }

  it("lifted ids equal their nested originals (:85-86)") {
    translated.select($"campaign_id", $"campaign.id").as[(Long, Long)].head() shouldBe (123L, 123L)
    translated.select($"criterion_id").as[Long].head() shouldBe 456L
  }

  it("metadata scalars (:88-89)") {
    translated.select($"metadata.download_date", $"metadata.report_date")
      .as[(String, String)].head() shouldBe ("2021-02-04", "2021-02-03")
  }

  it("leaf values survive projection (:91-94)") {
    translated.select($"campaign.name").as[String].head() shouldBe "my-campaign"
    translated.select($"campaign_criterion.negative").as[Boolean].head() shouldBe true
    translated.select($"campaign_criterion.keyword.text").as[String].head() shouldBe "shoes"
  }

  it("exact projected field sets per struct (:96-100)") {
    def names(field: String) =
      translated.schema(field).dataType.asInstanceOf[StructType].fieldNames.toSet
    names("campaign") shouldBe Set("id", "name") // status pruned
    names("campaign_criterion") shouldBe Set("criterion_id", "negative", "keyword")
    translated.schema("campaign_criterion").dataType.asInstanceOf[StructType]("keyword")
      .dataType.asInstanceOf[StructType].fieldNames.toSet shouldBe Set("text")
    translated.schema.fieldNames.toSet shouldBe
      Set("author", "campaign", "campaign_criterion", "campaign_id", "criterion_id", "metadata")
  }

  it("top-level order: UDMs and projected fields merged under one Ordering (O1)") {
    translated.schema.fieldNames.toSeq shouldBe
      Seq("author", "campaign", "campaign_criterion", "campaign_id", "criterion_id", "metadata")
    val idFirst = Translator(List("campaign.id"),
      userDefinedMappings = List(
        "campaign_id" -> Scalar("campaign.id"),
        "metadata" -> Message("metadata", Seq("a" -> Constant(StringType, "x")))),
      ordering = FieldOrdering.idFirst(List("campaign_id")))(fixture)
    idFirst.schema.fieldNames.toSeq shouldBe Seq("campaign_id", "campaign", "metadata")
  }
}
