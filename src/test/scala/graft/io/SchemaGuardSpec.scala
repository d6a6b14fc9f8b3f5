package graft.io

import org.apache.spark.sql.types._

import graft.GraftSpec

/** Schema guards for silent testdata regenerations (the events.ts
  * lesson): wrong physical shapes fail at scan time with the table and
  * column named.
  */
class SchemaGuardSpec extends GraftSpec {

  private def docsSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  it("accepts the shipped documents/embeddings shapes (and the real files)") {
    SchemaGuard.check("documents", docsSchema)
    SchemaGuard.check("embeddings", embSchema)
    for (t <- Seq("documents", "embeddings"))
      SchemaGuard.check(t,
        spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet").schema)
  }

  it("rejects a float64 embedding regeneration, naming table and column") {
    val regen = StructType(embSchema.map {
      case f if f.name == "embedding" =>
        f.copy(dataType = ArrayType(DoubleType))
      case f => f
    })
    val e = intercept[IllegalArgumentException](
      SchemaGuard.check("embeddings", regen))
    e.getMessage should include("embeddings.embedding")
    e.getMessage should include("array<float>")
    e.getMessage should include("regeneration")
  }

  it("rejects a re-typed doc_id and a missing column") {
    val retyped = StructType(docsSchema.map {
      case f if f.name == "doc_id" => f.copy(dataType = StringType)
      case f => f
    })
    intercept[IllegalArgumentException](
      SchemaGuard.check("documents", retyped))
      .getMessage should include("documents.doc_id")
    val dropped = StructType(docsSchema.filterNot(_.name == "n_chars"))
    intercept[IllegalArgumentException](
      SchemaGuard.check("documents", dropped))
      .getMessage should include("MISSING")
  }

  it("is a no-op for tables without baked-in physical assumptions") {
    SchemaGuard.check("events", StructType(Nil)) // EventTime owns events.ts
    SchemaGuard.check("lineitem", StructType(Nil))
  }
}
