package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.GraftSpec

/** Pins every DECLARED store-relation schema (the r18 optimization: a
  * declared schema means no read of the relation ever runs a parquet
  * schema-inference job — one driver round-trip job saved per relation
  * per store) against the schema Spark would have INFERRED from the
  * written layout. A writer change that drifts a relation's shape fails
  * here instead of silently misreading the store.
  *
  * Also covers the [[StatsSidecar]] replacement of the 1-row parquet
  * `stats/` dir (2 jobs to read + 1 to write, per access/append → zero):
  * round-trip, swap overwrite, and the foreign-layout fail-fast.
  */
class StoreRelationSchemaSpec extends GraftSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-relschema-$tag")
      .toString + "/idx"

  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "one two three four five six seven eight nine ten"),
    (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    .toDF("doc_id", "text")

  private def inferred(paths: Seq[String],
      basePath: Option[String] = None): StructType = {
    val r = spark.read
    basePath.foreach(b => r.option("basePath", b))
    r.parquet(paths: _*).schema
  }

  it("SubstrIndex.digestsSchema matches the written layout") {
    val path = tmp("ss")
    SubstrIndex.build(docs, "doc_id", "text", path, k = 4)
    inferred(Seq(s"$path/digests/append=a000001")) shouldBe
      SubstrIndex.digestsSchema
  }

  it("NgramLmStore.countsSchema matches the written layout " +
     "(incl. discovered partition columns, in inference order)") {
    val path = tmp("lm")
    NgramLmStore.build(docs, "doc_id", "text", path)
    inferred(Seq(s"$path/counts/append=a000001"),
      basePath = Some(s"$path/counts")) shouldBe NgramLmStore.countsSchema
  }

  it("QualityProbeStore.momentsSchema matches the written layout") {
    val path = tmp("qp")
    QualityProbeStore.create(docs, "doc_id", "text", path)
    inferred(Seq(s"$path/moments/append=a000001")) shouldBe
      QualityProbeStore.momentsSchema
  }

  it("NearDupIndex write-side seeded schemas match inference " +
     "(digests, bands, counts)") {
    val path = tmp("nd")
    NearDupIndex.build(docs, "doc_id", "text", path)
    // the seed registered at write time must equal what a foreign-JVM
    // reader would infer — read each relation through RelRead (seeded)
    // and through bare inference, and compare
    for (rel <- Seq("digests", "bands", "counts")) {
      val seeded = RelRead.read(spark, s"$path#$rel",
        Seq(s"$path/$rel/append=a000001")).schema
      inferred(Seq(s"$path/$rel/append=a000001")) shouldBe seeded
    }
  }

  it("media index write-side seeded schemas match inference") {
    val media = docs.select(col("doc_id"),
      concat((0 to 7).map(j =>
        md5(concat_ws(":", lit("mb"), col("doc_id"), lit(j)))): _*)
        .cast("binary").as("payload"))
    val dg = tmp("md"); val sg = tmp("msig"); val cd = tmp("mcdc")
    MediaDigestIndex.build(media, "doc_id", "payload", dg)
    MediaSigIndex.build(media, "doc_id", "payload", sg)
    MediaCdcIndex.build(media, "doc_id", "payload", cd)
    for ((path, rel) <- Seq((dg, "digests"), (sg, "sigs"), (cd, "chunks"))) {
      val seeded = RelRead.read(spark, s"$path#$rel",
        Seq(s"$path/$rel/append=a000001")).schema
      inferred(Seq(s"$path/$rel/append=a000001")) shouldBe seeded
    }
  }

  it("StatsSidecar round-trips, overwrites, and fails fast on a " +
     "foreign layout") {
    val path = tmp("kv")
    StatsSidecar.write(spark, path, Seq("a" -> "1", "b" -> "x=y"))
    StatsSidecar.read(spark, path) shouldBe Map("a" -> "1", "b" -> "x=y")
    StatsSidecar.write(spark, path, Seq("a" -> "2"))
    StatsSidecar.read(spark, path) shouldBe Map("a" -> "2")
    an[IllegalArgumentException] should be thrownBy
      StatsSidecar.read(spark, tmp("kv-missing"))
  }

  it("stats survive store reopen (sidecar is the stats of record)") {
    val path = tmp("reopen")
    val st = SubstrIndex.build(docs, "doc_id", "text", path, k = 4).stats
    SubstrIndex.open(spark, path).stats shouldBe st
    st.k shouldBe 4
    st.digests should be > 0L
  }
}
