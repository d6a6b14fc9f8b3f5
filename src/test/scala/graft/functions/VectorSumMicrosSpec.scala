package graft.functions

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Custom vector-sum aggregate: correctness, partial-agg invariance, nulls. */
class VectorSumMicrosSpec extends GraftSpec {
  import spark.implicits._

  it("sums elementwise in micro-units") {
    val df = Seq(
      (1, Seq(1.5f, -2.25f)),
      (1, Seq(0.5f, 0.25f)),
      (2, Seq(10f, 20f))).toDF("k", "v")
    val got = df.groupBy("k").agg(VectorSumMicros.of($"v").as("s"))
      .orderBy("k").as[(Int, Seq[Long])].collect()
    got shouldBe Array(
      (1, Seq(2000000L, -2000000L)), // floor(-2.25e6) = -2250000, +250000
      (2, Seq(10000000L, 20000000L)))
  }

  it("is invariant to partitioning (associative integer accumulation)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def sums(df: org.apache.spark.sql.DataFrame) =
      df.agg(VectorSumMicros.of(col("embedding"))).as[Seq[Long]].head()
    sums(e) shouldBe sums(e.repartition(13))
  }

  it("handles empty groups, null vectors, and length growth") {
    val df = Seq(
      (1, Some(Seq(1.0f))),
      (1, None),
      (1, Some(Seq(1.0f, 2.0f)))).toDF("k", "v")
    df.groupBy("k").agg(VectorSumMicros.of($"v").as("s"))
      .as[(Int, Seq[Long])].head()._2 shouldBe Seq(2000000L, 2000000L)
  }

  it("matches the posexplode formulation it replaces") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val viaAgg = e.agg(VectorSumMicros.of(col("embedding")).as("s"))
      .select(posexplode(col("s"))).as[(Int, Long)].collect().toMap
    val viaExplode = e.select(posexplode(col("embedding")))
      .groupBy("pos")
      .agg(sum(floor(col("col").cast("double") * 1000000).cast("long")))
      .as[(Int, Long)].collect().toMap
    viaAgg shouldBe viaExplode
  }
}
