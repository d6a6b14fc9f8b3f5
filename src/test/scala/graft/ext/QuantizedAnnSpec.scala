package graft.ext

import org.apache.spark.sql.functions._

import graft.GraftSpec

/** Int8 scalar quantization: clamping, portable rounding, integer scoring. */
class QuantizedAnnSpec extends GraftSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

  it("quantize rounds half-up and clamps to [-scale, scale]") {
    // scale=2 keeps every product exactly representable: 0.25·2 = 0.5
    val vals = Seq((1L, Array(0.0f, 0.25f, -0.25f, 1.0f, -1.0f, 3.0f, -3.0f)))
      .toDF("id", "v")
      .select(QuantizedAnn.quantize(col("v"), scale = 2).as("q"))
      .as[Seq[Long]].head()
    // 0.5 rounds up to 1; -0.5 → floor(-0.5+0.5) = 0 (half-UP, toward +inf —
    // the documented portable rule, not half-away-from-zero)
    vals shouldBe Seq(0L, 1L, 0L, 2L, -2L, 2L, -2L)
  }

  it("intDot is an exact integer dot product") {
    val d = Seq((Array(1L, -2L, 3L), Array(4L, 5L, -6L))).toDF("a", "b")
      .select(QuantizedAnn.intDot(col("a"), col("b")).as("d"))
      .as[Long].head()
    d shouldBe (4 - 10 - 18)
  }

  it("all three kernels are bit-identical to the HOF spec on every corpus " +
     "pair (kernel swaps can't drift the oracle)") {
    val q1 = emb.filter(col("vec_id") === 1L)
      .select(col("embedding").as("qv"), lit(1).as("j"))
    val both = emb.limit(200).withColumn("j", lit(1)).join(q1, "j")
      .select(
        QuantizedAnn.intDot(QuantizedAnn.quantize(col("qv")),
          QuantizedAnn.quantize(col("embedding"))).as("hof"),
        graft.functions.QuantizedDot(col("qv"), col("embedding"), 127).as("fused"),
        graft.functions.LongDot(QuantizedAnn.quantize(col("qv")),
          QuantizedAnn.quantize(col("embedding"))).as("longdot"),
        graft.functions.ByteDot(QuantizedAnn.quantizePacked(col("qv")),
          QuantizedAnn.quantizePacked(col("embedding"))).as("bytedot"))
      .as[(Long, Long, Long, Long)].collect()
    both should not be empty
    both.foreach { case (hof, fused, ld, bd) =>
      fused shouldBe hof
      ld shouldBe hof
      bd shouldBe hof
    }
  }

  it("topK ranks every query in one frame with deterministic ties") {
    val top = QuantizedAnn.topK(emb, "vec_id", "embedding", Seq(1L, 2L), k = 3)
      .orderBy("qid", "rnk")
      .select("qid", "vid", "score", "rnk")
      .as[(Long, Long, Long, Int)].collect()
    top should have length 6
    top.map(_._1).distinct shouldBe Array(1L, 2L)
    // scores descend within each query; no self-matches
    top.grouped(3).foreach { g =>
      g.map(_._3).toSeq shouldBe g.map(_._3).sortBy(-_).toSeq
      g.foreach { case (qid, vid, _, _) => vid should not be qid }
    }
  }

  it("quantized ranking tracks float cosine ranking (recall sanity)") {
    val quantTop = QuantizedAnn.topK(emb, "vec_id", "embedding", Seq(1L), k = 10)
      .select("vid").as[Long].collect().toSet
    val floatTop = Ann.bruteForceTopK(emb, "vec_id", "embedding", 1L, 10)
      .select("vec_id").as[Long].collect().toSet
    // int8 inner product vs float cosine: expect substantial overlap on
    // 64-dim vectors (norms are near-uniform in this corpus)
    (quantTop intersect floatTop).size should be >= 5
  }
}
