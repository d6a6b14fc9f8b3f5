package graft.ext

import org.apache.spark.sql.functions._

import graft.GraftSpec

/** Normal-equations linear probe: exact integer moments on the cluster,
  * driver-side solve recovering known systems.
  */
class QualityProbeSpec extends GraftSpec {
  import spark.implicits._

  it("solve recovers the generating weights from hand-built moments") {
    // synthetic exact-linear data: y = 7 + 2*x1 - 3*x2 + 4*x3 (integer,
    // so the Long moment sums are exact and the system is consistent)
    val rows = Seq(
      Array(1L, 2L, 1L, 4L), Array(1L, 5L, 2L, 0L), Array(1L, 1L, 7L, 2L),
      Array(1L, 8L, 3L, 6L), Array(1L, 4L, 4L, 4L), Array(1L, 9L, 0L, 1L))
    val w = Array(7L, 2L, -3L, 4L)
    def y(x: Array[Long]) = (0 until 4).map(i => w(i) * x(i)).sum
    val moments = (
      (for (i <- 0 until 4; j <- i until 4)
        yield s"m_${i}_$j" -> rows.map(r => r(i) * r(j)).sum) ++
      (0 until 4).map(i =>
        s"v_$i" -> rows.map(r => r(i) * y(r)).sum)).toMap
    val got = QualityProbe.solve(moments)
    (got zip w).foreach { case (g, e) => g shouldBe e.toDouble +- 1e-6 }
  }

  it("solve refuses a singular moment matrix") {
    // x3 duplicates x1 -> rank-deficient
    val rows = Seq(Array(1L, 2L, 1L, 2L), Array(1L, 5L, 2L, 5L),
      Array(1L, 1L, 7L, 1L), Array(1L, 8L, 3L, 8L))
    val moments = (
      (for (i <- 0 until 4; j <- i until 4)
        yield s"m_${i}_$j" -> rows.map(r => r(i) * r(j)).sum) ++
      (0 until 4).map(i => s"v_$i" -> rows.map(r => r(i) * 10L).sum)).toMap
    an[IllegalArgumentException] should be thrownBy QualityProbe.solve(moments)
  }

  it("features are integer-milli and deterministic; moments are one row " +
     "per term, consistent with a direct recomputation") {
    val docs = Seq(
      (1L, "the cat sat on the mat, happily."),
      (2L, "it is a long established fact that readers read"),
      (3L, "")).toDF("doc_id", "text")
    val f = QualityProbe.features(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select($"doc_id", $"x1", $"x2", $"x3")
      .as[(Long, Long, Long, Long)].collect()
    // doc 1: toks = the cat sat on the mat happily — 7 tokens, 24 token
    // chars, 2 stopword hits ("the" twice), 6 distinct tokens
    f(0) shouldBe ((1L, 1000L * 24 / 7, 1000L * 2 / 7, 1000L * 6 / 7))
    f(2) shouldBe ((3L, 0L, 0L, 0L)) // empty text: all-zero features
    val withY = QualityProbe.features(docs, "doc_id", "text")
      .withColumn("y", col("doc_id") * 100)
    val m = QualityProbe.moments(withY, "y")
      .as[(String, Long)].collect().toMap
    m.size shouldBe 14
    m("m_0_0") shouldBe 3L // n docs
    m("v_0") shouldBe 600L // sum of y
    // cross-term consistency against a direct per-row recomputation
    val xs = QualityProbe.features(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select($"x0", $"x1", $"x2", $"x3").as[(Long, Long, Long, Long)]
      .collect().map(t => Array(t._1, t._2, t._3, t._4))
    m("m_1_2") shouldBe xs.map(r => r(1) * r(2)).sum
    m("m_3_3") shouldBe xs.map(r => r(3) * r(3)).sum
  }

  it("end-to-end on the corpus: the moment system solves to finite " +
     "weights and the probe's predictions track the fluency target") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val y = NgramLm.fluencyReport(docs, "doc_id", "text")
      .select(col("doc_id"), col("mean_micro"))
    val xy = QualityProbe.features(docs, "doc_id", "text").join(y, "doc_id")
    val m = QualityProbe.moments(xy, "mean_micro")
      .as[(String, Long)].collect().toMap
    val w = QualityProbe.solve(m)
    all(w.toSeq.map(math.abs)) should be < 1e12
    // predictions positively correlate with the target (probe sanity)
    val corr = xy.select(corr_c(
      col("x0") * w(0) + col("x1") * w(1) + col("x2") * w(2) + col("x3") * w(3),
      col("mean_micro"))).head().getDouble(0)
    corr should be > 0.0
  }

  private def corr_c(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) = corr(a, b)

  it("milliWeights recovers exact rational weights on a hand-built " +
     "system, rounding half-up and normalizing the determinant sign") {
    // identity-ish moment matrix: M = diag(2,2,2,2), v = (1,3,2,5) ->
    // w = (0.5, 1.5, 1.0, 2.5) -> milli (500, 1500, 1000, 2500)
    val m = (for (i <- 0 until 4; j <- i until 4)
      yield s"m_${i}_$j" -> (if (i == j) 2L else 0L)).toMap ++
      Map("v_0" -> 1L, "v_1" -> 3L, "v_2" -> 2L, "v_3" -> 5L)
    QualityProbe.milliWeights(m).toSeq shouldBe Seq(500L, 1500L, 1000L, 2500L)
    // negative determinant: flip one diagonal entry's sign; w_j = v_j/m_jj
    val neg = m + ("m_1_1" -> -2L)
    QualityProbe.milliWeights(neg).toSeq shouldBe Seq(500L, -1500L, 1000L, 2500L)
    // .5 rounds UP (3/2000 of a unit below never): v0=1, m00=3 -> 1/3 ->
    // 333.33 -> 333; v0=1, m00=2 -> exactly 500; 1/1 with m00=2... use
    // w = 1/2000-grained case: M=diag(4,..), v0=2 -> 0.5 -> 500
    val half = m + ("m_0_0" -> 4L) + ("v_0" -> 2L)
    QualityProbe.milliWeights(half).head shouldBe 500L
    // singular matrix refuses
    an[IllegalArgumentException] should be thrownBy
      QualityProbe.milliWeights(m + ("m_0_0" -> 0L) + ("v_0" -> 0L))
  }

  it("milliWeights tracks the floating-point solve to within one milli " +
     "on the real corpus, and the gate keeps a sane fraction") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val y = NgramLm.fluencyReport(docs, "doc_id", "text")
      .select(col("doc_id"), col("mean_micro"))
    val xy = QualityProbe.features(docs, "doc_id", "text").join(y, "doc_id")
    val m = QualityProbe.moments(xy, "mean_micro")
      .as[(String, Long)].collect().toMap
    val exact = QualityProbe.milliWeights(m)
    val float = QualityProbe.solve(m)
    exact.indices.foreach { j =>
      math.abs(exact(j) - float(j) * 1000) should be <= 1.0
    }
    val gated = QualityProbe.gate(docs, "doc_id", "text", exact.toSeq)
    val n = gated.count()
    n shouldBe docs.count()
    val kept = gated.where(col("keep") === 1).count()
    kept should be > 0L
    kept should be < n
    // threshold semantics: keep == score >= floor(mean)
    val rows = gated.select($"score_micro", $"keep").as[(Long, Long)].collect()
    val thr = Math.floorDiv(rows.map(_._1).sum, rows.length.toLong)
    rows.foreach { case (s, kf) => kf shouldBe (if (s >= thr) 1L else 0L) }
  }
}
