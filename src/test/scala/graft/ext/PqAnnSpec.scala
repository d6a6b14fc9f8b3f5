package graft.ext

import org.apache.spark.sql.functions._

import graft.GraftSpec

/** Product quantization ([[PqAnn]], dq162): deterministic per-subspace
  * codebooks, map-only encoding, the ADC contract (score == inner
  * product against the reconstructed vector), retrieval quality vs the
  * exact scan, and the parameter surface.
  */
class PqAnnSpec extends GraftSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")
  // dq162's configuration: 16 subspaces of 4 dims, 16 centroids each
  private val M = 16
  private val SubDim = 4
  private lazy val cb = PqAnn.fit(emb, "vec_id", "embedding",
    dims = 64, m = M, k = 16)

  it("fit is deterministic (bit-identical codebooks across runs), every " +
     "subspace keeps >= 1 surviving centroid, and centroids have subDim " +
     "components") {
    val cb2 = PqAnn.fit(emb, "vec_id", "embedding", 64, M, 16)
    cb.m shouldBe M
    cb.subDim shouldBe SubDim
    (0 until M).foreach { j =>
      cb.sub(j).map(_._1) shouldBe cb2.sub(j).map(_._1)
      cb.sub(j).zip(cb2.sub(j)).foreach { case ((_, a), (_, b)) =>
        a.toSeq shouldBe b.toSeq
      }
      cb.sub(j).size should be >= 1
      cb.sub(j).size should be <= 16
      cb.sub(j).foreach(_._2.length shouldBe SubDim)
    }
  }

  it("encode is MAP-ONLY — no exchange anywhere in the plan — and every " +
     "code is a surviving cell id of its subspace") {
    val codes = PqAnn.encode(emb, "vec_id", "embedding", cb)
    codes.queryExecution.executedPlan.toString should not include "Exchange"
    val rows = codes.collect()
    rows.length shouldBe emb.count()
    val valid = (0 until M).map(j => cb.sub(j).map(_._1).toSet)
    rows.foreach { r =>
      val cs = r.getSeq[Int](1)
      cs.length shouldBe M
      (0 until M).foreach(j => valid(j) should contain(cs(j)))
    }
  }

  it("encode routes by the literal budget — a 16x16 codebook (256 folds) " +
     "takes the broadcast-kernel path, and it is bit-identical to the " +
     "plan-literal path") {
    def sortedCodes() = PqAnn.encode(emb, "vec_id", "embedding", cb)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).sortBy(_._1)
    val kernel = sortedCodes() // default budget 128 < 256
    spark.conf.set(IvfIndex.LiteralMaxKConf, "512")
    try sortedCodes() shouldBe kernel
    finally spark.conf.unset(IvfIndex.LiteralMaxKConf)
  }

  it("the ADC contract: every returned score equals the inner product of " +
     "the query against the RECONSTRUCTED vector (its m sub-centroids), " +
     "summed subspace-major — bit-exactly") {
    val codes = PqAnn.encode(emb, "vec_id", "embedding", cb)
    val q = emb.filter($"vec_id" === 1L).select($"embedding")
      .as[Seq[Float]].head().toArray
    val top = PqAnn.adcTopK(codes, cb, Seq((1L, q)), topK = 10).collect()
    top.length shouldBe 10
    val codeOf = codes.collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    top.foreach { r =>
      val vid = r.getAs[Long]("vid")
      val expected = (0 until M).map { j =>
        val cent = cb.sub(j).find(_._1 == codeOf(vid)(j)).get._2
        var s = 0.0
        var i = 0
        while (i < SubDim) {
          s += q(j * SubDim + i).toDouble * cent(i)
          i += 1
        }
        s
      }.reduceLeft(_ + _)
      r.getAs[Double]("score") shouldBe expected
    }
  }

  it("retrieval quality: ADC top-10 overlaps the exact inner-product " +
     "top-10 for each of dq162's three queries, and a code row is 16x " +
     "smaller than float32") {
    val codes = PqAnn.encode(emb, "vec_id", "embedding", cb)
    val all = emb.select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect()
    val overlaps = Seq(1L, 2L, 3L).map { qid =>
      val q = all.find(_._1 == qid).get._2.toArray
      val exact = all.filter(_._1 != qid)
        .map { case (vid, v) =>
          var s = 0.0
          var i = 0
          while (i < 64) { s += q(i).toDouble * v(i).toDouble; i += 1 }
          (vid, s)
        }
        .sortBy { case (vid, s) => (-s, vid) }.take(10).map(_._1).toSet
      val adc = PqAnn.adcTopK(codes, cb, Seq((qid, q)), topK = 10)
        .select("vid").as[Long].collect().toSet
      (exact intersect adc).size
    }
    // PQ is lossy by design; measured overlaps at this SF are 5/2/4 of
    // 10 (these embeddings are near-isotropic — the hardest case for a
    // 16x compression). Floors at roughly half the measurement pin the
    // quality without flaking on a data refresh.
    overlaps.foreach(_ should be >= 1)
    overlaps.sum should be >= 6
    // memory: 16 codes (4 B in flight; ~1 B at rest under parquet
    // bit-packing — SCALE_PQ measures 20-26x under float parquet) vs
    // 64 float32s = 256 B
    (64 * 4) / cb.m shouldBe 16
  }

  it("IVF-PQ (dq163): the probed ADC equals the plain ADC restricted to " +
     "the probed cells, and the contract refusals are named") {
    val ivf = IvfIndex.fit(emb, "vec_id", "embedding", k = 8)
    try {
      val rel = PqAnn.encode(ivf.withCell(emb, "embedding"),
        "vec_id", "embedding", cb, keep = Seq("cell"))
        .localCheckpoint(true)
      val q = emb.filter($"vec_id" === 1L).select($"embedding")
        .as[Seq[Float]].head().toArray
      val realProbes = Map(1L ->
        emb.filter($"vec_id" === 1L)
          .select(ivf.probesFor($"embedding", 2, spark))
          .head().getSeq[Int](0).toSeq)
      val probed = PqAnn
        .adcTopKProbed(rel, cb, Seq((1L, q)), realProbes, topK = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._2)
      val manual = PqAnn.adcTopK(
          rel.filter($"cell".isin(realProbes(1L): _*)).select("vid", "codes"),
          cb, Seq((1L, q)), topK = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._2)
      probed shouldBe manual
      probed.length shouldBe 5
      // refusals: a code relation without the coarse cell, and a query
      // with no probe list
      intercept[IllegalArgumentException] {
        PqAnn.adcTopKProbed(rel.drop("cell"), cb, Seq((1L, q)),
          realProbes, 5)
      }.getMessage should include("'cell'")
      intercept[IllegalArgumentException] {
        PqAnn.adcTopKProbed(rel, cb, Seq((2L, q)), realProbes, 5)
      }.getMessage should include("no probe cells")
    } finally ivf.release()
  }

  it("probed ADC at ~100 queries (SCALE_PQ workload, r14 verdict #2): " +
     "bit-identical to the driver-replicated table fold, FIXED plan " +
     "expression size however many queries ride the scan, and the " +
     "scoring stage compiles under CODEGEN_ONLY") {
    val ivf = IvfIndex.fit(emb, "vec_id", "embedding", k = 8)
    try {
      val rel = PqAnn.encode(ivf.withCell(emb, "embedding"),
        "vec_id", "embedding", cb, keep = Seq("cell"))
        .localCheckpoint(true)
      val vecs = emb.orderBy("vec_id").limit(100)
        .select($"vec_id", $"embedding").as[(Long, Seq[Float])]
        .collect().map { case (id, v) => (id, v.toArray) }.toSeq
      val probeRows = emb.orderBy("vec_id").limit(100)
        .select($"vec_id", ivf.probesFor($"embedding", 2, spark))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
      def build(qs: Seq[(Long, Array[Float])]) = PqAnn.adcTopKProbed(
        rel, cb, qs, probeRows.view.filterKeys(qs.map(_._1).toSet).toMap,
        topK = 5)
      // expression size must NOT grow with the query count — the r14
      // finding was a Q-deep when-chain embedding Q·m·k literals in one
      // expression (the 64 KB codegen method trap at a few hundred
      // queries); the two-level map keys qid at runtime instead
      def exprNodes(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.optimizedPlan.collect { case p =>
          p.expressions.map(e => e.collect { case _ => 1 }.sum).sum
        }.sum
      val n3 = exprNodes(build(vecs.take(3)))
      val n100 = exprNodes(build(vecs))
      n100 should be <= (n3 + 50)
      // the scoring expressions must COMPILE (no silent interpreted
      // fallback hiding an oversized method)
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val got =
        try build(vecs).collect()
        finally spark.conf.unset("spark.sql.codegen.factoryMode")
      // bit-identity oracle: replicate scoreFor's exact fold order on
      // the driver — per-table entry a left-to-right fold over subDim,
      // the row score the subspace-ordered binary add chain
      val codeRows = rel.select($"vid", $"codes", $"cell").collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1), r.getInt(2)))
      val expected = vecs.flatMap { case (qid, q) =>
        codeRows
          .filter { case (vid, _, cell) =>
            vid != qid && probeRows(qid).contains(cell) }
          .map { case (vid, codes, _) =>
            val s = (0 until M).map { j =>
              val c = cb.sub(j).find(_._1 == codes(j)).get._2
              var t = 0.0
              var i = 0
              while (i < SubDim) {
                t += q(j * SubDim + i).toDouble * c(i); i += 1
              }
              t
            }.reduceLeft(_ + _)
            (qid, vid, s)
          }
          .sortBy { case (_, vid, s) => (-s, vid) }.take(5)
      }.toSet
      got.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet shouldBe expected
    } finally ivf.release()
  }

  it("parameter surface: dims must split evenly, k is bounded, queries " +
     "must match dims, topK >= 1") {
    intercept[IllegalArgumentException] {
      PqAnn.fit(emb, "vec_id", "embedding", 64, 5, 8)
    }.getMessage should include("evenly")
    intercept[IllegalArgumentException] {
      PqAnn.fit(emb, "vec_id", "embedding", 64, 4, 0)
    }.getMessage should include("out of range")
    intercept[IllegalArgumentException] {
      PqAnn.adcTopK(PqAnn.encode(emb, "vec_id", "embedding", cb), cb,
        Seq((1L, Array(1.0f))), 5)
    }.getMessage should include("dims")
    intercept[IllegalArgumentException] {
      PqAnn.adcTopK(PqAnn.encode(emb, "vec_id", "embedding", cb), cb,
        Seq((1L, Array.fill(64)(0.1f))), 0)
    }.getMessage should include("topK")
  }
}
