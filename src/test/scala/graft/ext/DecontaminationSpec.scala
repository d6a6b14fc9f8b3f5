package graft.ext

import graft.GraftSpec

/** Benchmark decontamination: n-gram identity, shared-gram counting, and
  * the anti-join survivor set.
  */
class DecontaminationSpec extends GraftSpec {
  import spark.implicits._

  describe("Decontamination") {
    it("wordNgrams: distinct space-joined grams; short docs yield none") {
      val got = Seq("A b c d b c d").toDF("t")
        .select(Decontamination.wordNgrams($"t", 3)).as[Seq[String]].head()
      got.sorted shouldBe Seq("a b c", "b c d", "c d b", "d b c")
      Seq("one two").toDF("t")
        .select(Decontamination.wordNgrams($"t", 3)).as[Seq[String]]
        .head() shouldBe Seq.empty
    }

    it("contaminationReport counts distinct shared grams; decontaminate " +
       "keeps exactly the clean docs") {
      val train = Seq(
        (1L, "alpha beta gamma delta"), // shares 'beta gamma', 'gamma delta'
        (2L, "epsilon zeta eta theta"), // no overlap
        (3L, "beta gamma beta gamma")   // shares 'beta gamma' (once, distinct)
      ).toDF("doc_id", "text")
      val evalSet = Seq((100L, "beta gamma delta")).toDF("doc_id", "text")

      val report = Decontamination
        .contaminationReport(train, evalSet, "doc_id", "text", n = 2)
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      report shouldBe Seq((1L, 2L), (3L, 1L))

      Decontamination.decontaminate(train, evalSet, "doc_id", "text", n = 2)
        .select("doc_id").as[Long].collect().toSeq shouldBe Seq(2L)
    }

    it("semanticReport flags cosine-near vectors against the whole eval " +
       "set; semanticDecontaminate keeps the rest") {
      val train = Seq(
        (1L, Seq(1f, 0f, 0f, 0f)),       // = eval 100 (cos 1.0)
        (2L, Seq(0.9f, 0.1f, 0f, 0f)),   // near eval 100
        (3L, Seq(0f, 0f, 1f, 0f)),       // orthogonal to both
        (4L, Seq(0.7f, 0.7f, 0f, 0f))    // near BOTH eval vectors
      ).toDF("vec_id", "embedding")
      val evalSet = Seq(
        (100L, Seq(1f, 0f, 0f, 0f)),
        (101L, Seq(0f, 1f, 0f, 0f))
      ).toDF("vec_id", "embedding")

      val report = Decontamination
        .semanticReport(train, evalSet, "vec_id", "embedding", threshold = 0.9)
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      report.map(r => (r._1, r._2)) shouldBe Seq((1L, 1L), (2L, 1L)) // not 3, not 4
      report.head._3 shouldBe 1.0 +- 1e-9

      // vec 4 hits both eval vectors at a looser threshold
      Decontamination
        .semanticReport(train, evalSet, "vec_id", "embedding", threshold = 0.6)
        .filter($"vec_id" === 4L).as[(Long, Long, Double)].collect()
        .head._2 shouldBe 2L

      Decontamination
        .semanticDecontaminate(train, evalSet, "vec_id", "embedding", 0.9)
        .select("vec_id").as[Long].collect().sorted.toSeq shouldBe Seq(3L, 4L)
    }
  }
}
