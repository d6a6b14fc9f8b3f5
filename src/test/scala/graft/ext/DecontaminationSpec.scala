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
  }
}
