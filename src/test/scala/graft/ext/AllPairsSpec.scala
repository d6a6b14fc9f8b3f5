package graft.ext

import org.apache.spark.sql.functions._

import graft.GraftSpec

/** Prefix-filtered set-similarity join: losslessness vs brute force and the
  * candidate-space bound that makes it the scale path for q21.
  */
class AllPairsSpec extends GraftSpec {
  import spark.implicits._

  private lazy val sets = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("source"),
      sort_array(TextAnalysis.packedCharShingles(col("text"), 4)).as("sh"))
    .cache()

  private def brutePairs(threshold: Double): Set[(Long, Long)] = {
    val a = sets.as("a"); val b = sets.as("b")
    a.join(b, col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        MinHashLSH.jaccardSorted(col("a.sh"), col("b.sh")).as("jac"))
      .filter(col("jac") > threshold)
      .select("a.doc_id", "b.doc_id").as[(Long, Long)].collect().toSet
  }

  it("prefix filtering is LOSSLESS: verified pairs equal brute force") {
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val pref = AllPairs.jaccardPairs(sets, "doc_id", "sh", Seq("source"), t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      pref shouldBe brutePairs(t)
    }
  }

  it("candidates are a strict subset of the quadratic pair space") {
    val groups = sets.groupBy("source").count().as[(String, Long)].collect()
    val allPairs = groups.map { case (_, n) => n * (n - 1) / 2 }.sum
    val cand = AllPairs.candidatePairs(sets, "doc_id", "sh", Seq("source"), 0.5).count()
    cand should be < allPairs
    cand should be >= AllPairs.jaccardPairs(sets, "doc_id", "sh", Seq("source"), 0.5).count()
  }

  it("adaptive split equals brute force at EVERY cap, and small-group " +
     "candidates are bounded by cap × docs") {
    val brute = brutePairs(0.5)
    for (cap <- Seq(0, 10, 1000000)) { // all-prefix, mixed, all-brute
      AllPairs.jaccardPairsAdaptive(sets, "doc_id", "sh", Seq("source"), 0.5, cap)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet shouldBe brute
    }
    // structural bound on the brute branch's pair space
    val cap = 10
    val docs = sets.count()
    val groups = sets.groupBy("source").count().as[(String, Long)].collect()
    val smallPairs = groups.collect { case (_, n) if n <= cap => n * (n - 1) / 2 }.sum
    smallPairs should be <= cap * docs
  }

  it("works ungrouped (global similarity join)") {
    val global = AllPairs.jaccardPairs(sets, "doc_id", "sh", Nil, 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val a = sets.as("a"); val b = sets.as("b")
    val brute = a.join(b, col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        MinHashLSH.jaccardSorted(col("a.sh"), col("b.sh")).as("jac"))
      .filter(col("jac") > 0.9)
      .select("a.doc_id", "b.doc_id").as[(Long, Long)].collect().toSet
    global shouldBe brute
  }
}
