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

  it("lossless on RANDOM set families across random thresholds (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genRow = for {
      grp <- Gen.chooseNum(0, 2)
      n <- Gen.chooseNum(1, 12)
      elems <- Gen.listOfN(n, Gen.chooseNum(0, 30))
    } yield (grp.toString, elems.distinct.sorted)
    (0 until 5).foreach { round =>
      val rows = Gen.listOfN(40, genRow)
        .apply(Gen.Parameters.default, Seed(101L + round)).get
        .zipWithIndex.map { case ((g, es), i) => (i.toLong, g, es) }
      val df = rows.toDF("id", "grp", "sh")
      val t = Seq(0.2, 0.5, 0.7)(round % 3)
      val got = AllPairs.jaccardPairs(df, "id", "sh", Seq("grp"), t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      // driver-side brute force over the same rows
      val want = (for {
        (a, ga, sa) <- rows; (b, gb, sb) <- rows
        if ga == gb && a < b && sa.nonEmpty && sb.nonEmpty
        inter = sa.toSet.intersect(sb.toSet).size.toDouble
        jac = inter / (sa.size + sb.size - inter)
        if jac > t
      } yield (a, b)).toSet
      got shouldBe want
    }
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
