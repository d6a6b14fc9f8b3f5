package graft.ext

import graft.GraftSpec

/** Winnowing fingerprints: the SIGMOD'03 guarantee (shared substrings of
  * length ≥ k+w−1 always share a fingerprint), short-document edge, and
  * pair detection with the frequency cap.
  */
class WinnowSpec extends GraftSpec {
  import spark.implicits._

  private val (k, w) = (16, 8)

  it("documents shorter than k yield no fingerprints") {
    Winnow.fingerprints(Seq((1L, "short text")).toDF("doc_id", "text"),
      "doc_id", "text", k, w).count() shouldBe 0
  }

  it("winnowing guarantee: any shared substring of length >= k+w-1 " +
     "produces at least one shared fingerprint") {
    val rnd = new scala.util.Random(11)
    def randText(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    // 20 trials: plant the same (k+w-1)-char passage inside two otherwise
    // random documents at random offsets
    val trials = (1 to 20).map { i =>
      val passage = randText(k + w - 1)
      val a = randText(rnd.nextInt(60)) + passage + randText(rnd.nextInt(60))
      val b = randText(rnd.nextInt(60)) + passage + randText(rnd.nextInt(60))
      (i, a, b)
    }
    val docs = trials.flatMap { case (i, a, b) =>
      Seq((i * 2L, i, a), (i * 2L + 1, i, b))
    }.toDF("doc_id", "trial", "text")
    val fps = Winnow.fingerprints(docs, "doc_id", "text", k, w)
    val shared = fps.join(docs.select($"doc_id", $"trial"), "doc_id")
      .groupBy("trial", "fp").count()
      .filter($"count" >= 2) // both docs of the trial hold it
      .select("trial").distinct().count()
    shared shouldBe trials.size.toLong
  }

  it("property: the rolling-hash kernel equals the per-position Column " +
     "spec formulation on random strings (values AND per-doc sets)") {
    val rnd = new scala.util.Random(3)
    val docs = ((1 to 60).map { i =>
      val n = rnd.nextInt(120) // includes < k and < k+w-1 lengths
      (i.toLong, (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    } :+ (999L, "")).toDF("doc_id", "text")
    val kernel = Winnow.fingerprints(docs, "doc_id", "text", k, w)
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (d, r) => (d, r.map(_._2).toSet) }
    val spec = Winnow.fingerprintsSpec(docs, "doc_id", "text", k, w)
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (d, r) => (d, r.map(_._2).toSet) }
    kernel shouldBe spec
  }

  it("sharedFingerprintPairs finds planted passages and the frequency cap " +
     "drops boilerplate fingerprints") {
    val passage = "the exact same lifted paragraph of text here"
    val docs = Seq(
      (1L, s"alpha prefix $passage and a suffix"),
      (2L, s"totally different opening $passage closing words"),
      (3L, "unrelated content with nothing shared at all here"),
      (4L, "another independent document of plain filler text")
    ).toDF("doc_id", "text")
    val pairs = Winnow.sharedFingerprintPairs(docs, "doc_id", "text",
      k, w, minShared = 3, maxFpFreq = 100)
      .as[(Long, Long, Long)].collect().toSeq
    pairs.map(p => (p._1, p._2)) shouldBe Seq((1L, 2L))

    // cap: the same fps in EVERY doc → over-frequency → no pairs at cap 2
    val boiler = Seq.tabulate(4)(i => (i.toLong, s"$passage $passage"))
      .toDF("doc_id", "text")
    Winnow.sharedFingerprintPairs(boiler, "doc_id", "text",
      k, w, minShared = 1, maxFpFreq = 2).count() shouldBe 0
  }
}
