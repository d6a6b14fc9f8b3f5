package graft.ext

import org.apache.spark.sql.functions._

import graft.GraftSpec

/** EXT near-dup / similarity operators: MinHash+LSH, SimHash, sign-bucket ANN. */
class NearDupSpec extends GraftSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and runs far away home"),
    (2L, "the quick brown fox jumps over the lazy dog and runs far away house"), // near-dup of 1
    (3L, "completely different content about spark catalyst optimizer internals"),
    (4L, "short text")
  ).toDF("doc_id", "text")

  describe("MinHashLSH") {
    it("shingles are distinct token 3-grams") {
      Seq("a b c d").toDF("t").select(MinHashLSH.shingles($"t")).as[Seq[String]]
        .head() should contain theSameElementsAs Seq("a b c", "b c d")
    }
    it("finds the planted near-dup pair and nothing else") {
      val pairs = MinHashLSH.nearDupPairs(docs, "doc_id", "text", 16, 4, 0.5)
        .select("doc_a", "doc_b").as[(Long, Long)].collect()
      pairs shouldBe Array((1L, 2L))
    }
    it("jaccard of identical sets is 1") {
      Seq((Seq("a", "b"), Seq("b", "a"))).toDF("x", "y")
        .select(MinHashLSH.jaccard($"x", $"y")).as[Double].head() shouldBe 1d
    }
    it("incremental gate: near-replays of history drop, revisions and " +
       "novel docs keep; pairs name the history doc") {
      val history = docs
      val incoming = Seq(
        (10L, "the quick brown fox jumps over the lazy dog and runs far away home tail"), // near-replay of 1
        (11L, "entirely new material on bloom filters and banded lsh indexes today"),     // novel
        (12L, "tiny")                                                                     // < 3 tokens: no signature, kept
      ).toDF("doc_id", "text")
      val pairs = MinHashLSH.nearDupPairsVsHistory(incoming, history,
        "doc_id", "text", threshold = 0.5)
        .select("doc_inc", "doc_hist").as[(Long, Long)].collect().toSet
      pairs shouldBe Set((10L, 1L), (10L, 2L))
      MinHashLSH.keepUnseenNear(incoming, history, "doc_id", "text",
        threshold = 0.5)
        .select("doc_id").as[Long].collect().sorted shouldBe Array(11L, 12L)
      // a caller-supplied index-size estimate changes nothing (Bloom split
      // is semantics-free)
      MinHashLSH.keepUnseenNear(incoming, history, "doc_id", "text",
        threshold = 0.5, expectedBandKeys = Some(100000L))
        .select("doc_id").as[Long].collect().sorted shouldBe Array(11L, 12L)
    }
    it("bandIndex is the persistable (doc_id, b, bkey) relation nearDupPairs buckets on") {
      val idx = MinHashLSH.bandIndex(docs, "doc_id", "text", 16, 4)
      idx.columns.toSeq shouldBe Seq("doc_id", "b", "bkey")
      idx.count() shouldBe 3 * 4 // doc 4 has < 3 tokens → no signature
      // near-dups 1 and 2 share at least one band bucket
      idx.as[(Long, Int, String)].collect()
        .groupBy(r => (r._2, r._3)).values
        .exists(g => g.map(_._1).toSet == Set(1L, 2L)) shouldBe true
    }
  }

  describe("SimHash") {
    it("identical docs → identical bits; near-dups → small hamming") {
      val bits = SimHash.simhashBits(docs, "doc_id", "text", 64)
      bits.count() shouldBe 4
      val pairs = SimHash.nearDupPairs(docs, "doc_id", "text", 64, 4, 16)
        .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)].collect()
      pairs.map(p => (p._1, p._2)) should contain((1L, 2L))
      val h12 = pairs.find(p => p._1 == 1L && p._2 == 2L).get._3
      h12 should be <= 8
    }
    it("hamming is elementwise") {
      Seq((Seq(1, 0, 1), Seq(1, 1, 0))).toDF("a", "b")
        .select(SimHash.hamming($"a", $"b")).as[Int].head() shouldBe 2
    }
  }

  describe("Ann") {
    val vecs = Seq(
      (1L, Seq(1f, 1f, 1f, 1f, 0.5f)),
      (2L, Seq(0.9f, 1f, 1f, 1f, 0.4f)),  // same bucket as 1, similar
      (3L, Seq(-1f, -1f, -1f, -1f, 0f)),  // different bucket
      (4L, Seq(1f, 1f, 1f, 1f, -3f))      // same bucket as 1, less similar
    ).toDF("vec_id", "embedding")

    it("signBucket packs sign bits of leading dims") {
      vecs.select($"vec_id", Ann.signBucket($"embedding", 4).as("b"))
        .as[(Long, Int)].collect().toMap shouldBe Map(1L -> 15, 2L -> 15, 3L -> 0, 4L -> 15)
    }
    it("bruteForceTopK ranks by cosine") {
      Ann.bruteForceTopK(vecs, "vec_id", "embedding", 1L, 2)
        .select("vec_id").as[Long].collect() shouldBe Array(2L, 4L)
    }
    it("nearDupPairs only compares within buckets") {
      val pairs = Ann.nearDupPairs(vecs, "vec_id", "embedding", 4, 0.9)
        .select("vec_a", "vec_b").as[(Long, Long)].collect()
      pairs should contain((1L, 2L))
      pairs.flatMap(p => Seq(p._1, p._2)) should not contain 3L
    }
    it("probeBuckets yields the cell and its hamming-1 neighbors") {
      Seq(5).toDF("b").select(Ann.probeBuckets($"b", 4)).as[Seq[Int]]
        .head() shouldBe Seq(5, 4, 7, 1, 13)
    }
    it("annTopKMultiProbe finds cross-bucket neighbors annTopK misses") {
      // vec 5 sits just across the dim-1 sign boundary from vec 1
      val v = vecs.union(Seq((5L, Seq(-0.01f, 1f, 1f, 1f, 0.5f))).toDF("vec_id", "embedding"))
      val single = Ann.annTopK(v, "vec_id", "embedding", Seq(1L), 4, 4)
        .select("vid").as[Long].collect()
      single should not contain 5L // bucket 7, not probed by single-cell
      val multi = Ann.annTopKMultiProbe(v, "vec_id", "embedding", Seq(1L), 4, 4)
        .select("vid").as[Long].collect()
      multi should contain(5L)
    }
    it("annTopK probes the query's own cell") {
      val top = Ann.annTopK(vecs, "vec_id", "embedding", Seq(1L), 2, 4)
        .select("vid", "rnk").as[(Long, Int)].collect()
      top shouldBe Array((2L, 1), (4L, 2))
    }
  }
}
