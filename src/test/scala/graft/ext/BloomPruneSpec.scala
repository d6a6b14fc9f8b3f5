package graft.ext

import graft.GraftSpec

/** Bloom-filter join pruning: no false negatives, real reduction. */
class BloomPruneSpec extends GraftSpec {
  import spark.implicits._

  it("keeps every true match and prunes most non-matches") {
    val fact = (1L to 10000L).map(i => (i, i % 100)).toDF("row_id", "key")
    val dim = Seq(1L, 2L, 3L).toDF("dim_key") // 3% of key space

    val f = BloomPrune.buildFilter(dim, "dim_key", expectedItems = 3, fpp = 0.01)
    val pruned = BloomPrune.prune(fact, "key", f)

    val trueMatches = fact.filter($"key".isin(1L, 2L, 3L)).count()
    val prunedCount = pruned.count()
    prunedCount should be >= trueMatches              // no false negatives
    prunedCount should be < fact.count() / 2          // real pruning happened

    val joined = BloomPrune.prunedJoin(fact, dim, "key", "dim_key", 3)
    joined.count() shouldBe trueMatches
  }

  it("split partitions by membership: the complement is provably unseen " +
     "and the two halves reassemble the input") {
    val fact = (1L to 5000L).map(i => (i, i % 50)).toDF("row_id", "key")
    val dim = Seq(7L, 8L).toDF("dim_key")
    val f = BloomPrune.buildFilter(dim, "dim_key", expectedItems = 2)
    val (maybe, definitelyNot) = BloomPrune.split(fact, "key", f)
    maybe.count() + definitelyNot.count() shouldBe fact.count()
    // no false negatives: every true match is on the maybe side
    definitelyNot.filter($"key".isin(7L, 8L)).count() shouldBe 0L
    maybe.filter($"key".isin(7L, 8L)).count() shouldBe
      fact.filter($"key".isin(7L, 8L)).count()
  }

  it("keepUnseen drops replayed content and keeps revised content " +
     "(incremental-ingest dedup)") {
    val history = Seq((1L, "alpha beta"), (2L, "gamma delta"), (3L, "epsilon"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "alpha  BETA "),  // canonicalizes to a seen fingerprint → dropped
      (11L, "gamma delta v2"),// revised → kept
      (12L, "zeta")           // brand new → kept
    ).toDF("doc_id", "text")
    Dedup.keepUnseen(incoming, history, "text")
      .select("doc_id").as[Long].collect().sorted shouldBe Array(11L, 12L)
    // a caller-supplied sizing estimate (the 100 TB path: statistics, not a
    // count pass) — identical result, even badly overestimated
    Dedup.keepUnseen(incoming, history, "text", expectedItems = Some(1000000L))
      .select("doc_id").as[Long].collect().sorted shouldBe Array(11L, 12L)
  }

  it("matches the plain join result exactly on real tables") {
    val dir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val hotCustomers = spark.read.parquet(s"$dir/customer.parquet")
      .filter($"c_acctbal" > 9000).select("c_custkey")

    val plain = orders.join(hotCustomers, $"o_custkey" === $"c_custkey").count()
    BloomPrune.prunedJoin(orders, hotCustomers, "o_custkey", "c_custkey",
      expectedItems = 200).count() shouldBe plain
  }

  it("probes string keys natively — no silent empty result") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val dim = docs.select("source").distinct().limit(1)
      .withColumnRenamed("source", "dim_source")
    val plain = docs.join(dim, $"source" === $"dim_source").count()
    plain should be > 0L
    BloomPrune.prunedJoin(docs, dim, "source", "dim_source",
      expectedItems = 4).count() shouldBe plain
  }

  it("rejects unsupported key types up front instead of filtering everything") {
    val f = BloomPrune.buildFilter(Seq(1L).toDF("k"), "k", 1)
    val doubles = Seq(1.5).toDF("d")
    an[IllegalArgumentException] should be thrownBy
      BloomPrune.prune(doubles, "d", f)
  }
}
