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
