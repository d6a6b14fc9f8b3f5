package graft.ext

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Salted join: identical result set to the plain join, salt spread real. */
class SaltedJoinSpec extends GraftSpec {
  import spark.implicits._

  it("matches the plain join exactly on a skewed fact table") {
    // 90% of fact rows share one hot key
    val fact = (1L to 2000L)
      .map(i => (i, if (i % 10 == 0) i % 7 else 3L))
      .toDF("row_id", "key")
    val dim = Seq((0L, "a"), (1L, "b"), (3L, "hot"), (6L, "c")).toDF("dim_key", "name")

    val plain = fact.join(dim, $"key" === $"dim_key")
      .select("row_id", "key", "dim_key", "name")
    val salted = SaltedJoin.inner(fact, dim, "key", "dim_key", saltBuckets = 8)
      .select("row_id", "key", "dim_key", "name")

    salted.count() shouldBe plain.count()
    salted.exceptAll(plain).count() shouldBe 0
    plain.exceptAll(salted).count() shouldBe 0
  }

  it("spreads a hot key over multiple salt buckets") {
    val fact = (1L to 1000L).map(i => (i, 42L)).toDF("row_id", "key")
    val buckets = fact
      .withColumn("__salt", pmod(hash(fact.columns.map(col).toIndexedSeq: _*), lit(8)))
      .select("__salt").distinct().count()
    buckets should be > 4L // hash salt actually fans out
  }

  it("matches on real tables (orders ⋈ customer)") {
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val plain = o.join(c, $"o_custkey" === $"c_custkey").count()
    SaltedJoin.inner(o, c, "o_custkey", "c_custkey").count() shouldBe plain
  }
}
