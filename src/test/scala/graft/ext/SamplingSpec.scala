package graft.ext

import graft.GraftSpec

/** Hash-gate sampling: layout-independent membership, fractions, splits. */
class SamplingSpec extends GraftSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

  it("keeps approximately the requested fraction") {
    val n = docs.count().toDouble
    val kept = Sampling.byKeyHash(docs, "doc_id", 0.3).count().toDouble
    kept / n shouldBe 0.3 +- 0.1
  }

  it("membership is a pure function of the key — layout independent") {
    val a = Sampling.byKeyHash(docs, "doc_id", 0.5)
      .select("doc_id").as[Long].collect().sorted
    val b = Sampling.byKeyHash(docs.repartition(7), "doc_id", 0.5)
      .select("doc_id").as[Long].collect().sorted
    b shouldBe a
    // different seed → different sample
    val c = Sampling.byKeyHash(docs, "doc_id", 0.5, seed = 7L)
      .select("doc_id").as[Long].collect().sorted
    c should not be a
  }

  it("stratified fractions apply per stratum; unlisted strata drop") {
    val sources = docs.select("source").distinct().as[String].collect().sorted
    val s0 = sources.head
    val fr = Map(s0 -> 1.0) // keep all of one stratum, drop the rest
    val kept = Sampling.stratifiedByKeyHash(docs, "source", "doc_id", fr)
    kept.count() shouldBe docs.filter($"source" === s0).count()
  }

  it("stratifiedPortable mixes sources by rate through the md5 gate — " +
     "layout independent, full-rate strata intact, unlisted strata dropped") {
    val sources = docs.select("source").distinct().as[String].collect().sorted
    val (keepAll, half) = (sources.head, sources(1))
    val fr = Map(keepAll -> 1.0, half -> 0.5)
    val kept = Sampling.stratifiedPortable(docs, "source", "doc_id", fr)
    kept.filter($"source" === keepAll).count() shouldBe
      docs.filter($"source" === keepAll).count()
    val halfKept = kept.filter($"source" === half).count().toDouble
    val halfAll = docs.filter($"source" === half).count().toDouble
    halfKept / halfAll shouldBe 0.5 +- 0.25
    kept.filter(!$"source".isin(keepAll, half)).count() shouldBe 0
    // layout independence: same membership after a repartition
    val again = Sampling.stratifiedPortable(docs.repartition(7), "source", "doc_id", fr)
      .select("doc_id").as[Long].collect().sorted
    again shouldBe kept.select("doc_id").as[Long].collect().sorted
  }

  it("split is a disjoint, exhaustive partition of the keys") {
    val (tr, va, te) = Sampling.split(docs, "doc_id", 0.7, 0.2)
    val n = docs.count()
    tr.count() + va.count() + te.count() shouldBe n
    tr.join(va, "doc_id").count() shouldBe 0
    tr.join(te, "doc_id").count() shouldBe 0
    va.join(te, "doc_id").count() shouldBe 0
    tr.count().toDouble / n shouldBe 0.7 +- 0.1
  }

  it("epochShuffleKey: each epoch is a full deterministic permutation, " +
      "and different epochs decorrelate") {
    import org.apache.spark.sql.functions.col
    def order(epoch: Int): Seq[Long] = docs
      .select(col("doc_id"), Sampling.epochShuffleKey(col("doc_id"), epoch).as("k"))
      .orderBy("k").select("doc_id").as[Long].collect().toSeq
    val e1 = order(1)
    e1 shouldBe order(1)                        // reproducible
    e1.sorted shouldBe order(2).sorted          // same elements...
    e1 should not be order(2)                   // ...different order
  }

  it("tokenBudgetPortable keeps per stratum the maximal hash-ordered " +
     "prefix fitting the budget — matching a hand-derived naive window") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, "a", "one two three"),          // 3 tokens
      (2L, "a", "four five"),              // 2
      (3L, "a", "six seven eight nine"),   // 4
      (4L, "b", "ten"),                    // 1
      (5L, "b", "eleven twelve"))          // 2
      .toDF("doc_id", "source", "text")
    // naive derivation in-test: portable order, running sum, budget cut
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val naive = Seq((1L, "a", 3L), (2L, "a", 2L), (3L, "a", 4L),
      (4L, "b", 1L), (5L, "b", 2L))
      .map { case (id, src, nt) => (src, md5hex(s"$id:42"), id, nt) }
      .groupBy(_._1).flatMap { case (src, rows) =>
        val budget = if (src == "a") 5L else 10L
        var cum = 0L
        rows.sortBy(r => (r._2, r._3)).flatMap { case (_, _, id, nt) =>
          cum += nt
          if (cum <= budget) Some(id) else None
        }
      }.toSeq.sorted
    val got = Sampling.tokenBudgetPortable(df, "source", "doc_id", "text",
        Map("a" -> 5L, "b" -> 10L))
      .select("doc_id").as[Long].collect().sorted.toSeq
    got shouldBe naive
    // stratum "b" fits whole (3 <= 10); "a" is cut at its budget
    got.count(Seq(4L, 5L).contains) shouldBe 2
    // strata missing from the budgets map are dropped
    Sampling.tokenBudgetPortable(df, "source", "doc_id", "text",
      Map("a" -> 100L)).select("source").distinct().as[String]
      .collect() shouldBe Array("a")
  }

  it("tokenBudgetPortable's two-phase form equals the naive window on " +
     "the documents corpus (bucket cutoffs actually exercised)") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val budgets = (0 to 19).map(i => s"src$i" -> 120L).toMap
    val got = Sampling.tokenBudgetPortable(docs, "source", "doc_id", "text",
        budgets)
      .select("doc_id").as[Long].collect().sorted
    val byOrder = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy(col("__ok"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val naive = docs
      .withColumn("__ok", md5(concat(col("doc_id").cast("string"), lit(":42"))))
      .withColumn("__nt", TextAnalysis.tokenCount(col("text")).cast("long"))
      .withColumn("__cum", sum(col("__nt")).over(byOrder))
      .filter(col("__cum") <= 120L)
      .select("doc_id").as[Long].collect().sorted
    got shouldBe naive
    got.length should be > 0
    got.length should be < docs.count().toInt
  }

  it("repeatEpochsPortable: floor(factor) full epochs plus a stable " +
     "key-gated partial epoch; whole factors emit no partial") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = docs.count()
    val reps = Sampling.repeatEpochsPortable(docs, "doc_id", 2.3)
    reps.filter(col("epoch") <= 2).count() shouldBe 2 * n
    val partial = reps.filter(col("epoch") === 3)
      .select("doc_id").as[Long].collect().sorted
    partial.length should be > 0
    partial.length should be < n.toInt
    // stable: the partial epoch is the SAME gated sample every run
    Sampling.repeatEpochsPortable(docs, "doc_id", 2.3)
      .filter(col("epoch") === 3)
      .select("doc_id").as[Long].collect().sorted shouldBe partial
    // membership is the portable gate at round(0.3e6)
    val gated = docs.filter(
      Sampling.gatePortable(col("doc_id"), 42L) < 300000L)
      .select("doc_id").as[Long].collect().sorted
    partial shouldBe gated
    // whole factor: exactly f copies, no partial epoch
    Sampling.repeatEpochsPortable(docs, "doc_id", 2.0).count() shouldBe 2 * n
    // sub-1 factor: a single gated partial epoch
    Sampling.repeatEpochsPortable(docs, "doc_id", 0.3)
      .select("doc_id").as[Long].collect().sorted shouldBe gated
  }

  it("temperatureMixPortable flattens the mixture toward rare sources " +
     "with exactly re-derivable rates, capped at keep-all") {
    val d = Seq.tabulate(90)(i => (i.toLong, "big")) ++
      Seq.tabulate(10)(i => (100L + i, "rare"))
    val df = d.toDF("doc_id", "source")
    val kept = Sampling.temperatureMixPortable(df, "source", "doc_id",
      targetDocs = 40L)
    // re-derive the contract by hand: w = floor(sqrt(n)*1e6), integer sum,
    // micro = min(1e6, floor(target*w*1e6 / (sw*n)))
    def microOf(n: Long, sw: BigInt): Long =
      ((BigInt(40L) * BigInt(math.floor(math.sqrt(n.toDouble) * 1e6).toLong)
        * 1000000L) / (sw * BigInt(n))).min(BigInt(1000000L)).toLong
    val sw = BigInt(math.floor(math.sqrt(90.0) * 1e6).toLong) +
      BigInt(math.floor(math.sqrt(10.0) * 1e6).toLong)
    val (mBig, mRare) = (microOf(90L, sw), microOf(10L, sw))
    // alpha = 0.5 flattening: rare's ACCEPTANCE RATE is 3x big's
    // (sqrt(90)/90 vs sqrt(10)/10), though big still contributes more docs
    mRare.toDouble / mBig.toDouble shouldBe 3.0 +- 0.001
    // membership = the portable gate under exactly those rates
    val expect = d.filter { case (id, s) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:42".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 1000000L <
        (if (s == "big") mBig else mRare)
    }.map(_._1).sorted
    kept.select("doc_id").as[Long].collect().sorted shouldBe expect.toArray
    // a target at or above the corpus keeps everything (rates cap at 1e6)
    Sampling.temperatureMixPortable(df, "source", "doc_id", 1000L)
      .count() shouldBe 100L
    // layout independence
    Sampling.temperatureMixPortable(df.repartition(7), "source", "doc_id",
      40L).select("doc_id").as[Long].collect().sorted shouldBe expect.toArray
  }

  it("temperatureMixPortable refuses a non-string strata column and NULL " +
     "strata with clear errors (a NULL stratum would skew every other " +
     "source's rate while its own rows silently dropped)") {
    val typed = intercept[IllegalArgumentException] {
      Sampling.temperatureMixPortable(
        Seq((1L, 7L)).toDF("doc_id", "source"), "source", "doc_id", 10L)
    }
    typed.getMessage should (include("source") and include("STRING"))
    val nulls = intercept[IllegalArgumentException] {
      Sampling.temperatureMixPortable(
        Seq((1L, "a"), (2L, null)).toDF("doc_id", "source"),
        "source", "doc_id", 10L).count()
    }
    nulls.getMessage should include("NULL")
  }

  it("repeatEpochsByStrata applies the per-stratum epoch table — each " +
     "stratum equals repeatEpochsPortable over its slice; unlisted " +
     "strata drop") {
    val d = Seq.tabulate(40)(i =>
      (i.toLong, if (i < 20) "a" else "b")) :+ ((100L, "c"))
    val df = d.toDF("doc_id", "source")
    val out = Sampling.repeatEpochsByStrata(df, "source", "doc_id",
      Map("a" -> 2.5, "b" -> 0.25))
      .select("doc_id", "source", "epoch").as[(Long, String, Long)]
      .collect()
    out.map(_._2).toSet shouldBe Set("a", "b") // 'c' unlisted -> dropped
    def slice(src: String, f: Double): Array[(Long, Long)] =
      Sampling.repeatEpochsPortable(df.filter($"source" === src), "doc_id", f)
        .select("doc_id", "epoch").as[(Long, Long)].collect().sorted
    out.filter(_._2 == "a").map(r => (r._1, r._3)).sorted shouldBe
      slice("a", 2.5)
    out.filter(_._2 == "b").map(r => (r._1, r._3)).sorted shouldBe
      slice("b", 0.25)
  }

  it("clusterBalanced caps every IVF cell at perCell, deterministically") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val index = IvfIndex.fit(emb, "vec_id", "embedding", k = 4, iters = 2)
    try {
      def run() = Sampling
        .clusterBalanced(emb, "vec_id", "embedding", index, perCell = 5)
        .orderBy("cell", "vec_id")
        .select($"cell", $"vec_id").as[(Int, Long)].collect().toSeq
      val sel = run()
      sel shouldBe run() // deterministic member set
      val perCell = sel.groupBy(_._1).view.mapValues(_.size)
      all(perCell.values.toSeq) should be <= 5
      perCell.keys.toSet.size should be > 1 // multiple cells represented
      // members are real corpus ids
      val ids = emb.select("vec_id").as[Long].collect().toSet
      sel.map(_._2).foreach(v => ids should contain(v))
    } finally index.release()
  }
}
