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
