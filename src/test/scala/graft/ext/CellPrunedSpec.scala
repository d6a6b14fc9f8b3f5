package graft.ext

import org.apache.spark.sql.functions._

import graft.GraftSpec

/** Cell-pruned variants of the exact corpus×eval operators (r6 directive
  * #3): full-probe equivalence (nprobe = k covers every cell, so the pruned
  * plan must reproduce the exact product bit-for-bit), recall 1.0 on a
  * planted near-dup corpus at the gate threshold, and the candidate-count
  * reduction that is the variant's reason to exist.
  */
class CellPrunedSpec extends GraftSpec {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  it("semanticReportPruned with nprobe = k (every cell probed) reproduces " +
     "the exact report bit-for-bit") {
    val evalSet = emb.filter(col("vec_id") % 97 === 0)
    val train = emb.filter(col("vec_id") % 97 =!= 0)
    val index = IvfIndex.fit(train, "vec_id", "embedding", k = 8)
    try {
      val exact = Decontamination
        .semanticReport(train, evalSet, "vec_id", "embedding", 0.3)
        .as[(Long, Long, Double)].collect().toSet
      val pruned = Decontamination
        .semanticReportPruned(train, evalSet, "vec_id", "embedding", 0.3,
          index, nprobe = 8)
        .as[(Long, Long, Double)].collect().toSet
      pruned shouldBe exact
      exact should not be empty
    } finally index.release()
  }

  it("knnClassifyPruned with nprobe = k reproduces the exact vote " +
     "bit-for-bit") {
    val labeled = emb.withColumn("label", (col("vec_id") % 3).cast("long"))
    val pred = col("vec_id") % 101 === 0
    val index = IvfIndex.fit(labeled, "vec_id", "embedding", k = 8)
    try {
      val exact = Ann
        .knnClassify(labeled, "vec_id", "embedding", "label", pred, k = 5)
        .as[(Long, Long, Long, Double)].collect().toSet
      val pruned = Ann
        .knnClassifyPruned(labeled, "vec_id", "embedding", "label", pred,
          k = 5, index, nprobe = 8)
        .as[(Long, Long, Long, Double)].collect().toSet
      pruned shouldBe exact
      exact should not be empty
    } finally index.release()
  }

  it("planted near-dups: the pruned report's recall vs exact is 1.0 at the " +
     "gate threshold even at nprobe = 1 — a near-identical eval vector " +
     "probes its source's cell first") {
    // eval = perturbed copies of every 5th corpus vector (tiny additive
    // noise on one component: cosine stays ~1, cell assignment stays put)
    val planted = emb.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + 10000).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x + lit(0.001f)).otherwise(x))
          .as("embedding"))
    val train = emb
    val index = IvfIndex.fit(train, "vec_id", "embedding", k = 8)
    try {
      val thr = 0.95
      val exact = Decontamination
        .semanticReport(train, planted, "vec_id", "embedding", thr)
        .select("vec_id").as[Long].collect().toSet
      val pruned = Decontamination
        .semanticReportPruned(train, planted, "vec_id", "embedding", thr,
          index, nprobe = 1)
        .select("vec_id").as[Long].collect().toSet
      // every planted source is flagged by the exact pass...
      exact should not be empty
      // ...and the pruned pass misses NONE of them (recall 1.0); extra
      // flags are impossible — pruned candidates are a subset
      pruned shouldBe exact
    } finally index.release()
  }

  it("the pruned candidate product is a strict reduction of the brute " +
     "product") {
    val evalSet = emb.filter(col("vec_id") % 97 === 0)
    val train = emb.filter(col("vec_id") % 97 =!= 0)
    val index = IvfIndex.fit(train, "vec_id", "embedding", k = 8)
    try {
      val nprobe = 2
      val tr = index.withCell(
        train.select(col("vec_id"), col("embedding").as("__emb")), "__emb")
      val ev = evalSet.select(
        explode(index.probesFor(col("embedding"), nprobe, spark)).as("__probe"))
      val cand = tr.join(broadcast(ev), col("cell") === col("__probe")).count()
      val brute = train.count() * evalSet.count()
      cand should be > 0L
      cand should be < brute
    } finally index.release()
  }
}
