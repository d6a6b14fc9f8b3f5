package graft.ext

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.GraftSpec

/** The persisted IVF index: stored-search parity with the in-memory
  * [[IvfIndex]], frozen-centroid appends, exactly-once tokens, and the
  * scale property — a probe reads only the probed cell partitions.
  */
class IvfStoreSpec extends GraftSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-ivfstore-spec").toString + "/idx"

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")

  it("stored search equals the in-memory IvfIndex.queryAll bit for bit") {
    val store = IvfStore.create(emb, "vec_id", "embedding", tmp(), k = 8)
    val idx = IvfIndex.fit(emb, "vec_id", "embedding", k = 8)
    try {
      val stored = store.searchAll(Seq(1L, 2L, 3L), topK = 5, nprobe = 2)
        .orderBy("qid", "vid")
        .as[(Long, Long, Double)].collect().toSeq
      val mem = idx.queryAll(Seq(1L, 2L, 3L), topK = 5, nprobe = 2)
        .orderBy("qid", "vid")
        .as[(Long, Long, Double)].collect().toSeq
      stored shouldBe mem
      stored.length shouldBe 15
    } finally idx.release()
  }

  it("append assigns to the FROZEN centroids; appended vectors are " +
     "searchable as candidates and usable as queries; stats move") {
    val store = IvfStore.create(emb.filter($"vec_id" % 5 =!= 0),
      "vec_id", "embedding", tmp(), k = 8)
    val st0 = store.stats
    val batch = emb.filter($"vec_id" % 5 === 0)
    val st1 = store.append(batch, "vec_id", "embedding")
    st1.vectors shouldBe st0.vectors + batch.count()
    st1.cells shouldBe st0.cells // frozen: append never refits
    // centroid parity with an index trained the same way
    val idx = IvfIndex.fit(emb.filter($"vec_id" % 5 =!= 0),
      "vec_id", "embedding", k = 8)
    try {
      store.centroids.map(_._1) shouldBe idx.centroids.map(_._1)
      store.centroids.zip(idx.centroids).foreach { case ((_, a), (_, b)) =>
        a.toSeq shouldBe b.toSeq
      }
    } finally idx.release()
    // vec_id 5 was appended: it queries, and its neighbors include other
    // appended and original vectors
    val res = store.searchAll(Seq(5L), topK = 5, nprobe = 2)
    res.count() shouldBe 5
  }

  it("appendOnce is idempotent under its token and the excludeToken view " +
     "replays the pre-append search") {
    val store = IvfStore.create(emb.filter($"vec_id" % 5 =!= 0),
      "vec_id", "embedding", tmp(), k = 8)
    val before = store.searchAll(Seq(1L, 2L), topK = 5, nprobe = 2)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    val batch = emb.filter($"vec_id" % 5 === 0)
    val token = "vecs,b#0"
    val st1 = store.appendOnce(batch, "vec_id", "embedding", token)
    store.appendOnce(batch, "vec_id", "embedding", token) shouldBe st1
    store.searchAll(Seq(1L, 2L), topK = 5, nprobe = 2,
        excludeToken = Some(token))
      .as[(Long, Long, Double)].collect().toSeq.sorted shouldBe before
  }

  it("a search scans ONLY the probed cell partitions (static partition " +
     "pruning — the dq59 property applied to ANN)") {
    val store = IvfStore.create(emb, "vec_id", "embedding", tmp(), k = 8)
    val res = store.searchAll(Seq(1L), topK = 5, nprobe = 2)
    res.collect()
    val partitionsRead = graft.plans.PlanWalk
      .collectAll(res.queryExecution.executedPlan) {
        case f: FileSourceScanExec => f.metrics.get("numPartitions").map(_.value)
      }.flatten
    partitionsRead should not be empty
    // the candidate scan reads exactly nprobe of the k cell partitions
    partitionsRead.min shouldBe 2L
    all(partitionsRead) should be < store.stats.cells.toLong
  }

  it("assigned dirs compact past the threshold: search results unchanged, " +
     "vacuum unlinks superseded dirs") {
    val path = tmp()
    val key = "spark.graft.ivfstore.compactThreshold"
    spark.conf.set(key, "2")
    try {
      val store = IvfStore.create(emb.filter($"vec_id" % 4 === 0),
        "vec_id", "embedding", path, k = 4)
      (1 to 3).foreach { i =>
        store.append(emb.filter($"vec_id" % 4 === i), "vec_id", "embedding")
      }
      new java.io.File(s"$path/assigned").listFiles()
        .map(_.getName).count(_.startsWith("append=c")) should be >= 1
      val res = store.searchAll(Seq(1L, 2L, 3L), topK = 5, nprobe = 2)
        .orderBy("qid", "vid").as[(Long, Long, Double)].collect().toSeq
      res.length shouldBe 15
      val before = new java.io.File(s"$path/assigned").listFiles().length
      val removed = store.vacuum()
      removed should be > 0
      new java.io.File(s"$path/assigned").listFiles().length shouldBe
        before - removed
      store.searchAll(Seq(1L, 2L, 3L), topK = 5, nprobe = 2)
        .orderBy("qid", "vid").as[(Long, Long, Double)]
        .collect().toSeq shouldBe res
    } finally spark.conf.unset(key)
  }

  it("open() restores centroids exactly; a missing layout is refused; " +
     "create refuses an occupied path") {
    val path = tmp()
    val store = IvfStore.create(emb, "vec_id", "embedding", path, k = 8)
    val reopened = IvfStore.open(spark, path)
    reopened.centroids.map(_._1) shouldBe store.centroids.map(_._1)
    reopened.centroids.zip(store.centroids).foreach { case ((_, a), (_, b)) =>
      a.toSeq shouldBe b.toSeq
    }
    reopened.searchAll(Seq(1L), topK = 3, nprobe = 2).count() shouldBe 3
    an[Exception] should be thrownBy IvfStore.open(spark, tmp())
    an[Exception] should be thrownBy
      IvfStore.create(emb, "vec_id", "embedding", path, k = 8)
  }
}
