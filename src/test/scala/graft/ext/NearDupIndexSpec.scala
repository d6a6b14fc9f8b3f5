package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.GraftSpec

/** The persisted near-dup index loop (r6 directive #1): stored-layout
  * parity with the per-call pipeline, append semantics, statistics-fed
  * Bloom sizing, and the load-bearing 100 TB property — a gate against the
  * stored index reads NO history text, only the index layout.
  */
class NearDupIndexSpec extends GraftSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-ndidx-spec").toString + "/idx"

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")

  private def incomingOf(base: DataFrame): DataFrame = {
    val nearReplay = base.filter(col("doc_id") % 17 === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("source"),
        concat(col("text"), lit(" zzztail")).as("text"))
    val novel = base.filter(col("doc_id") % 13 === 0)
      .select((col("doc_id") + 200000).as("doc_id"), col("source"),
        array_join(transform(split(col("text"), " "),
          (tok, i) => when(i % 3 === 0, concat(tok, lit("x"))).otherwise(tok)),
          " ").as("text"))
    nearReplay.union(novel)
  }

  it("stored-index gate reproduces MinHashLSH.keepUnseenNear exactly " +
     "(digest Jaccard == shingle Jaccard)") {
    val idx = NearDupIndex.build(docs, "doc_id", "text", tmp())
    val incoming = incomingOf(docs)
    val stored = idx.keepUnseen(incoming, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    val percall = MinHashLSH.keepUnseenNear(incoming, docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    stored shouldBe percall
    stored.length should be > 0
  }

  it("a gate against the stored index scans ONLY the index layout — no " +
     "history text file appears in the plan (the 100 TB seam)") {
    val path = tmp()
    val idx = NearDupIndex.build(docs, "doc_id", "text", path)
    // incoming is an in-memory frame, so every file scan in the gate's plan
    // must live under the index path
    val incoming = Seq((1L, "src0", docs.select("text").as[String].head()))
      .toDF("doc_id", "source", "text")
    val dup = idx.pairsPlanFor(incoming, "doc_id", "text")
    val scanned = graft.plans.PlanWalk
      .collectAll(dup.queryExecution.executedPlan) {
        case f: FileSourceScanExec =>
          f.relation.location.rootPaths.map(_.toString)
      }.flatten
    scanned should not be empty
    all(scanned) should include(path)
    // and the gate works: the copied first document near-dups history
    dup.select("doc_inc").as[Long].collect() should contain(1L)
  }

  it("append indexes a batch's survivors: their near-replays are caught by " +
     "the NEXT batch's gate, and stats move") {
    val idx = NearDupIndex.build(docs, "doc_id", "text", tmp())
    val st0 = idx.stats
    val b1 = incomingOf(docs)
    val kept1 = idx.keepUnseen(b1, "doc_id", "text").localCheckpoint(true)
    val st1 = idx.append(kept1, "doc_id", "text")
    st1.docs shouldBe st0.docs + kept1.filter(
      org.apache.spark.sql.functions.size(
        MinHashLSH.shingleDigests(col("text"))).gt(lit(0))).count()
    st1.bandKeys should be >= st0.bandKeys
    // batch 2: near-replays of batch-1 SURVIVORS — only the append knows them
    val b2 = kept1.select((col("doc_id") + 300000).as("doc_id"), col("source"),
      concat(col("text"), lit(" zzztail2")).as("text"))
    val kept2 = idx.keepUnseen(b2, "doc_id", "text")
    kept2.count() shouldBe 0L
  }

  it("open() restores parameters from the stored stats and rejects a " +
     "missing layout") {
    val path = tmp()
    NearDupIndex.build(docs, "doc_id", "text", path,
      numHashes = 8, bands = 2, maxBucket = 50)
    val reopened = NearDupIndex.open(spark, path)
    val st = reopened.stats
    st.numHashes shouldBe 8
    st.bands shouldBe 2
    st.maxBucket shouldBe 50
    st.docs should be > 0L
    an[Exception] should be thrownBy NearDupIndex.open(spark, tmp())
  }

  it("build refuses a path that already holds an index") {
    val path = tmp()
    NearDupIndex.build(docs, "doc_id", "text", path)
    an[Exception] should be thrownBy
      NearDupIndex.build(docs, "doc_id", "text", path)
  }
}
