package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSpec

/** The persisted quality-probe statistics: seed parity with the per-call
  * dq112 table, associative incremental appends against the frozen
  * reference LM, exactly-once tokens, and weight re-derivation. */
class QualityProbeStoreSpec extends GraftSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-qpstore-spec")
      .toString + "/idx"

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")

  private def tableOf(df: DataFrame): Seq[(String, Long)] =
    df.orderBy("term").as[(String, Long)].collect().toSeq

  private def perCallMoments(batch: DataFrame, modelDocs: DataFrame): DataFrame = {
    val y = NgramLm.scoreAgainst(batch, modelDocs, "doc_id", "text")
      .select(col("doc_id"), col("mean_micro"))
    QualityProbe.moments(
      QualityProbe.features(batch, "doc_id", "text").join(y, "doc_id"),
      "mean_micro")
  }

  it("the seed table equals the per-call self-trained moments (the frozen " +
     "model IS the self-model at create)") {
    val store = QualityProbeStore.create(docs, "doc_id", "text", tmp())
    tableOf(store.moments()) shouldBe tableOf(perCallMoments(docs, docs))
  }

  it("create + append equals one per-call pass over the union with the " +
     "FROZEN history model as the target's reference (associativity)") {
    val hist = docs.filter($"doc_id" % 5 =!= 0)
    val batch = docs.filter($"doc_id" % 5 === 0)
    val store = QualityProbeStore.create(hist, "doc_id", "text", tmp())
    store.appendOnce(batch, "doc_id", "text", "b#1")
    tableOf(store.moments()) shouldBe tableOf(perCallMoments(docs, hist))
    // and the exact Cramer weights re-derive from the summed table
    store.milliWeights().toSeq shouldBe QualityProbe.milliWeights(
      perCallMoments(docs, hist).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap).toSeq
  }

  it("appendOnce is idempotent under its token; the excludeToken view " +
     "replays the pre-append table") {
    val hist = docs.filter($"doc_id" % 5 =!= 0)
    val store = QualityProbeStore.create(hist, "doc_id", "text", tmp())
    val seed = tableOf(store.moments())
    val batch = docs.filter($"doc_id" % 5 === 0)
    store.appendOnce(batch, "doc_id", "text", "b#1")
    val after = tableOf(store.moments())
    store.appendOnce(batch, "doc_id", "text", "b#1") // replay: no-op
    tableOf(store.moments()) shouldBe after
    tableOf(store.moments(excludeToken = Some("b#1"))) shouldBe seed
  }

  it("gateKeep equals the hand-derived mean gate: stored Cramer weights, " +
     "threshold from the moments alone (no corpus rescan)") {
    val store = QualityProbeStore.create(docs, "doc_id", "text", tmp())
    val batch = docs.select($"doc_id" + 900000 as "doc_id", $"text")
    // by-hand: weights from the stored table, threshold from the same
    // 14 terms (x0 = 1 ⇒ Σ score = Σ_j w_j·m_0_j over m_0_0 docs)
    val m = store.moments().as[(String, Long)].collect().toMap
    val w = QualityProbe.milliWeights(m)
    val num = (0 until 4).map(j => BigInt(w(j)) * BigInt(m(s"m_0_$j"))).sum
    val thr = (num / BigInt(m("m_0_0")) -
      (if (num % BigInt(m("m_0_0")) != 0 && num < 0) 1 else 0)).toLong
    val expect = QualityProbe.features(batch, "doc_id", "text")
      .withColumn("s", QualityProbe.score(w))
      .where($"s" >= thr).select("doc_id")
      .as[Long].collect().sorted
    store.gateKeep(batch, "doc_id", "text", None)
      .select("doc_id").as[Long].collect().sorted shouldBe expect
    // and the threshold equals the directly-computed stored-corpus mean
    val scores = QualityProbe.features(docs, "doc_id", "text")
      .withColumn("s", QualityProbe.score(w))
      .agg(sum($"s").cast("long"), count(lit(1))).head()
    thr shouldBe Math.floorDiv(scores.getLong(0), scores.getLong(1))
    store.model()._2 shouldBe thr
  }

  it("the ingest-loop contract: appendToken is exactly-once and the " +
     "excludeToken gate replays the pre-append model") {
    val hist = docs.filter($"doc_id" % 5 =!= 0)
    val store = QualityProbeStore.create(hist, "doc_id", "text", tmp())
    val batch = docs.filter($"doc_id" % 5 === 0)
    val keptBefore = store.gateKeep(batch, "doc_id", "text", Some("t#1"))
      .select("doc_id").as[Long].collect().sorted
    store.appendToken(
      batch.join(keptBefore.toSeq.toDF("doc_id"), Seq("doc_id"), "left_semi"),
      "doc_id", "text", "t#1")
    store.appendToken(batch, "doc_id", "text", "t#1") // replay: no-op
    // the replay view (excluding the committed token) gates identically
    store.gateKeep(batch, "doc_id", "text", Some("t#1"))
      .select("doc_id").as[Long].collect().sorted shouldBe keptBefore
  }

  it("the gate plan scans NO files at all over a checkpointed batch — " +
     "model and threshold are driver-side constants off the moment table " +
     "(the 100 TB seam: zero corpus-sized reads per gate)") {
    val store = QualityProbeStore.create(docs, "doc_id", "text", tmp())
    val batch = docs.select($"doc_id" + 70000 as "doc_id", $"text")
      .localCheckpoint(true)
    val kept = store.gateKeep(batch, "doc_id", "text", None)
    kept.collect()
    val scans = graft.plans.PlanWalk
      .collectAll(kept.queryExecution.executedPlan) {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
    scans shouldBe empty
  }

  it("create is crash-replayable: a predecessor that died between the " +
     "LM build and the first moments commit is recovered, not wedged") {
    val path = tmp()
    // simulate the crash: the frozen LM exists, the moments log is empty
    NgramLmStore.build(docs, "doc_id", "text", s"$path/lm")
    val store = QualityProbeStore.create(docs, "doc_id", "text", path)
    store.moments().count() shouldBe 14
    store.milliWeights() should have length 4
  }

  it("open() restores the store and its frozen LM; a missing layout is " +
     "refused; create refuses an occupied path") {
    val path = tmp()
    QualityProbeStore.create(docs, "doc_id", "text", path)
    val reopened = QualityProbeStore.open(spark, path)
    reopened.moments().count() shouldBe 14
    an[Exception] should be thrownBy QualityProbeStore.open(spark, tmp())
    an[Exception] should be thrownBy
      QualityProbeStore.create(docs, "doc_id", "text", path)
  }
}
