package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED quality-probe TRAINING STATISTICS — [[QualityProbe]]'s
  * moment table maintained incrementally: the normal-equations moments
  * (Σ xᵢxⱼ, Σ xᵢy over documents) are associative Long sums, so they
  * accumulate as per-append PARTIALS the same way [[NgramLmStore]]'s
  * bigram counts do, and the probe's exact Cramer weights
  * ([[QualityProbe.milliWeights]]) re-derive from the summed table at
  * any point — train statistics once per document ever, refresh the
  * model for free after every ingest round.
  *
  * The regression target `y` (the dq92 fluency mean) must come from a
  * FIXED model for the sums to be associative — scoring each batch
  * against the batch-dependent self-model would make earlier partials
  * retroactively wrong. So the store owns a FROZEN reference LM: an
  * [[NgramLmStore]] built once at [[QualityProbeStore.create]] from the
  * history corpus under `path/lm` (never appended to), and every batch's
  * `y` is scored against it — CCNet's fixed-reference-model design. For
  * the create batch itself the frozen model IS its own model, so the
  * seed moments equal the per-call self-trained table (dq112) exactly.
  *
  * == Layout ==
  *  - `lm/` — the frozen reference [[NgramLmStore]] (one commit, frozen);
  *  - `moments/append=<id>/` (term, value) — 14 partial-sum rows per
  *    append (the d·(d+1)/2 + d moment terms);
  *  - `_commits/m<seq>` marker manifests; `appendOnce` tokens make
  *    ingest-loop statistics updates exactly-once.
  *
  * Reading the model is a 14·appends-row aggregation — no compaction
  * needed at any realistic append count (a century of daily appends is
  * ~500k tiny rows); [[moments]] sums the partials, [[milliWeights]]
  * hands the summed table to the exact Cramer solve.
  */
final class QualityProbeStore private (
    private val spark: SparkSession, val path: String) {

  private val log = new ManifestLog(spark, path)

  /** The frozen reference LM (built at create, never appended). */
  lazy val referenceLm: NgramLmStore = NgramLmStore.open(spark, s"$path/lm")

  private def visible(excludeToken: Option[String]): Seq[Manifest] =
    log.read().filterNot(m => excludeToken.exists(m.token.contains))

  private def momentDirs(ms: Seq[Manifest]): Seq[String] = {
    val ids = ms.flatMap(_.digests)
    require(ids.nonEmpty, s"no committed moment dirs under $path")
    ids.map(id => s"$path/moments/append=$id")
  }

  // ---------------- writes ----------------

  /** Fold a batch's moment partials into the store: features from the
    * batch text, `y` scored against the FROZEN reference LM, one
    * 14-row partials dir, one marker commit. */
  def append(df: DataFrame, idCol: String, textCol: String): Unit =
    writeBatch(df, idCol, textCol, token = None)

  /** [[append]] with an idempotence token — exactly-once statistics. */
  def appendOnce(df: DataFrame, idCol: String, textCol: String,
      token: String): Unit = {
    require(token.nonEmpty && !token.contains("\n"), "token: non-empty, one line")
    if (!log.read().exists(_.token.contains(token)))
      writeBatch(df, idCol, textCol, token = Some(token))
  }

  private def writeBatch(df: DataFrame, idCol: String, textCol: String,
      token: Option[String]): Unit = {
    val before = log.read()
    val seq = before.size + 1
    val id = f"a$seq%06d"
    val dir = s"$path/moments/append=$id"
    log.clearOrphan(dir)
    val y = referenceLm.scoreBatch(df, idCol, textCol)
      .select(col(idCol), col("mean_micro"))
    val xy = QualityProbe.features(df, idCol, textCol).join(y, idCol)
    QualityProbe.moments(xy, "mean_micro")
      .coalesce(1).write.mode("errorifexists").parquet(dir)
    log.commit(Manifest(Seq(id), Nil, Nil, Nil, token), seq)
  }

  // ---------------- reads ----------------

  /** The SUMMED moment table (term, value) over every committed append —
    * [[QualityProbe.moments]]'s contract over the stored partials. */
  def moments(excludeToken: Option[String] = None): DataFrame =
    spark.read.parquet(momentDirs(visible(excludeToken)): _*)
      .groupBy("term").agg(sum(col("value")).cast("long").as("value"))

  /** The probe's EXACT milli-weights from the stored statistics
    * ([[QualityProbe.milliWeights]] — Cramer's rule over BigInt
    * determinants on the 14 summed Longs). */
  def milliWeights(excludeToken: Option[String] = None): Array[Long] =
    QualityProbe.milliWeights(
      moments(excludeToken).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)
}

object QualityProbeStore {

  /** Build a new statistics store at `path` (must be fresh): the frozen
    * reference LM trains on `history` under `path/lm`, and history's own
    * moment partials (its `y` scored against that model — for the seed
    * batch the frozen model IS the self-model, so the seed table equals
    * the per-call dq112 moments) become the first append. */
  def create(history: DataFrame, idCol: String, textCol: String,
      path: String): QualityProbeStore = {
    val spark = history.sparkSession
    val store = new QualityProbeStore(spark, path)
    require(store.log.read().isEmpty,
      s"$path already holds a committed store (create() wants a fresh path)")
    NgramLmStore.build(history, idCol, textCol, s"$path/lm")
    store.writeBatch(history, idCol, textCol, token = None)
    store
  }

  /** Open a stored statistics table (+ its frozen reference LM). */
  def open(spark: SparkSession, path: String): QualityProbeStore = {
    val store = new QualityProbeStore(spark, path)
    store.referenceLm.stats // fail fast on a missing/foreign layout
    store
  }
}
