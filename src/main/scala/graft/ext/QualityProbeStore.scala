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
  * Reading the model is a 14·appends-row aggregation — tiny rows, but
  * each append is a new DIRECTORY, and at production cadence (one
  * append per ingest batch, forever) the per-read file LISTING would
  * come to dominate the 14-row sum. So the store compacts like its
  * siblings: past `spark.graft.probestore.compactThreshold` active dirs
  * the partials fold into ONE summed dir under a superseding commit
  * (sum-identical by associativity — the moments are plain Long sums),
  * the newest dir is never folded (the token-replay window), and
  * [[vacuum]] unlinks superseded dirs under the family retention guard.
  * [[moments]] sums the active partials, [[milliWeights]] hands the
  * summed table to the exact Cramer solve.
  *
  * == Ingest gate ([[IngestIndex]]) ==
  *
  * The store is also the fifth gated modality: [[gateKeep]] keeps batch
  * documents scoring at or above the STORED corpus's mean quality under
  * the CURRENT stored weights (dq115's train→score→mean-gate with the
  * per-call retrain replaced by incremental statistics), and
  * [[appendToken]] folds survivors' moments back in, so accepted
  * documents move the model for the next round. Both the weights and
  * the threshold come off the 14-row summed table alone: since x0 = 1,
  * Σ_docs score = Σ_j w_j·m_0_j and the document count is m_0_0, so
  * thr = ⌊Σ_j w_j·m_0_j / m_0_0⌋ — the gate never reads a stored
  * document (there are none; the index IS the statistics).
  */
final class QualityProbeStore private (
    private val spark: SparkSession, val path: String) extends IngestIndex {

  private val log = new ManifestLog(spark, path)

  /** The frozen reference LM (built at create, never appended). */
  lazy val referenceLm: NgramLmStore = NgramLmStore.open(spark, s"$path/lm")

  private def visible(excludeToken: Option[String]): Seq[Manifest] =
    log.read().filterNot(m => excludeToken.exists(m.token.contains))

  private def activeIds(ms: Seq[Manifest]): Seq[String] = {
    val sup = ms.flatMap(_.supersedesDigests).toSet
    ms.flatMap(_.digests).filterNot(sup)
  }

  private def momentDirs(ms: Seq[Manifest]): Seq[String] = {
    val ids = activeIds(ms)
    require(ids.nonEmpty, s"no committed moment dirs under $path")
    ids.map(id => s"$path/moments/append=$id")
  }

  // ---------------- writes ----------------

  /** Fold a batch's moment partials into the store: features from the
    * batch text, `y` scored against the FROZEN reference LM, one
    * 14-row partials dir, one marker commit. Serialized with every
    * other writer on the layout ([[ManifestLog.withWriteLock]]). */
  def append(df: DataFrame, idCol: String, textCol: String): Unit =
    log.withWriteLock { writeBatch(df, idCol, textCol, token = None) }

  /** [[append]] with an idempotence token — exactly-once statistics
    * (check-then-commit atomic under the writer lock). */
  def appendOnce(df: DataFrame, idCol: String, textCol: String,
      token: String): Unit = {
    require(token.nonEmpty && !token.contains("\n"), "token: non-empty, one line")
    log.withWriteLock {
      if (!log.read().exists(_.token.contains(token)))
        writeBatch(df, idCol, textCol, token = Some(token))
    }
  }

  private def writeBatch(df: DataFrame, idCol: String, textCol: String,
      token: Option[String],
      bgOverride: Option[DataFrame] = None): Unit = {
    val before = log.read()
    val seq = before.size + 1
    val id = f"a$seq%06d"
    val dir = s"$path/moments/append=$id"
    log.clearOrphan(dir)
    // bgOverride: the create-path fusion hook — the seed scoring reuses
    // the bigram frame the frozen-LM build already computed (one
    // tokenize+explode pass over the history corpus instead of two)
    val y = bgOverride
      .fold(referenceLm.scoreBatch(df, idCol, textCol))(bg =>
        referenceLm.scoreBatchWith(df, bg, idCol))
      .select(col(idCol), col("mean_micro"))
    val xy = QualityProbe.features(df, idCol, textCol).join(y, idCol)
    QualityProbe.moments(xy, "mean_micro")
      .coalesce(1).write.mode("errorifexists").parquet(dir)
    log.commit(Manifest(Seq(id), Nil, Nil, Nil, token), seq)
    maybeCompact()
  }

  /** Fold the moment-partial dirs into ONE summed dir once the active
    * dir count passes `spark.graft.probestore.compactThreshold` (default
    * 16) — bounds the per-read file listing (the one cost that grows
    * with append count; the rows are 14 per dir). Newest dir never
    * folded (token-replay window); superseded dirs stay for in-flight
    * readers until [[vacuum]]. Sum-identical by associativity (the
    * [[NgramLmStore]] compaction rule on a 14-term vocabulary). */
  private def maybeCompact(): Unit = {
    val threshold = IndexConf.strictInt(spark,
      "spark.graft.probestore.compactThreshold", default = 16, min = 1)
    val ms = log.read()
    val foldable = activeIds(ms).dropRight(1)
    if (foldable.size > threshold) {
      val seq = ms.size + 1
      val cid = f"c$seq%06d"
      val dir = s"$path/moments/append=$cid"
      log.clearOrphan(dir)
      RelRead.read(spark, s"$path#moments",
        foldable.map(id => s"$path/moments/append=$id"),
        schema = Some(QualityProbeStore.momentsSchema))
        .groupBy("term").agg(sum(col("value")).cast("long").as("value"))
        .coalesce(1).write.mode("errorifexists").parquet(dir)
      log.commit(Manifest(Seq(cid), Nil, Nil, Nil, None, foldable), seq)
    }
  }

  /** Unlink moment dirs a compaction superseded, under the retention
    * guard ([[ManifestLog.vacuumEligible]]) and the writer lock. */
  def vacuum(): Int = log.withWriteLock {
    val f = log.fileSystem
    log.vacuumEligible(_.supersedesDigests).count { id =>
      f.delete(new org.apache.hadoop.fs.Path(s"$path/moments/append=$id"),
        true)
    }
  }

  // ---------------- reads ----------------

  /** The SUMMED moment table (term, value) over every committed append —
    * [[QualityProbe.moments]]'s contract over the stored partials. */
  def moments(excludeToken: Option[String] = None): DataFrame =
    RelRead.read(spark, s"$path#moments",
      momentDirs(visible(excludeToken)),
      schema = Some(QualityProbeStore.momentsSchema))
      .groupBy("term").agg(sum(col("value")).cast("long").as("value"))

  /** The probe's EXACT milli-weights from the stored statistics
    * ([[QualityProbe.milliWeights]] — Cramer's rule over BigInt
    * determinants on the 14 summed Longs). */
  def milliWeights(excludeToken: Option[String] = None): Array[Long] =
    QualityProbe.milliWeights(
      moments(excludeToken).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)

  /** (milli-weights, gate threshold) off ONE read of the stored table.
    * The threshold is the stored corpus's mean score under its own
    * weights, derived from the moments alone (class doc): exact BigInt
    * floor of Σ_j w_j·m_0_j over m_0_0 — the same corpus-mean floor as
    * [[QualityProbe.gate]], without rescanning any document. */
  def model(excludeToken: Option[String] = None): (Array[Long], Long) = {
    val m = moments(excludeToken).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val w = QualityProbe.milliWeights(m)
    val num = (0 until w.length).map(j => BigInt(w(j)) * BigInt(m(s"m_0_$j"))).sum
    val n = BigInt(m("m_0_0"))
    require(n > 0, s"empty stored corpus under $path (m_0_0 = 0)")
    val q = num / n
    val thr = (if (num % n != 0 && num < 0) q - 1 else q).toLong
    (w, thr)
  }

  // ---------------- IngestIndex ----------------

  /** Keep batch documents whose integer probe score under the stored
    * weights is ≥ the stored-corpus mean threshold ([[model]]) — a
    * map-only codegen'd dot product over the batch; the only store read
    * is the 14·appends-row moment aggregation. */
  def gateKeep(batch: DataFrame, idCol: String, textCol: String,
      excludeToken: Option[String]): DataFrame = {
    val (w, thr) = model(excludeToken)
    val keep = QualityProbe.features(batch, idCol, textCol)
      .where(QualityProbe.score(w) >= thr)
      .select(col(idCol))
    batch.join(keep, Seq(idCol), "left_semi")
  }

  def appendToken(df: DataFrame, idCol: String, textCol: String,
      token: String): Unit = appendOnce(df, idCol, textCol, token)

  def seededBy(token: String): Boolean =
    log.read().headOption.exists(_.token.contains(token))
}

object QualityProbeStore {

  /** The `moments/` relation's schema as written ([[QualityProbe
    * .moments]]'s stack projection) — declared so no read of the
    * relation ever runs a schema-inference job; pinned against the real
    * layout by `StoreRelationSchemaSpec`. */
  private[ext] val momentsSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("term", StringType),
      StructField("value", LongType)))
  }

  /** Build a new statistics store at `path` (must be fresh): the frozen
    * reference LM trains on `history` under `path/lm`, and history's own
    * moment partials (its `y` scored against that model — for the seed
    * batch the frozen model IS the self-model, so the seed table equals
    * the per-call dq112 moments) become the first append. */
  def create(history: DataFrame, idCol: String, textCol: String,
      path: String, seedToken: Option[String] = None): QualityProbeStore = {
    val spark = history.sparkSession
    val store = new QualityProbeStore(spark, path)
    store.log.withWriteLock {
      require(store.log.read().isEmpty,
        s"$path already holds a committed store (create() wants a fresh path)")
      // ONE tokenize+explode pass over the history corpus feeds BOTH the
      // frozen-LM build (its grouped counts) and the seed scoring (its
      // per-doc bigrams) — the per-path form ran the corpus-sized
      // bigramsOf twice per create (guide §1.2: don't compute things
      // twice). Grouped counts off the per-doc frame are identical by
      // construction, so the stored model and the seed moments are
      // bit-unchanged (oracle-gated).
      val bg = NgramLm.bigramsOf(history, textCol, col(idCol)).persist()
      try {
        // crash-replayable: a predecessor that died between the LM build
        // and the first moments commit left a committed LM — reuse it (it
        // was built from the same history; the moments log is still
        // empty). The nested build locks path/lm's OWN log — a different
        // lock file, no self-deadlock.
        if (!NgramLmStore.exists(spark, s"$path/lm"))
          NgramLmStore.buildFromBigrams(history, bg, s"$path/lm")
        store.writeBatch(history, idCol, textCol, token = seedToken,
          bgOverride = Some(bg))
      } finally { bg.unpersist(blocking = false); () }
    }
    store
  }

  /** Whether `path` holds at least one committed statistics manifest —
    * the build-if-absent probe of config-driven gate stages
    * ([[graft.plan.CurationConfig]]). */
  def exists(spark: SparkSession, path: String): Boolean =
    new ManifestLog(spark, path).read().nonEmpty

  /** Open a stored statistics table (+ its frozen reference LM). */
  def open(spark: SparkSession, path: String): QualityProbeStore = {
    val store = new QualityProbeStore(spark, path)
    store.referenceLm.stats // fail fast on a missing/foreign layout
    store
  }
}
