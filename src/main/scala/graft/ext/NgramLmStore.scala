package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stored statistics for [[NgramLmStore]]: advisory `bigramRows` (count
  * partials on disk, not distinct bigrams), the `buckets` count the model
  * relation is partitioned by, and the fluency-band gate parameters
  * (`loMicro`, `hiMicro`) pinned at build so a reader can't gate a stored
  * model with mismatched thresholds (the [[IvfStoreStats]] rule). */
final case class NgramLmStoreStats(bigramRows: Long, buckets: Int,
    loMicro: Long, hiMicro: Long)

/** PERSISTED bigram language model — [[NgramLm]]'s per-call training made
  * an INCREMENTAL stored model, the fifth member of the index family
  * ([[NearDupIndex]], [[SubstrIndex]], [[IvfStore]], [[Bm25Store]]):
  * bigram counts are ASSOCIATIVE, so the corpus is tokenized once at
  * [[NgramLmStore.build]]/[[append]] time into count PARTIALS, later
  * batches score against the summed stored model (history text is never
  * re-read), and appending a batch's survivors IS the model update —
  * CCNet's train-then-filter loop with the model maintained in place
  * instead of retrained per call.
  *
  * == Layout ==
  *
  * The [[ManifestLog]] marker-commit scheme shared by the family:
  *  - `counts/append=<id>/wb=<b>/` (__w1, __bg, __c12) — per-append
  *    bigram-count partials, PARTITIONED BY PREFIX-HASH BUCKET
  *    (`wb = pmod(hash(__w1), buckets)`) and prefix-sorted within files.
  *    Cross-append duplicates are fine: every reader SUMS partials (the
  *    [[NearDupIndex]] counts/ pattern), and compaction folds them;
  *  - `_commits/m<seq>` marker manifests (crashed appends invisible);
  *  - `stats/` one [[NgramLmStoreStats]] row.
  *
  * == Scoring shape ([[scoreBatch]]) ==
  *
  * The batch's bigram prefixes prune the stored relation FIRST (a
  * semi-join on `__w1` — all rows of a surviving prefix are kept, so its
  * `c1` total is exact), then partials sum into the model, prefix totals
  * aggregate FROM the model, and each bigram's probability is floored
  * into integer micro-units `(1e6·c12) div c1` — the same all-integer
  * arithmetic as [[NgramLm.fluencyReport]], so scores are bit-portable
  * and the DuckDB oracle re-derives the whole incremental chain. Per-call
  * work is model-sized (vocabulary-bounded), never corpus-sized.
  *
  * == Ingest gate ([[IngestIndex]]) ==
  *
  * [[keepBand]] keeps batch documents whose stored-model `mean_micro`
  * lies in `[loMicro, hiMicro]` — the fluency-band quality gate scored
  * against the PERSISTED model; with [[appendToken]] (survivors' counts
  * join the model exactly-once) the unchanged generic loop
  * ([[graft.streaming.EventStream.runIndexedIngest]]) runs the
  * score → gate → model-update cycle per micro-batch.
  */
final class NgramLmStore private (
    private val spark: SparkSession, val path: String) extends IngestIndex {

  /** Current stored statistics (appends move it; a driver-side
    * [[StatsSidecar]] parse — zero Spark jobs per read). */
  def stats: NgramLmStoreStats = {
    val kv = StatsSidecar.read(spark, path)
    NgramLmStoreStats(kv("bigram_rows").toLong, kv("buckets").toInt,
      kv("lo_micro").toLong, kv("hi_micro").toLong)
  }

  private val log = new ManifestLog(spark, path)

  private def visible(excludeToken: Option[String]): Seq[Manifest] =
    log.read().filterNot(m => excludeToken.exists(m.token.contains))

  private def activeIds(ms: Seq[Manifest]): Seq[String] = {
    val sup = ms.flatMap(_.supersedesDigests).toSet
    ms.flatMap(_.digests).filterNot(sup)
  }

  private def countsRelOf(ms: Seq[Manifest]): DataFrame = {
    val ids = activeIds(ms)
    require(ids.nonEmpty, s"no committed count dirs under $path")
    RelRead.read(spark, s"$path#counts",
      ids.map(id => s"$path/counts/append=$id"),
      basePath = Some(s"$path/counts"),
      schema = Some(NgramLmStore.countsSchema))
  }

  // ---------------- writes ----------------

  /** Fold a batch's bigram counts into the model: one bucket-partitioned
    * partials dir, one marker commit. Serialized with every other writer
    * on the layout ([[ManifestLog.withWriteLock]]). */
  def append(df: DataFrame, idCol: String, textCol: String): NgramLmStoreStats =
    log.withWriteLock {
      writeBatch(df, idCol, textCol, stats, first = false, token = None)
    }

  /** [[append]] with an idempotence token — exactly-once model updates
    * (the token check and the commit are atomic under the writer lock:
    * two racers with the same token fold the batch once). */
  def appendOnce(df: DataFrame, idCol: String, textCol: String,
      token: String): NgramLmStoreStats = {
    require(token.nonEmpty && !token.contains("\n"), "token: non-empty, one line")
    log.withWriteLock {
      if (log.read().exists(_.token.contains(token))) stats
      else writeBatch(df, idCol, textCol, stats, first = false,
        token = Some(token))
    }
  }

  private def writeBatch(df: DataFrame, idCol: String, textCol: String,
      prev: NgramLmStoreStats, first: Boolean,
      token: Option[String],
      bgOverride: Option[DataFrame] = None): NgramLmStoreStats = {
    val before = log.read()
    require(!first || before.isEmpty,
      s"$path already holds a committed model (build() wants a fresh path)")
    val seq = before.size + 1
    val id = f"a$seq%06d"
    val dir = s"$path/counts/append=$id"
    log.clearOrphan(dir)
    // bgOverride: a CALLER-computed (persisted) bigram-occurrence frame
    // of the same df — the create-path fusion hook
    // ([[QualityProbeStore.create]] tokenizes the history corpus once
    // and feeds both this build and its seed scoring; the grouped
    // counts are identical by construction)
    bgOverride.getOrElse(NgramLm.bigramsOf(df, textCol))
      .select(col("__bg"))
      .groupBy("__bg").agg(count(lit(1)).as("__c12"))
      .select(split(col("__bg"), " ").getItem(0).as("__w1"),
        col("__bg"), col("__c12"))
      .withColumn("wb", pmod(hash(col("__w1")), lit(prev.buckets)))
      // cluster by bucket before partitionBy: caps the append at
      // ≤ buckets files instead of tasks × buckets (the dq127 finding)
      .repartition(col("wb"))
      .sortWithinPartitions("wb", "__w1", "__bg")
      .write.partitionBy("wb").mode("errorifexists").parquet(dir)
    val added = graft.io.ParquetMeta.rowCount(spark, dir)
    // a FIRST append with zero rows would leave the model unreadable
    // (every later read infers schema over only-empty dirs): refuse the
    // degenerate build with a clear error instead of wedging later
    require(!first || added > 0,
      s"cannot build a stored model at $path from a corpus with no bigrams")
    val st = NgramLmStoreStats(prev.bigramRows + added, prev.buckets,
      prev.loMicro, prev.hiMicro)
    // FIRST build: stats (the pinned buckets/band parameters) must be on
    // disk BEFORE the marker commit — a crash between a first commit and
    // a post-commit stats write would leave exists()=true with open()
    // unable to read the layout (build-if-absent then never reseeds); a
    // crash in the pre-commit order instead leaves exists()=false and the
    // reseed overwrites the stats row. Later appends keep the
    // write-after-commit order: `bigramRows` is advisory, and a
    // post-commit crash leaves it STALE (self-heals on the next append)
    // rather than inflated (which would not).
    if (first) NgramLmStore.writeStats(spark, path, st)
    log.commit(Manifest(Seq(id), Nil, Nil, Nil, token), seq)
    if (!first) NgramLmStore.writeStats(spark, path, st)
    maybeCompact()
    st
  }

  /** Fold the count-partial dirs into one SUMMED relation once the active
    * dir count passes `spark.graft.ngramstore.compactThreshold` (default
    * 16) — bounds the per-score file listing AND deduplicates cross-append
    * bigram rows (shrinking every later model aggregation). Newest dir
    * never folded (token-replay window); superseded dirs stay for
    * in-flight readers until [[vacuum]]. Sum-identical by associativity. */
  private def maybeCompact(): Unit = {
    val threshold = IndexConf.strictInt(spark,
      "spark.graft.ngramstore.compactThreshold", default = 16, min = 1)
    val ms = log.read()
    val foldable = activeIds(ms).dropRight(1)
    if (foldable.size > threshold) {
      val seq = ms.size + 1
      val cid = f"c$seq%06d"
      val dir = s"$path/counts/append=$cid"
      log.clearOrphan(dir)
      RelRead.read(spark, s"$path#counts",
        foldable.map(id => s"$path/counts/append=$id"),
        basePath = Some(s"$path/counts"),
        schema = Some(NgramLmStore.countsSchema))
        .groupBy("__w1", "__bg", "wb")
        .agg(sum(col("__c12")).as("__c12"))
        .select("__w1", "__bg", "__c12", "wb")
        .repartition(col("wb"))
        .sortWithinPartitions("wb", "__w1", "__bg")
        .write.partitionBy("wb").mode("errorifexists").parquet(dir)
      log.commit(Manifest(Seq(cid), Nil, Nil, Nil, None, foldable), seq)
    }
  }

  /** Unlink count dirs a compaction superseded, under the retention guard
    * ([[ManifestLog.vacuumEligible]]) and the writer lock. */
  def vacuum(): Int = log.withWriteLock {
    val f = log.fileSystem
    log.vacuumEligible(_.supersedesDigests).count { id =>
      f.delete(new org.apache.hadoop.fs.Path(s"$path/counts/append=$id"), true)
    }
  }

  // ---------------- queries ----------------

  /** Per batch document: (idCol, n_bigrams, sum_micro, mean_micro) scored
    * against the STORED model — [[NgramLm.scoreAgainst]]'s contract with
    * the model side replaced by the summed stored partials, pruned to the
    * batch's bigram prefixes before aggregation. Bigrams absent from the
    * model contribute 0 micro-units but count in `n_bigrams` (unseen
    * transitions drag the mean down — the gate's signal). */
  def scoreBatch(batch: DataFrame, idCol: String, textCol: String,
      excludeToken: Option[String] = None): DataFrame = {
    val bg = NgramLm.bigramsOf(batch, textCol, col(idCol))
    CacheScope.withCached(bg)(
      scorePlan(batch, bg, idCol, excludeToken))
  }

  /** [[scoreBatch]] over a CALLER-computed (and caller-persisted)
    * per-doc bigram frame — the create-path fusion hook
    * ([[QualityProbeStore.create]] tokenizes the history once and feeds
    * both the frozen-LM build and this seed scoring). Result
    * materialized exactly like [[scoreBatch]]'s. */
  private[ext] def scoreBatchWith(batch: DataFrame, bg: DataFrame,
      idCol: String, excludeToken: Option[String] = None): DataFrame =
    scorePlan(batch, bg, idCol, excludeToken).localCheckpoint(true)

  /** The score's UN-materialized plan — plan-audit hook (the family's
    * `pairsPlanFor` precedent): every file scan must live under the model
    * path; batch text is tokenized from the (checkpointed) batch itself. */
  private[graft] def scorePlanFor(batch: DataFrame, idCol: String,
      textCol: String): DataFrame =
    scorePlan(batch, NgramLm.bigramsOf(batch, textCol, col(idCol)), idCol,
      None)

  private def scorePlan(batch: DataFrame, bg: DataFrame, idCol: String,
      excludeToken: Option[String]): DataFrame = {
    // prune the stored partials to the batch's prefixes BEFORE the model
    // aggregation: a kept prefix keeps ALL its rows, so its c1 is exact;
    // unneeded vocabulary never aggregates
    val prefixes = bg
      .select(split(col("__bg"), " ").getItem(0).as("__w1")).distinct()
    val pruned = countsRelOf(visible(excludeToken))
      .join(prefixes, Seq("__w1"), "left_semi")
    val model = pruned.groupBy("__w1", "__bg")
      .agg(sum(col("__c12")).as("__c12"))
    val prefix = model.groupBy("__w1").agg(sum(col("__c12")).as("__c1"))
    val scoredModel = model.join(prefix, "__w1")
      .select(col("__bg"), expr("(1000000 * __c12) div __c1").as("__micro"))
    val perDoc = bg.join(scoredModel, Seq("__bg"), "left_outer")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("__micro"), lit(0L))).as("sum_micro"))
    batch.select(col(idCol)).join(perDoc, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_micro"), lit(0L)).as("sum_micro"),
        coalesce(expr("sum_micro div n_bigrams"), lit(0L)).as("mean_micro"))
  }

  /** Keep batch documents whose stored-model `mean_micro` lies in
    * `[loMicro, hiMicro]` — the fluency-band gate against the persisted
    * model. */
  def keepBand(batch: DataFrame, idCol: String, textCol: String,
      loMicro: Long, hiMicro: Long,
      excludeToken: Option[String] = None): DataFrame = {
    val keep = scoreBatch(batch, idCol, textCol, excludeToken)
      .where(col("mean_micro").between(loMicro, hiMicro))
      .select(col(idCol))
    batch.join(keep, Seq(idCol), "left_semi")
  }

  // ---------------- IngestIndex ----------------

  def gateKeep(batch: DataFrame, idCol: String, textCol: String,
      excludeToken: Option[String]): DataFrame = {
    val st = stats
    keepBand(batch, idCol, textCol, st.loMicro, st.hiMicro, excludeToken)
  }

  def appendToken(df: DataFrame, idCol: String, textCol: String,
      token: String): Unit = { appendOnce(df, idCol, textCol, token); () }

  def seededBy(token: String): Boolean =
    log.read().headOption.exists(_.token.contains(token))
}

object NgramLmStore {

  /** The `counts/` relation's schema as written (data columns in write
    * order, then the discovered partition columns `append`, `wb` exactly
    * as inference would place them) — declared so no read of the
    * relation ever runs a schema-inference job; pinned against the real
    * layout by `StoreRelationSchemaSpec`. */
  private[ext] val countsSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("__w1", StringType),
      StructField("__bg", StringType),
      StructField("__c12", LongType),
      StructField("append", StringType),
      StructField("wb", IntegerType)))
  }

  /** Build a new stored model at `path` (must not already hold one) from
    * the history corpus — the one time history text is read. `loMicro` /
    * `hiMicro` pin the [[IngestIndex]] gate band. `seedToken` (if any)
    * rides the first commit so a build-if-absent caller can recognize
    * its own seed on crash-replay ([[IngestIndex.seededBy]]). */
  def build(history: DataFrame, idCol: String, textCol: String, path: String,
      buckets: Int = 16, loMicro: Long = 0L,
      hiMicro: Long = Long.MaxValue,
      seedToken: Option[String] = None): NgramLmStore = {
    require(buckets >= 1, "need buckets >= 1")
    require(loMicro >= 0L && loMicro <= hiMicro,
      "need 0 <= loMicro <= hiMicro")
    val idx = new NgramLmStore(history.sparkSession, path)
    idx.log.withWriteLock {
      idx.writeBatch(history, idCol, textCol,
        NgramLmStoreStats(0L, buckets, loMicro, hiMicro), first = true,
        token = seedToken)
    }
    idx
  }

  /** [[build]] over a CALLER-computed bigram-occurrence frame of the
    * same history (must carry `__bg`; caller persists it) — the
    * create-path fusion hook, see `bgOverride` in `writeBatch`. */
  private[ext] def buildFromBigrams(history: DataFrame, bg: DataFrame,
      path: String, buckets: Int = 16, loMicro: Long = 0L,
      hiMicro: Long = Long.MaxValue,
      seedToken: Option[String] = None): NgramLmStore = {
    val idx = new NgramLmStore(history.sparkSession, path)
    idx.log.withWriteLock {
      idx.writeBatch(history, "", "", // id/text unused under bgOverride
        NgramLmStoreStats(0L, buckets, loMicro, hiMicro), first = true,
        token = seedToken, bgOverride = Some(bg))
    }
    idx
  }

  /** Whether `path` holds at least one committed model manifest — the
    * build-if-absent probe of config-driven gate stages
    * ([[graft.plan.CurationConfig]]). */
  def exists(spark: SparkSession, path: String): Boolean =
    new ManifestLog(spark, path).read().nonEmpty

  /** Open a stored model; parameters come from its `stats/` row. */
  def open(spark: SparkSession, path: String): NgramLmStore = {
    val idx = new NgramLmStore(spark, path)
    idx.stats // fail fast on a missing/foreign layout
    idx
  }

  private def writeStats(spark: SparkSession, path: String,
      st: NgramLmStoreStats): Unit =
    StatsSidecar.write(spark, path, Seq(
      "bigram_rows" -> st.bigramRows.toString,
      "buckets" -> st.buckets.toString,
      "lo_micro" -> st.loMicro.toString,
      "hi_micro" -> st.hiMicro.toString))
}
