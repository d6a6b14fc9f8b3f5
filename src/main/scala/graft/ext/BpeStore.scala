package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stored statistics for [[BpeStore]]: advisory `wordRows` (count
  * partials on disk, not distinct words), the current model's ACTUAL
  * merge count `numMerges` (training may drain the pair space before
  * the budget is spent), and the `mergeBudget` it was trained with —
  * the config-stage identity parameter ([[graft.plan.CurationConfig]]
  * compares declared vs trained budgets, not drained actuals). */
final case class BpeStoreStats(wordRows: Long, numMerges: Int,
    mergeBudget: Int)

/** PERSISTED BPE vocabulary — [[BpeTrain]]'s training state made a
  * stored incremental artifact, the seventh member of the index family:
  * BPE training consumes ONLY the distinct-word count table
  * ([[BpeTrain.learnFromCounts]]), and word counts are ASSOCIATIVE, so
  * the corpus is tokenized once at [[BpeStore.create]]/[[appendOnce]]
  * time into (word, cnt) PARTIALS and [[retrain]] learns from the
  * SUMMED table — exactly the model a from-scratch [[BpeTrain.learn]]
  * over the union corpus would produce (spec- and oracle-gated), with
  * the corpus-sized text pass paid once per document ever. The trained
  * merge table persists alongside the counts, so [[tokenize]] (dq108's
  * [[graft.functions.SubwordTokenize]] kernel under the STORED
  * vocabulary) needs no training at open time at all.
  *
  * == Layout ==
  *
  * The [[ManifestLog]] marker-commit scheme shared by the family:
  *  - `words/append=<id>/` (word, cnt) — per-append word-count
  *    partials; readers SUM, compaction folds;
  *  - `model/append=<id>/` (step, left, right, pair_count) +
  *    `alphabet/` (sym, with the same dir id) — the trained merge
  *    table; a [[retrain]] commits a NEW model dir superseding the old
  *    (manifest `counts`/`supersedes_counts`, the compaction pattern),
  *    so the current model is always the last committed one;
  *  - `_commits/m<seq>` marker manifests; `appendOnce` tokens make
  *    ingest-loop count updates exactly-once.
  *
  * Scale shape: appends are one distributed word count over the batch
  * (map-side combined); [[retrain]] runs over the summed DISTINCT-WORD
  * table — the model-state bound of every production BPE trainer —
  * never over text; [[tokenize]] is a map-only codegen'd kernel with
  * the vocabulary in the plan.
  *
  * Cites the reference's expression surface only through dq107/dq108's
  * operators; the store itself is new Spark-side machinery.
  */
final class BpeStore private (
    private val spark: SparkSession, val path: String) {

  private val log = new ManifestLog(spark, path)

  /** Current stored statistics (appends move it; a driver-side
    * [[StatsSidecar]] parse — zero Spark jobs per read). */
  def stats: BpeStoreStats = {
    val kv = StatsSidecar.read(spark, path)
    BpeStoreStats(kv("word_rows").toLong, kv("num_merges").toInt,
      kv("merge_budget").toInt)
  }

  private def visible(excludeToken: Option[String]): Seq[Manifest] =
    log.read().filterNot(m => excludeToken.exists(m.token.contains))

  private def activeWordIds(ms: Seq[Manifest]): Seq[String] = {
    val sup = ms.flatMap(_.supersedesDigests).toSet
    ms.flatMap(_.digests).filterNot(sup)
  }

  /** The SUMMED word-count table over every committed append —
    * [[BpeTrain.wordCounts]]'s contract over the stored partials. */
  def wordCounts(excludeToken: Option[String] = None): DataFrame = {
    val ids = activeWordIds(visible(excludeToken))
    require(ids.nonEmpty, s"no committed word-count dirs under $path")
    RelRead.read(spark, s"$path#words",
      ids.map(id => s"$path/words/append=$id"),
      basePath = Some(s"$path/words"))
      .groupBy("word").agg(sum(col("cnt")).cast("long").as("cnt"))
  }

  // ---------------- writes ----------------

  /** Fold a batch's word counts into the store (the model is NOT
    * retrained — vocabulary stability until an explicit [[retrain]]).
    * Serialized with every other writer on the layout
    * ([[ManifestLog.withWriteLock]]). */
  def append(df: DataFrame, textCol: String): BpeStoreStats =
    log.withWriteLock { writeBatch(df, textCol, first = false, token = None) }

  /** [[append]] with an idempotence token — exactly-once count updates
    * (check-then-commit atomic under the writer lock). */
  def appendOnce(df: DataFrame, textCol: String,
      token: String): BpeStoreStats = {
    require(token.nonEmpty && !token.contains("\n"), "token: non-empty, one line")
    log.withWriteLock {
      if (log.read().exists(_.token.contains(token))) stats
      else writeBatch(df, textCol, first = false, token = Some(token))
    }
  }

  private def writeBatch(df: DataFrame, textCol: String, first: Boolean,
      token: Option[String]): BpeStoreStats = {
    val before = log.read()
    require(!first || before.isEmpty,
      s"$path already holds a committed store (create() wants a fresh path)")
    val seq = before.size + 1
    val id = f"a$seq%06d"
    val dir = s"$path/words/append=$id"
    log.clearOrphan(dir)
    BpeTrain.wordCounts(df, textCol)
      .coalesce(1).write.mode("errorifexists").parquet(dir)
    val added = graft.io.ParquetMeta.rowCount(spark, dir)
    // a FIRST append with zero words would leave the counts unreadable
    // (schema inference over only-empty dirs): refuse the degenerate
    // build with a clear error instead of wedging later
    require(!first || added > 0,
      s"cannot build a stored BPE state at $path from a corpus with no words")
    val prev = if (first) BpeStoreStats(0L, 0, 0) else stats
    val st = BpeStoreStats(prev.wordRows + added, prev.numMerges,
      prev.mergeBudget)
    // FIRST build: stats before the marker commit, so a crash in between
    // leaves exists()=false (reseedable) instead of a committed layout
    // open() cannot read; later appends write after the commit so the
    // advisory `wordRows` can go STALE on a crash (self-heals next
    // append) but never inflated (the NgramLmStore rule).
    if (first) BpeStore.writeStats(spark, path, st)
    log.commit(Manifest(Seq(id), Nil, Nil, Nil, token), seq)
    if (!first) BpeStore.writeStats(spark, path, st)
    maybeCompact()
    st
  }

  /** Fold word-partial dirs past
    * `spark.graft.bpestore.compactThreshold` (default 16) — the
    * [[NgramLmStore]] compaction contract: newest dir never folded,
    * superseded dirs stay for in-flight readers until [[vacuum]],
    * sum-identical by associativity. */
  private def maybeCompact(): Unit = {
    val threshold = IndexConf.strictInt(spark,
      "spark.graft.bpestore.compactThreshold", default = 16, min = 1)
    val ms = log.read()
    val foldable = activeWordIds(ms).dropRight(1)
    if (foldable.size > threshold) {
      val seq = ms.size + 1
      val cid = f"c$seq%06d"
      val dir = s"$path/words/append=$cid"
      log.clearOrphan(dir)
      RelRead.read(spark, s"$path#words",
        foldable.map(id => s"$path/words/append=$id"),
        basePath = Some(s"$path/words"))
        .groupBy("word").agg(sum(col("cnt")).as("cnt"))
        .coalesce(1).write.mode("errorifexists").parquet(dir)
      log.commit(Manifest(Seq(cid), Nil, Nil, Nil, None, foldable), seq)
    }
  }

  /** Unlink word dirs a compaction superseded and model dirs a retrain
    * superseded, under the retention guard and the writer lock. */
  def vacuum(): Int = log.withWriteLock {
    val f = log.fileSystem
    val words = log.vacuumEligible(_.supersedesDigests).count { id =>
      f.delete(new org.apache.hadoop.fs.Path(s"$path/words/append=$id"), true)
    }
    val models = log.vacuumEligible(_.supersedesCounts).count { id =>
      f.delete(new org.apache.hadoop.fs.Path(s"$path/model/append=$id"), true) |
      f.delete(new org.apache.hadoop.fs.Path(s"$path/alphabet/append=$id"), true)
    }
    words + models
  }

  // ---------------- the model ----------------

  private def currentModelId: String = {
    val ms = log.read()
    val sup = ms.flatMap(_.supersedesCounts).toSet
    val ids = ms.flatMap(_.counts).filterNot(sup)
    require(ids.nonEmpty, s"no committed model under $path")
    ids.last
  }

  /** Whether the store holds a committed model (merge table) — false in
    * the crash window of a [[BpeStore.create]] that committed its seed
    * word counts but died before the initial [[retrain]]; callers
    * ([[BpeStore.create]] itself on rerun, the config `bpe_tokenize`
    * stage) recover by retraining from the committed counts instead of
    * failing on a wedged layout. */
  def hasModel: Boolean = {
    val ms = log.read()
    val sup = ms.flatMap(_.supersedesCounts).toSet
    ms.flatMap(_.counts).filterNot(sup).nonEmpty
  }

  /** The stored CURRENT model — merge table + alphabet, no training. */
  def model: BpeTrain.Model = {
    val id = currentModelId
    val merges = spark.read.parquet(s"$path/model/append=$id")
      .orderBy("step").collect()
      .map(r => BpeTrain.Merge(r.getAs[Int]("step"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("pair_count")))
      .toSeq
    val alphabet = spark.read.parquet(s"$path/alphabet/append=$id")
      .orderBy("sym").collect().map(_.getString(0)).toSeq
    BpeTrain.Model(merges, alphabet)
  }

  /** Learn `numMerges` merges from the SUMMED stored counts — exactly
    * [[BpeTrain.learn]] over the corpus the counts describe, without
    * re-reading any text — and commit the result as the new current
    * model (superseding the old one, which [[vacuum]] may later
    * unlink). */
  def retrain(numMerges: Int): BpeTrain.Model =
    log.withWriteLock { retrainLocked(numMerges) }

  /** [[retrain]]'s body with the writer lock already held (NOT
    * reentrant — [[BpeStore.create]] runs seed + retrain in one lock). */
  private def retrainLocked(numMerges: Int): BpeTrain.Model = {
    val m = BpeTrain.learnFromCounts(wordCounts(), numMerges)
    writeModel(m, numMerges)
    m
  }

  private def writeModel(m: BpeTrain.Model, numMerges: Int): Unit = {
    import spark.implicits._
    val ms = log.read()
    val seq = ms.size + 1
    val id = f"a$seq%06d"
    val mdir = s"$path/model/append=$id"
    val adir = s"$path/alphabet/append=$id"
    log.clearOrphan(mdir); log.clearOrphan(adir)
    m.merges.map(g => (g.step, g.left, g.right, g.pairCount))
      .toDF("step", "left", "right", "pair_count")
      .coalesce(1).write.mode("errorifexists").parquet(mdir)
    m.alphabet.toDF("sym")
      .coalesce(1).write.mode("errorifexists").parquet(adir)
    val sup = ms.flatMap(_.supersedesCounts).toSet
    val prevModels = ms.flatMap(_.counts).filterNot(sup)
    log.commit(Manifest(Nil, Nil, Seq(id), prevModels, None), seq)
    BpeStore.writeStats(spark, path,
      BpeStoreStats(stats.wordRows, m.merges.size, numMerges))
  }

  // ---------------- inference ----------------

  /** The subtoken COLUMN under the STORED vocabulary — dq108's
    * inference kernel ([[graft.functions.SubwordTokenize]], codegen'd,
    * map-only) with the vocabulary read from the model dir instead of
    * trained per call. A Column, so callers compose it without a join
    * (duplicate-id inputs stay one-row-per-input). */
  def tokenizeColumn(textCol: String): org.apache.spark.sql.Column =
    graft.functions.SubwordTokenize(
      regexp_replace(lower(col(textCol)), "\\W+", " "), model.vocab)

  /** (idCol, subtokens) — [[tokenizeColumn]] projected over `df`. */
  def tokenize(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), tokenizeColumn(textCol).as("subtokens"))
}

object BpeStore {

  /** Build a new store at `path` (must be fresh): one word count over
    * the history corpus — the one time history text is read — then an
    * initial [[BpeStore.retrain]] with `numMerges`.
    *
    * Crash-replayable (the [[QualityProbeStore.create]] rule): a
    * predecessor that died between the seed word-count commit and the
    * initial retrain left committed words but no committed model — a
    * rerun runs the missing retrain from the committed counts (identical
    * model: training consumes only the summed count table) instead of
    * refusing on a wedged layout. */
  def create(history: DataFrame, textCol: String, path: String,
      numMerges: Int): BpeStore = {
    val store = new BpeStore(history.sparkSession, path)
    store.log.withWriteLock {
      if (BpeStore.exists(history.sparkSession, path) && !store.hasModel)
        store.retrainLocked(numMerges)
      else {
        store.writeBatch(history, textCol, first = true, token = None)
        store.retrainLocked(numMerges)
      }
    }
    store
  }

  /** Whether `path` holds at least one committed manifest — the
    * build-if-absent probe of config-driven stages
    * ([[graft.plan.CurationConfig]]). */
  def exists(spark: SparkSession, path: String): Boolean =
    new ManifestLog(spark, path).read().nonEmpty

  /** Open a stored vocabulary (+ counts). */
  def open(spark: SparkSession, path: String): BpeStore = {
    val store = new BpeStore(spark, path)
    store.stats // fail fast on a missing/foreign layout
    store
  }

  private def writeStats(spark: SparkSession, path: String,
      st: BpeStoreStats): Unit =
    StatsSidecar.write(spark, path, Seq(
      "word_rows" -> st.wordRows.toString,
      "num_merges" -> st.numMerges.toString,
      "merge_budget" -> st.mergeBudget.toString))
}
