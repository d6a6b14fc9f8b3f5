package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stored statistics for [[SubstrIndex]]: `digests` the (advisory) stored
  * digest count — the Bloom sizing feed, an over-count across appends is
  * harmless — and `k`, the window width, so a reader can't probe a stored
  * index with mismatched windowing. */
final case class SubstrIndexStats(digests: Long, k: Int)

/** PERSISTED exact-substring gate index — the production form of
  * [[ExactSubstring.dupWindowReport]]'s incremental loop (that call
  * re-derives history's window digests per batch; the class doc promises
  * a stored layout, this is it): history is tokenized and window-digested
  * ONCE, at [[SubstrIndex.build]]/[[append]] time, and every later batch
  * gates against the stored digest relation. History TEXT is never read
  * again — the gate's only history input is `digests/` (16-byte md5 keys).
  *
  * == Layout ==
  *
  * [[NearDupIndex]]'s manifest-committed append-only scheme
  * ([[ManifestLog]]), specialized to one relation:
  *  - `digests/append=<id>/` (dg) — the per-append DISTINCT window
  *    digests (cross-append duplicates are fine: the gate is a
  *    membership semi-join);
  *  - `_commits/m<seq>` — marker manifests; un-committed data dirs from
  *    a crashed writer stay invisible;
  *  - `stats/` — one [[SubstrIndexStats]] row, refreshed after each
  *    commit: `digests` sizes the gate's Bloom filter so no query runs a
  *    count job over the index (statistics-fed, advisory: staleness
  *    costs filter bits, never correctness), `k` pins the window width.
  *
  * == Gate shape ([[dupWindowReport]]/[[keepFresh]]) ==
  *
  * Identical to the per-call [[ExactSubstring.dupWindowReport]] stage for
  * stage — Bloom split (sized from stored stats) so provably-fresh batch
  * windows never enter the digest join; only the might-seen minority
  * shuffles against `digests/` — with the history derivation replaced by
  * the stored relation. Exactly-once streaming loops use
  * [[appendToken]] + `excludeToken` (the [[IngestIndex]] contract): a
  * replayed micro-batch gates against the index as it stood before its
  * own committed append and the re-append is a no-op.
  */
final class SubstrIndex private (
    private val spark: SparkSession, val path: String) extends IngestIndex {

  private val log = new ManifestLog(spark, path)

  /** Current stored statistics (appends move it; a driver-side
    * [[StatsSidecar]] parse — zero Spark jobs per read). */
  def stats: SubstrIndexStats = {
    val kv = StatsSidecar.read(spark, path)
    SubstrIndexStats(kv("digests").toLong, kv("k").toInt)
  }

  private def visible(excludeToken: Option[String]): Seq[Manifest] =
    log.read().filterNot(m => excludeToken.exists(m.token.contains))

  /** Active digest dir ids: all published, minus any a later compaction
    * superseded. */
  private def activeIds(ms: Seq[Manifest]): Seq[String] = {
    val sup = ms.flatMap(_.supersedesDigests).toSet
    ms.flatMap(_.digests).filterNot(sup)
  }

  private def digestsRelOf(ms: Seq[Manifest]): DataFrame = {
    val ids = activeIds(ms)
    require(ids.nonEmpty, s"no committed digest dirs under $path")
    RelRead.read(spark, s"$path#digests",
      ids.map(id => s"$path/digests/append=$id"),
      schema = Some(SubstrIndex.digestsSchema))
  }

  // ---------------- writes ----------------

  /** Index a batch's window digests: one fresh `append=<id>` dir, one
    * marker commit, stats refreshed. Call with the rows a [[keepFresh]]
    * gate accepted, MATERIALIZED first (`localCheckpoint(true)`) — the
    * gate result's plan reads this index. */
  def append(df: DataFrame, idCol: String, textCol: String): SubstrIndexStats =
    log.withWriteLock {
      writeBatch(df, idCol, textCol, stats, first = false, token = None)
    }

  /** [[append]] with an idempotence token — the exactly-once append: a
    * committed manifest carrying `token` makes the call a no-op. */
  def appendOnce(df: DataFrame, idCol: String, textCol: String,
      token: String): SubstrIndexStats = {
    require(token.nonEmpty && !token.contains("\n"), "token: non-empty, one line")
    log.withWriteLock {
      if (log.read().exists(_.token.contains(token))) stats
      else writeBatch(df, idCol, textCol, stats, first = false,
        token = Some(token))
    }
  }

  private def writeBatch(df: DataFrame, idCol: String, textCol: String,
      prev: SubstrIndexStats, first: Boolean,
      token: Option[String]): SubstrIndexStats = {
    val before = log.read()
    require(!first || before.isEmpty,
      s"$path already holds a committed index (build() wants a fresh path)")
    val seq = before.size + 1
    val id = f"a$seq%06d"
    val dgs = ExactSubstring
      .windowDigestsOf(ExactSubstring.tokenize(df, idCol, textCol),
        idCol, prev.k)
      .select("dg").distinct()
    // a crashed predecessor's uncommitted dir (invisible by construction)
    // must not wedge the replay on errorifexists
    log.clearOrphan(s"$path/digests/append=$id")
    dgs.write.mode("errorifexists").parquet(s"$path/digests/append=$id")
    // footer-summed row count: no re-scan job over the dir just written
    val added = graft.io.ParquetMeta.rowCount(spark, s"$path/digests/append=$id")
    // a FIRST append with zero digests would leave the index unreadable
    // (every later read infers schema over only-empty dirs): refuse the
    // degenerate build with a clear error instead of wedging later
    require(!first || added > 0,
      s"cannot build a stored index at $path from a corpus with no " +
        s"${prev.k}-token windows")
    log.commit(Manifest(Seq(id), Nil, Nil, Nil, token), seq) // now visible
    val st = SubstrIndexStats(prev.digests + added, prev.k)
    SubstrIndex.writeStats(spark, path, st)
    maybeCompact()
    st
  }

  /** Fold the digest dirs into one DISTINCT relation once the active dir
    * count passes `spark.graft.substrindex.compactThreshold` (default 16)
    * — bounds the gate's file listing across unbounded append loops, and
    * de-duplicates cross-append digests (shrinking both the scan and the
    * Bloom over-count). The NEWEST dir is never folded: it may belong to
    * a token append a streaming engine could still replay (the
    * `excludeToken` view must be able to drop it). Published as a
    * superseding commit; superseded dirs stay on disk for in-flight
    * readers until [[vacuum]].
    */
  private def maybeCompact(): Unit = {
    val threshold = IndexConf.strictInt(spark,
      "spark.graft.substrindex.compactThreshold", default = 16, min = 1)
    val ms = log.read()
    val foldable = activeIds(ms).dropRight(1)
    if (foldable.size > threshold) {
      val seq = ms.size + 1
      val cid = f"c$seq%06d"
      log.clearOrphan(s"$path/digests/append=$cid")
      RelRead.read(spark, s"$path#digests",
        foldable.map(id => s"$path/digests/append=$id"),
        schema = Some(SubstrIndex.digestsSchema))
        .distinct()
        .coalesce(4)
        .write.mode("errorifexists").parquet(s"$path/digests/append=$cid")
      log.commit(Manifest(Seq(cid), Nil, Nil, Nil, None, foldable), seq)
    }
  }

  /** Unlink digest dirs a compaction superseded, under the retention
    * guard ([[ManifestLog.vacuumEligible]]): only dirs whose superseding
    * commit is at least `spark.graft.index.vacuumRetentionMs` old
    * (default 1h) are touched — an in-flight reader that planned its scan
    * before the compaction gets the window to finish. Locked writer.
    * Returns the number of dirs removed. */
  def vacuum(): Int = log.withWriteLock {
    val f = log.fileSystem
    log.vacuumEligible(_.supersedesDigests).count { id =>
      f.delete(new org.apache.hadoop.fs.Path(s"$path/digests/append=$id"), true)
    }
  }

  // ---------------- queries ----------------

  /** Per batch document: total k-window count and how many of its windows
    * already occur in the INDEXED history —
    * [[ExactSubstring.dupWindowReport]] against the stored relation.
    * The Bloom filter is sized from stored stats (no count job); its
    * content is always built from the committed digest relation itself.
    */
  def dupWindowReport(batch: DataFrame, idCol: String, textCol: String,
      fpp: Double = 0.01, excludeToken: Option[String] = None): DataFrame = {
    val bw = ExactSubstring.windowDigestsOf(
      ExactSubstring.tokenize(batch, idCol, textCol), idCol, stats.k)
    CacheScope.withCached(bw)(
      reportPlan(batch, bw, idCol, fpp, excludeToken))
  }

  /** The gate's UN-materialized plan — plan-audit hook (the
    * [[NearDupIndex.pairsPlanFor]] precedent): the production wrapper
    * collapses its result with a call-scoped checkpoint before a spec
    * could walk it for the no-history-scan property. */
  private[graft] def reportPlanFor(batch: DataFrame, idCol: String,
      textCol: String): DataFrame =
    reportPlan(batch, ExactSubstring.windowDigestsOf(
      ExactSubstring.tokenize(batch, idCol, textCol), idCol, stats.k),
      idCol, 0.01, None)

  private def reportPlan(batch: DataFrame, bw: DataFrame, idCol: String,
      fpp: Double, excludeToken: Option[String]): DataFrame = {
    val st = stats
    val hw = digestsRelOf(visible(excludeToken))
    val bloom = BloomPrune.buildFilter(hw, "dg",
      math.max(1L, st.digests), fpp)
    val (maybeSeen, _) = BloomPrune.split(bw, "dg", bloom)
    val dup = maybeSeen.join(hw, Seq("dg"), "left_semi")
      .groupBy(idCol).agg(count(lit(1)).as("n_dup_windows"))
    val totals = bw.groupBy(idCol).agg(count(lit(1)).as("n_windows"))
    batch.select(col(idCol))
      .join(totals, Seq(idCol), "left_outer")
      .join(dup, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"))
  }

  /** Keep batch documents with at most `maxDupWindows` windows already in
    * history (default 0: no verbatim overlap at all) — the ingest gate. */
  def keepFresh(batch: DataFrame, idCol: String, textCol: String,
      maxDupWindows: Long = 0L, fpp: Double = 0.01,
      excludeToken: Option[String] = None): DataFrame = {
    val keep = dupWindowReport(batch, idCol, textCol, fpp, excludeToken)
      .where(col("n_dup_windows") <= maxDupWindows)
      .select(col(idCol))
    batch.join(keep, Seq(idCol), "left_semi")
  }

  // ---------------- IngestIndex ----------------

  def gateKeep(batch: DataFrame, idCol: String, textCol: String,
      excludeToken: Option[String]): DataFrame =
    keepFresh(batch, idCol, textCol, excludeToken = excludeToken)

  def appendToken(df: DataFrame, idCol: String, textCol: String,
      token: String): Unit = { appendOnce(df, idCol, textCol, token); () }

  def seededBy(token: String): Boolean =
    log.read().headOption.exists(_.token.contains(token))
}

object SubstrIndex {

  /** The `digests/` relation's schema as written ([[ExactSubstring
    * .windowDigestsOf]]'s `dg` projection) — declared so no read of the
    * relation ever runs a schema-inference job; pinned against the real
    * layout by `StoreRelationSchemaSpec`. */
  private[ext] val digestsSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("dg",
        org.apache.spark.sql.types.StringType)))

  /** Build a new index at `path` (must not already hold one) from the
    * history corpus — the one time history text is read. `seedToken` (if
    * any) rides the first commit so a build-if-absent caller can
    * recognize its own seed on crash-replay ([[IngestIndex.seededBy]]). */
  def build(history: DataFrame, idCol: String, textCol: String, path: String,
      k: Int = 8, seedToken: Option[String] = None): SubstrIndex = {
    require(k >= 2, "need k >= 2")
    val idx = new SubstrIndex(history.sparkSession, path)
    idx.log.withWriteLock {
      idx.writeBatch(history, idCol, textCol, SubstrIndexStats(0L, k),
        first = true, token = seedToken)
    }
    idx
  }

  /** Whether `path` holds at least one committed index manifest — the
    * build-if-absent probe of config-driven gate stages
    * ([[graft.plan.CurationConfig]]). Uncommitted orphan dirs do not
    * count (they are invisible to every reader). */
  def exists(spark: SparkSession, path: String): Boolean =
    new ManifestLog(spark, path).read().nonEmpty

  /** Open a stored index; `k` comes from its `stats/` row. */
  def open(spark: SparkSession, path: String): SubstrIndex = {
    val idx = new SubstrIndex(spark, path)
    idx.stats // fail fast on a missing/foreign layout
    idx
  }

  private def writeStats(spark: SparkSession, path: String,
      st: SubstrIndexStats): Unit =
    StatsSidecar.write(spark, path, Seq(
      "digests" -> st.digests.toString, "k" -> st.k.toString))
}
