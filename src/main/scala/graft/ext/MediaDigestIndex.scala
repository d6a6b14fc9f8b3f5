package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stored statistics for [[MediaDigestIndex]]: the (advisory) stored
  * digest count — the gate's Bloom sizing feed; an over-count across
  * appends costs filter bits, never correctness. */
final case class MediaDigestIndexStats(digests: Long)

/** PERSISTED exact-payload gate index — the STORE-MEDIATED form of
  * [[MediaDedup.exactByPayload]] (r15 verdict #1: the declared
  * `media_dedup` stage is within-frame; "drop payloads seen in any
  * EARLIER batch" needs history, and history gates go through a store):
  * history payloads are digested ONCE, at [[MediaDigestIndex.build]] /
  * [[append]] time, and every later batch gates against the stored
  * digest relation. History payload BYTES are never read again — the
  * gate's only history input is `digests/` (32-hex-char
  * [[MediaDedup.payloadDigest]] keys, the same hex-domain identity the
  * within-frame stage uses, so batch-vs-history and within-frame
  * decisions can never disagree about what "byte-identical" means).
  *
  * == Layout ==
  *
  * [[SubstrIndex]]'s manifest-committed append-only scheme
  * ([[ManifestLog]]), one relation:
  *  - `digests/append=<id>/` (dg) — per-append DISTINCT payload digests
  *    (cross-append duplicates are fine: the gate is a membership
  *    anti-join);
  *  - `_commits/m<seq>` marker manifests — un-committed dirs from a
  *    crashed writer stay invisible;
  *  - `stats/` — one [[MediaDigestIndexStats]] row, refreshed after
  *    each commit (statistics-fed Bloom sizing, no count job per gate).
  *
  * == Gate shape ([[keepUnseenPayloads]]) ==
  *
  * [[Dedup.keepUnseen]]'s split with the history derivation replaced by
  * the stored relation: a Bloom filter over stored digests (sized from
  * stats) passes provably-fresh batch payloads without any join — only
  * the might-seen minority anti-joins `digests/`. GATE SEMANTICS ARE
  * HISTORY-ONLY: two copies of a fresh payload in ONE batch both pass
  * (and one distinct digest is stored) — compose a within-frame
  * `media_dedup` stage before the gate when batch-internal copies must
  * also collapse, exactly like `exact_dedup` before `substr_gate`.
  * Exactly-once streaming loops use [[appendToken]] + `excludeToken`
  * (the [[IngestIndex]] contract): a replayed micro-batch gates against
  * the index as it stood before its own committed append, and the
  * re-append is a no-op.
  */
final class MediaDigestIndex private (
    private val spark: SparkSession, val path: String) extends IngestIndex {

  /** Current stored statistics (appends move it; a driver-side
    * [[StatsSidecar]] parse — zero Spark jobs per read). */
  def stats: MediaDigestIndexStats =
    MediaDigestIndexStats(StatsSidecar.read(spark, path)("digests").toLong)

  private val log = new ManifestLog(spark, path)

  private def visible(excludeToken: Option[String]): Seq[Manifest] =
    log.read().filterNot(m => excludeToken.exists(m.token.contains))

  private def activeIds(ms: Seq[Manifest]): Seq[String] = {
    val sup = ms.flatMap(_.supersedesDigests).toSet
    ms.flatMap(_.digests).filterNot(sup)
  }

  private def digestsRelOf(ms: Seq[Manifest]): DataFrame = {
    val ids = activeIds(ms)
    require(ids.nonEmpty, s"no committed digest dirs under $path")
    RelRead.read(spark, s"$path#digests",
      ids.map(id => s"$path/digests/append=$id"))
  }

  // ---------------- writes ----------------

  /** Index a batch's payload digests: one fresh `append=<id>` dir, one
    * marker commit, stats refreshed. Call with the rows a gate
    * accepted, MATERIALIZED first (`localCheckpoint(true)`) — the gate
    * result's plan reads this index. */
  def append(df: DataFrame, idCol: String,
      payloadCol: String): MediaDigestIndexStats =
    log.withWriteLock {
      writeBatch(df, payloadCol, stats, first = false, token = None)
    }

  /** [[append]] with an idempotence token — the exactly-once append: a
    * committed manifest carrying `token` makes the call a no-op. */
  def appendOnce(df: DataFrame, idCol: String, payloadCol: String,
      token: String): MediaDigestIndexStats = {
    require(token.nonEmpty && !token.contains("\n"),
      "token: non-empty, one line")
    log.withWriteLock {
      if (log.read().exists(_.token.contains(token))) stats
      else writeBatch(df, payloadCol, stats, first = false,
        token = Some(token))
    }
  }

  private def writeBatch(df: DataFrame, payloadCol: String,
      prev: MediaDigestIndexStats, first: Boolean,
      token: Option[String]): MediaDigestIndexStats = {
    val before = log.read()
    require(!first || before.isEmpty,
      s"$path already holds a committed index (build() wants a fresh path)")
    val seq = before.size + 1
    val id = f"a$seq%06d"
    val dgs = df
      .select(MediaDedup.payloadDigest(col(payloadCol)).as("dg"))
      .filter(col("dg").isNotNull) // null payloads carry no identity
      .distinct()
    log.clearOrphan(s"$path/digests/append=$id")
    dgs.write.mode("errorifexists").parquet(s"$path/digests/append=$id")
    RelRead.seed(s"$path#digests", dgs.schema) // same-JVM gate skips inference
    val added = graft.io.ParquetMeta.rowCount(spark,
      s"$path/digests/append=$id")
    // a FIRST append with zero digests would leave the index unreadable
    // (every later read infers schema over only-empty dirs)
    require(!first || added > 0,
      s"cannot build a stored index at $path from a corpus with no " +
        "non-null payloads")
    log.commit(Manifest(Seq(id), Nil, Nil, Nil, token), seq)
    val st = MediaDigestIndexStats(prev.digests + added)
    MediaDigestIndex.writeStats(spark, path, st)
    maybeCompact()
    st
  }

  /** Fold digest dirs into one DISTINCT relation past
    * `spark.graft.mediadigest.compactThreshold` active dirs (default
    * 16) — bounds the gate's file listing across unbounded append
    * loops. The NEWEST dir is never folded (the token-replay window).
    * Published as a superseding commit; superseded dirs stay for
    * in-flight readers until [[vacuum]]. */
  private def maybeCompact(): Unit = {
    val threshold = IndexConf.strictInt(spark,
      "spark.graft.mediadigest.compactThreshold", default = 16, min = 1)
    val ms = log.read()
    val foldable = activeIds(ms).dropRight(1)
    if (foldable.size > threshold) {
      val seq = ms.size + 1
      val cid = f"c$seq%06d"
      log.clearOrphan(s"$path/digests/append=$cid")
      RelRead.read(spark, s"$path#digests",
        foldable.map(id => s"$path/digests/append=$id"))
        .distinct()
        .coalesce(4)
        .write.mode("errorifexists").parquet(s"$path/digests/append=$cid")
      log.commit(Manifest(Seq(cid), Nil, Nil, Nil, None, foldable), seq)
    }
  }

  /** Unlink digest dirs a compaction superseded, under the family
    * retention guard ([[ManifestLog.vacuumEligible]]). Locked writer;
    * returns the number of dirs removed. */
  def vacuum(): Int = log.withWriteLock {
    val f = log.fileSystem
    log.vacuumEligible(_.supersedesDigests).count { id =>
      f.delete(
        new org.apache.hadoop.fs.Path(s"$path/digests/append=$id"), true)
    }
  }

  // ---------------- queries ----------------

  /** Keep batch rows whose payload digest has never been stored —
    * [[Dedup.keepUnseen]] against the stored relation: the Bloom filter
    * (sized from stored stats) passes definitely-fresh rows without a
    * join; only the might-seen minority rides the digest anti-join.
    * Null payloads are always kept (they carry no identity to collide
    * on). */
  def keepUnseenPayloads(batch: DataFrame, idCol: String,
      payloadCol: String, fpp: Double = 0.01,
      excludeToken: Option[String] = None): DataFrame = {
    val st = stats
    val hw = digestsRelOf(visible(excludeToken))
    val bloom = BloomPrune.buildFilter(hw, "dg",
      math.max(1L, st.digests), fpp)
    val inc = batch.withColumn("__dg",
      MediaDedup.payloadDigest(col(payloadCol)))
    val nullPayload = inc.filter(col("__dg").isNull)
    val (maybeSeen, definitelyNew) =
      BloomPrune.split(inc.filter(col("__dg").isNotNull), "__dg", bloom)
    val verifiedNew = maybeSeen
      .join(hw, col("__dg") === col("dg"), "left_anti")
      .select(definitelyNew.columns.map(col): _*)
    definitelyNew.union(verifiedNew).union(nullPayload).drop("__dg")
  }

  // ---------------- IngestIndex ----------------

  /** The generic-loop gate: `textCol` IS the binary payload column for
    * this modality (the [[IngestIndex]] contract names it text because
    * four of six stores gate on text). */
  def gateKeep(batch: DataFrame, idCol: String, textCol: String,
      excludeToken: Option[String]): DataFrame =
    keepUnseenPayloads(batch, idCol, textCol, excludeToken = excludeToken)

  def appendToken(df: DataFrame, idCol: String, textCol: String,
      token: String): Unit = { appendOnce(df, idCol, textCol, token); () }

  def seededBy(token: String): Boolean =
    log.read().headOption.exists(_.token.contains(token))
}

object MediaDigestIndex {

  /** Build a new index at `path` (must not already hold one) from the
    * history corpus — the one time history payloads are read.
    * `seedToken` rides the first commit so a build-if-absent caller can
    * recognize its own seed on crash-replay ([[IngestIndex.seededBy]]). */
  def build(history: DataFrame, idCol: String, payloadCol: String,
      path: String, seedToken: Option[String] = None): MediaDigestIndex = {
    val idx = new MediaDigestIndex(history.sparkSession, path)
    idx.log.withWriteLock {
      idx.writeBatch(history, payloadCol, MediaDigestIndexStats(0L),
        first = true, token = seedToken)
    }
    idx
  }

  /** Whether `path` holds at least one committed index manifest — the
    * build-if-absent probe of config-driven gate stages. */
  def exists(spark: SparkSession, path: String): Boolean =
    new ManifestLog(spark, path).read().nonEmpty

  /** Open a stored index (fails fast on a missing/foreign layout). */
  def open(spark: SparkSession, path: String): MediaDigestIndex = {
    val idx = new MediaDigestIndex(spark, path)
    idx.stats
    idx
  }

  private def writeStats(spark: SparkSession, path: String,
      st: MediaDigestIndexStats): Unit =
    StatsSidecar.write(spark, path,
      Seq("digests" -> st.digests.toString))
}
