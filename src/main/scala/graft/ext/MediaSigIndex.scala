package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stored statistics for [[MediaSigIndex]]: `sigRows` the (advisory)
  * stored signature-row count — the Bloom sizing feed — and the
  * signature parameters, pinned so a reader can't probe a stored index
  * with mismatched blocking. */
final case class MediaSigIndexStats(sigRows: Long, blocks: Int,
    minMatch: Int, maxBucket: Int)

/** PERSISTED blocked-signature gate index — the NEAR-dup sibling of
  * [[MediaDigestIndex]] (exact gate) and the store-mediated form of
  * [[MediaDedup.nearDupPairsBytes]] (within-frame near dedup): history
  * payloads are signature'd ONCE — `blocks` equal-stride hex-slice md5s
  * per payload ([[MediaDedup.signatureRows]], the SimHash pigeonhole on
  * bytes) — and every later batch drops rows whose payload shares ≥
  * `minMatch` block hashes AT THE SAME OFFSET with some same-length
  * stored payload. History payload BYTES are never read again; the
  * gate's only history input is `sigs/` (32-hex-char block hashes).
  *
  * == Layout ==
  *
  * [[SubstrIndex]]'s manifest-committed append-only scheme, one
  * relation:
  *  - `sigs/append=<id>/` (vid, nb, i, bh) — per-append signature rows
  *    (`blocks` rows per payload);
  *  - `_commits/m<seq>` marker manifests; `stats/` one
  *    [[MediaSigIndexStats]] row (Bloom sizing + parameter pins).
  *
  * == Gate shape ([[keepFarPayloads]]) ==
  *
  * [[MinHashLSH.nearDupPairsVsHistory]]'s architecture with band keys
  * replaced by `(nb, i, bh)` buckets: stored buckets larger than
  * `maxBucket` are dropped at read (the LSH guard — a degenerate shared
  * block cannot go quadratic), a Bloom filter over the surviving
  * composite keys passes provably-fresh batch blocks without any join,
  * and only the might-seen minority rides the signature equi-join; a
  * batch row drops when any stored vid accumulates ≥ `minMatch`
  * matches. NO self-id exclusion (the gate contract: a stored row
  * bearing the batch row's own id is duplicate evidence — replays drop
  * through their own append). Byte-identical payloads share all
  * `blocks` hashes, so the near gate subsumes the exact gate at the
  * same parameters. Exactly-once loops use [[appendToken]] +
  * `excludeToken` (the [[IngestIndex]] contract).
  */
final class MediaSigIndex private (
    private val spark: SparkSession, val path: String) extends IngestIndex {

  /** Current stored statistics (appends move it; a driver-side
    * [[StatsSidecar]] parse — zero Spark jobs per read). */
  def stats: MediaSigIndexStats = {
    val kv = StatsSidecar.read(spark, path)
    MediaSigIndexStats(kv("sig_rows").toLong, kv("blocks").toInt,
      kv("min_match").toInt, kv("max_bucket").toInt)
  }

  private val log = new ManifestLog(spark, path)

  private def visible(excludeToken: Option[String]): Seq[Manifest] =
    log.read().filterNot(m => excludeToken.exists(m.token.contains))

  private def activeIds(ms: Seq[Manifest]): Seq[String] = {
    val sup = ms.flatMap(_.supersedesDigests).toSet
    ms.flatMap(_.digests).filterNot(sup)
  }

  private def sigsRelOf(ms: Seq[Manifest]): DataFrame = {
    val ids = activeIds(ms)
    require(ids.nonEmpty, s"no committed signature dirs under $path")
    RelRead.read(spark, s"$path#sigs",
      ids.map(id => s"$path/sigs/append=$id"))
  }

  // ---------------- writes ----------------

  /** Index a batch's signature rows: one fresh `append=<id>` dir, one
    * marker commit, stats refreshed. Call with the rows a gate
    * accepted, MATERIALIZED first. */
  def append(df: DataFrame, idCol: String,
      payloadCol: String): MediaSigIndexStats =
    log.withWriteLock {
      writeBatch(df, idCol, payloadCol, stats, first = false, token = None)
    }

  /** [[append]] with an idempotence token — exactly-once. */
  def appendOnce(df: DataFrame, idCol: String, payloadCol: String,
      token: String): MediaSigIndexStats = {
    require(token.nonEmpty && !token.contains("\n"),
      "token: non-empty, one line")
    log.withWriteLock {
      if (log.read().exists(_.token.contains(token))) stats
      else writeBatch(df, idCol, payloadCol, stats, first = false,
        token = Some(token))
    }
  }

  private def writeBatch(df: DataFrame, idCol: String, payloadCol: String,
      prev: MediaSigIndexStats, first: Boolean,
      token: Option[String]): MediaSigIndexStats = {
    val before = log.read()
    require(!first || before.isEmpty,
      s"$path already holds a committed index (build() wants a fresh path)")
    val seq = before.size + 1
    val id = f"a$seq%06d"
    val sigs = MediaDedup.signatureRows(
        df.filter(col(payloadCol).isNotNull), idCol, payloadCol,
        prev.blocks)
      .withColumnRenamed("doc_id", "vid")
    log.clearOrphan(s"$path/sigs/append=$id")
    sigs.write.mode("errorifexists").parquet(s"$path/sigs/append=$id")
    RelRead.seed(s"$path#sigs", sigs.schema) // same-JVM gate skips inference
    val added = graft.io.ParquetMeta.rowCount(spark,
      s"$path/sigs/append=$id")
    require(!first || added > 0,
      s"cannot build a stored index at $path from a corpus with no " +
        "non-null payloads")
    log.commit(Manifest(Seq(id), Nil, Nil, Nil, token), seq)
    val st = MediaSigIndexStats(prev.sigRows + added, prev.blocks,
      prev.minMatch, prev.maxBucket)
    MediaSigIndex.writeStats(spark, path, st)
    maybeCompact()
    st
  }

  /** Fold signature dirs past
    * `spark.graft.mediasig.compactThreshold` (default 16) active dirs;
    * the NEWEST dir is never folded (the token-replay window). Straight
    * union rewrite — signature rows are already per-payload facts. */
  private def maybeCompact(): Unit = {
    val threshold = IndexConf.strictInt(spark,
      "spark.graft.mediasig.compactThreshold", default = 16, min = 1)
    val ms = log.read()
    val foldable = activeIds(ms).dropRight(1)
    if (foldable.size > threshold) {
      val seq = ms.size + 1
      val cid = f"c$seq%06d"
      log.clearOrphan(s"$path/sigs/append=$cid")
      RelRead.read(spark, s"$path#sigs",
        foldable.map(id => s"$path/sigs/append=$id"))
        .coalesce(4)
        .write.mode("errorifexists").parquet(s"$path/sigs/append=$cid")
      log.commit(Manifest(Seq(cid), Nil, Nil, Nil, None, foldable), seq)
    }
  }

  /** Unlink signature dirs a compaction superseded, under the family
    * retention guard. Locked writer; returns dirs removed. */
  def vacuum(): Int = log.withWriteLock {
    val f = log.fileSystem
    log.vacuumEligible(_.supersedesDigests).count { id =>
      f.delete(
        new org.apache.hadoop.fs.Path(s"$path/sigs/append=$id"), true)
    }
  }

  // ---------------- queries ----------------

  /** Keep batch rows whose payload is NEAR-identical to NO stored
    * payload: same length and ≥ `minMatch` of `blocks` block hashes at
    * the same offset. Bloom-split on the stored composite keys (sized
    * from stats), over-cap stored buckets dropped at read, exact match
    * counting only on the might-seen minority. Null payloads always
    * pass. */
  def keepFarPayloads(batch: DataFrame, idCol: String,
      payloadCol: String, fpp: Double = 0.01,
      excludeToken: Option[String] = None): DataFrame = {
    val st = stats
    val hw = sigsRelOf(visible(excludeToken))
      // the LSH cap, applied at read over the ACTIVE relation (an
      // append can grow a bucket past the cap later; the decision must
      // reflect the store as gated against, not write-time snapshots)
      .withColumn("__c", count(lit(1))
        .over(Window.partitionBy("nb", "i", "bh")))
      .filter(col("__c") <= st.maxBucket)
      .drop("__c")
    CacheScope.withCached(hw) {
      // a degenerate store (every bucket over the cap) leaves the capped
      // relation EMPTY — no stored key can match anything, and Spark's
      // stat.bloomFilter over zero rows is the null-bits filter that
      // throws on every probe, so the empty case must short-circuit
      if (hw.head(1).isEmpty) batch
      else {
        val keyStr = concat_ws("|", col("nb"), col("i"), col("bh"))
        val bloom = BloomPrune.buildFilter(hw.select(keyStr.as("__k")),
          "__k", math.max(1L, st.sigRows), fpp)
        val bs = MediaDedup.signatureRows(
          batch.filter(col(payloadCol).isNotNull), idCol, payloadCol,
          st.blocks)
          .withColumnRenamed("doc_id", "__b_id")
          .withColumn("__k", keyStr)
        val (maybeSeen, _) = BloomPrune.split(bs, "__k", bloom)
        val dup = maybeSeen
          .join(hw.select(col("vid").as("__h_id"), col("nb"), col("i"),
            col("bh")), Seq("nb", "i", "bh"))
          .groupBy(col("__b_id"), col("__h_id"))
          // distinct BLOCK INDICES, not joined rows: the plain append()
          // path can store the same signature rows twice (compaction's
          // straight union preserves them), and double-counted rows
          // would let a payload sharing only minMatch/2 real blocks
          // with a twice-stored payload be falsely dropped
          .agg(countDistinct(col("i")).as("__n"))
          .filter(col("__n") >= st.minMatch)
          .select(col("__b_id")).distinct()
        // cache + count the (tiny, ≤ batch ids) drop relation so the
        // planner sees its true size and broadcasts the anti-join
        // STATICALLY: a fresh aggregation has no statistics, the static
        // plan is a sort-merge join, and the batch's PAYLOAD bytes take
        // the shuffle write even when AQE later converts to broadcast —
        // caught by SCALE_MEDIASIG's runtime-bytes audit
        CacheScope.withCached(dup) {
          if (dup.count() == 0L) batch
          else batch.join(dup, batch(idCol) === col("__b_id"), "left_anti")
        }
      }
    }
  }

  // ---------------- IngestIndex ----------------

  /** The generic-loop gate: `textCol` IS the binary payload column. */
  def gateKeep(batch: DataFrame, idCol: String, textCol: String,
      excludeToken: Option[String]): DataFrame =
    keepFarPayloads(batch, idCol, textCol, excludeToken = excludeToken)

  def appendToken(df: DataFrame, idCol: String, textCol: String,
      token: String): Unit = { appendOnce(df, idCol, textCol, token); () }

  def seededBy(token: String): Boolean =
    log.read().headOption.exists(_.token.contains(token))
}

object MediaSigIndex {

  /** Build a new index at `path` from the history corpus — the one time
    * history payloads are read. The signature parameters are pinned in
    * `stats/` and every later gate/append uses them. */
  def build(history: DataFrame, idCol: String, payloadCol: String,
      path: String, blocks: Int = 8, minMatch: Int = 6,
      maxBucket: Int = 100,
      seedToken: Option[String] = None): MediaSigIndex = {
    require(blocks >= 2 && blocks <= 256, "blocks in [2, 256]")
    require(minMatch >= 1 && minMatch <= blocks,
      s"minMatch must be in [1, blocks=$blocks], got $minMatch")
    require(maxBucket >= 2, "maxBucket must be >= 2")
    val idx = new MediaSigIndex(history.sparkSession, path)
    idx.log.withWriteLock {
      idx.writeBatch(history, idCol, payloadCol,
        MediaSigIndexStats(0L, blocks, minMatch, maxBucket),
        first = true, token = seedToken)
    }
    idx
  }

  /** Whether `path` holds at least one committed index manifest. */
  def exists(spark: SparkSession, path: String): Boolean =
    new ManifestLog(spark, path).read().nonEmpty

  /** Open a stored index (fails fast on a missing/foreign layout). */
  def open(spark: SparkSession, path: String): MediaSigIndex = {
    val idx = new MediaSigIndex(spark, path)
    idx.stats
    idx
  }

  private def writeStats(spark: SparkSession, path: String,
      st: MediaSigIndexStats): Unit =
    StatsSidecar.write(spark, path, Seq(
      "sig_rows" -> st.sigRows.toString, "blocks" -> st.blocks.toString,
      "min_match" -> st.minMatch.toString,
      "max_bucket" -> st.maxBucket.toString))
}
