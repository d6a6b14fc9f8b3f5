package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Index-wide statistics, stored with the layout and re-read by [[NearDupIndex.open]]:
  * `docs` indexed documents, `bandKeys` distinct (b, bkey) pairs — the Bloom
  * sizing feed — plus the construction parameters, so a reader can't probe a
  * stored index with mismatched banding.
  */
final case class NearDupIndexStats(docs: Long, bandKeys: Long,
    numHashes: Int, bands: Int, maxBucket: Int)

/** PERSISTED MinHash+LSH near-duplicate index — the production shape of the
  * "daily batch vs 100 TB corpus" ingest loop that
  * [[MinHashLSH.nearDupPairsVsHistory]] demonstrates per-call (round-6
  * directive #1): history is shingled ONCE, at [[NearDupIndex.build]] /
  * [[append]] time, and every later batch reads the stored layout instead.
  * History TEXT is never touched again — not even for candidates: exact
  * verification runs on the stored per-document shingle DIGESTS
  * ([[MinHashLSH.shingleDigests]]), whose Jaccard equals the shingle sets'
  * (md5 per distinct shingle), and md5 is engine-reproducible, so the DuckDB
  * oracle re-derives every stage including the digests themselves.
  *
  * Layout under `path` (plain parquet, append-only except `stats`):
  *  - `digests/`  (doc_id, ds: sorted array<md5-hex>) — the verification
  *    relation, the only per-document payload queries re-read; candidates
  *    reach it through an id equi-join, so non-candidate rows are never
  *    deserialized past the scan
  *  - `bands/`    (doc_id, b, bkey) — the LSH candidate relation (keys
  *    only, ~`bands` short rows per doc — tiny relative to the corpus)
  *  - `counts/`   (b, bkey, c) — per-append bucket-population partials;
  *    the degenerate-bucket cap is an aggregation of THIS relation (one
  *    row per distinct key per append), never a window over `bands/`
  *  - `stats/`    single row ([[NearDupIndexStats]]), overwritten per
  *    append: `band_keys` sizes the Bloom filter, so no query runs a
  *    count job over the index (the statistics-fed [[Dedup.keepUnseen]]
  *    treatment, r5 directive #5)
  *
  * Query shape ([[pairsVs]]/[[keepUnseen]]), mirroring
  * [[MinHashLSH.nearDupPairsVsHistory]] stage for stage:
  *  1. over-cap buckets (> maxBucket members across ALL appends — the
  *     stopword-profile degenerate buckets) come from aggregating
  *     `counts/` and are anti-joined out of the stored band relation;
  *  2. a Bloom filter over the surviving stored keys — sized from stored
  *     `band_keys`, built by scanning only `counts/` — splits the incoming
  *     keys: provably-absent keys never enter the candidate join;
  *  3. surviving keys equi-join `bands/` → candidate (inc, hist) pairs;
  *  4. exact digest-Jaccard verification joins `digests/` by candidate id.
  * The incoming batch is shingled exactly once (call-scoped cache), and the
  * history side is touched as keys (`counts/`, `bands/`) plus candidate
  * digest rows — the bytes-read evidence the Bench block records.
  */
final class NearDupIndex private (
    private val spark: SparkSession, val path: String) {

  /** Current stored statistics (re-read per call — appends move it). */
  def stats: NearDupIndexStats = {
    val r = spark.read.parquet(s"$path/stats").head()
    NearDupIndexStats(r.getAs[Long]("docs"), r.getAs[Long]("band_keys"),
      r.getAs[Int]("num_hashes"), r.getAs[Int]("bands"),
      r.getAs[Int]("max_bucket"))
  }

  private def digestsRel: DataFrame = spark.read.parquet(s"$path/digests")
  private def bandsRel: DataFrame = spark.read.parquet(s"$path/bands")
  private def countsRel: DataFrame = spark.read.parquet(s"$path/counts")

  /** Index an accepted batch: its digests, band keys, and bucket-count
    * partials are APPENDED (no existing file is rewritten); `stats/` is
    * recomputed from the tiny `counts/` relation and overwritten. Call with
    * the rows a [[keepUnseen]] gate accepted — materialize that result
    * first (e.g. `localCheckpoint(true)`): its plan reads this index, and
    * appending underneath an unmaterialized gate result would let a later
    * re-evaluation see the batch's own rows as history.
    */
  def append(df: DataFrame, idCol: String, textCol: String): NearDupIndexStats =
    writeBatch(df, idCol, textCol, stats, first = false)

  private def writeBatch(df: DataFrame, idCol: String, textCol: String,
      prev: NearDupIndexStats, first: Boolean): NearDupIndexStats = {
    val mode = if (first) "errorifexists" else "append"
    // the shingleFrame rule (MinHashLSH): cache the UNFILTERED projection,
    // filter above the boundary, so the empty-digest predicate can't be
    // pushed below the fan-out exchange and recompute digests single-core
    val proj = df.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"), MinHashLSH.shingleDigests(col("__text")).as("ds"))
    proj.persist()
    try {
      val nonEmpty = proj.filter(size(col("ds")) > 0)
      nonEmpty.write.mode(mode).parquet(s"$path/digests")
      val bk = MinHashLSH.bandedKeysFromDigests(nonEmpty, prev.numHashes,
        prev.bands)
      bk.write.mode(mode).parquet(s"$path/bands")
      bk.groupBy("b", "bkey").agg(count(lit(1)).as("c"))
        .write.mode(mode).parquet(s"$path/counts")
      val docs = prev.docs + nonEmpty.count()
      // distinct keys across ALL appends — off counts/, never bands/
      val bandKeys = countsRel.select("b", "bkey").distinct().count()
      val st = NearDupIndexStats(docs, bandKeys, prev.numHashes, prev.bands,
        prev.maxBucket)
      NearDupIndex.writeStats(spark, path, st)
      st
    } finally { proj.unpersist(blocking = false); () }
  }

  /** `(doc_inc, doc_hist, jac)` for every incoming document whose digest
    * Jaccard against some INDEXED document exceeds `threshold` — the stored
    * counterpart of [[MinHashLSH.nearDupPairsVsHistory]] (see class doc for
    * the stage map).
    */
  def pairsVs(incoming: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, fpp: Double = 0.01): DataFrame = {
    val incProj = incomingProjection(incoming, idCol, textCol)
    CacheScope.withCached(incProj) {
      pairsPlan(incProj, threshold, fpp)
    }
  }

  /** The gate's UN-materialized plan (no call-scoped cache/checkpoint) —
    * exposed so plan audits can assert the 100 TB property directly: every
    * file scan in this plan lives under the index path ([[MinHashLSH.candidatePlanFor]]
    * precedent; the production [[pairsVs]] wraps the same plan in a cache
    * scope, whose eager checkpoint collapses it before a test could walk it).
    */
  private[graft] def pairsPlanFor(incoming: DataFrame, idCol: String,
      textCol: String, threshold: Double = 0.8, fpp: Double = 0.01): DataFrame =
    pairsPlan(incomingProjection(incoming, idCol, textCol), threshold, fpp)

  private def incomingProjection(incoming: DataFrame, idCol: String,
      textCol: String): DataFrame =
    incoming
      .select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .repartition(incoming.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"), MinHashLSH.shingleDigests(col("__text")).as("ds"))

  private def pairsPlan(incProj: DataFrame, threshold: Double,
      fpp: Double): DataFrame = {
    val st = stats
    locally {
      val incDs = incProj.filter(size(col("ds")) > 0)
      val keyStr = concat_ws("|", col("b"), col("bkey"))
      // degenerate buckets across all appends: aggregate the counts
      // partials (tiny) and anti-join the stored band relation
      val totals = countsRel.groupBy("b", "bkey").agg(sum(col("c")).as("__c"))
      val okKeys = totals.filter(col("__c") <= st.maxBucket).select("b", "bkey")
      val histIdx = bandsRel.join(okKeys, Seq("b", "bkey"), "left_semi")
      // Bloom over the surviving stored keys, sized from stored statistics
      // (band_keys counts pre-cap keys — a slight overestimate, which costs
      // filter bits, never correctness)
      val filter = BloomPrune.buildFilter(okKeys.select(keyStr.as("__k")),
        "__k", math.max(1L, st.bandKeys), fpp)
      val (maybeSeen, _) = BloomPrune.split(
        MinHashLSH.bandedKeysFromDigests(incDs, st.numHashes, st.bands)
          .withColumn("__k", keyStr), "__k", filter)
      val cand = maybeSeen
        .join(histIdx.select(col("doc_id").as("__hist_id"), col("b"), col("bkey")),
          Seq("b", "bkey"))
        .select(col("doc_id").as("doc_inc"), col("__hist_id").as("doc_hist"))
        .distinct()
      val x = incDs.select(col("doc_id").as("doc_inc"), col("ds").as("ds_a"))
      val y = digestsRel.select(col("doc_id").as("doc_hist"), col("ds").as("ds_b"))
      cand.join(x, "doc_inc").join(y, "doc_hist")
        .select(col("doc_inc"), col("doc_hist"),
          MinHashLSH.jaccardSorted(col("ds_a"), col("ds_b")).as("jac"))
        .filter(col("jac") > threshold)
    }
  }

  /** Keep only incoming rows that near-duplicate NO indexed document — the
    * stored-index ingest gate ([[MinHashLSH.keepUnseenNear]]'s production
    * form). Typical loop: `val kept = idx.keepUnseen(batch, ...)
    * .localCheckpoint(true); idx.append(kept, ...)`.
    */
  def keepUnseen(incoming: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, fpp: Double = 0.01): DataFrame = {
    val dup = pairsVs(incoming, idCol, textCol, threshold, fpp)
      .select(col("doc_inc")).distinct()
    incoming.join(dup, incoming(idCol) === col("doc_inc"), "left_anti")
  }
}

object NearDupIndex {

  /** Build a new index at `path` (must not already hold one) from the
    * history corpus — the one time history text is read.
    */
  def build(history: DataFrame, idCol: String, textCol: String, path: String,
      numHashes: Int = 16, bands: Int = 4, maxBucket: Int = 100): NearDupIndex = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val idx = new NearDupIndex(history.sparkSession, path)
    idx.writeBatch(history, idCol, textCol,
      NearDupIndexStats(0L, 0L, numHashes, bands, maxBucket), first = true)
    idx
  }

  /** Open a stored index; parameters come from its `stats/` row. */
  def open(spark: SparkSession, path: String): NearDupIndex = {
    val idx = new NearDupIndex(spark, path)
    idx.stats // fail fast on a missing/foreign layout
    idx
  }

  private def writeStats(spark: SparkSession, path: String,
      st: NearDupIndexStats): Unit = {
    import spark.implicits._
    Seq((st.docs, st.bandKeys, st.numHashes, st.bands, st.maxBucket))
      .toDF("docs", "band_keys", "num_hashes", "bands", "max_bucket")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }
}
