package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  * All variants are single-shuffle on the dedup key (hash partition by key,
  * map-side partial where possible) — the access pattern that scales linearly
  * with cluster width at 100 TB.
  */
object Dedup {

  /** Exact dedup keeping, per key group, the first row under `order`
    * (deterministic — unlike `dropDuplicates`, whose surviving row is
    * partition-order dependent). One shuffle on `keys`.
    */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Skew-resistant keepFirst: two-phase with a deterministic salt. Phase 1
    * resolves the winner within (keys, salt) partitions — a hot key's rows
    * spread over `saltBuckets` tasks instead of one straggler; phase 2
    * resolves across the (tiny) per-salt winners. Same result as
    * [[keepFirst]] when `order` is unique within a key group.
    */
  def keepFirstSalted(df: DataFrame, keys: Seq[String], order: Column,
      saltBuckets: Int = 16): DataFrame = {
    val salt = pmod(hash(order), lit(saltBuckets))
    val w1 = Window.partitionBy(keys.map(col) :+ salt: _*).orderBy(order)
    val local = df.withColumn("__rn", row_number().over(w1))
      .filter(col("__rn") === 1).drop("__rn")
    val w2 = Window.partitionBy(keys.map(col): _*).orderBy(order)
    local.withColumn("__rn", row_number().over(w2))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact content dedup: group by a fingerprint of `contentCol` (not the
    * content itself — shuffling a 64-char hex digest instead of multi-KB
    * documents cuts shuffle bytes by orders of magnitude at 100 TB),
    * keeping the row with the smallest `idCol`.
    */
  def exactByContent(df: DataFrame, contentCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(sha2(col(contentCol), 256)).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** INCREMENTAL-ingest dedup — the daily-batch shape: keep only incoming
    * rows whose canonical content fingerprint ([[TextAnalysis.fingerprint]])
    * has never been seen in the historical corpus.
    *
    * Scale path: a Bloom filter over the HISTORICAL fingerprints (32-hex
    * digests, never bodies) is broadcast and splits the incoming batch —
    * "definitely new" rows (no false negatives ⇒ provably unseen) skip the
    * anti-join entirely, and only the might-seen minority rides the
    * fingerprint shuffle for exact verification. At 100 TB the history
    * side's filter would be built once and persisted with the corpus;
    * here it is built per call (one aggregation over digests).
    *
    * `expectedItems` sizes the Bloom filter. At 100 TB it should come from
    * catalog/layout statistics (a distinct-count estimate), NOT a count
    * pass over the history: overestimating only costs filter memory
    * (bits ∝ n·ln(1/fpp), ~9.6 bits/item at fpp 0.01 — 2× over-estimate =
    * 2× filter size and a LOWER realized fpp), while underestimating
    * raises the realized fpp, sending more provably-prunable rows through
    * the anti-join — never wrong results either way (no false negatives).
    * When no estimate is given, the distinct digests are counted off the
    * call-scoped cache, so the history is still scanned exactly once.
    */
  def keepUnseen(incoming: DataFrame, history: DataFrame, textCol: String,
      fpp: Double = 0.01, expectedItems: Option[Long] = None): DataFrame = {
    val fp = TextAnalysis.fingerprint(col(textCol))
    val inc = incoming.withColumn("__fp", fp)
    val hist = history.select(fp.as("__fp")).distinct()
    // one computation of the history projection, shared by the (optional)
    // sizing count, the filter aggregation, and the verification anti-join
    CacheScope.withCached(hist) {
      val items = math.max(1L, expectedItems.getOrElse(hist.count()))
      val filter = BloomPrune.buildFilter(hist, "__fp", items, fpp)
      val (maybeSeen, definitelyNew) = BloomPrune.split(inc, "__fp", filter)
      // the USING-join reorders __fp to the front; realign before the
      // position-based union
      val verifiedNew = maybeSeen.join(hist, Seq("__fp"), "left_anti")
        .select(definitelyNew.columns.map(col): _*)
      definitelyNew.union(verifiedNew).drop("__fp")
    }
  }

  /** NEAR-dup dedup, end to end: given the near-dup PAIRS a detector
    * emitted ([[MinHashLSH.nearDupPairs]] / [[SimHash.nearDupPairs]] /
    * [[Ann.nearDupPairs]]), keep exactly one representative per duplicate
    * group — the minimum id, via the transitive closure
    * ([[ConnectedComponents]]) — plus every row that is in no group.
    * This is the complete keep-decision a training-data pipeline runs.
    * The cluster table is proportional to the DUPLICATES, not the corpus —
    * usually small enough that AQE converts the left join to a broadcast at
    * runtime (no hint pinned here, so a pathological all-dup corpus still
    * degrades gracefully to a shuffle join).
    */
  def keepCanonical(df: DataFrame, idCol: String, pairs: DataFrame,
      pairACol: String = "doc_a", pairBCol: String = "doc_b"): DataFrame =
    keepByClusters(df, idCol, ConnectedComponents.run(pairs, pairACol, pairBCol))

  /** The keep-join half of [[keepCanonical]] over an ALREADY-computed
    * cluster table (`(id, component)` as [[ConnectedComponents.run]]
    * emits) — for pipelines that materialize the closure once and reuse
    * it (several keep policies, stage-level benchmarking).
    */
  def keepByClusters(df: DataFrame, idCol: String, clusters: DataFrame): DataFrame = {
    val c = clusters
      .select(col("id").as("__cc_id"), col("component").as("__cc_rep"))
    df.join(c, col(idCol) === col("__cc_id"), "left_outer")
      .filter(col("__cc_id").isNull || col(idCol) === col("__cc_rep"))
      .drop("__cc_id", "__cc_rep")
  }
}
