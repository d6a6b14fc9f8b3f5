package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Content-level deduplication for BINARY payload columns (EXT,
  * SURVEY §2.10 U3 — the multimodal complement of [[Dedup]]): the text
  * dedup family keys on the caption, so two byte-identical images with
  * different captions sail through every text gate. These operators key
  * on the PAYLOAD BYTES.
  *
  * Two forms, mirroring the text family's split:
  *  - EXACT ([[exactByPayload]]): one digest per payload; keep the
  *    lowest-id row per byte-identical payload.
  *  - NEAR ([[nearDupPairsBytes]] → [[keepNearCanonical]]): a blocked
  *    byte signature — the payload's hex encoding is cut into a fixed
  *    number of equal-stride blocks, each block md5-hashed; two
  *    same-length payloads are near-duplicates when ≥ `minMatch` of
  *    their `blocks` block hashes agree AT THE SAME OFFSET (the SimHash
  *    pigeonhole applied to bytes: payloads differing in ≤
  *    blocks−minMatch localized byte runs always share enough blocks).
  *    Candidates come from bucketing on (length, block index, block
  *    hash) — never an all-pairs comparison — and the canonical keep is
  *    [[Dedup.keepCanonical]]'s transitive-closure min-id rule.
  *
  * Scale design (the 100 TB shape):
  *  - payload bytes NEVER ride a shuffle: both forms project to
  *    (id, digest)/(id, length, block hashes) — tens of bytes per row —
  *    before any exchange, and return the keep decision to the full
  *    frame as an anti-join against the LOSERS (∝ duplicates, which AQE
  *    converts to a broadcast at runtime) or [[Dedup.keepByClusters]]'s
  *    duplicate-proportional cluster join;
  *  - bucket expansion is capped ([[Pairs.explodeSortedIdPairs]] after a
  *    size filter), the standard LSH guard — a degenerate block value
  *    (a run of zeros shared by half the corpus) cannot go quadratic;
  *  - every hash is hex-domain md5 over substrings of `hex(payload)` —
  *    pure string/integer arithmetic any engine reproduces bit-for-bit
  *    (the DuckDB oracle re-derives digests AND buckets).
  *
  * Stream legality: both forms are WITHIN-FRAME (per micro-batch in a
  * stream), exactly like the declared `exact_dedup` — batch-local
  * semantics with no corpus statistics, so the streamed runners accept
  * them. CROSS-BATCH gating ("drop payloads seen in any earlier batch")
  * is store-mediated like every other history gate — that form lives in
  * the persisted-index family, not here.
  */
object MediaDedup {

  /** The payload's content digest, defined in the HEX-STRING domain:
    * md5 over `hex(payload)` (Spark and DuckDB both produce uppercase
    * hex, so the digest — md5 of that string's UTF-8 bytes — is the
    * same 32-char answer on both engines). This string IS the binary
    * dedup identity. */
  def payloadDigest(payload: Column): Column = md5(hex(payload))

  /** EXACT payload dedup: keep, per byte-identical payload, the row with
    * the smallest `idCol`. Winner resolution shuffles (id, digest) rows
    * only; the keep decision returns via [[Dedup.keepUnseen]]'s Bloom
    * split — a broadcast filter over the LOSER ids (∝ duplicates) passes
    * the definitely-kept majority map-only (no false negatives ⇒ a row
    * the filter rejects provably has no loser entry), and only the
    * might-loser minority rides the exact anti-join. The loser relation
    * is call-scope cached and counted, so the planner sees its true
    * (tiny) size and broadcasts the anti-join statically — payload
    * bytes cross NO exchange on the common low-duplication path, and a
    * pathological all-dup corpus degrades to a duplicate-proportional
    * shuffle, never a corpus-wide one. */
  def exactByPayload(df: DataFrame, payloadCol: String,
      idCol: String): DataFrame = {
    // null payloads carry NO identity: they must not collapse into one
    // "duplicate group" of each other (the stored gates already pass
    // them — keepUnseenPayloads/keepFarPayloads — and the family must
    // agree on what a null payload means), so they never enter the
    // loser derivation and always survive
    val losers = df
      .filter(col(payloadCol).isNotNull)
      .select(col(idCol).as("__md_id"),
        payloadDigest(col(payloadCol)).as("__md_d"))
      .withColumn("__md_keep",
        min(col("__md_id")).over(Window.partitionBy(col("__md_d"))))
      .filter(col("__md_id") =!= col("__md_keep"))
      .select(col("__md_id"))
    dropLosers(df, idCol, losers)
  }

  /** Drop the loser rows from `df` without ever shuffling its payload
    * column: Bloom filter over the loser ids broadcast and split (the
    * definitely-kept majority passes map-only — no false negatives ⇒ a
    * rejected id provably has no loser entry), exact anti-join for the
    * might-loser minority against the call-scope-cached loser relation
    * (counted, so the planner sees its true size and broadcasts
    * statically on the common path). */
  private def dropLosers(df: DataFrame, idCol: String,
      losers: DataFrame): DataFrame =
    CacheScope.withCached(losers) {
      val items = losers.count()
      // a duplicate-free frame has NO losers — and Spark's
      // stat.bloomFilter over zero rows returns a filter with null bits
      // that throws on every probe, so the empty case must short-circuit
      // (common in streamed micro-batches)
      if (items == 0L) df
      else {
        val filter = BloomPrune.buildFilter(losers, "__md_id", items)
        val (maybeLoser, definitelyKept) =
          BloomPrune.split(df, idCol, filter)
        val verifiedKept = maybeLoser
          .join(losers, col(idCol) === col("__md_id"), "left_anti")
        definitelyKept.union(
          verifiedKept.select(definitelyKept.columns.map(col): _*))
      }
    }

  /** The blocked byte-signature rows: (doc_id, nb, i, bh) — `nb` the
    * payload byte length, `i` the block index in [0, blocks), `bh` the
    * md5 of block i's hex slice. The stride is `ceil(nb / blocks)`
    * BYTES (so ×2 in hex chars), byte-aligned; the last block may be
    * short, and blocks past the payload hash the empty string (equal
    * lengths hash equally — harmless, length is part of the bucket
    * key). */
  def signatureRows(df: DataFrame, idCol: String, payloadCol: String,
      blocks: Int): DataFrame = {
    require(blocks >= 2, s"blocks must be >= 2, got $blocks")
    val nb = octet_length(col(payloadCol)).cast("long")
    // null payloads emit NO signature rows (hex(null) is null — its
    // "blocks" would all be null and bucket together, pairing every
    // null payload with every other; the family contract is that a
    // null payload carries no identity and always survives)
    df.filter(col(payloadCol).isNotNull)
      .select(col(idCol).as("doc_id"), nb.as("nb"),
        hex(col(payloadCol)).as("__h"))
      // ceil(nb / blocks) bytes = ×2 hex chars, in INTEGER arithmetic
      // (Column./ is double division — a truncation hazard, and the
      // oracle's // is integral)
      .withColumn("__s",
        (expr(s"(nb + ${blocks - 1}) DIV $blocks") * 2).cast("int"))
      .select(col("doc_id"), col("nb"),
        posexplode(transform(sequence(lit(0), lit(blocks - 1)), i =>
          md5(col("__h").substr(i * col("__s") + 1, col("__s"))))))
      .toDF("doc_id", "nb", "i", "bh")
  }

  /** NEAR-dup candidate pairs over the blocked signature: `(doc_a,
    * doc_b)` with a < b for same-length payloads sharing ≥ `minMatch`
    * of `blocks` block hashes at the same index. Buckets on (nb, i, bh)
    * sized outside [2, maxBucket] are dropped before pair expansion
    * (the LSH cap — degenerate shared blocks cannot go quadratic); the
    * per-pair match count is the number of surviving shared buckets. */
  def nearDupPairsBytes(df: DataFrame, idCol: String, payloadCol: String,
      blocks: Int = 8, minMatch: Int = 6,
      maxBucket: Int = 100): DataFrame = {
    require(minMatch >= 1 && minMatch <= blocks,
      s"minMatch must be in [1, blocks=$blocks], got $minMatch")
    Pairs.explodeSortedIdPairs(
      signatureRows(df, idCol, payloadCol, blocks)
        .groupBy(col("nb"), col("i"), col("bh"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")).between(2, maxBucket)),
      "ids")
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_match"))
      .filter(col("n_match") >= minMatch)
      .select(col("doc_a"), col("doc_b"))
  }

  /** The complete near-dup keep decision: detector pairs → transitive
    * closure ([[ConnectedComponents]], min-id representative —
    * [[Dedup.keepCanonical]]'s rule) — one surviving row per duplicate
    * group plus every ungrouped row. The keep-join is [[dropLosers]]'
    * Bloom split rather than [[Dedup.keepByClusters]]' outer join, so
    * the payload column stays out of the exchange even when AQE
    * pre-materializes a join stage. */
  def keepNearCanonical(df: DataFrame, idCol: String, payloadCol: String,
      blocks: Int = 8, minMatch: Int = 6,
      maxBucket: Int = 100): DataFrame =
    keepCanonicalByPairs(df, idCol,
      nearDupPairsBytes(df, idCol, payloadCol, blocks, minMatch, maxBucket))

  private def keepCanonicalByPairs(df: DataFrame, idCol: String,
      pairs: DataFrame): DataFrame = {
    val clusters = ConnectedComponents.run(pairs, "doc_a", "doc_b")
    // same survivors as keepByClusters: rows in no cluster, plus each
    // cluster's min-id representative — i.e. drop members ≠ component
    val losers = clusters.filter(col("id") =!= col("component"))
      .select(col("id").as("__md_id"))
    dropLosers(df, idCol, losers)
  }

  /** CONTENT-DEFINED CHUNK rows `(doc_id, ch)` — the LENGTH-ROBUST
    * payload signature (r16 verdict #6: the blocked signature's equal
    * strides make a one-byte insertion shift EVERY block, so
    * same-content-different-length payloads can never pair): chunk
    * boundaries are cut where the payload's own bytes say so — after
    * byte `p+window−1` whenever the md5 of the `window`-byte slice at
    * `p` starts with `zeros` hex '0's (a 1-in-16^zeros content
    * condition ⇒ mean chunk ≈ window+16^zeros bytes; the
    * gear/rolling-hash CDC idea with md5 as the portable hash —
    * Muthitacharoen et al., LBFS, SOSP 2001) — so an insertion perturbs
    * only the chunk containing it and boundaries RE-SYNCHRONIZE at the
    * next content-defined cut. `ch` is the md5 of the chunk's hex
    * slice: pure string/integer arithmetic, the DuckDB oracle
    * re-derives every cut and chunk (dq187).
    *
    * `zeros` is the STORAGE/GRANULARITY dial: the chunk relation
    * carries ~nb/16^zeros 32-hex-char hashes per payload, so at
    * zeros=1 it outweighs the payload (~2× nb — right for the
    * byte-scale fixtures the oracles replay) while zeros=3 stores
    * ~1% of payload volume at ~4 KB mean chunks — the ratio a
    * 100 TB media store needs. Coarser chunks trade edit
    * granularity: a payload with fewer than `minShared` total chunks
    * can never match, so size `zeros` to payloads ≫
    * minShared·16^zeros bytes.
    *
    * Scale shape: the boundary scan materializes one int per byte
    * position per row (`transform` over `sequence`) — payload-size
    * bounded, embarrassingly parallel, no shuffle; only the
    * ~nb/16^zeros chunk hashes leave the row. Payloads shorter than
    * `window` (and cut-free payloads) emit their whole body as one
    * chunk; null payloads emit nothing (the family contract). */
  def cdcChunkRows(df: DataFrame, idCol: String, payloadCol: String,
      window: Int = 4, zeros: Int = 1): DataFrame = {
    require(window >= 1 && window <= 64, s"window in [1, 64], got $window")
    require(zeros >= 1 && zeros <= 8, s"zeros in [1, 8], got $zeros")
    df.filter(col(payloadCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(graft.functions.CdcChunks(col(payloadCol), window, zeros))
          .as("ch"))
  }

  /** The Column-expression formulation of [[cdcChunkRows]] — the
    * executable spec the [[graft.functions.CdcChunks]] kernel is
    * property-pinned against (`MediaCdcKernelSpec`), retained verbatim
    * from the shape that shipped dq187: per-position `transform` lambdas
    * evaluate INTERPRETED (an Md5.eval + UTF8String substring per byte
    * position), which the kernel collapses into one JVM loop per row.
    * Bit-identical by the parity property; do not call on a hot path. */
  private[graft] def cdcChunkRowsSpec(df: DataFrame, idCol: String,
      payloadCol: String, window: Int = 4, zeros: Int = 1): DataFrame = {
    require(window >= 1 && window <= 64, s"window in [1, 64], got $window")
    require(zeros >= 1 && zeros <= 8, s"zeros in [1, 8], got $zeros")
    val w = window
    val zs = "0" * zeros
    df.filter(col(payloadCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        octet_length(col(payloadCol)).cast("int").as("nb"),
        hex(col(payloadCol)).as("__h"))
      // cut positions (byte index the chunk ENDS before): p + w for
      // every window position p whose slice-md5 opens with `zeros` '0's
      .withColumn("__cuts",
        when(col("nb") < w, array().cast("array<int>"))
          .otherwise(filter(
            transform(sequence(lit(0), col("nb") - w), p =>
              when(substring(md5(col("__h").substr(p * 2 + 1, lit(w * 2))),
                1, zeros) === zs, p + w).otherwise(lit(-1))),
            x => x >= 0)))
      // starts = 0 ∪ interior cuts; ends = interior cuts ∪ nb (a cut at
      // exactly nb closes the last chunk, it does not open an empty one)
      .withColumn("__in", filter(col("__cuts"), c => c < col("nb")))
      .select(col("doc_id"),
        explode(zip_with(
          concat(array(lit(0)), col("__in")),
          concat(col("__in"), array(col("nb"))),
          (s, e) => md5(col("__h").substr(s * 2 + 1, (e - s) * 2))))
          .as("ch"))
  }

  /** Near-dup candidate pairs over CONTENT-DEFINED chunks: `(doc_a,
    * doc_b)` sharing ≥ `minShared` DISTINCT chunk hashes — no length
    * bucket, no same-offset rule, so an inserted/truncated byte run
    * costs only the chunks it touches. Buckets on the chunk hash with
    * the standard [2, maxBucket] LSH cap. */
  def nearDupPairsCdc(df: DataFrame, idCol: String, payloadCol: String,
      window: Int = 4, minShared: Int = 3,
      maxBucket: Int = 100, zeros: Int = 1): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    Pairs.explodeSortedIdPairs(
      cdcChunkRows(df, idCol, payloadCol, window, zeros).distinct()
        .groupBy(col("ch"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")).between(2, maxBucket)),
      "ids")
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("doc_a"), col("doc_b"))
  }

  /** [[keepNearCanonical]] over the CDC detector — the length-robust
    * within-frame near dedup (min-id transitive-closure keep, payload
    * bytes never ride a shuffle). */
  def keepNearCanonicalCdc(df: DataFrame, idCol: String,
      payloadCol: String, window: Int = 4, minShared: Int = 3,
      maxBucket: Int = 100, zeros: Int = 1): DataFrame =
    keepCanonicalByPairs(df, idCol,
      nearDupPairsCdc(df, idCol, payloadCol, window, minShared,
        maxBucket, zeros))
}
