package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03 —
  * the MOSS fingerprinter): polynomial ROLLING hashes of character
  * k-grams, then the minimum hash of every w-length window, deduplicated
  * per document.
  *
  * This is a different near-dup modality from MinHash: winnowing is
  * POSITION-ROBUST SUBSTRING matching — the algorithm guarantees any
  * shared substring of length ≥ k+w−1 produces at least one shared
  * fingerprint (spec-checked), where bag-of-shingles MinHash only bounds
  * whole-document set similarity. Use it to find documents sharing lifted
  * passages, not just globally similar ones.
  *
  * Scale shape mirrors [[MinHashLSH]]: fingerprints (ints, never text)
  * shuffle once to buckets; per-bucket inline pair expansion with a
  * frequency cap bounds the structural worst case (a boilerplate
  * fingerprint shared by everything generates no pairs, documented drop).
  * Arithmetic is integer-only mod 2³¹−1 — the dq72 oracle re-derives every
  * hash bit-for-bit in DuckDB. Hashing is per code point (`ascii` +
  * character `substr` in both engines); `lower` agrees across engines on
  * ASCII — the corpus contract, as with [[TextAnalysis]] tokens.
  */
object Winnow {

  // single source of truth for the rolling-hash constants: the kernel, this
  // spec formulation, and the dq72 oracle all derive from them
  private val M = graft.functions.WinnowFingerprints.M

  /** B^0..B^(k-1) mod M — shared with the oracle-SQL builder. */
  private[graft] def powers(k: Int): Array[Long] =
    graft.functions.WinnowFingerprints.powers(k)

  /** (idCol, fp): the exploded winnowed fingerprint set per document.
    * Documents shorter than k+w−1 characters yield no fingerprints.
    * Production path: the O(n)-per-document
    * [[graft.functions.WinnowFingerprints]] kernel (true rolling update +
    * monotonic-deque window minima); [[fingerprintsSpec]] is the Column
    * formulation it is property-checked bit-identical to (which measured
    * 84s for dq72 at sf0.1 — per-position HOF lambdas re-hash k chars
    * interpreted; the kernel runs it in ~1s).
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, w: Int = 8): DataFrame =
    df.select(col(idCol),
      explode(graft.functions.WinnowFingerprints(lower(col(textCol)), k, w))
        .as("fp"))

  /** Executable SPEC of [[fingerprints]]: per-position polynomial hashes
    * via `transform` + window minima via `slice`/`array_min` — the exact
    * declarative statement of the selection, O(k·n + w·n) interpreted
    * per document, so the kernel is the hot-path form.
    */
  def fingerprintsSpec(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, w: Int = 8): DataFrame = {
    require(k >= 2 && w >= 1, "need k >= 2, w >= 1")
    val pows = powers(k)
    // per-position k-gram hash: Σ ascii(c_{i+j}) · B^(k-1-j) mod M.
    // __s and __hs materialize as their own projections below the
    // generators — expressions referenced inside HOF lambdas re-evaluate
    // per element (the dq67 lesson), attributes don't.
    val hashAt = (i: Column) =>
      (0 until k).map(j =>
        ascii(col("__s").substr(i + j, lit(1))).cast("long") * lit(pows(k - 1 - j)))
        .reduce(_ + _) % M
    df.select(col(idCol), lower(col(textCol)).as("__s"))
      .where(length(col("__s")) >= k)
      .select(col(idCol),
        transform(sequence(lit(1), length(col("__s")) - (k - 1)), hashAt)
          .as("__hs"))
      .where(size(col("__hs")) >= w)
      .select(col(idCol), explode(array_distinct(transform(
        sequence(lit(1), size(col("__hs")) - (w - 1)),
        i => array_min(slice(col("__hs"), i, lit(w)))))).as("fp"))
  }

  /** Pairs of documents sharing at least `minShared` winnowed fingerprints
    * — (doc_a < doc_b, n_shared). Fingerprints held by more than
    * `maxFpFreq` documents are dropped before pair expansion (boilerplate
    * guard, same role as [[MinHashLSH]]'s `maxBucket`).
    */
  def sharedFingerprintPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, w: Int = 8, minShared: Int = 3,
      maxFpFreq: Int = 100): DataFrame =
    Pairs.explodeSortedIdPairs(
      fingerprints(df, idCol, textCol, k, w)
        .groupBy("fp")
        .agg(sort_array(collect_list(col(idCol))).as("ids"))
        .filter(size(col("ids")).between(2, maxFpFreq)),
      "ids")
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
}
