package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection (EXT, SURVEY §2.10 U3).
  *
  * Pipeline: token 3-gram shingles → per-seed minhash signature → banded
  * bucket keys → candidate pairs from same-bucket join → exact Jaccard
  * verification on the candidates only.
  *
  * Scale design (the reason this beats brute force at 100 TB):
  *  - signatures are tiny (numHashes × 32-char md5 hex) regardless of doc size
  *  - the only wide operation is an equi-join on (band, bucketKey) — a hash
  *    shuffle on short keys; near-dup candidates are a vanishing fraction of
  *    the N² pair space
  *  - exact Jaccard runs only on candidates, joining the shingle-set table by
  *    id twice, so full documents never ride through the pair shuffle
  *  - every expression is a Catalyst higher-order function (codegen, no UDFs)
  *
  * The hash is md5 over "seed:shingle", so any engine (the DuckDB oracle
  * included) reproduces signatures bit-for-bit.
  */
object MinHashLSH {

  /** Distinct token 3-gram shingles of a text column.
    * (Spark's `sequence(1, 0)` counts DOWN — guard short docs explicitly.)
    */
  def shingles(text: Column): Column = {
    val toks = TextAnalysis.tokens(text)
    when(size(toks) < 3, array().cast("array<string>")).otherwise(
      array_distinct(transform(
        sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))))
  }

  /** MinHash signature: for each seed k, min md5("k:shingle").
    * (Reference formulation; see [[signatureColumns]] for the 4×-cheaper
    * split-digest variant used by [[nearDupPairs]].)
    */
  def signature(shingleSet: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      k => array_min(transform(shingleSet, x => md5(concat(k.cast("string"), lit(":"), x)))))

  /** Split-digest signature: one md5 per (seed, shingle) yields FOUR hash
    * values (its 8-hex-char quarters), so `numHashes` minhashes cost
    * numHashes/4 digests per shingle. Returns the per-seed digest columns and
    * the signature expression over them; the caller materializes the digest
    * columns in their own projection so each is computed once (CollapseProject
    * keeps multi-referenced non-trivial aliases in place).
    */
  def signatureColumns(shingleSet: Column, numHashes: Int): (Seq[(String, Column)], Column) = {
    require(numHashes % 4 == 0, "numHashes must be a multiple of 4")
    val seeds = numHashes / 4
    val hs = (0 until seeds).map { k =>
      s"__hs_$k" -> transform(shingleSet, x => md5(concat(lit(k.toString), lit(":"), x)))
    }
    val mh = array((0 until numHashes).map { i =>
      array_min(transform(col(s"__hs_${i / 4}"), h => substring(h, 8 * (i % 4) + 1, 8)))
    }: _*)
    (hs, mh)
  }

  /** Jaccard over two distinct-element arrays.
    * |A∪B| = |A|+|B|−|A∩B|: one intersect instead of intersect+union —
    * halves the dominant per-pair set-op cost on verification joins.
    */
  def jaccard(a: Column, b: Column): Column = {
    val i = size(array_intersect(a, b)).cast("double")
    i / (size(a) + size(b) - i)
  }

  /** Jaccard for ASC-SORTED distinct-element arrays: zero-allocation
    * two-pointer merge ([[graft.functions.SortedIntersectSize]]) instead of a
    * per-pair hash set — the form to use on large verification joins, with
    * `sort_array` applied once on the build side.
    */
  def jaccardSorted(a: Column, b: Column): Column = {
    val i = graft.functions.SortedIntersectSize(a, b).cast("double")
    i / (size(a) + size(b) - i)
  }

  /** LSH candidate pairs only (no Jaccard verification) — exposed for
    * tuning/diagnostics: candidate volume ≈ Σ_pairs P(J_pair^rowsPerBand
    * collides in ≥1 band), the knob that controls cost on
    * high-background-similarity corpora.
    */
  def candidatePairs(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val projected = shingleFrame(df, idCol, textCol)
    CacheScope.withCached(projected) {
      bandCandidates(projected.filter(size(col("sh")) > 0), numHashes, bands)
    }
  }

  /** Near-duplicate pairs (idA < idB, Jaccard > threshold).
    *
    * The shingle-set frame is cached only for the duration of the call
    * (consumed by the signature branch and both sides of the verification
    * join) and released before returning — see [[CacheScope]].
    *
    * @param numHashes signature length (bands * rowsPerBand)
    * @param bands     LSH bands; rowsPerBand = numHashes / bands
    */
  def nearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.8
  ): DataFrame = {
    val projected = shingleFrame(df, idCol, textCol)
    CacheScope.withCached(projected) {
      val sh = projected.filter(size(col("sh")) > 0)
      val cand = bandCandidates(sh, numHashes, bands)
      // exact verification: join the (small) candidate list back to shingle sets
      val x = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      val y = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
      cand.join(x, "doc_a").join(y, "doc_b")
        .select(col("doc_a"), col("doc_b"), jaccardSorted(col("sh_a"), col("sh_b")).as("jac"))
        .filter(col("jac") > threshold)
    }
  }

  /** (doc_id, sorted shingle set) — the cache-worthy intermediate.
    * Fans the heavy per-row work (tokenize + md5 per shingle) across all
    * cores even when the input is a single unsplittable row group.
    * The empty-shingle filter goes ABOVE the persist boundary: filtering
    * the projection directly lets Catalyst substitute the full shingle
    * expression into the filter and push it below the exchange, where it
    * recomputes every doc's shingles on the unsplit input partition.
    */
  private def shingleFrame(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"), sort_array(shingles(col("__text"))).as("sh"))

  private def bandCandidates(sh: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands

    val (hsCols, mh) = signatureColumns(col("sh"), numHashes)
    val sig = sh
      .select(col("doc_id") +: col("sh") +: hsCols.map { case (n, c) => c.as(n) }: _*)
      .select(col("doc_id"), col("sh"), mh.as("mh"))

    // band key = md5 of the band's slice of the signature
    val banded = sig.select(
      col("doc_id"),
      explode(transform(sequence(lit(0), lit(bands - 1)), b =>
        struct(b.as("b"),
          md5(concat_ws("|", slice(col("mh"), b * rows + 1, lit(rows)))).as("bkey")))).as("band"))
      .select(col("doc_id"), col("band.b"), col("band.bkey"))

    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col("a.b") === col("b.b") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }
}
