package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** SimHash near-duplicate detection (EXT, SURVEY §2.10 U3).
  *
  * Frequency-weighted simhash: every token OCCURRENCE votes ±1 on each of
  * `bits` bit positions (bit b of md5(token) decides the sign); a positive
  * column sum sets the bit. Near-dups = pairs within `maxHamming`.
  *
  * Scale design: one explode of token occurrences (linear in corpus size),
  * then a single hash aggregation per doc computing all bit sums at once via
  * `bits` independent partial-aggregating SUMs — the per-token 64-slot vote
  * array never shuffles, only the per-doc sums do. Candidate generation is an
  * equi-join on hamming bands (pigeonhole: hd ≤ maxHamming ⇒ at least one of
  * maxHamming+1 bands equal), never an N² compare.
  *
  * Bit definition (engine-portable, used verbatim by the DuckDB oracle):
  * hex digit d = md5(tok)[b/4], value v = hexval(d); bit = (v >> (3-b%4)) & 1.
  */
object SimHash {

  /** ±1 vote of one token for bit position b (b < 32 → first 8 hex chars). */
  private def vote(md5c: Column, b: Int): Column = {
    val digit = conv(substring(md5c, b / 4 + 1, 1), 16, 10).cast(IntegerType)
    when(shiftright(digit, 3 - b % 4) % 2 === 1, 1).otherwise(-1)
  }

  /** (doc_id, bits array<int> of 0/1) per document. One shuffle.
    * The input is repartitioned first so the token explode + 64 bit-vote
    * expressions spread across all cores even off a single row group.
    */
  def simhashBits(df: DataFrame, idCol: String, textCol: String, bits: Int = 64): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("__text"))).as("tok"))
      .select(col("doc_id"), md5(col("tok")).as("h"))
    val sums = toks.groupBy("doc_id")
      .agg(array((0 until bits).map(b => sum(vote(col("h"), b))): _*).as("sums"))
    sums.select(col("doc_id"),
      transform(col("sums"), s => when(s > 0, 1).otherwise(0)).as("bits"))
  }

  /** Hamming distance between two equal-length 0/1 arrays — the codegen'd
    * [[graft.functions.HammingDistance]] (primitive loop; the
    * `aggregate(zip_with(...))` HOF form it replaces ran interpreted).
    */
  def hamming(a: Column, b: Column): Column =
    graft.functions.HammingDistance(a, b)

  /** Near-duplicate pairs (idA < idB, hamming ≤ maxHamming) via banded LSH. */
  def nearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bits: Int = 64,
      bands: Int = 4,
      maxHamming: Int = 3
  ): DataFrame = {
    require(bits % bands == 0, "bits must be divisible by bands")
    val rows = bits / bands
    // cached only for the call: both sides of the band self-join consume it
    val sh = simhashBits(df, idCol, textCol, bits)
    CacheScope.withCached(sh) {
      val banded = sh.select(col("doc_id"), col("bits"),
        explode(transform(sequence(lit(0), lit(bands - 1)), b =>
          struct(b.as("b"), concat_ws(",", slice(col("bits"), b * rows + 1, lit(rows))).as("bkey")))).as("band"))
        .select(col("doc_id"), col("bits"), col("band.b"), col("band.bkey"))

      val a = banded.as("a")
      val b = banded.as("b")
      a.join(b,
          col("a.b") === col("b.b") && col("a.bkey") === col("b.bkey") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.bits").as("bits_a"), col("b.bits").as("bits_b"))
        .distinct()
        .select(col("doc_a"), col("doc_b"), hamming(col("bits_a"), col("bits_b")).as("hamming"))
        .filter(col("hamming") <= maxHamming)
    }
  }
}
