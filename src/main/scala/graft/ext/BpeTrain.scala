package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary TRAINING (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units" §3.2) — the merge
  * LEARNING that [[graft.functions.SubwordTokenize]] (inference over a
  * fixed vocab, dq89/dq100) consumes.
  *
  * Textbook BPE, re-expressed relationally so both engines replay it:
  * the corpus compresses to a DISTINCT-WORD table (word, cnt) — pair
  * statistics are identical on it, and it is vocab-sized, not
  * corpus-sized — then each word is one row per symbol occurrence
  * (word, cnt, pos, sym). Per merge step:
  *
  *   1. count adjacent symbol pairs weighted by word frequency
  *      (`lead(sym)` over word order, groupBy pair, sum(cnt));
  *   2. pick the most frequent pair, ties broken lexicographically on
  *      (left, right) — the determinism contract the oracle replays;
  *   3. apply the merge GREEDILY LEFT-TO-RIGHT within each word: of a run
  *      of overlapping candidate positions (only possible when left=right,
  *      e.g. pair (a,a) in "aaa"), every second one is real — expressed as
  *      gaps-and-islands over candidate row numbers, keeping even offsets
  *      from each island's start — then the matched left symbol becomes
  *      `left+right` and the matched right row disappears.
  *
  * Scale shape (100 TB corpus): the corpus is touched ONCE (the word
  * count); every iteration runs on the distinct-word symbol table —
  * O(Σ|word| over the vocabulary) rows, shuffled by `word` — and ships
  * ONE row (the argmax pair) to the driver, the model-sized
  * aggregate-then-broadcast loop of distributed training. Lineage is
  * truncated per step (`localCheckpoint`, the [[ConnectedComponents]]
  * pattern) so plan depth stays constant. Practical merge counts per this
  * loop are O(hundreds) (one Spark job pair per merge); production 30k+
  * merge vocabularies batch non-conflicting merges per round on the same
  * state shape.
  */
object BpeTrain {

  /** One learned merge: at `step`, `left`+`right` (occurring together
    * `pairCount` weighted times) became the new symbol `left+right`. */
  final case class Merge(step: Int, left: String, right: String,
      pairCount: Long)

  /** Learned model: the ordered merges plus the final vocabulary —
    * initial character alphabet ∪ merge products (the standard BPE vocab
    * definition), ready for [[graft.functions.SubwordTokenize]]. */
  final case class Model(merges: Seq[Merge], alphabet: Seq[String]) {
    def vocab: Seq[String] =
      (alphabet ++ merges.map(m => m.left + m.right)).distinct
  }

  /** Distinct-word frequency table under the dq89 normalization
    * (lower + non-word split) — the corpus-sized step, run once. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(filter(split(lower(col(textCol)), "\\W+"),
        w => length(w) > 0)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** (word, cnt, pos, sym): one row per character occurrence, 1-based. */
  private def initialState(words: DataFrame): DataFrame =
    words.select(col("word"), col("cnt"),
      posexplode(transform(sequence(lit(1), length(col("word"))),
        i => col("word").substr(i, lit(1)))))
      .select(col("word"), col("cnt"),
        (col("pos") + 1).cast("long").as("pos"), col("col").as("sym"))

  /** Learn `numMerges` merges from the corpus text column. Stops early if
    * the pair space drains (every word a single symbol). */
  def learn(df: DataFrame, textCol: String, numMerges: Int): Model = {
    require(numMerges >= 1, "need numMerges >= 1")
    val byWord = Window.partitionBy("word").orderBy("pos")
    val words = wordCounts(df, textCol)
    val alphabet = words
      .select(explode(split(col("word"), "")).as("sym"))
      .where(length(col("sym")) > 0)
      .distinct().orderBy("sym")
      .collect().map(_.getString(0)).toSeq // alphabet-sized driver pull

    var state = initialState(words).localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var step = 1
    var drained = false
    while (step <= numMerges && !drained) {
      val best = state
        .withColumn("nsym", lead(col("sym"), 1).over(byWord))
        .where(col("nsym").isNotNull)
        .groupBy("sym", "nsym").agg(sum(col("cnt")).as("pc"))
        .orderBy(col("pc").desc, col("sym").asc, col("nsym").asc)
        .limit(1).collect() // the argmax pair: ONE row per iteration
      if (best.isEmpty) drained = true
      else {
        val (a, b, pc) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(step, a, b, pc)
        val flagged = state
          .withColumn("rn", row_number().over(byWord))
          .withColumn("isc", coalesce(
            col("sym") === a && lead(col("sym"), 1).over(byWord) === b,
            lit(false)))
          // consecutive candidate rows share (rn - running candidate
          // count); greedy keeps even offsets from each island's start
          .withColumn("isl", col("rn") -
            sum(when(col("isc"), 1).otherwise(0)).over(
              byWord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val valid = flagged.withColumn("vm", col("isc") &&
          ((col("rn") - min(when(col("isc"), col("rn")))
            .over(Window.partitionBy("word", "isl"))) % 2 === 0))
        state = valid
          .withColumn("pvm", lag(col("vm"), 1).over(byWord))
          .where(!coalesce(col("pvm"), lit(false))) // drop merged right rows
          .select(col("word"), col("cnt"), col("pos"),
            when(col("vm"), lit(a + b)).otherwise(col("sym")).as("sym"))
          .localCheckpoint() // constant plan depth across merge steps
        step += 1
      }
    }
    Model(merges.result(), alphabet)
  }
}
