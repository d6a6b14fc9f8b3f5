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
  * merge vocabularies use [[learnBatched]], which applies a PROVABLY
  * sequential-equivalent batch of merges per round on the same state
  * shape — see its doc for the safety argument.
  */
object BpeTrain {

  /** `a < b` in UTF-8 BYTE order — the ordering Spark's UTF8String binary
    * comparison (and so the distributed candidate sort) uses. Java
    * String's `<` compares UTF-16 code units, which diverges for
    * supplementary-plane characters (e.g. CJK Ext-B): a surrogate pair's
    * lead unit (0xD800+) sorts BELOW a BMP char ≥ 0xE000 in UTF-16 but
    * ABOVE it in UTF-8 bytes. Driver-side tie-breaks must use THIS
    * compare or batched could pick a different merge than sequential. */
  private[ext] def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

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

  private val byWord = Window.partitionBy("word").orderBy("pos")

  /** Separator for pair keys — a space can't appear inside a symbol (symbols concatenate `\W+`-split word characters). */
  private val Sep = " "

  /** The distinct character alphabet — an alphabet-sized driver pull. */
  private def alphabetOf(words: DataFrame): Seq[String] =
    words.select(explode(split(col("word"), "")).as("sym"))
      .where(length(col("sym")) > 0)
      .distinct().orderBy("sym")
      .collect().map(_.getString(0)).toSeq

  /** Apply a set of pairwise-safe merges in ONE pass over the symbol state
    * (greedy left-to-right per word). Safety precondition (guaranteed by
    * both callers): no two pairs in the set can overlap in any word —
    * adjacent candidate positions therefore always belong to the same
    * self-pair (a,a), so the gaps-and-islands greedy logic is unchanged
    * from the single-merge case. The merged symbol is `sym || nsym`, so no
    * per-pair lookup is needed.
    */
  private def applyMerges(state: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    val keys = pairs.map { case (a, b) => a + Sep + b }
    val flagged = state
      .withColumn("rn", row_number().over(byWord))
      .withColumn("nsym", lead(col("sym"), 1).over(byWord))
      .withColumn("isc", coalesce(
        concat(col("sym"), lit(Sep), col("nsym")).isin(keys: _*), lit(false)))
      // consecutive candidate rows share (rn - running candidate
      // count); greedy keeps even offsets from each island's start
      .withColumn("isl", col("rn") -
        sum(when(col("isc"), 1).otherwise(0)).over(
          byWord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val valid = flagged.withColumn("vm", col("isc") &&
      ((col("rn") - min(when(col("isc"), col("rn")))
        .over(Window.partitionBy("word", "isl"))) % 2 === 0))
    valid
      .withColumn("pvm", lag(col("vm"), 1).over(byWord))
      .where(!coalesce(col("pvm"), lit(false))) // drop merged right rows
      .select(col("word"), col("cnt"), col("pos"),
        when(col("vm"), concat(col("sym"), col("nsym")))
          .otherwise(col("sym")).as("sym"))
      .localCheckpoint() // constant plan depth across merge steps
  }

  /** Learn `numMerges` merges from the corpus text column. Stops early if
    * the pair space drains (every word a single symbol). */
  def learn(df: DataFrame, textCol: String, numMerges: Int): Model =
    learnFromCounts(wordCounts(df, textCol), numMerges)

  /** [[learn]] from a pre-aggregated (word, cnt) table — the training
    * state derives ONLY from word counts, so summed stored partials
    * ([[BpeStore]]) train the exact model of the corpus they count:
    * text is read once per document ever, retraining is model-sized. */
  def learnFromCounts(words: DataFrame, numMerges: Int): Model = {
    require(numMerges >= 1, "need numMerges >= 1")
    val alphabet = alphabetOf(words)
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
        state = applyMerges(state, Seq((a, b)))
        step += 1
      }
    }
    Model(merges.result(), alphabet)
  }

  /** [[learnBatched]]'s result: the model plus the number of merges each
    * round applied — the amortization evidence (total merges / rounds is
    * the per-round Spark-job leverage). */
  final case class BatchedModel(model: Model, roundSizes: Seq[Int])

  /** Batched BPE training, EXACTLY equivalent to [[learn]] merge for
    * merge, at a per-round (not per-merge) Spark-job cost — the production
    * path for 30k+ merge vocabularies. Each round pulls the top
    * `lookahead` pairs (the sequential priority order — count desc,
    * lexicographic tie-break) and then runs one of two exact tiers:
    *
    * == Tier 1: pulled-sub-state simulation (the big-batch path) ==
    *
    * Every occurrence of every candidate pair lives in a word CONTAINING
    * a candidate pair — so the "touched" word set (words with at least
    * one candidate adjacency) carries the ENTIRE count of every
    * candidate, and any merge of a candidate only ever rewrites touched
    * words. Pull exactly those symbol rows to the driver (they are
    * distinct-WORD rows — model-sized, never corpus-sized) and replay
    * textbook sequential BPE in memory: recount, argmax, greedy
    * left-to-right apply, repeat. Merges born inside the round (e.g.
    * ("th","e") right after ("t","h")) are chained naturally, exactly as
    * [[learn]] would. The round stays provably global-exact while the
    * running argmax sorts strictly before the `lookahead`-th pulled pair
    * (any un-pulled pair sorts after it and only ever loses count), and
    * stops at the first merge whose product string collides with a
    * symbol that ever existed (the one case where an un-tracked pair's
    * count could grow). The rewritten sub-state replaces the touched
    * words in ONE distributed update (anti-join ∪ new rows): a round is
    * 4 jobs — candidate count, pull-size count, pull, state rebuild —
    * amortized over every merge the simulation clears, typically
    * bounded only by `lookahead` and the merge budget.
    *
    * The pull is refused above `maxPullSymbols` rows (frequent pairs can
    * touch most of the word table), falling back to tier 2 for that
    * round; `maxPullSymbols <= 0` disables tier 1 outright. At 100 TB
    * the distinct-word symbol table is the model-state bound either way
    * — tier 1 is the single-machine word-table trainer every production
    * BPE uses, reached through one distributed word count.
    *
    * == Tier 2: distributed non-conflicting prefix (the fallback) ==
    *
    * Apply the longest PREFIX of the candidate list that is provably
    * what sequential training would have picked, in one distributed
    * merge pass. Merging p=(a,b) changes only three pair classes:
    * (x,a) and (b,y) DECREASE, and (x, a||b) / (a||b, y) are CREATED —
    * every created occurrence embeds in an (x,a,b) or (a,b,y) trigram of
    * the pre-round state, so pre-round trigram counts upper-bound every
    * created pair. A candidate extends the prefix only if (1) its count
    * is untouched by the selected prefix (right symbol no selected left,
    * left symbol no selected right — which also excludes positional
    * overlap, keeping the one-pass application well-defined); (2) no
    * symbol collision (its symbols aren't selected products, its product
    * never existed); (3) its count strictly exceeds every selected
    * pair's created-pair trigram bound, so nothing born inside the batch
    * can outrank it. The first unsafe candidate ends the round — stop,
    * not skip, because a skipped pair's sequential rank is unknown.
    * Real text concentrates mass on chained pairs, so this tier batches
    * modestly (~2 merges/round measured) — it exists for the rounds
    * tier 1 must refuse.
    */
  def learnBatched(df: DataFrame, textCol: String, numMerges: Int,
      lookahead: Int = 64, maxPullSymbols: Long = 4000000L): BatchedModel = {
    require(numMerges >= 1, "need numMerges >= 1")
    require(lookahead >= 1, "need lookahead >= 1")
    val words = wordCounts(df, textCol)
    val alphabet = alphabetOf(words)
    // every symbol string that has ever existed: alphabet + merge products
    val knownSymbols = scala.collection.mutable.Set[String](alphabet: _*)
    var state = initialState(words).localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    val rounds = Seq.newBuilder[Int]
    var step = 1
    var drained = false
    while (step <= numMerges && !drained) {
      val cands = state
        .withColumn("nsym", lead(col("sym"), 1).over(byWord))
        .where(col("nsym").isNotNull)
        .groupBy("sym", "nsym").agg(sum(col("cnt")).as("pc"))
        .orderBy(col("pc").desc, col("sym").asc, col("nsym").asc)
        .limit(lookahead).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      if (cands.isEmpty) drained = true
      else {
        val want = numMerges - step + 1
        val simulated =
          if (maxPullSymbols <= 0) None
          else simulatedRound(state, cands, lookahead, knownSymbols, want,
            step, maxPullSymbols)
        val (batch, next) = simulated.getOrElse(
          conservativeRound(state, cands, knownSymbols, want, step))
        merges ++= batch
        knownSymbols ++= batch.map(m => m.left + m.right)
        rounds += batch.size
        state = next
        step += batch.size
      }
    }
    BatchedModel(Model(merges.result(), alphabet), rounds.result())
  }

  /** Tier-1 round (see [[learnBatched]] doc): pull the touched-word
    * sub-state, simulate sequential BPE in memory up to the exactness
    * horizon, rebuild the distributed state once. Returns None when the
    * pull would exceed `maxPullSymbols` or the first merge already
    * collides (tier 2 handles both exactly). */
  private def simulatedRound(state: DataFrame,
      cands: Seq[(String, String, Long)], lookahead: Int,
      knownSymbols: scala.collection.Set[String], want: Int, step: Int,
      maxPullSymbols: Long): Option[(Seq[Merge], DataFrame)] = {
    val spark = state.sparkSession
    import spark.implicits._
    val candKeys = cands.map { case (a, b, _) => a + Sep + b }
    val touched = state
      .withColumn("nsym", lead(col("sym"), 1).over(byWord))
      .where(concat(col("sym"), lit(Sep), col("nsym")).isin(candKeys: _*))
      .select("word").distinct()
    val sub = state.join(touched, Seq("word"), "left_semi")
      .select("word", "cnt", "pos", "sym")
    if (sub.count() > maxPullSymbols) return None

    // word table: (cnt, symbol buffer), plus live pair counts and a
    // pair -> word-index map (entries may go stale; re-checked on use)
    val pulled = sub.collect().groupBy(_.getString(0)).toArray
    val wordArr = pulled.map { case (w, rs) =>
      (w, rs.head.getLong(1),
        scala.collection.mutable.ArrayBuffer(
          rs.sortBy(_.getLong(2)).map(_.getString(3)).toSeq: _*))
    }
    val pairCnt = scala.collection.mutable.Map
      .empty[(String, String), Long].withDefaultValue(0L)
    val pairWords = scala.collection.mutable.Map
      .empty[(String, String), scala.collection.mutable.Set[Int]]
    def index(i: Int, sign: Long): Unit = {
      val (_, c, syms) = wordArr(i)
      var j = 0
      while (j < syms.length - 1) {
        val p = (syms(j), syms(j + 1))
        pairCnt(p) += sign * c
        if (sign > 0)
          pairWords.getOrElseUpdate(p,
            scala.collection.mutable.Set.empty[Int]) += i
        j += 1
      }
    }
    wordArr.indices.foreach(index(_, 1L))

    // pairs allowed to win the in-memory argmax: the pulled candidates
    // (their FULL corpus count lives in the sub-state — any word holding
    // a candidate adjacency is touched by construction) plus pairs whose
    // symbols were born this round (count 0 outside by freshness)
    val tracked = scala.collection.mutable.Set[(String, String)](
      cands.map { case (a, b, _) => (a, b) }: _*)
    val roundProducts = scala.collection.mutable.Set.empty[String]
    // exactness horizon: with a full pull of `lookahead` rows, an
    // un-pulled pair exists only past the last pulled triple, and only
    // ever loses count — the argmax is global while it sorts strictly
    // before that triple
    val floor: Option[(Long, String, String)] =
      if (cands.size == lookahead)
        Some((cands.last._3, cands.last._1, cands.last._2))
      else None
    def beatsFloor(pc: Long, a: String, b: String): Boolean = floor match {
      case None => true
      case Some((fc, fa, fb)) =>
        pc > fc || (pc == fc && (BpeTrain.utf8Lt(a, fa) ||
          (a == fa && BpeTrain.utf8Lt(b, fb))))
    }

    val known = scala.collection.mutable.Set[String](knownSymbols.toSeq: _*)
    val sel = Seq.newBuilder[Merge]
    var taken = 0
    var stop = false
    while (!stop && taken < want) {
      var best: ((String, String), Long) = null
      tracked.foreach { p =>
        val c = pairCnt(p)
        if (c > 0 && (best == null || c > best._2 ||
            (c == best._2 && (BpeTrain.utf8Lt(p._1, best._1._1) ||
              (p._1 == best._1._1 && BpeTrain.utf8Lt(p._2, best._1._2))))))
          best = (p, c)
      }
      if (best == null) stop = true // sub-state drained; outer loop re-probes
      else {
        val ((a, b), pc) = best
        if (!beatsFloor(pc, a, b) || known.contains(a + b)) stop = true
        else {
          sel += Merge(step + taken, a, b, pc)
          known += (a + b); roundProducts += (a + b)
          val hosts = pairWords.get((a, b)).map(_.toArray)
            .getOrElse(Array.empty[Int])
          hosts.foreach { i =>
            val syms = wordArr(i)._3
            var hit = false
            var j = 0
            while (!hit && j < syms.length - 1) {
              hit = syms(j) == a && syms(j + 1) == b; j += 1
            }
            if (hit) { // stale index entries skip here
              index(i, -1L)
              val out = scala.collection.mutable.ArrayBuffer.empty[String]
              var k = 0
              while (k < syms.length) {
                if (k < syms.length - 1 && syms(k) == a && syms(k + 1) == b) {
                  out += (a + b); k += 2 // greedy left-to-right
                } else { out += syms(k); k += 1 }
              }
              syms.clear(); syms ++= out
              index(i, 1L)
              // newly adjacent pairs always contain a this-round product
              var m = 0
              while (m < syms.length - 1) {
                if (roundProducts.contains(syms(m)) ||
                    roundProducts.contains(syms(m + 1)))
                  tracked += ((syms(m), syms(m + 1)))
                m += 1
              }
            }
          }
          taken += 1
        }
      }
    }
    val batch = sel.result()
    if (batch.isEmpty) None // first merge collided: tier 2 is exact for it
    else {
      val newRows = wordArr.iterator.flatMap { case (w, c, syms) =>
        syms.iterator.zipWithIndex.map { case (s, i) => (w, c, (i + 1).toLong, s) }
      }.toSeq
      val rebuilt = state.join(touched, Seq("word"), "left_anti")
        .select("word", "cnt", "pos", "sym")
        .union(newRows.toDF("word", "cnt", "pos", "sym")
          .repartition(spark.sparkContext.defaultParallelism))
        .localCheckpoint()
      Some((batch, rebuilt))
    }
  }

  /** Tier-2 round (see [[learnBatched]] doc): the longest provably
    * sequential-exact prefix of the candidate list, applied in one
    * distributed pass. Always applies at least the head (the global
    * argmax). */
  private def conservativeRound(state: DataFrame,
      cands: Seq[(String, String, Long)],
      knownSymbols: scala.collection.Set[String], want: Int,
      step: Int): (Seq[Merge], DataFrame) = {
    val bounds = trigramBounds(state,
      cands.map { case (a, b, _) => a + Sep + b })
    val sel = Seq.newBuilder[Merge]
    var lefts = Set.empty[String]
    var rights = Set.empty[String]
    var products = Set.empty[String]
    var maxCreated = Long.MinValue
    var stop = false
    var i = 0
    while (!stop && i < math.min(cands.size, want)) {
      val (a, b, pc) = cands(i)
      // the head of the list is the sequential argmax: even if its
      // product collides with a historical symbol, a 1-merge round is
      // still exact (sequential recounts before the next pick)
      val safe = i == 0 || (
        !lefts.contains(b) && !rights.contains(a) && // count unchanged
        !products.contains(a) && !products.contains(b) &&
        !knownSymbols.contains(a + b) && // no collision-driven increase
        pc > maxCreated) // no created pair can outrank it
      if (!safe) stop = true
      else {
        sel += Merge(step + i, a, b, pc)
        lefts += a; rights += b; products += (a + b)
        maxCreated = math.max(maxCreated, bounds.getOrElse(a + Sep + b, 0L))
        i += 1
      }
    }
    val batch = sel.result()
    (batch, applyMerges(state, batch.map(m => (m.left, m.right))))
  }

  /** Per candidate pair (keyed `a b` space-separated), the max pre-batch trigram count
    * with the pair as prefix or suffix — the upper bound on any pair a
    * merge of it can create (see [[learnBatched]] doc). */
  private def trigramBounds(state: DataFrame,
      candKeys: Seq[String]): Map[String, Long] = {
    val tri = state
      .withColumn("s1", lead(col("sym"), 1).over(byWord))
      .withColumn("s2", lead(col("sym"), 2).over(byWord))
      .where(col("s1").isNotNull && col("s2").isNotNull)
      .withColumn("pfx", concat(col("sym"), lit(Sep), col("s1")))
      .withColumn("sfx", concat(col("s1"), lit(Sep), col("s2")))
      .where(col("pfx").isin(candKeys: _*) || col("sfx").isin(candKeys: _*))
      .groupBy("sym", "s1", "s2")
      .agg(sum(col("cnt")).as("tc"), first(col("pfx")).as("pfx"),
        first(col("sfx")).as("sfx"))
    tri.select(col("pfx").as("pk"), col("tc"))
      .union(tri.select(col("sfx").as("pk"), col("tc")))
      .where(col("pk").isin(candKeys: _*))
      .groupBy("pk").agg(max(col("tc")).as("bound"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }
}
