package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 lexical retrieval over a document corpus — the ranking half of a
  * training-data pipeline's retrieval loops (dedup-by-retrieval, hard-negative
  * mining, contamination triage). Complements [[TextAnalysis.topTfIdfTerm]]
  * (per-document argmax) with cross-document RANKING for a query set.
  *
  * Bit-portability (the dq69/dq53 rule): the textbook BM25 idf is
  * `ln((N - df + 0.5)/(df + 0.5) + 1)`, but `ln` is not guaranteed
  * bit-identical across engines' libm — so this scorer uses the RATIONAL idf
  * `(N - df + 0.5)/(df + 0.5)` (the same monotone-in-rarity core, no log; it
  * weights rarity more aggressively, like dq69's rational TF-IDF). Every
  * per-term factor is then IEEE +,×,÷ over a fixed expression tree —
  * bit-identical on any conforming engine — and the per-term score is floored
  * into integer MICRO-UNITS whose per-(query,doc) sum is associative, so the
  * aggregation is reassociation-proof under any partial-aggregation plan.
  * (Micro-unit magnitude is ~idf·(k1+1)·10⁶ ≤ ~2.2e6·N/df — long-safe far
  * past any realistic corpus.)
  *
  * Shape at 100 TB: document bodies never shuffle — the corpus explodes to
  * (doc, dl, term) and aggregates term frequencies with map-side partials
  * (the one corpus-sized exchange). The query set broadcasts; joining it
  * FIRST prunes the postings to query vocabulary before document frequencies
  * are counted, so the df aggregation and everything after it is
  * query-vocabulary-sized, not corpus-vocabulary-sized. Corpus length
  * statistics ride a broadcast 1-row frame (no driver action), and the final
  * top-k ranks through the bounded-heap `TopKPerKeyExec` — O(qids·k) through
  * the exchange, not the scored candidate set.
  */
object Bm25 {

  /** Top-k BM25 documents per query.
    *
    * @param corpus  documents; `idCol` (long), `textCol` (string)
    * @param queries exploded query terms: (`qid` long, `term` string) — one
    *                row per distinct query term. Assumed SMALL (broadcast).
    * @return (qid, vid, score_micro, rnk) — `score_micro` is the BM25 score
    *         in integer micro-units; rows with no term overlap are absent.
    *         A query's own document (vid == qid) is excluded: the retrieval
    *         use cases this serves (near-dup triage, negative mining) never
    *         want the identity hit.
    */
  def topK(corpus: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    CandidateTopK.rankedTopPerQuery(
      scores(corpus, idCol, textCol, queries, k1, b), "score_micro", k)

  /** Hard-negative mining (the contrastive-training data prep step, e.g.
    * the BM25-negative selection in DPR, Karpukhin et al. 2020 §4.2): the
    * top-k ranked documents per query AFTER removing the query's known
    * positives — the highest-scoring lexical matches that are NOT
    * relevant, which is exactly what contrastive training wants as
    * negatives. `positives` is (qid, vid), small relative to the corpus
    * (labeled pairs) — the exclusion is a broadcast LEFT ANTI on the
    * scored candidates BEFORE ranking, so a removed positive frees its
    * rank for the next candidate (filtering after top-k would return
    * short lists); identity hits are already excluded by [[topK]]'s
    * contract.
    */
  def hardNegatives(corpus: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, positives: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val scored = scores(corpus, idCol, textCol, queries, k1, b)
    val negatives = scored.join(
      broadcast(positives.select(col("qid"), col("vid"))),
      Seq("qid", "vid"), "left_anti")
    CandidateTopK.rankedTopPerQuery(negatives, "score_micro", k)
  }

  /** The exploded posting relation of a corpus: one row per distinct
    * (document, term) — `(__id, __dl, term, __tf)`. This is what
    * [[Bm25Store]] persists; the session path derives it per call. */
  /** The tokenized frame `(__id, __toks, __dl)` both the posting
    * relation and the corpus statistics derive from — [[Bm25Store]]
    * caches ONE instance of this per append so document text is
    * tokenized exactly once per indexing pass. */
  private[ext] def tokenized(corpus: DataFrame, idCol: String,
      textCol: String): DataFrame =
    corpus.select(col(idCol).as("__id"),
        TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col("__id"), col("__toks"),
        size(col("__toks")).cast("long").as("__dl"))

  /** The posting aggregation with ONE null-term MARKER row per batch
    * row: every document row appends a null element to its token array
    * before exploding, so after the `groupBy(__id, __dl, term)` the
    * null-term rows carry the exact row MULTIPLICITY in `__tf` —
    * zero-token docs, null-text docs, and duplicate document rows all
    * included, which is precisely what the session scorer's
    * `count(*)`-over-corpus-rows N demands (a distinct-id count would
    * undercount a batch that carries the same document twice).
    * [[Bm25Store]] persists this ONE post-aggregation frame and derives
    * both the posting write (null terms filtered out) and the exact
    * N/Σdl statistics from it — one tokenize pass, and the cached layer
    * is the compact aggregated relation, not per-document token arrays. */
  private[ext] def postingsWithRowMarkers(withLen: DataFrame): DataFrame =
    withLen.select(col("__id"), col("__dl"),
        explode_outer(concat(col("__toks"),
          array(lit(null).cast("string")))).as("term"))
      .groupBy("__id", "__dl", "term")
      .agg(count(lit(1)).as("__tf"))

  /** The shared scoring TAIL over a query-vocabulary-pruned posting
    * relation — one expression tree, used verbatim by the per-call path
    * and the stored index ([[Bm25Store.search]]), so session and stored
    * ranking can never drift.
    *
    * @param postings (__id, __dl, term, __tf) PRUNED to the query
    *                 vocabulary (df over it equals corpus df for every
    *                 query term)
    * @param stats    one row: (__n: long total docs, __avgdl: double)
    */
  private[ext] def scoreFromPostings(postings: DataFrame, queries: DataFrame,
      stats: DataFrame, k1: Double, b: Double): DataFrame = {
    val dfreq = postings.groupBy("term").agg(count(lit(1)).as("__df"))

    val idf = (col("__n").cast("double") - col("__df") + lit(0.5)) /
      (col("__df") + lit(0.5))
    val tfPart = (col("__tf") * lit(k1 + 1)) /
      (col("__tf") + lit(k1) * (lit(1 - b) + lit(b) * (col("__dl") / col("__avgdl"))))
    val termMicro = floor(idf * tfPart * lit(1000000.0)).cast("long")

    postings
      .join(broadcast(queries.select(col("qid"), col("term"))), Seq("term"))
      .filter(col("__id") =!= col("qid"))
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("qid"), col("__id").as("vid"), termMicro.as("__m"))
      .groupBy("qid", "vid")
      .agg(sum(col("__m")).as("score_micro"))
  }

  /** The shared scoring pipeline: (qid, vid, score_micro) for every
    * (query, document) pair with term overlap, identity hits excluded.
    */
  private def scores(corpus: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, k1: Double, b: Double): DataFrame = {
    val toks = corpus.select(col(idCol).as("__id"),
      TextAnalysis.tokens(col(textCol)).as("__toks"))
    val withLen = toks.select(col("__id"), col("__toks"),
      size(col("__toks")).cast("long").as("__dl"))

    // corpus length statistics: one tiny aggregate, broadcast as a 1-row frame
    val stats = withLen.agg(count(lit(1)).as("__n"),
      (sum(col("__dl")).cast("double") / count(lit(1))).as("__avgdl"))

    val terms = withLen.select(col("__id"), col("__dl"),
      explode(col("__toks")).as("term"))
    val tf = terms.groupBy("__id", "__dl", "term")
      .agg(count(lit(1)).as("__tf"))

    // prune postings to the query vocabulary BEFORE counting df: df over the
    // pruned postings equals df over the full corpus for every query term,
    // and the vocabulary-sized aggregation never happens
    val qvocab = queries.select(col("term")).distinct()
    val postings = tf.join(broadcast(qvocab), Seq("term"))
    scoreFromPostings(postings, queries, stats, k1, b)
  }
}
