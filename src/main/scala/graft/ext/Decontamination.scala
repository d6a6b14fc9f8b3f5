package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination (EXT) — remove training documents that share
  * word n-grams with an evaluation set, the standard guard against eval
  * leakage in LLM pre-training corpora (the n-gram-overlap family of
  * filters described publicly in the GPT-3 and PaLM papers; 8–13 word
  * grams are typical).
  *
  * Shape at 100 TB: the eval set is tiny by construction (benchmarks), so
  * its distinct grams BROADCAST; the training corpus explodes to
  * (doc, gram) and joins the broadcast — ONE scan of the corpus, document
  * bodies never shuffle, and there is no train×eval cartesian anywhere.
  * Gram identity is lowercase word tokens joined by single spaces
  * ([[TextAnalysis.tokens]] semantics), reproducible cross-engine — the
  * dq67 oracle re-derives membership bit-for-bit in DuckDB.
  */
object Decontamination {

  /** Distinct lowercase word n-grams of `text` (empty array when the
    * document has fewer than `n` tokens).
    *
    * Convenience form — inside the gram lambda the tokenizer subtree is
    * re-evaluated PER POSITION (HOF lambdas run interpreted; no
    * common-subexpression elimination), so for anything beyond a one-off,
    * project the tokens to their own column and use
    * [[wordNgramsFromTokens]] (that's what [[contaminationReport]] does —
    * it was measured 5× slower inline).
    */
  def wordNgrams(text: Column, n: Int): Column =
    wordNgramsFromTokens(TextAnalysis.tokens(text), n)

  /** [[wordNgrams]] over a pre-projected token-array column. */
  def wordNgramsFromTokens(toks: Column, n: Int): Column = {
    require(n >= 1, "n must be positive")
    when(size(toks) < n, array().cast("array<string>")).otherwise(
      array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
  }

  /** Contamination report: one row per training document sharing at least
    * one n-gram with the eval set — (idCol, n_shared = distinct shared
    * grams). The survivors are `train` anti-joined on these ids
    * ([[decontaminate]]).
    */
  def contaminationReport(train: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, n: Int = 8): DataFrame = {
    // tokens materialize as their own projection below the Generate, so the
    // regex tokenizer runs once per DOCUMENT, not once per gram position
    def grams(df: DataFrame, cols: Column*): DataFrame =
      df.select(cols :+ TextAnalysis.tokens(col(textCol)).as("__toks"): _*)
        .select(cols :+ explode(wordNgramsFromTokens(col("__toks"), n)).as("__gram"): _*)
    val tg = grams(train, col(idCol))
    val eg = grams(evalSet).distinct()
    tg.join(broadcast(eg), "__gram")
      .groupBy(idCol)
      .agg(count_distinct(col("__gram")).as("n_shared"))
  }

  /** The clean corpus: `train` minus every contaminated document. */
  def decontaminate(train: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, n: Int = 8): DataFrame =
    train.join(
      contaminationReport(train, evalSet, idCol, textCol, n).select(idCol),
      Seq(idCol), "left_anti")

  /** SEMANTIC decontamination report — the embedding-space complement of
    * [[contaminationReport]]: training vectors whose cosine against ANY
    * eval vector exceeds `threshold` (the paraphrase-leakage guard n-gram
    * overlap cannot see — same eval item reworded). One row per flagged
    * training vector: (idCol, n_eval_hits, max_sim).
    *
    * Shape at 100 TB: identical to the n-gram path — the eval set is tiny
    * by construction, so it BROADCASTS and the train side is ONE scan with
    * a codegen'd dot-product kernel per (train, eval) pair; no shuffle
    * until the per-id aggregate (flagged rows only, threshold-pruned).
    * This is EXACT (brute-force against the broadcast eval set) — for a
    * decontamination gate, cell-bucketed recall tricks (dq75) are the
    * wrong trade: a false negative ships a contaminated document.
    * `max_sim` is order-independent (max of per-pair fixed IEEE
    * expression trees), so the report hash-matches cross-engine.
    */
  def semanticReport(train: DataFrame, evalSet: DataFrame, idCol: String,
      embCol: String, threshold: Double): DataFrame = {
    import graft.functions.VectorFunctions
    val tr = train.select(col(idCol), col(embCol).as("__emb"),
      VectorFunctions.l2Norm(col(embCol)).as("__nrm"))
    val ev = evalSet.select(col(embCol).as("__eemb"),
      VectorFunctions.l2Norm(col(embCol)).as("__enrm"))
    tr.crossJoin(broadcast(ev))
      .select(col(idCol),
        (VectorFunctions.dot(col("__emb"), col("__eemb")) /
          (col("__nrm") * col("__enrm"))).as("__sim"))
      .filter(col("__sim") > threshold)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_eval_hits"), max(col("__sim")).as("max_sim"))
  }

  /** The semantically-clean corpus: `train` minus every flagged vector. */
  def semanticDecontaminate(train: DataFrame, evalSet: DataFrame,
      idCol: String, embCol: String, threshold: Double): DataFrame =
    train.join(
      semanticReport(train, evalSet, idCol, embCol, threshold).select(idCol),
      Seq(idCol), "left_anti")

  /** CELL-PRUNED [[semanticReport]] (r6 directive #3) — the scale path for
    * a 10⁶-item eval battery, where even a broadcast map-side product makes
    * corpus×eval compute real: train rows are assigned to the `index`'s
    * trained cells (map-only), each eval vector probes its `nprobe` nearest
    * cells, and the exact cosine runs only on corpus×(probed cells) —
    * the same candidate shape as [[IvfIndex.queryAll]], ~nprobe/k of the
    * brute product per eval item.
    *
    * EXACTNESS CAVEAT, by design: a train vector whose cosine clears the
    * threshold can sit outside its eval hit's probed cells, so this variant
    * can under-report — [[semanticReport]] (exact) stays the gated default
    * because a decon false negative ships leakage. Use this form for
    * triage/scale passes and verify the survivors of ITS flags exactly, or
    * when the probe set is provably sufficient for the battery (the
    * `CellPrunedSpec` recall-1.0 planting shows the check to run).
    */
  def semanticReportPruned(train: DataFrame, evalSet: DataFrame,
      idCol: String, embCol: String, threshold: Double,
      index: IvfIndex, nprobe: Int): DataFrame = {
    import graft.functions.VectorFunctions
    val spark = train.sparkSession
    val tr = index.withCell(
      train.select(col(idCol), col(embCol).as("__emb"),
        VectorFunctions.l2Norm(col(embCol)).as("__nrm")), "__emb")
    val ev = evalSet.select(col(embCol).as("__eemb"),
        VectorFunctions.l2Norm(col(embCol)).as("__enrm"),
        explode(index.probesFor(col(embCol), nprobe, spark)).as("__probe"))
    // a train row has ONE cell and an eval's probes are distinct, so each
    // (train, eval) pair survives the join at most once — hit counts need
    // no dedup
    tr.join(broadcast(ev), col("cell") === col("__probe"))
      .select(col(idCol),
        (VectorFunctions.dot(col("__emb"), col("__eemb")) /
          (col("__nrm") * col("__enrm"))).as("__sim"))
      .filter(col("__sim") > threshold)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_eval_hits"), max(col("__sim")).as("max_sim"))
  }
}
