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
}
