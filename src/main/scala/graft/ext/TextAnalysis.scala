package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data pipelines, all pure
  * `functions._` compositions (codegen'd, shuffle-free per row).
  */
object TextAnalysis {

  /** Lowercased word tokens: split on runs of non-word characters.
    * (`\W+` has identical semantics on ASCII in Java and RE2/DuckDB regex —
    * the oracle relies on this.)
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\W+"), t => length(t) > 0)

  /** Whitespace-delimited token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish subword count estimate: words + digits + punctuation runs.
    * Cheap proxy for LLM token accounting at ingest scale.
    */
  def subwordCountEstimate(text: Column): Column =
    size(filter(split(text, "(?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9])"), t => length(trim(t)) > 0))

  /** Sliding character n-gram shingles (distinct).
    * (Spark's `sequence(1, 0)` counts DOWN — guard short texts explicitly.)
    */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) < n, array().cast("array<string>")).otherwise(
      array_distinct(transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n)))))

  /** Character n-gram shingles packed into ints (distinct, n ≤ 4, ASCII
    * payloads): each gram becomes Σ code(cᵢ)·256^(n-1-i). Injective for
    * ASCII, so set cardinalities — and therefore Jaccard values — are
    * identical to [[charShingles]], while intersections compare primitive
    * ints instead of strings (~4× on large verification joins).
    */
  def packedCharShingles(text: Column, n: Int): Column = {
    require(n >= 1 && n <= 4, "packedCharShingles supports n in [1,4]")
    val gram = (i: Column) =>
      (0 until n).map(k => ascii(text.substr(i + k, lit(1))) * lit(1 << (8 * (n - 1 - k))))
        .reduce(_ + _)
    when(length(text) < n, array().cast("array<int>")).otherwise(
      array_distinct(transform(sequence(lit(1), length(text) - (n - 1)), gram)))
  }

  /** Canonical document fingerprint: lowercase, collapse whitespace, trim,
    * then md5 — engine-portable (DuckDB md5 produces the identical digest),
    * and 32 hex chars shuffle far cheaper than document bodies.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** PII scrubbing for training corpora: replace email addresses and
    * (separator-structured) phone numbers with stable placeholder tokens.
    * Pure `regexp_replace` — codegen'd, fused into the scan stage, no
    * shuffle, no UDF; the patterns stay in the Java∩RE2 regex subset so
    * the DuckDB oracle (dq85) applies the identical expressions with its
    * 'g' flag (Spark's regexp_replace is global by default). Redaction is
    * conservative by construction: placeholders are plain tokens, so every
    * downstream operator (shingles, fingerprints, token counts) treats
    * scrubbed text uniformly. Counting surfaces via `regexp_count` for the
    * removal report a curation pipeline logs.
    */
  val EmailRegex = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRegex = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"

  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRegex, "<EMAIL>"),
      PhoneRegex, "<PHONE>")

  /** (n_emails, n_phones) found in `text` — the redaction report columns. */
  def piiCounts(text: Column): (Column, Column) =
    (regexp_count(text, lit(EmailRegex)), regexp_count(text, lit(PhoneRegex)))

  /** Per-language stopword hit ratio: |tokens ∩ stopwords| / |tokens|.
    * Deterministic pure arithmetic → oracle-friendly.
    */
  def stopwordRatio(toks: Column, stopwords: Seq[String]): Column = {
    val sw = array(stopwords.map(lit): _*)
    when(size(toks) === 0, lit(0d))
      .otherwise(size(array_intersect_count(toks, sw)).cast("double") / size(toks))
  }

  // array of tokens that are stopwords (with duplicates — a hit ratio over
  // token OCCURRENCES, not distinct tokens)
  private def array_intersect_count(toks: Column, sw: Column): Column =
    filter(toks, t => array_contains(sw, t))

  /** Tiny n-gram/stopword language-ID heuristic: score = occurrence ratio of
    * each language's top stopwords; argmax wins, 'und' (undetermined) if all
    * scores are zero. Ties break by language code order (deterministic).
    */
  def languageId(text: Column): Column = languageIdFrom(tokens(text))

  /** [[languageId]] over a precomputed token array — materialize the tokens
    * as their own projected column when combining several text metrics, so
    * the tokenizer runs once per row instead of once per metric.
    */
  def languageIdFrom(toks: Column): Column = {
    val langs: Seq[(String, Seq[String])] = Seq(
      "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "sie"),
      "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
      "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
      "fr" -> Seq("le", "la", "et", "les", "des", "est", "un", "une", "du", "que")
    )
    val scored = langs.map { case (code, sws) => (code, stopwordRatio(toks, sws)) }
    // argmax via chained when(): deterministic (first match = lexicographically
    // smallest language code on ties), fully codegen'd
    val maxScore = scored.map(_._2).reduceLeft(greatest(_, _))
    scored.foldRight(lit("und")) { case ((code, s), acc) =>
      when(s === maxScore && maxScore > 0d, lit(code)).otherwise(acc)
    }
  }

  /** Quality-score components: character count, token count, mean token
    * length, punctuation ratio, stopword ratio, and a composite score in
    * [0,1]. All deterministic arithmetic.
    */
  def qualityColumns(text: Column): Seq[(String, Column)] =
    qualityColumnsFrom(text, tokens(text))

  /** [[qualityColumns]] over a precomputed token array (see [[languageIdFrom]]). */
  def qualityColumnsFrom(text: Column, toks: Column): Seq[(String, Column)] = {
    val nChars    = length(text).cast("double")
    val nToks     = size(toks).cast("double")
    val meanLen   = when(nToks === 0, lit(0d))
      .otherwise(aggregate(toks, lit(0d), (acc, t) => acc + length(t)) / nToks)
    val punct     = length(regexp_replace(text, "[^.,;:!?'\"()\\[\\]{}-]", "")).cast("double")
    val punctRatio = when(nChars === 0, lit(0d)).otherwise(punct / nChars)
    val swRatio   = stopwordRatio(toks, Seq(
      "the", "and", "of", "to", "a", "in", "is", "it", "that", "for"))
    // composite: reward stopword presence & sane token length, punish punctuation soup
    val score = greatest(lit(0d), least(lit(1d),
      lit(0.5) * least(swRatio * 5, lit(1d)) +
      lit(0.3) * when(meanLen.between(3d, 10d), 1d).otherwise(0d) +
      lit(0.2) * (lit(1d) - least(punctRatio * 10, lit(1d)))))
    Seq(
      "n_chars_m"    -> nChars,
      "n_tokens"     -> nToks,
      "mean_tok_len" -> meanLen,
      "punct_ratio"  -> punctRatio,
      "stopword_ratio" -> swRatio,
      "quality_score"  -> score
    )
  }

  /** Gopher-style repetition signal: the fraction of all token BIGRAMS
    * taken by the single most frequent one (Rae et al. 2021 §A1.1 use
    * exactly this family of top-n-gram-fraction filters to drop
    * boilerplate/spam). High ratio = repetitive text.
    *
    * Shape at 100 TB: bigrams explode then aggregate — the (doc_id, bigram)
    * shuffle pre-aggregates map-side, and the per-doc max/sum is a second
    * tiny aggregation keyed on doc_id only. No N², no per-row quadratic HOF.
    * Docs with < 2 tokens have no bigrams and are dropped (explode of an
    * empty array), mirroring the oracle's HAVING-style filter.
    */
  def repetitionRatio(df: DataFrame, idCol: String, textCol: String): DataFrame =
    topNgramFraction(df, idCol, textCol, 2)

  /** [[repetitionRatio]] generalized to any gram width — Rae et al. §A1.1
    * gate on the top-2/3/4-gram fractions together (each width catches a
    * different boilerplate period). Documents with fewer than `n` tokens
    * have no grams and drop out. Same explode + two-level-aggregation
    * shape for every width.
    */
  def topNgramFraction(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 1, "n must be positive")
    val grams = when(size(col("__toks")) >= n,
      transform(sequence(lit(0), size(col("__toks")) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(col("__toks"), i + j + 1)): _*)))
      .otherwise(array())
    df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), explode(grams).as("__bg"))
      .groupBy(idCol, "__bg").agg(count(lit(1)).as("__c"))
      .groupBy(idCol).agg(max("__c").as("__mx"), sum("__c").as("__tot"))
      .select(col(idCol), (col("__mx") / col("__tot")).as("rep_ratio"))
  }

  /** Gopher duplicate-LINE statistics (Rae et al. 2021 §A1.1 gate on the
    * full family: duplicate line fraction, duplicate PARAGRAPH fraction —
    * pass `delimRegex = "\\n{2,}"` — and the duplicate-character variants,
    * all computed here): per document,
    *  - `dup_line_frac`  = (lines − distinct lines) / lines — the fraction
    *    of line OCCURRENCES that repeat an earlier line
    *  - `dup_char_frac`  = characters inside those repeat occurrences /
    *    total line characters
    * Lines are the non-empty segments between `delimRegex` matches.
    * Documents with zero non-empty lines drop out (no denominator).
    *
    * All-integer numerators/denominators with ONE double division each, so
    * the fractions are bit-identical on any engine. Shape at 100 TB: same
    * two-level aggregation as [[repetitionRatio]] — (doc, line) pairs
    * shuffle with map-side partials, never document bodies, and the second
    * aggregation is keyed on doc_id only.
    */
  def duplicateLineStats(df: DataFrame, idCol: String, textCol: String,
      delimRegex: String = "\n"): DataFrame = {
    val lines = filter(split(col(textCol), delimRegex), l => length(l) > 0)
    df.select(col(idCol), explode(lines).as("__line"))
      .groupBy(idCol, "__line").agg(count(lit(1)).as("__cnt"))
      .select(col(idCol), col("__cnt"), length(col("__line")).as("__ln"))
      .groupBy(idCol).agg(
        sum("__cnt").as("__n"), count(lit(1)).as("__nd"),
        sum((col("__cnt") - 1) * col("__ln")).as("__dupc"),
        sum(col("__cnt") * col("__ln")).as("__totc"))
      .select(col(idCol), col("__n").as("n_lines"),
        ((col("__n") - col("__nd")).cast("double") / col("__n").cast("double"))
          .as("dup_line_frac"),
        (col("__dupc").cast("double") / col("__totc").cast("double"))
          .as("dup_char_frac"))
  }

  /** Corpus-level boilerplate-line removal (the CCNet/RefinedWeb paragraph
    * gate): drop every line that appears in more than `maxDocFrac` of the
    * corpus's documents (navigation chrome, cookie banners, license
    * footers), preserving the order of the surviving lines. Returns one row
    * per input document: (id, clean_text, n_lines_kept, n_lines_removed) —
    * documents whose every line is boilerplate come back with an empty
    * `clean_text`, not dropped.
    *
    * Shape at 100 TB: line TEXT never shuffles — the document-frequency
    * aggregation runs over md5 digests (distinct per doc first, so
    * within-doc repeats don't inflate df), and the boilerplate set is
    * intrinsically small — at most avgLinesPerDoc / maxDocFrac distinct
    * lines can each appear in > maxDocFrac of documents — so it collapses
    * to a single broadcast array. Removal is then a map-side array filter on the
    * original lines column — the corpus's bodies stay in their scan
    * partitions end-to-end. The per-line `md5` inside the filter lambda
    * runs interpreted (HOF rule), but it is per-LINE work against a small
    * broadcast set, not a per-pair join.
    */
  def removeBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
      delimRegex: String = "\n", joinDelim: String = "\n",
      maxDocFrac: Double = 0.5): DataFrame = {
    val lines = filter(split(col(textCol), delimRegex), l => length(l) > 0)
    val withLines = df.select(col(idCol), lines.as("__lines"))
    CacheScope.withCached(withLines) {
      val hashes = withLines.select(col(idCol),
        explode(array_distinct(transform(col("__lines"), l => md5(l)))).as("__h"))
      val n = withLines.agg(count(lit(1)).as("__n"))
      val boil = hashes.groupBy("__h").agg(count(lit(1)).as("__docs"))
        .crossJoin(broadcast(n))
        .filter(col("__docs").cast("double") / col("__n") > maxDocFrac)
      val boilSet = boil.agg(coalesce(collect_list(col("__h")),
        array().cast("array<string>")).as("__boil"))
      val kept = filter(col("__lines"),
        l => !array_contains(col("__boil"), md5(l)))
      withLines.crossJoin(broadcast(boilSet))
        .select(col(idCol),
          concat_ws(joinDelim, kept).as("clean_text"),
          size(kept).cast("long").as("n_lines_kept"),
          (size(col("__lines")) - size(kept)).cast("long").as("n_lines_removed"))
    }
  }

  /** Fixed-window document chunking with overlap — the context-length prep
    * step of a training pipeline: each document becomes ⌈len/stride⌉ chunks
    * of up to `size` chars starting every `stride` chars (overlap =
    * size − stride). Pure `sequence` + explode + `substr`: the blow-up is
    * declarative, so it pipelines inside the scan stage with no shuffle,
    * and chunk identity (doc_id, chunk_idx) is layout-independent.
    *
    * Empty/null documents produce ZERO chunks (the document is dropped) —
    * the same semantics as generating start positions with
    * `range(1, len+1, stride)`: an empty text has no valid start position.
    */
  def chunks(df: DataFrame, idCol: String, textCol: String,
      size: Int = 200, stride: Int = 150): DataFrame = {
    require(size >= stride && stride > 0, "need size >= stride > 0")
    df.where(length(col(textCol)) >= 1)
      .select(col(idCol), col(textCol),
        explode(sequence(lit(1), length(col(textCol)), lit(stride))).as("__p"))
      .select(col(idCol),
        ((col("__p") - 1) / stride).cast("long").as("chunk_idx"),
        col(textCol).substr(col("__p"), lit(size)).as("chunk"))
  }

  /** Most distinctive term per document — TF-IDF with a RATIONAL idf:
    * score = tf · N / df instead of tf · log(N/df). The log variant is the
    * textbook weighting, but `ln` is not guaranteed bit-identical across
    * engines' libm, while integer multiply + one double division is — so
    * this ranking hash-matches the DuckDB oracle at full precision. (The
    * rational idf weights rarity more aggressively than log-idf; for the
    * "most distinctive term" argmax both favor rare terms, and this one is
    * exactly reproducible.)
    *
    * Shape at 100 TB: explode → (doc, term) aggregation with map-side
    * partials; doc-frequency is a second vocabulary-sized aggregation; the
    * corpus-size literal joins as a broadcast 1-row frame (no driver
    * action); the final top-1 is a per-doc window. Document bodies never
    * shuffle — (doc_id, term) pairs do.
    */
  def topTfIdfTerm(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val terms = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val tf = terms.groupBy(idCol, "term").agg(count(lit(1)).as("__tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("__df"))
    val n = df.agg(count(lit(1)).as("__n"))
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(n))
      .select(col(idCol), col("term"),
        ((col("__tf") * col("__n")).cast("double") / col("__df")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("score").desc, col("term"))
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(idCol, "term", "score")
  }

  /** Letter-frequency Gini impurity, 1 − Σ (cₗ/n)² over a-z — a character-
    * diversity quality signal (near 0 = one repeated letter, ~0.96 = all 26
    * uniform). Deliberately Gini rather than Shannon entropy: `ln` is not
    * guaranteed bit-identical between the JVM and other engines' libm, while
    * +,×,÷ are IEEE-exact, so this metric hash-matches the oracle at full
    * precision.
    *
    * Production path: the single-pass codegen'd
    * [[graft.functions.LetterGini]] kernel (one byte loop per row);
    * [[charDiversitySpec]] is the 26-`translate`-scan Column formulation it
    * is property-checked against (measured ~2.5× on dq53).
    */
  def charDiversity(text: Column): (Column, Column) = {
    val lg = graft.functions.LetterGini(text)
    (lg.getField("n_letters"), lg.getField("gini"))
  }

  /** Executable SPEC of [[charDiversity]]: per-letter counts via `translate`
    * deletion, summed in fixed a→z order — 26 string scans per row, so the
    * kernel is the hot-path form. Non-ASCII strips BEFORE case-folding
    * (`[^a-zA-Z]` on the raw text), so the metric counts exactly the ASCII
    * letters on every engine — a Unicode-aware `lower()` can otherwise fold
    * exotic characters (Kelvin sign, dotted İ) INTO a–z and diverge from
    * both the kernel and any byte-oriented reimplementation.
    */
  def charDiversitySpec(text: Column): (Column, Column) = {
    val s = lower(regexp_replace(text, "[^a-zA-Z]", ""))
    val n = length(s).cast("double")
    val terms = ('a' to 'z').map { ch =>
      val c = (length(s) - length(translate(s, ch.toString, ""))).cast("double")
      (c / n) * (c / n)
    }
    val gini = when(n > 0, lit(1.0) - terms.reduce(_ + _)).otherwise(lit(0.0))
    (n, gini)
  }
}
