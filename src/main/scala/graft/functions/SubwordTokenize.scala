package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword tokenizer over a fixed vocabulary — the
  * WordPiece/BPE-inference algorithm (Wu et al. 2016 §4.1; the
  * tokenizers-library "WordPiece" model at inference time): at each
  * position take the LONGEST vocabulary entry matching at that position;
  * if none matches, emit the single-char unknown token `"?"` and advance
  * one char. Token counting with a REAL subword vocabulary is the training
  * budget arithmetic of an LLM data pipeline ("how many tokens is this
  * corpus?"), which whitespace counting (dq15) only approximates.
  *
  * Input is a canonical token stream — words joined by single spaces (the
  * [[graft.ext.TextAnalysis.tokens]] normal form) — and the output is the
  * concatenated subword sequence across all words, in order:
  * `string → array<string>`. Words never merge across the space boundary.
  *
  * Determinism: at most one vocabulary entry of a given length can match
  * at a position (string equality), so longest-first needs no tie-break —
  * the tokenization is a pure function of (vocab, input), re-derived
  * bit-for-bit by the dq89 DuckDB recursive-CTE oracle replaying the same
  * recurrence.
  *
  * Shape at 100 TB: the vocabulary rides the expression tree once per
  * TASK (a reference object in the codegen'd stage — the closure-serialized
  * analogue of a broadcast; real vocabs are ~30k entries ≈ hundreds of KB,
  * a non-issue), per-position lookup is a hash probe per candidate length
  * (bounded by the vocab's max entry length), and the whole operator is
  * map-only inside WholeStageCodegen — no shuffle anywhere, so it scales
  * with scan bandwidth like dq53's `LetterGini`.
  */
case class SubwordTokenize(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  require(vocab.nonEmpty && vocab.forall(v => v.nonEmpty && !v.contains(' ')),
    "vocab entries must be non-empty and space-free")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"subword_tokenize expects a string input, got ${other.simpleString}")
  }

  @transient private lazy val compiled = new SubwordVocab(vocab.toArray)

  override def nullSafeEval(input: Any): Any =
    SubwordTokenize.tokenize(input.asInstanceOf[UTF8String], compiled)

  /** Codegen = one static call into the same tokenizer the interpreted
    * path runs (the media-kernel pattern — [[ImageMeta.doGenCode]]): the
    * stage stays in WholeStageCodegen, and the vocab travels as a codegen
    * reference object, built once per task.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("subwordVocab", compiled,
      classOf[SubwordVocab].getName)
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.SubwordTokenize.tokenize($in, $vocabRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): SubwordTokenize =
    copy(child = newChild)

  override def prettyName: String = "subword_tokenize"
}

/** Length-indexed hash lookup for greedy longest-match; serializable so the
  * codegen reference object survives the task closure, lookup structures
  * rebuilt lazily after deserialization.
  */
final class SubwordVocab(val entries: Array[String]) extends Serializable {
  // single volatile holder: tasks normally deserialize their own copy, but
  // if an instance IS ever shared across local-mode threads, publishing
  // byLen and max separately could expose max=0 to a reader that already
  // sees byLen — silently tokenizing everything to '?'. One volatile
  // reference to an immutable pair cannot be seen half-built; a redundant
  // concurrent build is idempotent.
  @transient @volatile
  private var lookup: (Array[java.util.HashSet[String]], Int) = _

  private def ensure(): (Array[java.util.HashSet[String]], Int) = {
    var l = lookup
    if (l == null) {
      val m = entries.iterator.map(_.length).max
      val b = new Array[java.util.HashSet[String]](m + 1)
      entries.foreach { e =>
        if (b(e.length) == null) b(e.length) = new java.util.HashSet[String]()
        b(e.length).add(e)
      }
      l = (b, m)
      lookup = l
    }
    l
  }

  /** Length of the longest vocab entry matching `word` at `pos`, or -1. */
  def longestMatch(word: String, pos: Int): Int = {
    val (byLen, max) = ensure()
    var l = math.min(max, word.length - pos)
    while (l >= 1) {
      val s = byLen(l)
      if (s != null && s.contains(word.substring(pos, pos + l))) return l
      l -= 1
    }
    -1
  }
}

object SubwordTokenize {

  private val Unk = UTF8String.fromString("?")

  /** Greedy longest-match over the space-joined word stream. Called from
    * both the interpreted eval and the generated code.
    */
  def tokenize(in: UTF8String, vocab: SubwordVocab): ArrayData = {
    val out = new java.util.ArrayList[AnyRef]()
    val s = in.toString
    var w0 = 0
    val n = s.length
    while (w0 < n) {
      var w1 = s.indexOf(' ', w0)
      if (w1 < 0) w1 = n
      var pos = w0
      while (pos < w1) {
        val m = vocab.longestMatch(s, pos) match {
          // never match past the word boundary: entries are space-free so a
          // match cannot CONTAIN the space, but it could start before w1 and
          // extend beyond only if s had no space — bound explicitly anyway
          case l if l > 0 && pos + l <= w1 => l
          case _ => -1
        }
        if (m > 0) {
          out.add(UTF8String.fromString(s.substring(pos, pos + m)))
          pos += m
        } else {
          out.add(Unk)
          pos += 1
        }
      }
      w0 = w1 + 1
    }
    new GenericArrayData(out.toArray)
  }

  /** The dq89 demo vocabulary: full words, multi-piece splits, and
    * longest-match distractor prefixes over the testdata corpus's word
    * inventory; `y` is deliberately uncovered so `key → [ke, ?]` exercises
    * the unknown fallback end-to-end.
    */
  val DemoVocab: Seq[String] = Seq(
    // full words
    "table", "scan", "data", "join", "hash", "sort", "line", "part",
    "fast", "the", "agg", "big", "dup", "row",
    // multi-piece splits
    "sp", "ark", "wind", "ow", "mer", "ge", "col", "umn", "vec", "tor",
    "str", "eam", "val", "ue", "sm", "all", "fil", "ter", "gro", "up",
    "cust", "omer", "ord", "er", "slo", "qu", "ery", "bat", "ch", "ke",
    // longest-match distractors and single-char fallbacks
    "ta", "tab", "ble", "sc", "a", "w", "e", "s", "t", "o", "r")

  def apply(stream: Column, vocab: Seq[String]): Column =
    Bridge.column(SubwordTokenize(Bridge.expression(stream), vocab))
}
