package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass ASCII letter-frequency Gini kernel:
  * `struct(n_letters: double, gini: double)` where gini = 1 − Σ (cₗ/n)²
  * over a–z (case-folded), 0.0 for letterless text.
  *
  * Replaces [[graft.ext.TextAnalysis.charDiversitySpec]]'s 26 `translate`
  * scans per row with ONE byte loop inside whole-stage codegen — same
  * values (property-checked on ASCII, where the two are exactly equal:
  * identical counts, identical a→z left-to-right double fold). ASCII
  * letters are single bytes in UTF-8, so the byte loop never miscounts
  * multibyte characters (they simply don't match). Scope: counts ASCII
  * a–z/A–Z only; exotic case-foldings that Java `toLowerCase` maps INTO
  * ascii letters (e.g. İ → i+◌̇) count in the spec formulation but not
  * here — out of scope for a quality signal, documented.
  */
case class LetterGini(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LetterGini.OutType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"letter_gini expects a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val cnt = new Array[Int](26)
    var n = 0
    var i = 0
    val nb = s.numBytes()
    while (i < nb) {
      val ch = s.getByte(i)
      if (ch >= 'a' && ch <= 'z') { cnt(ch - 'a') += 1; n += 1 }
      else if (ch >= 'A' && ch <= 'Z') { cnt(ch - 'A') += 1; n += 1 }
      i += 1
    }
    val nd = n.toDouble
    var acc = 0.0d
    if (n > 0) {
      var l = 0
      while (l < 26) { val r = cnt(l) / nd; acc += r * r; l += 1 }
    }
    new GenericInternalRow(Array[Any](nd, if (n > 0) 1.0d - acc else 0.0d))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cnt = ctx.addMutableState("int[]", "letterCounts",
      v => s"$v = new int[26];")
    nullSafeCodeGen(ctx, ev, in => {
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val ch = ctx.freshName("ch")
      val n = ctx.freshName("n")
      val nd = ctx.freshName("nd")
      val acc = ctx.freshName("acc")
      val r = ctx.freshName("r")
      val l = ctx.freshName("l")
      // doubles are boxed EXPLICITLY below: an Object[] initializer that
      // relies on Janino autoboxing can fail to compile, silently dropping
      // the whole stage to interpreted eval (correct but slow)
      s"""
         |java.util.Arrays.fill($cnt, 0);
         |int $nb = $in.numBytes();
         |int $n = 0;
         |for (int $i = 0; $i < $nb; $i++) {
         |  byte $ch = $in.getByte($i);
         |  if ($ch >= 'a' && $ch <= 'z') { $cnt[$ch - 'a']++; $n++; }
         |  else if ($ch >= 'A' && $ch <= 'Z') { $cnt[$ch - 'A']++; $n++; }
         |}
         |double $nd = (double) $n;
         |double $acc = 0.0d;
         |if ($n > 0) {
         |  for (int $l = 0; $l < 26; $l++) {
         |    double $r = $cnt[$l] / $nd;
         |    $acc += $r * $r;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { java.lang.Double.valueOf($nd),
         |    java.lang.Double.valueOf(($n > 0) ? (1.0d - $acc) : 0.0d) });
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LetterGini =
    copy(child = newChild)

  override def prettyName: String = "letter_gini"
}

object LetterGini {
  val OutType: StructType = StructType(Seq(
    StructField("n_letters", DoubleType, nullable = false),
    StructField("gini", DoubleType, nullable = false)))

  /** Column API: one-pass `struct(n_letters, gini)`. */
  def apply(text: Column): Column =
    Bridge.column(LetterGini(Bridge.expression(text)))
}
