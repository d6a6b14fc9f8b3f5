package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** DISTRIBUTED ADC score — `(query array<float|double>, codes array<int>)
  * → double`: Σⱼ dot(q_sub_j, book_j[code_j]), the PQ inner-product
  * estimate of [[graft.ext.PqAnn]]'s literal score tables computed
  * row-side against a BROADCAST codebook.
  *
  * The literal-table dispatch ([[graft.ext.PqAnn.adcTopKProbed]]) needs
  * every query on the driver — right for stored-search (a handful of
  * driver queries, tables of Q·k doubles), impossible for a GATE whose
  * "queries" are an arbitrary-size incoming batch. Here the batch rows
  * keep their embeddings and the codebook travels once per executor as
  * a dense `double[m][maxCellId+1][subDim]` (dead Lloyd's cells are null
  * slots — a code can never reference one, it was never emitted).
  *
  * Bit-parity contract (spec-gated): per subspace the term is the SAME
  * left-to-right double fold over subDim elements the literal tables
  * tabulate, and the m terms accumulate in subspace order —
  * `((t0 + t1) + t2) + …`, reduceLeft's association — so a row scored
  * here equals the literal-table lookup bit for bit.
  */
case class PqAdcDot(
    left: Expression,
    right: Expression,
    books: Broadcast[Array[Array[Array[Double]]]],
    subDim: Int) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_dot expects (array<float|double>, array<int>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  private def qIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(q: Any, c: Any): Any = {
    val qa = q.asInstanceOf[ArrayData]
    val ca = c.asInstanceOf[ArrayData]
    val bs = books.value
    val isFloat = qIsFloat
    var acc = 0.0
    var j = 0
    val m = math.min(bs.length, ca.numElements())
    while (j < m) {
      val code = ca.getInt(j)
      if (code < 0 || code >= bs(j).length || bs(j)(code) == null)
        throw new IllegalArgumentException(PqAdcDot.badCode(code, j,
          bs(j).length))
      val cent = bs(j)(code)
      var t = 0.0
      var i = 0
      while (i < subDim) {
        val p = j * subDim + i
        if (p < qa.numElements() && !qa.isNullAt(p)) {
          val qv = if (isFloat) qa.getFloat(p).toDouble else qa.getDouble(p)
          t += qv * cent(i)
        }
        i += 1
      }
      if (j == 0) acc = t else acc += t
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("pqAdcBooksBc", books,
      "org.apache.spark.broadcast.Broadcast")
    // ONLY single-dimension array types appear in the generated code:
    // Janino refuses multi-dimensional array declarations ("')'
    // expected" at the declaration) whether as a mutable state OR a
    // local — every plan carrying this expression silently fell back
    // to interpreted projection until round 17's cold-cache probe made
    // the slowdown visible (and the spec now pins CODEGEN_ONLY). The
    // codebook rides as Object and is unwrapped one dimension at a
    // time: Object -> Object[] (subspaces) -> Object[] (centroids) ->
    // double[].
    val bsObj = ctx.addMutableState("java.lang.Object", "pqAdcBooks")
    val getter =
      if (qIsFloat) (v: String, i: String) => s"(double) $v.getFloat($i)"
      else (v: String, i: String) => s"$v.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (q, c) => {
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val cent = ctx.freshName("cent")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val code = ctx.freshName("code")
      val bs = ctx.freshName("books")
      val sub = ctx.freshName("sub")
      s"""
         |if ($bsObj == null) { $bsObj = $bcRef.value(); }
         |java.lang.Object[] $bs = (java.lang.Object[]) $bsObj;
         |double $acc = 0.0;
         |int $m = java.lang.Math.min($bs.length, $c.numElements());
         |for (int $j = 0; $j < $m; $j++) {
         |  int $code = $c.getInt($j);
         |  java.lang.Object[] $sub = (java.lang.Object[]) $bs[$j];
         |  if ($code < 0 || $code >= $sub.length || $sub[$code] == null) {
         |    throw new IllegalArgumentException(
         |      graft.functions.PqAdcDot.badCode($code, $j, $sub.length));
         |  }
         |  double[] $cent = (double[]) $sub[$code];
         |  double $t = 0.0;
         |  for (int $i = 0; $i < $subDim; $i++) {
         |    int $p = $j * $subDim + $i;
         |    if ($p < $q.numElements() && !$q.isNullAt($p)) {
         |      $t += ${getter(q, p)} * $cent[$i];
         |    }
         |  }
         |  if ($j == 0) { $acc = $t; } else { $acc += $t; }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdcDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_adc_dot"

  // keep plan strings readable: the default case-class rendering would
  // dump the broadcast handle
  override def toString: String =
    s"pq_adc_dot($left, $right, subDim=$subDim)"
}

object PqAdcDot {
  /** The named error for a code naming no live centroid — a FOREIGN or
    * corrupted code relation (a dead Lloyd's cell is a null slot that
    * no emitted code references; an out-of-range code was never
    * emitted at all). Without the guard this surfaced as a bare
    * executor NPE/ArrayIndexOutOfBounds deep inside codegen. */
  def badCode(code: Int, subspace: Int, size: Int): String =
    s"pq_adc_dot: code $code in subspace $subspace names no live " +
      s"codebook centroid (codebook size $size) — the code relation " +
      "does not belong to this store's codebooks"

  /** Column API: the ADC inner-product estimate of `codes` for `qemb`. */
  def apply(qemb: org.apache.spark.sql.Column,
      codes: org.apache.spark.sql.Column,
      books: Broadcast[Array[Array[Array[Double]]]],
      subDim: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.Bridge.column(PqAdcDot(
      org.apache.spark.sql.graft.Bridge.expression(qemb),
      org.apache.spark.sql.graft.Bridge.expression(codes), books, subDim))
}
