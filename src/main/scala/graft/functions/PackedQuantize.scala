package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Int8 quantization PACKED to a `binary` column: one signed byte per
  * element — q(x) = clamp(⌊x·s + 0.5⌋, −s, s), s ≤ 127.
  *
  * This is where the quantization scale story becomes real: `array<long>`
  * costs 8 B/element at rest and on the wire, MORE than the float32 it
  * replaced; a packed binary is 1 B/element — 4× less scan/shuffle volume
  * than float32 on 64-dim embeddings (measured in ScaleProbe SCALE_SQ8).
  * Values are bit-identical to `QuantizedAnn.quantize` (same floor/clamp),
  * property-checked in `QuantizedAnnSpec`. Null elements become 0.
  */
case class QuantizeToBytes(child: Expression, scale: Int) extends UnaryExpression {

  require(scale >= 1 && scale <= 127, s"scale must fit a signed byte, got $scale")

  override def dataType: DataType = BinaryType

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantize_bytes expects array<float|double>, got ${other.simpleString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Byte](n)
    val ft = elemType == FloatType
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) {
        val v = if (ft) x.getFloat(i).toDouble else x.getDouble(i)
        val r = math.floor(v * scale + 0.5).toLong
        out(i) = math.max(-scale.toLong, math.min(scale.toLong, r)).toByte
      }
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (elemType == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val r = ctx.freshName("r")
      val s = scale.toString
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    long $r = (long) java.lang.Math.floor((double) $a.$getter($i) * $s + 0.5);
         |    $out[$i] = (byte) java.lang.Math.max(-${s}L, java.lang.Math.min(${s}L, $r));
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeToBytes =
    copy(child = newChild)
}

object QuantizeToBytes {
  /** Column API: int8-quantize an embedding into a packed binary. */
  def apply(a: Column, scale: Int): Column =
    Bridge.column(QuantizeToBytes(Bridge.expression(a), scale))
}

/** Codegen'd dot product over two packed-int8 `binary` columns: Σ aᵢ·bᵢ in
  * long — the scoring kernel for [[QuantizeToBytes]] vectors. Per pair this
  * is a tight byte-array loop (no ArrayData indirection at all), and the
  * inputs are 4× smaller than float32 at rest, on the wire, and in the
  * broadcast.
  */
case class ByteDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"byte_dot expects binary inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    val n = math.min(x.length, y.length)
    var acc = 0L
    var i = 0
    while (i < n) { acc += x(i) * y(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length);
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a[$i] * $b[$i];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ByteDot =
    copy(left = newLeft, right = newRight)
}

object ByteDot {
  /** Column API: codegen'd Σ aᵢ·bᵢ over packed-int8 binaries. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(ByteDot(Bridge.expression(a), Bridge.expression(b)))
}
