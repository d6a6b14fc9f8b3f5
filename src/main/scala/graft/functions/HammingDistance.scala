package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Codegen'd Hamming distance over two `array<int>` columns: the number of
  * positions (up to the shorter length) whose elements differ. Null
  * elements compare as differing unless both are null.
  *
  * Replaces the `aggregate(zip_with(...))` higher-order formulation on the
  * SimHash verification path — same value, but a primitive loop inside
  * whole-stage codegen instead of per-element interpreted lambdas
  * (the same motivation as [[DotProduct]]).
  */
case class HammingDistance(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"hamming_distance expects array<int> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0
    var i = 0
    while (i < n) {
      val xn = x.isNullAt(i)
      val yn = y.isNullAt(i)
      if (xn != yn) acc += 1
      else if (!xn && x.getInt(i) != y.getInt(i)) acc += 1
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val xn = ctx.freshName("xn")
      val yn = ctx.freshName("yn")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $acc = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  boolean $xn = $a.isNullAt($i);
         |  boolean $yn = $b.isNullAt($i);
         |  if ($xn != $yn) { $acc++; }
         |  else if (!$xn && $a.getInt($i) != $b.getInt($i)) { $acc++; }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hamming_distance"
}

object HammingDistance {
  /** Column API: codegen'd count of differing positions. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(HammingDistance(Bridge.expression(a), Bridge.expression(b)))
}
