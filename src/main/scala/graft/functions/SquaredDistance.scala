package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native codegen'd squared euclidean distance over two
  * `array<float|double>` columns: Σ (aᵢ−bᵢ)², accumulated in double, left to
  * right — the fold order the DuckDB oracle reproduces with
  * `list_sum(list_transform(range(1,n+1), i -> (a[i]-b[i])*(a[i]-b[i])))`.
  *
  * Deliberately NOT the ‖a‖²+‖b‖²−2a·b expansion
  * ([[VectorFunctions.l2DistanceSq]]): that form reassociates the arithmetic
  * and the last float bits diverge cross-engine, which matters because
  * [[graft.ext.IvfIndex]]'s cell assignment compares these distances for
  * argmin and must tie-break identically in Spark and the oracle.
  * Null elements contribute 0 (same as [[DotProduct]]).
  */
case class SquaredDistance(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"squared_distance expects array<float|double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    val (lt, rt) = (elemType(left), elemType(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xv = lt match {
          case FloatType => x.getFloat(i).toDouble
          case _         => x.getDouble(i)
        }
        val yv = rt match {
          case FloatType => y.getFloat(i).toDouble
          case _         => y.getDouble(i)
        }
        val d = xv - yv
        acc += d * d
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(v: String, dt: DataType, i: String): String = dt match {
      case FloatType => s"(double) $v.getFloat($i)"
      case _         => s"$v.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    double $d = ${getter(a, elemType(left), i)} - ${getter(b, elemType(right), i)};
         |    $acc += $d * $d;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredDistance =
    copy(left = newLeft, right = newRight)
}

object SquaredDistance {
  /** Column API: codegen'd Σ (aᵢ−bᵢ)². */
  def apply(a: Column, b: Column): Column =
    Bridge.column(SquaredDistance(Bridge.expression(a), Bridge.expression(b)))
}
