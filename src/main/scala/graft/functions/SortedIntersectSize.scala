package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, TypeUtils}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** |A ∩ B| for two ASC-SORTED distinct-element arrays, as a codegen'd
  * two-pointer merge.
  *
  * Why: `array_intersect` builds a hash set per ROW — on an n-gram-Jaccard
  * verification join that is 600k+ set constructions with per-element
  * allocation, and it dominated the whole benchmark. Sorting each document's
  * shingle set ONCE (`sort_array` on the build side of the join) turns every
  * pair comparison into a linear merge of two pointer walks with zero
  * allocation. Null elements (sorted first by `sort_array`) are skipped.
  *
  * Inputs MUST be sorted ascending; the caller owns that invariant.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  private def elemType: DataType = left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(a, _), ArrayType(b, _))
        if DataType.equalsStructurally(a, b, ignoreNullability = true) &&
          TypeUtils.typeWithProperEquals(a) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_size expects two arrays of the same comparable element type, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  @transient private lazy val ordering = TypeUtils.getInterpretedOrdering(elemType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (n1, n2) = (x.numElements(), y.numElements())
    var i = 0
    var j = 0
    var c = 0
    while (i < n1 && j < n2) {
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val cmp = ordering.compare(x.get(i, elemType), y.get(j, elemType))
        if (cmp < 0) i += 1
        else if (cmp > 0) j += 1
        else { c += 1; i += 1; j += 1 }
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val n1 = ctx.freshName("n1")
      val n2 = ctx.freshName("n2")
      val va = ctx.freshName("va")
      val vb = ctx.freshName("vb")
      val cmp = ctx.freshName("cmp")
      val jt = CodeGenerator.javaType(elemType)
      s"""
         |int $n1 = $a.numElements();
         |int $n2 = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $n1 && $j < $n2) {
         |  if ($a.isNullAt($i)) { $i++; continue; }
         |  if ($b.isNullAt($j)) { $j++; continue; }
         |  $jt $va = ${CodeGenerator.getValue(a, elemType, i)};
         |  $jt $vb = ${CodeGenerator.getValue(b, elemType, j)};
         |  int $cmp = ${ctx.genComp(elemType, va, vb)};
         |  if ($cmp < 0) { $i++; }
         |  else if ($cmp > 0) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  /** Column API; both arrays must be sorted ascending (`sort_array`). */
  def apply(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectSize(Bridge.expression(a), Bridge.expression(b)))
}
