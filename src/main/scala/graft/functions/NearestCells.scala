package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** The `nprobe` nearest centroids of an embedding, by squared euclidean
  * distance — `array<float|double> → array<int>` of cell ids ordered by
  * (distance asc, cell asc) — [[graft.ext.IvfIndex]]'s LARGE-k assignment /
  * probe-selection kernel.
  *
  * The small-k path folds the centroids into the plan as a k×dim literal
  * expression tree ([[graft.ext.IvfIndex.cellDistances]]) — free to
  * broadcast, visible to the oracle, but at k in the thousands it hits
  * Janino constant-pool/method-size limits and rides along in EVERY
  * serialized task. Here the matrix instead lives in a Spark BROADCAST
  * (fetched once per executor, a few bytes of handle per task), the cell
  * ids travel as a plain int array (4 bytes × k), and the per-row work is
  * one fused JVM loop: distance fold + bounded insertion, no k-wide
  * intermediate array, no sort. Assignment stays MAP-ONLY at any k — no
  * shuffle enters the plan (contrast the broadcast-join + top-k-per-key
  * formulation, which re-exchanges every row by id;
  * [[graft.ext.IvfIndex.assignViaJoin]] keeps that shape for comparison).
  *
  * Bit-parity contract (spec-gated): the distance is accumulated exactly
  * like [[SquaredDistance]] — double acc, left-to-right over
  * min(|emb|, dim) elements, null elements contributing 0 — and the
  * bounded insertion breaks distance ties toward the LOWER cell id (cells
  * are scanned in ascending id order with a strict-< insertion test), so
  * element 1 equals the literal path's argmin and the full array equals
  * its `slice(array_sort(...), 1, nprobe)` probe selection.
  */
case class NearestCells(
    child: Expression,
    matrix: Broadcast[Array[Array[Double]]],
    cellIds: Array[Int],
    nprobe: Int) extends UnaryExpression {

  require(nprobe >= 1, "need nprobe >= 1")

  private def np: Int = math.min(nprobe, cellIds.length)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells expects an array<float|double> input, got ${other.simpleString}")
  }

  private def childIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val cents = matrix.value
    val isFloat = childIsFloat
    val bd = new Array[Double](np)
    val bi = new Array[Int](np)
    var m = 0
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      val n = math.min(x.numElements(), cv.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (!x.isNullAt(i)) {
          val xv = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
          val d = xv - cv(i)
          acc += d * d
        }
        i += 1
      }
      // bounded insertion, ascending (dist, cell): strict < keeps the
      // earlier (lower) cell id on ties because cells scan in id order
      if (m < np || acc < bd(m - 1)) {
        var pos = if (m < np) m else np - 1
        while (pos > 0 && acc < bd(pos - 1)) { bd(pos) = bd(pos - 1); bi(pos) = bi(pos - 1); pos -= 1 }
        bd(pos) = acc
        bi(pos) = cellIds(c)
        if (m < np) m += 1
      }
      c += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(bi, m))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("nearestCellsBc", matrix,
      "org.apache.spark.broadcast.Broadcast")
    val idsRef = ctx.addReferenceObj("nearestCellIds", cellIds, "int[]")
    val cents = ctx.addMutableState("double[][]", "ivfCents")
    val bd = ctx.addMutableState("double[]", "ivfBestD", v => s"$v = new double[$np];")
    val bi = ctx.addMutableState("int[]", "ivfBestC", v => s"$v = new int[$np];")
    val getter =
      if (childIsFloat) (v: String, i: String) => s"(double) $v.getFloat($i)"
      else (v: String, i: String) => s"$v.getDouble($i)"
    nullSafeCodeGen(ctx, ev, in => {
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val cv = ctx.freshName("cv")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val pos = ctx.freshName("pos")
      s"""
         |if ($cents == null) { $cents = (double[][]) $bcRef.value(); }
         |int $m = 0;
         |for (int $c = 0; $c < $cents.length; $c++) {
         |  double[] $cv = $cents[$c];
         |  int $n = java.lang.Math.min($in.numElements(), $cv.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$in.isNullAt($i)) {
         |      double $d = ${getter(in, i)} - $cv[$i];
         |      $acc += $d * $d;
         |    }
         |  }
         |  if ($m < $np || $acc < $bd[$m - 1]) {
         |    int $pos = ($m < $np) ? $m : ($np - 1);
         |    while ($pos > 0 && $acc < $bd[$pos - 1]) {
         |      $bd[$pos] = $bd[$pos - 1]; $bi[$pos] = $bi[$pos - 1]; $pos--;
         |    }
         |    $bd[$pos] = $acc;
         |    $bi[$pos] = $idsRef[$c];
         |    if ($m < $np) $m++;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($bi, $m));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)

  override def prettyName: String = "nearest_cells"

  // keep plan strings readable: the default case-class rendering would dump
  // the broadcast handle and the id array
  override def toString: String =
    s"nearest_cells($child, k=${cellIds.length}, nprobe=$nprobe)"
}

object NearestCells {
  /** Column API: `array<int>` of the `nprobe` nearest cell ids. */
  def apply(emb: Column, matrix: Broadcast[Array[Array[Double]]],
      cellIds: Array[Int], nprobe: Int): Column =
    Bridge.column(NearestCells(Bridge.expression(emb), matrix, cellIds, nprobe))
}
