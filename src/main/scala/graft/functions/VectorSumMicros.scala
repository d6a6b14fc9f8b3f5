package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Elementwise vector-sum aggregate over an `array<float|double>` column,
  * accumulating in scaled-integer micro-units: element i contributes
  * `floor(xᵢ · 10⁶)` to slot i of a long buffer.
  *
  * Why a custom `TypedImperativeAggregate` (§2.10 U1 ladder, aggregate rung):
  * the built-in route — `posexplode` + groupBy(key, pos) + sum — multiplies
  * the row count by the dimension (64× for these embeddings) before partial
  * aggregation ever sees it. This aggregate keeps one long[dim] buffer per
  * group per partition: the map side folds every vector in place and only
  * the per-group buffers shuffle, dimension-independent of row count.
  *
  * Why integer micro-units: long addition is associative, so the result is
  * IDENTICAL under any partial-aggregation tree — and reproducible by any
  * engine (the DuckDB oracle sums the same `floor(x·10⁶)` longs) — where a
  * double accumulator would drift with partition boundaries. Floor (not
  * round) because round-half ties break differently across engines.
  *
  * Vectors of differing lengths grow the buffer to the longest seen; null
  * elements and null vectors contribute nothing.
  */
case class VectorSumMicros(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"vector_sum_micros expects array<float|double>, got ${dt.simpleString}")
  }

  private lazy val elemIsFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val b = if (buffer.length >= n) buffer
      else java.util.Arrays.copyOf(buffer, n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        b(i) += math.floor(x * 1e6).toLong
      }
      i += 1
    }
    b
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    // only b1 (the mutable buffer) may be mutated; b2 is input-side
    val out = if (b1.length >= b2.length) b1
      else java.util.Arrays.copyOf(b1, b2.length)
    var i = 0
    while (i < b2.length) { out(i) += b2(i); i += 1 }
    out
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumMicros =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumMicros =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorSumMicros =
    copy(child = newChildren.head)

  override def prettyName: String = "vector_sum_micros"
}

object VectorSumMicros {
  /** Column form: `groupBy(...).agg(VectorSumMicros.of(col("embedding")))`. */
  def of(c: Column): Column =
    Bridge.column(VectorSumMicros(Bridge.expression(c)).toAggregateExpression())
}
