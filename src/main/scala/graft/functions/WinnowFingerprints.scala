package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass winnowing kernel: `array<long>` of distinct window-min
  * k-gram rolling hashes (first-occurrence order), Schleimer et al.'s
  * fingerprint selection.
  *
  * Replaces the Column formulation (per-position `transform` lambdas
  * re-hashing k characters interpreted, then per-window `slice` copies) —
  * that shape measured 84s for dq72 at sf0.1; this kernel is a true
  * Rabin–Karp O(1) rolling update plus a monotonic-deque sliding minimum,
  * O(n) per document, and produces the BIT-IDENTICAL value sequence
  * (rolling update mod M ≡ per-position sum mod M; first-occurrence
  * dedup order matches `array_distinct`; property-checked against the
  * Column spec). One interpreted call per ROW (CodegenFallback), with all
  * the work inside plain JVM loops — the per-element interpretation the
  * HOF path paid is gone.
  *
  * Hashes are over Unicode CODE POINTS (what `substr`+`ascii` index in
  * both Spark and DuckDB), mod 2³¹−1, base 257.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 2 && w >= 1, "need k >= 2, w >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects a string input, got ${other.simpleString}")
  }

  import WinnowFingerprints.{B, M}
  private val powK1 = WinnowFingerprints.powers(k)(k - 1) // B^(k-1) mod M

  override def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cps.length - k + 1
    if (n < 1) return new GenericArrayData(Array.empty[Long])
    // rolling k-gram hashes
    val hs = new Array[Long](n)
    var h = 0L
    var j = 0
    while (j < k) { h = (h * B + cps(j)) % M; j += 1 }
    hs(0) = h
    var i = 1
    while (i < n) {
      h = ((h - cps(i - 1) * powK1) % M + M) % M
      h = (h * B + cps(i + k - 1)) % M
      hs(i) = h
      i += 1
    }
    if (n < w) return new GenericArrayData(Array.empty[Long])
    // sliding-window minimum via monotonic deque; first-occurrence dedup
    val out = new java.util.LinkedHashSet[Long]()
    val dq = new java.util.ArrayDeque[Int]()
    i = 0
    while (i < n) {
      while (!dq.isEmpty && hs(dq.peekLast()) >= hs(i)) dq.pollLast()
      dq.addLast(i)
      if (dq.peekFirst() <= i - w) dq.pollFirst()
      if (i >= w - 1) out.add(hs(dq.peekFirst()))
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)

  override def prettyName: String = "winnow_fingerprints"
}

object WinnowFingerprints {
  /** THE rolling-hash constants — the kernel, the Column spec
    * (`ext.Winnow.fingerprintsSpec`), and the dq72 DuckDB oracle must all
    * derive from these or the bit-identity contract silently breaks.
    */
  val M = 2147483647L // 2^31 - 1, multiplication-safe in a long
  val B = 257L

  /** B^0..B^(k-1) mod M. */
  def powers(k: Int): Array[Long] = Array.iterate(1L, k)(p => p * B % M)

  def apply(text: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(text), k, w))
}
