package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass content-defined-chunking kernel: `array<string>` of md5
  * chunk hashes under the [[graft.ext.MediaDedup.cdcChunkRows]] boundary
  * rule — a cut after byte `p+window−1` wherever the md5 of the
  * UPPERCASE-HEX rendering of the `window`-byte slice at `p` opens with
  * `zeros` hex '0's; chunks are md5s of the hex slices between cuts
  * (`0 ∪ interior cuts` → `interior cuts ∪ nb`).
  *
  * Replaces the Column formulation (`transform(sequence(0, nb−w), p =>
  * md5(substr(hex, …)))`): higher-order functions evaluate their lambda
  * INTERPRETED — per byte position that shape paid an interpreted
  * `Md5.eval` (a fresh `MessageDigest` per call inside commons-codec), a
  * `UTF8String` substring allocation, a full 32-char hex render of the
  * digest just to compare its first `zeros` chars, and an Integer boxing
  * for the position array. This kernel is one interpreted call per ROW
  * (CodegenFallback, the [[WinnowFingerprints]] precedent): the hex
  * rendering happens once into a byte array, ONE thread-local
  * `MessageDigest` is reset per window, and the boundary test reads the
  * digest's leading NIBBLES directly. Bit-identical output by
  * construction — md5 over the identical ASCII bytes — and
  * property-pinned against the Column spec (`MediaCdcKernelSpec`); the
  * dq187–dq190 DuckDB oracles replay the same derivation independently.
  */
case class CdcChunks(child: Expression, window: Int, zeros: Int)
    extends UnaryExpression with CodegenFallback {

  require(window >= 1 && window <= 64, s"window in [1, 64], got $window")
  require(zeros >= 1 && zeros <= 8, s"zeros in [1, 8], got $zeros")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks expects a binary input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    CdcChunks.chunkHashes(input.asInstanceOf[Array[Byte]], window, zeros)

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)

  override def prettyName: String = "cdc_chunks"
}

object CdcChunks {

  private val HexUpper = "0123456789ABCDEF".getBytes("US-ASCII")
  private val HexLower = "0123456789abcdef".getBytes("US-ASCII")

  private val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** The kernel body, also the unit under the kernel-vs-Column parity
    * property. Always emits ≥ 1 chunk (an empty payload is one md5("")
    * chunk — the zip_with shape's behavior, preserved). */
  private[graft] def chunkHashes(payload: Array[Byte], window: Int,
      zeros: Int): GenericArrayData = {
    val nb = payload.length
    // hex(payload) — uppercase, the Spark builtin's rendering
    val hex = new Array[Byte](2 * nb)
    var i = 0
    while (i < nb) {
      val b = payload(i) & 0xff
      hex(2 * i) = HexUpper(b >>> 4)
      hex(2 * i + 1) = HexUpper(b & 0xf)
      i += 1
    }
    val md = digests.get()
    // interior cuts (cut = p + window, kept only when < nb; a cut at
    // exactly nb is dropped from the interior list and nb closes the
    // last chunk anyway — identical to the filter(__cuts < nb) shape)
    val cuts = new java.util.ArrayList[Integer]()
    if (nb >= window) {
      var p = 0
      val wb = 2 * window
      while (p <= nb - window) {
        md.reset()
        md.update(hex, 2 * p, wb)
        if (leadingHexZeros(md.digest(), zeros)) {
          val cut = p + window
          if (cut < nb) cuts.add(cut)
        }
        p += 1
      }
    }
    val n = cuts.size() + 1
    val out = new Array[AnyRef](n)
    var s = 0
    var j = 0
    while (j < n) {
      val e = if (j < cuts.size()) cuts.get(j).intValue() else nb
      md.reset()
      md.update(hex, 2 * s, 2 * (e - s))
      out(j) = md5HexUtf8(md.digest())
      s = e
      j += 1
    }
    new GenericArrayData(out)
  }

  /** First `zeros` hex digits of the digest all '0' — read as nibbles,
    * no hex render. */
  private def leadingHexZeros(digest: Array[Byte], zeros: Int): Boolean = {
    var k = 0
    while (k < zeros) {
      val b = digest(k >> 1) & 0xff
      val nibble = if ((k & 1) == 0) b >>> 4 else b & 0xf
      if (nibble != 0) return false
      k += 1
    }
    true
  }

  /** Lowercase-hex UTF8String of a 16-byte digest — `md5()`'s rendering. */
  private def md5HexUtf8(digest: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      val b = digest(i) & 0xff
      out(2 * i) = HexLower(b >>> 4)
      out(2 * i + 1) = HexLower(b & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def apply(payload: Column, window: Int, zeros: Int): Column =
    Bridge.column(CdcChunks(Bridge.expression(payload), window, zeros))
}
