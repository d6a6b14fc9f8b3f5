package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Audio header metadata from raw payload bytes — the audio counterpart of
  * [[ImageMeta]] (same "no codec, pure byte arithmetic" contract): WAV/RIFF
  * (the interchange format both public corpora and capture pipelines land
  * raw audio in) parsed from the chunk table alone.
  *
  * `binary → struct<channels: int, sample_rate: int, bits: int,
  * n_samples: long>`, null when the payload is not a parseable PCM WAV —
  * the ingest gate + duration accounting ("keep clips between 1 and 30
  * seconds at ≥ 16 kHz" = `n_samples / sample_rate` bounds) without
  * decoding a single sample.
  *
  * Layout (RIFF/WAVE, public spec): 'RIFF' + u32le size + 'WAVE', then a
  * CHUNK WALK — (4-byte id, u32le size, payload, odd sizes padded to even)
  * — until both the 'fmt ' chunk (channels/rate/bits at fixed offsets
  * INSIDE it, all little-endian, PCM format tag required) and the 'data'
  * chunk (n_samples = size / block_align) are seen. Optional chunks (LIST,
  * fact, ...) sit between them at writer discretion, so the walk is
  * load-bearing — there is no fixed-offset shortcut. Everything is
  * little-endian where [[ImageMeta]]'s formats are big-endian; the DuckDB
  * oracle re-derives both (dq79 reverses hex byte pairs).
  *
  * Per-payload cost is the chunk TABLE, never the sample data — the 'data'
  * chunk body is skipped by its size field.
  */
case class AudioMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"audio_meta expects a binary input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    AudioMeta.parse(input.asInstanceOf[Array[Byte]])

  /** Codegen = one static call into the same parser the interpreted path
    * runs (the chunk walk is row-local imperative work — duplicating it as
    * generated Java buys nothing), which keeps the enclosing stage inside
    * WholeStageCodegen: no `CodegenFallback` boxing, no per-row
    * `Expression.eval` dispatch, a media-gate filter stays fused with its
    * scan. Bit-identity of the two paths is free — they ARE the same code.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |${ev.value} = graft.functions.AudioMeta.parse($in);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): AudioMeta =
    copy(child = newChild)

  override def prettyName: String = "audio_meta"
}

object AudioMeta {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    i + 3 < b.length && b(i) == t(0).toByte && b(i + 1) == t(1).toByte &&
      b(i + 2) == t(2).toByte && b(i + 3) == t(3).toByte

  /** (channels, sample_rate, bits, n_samples) or null if not a PCM WAV. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12) return null
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return null
    var p = 12
    var channels = -1
    var rate = -1L
    var bits = -1
    var blockAlign = -1
    var dataSize = -1L
    while (p + 8 <= b.length && (channels < 0 || dataSize < 0)) {
      val size = le32(b, p + 4)
      if (size < 0 || size > Int.MaxValue) return null
      val body = p + 8
      if (tag(b, p, "fmt ")) {
        // PCM fmt chunk: format(2) channels(2) rate(4) byterate(4) align(2) bits(2)
        if (size < 16 || body + 16 > b.length) return null
        if (le16(b, body) != 1) return null // not integer PCM
        channels = le16(b, body + 2)
        rate = le32(b, body + 4)
        blockAlign = le16(b, body + 12)
        bits = le16(b, body + 14)
        if (channels < 1 || rate < 1 || rate > Int.MaxValue ||
            bits < 1 || blockAlign < 1) return null // u32 rate must fit an int
        // block align must be consistent, or n_samples would lie
        if (blockAlign != channels * ((bits + 7) / 8)) return null
      } else if (tag(b, p, "data")) {
        if (channels < 0) return null // fmt must precede data (spec order)
        dataSize = size
      }
      // Advance in Long: a declared size near Int.MaxValue would wrap an Int
      // cursor negative and the next le32 read would throw instead of
      // honoring the null-on-unparseable contract. A chunk running past the
      // buffer just ends the walk (same as the pre-Long behavior for
      // truncated tails), leaving the final both-chunks-seen check to decide.
      val next = body.toLong + size + (size % 2) // RIFF pads odd chunks
      p = if (next > b.length) b.length else next.toInt
    }
    if (channels < 0 || dataSize < 0) return null
    new GenericInternalRow(Array[Any](
      channels, rate.toInt, bits, dataSize / blockAlign))
  }

  def apply(payload: Column): Column =
    Bridge.column(AudioMeta(Bridge.expression(payload)))
}
