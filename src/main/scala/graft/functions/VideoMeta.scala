package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Video container metadata from raw payload bytes — the third modality
  * kernel next to [[ImageMeta]] and [[AudioMeta]]: MP4 / ISO BMFF
  * (ISO/IEC 14496-12), parsed from the BOX TREE alone.
  *
  * `binary → struct<brand: string, timescale: int, duration: long>`, null
  * when the payload is not a parseable MP4 — `duration / timescale` is the
  * clip length in seconds, i.e. the "keep clips between 2s and 5min"
  * curation gate with zero sample/codec work.
  *
  * Layout: a sequence of boxes (u32 BIG-endian size including the 8-byte
  * header, 4-char type). The first box must be `ftyp` (major brand = its
  * first payload word); `moov` is a pure container whose CHILD walk locates
  * `mvhd`, where timescale/duration sit at version-dependent offsets
  * (version 0: u32s after two u32 timestamps; version 1: after two u64
  * timestamps, duration itself u64). Optional boxes (`free`, `udta`, ...)
  * sit at writer discretion before either target, so BOTH walks are
  * data-driven — no fixed-offset shortcut exists. Size 0 ("to end of
  * file") and 1 (64-bit escape) are rejected rather than guessed at.
  *
  * Per-payload cost is the box table, never media data — `mdat` is skipped
  * by its size field like every other box.
  */
case class VideoMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("brand", StringType, nullable = false),
    StructField("timescale", IntegerType, nullable = false),
    StructField("duration", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"video_meta expects a binary input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    VideoMeta.parse(input.asInstanceOf[Array[Byte]])

  /** Codegen = one static call into the same parser the interpreted path
    * runs (see [[AudioMeta.doGenCode]] — same rationale): keeps the stage
    * in WholeStageCodegen with no fallback boxing, and the two paths are
    * bit-identical because they are the same code.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |${ev.value} = graft.functions.VideoMeta.parse($in);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): VideoMeta =
    copy(child = newChild)

  override def prettyName: String = "video_meta"
}

object VideoMeta {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    i + 3 < b.length && b(i) == t(0).toByte && b(i + 1) == t(1).toByte &&
      b(i + 2) == t(2).toByte && b(i + 3) == t(3).toByte

  /** (brand, timescale, duration) or null if `b` is not a parseable MP4. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 16) return null
    // first box MUST be ftyp; major brand = its first payload word
    val s0 = be32(b, 0)
    if (!tag(b, 4, "ftyp") || s0 < 16 || s0 > b.length) return null
    val brand = UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, 8, 12))
    // top-level walk to moov
    var p = s0.toInt
    while (p + 8 <= b.length) {
      val size = be32(b, p)
      if (size < 8 || p + size > b.length) return null // incl. 0/1 escapes
      if (tag(b, p + 4, "moov")) {
        // child walk to mvhd
        var q = p + 8
        val end = p + size.toInt
        while (q + 8 <= end) {
          val cs = be32(b, q)
          if (cs < 8 || q + cs > end) return null
          if (tag(b, q + 4, "mvhd")) {
            if (q + 12 > end) return null
            u8(b, q + 8) match {
              case 0 => // u32 ctime/mtime, then u32 timescale/duration
                if (q + 28 > end) return null
                val ts = be32(b, q + 20)
                val dur = be32(b, q + 24)
                if (ts < 1 || ts > Int.MaxValue) return null
                return new GenericInternalRow(Array[Any](brand, ts.toInt, dur))
              case 1 => // u64 ctime/mtime, u32 timescale, u64 duration
                if (q + 40 > end) return null
                val ts = be32(b, q + 28)
                val dur = be64(b, q + 32)
                if (ts < 1 || ts > Int.MaxValue || dur < 0) return null
                return new GenericInternalRow(Array[Any](brand, ts.toInt, dur))
              case _ => return null
            }
          }
          q += cs.toInt
        }
        return null // moov without mvhd
      }
      p += size.toInt
    }
    null
  }

  def apply(payload: Column): Column =
    Bridge.column(VideoMeta(Bridge.expression(payload)))
}
