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

/** Image header metadata from raw payload bytes — the REAL multimodal
  * decode step (upgrading [[graft.ext.Multimodal.DecodeStub]]'s fake
  * features): pure byte arithmetic over a `binary` column, no imaging
  * library needed, so it runs identically in this sandbox and on a
  * 1000-executor cluster.
  *
  * `binary → struct<format: string, width: int, height: int>`, null when
  * the payload is not a recognized image — the filter shape a corpus
  * ingest pipeline needs ("keep documents whose image decodes and is at
  * least 64×64") without ever handing bytes to a codec.
  *
  * Formats (both published specs, parsed from the byte layout alone):
  *  - PNG (ISO/IEC 15948): 8-byte signature, then the IHDR chunk is
  *    REQUIRED to come first — width/height are the two big-endian u32s at
  *    fixed offsets 16 and 20. The signature, chunk length (13) and chunk
  *    type are all verified, not assumed.
  *  - JPEG (ITU-T T.81): SOI marker, then a MARKER WALK — segments are
  *    (0xFF, type, u16 big-endian length incl. itself), skipped one by one
  *    until a start-of-frame marker (0xC0–0xCF minus 0xC4/0xC8/0xCC which
  *    are not SOFs); height/width are the u16s at payload offsets 3 and 5.
  *    Dimensions live at a VARIABLE offset behind APP0/COM/... segments, so
  *    the walk is load-bearing — there is no fixed-offset shortcut.
  *
  * Per-row cost is a handful of byte reads (PNG) or one pass over the
  * segment TABLE, not the entropy-coded body (JPEG) — the expression prunes
  * to header bytes even when the payload column holds whole files.
  */
case class ImageMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"image_meta expects a binary input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    ImageMeta.parse(input.asInstanceOf[Array[Byte]])

  /** Codegen = one static call into the same parser the interpreted path
    * runs (see [[AudioMeta.doGenCode]] — same rationale): keeps the stage
    * in WholeStageCodegen with no fallback boxing, and the two paths are
    * bit-identical because they are the same code.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |${ev.value} = graft.functions.ImageMeta.parse($in);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ImageMeta =
    copy(child = newChild)

  override def prettyName: String = "image_meta"
}

object ImageMeta {

  private val PngFormat = UTF8String.fromString("png")
  private val JpegFormat = UTF8String.fromString("jpeg")

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  /** (format, width, height) or null if `b` is not a parseable PNG/JPEG. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null) return null
    val png = parsePng(b)
    if (png != null) return png
    parseJpeg(b)
  }

  private def parsePng(b: Array[Byte]): InternalRow = {
    // signature (8) + IHDR length (4) + "IHDR" (4) + width (4) + height (4)
    if (b.length < 24) return null
    if (u8(b, 0) != 0x89 || u8(b, 1) != 0x50 || u8(b, 2) != 0x4e || u8(b, 3) != 0x47 ||
        u8(b, 4) != 0x0d || u8(b, 5) != 0x0a || u8(b, 6) != 0x1a || u8(b, 7) != 0x0a)
      return null
    if (be32(b, 8) != 13L) return null // IHDR data length is always 13
    if (u8(b, 12) != 'I' || u8(b, 13) != 'H' || u8(b, 14) != 'D' || u8(b, 15) != 'R')
      return null
    val w = be32(b, 16)
    val h = be32(b, 20)
    // spec: 1 .. 2^31-1
    if (w < 1 || h < 1 || w > Int.MaxValue || h > Int.MaxValue) return null
    new GenericInternalRow(Array[Any](PngFormat, w.toInt, h.toInt))
  }

  private def parseJpeg(b: Array[Byte]): InternalRow = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return null
    var p = 2
    while (p + 1 < b.length) {
      if (u8(b, p) != 0xff) return null // lost marker sync
      val m = u8(b, p + 1)
      if (m == 0xff) { p += 1 } // fill byte before a marker
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { p += 2 } // standalone
      else if (m == 0xd9 || m == 0xda) return null // EOI/SOS before any SOF
      else {
        if (p + 3 >= b.length) return null
        val len = be16(b, p + 2)
        if (len < 2) return null
        val sof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
        if (sof) {
          // segment payload: precision(1) height(2) width(2) ...
          if (len < 7 || p + 8 >= b.length) return null
          val h = be16(b, p + 5)
          val w = be16(b, p + 7)
          if (w < 1 || h < 1) return null
          return new GenericInternalRow(Array[Any](JpegFormat, w, h))
        }
        p += 2 + len
      }
    }
    null
  }

  def apply(payload: Column): Column =
    Bridge.column(ImageMeta(Bridge.expression(payload)))
}
