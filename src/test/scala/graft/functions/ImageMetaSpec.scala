package graft.functions

import graft.GraftSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** PNG IHDR / JPEG SOF header parsing on hand-built byte layouts — real
  * byte arithmetic, no imaging library. Layouts follow the published specs
  * (PNG ISO/IEC 15948 §5.3/§11.2.2; JPEG ITU-T T.81 §B.2.2).
  */
class ImageMetaSpec extends GraftSpec {
  import spark.implicits._

  private def hexBytes(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def parse(b: Array[Byte]): Option[(String, Int, Int)] = {
    val df = Seq(Tuple1(b)).toDF("payload")
      .select(ImageMeta(col("payload")).as("m"))
    df.collect().head.get(0) match {
      case null => None
      case r: Row => Some((r.getString(0), r.getInt(1), r.getInt(2)))
    }
  }

  private val pngHeader =
    "89504E470D0A1A0A" + // signature
    "0000000D" + "49484452" + // IHDR length + type
    "00000280" + "000001E0" + // width 640, height 480
    "0806000000" // bit depth 8, RGBA

  it("parses PNG IHDR dimensions at their fixed offsets") {
    parse(hexBytes(pngHeader)) shouldBe Some(("png", 640, 480))
  }

  it("rejects a PNG whose IHDR chunk is malformed") {
    parse(hexBytes(pngHeader.replace("49484452", "49484453"))) shouldBe None // not 'IHDR'
    parse(hexBytes(pngHeader.replace("0000000D", "0000000E"))) shouldBe None // bad length
    parse(hexBytes("89504E470D0A1A0A")) shouldBe None                        // truncated
  }

  it("walks JPEG segments to SOF0 — dimensions at a data-dependent offset") {
    // SOI, APP0 (len 16), COM (len 6), SOF0 (len 11): h=0x0100=256, w=0x0200=512
    val jpeg = "FFD8" +
      "FFE0" + "0010" + "4A" * 14 +
      "FFFE" + "0006" + "434343" + "43" +
      "FFC0" + "000B" + "08" + "0100" + "0200" + "012200" +
      "FFD9"
    parse(hexBytes(jpeg)) shouldBe Some(("jpeg", 512, 256))
  }

  it("accepts SOF2 (progressive) and skips RST/TEM standalone markers") {
    val jpeg = "FFD8" + "FF01" + "FFD0" + // TEM + RST0, no length fields
      "FFC2" + "000B" + "08" + "0040" + "0030" + "012200" + "FFD9"
    parse(hexBytes(jpeg)) shouldBe Some(("jpeg", 48, 64))
  }

  it("does NOT treat DHT (C4) as a start-of-frame") {
    val jpeg = "FFD8" +
      "FFC4" + "0005" + "080040" + // DHT whose payload mimics SOF fields
      "FFC0" + "000B" + "08" + "0010" + "0020" + "012200"
    parse(hexBytes(jpeg)) shouldBe Some(("jpeg", 32, 16))
  }

  it("rejects non-images, empties, and JPEGs with no SOF before EOI") {
    parse("plain text".getBytes("UTF-8")) shouldBe None
    parse(Array.empty[Byte]) shouldBe None
    parse(hexBytes("FFD8FFD9")) shouldBe None          // SOI then EOI
    parse(hexBytes("FFD8FFE000104A4A")) shouldBe None  // truncated mid-segment
    parse(hexBytes("FFD80000")) shouldBe None          // lost marker sync
  }

  it("is registered as graft_image_meta for SQL callers") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      s"SELECT graft_image_meta(unhex('$pngHeader')) AS m")
      .select("m.format", "m.width", "m.height").as[(String, Int, Int)].head()
    got shouldBe (("png", 640, 480))
  }

  it("codegen path: real doGenCode (static parse call, no CodegenFallback), " +
     "bit-identical to interpreted eval") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback}
    import org.apache.spark.sql.types.BinaryType
    classOf[CodegenFallback].isAssignableFrom(classOf[ImageMeta]) shouldBe false
    val gen = ImageMeta(BoundReference(0, BinaryType, nullable = true))
      .genCode(new CodegenContext)
    gen.code.toString should include("graft.functions.ImageMeta.parse")

    val media = spark.range(1, 200).toDF("doc_id").select(col("doc_id"),
      graft.ext.Multimodal.syntheticImagePayload(col("doc_id")).as("payload"))
    def run(): Set[Row] =
      graft.ext.Multimodal.imageMeta(media, "doc_id", "payload").collect().toSet
    val codegen = run()
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try run() shouldBe codegen
    finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }

  it("end-to-end synthesis+parse agrees with the synthesis parameters") {
    val docs = spark.range(1, 200).toDF("doc_id")
    val media = docs.select(col("doc_id"),
      graft.ext.Multimodal.syntheticImagePayload(col("doc_id")).as("payload"))
    val out = graft.ext.Multimodal.imageMeta(media, "doc_id", "payload")
      .as[(Long, String, Int, Int)].collect()
    out.length shouldBe 199 - 39 // multiples of 5 rejected BY THE PARSER
    out.foreach { case (id, fmt, w, h) =>
      id % 5 should not be 0
      fmt shouldBe (if (id % 2 == 0) "png" else "jpeg")
      w shouldBe (id % 1897 + 16)
      h shouldBe ((id * 7) % 1061 + 16)
    }
  }
}
