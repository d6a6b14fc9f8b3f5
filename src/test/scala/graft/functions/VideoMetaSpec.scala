package graft.functions

import graft.GraftSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** MP4 / ISO BMFF box-tree parsing on hand-built payloads (ISO/IEC
  * 14496-12 layout): big-endian sizes, nested walk, version-dependent
  * mvhd offsets.
  */
class VideoMetaSpec extends GraftSpec {
  import spark.implicits._

  private def hexBytes(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def be(v: Long, bytes: Int): String =
    (bytes - 1 to 0 by -1).map(i => f"${(v >> (8 * i)) & 0xff}%02X").mkString

  private def ascii(s: String): String =
    s.getBytes("US-ASCII").map(b => f"$b%02X").mkString

  private def parse(b: Array[Byte]): Option[(String, Int, Long)] = {
    val df = Seq(Tuple1(b)).toDF("payload").select(VideoMeta(col("payload")).as("m"))
    df.collect().head.get(0) match {
      case null => None
      case r: Row => Some((r.getString(0), r.getInt(1), r.getLong(2)))
    }
  }

  private def ftyp(brand: String): String =
    be(16, 4) + ascii("ftyp") + ascii(brand) + be(0, 4)

  private def mvhdV0(ts: Int, dur: Long): String =
    be(108, 4) + ascii("mvhd") + "00" + "000000" +
      be(0, 4) + be(0, 4) + be(ts, 4) + be(dur, 4) + "00" * 80

  it("parses ftyp brand and mvhd v0 timescale/duration through filler boxes") {
    val udta = be(12, 4) + ascii("udta") + "43" * 4
    val moov = be(8 + 12 + 108, 4) + ascii("moov") + udta + mvhdV0(90000, 2700000L)
    val mp4 = ftyp("isom") + be(8 + 6, 4) + ascii("free") + "4A" * 6 + moov
    parse(hexBytes(mp4)) shouldBe Some(("isom", 90000, 2700000L))
  }

  it("parses mvhd VERSION 1 (64-bit times, u32 timescale, u64 duration)") {
    val mvhd1 = be(120, 4) + ascii("mvhd") + "01" + "000000" +
      be(0, 8) + be(0, 8) + be(600, 4) + be(5000000000L, 8) + "00" * 80
    val moov = be(8 + 120, 4) + ascii("moov") + mvhd1
    parse(hexBytes(ftyp("mp42") + moov)) shouldBe Some(("mp42", 600, 5000000000L))
  }

  it("skips mdat by its size field — media data is never scanned") {
    val mdat = be(8 + 50, 4) + ascii("mdat") + "AB" * 50
    val moov = be(8 + 108, 4) + ascii("moov") + mvhdV0(1000, 42L)
    parse(hexBytes(ftyp("isom") + mdat + moov)) shouldBe Some(("isom", 1000, 42L))
  }

  it("rejects malformed payloads") {
    parse("not a video".getBytes("UTF-8")) shouldBe None
    parse(Array.empty[Byte]) shouldBe None
    // no moov before the payload ends
    parse(hexBytes(ftyp("isom") + be(8, 4) + ascii("free"))) shouldBe None
    // moov without mvhd
    parse(hexBytes(ftyp("isom") + be(8 + 12, 4) + ascii("moov") +
      be(12, 4) + ascii("udta") + "00" * 4)) shouldBe None
    // box size escapes (0 = to-end, 1 = 64-bit) are rejected, not guessed
    parse(hexBytes(ftyp("isom") + be(0, 4) + ascii("moov"))) shouldBe None
    parse(hexBytes(ftyp("isom") + be(1, 4) + ascii("moov") + "00" * 16)) shouldBe None
    // a child box overrunning its parent
    parse(hexBytes(ftyp("isom") + be(8 + 12, 4) + ascii("moov") +
      be(200, 4) + ascii("mvhd") + "00" * 4)) shouldBe None
    // first box is not ftyp
    parse(hexBytes(be(8 + 108, 4) + ascii("moov") + mvhdV0(600, 1L))) shouldBe None
  }

  it("is registered as graft_video_meta for SQL callers") {
    GraftFunctions.register(spark)
    val mp4 = ftyp("mp42") + be(8 + 108, 4) + ascii("moov") + mvhdV0(24000, 480000L)
    val got = spark.sql(s"SELECT graft_video_meta(unhex('$mp4')) AS m")
      .select("m.brand", "m.timescale", "m.duration")
      .as[(String, Int, Long)].head()
    got shouldBe (("mp42", 24000, 480000L))
  }

  it("codegen path: real doGenCode (static parse call, no CodegenFallback), " +
     "bit-identical to interpreted eval") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback}
    import org.apache.spark.sql.types.BinaryType
    classOf[CodegenFallback].isAssignableFrom(classOf[VideoMeta]) shouldBe false
    val gen = VideoMeta(BoundReference(0, BinaryType, nullable = true))
      .genCode(new CodegenContext)
    gen.code.toString should include("graft.functions.VideoMeta.parse")

    val media = spark.range(1, 200).toDF("doc_id").select(col("doc_id"),
      graft.ext.Multimodal.syntheticMp4Payload(col("doc_id")).as("payload"))
    def run(): Set[Row] =
      graft.ext.Multimodal.videoMeta(media, "doc_id", "payload").collect().toSet
    val codegen = run()
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try run() shouldBe codegen
    finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }

  it("end-to-end synthesis+parse agrees with the synthesis parameters") {
    val docs = spark.range(1, 150).toDF("doc_id")
    val media = docs.select(col("doc_id"),
      graft.ext.Multimodal.syntheticMp4Payload(col("doc_id")).as("payload"))
    val out = graft.ext.Multimodal.videoMeta(media, "doc_id", "payload")
      .as[(Long, String, Int, Long)].collect()
    out.length shouldBe 149 - 49 // multiples of 3 rejected BY THE PARSER
    out.foreach { case (id, brand, ts, dur) =>
      id % 3 should not be 0
      brand shouldBe (if (id % 2 == 0) "isom" else "mp42")
      ts shouldBe Seq(600, 1000, 24000, 90000)((id % 4).toInt)
      dur shouldBe (id % 9000 + 30) * 100
    }
  }
}
