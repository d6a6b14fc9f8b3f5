package graft.functions

import graft.GraftSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** WAV/RIFF header parsing on hand-built chunk tables — little-endian byte
  * arithmetic, chunk walk, no codec.
  */
class AudioMetaSpec extends GraftSpec {
  import spark.implicits._

  private def hexBytes(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def le(v: Long, bytes: Int): String =
    (0 until bytes).map(i => f"${(v >> (8 * i)) & 0xff}%02X").mkString

  private def ascii(s: String): String = s.getBytes("US-ASCII").map(b => f"$b%02X").mkString

  private def parse(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    val df = Seq(Tuple1(b)).toDF("payload").select(AudioMeta(col("payload")).as("m"))
    df.collect().head.get(0) match {
      case null => None
      case r: Row => Some((r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    }
  }

  private def fmtChunk(ch: Int, rate: Int, bits: Int): String = {
    val align = ch * ((bits + 7) / 8)
    ascii("fmt ") + le(16, 4) + le(1, 2) + le(ch, 2) + le(rate, 4) +
      le(rate.toLong * align, 4) + le(align, 2) + le(bits, 2)
  }

  it("parses a minimal PCM WAV header (fmt then data)") {
    val wav = ascii("RIFF") + le(36 + 800, 4) + ascii("WAVE") +
      fmtChunk(2, 44100, 16) + ascii("data") + le(800, 4)
    parse(hexBytes(wav)) shouldBe Some((2, 44100, 16, 200L)) // 800 / (2*2)
  }

  it("walks past optional chunks (LIST before fmt, fact between fmt and data)") {
    val wav = ascii("RIFF") + le(100, 4) + ascii("WAVE") +
      ascii("LIST") + le(6, 4) + "AA" * 6 +
      fmtChunk(1, 16000, 8) +
      ascii("fact") + le(4, 4) + le(123, 4) +
      ascii("data") + le(55, 4)
    parse(hexBytes(wav)) shouldBe Some((1, 16000, 8, 55L))
  }

  it("honors RIFF odd-size padding in the walk") {
    val wav = ascii("RIFF") + le(100, 4) + ascii("WAVE") +
      ascii("LIST") + le(5, 4) + "AA" * 5 + "00" + // odd chunk + pad byte
      fmtChunk(1, 8000, 16) + ascii("data") + le(32, 4)
    parse(hexBytes(wav)) shouldBe Some((1, 8000, 16, 16L))
  }

  it("rejects non-PCM, inconsistent block align, and malformed payloads") {
    val nonPcm = ascii("RIFF") + le(60, 4) + ascii("WAVE") +
      (ascii("fmt ") + le(16, 4) + le(3, 2) + le(1, 2) + le(8000, 4) +
        le(8000L * 4, 4) + le(4, 2) + le(32, 2)) + // format 3 = IEEE float
      ascii("data") + le(40, 4)
    parse(hexBytes(nonPcm)) shouldBe None
    val badAlign = ascii("RIFF") + le(60, 4) + ascii("WAVE") +
      (ascii("fmt ") + le(16, 4) + le(1, 2) + le(2, 2) + le(8000, 4) +
        le(8000L * 3, 4) + le(3, 2) + le(16, 2)) + // align 3 != 2 * 2
      ascii("data") + le(40, 4)
    parse(hexBytes(badAlign)) shouldBe None
    parse("not audio".getBytes("UTF-8")) shouldBe None
    parse(Array.empty[Byte]) shouldBe None
    // a u32 sample rate above Int.MaxValue must reject, not wrap negative
    val hugeRate = ascii("RIFF") + le(60, 4) + ascii("WAVE") +
      (ascii("fmt ") + le(16, 4) + le(1, 2) + le(1, 2) + le(0xFFFFFFF0L, 4) +
        le(0, 4) + le(1, 2) + le(8, 2)) +
      ascii("data") + le(40, 4)
    parse(hexBytes(hugeRate)) shouldBe None
    // data before fmt violates the spec order
    val dataFirst = ascii("RIFF") + le(60, 4) + ascii("WAVE") +
      ascii("data") + le(4, 4) + "00000000" + fmtChunk(1, 8000, 8)
    parse(hexBytes(dataFirst)) shouldBe None
    // truncated: fmt claims 16 bytes but the payload ends early
    parse(hexBytes(ascii("RIFF") + le(60, 4) + ascii("WAVE") +
      ascii("fmt ") + le(16, 4) + le(1, 2))) shouldBe None
    // a chunk declaring a size near Int.MaxValue must not wrap the cursor
    // negative (Int overflow → AIOOBE) — null, per the unparseable contract
    parse(hexBytes(ascii("RIFF") + le(32, 4) + ascii("WAVE") +
      ascii("LIST") + le(0x7FFFFFFEL, 4) + "AA" * 20)) shouldBe None
    // same overflow shape but with fmt+data already seen before the huge
    // chunk: the walk ends and the parsed row is still returned
    val wavThenHuge = ascii("RIFF") + le(100, 4) + ascii("WAVE") +
      fmtChunk(1, 8000, 16) + ascii("data") + le(32, 4) + "AA" * 32 +
      ascii("LIST") + le(0x7FFFFFFEL, 4)
    parse(hexBytes(wavThenHuge)) shouldBe Some((1, 8000, 16, 16L))
  }

  it("is registered as graft_audio_meta for SQL callers") {
    GraftFunctions.register(spark)
    val wav = ascii("RIFF") + le(36 + 120, 4) + ascii("WAVE") +
      fmtChunk(1, 22050, 16) + ascii("data") + le(120, 4)
    val got = spark.sql(s"SELECT graft_audio_meta(unhex('$wav')) AS m")
      .select("m.channels", "m.sample_rate", "m.bits", "m.n_samples")
      .as[(Int, Int, Int, Long)].head()
    got shouldBe ((1, 22050, 16, 60L))
  }

  it("codegen path: real doGenCode (static parse call, no CodegenFallback), " +
     "bit-identical to interpreted eval") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback}
    import org.apache.spark.sql.types.BinaryType
    classOf[CodegenFallback].isAssignableFrom(classOf[AudioMeta]) shouldBe false
    val gen = AudioMeta(BoundReference(0, BinaryType, nullable = true))
      .genCode(new CodegenContext)
    gen.code.toString should include("graft.functions.AudioMeta.parse")

    val media = spark.range(1, 200).toDF("doc_id").select(col("doc_id"),
      graft.ext.Multimodal.syntheticWavPayload(col("doc_id")).as("payload"))
    def run(): Set[Row] =
      graft.ext.Multimodal.audioMeta(media, "doc_id", "payload").collect().toSet
    val codegen = run()
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try run() shouldBe codegen
    finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }

  it("end-to-end synthesis+parse agrees with the synthesis parameters") {
    val docs = spark.range(1, 150).toDF("doc_id")
    val media = docs.select(col("doc_id"),
      graft.ext.Multimodal.syntheticWavPayload(col("doc_id")).as("payload"))
    val out = graft.ext.Multimodal.audioMeta(media, "doc_id", "payload")
      .as[(Long, Int, Int, Int, Long)].collect()
    out.length shouldBe 149 - 21 // multiples of 7 rejected BY THE PARSER
    out.foreach { case (id, ch, rate, bits, ns) =>
      id % 7 should not be 0
      ch shouldBe (id % 2 + 1)
      rate shouldBe Seq(8000, 16000, 22050, 44100)((id % 4).toInt)
      bits shouldBe (if (id % 3 == 0) 8 else 16)
      ns shouldBe (id % 997 + 10)
    }
  }
}
