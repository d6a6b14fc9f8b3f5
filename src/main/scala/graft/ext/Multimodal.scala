package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling (EXT): image/audio/video as opaque `binary`
  * columns with a typed metadata struct, processed batch-at-a-time on the
  * executors via `Dataset.mapPartitions` (the Scala analogue of
  * `mapInPandas`: one iterator per partition, amortized per-batch setup,
  * no per-row serialization boundary beyond the encoder).
  *
  * The actual codec call is STUBBED (no image/audio libraries in this
  * environment): [[DecodeStub.decode]] derives deterministic features from
  * the raw bytes. The Spark-side plumbing — schema, typed encoders,
  * partition-preserving batch shape, feature extraction contract — is real
  * and oracle-tested (DQ24).
  */
object Multimodal {

  /** media struct: payload + mime + size, the schema an ingest pipeline
    * carries for any modality.
    */
  def mediaStruct(bytes: Column, mime: String): Column =
    struct(bytes.as("bytes"), lit(mime).as("mime"), length(bytes).as("size"))

  final case class MediaRow(doc_id: Long, bytes: Array[Byte])
  final case class MediaFeatures(doc_id: Long, byte_len: Long, first_byte: Int,
      checksum16: Long, n_frames: Long)

  /** What a real decoder would return; here a deterministic function of the
    * payload so any engine can reproduce it.
    */
  object DecodeStub {
    def decode(m: MediaRow): MediaFeatures = {
      // real implementation would hand m.bytes to an image/audio codec here
      val head = m.bytes.take(16)
      MediaFeatures(
        doc_id = m.doc_id,
        byte_len = m.bytes.length.toLong,
        first_byte = if (m.bytes.isEmpty) 0 else m.bytes(0) & 0xff,
        checksum16 = head.foldLeft(0L)((a, b) => a + (b & 0xff)) % 256,
        n_frames = m.bytes.length / 100L)
    }
  }

  /** Batch feature extraction: one decoder instance per partition, streaming
    * through the rows — the shape that scales (decoder setup amortized,
    * constant memory, no driver involvement).
    */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map(DecodeStub.decode)
    }
  }

  /** Deterministic frame sampling stub for "video" payloads: every
    * `stride`-th 100-byte block, up to `maxFrames`.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int, maxFrames: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val frames = m.bytes.grouped(100).toSeq
      frames.indices.collect {
        case i if i % stride == 0 => (m.doc_id, i, frames(i).length)
      }.take(maxFrames)
    }.toDF("doc_id", "frame_idx", "frame_len")
  }

  /** Deterministic "resize" stub: downsample the payload by an integer
    * factor (every `factor`-th byte — a real implementation would hand the
    * bytes to an image scaler). Output keeps the media-struct shape so
    * resized media flows through the same downstream pipeline.
    */
  def resize(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    require(factor >= 1, "factor must be >= 1")
    import media.sparkSession.implicits._
    media.map { m =>
      val out = m.bytes.indices.collect { case i if i % factor == 0 => m.bytes(i) }
      MediaRow(m.doc_id, out.toArray)
    }
  }

  /** DQ24 pipeline: text payload → binary media column → mapPartitions
    * decode → features frame.
    */
  def featuresOf(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    import df.sparkSession.implicits._
    val media = df.select(col(idCol).as("doc_id"),
        col(payloadCol).cast("binary").as("bytes")).as[MediaRow]
    decodeFeatures(media).toDF()
  }

  /** REAL image metadata decode (DQ73) — no stub: parses PNG IHDR and JPEG
    * SOF headers from payload bytes with the [[graft.functions.ImageMeta]]
    * kernel and keeps only rows that decode, the "payload is a usable
    * image" ingest gate. Output: (doc_id, format, width, height).
    */
  def imageMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        graft.functions.ImageMeta(col(payloadCol)).as("m"))
      .filter(col("m").isNotNull)
      .select(col("doc_id"), col("m.format").as("format"),
        col("m.width").as("width"), col("m.height").as("height"))

  /** Deterministic image-payload synthesis for the DQ73 fixture: a REAL
    * byte-layout PNG header (doc_id ≡ 0 mod 2), a REAL JPEG marker stream
    * whose APP0/COM segment lengths VARY with doc_id — so the parser's
    * marker walk is load-bearing, dimensions are never at a fixed offset —
    * (doc_id ≡ 1 mod 2), or a non-image text payload (doc_id ≡ 0 mod 5,
    * exercising the reject path). Pure Column algebra over hex strings, so
    * the DuckDB oracle builds byte-identical blobs and re-parses them
    * independently.
    */
  /** A REAL byte-layout PNG header with EXPLICIT dimensions — the
    * [[syntheticImagePayload]] PNG branch with (w, h) as parameters,
    * for fixtures that need precise near-duplicate control: every PNG
    * from this helper is 33 bytes, so under an 8-block byte signature
    * ([[MediaDedup.signatureRows]]) blocks 0-2 and 5-7 are constant,
    * block 3 carries only the width and block 4 only the height —
    * "same width or same height" is exactly a 7-of-8 block match. */
  def syntheticPngPayload(w: Column, h: Column): Column =
    concat(
      unhex(lit("89504E470D0A1A0A")), // signature
      unhex(lit("0000000D")),         // IHDR length (13)
      unhex(lit("49484452")),         // "IHDR"
      unhex(lpad(hex(w), 8, "0")), unhex(lpad(hex(h), 8, "0")),
      unhex(lit("0806000000")))       // bit depth, color type, ...

  def syntheticImagePayload(docId: Column): Column = {
    def be(v: Column, hexChars: Int): Column =
      unhex(lpad(hex(v), hexChars, "0"))
    val w = docId % 1897 + 16
    val h = (docId * 7) % 1061 + 16
    val app0PayloadLen = (docId % 8 + 14).cast("int")  // APP0 len = 16..23
    val comPayloadLen = ((docId * 3) % 5 + 2).cast("int") // COM len = 4..8
    val png = concat(
      unhex(lit("89504E470D0A1A0A")), // signature
      unhex(lit("0000000D")),         // IHDR length (13)
      unhex(lit("49484452")),         // "IHDR"
      be(w, 8), be(h, 8),
      unhex(lit("0806000000")))       // bit depth, color type, ...
    val jpeg = concat(
      unhex(lit("FFD8")),             // SOI
      unhex(lit("FFE0")), be(app0PayloadLen + 2, 4), // APP0, variable length
      repeat(lit("J"), app0PayloadLen).cast("binary"),
      unhex(lit("FFFE")), be(comPayloadLen + 2, 4),  // COM, variable length
      repeat(lit("C"), comPayloadLen).cast("binary"),
      unhex(lit("FFC0")), unhex(lit("000B08")),      // SOF0, len 11, precision 8
      be(h, 4), be(w, 4),
      unhex(lit("012200")),           // 1 component
      unhex(lit("FFD9")))             // EOI
    when(docId % 5 === 0, concat(lit("not an image "), docId.cast("string")).cast("binary"))
      .when(docId % 2 === 0, png)
      .otherwise(jpeg)
  }

  /** REAL audio metadata decode (DQ79) — [[graft.functions.AudioMeta]]'s
    * WAV/RIFF chunk walk over payload bytes, keeping only rows that parse:
    * the "clip is usable audio" ingest gate plus declared-duration
    * accounting (`n_samples / sample_rate`) with no sample decode.
    * Output: (doc_id, channels, sample_rate, bits, n_samples).
    */
  def audioMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        graft.functions.AudioMeta(col(payloadCol)).as("m"))
      .filter(col("m").isNotNull)
      .select(col("doc_id"), col("m.channels").as("channels"),
        col("m.sample_rate").as("sample_rate"), col("m.bits").as("bits"),
        col("m.n_samples").as("n_samples"))

  /** Deterministic WAV-header synthesis for the DQ79 fixture — the audio
    * sibling of [[syntheticImagePayload]]: a REAL RIFF chunk table whose
    * LIST filler chunk VARIES in length with doc_id (the chunk walk is
    * load-bearing), everything little-endian, fmt/data fields derived from
    * doc_id; doc_id ≡ 0 mod 7 yields a non-audio payload for the reject
    * path. Headers only — the data chunk declares its size with no body,
    * which is exactly what a header gate must not read.
    */
  def syntheticWavPayload(docId: Column): Column = {
    // little-endian: reversed byte pairs of the fixed-width hex rendering
    def le(v: Column, hexChars: Int): Column = {
      val h = lpad(hex(v), hexChars, "0")
      unhex(concat((hexChars - 2 to 0 by -2).map(i => substring(h, i + 1, 2)): _*))
    }
    val rate = when(docId % 4 === 0, 8000).when(docId % 4 === 1, 16000)
      .when(docId % 4 === 2, 22050).otherwise(44100)
    val channels = (docId % 2 + 1).cast("int")
    val bits = when(docId % 3 === 0, 8).otherwise(16)
    val align = channels * (bits / 8)
    val listLen = ((docId % 9 + 2) * 2).cast("int") // even, 4..20 bytes
    val nSamples = (docId % 997 + 10).cast("int")
    val dataSize = nSamples * align
    val riffSize = lit(4) + (lit(8) + listLen) + lit(8 + 16) + lit(8) + dataSize
    val wav = concat(
      lit("RIFF").cast("binary"), le(riffSize, 8), lit("WAVE").cast("binary"),
      lit("LIST").cast("binary"), le(listLen, 8),
      repeat(lit("J"), listLen).cast("binary"),
      lit("fmt ").cast("binary"), le(lit(16), 8),
      le(lit(1), 4),            // PCM format tag
      le(channels, 4), le(rate, 8),
      le(rate * align, 8),      // byte rate
      le(align, 4), le(bits, 4),
      lit("data").cast("binary"), le(dataSize, 8))
    when(docId % 7 === 0,
      concat(lit("not audio "), docId.cast("string")).cast("binary"))
      .otherwise(wav)
  }

  /** REAL video metadata decode (DQ80) — [[graft.functions.VideoMeta]]'s
    * MP4 box walk: keep rows that parse, with the declared clip length
    * (`duration / timescale`) available for duration gating.
    * Output: (doc_id, brand, timescale, duration).
    */
  def videoMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        graft.functions.VideoMeta(col(payloadCol)).as("m"))
      .filter(col("m").isNotNull)
      .select(col("doc_id"), col("m.brand").as("brand"),
        col("m.timescale").as("timescale"), col("m.duration").as("duration"))

  /** Deterministic MP4 synthesis for the DQ80 fixture — the video sibling
    * of [[syntheticImagePayload]]/[[syntheticWavPayload]]: a real box tree
    * (`ftyp` + variable-length `free` + `moov[udta + mvhd v0]`) whose
    * filler boxes VARY with doc_id so both the top-level and the child box
    * walks are data-driven; doc_id ≡ 0 mod 3 yields a non-video payload
    * for the reject path. All sizes big-endian; mvhd is the full 108-byte
    * version-0 box (fields past duration zeroed).
    */
  def syntheticMp4Payload(docId: Column): Column = {
    def be(v: Column, hexChars: Int): Column =
      unhex(lpad(hex(v), hexChars, "0"))
    val brand = when(docId % 2 === 0, lit("isom")).otherwise(lit("mp42"))
    val freeLen = (docId % 16 + 8).cast("int")         // free box total size
    val udtaLen = ((docId * 5) % 12 + 8).cast("int")   // udta box total size
    val timescale = when(docId % 4 === 0, 600).when(docId % 4 === 1, 1000)
      .when(docId % 4 === 2, 24000).otherwise(90000)
    val duration = (docId % 9000 + 30) * 100
    val moovLen = lit(8) + udtaLen + lit(108)
    val mp4 = concat(
      be(lit(16), 8), lit("ftyp").cast("binary"),     // ftyp, size 16
      brand.cast("binary"), be(lit(0), 8),            // major brand + minor version
      be(freeLen, 8), lit("free").cast("binary"),
      repeat(lit("J"), freeLen - 8).cast("binary"),
      be(moovLen, 8), lit("moov").cast("binary"),
      be(udtaLen, 8), lit("udta").cast("binary"),
      repeat(lit("C"), udtaLen - 8).cast("binary"),
      be(lit(108), 8), lit("mvhd").cast("binary"),
      be(lit(0), 8),                                  // version 0 + flags
      be(lit(0), 8), be(lit(0), 8),                   // ctime, mtime
      be(timescale, 8), be(duration, 8),
      unhex(lit("00" * 80)))                        // rate..next_track_id
    when(docId % 3 === 0,
      concat(lit("not a video "), docId.cast("string")).cast("binary"))
      .otherwise(mp4)
  }
}
