package graft.ext

import graft.GraftSpec

/** EXT multimodal plumbing: binary payloads, mapPartitions decode, frames. */
class MultimodalSpec extends GraftSpec {
  import spark.implicits._
  import Multimodal._

  private def media = Seq(
    MediaRow(1L, "ABCD".getBytes("UTF-8")),
    MediaRow(2L, Array.fill[Byte](250)(65)),
    MediaRow(3L, Array.emptyByteArray)
  ).toDS()

  describe("decodeFeatures (mapPartitions decode stub)") {
    it("derives deterministic features per payload") {
      val f = decodeFeatures(media).collect().sortBy(_.doc_id)
      f(0) shouldBe MediaFeatures(1L, 4L, 65, (65 + 66 + 67 + 68) % 256, 0L)
      f(1).byte_len shouldBe 250L
      f(1).n_frames shouldBe 2L
      f(1).checksum16 shouldBe (16 * 65) % 256
      f(2) shouldBe MediaFeatures(3L, 0L, 0, 0L, 0L)
    }
  }

  describe("sampleFrames") {
    it("takes every stride-th 100-byte block") {
      val rows = sampleFrames(media.filter(_.doc_id == 2L), stride = 2, maxFrames = 10)
        .as[(Long, Int, Int)].collect().sortBy(_._2)
      rows shouldBe Array((2L, 0, 100), (2L, 2, 50))
    }
  }

  describe("resize") {
    it("downsamples by the factor and stays pipeline-compatible") {
      val r = resize(media.filter(_.doc_id == 2L), factor = 2).collect().head
      r.bytes.length shouldBe 125 // 250 bytes, every 2nd kept
      // resized media feeds the same decode pipeline
      decodeFeatures(resize(media, 2)).count() shouldBe media.count()
    }
  }

  describe("mediaStruct") {
    it("carries payload + mime + size") {
      val r = Seq("hello").toDF("t")
        .select(mediaStruct($"t".cast("binary"), "text/plain").as("m"))
        .select($"m.mime", $"m.size").as[(String, Int)].head()
      r shouldBe ("text/plain", 5)
    }
  }
}
