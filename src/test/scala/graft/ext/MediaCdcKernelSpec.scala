package graft.ext

import graft.GraftSpec

/** The [[graft.functions.CdcChunks]] kernel is BIT-IDENTICAL to the
  * Column-expression formulation it replaced ([[MediaDedup.cdcChunkRowsSpec]],
  * the shape dq187 shipped with and the DuckDB oracles replay): same
  * (doc_id, ch) multiset on random payloads across every edge the boundary
  * rule has — empty payloads, payloads shorter than the window, a cut
  * landing exactly at nb, runs of consecutive cuts (1-byte chunks), and
  * both `zeros` dials the declared queries use.
  */
class MediaCdcKernelSpec extends GraftSpec {
  import spark.implicits._

  private def randomPayloads(seed: Int, n: Int,
      maxLen: Int): Seq[(Long, Array[Byte])] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      val len = rnd.nextInt(maxLen + 1) // includes 0
      val b = new Array[Byte](len)
      rnd.nextBytes(b)
      (i.toLong, b)
    }
  }

  private def assertParity(rows: Seq[(Long, Array[Byte])], window: Int,
      zeros: Int): Unit = {
    val df = rows.toDF("doc_id", "payload")
    val kernel = MediaDedup.cdcChunkRows(df, "doc_id", "payload",
      window, zeros).groupBy("doc_id", "ch").count()
      .orderBy("doc_id", "ch").collect().toSeq
    val spec = MediaDedup.cdcChunkRowsSpec(df, "doc_id", "payload",
      window, zeros).groupBy("doc_id", "ch").count()
      .orderBy("doc_id", "ch").collect().toSeq
    kernel shouldBe spec
  }

  it("property: kernel (doc_id, ch) multiset equals the Column spec on " +
     "random payloads at zeros=1 and zeros=2") {
    val rows = randomPayloads(seed = 7, n = 120, maxLen = 300)
    assertParity(rows, window = 4, zeros = 1)
    assertParity(rows, window = 4, zeros = 2)
  }

  it("edges: empty payload, shorter-than-window, window-sized, and a " +
     "null payload row") {
    val rows = Seq(
      1L -> Array.empty[Byte],
      2L -> Array[Byte](1),
      3L -> Array[Byte](1, 2, 3),
      4L -> Array[Byte](1, 2, 3, 4))
    assertParity(rows, window = 4, zeros = 1)
    // nulls are filtered by both forms (the family contract)
    val withNull = rows.toDF("doc_id", "payload")
      .union(Seq((9L, null.asInstanceOf[Array[Byte]]))
        .toDF("doc_id", "payload"))
    MediaDedup.cdcChunkRows(withNull, "doc_id", "payload", 4, 1)
      .filter($"doc_id" === 9L).count() shouldBe 0L
  }

  it("a cut landing exactly at nb closes the last chunk without opening " +
     "an empty one (kernel matches spec on crafted boundary-at-end rows)") {
    // brute-force search tiny payloads for one whose LAST window is a cut
    // under zeros=1 (1/16 chance per candidate) — guarantees the case is
    // actually exercised rather than hoped for in the random draw
    val rnd = new scala.util.Random(13)
    val md = java.security.MessageDigest.getInstance("MD5")
    def lastWindowCuts(b: Array[Byte]): Boolean = {
      val hex = b.map(x => f"$x%02X").mkString
      val slice = hex.substring(hex.length - 8) // window=4 → 8 hex chars
      val d = md.digest(slice.getBytes("US-ASCII"))
      (d(0) & 0xf0) == 0
    }
    val hits = Iterator.continually {
      val b = new Array[Byte](16); rnd.nextBytes(b); b
    }.filter(lastWindowCuts).take(5).toSeq
    assertParity(hits.zipWithIndex.map { case (b, i) => (i.toLong, b) },
      window = 4, zeros = 1)
  }
}
