package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

import graft.GraftSpec

/** Binary-payload content dedup ([[MediaDedup]], dq174/dq175): the exact
  * digest keep rule, the blocked-signature pigeonhole, the length fence,
  * the bucket cap, the declared-stage parser, and the no-payload-shuffle
  * plan audit.
  */
class MediaDedupSpec extends GraftSpec {
  import spark.implicits._

  /** (id, payload from a seq of 8 block strings, tag). */
  private def frame(rows: (Long, Seq[String], String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "blocks", "tag")
      .select(col("doc_id"),
        concat_ws("", col("blocks")).cast("binary").as("payload"),
        col("tag"))

  private def blocksOf(key: String, diff: Set[Int] = Set.empty,
      salt: String = "x"): Seq[String] =
    (0 to 7).map(j =>
      if (diff(j)) s"BLK$salt$j".padTo(32, '_')
      else s"BLK$key$j".padTo(32, '_'))

  private def ids(df: DataFrame): Seq[Long] =
    df.select("doc_id").as[Long].collect().sorted.toSeq

  it("exactByPayload keeps the lowest id per byte-identical payload and " +
     "every distinct payload, preserving the input columns") {
    val df = frame(
      (7L, blocksOf("a"), "dup-late"),
      (2L, blocksOf("a"), "dup-early"),
      (5L, blocksOf("b"), "solo"),
      (9L, blocksOf("a"), "dup-latest"))
    val kept = MediaDedup.exactByPayload(df, "payload", "doc_id")
    ids(kept) shouldBe Seq(2L, 5L)
    kept.columns.toSeq shouldBe df.columns.toSeq
    // the winner's own row (caption and all) survives, not a synthesized one
    kept.filter($"doc_id" === 2L).select("tag").as[String].head() shouldBe
      "dup-early"
  }

  it("a duplicate-free frame passes BOTH modes unchanged — the empty " +
     "loser set short-circuits (Spark's bloomFilter over zero rows " +
     "returns null bits that throw on probe; a streamed micro-batch " +
     "with no dups hit exactly that)") {
    val df = frame(
      (1L, blocksOf("a"), "x"), (2L, blocksOf("b"), "y"),
      (3L, blocksOf("c"), "z"))
    ids(MediaDedup.exactByPayload(df, "payload", "doc_id")) shouldBe
      Seq(1L, 2L, 3L)
    ids(MediaDedup.keepNearCanonical(df, "doc_id", "payload",
      blocks = 8, minMatch = 6)) shouldBe Seq(1L, 2L, 3L)
  }

  it("the blocked-signature pigeonhole: payloads differing in <= " +
     "blocks - minMatch blocks pair; more differing blocks don't; " +
     "different lengths never pair") {
    val df = frame(
      (1L, blocksOf("g"), "base"),
      // 2 of 8 blocks differ -> 6 matches >= minMatch 6
      (2L, blocksOf("g", diff = Set(0, 7)), "near"),
      // 3 of 8 differ -> 5 matches < 6 (its own salt, so its changed
      // blocks don't accidentally match doc 2's changed blocks)
      (3L, blocksOf("g", diff = Set(0, 3, 7), salt = "y"), "far"),
      // byte-identical prefix but LONGER payload: length fences it out
      (4L, blocksOf("g") :+ "TAIL", "longer"))
    val pairs = MediaDedup
      .nearDupPairsBytes(df, "doc_id", "payload", blocks = 8, minMatch = 6)
      .as[(Long, Long)].collect().toSet
    pairs shouldBe Set((1L, 2L))
    val kept = MediaDedup.keepNearCanonical(df, "doc_id", "payload",
      blocks = 8, minMatch = 6)
    ids(kept) shouldBe Seq(1L, 3L, 4L)
  }

  it("the transitive closure merges chains: A~B and B~C collapse to " +
     "min(A) even when A and C differ in too many blocks directly") {
    val df = frame(
      (10L, blocksOf("c", diff = Set(0, 1)), "left"),
      (11L, blocksOf("c"), "mid"),
      (12L, blocksOf("c", diff = Set(6, 7), salt = "y"), "right"))
    // 10~11 share 6, 11~12 share 6, 10~12 share only 4
    val pairs = MediaDedup
      .nearDupPairsBytes(df, "doc_id", "payload", blocks = 8, minMatch = 6)
      .as[(Long, Long)].collect().toSet
    pairs shouldBe Set((10L, 11L), (11L, 12L))
    ids(MediaDedup.keepNearCanonical(df, "doc_id", "payload",
      blocks = 8, minMatch = 6)) shouldBe Seq(10L)
  }

  it("the bucket cap drops degenerate shared blocks: a block value " +
     "shared corpus-wide cannot mint pairs past maxBucket") {
    // 12 payloads share every block (all byte-identical) -> with
    // maxBucket = 8 every bucket is over-cap and NO pair survives
    val df = frame((1L to 12L).map(i => (i, blocksOf("z"), s"d$i")): _*)
    MediaDedup.nearDupPairsBytes(df, "doc_id", "payload",
      blocks = 8, minMatch = 6, maxBucket = 8).count() shouldBe 0L
    // at cap 100 they all pair up and collapse to the min id
    ids(MediaDedup.keepNearCanonical(df, "doc_id", "payload",
      blocks = 8, minMatch = 6, maxBucket = 100)) shouldBe Seq(1L)
  }

  it("payload bytes never ride a shuffle: every exchange in both keep " +
     "plans carries digests/ids only (no BinaryType column)") {
    val df = frame(
      (1L to 40L).map(i => (i, blocksOf((i % 5).toString), s"d$i")): _*)
      .localCheckpoint(true)
    def binaryExchanges(out: DataFrame): Int = {
      out.collect()
      val exs = graft.plans.PlanWalk
        .collectAll(out.queryExecution.executedPlan) {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
            e.child.output.map(a => (a.name, a.dataType))
        }
      exs.filter(_.exists(_._2 == BinaryType)).foreach(e =>
        info(s"binary exchange: ${e.map(x => x._1 + ":" + x._2.simpleString).mkString(", ")}"))
      exs.count(_.exists(_._2 == BinaryType))
    }
    binaryExchanges(
      MediaDedup.exactByPayload(df, "payload", "doc_id")) shouldBe 0
    binaryExchanges(MediaDedup.keepNearCanonical(df, "doc_id", "payload",
      blocks = 8, minMatch = 6)) shouldBe 0
  }

  it("the declared stage: mode defaults to exact, near wires the knobs, " +
     "and the parser refuses bad configs by name") {
    def cfg(stage: String): graft.plan.CurationConfig.PipelineDef =
      graft.plan.CurationConfig.parse(
        s"""{"table": "documents", "id": "doc_id", "text": "tag",
          | "stages": [$stage]}""".stripMargin)
    val df = frame(
      (3L, blocksOf("a"), "x"), (8L, blocksOf("a"), "y"),
      (4L, blocksOf("b", diff = Set(7)), "z"), (6L, blocksOf("b"), "w"))
    ids(cfg("""{"stage": "media_dedup", "binary": "payload"}""")
      .stages.head.apply(df, "doc_id", "tag", None)) shouldBe
      Seq(3L, 4L, 6L)
    ids(cfg("""{"stage": "media_dedup", "mode": "near",
        | "binary": "payload", "blocks": 8, "minMatch": 6}""".stripMargin)
      .stages.head.apply(df, "doc_id", "tag", None)) shouldBe Seq(3L, 4L)
    for ((bad, msg) <- Seq(
        ("""{"stage": "media_dedup"}""", "binary"),
        ("""{"stage": "media_dedup", "binary": "payload",
           | "mode": "fuzzy"}""".stripMargin, "unknown mode"),
        ("""{"stage": "media_dedup", "binary": "payload",
           | "blocks": 1}""".stripMargin, "blocks"),
        ("""{"stage": "media_dedup", "binary": "payload",
           | "minMatch": 9}""".stripMargin, "minMatch"),
        ("""{"stage": "media_dedup", "binary": "payload",
           | "maxBucket": 1}""".stripMargin, "maxBucket"),
        ("""{"stage": "media_dedup", "binary": "payload",
           | "zeros": 9}""".stripMargin, "zeros")))
      intercept[IllegalArgumentException] { cfg(bad) }
        .getMessage should include(msg)
    // a frame without the declared binary column is refused by name
    intercept[IllegalArgumentException] {
      cfg("""{"stage": "media_dedup", "binary": "nope"}""")
        .stages.head.apply(df, "doc_id", "tag", None)
    }.getMessage should include("nope")
  }

  it("content-defined chunking pairs a one-byte-INSERTION variant the " +
     "blocked signature provably misses (the length fence shifts every " +
     "block), and boundaries re-synchronize after the edit") {
    // high-entropy content: the boundary condition is content-defined,
    // so a low-entropy body (repeated padding) has few distinct windows
    // and may legitimately produce one whole-body chunk
    def entropic(seed: Int): String =
      new scala.util.Random(seed).alphanumeric.take(256).mkString
    val base = entropic(42)
    val df = Seq(
      (1L, base),             // the original
      (2L, "X" + base),       // one byte inserted at the front
      (3L, entropic(7)))
      .toDF("doc_id", "s")
      .select(col("doc_id"), col("s").cast("binary").as("payload"))
    // the blocked form: different lengths -> no bucket ever pairs them
    MediaDedup.nearDupPairsBytes(df, "doc_id", "payload",
      blocks = 8, minMatch = 6).count() shouldBe 0L
    // CDC: the insertion perturbs only the first chunk; every chunk
    // after the first content-defined cut is byte-identical
    val pairs = MediaDedup.nearDupPairsCdc(df, "doc_id", "payload",
      window = 4, minShared = 3)
      .as[(Long, Long)].collect().toSet
    pairs shouldBe Set((1L, 2L))
    // shared chunks are the EXPECTED overlap: all of doc 1's chunks
    // except (at most) the one containing the insertion point
    val c1 = MediaDedup.cdcChunkRows(df.filter($"doc_id" === 1L),
      "doc_id", "payload").select("ch").as[String].collect().toSet
    val c2 = MediaDedup.cdcChunkRows(df.filter($"doc_id" === 2L),
      "doc_id", "payload").select("ch").as[String].collect().toSet
    (c1 intersect c2).size should be >= (c1.size - 1)
    // the canonical keep collapses the insertion pair to the min id
    ids(MediaDedup.keepNearCanonicalCdc(df, "doc_id", "payload",
      window = 4, minShared = 3)) shouldBe Seq(1L, 3L)
    // sub-window and null payloads: whole-body chunk / no identity
    val tiny = Seq((7L, "ab"), (8L, "ab"), (9L, "cd"))
      .toDF("doc_id", "s")
      .select(col("doc_id"), col("s").cast("binary").as("payload"))
    MediaDedup.cdcChunkRows(tiny, "doc_id", "payload", window = 4)
      .count() shouldBe 3L
    ids(MediaDedup.keepNearCanonicalCdc(tiny, "doc_id", "payload",
      window = 4, minShared = 1)) shouldBe Seq(7L, 9L)
  }

  it("null payloads carry NO identity and always survive BOTH modes — " +
     "the family contract the stored gates already honor (two null " +
     "payloads are not duplicates of each other)") {
    val df = frame(
      (1L, blocksOf("a"), "dup"), (2L, blocksOf("a"), "dup"),
      (5L, blocksOf("b"), "solo"))
      .union(frame((3L, blocksOf("x"), "null-1"),
        (4L, blocksOf("y"), "null-2"))
        .withColumn("payload", lit(null).cast(BinaryType)))
    // exact: the two nulls must NOT collapse into one
    ids(MediaDedup.exactByPayload(df, "payload", "doc_id")) shouldBe
      Seq(1L, 3L, 4L, 5L)
    // near: nulls emit no signature rows, so they can never pair
    ids(MediaDedup.keepNearCanonical(df, "doc_id", "payload",
      blocks = 8, minMatch = 6)) shouldBe Seq(1L, 3L, 4L, 5L)
  }
}
