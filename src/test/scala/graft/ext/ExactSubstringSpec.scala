package graft.ext

import org.apache.spark.sql.functions._

import graft.GraftSpec

/** Exact substring dedup (Lee et al. ExactSubstr semantics): duplicated
  * k-token windows, merged to maximal per-document spans.
  */
class ExactSubstringSpec extends GraftSpec {
  import spark.implicits._

  private val k = 4

  private def spans(docs: Seq[(Long, String)]) =
    ExactSubstring.duplicatedSpans(
      docs.toDF("doc_id", "text"), "doc_id", "text", k)
      .orderBy("doc_id", "span_start")
      .select($"doc_id", $"span_start", $"n_tokens")
      .as[(Long, Long, Long)].collect().toSeq

  it("localizes a shared passage as one maximal span in BOTH documents") {
    val passage = "one two three four five six" // 6 tokens: 3 dup windows
    val result = spans(Seq(
      (1L, s"alpha beta $passage gamma delta"),
      (2L, s"x $passage y z w")))
    // doc 1: passage at tokens 3..8; doc 2: at tokens 2..7 — every
    // overlapping duplicated window merges into ONE span per doc
    result shouldBe Seq((1L, 3L, 6L), (2L, 2L, 6L))
  }

  it("flags within-document verbatim repetition (count>1, not distinct " +
     "docs) and keeps disjoint repeats as separate spans") {
    val run = "p q r s" // exactly k tokens, repeated twice in one doc
    val result = spans(Seq((7L, s"$run a b c d e $run")))
    result shouldBe Seq((7L, 1L, 4L), (7L, 10L, 4L))
  }

  it("merges ADJACENT (touching) duplicated windows into one span") {
    // doc 3 shares tokens 1..4 with doc 1 and tokens 5..8 with doc 2:
    // two duplicated windows at pos 1 and 5 touch (5 <= 1 + k) -> merged
    val result = spans(Seq(
      (1L, "a b c d zz1 zz2 zz3"),
      (2L, "e f g h yy1 yy2 yy3"),
      (3L, "a b c d e f g h")))
    result.filter(_._1 == 3L) shouldBe Seq((3L, 1L, 8L))
  }

  it("emits nothing for unique text or sub-k documents") {
    spans(Seq(
      (1L, "all tokens here are entirely unique in this corpus"),
      (2L, "tiny doc"))) shouldBe Seq.empty
  }

  it("span_md5 is the digest of the space-joined span content") {
    val passage = "m n o p q" // 5 tokens
    val df = ExactSubstring.duplicatedSpans(
      Seq((1L, s"$passage tail1"), (2L, s"head1 $passage")).toDF("doc_id", "text"),
      "doc_id", "text", k)
    val md5s = df.select($"span_md5").distinct().as[String].collect()
    md5s should have length 1
    md5s.head shouldBe java.security.MessageDigest.getInstance("MD5")
      .digest(passage.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  it("removeSpans deletes exactly the span tokens and keeps the unique " +
     "remainder — full docs pass through, fully-covered docs empty out") {
    val passage = "one two three four five six"
    val cleaned = ExactSubstring.removeSpans(
      Seq(
        (1L, s"alpha beta $passage gamma delta"),
        (2L, s"x $passage y z w"),
        (3L, "a wholly unique document body here"),
        (4L, passage), (5L, passage)) // identical docs: fully covered
        .toDF("doc_id", "text"), "doc_id", "text", k)
      .orderBy("doc_id")
      .select($"doc_id", $"kept_tokens", $"removed_tokens", $"clean_md5")
      .as[(Long, Long, Long, String)].collect().toSeq
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    cleaned shouldBe Seq(
      (1L, 4L, 6L, m("alpha beta gamma delta")),
      (2L, 4L, 6L, m("x y z w")),
      (3L, 6L, 0L, m("a wholly unique document body here")),
      (4L, 0L, 6L, m("")), (5L, 0L, 6L, m("")))
  }

  it("dupWindowReport counts a batch doc's windows already in history — " +
     "verbatim replays all-dup, fresh text zero, short docs zero windows") {
    val passage = "h1 h2 h3 h4 h5 h6 h7 h8 h9"   // 9 tokens -> 6 windows at k=4
    val history = Seq((1L, passage), (2L, "other hist words entirely here"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, passage),                       // verbatim replay: 6/6 dup
      (11L, s"fresh unique words $passage"), // tail replay: 6 of 9 dup
      (12L, "wholly novel content with no history overlap at all"),
      (13L, "tiny"))                        // < k tokens: 0 windows
      .toDF("doc_id", "text")
    val got = ExactSubstring
      .dupWindowReport(batch, history, "doc_id", "text", k)
      .orderBy("doc_id")
      .select($"doc_id", $"n_windows", $"n_dup_windows")
      .as[(Long, Long, Long)].collect().toSeq
    got shouldBe Seq((10L, 6L, 6L), (11L, 9L, 6L), (12L, 6L, 0L),
      (13L, 0L, 0L))
  }

  it("dupWindowReport instrumentation is conf-gated: stats populate only " +
     "under the harness conf, and the result is identical either way") {
    val history = Seq((1L, "p1 p2 p3 p4 p5 p6")).toDF("doc_id", "text")
    val batch = Seq((10L, "p1 p2 p3 p4 p5 p6 novel1 novel2 novel3 novel4"))
      .toDF("doc_id", "text")
    def run() = ExactSubstring
      .dupWindowReport(batch, history, "doc_id", "text", k)
      .select($"doc_id", $"n_windows", $"n_dup_windows")
      .as[(Long, Long, Long)].collect().toSeq
    ExactSubstring.lastGateStats = None
    val plain = run()
    ExactSubstring.lastGateStats shouldBe None // no stats without the conf
    spark.conf.set("spark.graft.exsub.instrument", "true")
    try {
      run() shouldBe plain
      val st = ExactSubstring.lastGateStats.get
      st.batchWindows shouldBe 7L // 10 tokens, k=4
      st.dupWindows shouldBe 3L   // the 3 all-history windows of p1..p6
      st.bloomPassed should be >= st.dupWindows
      st.bloomPassed should be <= st.batchWindows
    } finally spark.conf.unset("spark.graft.exsub.instrument")
  }

  it("the family tokenizes the corpus exactly ONCE per call: with the " +
     "token frame cached, no split expression survives above the cache " +
     "and both consumers read it") {
    import org.apache.spark.sql.catalyst.expressions.StringSplit
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e x"))
      .toDF("doc_id", "text")
    val toks = ExactSubstring.tokenizeFor(docs, "doc_id", "text")
    toks.persist()
    try {
      val plan = ExactSubstring.spansPlanOver(toks, "doc_id", k)
      plan.collect() // settle AQE so the walked plan is the executed one
      val exec = plan.queryExecution.executedPlan
      // every tokenization consumer is an in-memory scan of the ONE
      // cached frame...
      val caches = graft.plans.PlanWalk.collectAll(exec) {
        case s: InMemoryTableScanExec => s
      }
      caches.length should be >= 2
      // ...and no node above the cache re-splits the corpus
      val splitsAbove = graft.plans.PlanWalk.collectAll(exec) {
        case p if !p.isInstanceOf[InMemoryTableScanExec] =>
          p.expressions.flatMap(_.collect { case s: StringSplit => s }).length
      }.sum
      splitsAbove shouldBe 0
      // the single split lives in the cached build plan
      val inCache = graft.plans.PlanWalk
        .collectAll(caches.head.relation.cachedPlan) {
          case p => p.expressions
            .flatMap(_.collect { case s: StringSplit => s }).length
        }.sum
      inCache shouldBe 1
    } finally { toks.unpersist(); () }
  }

  it("hot-digest broadcast split is result-invariant: capped (cap below " +
     "the boilerplate count) equals uncapped on a dense shared-block corpus") {
    // every doc shares one boilerplate block -> its windows' digests have
    // occurrence count = numDocs, far above a cap of 2
    val block = "copy right footer text shared by all documents here"
    val docs = (1L to 40L).map(i => (i, s"unique$i words before $block and unique tail $i"))
    def run() = spans(docs)
    val uncapped = run()
    spark.conf.set("spark.graft.exsub.hotDigestCap", "2")
    val capped = try run() finally spark.conf.unset("spark.graft.exsub.hotDigestCap")
    capped shouldBe uncapped
    capped.length should be >= 40
  }

  it("hotDigestCap conf is strict-parsed: junk and sub-2 values fail loudly") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d e")).toDF("doc_id", "text")
    for (bad <- Seq("nope", "1", "0", "-5")) {
      spark.conf.set("spark.graft.exsub.hotDigestCap", bad)
      try {
        an[Exception] should be thrownBy
          ExactSubstring.duplicatedSpans(docs, "doc_id", "text", k).count()
      } finally spark.conf.unset("spark.graft.exsub.hotDigestCap")
    }
  }

  it("removalReport accounts removed vs total tokens per affected doc") {
    val passage = "one two three four five six"
    val rep = ExactSubstring.removalReport(
      Seq((1L, s"alpha beta $passage gamma delta"), (2L, s"x $passage y z w"))
        .toDF("doc_id", "text"), "doc_id", "text", k)
      .orderBy("doc_id")
      .select($"doc_id", $"n_spans", $"removed_tokens", $"total_tokens")
      .as[(Long, Long, Long, Long)].collect().toSeq
    rep shouldBe Seq((1L, 1L, 6L, 10L), (2L, 1L, 6L, 10L))
  }
}
