package graft.ext

import org.apache.spark.sql.functions._

import graft.GraftSpec
import graft.functions.VectorFunctions

/** EXT operators (SURVEY §2.10 U3): dedup, text analysis, vector math. */
class ExtSpec extends GraftSpec {
  import spark.implicits._

  describe("Dedup.keepFirst") {
    it("keeps the min-order row per key group, deterministically") {
      val df = Seq((3L, "u1", "click"), (1L, "u1", "click"), (2L, "u2", "view"))
        .toDF("event_id", "user_id", "event_type")
      val out = Dedup.keepFirst(df, Seq("user_id", "event_type"), col("event_id"))
      out.select("event_id").as[Long].collect().sorted shouldBe Array(1L, 2L)
      out.columns should not contain "__rn"
    }
  }

  describe("Dedup.keepFirstSalted") {
    it("agrees with keepFirst on a skewed key") {
      val rows = (1L to 500L).map(i => (i, "hot", "click")) ++
        Seq((600L, "cold", "view"))
      val df = rows.toDF("event_id", "user_id", "event_type")
      val a = Dedup.keepFirst(df, Seq("user_id", "event_type"), col("event_id"))
        .select("event_id").as[Long].collect().sorted
      val b = Dedup.keepFirstSalted(df, Seq("user_id", "event_type"), col("event_id"), 8)
        .select("event_id").as[Long].collect().sorted
      b shouldBe a
      b shouldBe Array(1L, 600L)
    }
  }

  describe("Dedup.exactByContent") {
    it("dedups by content hash keeping the smallest id") {
      val df = Seq((10L, "same text"), (2L, "same text"), (3L, "other"))
        .toDF("id", "text")
      Dedup.exactByContent(df, "text", "id")
        .select("id").as[Long].collect().sorted shouldBe Array(2L, 3L)
    }
  }

  describe("TextAnalysis") {
    it("tokens: lowercase word split, empties dropped") {
      Seq("Hello, World! 42").toDF("t")
        .select(TextAnalysis.tokens($"t")).as[Seq[String]]
        .head() shouldBe Seq("hello", "world", "42")
    }
    it("tokenCount") {
      Seq("a b  c").toDF("t").select(TextAnalysis.tokenCount($"t")).as[Int].head() shouldBe 3
    }
    it("repetitionRatio: top-bigram fraction; <2-token docs drop") {
      val df = Seq(
        (1L, "a b a b a b"),   // bigrams: ab,ba,ab,ba,ab → 3/5
        (2L, "w x y z"),       // wx,xy,yz all unique → 1/3
        (3L, "single")         // no bigrams → dropped
      ).toDF("doc_id", "text")
      TextAnalysis.repetitionRatio(df, "doc_id", "text")
        .orderBy("doc_id").as[(Long, Double)].collect() shouldBe
        Array((1L, 3d / 5d), (2L, 1d / 3d))
    }
    it("topNgramFraction: n=2 equals repetitionRatio; wider grams drop short docs") {
      val df = Seq((1L, "a b a b a b"), (2L, "x y z")).toDF("doc_id", "text")
      val r2 = TextAnalysis.repetitionRatio(df, "doc_id", "text")
        .orderBy("doc_id").as[(Long, Double)].collect()
      val g2 = TextAnalysis.topNgramFraction(df, "doc_id", "text", 2)
        .orderBy("doc_id").as[(Long, Double)].collect()
      g2 shouldBe r2
      // doc 1 trigrams: aba, bab, aba, bab → 2/4; doc 2: one trigram → 1/1
      TextAnalysis.topNgramFraction(df, "doc_id", "text", 3).orderBy("doc_id")
        .as[(Long, Double)].collect() shouldBe Array((1L, 0.5), (2L, 1.0))
      // n=4: doc 2 (3 tokens) has no 4-grams and drops out
      TextAnalysis.topNgramFraction(df, "doc_id", "text", 4).orderBy("doc_id")
        .as[(Long, Double)].collect().map(_._1) shouldBe Array(1L)
    }
    it("duplicateLineStats: Gopher dup-line and dup-char fractions") {
      val df = Seq(
        (1L, "abc\nde\nabc\nabc\nxy"), // 5 lines, 3 distinct; dups: 2×"abc"=6 chars of 13
        (2L, "one\ntwo\nthree"),       // no duplicates
        (3L, "\n\n"),                  // no non-empty lines → dropped
        (4L, "p\np")                   // 2 lines, 1 distinct → frac 1/2
      ).toDF("doc_id", "text")
      TextAnalysis.duplicateLineStats(df, "doc_id", "text")
        .orderBy("doc_id").as[(Long, Long, Double, Double)].collect() shouldBe Array(
        (1L, 5L, 2d / 5d, 6d / 13d),
        (2L, 3L, 0d, 0d),
        (4L, 2L, 1d / 2d, 1d / 2d))
    }
    it("duplicateLineStats: paragraph mode via the delimiter regex") {
      val df = Seq((1L, "para one\n\npara two\n\npara one")).toDF("doc_id", "text")
      TextAnalysis.duplicateLineStats(df, "doc_id", "text", delimRegex = "\n{2,}")
        .as[(Long, Long, Double, Double)].head() shouldBe
        ((1L, 3L, 1d / 3d, 8d / 24d))
    }
    it("removeBoilerplateLines drops corpus-frequent lines, preserves order") {
      val df = Seq(
        (1L, "common\nunique1"),
        (2L, "a\ncommon\nb"),        // order check: survivors keep position
        (3L, "common"),              // all-boilerplate → empty, not dropped
        (4L, "rare\nunique4"),
        (5L, "x\nx\nx"),             // within-doc repeats don't inflate df
        (6L, "unique6"),
        (7L, "unique7")
      ).toDF("doc_id", "text")
      // "common" in 3/7 docs = 0.43 > 0.3 → boilerplate; everything else ≤ 1/7
      val out = TextAnalysis.removeBoilerplateLines(df, "doc_id", "text",
        maxDocFrac = 0.3)
        .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
      out shouldBe Array(
        (1L, "unique1", 1L, 1L),
        (2L, "a\nb", 2L, 1L),
        (3L, "", 0L, 1L),
        (4L, "rare\nunique4", 2L, 0L),
        (5L, "x\nx\nx", 3L, 0L),
        (6L, "unique6", 1L, 0L),
        (7L, "unique7", 1L, 0L))
    }
    it("removeBoilerplateLines with no frequent line is the identity (empty " +
        "boilerplate set path)") {
      val df = Seq((1L, "a\nb"), (2L, "c\nd")).toDF("doc_id", "text")
      TextAnalysis.removeBoilerplateLines(df, "doc_id", "text", maxDocFrac = 0.99)
        .orderBy("doc_id").as[(Long, String, Long, Long)].collect() shouldBe
        Array((1L, "a\nb", 2L, 0L), (2L, "c\nd", 2L, 0L))
    }
    it("packedCharShingles preserves set cardinalities vs charShingles") {
      val df = Seq(("abcdefgab", "abcdefgXY")).toDF("x", "y")
      val (ns, np) = df.select(
        org.apache.spark.sql.functions.size(TextAnalysis.charShingles($"x", 4)),
        org.apache.spark.sql.functions.size(TextAnalysis.packedCharShingles($"x", 4)))
        .as[(Int, Int)].head()
      np shouldBe ns
      // identical 4-gram → identical packed code across documents
      val inter = df.select(graft.functions.SortedIntersectSize(
        sort_array(TextAnalysis.packedCharShingles($"x", 4)),
        sort_array(TextAnalysis.packedCharShingles($"y", 4)))).as[Int].head()
      inter shouldBe 4 // abcd, bcde, cdef, defg shared
    }
    it("fingerprint is whitespace/case-canonical") {
      val df = Seq(("A  b\tC", "a b c")).toDF("x", "y")
      df.select(TextAnalysis.fingerprint($"x") === TextAnalysis.fingerprint($"y"))
        .as[Boolean].head() shouldBe true
    }
    it("redactPii scrubs emails and structured phones, leaves clean text alone") {
      val df = Seq(
        "reach me at jane.doe+spam@sub.example.co.uk or +49-123-4567 now",
        "no pii here, just 12345 and a.b notation"
      ).toDF("t")
      val red = df.select(TextAnalysis.redactPii($"t").as("r")).as[String].collect()
      red(0) shouldBe "reach me at <EMAIL> or <PHONE> now"
      red(1) shouldBe "no pii here, just 12345 and a.b notation"
      val (ne, np) = TextAnalysis.piiCounts($"t")
      df.select(ne, np).as[(Int, Int)].collect().toSeq shouldBe Seq((1, 1), (0, 0))
    }
    it("languageId picks the dominant stopword language, 'und' when none") {
      Seq("the cat and the dog in the house").toDF("t")
        .select(TextAnalysis.languageId($"t")).as[String].head() shouldBe "en"
      Seq("der Hund und die Katze ist nicht hier").toDF("t")
        .select(TextAnalysis.languageId($"t")).as[String].head() shouldBe "de"
      Seq("zzz qqq xxx").toDF("t")
        .select(TextAnalysis.languageId($"t")).as[String].head() shouldBe "und"
    }
    it("chunks: empty and null documents produce zero chunks (oracle range semantics)") {
      val df = Seq((1L, "abcdef"), (2L, ""), (3L, null.asInstanceOf[String]))
        .toDF("doc_id", "text")
      val got = TextAnalysis.chunks(df, "doc_id", "text", size = 4, stride = 3)
        .as[(Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
      got shouldBe Seq((1L, 0L, "abcd"), (1L, 1L, "def"))
    }
    it("topTfIdfTerm picks the rarest-weighted term with deterministic ties") {
      val df = Seq(
        (1L, "common rare common"),  // tf(common)=2 df=2 N=2 → 2; tf(rare)=1 df=1 → 2; tie → 'common' (asc)
        (2L, "common unique")        // unique: 1*2/1=2 beats common 1*2/2=1
      ).toDF("doc_id", "text")
      val got = TextAnalysis.topTfIdfTerm(df, "doc_id", "text")
        .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
      got shouldBe Seq((1L, "common", 2.0), (2L, "unique", 2.0))
    }
    it("qualityColumns are bounded and deterministic") {
      val cols = TextAnalysis.qualityColumns($"t").map { case (n, c) => c.as(n) }
      val r = Seq("The quick brown fox jumps over the lazy dog.").toDF("t")
        .select(cols: _*).head()
      r.getAs[Double]("n_tokens") shouldBe 9d
      val score = r.getAs[Double]("quality_score")
      score should (be >= 0d and be <= 1d)
    }
  }

  describe("Bm25.topK") {
    // the exact per-term arithmetic of Bm25.topK (same IEEE ops, same
    // order), pinned here so any formula drift breaks loudly
    def micro(n: Long, dfT: Long, tf: Long, dl: Long, avgdl: Double): Long =
      math.floor(((n.toDouble - dfT + 0.5) / (dfT + 0.5)) *
        ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))) *
        1000000.0).toLong

    val corpus = Seq(
      (1L, "apple banana apple"),           // dl 3
      (2L, "apple cherry"),                 // dl 2
      (3L, "banana banana banana cherry"),  // dl 4
      (4L, "durian durian")                 // dl 2
    )
    val avgdl = 11.0 / 4 // N = 4

    it("ranks by the rational-idf BM25 micro score; rare terms outweigh " +
        "common, identity hits excluded, non-matching docs absent") {
      val docs = corpus.toDF("doc_id", "text")
      val queries = Seq((1L, "apple"), (1L, "durian"), (100L, "banana"))
        .toDF("qid", "term")
      val out = Bm25.topK(docs, "doc_id", "text", queries, k = 3)
        .orderBy("qid", "rnk").as[(Long, Long, Long, Int)].collect()
      out shouldBe Array(
        // qid 1: doc 1 has apple×2 but IS the query doc → excluded; the
        // single-df durian doc outscores the apple match
        (1L, 4L, micro(4, 1, 2, 2, avgdl), 1),
        (1L, 2L, micro(4, 2, 1, 2, avgdl), 2),
        // qid 100: tf=3 banana doc first; cherry-only doc absent
        (100L, 3L, micro(4, 2, 3, 4, avgdl), 1),
        (100L, 1L, micro(4, 2, 1, 3, avgdl), 2))
    }
    it("k bounds the result per query") {
      val docs = corpus.toDF("doc_id", "text")
      val queries = Seq((1L, "apple"), (1L, "durian")).toDF("qid", "term")
      Bm25.topK(docs, "doc_id", "text", queries, k = 1)
        .select("vid").as[Long].collect() shouldBe Array(4L)
    }
    it("NgramLm.fluencyReport: corpus-trained integer micro-probabilities, " +
        "hand-checked; short docs score 0 over 0 bigrams") {
      val docs = Seq(
        (1L, "a b a b"), // bigrams: "a b"×2, "b a"
        (2L, "a c"),     // "a c"
        (3L, "x")        // no bigrams
      ).toDF("doc_id", "text")
      // model: c("a b")=2 c("b a")=1 c("a c")=1; prefixes: a·=3, b·=1
      // micro: "a b" → 2000000/3 = 666666, "b a" → 1000000, "a c" → 333333
      val out = graft.ext.NgramLm.fluencyReport(docs, "doc_id", "text")
        .orderBy("doc_id").as[(Long, Long, Long, Long)].collect()
      out shouldBe Array(
        (1L, 3L, 666666L + 1000000L + 666666L, 2333332L / 3),
        (2L, 1L, 333333L, 333333L),
        (3L, 0L, 0L, 0L))
    }

    it("Ann.knnClassify: majority vote over the exact k nearest, ties " +
        "toward the smaller label") {
      val vecs = Seq(
        (1L, Seq(1.0f, 0.0f, 0f, 0f), 7),    // the query (label ignored)
        (2L, Seq(0.99f, 0.1f, 0f, 0f), 1),   // nearest
        (3L, Seq(0.98f, 0.15f, 0f, 0f), 2),  // 2nd
        (4L, Seq(0.97f, 0.2f, 0f, 0f), 1),   // 3rd
        (5L, Seq(0f, 1f, 0f, 0f), 2)         // far — outside k=3
      ).toDF("vec_id", "embedding", "label")
      val win = Ann.knnClassify(vecs, "vec_id", "embedding", "label",
        col("vec_id") === 1, k = 3).as[(Long, Int, Long, Double)].collect()
      win.map(r => (r._1, r._2, r._3)) shouldBe Array((1L, 1, 2L)) // 1 beats 2
      // k=2 → one vote each → tie breaks toward label 1
      Ann.knnClassify(vecs, "vec_id", "embedding", "label",
        col("vec_id") === 1, k = 2).as[(Long, Int, Long, Double)].collect()
        .map(r => r._2) shouldBe Array(1)
      // k beyond the candidate count → every non-query vector votes
      val all = Ann.knnClassify(vecs, "vec_id", "embedding", "label",
        col("vec_id") === 1, k = 100).as[(Long, Int, Long, Double)].collect()
      all.map(r => (r._2, r._3)) shouldBe Array((1, 2L)) // 1:{2,4} beats 2:{3,5}
    }

    it("NgramLm.scoreAgainst: cross-corpus model, OOV bigrams count in " +
        "the denominator but contribute 0") {
      val target = Seq((10L, "a b")).toDF("doc_id", "text") // model: P(b|a)=1
      val docs = Seq(
        (1L, "a b a c"), // "a b"=1e6, "b a" OOV, "a c" OOV → mean 333333
        (2L, "x y")      // fully OOV → 0 over 1 bigram
      ).toDF("doc_id", "text")
      graft.ext.NgramLm.scoreAgainst(docs, target, "doc_id", "text")
        .orderBy("doc_id").as[(Long, Long, Long, Long)].collect() shouldBe
        Array((1L, 3L, 1000000L, 333333L), (2L, 1L, 0L, 0L))
    }

    it("hardNegatives removes positives BEFORE ranking so the next " +
        "candidate takes the freed rank") {
      val docs = corpus.toDF("doc_id", "text")
      val queries = Seq((1L, "apple"), (1L, "durian")).toDF("qid", "term")
      // doc 4 is qid 1's top hit (see above); labeling it positive must
      // promote doc 2 to rank 1 — not return an empty/truncated list
      val positives = Seq((1L, 4L)).toDF("qid", "vid")
      Bm25.hardNegatives(docs, "doc_id", "text", queries, positives, k = 1)
        .select("vid", "rnk").as[(Long, Int)].collect() shouldBe Array((2L, 1))
    }
    it("hardNegatives with no positive labels degenerates to topK") {
      val docs = corpus.toDF("doc_id", "text")
      val queries = Seq((1L, "apple"), (100L, "banana")).toDF("qid", "term")
      val none = Seq.empty[(Long, Long)].toDF("qid", "vid")
      Bm25.hardNegatives(docs, "doc_id", "text", queries, none, k = 3)
        .orderBy("qid", "rnk").collect() shouldBe
        Bm25.topK(docs, "doc_id", "text", queries, k = 3)
          .orderBy("qid", "rnk").collect()
    }
  }

  describe("approx_count_distinct (HLL, SURVEY §2.4)") {
    it("is within 5% of exact on real data") {
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      val (approx, exact) = ev.select(
        approx_count_distinct(col("user_id")),
        countDistinct(col("user_id"))).as[(Long, Long)].head()
      math.abs(approx - exact).toDouble / exact should be < 0.05
    }
  }

  describe("approx_percentile (sketch counterpart of dq42's exact percentile)") {
    it("brackets the exact median on real data") {
      val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      val (approx, exact) = li.select(
        expr("approx_percentile(l_quantity, 0.5, 1000)"),
        expr("percentile(l_quantity, 0.5)")).as[(Double, Double)].head()
      // accuracy parameter 1000 → rank error ≤ n/1000; values are 1..50
      math.abs(approx - exact) should be <= 1.0
    }
  }

  describe("VectorFunctions") {
    val df = Seq((Seq(1f, 0f, 0f), Seq(0f, 1f, 0f), Seq(2f, 0f, 0f)))
      .toDF("x", "y", "x2")
    it("dot / l2Norm / cosine") {
      df.select(VectorFunctions.dot($"x", $"x2")).as[Double].head() shouldBe 2d
      df.select(VectorFunctions.l2Norm($"x2")).as[Double].head() shouldBe 2d
      df.select(VectorFunctions.cosine($"x", $"y")).as[Double].head() shouldBe 0d
      df.select(VectorFunctions.cosine($"x", $"x2")).as[Double].head() shouldBe 1d
    }
    it("cosine with a zero vector is null, not NaN") {
      Seq((Seq(0f, 0f), Seq(1f, 1f))).toDF("z", "a")
        .select(VectorFunctions.cosine($"z", $"a").isNull).as[Boolean].head() shouldBe true
    }
    it("l2DistanceSq") {
      df.select(VectorFunctions.l2DistanceSq($"x", $"y")).as[Double].head() shouldBe 2d
    }
  }
}
