package graft.ext

import org.apache.spark.sql.functions._

import graft.GraftSpec

/** BPE merge learning: textbook Sennrich et al. behavior on constructed
  * corpora, and the trained vocab driving the dq89 inference kernel.
  */
class BpeTrainSpec extends GraftSpec {
  import spark.implicits._

  private def learn(texts: Seq[String], n: Int) =
    BpeTrain.learn(texts.map(Tuple1(_)).toDF("text"), "text", n)

  it("learns the classic merge sequence, frequency-weighted across words") {
    // "low" x5, "lower" x2: pair (l,o) count 7 ties (o,w) 7 — broken
    // lexicographically to (l,o); then (lo,w) 7; then (low,e) 2 ties
    // (e,r) 2 -> "e" < "low" wins
    val m = learn(Seq("low low low low low", "lower lower"), 3).merges
    m.map(x => (x.step, x.left, x.right, x.pairCount)) shouldBe Seq(
      (1, "l", "o", 7L), (2, "lo", "w", 7L), (3, "e", "r", 2L))
  }

  it("merges greedily left-to-right within overlapping candidate runs") {
    // "aaaa": pair (a,a) occurs 3 times overlapping; greedy takes
    // positions 1-2 and 3-4 -> count 3 reported, state becomes [aa, aa],
    // so merge 2 is (aa, aa) with count 1
    val m = learn(Seq("aaaa"), 2).merges
    m.map(x => (x.left, x.right, x.pairCount)) shouldBe Seq(
      ("a", "a", 3L), ("aa", "aa", 1L))
  }

  it("stops when the pair space drains instead of looping") {
    val m = learn(Seq("ab ab cd"), 10).merges
    // after (a,b) then (c,d), every word is one symbol: no 3rd merge
    m should have length 2
  }

  private def learnBatched(texts: Seq[String], n: Int, lookahead: Int = 64,
      maxPullSymbols: Long = 4000000L) =
    BpeTrain.learnBatched(texts.map(Tuple1(_)).toDF("text"), "text", n,
      lookahead, maxPullSymbols)

  it("batched training emits the exact sequential merge table on the " +
     "documents corpus, with >= 10 merges amortized per round") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = 24
    val seq = BpeTrain.learn(docs, "text", n)
    val bat = BpeTrain.learnBatched(docs, "text", n)
    bat.model.merges shouldBe seq.merges
    bat.model.alphabet shouldBe seq.alphabet
    bat.roundSizes.sum shouldBe bat.model.merges.length
    withClue(s"roundSizes=${bat.roundSizes}: ") {
      n.toDouble / bat.roundSizes.length should be >= 10.0
    }
  }

  it("the distributed fallback tier is ALSO sequential-exact on the " +
     "documents corpus (pull refused -> trigram-guarded prefix rounds)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = 12
    val seq = BpeTrain.learn(docs, "text", n)
    val bat = BpeTrain.learnBatched(docs, "text", n, maxPullSymbols = 0L)
    bat.model.merges shouldBe seq.merges
  }

  it("the created-pair guard stops a fallback batch that naive top-N " +
     "batching would get wrong (a pair born from merge 1 outranks old " +
     "candidate 2)") {
    // pairs: (a,b)=10, (z,a)=5, (q,r)=4. Sequential: (a,b) creates
    // (z,ab)=5 which OUTRANKS (q,r)=4 -> merges are (a,b),(z,ab),(q,r).
    // A naive batch of symbol-disjoint top pairs would emit (a,b),(q,r).
    val corpus = Seq.fill(5)("ab").mkString(" ") + " " +
      Seq.fill(5)("zab").mkString(" ") + " " + Seq.fill(4)("qr").mkString(" ")
    val seq = learn(Seq(corpus), 3)
    seq.merges.map(m => (m.left, m.right, m.pairCount)) shouldBe Seq(
      ("a", "b", 10L), ("z", "ab", 5L), ("q", "r", 4L))
    // both tiers agree with sequential
    learnBatched(Seq(corpus), 3).model.merges shouldBe seq.merges
    learnBatched(Seq(corpus), 3, maxPullSymbols = 0L)
      .model.merges shouldBe seq.merges
  }

  it("a fallback round safely takes count-separated independent pairs " +
     "and stops at the first count-shifted one") {
    // (a,b)=10 then (q,r)=9 batch together (trig bound for (a,b) is
    // (z,a,b)=5 < 9); (z,a)=5 shares a's adjacency -> next round
    val corpus = Seq.fill(5)("ab").mkString(" ") + " " +
      Seq.fill(5)("zab").mkString(" ") + " " + Seq.fill(9)("qr").mkString(" ")
    val bat = learnBatched(Seq(corpus), 3, maxPullSymbols = 0L)
    bat.model.merges.map(m => (m.left, m.right, m.pairCount)) shouldBe Seq(
      ("a", "b", 10L), ("q", "r", 9L), ("z", "ab", 5L))
    bat.roundSizes shouldBe Seq(2, 1)
  }

  it("the simulated tier chains merges born inside the round and clears " +
     "them in one round when the candidate list is complete") {
    val corpus = Seq.fill(5)("ab").mkString(" ") + " " +
      Seq.fill(5)("zab").mkString(" ") + " " + Seq.fill(4)("qr").mkString(" ")
    val bat = learnBatched(Seq(corpus), 3)
    // 3 pairs exist, lookahead 64 > 3 -> complete list, no floor: one
    // round simulates all three merges including the chained (z,ab)
    bat.roundSizes shouldBe Seq(3)
  }

  it("the lookahead floor ends a simulated round before the argmax could " +
     "be beaten by an un-pulled pair, and the next round continues exactly") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = 12
    val seq = BpeTrain.learn(docs, "text", n)
    // lookahead 4: tiny pull horizon forces several rounds; still exact
    val bat = BpeTrain.learnBatched(docs, "text", n, lookahead = 4)
    bat.model.merges shouldBe seq.merges
    bat.roundSizes.length should be > 1
  }

  it("batched application keeps the greedy left-to-right overlap rule " +
     "in both tiers") {
    val seq = learn(Seq("aaaa aaaa"), 2).merges
    learnBatched(Seq("aaaa aaaa"), 2).model.merges shouldBe seq
    learnBatched(Seq("aaaa aaaa"), 2, maxPullSymbols = 0L)
      .model.merges shouldBe seq
  }

  it("vocab = alphabet plus merge products, and the dq89 kernel " +
     "tokenizes with it (training feeding inference)") {
    val model = learn(Seq("low low low low low", "lower lower"), 3)
    model.alphabet.sorted shouldBe Seq("e", "l", "o", "r", "w")
    model.vocab should contain allOf ("lo", "low", "er")
    val toks = Seq(Tuple1("low lower"))
      .toDF("text")
      .select(graft.functions.SubwordTokenize(
        regexp_replace(lower(col("text")), "\\W+", " "), model.vocab).as("t"))
      .as[Seq[String]].head()
    // greedy longest over the trained vocab: low | low + er
    toks shouldBe Seq("low", "low", "er")
    toks.foreach(t => model.vocab should contain(t))
  }
}
