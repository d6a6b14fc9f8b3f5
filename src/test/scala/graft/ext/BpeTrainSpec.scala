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
