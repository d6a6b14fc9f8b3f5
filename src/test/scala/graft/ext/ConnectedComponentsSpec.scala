package graft.ext

import graft.GraftSpec

/** Min-label propagation: components, chains, determinism. */
class ConnectedComponentsSpec extends GraftSpec {
  import spark.implicits._

  private def componentsOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.run(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  it("labels two separate components independently") {
    val got = componentsOf(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    got shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L)
  }

  it("propagates along a chain longer than one round") {
    // 9-8-7-...-1: min label must travel the whole diameter
    val chain = (1L until 9L).map(i => (i + 1, i))
    val got = componentsOf(chain)
    got.values.toSet shouldBe Set(1L)
    got.keySet shouldBe (1L to 9L).toSet
  }

  it("handles cycles and duplicate/reversed edges") {
    val got = componentsOf(Seq((5L, 6L), (6L, 7L), (7L, 5L), (5L, 6L), (6L, 5L)))
    got shouldBe Map(5L -> 5L, 6L -> 5L, 7L -> 5L)
  }

  it("clusters the minhash near-dup graph into plausible groups") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = MinHashLSH.nearDupPairs(docs, "doc_id", "text", 16, 4, 0.8)
    val comps = ConnectedComponents.run(pairs, "doc_a", "doc_b")
    // every vertex of every pair got a component; component id is a member
    val ids = pairs.select("doc_a").union(pairs.select("doc_b"))
      .distinct().as[Long].collect().toSet
    val got = comps.as[(Long, Long)].collect().toMap
    got.keySet shouldBe ids
    got.values.toSet.subsetOf(ids) shouldBe true
    // each component's label is its minimum member
    got.groupBy(_._2).foreach { case (label, members) =>
      label shouldBe members.keys.min
    }
  }
}
