package graft.plan

import graft.GraftSpec

/** O1 (SURVEY §2.6): the runner's id-first/metadata-last ordering
  * (Main.scala:148-168) and the lexicographic default.
  */
class FieldOrderingSpec extends GraftSpec {

  it("default is lexicographic") {
    List("b", "a", "c").sorted(FieldOrdering.Lexicographic) shouldBe List("a", "b", "c")
  }

  describe("idFirst (Main.scala:148-168)") {
    val ord = FieldOrdering.idFirst(List("campaign_id", "criterion_id"))

    it("named ids first in the given priority, then other *_id, then rest, metadata last") {
      List("metadata", "zebra", "ad_group_id", "criterion_id", "alpha", "campaign_id")
        .sorted(ord) shouldBe
        List("campaign_id", "criterion_id", "ad_group_id", "alpha", "zebra", "metadata")
    }
    it("lexicographic tiebreak within each class") {
      List("x_id", "a_id").sorted(ord) shouldBe List("a_id", "x_id")
      List("b", "a").sorted(ord) shouldBe List("a", "b")
    }
  }
}
