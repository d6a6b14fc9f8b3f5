package graft

/** The driver's smoke gate: the flagship entry query must return rows. */
class EntrySpec extends GraftSpec {

  it("entry() returns rows with the id-first/metadata-last shape") {
    val df = SparkEntry.entry(spark)
    df.count() should be > 0L
    val cols = df.columns.toSeq
    cols.take(2) shouldBe Seq("order_id", "customer_id")
    cols.last shouldBe "metadata"
    cols should contain("info")
  }
}
