package graft.ext

import graft.GraftSpec

/** As-of backward join semantics. */
class AsOfJoinSpec extends GraftSpec {
  import spark.implicits._

  private val clicks = Seq(
    (1L, 10L, 100L), // before any purchase → null
    (2L, 10L, 250L), // after purchase@200 → 5.0
    (3L, 10L, 300L), // tie with purchase@300 → inclusive → 7.0
    (4L, 20L, 500L)  // other user, no purchases → null
  ).toDF("event_id", "user_id", "ts")

  private val purchases = Seq(
    (10L, 200L, 5.0),
    (10L, 300L, 7.0)
  ).toDF("user_id", "ts", "value")

  it("matches the most recent prior-or-equal right row per key") {
    val out = AsOfJoin.backward(clicks, purchases, "user_id", "ts", "ts", "value")
      .select("event_id", "asof_value").as[(Long, Option[Double])]
      .collect().toMap
    out shouldBe Map(1L -> None, 2L -> Some(5.0), 3L -> Some(7.0), 4L -> None)
  }

  it("carries the matched right timestamp") {
    val out = AsOfJoin.backward(clicks, purchases, "user_id", "ts", "ts", "value")
      .select("event_id", "asof_time").as[(Long, Option[Long])]
      .collect().toMap
    out(2L) shouldBe Some(200L)
    out(3L) shouldBe Some(300L)
  }

  it("same-timestamp right rows resolve to the max value deterministically") {
    val p2 = Seq((10L, 200L, 5.0), (10L, 200L, 9.0)).toDF("user_id", "ts", "value")
    AsOfJoin.backward(clicks.filter($"event_id" === 2L), p2, "user_id", "ts", "ts", "value")
      .select("asof_value").as[Double].head() shouldBe 9.0
  }
}
