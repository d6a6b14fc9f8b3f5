package graft.ext

import graft.GraftSpec

/** Bucketed point-in-range join semantics. */
class RangeJoinSpec extends GraftSpec {
  import spark.implicits._

  private val points = Seq((1L, 0.5), (2L, 10.0), (3L, 19.999), (4L, 20.0), (5L, 35.0))
    .toDF("id", "v")
  private val ranges = Seq((100L, 10.0, 20.0), (200L, 20.0, 30.0)).toDF("rid", "lo", "hi")

  it("matches points into [lo, hi) with exclusive upper bound") {
    val out = RangeJoin.pointInRange(points, "v", ranges, "lo", "hi", 10.0)
      .select("id", "rid").as[(Long, Long)].collect().toSet
    out shouldBe Set((2L, 100L), (3L, 100L), (4L, 200L))
  }

  it("ranges spanning several buckets still match") {
    val wide = Seq((300L, 5.0, 28.0)).toDF("rid", "lo", "hi")
    val out = RangeJoin.pointInRange(points, "v", wide, "lo", "hi", 10.0)
      .select("id").as[Long].collect().toSet
    out shouldBe Set(2L, 3L, 4L)
  }

  it("is an equi-join on buckets, not a nested loop") {
    val plan = RangeJoin.pointInRange(points, "v", ranges, "lo", "hi", 10.0)
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }
}
