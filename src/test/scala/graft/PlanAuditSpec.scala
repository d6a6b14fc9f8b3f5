package graft

import org.apache.spark.sql.functions._

import graft.plan.Translator

/** Regression guard for the scale-critical physical-plan properties: filters
  * must reach the parquet scan, nested projection must prune the read schema,
  * top-k must compile to TakeOrderedAndProject (no global sort). These are
  * the properties that decide 100 TB behavior — locked in as tests so a
  * refactor can't silently regress them.
  */
class PlanAuditSpec extends GraftSpec {

  private val dir = "/root/testdata/sf0.001"

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  it("filter predicates push down to the parquet scan") {
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_shipdate").between(lit("1996-01-01"), lit("1996-02-01"))
        && col("l_quantity") > 0)
      .select("l_orderkey", "l_quantity")
    val p = physical(df)
    p should include("PushedFilters: [IsNotNull(l_shipdate)")
    // scan reads only the filter+projection columns
    p should include("ReadSchema: struct<l_orderkey:bigint,l_quantity:double,l_shipdate:timestamp_ntz>")
  }

  it("nested projection prunes the read schema to the selected leaves") {
    val nested = spark.read.parquet(s"$dir/customer.parquet").select(
      struct(col("c_custkey").as("custkey"), col("c_name").as("name"),
        col("c_mktsegment").as("seg")).as("customer"),
      col("c_acctbal"))
    val df = Translator(List("customer.custkey"))(nested)
    val p = physical(df)
    // only c_custkey survives to the scan; name/seg/acctbal pruned
    p should include("ReadSchema: struct<c_custkey:bigint>")
  }

  it("orderBy+limit compiles to TakeOrderedAndProject, not a global sort") {
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .orderBy(col("l_extendedprice").desc).limit(5)
    physical(df) should include("TakeOrderedAndProject")
  }

  it("groupBy aggregation is partial (map-side) before the exchange") {
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag").agg(sum("l_quantity"))
    val p = physical(df)
    // two HashAggregates around one shuffle
    "HashAggregate".r.findAllIn(p).size should be >= 2
    p should include("Exchange hashpartitioning(l_returnflag")
  }

  it("range join plans as a bucketed equi-join, never a nested loop") {
    import spark.implicits._
    val points = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_quantity"), col("l_extendedprice"))
    val bands = (0 until 5).map(b => (b.toLong, b * 10 + 1.0, b * 10 + 11.0))
      .toDF("band_id", "lo", "hi")
    val df = graft.ext.RangeJoin.pointInRange(points, "l_quantity",
      bands, "lo", "hi", bucketWidth = 10.0)
    val p = physical(df)
    p should not include "NestedLoop" // the O(N·M) plan this operator exists to avoid
    p should include("__bucket")      // joined on the derived bucket key
  }

  it("as-of join is one hash shuffle on the key (union+window, no range blowup)") {
    import spark.implicits._
    val clicks = Seq((1L, 10L, 100L)).toDF("event_id", "user_id", "t")
    val buys = Seq((10L, 50L, 1.5)).toDF("user_id", "t", "value")
    val df = graft.ext.AsOfJoin.backward(clicks, buys, "user_id", "t", "t", "value")
    val p = physical(df)
    "Exchange hashpartitioning\\(user_id".r.findAllIn(p).size shouldBe 1
    "Exchange".r.findAllIn(p).size shouldBe 1 // and no other shuffle at all
  }

  it("custom expressions participate in whole-stage codegen") {
    import spark.implicits._
    // non-foldable input (range), so the projection can't constant-fold away
    val df = spark.range(10)
      .select(transform(sequence(lit(1), lit(4)), i => (i + $"id").cast("double")).as("a"))
      .select(graft.functions.DotProduct($"a", $"a").as("d"))
    // the '*' prefix marks operators inside a WholeStageCodegen stage; the
    // HOF transform below it stays un-starred — exactly the gap DotProduct
    // closes for the pair-scoring projections
    physical(df) should include regex """\*\(\d+\) Project \[dotproduct"""
    df.agg(sum($"d")).as[Double].head() should be > 0d
  }
}
