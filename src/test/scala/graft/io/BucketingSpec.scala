package graft.io

import org.apache.spark.sql.functions._

import graft.GraftSpec

/** Co-located bucketed join: same bucket count on both sides ⇒ sort-merge
  * join with NO Exchange — the plan shape that makes repeated fact-dim joins
  * affordable at 100 TB.
  */
class BucketingSpec extends GraftSpec {

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // a crashed previous run can leave the managed location without a
    // catalog entry — clear it or CREATE TABLE refuses
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"), name)
    if (wh.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(wh)
    }
  }

  it("bucketed-by-key tables join without a shuffle") {
    val dir = "/root/testdata/sf0.001"
    dropTable("b_orders")
    dropTable("b_customer")
    // at sf0.001 the planner would broadcast instead (right call for tiny
    // dims); disable it to test the large-large shape bucketing exists for
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val customer = spark.read.parquet(s"$dir/customer.parquet")

    Bucketing.writeBucketed(orders.select("o_orderkey", "o_custkey", "o_totalprice"),
      "b_orders", "o_custkey", 4)
    Bucketing.writeBucketed(customer.select("c_custkey", "c_name"),
      "b_customer", "c_custkey", 4)

    val joined = Bucketing.colocatedJoin(spark, "b_orders", "b_customer",
      "o_custkey", "c_custkey")
    val plan = joined.queryExecution.executedPlan.toString

    plan should include("SortMergeJoin")
    plan should not include "Exchange hashpartitioning"

    joined.count() shouldBe orders.count()

    // and the unbucketed control DOES shuffle
    val control = orders.join(customer, orders("o_custkey") === customer("c_custkey"))
      .queryExecution.executedPlan.toString
    withClue(control) {
      control should include("Exchange hashpartitioning")
    }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
