package graft.io

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Write-time layout: non-overlapping file ranges, partition pruning. */
class LayoutSpec extends GraftSpec {
  import spark.implicits._

  it("sortedWrite produces files with non-overlapping key ranges") {
    val dir = java.nio.file.Files.createTempDirectory("graft-layout").toString
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    Layout.sortedWrite(li, dir, numFiles = 4, "l_shipdate")

    // per-file min/max of the clustering key must not overlap
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("l_shipdate").as("lo"), max("l_shipdate").as("hi"))
      .orderBy("lo")
      .as[(String, String, String)].collect()
    ranges.length should be >= 2
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => hi1 should be <= lo2
      case _ =>
    }
    // round-trip completeness
    spark.read.parquet(dir).count() shouldBe li.count()
  }

  it("partitionedWrite prunes directories for an equality filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft-layout-p").toString
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("yr", year($"o_orderdate"))
    Layout.partitionedWrite(o, dir, "yr")

    val read = spark.read.parquet(dir).filter($"yr" === 1995)
    read.count() shouldBe o.filter($"yr" === 1995).count()
    // partition pruning visible in the scan: only the yr=1995 directory
    val scanned = read.select(input_file_name()).distinct()
      .as[String].collect()
    all(scanned) should include("yr=1995")
  }
}
