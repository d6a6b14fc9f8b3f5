package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers for co-located joins (SURVEY §2.3 scale note).
  *
  * At 100 TB the dominant join cost is the shuffle of the fact side. Writing
  * both sides bucketed by the join key with the same bucket count lets
  * sort-merge join read bucket-aligned splits directly — no Exchange on
  * either side, verified by [[graft.BucketingSpec]] at the plan level. This
  * is the persistent-table analogue of the reference's "lift the id so
  * downstream joins are easier" design (P4).
  */
object Bucketing {

  /** Write `df` as a bucketed (and bucket-sorted) managed table.
    * Overwrite-safe even when a PREVIOUS session left the warehouse
    * directory behind without a catalog entry (the in-memory catalog dies
    * with the session, the directory doesn't — and a dangling location
    * fails CREATE with LOCATION_ALREADY_EXISTS).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new org.apache.hadoop.fs.Path(warehouse,
      table.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table) // managed: lives under spark.sql.warehouse.dir
  }

  /** Join two same-bucketed tables on their bucket key — shuffle-free. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))
}
