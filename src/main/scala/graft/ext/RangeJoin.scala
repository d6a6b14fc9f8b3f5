package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (band) join — match points to [lo, hi) intervals. Spark's planner
  * turns a bare inequality join into BroadcastNestedLoopJoin (O(N·M));
  * bucketing the range dimension makes it an EQUI-join on bucket ids:
  * each interval is exploded to the buckets it spans, each point hashes to
  * its own bucket, candidates meet in a hash shuffle, and the exact bound
  * check filters the edges. Cost is O(N + M·spannedBuckets) shuffled rows —
  * pick `bucketWidth` near the typical interval width so spannedBuckets
  * stays small.
  */
object RangeJoin {

  /** Inner-join `points` to `ranges` on pointCol ∈ [loCol, hiCol).
    * All three columns must be numeric (compared as double).
    */
  def pointInRange(
      points: DataFrame,
      pointCol: String,
      ranges: DataFrame,
      loCol: String,
      hiCol: String,
      bucketWidth: Double
  ): DataFrame = {
    val w = lit(bucketWidth)
    // Expand through floor(hi/w) unconditionally: when hi sits exactly on a
    // bucket boundary this adds one spurious bucket whose candidates the
    // exact bound filter below removes — an epsilon subtraction instead
    // would DROP true matches whenever hi falls within epsilon above a
    // boundary (the point hashes to a bucket the interval never expanded
    // to). Empty/inverted intervals (hi <= lo) are guarded out rather than
    // producing a descending (wrap-around) sequence.
    val expanded = ranges
      .filter(col(hiCol) > col(loCol))
      .withColumn("__bucket",
        explode(sequence(
          floor(col(loCol) / w).cast("long"),
          floor(col(hiCol) / w).cast("long"))))
    val bucketed = points.withColumn("__bucket", floor(col(pointCol) / w).cast("long"))
    bucketed.join(expanded, "__bucket")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }
}
