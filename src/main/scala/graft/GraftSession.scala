package graft

import org.apache.spark.sql.SparkSession

/** One place for session defaults, tuned for the target execution model:
  * local[N] while testing, many-executor clusters at 100 TB. Everything here
  * is also correct on a real cluster — nothing is local-mode-only.
  */
object GraftSession {

  def builder(appName: String): SparkSession.Builder = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .appName(appName)
    // local[N] is a FALLBACK, not an override: spark-submit --master (and
    // any explicit spark.master) wins, so Bench/Verify deployed on a real
    // cluster run distributed rather than silently single-node.
    if (!sys.props.contains("spark.master") && !sys.env.contains("SPARK_MASTER"))
      b.master(s"local[$cpus]")
    b
      // size shuffles to the actual parallelism, not the 200 default
      .config("spark.sql.shuffle.partitions", cpus)
      // AQE: runtime coalescing, skew-join splitting, dynamic broadcast
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // push nested-struct pruning into the parquet scan — the core of P1
      .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
      // legacy fallback: if events.ts is ever regenerated as parquet
      // TIMESTAMP(NANOS) again, read it as a Long instead of throwing.
      // A no-op for the current TIMESTAMP(MICROS) files — consumers
      // detect the scanned unit either way (graft.io.EventTime).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
  }

  def get(appName: String): SparkSession = {
    val s = builder(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
