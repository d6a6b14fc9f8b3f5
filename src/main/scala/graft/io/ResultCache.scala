package graft.io

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Query-keyed result cache — the rebuild of the reference's base64 line-file
  * replay cache (Main.scala:67-121: first line = base64(query text); replay
  * only when the stored query matches the requested one).
  *
  * Here the "query text" is the canonicalized optimized plan, the payload is
  * parquet (columnar, splittable — unlike the reference's single base64 text
  * file, this scales to any size and re-reads with predicate pushdown), and
  * the fingerprint is stored in a `_graft_query` sidecar. A plan change
  * invalidates automatically; a matching fingerprint skips recompute exactly
  * like the reference skips the API call.
  */
object ResultCache {

  def fingerprint(df: DataFrame): String = {
    // canonicalized optimized plan: stable across ids/aliases for the same query
    val plan = df.queryExecution.optimizedPlan.canonicalized.toString
    MessageDigest.getInstance("SHA-256")
      .digest(plan.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
  }

  /** Return the cached result if `path` holds a run of this exact plan;
    * otherwise compute, store, and return the re-read frame.
    */
  def readThrough(df: DataFrame, path: String): DataFrame = {
    val spark = df.sparkSession
    val fp    = fingerprint(df)
    val fs    = FileSystem.get(new java.net.URI(path), spark.sessionState.newHadoopConf())
    val key   = new HPath(s"$path/_graft_query")
    val data  = s"$path/data"

    val hit = fs.exists(key) && {
      val in = fs.open(key)
      try new String(in.readAllBytes(), StandardCharsets.UTF_8) == fp
      finally in.close()
    }
    if (!hit) {
      df.write.mode("overwrite").parquet(data)
      val out = fs.create(key, true)
      try out.write(fp.getBytes(StandardCharsets.UTF_8))
      finally out.close()
    }
    spark.read.parquet(data)
  }
}
