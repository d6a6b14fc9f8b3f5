package graft.io

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runtime evidence for the z-order claim: on a band predicate over the
  * SECOND clustering dimension, a z-ordered layout leaves most files
  * skippable (every file has bounded extents in both keys), while a layout
  * sorted by the first key alone interleaves the second key through every
  * file — nothing can be skipped. The probe clones lineitem `m`×, writes
  * both layouts, and counts the files whose (min, max) extent of the band
  * column intersects the band: exactly the files a min/max-pruning reader
  * must open. Same engine-agnostic statistic parquet row-group pruning and
  * file-level skipping act on.
  */
object LayoutProbe {

  final case class ZorderSkip(rows: Long, files: Long, zFilesHit: Long,
      linFilesHit: Long, zSec: Double, linSec: Double) {
    /** JSON fragment for Bench's evidence block. */
    def json: String =
      f""""dq63_probe_rows":$rows,"dq63_files":$files,""" +
        f""""dq63_zorder_files_hit":$zFilesHit,"dq63_linear_files_hit":$linFilesHit,""" +
        f""""dq63_zorder_band_sec":$zSec%.2f,"dq63_linear_band_sec":$linSec%.2f"""
  }

  def zorderFileSkip(spark: SparkSession, sfDir: String, m: Int = 10,
      numFiles: Int = 64, lo: Double = 20000, hi: Double = 30000): ZorderSkip = {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    val df = li.crossJoin(spark.range(m.toLong).toDF("rep"))
      .select((col("l_orderkey") * m + col("rep")).as("l_orderkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
    // fresh temp dirs, deleted in finally: the probe runs inside every full
    // Bench pass, and fixed /tmp paths would leak a few hundred MB per run
    val base = java.nio.file.Files.createTempDirectory("graft-zprobe")
    val zDir = base.resolve("z").toString
    val lDir = base.resolve("lin").toString
    try {
      Layout.zorderWrite(df, zDir, numFiles, "l_quantity", "l_extendedprice")
      Layout.sortedWrite(df, lDir, numFiles, "l_quantity")
      val rows = spark.read.parquet(zDir).count()

      // files a min/max-pruning reader must OPEN for the band: extent
      // intersects [lo, hi]
      def filesHit(dir: String): (Long, Long) = {
        val ext = spark.read.parquet(dir)
          .groupBy(input_file_name().as("f"))
          .agg(min("l_extendedprice").as("mn"), max("l_extendedprice").as("mx"))
          .cache()
        val total = ext.count()
        val hits = ext.filter(col("mx") >= lo && col("mn") <= hi).count()
        ext.unpersist(blocking = false)
        (hits, total)
      }
      def bandSec(dir: String): Double = {
        val t0 = System.nanoTime()
        spark.read.parquet(dir)
          .filter(col("l_extendedprice").between(lo, hi))
          .agg(count(lit(1))).head()
        (System.nanoTime() - t0) / 1e9
      }
      val (zHit, zTotal) = filesHit(zDir)
      val (lHit, _) = filesHit(lDir)
      ZorderSkip(rows, zTotal, zHit, lHit, bandSec(zDir), bandSec(lDir))
    } finally {
      import java.nio.file.{Files, Path}
      import scala.jdk.CollectionConverters._
      def rm(p: Path): Unit = {
        if (Files.isDirectory(p)) {
          // Files.list leaks a directory fd unless the stream is closed
          val children = Files.list(p)
          val listed = try children.iterator().asScala.toList finally children.close()
          listed.foreach(rm)
        }
        Files.deleteIfExists(p)
        ()
      }
      try rm(base)
      catch { case e: Exception =>
        System.err.println(s"[probe] zorder temp cleanup failed: ${e.getMessage}")
      }
    }
  }
}
