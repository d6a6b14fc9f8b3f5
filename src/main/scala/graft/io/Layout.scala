package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** File-layout helpers — at 100 TB the cheapest byte is the one never read,
  * and what a scan can skip is decided at WRITE time.
  *
  * [[sortedWrite]] range-partitions by the clustering columns and sorts
  * within partitions before writing parquet: every output file then covers a
  * narrow, non-overlapping range of the clustering key, so parquet
  * row-group/page min-max statistics (and partition-level file pruning in
  * engines that track them) reduce a selective scan from "all files" to
  * "the one file containing the range". [[partitionedWrite]] is the
  * coarse-grained directory variant (hive-style partition pruning) for
  * low-cardinality keys like dates.
  */
object Layout {

  /** Write `df` as `numFiles` parquet files clustered + sorted by `cols`. */
  def sortedWrite(df: DataFrame, path: String, numFiles: Int, cols: String*): Unit =
    df.repartitionByRange(numFiles, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
      .write.mode("overwrite").parquet(path)

  /** Hive-style directory partitioning by `partCols` (dates, categories —
    * low-cardinality only: one directory per value).
    *
    * The write is clustered by the partition key first: an unclustered
    * `partitionBy` emits one file per value PER TASK (tasks × values
    * files — a 200-task write over a year of dates leaves ~73k files),
    * while the batch-sized repartition caps it at one file per
    * directory. Huge per-value volumes that need several files per
    * directory should add a deterministic row-hash salt column to the
    * clustering (not a `partitionBy` column) before calling this.
    */
  def partitionedWrite(df: DataFrame, path: String, partCols: String*): Unit =
    df.repartition(partCols.map(col): _*)
      .write.mode("overwrite").partitionBy(partCols: _*).parquet(path)

  /** [[partitionedWrite]] guarded by an input fingerprint — the production
    * layout lifecycle is "lay out once, query many", so the expensive
    * rewrite should happen once per distinct input, not once per query run.
    * The fingerprint covers the canonicalized plan AND every input file's
    * (path, length, mtime), so both a different query and regenerated
    * source data invalidate the layout; a matching sidecar skips straight
    * to the existing directory (same replay contract as
    * [[ResultCache.readThrough]], which rebuilds the reference's
    * query-text-gated cache — Main.scala:67-121).
    */
  def partitionedWriteCached(df: DataFrame, path: String, partCols: String*): Unit =
    writeCached(df, path, "partitioned:" + partCols.mkString(",")) {
      partitionedWrite(df, path, partCols: _*)
    }

  /** [[zorderWrite]] under the same fingerprint guard. The tag carries an
    * implementation VERSION: the fingerprint sees plan + inputs but not the
    * writer's code, so a clustering-algorithm change (e.g. the v2
    * sign-wrap fix in [[interleave16]]) must bump it to invalidate layouts
    * written by the old code.
    */
  def zorderWriteCached(df: DataFrame, path: String, numFiles: Int,
      colA: String, colB: String): Unit =
    writeCached(df, path, s"zorder:v2:$numFiles:$colA:$colB") {
      zorderWrite(df, path, numFiles, colA, colB)
    }

  /** Run `write` only when the layout sidecar doesn't match the current
    * (plan, input files, layout-params) fingerprint.
    */
  private def writeCached(df: DataFrame, path: String, layoutTag: String)
      (write: => Unit): Unit = {
    val spark = df.sparkSession
    val fp = inputFingerprint(df) + ":" + layoutTag
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val key = new org.apache.hadoop.fs.Path(s"$path/_graft_layout")
    val hit = fs.exists(key) && {
      val in = fs.open(key)
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8) == fp
      finally in.close()
    }
    if (!hit) {
      write
      val out = fs.create(key, true)
      try out.write(fp.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
  }

  /** Plan + input-file identity: canonicalized optimized plan, and each
    * input file's path, size, and modification time.
    */
  private def inputFingerprint(df: DataFrame): String = {
    val conf = df.sparkSession.sessionState.newHadoopConf()
    val files = df.inputFiles.sorted.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val st = p.getFileSystem(conf).getFileStatus(p)
      s"$f:${st.getLen}:${st.getModificationTime}"
    }
    val plan = df.queryExecution.optimizedPlan.canonicalized.toString
    java.security.MessageDigest.getInstance("SHA-256")
      .digest((plan + files.mkString("\n"))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
  }

  /** Z-order (Morton-curve) clustering on TWO numeric dimensions.
    *
    * [[sortedWrite]] prunes selective scans on its leading key only — a
    * predicate on the second key alone touches every file. Interleaving the
    * bits of both (rank-scaled) keys into one z-value and range-writing on
    * it gives every file a bounded extent in BOTH dimensions, so min/max
    * file skipping works for predicates on either key (the layout behind
    * Delta/Iceberg OPTIMIZE ZORDER — public technique, Morton 1966).
    *
    * Key scaling uses global min/max (one cheap agg pass — the same stats
    * collection any z-order writer does). The interleave is pure Catalyst
    * bit arithmetic (shift/and/or), codegen'd, no UDF.
    */
  def zorderWrite(df: DataFrame, path: String, numFiles: Int,
      colA: String, colB: String): Unit = {
    val s = df.agg(
      min(col(colA).cast(DoubleType)), max(col(colA).cast(DoubleType)),
      min(col(colB).cast(DoubleType)), max(col(colB).cast(DoubleType))).head()
    def scaled(c: String, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0)
      else floor((col(c).cast(DoubleType) - lit(lo)) / lit(hi - lo) * lit(65535.0))
        .cast(IntegerType)
    val z = interleave16(
      scaled(colA, s.getDouble(0), s.getDouble(1)),
      scaled(colB, s.getDouble(2), s.getDouble(3)))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Small-file compaction: rewrite `srcPath` into `destPath` with file
    * count sized from actual bytes (ceil(total/targetFileBytes), min 1).
    *
    * The operational complement of the layout writers: streaming sinks and
    * fine-grained partition writes accumulate small files, and at 100 TB
    * the scan cost of a million 1 MB files is dominated by open/footer
    * overhead, not bytes. Optionally re-clusters by `sortCols` during the
    * rewrite (repartitionByRange + sortWithinPartitions, same
    * min/max-friendliness as [[sortedWrite]]); otherwise a plain
    * round-robin coalescing rewrite. Returns the output file count.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, srcPath: String,
      destPath: String, targetFileBytes: Long, sortCols: Seq[String] = Nil): Int = {
    val hp = new org.apache.hadoop.fs.Path(srcPath)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    val totalBytes = fs.getContentSummary(hp).getLength
    val numFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(srcPath)
    val shaped =
      if (sortCols.nonEmpty)
        df.repartitionByRange(numFiles, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(numFiles)
    shaped.write.mode("overwrite").parquet(destPath)
    numFiles
  }

  /** Morton interleave of two 16-bit non-negative ints: a's bit i lands at
    * position 2i+1, b's at 2i. 32 codegen'd shift/and/or ops, no UDF.
    * Computed in LONG: a's bit 15 lands at position 31, which in 32-bit
    * arithmetic is the sign bit — an Int z-code would order the top half
    * of the `a` range before the bottom half and give the wrap-straddling
    * file full extents in both dimensions.
    */
  private[io] def interleave16(a: Column, b: Column): Column = {
    val (al, bl) = (a.cast(org.apache.spark.sql.types.LongType),
      b.cast(org.apache.spark.sql.types.LongType))
    (0 until 16).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
  }
}
