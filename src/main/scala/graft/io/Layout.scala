package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

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
    */
  def partitionedWrite(df: DataFrame, path: String, partCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partCols: _*).parquet(path)
}
