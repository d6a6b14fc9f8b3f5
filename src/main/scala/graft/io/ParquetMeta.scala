package graft.io

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** Footer-only parquet metadata reads — row counts without a Spark job.
  *
  * The persisted-index layouts ([[graft.ext.SubstrIndex]],
  * [[graft.ext.IvfStore]]) need the row count of an append dir they just
  * wrote to refresh their advisory `stats/`; re-scanning the dir with
  * `spark.read.parquet(...).count()` plans one extra job per append (round-10
  * "What's wrong #3"). Parquet footers already carry the exact count, and
  * reading them is a driver-side metadata walk — zero jobs, zero data pages.
  */
object ParquetMeta {

  /** Exact row count of every parquet file under `dir` (recursive), summed
    * from footers. Partition subdirectories (`cell=<c>/...`) are included.
    */
  def rowCount(spark: SparkSession, dir: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new HPath(dir)
    val fs = root.getFileSystem(conf)
    val it = fs.listFiles(root, true)
    var n = 0L
    while (it.hasNext) {
      val s = it.next()
      val name = s.getPath.getName
      if (s.isFile && !name.startsWith("_") && !name.startsWith(".")) {
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(s.getPath, conf))
        try n += r.getRecordCount finally r.close()
      }
    }
    n
  }
}
