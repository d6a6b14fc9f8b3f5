package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** JSON-lines sink (reference S4: GenericRecord.toString per row,
  * Main.scala:234-246). Spark's native json writer emits the same
  * value-level encoding for the projected frame; `toJsonColumn` gives the
  * column form used by DQ10.
  */
object JsonSink {

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** One JSON string per row over the full row struct. */
  def toJsonColumn(df: DataFrame): Column =
    to_json(struct(df.columns.map(col).toIndexedSeq: _*))
}
