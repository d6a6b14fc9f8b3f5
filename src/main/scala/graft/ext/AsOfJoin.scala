package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — for each left row, the most recent right row of
  * the same key with rightTime ≤ leftTime. An operator the reference's
  * domain (time-stamped reporting rows) invites but Spark lacks natively.
  *
  * Spark-first formulation (SURVEY §2 preference ladder (a): compose
  * existing ops): tag both sides, UNION, and take `last(right, ignoreNulls)`
  * over a (key, time)-ordered running window, then keep left rows. ONE hash
  * shuffle on the key + a per-partition sort — the same cost shape as a
  * sort-merge join; no per-row point-in-time subquery, no range explosion.
  * Skew on hot keys is handled like any keyed shuffle (AQE / salting).
  *
  * Ties (rightTime == leftTime) match (inclusive): the right row sorts
  * before the left at the same timestamp via the side tag.
  */
object AsOfJoin {

  /** Left rows gain `asof_value` (right value column, double) and
    * `asof_time` (matched right timestamp), null when no prior right row.
    *
    * @param key           equi-join key column name present on both sides
    * @param leftTimeCol   left event-time column name (orderable)
    * @param rightTimeCol  right event-time column name (same type)
    * @param rightValueCol right value column to carry
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTimeCol: String,
      rightTimeCol: String,
      rightValueCol: String
  ): DataFrame = {
    val l = left
      .withColumn("__t", col(leftTimeCol))
      .withColumn("__side", lit(1))
    val r = right.select(
      col(key),
      col(rightTimeCol).as("__t"),
      lit(0).as("__side"),
      col(rightValueCol).cast("double").as("__rv"),
      col(rightTimeCol).as("__rt"))

    val u = l.unionByName(r, allowMissingColumns = true)
    // __rv as final tiebreak: among right rows sharing a timestamp the max
    // value deterministically wins (left rows all carry null __rv, so the
    // extra key never reorders them)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"), col("__rv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    u.withColumn("asof_value", last(col("__rv"), ignoreNulls = true).over(w))
      .withColumn("asof_time", last(col("__rt"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__t", "__side", "__rv", "__rt")
  }
}
