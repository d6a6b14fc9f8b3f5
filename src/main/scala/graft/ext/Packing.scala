package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Greedy sequence packing (EXT) — concatenating short documents into
  * fixed-capacity training sequences is the standard way to avoid padding
  * waste in LLM pre-training batches; the deterministic version packs in a
  * canonical order so every engine/run produces the same bins.
  *
  * Semantics: within each `groupCol` stream, documents in ascending `idCol`
  * order fill a bin until the next document would overflow `capacity`; then
  * a new bin starts (an oversized document gets its own bin). Packing is
  * inherently SEQUENTIAL per stream — the parallelism unit is the group, so
  * at 100 TB the group key must be granular enough (source × date × shard)
  * to spread streams across executors. `flatMapSortedGroups` streams each
  * group's iterator in sorted order without materializing the group.
  */
object Packing {

  /** (group, doc_id, bin) assignment. `sizeCol` must be a non-negative
    * integral column (e.g. `n_chars` or a token count).
    */
  def packGreedy(df: DataFrame, groupCol: String, idCol: String,
      sizeCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("string"), col(idCol).cast("long"),
        col(sizeCol).cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      // sort exprs resolve against the child's DATA attributes (the
      // original column names), not the tuple-encoder accessors
      .flatMapSortedGroups(col(idCol)) { (group, docs) =>
        var bin = 0L
        var fill = 0L
        var first = true
        docs.map { case (_, id, n) =>
          if (first) { fill = n; first = false }
          else if (fill + n > capacity) { bin += 1; fill = n }
          else fill += n
          (group, id, bin)
        }
      }
      .toDF(groupCol, idCol, "bin")
  }
}
