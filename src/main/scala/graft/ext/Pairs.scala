package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-free candidate-pair expansion shared by the bucketed detectors
  * ([[MinHashLSH]] LSH buckets, [[Winnow]] fingerprint buckets): each
  * SORTED id array becomes its (a < b) pairs inline via nested
  * transforms — no self-join, and the caller's size cap on the array
  * bounds the expansion structurally.
  */
private[ext] object Pairs {

  /** `idsCol` (a sorted array) → exploded (doc_a, doc_b) rows, a < b.
    * Callers filter the array size to [2, cap] BEFORE expansion.
    */
  def explodeSortedIdPairs(df: DataFrame, idsCol: String): DataFrame =
    df.select(explode(flatten(transform(col(idsCol), (x, i) =>
      transform(slice(col(idsCol), i + lit(2), size(col(idsCol))), y =>
        struct(x.as("doc_a"), y.as("doc_b")))))).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
}
