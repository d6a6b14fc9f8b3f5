package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter join pruning — the 100 TB semi-join technique: build a
  * Bloom filter over the (small) dimension side's keys, broadcast it, and
  * drop fact rows that cannot match BEFORE they enter the join shuffle.
  * No false negatives (every true match survives); false positives only
  * cost their shuffle bytes, tuned by `fpp`.
  *
  * Uses Spark's own sketch (`DataFrameStatFunctions.bloomFilter` /
  * `org.apache.spark.util.sketch.BloomFilter`), serialized into a broadcast
  * and probed by a scalar predicate. (Spark's runtime row-level filtering
  * does this automatically in some shapes; this utility makes it explicit
  * and composable for pipelines that pre-filter long before the join.)
  */
object BloomPrune {

  /** Build a filter over `keyCol` of `dim`. */
  def buildFilter(dim: DataFrame, keyCol: String, expectedItems: Long,
      fpp: Double = 0.01): BloomFilter =
    dim.stat.bloomFilter(keyCol, expectedItems, fpp)

  /** Prune `fact` to rows whose `keyCol` might be in the filter. */
  def prune(fact: DataFrame, keyCol: String, filter: BloomFilter): DataFrame = {
    val spark = fact.sparkSession
    val bc = spark.sparkContext.broadcast(filter)
    val mightContain = udf((k: Long) => bc.value.mightContainLong(k))
    fact.filter(mightContain(col(keyCol).cast("long")))
  }

  /** Semi-join-shaped pipeline: prune the fact side with the dim's Bloom
    * filter, then perform the real join — the shuffle only carries
    * surviving rows.
    */
  def prunedJoin(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val f = buildFilter(dim, dimKey, expectedItems, fpp)
    prune(fact, factKey, f).join(dim, col(factKey) === col(dimKey))
  }
}
