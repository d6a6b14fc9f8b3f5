package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join — the explicit fallback for when AQE's runtime
  * skew splitting can't apply (e.g. the skewed side is the OUTPUT of another
  * operator in the same stage, or the join feeds a stateful operator that
  * pins the partitioning).
  *
  * Shape: the fact side gets a random-uniform salt in [0, saltBuckets); the
  * dim side is replicated once per salt value (explode of a literal range —
  * dim rows × saltBuckets, acceptable when dim ≪ fact, which is the only
  * regime where key skew on the fact side hurts). The join key becomes
  * (key, salt), so a hot key's rows spread over `saltBuckets` reducers
  * instead of one straggler task. Result row set is identical to the plain
  * join: every fact row still meets every matching dim row exactly once.
  */
object SaltedJoin {

  /** Inner equi-join `fact ⋈ dim` on factKey = dimKey, salted.
    *
    * @param saltBuckets number of ways to split each hot key (≈ the skew
    *                    factor to neutralize; cost = dim replicated this
    *                    many times)
    */
  def inner(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      saltBuckets: Int = 16): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    // deterministic salt (hash of the whole fact row modulo buckets) rather
    // than rand(): retries/speculative tasks must re-derive the same salt
    val salted = fact.withColumn("__salt",
      pmod(hash(fact.columns.map(col).toIndexedSeq: _*), lit(saltBuckets)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated,
        salted(factKey) === replicated(dimKey) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
