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
    * @param saltCols    columns the deterministic salt hashes — pass ONE
    *                    stable high-cardinality column (a row PK is ideal):
    *                    it must vary within a hot key's rows to spread them,
    *                    and hashing one narrow column beats hashing the whole
    *                    row on wide facts. Empty (default) falls back to all
    *                    fact columns.
    */
  def inner(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      saltBuckets: Int = 16, saltCols: Seq[String] = Nil): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    // deterministic salt (hash modulo buckets) rather than rand():
    // retries/speculative tasks must re-derive the same salt
    val discriminator = if (saltCols.nonEmpty) saltCols else fact.columns.toSeq
    val salted = fact.withColumn("__salt",
      pmod(hash(discriminator.map(col).toIndexedSeq: _*), lit(saltBuckets)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated,
        salted(factKey) === replicated(dimKey) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
