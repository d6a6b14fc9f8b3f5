package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling — the runtime complement to `ext.SaltedJoin`.
  *
  * At 100 TB a hot key turns one shuffle partition into a straggler that
  * gates the whole stage. Two defenses exist in this repo: explicit salting
  * (dq54/dq56, for when the skew is KNOWN) and AQE's skew-join splitting
  * (for when it isn't). This suite proves the second actually engages on
  * this session config: a join with one dominant key executes with the
  * sort-merge join marked `skew=true` — AQE split the oversized partition
  * into parallel sub-splits at runtime, no salting code required.
  *
  * Thresholds are lowered to make "skewed" reachable at test data volume;
  * the MECHANISM under test is identical at production thresholds.
  */
class AqeSkewSpec extends GraftSpec {
  import spark.implicits._

  it("AQE splits a skewed sort-merge join partition at runtime (skew=true)") {
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      // keep the join an SMJ: a broadcast would dodge the skew path entirely
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 100k facts, ~90% on one hot key; dim has all keys. The aggregate
      // after the join is UNGROUPED on purpose: a groupBy on the join key
      // would require hash distribution of the join output, and AQE then
      // declines the skew split (it would force a re-shuffle) unless
      // forceOptimizeSkewedJoin is set.
      val fact = spark.range(100000)
        .select(when($"id" % 10 =!= 0, lit(7L)).otherwise($"id" % 100).as("k"),
          concat(lit("payload_payload_payload_"), $"id").as("payload"))
      val dim = spark.range(100).select($"id".as("k"), ($"id" * 2).as("attr"))
      val joined = fact.join(dim, "k")
        // reference payload so column pruning can't shrink the fact side
        // below the skew threshold
        .agg(count(lit(1)).as("n"),
          sum(org.apache.spark.sql.functions.length($"payload")).as("s"))
      // collect() (not head(), which executes a separate limited plan)
      // so THIS queryExecution carries the final adaptive plan
      val row = joined.collect()(0)
      // correctness first: every fact row matched exactly once
      row.getLong(0) shouldBe 100000L
      // and the executed (adaptive, final) plan shows the skew split
      joined.queryExecution.executedPlan.toString should include("skew=true")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
