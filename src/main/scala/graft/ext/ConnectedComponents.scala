package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering step a
  * dedup pipeline needs AFTER near-dup pair generation ([[MinHashLSH]] /
  * [[SimHash]] / [[Ann]] emit pairs; keeping one representative per
  * duplicate GROUP requires the transitive closure of those pairs).
  *
  * Algorithm: iterative minimum-label propagation with POINTER JUMPING.
  * Every vertex starts labeled with its own id; each round every vertex
  * takes the min of its own and its neighbors' labels, then follows its
  * label's label (label ← label(label)) — the jump doubles the distance a
  * minimum travels per round, so convergence needs O(log diameter) rounds
  * instead of O(diameter) (the classic Shiloach-Vishkin-style shortcut;
  * a 1M-edge chain graph of diameter 16 drops from ~17 to ~6 rounds).
  * Near-dup clusters are small and dense — typically 2-3 rounds either
  * way — but the log bound keeps pathological chain/filament graphs safe.
  *
  * Scale shape: one shuffle per round (edge⋈label hash join + min
  * aggregation on vertex id — both partition by the same key, so AQE reuses
  * the partitioning). Labels are `localCheckpoint`ed each round: iterative
  * DataFrame plans otherwise nest one join deeper per round, and the
  * lineage/codegen cost grows without bound. The edge list is cached for
  * the duration of the call (consumed every round) and released on return.
  */
object ConnectedComponents {

  /** Telemetry from the most recent [[run]] on this driver: per-round wall
    * seconds, and (when `spark.graft.cc.instrument` is true) the symmetric
    * edge and vertex counts — the numbers that attribute a CC-composed
    * query's wall to rounds-times-job-overhead vs data volume. Harness
    * evidence only (Bench reads it after an untimed rerun); `@volatile` for
    * visibility, last-writer-wins like the rest of the bench's
    * single-driver assumptions.
    */
  final case class RunStats(edges: Long, vertices: Long, roundSecs: Seq[Double])
  @volatile var lastStats: Option[RunStats] = None

  /** Assign each vertex the minimum vertex id of its component.
    *
    * @param edges    undirected edges (each pair listed once is enough)
    * @param srcCol   source vertex id column (integral)
    * @param dstCol   destination vertex id column (integral)
    * @param maxIter  safety bound on propagation rounds
    * @return (id, component) — one row per vertex appearing in any edge
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 25): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))

    val symC = sym.persist()
    try {
      val instrument = edges.sparkSession.conf
        .get("spark.graft.cc.instrument", "false").toBoolean
      val roundSecs = Seq.newBuilder[Double]
      var labels = symC.select(col("src").as("id")).distinct()
        .withColumn("component", col("id"))
        .localCheckpoint(true)
      var iter = 0
      var converged = false
      while (!converged && iter < maxIter) {
        val roundT0 = System.nanoTime()
        // neighbor labels flow along edges; min with own label. The self
        // rows are tagged so the round's OLD label rides through the same
        // aggregation — the convergence check is then a trivial scan of the
        // checkpointed round output, not an extra join against the previous
        // round.
        val viaEdges = symC
          .join(labels.select(col("id").as("dst"), col("component")), "dst")
          .select(col("src").as("id"), col("component"), lit(false).as("self"))
        val propagated = labels.select(col("id"), col("component"), lit(true).as("self"))
          .union(viaEdges)
          .groupBy("id")
          .agg(min(col("component")).as("component"),
            min(when(col("self"), col("component"))).as("__old"))
        // pointer jump: component ← component's component. Labels are always
        // vertex ids, so the lookup side is `labels` itself (left join: a
        // label may point at a vertex whose row this round's propagation
        // already relabeled — coalesce keeps the propagated value then).
        val next = propagated.as("x")
          .join(labels.select(col("id").as("__pid"), col("component").as("__pcomp")).as("p"),
            col("x.component") === col("__pid"), "left_outer")
          .select(col("x.id"),
            least(col("x.component"), coalesce(col("__pcomp"), col("x.component")))
              .as("component"),
            col("x.__old"))
          .localCheckpoint(true)
        val changed = next.filter(col("component") =!= col("__old")).limit(1).count()
        // superseded rounds' checkpoint blocks are reaped by the
        // ContextCleaner once the old frame is dropped here
        labels = next.select(col("id"), col("component"))
        converged = changed == 0
        iter += 1
        roundSecs += (System.nanoTime() - roundT0) / 1e9
      }
      lastStats = Some(RunStats(
        if (instrument) symC.count() else -1L,
        if (instrument) labels.count() else -1L,
        roundSecs.result()))
      labels
    } finally symC.unpersist(blocking = false)
  }
}
