package graft.plans

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Physical-plan traversal that crosses AQE boundaries.
  *
  * `TreeNode.collect` stops at `AdaptiveSparkPlanExec` / `QueryStageExec`
  * (the executed subtree hangs off a field, not `children`), so any code
  * reading runtime metrics off scans or exchanges needs this unwrap. One
  * shared walker instead of a copy per call site (Bench evidence, probes,
  * plan audits) — the next Spark version's node shape changes in one place.
  */
object PlanWalk {

  /** All nodes matching `pf`, in pre-order, descending through AQE wrappers. */
  def collectAll[T](plan: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    def walk(p: SparkPlan): Seq[T] = {
      val below = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec        => walk(q.plan)
        case other                    => other.children.flatMap(walk)
      }
      pf.lift(p).toSeq ++ below
    }
    walk(plan)
  }
}
