package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.aggregate.{Final, Partial}
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Structural summary of an executed physical plan — the numbers a
  * scale review reads off `.explain("formatted")`, as data.
  */
case class PlanReport(
    scans: Int,
    scansWithPushedFilters: Int,
    shuffleExchanges: Int,
    broadcastExchanges: Int,
    broadcastJoins: Int,
    shuffledJoins: Int,
    nestedLoopJoins: Int,
    largeNestedLoopJoins: Int,
    cartesianProducts: Int,
    partialAggregates: Int,
    finalAggregates: Int,
    windows: Int) {

  /** The red flags a 100 TB review hunts for. Heuristics, not laws —
    * a tiny broadcast nested-loop can be fine — but every entry is
    * something a reviewer should have consciously accepted.
    */
  def warnings: Seq[String] = {
    val w = Seq.newBuilder[String]
    if (cartesianProducts > 0)
      w += s"$cartesianProducts cartesian product(s): O(NxM) row explosion at scale"
    if (largeNestedLoopJoins > 0)
      w += s"$largeNestedLoopJoins nested-loop join(s) with a non-tiny (or " +
        "unmeasured) build side: per-row probe of the other side"
    if (finalAggregates > partialAggregates)
      w += s"$finalAggregates final aggregate(s) over only $partialAggregates " +
        "partial(s): some shuffle carries raw rows, not combined state"
    w.result()
  }
}

/** Plan introspection for scale reviews and tests: execute a frame,
  * settle AQE, and report the structural counts that decide whether
  * the plan survives a 100x scale-up. The OPS-inspired review loop —
  * "is the shuffle carrying pre-combined state? did the filter reach
  * the scan? is the small side broadcast?" — as a library call
  * instead of an eyeball pass over `.explain`.
  */
object PlanAudit {

  /** Final (adaptive) physical plan after executing `df`. Execution
    * is required twice over: AQE plans are placeholders until run, and
    * the per-node SQLMetrics the audit reads (broadcast side rows)
    * only populate on execution. The frame's OWN plan tree must be the
    * one executed — a `df.write.format("noop")` drain builds a
    * SEPARATE QueryExecution, leaving this tree's metrics at their
    * unset defaults — so drive `queryExecution.toRdd` directly (rows
    * stay internal, nothing materializes on the driver).
    */
  def executedPlan(df: DataFrame): SparkPlan = {
    df.queryExecution.toRdd.count()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  def audit(df: DataFrame): PlanReport = report(executedPlan(df))

  /** Every node of the executed plan INCLUDING what hides inside AQE
    * query stages. Under adaptive execution (the production default)
    * a settled plan is a tree of `QueryStageExec` LEAVES — a plain
    * `plan.collect` sees only stage shells and reports zero scans,
    * zero joins, zero everything (measured: an audit of a parquet
    * groupBy under AQE returned all-zero counts). So: recurse into
    * `QueryStageExec.plan`, follow `ReusedExchangeExec.child` (reuse
    * counts once per consumer — each use is real work the consumer
    * depends on), and unwrap nested adaptive plans (subquery stages).
    * Subquery plans (scalar / IN) hang off EXPRESSIONS, not children —
    * `plan.subqueries` — so a scan or join inside a subquery would
    * otherwise be invisible to the audit and a subquery-shaped scale
    * smell would pass the sweep silently.
    */
  private[graft] def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val through = (p match {
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case other => other.children
    }) ++ p.subqueries
    p +: through.flatMap(allNodes)
  }

  /** A broadcast side at or under this many rows is a scalar/dimension
    * frame (1-row cutpoints, a centroid block, a query block) — a
    * nested-loop against it is a map-side constant join, not a scale
    * smell.
    */
  val TinyBroadcastRows = 1024L

  /** Post-execution row count of a nested-loop join's broadcast build
    * side, read off the exchange's metrics (seen through query stages
    * and exchange reuse); None when the plan wasn't executed (treated
    * as not-tiny: unmeasured is unproven).
    */
  private def buildSideRows(j: BroadcastNestedLoopJoinExec): Option[Long] = {
    val side = j.buildSide match {
      case BuildLeft => j.left
      case BuildRight => j.right
    }
    allNodes(side).collectFirst { case b: BroadcastExchangeExec => b }
      .flatMap(b => scala.util.Try(b.metrics("numOutputRows").value).toOption)
      .filter(_ >= 0)
  }

  /** Counts over an already-executed plan (no re-execution). */
  def report(plan: SparkPlan): PlanReport = {
    val nodes = allNodes(plan)
    val scans = nodes.collect { case s: FileSourceScanExec => s }
    val nlJoins = nodes.collect { case j: BroadcastNestedLoopJoinExec => j }
    PlanReport(
      scans = scans.size,
      scansWithPushedFilters = scans.count(_.dataFilters.nonEmpty),
      shuffleExchanges = nodes.collect { case e: ShuffleExchangeExec => e }.size,
      broadcastExchanges = nodes.collect { case e: BroadcastExchangeExec => e }.size,
      broadcastJoins = nodes.collect { case j: BroadcastHashJoinExec => j }.size,
      shuffledJoins = nodes.collect {
        case j: SortMergeJoinExec => j
        case j: ShuffledHashJoinExec => j
      }.size,
      nestedLoopJoins = nlJoins.size,
      largeNestedLoopJoins =
        nlJoins.count(j => !buildSideRows(j).exists(_ <= TinyBroadcastRows)),
      cartesianProducts = nodes.collect { case j: CartesianProductExec => j }.size,
      // Complete / PartialMerge aggregate modes (single-stage or
      // objHashAgg fallback shapes) are deliberately counted by
      // NEITHER bucket: partial/final here mean the two halves of the
      // map-side-combine pair the pre-agg rule cares about.
      partialAggregates = nodes.collect {
        case a: BaseAggregateExec if a.aggregateExpressions.nonEmpty &&
          a.aggregateExpressions.forall(_.mode == Partial) => a
      }.size,
      finalAggregates = nodes.collect {
        case a: BaseAggregateExec if a.aggregateExpressions.exists(_.mode == Final) => a
      }.size,
      windows = nodes.collect { case w: WindowExec => w }.size)
  }
}
