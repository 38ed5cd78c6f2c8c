package graft.plans

import org.apache.spark.sql.catalyst.expressions.{AttributeSet, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi, Cross, Inner, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** OPS-inspired shuffle minimization at the logical-plan level
  * (SURVEY §2 infra; the reference's core idea is reduce-side
  * merge-skip enabled by map-side pre-merge —
  * /root/reference/core/src/main/scala/org/apache/spark/shuffle/
  * OpsShuffleReader.scala:43-72). Two rewrites, both semantics-
  * preserving:
  *
  *  1. '''Semi/anti build-side pre-aggregation''': for
  *     `LEFT SEMI/ANTI JOIN`, only the EXISTENCE of a matching build
  *     row matters, so the build side is deduplicated on exactly the
  *     attributes the join condition references before it reaches the
  *     exchange. The dedup aggregate gets map-side partial
  *     aggregation for free, so the shuffle carries distinct keys
  *     instead of every build row — pre-combine before shuffle.
  *
  *  2. '''Provably-small-side broadcast hints''': joins whose build
  *     side's logical size statistic is under
  *     `graft.broadcast.threshold` (default 8 MiB) get a BROADCAST
  *     hint, removing the shuffle entirely. This holds even when
  *     `spark.sql.autoBroadcastJoinThreshold` is disabled (-1), the
  *     common posture on large clusters where a mis-estimated
  *     broadcast is an OOM — the graft threshold is deliberately
  *     conservative and applies only to sides whose estimate is
  *     already final at optimization time.
  *
  * Kill switch: `graft.preagg.enabled=false`. Both rewrites are
  * idempotent (guards on existing Aggregate / existing hint), as
  * required inside the optimizer's fixed-point batch.
  */
object PreAggregateBeforeShuffleRule extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    SQLConf.get.getConfString("graft.preagg.enabled", "true").toBoolean

  private def broadcastThreshold: BigInt =
    BigInt(SQLConf.get.getConfString("graft.broadcast.threshold",
      (8L * 1024 * 1024).toString))

  private def deterministic(plan: LogicalPlan): Boolean =
    plan.find(n => !n.expressions.forall(_.deterministic)).isEmpty

  /** True iff `cond` is a conjunction of equalities, each comparing a
    * pure-left expression with a pure-right expression.
    */
  private def equiOnly(cond: Expression, left: LogicalPlan, right: LogicalPlan): Boolean = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(a, b) => conjuncts(a) ++ conjuncts(b)
      case other => Seq(other)
    }
    conjuncts(cond).forall {
      case EqualTo(a, b) =>
        (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
          (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      // (1) semi/anti: dedup the build side on its join keys.
      // Existence semantics are preserved: a left row matches some
      // build row iff it matches some distinct key combination.
      // Profitability guard: applied ONLY when the whole condition is
      // a conjunction of left=right equalities — a non-equi residual
      // (e.g. TPC-H q4's l_shipdate > o_orderdate) would drag extra
      // attributes into the grouping, making the build side nearly
      // distinct already and the pre-aggregate pure overhead
      // (measured: +0.9s on q04 at sf0.1 before this guard).
      case j @ Join(left, right, LeftSemi | LeftAnti, Some(cond), _)
          if !right.isInstanceOf[Aggregate] && !right.isInstanceOf[Distinct] &&
            !right.isStreaming && deterministic(right) && equiOnly(cond, left, right) =>
        // ColumnPruning (same fixed-point batch) may already have
        // narrowed the build side to exactly the key attributes — the
        // dedup is still the win (distinct keys ≪ all rows).
        val refs = right.output.filter(AttributeSet(cond.references).contains)
        if (refs.nonEmpty) j.copy(right = Aggregate(refs, refs, right))
        else hinted(j)

      case j: Join => hinted(j)
    }
  }

  /** Attach a BROADCAST hint to a provably-small build side when the
    * join type allows building on that side and no hint exists yet.
    */
  private def hinted(j: Join): Join = {
    if (j.hint.leftHint.nonEmpty || j.hint.rightHint.nonEmpty) return j
    // A streaming side's size estimate (e.g. a micro-batch
    // LocalRelation) says nothing about the stream; today streaming
    // strategies win before JoinSelection, but don't depend on that
    // ordering — mirror the isStreaming guard on the semi/anti branch.
    if (j.left.isStreaming || j.right.isStreaming) return j
    val bc = Some(HintInfo(strategy = Some(BROADCAST)))
    val canBuildRight = j.joinType match {
      case Inner | Cross | LeftOuter | LeftSemi | LeftAnti => true
      case _ => false
    }
    val canBuildLeft = j.joinType match {
      case Inner | Cross | RightOuter => true
      case _ => false
    }
    val rSmall = canBuildRight && j.right.stats.sizeInBytes <= broadcastThreshold
    val lSmall = canBuildLeft && j.left.stats.sizeInBytes <= broadcastThreshold
    if (rSmall && (!lSmall || j.right.stats.sizeInBytes <= j.left.stats.sizeInBytes))
      j.copy(hint = JoinHint(None, bc))
    else if (lSmall)
      j.copy(hint = JoinHint(bc, None))
    else j
  }
}
