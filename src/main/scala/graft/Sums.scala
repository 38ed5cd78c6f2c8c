package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.sum

/** Gradient-sum carrier with a production escape hatch — the
  * "two-level the sum" retune the SURVEY documents for the exact-GD
  * family (q50/q56/q57), made executable.
  *
  * Default (conf unset): gradient terms sum as int64 — exact and
  * order-independent inside each operator's documented row bound
  * (e.g. q50's 2²⁵ rows at 2⁻³⁸-unit terms). Beyond that bound the
  * int64 SUM itself can wrap. The opt-in: set [[TwoLevelConf]] true
  * on the session and every gradient sum runs two-level — Spark's
  * map-side partial aggregation still combines per task, but the
  * carrier is DECIMAL(38,0), whose exact 38-digit merge cannot wrap
  * for any feasible corpus (2⁶³-bounded terms × ~10¹⁸ rows < 10³⁸).
  * The mathematical integer is IDENTICAL on in-bounds corpora, and
  * every downstream `div` truncates the same way, so results are
  * bit-identical with the knob on or off (spec-pinned) — the knob
  * trades a slower aggregation carrier for unbounded row counts,
  * exactly like [[Ckpt]] trades a write for executor-loss survival.
  */
object Sums {
  /** Session conf key: when "true", gradient sums carry DECIMAL(38,0). */
  val TwoLevelConf = "graft.sum.twolevel"

  /** The GD family's single gradient-sum point: the summed term is
    * the PRODUCT of `factors`, built here so the knob can protect the
    * whole chain. Default (conf unset): plain int64 multiply + int64
    * SUM — exact inside each operator's documented row/term bound.
    * Under [[TwoLevelConf]], the FIRST factor is cast to
    * DECIMAL(38,0) before the multiply, so the per-term product
    * (e.g. residual × feature, where each factor alone is
    * 2³¹-bounded but the int64 product of three could wrap) and the
    * SUM both carry exact 38-digit decimals — two 2⁶³-bounded
    * factors' product (< 10³⁸) cannot wrap the carrier.
    *
    * The conf is read ONCE, at plan-build time: flipping
    * [[TwoLevelConf]] mid-session does not change already-built
    * frames — rebuild the query (call the operator again) after
    * setting it.
    */
  def gradSum(spark: SparkSession, factors: Column*): Column = {
    require(factors.nonEmpty, "gradSum needs at least one factor")
    val twoLevel =
      spark.conf.getOption(TwoLevelConf).exists(_.equalsIgnoreCase("true"))
    val head =
      if (twoLevel) factors.head.cast("decimal(38,0)") else factors.head
    sum(factors.tail.foldLeft(head)(_ * _))
  }
}
