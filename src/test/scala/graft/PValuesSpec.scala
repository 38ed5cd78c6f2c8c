package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PValues

/** Textbook pins for the shared p-value trees (PValues.scala): each
  * closed-form survival is evaluated as the engine evaluates it (the
  * literal SQL text through `spark.sql`) and checked against the
  * standard critical values. Tolerances state the DOCUMENTED
  * accuracy of each map: the KS series and chi-squared finite sums
  * are exact up to the A&S erfc rational approximation (1.5e-7);
  * the Student map is the large-dof normal deflation (A&S 26.7.8
  * posture), good to ~2e-3 at dof = 10 and ~1e-4 by dof = 120.
  */
class PValuesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def eval(sql: String): Double = {
    val r = spark.sql(s"SELECT CAST(($sql) AS DOUBLE) AS v").collect().head
    assert(!r.isNullAt(0), s"expected non-null: $sql")
    r.getDouble(0)
  }

  test("Kolmogorov tail: 5% / 1% critical values and the small-lambda clamp") {
    // P(K > 1.358) = 0.05, P(K > 1.628) = 0.01 (two-sample KS tables)
    assert(math.abs(eval(PValues.qksSql("1.358")) - 0.05) < 1e-3)
    assert(math.abs(eval(PValues.qksSql("1.628")) - 0.01) < 1e-3)
    // Q(0.5) = 0.9639 (series converges from above the cutoff)
    assert(math.abs(eval(PValues.qksSql("0.5")) - 0.9639) < 5e-4)
    // below the alternating-series cutoff the true tail is 1 to
    // >= 12 decimals; the clamp must report exactly 1
    assert(eval(PValues.qksSql("0.1")) == 1.0)
    assert(eval(PValues.qksSql("0.0")) == 1.0)
  }

  test("normal two-sided tail: z_{0.975} and z_{0.995}") {
    assert(math.abs(eval(PValues.normTwoSidedSql("1.959964")) - 0.05) < 1e-3)
    assert(math.abs(eval(PValues.normTwoSidedSql("2.575829")) - 0.01) < 1e-3)
    assert(math.abs(eval(PValues.normTwoSidedSql("0.0")) - 1.0) < 1e-6)
  }

  test("chi-squared survival: 5% critical values across odd/even df, " +
    "edge and cap behavior") {
    // chi2_{0.95, df}: 3.841 (1), 5.991 (2), 7.815 (3), 9.488 (4),
    // 18.307 (10), 31.410 (20)
    for ((x, df) <- Seq(("3.841", 1), ("5.991", 2), ("7.815", 3),
      ("9.488", 4), ("18.307", 10), ("31.410", 20)))
      assert(math.abs(eval(PValues.chi2SfSql(x, df.toString)) - 0.05) < 1e-3,
        s"df=$df")
    // 1% tail, both parities
    assert(math.abs(eval(PValues.chi2SfSql("6.635", "1")) - 0.01) < 1e-3)
    assert(math.abs(eval(PValues.chi2SfSql("9.210", "2")) - 0.01) < 1e-3)
    // t27's actual df (lang x source grid = 76): 5% critical value
    // 97.35 by Wilson–Hilferty
    assert(math.abs(eval(PValues.chi2SfSql("97.35", "76")) - 0.05) < 2e-3)
    // x <= 0 reports 1; df beyond the series cap reports NULL; the
    // far-tail short-circuit reports a clean 0, not NaN
    assert(eval(PValues.chi2SfSql("0.0", "7")) == 1.0)
    assert(eval(PValues.chi2SfSql("800.0", "76")) == 0.0)
    val capped = spark.sql(
      s"SELECT ${PValues.chi2SfSql("10.0", "81")} AS v").collect().head
    assert(capped.isNullAt(0), "df > 80 must report NULL")
  }

  test("Student two-sided survival (large-dof map): 5% critical values") {
    // t_{0.975, 120} = 1.9799 -> p = 0.05 (map error ~1e-4 here)
    val t120 = 1.9799 * 1.9799
    assert(math.abs(eval(PValues.tTwoSidedSql(t120.toString, "120.0")) - 0.05)
      < 1e-3)
    // t_{0.975, 10} = 2.2281 -> p = 0.05 within the documented ~2e-3
    val t10 = 2.2281 * 2.2281
    assert(math.abs(eval(PValues.tTwoSidedSql(t10.toString, "10.0")) - 0.05)
      < 5e-3)
    // dof guard
    val bad = spark.sql(
      s"SELECT ${PValues.tTwoSidedSql("4.0", "0.0")} AS v").collect().head
    assert(bad.isNullAt(0))
  }

  test("report keys carry p-values in [0, 1], non-null, deterministic") {
    val sfDir = "/root/testdata/sf0.001"
    import graft.operators.{Events => Ev, TextAnalysis => Tx}
    val ks = Ev.q53KsTest(spark, sfDir).collect()
    assert(ks.nonEmpty && ks.forall { r =>
      val p = r.getDouble(r.fieldIndex("p_value")); p >= 0.0 && p <= 1.0 })
    val ku = Ev.q58KsUniform(spark, sfDir).collect()
    assert(ku.nonEmpty && ku.forall { r =>
      val p = r.getDouble(r.fieldIndex("p_value")); p >= 0.0 && p <= 1.0 })
    val mw = Ev.q54RankSum(spark, sfDir).collect()
    assert(mw.nonEmpty && mw.forall { r =>
      val p = r.getDouble(r.fieldIndex("p_value")); p >= 0.0 && p <= 1.0 })
    val tt = Ev.q59TTest(spark, sfDir).collect()
    assert(tt.nonEmpty && tt.forall { r =>
      val ps = r.getDouble(r.fieldIndex("p_student"))
      val pw = r.getDouble(r.fieldIndex("p_welch"))
      ps >= 0.0 && ps <= 1.0 && pw >= 0.0 && pw <= 1.0 })
    val c2 = Tx.t27Chi2(spark, sfDir).collect()
    assert(c2.nonEmpty && c2.forall { r =>
      val p = r.getDouble(r.fieldIndex("p_value")); p >= 0.0 && p <= 1.0 })
    // t27's test is one test: p constant across the report's rows
    assert(c2.map(_.getDouble(c2.head.fieldIndex("p_value"))).distinct.length == 1)
    val cs = Tx.t29Chi2Select(spark, sfDir).collect()
    assert(cs.nonEmpty && cs.forall { r =>
      val p = r.getDouble(r.fieldIndex("p_value")); p >= 0.0 && p <= 1.0 })
    // a bigger statistic never gets a bigger p (monotone survival;
    // t29's rows share one df)
    val byStat = cs.map(r => (r.getLong(r.fieldIndex("chi2_ticks")),
      r.getDouble(r.fieldIndex("p_value")))).sortBy(-_._1)
    assert(byStat.sliding(2).forall {
      case Array((_, p1), (_, p2)) => p1 <= p2; case _ => true })
    assert(ks.toSeq == Ev.q53KsTest(spark, sfDir).collect().toSeq)
  }
}
