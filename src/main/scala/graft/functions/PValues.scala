package graft.functions

/** Deterministic cross-engine p-value expression trees.
  *
  * The reference's test surface returns a `pValue` beside every
  * statistic (reference: /root/reference/mllib/src/main/scala/org/
  * apache/spark/mllib/stat/test/KolmogorovSmirnovTest.scala:1,
  * ChiSqTest.scala:1, StreamingTest.scala:1); graft's stats keys
  * (q53/q54/q58/q59/t27/t29) until round 16 stopped at exact
  * integer statistics with the CDF map documented as a consumer
  * residual. This object closes that delta with the q60TreeSql
  * posture: each CDF is ONE closed-form SQL text over already-exact
  * inputs (tick-quantized statistics and integer counts),
  * interpolated VERBATIM into both the DataFrame plan (`expr`) and
  * the DuckDB oracle, so the two engines evaluate the identical
  * IEEE double tree and cannot drift beyond the last-ulp libm
  * differences that `round(_, 4)` already absorbs across the suite
  * (the t08 ln / g11 log2 precedent).
  *
  * No special functions are assumed of either engine: erfc is the
  * Abramowitz–Stegun 7.1.26 rational approximation (|err| <=
  * 1.5e-7, invisible at 4 decimals), the KS tail is its alternating
  * exponential series, the chi-squared survival is the textbook
  * finite sum for integer df (even: Poisson partial sums; odd: erfc
  * plus half-integer gamma terms), and the Student/Welch map is the
  * large-dof normal deflation z = t(1-1/(4v))/sqrt(1+t^2/(2v))
  * (classic A&S 26.7.8 posture; relative error < 1e-4 for dof >=
  * 50 — the corpus dofs are 10^2..10^4 — and the SPEC pins textbook
  * quantiles at 3 decimals, the documented accuracy of the map).
  *
  * Every builder takes SQL sub-expressions by TEXT (normally bare
  * column names bound by a prior withColumn / CTE — the builders
  * duplicate their argument, so callers must pass cheap
  * expressions) and returns SQL text valid in both Spark SQL and
  * DuckDB: only `+ - * /` on doubles, `exp`, `sqrt`, `power`,
  * `least/greatest`, `CASE`, and integer comparisons appear.
  */
object PValues {

  /** A&S 7.1.26 erfc(x) for x >= 0 (callers pass non-negative
    * arguments by construction: |z| forms). Horner order fixed.
    */
  def erfcSql(x: String): String = {
    val t = s"(1.0 / (1.0 + 0.3275911 * ($x)))"
    s"(((((1.061405429 * $t - 1.453152027) * $t + 1.421413741) * $t " +
      s"- 0.284496736) * $t + 0.254829592) * $t * exp(-($x) * ($x)))"
  }

  /** Two-sided normal tail of |z|: p = erfc(|z| / sqrt(2)). */
  def normTwoSidedSql(absZ: String): String =
    erfcSql(s"(($absZ) * 0.7071067811865476)")

  /** Kolmogorov asymptotic tail Q_KS(lambda) =
    * 2 * sum_{k>=1} (-1)^{k-1} exp(-2 k^2 lambda^2), truncated at
    * k = 24 (truncation < 1e-17 at the lambda >= 0.2 cutoff, below
    * which the alternating series is useless and the true tail is
    * 1 to >= 12 decimals — the Numerical Recipes probks posture).
    * Result clamped to [0, 1]; term order is the fixed k-ascending
    * left-associative chain in both engines.
    */
  def qksSql(lambda: String): String = {
    val terms = (1 to 24).map { k =>
      val sign = if (k % 2 == 1) "+" else "-"
      s"$sign exp(-2.0 * ${k * k}.0 * ($lambda) * ($lambda))"
    }.mkString(" ")
    s"(CASE WHEN ($lambda) < 0.2 THEN 1.0 " +
      s"ELSE least(1.0, greatest(0.0, 2.0 * (0.0 $terms))) END)"
  }

  /** KS effective-size inflation (Numerical Recipes):
    * lambda = (sqrt(ne) + 0.12 + 0.11 / sqrt(ne)) * D.
    */
  def ksLambdaSql(ne: String, d: String): String =
    s"((sqrt($ne) + 0.12 + 0.11 / sqrt($ne)) * ($d))"

  /** Series depth: supports integer df in [1, 2 * ChiTerms] — 80
    * covers every caller (t27's lang x source grid is df = 76).
    */
  private val ChiTerms = 40

  private def fmt(d: Double): String = {
    val s = d.toString
    if (s.contains('.') || s.contains('E') || s.contains('e')) s else s + ".0"
  }

  /** j! for j < ChiTerms, as literals both engines parse to the
    * identical double.
    */
  private val factorial: IndexedSeq[String] =
    (0 until ChiTerms).map(j => fmt((1 to j).foldLeft(1.0)(_ * _)))

  /** Gamma(j + 1/2) for j = 1..ChiTerms: Gamma(3/2) = sqrt(pi)/2,
    * Gamma(j+1/2) = (j-1/2) * Gamma(j-1/2).
    */
  private val gammaHalf: IndexedSeq[String] = {
    val out = Array.ofDim[Double](ChiTerms + 1)
    out(0) = math.sqrt(math.Pi)
    for (j <- 1 to ChiTerms) out(j) = (j - 0.5) * out(j - 1)
    (1 to ChiTerms).map(j => fmt(out(j)))
  }

  /** Chi-squared survival Q(x; df) for INTEGER df in [1, 40]
    * (beyond the cap: NULL, documented — every caller's df is a
    * small category count). Closed forms:
    * even df = 2m:  exp(-x/2) * sum_{j<m} (x/2)^j / j!
    * odd  df = 2m+1: erfc(sqrt(x/2))
    *                 + exp(-x/2) * sum_{j=1..m} (x/2)^{j-1/2} / Gamma(j+1/2)
    * x <= 0 reports 1. Both `x` and `df` must be cheap bound
    * expressions (they are duplicated per term).
    */
  def chi2SfSql(x: String, df: String): String = {
    val h = s"(($x) / 2.0)"
    val even = (0 until ChiTerms).map { j =>
      s"(CASE WHEN ${2 * j + 2} <= ($df) THEN power($h, $j.0) / ${factorial(j)} ELSE 0.0 END)"
    }.mkString(" + ")
    val odd = (1 to ChiTerms).map { j =>
      s"(CASE WHEN ${2 * j + 1} <= ($df) THEN power($h, ${fmt(j - 0.5)}) / ${gammaHalf(j - 1)} ELSE 0.0 END)"
    }.mkString(" + ")
    s"(CASE WHEN ($df) > ${2 * ChiTerms} THEN CAST(NULL AS DOUBLE) " +
      s"WHEN ($x) <= 0.0 THEN 1.0 " +
      // far-tail short-circuit: at x/2 > 350 the survival is < 1e-99
      // for every supported df, while exp(-h) underflows to 0 and the
      // power sum can reach Inf — 0 * Inf = NaN without this guard
      s"WHEN $h > 350.0 THEN 0.0 " +
      s"WHEN ($df) % 2 = 0 THEN least(1.0, exp(-$h) * ($even)) " +
      s"ELSE least(1.0, ${erfcSql(s"sqrt($h)")} + exp(-$h) * (0.0 + $odd)) END)"
  }

  /** Two-sided Student survival via the large-dof normal map:
    * z = |t| * (1 - 1/(4 dof)) / sqrt(1 + t^2 / (2 dof)),
    * p = erfc(z / sqrt 2). `t2` is t^2 (>= 0), `dof` > 0 a double.
    */
  def tTwoSidedSql(t2: String, dof: String): String = {
    val z = s"(sqrt($t2) * (1.0 - 1.0 / (4.0 * ($dof))) / " +
      s"sqrt(1.0 + ($t2) / (2.0 * ($dof))))"
    s"(CASE WHEN ($dof) <= 0.0 THEN CAST(NULL AS DOUBLE) " +
      s"ELSE ${normTwoSidedSql(z)} END)"
  }
}
