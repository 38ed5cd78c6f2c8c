package graft.operators

import graft.Ckpt._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** s13: ALS-style matrix factorization over the customer×supplier
  * purchase matrix — the recommendation workload the reference ships
  * as ALS (reference: /root/reference/mllib/src/main/scala/org/
  * apache/spark/mllib/recommendation/ALS.scala:1), re-expressed as
  * partial-agg'd Gram sums + an unrolled per-entity normal-equation
  * solve instead of a block-to-block in-core solver.
  *
  * The model: implicit ratings r(c,s) = line count between customer c
  * and supplier s; rank-[[AlsRank]] factors; [[AlsIters]] alternating
  * rounds (solve users from item factors, then items from user
  * factors), ridge term λ·n on the diagonal with λ = 1/4
  * (weighted-λ ALS — the per-entity system is `(Σ v vᵀ + λ n I) x =
  * Σ r v` over the entity's rated counterparts).
  *
  * Determinism contract — the novel part. ALS is float arithmetic end
  * to end, yet s13 is hash-exact against the DuckDB oracle:
  *
  *  1. EXACT AGGREGATION. Factors live on a dyadic grid: after every
  *     solve each coordinate is floor-quantized to [[AlsTicks]]ths
  *     (2^-12) and clamped to ±16 ([[AlsClampLo]]/[[AlsClampHi]]
  *     ticks). A product of two on-grid factors is an exact multiple
  *     of 2^-24 with numerator ≤ 2^32; a line-count-weighted factor
  *     has numerator ≤ 2^36. Summed over ≤ 2^17 counterpart rows,
  *     every Gram/rhs numerator stays ≤ 2^49 < 2^53 — the sums never
  *     round, so they are order-independent across partitionings,
  *     engines, and retries. (At corpus scales where an entity can
  *     have ≥ 2^21 counterparts the bound needs a coarser grid or a
  *     two-level segmented sum — the documented retune.)
  *  2. IDENTICAL SCALAR TREES. The 4×4 Cholesky solve is unrolled
  *     into the named single-assignment steps of [[solveSteps]], and
  *     BOTH engines evaluate those exact strings — Spark via
  *     `expr(...)` column-by-column, DuckDB via the generated nested
  *     SELECTs of [[alsOracleSql]]. IEEE-754 +,−,×,÷,sqrt are
  *     correctly rounded and neither engine reassociates or
  *     fma-contracts across expression nodes, so identical trees on
  *     identical (exact) inputs give bit-identical doubles; the
  *     positive ridge keeps every pivot ≥ √λ = 0.5, so no guard
  *     division is needed.
  *  3. The md5-seeded item init ([[initTick]]) is the d20/s04
  *     cross-engine tick draw: 5 hex chars mod 4096.
  *
  * Output: one row per entity — (node_type 'c'|'s', entity_key,
  * n_rated, f0_ticks..f3_ticks) with factors as integer ticks, so the
  * driver's hash compare covers every learned value exactly.
  *
  * Scale shape: each half-round is one shuffle — ratings join the
  * counterpart factor frame on its key (item factors are
  * broadcast-size in production: #items × rank doubles; the user-side
  * join shuffles on customer, which is ratings' natural partitioning
  * — and the Gram products partial-agg before the exchange, so the
  * shuffle carries rank²/2-wide combined state, not raw pairs). The
  * solve itself is a per-row expression chain after the aggregate:
  * embarrassingly parallel, no collect, no driver-side linear
  * algebra. Factor frames are ckpt'd per half-round (flat
  * lineage, the g01 lesson).
  */
object Recommend {

  /** Fixed factor rank — the [[solveSteps]] unrolling is
    * rank-specific, so this is a structural constant, not a knob.
    */
  private[graft] val AlsRank = 4

  /** Alternating rounds (user solve + item solve each). Fixed, not
    * convergence-tested, so the result is a pure function of the
    * corpus and the oracle unrolls exactly this many half-rounds.
    */
  private[graft] val AlsIters = 2

  /** Dyadic factor grid: coordinates are multiples of 1/4096 (2^-12). */
  private[graft] val AlsTicks = 4096L

  /** Clamp bounds in ticks: |factor| ≤ 16. */
  private[graft] val AlsClampLo = -65536L
  private[graft] val AlsClampHi = 65535L

  /** The unrolled (Σ v vᵀ + n/4·I) x = b rank-4 Cholesky solve as
    * named single-assignment steps over columns
    * n, g00,g10,g11,g20,g21,g22,g30,g31,g32,g33, b0..b3 — the SAME
    * strings run in Spark (`expr`) and DuckDB (nested SELECT), which
    * is what makes the float solve bit-reproducible cross-engine.
    * Both dialects parse these identically: left-associative `-`,
    * `*` over `+`, correctly-rounded sqrt.
    */
  private[graft] val solveSteps: Seq[(String, String)] =
    solveStepsFor("0.25")

  /** [[solveSteps]] with the ridge coefficient as a parameter — the
    * p29 hyperparameter sweep solves the SAME Gram at several λ·n
    * ridges; every other caller uses the fixed-0.25 [[solveSteps]].
    * The coefficient string must be an exact dyadic literal so both
    * engines parse the identical double.
    */
  private[graft] def solveStepsFor(lamCoef: String): Seq[(String, String)] = Seq(
    "a00" -> s"g00 + CAST($lamCoef AS DOUBLE) * n",
    "a11" -> s"g11 + CAST($lamCoef AS DOUBLE) * n",
    "a22" -> s"g22 + CAST($lamCoef AS DOUBLE) * n",
    "a33" -> s"g33 + CAST($lamCoef AS DOUBLE) * n",
    "l00" -> "sqrt(a00)",
    "l10" -> "g10 / l00",
    "l20" -> "g20 / l00",
    "l30" -> "g30 / l00",
    "l11" -> "sqrt(a11 - l10 * l10)",
    "l21" -> "(g21 - l20 * l10) / l11",
    "l31" -> "(g31 - l30 * l10) / l11",
    "l22" -> "sqrt(a22 - l20 * l20 - l21 * l21)",
    "l32" -> "(g32 - l30 * l20 - l31 * l21) / l22",
    "l33" -> "sqrt(a33 - l30 * l30 - l31 * l31 - l32 * l32)",
    "y0" -> "b0 / l00",
    "y1" -> "(b1 - l10 * y0) / l11",
    "y2" -> "(b2 - l20 * y0 - l21 * y1) / l22",
    "y3" -> "(b3 - l30 * y0 - l31 * y1 - l32 * y2) / l33",
    "x3" -> "y3 / l33",
    "x2" -> "(y2 - l32 * x3) / l22",
    "x1" -> "(y1 - l21 * x2 - l31 * x3) / l11",
    "x0" -> "(y0 - l10 * x1 - l20 * x2 - l30 * x3) / l00") ++
    (0 until AlsRank).map(k =>
      s"t$k" -> (s"least(greatest(CAST(floor(x$k * CAST(4096.0 AS DOUBLE)) AS BIGINT), " +
        s"$AlsClampLo), $AlsClampHi)")) ++
    (0 until AlsRank).map(k => s"f$k" -> s"t$k / CAST(4096.0 AS DOUBLE)")

  /** Deterministic init tick for (entity expression, coordinate k):
    * 5 md5 hex chars mod 4096 — engine side. The DuckDB twin is in
    * [[alsOracleSql]]; parity is the proven d20 draw.
    */
  private def initTick(keyCol: Column, k: Int): Column =
    conv(substring(md5(concat(lit("als:"), keyCol.cast("string"),
      lit(s":$k"))), 1, 5), 16, 10).cast("long") % AlsTicks

  /** One half-round: given (key, r, f0..f3) — ratings joined to the
    * counterpart side's factors — aggregate the exact Gram/rhs sums
    * per key and run [[solveSteps]]. Returns (key, n_rated,
    * t0..t3, f0..f3), ckpt'd. Package-private: q49's
    * grouped ridge regression is the same Gram-solve over observed
    * features instead of learned factors.
    */
  private[graft] def solveSide(joined: DataFrame, key: String): DataFrame =
    solveGram(gramFor(joined, key), key, "0.25").ckpt(true)

  /** The exact Gram/rhs aggregation [[solveSide]] runs — factored
    * out so p29's hyperparameter sweep can pay for it ONCE and solve
    * at several ridges off the same aggregated frame.
    */
  private[graft] def gramFor(joined: DataFrame, key: String): DataFrame = {
    val gramCols: Seq[Column] =
      (for {
        i <- 0 until AlsRank; j <- 0 to i
      } yield sum(col(s"f$j") * col(s"f$i")).as(s"g$i$j")) ++
        (0 until AlsRank).map(k => sum(col("r") * col(s"f$k")).as(s"b$k"))
    joined.groupBy(col(key)).agg(count(lit(1)).as("n"), gramCols: _*)
  }

  /** [[solveStepsFor]] applied to an aggregated Gram frame — the
    * per-key expression chain, no shuffle. Not checkpointed (the
    * caller decides; solveSide keeps its historical ckpt).
    */
  private[graft] def solveGram(gram: DataFrame, key: String,
      lamCoef: String): DataFrame =
    solveStepsFor(lamCoef).foldLeft(gram) { case (df, (name, sql)) =>
      df.withColumn(name, expr(sql))
    }.select(Seq(col(key), col("n").as("n_rated")) ++
        (0 until AlsRank).map(k => col(s"t$k")) ++
        (0 until AlsRank).map(k => col(s"f$k")): _*)

  /** The alternating-solve core over an arbitrary (c, s, r) ratings
    * frame: md5-tick item init, [[AlsIters]] rounds of user/item
    * solves, returning the final (users, items) factor frames —
    * each (key, n_rated, t0..t3, f0..f3). Package-private so the
    * planted-structure and determinism specs can drive it with
    * synthetic matrices.
    */
  private[graft] def alsFactor(ratings: DataFrame): (DataFrame, DataFrame) = {
    var items = ratings.select(col("s")).distinct()
      .select(Seq(col("s")) ++
        (0 until AlsRank).map(k => initTick(col("s"), k).as(s"t$k")) ++
        (0 until AlsRank).map(k =>
          (initTick(col("s"), k) / lit(4096.0)).as(s"f$k")): _*)
      .ckpt(true)
    // Scale-adaptive build side (r16, [[graft.Engine.hintSmall]]):
    // the factor frames are checkpointed, so the planner sees default
    // stats and SMJ-shuffled the RATINGS frame on both half-round
    // joins; counting the eagerly-checkpointed entity frames is a
    // bounded driver scalar, and the row counts are round-invariant
    // (the key domains never change), so one count per side decides
    // every round's hint. Past the threshold the shuffle join stands
    // — the mllib block-ALS shape.
    val nItems = items.count()
    var users: DataFrame = null
    var nUsers = -1L
    for (i <- 1 to AlsIters) {
      users = solveSide(
        ratings.join(graft.Engine.hintSmall(
          items.select(Seq(col("s")) ++
            (0 until AlsRank).map(k => col(s"f$k")): _*), nItems), "s"), "c")
      if (i == 1) nUsers = users.count()
      items = solveSide(
        ratings.join(graft.Engine.hintSmall(
          users.select(Seq(col("c")) ++
            (0 until AlsRank).map(k => col(s"f$k")): _*), nUsers), "c"), "s")
    }
    (users, items)
  }

  /** Materialize-once customer×supplier purchase-count matrix per
    * (session, dir, fingerprint) — the ratings frame all three
    * factorization keys (s13/s15/s24) open with. Long counts;
    * the float consumers cast (a map, not a recompute).
    */
  private val purchaseMemo = new graft.FrameMemo[DataFrame]

  private[graft] def purchaseRatings(
      spark: SparkSession, sfDir: String): DataFrame =
    purchaseMemo.getOrCompute(spark, sfDir,
      Tables.fingerprint(spark, sfDir, "orders") + "|" +
        Tables.fingerprint(spark, sfDir, "lineitem") + "|purchase") {
      Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey").as("o_orderkey"), col("l_suppkey")),
          "o_orderkey")
        .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("s"))
        .agg(count(lit(1)).as("r"))
        .ckpt(true)
    }

  /** Materialize-once [[alsFactor]] run over the purchase matrix —
    * s13 reports the factors, s25 serves top-k from them, p19 scores
    * that serve list; one [[AlsIters]]-round solve backs all three
    * (the topicsMemo rationale). The ratings memo is computed BEFORE
    * entering this memo (the FrameMemo no-nested-compute contract).
    */
  private val factorsMemo = new graft.FrameMemo[(DataFrame, DataFrame)]

  private[graft] def purchaseFactors(
      spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    val ratings = purchaseRatings(spark, sfDir)
      .withColumn("r", col("r").cast("double"))
    factorsMemo.getOrCompute(spark, sfDir,
      Tables.fingerprint(spark, sfDir, "orders") + "|" +
        Tables.fingerprint(spark, sfDir, "lineitem") + "|alsfactors") {
      alsFactor(ratings)
    }
  }

  def s13AlsRecommend(spark: SparkSession, sfDir: String): DataFrame = {
    val (users, items) = purchaseFactors(spark, sfDir)
    def sideOut(df: DataFrame, tpe: String, key: String): DataFrame =
      df.select(Seq(lit(tpe).as("node_type"), col(key).as("entity_key"),
        col("n_rated")) ++
        (0 until AlsRank).map(k => col(s"t$k").as(s"f${k}_ticks")): _*)
    sideOut(users, "c", "c").unionByName(sideOut(items, "s", "s"))
      .orderBy(col("node_type"), col("entity_key"))
  }

  /** Ridge term added to each entity's rating count in [[s15BiasedMf]]'s
    * bias denominators (the Koren-style damped mean): b = Σresid /
    * (n + λ) with λ = [[BiasLambda]]. Integer, so the division is the
    * truncating `div` both engines share (negatives agree: DuckDB `//`
    * and Spark `div` both truncate toward zero).
    */
  private[graft] val BiasLambda = 4L

  /** s15: biased matrix factorization — the SVD++-family baseline
    * (Koren 2009's μ + b_u + b_i + p·q decomposition; the reference's
    * recommendation surface beyond plain ALS, mllib/recommendation/
    * ALS.scala:1 with implicit bias handling). Staged, all-integer
    * until the factor solve:
    *
    *  1. μ as GLOBAL tick mean: mu_ticks = (Σr · 4096) div n —
    *     positive integer division, exact cross-engine.
    *  2. Item bias: b_s_ticks = Σ(r·4096 − mu_ticks) div (n_s + λ) —
    *     the damped residual mean. All-long sums (exact), truncating
    *     div (both engines truncate toward zero, so negative
    *     numerators agree).
    *  3. User bias over the doubly-debiased residual: b_c_ticks =
    *     Σ(r·4096 − mu_ticks − b_s_ticks) div (n_c + λ).
    *  4. Residual ratings r' = (r·4096 − mu − b_s − b_c)/4096 — ON
    *     the dyadic grid, so [[alsFactor]]'s exact-sum contract holds
    *     verbatim (r'·f numerators ≤ 2^35 over 2^24, summed ≤ 2^17
    *     rows < 2^53) and the factor solve is the proven s13 path.
    *
    * The full SVD++ implicit-feedback term (Σ y_j per rating) needs a
    * per-rating vector sum over each user's item set — a second
    * rank-wide shuffle the bias+factor decomposition doesn't pay;
    * [[s28Svdpp]] implements it (and pays that shuffle).
    *
    * Output: (node_type 'c'|'s', entity_key, n_rated, bias_ticks,
    * f0..f3_ticks) — biases and factors all integer ticks, fully
    * hash-verified.
    *
    * Scale shape: stages 1-3 are partial-agg'd aggregations (one
    * 1-row broadcast, two key-shuffles on the ratings' own keys);
    * stage 4 joins item/user biases back — entity-keyed frames,
    * broadcast-size in production on the item side; then the s13
    * half-round cost profile.
    */
  def s15BiasedMf(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = purchaseRatings(spark, sfDir)
    val mu = raw.agg(expr(s"(sum(r) * ${AlsTicks}) div count(*)").as("m"))
    val bs = raw.crossJoin(broadcast(mu))
      .groupBy(col("s"))
      .agg(expr(s"sum(r * ${AlsTicks} - m)").as("num"), count(lit(1)).as("nn"))
      .withColumn("bsb", expr(s"num div (nn + $BiasLambda)"))
      .select(col("s"), col("bsb"))
    val bc = raw.crossJoin(broadcast(mu)).join(bs, "s")
      .groupBy(col("c"))
      .agg(expr(s"sum(r * ${AlsTicks} - m - bsb)").as("num"),
        count(lit(1)).as("nn"))
      .withColumn("bcb", expr(s"num div (nn + $BiasLambda)"))
      .select(col("c"), col("bcb"))
    val resid = raw.crossJoin(broadcast(mu)).join(bs, "s").join(bc, "c")
      .select(col("c"), col("s"),
        (expr(s"r * ${AlsTicks} - m - bsb - bcb").cast("double") /
          lit(AlsTicks.toDouble)).as("r"))
      .ckpt(true)
    val (users, items) = alsFactor(resid)
    def sideOut(df: DataFrame, biases: DataFrame, tpe: String, key: String,
        bcol: String): DataFrame =
      df.join(biases, key)
        .select(Seq(lit(tpe).as("node_type"), col(key).as("entity_key"),
          col("n_rated"), col(bcol).as("bias_ticks")) ++
          (0 until AlsRank).map(k => col(s"t$k").as(s"f${k}_ticks")): _*)
    sideOut(users, bc, "c", "c", "bcb")
      .unionByName(sideOut(items, bs, "s", "s", "bsb"))
      .orderBy(col("node_type"), col("entity_key"))
  }

  /** s16: node embeddings by factorizing g11's PPMI matrix with the
    * shared ALS core — the DeepWalk pipeline made literal
    * (g10 walks → g11 skip-gram PPMI → s16 matrix factorization;
    * Levy & Goldberg 2014 is the equivalence that makes this THE
    * embedding this corpus supports deterministically). The only new
    * contract point is the rating grid: PPMI ticks are 2⁻²⁰ but
    * [[alsFactor]]'s exact-sum bound wants coarser ratings, so s16
    * floor-coarsens to the 2⁻¹² grid (`ppmi_ticks div 256 / 4096`)
    * — |r| ≤ ~21 → r·f Gram numerators ≤ 2³²·2¹⁴ counterparts
    * < 2⁵³, the s13 bound restored. Output: one row per (side,
    * node) — row-side and column-side factors both reported, the
    * s13 shape with the composite node id decoded.
    */
  def s16WalkEmbeddings(spark: SparkSession, sfDir: String): DataFrame = {
    val ratings = Graph.walkPpmi(spark, sfDir)
      .select(col("a").as("c"), col("b").as("s"),
        (expr("(ppmi_ticks div 256)").cast("double") /
          lit(AlsTicks.toDouble)).as("r"))
      .ckpt(true)
    val (rows, cols) = alsFactor(ratings)
    def sideOut(df: DataFrame, side: String, key: String): DataFrame =
      df.select(Seq(lit(side).as("side"),
        when(col(key) % 2 === 0, lit("c")).otherwise(lit("s")).as("node_type"),
        expr(s"$key div 2").as("entity_key"), col("n_rated")) ++
        (0 until AlsRank).map(k => col(s"t$k").as(s"f${k}_ticks")): _*)
    sideOut(rows, "row", "c").unionByName(sideOut(cols, "col", "s"))
      .orderBy(col("side"), col("node_type"), col("entity_key"))
  }

  /** The DuckDB twin of [[s16WalkEmbeddings]]: the g11 pair CTEs
    * (passed in by SparkEntry, which owns the walk CTE text) feeding
    * a coarsened `ratings` CTE, then the shared [[alsRoundsSql]]
    * chain with a side-labelled final select.
    */
  private[graft] def s16OracleSql(pairCtes: String): String = {
    s"""WITH $pairCtes,
       |ratings AS (
       |  SELECT a AS c, b AS s,
       |    CAST(ppmi_ticks // 256 AS DOUBLE) / CAST($AlsTicks AS DOUBLE) AS r
       |  FROM sc WHERE ppmi_ticks > 0),
       |$alsRoundsSql
       |SELECT 'row' AS side,
       |  CASE WHEN c % 2 = 0 THEN 'c' ELSE 's' END AS node_type,
       |  c // 2 AS entity_key, CAST(n AS BIGINT) AS n_rated, $tickOutSql
       |FROM u$AlsIters
       |UNION ALL
       |SELECT 'col', CASE WHEN s % 2 = 0 THEN 'c' ELSE 's' END,
       |  s // 2, CAST(n AS BIGINT), $tickOutSql
       |FROM v$AlsIters
       |ORDER BY side, node_type, entity_key""".stripMargin
  }

  /** The DuckDB oracle: the SAME pipeline with the SAME
    * [[solveSteps]] strings, assembled as nested SELECTs (one per
    * single-assignment step) under plain CTEs — see the determinism
    * contract in the object doc.
    */
  private[graft] def alsOracleSql: String = {
    s"""WITH ratings AS (
       |  SELECT o_custkey AS c, l_suppkey AS s, CAST(count(*) AS DOUBLE) AS r
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |  GROUP BY 1, 2),
       |$alsRoundsSql
       |SELECT 'c' AS node_type, c AS entity_key, CAST(n AS BIGINT) AS n_rated, $tickOutSql
       |FROM u$AlsIters
       |UNION ALL
       |SELECT 's', s, CAST(n AS BIGINT), $tickOutSql FROM v$AlsIters
       |ORDER BY node_type, entity_key""".stripMargin
  }

  /** Tick output columns shared by both oracles. */
  private def tickOutSql: String = (0 until AlsRank)
    .map(k => s"CAST(t$k AS BIGINT) AS f${k}_ticks").mkString(", ")

  /** The [[solveSteps]] chain as nested DuckDB SELECTs over a gram
    * relation exposing (n, g00..g33, b0..b3) — shared by the ALS
    * oracles here and q49's ridge-regression oracle.
    */
  private[graft] def solveSqlNested(gramSql: String): String =
    solveSqlNestedFor(gramSql, "0.25")

  /** The nested-SELECT twin of [[solveStepsFor]] — p29's oracle
    * solves the same Gram at each grid ridge.
    */
  private[graft] def solveSqlNestedFor(gramSql: String,
      lamCoef: String): String =
    solveStepsFor(lamCoef).foldLeft(s"($gramSql)") {
      case (inner, (name, sql)) =>
        s"(SELECT *, $sql AS $name FROM $inner)"
    }

  /** The alternating-round CTE chain over a CTE named `ratings` —
    * v0 init plus the u1/v1..u[[AlsIters]]/v[[AlsIters]] solve pairs —
    * shared by [[alsOracleSql]] and [[biasedOracleSql]].
    */
  private def alsRoundsSql: String = {
    def solveSql(gramSql: String): String = solveSqlNested(gramSql)
    def initSql(k: Int): String =
      s"(('0x' || substr(md5('als:' || CAST(s AS VARCHAR) || ':$k'), 1, 5))" +
        s"::UBIGINT % 4096)"
    val gramSel =
      (for { i <- 0 until AlsRank; j <- 0 to i }
        yield s"sum(f$j * f$i) AS g$i$j").mkString(", ") + ", " +
        (0 until AlsRank).map(k => s"sum(r * f$k) AS b$k").mkString(", ")
    def fCols = (0 until AlsRank).map(k => s"f$k").mkString(", ")
    def userGram(itemRel: String) =
      s"SELECT c AS k, count(*) AS n, $gramSel " +
        s"FROM ratings JOIN $itemRel ON ratings.s = $itemRel.s GROUP BY c"
    def itemGram(userRel: String) =
      s"SELECT ratings.s AS k, count(*) AS n, $gramSel " +
        s"FROM ratings JOIN $userRel ON ratings.c = $userRel.c GROUP BY ratings.s"
    // each solved side keeps (key, n, ticks, on-grid factors)
    def solved(gram: String) =
      s"SELECT k, n, " +
        (0 until AlsRank).map(k => s"t$k").mkString(", ") + ", " + fCols +
        s" FROM ${solveSql(gram)}"
    val v0 = "SELECT DISTINCT s, " +
      (0 until AlsRank).map(k => s"${initSql(k)} / CAST(4096.0 AS DOUBLE) AS f$k")
        .mkString(", ") + " FROM ratings"
    // unroll the AlsIters alternating rounds as CTE pairs
    val rounds = (1 to AlsIters).flatMap { i =>
      val itemPrev = if (i == 1) "v0" else s"v${i - 1}"
      Seq(
        s"u$i AS (SELECT k AS c, n, " +
          (0 until AlsRank).map(k => s"t$k").mkString(", ") + s", $fCols " +
          s"FROM (${solved(userGram(itemPrev))}) u)",
        s"v$i AS (SELECT k AS s, n, " +
          (0 until AlsRank).map(k => s"t$k").mkString(", ") + s", $fCols " +
          s"FROM (${solved(itemGram(s"u$i"))}) v)")
    }
    s"v0 AS ($v0),\n${rounds.mkString(",\n")}"
  }

  /** Top terms reported per topic by [[t24TopicTerms]]. */
  private[graft] val TopicTermsK = 8

  /** Materialize-once doc×term factorization per (session, dir,
    * documents fingerprint) — t23 reads both factor sides, t24 ranks
    * the term side, and the [[AlsIters]]-round alternating solve is
    * the family's expensive derived computation (the bpeMemo
    * rationale). One compute backs both frames.
    */
  private val topicsMemo =
    new graft.FrameMemo[(DataFrame, DataFrame)]

  /** Persistent-RDD ids backing the live factorization memo — the
    * [[graft.FrameMemo]] bench-harness cleanup contract.
    */
  private[graft] def memoRetainedIds: Set[Int] =
    topicsMemo.retainedIds ++ purchaseMemo.retainedIds ++
      factorsMemo.retainedIds ++ serveMemo.retainedIds

  /** Drop the factorization memos and unpersist their blocks. */
  private[graft] def clearMemos(): Unit = {
    topicsMemo.clear(); purchaseMemo.clear(); factorsMemo.clear()
    serveMemo.clear()
  }

  /** The memoized doc×term count factorization behind t23/t24:
    * ratings r(doc, token) = term frequency, factorized by
    * [[alsFactor]] — (doc frame, term frame).
    */
  private[graft] def topicFactors(
      spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    graft.functions.registerAll(spark)
    topicsMemo.getOrCompute(spark, sfDir,
      Tables.fingerprint(spark, sfDir, "documents") + "|topics") {
      val ratings = Tables.documents(spark, sfDir)
        .select(col("doc_id"),
          explode(call_function("word_grams", lower(col("text")), lit(1)))
            .as("token"))
        .groupBy(col("doc_id").as("c"), col("token").as("s"))
        .agg(count(lit(1)).cast("double").as("r"))
        .ckpt(true)
      alsFactor(ratings)
    }
  }

  /** t23: topic decomposition of the document corpus — the
    * corpus-structure tool the reference ships as LDA (reference:
    * /root/reference/mllib/src/main/scala/org/apache/spark/mllib/
    * clustering/LDA.scala:1); here the DETERMINISTIC counterpart a
    * hash-verified engine can offer: factorize the doc×term count
    * matrix with the shared exact-ALS core ([[alsFactor]] — the s16
    * composition applied to the t07/t14 matrix), each of the
    * [[AlsRank]] latent axes playing a topic. Unconstrained least
    * squares rather than a Dirichlet posterior — stated honestly —
    * but the use a mixture pipeline makes of LDA (which documents
    * cluster, which terms co-drive an axis, domain balance) reads
    * off these factors the same way, and the planted-topics spec
    * pins the recovery. Ratings are exact small integers, so the
    * s13 determinism contract applies verbatim (token keys go
    * through the same md5 init draw — strings hash identically in
    * both engines).
    *
    * Output: (side 'doc'|'term', entity_key, n_rated,
    * f0..f3_ticks) — doc-topic and topic-term factors, fully
    * hash-verified.
    *
    * Scale shape: the s13 shape with terms as items — the term
    * factor frame is vocabulary-sized (broadcast in production);
    * each half-round shuffles the (doc, token, tf) frame once with
    * rank²/2-wide partial-agg'd state.
    */
  def t23Topics(spark: SparkSession, sfDir: String): DataFrame = {
    val (docs, terms) = topicFactors(spark, sfDir)
    def sideOut(df: DataFrame, side: String, keyCol: Column): DataFrame =
      df.select(Seq(lit(side).as("side"), keyCol.as("entity_key"),
        col("n_rated")) ++
        (0 until AlsRank).map(k => col(s"t$k").as(s"f${k}_ticks")): _*)
    sideOut(docs, "doc", col("c").cast("string"))
      .unionByName(sideOut(terms, "term", col("s")))
      .orderBy(col("side"), col("entity_key"))
  }

  /** t24: top terms per topic — the human-readable face of [[
    * t23Topics]] (LDA's describeTopics surface): for each latent
    * axis, the [[TopicTermsK]] terms with the largest factor ticks.
    *
    * The per-topic top-k does NOT window the vocabulary: factor
    * ticks are clamped integers, so the per-(topic, tick) COUNT
    * histogram is partial-agg'd first (the g09 bound), a bounded
    * cumulative window over distinct tick values finds the k-th
    * threshold, and only the ≤ k + ties rows above it reach the
    * final rank — a 10⁷-term vocabulary never funnels into one
    * window task. Output: (topic, rank, token, weight_ticks).
    */
  def t24TopicTerms(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (_, terms) = topicFactors(spark, sfDir)
    val tw = (0 until AlsRank).map(k =>
        terms.select(lit(k.toLong).as("topic"), col("s").as("token"),
          col(s"t$k").as("w")))
      .reduce(_ unionByName _)
    val hist = tw.groupBy(col("topic"), col("w")).agg(count(lit(1)).as("cnt"))
    val wh = Window.partitionBy(col("topic")).orderBy(col("w").desc)
    val thr = hist.withColumn("cum", sum(col("cnt")).over(wh))
      .filter(col("cum") - col("cnt") < TopicTermsK)
      .groupBy(col("topic")).agg(min(col("w")).as("wmin"))
    val wr = Window.partitionBy(col("topic"))
      .orderBy(col("w").desc, col("token"))
    tw.join(broadcast(thr), "topic")
      .filter(col("w") >= col("wmin"))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .filter(col("rank") <= TopicTermsK)
      .select(col("topic"), col("rank"), col("token"),
        col("w").as("weight_ticks"))
      .orderBy(col("topic"), col("rank"))
  }

  /** Shared tokenize + doc×term `ratings` CTEs for the topic
    * oracles.
    */
  private def topicRatingsCtes: String =
    """tok AS (
      |  SELECT doc_id,
      |    unnest(list_filter(regexp_split_to_array(lower(text), '[ \n\t\r]+'),
      |           t -> t <> '')) AS token
      |  FROM documents),
      |ratings AS (
      |  SELECT doc_id AS c, token AS s, CAST(count(*) AS DOUBLE) AS r
      |  FROM tok GROUP BY 1, 2)""".stripMargin

  /** The DuckDB twin of [[t23Topics]]. */
  private[graft] def topicsOracleSql: String =
    s"""WITH $topicRatingsCtes,
       |$alsRoundsSql
       |SELECT 'doc' AS side, CAST(c AS VARCHAR) AS entity_key,
       |  CAST(n AS BIGINT) AS n_rated, $tickOutSql
       |FROM u$AlsIters
       |UNION ALL
       |SELECT 'term', s, CAST(n AS BIGINT), $tickOutSql FROM v$AlsIters
       |ORDER BY side, entity_key""".stripMargin

  /** t32: batch topic inference for every document — the model-APPLY
    * face of t23 (reference: /root/reference/mllib/src/main/scala/
    * org/apache/spark/mllib/clustering/LDAModel.scala:1,
    * `topicDistributions` — score documents against trained topics)
    * executed as a distributed sparse matrix multiply (reference:
    * /root/reference/mllib/src/main/scala/org/apache/spark/mllib/
    * linalg/distributed/BlockMatrix.scala:1, `multiply`): C = A·B
    * with A the doc×term count matrix and B the term×topic tick
    * factors — the textbook SpGEMM plan: join on the INNER dimension
    * (term), partial-aggregate on the outer key (doc), so the
    * shuffle carries (doc, partial topic sums), never scored
    * triples. This is the batch twin of stream_topic_classify's
    * per-batch fold-in — same model, same OOV-drop contract, same
    * ties-to-smaller dominant-topic rule.
    *
    * Exactness: tf (long count) × factor ticks (clamped ≤ 2¹⁶) ≤
    * 2³¹ per term, summed over a document's terms — exact
    * order-independent longs to ~2³² tokens/doc. Dominant topic by
    * an explicit ≥-CASE (ties → smaller k), identical text both
    * engines.
    *
    * Scale shape: B is vocabulary-sized (broadcast in production);
    * ONE term-keyed join + one doc-keyed partial agg. At a 10⁹-term
    * vocabulary the join shuffles on term — exactly BlockMatrix's
    * inner-dimension co-partitioning.
    */
  def t32TopicInfer(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.registerAll(spark)
    val (_, terms) = topicFactors(spark, sfDir)
    val a = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(call_function("word_grams", lower(col("text")), lit(1)))
          .as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val b = terms.select(Seq(col("s").as("token")) ++
      (0 until AlsRank).map(k => col(s"t$k").cast("long").as(s"w$k")): _*)
    val dom = expr(
      """CASE WHEN s0 >= s1 AND s0 >= s2 AND s0 >= s3 THEN 0
        |WHEN s1 >= s2 AND s1 >= s3 THEN 1
        |WHEN s2 >= s3 THEN 2 ELSE 3 END""".stripMargin).cast("long")
    a.join(b, "token")
      .groupBy(col("doc_id"))
      .agg((0 until AlsRank).map(k =>
          sum(col("tf") * col(s"w$k")).as(s"s$k")).head,
        (0 until AlsRank).map(k =>
          sum(col("tf") * col(s"w$k")).as(s"s$k")).tail: _*)
      .select(Seq(col("doc_id"), dom.as("dominant_topic")) ++
        (0 until AlsRank).map(k => col(s"s$k").as(s"s${k}_ticks")): _*)
      .orderBy(col("doc_id"))
  }

  /** The DuckDB twin of [[t32TopicInfer]]: the shared topic chain,
    * then the SpGEMM join-aggregate and the identical dominant CASE.
    */
  private[graft] def topicInferOracleSql: String = {
    val sums = (0 until AlsRank).map(k =>
      s"CAST(sum(a.tf * CAST(v.t$k AS BIGINT)) AS BIGINT) AS s$k").mkString(", ")
    val outs = (0 until AlsRank).map(k => s"s$k AS s${k}_ticks").mkString(", ")
    s"""WITH $topicRatingsCtes,
       |$alsRoundsSql,
       |a AS (SELECT c AS doc_id, s AS token, CAST(r AS BIGINT) AS tf
       |      FROM ratings),
       |g AS (SELECT a.doc_id, $sums
       |      FROM a JOIN v$AlsIters v ON a.token = v.s GROUP BY 1)
       |SELECT doc_id,
       |  CAST(CASE WHEN s0 >= s1 AND s0 >= s2 AND s0 >= s3 THEN 0
       |  WHEN s1 >= s2 AND s1 >= s3 THEN 1
       |  WHEN s2 >= s3 THEN 2 ELSE 3 END AS BIGINT) AS dominant_topic,
       |  $outs
       |FROM g ORDER BY doc_id""".stripMargin
  }

  /** The DuckDB twin of [[t24TopicTerms]]: the shared chain, then
    * the histogram-threshold top-k.
    */
  private[graft] def topicTermsOracleSql: String = {
    val twSel = (0 until AlsRank).map(k =>
      s"SELECT CAST($k AS BIGINT) AS topic, s AS token, CAST(t$k AS BIGINT) AS w " +
        s"FROM v$AlsIters").mkString("\nUNION ALL\n")
    s"""WITH $topicRatingsCtes,
       |$alsRoundsSql,
       |tw AS MATERIALIZED (
       |$twSel),
       |hist AS (SELECT topic, w, CAST(count(*) AS BIGINT) AS cnt
       |         FROM tw GROUP BY 1, 2),
       |thr AS (SELECT topic, min(w) AS wmin FROM (
       |    SELECT topic, w, cnt,
       |      CAST(sum(cnt) OVER (PARTITION BY topic ORDER BY w DESC) AS BIGINT) AS cum
       |    FROM hist) h
       |  WHERE cum - cnt < $TopicTermsK GROUP BY topic)
       |SELECT topic, rank, token, weight_ticks FROM (
       |  SELECT tw.topic, tw.token, tw.w AS weight_ticks,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY tw.topic
       |      ORDER BY tw.w DESC, tw.token) AS BIGINT) AS rank
       |  FROM tw JOIN thr ON tw.topic = thr.topic AND tw.w >= thr.wmin)
       |WHERE rank <= $TopicTermsK
       |ORDER BY topic, rank""".stripMargin
  }

  /** Skip-gram window for [[t28WordVectors]] — context = tokens
    * within this many positions in the same document (word2vec's
    * window; [[graft.operators.Graph.SkipWindow]] is the same
    * constant over walks).
    */
  private[graft] val WordWindow = 2

  /** The scored word-PPMI pair frame (a, b, cnt, ppmi_ticks) behind
    * [[t28WordVectors]] — g11's scoring applied to TEXT: directed
    * within-window co-occurrence built by [[WordWindow]] positional
    * EQUI-joins (left tokens keyed on (doc, pos+d) against right
    * tokens on (doc, pos) — O(tokens·window) rows total, NEVER the
    * per-document self-join, whose cost is quadratic in document
    * length), symmetrized, partial-agg'd counts and marginals, one
    * log2 per distinct pair quantized to 2²⁰ ticks. The cnt·T
    * product shares g11's int64 bound and retune note (log-domain
    * form at corpus scale, both engines in lockstep).
    */
  /** The symmetrized within-window co-occurrence counts (a, b, cnt)
    * — the pair-build half of [[wordPpmi]], exposed so the spec can
    * pin the window semantics and the equi-join-equals-self-join
    * equivalence directly.
    */
  private[graft] def wordPairs(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.registerAll(spark)
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), posexplode(
        call_function("word_grams", lower(col("text")), lit(1))))
      .toDF("doc_id", "pos", "tok")
    val pd = (1 to WordWindow).map { d =>
      toks.select(col("doc_id"), (col("pos") + lit(d)).as("jpos"),
          col("tok").as("a"))
        .join(toks.select(col("doc_id"), col("pos").as("jpos"),
          col("tok").as("b")), Seq("doc_id", "jpos"))
        .select(col("a"), col("b"))
    }.reduce(_ unionByName _)
    // directed counts FIRST, then symmetrize the aggregated frame
    // (r16): the old self-union planned the un-checkpointed pd
    // subtree — all WordWindow positional joins — TWICE, and shuffled
    // the raw 2×(tokens·window) rows into the group-by. Aggregating
    // the directed pairs once, exploding both directions of the
    // (distinct-pair-sized) counts, and summing is the same multiset:
    // count over mirrored rows ≡ sum of directed counts both ways
    // (a = b rows contribute twice on both shapes).
    val dir = pd.groupBy(col("a"), col("b")).agg(count(lit(1)).as("cnt"))
    dir.select(explode(array(
        struct(col("a"), col("b"), col("cnt")),
        struct(col("b").as("a"), col("a").as("b"), col("cnt")))).as("x"))
      .select(col("x.a").as("a"), col("x.b").as("b"), col("x.cnt").as("cnt"))
      .groupBy(col("a"), col("b")).agg(sum(col("cnt")).as("cnt"))
  }

  private[graft] def wordPpmi(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = wordPairs(spark, sfDir).ckpt(true)
    val tot = pairs.agg(sum(col("cnt")).as("t"))
    val ma = pairs.groupBy(col("a")).agg(sum(col("cnt")).as("ca"))
    val mb = pairs.groupBy(col("b")).agg(sum(col("cnt")).as("cb"))
    pairs.join(ma, "a").join(mb, "b").crossJoin(broadcast(tot))
      .filter(col("cnt") >= 2)
      .withColumn("ppmi_ticks",
        floor(greatest(lit(0.0),
          log2((col("cnt") * col("t")) /
            (col("ca") * col("cb")).cast("double"))) *
          lit(1048576.0) + lit(0.5)).cast("long"))
      .filter(col("ppmi_ticks") > 0)
  }

  /** t28: word vectors over the document corpus — the reference's
    * Word2Vec surface (reference: /root/reference/mllib/src/main/
    * scala/org/apache/spark/mllib/feature/Word2Vec.scala:1) as the
    * count-based equivalent a hash-verified engine can offer:
    * skip-gram co-occurrence within [[WordWindow]] positions →
    * PPMI → the shared exact-ALS factorization (Levy & Goldberg
    * 2014: skip-gram with negative sampling implicitly factorizes
    * exactly this matrix — the same equivalence s16 uses for graph
    * nodes, here applied to the text itself). Ratings ride the s16
    * coarsening (ppmi_ticks div 256 onto the 2⁻¹² grid) so the s13
    * exact-sum contract holds verbatim; token keys go through the
    * md5 init draw (strings hash identically cross-engine — the
    * t23 term-side precedent).
    *
    * Output: (side 'word'|'ctx', token, n_rated, f0..f3_ticks) —
    * center- and context-side vectors, fully hash-verified.
    *
    * Scale shape: tokenization is one scan; the pair build is
    * positional equi-joins (linear, see [[wordPpmi]]); the
    * factorization is the s13 half-round cost profile with the
    * vocabulary as both sides (vocabulary-sized factor frames —
    * broadcast in production).
    */
  def t28WordVectors(spark: SparkSession, sfDir: String): DataFrame = {
    val ratings = wordPpmi(spark, sfDir)
      .select(col("a").as("c"), col("b").as("s"),
        (expr("(ppmi_ticks div 256)").cast("double") /
          lit(AlsTicks.toDouble)).as("r"))
      .ckpt(true)
    val (rows, cols) = alsFactor(ratings)
    def sideOut(df: DataFrame, side: String, key: String): DataFrame =
      df.select(Seq(lit(side).as("side"), col(key).as("token"),
        col("n_rated")) ++
        (0 until AlsRank).map(k => col(s"t$k").as(s"f${k}_ticks")): _*)
    sideOut(rows, "word", "c").unionByName(sideOut(cols, "ctx", "s"))
      .orderBy(col("side"), col("token"))
  }

  /** The DuckDB twin of [[t28WordVectors]]: positional tokenization
    * (1-based list indexes — only position DIFFERENCES matter, so
    * the 0-based Spark posexplode needs no alignment), the offset
    * joins, g11's scoring text, the s16 coarsening, then the shared
    * [[alsRoundsSql]] chain.
    */
  private[graft] def wordVectorsOracleSql: String = {
    val offs = (1 to WordWindow).map(d =>
      s"""SELECT x.tok AS a, y.tok AS b
         |  FROM tok x JOIN tok y
         |    ON x.doc_id = y.doc_id AND y.pos = x.pos + $d""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"""WITH tok AS MATERIALIZED (
       |  SELECT doc_id, u.tok AS tok, u.pos AS pos FROM (
       |    SELECT doc_id, unnest(list_transform(
       |      list_filter(regexp_split_to_array(lower(text), '[ \\n\\t\\r]+'),
       |                  t -> t <> ''),
       |      (x, i) -> struct_pack(tok := x, pos := i))) AS u
       |    FROM documents) e),
       |pd AS MATERIALIZED (
       |$offs),
       |sym AS (SELECT a, b FROM pd UNION ALL SELECT b AS a, a AS b FROM pd),
       |pr AS MATERIALIZED (
       |  SELECT a, b, CAST(count(*) AS BIGINT) AS cnt FROM sym GROUP BY 1, 2),
       |tt AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM pr),
       |ma AS (SELECT a, CAST(sum(cnt) AS BIGINT) AS ca FROM pr GROUP BY a),
       |mb AS (SELECT b, CAST(sum(cnt) AS BIGINT) AS cb FROM pr GROUP BY b),
       |sc AS MATERIALIZED (
       |  SELECT pr.a, pr.b, pr.cnt,
       |    CAST(floor(greatest(CAST(0.0 AS DOUBLE),
       |        log2((pr.cnt * tt.t) / CAST(ma.ca * mb.cb AS DOUBLE)))
       |      * 1048576.0 + 0.5) AS BIGINT) AS ppmi_ticks
       |  FROM pr JOIN ma ON pr.a = ma.a JOIN mb ON pr.b = mb.b, tt
       |  WHERE pr.cnt >= 2),
       |ratings AS (
       |  SELECT a AS c, b AS s,
       |    CAST(ppmi_ticks // 256 AS DOUBLE) / CAST($AlsTicks AS DOUBLE) AS r
       |  FROM sc WHERE ppmi_ticks > 0),
       |$alsRoundsSql
       |SELECT 'word' AS side, c AS token, CAST(n AS BIGINT) AS n_rated, $tickOutSql
       |FROM u$AlsIters
       |UNION ALL
       |SELECT 'ctx', s, CAST(n AS BIGINT), $tickOutSql FROM v$AlsIters
       |ORDER BY side, token""".stripMargin
  }

  /** The DuckDB twin of [[s15BiasedMf]]: the all-integer μ/item-bias/
    * user-bias tick stages as plain CTEs (truncating `//` everywhere
    * a Spark `div` runs), a residual `ratings` CTE on the dyadic
    * grid, then the shared [[alsRoundsSql]] chain and a bias-joined
    * final select.
    */
  private[graft] def biasedOracleSql: String = {
    s"""WITH raw AS (
       |  SELECT o_custkey AS c, l_suppkey AS s, CAST(count(*) AS BIGINT) AS r
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |  GROUP BY 1, 2),
       |mu AS (SELECT CAST(sum(r) * $AlsTicks AS BIGINT) // CAST(count(*) AS BIGINT) AS m
       |       FROM raw),
       |bs AS (SELECT s,
       |         CAST(CAST(sum(r * $AlsTicks - mu.m) AS BIGINT)
       |              // (CAST(count(*) AS BIGINT) + $BiasLambda) AS BIGINT) AS bsb
       |       FROM raw, mu GROUP BY s),
       |bc AS (SELECT c,
       |         CAST(CAST(sum(r * $AlsTicks - mu.m - bs.bsb) AS BIGINT)
       |              // (CAST(count(*) AS BIGINT) + $BiasLambda) AS BIGINT) AS bcb
       |       FROM raw JOIN bs ON raw.s = bs.s, mu GROUP BY c),
       |ratings AS (
       |  SELECT raw.c, raw.s,
       |    CAST(r * $AlsTicks - mu.m - bs.bsb - bc.bcb AS DOUBLE)
       |      / CAST($AlsTicks AS DOUBLE) AS r
       |  FROM raw JOIN bs ON raw.s = bs.s JOIN bc ON raw.c = bc.c, mu),
       |$alsRoundsSql
       |SELECT 'c' AS node_type, u$AlsIters.c AS entity_key,
       |  CAST(n AS BIGINT) AS n_rated, bc.bcb AS bias_ticks, $tickOutSql
       |FROM u$AlsIters JOIN bc ON u$AlsIters.c = bc.c
       |UNION ALL
       |SELECT 's', v$AlsIters.s, CAST(n AS BIGINT), bs.bsb, $tickOutSql
       |FROM v$AlsIters JOIN bs ON v$AlsIters.s = bs.s
       |ORDER BY node_type, entity_key""".stripMargin
  }

  /** s24: implicit-feedback ALS — the OTHER mode of the reference's
    * recommender (reference: /root/reference/mllib/src/main/scala/
    * org/apache/spark/mllib/recommendation/ALS.scala:1 with
    * implicitPrefs = true, i.e. Hu/Koren/Volinsky 2008): observations
    * are binary preferences p = 1 weighted by confidence c = 1 + α·r
    * (α = 1, r the line count), and every entity solves
    * (YᵀY + Yᵀ(C−I)Y + λ·n·I) x = Yᵀ C p over ALL items — not just
    * the rated ones. The Hu-Koren decomposition is what makes that
    * scale: YᵀY is ONE global rank²/2-wide partial-agg'd sum over the
    * counterpart factor frame (a 1-row broadcast), and the per-entity
    * correction Σ α·r·y yᵀ + rhs Σ (1+α·r)·y touch only the entity's
    * rated rows — so the half-round costs exactly the s13 shuffle
    * plus one tiny global aggregate.
    *
    * Determinism: the s13 contract extends verbatim — factors live on
    * the same dyadic 2^-12 grid, so YᵀY entries are exact multiples
    * of 2^-24 (numerator ≤ 2^32 per item, ≤ 2^49 summed over 2^17
    * items), the correction terms r·f_i·f_j are exact while an
    * entity's Σr stays under ~2^21 (the documented coarser-grid
    * retune beyond), the per-entity gram is the SUM of two exact
    * dyadic doubles, and the identical [[solveSteps]] scalar trees
    * run in both engines. Init uses an independent md5 stream
    * ('ials:' prefix) so the two ALS keys don't share a trajectory.
    *
    * Output: the s13 shape — (node_type 'c'|'s', entity_key, n_rated,
    * f0..f3_ticks), every learned value hash-verified.
    */
  private def initTickI(keyCol: Column, k: Int): Column =
    conv(substring(md5(concat(lit("ials:"), keyCol.cast("string"),
      lit(s":$k"))), 1, 5), 16, 10).cast("long") % AlsTicks

  /** One implicit half-round: entities keyed `key` solved against the
    * counterpart frame `other` (keyed `okey`) — global Gram broadcast
    * + rated-row corrections + the shared [[solveSteps]] chain.
    */
  private def implicitSolveSide(ratings: DataFrame, other: DataFrame,
      key: String, okey: String): DataFrame = {
    val fcols = (0 until AlsRank).map(k => col(s"f$k"))
    val ggCols = (for { i <- 0 until AlsRank; j <- 0 to i }
      yield sum(col(s"f$j") * col(s"f$i")).as(s"gg$i$j"))
    val gg = other.agg(ggCols.head, ggCols.tail: _*)
    val joined = ratings.join(
      other.select(Seq(col(okey)) ++ fcols: _*), okey)
    val corrCols = (for { i <- 0 until AlsRank; j <- 0 to i }
      yield sum(col("r") * col(s"f$j") * col(s"f$i")).as(s"c$i$j")) ++
      (0 until AlsRank).map(k =>
        sum((lit(1.0) + col("r")) * col(s"f$k")).as(s"b$k"))
    val corr = joined.groupBy(col(key))
      .agg(count(lit(1)).as("n"), corrCols: _*)
    val gram = (for { i <- 0 until AlsRank; j <- 0 to i } yield (i, j))
      .foldLeft(corr.crossJoin(broadcast(gg))) { case (df, (i, j)) =>
        df.withColumn(s"g$i$j", col(s"gg$i$j") + col(s"c$i$j"))
      }
    solveSteps.foldLeft(gram) { case (df, (name, sql)) =>
      df.withColumn(name, expr(sql))
    }.select(Seq(col(key), col("n").as("n_rated")) ++
        (0 until AlsRank).map(k => col(s"t$k")) ++
        (0 until AlsRank).map(k => col(s"f$k")): _*)
      .ckpt(true)
  }

  /** The implicit alternating-solve core over a (c, s, r) frame —
    * package-private for the planted-preference spec.
    */
  private[graft] def implicitFactor(ratings: DataFrame): (DataFrame, DataFrame) = {
    var items = ratings.select(col("s")).distinct()
      .select(Seq(col("s")) ++
        (0 until AlsRank).map(k => initTickI(col("s"), k).as(s"t$k")) ++
        (0 until AlsRank).map(k =>
          (initTickI(col("s"), k) / lit(4096.0)).as(s"f$k")): _*)
      .ckpt(true)
    var users: DataFrame = null
    for (_ <- 1 to AlsIters) {
      users = implicitSolveSide(ratings,
        items.select(Seq(col("s")) ++
          (0 until AlsRank).map(k => col(s"f$k")): _*), "c", "s")
      items = implicitSolveSide(ratings,
        users.select(Seq(col("c")) ++
          (0 until AlsRank).map(k => col(s"f$k")): _*), "s", "c")
    }
    (users, items)
  }

  def s24ImplicitAls(spark: SparkSession, sfDir: String): DataFrame = {
    val ratings = purchaseRatings(spark, sfDir)
      .withColumn("r", col("r").cast("double"))
    val (users, items) = implicitFactor(ratings)
    def sideOut(df: DataFrame, tpe: String, key: String): DataFrame =
      df.select(Seq(lit(tpe).as("node_type"), col(key).as("entity_key"),
        col("n_rated")) ++
        (0 until AlsRank).map(k => col(s"t$k").as(s"f${k}_ticks")): _*)
    sideOut(users, "c", "c").unionByName(sideOut(items, "s", "s"))
      .orderBy(col("node_type"), col("entity_key"))
  }

  /** The DuckDB twin of [[s24ImplicitAls]] — the implicit round chain
    * (global-Gram CTE + rated-row corrections + the shared
    * [[solveSqlNested]] scalar trees) unrolled [[AlsIters]] times.
    */
  private[graft] def implicitOracleSql: String = {
    val ggSel = (for { i <- 0 until AlsRank; j <- 0 to i }
      yield s"sum(f$j * f$i) AS gg$i$j").mkString(", ")
    val corrSel = (for { i <- 0 until AlsRank; j <- 0 to i }
      yield s"sum(r * f$j * f$i) AS c$i$j").mkString(", ") + ", " +
      (0 until AlsRank).map(k => s"sum((1 + r) * f$k) AS b$k").mkString(", ")
    val gSel = (for { i <- 0 until AlsRank; j <- 0 to i }
      yield s"gg$i$j + c$i$j AS g$i$j").mkString(", ")
    val bSel = (0 until AlsRank).map(k => s"b$k").mkString(", ")
    val fCols = (0 until AlsRank).map(k => s"f$k").mkString(", ")
    val tCols = (0 until AlsRank).map(k => s"t$k").mkString(", ")
    def initSql(k: Int): String =
      s"(('0x' || substr(md5('ials:' || CAST(s AS VARCHAR) || ':$k'), 1, 5))" +
        s"::UBIGINT % 4096)"
    def userCorr(itemRel: String) =
      s"SELECT c AS k, count(*) AS n, $corrSel " +
        s"FROM ratings JOIN $itemRel ON ratings.s = $itemRel.s GROUP BY c"
    def itemCorr(userRel: String) =
      s"SELECT ratings.s AS k, count(*) AS n, $corrSel " +
        s"FROM ratings JOIN $userRel ON ratings.c = $userRel.c GROUP BY ratings.s"
    def solved(corrSql: String, ggRel: String) =
      s"SELECT k, n, $tCols, $fCols FROM ${solveSqlNested(
        s"SELECT k, n, $gSel, $bSel FROM ($corrSql) corr CROSS JOIN $ggRel")}"
    val v0 = "SELECT DISTINCT s, " +
      (0 until AlsRank).map(k => s"${initSql(k)} / CAST(4096.0 AS DOUBLE) AS f$k")
        .mkString(", ") + " FROM ratings"
    val rounds = (1 to AlsIters).flatMap { i =>
      val itemPrev = if (i == 1) "v0" else s"v${i - 1}"
      Seq(
        s"ggu$i AS (SELECT $ggSel FROM $itemPrev)",
        s"u$i AS (SELECT k AS c, n, $tCols, $fCols " +
          s"FROM (${solved(userCorr(itemPrev), s"ggu$i")}) u)",
        s"ggv$i AS (SELECT $ggSel FROM u$i)",
        s"v$i AS (SELECT k AS s, n, $tCols, $fCols " +
          s"FROM (${solved(itemCorr(s"u$i"), s"ggv$i")}) v)")
    }
    s"""WITH ratings AS (
       |  SELECT o_custkey AS c, l_suppkey AS s, CAST(count(*) AS DOUBLE) AS r
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |  GROUP BY 1, 2),
       |v0 AS ($v0),
       |${rounds.mkString(",\n")}
       |SELECT 'c' AS node_type, c AS entity_key, CAST(n AS BIGINT) AS n_rated, $tickOutSql
       |FROM u$AlsIters
       |UNION ALL
       |SELECT 's', s, CAST(n AS BIGINT), $tickOutSql FROM v$AlsIters
       |ORDER BY node_type, entity_key""".stripMargin
  }

  /** Recommendations served per customer by [[s25RecommendTopk]]. */
  private[graft] val RecTopK = 5

  /** s25: the recommender SERVE path — top-[[RecTopK]] suppliers per
    * customer scored from the s13 factors (reference: /root/reference/
    * mllib/src/main/scala/org/apache/spark/mllib/recommendation/
    * MatrixFactorizationModel.scala:1, `recommendProducts` /
    * `recommendProductsForUsers`, which likewise scores EVERY item
    * for each user from the learned factors and keeps the top-k —
    * no rated-item filtering, matching mllib's semantics).
    *
    * Exactness: scores are pure integer tick dot products — factor
    * ticks are clamped to ±2¹⁶ ([[AlsClampLo]]/[[AlsClampHi]]), so
    * each product ≤ 2³² and the rank-[[AlsRank]] sum < 2³⁴: exact as
    * a long AND as the double handed to the bounded top-k aggregate
    * (< 2⁵³). Ranking = (score desc, supplier asc), the top_k_by_score
    * total order both engines replicate.
    *
    * Scale shape: the item side is the CATALOG — vocabulary-sized
    * (suppliers), broadcast whole; the customer side streams through
    * one scan with a map-side bounded k-heap (the top_k_by_score
    * partial aggregate), so serve cost is one pass over users ×
    * |catalog| with NO shuffle of scored pairs — the
    * recommendForAllUsers blocked-BLAS shape re-expressed
    * declaratively. At a 10⁸-item catalog the broadcast splits into
    * item blocks (the mllib blockify knob) — documented, not needed
    * at any test SF.
    */
  def s25RecommendTopk(spark: SparkSession, sfDir: String): DataFrame =
    servedTopkFull(spark, sfDir)

  /** Memo for the FULL served top-k frame — the r15 verdict's serve-
    * frame task: s25 reports it and p19 scores it, so the users ×
    * catalog scoring pass (the family's dominant cost — quadratic by
    * semantics, the recommendForAllUsers shape) ran once per KEY
    * instead of once per SWEEP. The served frame is tiny (users ×
    * [[RecTopK]] rows) so parking it is free; the memo covers the
    * FULL user set only — p28's 25% pre-serve sample stays its own
    * (cheaper) scan, because a single-entry memo keyed on the subset
    * would thrash between pct regimes mid-sweep, and sampling AFTER
    * a memoized full serve would erase exactly the pre-serve cost
    * shape p28 exists to pin.
    */
  private val serveMemo = new graft.FrameMemo[DataFrame]

  /** The memoized full serve (see [[serveMemo]]); factors are
    * computed BEFORE entering the memo (the FrameMemo
    * no-nested-compute contract).
    */
  private[graft] def servedTopkFull(
      spark: SparkSession, sfDir: String): DataFrame = {
    val (users, items) = purchaseFactors(spark, sfDir)
    serveMemo.getOrCompute(spark, sfDir,
      Tables.fingerprint(spark, sfDir, "orders") + "|" +
        Tables.fingerprint(spark, sfDir, "lineitem") + "|serve100") {
      serveTopk(users, items).ckpt(true)
    }
  }

  /** The serve scoring tail over arbitrary (c, t0..t3) user and
    * (s, t0..t3) item factor frames — shared by batch s25 and the
    * streaming serve twin (which passes the ARRIVING customers'
    * factor slice; the model and ranking rule are ONE code path).
    *
    * r17 rewrite (the blocked-dot serve, guide §1.2 per-task work):
    * the old shape materialized the FULL users × catalog cross join
    * (15 M rows at sf0.1) through a per-row heap update in the
    * top_k_by_score ObjectHashAggregate plus one exchange of the
    * partial heaps. Now the catalog flattens into ONE broadcast row
    * (stride [id, t0..t3] longs — vocabulary-sized, the same
    * "broadcast whole" contract as before; the 10⁸-item blockify
    * retune stands documented) and each user row makes a single
    * [[graft.functions.Kernels.alsServeTopk]] call — a codegen'd
    * catalog loop with a bounded insertion top-k, the SAME
    * (score desc, id asc) total order and exact long tick dots as
    * the aggregate it replaces (row-identical output, spec-pinned).
    * No exchange, no object agg, no 15 M-row materialization.
    */
  private[graft] def serveTopk(users: DataFrame, items: DataFrame): DataFrame = {
    graft.functions.registerAll(users.sparkSession)
    val u = users.select(col("c"),
      array((0 until AlsRank).map(k => col(s"t$k").cast("long")): _*).as("uv"))
    val itemsRow = items
      .select(array(Seq(col("s").cast("long")) ++
        (0 until AlsRank).map(k => col(s"t$k").cast("long")): _*).as("ia"))
      .agg(flatten(collect_list(col("ia"))).as("ia"))
    u.crossJoin(broadcast(itemsRow))
      .select(col("c"), call_function("als_serve_topk",
        col("uv"), col("ia"), lit(RecTopK)).as("top"))
      .select(col("c"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("c").as("o_custkey"), (col("pos") + 1).cast("long").as("rank"),
        col("t.id").as("l_suppkey"), col("t.score").cast("long").as("score_ticks24"))
      .orderBy(col("o_custkey"), col("rank"))
  }

  /** The DuckDB twin of [[s25RecommendTopk]]: the s13 rounds chain,
    * then every (customer, supplier) tick dot product ranked
    * (score desc, supplier asc) per customer and cut at [[RecTopK]].
    */
  /** The shared CTE chain ending in `rk` — every (customer, supplier)
    * tick dot product ranked (score desc, supplier asc) per customer.
    * Used by [[recTopkOracleSql]] and p19's ranking-metrics oracle.
    */
  private[graft] def recTopkCtes: String = {
    val dot = (0 until AlsRank)
      .map(k => s"CAST(u.t$k AS BIGINT) * CAST(v.t$k AS BIGINT)")
      .mkString(" + ")
    s"""ratings AS (
       |  SELECT o_custkey AS c, l_suppkey AS s, CAST(count(*) AS DOUBLE) AS r
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |  GROUP BY 1, 2),
       |$alsRoundsSql,
       |sc AS (
       |  SELECT u.c, v.s, $dot AS score
       |  FROM u$AlsIters u CROSS JOIN v$AlsIters v),
       |rk AS (
       |  SELECT * FROM (
       |    SELECT c, s, score,
       |      row_number() OVER (PARTITION BY c ORDER BY score DESC, s) AS rank
       |    FROM sc) ranked
       |  WHERE rank <= $RecTopK)""".stripMargin
  }

  private[graft] def recTopkOracleSql: String =
    s"""WITH $recTopkCtes
       |SELECT c AS o_custkey, CAST(rank AS BIGINT) AS rank,
       |  s AS l_suppkey, CAST(score AS BIGINT) AS score_ticks24
       |FROM rk
       |ORDER BY o_custkey, rank""".stripMargin

  /** Batch-GD rounds for [[s28Svdpp]] — fixed, unrolled by the
    * oracle.
    */
  private[graft] val SvdppIters = 2

  /** Tick clamp for every learned SVD++ quantity (the s13 bound). */
  private[graft] val SvdppClamp = 65536L

  /** s28: SVD++ — the implicit-feedback factor model s15 documents
    * as its extension point, and the reference's graph-library
    * recommender (reference: /root/reference/graphx/src/main/scala/
    * org/apache/spark/graphx/lib/SVDPlusPlus.scala:1, which runs
    * iterative gradient rounds over the rating graph; model: Koren
    * KDD'08 — r̂ = μ + b_c + b_s + q·(p + |N(c)|^-1/2 Σ_{j∈N(c)}
    * y_j)). The y_j term is what distinguishes SVD++ from s15: every
    * item a user TOUCHED contributes an implicit-feedback vector to
    * the user's representation, which is why each round pays the
    * documented SECOND rank-wide shuffle (y-sums per user forward,
    * per-user gradients redistributed to items backward — both keyed
    * by the ratings frame itself).
    *
    * Determinism contract (fully-quantized batch GD — the q50/q57
    * posture at rank [[AlsRank]]): everything lives on the 2⁻¹² tick
    * grid clamped ±[[SvdppClamp]]; per-rating quantities are exact
    * integer products staged through truncating power-of-two divs
    * BEFORE summation (gp = e24·q div 2²⁴ ≤ 2²⁶ — order-independent
    * long sums to 2³⁷ ratings, the eager form of the q50 gradient
    * retune); z = clamp(p + wu·ysum div 2¹²); e24 = r·2²⁴ − r̂24
    * exact. The ONLY non-integer inputs are model-entity values both
    * engines compute from identical integers by identical trees:
    * wu = floor(2¹²/√n_c) (one sqrt per user — the s13 per-entity
    * solve posture) and the 'svdpp:' md5 init ticks (p, q mod 2¹⁰;
    * y mod 2⁸ so first-round ysums stay bounded). Updates are
    * synchronous (one e-frame per round feeds ALL five gradient
    * aggregates), rates γ = 1/16 and shrink λ = 1/64 as fixed
    * power-of-two truncating divs; the y update normalizes by each
    * item's rating count (our documented variant of graphx's
    * per-edge accumulation — deterministic mean-gradient form).
    *
    * Scale shape per round: the e-frame is ratings-sized (built by
    * entity-keyed joins on the ratings' own keys, checkpointed once,
    * read by three partial-agg'd passes); the forward y-sum and
    * backward y-gradient are each ONE ratings-keyed shuffle carrying
    * rank-wide state — the second-shuffle price stated up front.
    * Models are entity frames; nothing is collected.
    *
    * Output: (node_type, entity_key, n_rated, bias_ticks,
    * f0..f3_ticks, y0..y3_ticks) — p for customers, q for suppliers,
    * y on the supplier rows (zeros on customers), fully
    * hash-verified.
    */
  private def svdppInit(tag: String, keyCol: Column, k: Int, mod: Long): Column =
    conv(substring(md5(concat(lit(s"svdpp:$tag:"), keyCol.cast("string"),
      lit(s":$k"))), 1, 5), 16, 10).cast("long") % mod

  private def clampT(c: Column): Column =
    least(greatest(c, lit(-SvdppClamp)), lit(SvdppClamp))

  def s28Svdpp(spark: SparkSession, sfDir: String): DataFrame =
    svdppCore(purchaseRatings(spark, sfDir))

  /** The SVD++ rounds over any (c, s, r) long-count ratings frame —
    * package-private for the planted-structure spec.
    */
  private[graft] def svdppCore(raw: DataFrame): DataFrame = {
    val mu = raw.agg(expr("(sum(r) * 4096) div count(*)").as("m"))
      .ckpt(true)
    val nc = raw.groupBy(col("c")).agg(count(lit(1)).as("n_c"))
      .withColumn("wu", expr(
        "CAST(floor(CAST(4096.0 AS DOUBLE) / sqrt(CAST(n_c AS DOUBLE))) AS BIGINT)"))
      .ckpt(true)
    val ns = raw.groupBy(col("s")).agg(count(lit(1)).as("n_s"))
      .ckpt(true)
    // merged model frames — ONE user frame (c, n_c, wu, bc, p) and
    // ONE item frame (s, n_s, bs, q, y): the static stats ride along
    // so each round is 3 e-frame joins + 2 model-update joins instead
    // of 7 + 5 (same arithmetic, same results — fewer stages)
    var userM = nc.select(Seq(col("c"), col("n_c"), col("wu"),
      lit(0L).as("bc")) ++ (0 until AlsRank).map(k =>
      svdppInit("p", col("c"), k, 1024L).as(s"p$k")): _*)
      .ckpt(true)
    var itemM = ns.select(Seq(col("s"), col("n_s"), lit(0L).as("bs")) ++
      (0 until AlsRank).map(k =>
        svdppInit("q", col("s"), k, 1024L).as(s"q$k")) ++
      (0 until AlsRank).map(k =>
        svdppInit("y", col("s"), k, 256L).as(s"y$k")): _*)
      .ckpt(true)
    // Scale-adaptive build side (r16, the alsFactor rationale): the
    // model frames are checkpointed (default stats — the ratings
    // frame SMJ-shuffled on EVERY per-round join); the entity counts
    // off the eager nc/ns checkpoints are round-invariant and bound
    // every c-/s-keyed round frame (ysum, uagg, yagg included: their
    // key domains are subsets), so two bounded driver scalars decide
    // all the hints for all rounds.
    val nUsers = nc.count()
    val nItems = ns.count()
    def hintU(df: DataFrame): DataFrame = graft.Engine.hintSmall(df, nUsers)
    def hintI(df: DataFrame): DataFrame = graft.Engine.hintSmall(df, nItems)
    for (_ <- 1 to SvdppIters) {
      val ysum = raw.join(hintI(itemM.select(Seq(col("s")) ++
          (0 until AlsRank).map(k => col(s"y$k")): _*)), "s")
        .groupBy(col("c"))
        .agg((0 until AlsRank).map(k => sum(col(s"y$k")).as(s"ys$k")).head,
          (0 until AlsRank).map(k => sum(col(s"y$k")).as(s"ys$k")).tail: _*)
      val zCols = (0 until AlsRank).map(k =>
        clampT(col(s"p$k") + expr(s"(wu * ys$k) div 4096")).as(s"z$k"))
      val joined0 = raw.join(hintU(userM), "c").join(hintI(itemM), "s")
        .join(hintU(ysum), "c")
        .crossJoin(broadcast(mu))
      val joined = (0 until AlsRank).foldLeft(joined0) { (df, k) =>
          df.withColumn(s"z$k", zCols(k))
        }
        .withColumn("rhat24", (col("m") + col("bc") + col("bs")) * lit(4096L) +
          (0 until AlsRank).map(k => col(s"q$k") * col(s"z$k")).reduce(_ + _))
        .withColumn("e24", col("r") * lit(16777216L) - col("rhat24"))
      val staged = (0 until AlsRank).foldLeft(joined) { (df, k) =>
          df.withColumn(s"gp$k", expr(s"(e24 * q$k) div 16777216"))
            .withColumn(s"gq$k", expr(s"(e24 * z$k) div 16777216"))
            .withColumn(s"vy$k", expr(s"((e24 * q$k) div 16777216) * wu div 4096"))
        }.ckpt(true)
      val uagg = staged.groupBy(col("c"))
        .agg(sum(col("e24")).as("se"),
          (0 until AlsRank).map(k => sum(col(s"gp$k")).as(s"sgp$k")) ++
            (0 until AlsRank).map(k => sum(col(s"vy$k")).as(s"sy$k")): _*)
        .ckpt(true)
      val iagg = staged.groupBy(col("s"))
        .agg(sum(col("e24")).as("se"),
          (0 until AlsRank).map(k => sum(col(s"gq$k")).as(s"sgq$k")): _*)
      val yagg = raw.join(hintU(uagg.select(Seq(col("c")) ++
          (0 until AlsRank).map(k => col(s"sy$k")): _*)), "c")
        .groupBy(col("s"))
        .agg((0 until AlsRank).map(k => sum(col(s"sy$k")).as(s"gy$k")).head,
          (0 until AlsRank).map(k => sum(col(s"sy$k")).as(s"gy$k")).tail: _*)
      userM = userM.join(uagg, "c")
        .select(Seq(col("c"), col("n_c"), col("wu"),
          clampT(col("bc") + expr("se div (16 * n_c * 4096)") -
            expr("bc div 64")).as("bc")) ++
          (0 until AlsRank).map(k =>
            clampT(col(s"p$k") + expr(s"sgp$k div (16 * n_c)") -
              expr(s"p$k div 64")).as(s"p$k")): _*)
        .ckpt(true)
      itemM = itemM.join(iagg, "s").join(yagg, "s")
        .select(Seq(col("s"), col("n_s"),
          clampT(col("bs") + expr("se div (16 * n_s * 4096)") -
            expr("bs div 64")).as("bs")) ++
          (0 until AlsRank).map(k =>
            clampT(col(s"q$k") + expr(s"sgq$k div (16 * n_s)") -
              expr(s"q$k div 64")).as(s"q$k")) ++
          (0 until AlsRank).map(k =>
            clampT(col(s"y$k") + expr(s"gy$k div (16 * n_s)") -
              expr(s"y$k div 64")).as(s"y$k")): _*)
        .ckpt(true)
    }
    val userOut = userM
      .select(Seq(lit("c").as("node_type"), col("c").as("entity_key"),
        col("n_c").as("n_rated"), col("bc").as("bias_ticks")) ++
        (0 until AlsRank).map(k => col(s"p$k").as(s"f${k}_ticks")) ++
        (0 until AlsRank).map(k => lit(0L).as(s"y${k}_ticks")): _*)
    val itemOut = itemM
      .select(Seq(lit("s").as("node_type"), col("s").as("entity_key"),
        col("n_s").as("n_rated"), col("bs").as("bias_ticks")) ++
        (0 until AlsRank).map(k => col(s"q$k").as(s"f${k}_ticks")) ++
        (0 until AlsRank).map(k => col(s"y$k").as(s"y${k}_ticks")): _*)
    userOut.unionByName(itemOut)
      .orderBy(col("node_type"), col("entity_key"))
  }

  /** The DuckDB twin of [[s28Svdpp]]: the batch-GD rounds unrolled —
    * identical md5 init, identical staged truncating-div arithmetic,
    * the per-user sqrt through the same tree.
    */
  private[graft] def svdppOracleSql: String = {
    val R = AlsRank
    def ks(f: Int => String): String = (0 until R).map(f).mkString(", ")
    def pin(tag: String, key: String, k: Int, mod: Long): String =
      s"CAST(('0x' || substr(md5('svdpp:$tag:' || CAST($key AS VARCHAR) " +
        s"|| ':$k'), 1, 5))::UBIGINT % $mod AS BIGINT)"
    def cl(x: String) = s"least(greatest($x, -$SvdppClamp), $SvdppClamp)"
    def roundCtes(r: Int): String = {
      val pv = r - 1
      s"""ys$r AS MATERIALIZED (
         |  SELECT ratings.c, ${ks(k => s"CAST(sum(y$pv.y$k) AS BIGINT) AS ys$k")}
         |  FROM ratings JOIN y$pv ON ratings.s = y$pv.s GROUP BY 1),
         |j$r AS MATERIALIZED (
         |  SELECT *, r * 16777216 - rhat24 AS e24 FROM (
         |    SELECT *, (m + bc + bs) * 4096
         |      + (${ks(k => s"q$k * z$k").replace(", ", " + ")}) AS rhat24
         |    FROM (
         |      SELECT base.*,
         |        ${ks(k => cl(s"p$k + (wu * ys$k) // 4096") + s" AS z$k")}
         |      FROM (
         |        SELECT ratings.c, ratings.s, ratings.r, nc.n_c, nc.wu,
         |          ns.n_s, bc$pv.bc, bs$pv.bs,
         |          ${ks(k => s"p$pv.p$k")}, ${ks(k => s"q$pv.q$k")},
         |          ${ks(k => s"ys$r.ys$k")}, (SELECT m FROM mu) AS m
         |        FROM ratings
         |        JOIN nc ON ratings.c = nc.c
         |        JOIN ns ON ratings.s = ns.s
         |        JOIN bc$pv ON ratings.c = bc$pv.c
         |        JOIN bs$pv ON ratings.s = bs$pv.s
         |        JOIN p$pv ON ratings.c = p$pv.c
         |        JOIN q$pv ON ratings.s = q$pv.s
         |        JOIN ys$r ON ratings.c = ys$r.c) base) z) rh),
         |g$r AS MATERIALIZED (
         |  SELECT *,
         |    ${ks(k => s"(e24 * q$k) // 16777216 AS gp$k")},
         |    ${ks(k => s"(e24 * z$k) // 16777216 AS gq$k")},
         |    ${ks(k => s"(((e24 * q$k) // 16777216) * wu) // 4096 AS vy$k")}
         |  FROM j$r),
         |ua$r AS MATERIALIZED (
         |  SELECT c, max(n_c) AS n_c, CAST(sum(e24) AS BIGINT) AS se,
         |    ${ks(k => s"CAST(sum(gp$k) AS BIGINT) AS sgp$k")},
         |    ${ks(k => s"CAST(sum(vy$k) AS BIGINT) AS sy$k")}
         |  FROM g$r GROUP BY c),
         |ia$r AS MATERIALIZED (
         |  SELECT s, max(n_s) AS n_s, CAST(sum(e24) AS BIGINT) AS se,
         |    ${ks(k => s"CAST(sum(gq$k) AS BIGINT) AS sgq$k")}
         |  FROM g$r GROUP BY s),
         |ya$r AS MATERIALIZED (
         |  SELECT ratings.s, ${ks(k => s"CAST(sum(ua$r.sy$k) AS BIGINT) AS gy$k")}
         |  FROM ratings JOIN ua$r ON ratings.c = ua$r.c GROUP BY 1),
         |bc$r AS MATERIALIZED (
         |  SELECT b.c, ${cl("b.bc + u.se // (16 * u.n_c * 4096) - b.bc // 64")} AS bc
         |  FROM bc$pv b JOIN ua$r u ON b.c = u.c),
         |bs$r AS MATERIALIZED (
         |  SELECT b.s, ${cl("b.bs + i.se // (16 * i.n_s * 4096) - b.bs // 64")} AS bs
         |  FROM bs$pv b JOIN ia$r i ON b.s = i.s),
         |p$r AS MATERIALIZED (
         |  SELECT pp.c,
         |    ${ks(k => cl(s"pp.p$k + u.sgp$k // (16 * u.n_c) - pp.p$k // 64") +
               s" AS p$k")}
         |  FROM p$pv pp JOIN ua$r u ON pp.c = u.c),
         |q$r AS MATERIALIZED (
         |  SELECT qq.s,
         |    ${ks(k => cl(s"qq.q$k + i.sgq$k // (16 * i.n_s) - qq.q$k // 64") +
               s" AS q$k")}
         |  FROM q$pv qq JOIN ia$r i ON qq.s = i.s),
         |y$r AS MATERIALIZED (
         |  SELECT yy.s,
         |    ${ks(k => cl(s"yy.y$k + ya.gy$k // (16 * ns.n_s) - yy.y$k // 64") +
               s" AS y$k")}
         |  FROM y$pv yy JOIN ya$r ya ON yy.s = ya.s
         |  JOIN ns ON yy.s = ns.s)""".stripMargin
    }
    val n = SvdppIters
    s"""WITH ratings AS MATERIALIZED (
       |  SELECT o_custkey AS c, l_suppkey AS s, CAST(count(*) AS BIGINT) AS r
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |  GROUP BY 1, 2),
       |mu AS MATERIALIZED (
       |  SELECT CAST((sum(r) * 4096) // count(*) AS BIGINT) AS m FROM ratings),
       |nc AS MATERIALIZED (
       |  SELECT c, CAST(count(*) AS BIGINT) AS n_c,
       |    CAST(floor(CAST(4096.0 AS DOUBLE)
       |      / sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS wu
       |  FROM ratings GROUP BY c),
       |ns AS MATERIALIZED (
       |  SELECT s, CAST(count(*) AS BIGINT) AS n_s FROM ratings GROUP BY s),
       |bc0 AS MATERIALIZED (SELECT c, CAST(0 AS BIGINT) AS bc FROM nc),
       |bs0 AS MATERIALIZED (SELECT s, CAST(0 AS BIGINT) AS bs FROM ns),
       |p0 AS MATERIALIZED (
       |  SELECT c, ${ks(k => pin("p", "c", k, 1024L) + s" AS p$k")} FROM nc),
       |q0 AS MATERIALIZED (
       |  SELECT s, ${ks(k => pin("q", "s", k, 1024L) + s" AS q$k")} FROM ns),
       |y0 AS MATERIALIZED (
       |  SELECT s, ${ks(k => pin("y", "s", k, 256L) + s" AS y$k")} FROM ns),
       |${(1 to n).map(roundCtes).mkString(",\n")}
       |SELECT 'c' AS node_type, bc$n.c AS entity_key,
       |  nc.n_c AS n_rated, bc$n.bc AS bias_ticks,
       |  ${ks(k => s"p$n.p$k AS f${k}_ticks")},
       |  ${ks(k => s"CAST(0 AS BIGINT) AS y${k}_ticks")}
       |FROM bc$n JOIN p$n ON bc$n.c = p$n.c JOIN nc ON bc$n.c = nc.c
       |UNION ALL
       |SELECT 's', bs$n.s, ns.n_s, bs$n.bs,
       |  ${ks(k => s"q$n.q$k")}, ${ks(k => s"y$n.y$k")}
       |FROM bs$n JOIN q$n ON bs$n.s = q$n.s JOIN y$n ON bs$n.s = y$n.s
       |JOIN ns ON bs$n.s = ns.s
       |ORDER BY node_type, entity_key""".stripMargin
  }

  /** Neighbor-list size for [[s32ItemKnn]] (top-M similar items per
    * item) and serve cut (top-K recommendations per customer).
    */
  private[graft] val ItemKnnM = 10
  private[graft] val ItemKnnK = 5

  /** Hot-basket guard for the item-item pair build (the f01
    * [[graft.operators.Itemsets.BasketCap]] pattern): customers with
    * more than this many distinct items are EXCLUDED from the
    * similarity model (dots AND norms — one consistent model), so the
    * pair self-join is bounded by C(cap, 2) ≈ 32k rows per basket
    * instead of the unbounded deg² blow-up (a single 10⁵-item hot
    * basket on a power-law 100 TB corpus alone is 10¹⁰ pairs). The
    * standard item-CF posture: a user who buys everything carries
    * near-zero per-pair signal (their co-occurrences are noise), so
    * dropping them from the MODEL loses nothing — they still receive
    * recommendations, because serve reads the full ratings frame.
    * This corpus's max basket is 102 at sf0.1 (10 / 67 / 102 across
    * the three SFs), so the cap does not bind at test SF — and since
    * round 13 the DuckDB oracle mirrors the cap (a HAVING
    * count(DISTINCT s) semi-join in [[itemKnnOracleSql]]), so
    * agreement is by construction at ANY basket size, not an
    * empirical property of the current corpus (spec'd both ways —
    * non-binding on the corpus, binding on a planted hot basket).
    */
  private[graft] val ItemBasketCap = 256

  /** The ratings frame the similarity MODEL is built from: hot
    * baskets (> [[ItemBasketCap]] distinct items) removed before any
    * pair expansion. One partial-agg'd basket-size count + a
    * broadcast-able semi-join (the keep-list is ≤ |customers| keys
    * and shrinks only when the cap binds). Package-private for the
    * planted-hot-basket spec.
    */
  private[graft] def cappedRatings(ratings: DataFrame): DataFrame =
    // countDistinct, not count: the contract is DISTINCT items per
    // basket, and it must hold structurally even for a caller whose
    // frame is not pre-aggregated per (c, s) — on purchaseRatings
    // (already one row per pair) the two agree, so the s32 plan's
    // results are unchanged
    ratings.join(
      ratings.groupBy(col("c")).agg(countDistinct(col("s")).as("bk"))
        .filter(col("bk") <= ItemBasketCap).select(col("c")),
      Seq("c"), "left_semi")

  /** The item-kNN core over a (c, s, r) integer rating frame — the
    * full neighborhood-CF pipeline (Sarwar et al. WWW'01):
    * (1) item-item cosine over the customer dimension — dot products
    * and squared norms are EXACT long sums (counts, not floats), only
    * the final cosine normalization runs in double through the s19
    * shared tree floored to 2²⁰ ticks; (2) per item the top-[[ItemKnnM]]
    * neighbor list via the bounded top_k_by_score aggregate
    * (simt desc, item asc — the total order both engines share);
    * (3) serve: score(c, j) = Σ_{i rated by c} r(c,i)·sim(i,j) over
    * the neighbor graph only, already-rated items excluded (the
    * neighborhood-serve convention — recommend UNSEEN items), cut to
    * top-[[ItemKnnK]] per customer by the same bounded aggregate.
    *
    * Scale shape: the dot-product self-join expands each customer's
    * basket to its item pairs — but the model build reads
    * [[cappedRatings]], so the expansion is bounded by C(cap, 2) per
    * basket (the f01 BasketCap pattern wired executable; the s31
    * DIMSUM sampler remains the orthogonal second lever for when the
    * ITEM count, not the basket size, is the problem); norms are
    * an item-sized broadcast; the neighbor graph is ≤ M rows/item so
    * the serve join fans ratings out ≤ M× with map-side partial aggs
    * and a bounded k-heap per customer — no scored-pair shuffle ever
    * materializes beyond the rated×M frame. Package-private for the
    * spec's planted baskets.
    *
    * Serve-score headroom: score(c, j) = Σ r·simt is summed as an
    * exact long but ordered through top_k_by_score's double — exact
    * ordering holds to 2⁵³, i.e. n_rated·r·2²⁰ < 2⁵³ (n_rated·r
    * < 2³³ ≈ 8.6·10⁹ rating-mass per customer; this corpus:
    * n_rated ≤ 102, r < 2⁷). The retune past that mass is the
    * family's usual one: rescale simt ticks to 2¹⁰ for the serve
    * sum (ordering is scale-invariant) or cap n_rated at serve.
    */
  private[graft] def itemKnnServe(ratings: DataFrame): DataFrame = {
    graft.functions.registerAll(ratings.sparkSession)
    val model = cappedRatings(ratings)
    val nrm = model.groupBy(col("s"))
      .agg(sum(col("r") * col("r")).as("n2"))
    // r16 per-task-work tuning, measured on the executed node metrics:
    // (a) SHUFFLE_HASH on the self-join — the checkpointed ratings
    // frame plans SMJ from default stats, paying two corpus-sized
    // sorts; the per-partition build side (ratings/partitions) is
    // exactly what a hash map wants (guide §3.1). (b) the (i, j) pair
    // key packed into ONE long for the aggregation — the two-long key
    // measured avgHashProbe ≈ 444 near map capacity; an 8-byte key
    // halves the row and probes cleanly. [[graft.Engine.packPair]]
    // guards the < 2³¹ injectivity bound in-flight (r17); past it the
    // documented retune reverts to the two-column key.
    val dots = model.select(col("c"), col("s").as("i"), col("r").as("ri"))
      .join(model.select(col("c"), col("s").as("j"), col("r").as("rj"))
        .hint("shuffle_hash"), "c")
      .filter(col("i") < col("j"))
      .groupBy(graft.Engine.packPair(col("i"), col("j")).as("ij"))
      .agg(sum(col("ri") * col("rj")).as("dot"))
      .select(shiftright(col("ij"), 32).as("i"),
        col("ij").bitwiseAND(lit(0xFFFFFFFFL)).as("j"), col("dot"))
    val sims = dots
      .join(broadcast(nrm.select(col("s").as("i"), col("n2").as("ni"))), "i")
      .join(broadcast(nrm.select(col("s").as("j"), col("n2").as("nj"))), "j")
      .select(col("i"), col("j"),
        expr("""CASE WHEN ni > 0 AND nj > 0
               |THEN CAST(floor(CAST(dot AS DOUBLE)
               |  / sqrt(CAST(ni AS DOUBLE) * CAST(nj AS DOUBLE))
               |  * 1048576.0D + 0.5D) AS BIGINT)
               |ELSE CAST(0 AS BIGINT) END""".stripMargin).as("simt"))
    // both directions in ONE pass (r16): the old self-union planned
    // the un-checkpointed sims subtree TWICE — i.e. the per-basket
    // pair expansion and its shuffle (the suite's largest, ~170 MB)
    // ran twice per invocation; exploding a 2-element struct array
    // emits the same two rows per pair from a single computation.
    val sym = sims.select(explode(array(
        struct(col("i"), col("j"), col("simt")),
        struct(col("j").as("i"), col("i").as("j"), col("simt")))).as("x"))
      .select(col("x.i").as("i"), col("x.j").as("j"),
        col("x.simt").as("simt"))
    val nbr = sym.groupBy(col("i"))
      .agg(call_function("top_k_by_score",
        col("simt").cast("double"), col("j"), lit(ItemKnnM)).as("top"))
      .select(col("i"), explode(col("top")).as("t"))
      .select(col("i"), col("t.id").as("j"),
        col("t.score").cast("long").as("simt"))
    // r17 serve: the expand → packed-key aggregate → anti-join →
    // top_k_by_score chain materialized the rated×M candidate frame
    // (4.7 M rows, 536 MB agg peak, ~45 of the key's 68 s CPU at
    // sf0.1 — node metrics). Now the whole M-row-per-item neighbor
    // model — vocabulary-sized, the natural broadcast side —
    // collapses into ONE sorted broadcast row, each customer's rated
    // list gathers on ONE narrow exchange, and a single
    // item_knn_serve kernel call per customer does the
    // accumulate/exclude/top-k with the identical exclusion rule and
    // (score desc, id asc) order (scores are exact integers, so the
    // kernel's double sums match the aggregate's bit-for-bit). At a
    // catalog too big to broadcast the M-per-item model, the
    // documented retune is the old expand shape — the same blockify
    // trade as the s25 serve.
    val nbrRow = nbr
      .agg(expr("array_sort(collect_list(struct(i, j, simt)))").as("nbrs"))
    ratings.groupBy(col("c"))
      .agg(collect_list(struct(col("s"),
        col("r").cast("double").as("r"))).as("rated"))
      .crossJoin(broadcast(nbrRow))
      .select(col("c"), call_function("item_knn_serve",
        col("rated"), col("nbrs"), lit(ItemKnnK)).as("top"))
      .select(col("c"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("c").as("o_custkey"),
        (col("pos") + 1).cast("long").as("rank"),
        col("t.id").as("l_suppkey"),
        col("t.score").cast("long").as("score_ticks"))
      .orderBy(col("o_custkey"), col("rank"))
  }

  /** s32: item-kNN collaborative filtering over the purchase matrix —
    * the NEIGHBORHOOD method completing the recommender family next
    * to its five factor-model keys (s13/s15/s24/s25/s28): the
    * reference surface offers only matrix factorization
    * (reference: /root/reference/mllib/src/main/scala/org/apache/
    * spark/mllib/recommendation/ALS.scala:1) plus the
    * columnSimilarities primitive item-kNN builds on (reference:
    * mllib/linalg/distributed/RowMatrix.scala:1 — s29's DIMSUM is
    * the documented scale path for exactly this item-item step);
    * the classic production baseline (Sarwar et al. WWW'01, the
    * Amazon-style item-to-item recommender) that needs NO training
    * rounds and updates incrementally. Shares the memoized
    * purchaseRatings frame with the factor family.
    */
  def s32ItemKnn(spark: SparkSession, sfDir: String): DataFrame =
    itemKnnServe(purchaseRatings(spark, sfDir))

  /** The DuckDB twin of [[s32ItemKnn]]: exact integer dots/norms,
    * the s19 cosine tree, row_number with the (simt desc, j) /
    * (score desc, j) total orders, NOT EXISTS for the seen filter.
    * The [[ItemBasketCap]] hot-basket guard is mirrored (the `model`
    * CTE) so the two engines agree BY CONSTRUCTION at any basket
    * size, not just while the corpus stays under the cap — at a
    * corpus/SF with a hotter basket the cap binds identically on
    * both sides instead of failing the gate by design.
    */
  private[graft] def itemKnnOracleSql: String =
    s"""WITH ratings AS MATERIALIZED (
       |  SELECT o_custkey AS c, l_suppkey AS s, CAST(count(*) AS BIGINT) AS r
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |  GROUP BY 1, 2),
       |model AS MATERIALIZED (
       |  SELECT r.c, r.s, r.r FROM ratings r
       |  JOIN (SELECT c FROM ratings GROUP BY c
       |        HAVING count(DISTINCT s) <= $ItemBasketCap) k ON k.c = r.c),
       |nrm AS MATERIALIZED (
       |  SELECT s, CAST(sum(r * r) AS BIGINT) AS n2 FROM model GROUP BY s),
       |dots AS (
       |  SELECT a.s AS i, b.s AS j, CAST(sum(a.r * b.r) AS BIGINT) AS dot
       |  FROM model a JOIN model b ON a.c = b.c AND a.s < b.s
       |  GROUP BY 1, 2),
       |sims AS (
       |  SELECT i, j,
       |    CASE WHEN ni.n2 > 0 AND nj.n2 > 0
       |    THEN CAST(floor(CAST(dot AS DOUBLE)
       |      / sqrt(CAST(ni.n2 AS DOUBLE) * CAST(nj.n2 AS DOUBLE))
       |      * 1048576.0 + 0.5) AS BIGINT)
       |    ELSE CAST(0 AS BIGINT) END AS simt
       |  FROM dots JOIN nrm ni ON ni.s = dots.i JOIN nrm nj ON nj.s = dots.j),
       |sym AS (SELECT i, j, simt FROM sims
       |  UNION ALL SELECT j, i, simt FROM sims),
       |nbr AS (
       |  SELECT i, j, simt FROM (
       |    SELECT i, j, simt,
       |      row_number() OVER (PARTITION BY i ORDER BY simt DESC, j) AS rn
       |    FROM sym) x
       |  WHERE rn <= $ItemKnnM),
       |cand AS (
       |  SELECT r.c, n.j, CAST(sum(r.r * n.simt) AS BIGINT) AS score
       |  FROM ratings r JOIN nbr n ON n.i = r.s
       |  WHERE NOT EXISTS (
       |    SELECT 1 FROM ratings x WHERE x.c = r.c AND x.s = n.j)
       |  GROUP BY 1, 2),
       |rk AS (
       |  SELECT c, j, score,
       |    row_number() OVER (PARTITION BY c ORDER BY score DESC, j) AS rank
       |  FROM cand)
       |SELECT c AS o_custkey, CAST(rank AS BIGINT) AS rank,
       |  j AS l_suppkey, score AS score_ticks
       |FROM rk WHERE rank <= $ItemKnnK
       |ORDER BY o_custkey, rank""".stripMargin

  /** Topics / vocabulary cap / MAP-EM rounds for [[t35LdaMap]]. */
  private[graft] val LdaK = 4
  private[graft] val LdaV = 128
  private[graft] val LdaIters = 6

  /** Dirichlet pseudo-count α−1 = β−1 — strictly positive so the
    * MAP M-step keeps every θ/φ entry off zero (the positivity
    * boolean) and the penalized objective carries the EM ascent
    * guarantee.
    */
  private[graft] val LdaPrior = 1.0 / 16.0

  /** t35: MAP-LDA topic model — the Dirichlet-smoothed posterior
    * DOC-TOPIC DISTRIBUTIONS the reference's LDA actually emits
    * (reference: /root/reference/mllib/src/main/scala/org/apache/
    * spark/mllib/clustering/LDA.scala:1, topicDistributions /
    * describeTopics) and the soft-semantics gap t23 (unconstrained
    * ALS axes) and t32 (integer scores + argmax) leave open. The
    * E-step's θφ/Σθφ responsibilities are transcendental-free but
    * their normalization is a float divide whose cross-engine
    * summation order is unfixable, so the key follows the q68/s35
    * contract-checked posture:
    *
    * HASHED (exact integers, oracle recomputes independently): the
    * per-topic init grid — Σ_d ticks(d,k) and Σ_d n_d·ticks(d,k)
    * where ticks(d,k) = 1024 + md5₁₆("lda:doc:k") mod 1024 is the
    * p01-style deterministic θ-seed draw and n_d the doc's in-vocab
    * token count — plus n_docs and v_size (the top-[[LdaV]]-by-tf
    * vocabulary, ties to the smaller token; OOV tokens drop, the t32
    * contract).
    *
    * CONTRACT-CHECKED (booleans the oracle pins TRUE): across
    * [[LdaIters]] EM rounds, (1) the MAP objective — data
    * log-likelihood Σ_dw n·log2 Σ_k θ_dk φ_kw plus the Dirichlet
    * terms (α−1)Σ log2 θ + (β−1)Σ log2 φ — ascends every round (the
    * EM guarantee on the smoothed objective; 1e-6 relative
    * tolerance), (2) per-doc final θ quantized to 2²⁰ ticks sums to
    * 2²⁰ ± [[LdaK]], (3) per-topic final φ sums to 1 ± 1e-6,
    * (4) every θ/φ entry stays strictly positive (the Dirichlet
    * floor).
    *
    * Scale shape: the corpus collapses ONCE to the doc-grouped
    * in-vocab frame (doc_id, [(w, n)], n_d, θ array) — θ lives WITH
    * the doc row, so the E/M θ-update never shuffles; φ is a ONE-ROW
    * broadcast (K arrays × [[LdaV]] doubles). Each round = two
    * partial-agg'd scans of that frame: the exploded φ/ll scan
    * (map-combines to ≤ V rows carrying K sums + the ll piece) and
    * the doc-local θ scan (higher-order aggregate per row, new θ
    * checkpointed). Nothing corpus-sized shuffles after the initial
    * group-by; no driver fetch. Output: one row per topic.
    */
  def t35LdaMap(spark: SparkSession, sfDir: String): DataFrame =
    ldaCore(ldaCorpusTf(spark, sfDir))

  /** The t35 tokenization: per-(doc, token) term frequencies over
    * the documents table — shared by the batch trainer and the
    * stream_lda_assign model build.
    */
  private[graft] def ldaCorpusTf(
      spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.registerAll(spark)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(call_function("word_grams", lower(col("text")), lit(1)))
          .as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
  }

  /** Final per-doc topic posteriors — the spec's planted-recovery
    * surface: (doc_id, theta array of [[LdaK]] doubles).
    */
  private[graft] def ldaTheta(tf: DataFrame): DataFrame =
    ldaCore(tf, debugTheta = true)

  /** The trained SERVING model for the stream twin: the vocabulary
    * (token, w) crossed with the one-row trained φ — ≤ [[LdaV]]
    * rows, broadcastable. Train batch, serve stream (the
    * stream_nb / stream_topic / stream_gmm "one stream, one model"
    * posture).
    */
  private[graft] def ldaServeModel(tf: DataFrame): DataFrame =
    ldaCore(tf, debugModel = true)

  /** The p01-style deterministic θ-seed draw: tick columns
    * tk0..tk{K-1} off md5("lda:doc:k") — ONE definition shared by
    * training init and the serve fold-in, so a folded-in training
    * doc starts from the identical seed.
    */
  private def ldaSeedTickCols: Seq[Column] = (0 until LdaK).map(k =>
    (lit(1024L) + conv(substring(md5(concat(lit("lda:"),
      col("doc_id").cast("string"), lit(s":$k"))), 1, 4), 16, 10)
      .cast("long") % 1024L).as(s"tk$k"))

  private[graft] def ldaCore(tf: DataFrame,
      debugTheta: Boolean = false, debugModel: Boolean = false): DataFrame = {
    val K = LdaK
    val am1 = LdaPrior
    // vocabulary: top-V tokens by corpus tf (distributed top-V heap,
    // then a row_number over the <= V survivors — a bounded frame).
    // SAFETY INVARIANT (r16 advice): the un-partitioned window below
    // is a single-partition sort and is safe ONLY because it runs
    // AFTER limit(LdaV) has bounded the frame to <= 128 rows — an
    // edit that moves the withColumn above the limit would
    // single-partition-shuffle the full token set.
    val w0 = org.apache.spark.sql.expressions.Window
      .orderBy(col("vtf").desc, col("token"))
    val vocab = tf.groupBy(col("token")).agg(sum(col("tf")).as("vtf"))
      .orderBy(col("vtf").desc, col("token")).limit(LdaV)
      .withColumn("w", row_number().over(w0).cast("long") - 1L)
      .ckpt(true)
    // the doc-grouped in-vocab frame with the md5 theta-seed ticks
    val tickCols = ldaSeedTickCols
    val docs0 = tf.join(broadcast(vocab.select(col("token"), col("w"))),
        "token")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("w"), col("tf").as("n"))))
          .as("ws"),
        sum(col("tf")).as("nd"))
      .select(Seq(col("doc_id"), col("ws"), col("nd")) ++ tickCols: _*)
      .withColumn("tksum",
        (0 until K).map(k => col(s"tk$k")).reduce(_ + _))
      .withColumn("th", array((0 until K).map(k =>
        col(s"tk$k").cast("double") / col("tksum").cast("double")): _*))
      .ckpt(true)
    // hashed init grid (exact longs off the seed draw): ONE
    // aggregation emits all 2K sums (r16 advice — the K separate
    // aggs were the only multi-scan spot in the plan), eagerly
    // checkpointed as a 1-row frame, then a literal unpivot to the
    // per-topic rows
    val hashAggCols = Seq(count(lit(1)).as("n_docs")) ++
      (0 until K).flatMap(k => Seq(sum(col(s"tk$k")).as(s"ts$k"),
        sum(col("nd") * col(s"tk$k")).as(s"tw$k")))
    val hashAggOne = docs0.agg(hashAggCols.head, hashAggCols.tail: _*)
      .ckpt(true)
    val hashAgg = (0 until K).map(k =>
      hashAggOne.select(lit(k.toLong).as("topic"), col("n_docs"),
        col(s"ts$k").as("theta0_sum_ticks"),
        col(s"tw$k").as("theta0_wsum_ticks")))
      .reduce(_ unionByName _)
    val vSize = vocab.agg(count(lit(1)).as("v_size"))
    // phi init: deterministic symmetry-breaking weights over the
    // ACTUAL vocab grid (so every round's objective lives on the
    // same support), row-normalized; one broadcast row of K arrays
    def phiInitRow: DataFrame =
      vocab.agg(sort_array(collect_list(col("w"))).as("wg"))
        .select((0 until K).map(k => expr(
          s"transform(wg, w -> 16.0D + CAST((31 * ${k + 1} * (w + 3)) " +
            s"% 61 AS DOUBLE))").as(s"raw$k")): _*)
        .select((0 until K).map(k => expr(
          s"transform(raw$k, v -> v / aggregate(raw$k, " +
            "CAST(0.0 AS DOUBLE), (a, x) -> a + x))").as(s"phi$k")): _*)
    // denom(x) = sum_k th[k] * phi_k[w+1] as ONE expression string
    def denomSql(wRef: String): String =
      (0 until K).map(k =>
        s"element_at(th, ${k + 1}) * element_at(phi$k, CAST($wRef + 1 AS INT))")
        .mkString(" + ")
    var phi = phiInitRow.ckpt(false)
    var docs = docs0.select(col("doc_id"), col("ws"), col("nd"), col("th"))
    var objRows: Seq[DataFrame] = Nil
    var thetaNormOk: DataFrame = null
    for (r <- 0 until LdaIters) {
      val joined = docs.crossJoin(broadcast(phi))
      // scan A: exploded phi/ll aggregation (map-combines to <= V
      // rows) + the phi prior off the broadcast row itself
      val ex = joined
        .select(Seq(col("th"), explode(col("ws")).as("x")) ++
          (0 until K).map(k => col(s"phi$k")): _*)
        .withColumn("denom", expr(denomSql("x.w")))
      val wAggs = (0 until K).map(k =>
        sum(col("x.n") * expr(s"element_at(th, ${k + 1}) * " +
          s"element_at(phi$k, CAST(x.w + 1 AS INT))") / col("denom"))
          .as(s"c$k")) :+
        sum(col("x.n") * log2(col("denom"))).as("llw")
      val wSums = ex.groupBy(col("x.w").as("w"))
        .agg(wAggs.head, wAggs.tail: _*)
        .ckpt(true)
      val llData = wSums.agg(sum(col("llw")).as("ll_data"))
      val phiPrior = phi.select(((0 until K).map(k =>
        expr(s"aggregate(phi$k, CAST(0.0 AS DOUBLE), " +
          "(a, p) -> a + log2(p))")).reduce(_ + _) * lit(am1))
        .as("phi_prior"))
      // scan B: doc-local theta update + the theta prior (CURRENT th)
      val sExprs = (0 until K).map(k =>
        expr(s"aggregate(ws, CAST(0.0 AS DOUBLE), (a, x) -> a + x.n * " +
          s"(element_at(th, ${k + 1}) * " +
          s"element_at(phi$k, CAST(x.w + 1 AS INT))) / " +
          s"(${denomSql("x.w")}))").as(s"s$k"))
      val upd = joined
        .select(Seq(col("doc_id"), col("ws"), col("nd"), col("th")) ++
          sExprs: _*)
        .withColumn("th2", array((0 until K).map(k =>
          (col(s"s$k") + lit(am1)) /
            (col("nd").cast("double") + lit(K * am1))): _*))
      // LAZY round checkpoint (r16): the next round's scan-A job (or
      // the final assembly, for the last round) materializes the
      // blocks — an eager ckpt here was a dedicated corpus-sized job
      // per round. Value-deterministic (pure arithmetic off md5
      // seeds), so the lazy pattern is safe in RELIABLE mode too.
      val updC = upd.select(col("doc_id"), col("ws"), col("nd"),
          col("th").as("th_prev"), col("th2").as("th"))
        .ckpt(false)
      val thPrior = updC.agg((sum(expr(
        "aggregate(th_prev, CAST(0.0 AS DOUBLE), (a, t) -> a + log2(t))"))
        * lit(am1)).as("th_prior"))
      objRows = objRows :+ llData.crossJoin(broadcast(phiPrior))
        .crossJoin(broadcast(thPrior))
        .select(lit(r.toLong).as("round"),
          (col("ll_data") + col("phi_prior") + col("th_prior")).as("obj"))
      // M-step phi off the same wSums rows (the grid covers every
      // vocab word by construction: vocab membership implies tf > 0)
      val phiAggs = (0 until K).flatMap(k => Seq(
        sum(col(s"c$k")).as(s"tot$k"),
        sort_array(collect_list(struct(col("w"), col(s"c$k").as("c"))))
          .as(s"arr$k")))
      val phiRows = wSums.agg(phiAggs.head, phiAggs.tail: _*)
      // lazy too (r16): a 1-row frame over the eagerly-checkpointed
      // wSums — the first broadcast build of the next round
      // materializes it; eager was one more blocking job per round
      phi = phiRows.select((0 until K).map(k =>
          expr(s"transform(arr$k, x -> (x.c + $am1) / " +
            s"(tot$k + size(arr$k) * $am1))").as(s"phi$k")): _*)
        .ckpt(false)
      docs = updC.select(col("doc_id"), col("ws"), col("nd"), col("th"))
      if (r == LdaIters - 1) {
        thetaNormOk = updC.agg(
          min(abs((0 until K).map(k =>
            floor(expr(s"element_at(th, ${k + 1})") * lit(1048576.0) +
              lit(0.5))).reduce(_ + _) - lit(1048576.0)) <= lit(K.toDouble))
            .as("theta_norm_ok"),
          min(expr("aggregate(th, CAST(1.0 AS DOUBLE), " +
            "(a, t) -> least(a, t))") > lit(0.0)).as("theta_pos_ok"))
      }
    }
    if (debugTheta)
      return docs.select(col("doc_id"), col("th"))
    if (debugModel)
      return vocab.select(col("token"), col("w")).crossJoin(broadcast(phi))
    val wOrd = org.apache.spark.sql.expressions.Window.orderBy(col("round"))
    val ascent = objRows.reduce(_ unionByName _)
      .withColumn("prev", lag(col("obj"), 1).over(wOrd))
      .agg(min(when(col("prev").isNull, lit(true))
        .otherwise(col("obj") >=
          col("prev") - lit(1e-6) * abs(col("prev"))))
        .as("objective_ascends_ok"))
    val phiOk = phi.select(
      (0 until K).map(k =>
        abs(expr(s"aggregate(phi$k, CAST(0.0 AS DOUBLE), (a, p) -> a + p)")
          - lit(1.0)) <= lit(1e-6)).reduce(_ && _).as("phi_norm_ok"),
      (0 until K).map(k =>
        expr(s"aggregate(phi$k, CAST(1.0 AS DOUBLE), " +
          "(a, p) -> least(a, p))") > lit(0.0)).reduce(_ && _)
        .as("phi_pos_ok"))
    hashAgg
      .crossJoin(broadcast(vSize))
      .crossJoin(broadcast(ascent))
      .crossJoin(broadcast(thetaNormOk))
      .crossJoin(broadcast(phiOk))
      .select(col("topic"), col("n_docs"), col("v_size"),
        col("theta0_sum_ticks"), col("theta0_wsum_ticks"),
        col("objective_ascends_ok"), col("theta_norm_ok"),
        col("phi_norm_ok"),
        (col("theta_pos_ok") && col("phi_pos_ok")).as("positive_ok"))
      .orderBy(col("topic"))
  }

  /** Serve-side LDA posterior fold-in — the θ-only EM against a
    * FIXED broadcast trained φ (the textbook fold-in for unseen
    * documents: Asuncion et al., UAI 2009 treat inference-at-serve
    * as E-steps with φ clamped). Input: (doc_id, w) rows, one per
    * in-vocab token OCCURRENCE (the stream stage's output); the
    * doc is grouped here, seeded by the SAME md5 θ-draw as training
    * ([[ldaSeedTickCols]]), then [[LdaIters]] doc-local updates
    * θ_k ∝ Σ_w n·θ_k φ_kw / Σ_j θ_j φ_jw, Dirichlet-smoothed
    * exactly as the trainer's scan B — every update is a per-row
    * higher-order aggregate over the doc's own tokens, so the serve
    * path never shuffles after the per-doc group-by. Lineage is
    * truncated per round (the beamSearchFor pattern — the θ tree
    * would otherwise grow K-fold per round). Returns
    * (doc_id, th array).
    */
  private[graft] def ldaFoldInTheta(
      tokRows: DataFrame, phi: DataFrame): DataFrame = {
    val K = LdaK
    val am1 = LdaPrior
    def denomSql(wRef: String): String =
      (0 until K).map(k =>
        s"element_at(th, ${k + 1}) * element_at(phi$k, CAST($wRef + 1 AS INT))")
        .mkString(" + ")
    var docs = tokRows.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("w"), col("n")))).as("ws"),
        sum(col("n")).as("nd"))
      .select(Seq(col("doc_id"), col("ws"), col("nd")) ++
        ldaSeedTickCols: _*)
      .withColumn("tksum", (0 until K).map(k => col(s"tk$k")).reduce(_ + _))
      .withColumn("th", array((0 until K).map(k =>
        col(s"tk$k").cast("double") / col("tksum").cast("double")): _*))
      .select(col("doc_id"), col("ws"), col("nd"), col("th"))
      .crossJoin(broadcast(phi))
    for (_ <- 0 until LdaIters) {
      val sExprs = (0 until K).map(k =>
        expr(s"aggregate(ws, CAST(0.0 AS DOUBLE), (a, x) -> a + x.n * " +
          s"(element_at(th, ${k + 1}) * " +
          s"element_at(phi$k, CAST(x.w + 1 AS INT))) / " +
          s"(${denomSql("x.w")}))").as(s"s$k"))
      docs = docs.select(Seq(col("doc_id"), col("ws"), col("nd")) ++
          (0 until K).map(k => col(s"phi$k")) ++ Seq(col("th")) ++
          sExprs: _*)
        .withColumn("th", array((0 until K).map(k =>
          (col(s"s$k") + lit(am1)) /
            (col("nd").cast("double") + lit(K * am1))): _*))
        .select(Seq(col("doc_id"), col("ws"), col("nd"), col("th")) ++
          (0 until K).map(k => col(s"phi$k")): _*)
        .ckpt(false)
    }
    docs.select(col("doc_id"), col("th"))
  }

  /** The DuckDB twin of [[t35LdaMap]]'s hashed init grid: the shared
    * tokenize CTEs, the top-[[LdaV]] vocabulary (ties to the smaller
    * token), per-doc in-vocab counts, and the same md5 seed draw.
    */
  private[graft] def ldaOracleSql: String = {
    val ticks = (0 until LdaK).map(k =>
      s"SELECT doc_id, nd, CAST($k AS BIGINT) AS topic, " +
        s"1024 + CAST(('0x' || substr(md5('lda:' || CAST(doc_id AS VARCHAR) " +
        s"|| ':$k'), 1, 4))::UBIGINT % 1024 AS BIGINT) AS tk FROM dn")
      .mkString("\nUNION ALL\n")
    s"""WITH $topicRatingsCtes,
       |voc AS (
       |  SELECT s AS token,
       |    row_number() OVER (ORDER BY sum(r) DESC, s) - 1 AS w
       |  FROM ratings GROUP BY s
       |  ORDER BY sum(r) DESC, s LIMIT $LdaV),
       |dn AS (
       |  SELECT r.c AS doc_id, CAST(sum(r.r) AS BIGINT) AS nd
       |  FROM ratings r JOIN voc ON voc.token = r.s GROUP BY 1),
       |tks AS (
       |$ticks)
       |SELECT topic,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  (SELECT CAST(count(*) AS BIGINT) FROM voc) AS v_size,
       |  CAST(sum(tk) AS BIGINT) AS theta0_sum_ticks,
       |  CAST(sum(nd * tk) AS BIGINT) AS theta0_wsum_ticks,
       |  TRUE AS objective_ascends_ok,
       |  TRUE AS theta_norm_ok,
       |  TRUE AS phi_norm_ok,
       |  TRUE AS positive_ok
       |FROM tks
       |GROUP BY topic
       |ORDER BY topic""".stripMargin
  }
}
