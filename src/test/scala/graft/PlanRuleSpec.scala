package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.HashAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** Plan-shape assertions for [[graft.plans.PreAggregateBeforeShuffleRule]]
  * and the partial-aggregation (pre-combine before shuffle) invariant.
  */
class PlanRuleSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = TestSpark.spark

  /** Final physical plan, unwrapping AQE (forces execution first so
    * the adaptive plan is settled).
    */
  private def executed(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.write.format("noop").mode("overwrite").save()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  test("small dim side gets broadcast even with auto-broadcast disabled") {
    val cust = Tables.customer(spark, sfDir)
    val nat = Tables.nation(spark, sfDir) // 25 rows — provably tiny
    val joined = cust.join(nat, cust("c_nationkey") === nat("n_nationkey"))
      .groupBy(col("n_name")).agg(count(lit(1)).as("n"))
    val bhj = executed(joined).collect { case b: BroadcastHashJoinExec => b }
    assert(bhj.nonEmpty, "rule must broadcast the 25-row nation side")
    // kill switch honored: without the rule the same join shuffles
    spark.conf.set("graft.preagg.enabled", "false")
    try {
      val joined2 = cust.join(nat, cust("c_nationkey") === nat("n_nationkey"))
        .groupBy(col("n_name")).agg(count(lit(1)).as("n"))
      val bhj2 = executed(joined2).collect { case b: BroadcastHashJoinExec => b }
      assert(bhj2.isEmpty, "kill switch must disable the broadcast hint")
    } finally spark.conf.set("graft.preagg.enabled", "true")
  }

  test("semi-join build side is pre-aggregated to its referenced keys") {
    val orders = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    val semi = orders.join(li, orders("o_orderkey") === li("l_orderkey"), "left_semi")
    val aggsUnderJoin = semi.queryExecution.optimizedPlan.collect {
      case Join(_, right, _, _, _) if right.collectFirst { case a: Aggregate => a }.nonEmpty => right
    }
    assert(aggsUnderJoin.nonEmpty,
      "build side of the semi join must carry a dedup Aggregate on l_orderkey")
    // semantics unchanged: same keep-set as a distinct-based rewrite
    val expected = orders.select("o_orderkey")
      .join(li.select("l_orderkey").distinct(),
        col("o_orderkey") === col("l_orderkey")).count()
    assert(semi.count() == expected)
  }

  test("j01 as-of join shuffles once (hash) for the window pass") {
    import graft.operators.Joins
    val plan = executed(Joins.j01AsofJoin(spark, sfDir))
    val hashEx = plan.collect {
      case e: ShuffleExchangeExec
        if e.outputPartitioning.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => e
    }
    assert(hashEx.length == 1,
      s"as-of join must co-shuffle both sides exactly once, got ${hashEx.length}")
  }

  test("j03 nearest join: both window passes ride j01's single hash exchange") {
    import graft.operators.Joins
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = executed(Joins.j03NearestJoin(spark, sfDir))
    val hashEx = plan.collect {
      case e: ShuffleExchangeExec
        if e.outputPartitioning.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => e
    }
    assert(hashEx.length == 1,
      s"before+after passes must share ONE co-shuffle, got ${hashEx.length}")
    // the invariant that matters at scale is the single exchange:
    // the before/after frames may plan as separate Window operators
    // (and the presentation orderBy adds its own range sort), but
    // both ride the same user_id co-partitioning
    val wins = plan.collect { case w: WindowExec => w }
    assert(wins.nonEmpty, "expected window operators in the nearest-join plan")
  }

  test("d15 prefix filtering plans equi-joins only — no cartesian, no nested loop") {
    import graft.operators.Dedup
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val plan = executed(Dedup.d15DedupPrefix(spark, sfDir))
    assert(plan.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      "prefix self-join must be an equi-join on the shingle hash")
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty,
      "no stage of prefix filtering may go cartesian")
  }

  test("j02 range join never plans a nested-loop join") {
    import graft.operators.Joins
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    val plan = executed(Joins.j02RangeJoin(spark, sfDir))
    val bnl = plan.collect { case b: BroadcastNestedLoopJoinExec => b }
    assert(bnl.isEmpty, "interval join must run as bucketed equi-join, not BNLJ")
  }

  test("d10 incremental probe: equi-joins only, never a nested loop or cartesian") {
    import graft.operators.Dedup
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val plan = executed(Dedup.d10DedupIncremental(spark, sfDir))
    assert(plan.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      "band probe must stay an equi-join")
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty,
      "band probe must never plan a cartesian product")
  }

  test("d11 within-cell pair join is an equi-join, never a cartesian") {
    import graft.operators.Similarity
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    val plan = executed(Similarity.d11DedupSemantic(spark, sfDir))
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty,
      "cell self-join must shuffle on the cell id, not cross-product")
  }

  test("s03 IVF cell assignment pre-aggregates before its shuffle") {
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Final, Partial}
    import graft.operators.Similarity
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val plan = executed(Similarity.s03AnnIvf(spark, sfDir))
    // the N×K scored rows must be combined map-side: some partial
    // aggregate (argmax buffers or top-k states) below each final.
    // struct-max / TopKByScore plan as Sort/ObjectHash aggregates,
    // hence BaseAggregateExec.
    val finals = plan.collect {
      case h: BaseAggregateExec if h.aggregateExpressions.exists(_.mode == Final) => h
    }
    assert(finals.nonEmpty)
    val partials = plan.collect {
      case h: BaseAggregateExec if h.aggregateExpressions.nonEmpty &&
        h.aggregateExpressions.forall(_.mode == Partial) => h
    }
    assert(partials.nonEmpty, "argmax must pre-combine before the exchange")
  }

  test("q27 distributed ntile: no whole-group window frame anywhere in the plan") {
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = executed(Relational.q27NtileWindow(spark, sfDir))
    val wins = plan.collect { case w: WindowExec => w }
    assert(wins.nonEmpty, "rank assembly must use running-frame windows")
    wins.foreach { w =>
      val s = w.windowExpression.mkString(";").toLowerCase
      assert(!s.contains("ntile"),
        s"single-task whole-group ntile window on the hot path: $s")
      assert(!s.contains("unboundedfollowing"),
        s"whole-group window frame found: $s")
    }
  }

  test("q38 latest-per-key plans as partial-agg'd struct max, no window") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.catalyst.expressions.aggregate.Partial
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val plan = executed(Relational.q38LatestPerKey(spark, sfDir))
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      "latest-per-key must not shuffle every row through a window")
    // struct max isn't hash-aggregable — it plans as Sort/ObjectHash
    // aggregate, hence BaseAggregateExec
    val partials = plan.collect {
      case h: BaseAggregateExec if h.aggregateExpressions.nonEmpty &&
        h.aggregateExpressions.forall(_.mode == Partial) => h
    }
    assert(partials.nonEmpty,
      "struct-max argmax must combine map-side before the exchange")
  }

  test("q40 stats suite is one partial-agg'd aggregation, no second pass") {
    // corr/covar/stddev/var/regr_* all decompose into the same six
    // streaming moments: the suite must plan as ONE scan feeding ONE
    // Partial->Final aggregate pair (the shuffle carries 6 doubles
    // per group), never per-statistic passes
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Final, Partial}
    import org.apache.spark.sql.execution.FileSourceScanExec
    val plan = executed(Relational.q40StatsSuite(spark, sfDir))
    assert(plan.collect { case s: FileSourceScanExec => s }.size == 1,
      "the whole suite must ride a single lineitem scan")
    val finals = plan.collect {
      case h: HashAggregateExec if h.aggregateExpressions.exists(_.mode == Final) => h
    }
    assert(finals.size == 1, s"expected one final aggregate, got ${finals.size}")
    val partials = plan.collect {
      case h: HashAggregateExec if h.aggregateExpressions.nonEmpty &&
        h.aggregateExpressions.forall(_.mode == Partial) => h
    }
    assert(partials.size == 1, "moments must combine map-side in one partial pass")
  }

  test("PlanAudit: clean plan reports clean, scale smells warn") {
    import graft.plans.PlanAudit
    val r = PlanAudit.audit(Relational.q01PricingSummary(spark, sfDir))
    assert(r.scans == 1 && r.scansWithPushedFilters == 1,
      s"q01 must be one scan with its filter pushed: $r")
    assert(r.partialAggregates >= r.finalAggregates && r.finalAggregates >= 1,
      s"every q01 final aggregate must ride a partial: $r")
    assert(r.warnings.isEmpty, s"q01 is the clean baseline: ${r.warnings}")
    // a cross join whose BUILD side is non-tiny must be called out
    // (forced broadcast so Spark can't pick the smaller side)
    val bad = Tables.orders(spark, sfDir)
      .crossJoin(broadcast(
        Tables.orders(spark, sfDir).select(col("o_orderkey")).limit(1100)))
    val rb = PlanAudit.audit(bad)
    assert(rb.warnings.exists(w => w.contains("cartesian") || w.contains("nested-loop")),
      s"big cross join must warn: ${rb.warnings} ($rb)")
    // ...but a scalar/dimension broadcast side (the s01/p06/t09
    // pattern) is a map-side constant join, not a scale smell
    val fine = Tables.customer(spark, sfDir)
      .crossJoin(broadcast(Tables.region(spark, sfDir).select(col("r_name"))))
    val rf = PlanAudit.audit(fine)
    assert(rf.nestedLoopJoins == 1 && rf.largeNestedLoopJoins == 0 &&
      rf.warnings.isEmpty,
      s"tiny-broadcast cross join must not warn: $rf ${rf.warnings}")
  }

  test("q46 referential audit shares one scan per base table across all FK edges") {
    // 4 FK edges over 5 tables: the naive per-edge form costs 8 scans
    // + stacked crossJoins; the consolidated form must scan each base
    // table exactly once and join nothing (counts fall out of one
    // (edge, key) aggregation)
    import graft.plans.PlanAudit
    val r = PlanAudit.audit(Relational.q46ReferentialAudit(spark, sfDir))
    assert(r.scans == 5, s"one scan per base table, got ${r.scans}: $r")
    assert(r.broadcastJoins + r.shuffledJoins + r.nestedLoopJoins +
      r.cartesianProducts == 0, s"no joins at all: $r")
    assert(r.partialAggregates >= 1, s"the key agg must combine map-side: $r")
  }

  test("PlanAudit sees scans and joins hiding inside subquery plans") {
    // scalar/IN subquery plans hang off EXPRESSIONS, not children — a
    // walker that only follows children reports a subquery-heavy query
    // as scan-free and every audit of it passes vacuously
    import graft.plans.PlanAudit
    // a REAL scalar subquery via SQL, so it stays a subquery plan
    // (DataFrame-side scalar joins would surface as ordinary joins)
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("pa_li")
    val r = PlanAudit.audit(spark.sql(
      """SELECT l_orderkey, l_quantity FROM pa_li
        |WHERE l_quantity > (SELECT avg(l_quantity) FROM pa_li)""".stripMargin))
    assert(r.scans >= 2,
      s"the subquery's own scan must be visible to the audit: $r")
    assert(r.finalAggregates >= 1,
      s"the subquery's aggregate must be visible: $r")
  }

  test("PlanAudit sees through AQE query stages (no vacuous zero report)") {
    // under adaptive execution (the production default) the settled
    // plan is a tree of QueryStageExec LEAVES — a naive collect
    // reports zero everything and every audit passes vacuously
    import graft.plans.PlanAudit
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val r = PlanAudit.audit(
        Tables.lineitem(spark, sfDir)
          .filter(col("l_quantity") > 10)
          .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n")))
      assert(r.scans == 1 && r.scansWithPushedFilters == 1,
        s"AQE audit must still see the scan: $r")
      assert(r.partialAggregates >= 1 && r.finalAggregates >= 1 &&
        r.shuffleExchanges >= 1, s"AQE audit must see agg + exchange: $r")
      // and the tiny-broadcast metric read works through stage shells
      val fine = Tables.customer(spark, sfDir)
        .crossJoin(broadcast(Tables.region(spark, sfDir).select(col("r_name"))))
      val rf = PlanAudit.audit(fine)
      assert(rf.nestedLoopJoins == 1 && rf.largeNestedLoopJoins == 0,
        s"tiny broadcast side must be measured through the query stage: $rf")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "false")
  }

  test("custom expressions compile into generated code that calls the kernels") {
    // the §8 claim as a check: hot-path expressions participate in
    // whole-stage codegen with a direct static-kernel call — if one
    // regressed to CodegenFallback, the generated source would carry
    // an interpreted eval instead and these markers would vanish
    graft.functions.registerAll(spark)
    val docs = Tables.documents(spark, sfDir)
    val textCode = org.apache.spark.sql.execution.debug.codegenString(
      docs.select(
        call_function("minhash_sig", col("text"), lit(16), lit(3)).as("m"),
        call_function("word_grams", col("text"), lit(2)).as("g"),
        call_function("langid_top", col("text")).as("l"),
        call_function("char_entropy", col("text")).as("e"),
        call_function("stopword_hits", col("text")).as("s"))
        .queryExecution.executedPlan)
    assert(textCode.contains("graft.functions.Kernels"),
      "text kernels must be called from whole-stage generated code")
    val vecCode = org.apache.spark.sql.execution.debug.codegenString(
      Tables.embeddings(spark, sfDir)
        .select(call_function("cosine_sim", col("embedding"), col("embedding")).as("c"))
        .queryExecution.executedPlan)
    assert(vecCode.contains("Kernels.cosineF"),
      "vector cosine must be a direct static call in generated code")
  }

  test("bloom_agg/bloom_contains: no false negatives, low fp rate") {
    import spark.implicits._
    graft.functions.registerAll(spark)
    val members = (0 until 2000).map(i => s"member_$i")
    val bloom = members.toDF("s")
      .agg(call_function("bloom_agg", xxhash64(col("s")), lit(4096L), lit(1L << 16)).as("bf"))
      .head().getAs[Array[Byte]](0)
    val probes = members.toDF("s")
      .union((0 until 2000).map(i => s"outsider_$i").toDF("s"))
      .withColumn("hit", call_function("bloom_contains", lit(bloom), xxhash64(col("s"))))
      .collect().map(r => (r.getString(0), r.getBoolean(1)))
    // a bloom NEVER misses a member — this is what makes d12 exact
    assert(probes.filter(_._1.startsWith("member")).forall(_._2),
      "false negative: bloom missed an inserted member")
    val fp = probes.filter(_._1.startsWith("outsider")).count(_._2)
    assert(fp <= 100, s"fp rate implausibly high for 2k items in 64k bits: $fp/2000")
  }

  test("aggregations are partial (pre-combined) below every exchange") {
    // the OPS invariant at plan level: every Final HashAggregate is
    // fed (across its exchange) by a Partial-mode pre-aggregate, so
    // the shuffle carries combined state, not raw rows
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Final, Partial}
    val plan = executed(Relational.q01PricingSummary(spark, sfDir))
    val finals = plan.collect {
      case h: HashAggregateExec if h.aggregateExpressions.exists(_.mode == Final) => h
    }
    assert(finals.nonEmpty, "q01 must aggregate")
    finals.foreach { f =>
      val partialBelow = f.collectFirst {
        case h: HashAggregateExec if h.aggregateExpressions.nonEmpty &&
          h.aggregateExpressions.forall(_.mode == Partial) => h
      }
      assert(partialBelow.nonEmpty, s"no partial pre-aggregate below final agg:\n$f")
      val exchangeBetween = f.collectFirst { case e: ShuffleExchangeExec => e }
      assert(exchangeBetween.nonEmpty, "final agg must sit above the shuffle")
    }
  }

  test("every query key plans warning-free under PlanAudit") {
    // the whole-suite scale contract, as ONE standing assertion: no
    // cartesian products, no non-tiny nested-loop joins, no shuffle
    // carrying raw rows where a partial aggregate belongs — for EVERY
    // key in SparkEntry.queries, executed at sf0.001. A new operator
    // that trips a warning fails here with its name; a deliberate
    // exception must be argued into an allowlist, not slipped past a
    // reviewer's eyeball pass (as of round 8 the allowlist is empty:
    // all 122 keys audit clean — the broadcast(tiny) control-plane
    // cross joins plan as small-build BroadcastNestedLoop, which the
    // audit's size gate accepts by design).
    val allowlisted: Map[String, String] = Map.empty
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val ws = graft.plans.PlanAudit.audit(fn(spark, sfDir)).warnings
      if (ws.isEmpty || allowlisted.contains(name)) None
      else Some(s"$name: ${ws.mkString(" | ")}")
    }
    assert(bad.isEmpty, s"plan warnings:\n${bad.mkString("\n")}")
  }
}
