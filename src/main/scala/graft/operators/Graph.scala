package graft.operators

import graft.Ckpt._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph algorithms over the star schema beyond the dedup
  * connected-components (Dedup.connectedComponents) — the PageRank
  * family the reference ships in its graph library (reference:
  * /root/reference/graphx/src/main/scala/org/apache/spark/graphx/
  * lib/PageRank.scala:1), re-expressed as DataFrame joins +
  * partial-agg'd sums instead of a vertex-program runtime.
  *
  * The graph: the customer↔supplier trading network — an edge when a
  * customer's order contains a supplier's line item, taken in BOTH
  * directions so the walk is over the undirected bipartite graph and
  * no node is dangling (every node in the edge set has out-degree
  * ≥ 1, so no dangling-mass redistribution step is needed and the
  * oracle replication stays exact). Node ids disambiguate the two
  * key spaces arithmetically: customer c ↦ 2c, supplier s ↦ 2s+1.
  *
  * Determinism contract (the kmeans-oracle pattern): ranks live in
  * integer TICKS of 2^-40 ([[RankScale]]), every per-edge
  * contribution and damping step is integer arithmetic over
  * positives (floor == truncate, so DuckDB's `//` and Spark's `div`
  * agree), and sums of longs are order-independent — the
  * [[PageRankIters]]-round iteration is bit-reproducible across
  * partitionings, retries, and engines. Truncation loss (≤ 1 tick
  * per division) leaks mass instead of redistributing it — the
  * documented trade for cross-engine exactness; at 2^40 ticks the
  * relative loss is ~1e-9 per round.
  *
  * Scale shape: each round is ONE shuffle — contributions aggregate
  * on dst with map-side partial sums (ticks are longs), then a
  * broadcast-free left join back to the node set; the edge frame with
  * its out-degrees is computed once and reused every round
  * (production: bucketed by src so the per-round join is
  * exchange-free). Per-round `ckpt` keeps lineage flat —
  * the same exponential-plan lesson as connectedComponents.
  *
  * Coverage vs the reference graph library: PageRank (g01/g03), HITS
  * (g02), TriangleCount (g04), LabelPropagation (g05), ShortestPaths
  * (g06), ConnectedComponents (Dedup.connectedComponents, shipped
  * under d07), and StronglyConnectedComponents ([[g19Scc]]) over the
  * DIRECTED trade graph — the mirrored graph is symmetric (SCC ≡ CC
  * there), so g19 derives direction from the data instead: every
  * customer→supplier purchase is a forward edge, and the
  * supplier→customer REVERSE edge exists only for relationships
  * strong enough ([[SccBackMinCount]] lineitems) to read as a
  * two-way dependency, giving SCC semantics genuinely distinct from
  * CC (reference: /root/reference/graphx/src/main/scala/org/apache/
  * spark/graphx/lib/StronglyConnectedComponents.scala:1).
  */
object Graph {

  /** Tick scale: ranks are longs in units of 2^-40. */
  private[graft] val RankScale: Long = 1L << 40

  /** Fixed iteration count — fixed (not convergence-tested) so the
    * result is a pure function of the corpus and the oracle unrolls
    * exactly this many rounds.
    */
  private[graft] val PageRankIters = 5

  /** Generic bounded-round synchronous vertex program — the Pregel
    * shape the reference exposes as graphx's Pregel/aggregateMessages
    * (reference: /root/reference/graphx/src/main/scala/org/apache/
    * spark/graphx/Pregel.scala:1), re-expressed over DataFrames: the
    * caller supplies the vertex state frame, a `send` that turns the
    * current state into messages addressed by `id`, and an `apply`
    * that folds the round's messages into the next state; the
    * combinator owns what every iterative graph operator here had to
    * get right individually — the FIXED round bound (determinism +
    * oracle-unrollability contract), the eager initial checkpoint,
    * and the per-round lazy `ckpt` that keeps lineage flat
    * (the exponential-plan lesson from connectedComponents).
    *
    * The shipped iterative operators are instances — label
    * propagation is `send` = neighbor labels / `apply` = per-id mode,
    * bounded BFS is `send` = frontier+1 / `apply` = min-merge with
    * frontier bookkeeping in a state column — and the spec pins
    * pregel-derived g05/g06 BIT-IDENTICAL to the shipped operators,
    * so the combinator is proven general, not decorative. Message
    * combining stays inside `apply`'s aggregation, where Catalyst
    * makes it a map-side partial agg — the aggregateMessages
    * optimization falls out of the plan rather than the runtime.
    */
  private[graft] def pregel(
      init: DataFrame,
      send: DataFrame => DataFrame,
      apply: (DataFrame, DataFrame) => DataFrame,
      iters: Int): DataFrame = {
    require(iters >= 0, s"pregel: iters must be >= 0, got $iters")
    var state = init.ckpt(true)
    // Scale-adaptive build side (r16, [[graft.Engine.hintSmall]]):
    // the per-round state is node-sized and checkpointed, so the
    // planner sees default stats and SMJ-shuffles the EDGE frame in
    // `send` every round; the state row count is round-invariant
    // (one row per node), so one bounded count decides the hint for
    // all rounds — broadcast under the threshold, shuffle join past
    // it (the graphx block shape).
    //
    // PRECONDITION (r17, the r16-advice note): the count below bounds
    // every round ONLY when `apply` keeps the state keyed inside the
    // init frame's node domain. Every in-tree caller does — their
    // edges are mirrored/undirected, so message dst ids ⊆ the src
    // domain init was built from. A caller whose apply can grow the
    // key set past init (directed edges reaching nodes with no init
    // row) must count src ∪ dst instead, or the broadcast side can
    // exceed the counted bound.
    val n = state.count()
    for (_ <- 1 to iters)
      state = apply(state, send(graft.Engine.hintSmall(state, n))).ckpt(false)
    state
  }

  /** Materialize-once distinct (customer, supplier) pair frame
    * (a = 2·custkey, b = 2·suppkey+1) per (session, sfDir, input
    * fingerprints) — the whole g-family derives its edge frames from
    * it (g02/g04 directly, the rest via [[tradeEdges]]), and
    * rebuilding the orders⋈lineitem distinct per operator in one
    * sweep is pure waste. Same [[graft.FrameMemo]] lifecycle (and
    * staleness contract) as Dedup's cluster labels.
    */
  private val pairsMemo = new graft.FrameMemo[org.apache.spark.sql.DataFrame]

  private def tradePairs(spark: SparkSession, sfDir: String): DataFrame =
    pairsMemo.getOrCompute(spark, sfDir,
      Tables.fingerprint(spark, sfDir, "orders") + "|" +
        Tables.fingerprint(spark, sfDir, "lineitem")) {
      Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey").as("o_orderkey"), col("l_suppkey")),
          "o_orderkey")
        .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
        .distinct()
        .ckpt(true)
    }

  /** Materialize-once mirrored edge frame with out-degrees — FIVE
    * operators consume it (g01, g03, g05, g06 directly; g02 via the
    * pairs), and re-deriving the mirror + degree shuffle + checkpoint
    * per operator is the same waste the pairs memo removed.
    */
  private val edgesMemo = new graft.FrameMemo[org.apache.spark.sql.DataFrame]

  /** Persistent-RDD ids backing the live graph memos — see
    * [[graft.FrameMemo]] for the bench-harness cleanup contract.
    */
  private[graft] def memoRetainedIds: Set[Int] =
    pairsMemo.retainedIds ++ edgesMemo.retainedIds ++
      undMemo.retainedIds ++ walkMemo.retainedIds ++
      labelsMemo.retainedIds ++ lmMemo.retainedIds

  /** Drop the graph memos and unpersist their blocks. */
  private[graft] def clearMemos(): Unit = {
    pairsMemo.clear(); edgesMemo.clear(); undMemo.clear(); walkMemo.clear()
    labelsMemo.clear(); lmMemo.clear()
  }

  /** Directed-both-ways bipartite edge set with out-degrees:
    * (src, dst, odeg) — the shared pairs, mirrored, memoized and
    * eagerly checkpointed once per (session, dir, inputs). The
    * upstream pairs frame is computed BEFORE entering this memo's
    * compute block — the [[graft.FrameMemo]] no-nested-compute
    * lock-order invariant.
    */
  private def tradeEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = tradePairs(spark, sfDir)
    edgesMemo.getOrCompute(spark, sfDir,
      Tables.fingerprint(spark, sfDir, "orders") + "|" +
        Tables.fingerprint(spark, sfDir, "lineitem") + "|edges") {
      val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
        .union(pairs.select(col("b").as("src"), col("a").as("dst")))
      val odeg = edges.groupBy(col("src")).agg(count(lit(1)).as("odeg"))
      edges.join(odeg, "src").ckpt(true)
    }
  }

  /** g01: PageRank over the customer↔supplier trading network —
    * the "which suppliers anchor the purchasing graph" centrality a
    * procurement or risk review asks for. Output one row per node:
    * (node_type 'c'|'s', entity_key, rank_ticks).
    */
  def g01PageRank(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = tradeEdges(spark, sfDir)
    val nodes = edges.select(col("src").as("id")).distinct()
      .ckpt(true)
    val n = nodes.count()
    require(n > 0, "g01: empty trading graph")
    // r0 = SCALE/n; base = (r0*15)/100 — the SAME expression order the
    // oracle uses, so truncation agrees bit-for-bit
    val r0 = RankScale / n
    val base = r0 * 15 / 100
    // LAZY per-round checkpoint: each round's ranks frame is consumed
    // exactly once (the contribution join), so unlike CC there is no
    // double-reference blow-up — but an un-truncated 5-round DAG
    // planned as ONE query measured ~30% slower than round-by-round
    // execution (deep plan, serialized AQE stages), and EAGER
    // checkpoints pay a separate materialization job per round.
    // Lazy truncates lineage while materializing inside the next
    // round's own first job — measured fastest of the three.
    var ranks = nodes.select(col("id"), lit(r0).as("r"))
    // node-sized per-round state: scale-adaptive broadcast off the
    // count the operator already takes (r16, the pregel rationale) —
    // the edge frame then never re-shuffles inside the loop
    for (_ <- 1 to PageRankIters) {
      val contribs = edges.join(graft.Engine.hintSmall(
          ranks.withColumnRenamed("id", "src"), n), "src")
        .select(col("dst").as("id"), expr("r div odeg").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("s"))
      ranks = nodes.join(graft.Engine.hintSmall(contribs, n), Seq("id"), "left")
        .select(col("id"),
          (lit(base) + coalesce(expr("(85 * s) div 100"), lit(0L))).as("r"))
        .ckpt(false)
    }
    ranks
      .select(
        when(col("id") % 2 === 0, lit("c")).otherwise(lit("s")).as("node_type"),
        expr("id div 2").as("entity_key"),
        col("r").as("rank_ticks"))
      .orderBy(col("node_type"), col("entity_key"))
  }

  /** g03: PERSONALIZED PageRank — the random walk teleports to one
    * seed node instead of everywhere, ranking the graph BY RELEVANCE
    * TO THAT NODE ("which suppliers matter to this account", the
    * account-centric view g01's global centrality can't give). Seed:
    * the smallest customer node id — deterministic and
    * parameter-free, as the driver contract requires; a production
    * caller passes its own seed. Same tick arithmetic, edge frame,
    * and lineage strategy as [[g01PageRank]]; the only delta is the
    * teleport term (full mass at the seed, zero elsewhere), so rank
    * mass decays with graph distance from the seed and unreachable
    * nodes stay exactly 0.
    */
  def g03PersonalizedPagerank(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = tradeEdges(spark, sfDir)
    val nodes = edges.select(col("src").as("id")).distinct()
      .ckpt(true)
    // 1-row driver scalars, same bounded pattern as g01's node count.
    // min() over zero rows is a null aggregate — fail with a contract
    // message (g01's require(n > 0) analogue) instead of an NPE.
    val seedRow = nodes.filter(col("id") % 2 === 0).agg(min(col("id")))
      .collect()(0)
    require(!seedRow.isNullAt(0), "g03: empty trading graph (no customer nodes)")
    val seed = seedRow.getLong(0)
    val teleport = RankScale * 15 / 100
    // the g01 scale-adaptive loop hint, off one bounded node count
    val n = nodes.count()
    var ranks = nodes.select(col("id"),
      when(col("id") === seed, lit(RankScale)).otherwise(lit(0L)).as("r"))
    for (_ <- 1 to PageRankIters) {
      val contribs = edges.join(graft.Engine.hintSmall(
          ranks.withColumnRenamed("id", "src"), n), "src")
        .select(col("dst").as("id"), expr("r div odeg").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("s"))
      ranks = nodes.join(graft.Engine.hintSmall(contribs, n), Seq("id"), "left")
        .select(col("id"),
          (when(col("id") === seed, lit(teleport)).otherwise(lit(0L)) +
            coalesce(expr("(85 * s) div 100"), lit(0L))).as("r"))
        .ckpt(false)
    }
    ranks
      .select(
        when(col("id") % 2 === 0, lit("c")).otherwise(lit("s")).as("node_type"),
        expr("id div 2").as("entity_key"),
        col("r").as("rank_ticks"))
      .orderBy(col("node_type"), col("entity_key"))
  }

  /** Tick scale for [[g02Hits]]: 2^20 per unit, small enough that
    * raw-sum × scale stays in a long for out-degrees up to ~2^23
    * (documented bound; degrees beyond that call for a wider tick).
    */
  private[graft] val HitsScale: Long = 1L << 20

  /** Fixed HITS rounds — unrolled exactly in the oracle. */
  private[graft] val HitsIters = 4

  /** g02: HITS over the directed customer→supplier order graph —
    * hubs (customers whose orders span the important suppliers) and
    * authorities (suppliers ordered by the important customers): the
    * mutual-reinforcement centrality PageRank's single score can't
    * split, and the natural fit for a bipartite graph (customers are
    * ONLY hubs, suppliers ONLY authorities, so the two HITS halves
    * land on the two node families with no mixing).
    *
    * Determinism: scores are integer ticks of 2^-20; each half-round
    * is a long sum over in/out-edges followed by L∞ normalization
    * `(raw * scale) div max(raw)` — max over longs and floor division
    * on positives agree across engines, so [[HitsIters]] rounds are
    * bit-reproducible and the oracle unrolls them exactly.
    *
    * Scale shape per round: two shuffles (sum on supplier, sum on
    * customer), both partial-agg'd; the max is a 1-row broadcast, the
    * same scalar-join pattern as the kmeans oracle ops. Raw-sum
    * frames are checkpointed per half-round: each is read twice (max
    * + normalize join), and unmaterialized that re-runs the whole
    * preceding chain — the exponential-recompute lesson, applied.
    */
  def g02Hits(spark: SparkSession, sfDir: String): DataFrame = {
    // decode the shared pair frame back to raw keys (a = 2c even,
    // b = 2s+1 odd — both floor cleanly)
    val edges = tradePairs(spark, sfDir)
      .select(expr("a div 2").as("c"), expr("b div 2").as("s"))
    def normalized(raw: DataFrame, valueCol: String): DataFrame = {
      // LAZY checkpoint: the max aggregation below is the first job to
      // touch the frame and materializes it as it runs (one pass),
      // where an eager checkpoint would burn a separate
      // materialization job per half-round — 8 extra jobs over the
      // iteration for frames this small (measured ~2x the operator).
      // The checkpoint itself is still required: max and the
      // normalize join BOTH read the frame, and unmaterialized that
      // doubles the whole preceding chain per half-round —
      // exponential in rounds.
      val r = raw.ckpt(false)
      val m = r.agg(max(col(valueCol)).as("__m"))
      r.crossJoin(broadcast(m))
        .select(r.columns.filterNot(_ == valueCol).map(col) :+
          expr(s"($valueCol * $HitsScale) div __m").as(valueCol): _*)
    }
    // one bounded 1-row read of both entity-domain sizes decides the
    // scale-adaptive loop hints (r16, the g01 rationale): the score
    // frames are ≤ these counts every half-round
    val domRow = edges.agg(countDistinct(col("c")).as("ncd"),
      countDistinct(col("s")).as("nsd")).collect()(0)
    val (ncd, nsd) = (domRow.getLong(0), domRow.getLong(1))
    var hubs = edges.select(col("c")).distinct()
      .select(col("c"), lit(HitsScale).as("h"))
    var auths: DataFrame = null
    for (_ <- 1 to HitsIters) {
      auths = normalized(
        edges.join(graft.Engine.hintSmall(hubs, ncd), "c")
          .groupBy(col("s")).agg(sum(col("h")).as("a")), "a")
      hubs = normalized(
        edges.join(graft.Engine.hintSmall(auths, nsd), "s")
          .groupBy(col("c")).agg(sum(col("a")).as("h")), "h")
    }
    hubs.select(lit("c").as("node_type"), col("c").as("entity_key"),
        col("h").as("score_ticks"))
      .unionByName(auths.select(lit("s").as("node_type"),
        col("s").as("entity_key"), col("a").as("score_ticks")))
      .orderBy(col("node_type"), col("entity_key"))
  }

  /** Strongest partners kept per vertex in g04's sparsified graph. */
  private[graft] val TriTopK = 10

  /** Rank encoding for g04's degree ordering: (degree, id) packed
    * into one long, `deg * 2^32 + id`. Requires ids < 2^32 —
    * suppkeys at any realistic SF; a wider key space would move to a
    * (deg, id) struct join key.
    */
  private[graft] val RankBase = 4294967296L

  /** g04: triangle count over the supplier co-purchase graph — the
    * local-density / community signal the reference ships as
    * TriangleCount (reference: /root/reference/graphx/src/main/
    * scala/org/apache/spark/graphx/lib/TriangleCount.scala:1). The
    * bipartite trade graph itself has no triangles, so g04 projects
    * it: suppliers are linked by shared customers — but in this
    * corpus EVERY supplier pair shares a customer (the projection is
    * complete, C(n,2) edges, and its triangle count degenerates to
    * C(n,3)). So the graph g04 counts on is the co-purchase STRENGTH
    * graph: each supplier keeps its [[TriTopK]] strongest partners
    * (most shared customers, ties broken by partner key), the union
    * of kept directed edges taken undirected. Per-vertex top-k is the
    * scale-safe sparsification — a partitioned window, no global
    * sort, no fixed threshold to retune per corpus.
    *
    * Counting is the standard degree-ordered wedge join: orient every
    * edge from lower to higher (degree, id) rank, join wedges on the
    * shared low vertex, probe the oriented edge set — O(E^1.5) worst
    * case instead of a hub blow-up, and each triangle is found
    * exactly once. Output: (supp_key, degree, tri_cnt) per vertex of
    * the sparsified graph.
    *
    * Scale shape: the projection self-join would explode per-customer
    * degree (C(d,2) pairs per customer) on a power-law key, so the
    * projection caps per-customer fan-out FIRST: each customer keeps
    * its [[CustFanoutCap]] strongest suppliers (most shared lines,
    * ties to the smaller suppkey) via a partitioned window before the
    * self-join — a hub customer with 10^5 suppliers emits C(128,2) ≈
    * 8.1e3 pairs instead of 5e9 ([[capCustFanout]]). The window,
    * orientation, and wedge join are all partition-parallel.
    */
  /** Memo for the sparsified co-purchase graph — TWO operators read
    * it (g04's triangle count, g07's link prediction), and the
    * projection self-join behind it is the family's most expensive
    * derived frame after the trade pairs themselves.
    */
  private val undMemo = new graft.FrameMemo[org.apache.spark.sql.DataFrame]

  /** Per-customer fan-out cap for the co-purchase projection's
    * self-join input. At the test SFs the cap must NOT bind (max
    * observed fan-out: 67 suppliers/customer at sf0.01, 102 at
    * sf0.1 — spec'd in JoinsGraphSpec), so the oracle needs no cap
    * clause; at 100 TB it bounds the projection blow-up: one hub
    * customer with degree d emits C(min(d, 128), 2) ≤ 8,128 pairs
    * instead of C(d, 2). 128 is headroom 1.25× over the sf0.1 max —
    * the j04 sessions-guard sizing pattern.
    */
  private[graft] val CustFanoutCap = 128

  /** The projection's scale guard (see [[CustFanoutCap]]): from a
    * (c, s, nl) customer→supplier frame with shared-line counts,
    * keep each customer's [[CustFanoutCap]] strongest suppliers —
    * most shared lines, ties to the smaller suppkey, a partitioned
    * window (no global sort). Factored out so the hub-blow-up bound
    * is testable on a synthetic power-law frame.
    */
  private[graft] def capCustFanout(cs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c"))
      .orderBy(col("nl").desc, col("s").asc)
    cs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= CustFanoutCap)
      .select(col("c"), col("s"))
  }

  /** The sparsified undirected supplier co-purchase graph (a < b):
    * suppliers linked by shared customers, each keeping its
    * [[TriTopK]] strongest partners (most shared customers, ties to
    * the smaller partner key), the union of kept directed edges taken
    * undirected. The self-join input is fan-out-capped per customer
    * ([[capCustFanout]]) — the projection's 100 TB guard. Memoized +
    * eagerly checkpointed; reads the base tables directly (plain
    * parquet loads, no nested memo — the [[graft.FrameMemo]]
    * lock-order invariant holds).
    */
  private[graft] def coPurchaseUnd(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    undMemo.getOrCompute(spark, sfDir,
      Tables.fingerprint(spark, sfDir, "orders") + "|" +
        Tables.fingerprint(spark, sfDir, "lineitem") + "|copurchase") {
      val cs = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey").as("o_orderkey"), col("l_suppkey")),
          "o_orderkey")
        .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("s"))
        .agg(count(lit(1)).as("nl"))
      val tp = capCustFanout(cs)
      // r16: SHUFFLE_HASH on the projection self-join (the window
      // output planned SMJ — two sorts of the capped frame) and the
      // supplier pair packed into ONE long for the count aggregation
      // (the s32 dots treatment; [[graft.Engine.packPair]] guards the
      // < 2³¹ injectivity bound in-flight — r17).
      val cc = tp.as("x").join(tp.as("y").hint("shuffle_hash"),
          col("x.c") === col("y.c") && col("x.s") < col("y.s"))
        .groupBy(graft.Engine.packPair(col("x.s"), col("y.s")).as("ss"))
        .agg(count(lit(1)).as("n"))
        .select(shiftright(col("ss"), 32).as("s1"),
          col("ss").bitwiseAND(lit(0xFFFFFFFFL)).as("s2"), col("n"))
      val dir = cc.select(col("s1").as("u"), col("s2").as("v"), col("n"))
        .union(cc.select(col("s2").as("u"), col("s1").as("v"), col("n")))
      val topk = Window.partitionBy(col("u")).orderBy(col("n").desc, col("v").asc)
      dir.withColumn("rn", row_number().over(topk))
        .filter(col("rn") <= TriTopK)
        .select(least(col("u"), col("v")).as("a"),
          greatest(col("u"), col("v")).as("b"))
        .distinct()
        .ckpt(true)
    }
  }

  /** Degree frame (v, d) of an undirected (a < b) edge frame,
    * eagerly checkpointed — every consumer reads it at least twice.
    */
  private def degreeFrame(und: DataFrame): DataFrame =
    und.select(col("a").as("v")).union(und.select(col("b")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
      .ckpt(true)

  /** The degree-ordered wedge join shared by g04 and g08: orient
    * every edge toward the higher (degree, id) rank, then each
    * triangle materializes exactly once as a wedge at its
    * lowest-rank vertex closed by the third edge — the standard
    * O(E^1.5) bound that keeps hub vertices from exploding the join.
    * Returns the (x, y, z) triangle triples.
    */
  private def wedgeTriangles(und: DataFrame, deg: DataFrame): DataFrame = {
    val rk = deg.select(col("v"), (col("d") * RankBase + col("v")).as("r"))
    val ore = und
      .join(rk.select(col("v").as("a"), col("r").as("ra")), "a")
      .join(rk.select(col("v").as("b"), col("r").as("rb")), "b")
      .select(
        when(col("ra") < col("rb"), col("a")).otherwise(col("b")).as("src"),
        when(col("ra") < col("rb"), col("b")).otherwise(col("a")).as("dst"),
        greatest(col("ra"), col("rb")).as("rdst"))
      .ckpt(true) // read three times by the wedge self-join
    ore.as("e1")
      .join(ore.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.rdst") < col("e2.rdst"))
      .join(ore.as("e3"),
        col("e3.src") === col("e1.dst") && col("e3.dst") === col("e2.dst"))
      .select(col("e1.src").as("x"), col("e1.dst").as("y"),
        col("e2.dst").as("z"))
  }

  def g04TriangleCount(spark: SparkSession, sfDir: String): DataFrame = {
    val und = coPurchaseUnd(spark, sfDir)
    val deg = degreeFrame(und)
    val tri = wedgeTriangles(und, deg)
    val tc = tri.select(col("x").as("v"))
      .union(tri.select(col("y").as("v")))
      .union(tri.select(col("z").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("t"))
    deg.join(tc, Seq("v"), "left")
      .select(col("v").as("supp_key"), col("d").as("degree"),
        coalesce(col("t"), lit(0L)).as("tri_cnt"))
      .orderBy(col("supp_key"))
  }

  /** Fixed synchronous label-propagation rounds — unrolled exactly in
    * the oracle.
    */
  private[graft] val LabelPropIters = 4

  /** g05: label propagation over the trading network — the
    * community-detection pass the reference ships as LabelPropagation
    * (reference: /root/reference/graphx/src/main/scala/org/apache/
    * spark/graphx/lib/LabelPropagation.scala:1). Every node starts
    * labeled with its own id; each synchronous round relabels every
    * node with the most frequent label among its NEIGHBORS (not
    * itself), ties broken toward the smallest label — the same
    * argmax-by-(count, -label) struct-max trick as q45's
    * mode-per-group, so the result is deterministic and tick-free
    * (labels are node ids, longs end to end).
    *
    * Scale shape per round: one shuffle to count (dst, label) pairs
    * with map-side partial aggregation, one partial-agg'd struct-max
    * per dst — the CC loop's cost profile with mode instead of min.
    * Lazy per-round ckpt, the measured g01 strategy.
    */
  /** Synchronous label-propagation core: `edges` is a mirrored
    * (src, dst) frame; returns (id, lab) after `iters` rounds.
    * Package-private so the spec can probe convergence round by
    * round on synthetic graphs.
    */
  private[graft] def labelPropRounds(edges: DataFrame, iters: Int): DataFrame = {
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("lab"))
      .ckpt(true)
    // node-sized round-invariant state: one count, hints every round
    val n = labels.count()
    for (_ <- 1 to iters) {
      labels = edges.join(graft.Engine.hintSmall(
          labels.withColumnRenamed("id", "src"), n), "src")
        .groupBy(col("dst").as("id"), col("lab"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("id"))
        .agg(max(struct(col("c"), (-col("lab")).as("nl"))).as("m"))
        .select(col("id"), (-col("m.nl")).as("lab"))
        .ckpt(false)
    }
    labels
  }

  /** Memo for the converged label frame — g05 reports it and g13
    * scores its modularity; the 4-round propagation behind it is a
    * per-round shuffle chain worth computing once per sweep.
    */
  private val labelsMemo = new graft.FrameMemo[org.apache.spark.sql.DataFrame]

  /** The memoized [[labelPropRounds]] result over the trade graph.
    * `tradeEdges` resolves its own memo BEFORE this compute block —
    * the [[graft.FrameMemo]] no-nested-compute lock-order invariant.
    */
  private[graft] def tradeLabels(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = tradeEdges(spark, sfDir).select(col("src"), col("dst"))
    labelsMemo.getOrCompute(spark, sfDir,
      Tables.fingerprint(spark, sfDir, "orders") + "|" +
        Tables.fingerprint(spark, sfDir, "lineitem") + "|labels") {
      labelPropRounds(edges, LabelPropIters).ckpt(true)
    }
  }

  def g05LabelProp(spark: SparkSession, sfDir: String): DataFrame = {
    tradeLabels(spark, sfDir).select(
        when(col("id") % 2 === 0, lit("c")).otherwise(lit("s")).as("node_type"),
        expr("id div 2").as("entity_key"),
        when(col("lab") % 2 === 0, lit("c")).otherwise(lit("s"))
          .as("label_type"),
        expr("lab div 2").as("label_key"))
      .orderBy(col("node_type"), col("entity_key"))
  }

  /** g06 seed-set size and hop bound. The trade graph's diameter at
    * test SFs is ≤ 4; [[SsspIters]] = 6 bounds the frontier expansion
    * (and the oracle's recursion depth) with slack, and makes the
    * result a pure function of the corpus even on a corpus where the
    * bound binds.
    */
  private[graft] val SsspSeeds = 3
  private[graft] val SsspIters = 6

  /** g06: multi-source shortest paths (hop counts) from a seed set —
    * the reference's ShortestPaths (reference: /root/reference/
    * graphx/src/main/scala/org/apache/spark/graphx/lib/
    * ShortestPaths.scala:1). Seeds: the [[SsspSeeds]] smallest
    * customer nodes — deterministic and parameter-free like g03's
    * seed; a production caller passes its own seed frame. Iterative
    * min-plus: each round extends the reached set one hop
    * ([[SsspIters]] rounds) and keeps the minimum hop count per node;
    * nodes unreached within the bound are absent from the output.
    *
    * Scale shape per round: the edge frame joins only the FRONTIER —
    * the nodes first reached last round — not the whole reached set:
    * on unit-weight BFS a node's hop count is final the first round
    * it appears, so re-expanding interior nodes is pure waste that
    * grows with every round. Each round is one shuffle-join on src
    * over the frontier, a partial-agg'd min over the candidates, and
    * an id-only anti-join against the reached set; the reached set
    * itself grows by disjoint union (no full-set re-aggregation).
    * Measured (stage-level shuffle-write records, JoinsGraphSpec):
    * on a 512-node path graph at 16 rounds the frontier loop writes
    * 31 records vs 375 for full re-expansion (12×, and the gap grows
    * linearly with diameter); on the diameter-~3 sf0.01 trade graph
    * it is 503k vs 523k — there the per-round EDGE-side re-shuffle
    * dominates both variants, which is exactly what the production
    * bucketed-by-src edge frame (scaladoc above) removes. Integer
    * hops, no ticks.
    */
  /** Bounded multi-source BFS core: `edges` mirrored (src, dst),
    * `seeds` a 1-column (id) frame; returns (id, d) for every node
    * reached within `iters` hops. Package-private for the spec.
    */
  private[graft] def boundedBfs(
      edges: DataFrame, seeds: DataFrame, iters: Int,
      nodeBound: Long = -1L): DataFrame = {
    var dist = seeds.distinct()
      .select(col("id"), lit(0L).as("d")).ckpt(true)
    var frontier = dist
    // frontier and reached set are both ≤ the caller's node bound —
    // scale-adaptive hints keep the edge frame un-shuffled per hop
    // (r16); callers without a cheap bound pass -1 (hint off)
    for (_ <- 1 to iters) {
      val next = edges.join(graft.Engine.hintSmall(
          frontier.withColumnRenamed("id", "src"), nodeBound), "src")
        .select(col("dst").as("id"), (col("d") + 1).as("d"))
      // min over THIS round's candidates only, then keep the truly new
      // ids — first touch is minimal on unit weights, so dist never
      // needs re-aggregating and the union below stays disjoint
      val newly = next.groupBy(col("id")).agg(min(col("d")).as("d"))
        .join(graft.Engine.hintSmall(dist.select(col("id")), nodeBound),
          Seq("id"), "left_anti")
        .ckpt(false)
      dist = dist.union(newly).ckpt(false)
      frontier = newly
    }
    dist
  }

  def g06ShortestPaths(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = tradeEdges(spark, sfDir).select(col("src"), col("dst"))
    val nodes = edges.select(col("src").as("id")).distinct()
    val seeds = nodes.filter(col("id") % 2 === 0)
      .orderBy(col("id")).limit(SsspSeeds)
    boundedBfs(edges, seeds, SsspIters, nodes.count()).select(
        when(col("id") % 2 === 0, lit("c")).otherwise(lit("s")).as("node_type"),
        expr("id div 2").as("entity_key"),
        col("d").as("hops"))
      .orderBy(col("node_type"), col("entity_key"))
  }

  /** The per-LANDMARK bounded BFS — [[boundedBfs]] with the landmark
    * id carried in every key, so each node learns its distance to
    * EACH landmark separately (not the min over all of them): the
    * reference's graphx ShortestPaths contract made literal
    * (reference: /root/reference/graphx/src/main/scala/org/apache/
    * spark/graphx/lib/ShortestPaths.scala:1 — vertex state is a
    * landmark→distance MAP, messages merge per landmark). State is
    * O(N·L) rows with L the landmark-set size — exactly the
    * reference's cost, bounded because landmarks are a small chosen
    * set; per hop one join + one (lm, id) partial-agg min + an
    * anti-join (first touch is minimal on unit weights, the
    * boundedBfs argument per landmark).
    */
  private[graft] def landmarkPaths(edges: DataFrame, landmarks: DataFrame,
      iters: Int, stateBound: Long = -1L): DataFrame = {
    var dist = landmarks.distinct()
      .select(col("id").as("lm"), col("id"), lit(0L).as("d"))
      .ckpt(true)
    var frontier = dist
    // per-landmark frontier/reached ≤ L·nodes — the boundedBfs hint
    // with the caller's O(N·L) bound
    for (_ <- 1 to iters) {
      val next = edges.join(graft.Engine.hintSmall(
          frontier.select(col("lm"), col("id").as("src"), col("d")),
          stateBound), "src")
        .select(col("lm"), col("dst").as("id"), (col("d") + 1).as("d"))
      val newly = next.groupBy(col("lm"), col("id")).agg(min(col("d")).as("d"))
        .join(graft.Engine.hintSmall(dist.select(col("lm"), col("id")),
          stateBound), Seq("lm", "id"), "left_anti")
        .ckpt(false)
      dist = dist.union(newly).ckpt(false)
      frontier = newly
    }
    dist
  }

  /** Materialize-once landmark-distance frame (lm, id, d) over the
    * trade graph — ONE bounded BFS backs both g16 (which reports it)
    * and g17 (which aggregates it into centrality estimates): the
    * bpeMemo/factorsMemo rationale — paying the per-landmark BFS
    * twice per sweep for two views of the same frame is pure waste.
    * The edge memo is computed BEFORE entering this memo (the
    * FrameMemo no-nested-compute contract).
    */
  private val lmMemo = new graft.FrameMemo[org.apache.spark.sql.DataFrame]

  private[graft] def tradeLandmarkDists(
      spark: SparkSession, sfDir: String): DataFrame = {
    val edges = tradeEdges(spark, sfDir).select(col("src"), col("dst"))
    lmMemo.getOrCompute(spark, sfDir,
      Tables.fingerprint(spark, sfDir, "orders") + "|" +
        Tables.fingerprint(spark, sfDir, "lineitem") + "|lmdist") {
      val nodes = edges.select(col("src").as("id")).distinct()
      val seeds = nodes.filter(col("id") % 2 === 0)
        .orderBy(col("id")).limit(SsspSeeds)
      landmarkPaths(edges, seeds, SsspIters,
        SsspSeeds.toLong * nodes.count()).ckpt(true)
    }
  }

  /** g16: per-landmark shortest-path lengths over the trade graph —
    * the graphx ShortestPaths surface g06 does NOT cover (g06
    * reports the min over the whole seed set; the reference returns
    * one distance PER landmark). Same seed rule and hop bound as
    * g06, so the two keys reconcile: min over g16's landmarks ≡
    * g06's distance (spec'd). Output: (node_type, entity_key,
    * landmark_type, landmark_key, hops).
    */
  def g16LandmarkPaths(spark: SparkSession, sfDir: String): DataFrame =
    tradeLandmarkDists(spark, sfDir).select(
        when(col("id") % 2 === 0, lit("c")).otherwise(lit("s")).as("node_type"),
        expr("id div 2").as("entity_key"),
        when(col("lm") % 2 === 0, lit("c")).otherwise(lit("s")).as("landmark_type"),
        expr("lm div 2").as("landmark_key"),
        col("d").as("hops"))
      .orderBy(col("node_type"), col("entity_key"),
        col("landmark_type"), col("landmark_key"))

  /** The closeness aggregation core over a (lm, id, d) landmark
    * distance frame — per node, over the landmarks it reaches at
    * d ≥ 1 (the self row d = 0 carries no distance information and
    * 1/d is undefined on it): n_landmarks, Σhops, closeness =
    * (n_landmarks·2²⁰) div Σhops (reciprocal mean landmark distance
    * — exact, all-positive: Σhops ≥ n_landmarks ≥ 1 by the filter)
    * and harmonic = Σ(2²⁰ div d) (exact integer ticks; the harmonic
    * form is what stays well-defined on disconnected graphs). One
    * partial-agg'd pass over the O(N·L) frame; package-private for
    * the spec's hand-planted geometry.
    */
  private[graft] def closenessOf(dist: DataFrame): DataFrame =
    dist.filter(col("d") >= 1L)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_landmarks"), sum(col("d")).as("sum_hops"),
        sum(expr("1048576L div d")).as("harm_ticks"))
      .withColumn("close_ticks",
        expr("(n_landmarks * 1048576L) div sum_hops"))

  /** g17: landmark closeness/harmonic centrality over the trade
    * graph — the sampled-landmark estimator (Eppstein & Wang 2004:
    * closeness from distances to a small landmark set) computed on
    * the SAME memoized per-landmark BFS frame g16 reports, so the
    * two keys pay ONE bounded BFS per sweep. Exact-over-the-landmark-
    * set semantics (estimation enters only through landmark CHOICE,
    * which is the g06-shared deterministic seed rule — documented);
    * nodes no landmark reaches within the hop bound are absent (the
    * g06 posture). Scale: the aggregation is one partial-agg'd pass
    * over the O(N·L) distance frame; everything downstream is
    * node-sized.
    */
  def g17Closeness(spark: SparkSession, sfDir: String): DataFrame =
    closenessOf(tradeLandmarkDists(spark, sfDir))
      .select(
        when(col("id") % 2 === 0, lit("c")).otherwise(lit("s")).as("node_type"),
        expr("id div 2").as("entity_key"),
        col("n_landmarks"), col("sum_hops"), col("close_ticks"),
        col("harm_ticks"))
      .orderBy(col("node_type"), col("entity_key"))

  /** The assortativity moment→ticks double tree — ONE definition
    * interpolated verbatim into the DataFrame plan AND the DuckDB
    * oracle (the q60 shared-literal contract): Pearson r of the
    * (deg(u), deg(v)) pairs over the mirrored edge list, division
    * by m first so every factor is a plain double of exact longs;
    * zero-variance (regular graph) → 0 by the shared CASE.
    */
  private[graft] val AssortTreeSql: String = {
    val mx = "(CAST(sx AS DOUBLE) / CAST(m_edges AS DOUBLE))"
    val my = "(CAST(sy AS DOUBLE) / CAST(m_edges AS DOUBLE))"
    val vx = s"(CAST(sxx AS DOUBLE) / CAST(m_edges AS DOUBLE) - $mx * $mx)"
    val vy = s"(CAST(syy AS DOUBLE) / CAST(m_edges AS DOUBLE) - $my * $my)"
    val cv = s"(CAST(sxy AS DOUBLE) / CAST(m_edges AS DOUBLE) - $mx * $my)"
    s"""CASE WHEN $vx > 0 AND $vy > 0
       |THEN CAST(floor($cv / sqrt($vx * $vy) * 1048576.0 + 0.5) AS BIGINT)
       |ELSE CAST(0 AS BIGINT) END""".stripMargin
  }

  /** The assortativity core over an (x, y) endpoint-degree pair
    * frame: one partial-agg'd pass to six exact long moments, then
    * [[AssortTreeSql]]. Long headroom: Σx·y ≤ m·deg² — safe past
    * 10⁹ edges at deg ≤ 10⁴ (documented retune = the q60 DECIMAL
    * widening). Package-private for the spec's planted geometries.
    */
  private[graft] def assortativityOf(pairs: DataFrame): DataFrame =
    pairs.agg(count(lit(1)).as("m_edges"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("m_edges"), col("sx"), col("sy"), col("sxx"),
        col("syy"), col("sxy"), expr(AssortTreeSql).as("r_ticks"))

  /** g18: degree assortativity of the trade graph — Newman's degree
    * correlation (Newman 2002, "Assortative mixing in networks"),
    * the one-number structural summary next to g08's profile the
    * graphx surface computes pieces of but never assembles: Pearson
    * r of (deg(u), deg(v)) over every directed edge of the mirrored
    * list (the standard undirected convention — each edge counted
    * both ways, making the x/y sums exactly symmetric). Bipartite
    * trade graphs skew DISASSORTATIVE (hub customers connect to
    * ordinary suppliers); r_ticks quantifies it. One degree join
    * (edges re-keyed by dst) + one partial-agg'd moment pass —
    * nothing beyond the memoized edge frame moves twice.
    */
  def g18Assortativity(spark: SparkSession, sfDir: String): DataFrame = {
    val e = tradeEdges(spark, sfDir)
    val ddeg = e.select(col("src").as("dst"), col("odeg").as("y")).distinct()
    assortativityOf(
      e.select(col("src"), col("dst"), col("odeg").as("x")).join(ddeg, "dst"))
  }

  /** Fixed min-label rounds for [[g15Components]]. The trade graph's
    * diameter at test SFs is ≤ 4; 8 rounds give slack while keeping
    * the result a pure bounded function of the corpus (the g06
    * bound-with-slack contract), and the oracle unrolls the same 8
    * rounds so both engines compute the same function even on a
    * corpus where the bound binds.
    */
  private[graft] val CcIters = 8

  /** Bounded synchronous min-label propagation as a [[pregel]]
    * instance: every node starts labeled with its own id; each round
    * relabels with the minimum over itself and its neighbors. After
    * `iters` ≥ diameter rounds the labels ARE connected components
    * (label = min node id in the component). Package-private so the
    * spec can pin it equal to [[graft.operators.Dedup.connectedComponents]]'
    * converged result.
    */
  private[graft] def minLabelRounds(edges: DataFrame, iters: Int): DataFrame =
    pregel(
      init = edges.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("lab")),
      send = st => edges.join(st.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("lab")),
      apply = (st, msgs) => st.select(col("id"), col("lab")).union(msgs)
        .groupBy(col("id")).agg(min(col("lab")).as("lab")),
      iters = iters)

  /** Spec access to the memoized mirrored trade edge frame (src, dst)
    * — the g15 spec re-derives components via the convergence-tested
    * [[graft.operators.Dedup.connectedComponents]] on the SAME edges.
    */
  private[graft] def tradeEdgesForSpec(
      spark: SparkSession, sfDir: String): DataFrame =
    tradeEdges(spark, sfDir).select(col("src"), col("dst"))

  /** Spec access to the bounded min-label frame g15 reports. */
  private[graft] def tradeMinLabelsForSpec(
      spark: SparkSession, sfDir: String): DataFrame =
    minLabelRounds(tradeEdgesForSpec(spark, sfDir), CcIters)

  /** g15: connected components of the trading network — the
    * reference's ConnectedComponents (reference: /root/reference/
    * graphx/src/main/scala/org/apache/spark/graphx/lib/
    * ConnectedComponents.scala:1), reported per node with the
    * component's min-id label and size. This front door is the
    * BOUNDED [[minLabelRounds]] ([[CcIters]] rounds, oracle-unrolled);
    * the unbounded production path for adversarial long-chain graphs
    * is [[graft.operators.Dedup.connectedComponents]] (convergence
    * test + large-star/small-star fallback, polylog rounds regardless
    * of diameter) — the spec pins the two bit-identical on the trade
    * graph, so the bound-with-slack contract is verified, not assumed.
    *
    * Scale shape per round: one shuffle-join of the edge frame on the
    * label frame plus one partial-agg'd min per node — two longs per
    * node of state, map-side combining on both sides; the same
    * per-round profile as g05 with min instead of mode.
    */
  def g15Components(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = tradeEdges(spark, sfDir).select(col("src"), col("dst"))
    val labels = minLabelRounds(edges, CcIters)
    val sizes = labels.groupBy(col("lab"))
      .agg(count(lit(1)).as("component_size"))
    labels.join(sizes, "lab").select(
        when(col("id") % 2 === 0, lit("c")).otherwise(lit("s")).as("node_type"),
        expr("id div 2").as("entity_key"),
        when(col("lab") % 2 === 0, lit("c")).otherwise(lit("s"))
          .as("comp_type"),
        expr("lab div 2").as("comp_key"),
        col("component_size"))
      .orderBy(col("node_type"), col("entity_key"))
  }

  /** Fixed h-index iteration rounds for [[g09Kcore]] — the measured
    * fixpoint on the trade graph is 2/4/6 rounds at sf0.001/0.01/0.1;
    * 8 gives slack while keeping the result a pure bounded function
    * of the corpus (the g06 bound-with-slack contract).
    */
  private[graft] val KcoreIters = 8

  /** One round's bounded neighbor-value histogram: (src, cv, cnt)
    * where cv = min(c(dst-neighbor), cap(src)) and cap(src) =
    * min(c(src), gcap). A plain partial-agg'd groupBy — a hub's
    * adjacency collapses map-side (combiner) to at most its distinct
    * clamped values per map task, and the reduce-side group carries
    * ≤ min(c_t(src), gcap) rows. Package-private so the hub spec can
    * assert the bound directly.
    */
  private[graft] def corenessHistogram(
      edges: DataFrame, c: DataFrame, gcap: DataFrame,
      nodeBound: Long = -1L): DataFrame = {
    val caps = c.crossJoin(broadcast(gcap))
      .select(col("id").as("src"), least(col("c"), col("gcap")).as("cap"))
    edges.join(graft.Engine.hintSmall(
        c.withColumnRenamed("id", "dst"), nodeBound), "dst")
      .select(col("src"), col("c"))
      .join(graft.Engine.hintSmall(caps, nodeBound), "src")
      .groupBy(col("src"), least(col("c"), col("cap")).as("cv"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Bounded coreness core: the h-index iteration (public result:
    * Lü, Zhou, Zhang & Stanley, "The H-index of a network node and
    * its relation to degree and coreness", Nat. Commun. 2016 —
    * c_0 = degree, c_{t+1}(v) = H-index of {c_t(u) : u ∈ N(v)},
    * monotonically non-increasing and convergent to the exact
    * coreness).
    *
    * The per-node H-index is computed from the distinct-value
    * HISTOGRAM, not the raw neighbor list: with f(x) = #{u ∈ N(v) :
    * c_t(u) ≥ x}, H = max over distinct values x of min(x, f(x))
    * (within a run of equal sorted values, min(c_(i), i) is maximal
    * at the run's last rank, where i = f(c) — so the distinct-value
    * max equals the classic max_i min(c_(i), i)). Neighbor values
    * are clamped at cap(v) = min(c_t(v), ⌊√(2m)⌋+1) BEFORE the
    * histogram: both bounds provably dominate the next h-index —
    * c_{t+1}(v) ≤ c_t(v) is the Lü et al. monotonicity, and
    * c_{t+1}(v) = k implies k neighbors of c_t ≥ k, which (values
    * being degrees or below) implies k² ≤ Σdeg = 2m — and clamping
    * at any B ≥ H leaves f(x) unchanged for every candidate x ≤ B,
    * so the round result is bit-identical to the unclamped one.
    * Integer-exact and bit-reproducible cross-engine.
    *
    * Scale shape per round: one shuffle joining edges to the current
    * coreness on dst, one partial-agg'd groupBy (src, clamped value)
    * — the map-side combiner collapses a power-law hub's adjacency
    * before any shuffle — then a window whose per-group input is the
    * histogram, ≤ min(c_t(v), ⌊√(2m)⌋+1) rows, NOT the degree: a
    * 10⁷-degree hub contributes at most its (rapidly shrinking)
    * running h-index in rows from round 2 on. Flat lineage via
    * per-round ckpt — the g01/g05 loop posture.
    */
  /** One h-index round over the clamped histogram — shared by the
    * bounded spec loop and the converged production loop.
    */
  private def corenessStep(
      edges: DataFrame, c: DataFrame, gcap: DataFrame,
      nodeBound: Long = -1L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("src")).orderBy(col("cv").desc)
    corenessHistogram(edges, c, gcap, nodeBound)
      .withColumn("f", sum(col("cnt")).over(w))
      .groupBy(col("src").as("id"))
      .agg(max(least(col("cv"), col("f"))).as("c"))
  }

  /** Initial coreness state (degrees) + the ⌊√(2m)⌋+1 global clamp. */
  private def corenessInit(edges: DataFrame): (DataFrame, DataFrame) = {
    val c = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("c"))
      .ckpt(true)
    // global clamp: every round-≥1 h-index is ≤ ⌊√(2m)⌋+1 (mirrored
    // edge count IS 2m); 1-row broadcast, never collected
    val gcap = edges.agg(
      (floor(sqrt(count(lit(1)).cast("double"))).cast("long") + lit(1L))
        .as("gcap")).ckpt(true)
    (c, gcap)
  }

  private[graft] def corenessRounds(edges: DataFrame, iters: Int): DataFrame = {
    val (c0, gcap) = corenessInit(edges)
    val n = c0.count() // node-sized round-invariant state (r16 hint)
    var c = c0
    for (_ <- 1 to iters)
      c = corenessStep(edges, c, gcap, n).ckpt(false)
    c
  }

  /** Runaway bound for [[corenessConverged]] — far above any measured
    * fixpoint (2/4/6 rounds at the three test SFs; h-index rounds on
    * adversarial long paths scale with path length, but the bound is
    * LOUD, not a silent truth).
    */
  private[graft] val KcoreMaxRounds = 64

  /** h-index rounds run to the DIGEST fixpoint: per-node coreness is
    * monotone non-increasing (Lü et al.), so the coreness SUM — one
    * partial-agg'd decimal scan, the d07 labelSum template — is
    * strictly smaller iff any node changed, and an unchanged sum IS
    * the fixpoint (exact peeling coreness). A graph that has not
    * converged inside `maxRounds` fails LOUDLY instead of handing
    * back plausible-looking non-converged values; the g09 gate is
    * protected the same way from the oracle side — the DuckDB unroll
    * is [[KcoreIters]] rounds, so a corpus whose fixpoint moved past
    * that bound hash-fails the gate instead of silently matching a
    * non-converged engine result (the round-12 verdict's g09 gap).
    */
  private[graft] def corenessConverged(
      edges: DataFrame, maxRounds: Int = KcoreMaxRounds): DataFrame = {
    val (c0, gcap) = corenessInit(edges)
    def digest(df: DataFrame): BigDecimal =
      Option(df.agg(sum(col("c").cast("decimal(38,0)")).as("s"))
        .collect()(0).getDecimal(0)).map(BigDecimal(_)).getOrElse(BigDecimal(0))
    val n = c0.count() // node-sized round-invariant state (r16 hint)
    var c = c0
    var prev = digest(c)
    var converged = false
    var iter = 0
    while (!converged && iter < maxRounds) {
      // lazy ckpt: the digest action materializes the truncation —
      // one job per round instead of two (the g19 chatter cut)
      c = corenessStep(edges, c, gcap, n).ckpt(false)
      val d = digest(c)
      converged = d == prev
      prev = d
      iter += 1
    }
    require(converged,
      s"corenessConverged did not reach the h-index fixpoint in " +
        s"$maxRounds rounds (raise maxRounds)")
    c
  }

  /** g09: k-core decomposition (coreness per node) of the trading
    * network — the graph-cleanup signal a pipeline uses to separate
    * the dense trading core from peripheral one-off relationships
    * (reference ships the underlying graph machinery as graphx
    * aggregateMessages; coreness itself is the standard peeling
    * metric). Computed by [[corenessConverged]] — h-index rounds run
    * to the digest FIXPOINT (exact peeling coreness by the Lü et al.
    * convergence theorem, spec'd against an in-test peeling oracle),
    * with [[KcoreMaxRounds]] as a loud runaway bound; the DuckDB
    * oracle unrolls [[KcoreIters]] rounds, which exceeds the measured
    * fixpoint at every test SF, and a corpus whose fixpoint moves
    * past that unroll hash-FAILS the gate rather than silently
    * matching a truncated iteration. Output: (node_type, entity_key,
    * coreness), integers end to end.
    */
  def g09Kcore(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = tradeEdges(spark, sfDir).select(col("src"), col("dst"))
    corenessConverged(edges).select(
        when(col("id") % 2 === 0, lit("c")).otherwise(lit("s")).as("node_type"),
        expr("id div 2").as("entity_key"),
        col("c").as("coreness"))
      .orderBy(col("node_type"), col("entity_key"))
  }

  /** Steps per walk for [[g10RandomWalks]] — fixed so the output is
    * a pure function of the corpus and the oracle unrolls exactly
    * this many hop joins. Production DeepWalk runs ~10 walks of
    * length ~40 per node; one length-4 walk keeps the test corpus
    * honest while the machinery (ranked-neighbor hop join) is
    * identical at any (walks, length).
    */
  private[graft] val WalkLen = 4

  /** Deterministic random-walk core over a mirrored (src, dst) edge
    * frame: one walk per node, next hop = the neighbor whose
    * dst-ascending rank equals md5₄₈("walk:<walk>:<step>") mod
    * degree — the md5-derived draw every sampling operator here uses
    * (p03/p07/d20), so the DuckDB oracle replicates every hop
    * exactly. Returns (walk_id, step, node) for step 0..len.
    * Package-private for the spec.
    *
    * Scale shape: the ranked neighbor list (computed ONCE and
    * checkpointed) is the random-access structure, and its build is
    * [[Relational.distributedRank]]'s grouped form — range partition
    * on (src, dst) + per-partition local ranks + broadcast offsets —
    * so a 10⁷-degree hub NEVER sorts its whole adjacency in one
    * window task (the last one-group-per-node window in the family,
    * removed; rank values are provably identical to the old
    * src-window row_number: rank is a pure function of the (src,
    * dst) multiset, and tied dst rows carry equal values). Each hop
    * is one join of the walker frame against degrees (to reduce the
    * draw mod degree) and one equi-join on (src, rank) — walker rows
    * stay one per walk, so a hop shuffles O(walks), not O(edges). At
    * 100 TB the neighbor list is the bucketed-by-src adjacency the
    * rest of the g-family already assumes, and walks × length scales
    * linearly.
    */
  private[graft] def randomWalks(edges: DataFrame, len: Int): DataFrame = {
    val nb = Relational.distributedRank(
        edges.select(col("src"), col("dst")), Seq("src"), Seq("dst"), "__r1")
      .withColumn("r", (col("__r1") - 1).cast("long"))
      .select(col("src"), col("dst"), col("r"))
      .ckpt(true)
    // eager: FOUR hops re-aggregated the edge-sized ranked adjacency
    // into degrees before r16 — one materialization, four cheap reads
    val deg = nb.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .ckpt(true)
    var state = nb.select(col("src").as("walk_id")).distinct()
      .select(col("walk_id"), lit(0).as("step"), col("walk_id").as("node"))
      .ckpt(true)
    // one walker row per node, round-invariant — the walker frame is
    // the scale-adaptive broadcast side of BOTH per-hop joins (r16):
    // the ranked adjacency (edge-sized) then never shuffles per hop
    val nWalks = state.count()
    var frontier = state
    for (t <- 1 to len) {
      val drawn = graft.Engine.hintSmall(
        frontier.select(col("walk_id"), col("node").as("src")), nWalks)
        .join(deg, "src")
        .withColumn("r",
          conv(substring(md5(concat(lit("walk:"), col("walk_id").cast("string"),
            lit(s":$t"))), 1, 12), 16, 10).cast("long") % col("deg"))
      val next = graft.Engine.hintSmall(drawn, nWalks).join(nb, Seq("src", "r"))
        .select(col("walk_id"), lit(t).as("step"), col("dst").as("node"))
        .ckpt(false)
      state = state.union(next)
      frontier = next
    }
    state
  }

  /** g10: deterministic random-walk corpus over the trading network —
    * the DeepWalk/node2vec precursor: the walk sequences ARE the
    * training corpus a graph-embedding pipeline feeds to a
    * skip-gram model (walks play sentences, nodes play tokens).
    * One walk of [[WalkLen]] hops per node, next hop drawn
    * md5-uniformly from the ranked neighbor list ([[randomWalks]]).
    * Output: (walk_id, step, node_type, entity_key) — every walk is
    * a connected path in the graph (spec'd), bit-identical across
    * engines.
    */
  /** Memo for the walk corpus — THREE operators consume it (g10's
    * listing, g11's skip-gram pairs, s16's factorization input), and
    * the per-hop join chain behind it is the family's most expensive
    * derived frame after the projections (measured: s16 recomputing
    * walks cost ~4 s of its 5.9 s sweep time).
    */
  private val walkMemo = new graft.FrameMemo[org.apache.spark.sql.DataFrame]

  /** The memoized [[randomWalks]] corpus over the trade graph.
    * `tradeEdges` resolves its own memo BEFORE this compute block —
    * the [[graft.FrameMemo]] no-nested-compute lock-order invariant.
    */
  private[graft] def corpusWalks(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = tradeEdges(spark, sfDir).select(col("src"), col("dst"))
    walkMemo.getOrCompute(spark, sfDir,
      Tables.fingerprint(spark, sfDir, "orders") + "|" +
        Tables.fingerprint(spark, sfDir, "lineitem") + "|walks") {
      randomWalks(edges, WalkLen).ckpt(true)
    }
  }

  def g10RandomWalks(spark: SparkSession, sfDir: String): DataFrame = {
    corpusWalks(spark, sfDir).select(
        col("walk_id"), col("step"),
        when(col("node") % 2 === 0, lit("c")).otherwise(lit("s")).as("node_type"),
        expr("node div 2").as("entity_key"))
      .orderBy(col("walk_id"), col("step"))
  }

  /** Skip-gram window for [[g11WalkCooccurrence]] — context = nodes
    * within this many steps on the same walk (word2vec's window).
    */
  private[graft] val SkipWindow = 2

  /** g11: skip-gram co-occurrence + PPMI over the g10 walk corpus —
    * the count statistics a graph-embedding pipeline trains on
    * (DeepWalk's "walks play sentences" made literal: this is the
    * word2vec co-occurrence pass with PPMI, the classic
    * count-based embedding — Levy & Goldberg 2014 showed skip-gram
    * with negative sampling implicitly factorizes exactly this
    * matrix). Directed (center, context) pairs within
    * [[SkipWindow]] steps on the same walk, partial-agg'd counts,
    * then PPMI = max(0, log2(cnt·T / (cnt_a·cnt_b))) quantized to
    * 2²⁰ ticks (ONE log2 per distinct pair — the t09 contract; the
    * products cnt·T and ca·cb are exact longs while T < 3·10⁹ pair
    * tokens, which covers every test SF with 8 orders of margin).
    * Beyond that — a 100 TB walk corpus can push T past 2⁶³/cnt —
    * the documented retune (the f02 convention) is the log-domain
    * form log2(cnt)+log2(T)−log2(ca)−log2(cb), applied to BOTH
    * engines in lockstep: each factor is double-exact below 2⁵³, so
    * the only behavior change is ≤1-ulp rounding at tick
    * boundaries, and the overflow never materializes. Pairs with
    * cnt ≥ 2 and positive PPMI emit — the matrix a 100 TB corpus
    * would hand to the factorizer (s13's machinery, the documented
    * composition).
    *
    * Scale shape: the walk self-join is per-walk (walk_id key,
    * ≤ (len+1)² rows per walk — O(walks·len·window) total, linear);
    * counts and marginals are partial-agg'd; T is a 1-row broadcast.
    */
  /** The raw scored PPMI pair frame (a, b, cnt, ppmi_ticks) behind
    * g11 — package-private because s16 factorizes it (the
    * g10 → g11 → s16 DeepWalk composition).
    */
  private[graft] def walkPpmi(spark: SparkSession, sfDir: String): DataFrame = {
    val walks = corpusWalks(spark, sfDir)
      .select(col("walk_id"), col("step"), col("node"))
    val pairs = walks.as("x").join(walks.as("y"), "walk_id")
      .filter(col("x.step") =!= col("y.step") &&
        abs(col("x.step") - col("y.step")) <= SkipWindow)
      .groupBy(col("x.node").as("a"), col("y.node").as("b"))
      .agg(count(lit(1)).as("cnt"))
      .ckpt(true)
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

  /** Power-iteration rounds for [[g12PowerIterClustering]] — fixed
    * (the g01 bound contract) so the oracle unrolls exactly.
    */
  private[graft] val PicIters = 6

  /** 1-D k-means rounds for the PIC embedding split. */
  private[graft] val PicKmeansIters = 3

  /** The PIC embedding core (public algorithm: Lin & Cohen, "Power
    * Iteration Clustering", ICML 2010; the reference ships it as
    * mllib/clustering/PowerIterationClustering.scala:1): repeated
    * row-normalized affinity matvecs v ← norm(D⁻¹A·v) from a
    * degree-proportional start — the truncated iteration's
    * per-component mixing makes cluster structure separable in ONE
    * dimension. Integer contract: v lives on the 2¹² tick grid; a
    * round is one exact neighbor-sum shuffle (Σ ≤ deg·2¹², safe to
    * deg ≈ 2³⁵), one truncating per-row D⁻¹ division, and one
    * global max-norm — the g01/g02 posture, bit-reproducible
    * cross-engine. Returns (id, v) ticks.
    */
  private[graft] def picVector(edges: DataFrame, iters: Int): DataFrame = {
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .ckpt(true)
    val dmax = deg.agg(max(col("deg")).as("dm"))
    var v = deg.crossJoin(broadcast(dmax))
      .select(col("src").as("id"), expr("(deg * 4096) div dm").as("v"))
      .ckpt(true)
    val n = deg.count() // node-sized round-invariant state (r16 hint)
    for (_ <- 1 to iters) {
      val s = edges.join(graft.Engine.hintSmall(
          v.withColumnRenamed("id", "dst"), n), "dst")
        .groupBy(col("src")).agg(sum(col("v")).as("s"))
        .join(graft.Engine.hintSmall(deg, n), "src")
        .select(col("src").as("id"), expr("(s * 4096) div deg").as("u"))
      val umax = s.agg(greatest(max(col("u")), lit(1L)).as("um"))
      v = s.crossJoin(broadcast(umax))
        .select(col("id"), expr("(u * 4096) div um").as("v"))
        .ckpt(false)
    }
    v
  }

  /** g12: power iteration clustering of the trading network — the
    * reference's mllib PIC surface: [[picVector]]'s 1-D embedding
    * split by a fixed-round 2-means (centers init = min/max ticks,
    * [[PicKmeansIters]] Lloyd rounds of nearer-center assignment
    * (ties to cluster 0) + truncating-mean updates, empty clusters
    * keep their center — the s04 empty-cell contract). Everything is
    * 1-row broadcasts and partial-agg'd sums; no global sort, no
    * per-node window. Output: (node_type, entity_key, v_ticks,
    * cluster), fully hash-verified.
    */
  def g12PowerIterClustering(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = tradeEdges(spark, sfDir).select(col("src"), col("dst"))
    val v = picVector(edges, PicIters).ckpt(true)
    var cs = v.agg(min(col("v")).as("c0"), max(col("v")).as("c1"))
      .ckpt(true)
    def assign(vv: DataFrame, centers: DataFrame): DataFrame =
      vv.crossJoin(broadcast(centers))
        .withColumn("cl",
          when(abs(col("v") - col("c0")) <= abs(col("v") - col("c1")),
            lit(0L)).otherwise(lit(1L)))
    for (_ <- 1 to PicKmeansIters) {
      val upd = assign(v, cs)
        .groupBy(col("cl"))
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
        .agg(max(when(col("cl") === 0, expr("sv div n"))).as("n0"),
          max(when(col("cl") === 1, expr("sv div n"))).as("n1"))
      cs = upd.crossJoin(broadcast(cs))
        .select(coalesce(col("n0"), col("c0")).as("c0"),
          coalesce(col("n1"), col("c1")).as("c1"))
        .ckpt(false)
    }
    assign(v, cs).select(
        when(col("id") % 2 === 0, lit("c")).otherwise(lit("s")).as("node_type"),
        expr("id div 2").as("entity_key"),
        col("v").as("v_ticks"), col("cl").as("cluster"))
      .orderBy(col("node_type"), col("entity_key"))
  }

  def g11WalkCooccurrence(spark: SparkSession, sfDir: String): DataFrame =
    walkPpmi(spark, sfDir).select(
        when(col("a") % 2 === 0, lit("c")).otherwise(lit("s")).as("a_type"),
        expr("a div 2").as("a_key"),
        when(col("b") % 2 === 0, lit("c")).otherwise(lit("s")).as("b_type"),
        expr("b div 2").as("b_key"),
        col("cnt"), col("ppmi_ticks"))
      .orderBy(col("a_type"), col("a_key"), col("b_type"), col("b_key"))

  /** Predicted links reported by [[g07LinkPredict]]. */
  private[graft] val LinkTopK = 20

  /** Link-prediction core over an undirected (a < b) edge frame:
    * for every NON-adjacent pair with ≥1 common neighbor, the common
    * neighbor count and the Jaccard of the two neighborhoods,
    * top-`k` by (common desc, pair asc). Package-private for the
    * spec.
    *
    * The candidate join is the wedge pattern (two neighbor lists
    * joined on the shared middle vertex) — cost Σ_v C(deg(v), 2),
    * the same budget as g04's triangle probe, held down by the same
    * top-k sparsification upstream. Jaccard is one integer-derived
    * division rounded at 4dp; ranking uses the raw count (total
    * order by (cn, a, b)) so cross-engine float ordering can't move
    * the cut.
    */
  private[graft] def linkPredict(und: DataFrame, k: Int): DataFrame = {
    val nb = und.select(col("a").as("v"), col("b").as("nbr"))
      .union(und.select(col("b").as("v"), col("a").as("nbr")))
    val deg = nb.groupBy(col("v")).agg(count(lit(1)).as("d"))
    val cand = nb.as("x").join(nb.as("y"),
        col("x.nbr") === col("y.nbr") && col("x.v") < col("y.v"))
      .groupBy(col("x.v").as("a"), col("y.v").as("b"))
      .agg(count(lit(1)).as("cn"))
    cand.join(und, Seq("a", "b"), "left_anti")
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(col("a").as("supp_a"), col("b").as("supp_b"),
        col("cn").as("common_cnt"),
        round(col("cn").cast("double") / (col("da") + col("db") - col("cn")), 4)
          .as("jaccard"))
      .orderBy(col("common_cnt").desc, col("supp_a"), col("supp_b"))
      .limit(k)
  }

  /** g07: link prediction on the supplier co-purchase graph — the
    * "which suppliers SHOULD be trading partners" recommendation /
    * anomaly signal (a missing link with many common neighbors is
    * either an opportunity or a data hole). Standard neighborhood
    * similarity (common-neighbors + Jaccard) over the same
    * [[coPurchaseUnd]] frame g04 counts triangles on — the two
    * operators share one memoized projection per sweep. Output:
    * top-[[LinkTopK]] non-adjacent pairs
    * (supp_a, supp_b, common_cnt, jaccard).
    *
    * Scale shape: neighbor lists and degrees are frames derived from
    * the sparsified edge set (never the raw projection); the wedge
    * join shuffles on the middle vertex whose degree the top-k
    * sparsification caps; the final top-k is a TakeOrdered, not a
    * global sort. At sparser corpora the non-adjacent candidate set
    * can be empty (a complete sparsified graph predicts nothing) —
    * correct, not an error.
    */
  def g07LinkPredict(spark: SparkSession, sfDir: String): DataFrame =
    linkPredict(coPurchaseUnd(spark, sfDir), LinkTopK)

  /** Graph-profile core over any undirected (a < b) edge frame: ONE
    * summary row — vertex/edge counts, max/mean degree, global
    * clustering coefficient 3·T/W (T = triangles via the shared
    * [[wedgeTriangles]] join, W = Σ C(d,2) wedges — both exact
    * integers, the ratio one double division), and degree
    * assortativity (Pearson over endpoint degrees of both edge
    * orientations, computed from exact integer moment sums with one
    * final double division, 4dp; null on a regular graph, where it
    * is undefined). Package-private for the spec.
    */
  private[graft] def graphProfileFrom(und: DataFrame): DataFrame = {
    val deg = degreeFrame(und)
    val degAgg = deg.agg(count(lit(1)).as("n_vertices"),
      max(col("d")).as("max_degree"), sum(col("d")).as("sum_d"),
      sum(expr("d * (d - 1) div 2")).as("wedges"))
    val eAgg = und.agg(count(lit(1)).as("n_edges"))
    val triAgg = wedgeTriangles(und, deg).agg(count(lit(1)).as("n_triangles"))
    val nb = und.select(col("a"), col("b"))
      .union(und.select(col("b"), col("a")))
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
    // Pearson from EXACT integer moment sums (degrees are longs, the
    // sums are order-independent), one double division at the end —
    // deterministic cross-engine where the engines' streaming corr
    // implementations are not, and the zero-variance (regular-graph)
    // case guards to null instead of ANSI-erroring. Long headroom:
    // n·Σxy overflows past ~E²·d² ≈ 9e18; production recomputes the
    // moments in double far below that.
    val assort = nb.agg(count(lit(1)).as("np"),
      sum(col("da")).as("sx"), sum(col("db")).as("sy"),
      sum(col("da") * col("db")).as("sxy"),
      sum(col("da") * col("da")).as("sxx"),
      sum(col("db") * col("db")).as("syy"))
      .select(
        (col("np") * col("sxy") - col("sx") * col("sy")).as("covn"),
        (col("np") * col("sxx") - col("sx") * col("sx")).as("vxn"),
        (col("np") * col("syy") - col("sy") * col("sy")).as("vyn"))
      .select(when(col("vxn") === 0 || col("vyn") === 0,
        lit(null).cast("double"))
        .otherwise(round(col("covn").cast("double") /
          sqrt(col("vxn").cast("double") * col("vyn").cast("double")), 4))
        .as("assortativity"))
    degAgg.crossJoin(broadcast(eAgg)).crossJoin(broadcast(triAgg))
      .crossJoin(broadcast(assort))
      .select(col("n_vertices"), col("n_edges"), col("max_degree"),
        // null-guarded ratios: double x/0 is IEEE Infinity/NaN (ANSI
        // only errors on integral/decimal division), which neither
        // engine should emit — the guards pin NULL on both sides for
        // oracle parity, and a wedge-free (or empty) graph has no
        // defined clustering coefficient anyway
        when(col("n_vertices") === 0, lit(null).cast("double"))
          .otherwise(round(col("sum_d").cast("double") / col("n_vertices"), 4))
          .as("mean_degree"),
        when(col("wedges") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_triangles") * lit(3.0) / col("wedges"), 4))
          .as("global_cc"),
        col("assortativity"))
  }

  /** g08: one-row health profile of the supplier co-purchase graph —
    * the numbers watched when the graph itself is the product
    * (density drift, hub growth, clustering collapse, degree mixing):
    * the global twin of g04's per-vertex view, over the same memoized
    * [[coPurchaseUnd]] projection. Everything is an aggregate of
    * frames the g04/g07 machinery already derives; the four 1-row
    * aggregate frames assemble by broadcast cross join (scalar
    * control plane, no data-plane shuffle added).
    */
  def g08GraphProfile(spark: SparkSession, sfDir: String): DataFrame =
    graphProfileFrom(coPurchaseUnd(spark, sfDir))

  /** Modularity scoring core over a mirrored (src, dst) edge frame
    * and a (id, lab) partition: one row per community with its node
    * count, degree mass, intra-community mirrored-edge count, and the
    * EXACT integer modularity numerator q_num = intra·E − d_c² where
    * E is the mirrored edge count (= 2m). Newman's Q is
    * Σ_c q_num_c / E² — the division is left to the reader so the
    * contract stays integer-exact end to end (no ticks, no rounding).
    * Package-private so the spec can score hand-built partitions.
    */
  private[graft] def modularityBy(
      edges: DataFrame, labels: DataFrame): DataFrame = {
    val ecnt = edges.agg(count(lit(1)).as("ee"))
    val intra = edges
      .join(labels.select(col("id").as("src"), col("lab").as("lab_a")), "src")
      .join(labels.select(col("id").as("dst"), col("lab").as("lab_b")), "dst")
      .filter(col("lab_a") === col("lab_b"))
      .groupBy(col("lab_a").as("lab")).agg(count(lit(1)).as("intra_edges"))
    edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("d"))
      .join(labels, "id")
      .groupBy(col("lab"))
      .agg(count(lit(1)).as("nodes"), sum(col("d")).as("degree_sum"))
      .join(intra, Seq("lab"), "left")
      .crossJoin(broadcast(ecnt))
      .select(col("lab"), col("nodes"), col("degree_sum"),
        coalesce(col("intra_edges"), lit(0L)).as("intra_edges"),
        (coalesce(col("intra_edges"), lit(0L)) * col("ee") -
          col("degree_sum") * col("degree_sum")).as("q_num"))
  }

  /** g13: modularity report of the g05 label-propagation communities
    * — the quality score that tells a pipeline whether its community
    * structure is real or noise (Newman & Girvan, "Finding and
    * evaluating community structure in networks", Phys. Rev. E 2004;
    * the reference ships the partition side as graphx
    * LabelPropagation — /root/reference/graphx/src/main/scala/org/
    * apache/spark/graphx/lib/LabelPropagation.scala:1 — and leaves
    * scoring to the caller). One row per community:
    * (label_type, label_key, nodes, degree_sum, intra_edges, q_num),
    * all exact longs; Q = Σ q_num / E².
    *
    * Scale shape: the label frame is the memoized g05 result (one
    * propagation per sweep feeds both keys); intra counts need one
    * edges⋈labels⋈labels chain — two hash joins shuffling O(E) with
    * map-side partial counts — and the degree mass is the g01 degree
    * frame re-grouped by label, vocabulary-of-communities sized.
    * Long headroom: intra·E and d_c² overflow past E ≈ 3·10⁹
    * mirrored edges; the documented retune at corpus scale computes
    * q_num in double (the g08 assortativity posture) or reports the
    * three exact counts alone.
    */
  def g13Modularity(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = tradeEdges(spark, sfDir).select(col("src"), col("dst"))
    val labels = tradeLabels(spark, sfDir)
    modularityBy(edges, labels).select(
        when(col("lab") % 2 === 0, lit("c")).otherwise(lit("s"))
          .as("label_type"),
        expr("lab div 2").as("label_key"),
        col("nodes"), col("degree_sum"), col("intra_edges"), col("q_num"))
      .orderBy(col("label_type"), col("label_key"))
  }

  /** Hop bound for [[g14Betweenness]] — dependencies accumulate over
    * shortest paths of at most this many hops (k-bounded betweenness,
    * the standard truncation; see Borgatti & Everett's k-step
    * variants). 2 keeps every backward product provably in int64:
    * σ ≤ max-degree² and σ·(2²⁰ + δ) < 2⁶³ for degree ≤ ~10⁴ and
    * reach ≤ 4·10⁹ — the documented retune at denser corpora drops
    * the tick scale.
    */
  private[graft] val BetwIters = 2

  /** Ticks per unit for the dependency accumulation (2⁻²⁰). */
  private[graft] val BetwScale = 1048576L

  /** Brandes forward pass from a per-seed frontier: returns one frame
    * per level t = 0..iters of (seed, id, sig) — sig the EXACT
    * shortest-path count from that seed (integer sums; on unit
    * weights first touch is minimal, the boundedBfs argument, so a
    * level's anti-join against visited is the distance filter).
    * Package-private for the spec.
    */
  private[graft] def brandesLevels(
      edges: DataFrame, seeds: DataFrame, iters: Int): Seq[DataFrame] = {
    var level = seeds.select(col("id").as("seed"), col("id"),
        lit(1L).as("sig")).ckpt(true)
    var visited = level.select(col("seed"), col("id"))
    val out = scala.collection.mutable.ArrayBuffer(level)
    for (_ <- 1 to iters) {
      val cand = edges.join(level.withColumnRenamed("id", "src"), "src")
        .groupBy(col("seed"), col("dst").as("id"))
        .agg(sum(col("sig")).as("sig"))
      level = cand.join(visited, Seq("seed", "id"), "left_anti")
        .ckpt(false)
      visited = visited.union(level.select(col("seed"), col("id")))
        .ckpt(false)
      out += level
    }
    out.toSeq
  }

  /** g14: seeded k-bounded betweenness centrality of the trading
    * network — which nodes BROKER the flow between others (the
    * classic bridge/bottleneck signal next to g01's popularity;
    * Brandes, "A faster algorithm for betweenness centrality",
    * J. Math. Soc. 2001, with the standard seed-sampling
    * approximation — the reference ships the graph machinery as
    * graphx aggregateMessages). From each g06-rule seed: a forward
    * pass counting exact shortest-path σ per level, then the
    * backward dependency accumulation δ(v) = Σ_{w succ}
    * (σ(v)/σ(w))·(1+δ(w)) in integer 2⁻²⁰ ticks with truncating
    * div (all operands non-negative — engines agree), levels
    * [[BetwIters]]-bounded. Output one row per (level ≥ 1)-reached
    * node: (node_type, entity_key, bc_ticks = Σ over seeds δ).
    *
    * Scale shape: per-seed state frames are (seeds × reachable)-
    * bounded; each forward round is one frontier⋈edges shuffle with
    * partial-agg'd σ sums (the g06 cost family), each backward level
    * two hash joins and a partial-agg'd contribution sum. No window,
    * no global sort; the final rollup is vocabulary-of-reached-nodes
    * sized. Overflow bounds under [[BetwIters]] documented there.
    */
  def g14Betweenness(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = tradeEdges(spark, sfDir).select(col("src"), col("dst"))
    val nodes = edges.select(col("src").as("id")).distinct()
    val seeds = nodes.filter(col("id") % 2 === 0)
      .orderBy(col("id")).limit(SsspSeeds)
    betweennessFrom(edges, seeds).select(
        when(col("id") % 2 === 0, lit("c")).otherwise(lit("s")).as("node_type"),
        expr("id div 2").as("entity_key"), col("bc_ticks"))
      .orderBy(col("node_type"), col("entity_key"))
  }

  /** Bounded-Brandes core over a mirrored edge frame and a seed
    * frame: (id, bc_ticks) for every node reached at level ≥ 1.
    * Package-private so the spec can score hand-built graphs.
    */
  private[graft] def betweennessFrom(
      edges: DataFrame, seeds: DataFrame): DataFrame = {
    val levels = brandesLevels(edges, seeds, BetwIters)
    // backward: delta at the deepest level is zero; each shallower
    // level sums (sig_v·(SCALE + delta_w)) div sig_w over its
    // next-level successors
    var delta = levels(BetwIters)
      .select(col("seed"), col("id"), lit(0L).as("del"))
      .ckpt(false)
    val perLevel = scala.collection.mutable.ArrayBuffer(delta)
    for (t <- (BetwIters - 1) to 1 by -1) {
      val next = levels(t + 1)
        .join(delta, Seq("seed", "id"))
        .select(col("seed"), col("id").as("dst"),
          col("sig").as("sig_w"), col("del").as("del_w"))
      val contrib = levels(t)
        .join(edges.withColumnRenamed("src", "id"), "id")
        .join(next, Seq("seed", "dst"))
        .select(col("seed"), col("id"),
          expr(s"(sig * ($BetwScale + del_w)) div sig_w").as("c"))
        .groupBy(col("seed"), col("id")).agg(sum(col("c")).as("delsum"))
      delta = levels(t).select(col("seed"), col("id"))
        .join(contrib, Seq("seed", "id"), "left")
        .select(col("seed"), col("id"),
          coalesce(col("delsum"), lit(0L)).as("del"))
        .ckpt(false)
      perLevel += delta
    }
    perLevel.reduce(_ unionByName _)
      .groupBy(col("id")).agg(sum(col("del")).as("bc_ticks"))
  }

  /** Reverse-edge threshold for [[g19Scc]]'s directed trade graph: a
    * supplier→customer edge exists only when the pair traded at least
    * this many lineitems (measured: ~3% of pairs at the test SFs — a
    * sparse "strong relationship" relation, so SCC ≠ CC non-trivially
    * at every SF: one dense mutual-trade core plus singletons).
    */
  private[graft] val SccBackMinCount = 3L

  /** Loud runaway bounds for [[sccLabels]]'s converged loops — far
    * above the measured fixpoints (≤ 3 outer rounds, ≤ 20 inner
    * rounds at every test SF); a graph that does not converge inside
    * them FAILS instead of shipping partial labels.
    */
  private[graft] val SccMaxOuterRounds = 64
  private[graft] val SccMaxInnerRounds = 512

  /** The directed trade graph: (src, dst) with customer c ↦ 2c,
    * supplier s ↦ 2s+1 — forward edges for every distinct trading
    * pair, reverse edges only above [[SccBackMinCount]]. One
    * partial-agg'd (pair, count) groupBy over orders⋈lineitem.
    */
  private[graft] def directedTradeEdges(
      spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("o_orderkey"), col("l_suppkey")),
        "o_orderkey")
      .groupBy((col("o_custkey") * 2).as("a"),
        (col("l_suppkey") * 2 + 1).as("b"))
      .agg(count(lit(1)).as("cnt"))
    pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.filter(col("cnt") >= SccBackMinCount)
        .select(col("b").as("src"), col("a").as("dst")))
  }

  /** The ONE bounded control-plane read behind every g19 fixpoint
    * test: a 1-row decimal digest (SURVEY §4 site 13, the d07/g09
    * digest convention). Callers pass a pre-aggregated 1-row frame
    * whose first column is DECIMAL(38,0).
    */
  private def sccDigest(oneRow: DataFrame): BigDecimal =
    Option(oneRow.collect()(0).getDecimal(0))
      .map(BigDecimal(_)).getOrElse(BigDecimal(0))

  private def sccCount(df: DataFrame): BigDecimal =
    sccDigest(df.agg(count(lit(1)).cast("decimal(38,0)").as("d")))

  /** Strongly connected components of a directed (src, dst) edge
    * frame, run to EXACT convergence — the coloring algorithm the
    * reference implements as a Pregel program (reference graphx/lib/
    * StronglyConnectedComponents.scala:1), re-expressed as three
    * digest-converged DataFrame fixpoints per outer round:
    *
    *  1. TRIM: peel nodes with no in-edge or no out-edge within the
    *     remaining graph (each is its own singleton SCC — a member of
    *     a non-trivial SCC has both, inside its SCC). Run to the
    *     count fixpoint: iterated trimming dissolves the whole DAG
    *     part of the graph in depth-many cheap rounds.
    *  2. COLOR: forward min-label propagation to the label-sum
    *     fixpoint — lab(v) = min({v} ∪ {ancestors of v in the
    *     remaining graph}). Every color class c is rooted at c
    *     (c's own min ancestor cannot be smaller, else it would also
    *     be an ancestor of every v the class contains).
    *  3. BACKWARD: mark nodes that can REACH their color root using
    *     only same-color nodes (any v↝root path is mutual-reach
    *     certified: the root reaches v by definition of the color, so
    *     every node on the path is in SCC(root), and each such node's
    *     min ancestor is then exactly the root — the path cannot
    *     leave the class). Marked nodes ARE SCC(root), finalized with
    *     scc = color and removed; unmarked class members recolor next
    *     round.
    *
    * Every outer round finalizes at least every color root's SCC, so
    * termination is structural; [[SccMaxOuterRounds]] /
    * [[SccMaxInnerRounds]] are loud runaway bounds, not silent
    * truths (the g09 lesson). Digests are 1-row decimal reads: trim
    * and backward use monotone set counts, coloring the monotone
    * non-increasing label sum — an unchanged digest IS the fixpoint.
    *
    * Scale shape per inner round: one edge⋈label shuffle join plus a
    * partial-agg'd min (coloring), or a semi-join frontier expansion
    * + distinct (backward) — two longs of state per node, the g15
    * per-round profile. The backward phase's same-color edge frame is
    * computed once per outer round.
    *
    * Control-plane economy (the r13 verdict task, measured 61 → 23
    * jobs on the sf0.1 corpus): LAZY per-round ckpt everywhere in the
    * loops (the digest action that follows each truncation
    * materializes it — one job where eager-ckpt-then-digest was two),
    * TWO propagation hops per digest in the coloring and backward
    * fixpoints (both hops are idempotent at the fixpoint, so labels
    * are byte-identical), and trim's peel frames accumulate lazily
    * into `fin` once per outer round instead of per peel round.
    * Output: (id, scc).
    */
  private[graft] def sccLabels(edges0: DataFrame): DataFrame = {
    var er = edges0.select(col("src"), col("dst")).ckpt(true)
    var rem = er.select(col("src").as("id"))
      .unionByName(er.select(col("dst").as("id")))
      .distinct().ckpt(true)
    // empty (id, scc) accumulator with the right schema
    var fin = rem.filter(lit(false))
      .select(col("id"), col("id").as("scc")).ckpt(true)
    var remCount = sccCount(rem)
    var outer = 0
    // LAZY ckpt throughout the loops (the g01 strategy, and the other
    // half of the r13 chatter cut): every truncation point is
    // materialized by the digest/count action that follows it, so a
    // ckpt(true)+digest pair (2 jobs) becomes one job.
    // NO scale-adaptive broadcast hints in this operator (r16,
    // measured): g19's edge frame is itself node-scale sparse (the
    // SccBackMinCount threshold keeps it ~3% of pairs, ~500 KB at
    // sf0.1), so the per-round shuffles the hints would remove cost
    // nothing, while every broadcast build adds a scan job of its own
    // — measured CPU 16.3 s → 20.0 s (partial hints) → 28.7 s (hints
    // incl. the double-referenced hop frames) on byte-identical work.
    // The g01/g09 loops, whose edge frames are ~30× bigger, are where
    // the hint pays.
    def restrictEdges(): Unit = {
      er = er.join(rem.withColumnRenamed("id", "src"), Seq("src"), "semi")
        .join(rem.withColumnRenamed("id", "dst"), Seq("dst"), "semi")
        .select(col("src"), col("dst")).ckpt(false)
    }
    while (remCount > 0 && outer < SccMaxOuterRounds) {
      // ---- 1. trim to the count fixpoint. Control-plane economy
      // (the r13 verdict task): the peel is NOT materialized per
      // round — peeled frames accumulate lazily against their
      // already-ckpt'd parents and fold into `fin` once after the
      // loop, so a trim round costs keep-ckpt + count + edge-restrict
      // (3 jobs), not 4.
      var trimming = true
      var inner = 0
      var peels: List[DataFrame] = Nil
      while (trimming && remCount > 0) {
        require(inner < SccMaxInnerRounds, "g19 trim did not converge")
        // both-directions endpoint check in ONE partial-agg'd shuffle:
        // keep = ids with at least one out-edge AND one in-edge (edge
        // endpoints are ⊆ rem, so rem-only nodes peel as edgeless)
        val keep = er.select(col("src").as("id"), lit(1L).as("o"), lit(0L).as("i"))
          .unionByName(er.select(col("dst").as("id"), lit(0L).as("o"), lit(1L).as("i")))
          .groupBy(col("id")).agg(max(col("o")).as("o"), max(col("i")).as("i"))
          .filter(col("o") === 1L && col("i") === 1L)
          .select(col("id"))
          .ckpt(false)
        val kc = sccCount(keep)
        if (kc == remCount) trimming = false
        else {
          peels = rem.join(keep, Seq("id"), "anti")
            .select(col("id"), col("id").as("scc")) :: peels
          rem = keep
          restrictEdges()
          remCount = kc
        }
        inner += 1
      }
      if (peels.nonEmpty)
        fin = fin.unionByName(peels.reduce(_ unionByName _)).ckpt(false)
      if (remCount > 0) {
        // ---- 2. forward-min coloring to the label-sum fixpoint
        var lab = rem.select(col("id"), col("id").as("lab"))
          .ckpt(false)
        def labSum(l: DataFrame): BigDecimal =
          sccDigest(l.agg(sum(col("lab").cast("decimal(38,0)")).as("d")))
        var prev = labSum(lab)
        var coloring = true
        inner = 0
        // TWO min-propagation hops per digest (the r13 verdict's
        // chatter cut): min-propagation is idempotent at the
        // fixpoint, so batching hops between the blocking 1-row
        // digest reads halves driver round-trips without changing a
        // single label.
        // NO broadcast hint here (r16, measured): the hop input `l`
        // is referenced by BOTH the union branch and the join side;
        // the inner hop of each double-hop batch is un-checkpointed,
        // and a broadcast of it defeats the shuffle-exchange reuse
        // that deduplicates the two references — measured CPU 2x,
        // tasks 264 -> 513. The shuffle join keeps the reuse.
        def colorHop(l: DataFrame): DataFrame =
          l.unionByName(
              er.join(l.withColumnRenamed("id", "src"), "src")
                .select(col("dst").as("id"), col("lab")))
            .groupBy(col("id")).agg(min(col("lab")).as("lab"))
        while (coloring) {
          require(inner < SccMaxInnerRounds, "g19 coloring did not converge")
          lab = colorHop(colorHop(lab)).ckpt(false)
          val d = labSum(lab)
          coloring = d != prev
          prev = d
          inner += 1
        }
        // ---- 3. backward mark within the color class
        val le = er
          .join(lab.select(col("id").as("src"), col("lab").as("lab_s")), "src")
          .join(lab.select(col("id").as("dst"), col("lab").as("lab_d")), "dst")
          .filter(col("lab_s") === col("lab_d"))
          .select(col("src"), col("dst")).ckpt(false)
        var mark = lab.filter(col("id") === col("lab")).select(col("id"))
          .ckpt(false)
        var mc = sccCount(mark)
        var marking = true
        inner = 0
        // TWO backward hops per digest — the mark set grows
        // monotonically and the hop is idempotent once saturated, so
        // the batching (same as coloring) halves the blocking count
        // reads with byte-identical marks.
        // same no-hint rationale as colorHop: m is double-referenced
        def backHop(m: DataFrame): DataFrame =
          m.unionByName(
              le.join(m.withColumnRenamed("id", "dst"), "dst")
                .select(col("src").as("id")))
            .distinct()
        while (marking) {
          require(inner < SccMaxInnerRounds, "g19 backward did not converge")
          mark = backHop(backHop(mark)).ckpt(false)
          val d = sccCount(mark)
          marking = d != mc
          mc = d
          inner += 1
        }
        val done = lab.join(mark, Seq("id"), "semi")
          .select(col("id"), col("lab").as("scc")).ckpt(false)
        fin = fin.unionByName(done).ckpt(false)
        rem = rem.join(done, Seq("id"), "anti").ckpt(false)
        restrictEdges()
        remCount = sccCount(rem)
      }
      outer += 1
    }
    require(remCount == 0,
      s"g19 did not finalize every node in $SccMaxOuterRounds outer rounds")
    fin
  }

  /** g19: strongly connected components of the DIRECTED trade graph
    * — the mutual-dependency core a supply-chain or exposure review
    * asks for that CC (g15) cannot see: reachability there is
    * symmetric by construction, while g19's reverse edges exist only
    * for strong relationships ([[directedTradeEdges]]), so the SCCs
    * separate the mutually-locked trading core from one-way
    * periphery. Exact converged labels via [[sccLabels]]; the DuckDB
    * oracle is an independent formulation (recursive-CTE reachability
    * closure + mutual-pair minimum), so the gate cross-checks the
    * ALGORITHM, not a re-rendering of it. Output one row per node:
    * (node_type, entity_key, scc_type, scc_key, scc_size) — the g15
    * report shape with the SCC's min-id label.
    */
  def g19Scc(spark: SparkSession, sfDir: String): DataFrame = {
    val labels = sccLabels(directedTradeEdges(spark, sfDir))
    val sizes = labels.groupBy(col("scc")).agg(count(lit(1)).as("scc_size"))
    labels.join(sizes, "scc").select(
        when(col("id") % 2 === 0, lit("c")).otherwise(lit("s")).as("node_type"),
        expr("id div 2").as("entity_key"),
        when(col("scc") % 2 === 0, lit("c")).otherwise(lit("s")).as("scc_type"),
        expr("scc div 2").as("scc_key"),
        col("scc_size"))
      .orderBy(col("node_type"), col("entity_key"))
  }
}
