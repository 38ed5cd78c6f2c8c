package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Joins}

/** Value-level checks for the temporal joins (j01/j02) against
  * brute-force ground truth, and for connected-components cluster
  * assembly (d07) including transitivity the pair operators can't
  * express.
  */
class JoinsGraphSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = TestSpark.spark

  test("connectedComponents merges across paths, keeps singletons") {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    // path 1-2-3 (transitive merge), pair 5-6, singleton 4
    val edges = Seq((2L, 1L), (2L, 3L), (5L, 6L)).toDF("src", "dst")
    val got = Dedup.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
  }

  test("connectedComponents on an empty graph returns empty, no NPE") {
    import spark.implicits._
    val nodes = Seq.empty[Long].toDF("id")
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Dedup.connectedComponents(nodes, edges).count() == 0)
  }

  test("connectedComponents matches union-find on a random 2000-node graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val n = 2000L
    // mean degree 3 → one giant component of small diameter plus
    // small components and isolated nodes (multi-hop merging without
    // adversarial chain diameters)
    val edgeList = Seq.fill(3000)((rnd.nextLong(n).abs % n, rnd.nextLong(n).abs % n))
      .filter(e => e._1 != e._2)
    val nodes = (0L until n).toDF("id")
    val edges = edgeList.toDF("src", "dst")
    val got = Dedup.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edgeList.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0L until n).foreach { v =>
      assert(got(v) == find(v), s"node $v: ${got(v)} != ${find(v)}")
    }
  }

  test("connectedComponentsStar matches union-find on a random 2000-node graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val n = 2000L
    val edgeList = Seq.fill(3000)((rnd.nextLong(n).abs % n, rnd.nextLong(n).abs % n))
      .filter(e => e._1 != e._2)
    val nodes = (0L until n).toDF("id")
    val edges = edgeList.toDF("src", "dst")
    val got = Dedup.connectedComponentsStar(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edgeList.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    assert(got.size == n)
    (0L until n).foreach { v =>
      assert(got(v) == find(v), s"node $v: ${got(v)} != ${find(v)}")
    }
  }

  test("star CC converges on a 512-node path where min-label's bound trips") {
    import spark.implicits._
    // adversarial diameter: a path over PERMUTED ids (so label order
    // carries no shortcut); min-label needs ~512 rounds, star is polylog
    val n = 512
    val perm = new scala.util.Random(3).shuffle((0L until n.toLong).toVector)
    val edgeList = perm.sliding(2).map(w => (w(0), w(1))).toSeq
    val nodes = perm.toDF("id")
    val edges = edgeList.toDF("src", "dst")
    val want = perm.map(_ -> perm.min).toMap
    // star alone: correct within a small diameter-independent bound
    val star = Dedup.connectedComponentsStar(nodes, edges, maxIters = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == want)
    // min-label with a tripped bound: fail-loud without fallback ...
    val ex = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(nodes, edges, maxIters = 8, starFallback = false)
    }
    assert(ex.getMessage.contains("did not converge"))
    // ... rescued by the default star fallback
    val rescued = Dedup.connectedComponents(nodes, edges, maxIters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rescued == want)
  }

  test("connectedComponentsStar: empty graph and isolated nodes") {
    import spark.implicits._
    assert(Dedup.connectedComponentsStar(
      Seq.empty[Long].toDF("id"), Seq.empty[(Long, Long)].toDF("src", "dst")
    ).count() == 0)
    val got = Dedup.connectedComponentsStar(
      Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id"),
      Seq((2L, 1L), (2L, 3L), (5L, 6L)).toDF("src", "dst")
    ).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
  }

  test("d07 clusters are consistent closures of the d02 pairs") {
    val pairs = Dedup.d02DedupMinhash(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val rows = Dedup.d07DedupClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cluster = rows.map(r => r._1 -> r._2).toMap
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.length == nDocs, "one row per document")
    pairs.foreach { case (a, b) =>
      assert(cluster(a) == cluster(b), s"pair ($a,$b) split across clusters")
    }
    // cluster_id is the min member; sizes match membership
    val members = rows.groupBy(_._2)
    members.foreach { case (cid, ms) =>
      assert(ms.map(_._1).min == cid, s"cluster $cid not labeled by min member")
      assert(ms.forall(_._3 == ms.length), s"cluster $cid size mismatch")
    }
    // ground-truth components from the pairs via in-test union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    rows.foreach { case (doc, cid, _) =>
      val truth = find(doc)
      assert(cid == truth, s"doc $doc: cluster $cid != union-find root $truth")
    }
  }

  test("j01 as-of join matches per-event brute force") {
    val orders = Tables.orders(spark, sfDir)
      .selectExpr("o_custkey", "cast(o_orderdate as timestamp) as od",
        "o_orderkey", "o_totalprice")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getDouble(3)))
    val byUser = orders.groupBy(_._1)
    val events = Tables.events(spark, sfDir)
      .selectExpr("event_id", "user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime))
    val got = Joins.j01AsofJoin(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    assert(events.nonEmpty && got.size == events.length)
    events.foreach { case (eid, uid, ets) =>
      // latest order at-or-before ts; ties on date -> max orderkey
      val best = byUser.getOrElse(uid, Array.empty)
        .filter(_._2 <= ets)
        .sortBy(o => (o._2, o._3)).lastOption.map(_._3)
      assert(got(eid) == best, s"event $eid: got ${got(eid)} want $best")
    }
  }

  test("j02 range join matches brute-force interval counts") {
    val events = Tables.events(spark, sfDir)
      .selectExpr("event_id", "user_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime, r.getString(3)))
    val purchasesByUser = events.filter(_._4 == "purchase").groupBy(_._2)
    val clicks = events.filter(_._4 == "click")
    val got = Joins.j02RangeJoin(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got.size == clicks.length, "one row per click")
    val dayMs = 86400L * 1000L
    clicks.foreach { case (cid, uid, cts, _) =>
      val n = purchasesByUser.getOrElse(uid, Array.empty)
        .count(p => p._3 >= cts && p._3 < cts + dayMs)
      assert(got(cid) == n, s"click $cid: got ${got(cid)} want $n")
    }
    assert(got.values.sum > 0, "attribution windows should capture purchases")
  }

  test("skewSaltedJoin equals the plain join on a power-law key") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // key 0 holds half the rows (the hot domain); the rest are uniform
    val left = (0 until 4000)
      .map(i => (if (i % 2 == 0) 0L else (i % 97).toLong, i.toLong))
      .toDF("k", "payload")
    val right = (0 until 97).map(k => (k.toLong, s"dim_$k")).toDF("rk", "attr")
    val salted = Joins.skewSaltedJoin(left, right, "k", "rk",
      hotThreshold = 100, saltBuckets = 8)
      .select("k", "payload", "rk", "attr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).sorted
    val plain = left.join(right, col("k") === col("rk"))
      .select("k", "payload", "rk", "attr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).sorted
    assert(salted.length == plain.length && salted.sameElements(plain),
      s"salted join diverged: ${salted.length} vs ${plain.length} rows")
    // the default whole-row-hash salt really spreads the hot key: the
    // hot slice must occupy >1 salt bucket (2000 rows, 8 buckets)
    val hotSalts = left
      .filter(col("k") === 0L)
      .withColumn("salt", pmod(xxhash64(struct(col("k"), col("payload"))), lit(8)))
      .select("salt").distinct().count()
    assert(hotSalts > 4, s"hot key spread over only $hotSalts salt buckets")
    // an input already carrying an internal working column would be
    // silently clobbered — the guard must fail loud instead
    val poisoned = left.withColumn("__graft_salt", lit(0))
    val ex = intercept[IllegalArgumentException] {
      Joins.skewSaltedJoin(poisoned, right, "k", "rk", hotThreshold = 100)
    }
    assert(ex.getMessage.contains("reserved internal column"))
  }

  test("g01 PageRank: mass conserved up to truncation, bipartite ids well-formed") {
    import graft.operators.Graph
    val rows = Graph.g01PageRank(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // every node is typed and positively ranked
    assert(rows.forall(r => Set("c", "s").contains(r.getString(0))))
    assert(rows.forall(_.getLong(2) > 0L), "ranks must stay positive")
    // both sides of the bipartite graph are present
    val types = rows.map(_.getString(0)).toSet
    assert(types == Set("c", "s"))
    // total mass stays within integer-truncation loss of RankScale:
    // each round loses < 1 tick per division — bounded by
    // (edges + nodes) * iters ticks, astronomically under 1% of 2^40
    val total = rows.map(_.getLong(2)).sum
    val scale = Graph.RankScale
    assert(total <= scale, "mass cannot be created")
    assert(total > scale - scale / 100,
      s"mass leak beyond truncation bounds: $total of $scale")
    // deterministic: a second run is bit-identical (integer ticks)
    val again = Graph.g01PageRank(spark, sfDir).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      again.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("g03 personalized PageRank: mass centers on the seed and decays outward") {
    import graft.operators.Graph
    val rows = Graph.g03PersonalizedPagerank(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // the seed (smallest customer key in the graph) holds the maximum
    // rank: teleport returns all damped mass there every round
    val custs = rows.filter(_._1 == "c")
    val seedKey = custs.map(_._2).min
    val maxRank = rows.map(_._3).max
    assert(custs.find(_._2 == seedKey).get._3 == maxRank,
      "seed must carry the maximum personalized rank")
    // teleport-to-one-node conserves mass within truncation, like g01
    val total = rows.map(_._3).sum
    assert(total <= Graph.RankScale && total > Graph.RankScale / 2,
      s"personalized mass off: $total of ${Graph.RankScale}")
    // ranks are non-negative and SOME supplier is reached (1 hop)
    assert(rows.forall(_._3 >= 0L))
    assert(rows.exists(r => r._1 == "s" && r._3 > 0L),
      "seed's suppliers must receive mass")
  }

  test("g02 HITS: hubs are customers, authorities suppliers, L-inf normalized") {
    import graft.operators.Graph
    val rows = Graph.g02Hits(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val (hubs, auths) = rows.partition(_._1 == "c")
    assert(hubs.nonEmpty && auths.nonEmpty)
    // L-inf normalization: the max of each family is exactly the tick
    // scale, everything else in (0, scale]
    assert(hubs.map(_._3).max == Graph.HitsScale)
    assert(auths.map(_._3).max == Graph.HitsScale)
    assert(rows.forall(r => r._3 > 0L && r._3 <= Graph.HitsScale))
    // every customer/supplier in the edge set is scored exactly once
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length)
  }

  test("g04 triangles: exact on the K10 projection, degree bounded by top-k") {
    import graft.operators.Graph
    val rows = Graph.g04TriangleCount(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._2 >= 1 && r._3 >= 0))
    // at sf0.001 the co-purchase projection is the complete K10 (45
    // pairs, checked against the corpus) and TriTopK = 10 ≥ 9 keeps
    // every edge — so the expected output is exact: every supplier
    // has degree 9 and C(9,2) = 36 triangles
    assert(rows.length == 10 && rows.forall(r => r._2 == 9 && r._3 == 36),
      s"K10 projection must give (9, 36) per vertex: ${rows.toSeq}")
    // every triangle increments exactly three per-vertex counters
    val triSum = rows.map(_._3).sum
    assert(triSum % 3 == 0, s"per-vertex counts don't triple-count: $triSum")
    // each vertex KEEPS at most TriTopK partners, so the undirected
    // edge count (= sum(degree)/2) is bounded by n * TriTopK
    val degSum = rows.map(_._2).sum
    assert(degSum % 2 == 0 && degSum / 2 <= rows.length * Graph.TriTopK)
    // a vertex's triangles can't exceed its wedge count C(d, 2)
    assert(rows.forall(r => r._3 <= r._2 * (r._2 - 1) / 2))
  }

  test("co-purchase fan-out cap does not bind at test SFs") {
    import graft.operators.Graph
    import org.apache.spark.sql.functions._
    // The projection's oracle has no cap clause, so the cap must be
    // invisible at the SFs the driver verifies (the j04 guard
    // pattern): assert the max per-customer distinct-supplier count
    // stays under CustFanoutCap at both spec SFs.
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val maxFan = Tables.orders(spark, d)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.lineitem(spark, d)
          .select(col("l_orderkey").as("o_orderkey"), col("l_suppkey")),
          "o_orderkey")
        .select(col("o_custkey"), col("l_suppkey")).distinct()
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
        .agg(max(col("n"))).head().getLong(0)
      assert(maxFan < Graph.CustFanoutCap,
        s"$d: fan-out $maxFan reaches cap ${Graph.CustFanoutCap} — " +
          "the projection oracle needs a cap clause now")
    }
  }

  test("capCustFanout bounds a hub customer's projection blow-up") {
    import graft.operators.Graph
    import org.apache.spark.sql.functions._
    val sess = spark
    import sess.implicits._
    // hub customer 1: 1000 suppliers with tied line counts (nl = s%7+1
    // exercises the (nl desc, s asc) tie-break); customer 2: 5.
    val cs = ((1L to 1000L).map(s => (1L, s, s % 7 + 1)) ++
        (1L to 5L).map(s => (2L, s, 1L)))
      .toDF("c", "s", "nl")
    val kept = Graph.capCustFanout(cs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val hub = kept.filter(_._1 == 1L).map(_._2).toSet
    assert(hub.size == Graph.CustFanoutCap,
      s"hub must keep exactly the cap, got ${hub.size}")
    // exact expected set: rank by (nl desc, s asc)
    val expected = (1L to 1000L).map(s => (s % 7 + 1, s))
      .sortBy { case (nl, s) => (-nl, s) }
      .take(Graph.CustFanoutCap).map(_._2).toSet
    assert(hub == expected, "kept set must be the (nl desc, s asc) top-K")
    assert(kept.count(_._1 == 2L) == 5, "non-hub customers keep everything")
    // the downstream self-join can now emit at most C(cap, 2) pairs
    // from the hub instead of C(1000, 2)
    val pairs = Graph.capCustFanout(cs).as("x")
      .join(Graph.capCustFanout(cs).as("y"),
        col("x.c") === col("y.c") && col("x.s") < col("y.s"))
      .where(col("x.c") === 1L).count()
    val cap = Graph.CustFanoutCap.toLong
    assert(pairs == cap * (cap - 1) / 2,
      s"hub pair count $pairs must be C($cap,2)")
  }

  test("g05 label propagation: cliques converge, distinct labels shrink") {
    import spark.implicits._
    import graft.operators.Graph
    // two 3-cliques {1,2,3} and {10,11,12}, no cross edges (mirrored)
    val half = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (10L, 12L),
      (11L, 12L))
    val edges = (half ++ half.map(_.swap)).toDF("src", "dst")
    val l3 = Graph.labelPropRounds(edges, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each clique agrees on ONE label (its min id), none leaks across
    assert(Set(1L, 2L, 3L).map(l3) == Set(1L))
    assert(Set(10L, 11L, 12L).map(l3) == Set(10L))
    // distinct-label count is non-increasing round over round on the
    // trade graph — the convergence digest (CC-digest pattern)
    val counts = (1 to Graph.LabelPropIters).map { k =>
      Graph.labelPropRounds(
        graftTestEdges(), k).select("lab").distinct().count()
    }
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"label count must not grow: $counts")
    // labels are node ids from the graph itself
    val rows = Graph.g05LabelProp(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => Set("c", "s").contains(r.getString(0)) &&
      Set("c", "s").contains(r.getString(2))))
  }

  /** Mirrored trade edge frame at the spec SF, built the same way the
    * operators build it (via the public query's input tables).
    */
  private def graftTestEdges() = {
    import spark.implicits._
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_orderkey", $"o_custkey")
    val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select($"l_orderkey".as("o_orderkey"), $"l_suppkey")
    val p = o.join(l, "o_orderkey")
      .select(($"o_custkey" * 2).as("a"), ($"l_suppkey" * 2 + 1).as("b"))
      .distinct()
    p.select($"a".as("src"), $"b".as("dst"))
      .union(p.select($"b".as("src"), $"a".as("dst")))
  }

  /** Exact peeling coreness over mirrored (src, dst) pairs — the
    * in-test oracle for the bounded h-index rounds.
    */
  private def peelCoreness(pairs: Array[(Long, Long)]): Map[Long, Long] = {
    val adj = pairs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = scala.collection.mutable.Map(
      adj.view.mapValues(_.length.toLong).toSeq: _*)
    val core = scala.collection.mutable.Map.empty[Long, Long]
    val pq = scala.collection.mutable.PriorityQueue.empty[(Long, Long)](
      Ordering.by[(Long, Long), (Long, Long)](identity).reverse)
    deg.foreach { case (v, d) => pq.enqueue((d, v)) }
    var k = 0L
    while (pq.nonEmpty) {
      val (dv, v) = pq.dequeue()
      if (!core.contains(v) && dv == deg(v)) {
        k = math.max(k, dv); core(v) = k
        adj(v).foreach { u =>
          if (!core.contains(u)) { deg(u) -= 1; pq.enqueue((deg(u), u)) }
        }
      }
    }
    core.toMap
  }

  test("g09 coreness: equals exact peeling on the trade graph, monotone in rounds") {
    import spark.implicits._
    import graft.operators.Graph
    // synthetic: K4 {1..4} with a pendant 5-1 (mirrored) — coreness
    // must be 3 on the clique, 1 on the pendant
    val half = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L))
    val edges = (half ++ half.map(_.swap)).toDF("src", "dst")
    val got = Graph.corenessRounds(edges, 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(1L, 2L, 3L, 4L).map(got) == Set(3L) && got(5L) == 1L)
    // trade graph: bounded h-index rounds equal EXACT peeling coreness
    val core = peelCoreness(graftTestEdges().collect()
      .map(r => (r.getLong(0), r.getLong(1))))
    val bounded = Graph.corenessRounds(graftTestEdges(), Graph.KcoreIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bounded.nonEmpty && bounded == core,
      "bounded h-index rounds must reach exact peeling coreness at this SF")
    // h-index iteration is pointwise non-increasing round over round
    val r1 = Graph.corenessRounds(graftTestEdges(), 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1.forall { case (v, c) => bounded(v) <= c })
    // the production front door (digest-converged) equals the bounded
    // result on the corpus — the fixpoint sits inside KcoreIters here
    val conv = Graph.corenessConverged(graftTestEdges())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(conv == bounded,
      "digest-converged coreness must equal the bounded rounds at this SF")
  }

  test("g09 convergence guard: a >8-round graph converges or fails loud") {
    import spark.implicits._
    import graft.operators.Graph
    // a 30-node path: exact coreness is 1 everywhere, but the h-index
    // iteration erodes the interior 2s from the ends one step per
    // round — needs ~14 rounds, past the old silent KcoreIters=8 bound
    val half = (1L until 30L).map(i => (i, i + 1))
    val edges = (half ++ half.map(_.swap)).toDF("src", "dst")
    val stale = Graph.corenessRounds(edges, Graph.KcoreIters)
      .filter(org.apache.spark.sql.functions.col("c") =!= 1L).count()
    assert(stale > 0,
      "the planted path must NOT be converged at 8 rounds, or this " +
        "spec no longer exercises the guard")
    // digest convergence runs past the old bound and reaches exact
    // peeling coreness (all 1s)
    val conv = Graph.corenessConverged(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(conv.size == 30 && conv.values.forall(_ == 1L),
      s"converged coreness on a path must be all 1s, got $conv")
    // an insufficient runaway bound fails LOUD, never hands back
    // plausible-looking non-converged values
    val e = intercept[IllegalArgumentException] {
      Graph.corenessConverged(edges, maxRounds = 4)
    }
    assert(e.getMessage.contains("did not reach the h-index fixpoint"))
  }

  test("g09 coreness histogram bounds a hub's per-group window input") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.Graph
    // hub 0 ↔ mids 1..100; mids form K100 among themselves; mid i
    // additionally has i pendants (ids i*1000+1 .. i*1000+i). Degrees:
    // hub 100, mid i 100+i (100 DISTINCT values 101..200), pendants 1.
    val mids = (1L to 100L)
    val half = mids.map(i => (0L, i)) ++
      (for (i <- mids; j <- mids if i < j) yield (i, j)) ++
      mids.flatMap(i => (1L to i).map(p => (i, i * 1000 + p)))
    val edges = (half ++ half.map(_.swap)).toDF("src", "dst")
      .localCheckpoint(true)
    val c0 = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("c"))
    // mirrored edge count = 2m = 20200 → gcap = ⌊√20200⌋+1 = 143
    val gcap = edges.agg(
      (floor(sqrt(count(lit(1)).cast("double"))).cast("long") + lit(1L))
        .as("gcap"))
    assert(gcap.head().getLong(0) == 143L)
    val hist = Graph.corenessHistogram(edges, c0, gcap)
      .groupBy(col("src")).agg(count(lit(1)).as("rows"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the monotone cap: every node's histogram is ≤ min(c_t(v), gcap)
    val cap = c0.collect().map(r => r.getLong(0) -> math.min(r.getLong(1), 143L)).toMap
    assert(hist.forall { case (v, n) => n <= cap(v) },
      "histogram rows must never exceed min(c_t(v), gcap)")
    // the hub's 100 neighbors carry 100 DISTINCT raw values (101..200),
    // but cap(hub)=deg=100 clamps them ALL to one bucket: the window
    // group that used to sort the full adjacency sees exactly 1 row
    assert(hist(0L) == 1L,
      s"hub histogram must collapse to 1 clamped bucket, got ${hist(0L)}")
    // and the clamp is invisible in the result: bounded rounds still
    // equal exact peeling (pendants 1, hub+mids all coreness 100)
    val got = Graph.corenessRounds(edges, Graph.KcoreIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val core = peelCoreness((half ++ half.map(_.swap)).toArray)
    assert(got == core, "clamped histogram rounds must stay exact")
    assert(got(0L) == 100L && got(1L) == 100L && got(1001L) == 1L)
  }

  test("g12 PIC separates two cliques into the two clusters") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.Graph
    // disjoint K6 {1..6} and K4 {11..14}: the row-normalized matvec
    // is at a FIXED POINT immediately (each node sees the component
    // constant), so v stays at the degree-proportional init — K6 at
    // 4096 ticks, K4 at (3·4096) div 5 = 2457 — and the 2-means must
    // split exactly on component membership.
    val k6 = for (i <- 1L to 6L; j <- 1L to 6L if i != j) yield (i, j)
    val k4 = for (i <- 11L to 14L; j <- 11L to 14L if i != j) yield (i, j)
    val edges = (k6 ++ k4).toDF("src", "dst")
    val v = Graph.picVector(edges, Graph.PicIters).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 6L).forall(v(_) == 4096L), s"K6 ticks: $v")
    assert((11L to 14L).forall(v(_) == 2457L), s"K4 ticks: $v")
    // full operator on a synthetic dir is not available (it reads the
    // trade tables), so pin the embedding here and the clustering on
    // the corpus below
    val got = Graph.g12PowerIterClustering(spark, sfDir).collect()
    val nNodes = graftTestEdges().select("src").distinct().count()
    assert(got.length == nNodes)
    assert(got.forall(r => r.getLong(3) == 0L || r.getLong(3) == 1L))
    // deterministic across runs
    val again = Graph.g12PowerIterClustering(spark, sfDir).collect()
    assert(got.toSeq == again.toSeq)
    // cluster centers differ unless the embedding is fully uniform
    val byCl = got.groupBy(_.getLong(3)).view.mapValues(
      rs => rs.map(_.getLong(2)).sum.toDouble / rs.length).toMap
    if (byCl.size == 2)
      assert(byCl(0L) != byCl(1L), "clusters must differ in mean ticks")
  }

  test("pregel combinator: shipped g05 and g06 are bit-identical instances") {
    import org.apache.spark.sql.functions._
    import graft.operators.Graph
    val edges = graftTestEdges().localCheckpoint(true)
    // label propagation as a vertex program: send = neighbor labels,
    // apply = per-id mode (count desc, label asc)
    val lpInit = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("lab"))
    val lpPregel = Graph.pregel(
      lpInit,
      st => edges.join(st.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("lab")),
      (_, msgs) => msgs.groupBy(col("id"), col("lab"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("id"))
        .agg(max(struct(col("c"), (-col("lab")).as("nl"))).as("m"))
        .select(col("id"), (-col("m.nl")).as("lab")),
      Graph.LabelPropIters)
    val lpShipped = Graph.labelPropRounds(edges, Graph.LabelPropIters)
    assert(lpPregel.collect().map(_.toSeq).sortBy(_.toString).toSeq ==
      lpShipped.collect().map(_.toSeq).sortBy(_.toString).toSeq)
    // frontier BFS as a vertex program: frontier bookkeeping rides a
    // state column; send = frontier+1, apply = disjoint min-merge
    val seeds = edges.select(col("src").as("id")).distinct()
      .filter(col("id") % 2 === 0).orderBy(col("id")).limit(Graph.SsspSeeds)
    val bfsInit = seeds.distinct()
      .select(col("id"), lit(0L).as("d"), lit(true).as("fresh"))
    val bfsPregel = Graph.pregel(
      bfsInit,
      st => edges.join(
          st.filter(col("fresh")).select(col("id").as("src"), col("d")), "src")
        .select(col("dst").as("id"), (col("d") + 1).as("d")),
      (st, msgs) => {
        val newly = msgs.groupBy(col("id")).agg(min(col("d")).as("d"))
          .join(st.select(col("id")), Seq("id"), "left_anti")
        st.select(col("id"), col("d"), lit(false).as("fresh"))
          .union(newly.select(col("id"), col("d"), lit(true).as("fresh")))
      },
      Graph.SsspIters)
    val bfsShipped = Graph.boundedBfs(edges, seeds, Graph.SsspIters)
    assert(bfsPregel.select("id", "d").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      bfsShipped.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
  }

  test("g16 landmark paths: per-landmark distances on a planted path; " +
    "min over landmarks reconciles with g06") {
    import spark.implicits._
    import graft.operators.Graph
    // path 0-1-2-3-4 (mirrored): landmarks {0, 4}; per-landmark
    // distances are the exact positions from each end
    val und = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val lms = Seq(0L, 4L).toDF("id")
    val got = Graph.landmarkPaths(edges, lms, 6).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (v <- 0L to 4L) {
      assert(got((0L, v)) == v, s"dist(0, $v)")
      assert(got((4L, v)) == 4L - v, s"dist(4, $v)")
    }
    assert(got.size == 10)
    // corpus: min over g16's per-landmark rows == g06's min-over-seeds
    val g16 = SparkEntry.queries("g16_landmark_paths")(spark, sfDir).collect()
    val byNode = g16.groupBy(r => (r.getString(0), r.getLong(1)))
      .map { case (k, rs) => k -> rs.map(_.getLong(4)).min }
    val g06 = SparkEntry.queries("g06_sssp")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(byNode == g06,
      "min over landmarks must equal g06's min-over-seed distance")
    // per-landmark rows are a superset (3 landmarks): node rows <= 3x
    assert(g16.length >= g06.size && g16.length <= 3 * g06.size)
    assert(g16.map(_.toSeq).toSeq ==
      SparkEntry.queries("g16_landmark_paths")(spark, sfDir).collect()
        .map(_.toSeq).toSeq)
  }

  test("g17 closeness: hand-pinned ticks on the planted path; " +
    "corpus rows aggregate g16 exactly") {
    import spark.implicits._
    import graft.operators.Graph
    // path 0-1-2-3-4 (mirrored), landmarks {0, 4}: per node the
    // landmark distances are the positions from each end, so every
    // centrality value is hand-computable. Node 0: d(0)=self (out),
    // d(4)=4 -> n=1, sum=4, close=2^20/4, harm=2^20/4; node 1:
    // d={1,3} -> close=2*2^20 div 4, harm=2^20+349525; node 2:
    // d={2,2} -> close=2^20 div 2, harm=2*524288.
    val und = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val lms = Seq(0L, 4L).toDF("id")
    val got = Graph.closenessOf(Graph.landmarkPaths(edges, lms, 6))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(3))).toMap
    assert(got(0L) == ((1L, 4L, 262144L, 262144L)), s"node0: ${got(0L)}")
    assert(got(1L) == ((2L, 4L, 524288L, 1048576L + 349525L)))
    assert(got(2L) == ((2L, 4L, 524288L, 1048576L)))
    assert(got(3L) == ((2L, 4L, 524288L, 1048576L + 349525L)))
    assert(got(4L) == ((1L, 4L, 262144L, 262144L)))
    // corpus: g17's rows are EXACTLY the aggregation of g16's rows
    // (same memoized BFS frame — shared-computation consistency)
    val g16 = SparkEntry.queries("g16_landmark_paths")(spark, sfDir).collect()
      .filter(_.getLong(4) >= 1L)
      .groupBy(r => (r.getString(0), r.getLong(1)))
      .map { case (k, rs) =>
        val ds = rs.map(_.getLong(4))
        k -> (ds.length.toLong, ds.sum,
          (ds.length.toLong * 1048576L) / ds.sum,
          ds.map(1048576L / _).sum)
      }
    val g17 = SparkEntry.queries("g17_closeness")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(g17 == g16, "g17 must aggregate g16's distances exactly")
    assert(g17 == SparkEntry.queries("g17_closeness")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap)
  }

  test("g18 assortativity: exact poles on planted geometries; " +
    "corpus moments symmetric and deterministic") {
    import spark.implicits._
    import graft.operators.Graph
    def rOf(pairs: Seq[(Long, Long)]): Long =
      Graph.assortativityOf(pairs.toDF("x", "y")).collect().head.getLong(6)
    // star K_{1,4}: every edge joins deg 4 to deg 1 — all points on
    // a negative-slope line, r EXACTLY -2^20
    val star = Seq.fill(4)((4L, 1L)) ++ Seq.fill(4)((1L, 4L))
    assert(rOf(star) == -1048576L, s"star: ${rOf(star)}")
    // two disjoint cliques (K_2 deg 1, K_3 deg 2): every edge joins
    // equal degrees — points on y = x, r EXACTLY +2^20
    val cliques = Seq.fill(2)((1L, 1L)) ++ Seq.fill(6)((2L, 2L))
    assert(rOf(cliques) == 1048576L, s"cliques: ${rOf(cliques)}")
    // regular graph (a cycle): zero degree variance -> the shared
    // CASE reports 0, never NaN
    assert(rOf(Seq.fill(6)((2L, 2L))) == 0L)
    // corpus: the mirrored edge list makes the x/y moments EXACTLY
    // symmetric; bipartite trade graphs skew disassortative
    val row = SparkEntry.queries("g18_assortativity")(spark, sfDir)
      .collect().head
    assert(row.getLong(1) == row.getLong(2), "sx must equal sy")
    assert(row.getLong(3) == row.getLong(4), "sxx must equal syy")
    assert(row.getLong(6) >= -1048576L && row.getLong(6) <= 1048576L)
    assert(row.getLong(6) < 0L, s"trade graph should skew " +
      s"disassortative, got ${row.getLong(6)}")
    assert(SparkEntry.queries("g18_assortativity")(spark, sfDir)
        .collect().head.toSeq == row.toSeq)
  }

  test("g10 random walks: valid connected paths, deterministic, full coverage") {
    import spark.implicits._
    import graft.operators.Graph
    // degree-1 nodes have no choice: on a mirrored pair the walk
    // must alternate endpoints exactly
    val pair = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val forced = Graph.randomWalks(pair, 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    assert(forced.filter(_._1 == 1L).map(_._3).toSeq == Seq(1L, 2L, 1L, 2L, 1L))
    assert(forced.filter(_._1 == 2L).map(_._3).toSeq == Seq(2L, 1L, 2L, 1L, 2L))
    // trade graph: every walk is a CONNECTED path of the right length
    val edges = graftTestEdges()
    val edgeSet = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val walks = Graph.randomWalks(edges, Graph.WalkLen).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byWalk = walks.groupBy(_._1)
    assert(byWalk.nonEmpty)
    byWalk.foreach { case (w, rows) =>
      val path = rows.sortBy(_._2).map(_._3)
      assert(rows.map(_._2).sorted.toSeq == (0 to Graph.WalkLen),
        s"walk $w: steps not dense")
      assert(path.head == w, s"walk $w must start at its node")
      path.zip(path.tail).foreach { case (a, b) =>
        assert(edgeSet.contains((a, b)), s"walk $w: hop $a->$b is not an edge")
      }
    }
    // one walk per node, deterministic across runs
    val nodes = edgeSet.map(_._1)
    assert(byWalk.keySet == nodes)
    val again = Graph.randomWalks(edges, Graph.WalkLen).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(walks.sorted.toSeq == again.sorted.toSeq)
  }

  test("g10 ranked adjacency: hub neighbor lists rank WITHOUT a " +
    "one-group-per-node window, hop draw unchanged") {
    import spark.implicits._
    import graft.operators.{Graph, Relational}
    // hub graph: node 0 has 200 neighbors (1..200), each mirrored
    val hub = ((1L to 200L).map(d => (0L, d)) ++
      (1L to 200L).map(d => (d, 0L))).toDF("src", "dst")
    // the hop from the hub picks EXACTLY the md5-ranked neighbor —
    // replicate the draw in-test: r = md5_48("walk:0:1") mod 200,
    // neighbor = dst-ascending rank r, i.e. dst = r + 1
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest("walk:0:1".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    val expDst = java.lang.Long.parseLong(md5hex, 16) % 200L + 1L
    val walks = Graph.randomWalks(hub, 1).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(walks.find(w => w._1 == 0L && w._2 == 1).get._3 == expDst,
      s"hub hop must draw the md5-ranked neighbor $expDst")
    // leaf walks (degree 1) are forced back to the hub
    assert(walks.filter(w => w._1 == 7L).sortBy(_._2).map(_._3).toSeq ==
      Seq(7L, 0L))
    // structural: the rank build is distributedRank's shape — every
    // window in the ranking plan partitions by (__pid, src) range
    // SLICES (the checkpoint hides the upstream repartitionByRange,
    // so assert on the window spec itself): no window may group on
    // src alone, which would be the one-task-per-hub shape
    import org.apache.spark.sql.execution.window.WindowExec
    val ranked = Relational.distributedRank(hub, Seq("src"), Seq("dst"), "__r1")
    ranked.collect()
    val wins = ranked.queryExecution.executedPlan.collect { case w: WindowExec => w }
    assert(wins.nonEmpty, "local rank must still be a (bounded) window")
    // the offsets window runs over the per-(pid, group) COUNTS frame
    // (≤ #partitions rows per group — bounded); the DATA-path
    // row_number windows are the ones that must be pid-sliced
    val dataWins = wins.filter(
      _.windowExpression.mkString(";").toLowerCase.contains("row_number"))
    assert(dataWins.nonEmpty, "expected a row_number local-rank window")
    dataWins.foreach { w =>
      val spec = w.partitionSpec.map(_.toString.toLowerCase)
      assert(spec.exists(_.contains("__pid")),
        s"row_number window groups a whole hub into one task: partitionSpec=$spec")
    }
  }

  test("g07 link prediction: exact on a square-plus-pendant, top-k binds") {
    import spark.implicits._
    import graft.operators.Graph
    // square 1-2-3-4-1 with pendant 5 off vertex 1
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 5L))
      .toDF("a", "b")
    val got = Graph.linkPredict(und, 20).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 3L, 2L, 0.6667), // via {2,4}; |N(1)∪N(3)| = 3
      (2L, 4L, 2L, 1.0),    // via {1,3}; neighborhoods identical
      (2L, 5L, 1L, 0.5),
      (4L, 5L, 1L, 0.5)),
      s"wrong predictions: ${got.toSeq}")
    // the top-k cut keeps the strongest pairs in (cn, a, b) order
    val cut = Graph.linkPredict(und, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(cut.toSeq == Seq((1L, 3L), (2L, 4L)))
    // sf0.001: the sparsified co-purchase graph is the complete K10
    // (g04 spec), so NOTHING is non-adjacent — an empty prediction
    // set is the correct output, not an error
    assert(Graph.g07LinkPredict(spark, sfDir).count() == 0L)
  }

  test("j04 banded overlap equals brute force, boundaries included") {
    import spark.implicits._
    import graft.operators.Joins
    val H = 3600L * 1000000L
    // sessions (closed intervals): inside one window; spanning three;
    // an instant session ON a window start; ending exactly AT a
    // window start (included, 0-µs overlap is legitimate); starting
    // exactly at a window END (excluded — windows are half-open)
    val sessions = Seq(
      (1L, 1L, H + 10L, H + 20L),          // inside window 1
      (2L, 1L, H - 5L, 3 * H + 5L),        // spans windows 0,1,2,3
      (3L, 1L, 2 * H, 2 * H),              // instant at window-2 start
      (4L, 1L, H - 50L, H),                // ends exactly at window-1 start
      (5L, 1L, 2 * H, 2 * H - 1 + H + 1L)  // = [2H, 3H] touches window 3
    ).toDF("user_id", "session_id", "s_us", "e_us")
    val hot = Seq((0L * H, 7L), (1L * H, 9L), (2L * H, 11L), (3L * H, 13L))
      .toDF("ws_us", "n_ev")
    val got = Joins.bandedOverlap(sessions, hot).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    // brute force over the cross product
    val s = sessions.collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val h = hot.collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = (for {
      (u, su, eu) <- s
      (ws, n) <- h
      if ws <= eu && su < ws + H
    } yield (u, ws, math.min(eu, ws + H) - math.max(su, ws), n)).toSet
    assert(got == expected, s"missing=${expected -- got} extra=${got -- expected}")
    // the named boundaries behave as documented
    assert(got.contains((3L, 2 * H, 0L, 11L)), "instant session must appear with 0 overlap")
    assert(got.contains((4L, 1 * H, 0L, 9L)), "end-at-start must appear (closed session)")
    assert(got.count(_._1 == 2L) == 4, "spanning session must hit all four windows")
  }

  test("g08 graph profile: exact on a triangle-plus-pendant graph") {
    import spark.implicits._
    import graft.operators.Graph
    // triangle 1-2-3 with pendant 4 off vertex 3: degrees (2,2,3,1),
    // wedges 1+1+3+0 = 5, one triangle → global_cc = 3/5
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val r = Graph.graphProfileFrom(und).collect()(0)
    assert(r.getLong(0) == 4L && r.getLong(1) == 4L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 2.0 && r.getDouble(4) == 0.6)
    // assortativity: plain-Scala Pearson over both edge orientations
    val deg = Map(1L -> 2.0, 2L -> 2.0, 3L -> 3.0, 4L -> 1.0)
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .flatMap { case (a, b) => Seq((deg(a), deg(b)), (deg(b), deg(a))) }
    val n = pairs.size
    val (mx, my) = (pairs.map(_._1).sum / n, pairs.map(_._2).sum / n)
    val cov = pairs.map { case (x, y) => (x - mx) * (y - my) }.sum
    val vx = pairs.map(p => (p._1 - mx) * (p._1 - mx)).sum
    val vy = pairs.map(p => (p._2 - my) * (p._2 - my)).sum
    val expected = math.rint(cov / math.sqrt(vx * vy) * 10000) / 10000
    assert(math.abs(r.getDouble(5) - expected) < 1e-9,
      s"assortativity ${r.getDouble(5)} != $expected")
    // a regular graph has undefined assortativity → null, not NaN
    val single = Seq((1L, 2L)).toDF("a", "b")
    assert(Graph.graphProfileFrom(single).collect()(0).isNullAt(5))
  }

  test("g06 frontier-only BFS: equals full re-expansion, shuffles fewer records") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    import graft.operators.Graph
    // sf0.01 so the record-count gap is structural, not noise
    val d = "/root/testdata/sf0.01"
    val pairs = Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, d)
        .select(col("l_orderkey").as("o_orderkey"), col("l_suppkey")),
        "o_orderkey")
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct().localCheckpoint(true)
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
    val seeds = edges.select(col("src").as("id")).distinct()
      .filter(col("id") % 2 === 0).orderBy(col("id")).limit(Graph.SsspSeeds)
      .localCheckpoint(true)
    // stage-level shuffle-write records catch the per-round
    // checkpoint jobs that no QueryExecution listener sees
    class Recs extends SparkListener {
      @volatile var n = 0L
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        n += s.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten
    }
    def measured(body: => Array[(Long, Long)]): (Array[(Long, Long)], Long) = {
      val l = new Recs
      spark.sparkContext.addSparkListener(l)
      try {
        val r = body
        // listener events are async; wait until the count stabilizes
        var last = -1L
        while (l.n != last) { last = l.n; Thread.sleep(250) }
        (r, l.n)
      } finally spark.sparkContext.removeSparkListener(l)
    }
    // the pre-frontier reference: re-expand the FULL reached set
    val (full, fullRecs) = measured {
      var ref = seeds.select(col("id"), lit(0L).as("d")).localCheckpoint(true)
      for (_ <- 1 to Graph.SsspIters) {
        val next = edges.join(ref.withColumnRenamed("id", "src"), "src")
          .select(col("dst").as("id"), (col("d") + 1).as("d"))
        ref = ref.union(next).groupBy(col("id")).agg(min(col("d")).as("d"))
          .localCheckpoint(false)
      }
      ref.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    }
    val (frontier, frontierRecs) = measured {
      Graph.boundedBfs(edges, seeds, Graph.SsspIters)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    }
    assert(frontier.sameElements(full),
      s"frontier BFS diverged: ${frontier.length} vs ${full.length} rows")
    info(s"corpus shuffle records written: full=$fullRecs frontier=$frontierRecs")
    assert(frontierRecs < fullRecs,
      s"frontier rounds must shuffle fewer records ($frontierRecs vs $fullRecs)")
    // On a HIGH-DIAMETER graph the gap is structural, not marginal:
    // full re-expansion re-joins the whole reached prefix of the path
    // every round (O(n·iters) candidates), the frontier walks one
    // node per round (O(n)).
    import spark.implicits._
    val n = 512
    val phalf = (0L until n.toLong - 1).map(i => (i, i + 1))
    val pedges = (phalf ++ phalf.map(_.swap)).toDF("src", "dst")
      .localCheckpoint(true)
    val pseeds = Seq(0L).toDF("id").localCheckpoint(true)
    val iters = 16
    val (pf, pfRecs) = measured {
      var ref = pseeds.select(col("id"), lit(0L).as("d")).localCheckpoint(true)
      for (_ <- 1 to iters) {
        val next = pedges.join(ref.withColumnRenamed("id", "src"), "src")
          .select(col("dst").as("id"), (col("d") + 1).as("d"))
        ref = ref.union(next).groupBy(col("id")).agg(min(col("d")).as("d"))
          .localCheckpoint(false)
      }
      ref.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    }
    val (pn, pnRecs) = measured {
      Graph.boundedBfs(pedges, pseeds, iters)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    }
    assert(pn.sameElements(pf), "path-graph frontier BFS diverged")
    info(s"path-graph shuffle records written: full=$pfRecs frontier=$pnRecs")
    assert(pnRecs < pfRecs)
  }

  test("g06 shortest paths: BFS hops exact on a path graph, bound binds") {
    import spark.implicits._
    import graft.operators.Graph
    // path 0-1-2-3-4-5-6-7-8 (mirrored); seed {0}; iters 6 → node 7
    // is at hop 7 and node 8 at hop 8: both beyond the bound, absent
    val half = (0L to 7L).map(i => (i, i + 1))
    val edges = (half ++ half.map(_.swap)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("id")
    val got = Graph.boundedBfs(edges, seeds, 6).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 6L).map(i => i -> i).toMap,
      s"path-graph hops wrong: $got")
    // multi-source: seeds {0, 8} → hops are min over the two sources
    val got2 = Graph.boundedBfs(edges, Seq(0L, 8L).toDF("id"), 6).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == (0L to 8L).map(i => i -> math.min(i, 8 - i)).toMap)
    // full query: seeds at hop 0, everything within the bound
    val rows = Graph.g06ShortestPaths(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.count(r => r._3 == 0L) == Graph.SsspSeeds)
    assert(rows.forall(r => r._3 >= 0L && r._3 <= Graph.SsspIters))
  }

  test("g11 co-occurrence equals plain-Scala skip-gram counts over g10's walks") {
    import graft.operators.Graph
    // rebuild the pair statistics from the walk corpus brute-force
    val walks = Graph.g10RandomWalks(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        (r.getString(2), r.getLong(3))))
    val pairs = walks.groupBy(_._1).values.flatMap { w =>
      for {
        x <- w.toSeq; y <- w.toSeq
        if x._2 != y._2 && math.abs(x._2 - y._2) <= Graph.SkipWindow
      } yield (x._3, y._3)
    }.toSeq
    val cnt = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t = cnt.values.sum
    val ca = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cb = pairs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val expect = cnt.filter(_._2 >= 2).flatMap { case ((a, b), c) =>
      val ppmi = math.max(0.0,
        math.log((c * t) / (ca(a) * cb(b)).toDouble) / math.log(2.0))
      val ticks = math.floor(ppmi * 1048576.0 + 0.5).toLong
      if (ticks > 0) Some((a, b) -> (c, ticks)) else None
    }
    val got = Graph.g11WalkCooccurrence(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getString(2), r.getLong(3))) ->
        (r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet == expect.keySet,
      s"pair-set drift: ${got.size} vs ${expect.size}")
    got.foreach { case (k, (c, ticks)) =>
      assert(c == expect(k)._1, s"count drift at $k")
      // libm log2 in-test vs Spark: allow one tick at the floor boundary
      assert(math.abs(ticks - expect(k)._2) <= 1L, s"ppmi drift at $k")
    }
    // the window predicate is symmetric, so the matrix must be too
    got.keys.foreach { case (a, b) =>
      assert(got.contains((b, a)), s"asymmetric pair $a $b")
    }
  }

  test("g13 modularity: hand-scored partitions and corpus identities") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.Graph
    // two disjoint triangles, labeled by component: the textbook
    // Q = 1/2 partition. Mirrored E = 12; each community has nodes=3,
    // degree_sum=6, intra (mirrored) = 6, q_num = 6·12 − 36 = 36.
    val half = Seq((0L, 2L), (2L, 4L), (0L, 4L), (1L, 3L), (3L, 5L), (1L, 5L))
    val edges = (half ++ half.map(_.swap)).toDF("src", "dst")
    val labels = Seq((0L, 0L), (2L, 0L), (4L, 0L), (1L, 1L), (3L, 1L),
      (5L, 1L)).toDF("id", "lab")
    val got = Graph.modularityBy(edges, labels).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got == Map(0L -> ((3L, 6L, 6L, 36L)), 1L -> ((3L, 6L, 6L, 36L))))
    // Q = Σ q_num / E² = 72 / 144 = 1/2 exactly
    assert(got.values.map(_._4).sum * 2 == 12L * 12L)
    // the all-in-one-community partition scores Q = 0 exactly
    val one = labels.select(col("id"), lit(7L).as("lab"))
    val flat = Graph.modularityBy(edges, one).collect()
    assert(flat.length == 1 && flat.head.getLong(4) == 0L,
      "single-community modularity must be exactly zero")
    // corpus: communities are exactly g05's label set, degree mass
    // sweeps the whole graph, intra never exceeds E
    val g13 = Graph.g13Modularity(spark, sfDir).collect()
    val g05Labs = Graph.g05LabelProp(spark, sfDir).collect()
      .map(r => (r.getString(2), r.getLong(3))).toSet
    assert(g13.map(r => (r.getString(0), r.getLong(1))).toSet == g05Labs,
      "g13 must score exactly the g05 communities")
    val e = graftTestEdges().count()
    assert(g13.map(_.getLong(3)).sum == e, "degree mass must sum to E")
    assert(g13.map(_.getLong(4)).sum <= e, "intra edges cannot exceed E")
    assert(g13.toSeq == Graph.g13Modularity(spark, sfDir).collect().toSeq)
  }

  test("g14 betweenness: hand-computed Brandes on path and diamond graphs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.Graph
    def bc(half: Seq[(Long, Long)], seeds: Seq[Long]): Map[Long, Long] = {
      val edges = (half ++ half.map(_.swap)).toDF("src", "dst")
      Graph.betweennessFrom(edges, seeds.toDF("id")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    // path 1—2—3 from seed 1: node 2 brokers the 1→3 pair exactly
    // once (δ = 1.0 = 2²⁰ ticks); the endpoint 3 brokers nothing
    assert(bc(Seq((1L, 2L), (2L, 3L)), Seq(1L)) ==
      Map(2L -> 1048576L, 3L -> 0L))
    // diamond 0—1—3, 0—2—3 from seed 0: two shortest paths to 3
    // (σ = 2), each middle node carries half a dependency (2¹⁹)
    assert(bc(Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L)), Seq(0L)) ==
      Map(1L -> 524288L, 2L -> 524288L, 3L -> 0L))
    // two seeds accumulate: path 1—2—3 from seeds {1, 3} doubles the
    // middle node's dependency, and each endpoint is the OTHER
    // seed's level-2 node (δ = 0 there)
    assert(bc(Seq((1L, 2L), (2L, 3L)), Seq(1L, 3L)) ==
      Map(2L -> 2097152L, 1L -> 0L, 3L -> 0L))
    // σ counting is exact through multi-path fans: K2,2 core
    // 0—{1,2}—4 plus a tail 4—5, seed 0: σ(4) = 2, and node 5 at
    // level 3 is beyond the hop bound (absent)
    val fan = bc(Seq((0L, 1L), (0L, 2L), (1L, 4L), (2L, 4L), (4L, 5L)), Seq(0L))
    assert(!fan.contains(5L), "level-3 node must be outside the hop bound")
    assert(fan == Map(1L -> 524288L, 2L -> 524288L, 4L -> 0L),
      s"fan dependencies drift: $fan")
    // corpus: deterministic and non-negative
    val a = Graph.g14Betweenness(spark, sfDir).collect()
    assert(a.nonEmpty && a.forall(_.getLong(2) >= 0L))
    assert(a.toSeq == Graph.g14Betweenness(spark, sfDir).collect().toSeq)
  }

  test("g15: bounded min-label CC equals converged CC, sizes consistent") {
    import graft.operators.Graph
    import spark.implicits._
    // synthetic: path 0-1-2-3 (diameter 3 < CcIters), pair 8-9 — the
    // bounded pregel instance lands on exact components
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (8L, 9L))
    val edges = (e ++ e.map(_.swap)).toDF("src", "dst")
    val got = Graph.minLabelRounds(edges, Graph.CcIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 8L -> 8L, 9L -> 8L))
    // corpus: the bounded front door is bit-identical to the
    // convergence-tested production CC — the bound-with-slack
    // contract verified, not assumed
    val trade = Graph.g15Components(spark, sfDir)
    val viaConverged = {
      val te = trade // force the memoized edges first (lock order)
      te.count()
      val ed = graft.operators.Graph.tradeEdgesForSpec(spark, sfDir)
      val nodes = ed.select(org.apache.spark.sql.functions.col("src").as("id")).distinct()
      Dedup.connectedComponents(nodes, ed)
    }
    val bounded = Graph.tradeMinLabelsForSpec(spark, sfDir)
    assert(bounded.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      viaConverged.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    // size column sums back to the node count
    val rows = trade.collect()
    val byComp = rows.groupBy(r => (r.getString(2), r.getLong(3)))
    byComp.foreach { case (_, rs) =>
      assert(rs.map(_.getLong(4)).distinct.length == 1)
      assert(rs.head.getLong(4) == rs.length.toLong)
    }
  }

  test("g19 scc: planted digraphs — cycles, bridge, nested-root rounds, DAG trim") {
    import spark.implicits._
    def labs(edges: Seq[(Long, Long)]): Map[Long, Long] =
      graft.operators.Graph.sccLabels(edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // two cycles joined by a one-way bridge, plus a dangling tail:
    // {1,2,3} and {4,5} are SCCs, 6 a singleton
    assert(labs(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L),
        (4L, 5L), (5L, 4L), (5L, 6L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L))
    // nested color roots: {3,4}'s min ancestor is 1, so round 1 colors
    // it under SCC {1,2}'s root and only the backward phase's
    // mutual-reach check defers it to outer round 2
    assert(labs(Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (4L, 3L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
    // a pure DAG dissolves entirely in the trim phase: a long path and
    // a diamond, every node its own SCC
    val dag = (1L to 12L).sliding(2).map(p => (p.head, p(1))).toSeq ++
      Seq((20L, 21L), (20L, 22L), (21L, 23L), (22L, 23L))
    assert(labs(dag) == (1L to 12L).map(i => i -> i).toMap ++
      Map(20L -> 20L, 21L -> 21L, 22L -> 22L, 23L -> 23L))
    // an isolated 2-cycle plus a self-contained triangle — multiple
    // nontrivial SCCs finalize in the SAME outer round
    assert(labs(Seq((7L, 8L), (8L, 7L), (10L, 11L), (11L, 12L), (12L, 10L))) ==
      Map(7L -> 7L, 8L -> 7L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("g19 scc: corpus — deterministic, sizes self-consistent, SCC ≠ CC") {
    val a = graft.operators.Graph.g19Scc(spark, sfDir).collect()
    val b = graft.operators.Graph.g19Scc(spark, sfDir).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq && a.nonEmpty)
    // scc_size is the actual row count of its label
    val byScc = a.groupBy(r => (r.getString(2), r.getLong(3)))
    byScc.foreach { case (k, rows) =>
      assert(rows.forall(_.getLong(4) == rows.length.toLong),
        s"scc $k size column drifted")
    }
    // the directed derivation is non-trivial: at least one mutual-trade
    // core SCC, and more than one SCC overall (CC on this connected
    // corpus would be a single component)
    assert(a.map(_.getLong(4)).max > 1L, "no nontrivial SCC at sf0.001")
    assert(byScc.size > 1, "SCC collapsed to one component — CC semantics")
  }
}
