package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Similarity}
import graft.functions.Kernels

/** Value-level checks for the dedup/ANN operators that have no SQL
  * oracle: compare against brute-force ground truth computed in-test.
  */
class DedupSimilaritySpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = TestSpark.spark

  private def u(s: String) = UTF8String.fromString(s)

  /** Plain-Scala cosine (double accumulate, index order) — the truth
    * twin of Kernels.cosineF used by the embedding specs.
    */
  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  test("kernel: ngramJaccard basics") {
    assert(Kernels.ngramJaccard(u("a b c d"), u("a b c d"), 3) == 1.0)
    assert(Kernels.ngramJaccard(u("a b c d"), u("x y z w"), 3) == 0.0)
    // "a b c d e" 3-grams: {abc,bcd,cde}; "a b c d x": {abc,bcd,cdx} → 2/4
    assert(Kernels.ngramJaccard(u("a b c d e"), u("a b c d x"), 3) == 0.5)
  }

  test("kernel: minhash estimates jaccard") {
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    val sa = Kernels.minhash(u(a), 128, 3).toLongArray()
    val sb = Kernels.minhash(u(b), 128, 3).toLongArray()
    val est = sa.zip(sb).count { case (x, y) => x == y } / 128.0
    val exact = Kernels.ngramJaccard(u(a), u(b), 3)
    assert(math.abs(est - exact) < 0.2, s"est $est vs exact $exact")
  }

  test("kernel: simhash near-dup has small hamming distance") {
    val a = "the quick brown fox jumps over the lazy dog " * 10
    val b = a.replace("lazy", "sleepy")
    val d = Kernels.hamming64(Kernels.simhash64(u(a)), Kernels.simhash64(u(b)))
    assert(d <= 8, s"hamming $d")
    val c = "completely different words about spark shuffle partitions everywhere"
    assert(Kernels.hamming64(Kernels.simhash64(u(a)), Kernels.simhash64(u(c))) > d)
  }

  test("kernel: cosine matches plain scala") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val x = Array(1.0f, 2.0f, 3.0f)
    val y = Array(-1.0f, 0.5f, 2.0f)
    val got = Kernels.cosineF(new GenericArrayData(x), new GenericArrayData(y))
    val dot = x.zip(y).map { case (a, b) => a.toDouble * b.toDouble }.sum
    val exp = dot / (math.sqrt(x.map(v => v.toDouble * v.toDouble).sum) *
      math.sqrt(y.map(v => v.toDouble * v.toDouble).sum))
    assert(math.abs(got - exp) < 1e-12)
  }

  test("d02 minhash-LSH finds exactly the high-jaccard pairs (vs brute force)") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val truth = (for {
      i <- docs.indices; j <- (i + 1) until docs.length
      jac = Kernels.ngramJaccard(u(docs(i)._2), u(docs(j)._2), 3)
      if jac >= 0.7
    } yield (math.min(docs(i)._1, docs(j)._1), math.max(docs(i)._1, docs(j)._1))).toSet
    val got = Dedup.d02DedupMinhash(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "test corpus should contain near-dups")
    // verify step guarantees precision == 1; banding at j>=0.7 with
    // 16x8 gives recall ~1 on this corpus
    assert(got == truth, s"missing=${truth -- got} extra=${got -- truth}")
  }

  test("d10 incremental probe equals the d02 pairs straddling the split") {
    // same banding, same verify threshold -> restricted to
    // (delta, corpus) pairs the two operators must agree exactly.
    // (Exact equality additionally needs no band bucket straddling
    // MaxBucket — d10's cap counts corpus rows, d02's the full
    // bucket; buckets here are orders of magnitude below the cap.)
    val d02 = Dedup.d02DedupMinhash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val want = d02.flatMap { case (a, b, j) =>
      val (an, bn) = (a % 10 == 7, b % 10 == 7)
      if (an && !bn) Some((a, b, j))
      else if (bn && !an) Some((b, a, j))
      else None
    }.toSet
    val got = Dedup.d10DedupIncremental(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(want.nonEmpty, "split should straddle some near-dup pairs")
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("d04 2-gram banding finds exactly the jaccard2>=0.5 pairs (vs brute force)") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val truth = (for {
      i <- docs.indices; j <- (i + 1) until docs.length
      jac = Kernels.ngramJaccard(u(docs(i)._2), u(docs(j)._2), 2)
      if jac >= 0.5
    } yield (math.min(docs(i)._1, docs(j)._1), math.max(docs(i)._1, docs(j)._1))).toSet
    val got = Dedup.d04DedupNgram(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "test corpus should contain near-dups")
    // exact verify => precision 1; 32x4 banding (threshold ~0.42)
    // sits under the 0.5 verify bar => recall 1 on this corpus
    assert(got == truth, s"missing=${truth -- got} extra=${got -- truth}")
  }

  test("d15 prefix filtering finds exactly the jaccard3>=0.7 pairs (vs brute force)") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // string-shingle truth (the operator's exact set definition, not
    // the hashed-shingle kernel — identical modulo fnv collisions)
    def shingles(t: String): Set[String] = {
      val w = t.split("[ \n\t\r]+").filter(_.nonEmpty)
      w.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }
    val truth = (for {
      i <- docs.indices; j <- (i + 1) until docs.length
      sa = shingles(docs(i)._2); sb = shingles(docs(j)._2)
      if sa.nonEmpty && sb.nonEmpty
      inter = (sa & sb).size
      jac = inter.toDouble / (sa.size + sb.size - inter)
      if jac >= 0.7
    } yield (math.min(docs(i)._1, docs(j)._1), math.max(docs(i)._1, docs(j)._1))).toSet
    val got = Dedup.d15DedupPrefix(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "test corpus should contain near-dups")
    // prefix filtering is lossless at the threshold (recall 1 by
    // theorem) and the exact verify gives precision 1 — unlike the
    // LSH specs above, ANY mismatch here is a bug, not bad luck
    assert(got == truth, s"missing=${truth -- got} extra=${got -- truth}")
  }

  test("d05 embedding near-dup pairs are all true positives with decent recall") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val truth = (for {
      i <- vecs.indices; j <- (i + 1) until vecs.length
      if cos(vecs(i)._2, vecs(j)._2) >= 0.4
    } yield (vecs(i)._1, vecs(j)._1)).toSet
    val got = Dedup.d05DedupEmbedding(spark, sfDir)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(truth), s"false positives: ${got -- truth}")
    // 12 bands x 4 bits: per-pair candidate probability >= 0.88 at the
    // 0.4 threshold, higher above it
    assert(got.size >= (truth.size * 0.7).toInt, s"recall too low: ${got.size}/${truth.size}")
  }

  test("s04 kmeans: assignment partitions the corpus; Lloyd rounds improve fit") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val rows = Similarity.s04Kmeans(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exactly one cell per vector; sizes consistent with membership
    assert(rows.length == vecs.length)
    assert(rows.map(_._1).distinct.length == rows.length)
    rows.groupBy(_._2).foreach { case (cell, ms) =>
      assert(ms.forall(_._3 == ms.length), s"cell $cell size mismatch")
    }
    // fit metric: mean best-cosine to the centroid set; refined
    // centroids must fit at least as well as the raw seeds (Lloyd
    // recentring), and in practice strictly better
    def fit(iters: Int): Double = {
      val cents = Similarity.kmeansCentroids(spark, sfDir, iters).collect()
        .map(r => r.getSeq[Float](1).toArray)
      vecs.map { case (_, v) => cents.map(c => cos(v, c)).max }.sum / vecs.length
    }
    val (f0, f3) = (fit(0), fit(Similarity.KmeansIters))
    assert(f3 >= f0 - 1e-9, s"refined fit $f3 worse than seed fit $f0")
    assert(f3 > f0, s"expected strict improvement on this corpus: $f3 vs $f0")
  }

  test("d11 semantic dedup: min-id rule under 2-probe cell assignment") {
    val emb = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val cents = Similarity.kmeansCentroids(spark, sfDir, Similarity.KmeansIters)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    // truth twin of the probe assignment: 2 nearest centroids, ties to
    // the smaller cid — rank-1 is the s04 cell
    val pcells = emb.map { case (id, v) =>
      id -> cents.map { case (cid, cv) => (cid, cos(v, cv)) }
        .sortBy { case (cid, c) => (-c, cid) }.take(Similarity.SemProbes).map(_._1).toSet
    }
    val s04 = Similarity.s04Kmeans(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = Similarity.d11DedupSemantic(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.length == emb.size)
    rows.foreach { case (v, cell, isDup) =>
      assert(cell == s04(v), s"d11 primary cell of $v differs from s04")
      val truth = emb.keys.exists(u =>
        u < v && (pcells(u) & pcells(v)).nonEmpty && cos(emb(u), emb(v)) >= 0.4)
      assert(isDup == truth, s"vec $v: is_dup=$isDup truth=$truth")
    }
    // multi-probe exists to lift pair co-occurrence over single-cell
    // assignment: on every corpus it can only widen the compared set,
    // and on this one it must strictly find more true pairs in-cell
    val truePairs = (for {
      u <- emb.keys; v <- emb.keys if u < v && cos(emb(u), emb(v)) >= 0.4
    } yield (u, v)).toSet
    val coSingle = truePairs.count { case (u, v) => s04(u) == s04(v) }
    val coMulti = truePairs.count { case (u, v) => (pcells(u) & pcells(v)).nonEmpty }
    assert(coMulti >= coSingle, "2-probe can never co-locate fewer pairs")
    assert(truePairs.isEmpty || coMulti > coSingle,
      s"expected strict co-occurrence lift on this corpus: $coMulti vs $coSingle of ${truePairs.size}")
  }

  test("d09 containment pairs are true positives; substring docs are found") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // brute-force directed containment truth at the 0.8 bar
    val truth = (for {
      i <- docs.indices; j <- docs.indices if i != j
      c = Kernels.ngramContainment(u(docs(i)._2), u(docs(j)._2), 3)
      if c >= 0.8
    } yield (docs(i)._1, docs(j)._1)).toSet
    val got = Dedup.d09DedupContainment(spark, sfDir)
      .select("contained_id", "container_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(truth), s"false positives: ${got -- truth}")
    // recall bound is the documented df-cap trade; on this corpus the
    // rare-shingle index recovers the large majority of true pairs
    assert(truth.isEmpty || got.size >= (truth.size * 0.7).toInt,
      s"recall too low: ${got.size}/${truth.size}")
  }

  test("bucketPairs streams large buckets through a self-join, arrays only small ones") {
    import spark.implicits._
    // one streamable bucket (300 > pairStream), one small array bucket
    // (5), one degenerate bucket over maxBucket that must be dropped
    val rows = (0 until 300).map(i => (0, 7L, i.toLong)) ++
      (0 until 5).map(i => (1, 9L, (1000 + i).toLong)) ++
      (0 until 500).map(i => (2, 11L, (2000 + i).toLong))
    val banded = rows.toDF("band_id", "band_hash", "doc_id")
    val streamed = Dedup.bucketPairs(banded, Seq("band_id", "band_hash"),
      col("doc_id"), maxBucket = 400, pairStream = 100)
    val got = streamed.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 300 * 299 / 2 + 5 * 4 / 2,
      "streamed + arrayed pairs, degenerate bucket dropped")
    assert(got.forall { case (a, b) => a < b })
    // structural invariant: every row reaching the pair-array generator
    // first passes the anti-join that excludes over-threshold buckets
    // (so per-bucket arrays stay bounded), and the large bucket's pairs
    // flow through an inner self-join instead
    import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join => LJoin}
    import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti}
    val lp = streamed.queryExecution.optimizedPlan
    val gens = lp.collect { case g: Generate => g }
    assert(gens.nonEmpty, "small-bucket path must expand via the generator")
    gens.foreach { g =>
      assert(g.child.collect { case j: LJoin if j.joinType == LeftAnti => j }.nonEmpty,
        "generator input must exclude over-threshold buckets via the anti-join")
    }
    assert(lp.collect { case j: LJoin if j.joinType == Inner => j }.nonEmpty,
      "large buckets must stream pairs through a bucket self-join")
    // path equivalence: raising pairStream to cover every bucket (all
    // collect_set) yields the identical pair set
    val arrayed = Dedup.bucketPairs(banded, Seq("band_id", "band_hash"),
        col("doc_id"), maxBucket = 400, pairStream = 400)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet == arrayed.toSet)
  }

  test("s03 IVF ANN recall@10 vs s01 brute force") {
    val exact = Similarity.s01AnnBruteforce(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.s03AnnIvf(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"s03 recall@10 = $recall")
    // deterministic pipeline on deterministic data → recall is a fixed
    // value (0.62 here, 50 pairs). Near-uniform synthetic vectors are
    // IVF's worst case (see operator scaladoc); floor set one pair
    // under the observed value.
    assert(recall >= 0.6, s"recall@10 $recall too low")
  }

  test("s03 100TB path: cell-partitioned index read prunes to the probed cells") {
    // the documented scale path: materialize the IVF cell map
    // partitionBy(cell), probe by reading ONLY the probed partitions —
    // partition pruning does the scan cut, no full-corpus pass
    import org.apache.spark.sql.execution.FileSourceScanExec
    val centroids = Similarity.ivfCentroids(spark, sfDir)
    val cells = Similarity.ivfCells(spark, sfDir, centroids)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-cells").toString
    cells.write.mode("overwrite").partitionBy("cell").parquet(dir)
    val index = spark.read.parquet(dir)
    // cells are centroid ids (seed vec_ids) — probe three real ones
    val probeCells = cells.select("cell").distinct().orderBy("cell")
      .limit(3).collect().map(_.getLong(0)).toSeq
    val probed = index.filter(col("cell").isin(probeCells: _*))
    probed.write.format("noop").mode("overwrite").save()
    val scan = probed.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }
    assert(scan.nonEmpty)
    assert(scan.get.partitionFilters.nonEmpty,
      "cell probe must prune partitions at the scan, not filter rows")
    // the pruned read returns exactly the probed cells' vectors
    val expected = cells.filter(col("cell").isin(probeCells: _*))
      .select("vec_id").collect().map(_.getLong(0)).sorted
    val got = probed.select("vec_id").collect().map(_.getLong(0)).sorted
    assert(got.nonEmpty && got.sameElements(expected))
  }

  test("d07 cluster-labels memo invalidates when the table is rewritten") {
    val dir = java.nio.file.Files.createTempDirectory("graft-memo").toString
    val docs = Tables.documents(spark, sfDir)
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(Dedup.d07DedupClusters(spark, dir).count() == docs.count())
    // rewrite the table under the same path with half the corpus: the
    // memo's data fingerprint changes, so d07 must recompute instead of
    // serving labels for documents that no longer exist
    val half = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
    val staging = java.nio.file.Files.createTempDirectory("graft-memo-stage").toString
    half.write.mode("overwrite").parquet(s"$staging/documents.parquet")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/documents.parquet"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$staging/documents.parquet"),
      new org.apache.hadoop.fs.Path(s"$dir/documents.parquet"))
    assert(Dedup.d07DedupClusters(spark, dir).count() == half.count(),
      "stale memo served labels for a rewritten table")
  }

  test("d10 corpus band index reports dropped hot buckets via observe") {
    import spark.implicits._
    // 10100 identical docs: one signature, 16 band buckets all over
    // MaxBucket (10000) -> the whole index is dropped, and the drop
    // must be observable, not silent
    val degenerate = (0 until 10100)
      .map(i => (i.toLong, "all the same boilerplate text repeated again"))
      .toDF("doc_id", "text")
    val idx = Dedup.corpusBandIndex(degenerate)
    assert(idx.collect().isEmpty, "a fully-degenerate corpus drops every bucket")
    val m = idx.queryExecution.observedMetrics(Dedup.DroppedBucketsMetric)
    assert(m.getLong(0) == 16L, s"expected 16 dropped band buckets, got $m")
    // a healthy corpus reports zero dropped buckets
    val ok = Dedup.corpusBandIndex(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")))
    ok.collect()
    // under AQE, an EMPTY hot set is propagated away along with its
    // CollectMetrics node — absent metric <=> nothing was dropped
    val dropped = ok.queryExecution.observedMetrics
      .get(Dedup.DroppedBucketsMetric).map(_.getLong(0)).getOrElse(0L)
    assert(dropped == 0L)
  }

  test("s05 knn join: true cosines, k rows per vector, decent graph recall") {
    val emb = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    val got = Similarity.s05KnnJoin(spark, sfDir)
      .select("query_id", "neighbor_id", "cos", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // k rows per covered vector, ranks 1..k dense
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length <= 3 && rows.map(_._4).sorted.sameElements(1L to rows.length),
        s"vector $q: ranks must be dense 1..k")
    }
    // reported cosines are the true cosines (4dp)
    got.foreach { case (q, n, c, _) =>
      assert(math.abs(c - cos(emb(q), emb(n))) < 5e-4, s"cos($q,$n) off: $c")
    }
    // graph recall vs exact top-3 (same LSH regime as s02 ⇒ similar floor)
    val exact = emb.keys.flatMap { q =>
      emb.toSeq.filter(_._1 != q)
        .map { case (v, e) => (v, cos(emb(q), e)) }
        .sortBy { case (v, c) => (-c, v) }.take(3).map(v => (q, v._1))
    }.toSet
    val approx = got.map(r => (r._1, r._2)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.7, s"knn-graph recall@3 $recall too low")
  }

  test("s20 nn-descent: recall improves on the seed, structure holds") {
    val emb = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    val exact = emb.keys.flatMap { q =>
      emb.toSeq.filter(_._1 != q)
        .map { case (v, e) => (v, cos(emb(q), e)) }
        .sortBy { case (v, c) => (-c, v) }.take(3).map(v => (q, v._1))
    }.toSet
    def recallOf(pairs: Set[(Long, Long)]) =
      (exact & pairs).size.toDouble / exact.size
    val seed = Similarity.s05KnnJoin(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val refined = Similarity.s20NnDescent(spark, sfDir)
      .select("query_id", "neighbor_id", "cos", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val refinedPairs = refined.map(r => (r._1, r._2)).toSet
    val (rSeed, rRef) = (recallOf(seed), recallOf(refinedPairs))
    info(f"recall@3: seed $rSeed%.4f -> refined $rRef%.4f")
    assert(rRef >= rSeed, "refinement must never lose recall")
    assert(rRef > 0.95, s"refined recall@3 $rRef too low")
    // degree raise (3 -> GraphDegree = 8, r16): measured graph
    // recall@3 0.962 -> 0.968 here (0.964 -> 0.971 at sf0.01) — the
    // graph-BUILD recall was already near its LSH-seed ceiling; the
    // serve-side walk is where degree pays (see the degree-curve
    // test below)
    assert(rRef > 0.96, s"refined graph recall@3 $rRef below the k=8 bar")
    // structure: ≤ GraphDegree dense ranks per node, true cosines,
    // non-increasing
    refined.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length <= Similarity.GraphDegree &&
        rows.map(_._4).sorted.sameElements(1L to rows.length))
      val byRank = rows.sortBy(_._4).map(_._3)
      assert(byRank.sliding(2).forall(p => p.head >= p.last - 5e-4))
    }
    refined.foreach { case (q, n, c, _) =>
      assert(math.abs(c - cos(emb(q), emb(n))) < 5e-4, s"cos($q,$n) off: $c")
    }
    // deterministic
    val again = Similarity.s20NnDescent(spark, sfDir).collect().toSeq
    assert(again == Similarity.s20NnDescent(spark, sfDir).collect().toSeq)
  }

  test("s33 coarse entry layer: on a two-cluster plant the flat entry " +
    "set scores recall 0 and the layered one is exact at equal beam cost") {
    val sess = spark
    import sess.implicits._
    import org.apache.spark.sql.functions.col
    // cluster A: 470 vectors fanned over 0..40 deg — holds EVERY
    // low id, so the flat entry set (lowest b ids) starts here and
    // the within-cluster graph can never leave; cluster B: 50
    // vectors at 90 - j*0.5 deg (ids 470+j) — the query sits at 90
    // deg, so the exact top-3 is ids 470, 471, 472 and greedy
    // descent inside B walks j downward
    def vec(deg: Double): Seq[Float] = {
      val r = math.toRadians(deg)
      (Array(math.cos(r).toFloat, math.sin(r).toFloat) ++
        Array.fill(62)(0.0f)).toSeq
    }
    val emb = ((0 until 470).map(i => (i.toLong, vec(i * 40.0 / 470.0))) ++
      (0 until 50).map(j => ((470 + j).toLong, vec(90.0 - j * 0.5))))
      .toDF("vec_id", "embedding")
    // strided chains WITHIN each cluster only (both directions)
    def chain(ids: Range): Seq[(Long, Long)] = for {
      i <- ids; d <- Seq(-3, -2, -1, 1, 2, 3)
      if ids.contains(i + d)
    } yield (i.toLong, (i + d).toLong)
    val graph = (chain(0 until 470) ++ chain(470 until 520))
      .toDF("query_id", "neighbor_id")
    val queries = Seq((999L, vec(90.0))).toDF("query_id", "qv")
    // precondition that makes the uplift reachable (deterministic
    // given the ids): the md5 layer must contain a B member within
    // stride*hops of the target — loudly, so a CoarseSize retune
    // that breaks the plant fails here and not in the recall line
    val layer = Similarity.coarseEntries(emb, queries)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val bInLayer = layer.filter(_ >= 470L)
    assert(bInLayer.nonEmpty && bInLayer.min <= 470L + 9L,
      s"plant precondition: nearest B layer member ${bInLayer.toSeq.sorted.headOption}")
    def top3(entries: Option[org.apache.spark.sql.DataFrame]) =
      Similarity.beamSearchFor(emb, graph, queries, b = 10, hops = 3,
        entries = entries)
        .filter(col("rank") <= 3).collect().map(_.getLong(1)).toSet
    val flat = top3(None)
    val layered = top3(Some(Similarity.coarseEntries(emb, queries)))
    val exact = Set(470L, 471L, 472L)
    assert((flat intersect exact).isEmpty,
      s"flat entries must miss cluster B entirely: $flat")
    assert(layered == exact,
      s"layered entries must recover the exact top-3: $layered")
  }

  test("s33 beam search: the planted chain is walked to the far target; " +
    "beam never degrades; corpus serve is deterministic") {
    val sess = spark
    import sess.implicits._
    // planted arc: 10 unit vectors at angles i·8° in a 2-D subspace —
    // cosine to any query decays monotonically with angular distance,
    // so a greedy walk moves along the chain. The graph is the
    // FORWARD stride chain i -> {i+1, i+2, i+3}; the query sits at
    // node 9's angle, entries are the smallest ids (0, 1), and the
    // max reach per hop is a stride of 3 — so node 9 (8 past the
    // best entry) is reachable in EXACTLY 3 hops and provably not
    // in 2 (two hops top out at node 1 + 6 = 7).
    def vec(deg: Double): Array[Float] = {
      val r = math.toRadians(deg)
      (Array(math.cos(r).toFloat, math.sin(r).toFloat) ++
        Array.fill(62)(0.0f))
    }
    val emb = (0 to 9).map(i => (i.toLong, vec(i * 8.0).toSeq))
      .toDF("vec_id", "embedding")
    val graph = (for {
      i <- 0 to 9; d <- 1 to 3 if i + d <= 9
    } yield (i.toLong, (i + d).toLong)).toDF("query_id", "neighbor_id")
    val queries = Seq((99L, vec(72.0).toSeq)).toDF("query_id", "qv")
    def run(hops: Int) = Similarity.beamSearchFor(
        emb, graph, queries, b = 2, hops = hops)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSeq
    val full = run(3)
    assert(full.head == ((9L, 1L)), s"3 hops must reach node 9: $full")
    assert(run(2).head._1 == 7L,
      "2 hops must stall at node 7 — the third hop is load-bearing")
    // beam inclusion: best-in-beam cosine never decreases hop to hop
    val bests = (0 to 3).map(h => Similarity.beamSearchFor(
      emb, graph, queries, b = 2, hops = h)
      .collect().map(_.getDouble(2)).max)
    assert(bests.sliding(2).forall(p => p.head <= p.last + 1e-9),
      s"beam degraded: $bests")
    // corpus: k dense ranks, true cosines, deterministic, and the
    // served neighbors come from the corpus (never a query id)
    val got = Similarity.s33GraphAnn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val embC = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._4).sorted.sameElements(1L to rows.length))
      assert(rows.forall(r => r._2 != q))
      val byRank = rows.sortBy(_._4).map(_._3)
      assert(byRank.sliding(2).forall(p => p.head >= p.last - 5e-4))
    }
    got.foreach { case (q, n, c, _) =>
      assert(math.abs(c - cos(embC(q), embC(n))) < 5e-4)
    }
    assert(got.toSeq == Similarity.s33GraphAnn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSeq)
    // recall@3 of the SERVED beam vs exact brute force — the r16
    // degree-raise measurement (GraphDegree 3 -> 8 caps the walk no
    // longer; the coarse layer already fixed entry)
    val exact3 = got.map(_._1).distinct.flatMap { q =>
      embC.toSeq.filter(_._1 != q)
        .map { case (v, e) => (v, cos(embC(q), e)) }
        .sortBy { case (v, c) => (-c, v) }.take(3).map(v => (q, v._1))
    }.toSet
    val served3 = got.filter(_._4 <= 3L).map(r => (r._1, r._2)).toSet
    val r3 = (exact3 & served3).size.toDouble / exact3.size
    info(f"s33 serve recall@3 = $r3%.4f")
    // this 500-vector random-embedding corpus is the hard case for
    // graph navigation (no cosine locality to walk); the floor is
    // the measured figure, the degree UPLIFT is pinned on the
    // larger corpus in the next test
    assert(r3 >= 0.6, s"s33 serve recall@3 $r3 regressed")
  }

  test("graph-ANN degree curve (r16): raising the bottom-graph degree " +
    "3 -> 8 lifts serve recall@3 on the sf0.01 corpus") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val embC = emb.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val g0 = Similarity.knnGraphFor(emb)
    val exact3 = (0L until 5L).flatMap { q =>
      embC.toSeq.filter(_._1 != q)
        .map { case (v, e) => (v, cos(embC(q), e)) }
        .sortBy { case (v, c) => (-c, v) }.take(3).map(v => (q, v._1))
    }.toSet
    def serveRecall(deg: Int): Double = {
      val g = Similarity.nnDescentFrom(emb, g0, deg, 2)
        .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
      val served = Similarity.beamSearchFor(emb, g, queries,
          Similarity.BeamWidth, Similarity.BeamHops,
          entries = Some(Similarity.coarseEntries(emb, queries)))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
        .filter(_._3 <= 3L).map(r => (r._1, r._2)).toSet
      (exact3 & served).size.toDouble / exact3.size
    }
    val (r3deg3, r3deg8) = (serveRecall(3), serveRecall(Similarity.GraphDegree))
    info(f"serve recall@3: degree 3 = $r3deg3%.4f, " +
      f"degree ${Similarity.GraphDegree} = $r3deg8%.4f")
    // measured 0.60 -> 0.80: the degree raise is the serve-recall
    // lever the r15 verdict named (entry was fixed by the coarse
    // layer; degree capped the walk)
    assert(r3deg8 > r3deg3, "degree raise must lift serve recall")
    assert(r3deg8 >= 0.75, s"k=8 serve recall@3 $r3deg8 below measured bar")
  }

  test("s05 cap contract: degenerate buckets drop, graph stays bounded") {
    import spark.implicits._
    // adversarial corpus: N IDENTICAL vectors — every band collapses to
    // ONE bucket of N rows, the regime where an uncapped self-join
    // yields N(N-1)/2 candidate pairs
    val n = 60
    val degen = (0 until n).map(i => (i.toLong, Array.fill(64)(0.5f)))
      .toDF("vec_id", "embedding")
    // cap below the bucket size: every bucket drops (tier 2) — the
    // graph is EMPTY, the documented recall trade, never a blow-up
    val capped = Similarity.knnGraphFor(degen, maxBucket = n - 1, pairStream = n - 1)
    assert(capped.collect().isEmpty, "hot buckets must drop, not explode")
    // cap above the bucket size, pairStream forcing the STREAMED tier:
    // full graph, exactly k dense-ranked rows per vector
    val streamed = Similarity.knnGraphFor(degen, maxBucket = 10 * n, pairStream = 4)
      .select("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(streamed.length == n * 3, "k rows per vector under the streamed tier")
    streamed.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.sameElements(1L to 3L), s"vector $q ranks not dense")
    }
    // in-array tier (defaults) agrees with the streamed tier pair-for-pair
    // on neighbor SETS (per-rank ids may differ on all-tied cosines)
    val inArray = Similarity.knnGraphFor(degen)
      .select("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(inArray.sorted.sameElements(streamed.sorted))
  }

  test("d11 2-probe cells co-locate >= 72% of true near-dup pairs at sf0.01") {
    // pins the 2-probe lift (43 of the 59 >= 0.4-cosine pairs share a
    // probe cell on the adversarial near-uniform sf0.01 vectors, vs 24
    // under single-cell assignment) so a centroid/probe retune can't
    // silently regress recall; the residual probe-disjoint pairs are
    // SemDeDup's documented trade, d05 being the cross-cell-complete
    // path
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val truth = (for {
      i <- emb.indices.iterator
      j <- (i + 1) until emb.length
      if cos(emb(i)._2, emb(j)._2) >= Similarity.SemBar
    } yield (emb(i)._1, emb(j)._1)).toSeq
    assert(truth.nonEmpty, "no true near-dup pairs at sf0.01?")
    val probes = Similarity.semAssigned(spark, dir)
      .select(col("vec_id"), col("top.id").as("cells")).collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Long]]("cells").toSet)
      .toMap
    val co = truth.count { case (a, b) => (probes(a) & probes(b)).nonEmpty }
    val ratio = co.toDouble / truth.size
    assert(ratio >= 0.72,
      s"probe co-occurrence $co/${truth.size} = $ratio under the 0.72 floor")
  }

  test("d11 probe sweep: recall and candidate cost, probes 1 to 3") {
    // the operating-point table: co-occurrence (recall proxy) and
    // candidate-pair count (cost proxy) per probe setting, so a future
    // retune picks probes DELIBERATELY — on this corpus 2-probe buys
    // +19 pairs over 1-probe, 3-probe's extra candidates buy the tail
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val truth = (for {
      i <- emb.indices.iterator
      j <- (i + 1) until emb.length
      if cos(emb(i)._2, emb(j)._2) >= Similarity.SemBar
    } yield (emb(i)._1, emb(j)._1)).toSeq
    val sweep = (1 to 3).map { p =>
      val assigned = Similarity.semAssigned(spark, dir, p)
      val cells = assigned
        .select(col("vec_id"), col("top.id").as("cells")).collect()
        .map(r => r.getLong(0) ->
          r.getAs[scala.collection.Seq[Long]]("cells").toSet).toMap
      val co = truth.count { case (a, b) => (cells(a) & cells(b)).nonEmpty }
      val multi = assigned.select(col("vec_id"), explode(col("top.id")).as("cell"))
      val cand = multi.as("x")
        .join(multi.as("y"), col("x.cell") === col("y.cell") &&
          col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id"), col("y.vec_id")).distinct().count()
      info(f"probes=$p co-occur=$co/${truth.size} candidates=$cand")
      (p, co, cand)
    }
    // recall is monotone in probes, and so is the candidate cost —
    // the sweep's whole point is that the trade is real in both axes
    sweep.sliding(2).foreach {
      case Seq(a, b) =>
        assert(a._2 <= b._2, s"co-occurrence regressed: $a -> $b")
        assert(a._3 <= b._3, s"candidate count shrank: $a -> $b")
      case _ => ()
    }
    // the shipped operating point (SemProbes = 2) holds the 0.72
    // floor; single-probe demonstrably does NOT on this corpus — the
    // documented reason d11 pays the 2-probe candidate multiplier
    assert(sweep(1)._2.toDouble / truth.size >= 0.72)
    assert(sweep(0)._2.toDouble / truth.size < 0.72,
      "single-probe now meets the floor — revisit the SemProbes choice")
  }

  test("s09 MMR skips the near-duplicate a plain top-k would take") {
    import spark.implicits._
    // hand-built geometry: query q = id 0 (the min id). Candidate a
    // (id 1) is most relevant; b (id 2) is a NEAR-COPY of a with the
    // second-best relevance; c (id 3) is decently relevant but nearly
    // orthogonal to a. Plain top-2 by cosine = (a, b); MMR's second
    // pick must be c: score(b) = 7·rel(b) − 3·sim(a,b) ≈ 5.5 − 3.0
    // loses to score(c) ≈ 4.9 − 0.4. Ids 4-6 are low-relevance
    // filler so the pool covers MmrK selections.
    val vecs = Seq(
      0L -> Array(1f, 0f, 0f, 0f),
      1L -> Array(0.8f, 0.6f, 0f, 0f),
      2L -> Array(0.79f, 0.6f, 0.1f, 0f),
      3L -> Array(0.7f, -0.714f, 0f, 0f),
      4L -> Array(0.2f, 0f, 0.98f, 0f),
      5L -> Array(0.1f, 0f, 0f, 0.99f),
      6L -> Array(0f, 0.3f, 0.3f, 0.9f))
    val emb = vecs.toDF("vec_id", "embedding")
    val got = Similarity.mmrSelectFrom(emb).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 1L, s"step 1 must take the most relevant: $got")
    assert(got(2L) == 3L,
      s"step 2 must take the diverse candidate over the near-copy: $got")
    assert(got.values.toSet.size == Similarity.MmrK, "selections must be distinct")
    assert(got.values.toSet.contains(2L),
      "the near-copy should still surface once diversity is established")
    // determinism: integer ticks + id tie-breaks — a second run is
    // bit-identical
    val again = Similarity.mmrSelectFrom(emb).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == got)
  }

  test("d20 soft dedup: weights and draws recompute exactly; singletons always kept") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val d07 = Dedup.d07DedupClusters(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rows = Dedup.d20SoftDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(rows.nonEmpty && rows.length == d07.size)
    rows.foreach { case (doc, cid, size, w, kept) =>
      assert((cid, size) == d07(doc), s"doc $doc disagrees with d07")
      assert(w == 1048576L / size, s"doc $doc weight")
      val bucket = java.lang.Long.parseLong(md5hex(s"softdedup:$doc").take(5), 16)
      assert(kept == (bucket < w), s"doc $doc draw")
      if (size == 1) assert(kept, s"singleton $doc must always be kept")
    }
    // soft dedup reduces a multi-copy cluster toward one-copy mass
    val multi = rows.filter(_._3 > 1)
    if (multi.nonEmpty)
      assert(multi.count(_._5) < multi.length,
        "some duplicate-cluster members must be sampled out")
  }

  test("s10 int8 grid maps extremes exactly and bounds per-dim error") {
    import spark.implicits._
    // per-row grid: dims [0,10], [-1,1], and a DEGENERATE [5,5]
    val mins = Array(0.0, -1.0, 5.0)
    val maxs = Array(10.0, 1.0, 5.0)
    val df = Seq(
      (Array(0f, -1f, 5f), mins, maxs),     // all-min corners
      (Array(10f, 1f, 5f), mins, maxs),     // all-max corners
      (Array(3.3f, 0.1f, 5f), mins, maxs))  // interior point
      .toDF("embedding", "mins", "maxs")
    val got = df.select(expr(Similarity.int8DequantizeSql).as("dq"))
      .collect().map(_.getSeq[Float](0).toArray)
    // grid endpoints are representable exactly (code 0 → min,
    // code 255 → min + 255·step = max); degenerate dims pin to min
    assert(got(0).toSeq == Seq(0f, -1f, 5f))
    assert(got(1).toSeq == Seq(10f, 1f, 5f))
    // interior error is at most half a grid step per dimension
    val x = Array(3.3, 0.1, 5.0)
    got(2).zipWithIndex.foreach { case (dq, i) =>
      val halfStep = (maxs(i) - mins(i)) / 255.0 / 2.0
      assert(math.abs(dq - x(i)) <= halfStep + 1e-6,
        s"dim $i: dq=$dq x=${x(i)} exceeds half-step $halfStep")
    }
  }

  test("s12 index stats: mass conserves and occupancy sits near design point") {
    val n = Tables.embeddings(spark, sfDir).count()
    val rows = Similarity.s12AnnIndexStats(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (sz, nb, nv) => assert(nv == sz * nb) }
    // every vector appears exactly once per band
    assert(rows.map(_._3).sum == Similarity.AnnBands * n,
      "histogram mass must equal bands x corpus size")
    // occupancy within a sane multiple of the derived design point
    val bits = Similarity.annBitsFor(n)
    val expected = n.toDouble / (1L << bits)
    val meanOcc = rows.map(_._3).sum.toDouble /
      rows.map(_._2).sum.toDouble
    assert(meanOcc <= 16 * math.max(expected, 1.0),
      s"mean occupancy $meanOcc far above design point $expected")
  }

  test("s11 quantized-prefilter rerank reproduces the exact s01 result") {
    // the two-stage claim: a 50-candidate quantized pool + exact
    // rerank must return BIT-IDENTICAL rows to brute force — exact
    // cosines, same neighbors, same ranks
    val exact = Similarity.s01AnnBruteforce(spark, sfDir).collect().map(_.toSeq).toSeq
    val rerank = Similarity.s11AnnRerank(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(exact.nonEmpty && rerank == exact)
  }

  test("SQ8 codes-column production path: bit-exact round trip, identical rerank, ~4x smaller") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sq8").toString
    Similarity.writeInt8Codes(spark, sfDir, dir)
    // 1. dequantized vectors read from the persisted codes are
    //    BIT-IDENTICAL to the in-flight quantize-dequantize path
    def vecs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toList).toMap
    val mem = vecs(Similarity.int8Dequantized(spark, sfDir))
    val disk = vecs(Similarity.int8DequantizedFromCodes(spark, dir))
    assert(mem.nonEmpty && disk == mem)
    // 2. the two-stage rerank run FROM the codes table returns the
    //    same rows as the in-memory s11 (which is itself spec'd
    //    bit-identical to s01 brute force)
    val fromCodes = Similarity.s11RerankFromCodes(spark, sfDir, dir)
      .collect().map(_.toSeq).toSeq
    val inMem = Similarity.s11AnnRerank(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(fromCodes == inMem)
    // 3. the footprint claim: codes table (vec_id + 64 B code) is
    //    ~¼ of the float32 embeddings parquet
    def parquetBytes(p: String): Long = {
      val f = new java.io.File(p)
      if (f.isFile) f.length
      else f.listFiles.filter(_.getName.endsWith(".parquet")).map(_.length).sum
    }
    val codesB = parquetBytes(s"$dir/codes")
    val embB = parquetBytes(s"$sfDir/embeddings.parquet")
    assert(codesB > 0 && codesB <= embB * 2 / 5,
      s"codes $codesB bytes not ~4x smaller than embeddings $embB bytes")
  }

  test("minhash banding planner derives the shipped splits from their thresholds") {
    // the shipped constants are computed decisions: d02's 0.7 bar and
    // d04's 0.5 bar reproduce the 16x8 / 32x4 splits exactly
    assert(Dedup.minhashBandingFor(0.7) == ((16, 8)))
    assert(Dedup.minhashBandingFor(0.5) == ((32, 4)))
    // midpoints track the target across the range
    val (b1, r1) = Dedup.minhashBandingFor(0.9)
    assert(math.pow(1.0 / b1, 1.0 / r1) > 0.8)
    val (b2, _) = Dedup.minhashBandingFor(0.1)
    assert(b2 >= 64)
  }

  test("d21 planner-tuned dedup equals brute-force truth at its bar") {
    // the operator's runtime-derived banding must lose nothing against
    // the exhaustive 3-gram Jaccard pair set at the 0.35 bar
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def shingles(t: String): Set[String] = {
      val toks = t.split("[ \n\t\r]+").filter(_.nonEmpty)
      toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }
    val sh = docs.map { case (id, t) => id -> shingles(t) }.toMap
    val ids = docs.map(_._1).sorted
    val expect = (for {
      i <- ids.indices; jj <- (i + 1) until ids.length
      a = ids(i); b = ids(jj)
      sa = sh(a); sb = sh(b)
      jac = if (sa.isEmpty && sb.isEmpty) 1.0
        else if (sa.isEmpty || sb.isEmpty) 0.0
        else (sa & sb).size.toDouble / (sa | sb).size
      if jac >= Dedup.TunedBar
    } yield (a, b)).toSeq
    val got = Dedup.d21DedupTuned(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect, s"got $got\nexpect $expect")
    // planner columns carry the derived split
    val head = Dedup.d21DedupTuned(spark, sfDir).head()
    assert((head.getLong(3), head.getLong(4)) == ((32L, 4L)))
  }

  test("s14 PQ: ADC equals exact cosine when codes are lossless, corpus path deterministic") {
    import spark.implicits._
    // 8 distinct deterministic 64-d vectors (ids 0..7): the md5 seed
    // sample takes all 8, each becomes its own codebook entry per
    // subspace, and PQ reconstruction is lossless up to the 1/1024
    // fixed-point grid — so ADC must reproduce exact cosine ranking
    def vec(p: Long): Array[Float] = Array.tabulate(64) { j =>
      (((Kernels.mix64(p * 64 + j) >>> 11).toDouble / (1L << 52).toDouble)
        * 2.0 - 1.0).toFloat
    }
    val emb = (0L until 8L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val got = Similarity.s14From(spark, emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.length == 5 * 7, "5 queries x 7 neighbors")
    got.groupBy(_._1).foreach { case (q, rows) =>
      val exact = (0L until 8L).filter(_ != q)
        .map(n => n -> cos(vec(q), vec(n))).sortBy(-_._2)
      // ranking matches exact cosine; scores within the fixed-point
      // reconstruction tolerance
      assert(rows.sortBy(_._4).map(_._2).toSeq == exact.map(_._1),
        s"query $q: ADC ranking diverged from exact cosine")
      rows.foreach { case (_, n, adc, _) =>
        val ex = exact.find(_._1 == n).get._2
        assert(math.abs(adc - ex) <= 2e-3, s"query $q nbr $n: adc $adc vs exact $ex")
      }
    }
    // corpus path: codebook shape, complete in-range codes, determinism
    val cb = Similarity.pqCodebook(spark, sfDir).collect()
      .map(r => ((r.getAs[Number](0).intValue, r.getAs[Number](1).longValue),
        r.getSeq[Float](2)))
    assert(cb.length == Similarity.PqM * Similarity.PqK)
    assert(cb.map(_._1).toSet ==
      (for (m <- 0 until Similarity.PqM; c <- 0 until Similarity.PqK)
        yield (m, c.toLong)).toSet)
    assert(cb.forall(_._2.length == Similarity.PqSubDim))
    val a = Similarity.s14PqAnn(spark, sfDir).collect().map(_.toSeq).toSeq
    val b = Similarity.s14PqAnn(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(a.nonEmpty && a == b)
    assert(a.forall(r => math.abs(r(2).asInstanceOf[Double]) <= 1.001),
      "ADC is a cosine of a reconstruction - must stay in [-1, 1]")
  }

  test("s10 int8 quantized search keeps high recall of the exact top-10") {
    def sets(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = sets(Similarity.s01AnnBruteforce(spark, sfDir))
    val quant = sets(Similarity.s10AnnInt8(spark, sfDir))
    assert(exact.keySet == quant.keySet && exact.nonEmpty)
    // the SQ8 accuracy floor: ≥8 of the exact 10 survive quantization
    exact.foreach { case (q, ids) =>
      val overlap = (ids & quant(q)).size
      assert(overlap >= 8, s"query $q: recall $overlap/10 below the SQ8 floor")
    }
  }

  test("derived bits keep expected occupancy bounded as the corpus grows") {
    // the scale contract: expected band-bucket occupancy n/2^bits must
    // stay <= AnnTargetBucket at EVERY corpus size — the fixed 3-bit
    // banding held it only below 8k vectors, past which the MaxBucket
    // cap dropped every bucket and recall collapsed to 0
    var n = 1000L
    var prev = Similarity.AnnBits
    while (n <= 1000L * 1000 * 1000 * 1000) {
      val bits = Similarity.annBitsFor(n)
      assert(bits >= Similarity.AnnBits, s"n=$n: bits $bits under the floor")
      val occupancy = n.toDouble / math.pow(2.0, bits.toDouble)
      assert(occupancy <= Similarity.AnnTargetBucket.toDouble,
        s"n=$n bits=$bits: expected occupancy $occupancy over target")
      assert(bits >= prev, s"n=$n: bits must grow monotonically with n")
      prev = bits
      n *= 10
    }
    // and the derivation never over-shoots into uselessly-empty buckets:
    // one fewer bit would break the bound (tightness, above the floor)
    Seq(100000L, 10000000L, 1000000000L).foreach { m =>
      val bits = Similarity.annBitsFor(m)
      assert(m.toDouble / math.pow(2.0, (bits - 1).toDouble) >
        Similarity.AnnTargetBucket.toDouble,
        s"n=$m: bits $bits is one more than the bound needs")
    }
    // power-of-two boundaries, exactly: floating ceil(ln(x)/ln 2)
    // computed 29.000000000000004 at n = 1024*2^29 and over-banded by
    // one bit vs the oracle — the integer form must not
    assert(Similarity.annBitsFor(1024L << 29) == 29)
    assert(Similarity.annBitsFor((1024L << 29) + 1) == 30)
    assert(Similarity.annBitsFor(1024L * 8) == 3)
    assert(Similarity.annBitsFor(1024L * 8 + 1) == 4)
  }

  test("hyperplane_bands unpacks exactly the packed hyperplane_sig bands") {
    import spark.implicits._
    // same plane family by construction: for bands*bits <= 64 the
    // array form must equal the shifted/masked packed form bit-for-bit
    // (the array form exists so bands*bits may EXCEED 64 at scale)
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).limit(50)
    graft.functions.registerAll(spark)
    val both = emb.select(col("vec_id"),
        call_function("hyperplane_bands", col("embedding"),
          lit(Similarity.AnnBands), lit(Similarity.AnnBits), lit(Similarity.AnnSeed)).as("bv"),
        call_function("hyperplane_sig", col("embedding"),
          lit(Similarity.AnnBands * Similarity.AnnBits), lit(Similarity.AnnSeed)).as("sig"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val bv = r.getSeq[Long](1)
      val sig = r.getLong(2)
      assert(bv.length == Similarity.AnnBands)
      bv.zipWithIndex.foreach { case (v, b) =>
        val expected = (sig >> (b * Similarity.AnnBits)) &
          ((1L << Similarity.AnnBits) - 1)
        assert(v == expected, s"vec ${r.getLong(0)} band $b: $v != $expected")
      }
    }
  }

  test("d19 span profile flags cross-doc repeated windows, not within-doc or unique text") {
    import spark.implicits._
    val boiler = "this content is provided as is without warranty of any kind"  // 11 tokens
    val docs = Seq(
      (1L, s"alpha beta gamma delta $boiler"),
      (2L, s"$boiler epsilon zeta eta theta iota"),
      (3L, "one two three four five six seven eight nine ten eleven twelve"),
      (4L, "short doc"), // under the 8-token window: zero windows
      // within-doc repetition only: its repeated window must NOT flag
      // (the cross-doc test is count(DISTINCT doc) >= 2)
      (5L, "p q r s t u v w x p q r s t u v w x")
    ).toDF("doc_id", "text")
    val rows = Dedup.spanProfileFor(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // docs 1+2 share the 11-token boilerplate: 11-8+1 = 4 shared
    // windows each; doc 1 has 15 tokens -> 8 windows
    assert(rows(1L) == ((8L, 4L, 0.5)), s"doc1: ${rows(1L)}")
    assert(rows(2L)._2 == 4L && rows(2L)._1 == 9L, s"doc2: ${rows(2L)}")
    assert(rows(3L) == ((5L, 0L, 0.0)), "unique text must not flag")
    assert(rows(4L) == ((0L, 0L, 0.0)), "sub-window doc: zero windows, zero fraction")
    assert(rows(5L)._2 == 0L, "within-doc repetition must not flag")
  }

  test("d12 bloom contamination equals d06 and actually plans the bloom") {
    val d06 = Dedup.d06Contamination(spark, sfDir).collect().toSeq
    val d12df = Dedup.d12ContaminationBloom(spark, sfDir)
    val d12 = d12df.collect().toSeq
    assert(d12 == d06, "bloom prefilter must not change the result")
    // the prefilter is really in the plan: a codegen'd might_contain
    // over the corpus shingle stream, not a no-op
    val hasBloom = d12df.queryExecution.executedPlan.toString
      .contains("might_contain")
    assert(hasBloom, "executed plan must contain the bloom prefilter")
  }

  test("s17 pca recovers a planted two-component spectrum exactly") {
    import spark.implicits._
    // 8 vectors with variance ONLY along u = (e0+e1) and w = (e2-e3):
    // alpha in {±2, ±1} on u, beta = ±0.25 on w, sums and the cross
    // moment all zero by construction — the covariance is exactly
    // block-diagonal, so the integer power iteration must land on the
    // planted axes with zero off-axis loadings and deflate to the
    // zero matrix (components 2 and 3 empty).
    val alphas = Seq(2f, -2f, 1f, -1f, 2f, -2f, 1f, -1f)
    val betas = Seq(.25f, .25f, -.25f, -.25f, .25f, .25f, -.25f, -.25f)
    val rows = alphas.zip(betas).zipWithIndex.map { case ((a, b), k) =>
      val v = Array.fill(64)(0f)
      v(0) = a; v(1) = a; v(2) = b; v(3) = -b
      (k.toLong, v.toSeq, 0)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-pca").toString
    rows.toDF("vec_id", "embedding", "label")
      .selectExpr("vec_id", "CAST(embedding AS array<float>) AS embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Similarity.s17Pca(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == Similarity.PcaComponents * 64)
    val byComp = out.groupBy(_._1)
    // component 0: the u axis, equal ±4096 on dims 0/1, eigenvalue
    // 2^21 ticks (hand-computed from the exact integer chain)
    val c0 = byComp(0L).map(t => t._2 -> t._3).toMap
    assert(c0(0L) == 4096L && c0(1L) == 4096L)
    assert((2L until 64L).forall(c0(_) == 0L), "no off-axis loading on c0")
    assert(byComp(0L).head._4 == 2097152L)
    // component 1: the w axis with the sign split, eigenvalue 52428
    val c1 = byComp(1L).map(t => t._2 -> t._3).toMap
    assert(c1(2L) == 4096L && c1(3L) == -4096L)
    assert((Seq(0L, 1L) ++ (4L until 64L)).forall(c1(_) == 0L))
    assert(byComp(1L).head._4 == 52428L)
    // deflation is exact: nothing left for components 2 and 3
    for (c <- 2L until Similarity.PcaComponents.toLong) {
      assert(byComp(c).forall(_._3 == 0L), s"component $c must be empty")
      assert(byComp(c).head._4 == 0L)
    }
    // corpus run: deterministic; the embedding cloud is near-isotropic
    // (unit vectors, no planted structure), so fixed-round power
    // iteration can't ORDER the flat spectrum — assert the PSD
    // invariant (all Rayleigh ticks positive) instead
    val a = Similarity.s17Pca(spark, sfDir).collect().toSeq
    assert(a == Similarity.s17Pca(spark, sfDir).collect().toSeq)
    val eig = a.groupBy(_.getLong(0)).map { case (c, rs) => c -> rs.head.getLong(3) }
    assert(eig.values.forall(_ > 0L), s"PSD spectrum must be positive: $eig")
  }

  test("s19 correlation matrix: exact poles on planted dims, symmetric, bounded") {
    import spark.implicits._
    // dims 0≡1 (corr exactly +1), dim 2 ≡ −dim 3 (exactly −1),
    // cross-block moments exactly 0 — the s17 planted geometry
    val alphas = Seq(2f, -2f, 1f, -1f, 2f, -2f, 1f, -1f)
    val betas = Seq(.25f, .25f, -.25f, -.25f, .25f, .25f, -.25f, -.25f)
    val rows = alphas.zip(betas).zipWithIndex.map { case ((a, b), k) =>
      val v = Array.fill(64)(0f)
      v(0) = a; v(1) = a; v(2) = b; v(3) = -b
      (k.toLong, v.toSeq, 0)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-corr").toString
    rows.toDF("vec_id", "embedding", "label")
      .selectExpr("vec_id", "CAST(embedding AS array<float>) AS embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val m = Similarity.s19CorrMatrix(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m.size == 64 * 64)
    assert(m((0L, 1L)) == 1048576L && m((1L, 0L)) == 1048576L)
    assert(m((2L, 3L)) == -1048576L)
    assert(m((0L, 2L)) == 0L && m((0L, 3L)) == 0L)
    // zero-variance dims (4..63) emit 0 by the shared guard
    assert(m((10L, 20L)) == 0L && m((10L, 10L)) == 0L)
    // corpus: diagonal exactly 1, symmetric, Cauchy-Schwarz bounded
    val c = Similarity.s19CorrMatrix(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (i <- 0L until 64L) assert(c((i, i)) == 1048576L)
    assert(c.forall { case ((i, j), v) => c((j, i)) == v }, "symmetry")
    assert(c.values.forall(v => math.abs(v) <= 1048577L), "bounded")
  }

  test("s18 projected ANN ranks exactly like the full dot on an in-span corpus") {
    import spark.implicits._
    // 16 vectors strictly inside the planted 2-plane span{e0+e1,
    // e2-e3} with unequal axis variances — the s17 spec geometry, so
    // the loadings land EXACTLY on the axes with equal norms, and the
    // 4-tick projection preserves dot products up to a positive
    // scale: s18's ranking must equal the full 64-dim dot ranking.
    val alphas = Seq(2f, -2f, 1f, -1f, 1.5f, -1.5f, 0.5f, -0.5f)
    val pat = Seq(1f, 1f, -1f, -1f, 1f, 1f, -1f, -1f)
    val vecs = (alphas.zip(pat).map { case (a, p) => (a, 0.25f * p) } ++
      alphas.zip(pat).map { case (a, p) => (a, 0.5f * p) }).zipWithIndex
      .map { case ((a, b), k) =>
        val v = Array.fill(64)(0f)
        v(0) = a; v(1) = a; v(2) = b; v(3) = -b
        (k.toLong, v.toSeq, 0)
      }
    val dir = java.nio.file.Files.createTempDirectory("graft-pca-ann").toString
    vecs.toDF("vec_id", "embedding", "label")
      .selectExpr("vec_id", "CAST(embedding AS array<float>) AS embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // exact integer dot oracle over the quarter-grid ticks
    val ticks = vecs.map { case (k, v, _) =>
      k -> (math.round(v(0) * 1024).toLong, math.round(v(2) * 1024).toLong)
    }.toMap
    def dot(a: Long, b: Long) = {
      val (aa, ab) = ticks(a); val (ba, bb) = ticks(b)
      2L * (aa * ba + ab * bb)
    }
    val got = Similarity.s18PcaAnn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .groupBy(_._1).map { case (q, rs) =>
        q -> rs.sortBy(_._3).map(_._2).toSeq
      }
    assert(got.keySet == (0L until 5L).toSet)
    for (q <- 0L until 5L) {
      val expected = (0L until 16L).filter(_ != q)
        .sortBy(c => (-dot(q, c), c)).take(10)
      assert(got(q) == expected,
        s"query $q: projected ranking ${got(q)} != exact ${expected}")
    }
    // corpus run: structural + deterministic
    val a = Similarity.s18PcaAnn(spark, sfDir).collect()
    assert(a.length == 50 &&
      a.toSeq == Similarity.s18PcaAnn(spark, sfDir).collect().toSeq)
  }

  test("s02 LSH ANN recall@10 vs s01 brute force") {
    val exact = Similarity.s01AnnBruteforce(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.s02AnnLsh(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // 12 bands x 3 bits tuned for recall@10 >= 0.8 on 64-dim embeddings
    assert(recall >= 0.8, s"recall@10 $recall too low")
  }

  test("s22 tfidf search: identical text scores exactly 1.0; structure holds") {
    val sess = spark
    import sess.implicits._
    // doc 5 duplicates query doc 0's text exactly → cosine exactly
    // 1.0 (dot == both norms, integer-exact) → 2^20 ticks, rank 1
    val docs = Seq(
      (0L, "alpha beta gamma", "en", "s", 16L),
      (1L, "delta epsilon", "en", "s", 13L),
      (2L, "zeta eta theta", "en", "s", 14L),
      (3L, "iota kappa", "en", "s", 10L),
      (4L, "alpha beta", "en", "s", 10L),
      (5L, "alpha beta gamma", "en", "s", 16L))
    val tmp = java.nio.file.Files.createTempDirectory("graft_s22").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Similarity.s22TfidfSearch(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val q0 = out.filter(_._1 == 0L).sortBy(_._4)
    assert(q0.head._2 == 5L && q0.head._3 == 1048576L,
      s"identical doc must rank 1 at exactly 2^20 ticks: ${q0.head}")
    // no self matches anywhere; ranks dense from 1; scores non-increasing
    assert(out.forall(r => r._1 != r._2))
    out.groupBy(_._1).values.foreach { rs =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.map(_._3).sliding(2).forall(p =>
        p.length < 2 || p.head >= p.last))
    }
    // corpus: 3 queries x top-5, deterministic
    val c = Similarity.s22TfidfSearch(spark, sfDir).collect()
    assert(c.length == 15)
    assert(c.toSeq == Similarity.s22TfidfSearch(spark, sfDir).collect().toSeq)
  }

  test("s21 bisecting kmeans: tree structure, duplicates co-locate, cohesion beats one flat split") {
    val rows = Similarity.s21BisectingKmeans(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = Tables.embeddings(spark, sfDir).count()
    // partition: every vector exactly once; sizes consistent
    assert(rows.length == n && rows.map(_._1).distinct.length == rows.length)
    rows.groupBy(_._2).foreach { case (c, ms) =>
      assert(ms.forall(_._3 == ms.length), s"cluster $c size mismatch") }
    // tree numbering: leaves are valid binary-tree ids (child of c is
    // 2c+1 or 2c+2 from root 0), none an ancestor of another, and at
    // most splits+1 leaves exist
    val leaves = rows.map(_._2).distinct.toSet
    def ancestors(c: Long): Set[Long] =
      if (c == 0L) Set.empty else ancestors((c - 1) / 2) + ((c - 1) / 2)
    leaves.foreach { c =>
      assert(c >= 0 && ancestors(c).forall(a => !leaves(a)),
        s"leaf $c has an ancestor leaf") }
    assert(leaves.size <= Similarity.BisectSplits + 1)
    // identical vectors must land in the same leaf (assignment is a
    // pure function of the vector): plant exact duplicates
    val sess = spark
    import sess.implicits._
    val dup = Array.fill(64)(0.5f)
    val planted = (0L to 8L).map { i =>
      val v = if (i < 3) dup
        else Array.tabulate(64)(j => if (j == i % 64) 1.0f else 0.01f * i)
      (i, v.toSeq, 0)
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_bisect").toString
    planted.toDF("vec_id", "embedding", "label")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<FLOAT>) AS embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val p = Similarity.s21BisectingKmeans(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(p(0L), p(1L), p(2L)).size == 1,
      s"exact duplicates split across leaves: ${p.view.filterKeys(_ < 3).toMap}")
    // determinism across runs
    assert(rows.toSeq ==
      Similarity.s21BisectingKmeans(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("s23: silhouette partition matches s04, ticks bounded, counts add up") {
    import graft.operators.Similarity
    val sil = Similarity.s23Silhouette(spark, sfDir).collect()
    assert(sil.nonEmpty)
    val s04 = Similarity.s04Kmeans(spark, sfDir).collect()
    // the evaluated partition IS the s04 partition: same cells, same sizes
    val sizes04 = s04.groupBy(_.getLong(1)).map { case (c, rs) => c -> rs.length.toLong }
    assert(sil.map(r => r.getLong(0) -> r.getLong(1)).toMap == sizes04)
    assert(sil.map(_.getLong(1)).sum == s04.length.toLong)
    // coefficient contract: per-cell mean in [0, 2^20] ticks, and the
    // truncating-div mean consistent with the exact sum
    sil.foreach { r =>
      val (n, sum, mean) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(mean >= 0L && mean <= 1048576L)
      assert(mean == sum / n)
      assert(sum <= 1048576L * n)
    }
    // deterministic across runs
    assert(sil.toSeq == Similarity.s23Silhouette(spark, sfDir).collect().toSeq)
  }

  test("s30 exact silhouette: planted geometry — matches brute-force " +
    "pairwise where the simplified form provably does not; tick-exact " +
    "vs an independent in-test replication") {
    val sess = spark
    import sess.implicits._
    // Two clusters in orthogonal 2-D subspaces of R^4. Every vector is
    // unit norm; cross-cluster cosines are exactly 0, so pairwise
    // silhouettes are hand-computable: cluster 0 = {e1, (.8,.6),
    // (.8,-.6)} has within-cosines {.8, .8, .28}; cluster 1 =
    // {e3, (.6,.8) in dims 3-4} has within-cosine .6.
    val planted: Seq[(Long, Long, Array[Float])] = Seq(
      (0L, 0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, 0L, Array(0.8f, 0.6f, 0.0f, 0.0f)),
      (2L, 0L, Array(0.8f, -0.6f, 0.0f, 0.0f)),
      (3L, 1L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (4L, 1L, Array(0.0f, 0.0f, 0.6f, 0.8f)))
    val cells = planted.toDF("vec_id", "cell", "embedding")
      .selectExpr("vec_id", "cell", "CAST(embedding AS ARRAY<FLOAT>) AS embedding")
    val got = Similarity.exactCosineSilhouette(spark, cells).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    // (1) independent replication of the tick algorithm — bit-exact
    val vecs = planted.map { case (id, c, v) => (id, c, v) }
    def qticks(v: Array[Float]): Array[Long] = {
      var ss = 0.0
      for (x <- v) ss += x.toDouble * x.toDouble
      val nv = math.sqrt(ss)
      v.map(x => math.floor(x.toDouble / nv * 1024.0 + 0.5).toLong)
    }
    val qs = vecs.map { case (id, c, v) => (id, c, qticks(v)) }
    val byCell = qs.groupBy(_._2)
    val omega = byCell.map { case (c, rs) =>
      c -> rs.map(_._3).transpose.map(_.sum).toArray }
    val nOf = byCell.map { case (c, rs) => c -> rs.size.toLong }
    val s2 = 1048576L
    val stByCell = qs.map { case (id, c, q) =>
      def p(g: Long): Long = q.zip(omega(g)).map { case (u, v) => u * v }.sum
      val n = nOf(c)
      val a = if (n == 1) 0.0
        else (s2 * n - p(c)).toDouble / (s2 * (n - 1)).toDouble
      val b = omega.keys.filter(_ != c)
        .map(g => (s2 * nOf(g) - p(g)).toDouble / (s2 * nOf(g)).toDouble).min
      val s = if (a < b && b > 0) 1.0 - a / b
        else if (a > b && a > 0) b / a - 1.0 else 0.0
      c -> math.floor(s * 1048576.0 + 0.5).toLong
    }
    stByCell.groupBy(_._1).foreach { case (c, sts) =>
      val (n, sum, mean) = got(c)
      assert(n == sts.size.toLong)
      assert(sum == sts.map(_._2).sum,
        s"cell $c: operator ticks $sum != replication ${sts.map(_._2).sum}")
      assert(mean == sum / n)
    }

    // (2) brute-force PAIRWISE silhouette in doubles (no quantization)
    val fv = vecs.map { case (id, c, v) => (id, c, v) }
    def pairS(i: (Long, Long, Array[Float])): Double = {
      val own = fv.filter(o => o._2 == i._2 && o._1 != i._1)
      val a = if (own.isEmpty) 0.0
        else own.map(o => 1.0 - cos(i._3, o._3)).sum / own.size
      val b = fv.filter(_._2 != i._2).groupBy(_._2).values
        .map(g => g.map(o => 1.0 - cos(i._3, o._3)).sum / g.size).min
      if (a < b) 1.0 - a / b else if (a > b) b / a - 1.0 else 0.0
    }
    val pairMean = fv.groupBy(_._2).map { case (c, rs) =>
      c -> rs.map(pairS).sum / rs.size }
    // hand values: cluster 0 -> (0.8 + 0.54 + 0.54)/3, cluster 1 -> 0.6
    assert(math.abs(pairMean(0L) - (0.8 + 0.54 + 0.54) / 3) < 1e-6)
    assert(math.abs(pairMean(1L) - 0.6) < 1e-6)
    // the operator's mean ticks match pairwise within the 2^-10
    // quantization margin...
    pairMean.foreach { case (c, pm) =>
      val opMean = got(c)._2.toDouble / got(c)._1 / 1048576.0
      assert(math.abs(opMean - pm) < 0.02,
        s"cell $c: exact-form $opMean vs pairwise $pm")
    }

    // (3) ...while the SIMPLIFIED (centroid) form is off by > 0.1 on
    // the same plant — the load-bearing difference that makes s30 the
    // evaluator-faithful key and s23 only a screen.
    val cent = fv.groupBy(_._2).map { case (c, rs) =>
      c -> Array.tabulate(4)(j => (rs.map(_._3(j).toDouble).sum / rs.size).toFloat) }
    val simpMean = fv.groupBy(_._2).map { case (c, rs) =>
      c -> rs.map { v =>
        val cs1 = cos(v._3, cent(c))
        val cs2 = cent.keys.filter(_ != c).map(g => cos(v._3, cent(g))).max
        if (1.0 - cs2 > 0) (cs1 - cs2) / (1.0 - cs2) else 0.0
      }.sum / rs.size }
    simpMean.foreach { case (c, sm) =>
      assert(math.abs(sm - pairMean(c)) > 0.1,
        s"plant failed to separate simplified from exact in cell $c") }
  }

  test("s29 column similarity: planted poles exact; corpus triangle invariants") {
    val sess = spark
    import sess.implicits._
    // dim0 = x, dim1 = 2x (identical direction -> +1), dim2 = -x
    // (opposite -> -1), dim3 alternates sign orthogonally -> ~0
    val vecs = Seq(
      Array(0.5f, 1.0f, -0.5f, 0.5f), Array(0.25f, 0.5f, -0.25f, -0.25f),
      Array(0.5f, 1.0f, -0.5f, -0.5f), Array(0.25f, 0.5f, -0.25f, 0.25f))
      .toDF("embedding")
    val m = Similarity.colSimCore(vecs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m((0L, 1L)) == 1048576L, "parallel columns must give +1")
    assert(m((0L, 2L)) == -1048576L, "opposite columns must give -1")
    assert(m((0L, 3L)) == 0L, "orthogonal columns must give 0")
    (0 to 3).foreach(d => assert(m((d.toLong, d.toLong)) == 1048576L))
    // corpus: upper triangle only, diagonal +1, bounds, determinism
    val c = Similarity.s29ColSimilarity(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(c.length == 64 * 65 / 2)
    c.foreach { case (i, j, v) =>
      assert(i <= j, "upper triangle contract")
      assert(math.abs(v) <= 1048576L)
      if (i == j) assert(v == 1048576L)
    }
    assert(c.toSeq == Similarity.s29ColSimilarity(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("d22 minhash estimate: identical docs estimate exactly 1; " +
    "near-dup estimate equals an independent in-test signature " +
    "replication; corpus contract holds") {
    val sess = spark
    import sess.implicits._
    import graft.operators.Dedup
    val words = (1 to 12).map(i => s"w$i")
    val t45a = words.mkString(" ")
    val t45b = (words.init :+ "zz").mkString(" ")
    val docs = Seq(
      (1L, "a b c d e f g h i j", "en", "s", 10L),
      (2L, "a b c d e f g h i j", "en", "s", 10L),
      (4L, t45a, "en", "s", 10L),
      (5L, t45b, "en", "s", 10L))
    val tmp = java.nio.file.Files.createTempDirectory("graft_d22").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Dedup.d22MinhashEstimate(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    // identical pair: exact = est = 2^20, err = 0
    val id = got((1L, 2L))
    assert(id.getLong(2) == 1048576L && id.getLong(3) == 1048576L &&
      id.getLong(4) == 0L && id.getBoolean(5), s"identical pair: $id")
    // (4, 5): 9 of 11 distinct shingles shared -> jac = 9/11; the
    // estimate must equal an INDEPENDENT Scala replication of the
    // affine signature (md5 base, (2i+1)H + FNV*i mod 2^48, min, k
    // agreement) — the planted-truth check of the whole chain
    def shingles(t: String): Seq[String] = {
      val w = t.split(" ").toSeq
      w.sliding(3).map(_.mkString(" ")).toSeq.distinct
    }
    def sig(t: String): Array[Long] = {
      val hs = shingles(t).map { g =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
        java.lang.Long.parseLong(hex, 16)
      }
      Array.tabulate(Dedup.EstPerms) { i =>
        if (hs.isEmpty) i.toLong
        else hs.map(h => ((2L * i + 1L) * h + 1099511628211L * i)
          % 281474976710656L).min
      }
    }
    val exp45 = sig(t45a).zip(sig(t45b)).count { case (x, y) => x == y }
      .toLong * 1048576L / Dedup.EstPerms
    got.get((4L, 5L)) match {
      case Some(r) =>
        assert(r.getLong(2) ==
          math.floor(9.0 / 11.0 * 1048576.0 + 0.5).toLong, s"exact: $r")
        assert(r.getLong(3) == exp45,
          s"estimate must equal the in-test replication $exp45: $r")
      case None => fail("banding must emit the jac=9/11 candidate pair")
    }
    // corpus: every pair within the contract bound, deterministic
    val c = Dedup.d22MinhashEstimate(spark, sfDir).collect()
    assert(c.nonEmpty)
    c.foreach(r => assert(r.getBoolean(5), s"contract violated: $r"))
    assert(c.map(_.toSeq).toSeq ==
      Dedup.d22MinhashEstimate(spark, sfDir).collect().map(_.toSeq).toSeq)
  }

  test("s31 DIMSUM sampled: p = 1 collapses to the exact cosine " +
    "bit-for-bit; corpus contract booleans all hold") {
    val sess = spark
    import sess.implicits._
    // forced p = 1 (huge oversampling factor): every coin threshold
    // saturates at 2^24, the mask keeps everything, the 2^48/(t_i t_j)
    // reweight is exactly 1.0 — the estimator IS the exact cosine
    val vecs = Seq(
      (1L, Array(0.5f, 1.0f, -0.5f, 0.5f)),
      (2L, Array(0.25f, 0.5f, -0.25f, -0.25f)),
      (3L, Array(0.5f, 1.0f, -0.5f, -0.5f)),
      (4L, Array(0.25f, 0.5f, -0.25f, 0.25f)))
      .toDF("vec_id", "embedding")
    val full = Similarity.dimsumCore(vecs, 1e9).collect()
    assert(full.length == 4 * 3 / 2)
    full.foreach { r =>
      assert(r.getLong(4) == 0L && r.getLong(3) == r.getLong(2),
        s"p=1 estimate must equal exact: $r")
      assert(r.getBoolean(5))
      // planted poles survive through the sampled path: dims 0-1
      // identical direction -> +2^20, 0 vs 2 opposite -> -2^20
      if (r.getLong(0) == 0L && r.getLong(1) == 1L)
        assert(r.getLong(2) == 1048576L, s"parallel pole: $r")
      if (r.getLong(0) == 0L && r.getLong(1) == 2L)
        assert(r.getLong(2) == -1048576L, s"opposite pole: $r")
    }
    // corpus at the REAL factor: sampling is load-bearing (some pair
    // has nonzero error), every within_bound true, deterministic
    val c = Similarity.s31DimsumSampled(spark, sfDir).collect()
    assert(c.length == 64 * 63 / 2)
    assert(c.exists(_.getLong(4) > 0L),
      "sampling must actually drop mass (zero error everywhere = p saturated)")
    c.foreach { r =>
      assert(r.getBoolean(5), s"error contract violated: $r")
      assert(r.getLong(4) == math.abs(r.getLong(3) - r.getLong(2)))
    }
    assert(c.map(_.toSeq).toSeq ==
      Similarity.s31DimsumSampled(spark, sfDir).collect().map(_.toSeq).toSeq)
  }

  test("s27 GMM: planted duplicate clusters recovered exactly; corpus invariants") {
    val sess = spark
    import sess.implicits._
    // two planted point-mass clusters (exact duplicates): hard-EM
    // must put each mass in one component with the EXACT tick mean
    // and the variance saturating at the floor
    val a = Array.fill(4)(0.5f); val b = Array.fill(4)(-0.5f)
    val vecs = ((1L to 6L).map(i => (i, a)) ++ (7L to 12L).map(i => (i, b)))
      .toDF("vec_id", "embedding")
    val m = Similarity.gmmCore(vecs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val live = m.toSeq.filter(_._2._3 > 0L).groupBy(_._1._1)
    // every live component's mean is exactly one of the two planted
    // tick points and its variance sits at the floor
    live.foreach { case (_, dims) =>
      dims.foreach { case ((_, _), (mu, v, _)) =>
        assert(mu == 512L || mu == -512L, s"mean $mu off the planted points")
        assert(v == Similarity.GmmVarFloor, s"pure cell variance $v")
      }
    }
    // both masses are represented and the member counts add up
    assert(m.toSeq.filter(_._1._2 == 0L).map(_._2._3).sum == 12L,
      "members must partition the corpus")
    assert(live.exists(_._2.head._2._1 == 512L) &&
      live.exists(_._2.head._2._1 == -512L), s"both masses live: $live")
    // corpus: members partition, variances floored or above, determinism
    val c = Similarity.s27Gmm(spark, sfDir).collect()
    assert(c.map(r => (r.getLong(0), r.getLong(4))).distinct.map(_._2).sum ==
      Tables.embeddings(spark, sfDir).count())
    c.foreach(r => assert(r.getLong(3) >= Similarity.GmmVarFloor))
    assert(c.toSeq == Similarity.s27Gmm(spark, sfDir).collect().toSeq)
  }

  test("s35 soft GMM: planted overlap yields fractional posteriors that " +
    "normalize; an at-mean vector goes near-hard; full fit and corpus " +
    "contracts hold with round-0 members partitioning") {
    val sess = spark
    import sess.implicits._
    import org.apache.spark.sql.functions.col
    // planted MODEL (bypassing the fit): components 0/1 at ±512
    // ticks on all 4 dims with equal priors, components 2/3 parked
    // far away — a vector at the 0/1 midpoint must split ~50/50
    // (the posterior semantics s27's argmin cannot express), a
    // vector AT a mean must lean overwhelmingly to it
    val statsD = (0 until 4).flatMap { d =>
      Seq((0L, d.toLong, 512.0, 65536.0, 0.25),
        (1L, d.toLong, -512.0, 65536.0, 0.25),
        (2L, d.toLong, 8192.0, 65536.0, 0.25),
        (3L, d.toLong, -8192.0, 65536.0, 0.25))
    }.toDF("k", "d", "muD", "varD", "w")
    val probe = Seq(
      (1L, Array.fill(4)(0.0f)),   // midpoint of 0/1
      (2L, Array.fill(4)(0.5f)))   // exactly at component 0's mean
      .toDF("vec_id", "embedding")
    val scored = Similarity.softScore(Similarity.gmmTicks(probe),
        Similarity.softPivot(statsD))
      .select(col("vec_id"), col("r0"), col("r1"), col("r2"), col("r3"),
        col("norm_ok"), col("llv"))
      .collect().map(r => r.getLong(0) ->
        (Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)),
          r.getBoolean(5), r.getDouble(6))).toMap
    val (rMid, okMid, llMid) = scored(1L)
    assert(math.abs(rMid(0) - 0.5) < 0.01 && math.abs(rMid(1) - 0.5) < 0.01,
      s"midpoint must split ~50/50: $rMid")
    assert(rMid(2) < 1e-6 && rMid(3) < 1e-6, s"parked components: $rMid")
    assert(okMid && !llMid.isNaN && !llMid.isInfinite)
    val (rAt, okAt, _) = scored(2L)
    assert(rAt(0) > 0.99, s"at-mean vector must go near-hard: $rAt")
    assert(okAt)
    // full soft fit on the planted two-mass corpus: every contract
    // boolean holds and round-0 members partition the corpus
    val a4 = Array.fill(4)(0.5f); val b4 = Array.fill(4)(-0.5f)
    val vecs = ((1L to 6L).map(i => (i, a4)) ++ (7L to 12L).map(i => (i, b4)))
      .toDF("vec_id", "embedding")
    val fit = Similarity.gmmSoftCore(vecs).collect()
    assert(fit.map(_.getLong(1)).sum == 12L, "round-0 members partition")
    fit.foreach(r => assert(r.getBoolean(4) && r.getBoolean(5) &&
      r.getBoolean(6) && r.getBoolean(7), s"contract booleans: $r"))
    // corpus: booleans hold, members partition, determinism
    val c = Similarity.s35GmmSoft(spark, sfDir).collect()
    assert(c.map(_.getLong(1)).sum ==
      Tables.embeddings(spark, sfDir).count())
    c.foreach(r => assert(r.getBoolean(4) && r.getBoolean(5) &&
      r.getBoolean(6) && r.getBoolean(7), s"corpus booleans: $r"))
    assert(c.map(_.toSeq).toSeq ==
      Similarity.s35GmmSoft(spark, sfDir).collect().map(_.toSeq).toSeq)
  }

  test("s26 Spearman: monotone/reversed/constant poles are exact; corpus invariants") {
    val sess = spark
    import sess.implicits._
    // dim0 = x; dim1 = a MONOTONE but non-linear transform of x
    // (Spearman's signature: rho = +1 where Pearson is < 1);
    // dim2 = reversed order; dim3 = constant
    val xs = Seq(0.1f, 0.2f, 0.4f, 0.5f, 0.8f)
    val vecs = xs.zipWithIndex.map { case (x, k) =>
      (k.toLong, Array(x, x * x * x, 1.0f - x, 0.25f))
    }.toDF("vec_id", "embedding")
    val rho = Similarity.spearmanCore(vecs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rho((0L, 1L)) == 1048576L, "monotone transform must give rho = +1")
    assert(rho((0L, 2L)) == -1048576L, "reversal must give rho = -1")
    assert(rho((0L, 3L)) == 0L && rho((3L, 3L)) == 0L,
      "constant dim must report 0 (zero variance)")
    assert(rho((0L, 0L)) == 1048576L)
    // corpus: diagonal +1, symmetry, bounds, determinism
    val c = Similarity.s26Spearman(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    (0 until 64).foreach(i => assert(c((i.toLong, i.toLong)) == 1048576L))
    c.foreach { case ((i, j), v) =>
      assert(math.abs(v) <= 1048576L)
      assert(c((j, i)) == v, s"asymmetry at ($i,$j)")
    }
    assert(Similarity.s26Spearman(spark, sfDir).collect().toSeq ==
      Similarity.s26Spearman(spark, sfDir).collect().toSeq)
  }

  test("s34 svd: exact sigma/loadings/projection on a planted rank-1 corpus; " +
    "isqrt is the exact integer sqrt") {
    import spark.implicits._
    // isqrt: exact against BigInt sqrt on squares, neighbors, and a
    // spread of magnitudes up to 2^52
    for (x <- Seq(0L, 1L, 2L, 3L, 4L, 8L, 15L, 16L, 17L, 1048575L, 1048576L,
      (1L << 40) - 1, 1L << 40, (1L << 52) - 3, 1L << 52, -5L)) {
      val got = Similarity.isqrt(x)
      val want =
        if (x <= 0) 0L
        else java.math.BigInteger.valueOf(x).sqrt().longValueExact()
      assert(got == want, s"isqrt($x) = $got, want $want")
      if (x > 0) assert(got * got <= x && (got + 1) * (got + 1) > x)
    }
    // rank-1 plant along e0: a in {±2, ±1} => q0 in {±2048, ±1024};
    // P00 = 10485760, rescale divisor 10, Gs00 = 2^20; the exact
    // integer chain gives lambda = 2^20, sigma = 2^10, and deflation
    // zeroes the matrix so components 1..3 are empty
    val rows = Seq(2f, -2f, 1f, -1f).zipWithIndex.map { case (a, k) =>
      val v = Array.fill(64)(0f); v(0) = a
      (k.toLong, v.toSeq, 0)
    }
    val out = Similarity.svdFor(
      rows.toDF("vec_id", "embedding", "label")
        .selectExpr("vec_id", "CAST(embedding AS array<float>) AS embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.length == Similarity.PcaComponents * 64)
    val byComp = out.groupBy(_._1)
    val c0 = byComp(0L).map(t => t._2 -> t._3).toMap
    assert(c0(0L) == 4096L, "right-singular vector is e0")
    assert((1L until 64L).forall(c0(_) == 0L), "no off-axis loading")
    assert(byComp(0L).head._4 == 1048576L, "lambda = 2^20 ticks")
    assert(byComp(0L).head._5 == 1024L, "sigma = isqrt(lambda) = 2^10")
    assert(byComp(0L).head._6 == 6144L,
      "proj_l1 = sum |q0| = 2048+2048+1024+1024")
    for (c <- 1L until Similarity.PcaComponents.toLong) {
      assert(byComp(c).forall(_._3 == 0L), s"component $c must be empty")
      assert(byComp(c).head._4 == 0L && byComp(c).head._5 == 0L &&
        byComp(c).head._6 == 0L)
    }
    // corpus run: deterministic, sigma consistent with its eigenvalue,
    // projections non-negative
    val a = Similarity.s34Svd(spark, sfDir).collect().toSeq
    assert(a == Similarity.s34Svd(spark, sfDir).collect().toSeq)
    a.foreach { r =>
      assert(r.getLong(4) == Similarity.isqrt(math.max(r.getLong(3), 0L)),
        s"sigma/eigval contract at ${r.getLong(0)}/${r.getLong(1)}")
      assert(r.getLong(5) >= 0L)
    }
  }
}
