package graft.operators

import graft.Ckpt._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.registerAll

/** Approximate-nearest-neighbor search over the embeddings table
  * (SURVEY §2). Query set: vec_id < 5 (deterministic).
  *
  * s01 is the exact baseline: broadcast the query block, scan the
  * corpus once, codegen'd cosine, per-query top-k — at 100 TB this is
  * the right brute-force shape (1 corpus scan, no shuffle of the
  * corpus). s02 is the scale path: hyperplane LSH buckets cut the
  * scanned fraction; recall is tunable via bands×bits.
  *
  * Top-k uses the bounded [[graft.functions.TopKByScore]] aggregate:
  * partial k-capped heaps per partition, so the per-query shuffle
  * carries ≤ k pairs per map partition — not every scored row into
  * one reducer task per query, which is what
  * `row_number().over(Window.partitionBy("query_id"))` would do.
  *
  * The reference's counterpart surface is MLlib's LSH transformer
  * family (reference: /root/reference/mllib/src/main/scala/org/
  * apache/spark/ml/feature/LSH.scala:1 and
  * BucketedRandomProjectionLSH.scala:1 — random-projection
  * signatures materialized as hash columns, candidates via
  * approxSimilarityJoin's explode-and-join). The s02/s05/s07 banding
  * re-expresses the same random-projection idea as codegen'd packed
  * band signatures with md5-derived weights, so the DuckDB oracle
  * can rebuild the exact same buckets — a transformer pipeline
  * can't be replicated SQL-side, a deterministic expression can.
  */
object Similarity {

  private val TopK = 10

  private def queriesBlock(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

  /** Scored (query_id, vec_id, cos_raw) rows → top-k per query with
    * rank, via the bounded aggregate.
    */
  private def topKPerQuery(scored: DataFrame, k: Int = TopK): DataFrame =
    scored
      .groupBy(col("query_id"))
      .agg(call_function("top_k_by_score", col("cos_raw"), col("vec_id"), lit(k)).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.id").as("neighbor_id"),
        round(col("t.score"), 4).as("cos"), (col("pos") + 1).cast("long").as("rank"))
      .orderBy(col("query_id"), col("rank"))

  /** s01: exact brute-force cosine top-k per query. */
  def s01AnnBruteforce(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark)
    val corpus = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    topKPerQuery(corpus.crossJoin(broadcast(queriesBlock(spark, sfDir)))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_raw", call_function("cosine_sim", col("qv"), col("embedding"))))
  }

  /** s02: LSH-bucketed ANN — candidates share ≥1 hyperplane band with
    * the query (12 bands × 3 bits of a 36-bit signature, tuned for
    * recall@10 ≥ 0.8 on 64-dim embeddings), then exact cosine +
    * per-query top-k over candidates only. Weights are md5-derived so
    * the DuckDB oracle replicates bucketing and ranking exactly.
    */
  private val NCentroids = 32
  private val NProbe = 8
  private val EmbDim = 64
  private val QuantScale = 1024.0

  /** One Lloyd iteration over broadcast seed centroids: assign every
    * corpus vector to its nearest seed (argmax cosine, ties to the
    * smaller cid), then replace each centroid with its cell MEAN;
    * empty cells keep their seed. Same plan shape as the final
    * assignment pass — one broadcast cross join + one partial-agg'd
    * reduce — and the 32-row result is `ckpt`ed so the two
    * downstream consumers don't re-run the corpus pass.
    *
    * The mean is computed in FIXED POINT: per-dimension sums of
    * `floor(x·1024 + 0.5)` as longs, divided by 1024·n at the end.
    * Long sums are exact and order-independent where float partial
    * sums are neither — so the refined centroids are deterministic
    * across partitionings/retries AND bit-reproducible by the DuckDB
    * oracle; the ~2⁻¹¹ per-coordinate quantization is noise relative
    * to centroid quality.
    */
  private def lloydRefine(emb: DataFrame, seeds: DataFrame): DataFrame = {
    val assigned0 = emb.crossJoin(broadcast(seeds))
      .withColumn("cs", call_function("cosine_sim", col("embedding"), col("cv")))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cs"), (-col("cid")).as("negc"), col("embedding").as("e"))).as("m"))
      .select((-col("m.negc")).as("cell"), col("m.e").as("embedding"))
    val sumCols = (0 until EmbDim).map(j =>
      sum(floor(element_at(col("embedding"), j + 1).cast("double") * QuantScale + 0.5)
        .cast("long")).as(s"s$j"))
    val refined = assigned0.groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), sumCols: _*)
      .select(col("cell").as("cid"),
        array((0 until EmbDim).map(j =>
          (col(s"s$j").cast("double") / (lit(QuantScale) * col("n"))).cast("float")): _*).as("cv"))
    val emptyCells = seeds.join(refined.select(col("cid").as("rcid")),
        col("cid") === col("rcid"), "left_anti")
      .select(col("cid"), col("cv"))
    refined.union(emptyCells).ckpt(true)
  }

  /** s03: IVF (inverted-file) ANN — the other standard scale path
    * next to LSH (s02): partition the corpus into [[NCentroids]]
    * Voronoi cells around sampled centroids, then scan only the
    * [[NProbe]] cells nearest each query (~nprobe/ncentroids of the
    * corpus). Centroids are a deterministic md5-ordered sample of
    * corpus vectors refined by one [[lloydRefine]] iteration, so the
    * DuckDB oracle replicates cells, probes, and ranking exactly.
    *
    * Scale shape: centroids are broadcast twice (assignment +
    * probing); cell assignment is a partial-agg'd argmax (the shuffle
    * carries one (vec, best-cell) row per map partition, never the
    * N×K scored rows); candidate scoring rides the bounded
    * [[graft.functions.TopKByScore]] aggregate like s01/s02. At
    * 100 TB: ncentroids grows to √N, the cell map is written
    * partitioned by cell, and probing reads only the probed
    * partitions — partition pruning does the scan cut.
    *
    * Recall note: the synthetic embeddings are near-uniform on the
    * 64-d sphere — the known worst case for IVF (distances
    * concentrate, cells barely separate neighbors), measured
    * recall@10 ≈ 0.62-0.64 at a 25% scan fraction. The Lloyd round
    * measurably recenters cells but does NOT move recall on uniform
    * vectors (cells stay near-equivalent by symmetry) — the gain
    * appears on real, clustered corpora; s02 (LSH) is the better fit
    * for unstructured vectors.
    */
  /** Deterministic md5-ordered seed sample of corpus vectors. */
  private def seedCentroids(emb: DataFrame): DataFrame = emb
    .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
    .limit(NCentroids)
    .select(col("vec_id").as("cid"), col("embedding").as("cv"))

  /** Seeds refined by `iters` Lloyd rounds — each round one broadcast
    * cross join + one fixed-point partial-agg'd mean (see
    * [[lloydRefine]]); the 32-row centroid frame is checkpointed per
    * round so lineage stays flat across iterations.
    */
  private[graft] def kmeansCentroids(spark: SparkSession, sfDir: String,
      iters: Int): DataFrame = {
    registerAll(spark)
    val emb = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    (1 to iters).foldLeft(seedCentroids(emb))((c, _) => lloydRefine(emb, c))
  }

  /** Refined IVF centroids for a corpus (md5-sampled seeds + one
    * Lloyd round).
    */
  private[graft] def ivfCentroids(spark: SparkSession, sfDir: String): DataFrame =
    kmeansCentroids(spark, sfDir, iters = 1)

  /** Lloyd iterations for [[s04Kmeans]] — fixed (not convergence-
    * tested) so the result is a pure function of the corpus and the
    * DuckDB oracle can replicate it by unrolling exactly this many
    * rounds.
    */
  private[graft] val KmeansIters = 3

  /** s04: k-means clustering of the embedding corpus — the curation
    * primitive behind cluster-then-dedup (SemDeDup-style), topic
    * balancing, and mixture design. Seeds are the md5-ordered sample,
    * refined by [[KmeansIters]] Lloyd rounds, then every vector is
    * assigned to its argmax-cosine cell (ties to the smaller cid).
    * Output: (vec_id, cell, cell_size).
    *
    * Scale shape — identical per round to the s03 index build:
    * centroids stay a broadcast 32-row frame, assignment is a
    * partial-agg'd argmax (the shuffle carries one row per vector),
    * and the cell means are FIXED-POINT long sums
    * (`floor(x·1024+0.5)`) — exact, order-independent, so the
    * iteration is deterministic across partitionings/retries and
    * bit-reproducible in the DuckDB oracle across all
    * [[KmeansIters]] rounds (float partial sums are neither). At
    * 100 TB: k grows to √N, rounds stay single-digit, and each round
    * is one corpus scan — the textbook distributed Lloyd.
    */
  def s04Kmeans(spark: SparkSession, sfDir: String): DataFrame = {
    val centroids = kmeansCentroids(spark, sfDir, KmeansIters)
    // checkpointed: read by the size agg AND the final join — without
    // it each consumer re-runs the corpus argmax (lloydRefine pattern)
    val cells = ivfCells(spark, sfDir, centroids)
      .select(col("vec_id"), col("cell")).ckpt(true)
    val sizes = cells.groupBy(col("cell")).agg(count(lit(1)).as("cell_size"))
    cells.join(sizes, "cell")
      .select(col("vec_id"), col("cell"), col("cell_size"))
      .orderBy(col("vec_id"))
  }

  /** Components fit by [[s27Gmm]]. */
  private[graft] val GmmK = 4

  /** Hard-EM rounds — fixed, unrolled by the oracle. */
  private[graft] val GmmIters = 2

  /** Variance floor in tick² (the mllib minCovariance analog): keeps
    * the inverse-variance tick finite and the E-step products
    * bounded; a component collapsing onto duplicates saturates here
    * instead of blowing up.
    */
  private[graft] val GmmVarFloor = 64L

  /** Initial per-dim variance in tick² (σ ≈ 0.25 on the unit grid). */
  private[graft] val GmmVarInit = 65536L

  /** s27: Gaussian mixture over the embedding corpus — the
    * reference's mllib/clustering surface (reference: /root/
    * reference/mllib/src/main/scala/org/apache/spark/mllib/
    * clustering/GaussianMixture.scala:1) in the HARD-assignment
    * (classification-EM) diagonal form — the variant a hash-verified
    * engine can offer, for the same reason q50 trades the sigmoid
    * for its piecewise surrogate: soft responsibilities need exp(),
    * whose cross-engine sum order is unfixable, while CEM's E-step
    * is an ARGMIN over per-component scores that are exact integer
    * sums.
    *
    * Score contract (2⁻²⁶ ticks of negative log2-density): for
    * component k, score(v) = Σ_d (q_d−μ_kd)²·ivl_kd + Σ_d lvh_kd −
    * pr_k, where per MODEL entry (k×64 values, never per row)
    * ivl = floor(log2e/2 · 2²⁶ / var), lvh = floor(½·log2(var)·2²⁶)
    * and pr = floor(log2(w/Σw)·2²⁶) are computed by identical
    * expression trees on identical integers in both engines (the
    * t09/t19 model-entry log contract; log2e/2 interpolated as one
    * shared literal). Products (q−μ)²·ivl ≤ 2²²·2²⁰ summed over 64
    * dims < 2⁴⁸ — exact, order-independent. Ties → smaller k.
    * M-step: μ' = Σq div n, var' = max((n·Σq² − (Σq)²) div n²,
    * [[GmmVarFloor]]) — exact integer stats (safe to n ≈ 3·10⁶ per
    * component FOR |x| ≤ 1, i.e. |q| ≤ 2¹⁰ — the unit-normalized
    * embedding contract this corpus satisfies; at the quantizer's
    * full |x| ≤ 2 range ticks reach ±2¹¹ and n·Σq² − (Σq)² overflows
    * int64 ~4× earlier, at n ≈ 8·10⁵; documented retune = centered/
    * two-level sums, the s13 note), empty components carry their
    * model forward with n_members = 0 (the lloydRefine emptyCells
    * rule; priors +1-smooth zero weights so log2 stays finite).
    * Init: md5-ordered seed sample ('gmm:' stream), [[GmmVarInit]],
    * uniform weights.
    *
    * Scale shape: per round ONE corpus scan against the broadcast
    * 4-row model (partial-agg'd argmin — the s04 assignment shape)
    * plus one (k, d)-grouped stat aggregation that map-combines to
    * ≤ 256 rows per task. Model derivation is model-sized. Nothing
    * corpus-wide buffers; rounds are fixed.
    *
    * Output: (component, dim, mu_ticks, var_ticks, n_members) — the
    * full learned model, hash-verified.
    */
  def s27Gmm(spark: SparkSession, sfDir: String): DataFrame =
    gmmCore(Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")))

  /** The hard-EM core over any (vec_id, embedding float array) frame
    * — package-private for the planted-cluster spec.
    */
  private[graft] def gmmCore(vecs: DataFrame): DataFrame = {
    val qf = gmmTicks(vecs)
    var stats = gmmInit(qf)
    for (_ <- 1 to GmmIters) {
      val model = gmmDerive(stats)
      val assigned = gmmAssign(qf, model)
      stats = gmmMStep(assigned, stats)
    }
    stats.select(col("k").as("component"), col("d").as("dim"),
        col("mu").as("mu_ticks"), col("var").as("var_ticks"),
        col("w").as("n_members"))
      .orderBy(col("component"), col("dim"))
  }

  /** The shared 2⁻¹⁰ embedding quantization both GMM flavors open
    * with, checkpointed.
    */
  private[graft] def gmmTicks(vecs: DataFrame): DataFrame =
    gmmTicksLazy(vecs).ckpt(true)

  /** The tick projection alone (no checkpoint) — the form a
    * STREAMING scan can use (an eager ckpt is an action, illegal on
    * a streaming frame; the batch trainer wants the ckpt because it
    * re-scans the ticks every round).
    */
  private[graft] def gmmTicksLazy(vecs: DataFrame): DataFrame =
    vecs
      .select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1024.0D + 0.5D) AS BIGINT))")
        .as("q"))

  /** The shared md5-seeded init stats (k, d, mu, var, w) both GMM
    * flavors start from — s35's round-0 integer score grid is exact
    * BECAUSE it shares this init with s27.
    */
  private[graft] def gmmInit(qf: DataFrame): DataFrame = {
    val seeds = qf
      .orderBy(md5(concat(lit("gmm:"), col("vec_id").cast("string"))),
        col("vec_id"))
      .limit(GmmK)
      .withColumn("k", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(md5(concat(lit("gmm:"), col("vec_id").cast("string"))),
            col("vec_id"))).cast("long") - 1L)
    seeds
      .select(col("k"), posexplode(col("q")).as(Seq("d", "mu")))
      .select(col("k"), col("d").cast("long").as("d"), col("mu"),
        lit(GmmVarInit).as("var"), lit(1L).as("w"))
      .ckpt(true)
  }

  /** Model derivation for [[s27Gmm]]: long-form stats → broadcast
    * component rows with tick arrays and the log model entries.
    */
  private def gmmDerive(stats: DataFrame): DataFrame = {
    // priors +1-smooth empty components (w = 0 after a memberless
    // round): max(w, 1) keeps log2 finite and the component eligible
    val wtot = stats.select(col("k"), col("w")).distinct()
      .agg(sum(greatest(col("w"), lit(1L))).as("wtot"))
    stats
      .withColumn("ivl", expr(
        "CAST(floor(CAST(0.7213475204444817 AS DOUBLE) / CAST(2.0 AS DOUBLE) " +
          "* CAST(67108864.0 AS DOUBLE) / CAST(var AS DOUBLE)) AS BIGINT)"))
      .withColumn("lvh", expr(
        "CAST(floor(CAST(0.5 AS DOUBLE) * log2(CAST(var AS DOUBLE)) " +
          "* CAST(67108864.0 AS DOUBLE)) AS BIGINT)"))
      .groupBy(col("k"), col("w"))
      .agg(collect_list(struct(col("d"), col("mu"), col("ivl"), col("lvh")))
        .as("dm"))
      .crossJoin(broadcast(wtot))
      .select(col("k"),
        expr("transform(array_sort(dm), s -> s.mu)").as("mu"),
        expr("transform(array_sort(dm), s -> s.ivl)").as("ivl"),
        expr("aggregate(transform(dm, s -> s.lvh), CAST(0 AS BIGINT), " +
          "(a, x) -> a + x)").as("lvsum"),
        expr("CAST(floor(log2(CAST(greatest(w, 1) AS DOUBLE) " +
          "/ CAST(wtot AS DOUBLE)) " +
          "* CAST(67108864.0 AS DOUBLE)) AS BIGINT)").as("pr"))
      .ckpt(true)
  }

  /** Hard E-step: per-vector argmin of the exact integer score
    * against the broadcast model; ties → smaller component.
    */
  private def gmmAssign(qf: DataFrame, model: DataFrame): DataFrame =
    qf.crossJoin(broadcast(model))
      .withColumn("score", expr(
        "aggregate(zip_with(zip_with(q, mu, (a, b) -> (a - b) * (a - b)), " +
          "ivl, (d2, iv) -> d2 * iv), CAST(0 AS BIGINT), (acc, x) -> acc + x) " +
          "+ lvsum - pr"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("score"), col("k"), col("q"))).as("m"))
      .select(col("vec_id"), col("m.k").as("k"), col("m.q").as("q"))

  /** M-step: exact integer component stats; empty components carry
    * their previous (k, d) model rows with w = 0 (so n_members is
    * honest — the prior smoothing happens in [[gmmDerive]]).
    */
  private def gmmMStep(assigned: DataFrame, prevStats: DataFrame): DataFrame = {
    val agg = assigned
      .select(col("k"), posexplode(col("q")).as(Seq("d", "qd")))
      .groupBy(col("k"), col("d").cast("long").as("d"))
      .agg(count(lit(1)).as("n"), sum(col("qd")).as("s"),
        sum(expr("qd * qd")).as("ss"))
      .select(col("k"), col("d"), expr("s div n").as("mu"),
        greatest(expr("(n * ss - s * s) div (n * n)"), lit(GmmVarFloor))
          .as("var"),
        col("n").as("w"))
    val kept = prevStats.join(agg.select(col("k").as("ak")).distinct(),
        col("k") === col("ak"), "left_anti")
      .select(col("k"), col("d"), col("mu"), col("var"), lit(0L).as("w"))
    agg.unionByName(kept).ckpt(true)
  }

  /** Soft-EM rounds for [[s35GmmSoft]] — few and fixed: the ascent
    * contract checks every step, convergence is not the claim.
    */
  private[graft] val SoftGmmIters = 3

  /** s35: SOFT-EM Gaussian mixture — posterior responsibilities, the
    * output semantics the reference's GaussianMixture actually has
    * (reference: /root/reference/mllib/src/main/scala/org/apache/
    * spark/mllib/clustering/GaussianMixture.scala:1) and the gap
    * s27's hard-assignment variant leaves. The softmax E-step needs
    * exp(), whose cross-engine summation order is unfixable — so the
    * key follows the q34/q68 contract-checked posture:
    *
    * HASHED (exact integers, oracle recomputes independently): the
    * round-0 E-step score grid — per component the score sum and
    * minimum over ALL vectors, plus the hard-argmin member count —
    * under s27's exact integer score contract off the SAME md5
    * seeds/var-init/uniform-prior model ([[gmmInit]]).
    *
    * CONTRACT-CHECKED (booleans the oracle pins TRUE): across
    * [[SoftGmmIters]] soft rounds in double space, (1) the data
    * log-likelihood Σ_v log2 Σ_k w_k·N_k(v) ascends every round
    * (the EM guarantee — a wrong E/M step breaks it immediately;
    * tolerance 1e-6 relative for float summation), (2) per-vector
    * responsibilities quantized to 2²⁰ ticks sum to 2²⁰ ± 2 at the
    * final model (K = 4 half-ulp roundings), (3) final priors sum
    * to 1 within 1e-6, (4) every variance respects [[GmmVarFloor]].
    *
    * Scale shape: one corpus scan per round against the broadcast
    * ONE-ROW pivoted model (K arrays of 64 doubles): scores, the
    * log-sum-exp responsibilities (max-shifted — underflow-safe),
    * and the M-step sums all ride that scan; the posexplode fans 64×
    * into a map-side-combined 64-row (d) aggregate carrying all
    * 3K + 2 sums, so nothing corpus-sized shuffles. The ll and every
    * contract boolean are Spark-side aggregates — no driver fetch.
    *
    * Output: one row per component — the hashed round-0 grid columns
    * + the four contract booleans.
    */
  def s35GmmSoft(spark: SparkSession, sfDir: String): DataFrame =
    gmmSoftCore(Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")))

  /** The soft-EM core over any (vec_id, embedding float array) frame
    * — package-private for the planted-cluster spec.
    */
  private[graft] def gmmSoftCore(vecs: DataFrame): DataFrame = {
    val qf = gmmTicks(vecs)
    val stats0 = gmmInit(qf)
    // hashable round-0 integer score grid: the s27 score contract
    val sc0 = qf.crossJoin(broadcast(gmmDerive(stats0)))
      .withColumn("score", expr(
        "aggregate(zip_with(zip_with(q, mu, (a, b) -> (a - b) * (a - b)), " +
          "ivl, (d2, iv) -> d2 * iv), CAST(0 AS BIGINT), (acc, x) -> acc + x) " +
          "+ lvsum - pr"))
    val hashAgg = sc0.groupBy(col("k"))
      .agg(sum(col("score")).as("score0_sum"),
        min(col("score")).as("score0_min"))
    val n0 = sc0.groupBy(col("vec_id"))
      .agg(min(struct(col("score"), col("k"))).getField("k").as("k0"))
      .groupBy(col("k0")).agg(count(lit(1)).as("n0_members"))
    // soft rounds: double-space model, same init
    var statsD = stats0.select(col("k"), col("d"),
      col("mu").cast("double").as("muD"),
      col("var").cast("double").as("varD"),
      (lit(1.0) / lit(GmmK.toDouble)).as("w"))
    var lls: Seq[DataFrame] = Nil
    var lastAgg: DataFrame = null
    for (r <- 0 to SoftGmmIters) {
      val scored = softScore(qf, softPivot(statsD))
      lastAgg = softMStepAgg(scored)
      lls = lls :+ lastAgg.agg(max(col("ll")).as("ll"))
        .select(lit(r.toLong).as("round"), col("ll"))
      if (r < SoftGmmIters) statsD = softStatsFrom(lastAgg)
    }
    val wOrd = org.apache.spark.sql.expressions.Window.orderBy(col("round"))
    val ascent = lls.reduce(_ unionByName _)
      .withColumn("prev", lag(col("ll"), 1).over(wOrd))
      .agg(min(when(col("prev").isNull, lit(true))
        .otherwise(col("ll") >=
          col("prev") - lit(1e-6) * abs(col("prev"))))
        .as("ll_ascent_ok"))
    val respOk = lastAgg.agg(min(col("norm_ok")).as("resp_norm_ok"))
    val wOk = statsD.select(col("k"), col("w")).distinct()
      .agg((abs(sum(col("w")) - lit(1.0)) <= lit(1e-6))
        .as("weights_norm_ok"))
    val vOk = statsD
      .agg(min(col("varD") >= lit(GmmVarFloor.toDouble)).as("var_floor_ok"))
    hashAgg
      .join(n0, col("k") === col("k0"), "left")
      .crossJoin(broadcast(ascent))
      .crossJoin(broadcast(respOk))
      .crossJoin(broadcast(wOk))
      .crossJoin(broadcast(vOk))
      .select(col("k").as("component"),
        coalesce(col("n0_members"), lit(0L)).as("n0_members"),
        col("score0_sum"), col("score0_min"),
        col("ll_ascent_ok"), col("resp_norm_ok"),
        col("weights_norm_ok"), col("var_floor_ok"))
      .orderBy(col("component"))
  }

  /** The TRAINED soft model as the one-row broadcast frame
    * [[softScore]] scores against — the serve surface
    * stream_gmm_assign broadcasts (the "one stream, one model"
    * posture of stream_nb/stream_topic/stream_recommend). Same md5
    * init and the same [[SoftGmmIters]] M-step updates as
    * [[gmmSoftCore]]'s final model, so streaming posteriors are
    * scored against exactly the model s35 certifies.
    */
  private[graft] def gmmSoftModelRow(vecs: DataFrame): DataFrame = {
    val qf = gmmTicks(vecs)
    var statsD = gmmInit(qf).select(col("k"), col("d"),
      col("mu").cast("double").as("muD"),
      col("var").cast("double").as("varD"),
      (lit(1.0) / lit(GmmK.toDouble)).as("w"))
    for (_ <- 0 until SoftGmmIters)
      statsD = softStatsFrom(softMStepAgg(softScore(qf, softPivot(statsD))))
    softPivot(statsD)
  }

  /** Long-form double stats → the ONE-ROW broadcast model: per
    * component a 64-double mean array, the per-dim quadratic weights
    * log2e/(2σ²) (the s27 ivl entries un-quantized), and the scalar
    * ½Σlog2σ² − log2 w.
    */
  private[graft] def softPivot(st: DataFrame): DataFrame = {
    val rows = st
      .groupBy(col("k"), col("w"))
      .agg(collect_list(struct(col("d"), col("muD"), col("varD"))).as("dm"))
      .select(col("k"),
        expr("transform(array_sort(dm), s -> s.muD)").as("mu"),
        expr("transform(array_sort(dm), s -> " +
          "CAST(0.7213475204444817 AS DOUBLE) / s.varD)").as("iv"),
        (expr("aggregate(transform(dm, s -> CAST(0.5 AS DOUBLE) " +
          "* log2(s.varD)), CAST(0.0 AS DOUBLE), (a, x) -> a + x)")
          - log2(col("w"))).as("c"))
    val pcols = (0 until GmmK).flatMap(k => Seq(
      max(when(col("k") === k.toLong, col("mu"))).as(s"mu$k"),
      max(when(col("k") === k.toLong, col("iv"))).as(s"iv$k"),
      max(when(col("k") === k.toLong, col("c"))).as(s"c$k")))
    rows.groupBy().agg(pcols.head, pcols.tail: _*).ckpt(true)
  }

  /** The per-vector soft E-step against the one-row model: scores,
    * max-shifted log-sum-exp responsibilities (underflow-safe: the
    * minimum-score term is always 2⁰ = 1), the per-vector ll and the
    * 2²⁰-tick normalization boolean.
    */
  private[graft] def softScore(qf: DataFrame, modelRow: DataFrame): DataFrame = {
    var f = qf.crossJoin(broadcast(modelRow))
    for (k <- 0 until GmmK)
      f = f.withColumn(s"s$k", expr(
        s"aggregate(zip_with(zip_with(q, mu$k, " +
          "(a, b) -> CAST(a AS DOUBLE) - b), " +
          s"iv$k, (df, iv) -> df * df * iv), " +
          "CAST(0.0 AS DOUBLE), (a, x) -> a + x)") + col(s"c$k"))
    f = f.withColumn("m", least((0 until GmmK).map(k => col(s"s$k")): _*))
    for (k <- 0 until GmmK)
      f = f.withColumn(s"e$k", pow(lit(2.0), col("m") - col(s"s$k")))
    f = f.withColumn("tot", (0 until GmmK).map(k => col(s"e$k")).reduce(_ + _))
    for (k <- 0 until GmmK)
      f = f.withColumn(s"r$k", col(s"e$k") / col("tot"))
    f.withColumn("llv", -col("m") + log2(col("tot")))
      .withColumn("norm_ok",
        abs((0 until GmmK).map(k =>
          floor(col(s"r$k") * lit(1048576.0) + lit(0.5))).reduce(_ + _)
          - lit(1048576.0)) <= lit(2.0))
  }

  /** The soft M-step aggregation: posexplode to (d) rows carrying
    * Σr_k, Σr_k·q_d, Σr_k·q_d² per component plus the ll sum and the
    * norm conjunction (identical across d by construction) — 64 rows,
    * checkpointed per round.
    */
  private def softMStepAgg(scored: DataFrame): DataFrame = {
    val aggCols = (0 until GmmK).flatMap(k => Seq(
      sum(col(s"r$k")).as(s"n$k"),
      sum(col(s"r$k") * col("qd")).as(s"s$k"),
      sum(col(s"r$k") * col("qd") * col("qd")).as(s"ss$k"))) ++ Seq(
      sum(col("llv")).as("ll"),
      min(col("norm_ok")).as("norm_ok"),
      count(lit(1)).as("nvec"))
    scored
      .select(Seq(posexplode(col("q")).as(Seq("dd", "qdL"))) ++
        (0 until GmmK).map(k => col(s"r$k")) ++
        Seq(col("llv"), col("norm_ok")): _*)
      .withColumn("qd", col("qdL").cast("double"))
      .groupBy(col("dd").cast("long").as("d"))
      .agg(aggCols.head, aggCols.tail: _*)
      .ckpt(true)
  }

  /** New long-form double stats from the per-d sums: μ = Σrq/Σr,
    * σ² = Σrq²/Σr − μ² floored at [[GmmVarFloor]], prior = Σr/N
    * (floored at 1e-6 so a dying component keeps a finite log).
    */
  private def softStatsFrom(m: DataFrame): DataFrame =
    (0 until GmmK).map { k =>
      val nk = greatest(col(s"n$k"), lit(1e-9))
      m.select(lit(k.toLong).as("k"), col("d"),
        (col(s"s$k") / nk).as("muD"),
        greatest(col(s"ss$k") / nk - pow(col(s"s$k") / nk, lit(2.0)),
          lit(GmmVarFloor.toDouble)).as("varD"),
        (greatest(col(s"n$k"), lit(1e-6)) / col("nvec")).as("w"))
    }.reduce(_ unionByName _)

  /** The DuckDB twin of [[s27Gmm]]: the hard-EM rounds unrolled —
    * identical model-entry log trees, exact integer E/M arithmetic.
    */
  private[graft] def s27OracleSql: String = {
    def roundCtes(r: Int): String = {
      val prev = s"st${r - 1}"
      s"""dv$r AS MATERIALIZED (
         |  SELECT k, d, mu,
         |    CAST(floor(CAST(0.7213475204444817 AS DOUBLE) / CAST(2.0 AS DOUBLE)
         |      * CAST(67108864.0 AS DOUBLE) / CAST(var AS DOUBLE)) AS BIGINT) AS ivl,
         |    CAST(floor(CAST(0.5 AS DOUBLE) * log2(CAST(var AS DOUBLE))
         |      * CAST(67108864.0 AS DOUBLE)) AS BIGINT) AS lvh
         |  FROM $prev),
         |wt$r AS MATERIALIZED (
         |  SELECT CAST(sum(greatest(w, 1)) AS BIGINT) AS wtot
         |  FROM (SELECT DISTINCT k, w FROM $prev)),
         |pk$r AS MATERIALIZED (
         |  SELECT k, CAST(floor(log2(CAST(greatest(w, 1) AS DOUBLE)
         |      / CAST((SELECT wtot FROM wt$r) AS DOUBLE))
         |    * CAST(67108864.0 AS DOUBLE)) AS BIGINT) AS pr,
         |    CAST(0 AS BIGINT) AS z
         |  FROM (SELECT DISTINCT k, w FROM $prev)),
         |lv$r AS MATERIALIZED (
         |  SELECT k, CAST(sum(lvh) AS BIGINT) AS lvsum FROM dv$r GROUP BY k),
         |sc$r AS MATERIALIZED (
         |  SELECT e.vec_id, dv$r.k,
         |    CAST(sum((e.q - dv$r.mu) * (e.q - dv$r.mu) * dv$r.ivl) AS BIGINT) AS s2
         |  FROM e JOIN dv$r ON e.d = dv$r.d GROUP BY 1, 2),
         |asg$r AS MATERIALIZED (
         |  SELECT vec_id, k FROM (
         |    SELECT sc$r.vec_id, sc$r.k,
         |      row_number() OVER (PARTITION BY sc$r.vec_id
         |        ORDER BY sc$r.s2 + lv$r.lvsum - pk$r.pr, sc$r.k) AS rn
         |    FROM sc$r JOIN lv$r ON sc$r.k = lv$r.k
         |    JOIN pk$r ON sc$r.k = pk$r.k) t
         |  WHERE rn = 1),
         |ag$r AS MATERIALIZED (
         |  SELECT a.k, e.d, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(e.q) AS BIGINT) AS s, CAST(sum(e.q * e.q) AS BIGINT) AS ss
         |  FROM asg$r a JOIN e ON a.vec_id = e.vec_id GROUP BY 1, 2),
         |st$r AS MATERIALIZED (
         |  SELECT k, d, s // n AS mu,
         |    greatest((n * ss - s * s) // (n * n), $GmmVarFloor) AS var,
         |    n AS w
         |  FROM ag$r
         |  UNION ALL
         |  SELECT p.k, p.d, p.mu, p.var, CAST(0 AS BIGINT) AS w
         |  FROM st${r - 1} p
         |  WHERE p.k NOT IN (SELECT k FROM ag$r))""".stripMargin
    }
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, CAST(a.i AS BIGINT) AS d,
       |    CAST(floor(CAST(embedding[a.i + 1] AS DOUBLE) * 1024.0 + 0.5)
       |      AS BIGINT) AS q
       |  FROM embeddings, UNNEST(generate_series(0, 63)) AS a(i)),
       |sd AS MATERIALIZED (
       |  SELECT vec_id,
       |    row_number() OVER (ORDER BY md5('gmm:' || CAST(vec_id AS VARCHAR)),
       |      vec_id) - 1 AS k
       |  FROM (SELECT vec_id FROM embeddings
       |        ORDER BY md5('gmm:' || CAST(vec_id AS VARCHAR)), vec_id
       |        LIMIT $GmmK) s),
       |st0 AS MATERIALIZED (
       |  SELECT sd.k, e.d, e.q AS mu, CAST($GmmVarInit AS BIGINT) AS var,
       |    CAST(1 AS BIGINT) AS w
       |  FROM sd JOIN e ON sd.vec_id = e.vec_id),
       |${(1 to GmmIters).map(roundCtes).mkString(",\n")}
       |SELECT k AS component, d AS dim, mu AS mu_ticks, var AS var_ticks,
       |  w AS n_members
       |FROM st$GmmIters
       |ORDER BY component, dim""".stripMargin
  }

  /** The DuckDB twin of [[s35GmmSoft]]: the round-0 integer score
    * grid recomputed independently (the s27 CTE texts off the same
    * md5 seed init), the hard-argmin member counts, and the four
    * soft-fit contract booleans pinned TRUE.
    */
  private[graft] def s35OracleSql: String =
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, CAST(a.i AS BIGINT) AS d,
       |    CAST(floor(CAST(embedding[a.i + 1] AS DOUBLE) * 1024.0 + 0.5)
       |      AS BIGINT) AS q
       |  FROM embeddings, UNNEST(generate_series(0, 63)) AS a(i)),
       |sd AS MATERIALIZED (
       |  SELECT vec_id,
       |    row_number() OVER (ORDER BY md5('gmm:' || CAST(vec_id AS VARCHAR)),
       |      vec_id) - 1 AS k
       |  FROM (SELECT vec_id FROM embeddings
       |        ORDER BY md5('gmm:' || CAST(vec_id AS VARCHAR)), vec_id
       |        LIMIT $GmmK) s),
       |st0 AS MATERIALIZED (
       |  SELECT sd.k, e.d, e.q AS mu, CAST($GmmVarInit AS BIGINT) AS var,
       |    CAST(1 AS BIGINT) AS w
       |  FROM sd JOIN e ON sd.vec_id = e.vec_id),
       |dv AS MATERIALIZED (
       |  SELECT k, d, mu,
       |    CAST(floor(CAST(0.7213475204444817 AS DOUBLE) / CAST(2.0 AS DOUBLE)
       |      * CAST(67108864.0 AS DOUBLE) / CAST(var AS DOUBLE)) AS BIGINT) AS ivl,
       |    CAST(floor(CAST(0.5 AS DOUBLE) * log2(CAST(var AS DOUBLE))
       |      * CAST(67108864.0 AS DOUBLE)) AS BIGINT) AS lvh
       |  FROM st0),
       |wt AS (SELECT CAST(sum(greatest(w, 1)) AS BIGINT) AS wtot
       |       FROM (SELECT DISTINCT k, w FROM st0)),
       |pk AS (SELECT k, CAST(floor(log2(CAST(greatest(w, 1) AS DOUBLE)
       |      / CAST((SELECT wtot FROM wt) AS DOUBLE))
       |    * CAST(67108864.0 AS DOUBLE)) AS BIGINT) AS pr
       |  FROM (SELECT DISTINCT k, w FROM st0)),
       |lv AS (SELECT k, CAST(sum(lvh) AS BIGINT) AS lvsum FROM dv GROUP BY k),
       |sc AS MATERIALIZED (
       |  SELECT e.vec_id, dv.k,
       |    CAST(sum((e.q - dv.mu) * (e.q - dv.mu) * dv.ivl) AS BIGINT) AS s2
       |  FROM e JOIN dv ON e.d = dv.d GROUP BY 1, 2),
       |fs AS MATERIALIZED (
       |  SELECT sc.vec_id, sc.k, sc.s2 + lv.lvsum - pk.pr AS score
       |  FROM sc JOIN lv ON lv.k = sc.k JOIN pk ON pk.k = sc.k),
       |asg AS (SELECT vec_id, k FROM (
       |  SELECT vec_id, k,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY score, k) AS rn
       |  FROM fs) r WHERE rn = 1),
       |n0 AS (SELECT k, CAST(count(*) AS BIGINT) AS n0_members
       |       FROM asg GROUP BY k),
       |ag AS (SELECT k, CAST(sum(score) AS BIGINT) AS score0_sum,
       |         CAST(min(score) AS BIGINT) AS score0_min FROM fs GROUP BY k)
       |SELECT ag.k AS component,
       |  coalesce(n0.n0_members, CAST(0 AS BIGINT)) AS n0_members,
       |  ag.score0_sum, ag.score0_min,
       |  TRUE AS ll_ascent_ok, TRUE AS resp_norm_ok,
       |  TRUE AS weights_norm_ok, TRUE AS var_floor_ok
       |FROM ag LEFT JOIN n0 ON n0.k = ag.k
       |ORDER BY component""".stripMargin

  /** Cosine bar for [[d11DedupSemantic]] — matches d05's near-dup
    * threshold so the two operators' notions of "duplicate" align.
    */
  private[graft] val SemBar = 0.4

  /** Probe cells per vector for [[d11DedupSemantic]] — each vector
    * joins the pairwise stage under its [[SemProbes]] nearest
    * centroids (SemDeDup multi-probe), so a near-dup pair split
    * across one Voronoi boundary is still compared when the probe
    * sets overlap.
    */
  private[graft] val SemProbes = 2

  /** d11: semantic dedup, cluster-then-dedup (the SemDeDup recipe):
    * k-means cells bound the pairwise comparison, then a vector is a
    * duplicate iff a SMALLER-id vector sharing ANY of its
    * [[SemProbes]]-nearest cells has cosine ≥ [[SemBar]] — the
    * deterministic min-id-representative rule. Output:
    * (vec_id, cell, is_dup) for every vector, `cell` the PRIMARY
    * (nearest) cell.
    *
    * Scale shape: the quadratic step is within-cell only — with
    * k = √N cells the expected cell is √N vectors, and the cell
    * self-join shuffles on the cell id; multi-probe multiplies the
    * self-join input by [[SemProbes]] (candidate pairs by ≤
    * SemProbes², a constant), not the corpus. The residual recall
    * trade is SemDeDup's: pairs whose probe sets are disjoint are
    * still missed — single-cell assignment found 24 of 59 ≥0.4-cosine
    * pairs at sf0.01 on near-uniform synthetic vectors; 2-probe
    * lifts cell co-occurrence to 45 of 59 (real, clustered embeddings
    * co-locate far better). d05 (LSH over the whole corpus) stays the
    * cross-cell-complete alternative.
    */
  /** The d11 probe assignment: (vec_id, top [`probes` ranked cells],
    * embedding), checkpointed — exposed so the recall spec can measure
    * probe-set co-occurrence of true near-dup pairs directly (the
    * number a banding retune must not silently regress), and
    * parameterized by probe count so the probe∈{1,2,3} recall-vs-cost
    * sweep spec can chart the operating points a future retune picks
    * between (the shipped operator always uses [[SemProbes]]).
    */
  private[graft] def semAssigned(spark: SparkSession, sfDir: String,
      probes: Int = SemProbes): DataFrame = {
    registerAll(spark)
    val centroids = kmeansCentroids(spark, sfDir, KmeansIters)
    val emb = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    // one corpus scan: top-SemProbes cells per vector via the bounded
    // aggregate (score desc, ties to the smaller cid — the oracle's
    // rank order); checkpointed because BOTH self-join sides and the
    // final output read it (in production this frame is the
    // materialized partitionBy("cell") index)
    emb.crossJoin(broadcast(centroids))
      .withColumn("cs", call_function("cosine_sim", col("embedding"), col("cv")))
      .groupBy(col("vec_id"))
      .agg(call_function("top_k_by_score", col("cs"), col("cid"), lit(probes)).as("top"),
        max(col("embedding")).as("embedding"))
      .ckpt(true)
  }

  def d11DedupSemantic(spark: SparkSession, sfDir: String): DataFrame = {
    val assigned = semAssigned(spark, sfDir)
    val multi = assigned.select(col("vec_id"), col("embedding"),
      explode(col("top.id")).as("cell"))
    val smaller = multi.select(col("cell"), col("vec_id").as("va"),
      col("embedding").as("ea"))
    val dupIds = multi.select(col("cell"), col("vec_id"), col("embedding").as("eb"))
      .join(smaller, "cell")
      .filter(col("va") < col("vec_id"))
      .filter(call_function("cosine_sim", col("ea"), col("eb")) >= SemBar)
      .select(col("vec_id")).distinct()
    assigned.select(col("vec_id"), element_at(col("top.id"), 1).as("cell"))
      .join(dupIds.withColumn("is_dup", lit(true)), Seq("vec_id"), "left")
      .withColumn("is_dup", coalesce(col("is_dup"), lit(false)))
      .select(col("vec_id"), col("cell"), col("is_dup"))
      .orderBy(col("vec_id"))
  }

  /** Cell assignment (vec_id, cell, embedding) — the IVF index frame.
    * At 100 TB THIS is what gets materialized `partitionBy("cell")`
    * so probing reads only the probed cells via partition pruning
    * (spec-demonstrated in DedupSimilaritySpec).
    */
  private[graft] def ivfCells(spark: SparkSession, sfDir: String,
      centroids: DataFrame): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    // argmax over broadcast centroids via struct-max: highest cosine,
    // ties to the smaller cid (negated id in the comparison struct)
    emb.crossJoin(broadcast(centroids))
      .withColumn("cs", call_function("cosine_sim", col("embedding"), col("cv")))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cs"), (-col("cid")).as("negc"), col("embedding").as("e"))).as("m"))
      .select(col("vec_id"), (-col("m.negc")).as("cell"), col("m.e").as("embedding"))
  }

  def s03AnnIvf(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark)
    val centroids = ivfCentroids(spark, sfDir)
    val assigned = ivfCells(spark, sfDir, centroids)
    val probed = queriesBlock(spark, sfDir).crossJoin(broadcast(centroids))
      .withColumn("cs", call_function("cosine_sim", col("qv"), col("cv")))
      .groupBy(col("query_id"))
      .agg(call_function("top_k_by_score", col("cs"), col("cid"), lit(NProbe)).as("top"),
        max(col("qv")).as("qv"))
      .select(col("query_id"), col("qv"), explode(col("top.id")).as("cell"))
    topKPerQuery(
      assigned.join(broadcast(probed), Seq("cell"))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("cos_raw", call_function("cosine_sim", col("qv"), col("embedding"))))
  }

  /** The one 12-band seed-7 hyperplane banding shared by s02, the
    * k-NN graph (s05/s06), the streaming ANN probe, and every oracle
    * that replicates it — ONE definition so a retune can't silently
    * desynchronize batch, stream, and oracle (the stream==batch specs
    * only catch a drift that exists at test time). [[AnnBits]] is the
    * FLOOR for bits-per-band; the operating value is
    * [[annBitsFor]](corpus size).
    */
  private[graft] val AnnBands = 12
  private[graft] val AnnBits = 3
  private[graft] val AnnSeed = 7L

  /** Target expected band-bucket occupancy for the ANN paths: with
    * `bits = annBitsFor(n)`, a band bucket holds n/2^bits ≤ this many
    * vectors in expectation — well under [[Dedup.MaxBucket]], so the
    * degenerate-bucket cap stays the exception path it was designed
    * to be instead of silently dropping EVERY bucket at scale.
    */
  private[graft] val AnnTargetBucket = 1024L

  /** Bits-per-band DERIVED from corpus size — the scale contract the
    * fixed [[AnnBits]] could not give: at 3 bits the expected bucket
    * is n/8, so a 100× corpus pushed every bucket past
    * [[Dedup.MaxBucket]] and the cap turned quadratic blow-up into
    * recall 0. `max(AnnBits, ceil(log2(n / AnnTargetBucket)))` keeps
    * expected occupancy ≤ [[AnnTargetBucket]] for every n (for
    * n ≤ 8·[[AnnTargetBucket]] the [[AnnBits]] floor already does) —
    * spec: DedupSimilaritySpec "derived bits keep expected
    * occupancy bounded". The oracle SQL replicates this formula
    * bit-for-bit (integer `length(bin(q-1))` over the same ceil
    * divide), so a retune desynchronizing engine and oracle fails
    * the gate.
    */
  private[graft] def annBitsFor(n: Long): Int = {
    // INTEGER ceil-log2, not floating log: ceil(ln(x)/ln 2) computes
    // 29.000000000000004 for x = 2^29 (measured) and would round one
    // bit HIGHER than the oracle's log2 at power-of-two corpus sizes.
    // bitLength(q-1) = ceil(log2(q)) exactly, mirrored in the oracle
    // as length(bin(q-1)) — integers on both sides, no libm anywhere.
    val q = (n + AnnTargetBucket - 1) / AnnTargetBucket
    if (q <= 1L) AnnBits
    else math.max(AnnBits, 64 - java.lang.Long.numberOfLeadingZeros(q - 1L))
  }

  /** Banded LSH expansion: `AnnBands` (band_id, band_val) rows per
    * vector via the `hyperplane_bands` expression — per-band packed
    * values, so bands × bits may exceed 64 total planes (the packed
    * single-long form capped bits at 64/bands, which is exactly what
    * pinned [[AnnBits]] at 3). The kernel evaluates once per input
    * row inside the Generate node; band expansion reuses the
    * materialized array.
    */
  private[graft] def annBanded(df: DataFrame, idCol: String, vecCol: String,
      keepVec: Boolean = true, bits: Int = AnnBits): DataFrame = {
    registerAll(df.sparkSession)
    val keep = if (keepVec) Seq(col(vecCol)) else Nil
    df.withColumn("bv", call_function("hyperplane_bands", col(vecCol),
        lit(AnnBands), lit(bits), lit(AnnSeed)))
      .select(col(idCol) +: keep :+
        posexplode(col("bv")).as(Seq("band_id", "band_val")): _*)
  }

  /** Scored LSH candidates (query × banded corpus, exact cosine) —
    * the shared probe stage of [[s02AnnLsh]] (top-k tail) and
    * [[s07RadiusSearch]] (threshold tail).
    */
  private def lshScoredCandidates(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    // one count() (parquet metadata-weight) sizes the banding; the
    // query side MUST band with the same bits or buckets never match
    val bits = annBitsFor(emb.count())
    val corpus = annBanded(emb, "vec_id", "embedding", bits = bits)
    val qs = annBanded(queriesBlock(spark, sfDir), "query_id", "qv", bits = bits)
    corpus.join(broadcast(qs), Seq("band_id", "band_val"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qv"), col("vec_id"), col("embedding"))
      .distinct()
      .withColumn("cos_raw", call_function("cosine_sim", col("qv"), col("embedding")))
  }

  def s02AnnLsh(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark)
    topKPerQuery(lshScoredCandidates(spark, sfDir))
  }

  /** Cosine floor for [[s07RadiusSearch]]. */
  private val RadiusBar = 0.3

  /** s07: radius (range) similarity search — ALL corpus vectors
    * within cosine ≥ [[RadiusBar]] of each query, not a fixed top-k:
    * the retrieval mode behind "everything semantically close to X"
    * (near-dup sweeps seeded by exemplars, policy screens, recall
    * sets whose size the data decides). Same banded-LSH candidate
    * stage as s02 — the two differ only in the tail (bounded top-k
    * aggregate vs a codegen threshold filter), so the 100 TB story is
    * s02's: candidates per query ∝ bucket occupancy, never a corpus
    * scan per query; the oracle replicates banding + scoring exactly
    * (md5-derived weights), so the candidate set itself is checked.
    */
  def s07RadiusSearch(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark)
    lshScoredCandidates(spark, sfDir)
      .filter(col("cos_raw") >= RadiusBar)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(col("cos_raw"), 4).as("cos"))
      .orderBy(col("query_id"), col("neighbor_id"))
  }

  /** Probe-block size for [[s08DiversityStats]]. */
  private val DiversitySample = 32
  /** Ticks per cosine unit (2^20) for the exact long-sum mean. */
  private val DiversityScale = 1048576.0

  /** s08: embedding-space diversity report — pairwise-cosine
    * statistics between a deterministic md5-sampled probe block and
    * the whole corpus: the geometry health check behind
    * diversity-aware sampling (a collapsing embedding space — mean
    * pairwise cosine drifting up — means the corpus is going
    * redundant long before dedup thresholds fire). One corpus scan
    * against a broadcast [[DiversitySample]]-vector block; cosines
    * quantize to 2⁻²⁰ ticks so the mean is an ORDER-INDEPENDENT long
    * sum (the t09/s04 fixed-point pattern — a raw double mean would
    * hash-differ across partitionings and engines). The probe block
    * is a pure function of vec_id (salted-md5 top-32), so the whole
    * report is reproducible anywhere.
    */
  def s08DiversityStats(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark)
    val emb = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val probes = emb
      .withColumn("k", md5(concat(lit("s08:"), col("vec_id").cast("string"))))
      .orderBy(col("k"), col("vec_id")).limit(DiversitySample)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    emb.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("qc",
        floor(call_function("cosine_sim", col("embedding"), col("pv"))
          * lit(DiversityScale) + lit(0.5)).cast("long"))
      .agg(
        count(lit(1)).as("n_pairs"),
        round(sum(col("qc")).cast("double") /
          (lit(DiversityScale) * count(lit(1))), 4).as("mean_cos"),
        round(min(col("qc")) / lit(DiversityScale), 4).as("min_cos"),
        round(max(col("qc")) / lit(DiversityScale), 4).as("max_cos"),
        sum(when(col("qc") >= (DiversityScale / 2).toLong, 1L).otherwise(0L))
          .as("n_above_half"))
  }

  /** Candidate-pool size for [[s09MmrSelect]] — the bounded rerank
    * set; at any corpus size the pool stays this many rows.
    */
  private[graft] val MmrPool = 20

  /** Selections [[s09MmrSelect]] makes (unrolled exactly in the
    * oracle).
    */
  private[graft] val MmrK = 5

  /** s09: MMR (maximal-marginal-relevance) diverse top-k — the
    * curation selector that picks items RELEVANT to a query but not
    * REDUNDANT with each other (`λ·rel − (1−λ)·max-sim-to-selected`,
    * λ = 0.7), the standard answer to "the top-k by plain cosine is
    * five near-copies of the same document". Query: the smallest
    * vec_id's embedding (deterministic, parameter-free for the
    * driver contract; production passes its own query vector).
    *
    * Scale shape — the honest two-phase decomposition every MMR
    * deployment uses, because greedy selection is inherently
    * sequential: (1) candidate generation is DISTRIBUTED (one
    * broadcast corpus scan, ticks into the bounded
    * [[graft.functions.TopKByScore]] aggregate — k-capped partial
    * heaps, the s01 shape, never a global sort), then (2) the exact
    * greedy rerank runs over the [[MmrPool]]-row pool: per step one
    * tiny max-struct aggregate and a 1-row collect ([[MmrK]] bounded
    * control-plane fetches, the g03 seed pattern). At 100 TB phase 1
    * is the same single scan; the pool is still 20 rows.
    *
    * Determinism: cosines quantize to 2⁻²⁰ ticks (the s08 contract),
    * the MMR score is the ALL-INTEGER `7·rel_t − 3·max_sim_t` (λ
    * scaled by 10; no division anywhere — integer div truncates
    * toward zero in Spark but floors in DuckDB on NEGATIVE scores,
    * so the score arithmetic deliberately avoids it), ties to the
    * smaller vec_id. Output: (rank, vec_id, rel_ticks, mmr_ticks).
    */
  def s09MmrSelect(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark)
    mmrSelectFrom(
      Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding")))
  }

  /** The s09 core over any (vec_id, embedding) frame — package-
    * private so the spec can drive it with hand-built geometry where
    * the diversity skip is provable by construction.
    */
  private[graft] def mmrSelectFrom(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    registerAll(spark)
    val qRow = emb.agg(min(col("vec_id"))).collect()(0)
    require(!qRow.isNullAt(0), "s09: empty embeddings corpus")
    val qid = qRow.getLong(0)
    val q = emb.filter(col("vec_id") === qid).select(col("embedding").as("qv"))
    val rel = emb.filter(col("vec_id") =!= qid).crossJoin(broadcast(q))
      .withColumn("rel_t",
        floor(call_function("cosine_sim", col("embedding"), col("qv"))
          * lit(DiversityScale) + lit(0.5)).cast("long"))
      .select(col("vec_id"), col("embedding"), col("rel_t"))
    // distributed top-Pool by (rel desc, id asc); ids only through the
    // aggregate, embeddings joined back for the 20 pool rows
    val pool = rel
      .agg(call_function("top_k_by_score",
        col("rel_t").cast("double"), col("vec_id"), lit(MmrPool)).as("top"))
      .select(explode(col("top.id")).as("vec_id"))
      .join(rel, "vec_id")
      .ckpt(true) // read every greedy step
    // pairwise pool sims once (≤ Pool² rows), not per step
    val sims = pool.select(col("vec_id").as("a"), col("embedding").as("ea"))
      .crossJoin(broadcast(
        pool.select(col("vec_id").as("b"), col("embedding").as("eb"))))
      .filter(col("a") =!= col("b"))
      .withColumn("sim_t",
        floor(call_function("cosine_sim", col("ea"), col("eb"))
          * lit(DiversityScale) + lit(0.5)).cast("long"))
      .select(col("a"), col("b"), col("sim_t"))
      .ckpt(true)
    var selected = Vector.empty[(Long, Long, Long, Long)] // rank,id,rel,mmr
    for (k <- 1 to MmrK) {
      val selIds = selected.map(_._2)
      val remaining =
        if (selIds.isEmpty) pool else pool.filter(!col("vec_id").isInCollection(selIds))
      val scored =
        if (selIds.isEmpty)
          remaining.withColumn("mmr_t", lit(7L) * col("rel_t"))
        else {
          val ms = sims.filter(col("b").isInCollection(selIds))
            .groupBy(col("a").as("vec_id")).agg(max(col("sim_t")).as("ms"))
          remaining.join(ms, Seq("vec_id"), "left")
            .withColumn("mmr_t",
              lit(7L) * col("rel_t") - lit(3L) * coalesce(col("ms"), lit(0L)))
        }
      val m = scored
        .agg(max(struct(col("mmr_t"), (-col("vec_id")).as("nid"),
          col("rel_t").as("rt"))).as("m"))
        .select(col("m.mmr_t"), (-col("m.nid")).as("id"), col("m.rt"))
        .collect()(0)
      require(!m.isNullAt(0), s"s09: pool exhausted at step $k (corpus < ${MmrK + 1} vectors)")
      selected :+= ((k.toLong, m.getLong(1), m.getLong(2), m.getLong(0)))
    }
    selected.toDF("rank", "vec_id", "rel_ticks", "mmr_ticks")
      .orderBy(col("rank"))
  }

  /** Neighbors per vector for [[s05KnnJoin]] — small k is the k-NN
    * graph regime (SemDeDup adjacency, graph clustering), and output
    * is k rows per corpus vector, so k multiplies the result size.
    */
  private val KnnK = 3

  /** s05: k-NN join — the TOP-[[KnnK]] cosine neighbors of EVERY
    * corpus vector (not just a query block): the all-pairs primitive
    * behind k-NN-graph clustering, SemDeDup adjacency, and
    * diversity-aware sampling. Candidates come from the same
    * hyperplane banding as s02, but as a SELF-join on the bucket key
    * carrying IDS ONLY — embeddings are joined back exactly twice
    * (query side, neighbor side) after the pair set is distinct, so
    * the shuffle moves (band, id) rows and 2 embedding copies per
    * candidate pair, never a vector per band replica. Per-vector
    * top-k rides the bounded [[graft.functions.TopKByScore]]
    * aggregate (k-capped partial heaps — the shuffle carries ≤ k
    * pairs per map partition per vector).
    *
    * Scale shape: the self-join shuffles on (band_id, band_val) —
    * co-located, no broadcast needed at any corpus size; output is
    * exactly k rows per vector. Candidate generation goes through
    * [[Dedup.bucketPairs]] — the SAME tiered generator every banded
    * dedup operator uses: per-bucket counts first, buckets over
    * `maxBucket` dropped before any pair materializes (the documented
    * recall trade — and bits-per-band is [[annBitsFor]]-derived from
    * corpus size, so expected occupancy stays ≤ [[AnnTargetBucket]]
    * and the cap never becomes the common path at ANY corpus size),
    * mid-size buckets streaming their pairs through a self-join,
    * small buckets expanding in-array. No
    * banded candidate path in the library can go quadratic on a
    * degenerate (undifferentiated) embedding corpus.
    *
    * Vectors whose buckets contain no other vector produce no rows
    * (no candidates ⇒ no neighbors) — the honest LSH contract; s01 is
    * the exhaustive fallback.
    */
  /** Materialize-once k-NN graph per (session, sfDir, embeddings
    * fingerprint): s05 and s06 both consume it, and the driver
    * contract evaluates each operator standalone — the same memo
    * pattern (and staleness contract) as Dedup's cluster labels. The
    * graph is small (k rows per vector), so the eager checkpoint is
    * cheap and the second consumer reads stored blocks.
    */
  private val knnMemo = new graft.FrameMemo[org.apache.spark.sql.DataFrame]

  private def knnGraph(spark: SparkSession, sfDir: String): DataFrame =
    knnMemo.getOrCompute(spark, sfDir,
      Tables.fingerprint(spark, sfDir, "embeddings")) {
      knnGraphCompute(spark, sfDir).ckpt(true)
    }

  /** Materialize-once PCA loadings per (session, dir, embeddings
    * fingerprint) — s17 emits them and s18 projects onto them; the
    * Gram scan is the expensive part (the knnMemo rationale).
    */
  private val pcaMemo = new graft.FrameMemo[org.apache.spark.sql.DataFrame]

  /** Materialize-once NN-descent-refined graph — s20 reports it and
    * s33 beam-searches over it; the refinement rounds are the
    * expensive part (the knnMemo rationale, one level up).
    */
  private val refinedMemo = new graft.FrameMemo[org.apache.spark.sql.DataFrame]

  /** Persistent-RDD ids backing the live similarity memos — see
    * [[graft.FrameMemo]] for the bench-harness cleanup contract.
    */
  private[graft] def memoRetainedIds: Set[Int] =
    knnMemo.retainedIds ++ pcaMemo.retainedIds ++ refinedMemo.retainedIds ++
      momentsMemo.retainedIds

  /** Drop the similarity memos and unpersist their blocks. */
  private[graft] def clearMemos(): Unit = {
    knnMemo.clear(); pcaMemo.clear(); refinedMemo.clear(); momentsMemo.clear()
  }

  private def knnGraphCompute(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark)
    knnGraphFor(
      Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding")))
  }

  /** The k-NN-graph core over an arbitrary (vec_id, embedding) frame —
    * parameterized so the cap contract is spec-testable on adversarial
    * (all-identical-vector) corpora. Candidate (a < b) pairs come from
    * [[Dedup.bucketPairs]] — one orientation through the distinct
    * (HALF the shuffle volume), then mirrored, since the graph needs
    * both directions and candidacy is symmetric.
    */
  private[graft] def knnGraphFor(emb: DataFrame, k: Int = KnnK,
      maxBucket: Int = Dedup.MaxBucket,
      pairStream: Int = Dedup.PairStreamBucket,
      bitsOverride: Option[Int] = None): DataFrame = {
    val bits = bitsOverride.getOrElse(annBitsFor(emb.count()))
    val bands = annBanded(emb, "vec_id", "embedding", keepVec = false, bits = bits)
    val half = Dedup.bucketPairs(bands, Seq("band_id", "band_val"),
        col("vec_id"), maxBucket, pairStream)
      .select(col("a").as("query_id"), col("b").as("vec_id"))
    // Score each undirected candidate pair ONCE — cosine is symmetric
    // — then emit both directions of the SCORED row (the r16 s32/f02
    // struct-explode pattern). The old shape mirrored the ID pairs
    // first and so paid the two embedding joins and the kernel twice
    // per pair; at sf0.1 the candidate set is ~1.6 M pairs (the
    // banding is near-exhaustive on a 2 k corpus by design — bucket
    // occupancy ≈ 250), and the scored stage measured 13.0 s CPU of
    // which this halves the join + kernel work (r17, probe-measured).
    val scoredHalf = half
      .join(emb.select(col("vec_id").as("query_id"), col("embedding").as("qv")), "query_id")
      .join(emb, "vec_id")
      .select(col("query_id"), col("vec_id"),
        call_function("cosine_sim", col("qv"), col("embedding")).as("cos_raw"))
    val scored = scoredHalf.select(explode(array(
        struct(col("query_id"), col("vec_id"), col("cos_raw")),
        struct(col("vec_id").as("query_id"), col("query_id").as("vec_id"),
          col("cos_raw")))).as("x"))
      .select(col("x.query_id").as("query_id"), col("x.vec_id").as("vec_id"),
        col("x.cos_raw").as("cos_raw"))
    topKPerQuery(scored, k)
  }

  def s05KnnJoin(spark: SparkSession, sfDir: String): DataFrame =
    knnGraph(spark, sfDir).orderBy(col("query_id"), col("rank"))

  /** Refinement rounds for [[s20NnDescent]] — fixed (the g01 bound
    * contract), so the refined graph is a pure function of the
    * corpus and the oracle unrolls exactly this many rounds.
    */
  private[graft] val NnDescentRounds = 2

  /** Bottom-graph degree for the REFINED graph (s20/s33) — raised
    * from the s05 serve k of 3 (the r15 verdict task: the k = 3
    * floor was the documented recall limiter once s33's coarse layer
    * fixed the entry problem; degree caps the walk). The SEED stays
    * the memoized k = 3 s05 graph — NN-descent's candidate pool
    * (fwd ∪ rev ∪ two-hop) is what widens each node to up to
    * [[GraphDegree]] neighbors, so the seed build costs nothing
    * extra in a sweep. HNSW practice uses M = 8..48; 8 keeps the
    * per-hop beam expansion (b·[[GraphDegree]] candidate rows per
    * query) and the refine-round rescore (≤ 2k+(2k)² candidates per
    * node) inside the same bounded shapes.
    */
  private[graft] val GraphDegree = 8

  /** The NN-descent core (public algorithm: Dong, Moses & Li,
    * "Efficient k-nearest neighbor graph construction for generic
    * similarity measures", WWW 2011 — the construction behind
    * graph-based ANN indexes): start from an approximate k-NN graph
    * and repeat "a neighbor of my neighbor is probably my neighbor"
    * — candidates = forward ∪ reverse ∪ two-hop edges, exact-rescore,
    * keep top-k. Determinism: candidate sets are id sets (no float
    * state carries between rounds except the rounded cos used ONLY
    * to rank the reverse-edge cap); every top-k uses the
    * (score desc, id asc) total order both engines share.
    *
    * The hub guard: reverse edges are capped at k per node BY THE
    * BOUNDED AGGREGATE (top_k_by_score partial-aggregates with a
    * k-heap map-side), so a node that half the graph points at —
    * the power-law reality of similarity graphs — contributes k
    * reverse edges, not its in-degree, and no window ever sees an
    * unbounded group (the g09 lesson applied at birth). Candidate
    * volume per node is then ≤ 2k + (2k)² regardless of corpus
    * shape.
    */
  private[graft] def nnDescentFrom(emb: DataFrame, g0: DataFrame, k: Int,
      rounds: Int): DataFrame = {
    var g = g0.select(col("query_id"), col("neighbor_id").as("vec_id"),
        col("cos")).ckpt(true)
    var out: DataFrame = null
    for (_ <- 1 to rounds) {
      val fwd = g.select(col("query_id"), col("vec_id"))
      val rev = g.groupBy(col("vec_id"))
        .agg(call_function("top_k_by_score", col("cos"), col("query_id"),
          lit(k)).as("top"))
        .select(col("vec_id").as("query_id"), explode(col("top")).as("t"))
        .select(col("query_id"), col("t.id").as("vec_id"))
      val und = fwd.unionByName(rev).distinct().ckpt(true)
      val hop = und.join(
          und.select(col("query_id").as("vec_id"), col("vec_id").as("w")),
          "vec_id")
        .select(col("query_id"), col("w").as("vec_id"))
      val cands = und.unionByName(hop)
        .filter(col("query_id") =!= col("vec_id")).distinct()
      val scored = cands
        .join(emb.select(col("vec_id").as("query_id"),
          col("embedding").as("qv")), "query_id")
        .join(emb, "vec_id")
        .withColumn("cos_raw",
          call_function("cosine_sim", col("qv"), col("embedding")))
      out = topKPerQuery(scored, k).ckpt(true)
      g = out.select(col("query_id"), col("neighbor_id").as("vec_id"),
        col("cos"))
    }
    out
  }

  /** s20: NN-descent k-NN graph refinement — the modern production
    * ANN index family is GRAPH-based (HNSW/NSG all start from a
    * neighbor graph; the reference's ANN surface stops at
    * LSH-bucketed search, mllib/feature/... hashing), and this is
    * its construction primitive expressed Spark-first: s05's
    * LSH-bucket graph as the seed, [[NnDescentRounds]] bounded
    * refinement rounds ([[nnDescentFrom]]). Recall strictly improves
    * over the seed (spec-measured against the exact brute-force
    * graph); the memoized s05 graph is reused, so the seed costs
    * nothing extra in a sweep.
    *
    * Scale shape per round: the reverse cap is a partial-agg'd
    * bounded aggregate (hub-safe — see the core's doc); two-hop is
    * one self-equi-join of a ≤ 2k-out-degree edge list (≤ 4k² rows
    * per node); rescoring joins the corpus twice on its key
    * (embedding-sized rows move once per side); the final top-k is
    * the same bounded aggregate every ANN path uses. No windows over
    * unbounded groups anywhere.
    */
  /** The memoized NN-descent-refined graph (the s20 result frame) —
    * the seed knnGraph memo is computed BEFORE entering this memo
    * (the FrameMemo no-nested-compute contract).
    */
  private[graft] def refinedKnnGraph(
      spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark)
    val g0 = knnGraph(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    refinedMemo.getOrCompute(spark, sfDir,
      Tables.fingerprint(spark, sfDir, "embeddings") + s"|nnd$GraphDegree") {
      nnDescentFrom(emb, g0, GraphDegree, NnDescentRounds).ckpt(true)
    }
  }

  def s20NnDescent(spark: SparkSession, sfDir: String): DataFrame =
    refinedKnnGraph(spark, sfDir).orderBy(col("query_id"), col("rank"))

  /** Beam width (and the served top-k) for [[s33GraphAnn]]. */
  private[graft] val BeamWidth = 10

  /** Fixed greedy hops for [[s33GraphAnn]] — bounded like every
    * iterative key, unrolled by the oracle.
    */
  private[graft] val BeamHops = 3

  /** The graph-ANN beam-search core over an arbitrary corpus,
    * neighbor graph (query_id, neighbor_id edge list) and
    * (query_id, qv) query block: start from the `b` smallest corpus
    * ids (the deterministic flat-graph stand-in for HNSW's top-layer
    * entry), then `hops` rounds of expand-rescore-cut — candidates =
    * current beam ∪ its graph neighbors (beam inclusion makes the
    * best-in-beam cosine PROVABLY non-decreasing per hop), exact
    * cosine against the query, cut back to `b` by the bounded
    * top_k_by_score total order (cos desc, id asc). Self matches
    * excluded at scoring (the s01 convention).
    *
    * Scale shape per hop: the beam frame is queries×b rows; the
    * expansion join touches only beam rows against the k-out-degree
    * edge list (b·k candidates per query), rescoring is one keyed
    * join against the corpus (the HNSW serve is memory-resident —
    * the batch analog pays one keyed equi-join per hop), and the cut
    * is the same bounded aggregate every ANN path uses. Nothing
    * corpus-sized moves after the entry scan. Package-private for
    * the spec's planted chain graph.
    */
  /** Coarse entry-layer size for [[s33GraphAnn]] — a fixed-size
    * md5-ordered sample of the corpus (the 'hnsw:' stream), i.e. the
    * HNSW upper-layer hierarchy collapsed to ONE level: the query
    * brute-forces this bounded layer first and enters the bottom
    * graph at its per-query best members, instead of at a fixed
    * low-id entry set that may sit across the graph from the answer.
    * Corpus-independent cost: |queries| × [[CoarseSize]] cosines.
    * Production grows this log-style (more levels, each a sample of
    * the one below); one level already moves entries query-side —
    * the recall-uplift spec pins a planted case where the flat entry
    * set scores recall 0 and the layered one is exact at equal beam
    * cost.
    */
  private[graft] val CoarseSize = 256

  /** The (query_id, vec_id) entry candidates from the coarse layer:
    * every query crosses the broadcast layer; [[beamSearchFor]]'s
    * first scoring pass cuts it to the beam width — so the layer
    * probe reuses the beam's own top-k machinery.
    */
  private[graft] def coarseEntries(emb: DataFrame,
      queries: DataFrame): DataFrame =
    queries.select(col("query_id")).crossJoin(broadcast(
      emb.select(col("vec_id"))
        .orderBy(md5(concat(lit("hnsw:"), col("vec_id").cast("string"))),
          col("vec_id"))
        .limit(CoarseSize)))

  private[graft] def beamSearchFor(emb: DataFrame, graph: DataFrame,
      queries: DataFrame, b: Int, hops: Int,
      entries: Option[DataFrame] = None): DataFrame = {
    registerAll(emb.sparkSession)
    val cand0 = entries.getOrElse(
      queries.select(col("query_id")).crossJoin(broadcast(
        emb.select(col("vec_id")).orderBy(col("vec_id")).limit(b))))
    def score(cand: DataFrame): DataFrame = cand
      .filter(col("vec_id") =!= col("query_id"))
      .join(broadcast(queries), "query_id")
      .join(emb, "vec_id")
      .withColumn("cos_raw",
        call_function("cosine_sim", col("qv"), col("embedding")))
      .groupBy(col("query_id"))
      .agg(call_function("top_k_by_score",
        col("cos_raw"), col("vec_id"), lit(b)).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.id").as("vec_id"),
        col("t.score").as("cos_raw"), (col("pos") + 1).cast("long").as("rank"))
    var beam = score(cand0)
    for (_ <- 1 to hops) {
      val cand = beam.select(col("query_id"), col("vec_id"))
        .union(beam.select(col("query_id"), col("vec_id"))
          .join(graph.select(col("query_id").as("vec_id"),
            col("neighbor_id")), "vec_id")
          .select(col("query_id"), col("neighbor_id").as("vec_id")))
        .distinct()
      // truncate the lineage each hop (the nnDescentFrom pattern):
      // cand references beam twice, so an unbroken plan doubles per
      // hop — the engine-side analog of the oracle's MATERIALIZED
      beam = score(cand).ckpt(false)
    }
    beam.select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(col("cos_raw"), 4).as("cos"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** s33: graph-based ANN serve — beam search over the s20 refined
    * neighbor graph, the SEARCH half of the modern graph-ANN stack
    * (HNSW/NSG: Malkov & Yashunin 2016 — a greedy walk over a
    * neighbor graph; s20 builds the graph, this key serves queries
    * from it; the reference's ANN surface stops at LSH bucketing,
    * reference mllib/src/main/scala/org/apache/spark/ml/feature/
    * LSH.scala:1, which is exactly why the graph triad is the
    * engine's extension). Uses the SAME memoized refined graph as
    * s20 — one build backs both keys per sweep. Entries come from
    * the [[CoarseSize]] md5-sampled coarse layer ([[coarseEntries]]
    * — the HNSW hierarchy's first level), so the beam starts at the
    * query's best layer members instead of a fixed low-id set; the
    * deterministic layer + bounded hops keep the result a pure
    * corpus function. The bottom graph carries [[GraphDegree]] = 8
    * edges per node (HNSW-M-style; raised from the k = 3 recall
    * floor the r15 verdict flagged once the coarse layer fixed
    * entry) — residual recall is bounded by degree × hops, and
    * production adds more layers; the s11 pool→rerank recovery
    * applies.
    */
  def s33GraphAnn(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val queries = queriesBlock(spark, sfDir)
    beamSearchFor(emb,
      refinedKnnGraph(spark, sfDir).select(col("query_id"), col("neighbor_id")),
      queries, BeamWidth, BeamHops,
      entries = Some(coarseEntries(emb, queries)))
  }

  /** s06: k-NN classification over the [[s05KnnJoin]] graph — each
    * vector takes the cosine-weighted majority label of its
    * [[KnnK]] nearest neighbors: the weak-supervision auto-labeling /
    * label-spreading primitive (label a small seed set, let the
    * embedding geometry label the rest), with `correct` grading the
    * vote against the stored label. Vote weights are INTEGER 1/10000
    * ticks of the 4dp cosines — long sums are order-independent, so
    * the winning label is deterministic across partitionings and
    * bit-reproducible in the oracle (a double sum's last-ulp order
    * dependence could flip near-tied votes); label ties break to the
    * smaller label via the same struct-max argmax as q38.
    *
    * Scale shape: everything downstream of the k-NN graph is
    * per-vector bounded — ≤ k vote rows per vector, two partial-agg'd
    * aggregations (per-label sum, per-vector argmax), one broadcast-
    * free equi-join to the label column.
    */
  def s06KnnClassify(spark: SparkSession, sfDir: String): DataFrame = {
    val knn = knnGraph(spark, sfDir)
    val lbl = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("neighbor_id"), col("label").as("n_label"))
    val truth = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label").as("true_label"))
    val votes = knn.join(lbl, "neighbor_id")
      .withColumn("w", floor(col("cos") * 10000 + 0.5).cast("long"))
      .groupBy(col("query_id"), col("n_label"))
      .agg(sum(col("w")).as("wsum"), count(lit(1)).as("nv"))
    votes.groupBy(col("query_id"))
      .agg(max(struct(col("wsum"), (-col("n_label")).as("negl"))).as("m"),
        sum(col("nv")).as("n_votes"))
      .select(col("query_id").as("vec_id"), (-col("m.negl")).as("predicted_label"),
        col("n_votes"))
      .join(truth, "vec_id")
      .withColumn("correct", col("predicted_label") === col("true_label"))
      .select(col("vec_id"), col("predicted_label"), col("n_votes"),
        col("true_label"), col("correct"))
      .orderBy(col("vec_id"))
  }

  /** Quantize-then-dequantize SQL lambda over an `embedding` column,
    * given per-dimension `mins`/`maxs` array columns in scope: each
    * element maps to its nearest point on the 256-level affine grid
    * `mins[i] + k·(maxs[i]-mins[i])/255, k ∈ 0..255` (round-half-up
    * via floor(+0.5) — the value fed to the INT cast is already
    * integral, so Spark's truncating cast and DuckDB's rounding cast
    * agree), degenerate dims (max = min) pin to min. The grid
    * arithmetic is one fixed double expression tree evaluated
    * identically by both engines; the final double→float cast is
    * round-to-nearest-even in both. Package-private so the spec can
    * drive it on synthetic frames.
    */
  private[graft] val int8DequantizeSql: String =
    """transform(embedding, (x, i) ->
      |  CAST(CASE WHEN maxs[i] = mins[i] THEN mins[i]
      |    ELSE mins[i] + least(255, greatest(0,
      |      CAST(floor((CAST(x AS DOUBLE) - mins[i]) * 255.0 /
      |                 (maxs[i] - mins[i]) + 0.5) AS INT)))
      |      * (maxs[i] - mins[i]) / 255.0
      |  END AS FLOAT))""".stripMargin

  /** Corpus vectors quantized to the int8 grid and dequantized back
    * to floats: one partial-agg'd scan of the exploded embedding
    * derives the per-dimension min/max (a dim-sized frame collapsed
    * to ONE row of grid arrays, eagerly checkpointed so both the
    * probe and corpus sides reuse it), then the grid broadcast-joins
    * onto the corpus and the mapping runs map-side. Package-private
    * for the spec.
    */
  private[graft] def int8Dequantized(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    emb.crossJoin(broadcast(int8Grid(emb)))
      .select(col("vec_id"), expr(int8DequantizeSql).as("dq"))
  }

  /** The ONE-row per-dimension min/max grid frame behind the SQ8
    * family, eagerly checkpointed so every consumer reuses it.
    */
  private[graft] def int8Grid(emb: DataFrame): DataFrame = emb
    .select(posexplode(col("embedding")).as(Seq("i", "x")))
    .groupBy(col("i"))
    .agg(min(col("x").cast("double")).as("mn"), max(col("x").cast("double")).as("mx"))
    .agg(sort_array(collect_list(struct(col("i"), col("mn"), col("mx")))).as("g"))
    .select(expr("transform(g, s -> s.mn)").as("mins"),
      expr("transform(g, s -> s.mx)").as("maxs"))
    .ckpt(true)

  /** SQL producing the persisted SQ8 `code` column: the grid index
    * k ∈ 0..255 from [[int8DequantizeSql]]'s quantize half (identical
    * expression tree), shifted by −128 into the signed tinyint range
    * and packed one-byte-per-dim into a BINARY — dim bytes per
    * vector, the 4×-smaller-than-float32 layout the s10/s11 scaladocs
    * promise. Degenerate dims store code −128 (decode ignores it).
    */
  private[graft] val int8CodeSql: String =
    """int8_pack(transform(embedding, (x, i) ->
      |  CAST((CASE WHEN maxs[i] = mins[i] THEN 0
      |    ELSE least(255, greatest(0,
      |      CAST(floor((CAST(x AS DOUBLE) - mins[i]) * 255.0 /
      |                 (maxs[i] - mins[i]) + 0.5) AS INT)))
      |  END) - 128 AS TINYINT)))""".stripMargin

  /** SQL mapping a persisted `code` BINARY back to the dequantized
    * floats: unpack to signed bytes, shift back to k = c+128, then
    * the EXACT dequantize tree of [[int8DequantizeSql]] — k is the
    * same INT and the double arithmetic is the same expression, so
    * the round trip is bit-identical to the in-memory path (spec'd).
    */
  private[graft] val int8DecodeSql: String =
    """transform(int8_unpack(code), (c, i) ->
      |  CAST(CASE WHEN maxs[i] = mins[i] THEN mins[i]
      |    ELSE mins[i] + (CAST(c AS INT) + 128) * (maxs[i] - mins[i]) / 255.0
      |  END AS FLOAT))""".stripMargin

  /** Persist the SQ8 index: `outDir/codes` (vec_id, 64 B code) +
    * `outDir/grid` (ONE row of per-dim mins/maxs — the dequantize
    * dictionary). This is the production path s10/s11 describe: write
    * once, then every ANN probe scans the codes table (¼ the bytes of
    * the float corpus — footprint ratio spec'd) and dequantizes
    * inside the scan.
    */
  private[graft] def writeInt8Codes(spark: SparkSession, sfDir: String, outDir: String): Unit = {
    registerAll(spark)
    val emb = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val grid = int8Grid(emb)
    grid.write.mode("overwrite").parquet(s"$outDir/grid")
    emb.crossJoin(broadcast(grid))
      .select(col("vec_id"), expr(int8CodeSql).as("code"))
      .write.mode("overwrite").parquet(s"$outDir/codes")
  }

  /** Dequantized corpus read FROM the persisted codes table — same
    * (vec_id, dq) frame as [[int8Dequantized]], but the scan reads
    * dim bytes per vector instead of 4·dim. Bit-identical output
    * (spec'd): codes are the same k, the decode tree is the same
    * arithmetic.
    */
  private[graft] def int8DequantizedFromCodes(spark: SparkSession, outDir: String): DataFrame = {
    registerAll(spark)
    val codes = spark.read.parquet(s"$outDir/codes")
    val grid = spark.read.parquet(s"$outDir/grid")
    codes.crossJoin(broadcast(grid))
      .select(col("vec_id"), expr(int8DecodeSql).as("dq"))
  }

  /** s10: int8 scalar-quantized ANN — the memory/scan-shrink path for
    * exhaustive search at 100 TB: production persists the codes as a
    * 64 B/vector binary column (4× smaller than float32, the standard
    * vector-store SQ8 layout), so the brute-force probe reads a
    * quarter of the bytes and dequantizes on the fly inside the scan.
    * Search is s01's shape — broadcast the (quantized) query block,
    * scan the (quantized) corpus once, codegen cosine, bounded
    * per-query top-k — on the dequantized vectors; distance is
    * SYMMETRIC (query and corpus share one grid), so the DuckDB
    * oracle replicates both sides bit-exactly. Quantized cosines
    * differ from s01's exact ones — the recall cost of the 4×
    * compression is pinned in the spec (s10∩s01 top-10 overlap), the
    * standard accuracy/footprint trade every SQ8 deployment makes.
    */
  def s10AnnInt8(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark)
    val dq = int8Dequantized(spark, sfDir)
    val queries = dq.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("dq").as("qv"))
    topKPerQuery(dq.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_raw", call_function("cosine_sim", col("qv"), col("dq"))))
  }

  /** Stage-1 pool size for [[s11AnnRerank]]: candidates the quantized
    * scan hands to the exact rerank, per query.
    */
  private[graft] val RerankPool = 50

  /** s12: LSH index health report — the bucket-occupancy histogram an
    * operator watches before trusting (or re-tuning) the s02/s05
    * index: how many (band, signature) buckets hold how many vectors.
    * A healthy index concentrates mass near the expected occupancy
    * n/2^bits ([[annBitsFor]]'s design point); a fat tail means
    * correlated vectors are colliding (recall fine, probe cost
    * blowing up), an all-singleton histogram means the bands carry
    * more bits than the corpus needs (cost fine, recall at risk).
    * One banding pass + two partial-agg'd aggregations — the
    * monitoring query is strictly cheaper than the probe it guards.
    * Output: (bucket_size, n_buckets, n_vectors), where Σ n_vectors
    * = [[AnnBands]] · corpus size (every vector appears once per
    * band — invariant spec'd).
    */
  def s12AnnIndexStats(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark)
    val emb = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val bits = annBitsFor(emb.count())
    annBanded(emb, "vec_id", "embedding", keepVec = false, bits = bits)
      .groupBy(col("band_id"), col("band_val"))
      .agg(count(lit(1)).as("bucket_size"))
      .groupBy(col("bucket_size"))
      .agg(count(lit(1)).as("n_buckets"))
      .select(col("bucket_size"), col("n_buckets"),
        (col("bucket_size") * col("n_buckets")).as("n_vectors"))
      .orderBy(col("bucket_size"))
  }

  /** s11: two-stage ANN — the production vector-store shape that
    * makes SQ8 (s10) pay off end to end: the CHEAP pass scans the
    * int8-quantized corpus (4× smaller at 100 TB) and keeps a
    * [[RerankPool]]-candidate pool per query via the bounded top-k
    * aggregate; the EXPENSIVE pass computes exact float cosine only
    * on pool members (a candidates-only join back to the full-
    * precision vectors — 50 rows per query, not the corpus) and cuts
    * to the final top-10. Output cosines are EXACT (unlike s10's
    * quantized scores); with the pool 5× the answer size, the final
    * list matches s01's brute force on this corpus — pinned in the
    * spec, while the oracle replicates the two-stage pipeline itself
    * (pool cut included), so a borderline pool membership difference
    * can never hide.
    */
  def s11AnnRerank(spark: SparkSession, sfDir: String): DataFrame =
    s11Core(spark, sfDir, int8Dequantized(spark, sfDir))

  /** [[s11AnnRerank]] with the cheap pass reading the PERSISTED codes
    * table ([[writeInt8Codes]]) instead of quantizing in-flight — the
    * actual production deployment: the pool scan touches ¼ the bytes;
    * only the ≤50-row-per-query pool joins back to the full-precision
    * parquet. Spec'd bit-identical to the in-memory s11.
    */
  private[graft] def s11RerankFromCodes(spark: SparkSession, sfDir: String,
      codesDir: String): DataFrame =
    s11Core(spark, sfDir, int8DequantizedFromCodes(spark, codesDir))

  private def s11Core(spark: SparkSession, sfDir: String, dq: DataFrame): DataFrame = {
    registerAll(spark)
    val qQuant = dq.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("dq").as("qv"))
    val pool = dq.crossJoin(broadcast(qQuant))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("qcos", call_function("cosine_sim", col("qv"), col("dq")))
      .groupBy(col("query_id"))
      .agg(call_function("top_k_by_score", col("qcos"), col("vec_id"),
        lit(RerankPool)).as("top"))
      .select(col("query_id"), explode(col("top.id")).as("vec_id"))
    val exact = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val qExact = exact.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    topKPerQuery(pool
      .join(exact, "vec_id")
      .join(broadcast(qExact), "query_id")
      .withColumn("cos_raw", call_function("cosine_sim", col("qv"), col("embedding"))))
  }

  /** PQ geometry: [[PqM]] subspaces of [[PqSubDim]] dims each
    * (PqM · PqSubDim = [[EmbDim]]), [[PqK]] codebook entries per
    * subspace refined by [[PqIters]] fixed Lloyd rounds. 4 subspaces
    * × 8 entries = one 3-bit code per subspace — 12 bits ≈ 4 B per
    * vector against 256 B float32, the 64× compression end of the
    * vector-store spectrum (s10's SQ8 is the 4× end, s11 the rerank
    * that makes either pay off).
    */
  private[graft] val PqM = 4
  private[graft] val PqSubDim = 16
  private[graft] val PqK = 8
  private[graft] val PqIters = 2

  /** ADC tick scale: dot products and codebook norms quantize to
    * 2⁻²⁰ ticks (the s08 contract) so the per-vector sums over
    * subspaces are order-independent longs.
    */
  private[graft] val PqTick = 1048576.0

  /** (vec_id, m, sv): the corpus split into [[PqM]] subvectors per
    * row — one scan, no shuffle.
    */
  private def pqSubvectors(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), posexplode(expr(
        s"transform(sequence(0, ${PqM - 1}), m -> slice(embedding, m * $PqSubDim + 1, $PqSubDim))"))
      .as(Seq("m", "sv")))

  /** One PQ Lloyd round: argmin-L2² assignment per (vector, subspace)
    * (ties to the smaller code — min over a (d2, code, sv) struct),
    * then fixed-point subvector means per (m, code) — the
    * [[lloydRefine]] QuantScale contract, so the round is exact,
    * order-independent, and bit-replicated by the DuckDB oracle.
    * Codebook entries that captured no vectors keep their previous
    * centroid. The codebook stays a broadcast [[PqM]]·[[PqK]]-row
    * frame; assignment shuffles one row per (vector, subspace).
    */
  private def pqRefine(subs: DataFrame, cents: DataFrame): DataFrame = {
    val assigned = pqAssign(subs, cents)
    val sumCols = (0 until PqSubDim).map(j =>
      sum(floor(element_at(col("sv"), j + 1).cast("double") * QuantScale + 0.5)
        .cast("long")).as(s"s$j"))
    val refined = assigned.groupBy(col("m"), col("code"))
      .agg(count(lit(1)).as("n"), sumCols: _*)
      .select(col("m"), col("code"),
        array((0 until PqSubDim).map(j =>
          (col(s"s$j").cast("double") / (lit(QuantScale) * col("n"))).cast("float")): _*).as("cv"))
    val empty = cents.join(refined.select(col("m").as("rm"), col("code").as("rc")),
        col("m") === col("rm") && col("code") === col("rc"), "left_anti")
      .select(col("m"), col("code"), col("cv"))
    refined.union(empty).ckpt(true)
  }

  /** Argmin-L2² code per (vector, subspace): (vec_id, m, code, sv). */
  private def pqAssign(subs: DataFrame, cents: DataFrame): DataFrame =
    subs.join(broadcast(cents), "m")
      .withColumn("d2", call_function("l2_sq", col("sv"), col("cv")))
      .groupBy(col("vec_id"), col("m"))
      .agg(min(struct(col("d2"), col("code"), col("sv").as("v"))).as("mn"))
      .select(col("vec_id"), col("m"), col("mn.code").as("code"), col("mn.v").as("sv"))

  /** Trained PQ codebook: (m, code, cv) — md5-ordered seed sample
    * (the [[seedCentroids]] rule; codes 0..PqK-1 in sample order,
    * shared seed ids across subspaces — the sampled VECTORS seed
    * every subspace with their subvectors) refined by [[PqIters]]
    * rounds of [[pqRefine]]. Package-private for the spec.
    */
  private[graft] def pqCodebook(spark: SparkSession, sfDir: String): DataFrame =
    pqCodebookFrom(spark,
      Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding")))

  /** [[pqCodebook]] over any (vec_id, embedding) frame — the spec
    * trains on synthetic corpora where PQ is lossless.
    */
  private[graft] def pqCodebookFrom(spark: SparkSession, emb: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    registerAll(spark)
    val subs = pqSubvectors(emb)
    val seedIds = emb
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(PqK)
      .select(col("vec_id"),
        (row_number().over(Window.orderBy(md5(col("vec_id").cast("string")),
          col("vec_id"))) - 1).cast("long").as("code"))
    val c0 = subs.join(broadcast(seedIds), "vec_id")
      .select(col("m"), col("code"), col("sv").as("cv"))
      .ckpt(true)
    (1 to PqIters).foldLeft(c0)((c, _) => pqRefine(pqSubvectors(emb), c))
  }

  /** s14: product-quantization ANN (asymmetric distance computation)
    * — the third leg of the vector-store compression triad next to
    * IVF (s03) and SQ8 (s10): each vector is stored as [[PqM]]
    * 3-bit codebook indices (~64× smaller than float32), and search
    * never touches the corpus floats — per query the [[PqM]]·[[PqK]]
    * dot-product TABLE is precomputed against the codebook, and each
    * candidate's approximate cosine is a table LOOKUP sum:
    * adc ≈ Σ_m ⟨q_m, c_m(code_m)⟩ / (‖q‖ · √Σ_m ‖c_m(code_m)‖²)
    * (the standard PQ-for-inner-product estimator with the
    * codebook-reconstructed norm). Table entries and norms quantize
    * to 2⁻²⁰-tick longs ([[PqTick]]) so per-candidate sums are
    * order-independent and the DuckDB oracle replicates ranking and
    * scores bit-exactly; ranking ties break on vec_id.
    *
    * Scale shape: the codebook (32 rows) and per-query tables
    * (PqM·PqK·|Q| rows) broadcast; the corpus-side work is ONE
    * encode pass (argmin over a broadcast codebook, partial-agg'd)
    * and the ADC join carries [[PqM]] code rows per (vector, query)
    * into a partial-agg'd long sum — no floats move. At 100 TB the
    * codes table is the persisted index (the s10 write path applies
    * verbatim) and recall is recovered the s11 way: PQ pool → exact
    * rerank. Accuracy on THIS corpus is pinned in the spec at the
    * level 12-bit codes honestly deliver on near-uniform vectors —
    * the compression/recall trade every PQ deployment makes,
    * documented not hidden.
    */
  def s14PqAnn(spark: SparkSession, sfDir: String): DataFrame =
    s14From(spark,
      Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding")))

  /** [[s14PqAnn]] over any (vec_id, embedding) frame — spec entry. */
  private[graft] def s14From(spark: SparkSession, emb: DataFrame): DataFrame = {
    registerAll(spark)
    val codebook = pqCodebookFrom(spark, emb)
    val codes = pqAssign(pqSubvectors(emb), codebook).select(col("vec_id"), col("m"), col("code"))
    val cn = codebook.select(col("m"), col("code"),
      floor(call_function("dot_product", col("cv"), col("cv")) * PqTick + 0.5)
        .cast("long").as("ct"))
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val nq = q.select(col("query_id"),
      sqrt(call_function("dot_product", col("qv"), col("qv"))).as("nq"))
    val qsub = q.select(col("query_id"), posexplode(expr(
        s"transform(sequence(0, ${PqM - 1}), m -> slice(qv, m * $PqSubDim + 1, $PqSubDim))"))
      .as(Seq("m", "qsv")))
    val qtab = qsub.join(broadcast(codebook), "m")
      .select(col("query_id"), col("m"), col("code"),
        floor(call_function("dot_product", col("qsv"), col("cv")) * PqTick + 0.5)
          .cast("long").as("dt"))
    val adc = codes
      .join(broadcast(qtab.join(cn, Seq("m", "code"))), Seq("m", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("dt")).as("dts"), sum(col("ct")).as("cts"))
      .filter(col("cts") > 0)
      .join(broadcast(nq), "query_id")
      .withColumn("adc_raw",
        (col("dts").cast("double") / lit(PqTick)) /
          (col("nq") * sqrt(col("cts").cast("double") / lit(PqTick))))
    topKPerQuery(adc.withColumn("cos_raw", col("adc_raw")))
      .withColumnRenamed("cos", "adc_cos")
  }

  /** Principal components reported by [[s17Pca]]. */
  private[graft] val PcaComponents = 4

  /** Fixed power-iteration rounds per component — fixed (not
    * convergence-tested) so the result is a pure bounded function of
    * the corpus and the oracle unrolls exactly this many rounds (the
    * g01 contract).
    */
  private[graft] val PcaIters = 8

  /** Eigenvector ticks: loadings are max-normalized to ±2¹². */
  private[graft] val PcaGrid = 4096L

  /** Deflated-Gram clamp (±2²¹): the shared hard bound that keeps
    * every power-iteration product inside int64 regardless of
    * worst-case deflation growth; never binds on a PSD covariance.
    */
  private[graft] val PcaClamp = 2097152L

  /** s17: PCA over the embedding corpus — the linear
    * dimensionality-reduction companion to the SQ8/PQ quantizers
    * (reference: /root/reference/mllib/src/main/scala/org/apache/
    * spark/mllib/feature/PCA.scala:1, which computes the covariance
    * Gram and its top eigenvectors in-core on the driver): project
    * onto the top [[PcaComponents]] covariance eigenvectors BEFORE
    * quantizing and the same ANN bit budget buys more recall — the
    * standard pre-ANN compression chain (PCA → SQ8/PQ).
    *
    * All-integer determinism contract (the s13 family posture, no
    * shared float trees needed):
    *
    *  1. Coordinates quantize to the 2⁻¹⁰ grid (q = ⌊x·1024+0.5⌋ —
    *     the lloydRefine scale). ONE corpus scan builds the raw
    *     second-moment matrix P_ij = Σ q_i·q_j as a partial-agg'd
    *     (i, j) group (the per-row 64×64 outer product explodes
    *     map-side and combines immediately — the shuffle carries
    *     ≤ 64² rows per map task, never the corpus); a second cheap
    *     scan takes the first moments s_i. Production fuses the two
    *     into one 2 144-column aggregate (the q40 moment pattern).
    *  2. Centered Gram, exact: G_ij = n·P_ij − s_i·s_j (= n²·Cov).
    *     For unit-norm embeddings |G| ≤ 2n²·2²⁰, int64-safe to
    *     n ≈ 2·10⁶ vectors; beyond — the 100 TB corpus — the
    *     documented retune coarsens the coordinate grid to 2⁻⁶ and
    *     centers per partition before the global merge (the f02
    *     overflow convention).
    *  3. Rescale once to bounded ticks: Gs = G div max(gmax div 2²⁰,
    *     1) with gmax = max|G| — |Gs| ≤ 2²¹ keeps every later
    *     product under 2⁵⁷ with no further divisions.
    *  4. Per component: start at e_k (k = argmax diagonal, ties to
    *     the smaller dim), [[PcaIters]] rounds of w = Gs·v followed
    *     by MAX-norm renormalization to the ±[[PcaGrid]] grid
    *     (v = (w·4096) div max|w| — truncating toward zero, both
    *     engines agree on negatives); eigenvalue = Rayleigh ticks
    *     (vᵀGs·v) div (vᵀv); deflate Gs_ij −= (λ·v_i·v_j) div (vᵀv),
    *     then clamp to ±2²¹ ([[PcaClamp]] — never binds on a PSD-ish
    *     covariance, but turns the worst-case deflation growth bound
    *     from 65× per component into a hard invariant both engines
    *     share, keeping every product provably inside int64). Every
    *     sum is an exact order-independent long sum; every division
    *     a truncating integer div — bit-reproducible cross-engine
    *     with zero floating point.
    *
    * Only steps 1–2 touch the corpus. The eigensolve itself runs on
    * the DRIVER over the collected Gram — a FIXED 64×64 = 4 096-row
    * control-plane read, corpus-size-independent (the d07/s09
    * bounded-collect inventory) — exactly the reference PCA's
    * decomposition: distributed Gram, in-core eigensolve
    * (mllib/feature/PCA.scala computes Breeze eigs driver-side).
    * Driving 32 one-row normalization barriers through frames would
    * cost ~150 scheduler round-trips to move ≤ 64 longs each.
    * Output: (component, dim, loading_ticks, eigval_ticks), 4×64
    * rows.
    */
  def s17Pca(spark: SparkSession, sfDir: String): DataFrame = {
    // the Gram derives from the moments memo — resolve it BEFORE
    // entering pcaMemo's compute (the FrameMemo no-nested-compute
    // lock-order contract)
    val gram = gramFrame(spark, sfDir)
    pcaMemo.getOrCompute(spark, sfDir,
      Tables.fingerprint(spark, sfDir, "embeddings") + "|pca") {
      pcaComputeFrom(spark, gram).ckpt(true)
    }
  }

  /** The exact centered Gram ticks (i, j, g = n·P_ij − s_i·s_j) over
    * the quantized embedding corpus — ONE partial-agg'd moment scan,
    * shared by s17/s18's eigensolve and s19's correlation matrix.
    */
  /** Map-side outer-product moment scan over a frame with a LONG
    * array column `q`: P_ij = Σ q_i·q_j partial-aggregated to
    * ≤ d(d+1)/2 rows per task before any shuffle. Every consumer is
    * symmetric, so only the upper triangle is ever generated
    * ([[pairMomentsUpper]]); square-matrix consumers mirror the
    * aggregated frame ([[pairMomentsMirrored]]).
    */
  /** [[pairMoments]] restricted to the UPPER TRIANGLE (i ≤ j) at
    * generation time — the inner transform runs over slice(q, i+1, …)
    * so only 64·65/2 structs per row are built, exploded, and
    * aggregated (half the full pass). For symmetric consumers
    * (s29's cosine matrix, s31's sampled Gram) the lower triangle is
    * redundant by P_ij = P_ji; s17's eigensolve and s26's
    * full-matrix report keep the square pass.
    */
  /** Full symmetric moment matrix off ONE upper-triangle scan:
    * P_ij = Σ q_i·q_j is EXACTLY symmetric (integer products
    * commute), so the lower triangle mirrors from the aggregated
    * ≤ d(d+1)/2-row frame instead of doubling the per-row explode —
    * halves the dominant outer-product fan-out for the square-matrix
    * consumers (s17/s19's Gram, s26's rank Gram, s34's uncentered
    * Gram) with bit-identical values.
    */
  private def pairMomentsMirrored(qf: DataFrame): DataFrame =
    mirrorUpper(pairMomentsUpper(qf))

  /** Full symmetric matrix from an upper-triangle (i ≤ j, p) frame —
    * integer products commute, so the mirror is bit-exact.
    */
  private def mirrorUpper(up: DataFrame): DataFrame =
    up.unionByName(up.filter(col("i") =!= col("j"))
      .select(col("j").as("i"), col("i").as("j"), col("p")))

  /** One-pass kernel moment scan (r17): the old flatten/transform
    * explode built d(d+1)/2 struct rows PER CORPUS ROW and pushed
    * ~100 M rows through a hash aggregate at sf0.1; the
    * [[graft.functions.PairMoments]] typed aggregate accumulates the
    * same exact integer sums in one long buffer per partition (a
    * tight d²/2 multiply-add loop per row, one ≤ 17 KB partial per
    * map task). Bit-identical output rows (the kernel's sum/count
    * sentinel rows are filtered here; [[momentsBundle]] keeps them).
    */
  private def pairMomentsUpper(qf: DataFrame): DataFrame = {
    graft.functions.registerAll(qf.sparkSession)
    qf.agg(call_function("pair_moments", col("q")).as("m"))
      .select(explode(col("m")).as("t"))
      .filter(col("t.j") >= 0)
      .select(col("t.i").as("i"), col("t.j").as("j"), col("t.p").as("p"))
  }

  /** The shared ×1024 tick quantization of the embedding column —
    * ONE definition so every Gram-family consumer provably feeds the
    * same grid (and the memoized bundle below applies to all).
    */
  private val QuantizeSql: String =
    "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1024.0D + 0.5D) AS BIGINT))"

  /** Materialize-once second-moment bundle over the quantized
    * embedding corpus, per (session, sfDir, embeddings fingerprint) —
    * ONE kernel scan emits, in the same pass, everything the
    * Gram/correlation family re-derived corpus-wide per key:
    * rows (i, j, v) with j ≥ 0 are the upper-triangle moments
    * P_ij = Σ q_i·q_j; (i, -1, v) the per-dimension sums Σ q_i;
    * (-1, -1, v) the row count n. s17/s18 (centered Gram eigensolve),
    * s19 (centered Gram correlations), s29 (uncentered cosines),
    * s31 (exact norms + truth column) and s34 (uncentered Gram SVD)
    * all derive from this ≤ 2145-row frame, so the corpus
    * outer-product scan — the family's dominant cost — runs once per
    * sweep instead of once per key (the knnMemo rationale; guide
    * §1.2 "the distributed algorithm first": remove whole passes).
    */
  private val momentsMemo = new graft.FrameMemo[org.apache.spark.sql.DataFrame]

  private def momentsBundle(spark: SparkSession, sfDir: String): DataFrame =
    momentsMemo.getOrCompute(spark, sfDir,
      Tables.fingerprint(spark, sfDir, "embeddings") + "|moments") {
      registerAll(spark)
      Tables.embeddings(spark, sfDir)
        .select(expr(QuantizeSql).as("q"))
        .agg(call_function("pair_moments", col("q")).as("m"))
        .select(explode(col("m")).as("t"))
        .select(col("t.i").as("i"), col("t.j").as("j"), col("t.p").as("v"))
        .ckpt(true)
    }

  /** Upper-triangle moments (i ≤ j, p) of a [[momentsBundle]]. */
  private def upperMomentsOf(b: DataFrame): DataFrame =
    b.filter(col("j") >= 0).select(col("i"), col("j"), col("v").as("p"))

  /** Per-dimension sums (i, s) of a [[momentsBundle]]. */
  private def sumsOf(b: DataFrame): DataFrame =
    b.filter(col("j") === -1 && col("i") >= 0)
      .select(col("i"), col("v").as("s"))

  /** The 1-row corpus count (n) of a [[momentsBundle]]. */
  private def nOf(b: DataFrame): DataFrame =
    b.filter(col("i") === -1).select(col("v").as("n"))

  /** The exact centered Gram G_ij = n·P_ij − s_i·s_j off the memoized
    * bundle — every input is a ≤ 2145-row frame, so the joins are
    * broadcast-trivial and NO corpus scan runs here (r17; the old
    * form re-scanned the corpus three times per key for pairs, sums
    * and n).
    */
  private def gramFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val b = momentsBundle(spark, sfDir)
    val sums = sumsOf(b)
    mirrorUpper(upperMomentsOf(b))
      .join(broadcast(sums.select(col("i"), col("s").as("si"))), "i")
      .join(broadcast(sums.select(col("i").as("j"), col("s").as("sj"))), "j")
      .crossJoin(broadcast(nOf(b)))
      .select(col("i"), col("j"),
        (col("n") * col("p") - col("si") * col("sj")).as("g"))
  }

  /** Collect the rescaled Gram ticks of a (i, j, g) frame — the
    * bounded control-plane read: fixed 64×64 rows, corpus-size
    * independent. Shared by s17 (centered Gram) and s34 (uncentered).
    */
  private def collectGramTicks(g0: DataFrame): Array[Array[Long]] = {
    val gmax = g0.agg(greatest(max(abs(col("g"))), lit(1L)).as("gmax"))
    val gsRows = g0.crossJoin(broadcast(gmax))
      .select(col("i"), col("j"),
        expr("g div greatest(gmax div 1048576, 1)").as("g"))
      .collect()
    val G = Array.ofDim[Long](EmbDim, EmbDim)
    gsRows.foreach(r => G(r.getLong(0).toInt)(r.getLong(1).toInt) = r.getLong(2))
    G
  }

  /** Driver-side power-iteration / Rayleigh / clamped-deflation
    * eigensolve over a collected rescaled Gram — the in-core step
    * shared by s17's PCA and s34's SVD (the reference runs the same
    * split: distributed Gram, in-core decomposition —
    * mllib/linalg/distributed/RowMatrix.scala computeSVD). Mutates G;
    * returns (component, dim, v_ticks, eigval_ticks) rows, exact
    * integer arithmetic identical to the unrolled oracle CTEs.
    */
  private def powerDeflate(G: Array[Array[Long]]): Seq[(Long, Long, Long, Long)] = {
    val d = G.length
    val out = Seq.newBuilder[(Long, Long, Long, Long)]
    for (comp <- 0 until PcaComponents) {
      var k0 = 0
      for (i <- 1 until d) if (G(i)(i) > G(k0)(k0)) k0 = i
      var v = Array.tabulate(d)(i => if (i == k0) PcaGrid else 0L)
      for (_ <- 1 to PcaIters) {
        val w = Array.tabulate(d) { i =>
          var s = 0L; var j = 0
          while (j < d) { s += G(i)(j) * v(j); j += 1 }; s
        }
        val wm = math.max(w.map(math.abs).max, 1L)
        v = w.map(x => (x * PcaGrid) / wm)
      }
      // fully-deflated (zero) matrix => zero vector; guard the divisor
      val vtv = math.max(v.map(x => x * x).sum, 1L)
      var vgv = 0L
      for (i <- 0 until d; j <- 0 until d) vgv += G(i)(j) * v(j) * v(i)
      val lam = vgv / vtv
      for (i <- 0 until d; j <- 0 until d) {
        val g2 = G(i)(j) - lam * v(i) * v(j) / vtv
        G(i)(j) = math.max(math.min(g2, PcaClamp), -PcaClamp)
      }
      for (i <- 0 until d) out += ((comp.toLong, i.toLong, v(i), lam))
    }
    out.result()
  }

  private def pcaComputeFrom(spark: SparkSession, gram: DataFrame): DataFrame = {
    import spark.implicits._
    powerDeflate(collectGramTicks(gram))
      .toDF("component", "dim", "loading_ticks", "eigval_ticks")
      .orderBy(col("component"), col("dim"))
  }

  /** One component's power-iteration / Rayleigh / clamped-deflation
    * CTE block (suffix `c`), reading the previous deflated Gram.
    */
  private def pcaCompCtes(c: Int): String = {
    val prevGs = if (c == 0) "gs0" else s"gsd${c - 1}"
    val rounds = (1 to PcaIters).map { r =>
      val prevV = if (r == 1) s"vv${c}_0" else s"vv${c}_${r - 1}"
      s"""w${c}_$r AS MATERIALIZED (SELECT gs.i, CAST(sum(gs.g * v.vt) AS BIGINT) AS w
         |  FROM $prevGs gs JOIN $prevV v ON gs.j = v.j GROUP BY gs.i),
         |m${c}_$r AS MATERIALIZED (SELECT greatest(max(abs(w)), 1) AS wm FROM w${c}_$r),
         |vv${c}_$r AS MATERIALIZED (SELECT i AS j, (w * $PcaGrid) // (SELECT wm FROM m${c}_$r) AS vt
         |  FROM w${c}_$r WHERE (w * $PcaGrid) // (SELECT wm FROM m${c}_$r) <> 0)"""
        .stripMargin
    }
    val vF = s"vv${c}_$PcaIters"
    s"""k$c AS MATERIALIZED (SELECT i AS j, CAST($PcaGrid AS BIGINT) AS vt FROM $prevGs
       |  WHERE i = j ORDER BY g DESC, i LIMIT 1),
       |vv${c}_0 AS MATERIALIZED (SELECT j, vt FROM k$c),
       |${rounds.mkString(",\n")},
       |tv$c AS MATERIALIZED (
       |  SELECT coalesce(CAST(sum(vt * vt) AS BIGINT), 1) AS vtv FROM $vF),
       |lm$c AS MATERIALIZED (
       |  SELECT coalesce(CAST(sum(gs.g * vj.vt * vi.vt) AS BIGINT), 0)
       |    // (SELECT vtv FROM tv$c) AS lam
       |  FROM $prevGs gs JOIN $vF vj ON gs.j = vj.j JOIN $vF vi ON gs.i = vi.j),
       |gsd$c AS MATERIALIZED (SELECT gs.i, gs.j,
       |    greatest(least(
       |      gs.g - CASE WHEN vi.vt IS NOT NULL AND vj.vt IS NOT NULL
       |        THEN ((SELECT lam FROM lm$c) * vi.vt * vj.vt) // (SELECT vtv FROM tv$c)
       |        ELSE 0 END, $PcaClamp), -$PcaClamp) AS g
       |  FROM $prevGs gs LEFT JOIN $vF vi ON gs.i = vi.j
       |  LEFT JOIN $vF vj ON gs.j = vj.j),
       |out$c AS MATERIALIZED (SELECT CAST($c AS BIGINT) AS component, d.i AS dim,
       |    coalesce(v.vt, 0) AS loading_ticks,
       |    (SELECT lam FROM lm$c) AS eigval_ticks
       |  FROM sums d LEFT JOIN $vF v ON v.j = d.i)""".stripMargin
  }

  /** The full PCA CTE chain — quantized corpus (`base`, with
    * vec_id), moment scan, Gram rescale, and every component's
    * blocks. Shared by the s17 and s18 oracles.
    */
  /** The quantized-corpus + moment-scan + centered-Gram CTEs —
    * shared by the PCA chain and the s19 correlation oracle.
    */
  private def pcaGramCtes: String =
    """base AS MATERIALIZED (
      |  SELECT vec_id, list_transform(embedding,
      |    x -> CAST(floor(CAST(x AS DOUBLE) * 1024.0 + 0.5) AS BIGINT)) AS q
      |  FROM embeddings),
      |nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
      |sums AS MATERIALIZED (SELECT CAST(a.i AS BIGINT) AS i, CAST(sum(q[a.i + 1]) AS BIGINT) AS s
      |  FROM base, UNNEST(generate_series(0, 63)) AS a(i) GROUP BY 1),
      |pr AS MATERIALIZED (SELECT CAST(a.i AS BIGINT) AS i, CAST(b.j AS BIGINT) AS j,
      |    CAST(sum(q[a.i + 1] * q[b.j + 1]) AS BIGINT) AS p
      |  FROM base, UNNEST(generate_series(0, 63)) AS a(i),
      |       UNNEST(generate_series(0, 63)) AS b(j)
      |  GROUP BY 1, 2),
      |g0 AS MATERIALIZED (SELECT p.i, p.j, (SELECT n FROM nn) * p.p - si.s * sj.s AS g
      |  FROM pr p JOIN sums si ON si.i = p.i JOIN sums sj ON sj.i = p.j)""".stripMargin

  private def pcaCtes: String =
    s"""$pcaGramCtes,
       |gm AS MATERIALIZED (SELECT greatest(max(abs(g)), 1) AS gmax FROM g0),
       |gs0 AS MATERIALIZED (SELECT i, j, g // greatest((SELECT gmax FROM gm) // 1048576, 1) AS g
       |  FROM g0),
       |${(0 until PcaComponents).map(pcaCompCtes).mkString(",\n")}""".stripMargin

  /** The DuckDB twin of [[s17Pca]]: the same integer moment scan,
    * Gram rescale, and unrolled power-iteration/deflation rounds.
    */
  private[graft] def pcaOracleSql: String = {
    val union = (0 until PcaComponents).map(c => s"SELECT * FROM out$c")
      .mkString("\nUNION ALL\n")
    s"""WITH $pcaCtes
       |SELECT component, dim, loading_ticks, eigval_ticks FROM (
       |$union
       |) ORDER BY component, dim""".stripMargin
  }

  /** Exact integer square root: the largest s ≥ 0 with s² ≤ x. The
    * double sqrt seed is within 1 ulp for x < 2⁵³, so one correction
    * step each way lands exactly — the SAME correction the oracle
    * applies in SQL, making σ bit-reproducible cross-engine.
    */
  private[graft] def isqrt(x: Long): Long = {
    if (x <= 0L) 0L
    else {
      var s = math.sqrt(x.toDouble).toLong
      while (s > 0 && s * s > x) s -= 1
      while ((s + 1) * (s + 1) <= x) s += 1
      s
    }
  }

  /** s34: distributed SVD of the embedding matrix — the
    * `RowMatrix.computeSVD` surface (reference: /root/reference/
    * mllib/src/main/scala/org/apache/spark/mllib/linalg/distributed/
    * RowMatrix.scala:200, which Grams A'A distributed, eigensolves
    * in-core, and takes σ = √λ): the s17 machinery on the UNCENTERED
    * second-moment matrix. Per top-[[PcaComponents]] component k the
    * report carries the right-singular vector ticks (the eigensolve's
    * v), the Gram eigenvalue λ ticks, σ ticks = [[isqrt]](max(λ, 0))
    * (exact integer sqrt — the double seed + shared correction makes
    * both engines agree bit-for-bit), and the DISTRIBUTED check the
    * verdict asked for: proj_l1 = Σ_rows |q·v| div 2¹² — the
    * projected left-side mass A·v_k, computed by ONE corpus scan with
    * all K loading vectors inlined (they are driver-held 64-long
    * arrays after the bounded eigensolve — the broadcast-literal
    * pattern), abs before div so truncation is floor in both engines.
    *
    * Scale shape: identical to s17 — one partial-agg'd moment scan to
    * a fixed 64×64 Gram (map-side outer product, shuffle ≤ 64² rows
    * per task), one fixed-size control-plane read, in-core bounded
    * eigensolve, then one more partial-agg'd scan for the projection
    * check. Nothing grows with the corpus except the two scans.
    */
  def s34Svd(spark: SparkSession, sfDir: String): DataFrame =
    // uncentered Gram off the memoized moments bundle (r17): the only
    // corpus scan left in this key is the projection pass
    svdCore(
      Tables.embeddings(spark, sfDir).select(col("embedding")),
      mirrorUpper(upperMomentsOf(momentsBundle(spark, sfDir))))

  /** [[s34Svd]] on an explicit embeddings frame — package-private so
    * the spec can pin exact σ/loading/projection ticks on a planted
    * low-rank corpus. Computes its own moments inline (spec corpora
    * are tiny; the sfDir entry above rides the memo).
    */
  private[graft] def svdFor(emb: DataFrame): DataFrame =
    svdCore(emb.select(col("embedding")),
      pairMomentsMirrored(emb.select(expr(QuantizeSql).as("q"))))

  /** The SVD assembly over an embeddings frame and its uncentered
    * moment matrix (i, j, p) — eigensolve in-core, then ONE corpus
    * scan for all K projection masses with the quantization inlined.
    */
  private def svdCore(emb: DataFrame, moments: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val g0 = moments.select(col("i"), col("j"), col("p").as("g"))
    val comps = powerDeflate(collectGramTicks(g0))
    val loadings = comps.toDF("component", "dim", "loading_ticks", "eigval_ticks")
    val vByComp = comps.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toArray).toMap
    // one corpus scan, all K projection masses partial-agg'd at once
    val projCols = (0 until PcaComponents).map { c =>
      val vs = vByComp(c.toLong).map(v => s"${v}L").mkString(", ")
      sum(expr(
        s"abs(aggregate(zip_with($QuantizeSql, array($vs), (x, y) -> x * y), 0L," +
          " (acc, t) -> acc + t)) div 4096")).as(s"pj_$c")
    }
    val pj = emb.agg(projCols.head, projCols.tail: _*)
    val projCase = (0 until PcaComponents)
      .map(c => s"WHEN $c THEN pj_$c").mkString("CASE component ", " ", " END")
    loadings.crossJoin(broadcast(pj))
      .select(col("component"), col("dim"), col("loading_ticks"),
        col("eigval_ticks"),
        sigmaTicks(col("eigval_ticks")).as("sigma_ticks"),
        expr(projCase).as("proj_l1"))
      .orderBy(col("component"), col("dim"))
  }

  /** σ ticks as ONE shared SQL expression over the eigenvalue column:
    * double-sqrt seed + the two-sided exact correction (the [[isqrt]]
    * contract rendered in SQL so Spark and DuckDB agree bit-for-bit).
    */
  private def sigmaTicks(lam: org.apache.spark.sql.Column):
      org.apache.spark.sql.Column = {
    val l = greatest(lam, lit(0L))
    val s0 = floor(sqrt(l.cast("double"))).cast("long")
    when((s0 + 1) * (s0 + 1) <= l, s0 + 1)
      .when(s0 * s0 > l, s0 - 1)
      .otherwise(s0)
  }

  /** The DuckDB twin of [[s34Svd]]: the pca CTE chain on the
    * UNCENTERED Gram (g0 = raw pair moments), plus per component the
    * σ correction and the projected-mass scan.
    */
  private[graft] def svdOracleSql: String = {
    val extras = (0 until PcaComponents).map { c =>
      s"""sg$c AS MATERIALIZED (
         |  SELECT greatest((SELECT lam FROM lm$c), 0) AS l),
         |sq$c AS MATERIALIZED (
         |  SELECT l, CAST(floor(sqrt(CAST(l AS DOUBLE))) AS BIGINT) AS s0
         |  FROM sg$c),
         |si$c AS MATERIALIZED (
         |  SELECT CASE WHEN (s0 + 1) * (s0 + 1) <= l THEN s0 + 1
         |              WHEN s0 * s0 > l THEN s0 - 1 ELSE s0 END AS sigma
         |  FROM sq$c),
         |pj$c AS MATERIALIZED (
         |  SELECT coalesce(CAST(sum(abs(pp) // 4096) AS BIGINT), 0) AS proj
         |  FROM (SELECT b.rid, CAST(sum(b.q[v.j + 1] * v.vt) AS BIGINT) AS pp
         |        FROM baser b, vv${c}_$PcaIters v GROUP BY b.rid)),
         |outx$c AS MATERIALIZED (
         |  SELECT o.component, o.dim, o.loading_ticks, o.eigval_ticks,
         |    (SELECT sigma FROM si$c) AS sigma_ticks,
         |    (SELECT proj FROM pj$c) AS proj_l1
         |  FROM out$c o)""".stripMargin
    }
    val union = (0 until PcaComponents).map(c => s"SELECT * FROM outx$c")
      .mkString("\nUNION ALL\n")
    s"""WITH baser AS MATERIALIZED (
       |  SELECT vec_id AS rid, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 1024.0 + 0.5) AS BIGINT)) AS q
       |  FROM embeddings),
       |sums AS MATERIALIZED (SELECT CAST(a.i AS BIGINT) AS i
       |  FROM UNNEST(generate_series(0, 63)) AS a(i)),
       |g0 AS MATERIALIZED (SELECT CAST(a.i AS BIGINT) AS i,
       |    CAST(b.j AS BIGINT) AS j,
       |    CAST(sum(q[a.i + 1] * q[b.j + 1]) AS BIGINT) AS g
       |  FROM baser, UNNEST(generate_series(0, 63)) AS a(i),
       |       UNNEST(generate_series(0, 63)) AS b(j)
       |  GROUP BY 1, 2),
       |gm AS MATERIALIZED (SELECT greatest(max(abs(g)), 1) AS gmax FROM g0),
       |gs0 AS MATERIALIZED (
       |  SELECT i, j, g // greatest((SELECT gmax FROM gm) // 1048576, 1) AS g
       |  FROM g0),
       |${(0 until PcaComponents).map(pcaCompCtes).mkString(",\n")},
       |${extras.mkString(",\n")}
       |SELECT component, dim, loading_ticks, eigval_ticks, sigma_ticks,
       |  proj_l1 FROM (
       |$union
       |) ORDER BY component, dim""".stripMargin
  }

  /** s18: ANN in the PCA-projected space — the pre-ANN compression
    * chain [[s17Pca]] documents, made executable: project every
    * vector onto the top [[PcaComponents]] loadings (64 dims →
    * 4 integer ticks, a 16× width cut BEFORE any quantizer) and
    * rank neighbors by the projected dot product. The production
    * recovery for the rank-truncation recall loss is s11's
    * pool → exact-rerank, same as SQ8/PQ.
    *
    * Exactness: projections p = Σ q_j·v_kj are exact long sums
    * (|q| ≤ 2¹⁰ ticks on unit vectors, |v| ≤ 2¹² ⇒ |p| ≤ 2²⁵);
    * a projected dot ≤ 4·2⁵⁰ = 2⁵² — inside both int64 and the
    * double-exact range, so the bounded top-k aggregate's double
    * scores compare exactly and ties break (score desc, id asc) in
    * both engines. Output: (query_id, neighbor_id, proj_ticks,
    * rank).
    *
    * Scale shape: loadings are a fixed 256-row broadcast; the
    * projection is one partial-agg'd pass over the exploded corpus
    * (vec_id-local, no shuffle growth); search is the s01 shape —
    * broadcast 5 pivoted query rows, one corpus scan, bounded
    * top-k.
    */
  def s18PcaAnn(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark)
    val load = s17Pca(spark, sfDir)
      .select(col("component"), col("dim"), col("loading_ticks"))
    val proj = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), posexplode(expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1024.0D + 0.5D) AS BIGINT))"))
        .as(Seq("dim0", "qt")))
      .join(broadcast(load), col("dim0") === col("dim"))
      .groupBy(col("vec_id"), col("component"))
      .agg(sum(col("qt") * col("loading_ticks")).as("p"))
      .groupBy(col("vec_id"))
      .agg(
        sum(when(col("component") === 0, col("p")).otherwise(lit(0L))).as("p0"),
        (1 until PcaComponents).map(k =>
          sum(when(col("component") === k, col("p")).otherwise(lit(0L)))
            .as(s"p$k")): _*)
      .ckpt(true)
    val qp = proj.filter(col("vec_id") < 5)
      .select(Seq(col("vec_id").as("query_id")) ++
        (0 until PcaComponents).map(k => col(s"p$k").as(s"q$k")): _*)
    val score = (0 until PcaComponents)
      .map(k => col(s"p$k") * col(s"q$k")).reduce(_ + _)
    topKPerQuery(proj.crossJoin(broadcast(qp))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("cos_raw", score.cast("double")))
      .select(col("query_id"), col("neighbor_id"),
        col("cos").cast("long").as("proj_ticks"), col("rank"))
  }

  /** The DuckDB twin of [[s18PcaAnn]]: the shared PCA chain, the
    * integer projection, and the windowed top-k (the oracle is not
    * perf-graded, so a plain row_number stands in for the bounded
    * aggregate — exact BIGINT ordering either way).
    */
  private[graft] def s18OracleSql: String = {
    val lo = (0 until PcaComponents).map(c =>
      s"SELECT CAST($c AS BIGINT) AS component, j AS dim, vt FROM vv${c}_$PcaIters")
      .mkString("\nUNION ALL\n")
    s"""WITH $pcaCtes,
       |lo AS MATERIALIZED (
       |$lo),
       |pj AS MATERIALIZED (
       |  SELECT b.vec_id, l.component, CAST(sum(b.q[a.i + 1] * l.vt) AS BIGINT) AS p
       |  FROM base b, UNNEST(generate_series(0, 63)) AS a(i), lo l
       |  WHERE l.dim = a.i GROUP BY 1, 2),
       |sc AS (
       |  SELECT qp.vec_id AS query_id, cp.vec_id AS neighbor_id,
       |    CAST(sum(qp.p * cp.p) AS BIGINT) AS s
       |  FROM pj qp JOIN pj cp ON qp.component = cp.component
       |  WHERE qp.vec_id < 5 AND cp.vec_id <> qp.vec_id
       |  GROUP BY 1, 2),
       |rk AS (
       |  SELECT query_id, neighbor_id, s,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY s DESC, neighbor_id) AS BIGINT) AS rank
       |  FROM sc)
       |SELECT query_id, neighbor_id, s AS proj_ticks, rank
       |FROM rk WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin
  }

  /** s19: Pearson correlation matrix of the embedding dimensions —
    * the reference's mllib/stat correlation surface (reference:
    * /root/reference/mllib/src/main/scala/org/apache/spark/mllib/
    * stat/Statistics.scala:1, corr(X, "pearson")), read off the SAME
    * exact centered Gram one moment scan builds for s17:
    * corr_ij = G_ij / √(G_ii·G_jj). The diagonal product can exceed
    * int64 (G ≤ ~2⁴³ each at the documented corpus bound), so both
    * engines compute it in double with the IDENTICAL expression tree
    * — correctly-rounded ×, √, ÷ on exactly-converted operands —
    * then floor-quantize to 2²⁰ ticks; a zero-variance dimension
    * (G_ii = 0) emits 0 ticks by a shared CASE. Output:
    * (dim_i, dim_j, corr_ticks), 64² rows; the matrix a feature
    * pipeline reads before whitening/decorrelating (the PCA
    * companion diagnostic).
    *
    * Scale shape: identical to s17 steps 1–2 — one partial-agg'd
    * corpus scan; everything after is a 64²-row frame.
    */
  def s19CorrMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    val g0 = gramFrame(spark, sfDir).ckpt(true)
    val diag = g0.filter(col("i") === col("j"))
      .select(col("i").as("d"), col("g").as("gd"))
    g0.join(broadcast(diag.select(col("d").as("i"), col("gd").as("gii"))), "i")
      .join(broadcast(diag.select(col("d").as("j"), col("gd").as("gjj"))), "j")
      .select(col("i").as("dim_i"), col("j").as("dim_j"),
        expr("""CASE WHEN gii > 0 AND gjj > 0
               |THEN CAST(floor(CAST(g AS DOUBLE)
               |  / sqrt(CAST(gii AS DOUBLE) * CAST(gjj AS DOUBLE))
               |  * 1048576.0D + 0.5D) AS BIGINT)
               |ELSE CAST(0 AS BIGINT) END""".stripMargin).as("corr_ticks"))
      .orderBy(col("dim_i"), col("dim_j"))
  }

  /** The DuckDB twin of [[s19CorrMatrix]]: the shared Gram CTEs and
    * the identical double tree.
    */
  private[graft] def s19OracleSql: String =
    s"""WITH $pcaGramCtes,
       |dg AS MATERIALIZED (SELECT i AS d, g AS gd FROM g0 WHERE i = j)
       |SELECT g0.i AS dim_i, g0.j AS dim_j,
       |  CASE WHEN di.gd > 0 AND dj.gd > 0
       |  THEN CAST(floor(CAST(g0.g AS DOUBLE)
       |    / sqrt(CAST(di.gd AS DOUBLE) * CAST(dj.gd AS DOUBLE))
       |    * 1048576.0 + 0.5) AS BIGINT)
       |  ELSE CAST(0 AS BIGINT) END AS corr_ticks
       |FROM g0 JOIN dg di ON di.d = g0.i JOIN dg dj ON dj.d = g0.j
       |ORDER BY dim_i, dim_j""".stripMargin

  /** s26: SPEARMAN rank correlation of the embedding dimensions —
    * the other half of the reference's correlation surface next to
    * s19's Pearson (reference: /root/reference/mllib/src/main/scala/
    * org/apache/spark/mllib/stat/correlation/
    * SpearmanCorrelation.scala:1, which likewise ranks each column
    * then runs Pearson on the ranks).
    *
    * Rank contract (the q54 midrank posture): values quantize to the
    * shared 2¹⁰ tick grid (defined-on-quantized-values stated), and
    * per dimension the DOUBLED tie-aware midrank comes off the
    * grid's CDF — 2R = 2·before + c + 1, an exact integer, computed
    * on a frame bounded by the VALUE RANGE × 64 dims, never the
    * corpus. Ranks center by (n+1) (Σ2R = n(n+1) is the midrank
    * invariant, so 2R − (n+1) is exactly mean-zero — the centered
    * Gram needs no n·P − S·S clearing at all, and a CONSTANT
    * dimension centers to exactly 0, making zero-variance fall out
    * of the same CASE as s19). ρ_ij = P_ij/√(P_ii·P_jj) over
    * P = Σ m_i·m_j — exact longs (|m| < 2n ⇒ |P| ≤ 4n³, safe to
    * n ≈ 1.3·10⁶; documented retune = coarser rank grid — divide m
    * by 2ᵏ — or the s13 two-level sum), with only the final
    * normalization in double through the IDENTICAL s19 tree, floored
    * to 2²⁰ ticks.
    *
    * Scale shape: one exploded scan builds the grid counts (map-side
    * combine to grid size); the rank map broadcasts back; per-vector
    * rank arrays reassemble on ONE vec-keyed shuffle; then the s17
    * map-side outer-product scan partial-aggregates straight to the
    * 64×64 result. No corpus window anywhere — the per-dim CDF
    * window runs over grid-bounded partitions.
    */
  def s26Spearman(spark: SparkSession, sfDir: String): DataFrame =
    spearmanCore(Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")))

  /** The Spearman core over any (vec_id, embedding float array)
    * frame — package-private for the planted monotone/reverse/
    * constant spec.
    */
  private[graft] def spearmanCore(vecs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val exploded = vecs
      .select(col("vec_id"), posexplode(expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1024.0D + 0.5D) AS BIGINT))"))
        .as(Seq("pi", "t")))
      .select(col("vec_id"), col("pi").cast("long").as("i"), col("t"))
      .ckpt(true)
    val nf = vecs.agg(count(lit(1)).as("n"))
    val grid = exploded.groupBy(col("i"), col("t"))
      .agg(count(lit(1)).as("c"))
      .withColumn("before", coalesce(sum(col("c")).over(
        Window.partitionBy(col("i")).orderBy(col("t"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .crossJoin(broadcast(nf))
      .select(col("i"), col("t"),
        (lit(2L) * col("before") + col("c") + lit(1L) - (col("n") + lit(1L)))
          .as("m"))
    val ranks = exploded.join(broadcast(grid), Seq("i", "t"))
      .groupBy(col("vec_id"))
      .agg(collect_list(struct(col("i"), col("m"))).as("im"))
      .select(expr("transform(array_sort(im), s -> s.m)").as("q"))
    val p0 = pairMomentsMirrored(ranks).ckpt(true)
    val diag = p0.filter(col("i") === col("j"))
      .select(col("i").as("d"), col("p").as("pd"))
    p0.join(broadcast(diag.select(col("d").as("i"), col("pd").as("pii"))), "i")
      .join(broadcast(diag.select(col("d").as("j"), col("pd").as("pjj"))), "j")
      .select(col("i").as("dim_i"), col("j").as("dim_j"),
        expr("""CASE WHEN pii > 0 AND pjj > 0
               |THEN CAST(floor(CAST(p AS DOUBLE)
               |  / sqrt(CAST(pii AS DOUBLE) * CAST(pjj AS DOUBLE))
               |  * 1048576.0D + 0.5D) AS BIGINT)
               |ELSE CAST(0 AS BIGINT) END""".stripMargin).as("rho_ticks"))
      .orderBy(col("dim_i"), col("dim_j"))
  }

  /** The DuckDB twin of [[s26Spearman]]: grid CDF midranks, centered
    * rank Gram via a vec-keyed self-join, the identical double tree.
    */
  private[graft] def s26OracleSql: String =
    """WITH e AS MATERIALIZED (
      |  SELECT vec_id, CAST(a.i AS BIGINT) AS i,
      |    CAST(floor(CAST(embedding[a.i + 1] AS DOUBLE) * 1024.0 + 0.5)
      |      AS BIGINT) AS t
      |  FROM embeddings, UNNEST(generate_series(0, 63)) AS a(i)),
      |nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
      |grid AS MATERIALIZED (
      |  SELECT i, t, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY 1, 2),
      |mg AS MATERIALIZED (
      |  SELECT i, t,
      |    2 * coalesce(CAST(sum(c) OVER (PARTITION BY i ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
      |      + c + 1 - ((SELECT n FROM nn) + 1) AS m
      |  FROM grid),
      |r AS MATERIALIZED (
      |  SELECT e.vec_id, e.i, mg.m FROM e JOIN mg ON e.i = mg.i AND e.t = mg.t),
      |p AS MATERIALIZED (
      |  SELECT a.i AS i, b.i AS j, CAST(sum(a.m * b.m) AS BIGINT) AS p
      |  FROM r a JOIN r b ON a.vec_id = b.vec_id GROUP BY 1, 2),
      |dg AS MATERIALIZED (SELECT i AS d, p AS pd FROM p WHERE i = j)
      |SELECT p.i AS dim_i, p.j AS dim_j,
      |  CASE WHEN di.pd > 0 AND dj.pd > 0
      |  THEN CAST(floor(CAST(p.p AS DOUBLE)
      |    / sqrt(CAST(di.pd AS DOUBLE) * CAST(dj.pd AS DOUBLE))
      |    * 1048576.0 + 0.5) AS BIGINT)
      |  ELSE CAST(0 AS BIGINT) END AS rho_ticks
      |FROM p JOIN dg di ON di.d = p.i JOIN dg dj ON dj.d = p.j
      |ORDER BY dim_i, dim_j""".stripMargin

  /** s29: pairwise column cosine similarities of the embedding
    * dimensions — the reference's distributed-matrix headline API
    * (reference: /root/reference/mllib/src/main/scala/org/apache/
    * spark/mllib/linalg/distributed/RowMatrix.scala:1,
    * `columnSimilarities`, whose DIMSUM variant samples rows to
    * bound shuffle at millions of columns — Zadeh & Carlsson 2013).
    * At this 64-column width the EXACT computation is the right
    * plan and the one a hash-verified engine ships: the UNCENTERED
    * integer Gram P = Σ q_i·q_j off the shared map-side
    * outer-product scan (one corpus pass, ≤ 64² rows per task —
    * exactly the brute-force branch DIMSUM itself takes under its
    * threshold), cos_ij = P_ij/√(P_ii·P_jj) through the identical
    * s19 double tree, zero-norm columns emitting 0 by the shared
    * CASE. Upper triangle only (i ≤ j), the RowMatrix contract. The
    * DIMSUM sampling path — the 10⁶-column retune this grid never
    * needs — is no longer just documented: it ships EXECUTABLE as
    * [[s31DimsumSampled]] with a per-pair error contract.
    */
  def s29ColSimilarity(spark: SparkSession, sfDir: String): DataFrame =
    // the uncentered upper moments come straight off the memoized
    // bundle (r17) — NO corpus scan runs in this key at all
    colSimTail(upperMomentsOf(momentsBundle(spark, sfDir)))

  /** The column-similarity core over any (embedding float array)
    * frame — package-private for the planted-poles spec. Computes its
    * own moments inline; the sfDir entry above rides the memo.
    */
  private[graft] def colSimCore(vecs: DataFrame): DataFrame = {
    val qf = vecs.select(expr(QuantizeSql).as("q")).ckpt(true)
    colSimTail(pairMomentsUpper(qf).ckpt(true))
  }

  /** The cosine tail over an upper-triangle (i ≤ j, p) moment frame. */
  private def colSimTail(p0: DataFrame): DataFrame = {
    val diag = p0.filter(col("i") === col("j"))
      .select(col("i").as("d"), col("p").as("pd"))
    p0.join(broadcast(diag.select(col("d").as("i"), col("pd").as("pii"))), "i")
      .join(broadcast(diag.select(col("d").as("j"), col("pd").as("pjj"))), "j")
      .select(col("i").as("dim_i"), col("j").as("dim_j"),
        expr("""CASE WHEN pii > 0 AND pjj > 0
               |THEN CAST(floor(CAST(p AS DOUBLE)
               |  / sqrt(CAST(pii AS DOUBLE) * CAST(pjj AS DOUBLE))
               |  * 1048576.0D + 0.5D) AS BIGINT)
               |ELSE CAST(0 AS BIGINT) END""".stripMargin).as("cos_ticks"))
      .orderBy(col("dim_i"), col("dim_j"))
  }

  /** The DuckDB twin of [[s29ColSimilarity]]: the uncentered moment
    * scan (upper triangle) + the identical double tree.
    */
  private[graft] def s29OracleSql: String =
    """WITH e AS MATERIALIZED (
      |  SELECT vec_id, CAST(a.i AS BIGINT) AS d,
      |    CAST(floor(CAST(embedding[a.i + 1] AS DOUBLE) * 1024.0 + 0.5)
      |      AS BIGINT) AS q
      |  FROM embeddings, UNNEST(generate_series(0, 63)) AS a(i)),
      |p AS MATERIALIZED (
      |  SELECT a.d AS i, b.d AS j, CAST(sum(a.q * b.q) AS BIGINT) AS p
      |  FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.d <= b.d
      |  GROUP BY 1, 2),
      |dg AS MATERIALIZED (SELECT i AS d, p AS pd FROM p WHERE i = j)
      |SELECT p.i AS dim_i, p.j AS dim_j,
      |  CASE WHEN di.pd > 0 AND dj.pd > 0
      |  THEN CAST(floor(CAST(p.p AS DOUBLE)
      |    / sqrt(CAST(di.pd AS DOUBLE) * CAST(dj.pd AS DOUBLE))
      |    * 1048576.0 + 0.5) AS BIGINT)
      |  ELSE CAST(0 AS BIGINT) END AS cos_ticks
      |FROM p JOIN dg di ON di.d = p.i JOIN dg dj ON dj.d = p.j
      |ORDER BY dim_i, dim_j""".stripMargin

  /** DIMSUM oversampling factor for [[s31DimsumSampled]] — the coin
    * threshold is min(1, f·√n/‖c_i‖ticks)·2²⁴ per column, i.e. the
    * reference's p_i = min(1, √γ/‖c_i‖) with √γ = f·√n ticks. On
    * unit-norm 64-dim rows ‖c‖ticks ≈ 128·√n, so f = 96 keeps
    * ~75% of entries — the sampling is load-bearing (a quarter of
    * the mass really is dropped and reweighted), while the
    * estimator concentrates at the paper's 1/√γ rate.
    */
  private[graft] val DimsumSqgFactor = 96.0

  /** Error-contract bound for s31 in 2²⁰ ticks of cosine.
    * EMPIRICAL CONTRACT (the q34 percentile-note posture): DIMSUM's
    * per-pair standard error at keep-rate p is
    * ≈ √((1/p² − 1)·Σ_r(x_ri·x_rj)²)/(‖c_i‖‖c_j‖) ≈ √(2.4/n) on
    * this near-uniform corpus — the bound below covers the observed
    * max error across sf0.001/0.01/0.1 with ≥ 2× margin, and SHRINKS
    * like 1/√n: at production row counts (10⁹+) the same contract
    * holds with a bound ~1000× tighter. On a skewed corpus re-derive
    * from the column-norm profile before reusing.
    */
  private[graft] val DimsumBoundTicks = 400000L

  /** s31: DIMSUM-sampled column similarities — the reference's
    * columnSimilarities(threshold) sampling path made EXECUTABLE
    * (reference: /root/reference/mllib/src/main/scala/org/apache/
    * spark/mllib/linalg/distributed/RowMatrix.scala:1,
    * columnSimilaritiesDIMSUM; Zadeh & Carlsson 2013), closing s29's
    * documented-retune claim with the q34 contract posture: the
    * oracle hash-compares BOTH the exact cosines and the sampled
    * estimates (the md5 coins make the sample itself deterministic
    * and bit-replicable cross-engine), plus an error-bound boolean
    * per pair.
    *
    *   - coins: entry (r, i) survives iff md5₂₄("dimsum:r:i") <
    *     thr_i = ⌊min(1, √γ/‖c_i‖)·2²⁴⌋ — the reference's
    *     column-norm-inverse sampling with the repo's deterministic
    *     draw (g10/p03 convention);
    *   - estimate: the SAME [[pairMomentsUpper]] outer-product pass over
    *     the MASKED tick arrays (dropped entries zeroed — zero
    *     contributions vanish from the sums, so the sampled Gram
    *     costs one corpus scan with ≤ 64² rows/task, identical to
    *     the exact pass), then ONE double reweight per PAIR:
    *     est = Σ_sampled q_i·q_j · 2⁴⁸/(thr_i·thr_j) — unbiased for
    *     the exact Gram since E[coin_i·coin_j] = p_i·p_j (i ≠ j);
    *   - diagonal norms stay EXACT (the reference computes colMags
    *     up front too); output is the strict upper triangle.
    *
    * Output: (dim_i, dim_j, cos_ticks [exact], est_cos_ticks,
    * err_ticks, within_bound) — within_bound is the
    * [[DimsumBoundTicks]] contract, true on every pair of every test
    * corpus in both engines.
    *
    * Scale shape: two corpus scans (exact Gram for norms + truth
    * column, masked Gram for the estimate) — at 10⁶ columns the
    * exact pass is the one that disappears (the truth column is a
    * test-harness luxury; production ships est alone) and the masked
    * pass's shuffle shrinks by the kept-fraction², which is DIMSUM's
    * whole point.
    */
  def s31DimsumSampled(spark: SparkSession, sfDir: String): DataFrame = {
    // exact Gram (norms + truth column) and n off the memoized bundle
    // (r17): only the MASKED pass still scans the corpus — the shape
    // production ships is now also the only data-plane cost here
    val b = momentsBundle(spark, sfDir)
    dimsumCoreShared(
      Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding")),
      DimsumSqgFactor, Some((upperMomentsOf(b), nOf(b))))
  }

  /** The s31 core over any (vec_id, embedding) frame with an
    * explicit oversampling factor — package-private so the spec can
    * force p = 1 (a huge factor), where the estimator provably
    * collapses to the exact cosine bit-for-bit.
    */
  private[graft] def dimsumCore(vecs: DataFrame, sqgFactor: Double): DataFrame =
    dimsumCoreShared(vecs, sqgFactor, None)

  private def dimsumCoreShared(vecs: DataFrame, sqgFactor: Double,
      exactAndN: Option[(DataFrame, DataFrame)]): DataFrame = {
    val qf = vecs.select(col("vec_id"), expr(QuantizeSql).as("q"))
      .ckpt(true)
    val exact = exactAndN.map(_._1)
      .getOrElse(pairMomentsUpper(qf.select(col("q"))).ckpt(true))
    val nf = exactAndN.map(_._2).getOrElse(qf.agg(count(lit(1)).as("n")))
    val diag = exact.filter(col("i") === col("j"))
      .select(col("i").as("d"), col("p").as("pd"))
    val thr = diag.crossJoin(broadcast(nf))
      .select(col("d"),
        floor(least(lit(1.0),
            lit(sqgFactor) * sqrt(col("n").cast("double"))
              / sqrt(col("pd").cast("double")))
          * lit(16777216.0)).cast("long").as("thr"))
    val thrArr = thr
      .agg(expr("transform(array_sort(collect_list(struct(d, thr))), x -> x.thr)")
        .as("thrs"))
    val masked = qf.crossJoin(broadcast(thrArr))
      .select(expr(
        """transform(q, (x, i) -> IF(
          |  CAST(conv(substring(md5(concat('dimsum:',
          |    CAST(vec_id AS STRING), ':', CAST(i AS STRING))), 1, 6), 16, 10)
          |    AS BIGINT) < element_at(thrs, CAST(i + 1 AS INT)),
          |  x, CAST(0 AS BIGINT)))""".stripMargin).as("q"))
    val sampled = pairMomentsUpper(masked)
      .select(col("i"), col("j"), col("p").as("sp"))
    exact.filter(col("i") < col("j"))
      .join(sampled, Seq("i", "j"))
      .join(broadcast(diag.select(col("d").as("i"), col("pd").as("pii"))), "i")
      .join(broadcast(diag.select(col("d").as("j"), col("pd").as("pjj"))), "j")
      .join(broadcast(thr.select(col("d").as("i"), col("thr").as("ti"))), "i")
      .join(broadcast(thr.select(col("d").as("j"), col("thr").as("tj"))), "j")
      .select(col("i").as("dim_i"), col("j").as("dim_j"),
        expr("""CASE WHEN pii > 0 AND pjj > 0
               |THEN CAST(floor(CAST(p AS DOUBLE)
               |  / sqrt(CAST(pii AS DOUBLE) * CAST(pjj AS DOUBLE))
               |  * 1048576.0D + 0.5D) AS BIGINT)
               |ELSE CAST(0 AS BIGINT) END""".stripMargin).as("cos_ticks"),
        expr("""CASE WHEN pii > 0 AND pjj > 0 AND ti > 0 AND tj > 0
               |THEN CAST(floor(CAST(sp AS DOUBLE) * 281474976710656.0D
               |  / (CAST(ti AS DOUBLE) * CAST(tj AS DOUBLE))
               |  / sqrt(CAST(pii AS DOUBLE) * CAST(pjj AS DOUBLE))
               |  * 1048576.0D + 0.5D) AS BIGINT)
               |ELSE CAST(0 AS BIGINT) END""".stripMargin).as("est_cos_ticks"))
      .withColumn("err_ticks", abs(col("est_cos_ticks") - col("cos_ticks")))
      .withColumn("within_bound", col("err_ticks") <= DimsumBoundTicks)
      .orderBy(col("dim_i"), col("dim_j"))
  }

  /** The DuckDB twin of [[s31DimsumSampled]]: the exact Gram, the
    * identical md5₂₄ coins + thresholds, the masked sampled Gram,
    * and the same reweight/contract trees.
    */
  private[graft] def s31OracleSql: String =
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, CAST(a.i AS BIGINT) AS d,
       |    CAST(floor(CAST(embedding[a.i + 1] AS DOUBLE) * 1024.0 + 0.5)
       |      AS BIGINT) AS q
       |  FROM embeddings, UNNEST(generate_series(0, 63)) AS a(i)),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
       |px AS MATERIALIZED (
       |  SELECT a.d AS i, b.d AS j, CAST(sum(a.q * b.q) AS BIGINT) AS p
       |  FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.d < b.d
       |  GROUP BY 1, 2),
       |dg AS MATERIALIZED (
       |  SELECT d, CAST(sum(q * q) AS BIGINT) AS pd FROM e GROUP BY 1),
       |th AS MATERIALIZED (
       |  SELECT d, CAST(floor(least(1.0,
       |      $DimsumSqgFactor * sqrt(CAST((SELECT n FROM nn) AS DOUBLE))
       |        / sqrt(CAST(pd AS DOUBLE)))
       |    * 16777216.0) AS BIGINT) AS thr
       |  FROM dg),
       |ms AS MATERIALIZED (
       |  SELECT e.vec_id, e.d,
       |    CASE WHEN ('0x' || substr(md5('dimsum:' ||
       |        CAST(e.vec_id AS VARCHAR) || ':' || CAST(e.d AS VARCHAR)), 1, 6))
       |        ::UBIGINT < th.thr
       |      THEN e.q ELSE CAST(0 AS BIGINT) END AS q
       |  FROM e JOIN th ON th.d = e.d),
       |sm AS MATERIALIZED (
       |  SELECT a.d AS i, b.d AS j, CAST(sum(a.q * b.q) AS BIGINT) AS sp
       |  FROM ms a JOIN ms b ON a.vec_id = b.vec_id AND a.d < b.d
       |  GROUP BY 1, 2)
       |SELECT px.i AS dim_i, px.j AS dim_j,
       |  CASE WHEN di.pd > 0 AND dj.pd > 0
       |  THEN CAST(floor(CAST(px.p AS DOUBLE)
       |    / sqrt(CAST(di.pd AS DOUBLE) * CAST(dj.pd AS DOUBLE))
       |    * 1048576.0 + 0.5) AS BIGINT)
       |  ELSE CAST(0 AS BIGINT) END AS cos_ticks,
       |  CASE WHEN di.pd > 0 AND dj.pd > 0 AND ti.thr > 0 AND tj.thr > 0
       |  THEN CAST(floor(CAST(sm.sp AS DOUBLE) * 281474976710656.0
       |    / (CAST(ti.thr AS DOUBLE) * CAST(tj.thr AS DOUBLE))
       |    / sqrt(CAST(di.pd AS DOUBLE) * CAST(dj.pd AS DOUBLE))
       |    * 1048576.0 + 0.5) AS BIGINT)
       |  ELSE CAST(0 AS BIGINT) END AS est_cos_ticks,
       |  abs((CASE WHEN di.pd > 0 AND dj.pd > 0 AND ti.thr > 0 AND tj.thr > 0
       |  THEN CAST(floor(CAST(sm.sp AS DOUBLE) * 281474976710656.0
       |    / (CAST(ti.thr AS DOUBLE) * CAST(tj.thr AS DOUBLE))
       |    / sqrt(CAST(di.pd AS DOUBLE) * CAST(dj.pd AS DOUBLE))
       |    * 1048576.0 + 0.5) AS BIGINT)
       |  ELSE CAST(0 AS BIGINT) END) - (CASE WHEN di.pd > 0 AND dj.pd > 0
       |  THEN CAST(floor(CAST(px.p AS DOUBLE)
       |    / sqrt(CAST(di.pd AS DOUBLE) * CAST(dj.pd AS DOUBLE))
       |    * 1048576.0 + 0.5) AS BIGINT)
       |  ELSE CAST(0 AS BIGINT) END)) AS err_ticks,
       |  abs((CASE WHEN di.pd > 0 AND dj.pd > 0 AND ti.thr > 0 AND tj.thr > 0
       |  THEN CAST(floor(CAST(sm.sp AS DOUBLE) * 281474976710656.0
       |    / (CAST(ti.thr AS DOUBLE) * CAST(tj.thr AS DOUBLE))
       |    / sqrt(CAST(di.pd AS DOUBLE) * CAST(dj.pd AS DOUBLE))
       |    * 1048576.0 + 0.5) AS BIGINT)
       |  ELSE CAST(0 AS BIGINT) END) - (CASE WHEN di.pd > 0 AND dj.pd > 0
       |  THEN CAST(floor(CAST(px.p AS DOUBLE)
       |    / sqrt(CAST(di.pd AS DOUBLE) * CAST(dj.pd AS DOUBLE))
       |    * 1048576.0 + 0.5) AS BIGINT)
       |  ELSE CAST(0 AS BIGINT) END)) <= $DimsumBoundTicks AS within_bound
       |FROM px JOIN sm ON sm.i = px.i AND sm.j = px.j
       |JOIN dg di ON di.d = px.i JOIN dg dj ON dj.d = px.j
       |JOIN th ti ON ti.d = px.i JOIN th tj ON tj.d = px.j
       |ORDER BY dim_i, dim_j""".stripMargin

  /** Query documents for [[s22TfidfSearch]] (the s01 doc_id rule). */
  private[graft] val TfidfQueryDocs = 3L

  /** Results per query for s22. */
  private[graft] val TfidfTopK = 5

  /** s22: document similarity search over the t30 hashed-TF-IDF
    * vectors — the end-to-end "search the corpus by text" path with
    * NO pretrained embeddings: tokenize → hash → IDF-weight (the
    * memoized [[graft.operators.TextAnalysis.hashedTfidf]] frame,
    * shared with t30) → sparse cosine top-k. Dot products and
    * squared norms are EXACT long sums over the ≤64 shared buckets;
    * only the final cosine normalization runs in double, through one
    * shared expression tree floored to 2²⁰ ticks (the s19
    * convention), and ranking orders by that exact integer (ties →
    * smaller doc, the top_k_by_score contract). Queries are the
    * first [[TfidfQueryDocs]] documents (the s01 rule); self-matches
    * drop.
    *
    * Scale shape: the query slice is a ≤64·Q-row broadcast; the dot
    * join hits only rows sharing a bucket and partial-aggregates to
    * (query, doc); norms are one partial-agg'd pass memoized into
    * the plan; the cut is the bounded top-k aggregate — no window,
    * no global sort. At corpus scale the bucket join IS the inverted
    * index: production widens [[graft.operators.TextAnalysis
    * .HtfBuckets]] and prunes by impact ordering (WAND-style), the
    * documented path.
    */
  def s22TfidfSearch(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark)
    val h = graft.operators.TextAnalysis.hashedTfidf(spark, sfDir)
    val norms = h.groupBy(col("doc_id"))
      .agg(sum(col("w_ticks") * col("w_ticks")).as("nrm"))
    val queries = h.filter(col("doc_id") < TfidfQueryDocs)
      .select(col("doc_id").as("query_id"), col("bucket"),
        col("w_ticks").as("qw"))
    val dots = h.join(broadcast(queries), "bucket")
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("qw") * col("w_ticks")).as("dot"))
    val scored = dots
      .join(norms.select(col("doc_id").as("query_id"), col("nrm").as("nq")),
        "query_id")
      .join(norms, "doc_id")
      .withColumn("cos_ticks", expr(
        """CAST(floor(CAST(dot AS DOUBLE)
          |  / sqrt(CAST(nq AS DOUBLE) * CAST(nrm AS DOUBLE))
          |  * 1048576.0D + 0.5D) AS BIGINT)""".stripMargin))
    scored.groupBy(col("query_id"))
      .agg(call_function("top_k_by_score",
        col("cos_ticks").cast("double"), col("doc_id"),
        lit(TfidfTopK)).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.id").as("doc_id"),
        col("t.score").cast("long").as("cos_ticks"),
        (col("pos") + 1).cast("long").as("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** The DuckDB twin of [[s22TfidfSearch]] — the t30 CTEs plus exact
    * pairwise dot/norm sums and the same cosine double tree.
    */
  private[graft] def s22OracleSql(htfCtes: String): String =
    s"""$htfCtes,
       |nrm AS (SELECT doc_id, CAST(sum(w_ticks * w_ticks) AS BIGINT) AS nrm
       |        FROM h GROUP BY 1),
       |qs AS (SELECT doc_id AS query_id, bucket, w_ticks AS qw
       |       FROM h WHERE doc_id < $TfidfQueryDocs),
       |dots AS (
       |  SELECT qs.query_id, h.doc_id, CAST(sum(qs.qw * h.w_ticks) AS BIGINT) AS dot
       |  FROM h JOIN qs ON h.bucket = qs.bucket AND h.doc_id <> qs.query_id
       |  GROUP BY 1, 2),
       |sc AS (
       |  SELECT d.query_id, d.doc_id,
       |    CAST(floor(CAST(d.dot AS DOUBLE)
       |      / sqrt(CAST(a.nrm AS DOUBLE) * CAST(b.nrm AS DOUBLE))
       |      * 1048576.0 + 0.5) AS BIGINT) AS cos_ticks
       |  FROM dots d
       |  JOIN nrm a ON a.doc_id = d.query_id
       |  JOIN nrm b ON b.doc_id = d.doc_id),
       |rk AS (
       |  SELECT query_id, doc_id, cos_ticks,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos_ticks DESC, doc_id) AS BIGINT) AS rank
       |  FROM sc)
       |SELECT query_id, doc_id, cos_ticks, rank
       |FROM rk WHERE rank <= $TfidfTopK
       |ORDER BY query_id, rank""".stripMargin

  /** Splits run by [[s21BisectingKmeans]] — fixed so the tree is a
    * pure function of the corpus ([[BisectSplits]] splits → up to
    * 2^depth leaves along the largest-first path).
    */
  private[graft] val BisectSplits = 3

  /** Lloyd rounds per split (the restricted 2-means refinement). */
  private[graft] val BisectLloyd = 2

  /** s21: bisecting k-means over the embedding corpus — the
    * hierarchical clustering next to flat s04 (reference:
    * /root/reference/mllib/src/main/scala/org/apache/spark/mllib/
    * clustering/BisectingKMeans.scala:1), re-expressed as a fixed
    * largest-first split sequence so the DuckDB oracle replicates
    * the whole tree: each of [[BisectSplits]] rounds picks the
    * LARGEST current leaf (ties → smallest cluster id; a 1-row
    * TakeOrdered broadcast, never a driver fetch), seeds its two
    * children with the first/last member by md5 order (the
    * seedCentroids determinism), refines them with [[BisectLloyd]]
    * restricted [[lloydRefine]] rounds (fixed-point means — exact,
    * order-independent), and reassigns members to the nearer child
    * (ties → smaller child id). Children of cluster c are 2c+1 /
    * 2c+2 — the mllib binary-tree numbering. Output: (vec_id,
    * cluster, cluster_size) for the final leaves.
    *
    * Scale shape: every split touches ONE leaf's members (a
    * broadcast-semi-joined restriction), runs broadcast 2-centroid
    * argmax + one partial-agg'd fixed-point mean per round, and
    * updates assignments by a co-partitioned left join on vec_id;
    * per-split work is O(leaf size), so the whole tree costs about
    * depth × corpus — the mllib cost shape — with no window, no
    * driver-side members, and 1-row control-plane frames throughout.
    */
  def s21BisectingKmeans(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark)
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    var assign = emb.withColumn("cluster", lit(0L)).ckpt(true)
    for (_ <- 1 to BisectSplits) {
      val target = assign.groupBy(col("cluster")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("cluster")).limit(1)
        .select(col("cluster").as("tcl"))
      val members = assign.join(broadcast(target),
          col("cluster") === col("tcl"))
        .select(col("vec_id"), col("embedding"), col("tcl"))
        .ckpt(true)
      val byMd5 = members
        .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(1)
        .select((col("tcl") * 2 + 1).as("cid"), col("embedding").as("cv"))
      val byMd5Last = members
        .orderBy(md5(col("vec_id").cast("string")).desc, col("vec_id").desc)
        .limit(1)
        .select((col("tcl") * 2 + 2).as("cid"), col("embedding").as("cv"))
      val seeds = byMd5.union(byMd5Last).ckpt(true)
      val cents = (1 to BisectLloyd).foldLeft(seeds)((c, _) =>
        lloydRefine(members.select(col("vec_id"), col("embedding")), c))
      val reassigned = members.crossJoin(broadcast(cents))
        .withColumn("cs",
          call_function("cosine_sim", col("embedding"), col("cv")))
        .groupBy(col("vec_id"))
        .agg(max(struct(col("cs"), (-col("cid")).as("negc"))).as("m"))
        .select(col("vec_id"), (-col("m.negc")).as("newc"))
      assign = assign.join(reassigned, Seq("vec_id"), "left")
        .select(col("vec_id"), col("embedding"),
          coalesce(col("newc"), col("cluster")).as("cluster"))
        .ckpt(true)
    }
    val sizes = assign.groupBy(col("cluster")).agg(count(lit(1)).as("cluster_size"))
    assign.join(sizes, "cluster")
      .select(col("vec_id"), col("cluster"), col("cluster_size"))
      .orderBy(col("vec_id"))
  }

  /** Silhouette tick scale — 2^20 ticks of the [-1, 1] coefficient. */
  private[graft] val SilScale = 1048576.0

  /** s23: clustering-quality evaluation of the s04 partition in the
    * SIMPLIFIED (centroid-based) silhouette form: with cosine
    * similarity cs1 to the OWN (nearest) centroid and cs2 to the
    * runner-up, the coefficient is s = (cs1 - cs2) / (1 - cs2) in
    * [0, 1] — 0 on the cell border, 1 at the centroid — reported per
    * cell as exact tick sums and the truncating-div mean
    * ([[SilScale]] ticks).
    *
    * HONEST FRAMING: this is NOT the reference evaluator's metric.
    * The reference's CosineSilhouette (reference: /root/reference/
    * mllib/src/main/scala/org/apache/spark/ml/evaluation/
    * ClusteringEvaluator.scala:556) computes the EXACT silhouette in
    * O(C·D·N/W) via per-cluster sums of normalized features — not
    * pairwise, and not this centroid approximation — so s23's values
    * differ numerically from ml.ClusteringEvaluator. The exact
    * expansion form ships as [[s30SilhouetteExact]]; s23 stays as the
    * cheaper screening variant (one broadcast scoring pass, top-2
    * state only, no Ω build) whose [0,1] score is the standard
    * "simplified silhouette" of the clustering literature.
    *
    * Scale shape: one broadcast cross join against the k-row centroid
    * frame, then a BOUNDED top-2 per vector via the top_k_by_score
    * partial aggregate — the shuffle carries 2-row state per vector,
    * never the N x k scored rows and never a corpus window — then a
    * k-row final aggregation. Doubles appear only in the per-row
    * coefficient, computed from the same broadcast floats in index
    * order by both engines. Degenerate input (k < 2 centroid rows →
    * no runner-up) defaults cs2 to cs1, giving coefficient 0 — the
    * family's documented degenerate-input posture — rather than
    * silently propagating null.
    */
  def s23Silhouette(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark)
    val emb = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val centroids = kmeansCentroids(spark, sfDir, KmeansIters)
    val top2 = emb.crossJoin(broadcast(centroids))
      .withColumn("cs", call_function("cosine_sim", col("embedding"), col("cv")))
      .groupBy(col("vec_id"))
      .agg(call_function("top_k_by_score", col("cs"), col("cid"), lit(2)).as("top"))
      .select(col("vec_id"),
        col("top").getItem(0).getField("id").as("cell"),
        col("top").getItem(0).getField("score").as("cs1"),
        // k < 2 centroid rows → no runner-up: default cs2 to cs1 so
        // the coefficient is a defined 0, never a silent null
        coalesce(col("top").getItem(1).getField("score"),
          col("top").getItem(0).getField("score")).as("cs2"))
    val sil = top2.select(col("cell"),
      when(lit(1.0) - col("cs2") > 0,
          floor((col("cs1") - col("cs2")) / (lit(1.0) - col("cs2"))
            * lit(SilScale) + lit(0.5)).cast("long"))
        .otherwise(lit(0L)).as("st"))
    sil.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_points"), sum(col("st")).as("sum_sil_ticks"))
      .select(col("cell"), col("n_points"), col("sum_sil_ticks"),
        expr("sum_sil_ticks div n_points").as("mean_sil_ticks"))
      .orderBy(col("cell"))
  }

  /** The EXACT cosine-silhouette core over an arbitrary clustered
    * frame `cells` (vec_id, cell, embedding) — the reference
    * evaluator's expansion form (reference: /root/reference/mllib/
    * src/main/scala/org/apache/spark/ml/evaluation/
    * ClusteringEvaluator.scala:556, `CosineSilhouette`), made
    * hash-verifiable on the integer tick grid:
    *
    *   - ξ = x/‖x‖ quantized to q_j = floor(ξ_j·1024 + 0.5) longs
    *     (‖x‖ via the sequential dot_product fold — the s14 norm
    *     contract — so both engines fold the array in index order);
    *   - per cluster Γ: Ω_Γ[j] = Σ q_j (exact long sums) and N_Γ;
    *   - avg distance of X to Γ: d(X,Γ) = 1 − (q_X·Ω_Γ)/(S²·N_Γ),
    *     computed as the exactly-rounded double ratio of the two
    *     exact integers (S²N_Γ − P) and S²N_Γ, P = q_X·Ω_Γ — the
    *     sum-of-dots = dot-of-sum identity holds EXACTLY in integer
    *     arithmetic, which is what makes the expansion form
    *     bit-verifiable where a float pairwise sum never is;
    *   - a(i) = d(X, own)·N/(N−1) (self-exclusion; 0 when N = 1),
    *     i.e. the integer ratio (S²N − P)/(S²(N−1));
    *   - b(i) = min over other clusters of d(X,Γ);
    *   - s(i) = 1 − a/b, b/a − 1, or 0 by the reference's three-way
    *     comparison, with the family's degenerate-input guard (a
    *     branch whose denominator is ≤ 0 — possible only at the
    *     quantization margin on self-identical clusters — reports 0).
    *
    * Scale shape — better than even the simplified form: the Ω build
    * is one posexplode + (cell, dim) partial agg (k·D rows after
    * map-side combine), the k-row (Ω, N) table collapses to a ONE-ROW
    * broadcast array, and the scoring pass computes a(i), b(i) and
    * the tick coefficient per row with higher-order functions over
    * that broadcast — O(k·D) work per point, NO per-vector shuffle at
    * all (s23 still shuffles 2-row top-k state per vector). The only
    * shuffles are the k·D Ω agg and the final k-row rollup. Overflow:
    * |q| ≤ 1025, |Ω_j| ≤ 1025·N, P ≤ D·1025²·N < 2²⁷·N — exact in
    * int64 to N ≈ 10¹¹ per cluster; retune past that = split Ω sums
    * into high/low halves (the s13 two-level-sum note).
    */
  private[graft] def exactCosineSilhouette(spark: SparkSession,
      cells: DataFrame): DataFrame = {
    registerAll(spark)
    val qs = cells
      .withColumn("nv",
        sqrt(call_function("dot_product", col("embedding"), col("embedding"))))
      .withColumn("q", expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) / nv * 1024.0D + 0.5D) AS BIGINT))"))
      .select(col("vec_id"), col("cell"), col("q"))
      .ckpt(true) // read by the Ω build AND the scoring pass
    val omega = qs
      .select(col("cell"), posexplode(col("q")).as(Seq("j", "qj")))
      .groupBy(col("cell"), col("j"))
      .agg(sum(col("qj")).as("o"))
      .groupBy(col("cell"))
      .agg(expr("transform(array_sort(collect_list(struct(j, o))), x -> x.o)")
        .as("omega"))
    val counts = qs.groupBy(col("cell")).agg(count(lit(1)).as("n"))
    // ONE broadcast row: the k (cell, N, Ω) stats sorted by cell id
    val statsArr = omega.join(counts, "cell")
      .select(col("cell").as("gcell"), col("n"), col("omega"))
      .agg(sort_array(collect_list(struct(col("gcell"), col("n"), col("omega"))))
        .as("cls"))
    val dOther = "CAST(1048576 * c.n - aggregate(zip_with(q, c.omega, " +
      "(u, v) -> u * v), CAST(0 AS BIGINT), (acc, x) -> acc + x) AS DOUBLE) " +
      "/ CAST(1048576 * c.n AS DOUBLE)"
    val scored = qs.crossJoin(broadcast(statsArr))
      .withColumn("own", expr("filter(cls, c -> c.gcell = cell)[0]"))
      .withColumn("pown", expr("aggregate(zip_with(q, own.omega, " +
        "(u, v) -> u * v), CAST(0 AS BIGINT), (acc, x) -> acc + x)"))
      .withColumn("a", expr("CASE WHEN own.n = 1 THEN 0.0D ELSE " +
        "CAST(1048576 * own.n - pown AS DOUBLE) / " +
        "CAST(1048576 * (own.n - 1) AS DOUBLE) END"))
      .withColumn("b",
        expr(s"array_min(transform(filter(cls, c -> c.gcell != cell), c -> $dOther))"))
    val sil = scored.select(col("cell"),
      floor((when(col("a") < col("b") && col("b") > 0,
          lit(1.0) - col("a") / col("b"))
        .when(col("a") > col("b") && col("a") > 0,
          col("b") / col("a") - lit(1.0))
        .otherwise(lit(0.0))) * lit(SilScale) + lit(0.5))
        .cast("long").as("st"))
    sil.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_points"), sum(col("st")).as("sum_sil_ticks"))
      .select(col("cell"), col("n_points"), col("sum_sil_ticks"),
        expr("sum_sil_ticks div n_points").as("mean_sil_ticks"))
      .orderBy(col("cell"))
  }

  /** s30: the EXACT cosine silhouette of the s04 k-means partition —
    * the reference ClusteringEvaluator's metric (see
    * [[exactCosineSilhouette]] for the algebra, determinism and scale
    * contract), evaluated on the same [[KmeansIters]]-round centroids
    * and argmax-cosine assignment as s04/s23. Clears the round-10
    * fidelity gap: s23's simplified (centroid) coefficient remains as
    * the cheap screen; THIS key reports the evaluator-faithful value.
    * Output: (cell, n_points, sum_sil_ticks, mean_sil_ticks) in
    * [[SilScale]] ticks of [-1, 1].
    */
  def s30SilhouetteExact(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark)
    val centroids = kmeansCentroids(spark, sfDir, KmeansIters)
    exactCosineSilhouette(spark,
      ivfCells(spark, sfDir, centroids).select(col("vec_id"), col("cell"), col("embedding")))
  }
}
