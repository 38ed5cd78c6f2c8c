package graft.operators

import graft.Ckpt._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-data pipeline mechanics (SURVEY §2): deterministic
  * dataset splitting and sequence packing — the steps between a
  * curated corpus and what a trainer actually reads.
  */
object Pipeline {

  /** Quality-score floor for [[p04Curate]] — set near the corpus
    * median so the filter is a real decision boundary, not a no-op.
    */
  private val CurateQualityBar = 0.35

  /** p04: the end-to-end curation pass — the composition a real
    * pipeline materializes from the individual operators: keep a
    * document iff it (a) survives exact dedup (is the min-id copy of
    * its content hash, d01's rule), (b) clears the quality-score
    * floor (t02), and (c) is not low-entropy filler (t08). Each
    * input operator is reused as a DataFrame — composition is plan
    * composition, so Catalyst fuses the three per-row scans and the
    * one dedup shuffle into a single job; nothing is materialized
    * between "stages".
    */
  def p04Curate(spark: SparkSession, sfDir: String): DataFrame = {
    val survivors = Dedup.d01DedupExact(spark, sfDir)
      .select(col("keep_id").as("doc_id"))
    TextAnalysis.t02QualityScore(spark, sfDir)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
      .join(TextAnalysis.t08Entropy(spark, sfDir)
        .select(col("doc_id"), col("entropy"), col("low_entropy")), "doc_id")
      .join(survivors, Seq("doc_id"), "left_semi")
      .filter(col("quality_score") >= CurateQualityBar && !col("low_entropy"))
      .select(col("doc_id"), col("n_tokens"), col("quality_score"), col("entropy"))
      .orderBy(col("doc_id"))
  }

  /** p01: deterministic train/val/test assignment — bucket =
    * md5(doc_id) mod 100, split at 90/5/5. Hash-based (not random())
    * so the split is a pure function of the document id: stable
    * across runs, engines, and cluster sizes, and any future doc
    * joins back to the same split — the reproducibility property
    * training pipelines need. Pure per-row map, no shuffle.
    */
  def p01SplitAssign(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"))
      // first 16 bits of md5 over the decimal doc_id string
      .withColumn("bucket",
        conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("long") % 100)
      .withColumn("split",
        when(col("bucket") < 90, "train")
          .when(col("bucket") < 95, "val")
          .otherwise("test"))
      .orderBy(col("doc_id"))

  /** Per-source sampling rates in percent — the data-mixture config.
    * src0 is the benchmark slice (excluded from training entirely,
    * matching d06's contamination posture); two sources are
    * down-weighted; everything else passes through.
    */
  private val MixRatesPct: Seq[(String, Int)] =
    Seq("src0" -> 0, "src1" -> 50, "src2" -> 25)
  private val DefaultRatePct = 100

  /** p03: deterministic data-mixture sampling — each source keeps an
    * md5-bucketed fraction of its documents per [[MixRatesPct]] (the
    * corpus-reweighting step of a training-data pipeline). Hash-based
    * like p01, so the kept set is a pure function of doc_id: stable
    * across runs and engines, and disjoint rate changes only move the
    * marginal documents. The rate table is a broadcast literal frame;
    * the scan is one pass, no shuffle before the per-source summary.
    */
  def p03MixSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val rates = MixRatesPct.toDF("source", "rate_pct")
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"))
      .join(broadcast(rates), Seq("source"), "left")
      .withColumn("rate_pct", coalesce(col("rate_pct"), lit(DefaultRatePct)))
      // p01 buckets on md5(doc_id); a DIFFERENT salt decorrelates the
      // mixing decision from the split assignment
      .withColumn("bucket",
        conv(substring(md5(concat(lit("mix:"), col("doc_id").cast("string"))), 1, 4), 16, 10)
          .cast("long") % 100)
      .withColumn("kept", col("bucket") < col("rate_pct"))
    docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
      .withColumn("kept_frac",
        round(col("n_kept").cast("double") / col("n_total").cast("double"), 4))
      .orderBy(col("source"))
  }

  private[graft] val SeqLen = 2048L
  private[graft] val NShards = 8L

  /** p02: sequence packing (concat-and-chunk): documents are laid
    * end-to-end in deterministic order and cut into fixed
    * [[SeqLen]]-token training chunks — the standard LLM-pretraining
    * packing. A single global concatenation would serialize through
    * one task, so the corpus is first split into [[NShards]]
    * independent shards (doc_id mod shards) packed in parallel:
    * one shuffle on shard, then a linear running-sum window per
    * shard. At cluster scale NShards is sized to executors×cores;
    * chunk addresses stay deterministic because shard assignment and
    * within-shard order are pure functions of doc_id.
    */
  def p02PackChunks(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(split(trim(col("text")), " ")).cast("long").as("n_tokens"))
      .withColumn("shard", pmod(col("doc_id"), lit(NShards)))
      .withColumn("start_offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("chunk_id", expr(s"start_offset div $SeqLen"))
      .withColumn("spans_boundary",
        col("n_tokens") > 0 &&
          expr(s"(start_offset + n_tokens - 1) div $SeqLen") =!= col("chunk_id"))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        col("start_offset"), col("chunk_id"), col("spans_boundary"))
      .orderBy(col("doc_id"))
  }

  /** Columns profiled by [[p05Profile]] — the full documents schema. */
  private val ProfileCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  /** p05: data profiling — per-column null count, exact distinct
    * count, and value-length stats over the corpus in ONE scan: the
    * health dashboard every ingest runs before training. Columns are
    * melted to (col_name, stringified value) rows with `stack` (a
    * generator — 5× row fan-out, still one pass over the parquet),
    * then one aggregation. Distinct counting hashes values to 16-byte
    * md5 digests first, so the distinct-rewrite shuffle carries
    * (col_name, digest) — never document text — and Catalyst's
    * two-phase rewrite partial-aggregates on that pair, so 5 group
    * keys do NOT mean 5 reducer tasks. At 100 TB swap
    * `count(distinct …)` for `approx_count_distinct` (single-pass
    * HLL partial agg, no per-value shuffle at all); exact counting is
    * kept here because it is what a DuckDB oracle can verify.
    * Length stats are on the stringified value (profiling convention;
    * numeric columns profile their decimal rendering).
    */
  def p05Profile(spark: SparkSession, sfDir: String): DataFrame = {
    val stackArgs = ProfileCols
      .map(c => s"'$c', cast($c as string)").mkString(", ")
    Tables.documents(spark, sfDir)
      .select(expr(s"stack(${ProfileCols.size}, $stackArgs) as (col_name, val)"))
      .groupBy(col("col_name"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("val").isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(md5(col("val"))).as("n_distinct"),
        min(length(col("val"))).cast("long").as("min_len"),
        max(length(col("val"))).cast("long").as("max_len"),
        round(avg(length(col("val")).cast("double")), 2).as("avg_len"))
      .orderBy(col("col_name"))
  }

  /** Temperature exponent for [[p07MixTemperature]]: keep-probability
    * ∝ size^(α−1), i.e. α = 1 is proportional (no rebalancing), α → 0
    * is uniform-over-sources. 0.5 is the mC4/XLM-R-style midpoint.
    */
  private val MixAlpha = 0.5

  /** p07: temperature-based mixture sampling — the α-sampling recipe
    * for balancing skewed source sizes (BIG sources downsampled
    * hardest, the smallest kept whole) without hand-written per-source
    * rates (p03's table becomes a FORMULA of the source sizes). Kept
    * counts follow kept_i ∝ n_i^α: with the downsample-only
    * normalization (the smallest source keeps everything), the
    * keep-rate is rate_i = (n_min/n_i)^(1−α) — for α = 0.5, a source
    * 100× the smallest keeps 1/10th of its docs, compressing a 100:1
    * size skew to 10:1. The keep decision is the p01/p03 md5-bucket
    * rule against the rate quantized to 1/65536 ticks — integer
    * compare, so the kept set is a pure function of (doc_id, source
    * sizes) and bit-reproducible cross-engine (IEEE sqrt/floor are
    * correctly rounded in both).
    *
    * Scale shape: source sizes are ONE partial-agg'd count collapsed
    * to a ≤#sources-row frame, broadcast back; the keep decision is a
    * pure per-row map. Output: every doc with its source rate and
    * kept flag.
    */
  def p07MixTemperature(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("source"))
    val sizes = docs.groupBy(col("source")).agg(count(lit(1)).as("n_source"))
    val nMin = sizes.agg(min(col("n_source")).as("__m"))
    // rate in 1/65536 ticks: floor(65536 * (n_min/n_i)^(1-alpha));
    // alpha=0.5 => sqrt. smallest source: exactly 65536 (kept whole).
    val rates = sizes.crossJoin(broadcast(nMin))
      .withColumn("rate_ticks",
        floor(lit(65536.0) * sqrt(col("__m").cast("double") / col("n_source").cast("double")))
          .cast("long"))
      .select(col("source"), col("n_source"), col("rate_ticks"))
    docs.join(broadcast(rates), "source")
      .withColumn("bucket",
        conv(substring(md5(concat(lit("p07:"), col("doc_id").cast("string"))), 1, 4),
          16, 10).cast("long"))
      .withColumn("kept", col("bucket") < col("rate_ticks"))
      .select(col("doc_id"), col("source"), col("n_source"),
        col("rate_ticks"), col("kept"))
      .orderBy(col("doc_id"))
  }

  /** p08: decontaminated training split — the d06 → p01 composition a
    * real pipeline materializes: a corpus document reaches training
    * iff its md5 split says 'train' AND the benchmark-contamination
    * check clears it (contaminated training docs inflate benchmark
    * scores; the benchmark slice itself never trains). One fused plan:
    * the contamination report and the split assignment are both
    * per-doc maps over the same scan family, joined on doc_id.
    * Output: every corpus doc with split, contaminated, included.
    */
  def p08DecontaminatedSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val split = p01SplitAssign(spark, sfDir).select(col("doc_id"), col("split"))
    val contam = graft.operators.Dedup.d06Contamination(spark, sfDir)
      .select(col("doc_id"), col("contaminated"))
    contam.join(split, "doc_id")
      .withColumn("included", col("split") === "train" && !col("contaminated"))
      .select(col("doc_id"), col("split"), col("contaminated"), col("included"))
      .orderBy(col("doc_id"))
  }

  /** Epoch cap for [[p09EpochRepeats]] — repeating a small source
    * more than ~4× degrades models faster than it balances data, so
    * the rate formula is clamped.
    */
  private val MaxEpochTicks = 4 * 256L

  /** p09: epoch-weighted mixture materialization — the UPSAMPLING
    * half of temperature mixing (p07 downsamples big sources; here
    * small sources are REPEATED): target epochs_i = (n_max/n_i)^(1−α)
    * with α = 0.5, clamped to [[MaxEpochTicks]]/256 epochs, so the
    * largest source trains once and a 100× smaller one ~10 times.
    * Fractional epochs materialize deterministically: every doc gets
    * ⌊e⌋ copies, and an md5-bucketed frac(e)-fraction of docs one
    * more (the p01/p03 hash rule — which docs carry the fractional
    * epoch is a pure function of doc_id, reproducible cross-engine;
    * epochs quantize to 1/256 ticks so the comparison is integer).
    * Output is the exploded copy list a trainer would read — one row
    * per (doc, copy).
    *
    * Scale shape: source sizes are one partial-agg'd count broadcast
    * back; the copy fan-out is a per-row generator (≤4×, bounded by
    * the clamp) — no shuffle anywhere, and the explosion multiplies
    * only SMALL sources by construction, so output stays O(corpus).
    */
  def p09EpochRepeats(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("source"))
    val sizes = docs.groupBy(col("source")).agg(count(lit(1)).as("n_source"))
    val nMax = sizes.agg(max(col("n_source")).as("__mx"))
    val rates = sizes.crossJoin(broadcast(nMax))
      .withColumn("e_ticks",
        least(lit(MaxEpochTicks),
          floor(lit(256.0) * sqrt(col("__mx").cast("double") / col("n_source").cast("double")))
            .cast("long")))
      .select(col("source"), col("e_ticks"))
    docs.join(broadcast(rates), "source")
      .withColumn("bucket",
        conv(substring(md5(concat(lit("p09:"), col("doc_id").cast("string"))), 1, 4),
          16, 10).cast("long") % 256)
      .withColumn("n_copies",
        expr("e_ticks div 256") +
          when(col("bucket") < col("e_ticks") % 256, 1L).otherwise(0L))
      .select(col("doc_id"), col("source"), col("e_ticks"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy"))
      .orderBy(col("doc_id"), col("copy"))
  }

  /** Token-budget fraction for [[p10TokenBudget]]: each source's
    * budget = 40% of its token mass — a real boundary at every SF
    * (an absolute number would be a no-op at sf0.001 and starve
    * sf0.1).
    */
  private val BudgetFrac = 0.4

  /** p10: token-budget curation — keep the highest-quality documents
    * of each source until that source's token budget is spent: the
    * budget-constrained selection step when compute (not data) is the
    * binding constraint ("we can afford N tokens of src X; take the
    * best ones"). Rule: docs ordered by (quality desc, doc_id) per
    * source; a doc is kept iff the running token total THROUGH it
    * fits the budget. Because the running sum accumulates over every
    * ranked doc (kept or not), the kept set is exactly the maximal
    * fitting PREFIX — once one doc overflows, everything after it is
    * out, even a smaller doc that would have fit alone (the simple,
    * order-faithful contract; bin-packing the tail is a different
    * operator). Budgets are one partial-agg'd count frame broadcast
    * back (floor(0.4·tokens_source)).
    *
    * Scale note: the per-source running sum is a window whose
    * partition is a whole source — the q27 shape. At 100 TB, swap
    * the exact window for quality-cutpoint selection
    * (percentile_approx of the token-weighted quality distribution
    * at the budget point — the p06/distributedNtile recipe); the
    * exact window is kept here because it is what the oracle can
    * verify bit-for-bit, and test sources are bounded.
    */
  def p10TokenBudget(spark: SparkSession, sfDir: String): DataFrame = {
    val bySource = Window.partitionBy(col("source"))
      .orderBy(col("quality_score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // checkpointed: both the budgets aggregation and the main join
    // read this frame — without it the t02 scoring scan runs twice
    // (the p06/t10/d15 double-evaluation pattern; three small columns
    // + source per doc, so the materialization is cheap)
    val scored = TextAnalysis.t02QualityScore(spark, sfDir)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
      .join(Tables.documents(spark, sfDir).select(col("doc_id"), col("source")),
        "doc_id")
      .ckpt(true)
    val budgets = scored.groupBy(col("source"))
      .agg(floor(sum(col("n_tokens")) * lit(BudgetFrac)).cast("long").as("budget"))
    scored.join(broadcast(budgets), "source")
      .withColumn("running_tokens", sum(col("n_tokens")).over(bySource))
      .withColumn("kept", col("running_tokens") <= col("budget"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("quality_score"), col("running_tokens"), col("budget"), col("kept"))
      .orderBy(col("doc_id"))
  }

  /** p11: deterministic corpus shuffle — the training-order
    * randomization every pretraining run needs, as a pure function of
    * doc_id: shuffle key = salted md5, position = the EXACT global
    * rank under that key. Rank comes from
    * [[Relational.distributedRank]] (range-partition + broadcast
    * offsets), so no task ever holds the whole corpus — the scale
    * trap of `row_number() OVER (ORDER BY ...)`, which funnels 100 TB
    * through one window task. Reproducible on any engine, stable
    * under re-runs, and a different salt gives an independent
    * permutation per epoch. Tie-break doc_id (md5 collisions).
    */
  def p11CorpusShuffle(spark: SparkSession, sfDir: String): DataFrame = {
    val keyed = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"))
      .withColumn("shuffle_key",
        md5(concat(lit("p11:"), col("doc_id").cast("string"))))
    Relational.distributedRank(keyed, Nil,
        Seq("shuffle_key", "doc_id"), "shuffle_pos")
      .select(col("doc_id"), col("source"), col("shuffle_key"),
        col("shuffle_pos"))
      .orderBy(col("shuffle_pos"))
  }

  /** Keep-rates per quality quartile (percent): heavy downsampling of
    * the bottom, everything from the top — the quality-curriculum
    * mixture shape.
    */
  private val StratumRatesPct = Seq(10, 25, 50, 100)

  /** p06: quality-stratified sampling — documents bucketed into exact
    * quality-score quartiles (t02's score), then deterministically
    * md5-sampled at a per-stratum rate ([[StratumRatesPct]]): keep
    * little of the worst quality, everything from the best. This is
    * the quality-reweighting step between scoring (t02) and mixing
    * (p03); like p01/p03 the kept set is a pure function of doc_id,
    * reproducible on any engine.
    *
    * Scale shape: the quartile cutpoints are ONE exact-percentile
    * aggregation collapsed to a 1-row frame and broadcast back
    * (cross join with a 1-row side = a map-side literal join); the
    * stratum assignment and sampling hash are then pure per-row maps
    * — no window, no per-group funnel. Exact `percentile` shuffles
    * every score to one reducer per group at 100 TB; swap in
    * `percentile_approx` there (fixed-size sketch partials — same
    * trade as p05's distinct and q34's sketches; exact is kept here
    * because it is what the oracle can verify bit-for-bit).
    */
  def p06StratifiedSample(spark: SparkSession, sfDir: String): DataFrame = {
    // checkpointed: the cutpoint aggregation AND the main branch both
    // consume this frame, and Spark has no cross-branch reuse — an
    // unmaterialized `q` re-runs the whole t02 scoring scan twice
    // (the q23 lesson; the frame is two small columns per doc)
    val q = TextAnalysis.t02QualityScore(spark, sfDir)
      .select(col("doc_id"), col("quality_score"))
      .ckpt(true)
    val cuts = q.agg(expr(
      "percentile(quality_score, array(0.25, 0.5, 0.75))").as("c"))
      .select(col("c")(0).as("c1"), col("c")(1).as("c2"), col("c")(2).as("c3"))
    q.crossJoin(broadcast(cuts))
      .withColumn("stratum",
        when(col("quality_score") < col("c1"), 0)
          .when(col("quality_score") < col("c2"), 1)
          .when(col("quality_score") < col("c3"), 2)
          .otherwise(3))
      // a p06-specific salt: the same doc must be able to draw
      // independently for split (p01), mixing (p03) and stratified
      // sampling — an unsalted hash would correlate the three
      .withColumn("bucket",
        conv(substring(md5(concat(lit("p06:"), col("doc_id").cast("string"))), 1, 4),
          16, 10).cast("long") % 100)
      .withColumn("kept",
        col("bucket") < element_at(
          array(StratumRatesPct.map(r => lit(r)): _*), col("stratum") + 1))
      .select(col("doc_id"), col("quality_score"), col("stratum"), col("kept"))
      .orderBy(col("doc_id"))
  }

  /** p12: curriculum schedule — the corpus emitted in TRAINING ORDER:
    * quality-annealed phases (t02 quartiles, worst first so training
    * ends on the highest-quality data — the standard quality-anneal
    * recipe) with sources ROUND-ROBIN-interleaved inside each phase
    * (rank within (stratum, source) by salted md5, then a global rank
    * over (stratum, within-rank, source)) so no batch is
    * source-correlated. This is the ORDERING step after scoring
    * (t02), sampling (p06), and mixing (p03) — p11 gives a uniform
    * shuffle, p12 gives the schedule.
    *
    * Scale shape: the quartile cuts are one exact-percentile
    * aggregation broadcast back (p06's pattern and its documented
    * percentile_approx swap at 100 TB); the within-phase rank is a
    * PARTITIONED window ((stratum, source) partitions — never one
    * global window task); the final sequence comes from
    * [[Relational.distributedRank]] (range partition + broadcast
    * offsets). Every step is a pure function of (doc_id, text,
    * source), reproducible on any engine.
    */
  def p12Curriculum(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = TextAnalysis.t02QualityScore(spark, sfDir)
      .select(col("doc_id"), col("quality_score"))
      .ckpt(true) // cuts + assignment both consume it
    val cuts = q.agg(expr(
      "percentile(quality_score, array(0.25, 0.5, 0.75))").as("c"))
      .select(col("c")(0).as("c1"), col("c")(1).as("c2"), col("c")(2).as("c3"))
    val assigned = q.crossJoin(broadcast(cuts))
      .withColumn("stratum",
        when(col("quality_score") < col("c1"), 0)
          .when(col("quality_score") < col("c2"), 1)
          .when(col("quality_score") < col("c3"), 2)
          .otherwise(3))
      .join(Tables.documents(spark, sfDir).select(col("doc_id"), col("source")),
        "doc_id")
      .withColumn("k",
        md5(concat(lit("p12:"), col("doc_id").cast("string"))))
    val within = assigned.withColumn("rr", row_number().over(
      Window.partitionBy(col("stratum"), col("source"))
        .orderBy(col("k"), col("doc_id"))))
    Relational.distributedRank(within, Nil,
        Seq("stratum", "rr", "source", "doc_id"), "seq")
      .select(col("doc_id"), col("stratum"), col("source"), col("seq"))
      .orderBy(col("seq"))
  }

  /** p13: pipeline yield report — the survivor funnel every curation
    * run publishes (how many documents and tokens survive each gate,
    * applied CUMULATIVELY in pipeline order): raw → language filter
    * (en) → minimum length (n_chars ≥ 100) → head-prefix exact dedup
    * (min-doc_id copy per md5 of the first 80 chars — the d15
    * boilerplate signal as a gate) → lexical diversity (distinct
    * tokens ≥ 30% of tokens, an integer-only predicate:
    * 10·distinct ≥ 3·total). Output: one row per stage with
    * (n_docs, n_tokens, pct_docs of raw).
    *
    * Shape: stages 1–3 are flags aggregated in ONE corpus scan; the
    * dedup rank MUST be computed among stage-3 survivors only (a
    * prefix group can span documents with different lang/length
    * flags, so ranking over the raw corpus would crown a survivor
    * that the funnel already dropped — unlike full-text dedup, where
    * group members share all flags). Both aggregates are 1-row
    * frames assembled by broadcast cross join and unpivoted with
    * stack; counts and token sums are exact longs (the oracle CASTs
    * its sums back from HUGEINT), the pct is one double division
    * from integers.
    */
  /** p14 chunk geometry: window size, overlap, and the derived
    * stride. */
  private val ChunkSize = 128
  private val ChunkOverlap = 32
  private val ChunkStride = ChunkSize - ChunkOverlap

  /** p14: overlapping chunk addressing (the RAG / embedding-window
    * chunker): each document becomes windows of [[ChunkSize]] tokens
    * every [[ChunkStride]] tokens, plus one RIGHT-ALIGNED final
    * window at max(n − size, 0) so the document tail is always
    * covered by a full-width chunk (the convention retrieval
    * pipelines use so no tail token lands only in a runt chunk) —
    * p02 is the pretraining concat-and-pack; this is the retrieval
    * sibling where windows deliberately overlap. Output is the
    * ADDRESS table (doc_id, chunk_id, start_tok, end_tok, n_tok);
    * slicing text is a trivial downstream map, and at 100 TB the
    * address table is what gets joined, shuffled, and embedded
    * against — not the text.
    *
    * All-integer geometry: n_full = ceil((n − size)/stride) regular
    * starts (0 when n ≤ size), final start n − size, which is
    * PROVABLY distinct from and greater than every regular start
    * ((n_full−1)·stride < n−size by the ceil), so no dedup pass;
    * per-row `sequence` bounded by the document's own length.
    */
  def p14ChunkOverlap(spark: SparkSession, sfDir: String): DataFrame =
    chunkAddressesFor(Tables.documents(spark, sfDir))

  /** The p14 core over any (doc_id, text) frame — extracted so the
    * spec can exercise the multi-chunk geometry on synthetic long
    * documents (the test corpus's documents are all shorter than one
    * window, so the corpus oracle only sees the single-chunk path).
    */
  private[graft] def chunkAddressesFor(docs: DataFrame): DataFrame = {
    val (s, st) = (ChunkSize, ChunkStride)
    docs
      .select(col("doc_id"),
        expr("filter(split(lower(text), '[ \\n\\t\\r]+'), x -> x <> '')").as("t"))
      .select(col("doc_id"), size(col("t")).cast("long").as("n"))
      .withColumn("nf",
        expr(s"CASE WHEN n > $s THEN (n - $s + ${st - 1}) div $st ELSE 0L END"))
      .withColumn("starts",
        expr(s"""concat(
          |  CASE WHEN nf > 0 THEN transform(sequence(0L, nf - 1), k -> k * $st)
          |       ELSE CAST(array() AS ARRAY<BIGINT>) END,
          |  array(greatest(n - $s, 0L)))""".stripMargin))
      .select(col("doc_id"), col("n"),
        posexplode(col("starts")).as(Seq("chunk_id", "start_tok")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        col("start_tok"),
        least(col("start_tok") + s, col("n")).as("end_tok"))
      .withColumn("n_tok", col("end_tok") - col("start_tok"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  def p13YieldReport(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"), col("n_chars"))
      .withColumn("tk",
        expr("filter(split(lower(text), '[ \\n\\t\\r]+'), x -> x <> '')"))
      .withColumn("n_tokens", size(col("tk")).cast("long"))
    val s2 = col("lang") === "en"
    val s3 = col("n_chars") >= 100
    val aggB = base.agg(
      count(lit(1)).as("d1"), sum(col("n_tokens")).as("t1"),
      sum(when(s2, 1L).otherwise(0L)).as("d2"),
      sum(when(s2, col("n_tokens")).otherwise(0L)).as("t2"),
      sum(when(s2 && s3, 1L).otherwise(0L)).as("d3"),
      sum(when(s2 && s3, col("n_tokens")).otherwise(0L)).as("t3"))
    val surv = base.filter(s2 && s3)
      .withColumn("rk", row_number().over(
        Window.partitionBy(md5(substring(col("text"), 1, 80)))
          .orderBy(col("doc_id"))))
    val s4 = col("rk") === 1
    val s5 = expr("10 * size(array_distinct(tk)) >= 3 * size(tk)")
    val aggS = surv.agg(
      sum(when(s4, 1L).otherwise(0L)).as("d4"),
      sum(when(s4, col("n_tokens")).otherwise(0L)).as("t4"),
      sum(when(s4 && s5, 1L).otherwise(0L)).as("d5"),
      sum(when(s4 && s5, col("n_tokens")).otherwise(0L)).as("t5"))
    aggB.crossJoin(broadcast(aggS)).selectExpr(
      """stack(5,
        |  1, 'raw',          d1, t1, round(CAST(d1 AS DOUBLE) * 100.0D / d1, 2),
        |  2, 'lang_en',      d2, t2, round(CAST(d2 AS DOUBLE) * 100.0D / d1, 2),
        |  3, 'min_length',   d3, t3, round(CAST(d3 AS DOUBLE) * 100.0D / d1, 2),
        |  4, 'prefix_dedup', d4, t4, round(CAST(d4 AS DOUBLE) * 100.0D / d1, 2),
        |  5, 'diversity',    d5, t5, round(CAST(d5 AS DOUBLE) * 100.0D / d1, 2)
        |) AS (stage_id, stage, n_docs, n_tokens, pct_docs)""".stripMargin)
      .orderBy(col("stage_id"))
  }

  /** p15: classifier evaluation report — the reference's
    * mllib/evaluation surface (reference: /root/reference/mllib/src/
    * main/scala/org/apache/spark/mllib/evaluation/MulticlassMetrics
    * .scala:1) over t19's label/prediction pairs: per class,
    * (n_actual, n_predicted, tp) from three partial-agg'd counts on
    * the doc-level frame, then precision/recall/F1 as single double
    * divisions of exact integers (F1 via the 2·tp/(pred+actual)
    * identity — one division, no p·r chain for the oracle to
    * re-round). NULL where a class was never predicted (precision
    * undefined) — both engines agree on the guard. Output one row
    * per class appearing as label or prediction.
    *
    * Scale shape: t19's scoring dominates; the report itself is three
    * vocabulary-of-classes-sized aggregates + tiny outer joins.
    */
  def p15EvalReport(spark: SparkSession, sfDir: String): DataFrame = {
    val preds = TextAnalysis.t19NaiveBayes(spark, sfDir)
      .select(col("lang"), col("predicted"))
      .ckpt(true)
    val a = preds.groupBy(col("lang").as("cls")).agg(count(lit(1)).as("n_actual"))
    val p = preds.groupBy(col("predicted").as("cls"))
      .agg(count(lit(1)).as("n_predicted"))
    val t = preds.filter(col("lang") === col("predicted"))
      .groupBy(col("lang").as("cls")).agg(count(lit(1)).as("tp"))
    a.join(p, Seq("cls"), "full_outer").join(t, Seq("cls"), "full_outer")
      .select(col("cls"),
        coalesce(col("n_actual"), lit(0L)).as("n_actual"),
        coalesce(col("n_predicted"), lit(0L)).as("n_predicted"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .withColumn("prec",
        when(col("n_predicted") === 0, lit(null).cast("double"))
          .otherwise(round(col("tp") / col("n_predicted").cast("double"), 4)))
      .withColumn("rec",
        when(col("n_actual") === 0, lit(null).cast("double"))
          .otherwise(round(col("tp") / col("n_actual").cast("double"), 4)))
      .withColumn("f1",
        round((col("tp") * 2) /
          (col("n_predicted") + col("n_actual")).cast("double"), 4))
      .orderBy(col("cls"))
  }

  /** The DuckDB twin of [[p15EvalReport]]: t19's oracle as a nested
    * CTE, then the same three counts and single-division metrics.
    */
  private[graft] def p15OracleSql(nbSql: String): String =
    s"""WITH preds AS (
       |$nbSql
       |),
       |a AS (SELECT lang AS cls, CAST(count(*) AS BIGINT) AS n_actual
       |      FROM preds GROUP BY 1),
       |p AS (SELECT predicted AS cls, CAST(count(*) AS BIGINT) AS n_predicted
       |      FROM preds GROUP BY 1),
       |t AS (SELECT lang AS cls, CAST(count(*) AS BIGINT) AS tp
       |      FROM preds WHERE lang = predicted GROUP BY 1),
       |c AS (SELECT cls FROM a UNION SELECT cls FROM p)
       |SELECT c.cls,
       |  coalesce(a.n_actual, 0) AS n_actual,
       |  coalesce(p.n_predicted, 0) AS n_predicted,
       |  coalesce(t.tp, 0) AS tp,
       |  CASE WHEN coalesce(p.n_predicted, 0) = 0 THEN NULL
       |       ELSE round(coalesce(t.tp, 0) / CAST(p.n_predicted AS DOUBLE), 4)
       |  END AS prec,
       |  CASE WHEN coalesce(a.n_actual, 0) = 0 THEN NULL
       |       ELSE round(coalesce(t.tp, 0) / CAST(a.n_actual AS DOUBLE), 4)
       |  END AS rec,
       |  round((coalesce(t.tp, 0) * 2)
       |        / CAST(coalesce(p.n_predicted, 0) + coalesce(a.n_actual, 0) AS DOUBLE),
       |        4) AS f1
       |FROM c
       |LEFT JOIN a ON c.cls = a.cls
       |LEFT JOIN p ON c.cls = p.cls
       |LEFT JOIN t ON c.cls = t.cls
       |ORDER BY c.cls""".stripMargin

  /** [[p27Multilabel]] thresholds: a user's ACTUAL label set is the
    * event types it performed at least [[MlActualMinCount]] times; its
    * PREDICTED set is the types whose value-cents sum reached
    * [[MlPredictedMinCents]] (≈ the same engagement level via spend —
    * correlated with count but not identical, so the sets overlap
    * imperfectly and every metric is a real decision). Cents ticks
    * (floor(value·100 + 0.5)) keep the threshold an EXACT long
    * compare — a raw double sum would be order-dependent across
    * engines at the cut.
    */
  private[graft] val MlActualMinCount = 15L
  private[graft] val MlPredictedMinCents = 75000L

  /** Jaccard/F1 tick scale for the doc-averaged multilabel metrics. */
  private[graft] val MlTickScale = 4096L

  /** p27: multilabel classifier evaluation — the label-SET member of
    * the evaluation family (reference: /root/reference/mllib/src/main/
    * scala/org/apache/spark/mllib/evaluation/MultilabelMetrics
    * .scala:1) next to p15's multiclass, p17's ROC, p18's regression
    * and p19's ranking metrics. Per user, the actual and predicted
    * label sets come from the events table ([[MlActualMinCount]] /
    * [[MlPredictedMinCents]]); the report is LONG format — one row
    * per (metric, label) with the EXACT integer numerator/denominator
    * and value = round(num/den, 4) (NULL when den = 0), so every
    * number is a single division of exact longs:
    *
    *  - per-label precision/recall/f1 from (tp, fp, fn) counts, the
    *    reference's label-indexed members;
    *  - micro_* over the summed counts;
    *  - subset_accuracy (exact set matches / users) and hamming_loss
    *    (Σ symmetric difference / users·labels) — exact rationals;
    *  - the reference's DOC-AVERAGED accuracy/precision/recall/f1 are
    *    sums of per-doc rationals, which no single division can carry
    *    exactly — so each per-doc term is quantized to the
    *    [[MlTickScale]] grid first (num = Σ (x·4096 div y), den =
    *    users·4096 — a stated tick contract, deterministic in both
    *    engines), with the empty-set terms (|union| = 0 etc.)
    *    CASE-defined as vacuously perfect (4096);
    *  - macro_f1 as the same tick quantization over labels.
    *
    * Scale shape: ONE partial-agg'd (user, type) groupBy over events
    * (the only corpus-sized shuffle; counts and cent-sums combine
    * map-side), then every downstream frame is per-user (bounded by
    * the user universe) or label-set-sized; the report assembles from
    * 1-row and |labels|-row frames. Nothing collected.
    */
  def p27Multilabel(spark: SparkSession, sfDir: String): DataFrame =
    multilabelReport(Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        floor(col("value") * 100.0 + lit(0.5)).cast("long").as("cents")))

  /** The [[p27Multilabel]] core over a raw (user_id, event_type,
    * cents) frame — package-private so the spec can hand-count a
    * planted corpus.
    */
  private[graft] def multilabelReport(raw: DataFrame): DataFrame = {
    val per = raw
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"), sum(col("cents")).as("sc"))
      .ckpt(true)
    val act = per.filter(col("c") >= MlActualMinCount)
      .select(col("user_id"), col("event_type"))
    val pred = per.filter(col("sc") >= MlPredictedMinCents)
      .select(col("user_id"), col("event_type"))
    val both = act.join(pred, Seq("user_id", "event_type"))
    // per-user set sizes (na, np, ni) over the full user universe
    val users = per.select(col("user_id")).distinct()
    val docs = users
      .join(act.groupBy("user_id").agg(count(lit(1)).as("na")), Seq("user_id"), "left")
      .join(pred.groupBy("user_id").agg(count(lit(1)).as("np")), Seq("user_id"), "left")
      .join(both.groupBy("user_id").agg(count(lit(1)).as("ni")), Seq("user_id"), "left")
      .select(col("user_id"),
        coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("np"), lit(0L)).as("np"),
        coalesce(col("ni"), lit(0L)).as("ni"))
    val t = MlTickScale
    // doc-averaged tick terms: empty-set denominators are vacuously
    // perfect (the CASE both engines share)
    val docAgg = docs.agg(
      count(lit(1)).as("n_users"),
      sum((col("ni") === col("na") && col("ni") === col("np"))
        .cast("long")).as("n_exact"),
      sum(col("na") + col("np") - col("ni") * 2).as("symdiff"),
      sum(when(col("na") + col("np") - col("ni") === 0L, lit(t))
        .otherwise(expr(s"(ni * $t) div (na + np - ni)"))).as("acc_t"),
      sum(when(col("np") === 0L, lit(t))
        .otherwise(expr(s"(ni * $t) div np"))).as("prec_t"),
      sum(when(col("na") === 0L, lit(t))
        .otherwise(expr(s"(ni * $t) div na"))).as("rec_t"),
      sum(when(col("na") + col("np") === 0L, lit(t))
        .otherwise(expr(s"(ni * 2 * $t) div (na + np)"))).as("f1_t"))
      .ckpt(true)
    // per-label counts over the corpus label universe
    val labels = per.select(col("event_type")).distinct()
    val byLabel = labels
      .join(both.groupBy("event_type").agg(count(lit(1)).as("tp")),
        Seq("event_type"), "left")
      .join(act.groupBy("event_type").agg(count(lit(1)).as("n_act")),
        Seq("event_type"), "left")
      .join(pred.groupBy("event_type").agg(count(lit(1)).as("n_pred")),
        Seq("event_type"), "left")
      .select(col("event_type").as("label"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        (coalesce(col("n_pred"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fp"),
        (coalesce(col("n_act"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fn"))
      .ckpt(true)
    val labAgg = byLabel.agg(
      count(lit(1)).as("n_labels"),
      sum(col("tp")).as("s_tp"), sum(col("fp")).as("s_fp"),
      sum(col("fn")).as("s_fn"),
      sum(when(col("tp") * 2 + col("fp") + col("fn") === 0L, lit(t))
        .otherwise(expr(s"(tp * 2 * $t) div (tp * 2 + fp + fn)")))
        .as("macro_f1_t"))
    def metricRow(metric: String, label: Column, num: Column, den: Column) =
      struct(lit(metric).as("metric"), label.as("label"),
        num.cast("long").as("num"), den.cast("long").as("den"))
    val perLabelRows = byLabel.select(explode(array(
        metricRow("precision", col("label"), col("tp"), col("tp") + col("fp")),
        metricRow("recall", col("label"), col("tp"), col("tp") + col("fn")),
        metricRow("f1", col("label"), col("tp") * 2,
          col("tp") * 2 + col("fp") + col("fn")))).as("r"))
      .select(col("r.*"))
    val aggRows = labAgg.crossJoin(broadcast(docAgg))
      .select(explode(array(
        metricRow("micro_precision", lit("_all"), col("s_tp"),
          col("s_tp") + col("s_fp")),
        metricRow("micro_recall", lit("_all"), col("s_tp"),
          col("s_tp") + col("s_fn")),
        metricRow("micro_f1", lit("_all"), col("s_tp") * 2,
          col("s_tp") * 2 + col("s_fp") + col("s_fn")),
        metricRow("subset_accuracy", lit("_all"), col("n_exact"), col("n_users")),
        metricRow("hamming_loss", lit("_all"), col("symdiff"),
          col("n_users") * col("n_labels")),
        metricRow("accuracy", lit("_all"), col("acc_t"), col("n_users") * t),
        metricRow("doc_precision", lit("_all"), col("prec_t"),
          col("n_users") * t),
        metricRow("doc_recall", lit("_all"), col("rec_t"), col("n_users") * t),
        metricRow("doc_f1", lit("_all"), col("f1_t"), col("n_users") * t),
        metricRow("macro_f1", lit("_all"), col("macro_f1_t"),
          col("n_labels") * t))).as("r"))
      .select(col("r.*"))
    perLabelRows.unionByName(aggRows)
      .withColumn("value",
        when(col("den") === 0L, lit(null).cast("double"))
          .otherwise(round(col("num") / col("den").cast("double"), 4)))
      .orderBy(col("metric"), col("label"))
  }

  /** The DuckDB twin of [[p27Multilabel]]: the same (user, type)
    * aggregate, set-count joins, tick CASEs, and single-division
    * report — every num/den CAST back to BIGINT (DuckDB widens sums
    * to HUGEINT, the g02 guard).
    */
  private[graft] def p27OracleSql: String = {
    val t = MlTickScale
    s"""WITH per AS (
       |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c,
       |    CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sc
       |  FROM events GROUP BY 1, 2),
       |act AS (SELECT user_id, event_type FROM per WHERE c >= $MlActualMinCount),
       |pred AS (SELECT user_id, event_type FROM per
       |         WHERE sc >= $MlPredictedMinCents),
       |b_ AS (SELECT a.user_id, a.event_type
       |       FROM act a JOIN pred p USING (user_id, event_type)),
       |users AS (SELECT DISTINCT user_id FROM per),
       |docs AS (
       |  SELECT u.user_id, coalesce(xa.n, 0) AS na, coalesce(xp.n, 0) AS np,
       |         coalesce(xi.n, 0) AS ni
       |  FROM users u
       |  LEFT JOIN (SELECT user_id, CAST(count(*) AS BIGINT) AS n
       |             FROM act GROUP BY 1) xa USING (user_id)
       |  LEFT JOIN (SELECT user_id, CAST(count(*) AS BIGINT) AS n
       |             FROM pred GROUP BY 1) xp USING (user_id)
       |  LEFT JOIN (SELECT user_id, CAST(count(*) AS BIGINT) AS n
       |             FROM b_ GROUP BY 1) xi USING (user_id)),
       |docagg AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_users,
       |    CAST(sum(CASE WHEN ni = na AND ni = np THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_exact,
       |    CAST(sum(na + np - ni * 2) AS BIGINT) AS symdiff,
       |    CAST(sum(CASE WHEN na + np - ni = 0 THEN $t
       |             ELSE (ni * $t) // (na + np - ni) END) AS BIGINT) AS acc_t,
       |    CAST(sum(CASE WHEN np = 0 THEN $t
       |             ELSE (ni * $t) // np END) AS BIGINT) AS prec_t,
       |    CAST(sum(CASE WHEN na = 0 THEN $t
       |             ELSE (ni * $t) // na END) AS BIGINT) AS rec_t,
       |    CAST(sum(CASE WHEN na + np = 0 THEN $t
       |             ELSE (ni * 2 * $t) // (na + np) END) AS BIGINT) AS f1_t
       |  FROM docs),
       |labels AS (SELECT DISTINCT event_type FROM per),
       |bylabel AS (
       |  SELECT l.event_type AS label, coalesce(xt.n, 0) AS tp,
       |    coalesce(xp.n, 0) - coalesce(xt.n, 0) AS fp,
       |    coalesce(xa.n, 0) - coalesce(xt.n, 0) AS fn
       |  FROM labels l
       |  LEFT JOIN (SELECT event_type, CAST(count(*) AS BIGINT) AS n
       |             FROM b_ GROUP BY 1) xt USING (event_type)
       |  LEFT JOIN (SELECT event_type, CAST(count(*) AS BIGINT) AS n
       |             FROM act GROUP BY 1) xa USING (event_type)
       |  LEFT JOIN (SELECT event_type, CAST(count(*) AS BIGINT) AS n
       |             FROM pred GROUP BY 1) xp USING (event_type)),
       |labagg AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_labels,
       |    CAST(sum(tp) AS BIGINT) AS s_tp, CAST(sum(fp) AS BIGINT) AS s_fp,
       |    CAST(sum(fn) AS BIGINT) AS s_fn,
       |    CAST(sum(CASE WHEN tp * 2 + fp + fn = 0 THEN $t
       |             ELSE (tp * 2 * $t) // (tp * 2 + fp + fn) END) AS BIGINT)
       |      AS macro_f1_t
       |  FROM bylabel),
       |rws AS (
       |  SELECT 'precision' AS metric, label, tp AS num, tp + fp AS den
       |  FROM bylabel
       |  UNION ALL SELECT 'recall', label, tp, tp + fn FROM bylabel
       |  UNION ALL SELECT 'f1', label, tp * 2, tp * 2 + fp + fn FROM bylabel
       |  UNION ALL SELECT 'micro_precision', '_all', s_tp, s_tp + s_fp
       |    FROM labagg
       |  UNION ALL SELECT 'micro_recall', '_all', s_tp, s_tp + s_fn FROM labagg
       |  UNION ALL SELECT 'micro_f1', '_all', s_tp * 2,
       |    s_tp * 2 + s_fp + s_fn FROM labagg
       |  UNION ALL SELECT 'subset_accuracy', '_all', n_exact, n_users
       |    FROM docagg
       |  UNION ALL SELECT 'hamming_loss', '_all', d.symdiff,
       |    d.n_users * l.n_labels FROM docagg d, labagg l
       |  UNION ALL SELECT 'accuracy', '_all', acc_t, n_users * $t FROM docagg
       |  UNION ALL SELECT 'doc_precision', '_all', prec_t, n_users * $t
       |    FROM docagg
       |  UNION ALL SELECT 'doc_recall', '_all', rec_t, n_users * $t
       |    FROM docagg
       |  UNION ALL SELECT 'doc_f1', '_all', f1_t, n_users * $t FROM docagg
       |  UNION ALL SELECT 'macro_f1', '_all', l.macro_f1_t,
       |    l.n_labels * $t FROM labagg l)
       |SELECT metric, label, CAST(num AS BIGINT) AS num,
       |  CAST(den AS BIGINT) AS den,
       |  CASE WHEN den = 0 THEN NULL
       |       ELSE round(num / CAST(den AS DOUBLE), 4) END AS value
       |FROM rws
       |ORDER BY metric, label""".stripMargin
  }

  /** p16: the ml feature-transformer surface in one pass over the
    * corpus — the encode step a training pipeline runs before
    * assembling model inputs (reference: /root/reference/mllib/src/
    * main/scala/org/apache/spark/ml/feature/StringIndexer.scala:1,
    * OneHotEncoder.scala:1, Bucketizer.scala:1, StandardScaler.scala:1).
    * Per document: `source_index` = StringIndexer with the default
    * frequencyDesc order (ties toward the smaller string — exact
    * integer rank on the DISTINCT-source frame, which is
    * vocabulary-sized, so the window ranks a tiny broadcast frame,
    * never the corpus); `n_sources` = the one-hot width the encoder
    * would emit (index + width IS the sparse one-hot encoding);
    * `len_bucket` = Bucketizer with fixed splits 200/400/800 on
    * n_chars (a pure map, no quantile pass); `len_z_ticks` =
    * StandardScaler in 2^10 ticks of the z-score, computed from ONE
    * partial-agg'd (n, S, Q) moment scan — z = (x*n - S)/sqrt(n*Q - S^2),
    * numerator exact int64, the variance term exact DECIMAL(38,0)
    * (n*Q overflows int64 at corpus scale — the q40 moment contract),
    * both engines convert the SAME exact integers to double before
    * the sqrt/divide, so ties land identically. At extreme corpus
    * scale (n ~ 1e12 docs) the int64 numerator x*n - S needs the
    * documented f02-style retune (coarser tick scale or a
    * DECIMAL(38,0) numerator); test SFs sit orders of magnitude
    * inside the bound.
    *
    * Scale shape: one corpus scan for the moments (map-side partial
    * agg to 3 numbers), one vocabulary-sized groupBy for the index
    * frame, then a broadcast join + pure projection — no corpus
    * shuffle, no window over data rows.
    */
  def p16FeatureEncode(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val freq = docs.groupBy(col("source")).agg(count(lit(1)).as("c"))
    // distinct-source frame is vocabulary-sized: the rank window runs
    // over a broadcast-small input, not the corpus
    val idx = freq.select(col("source"),
        (row_number().over(Window.orderBy(col("c").desc, col("source")))
          - lit(1)).cast("long").as("source_index"))
      .ckpt(true)
    // vocabulary count as a 1-row broadcast (NOT an eager count() —
    // the operator stays a pure declarative plan, the ADVICE r10 fix)
    val nSrc = idx.agg(count(lit(1)).as("n_sources"))
    val stats = docs.agg(
      count(lit(1)).as("n"),
      sum(col("n_chars")).as("s"),
      sum((col("n_chars") * col("n_chars")).cast("decimal(38,0)")).as("q"))
    val num = col("n_chars") * col("n") - col("s")
    val den2 = (col("n").cast("decimal(38,0)") * col("q")
      - col("s").cast("decimal(38,0)") * col("s"))
    docs.join(broadcast(idx), "source")
      .crossJoin(broadcast(stats))
      .crossJoin(broadcast(nSrc))
      .select(
        col("doc_id"), col("source"), col("source_index"),
        col("n_sources"),
        when(col("n_chars") < 200, lit(0L))
          .when(col("n_chars") < 400, lit(1L))
          .when(col("n_chars") < 800, lit(2L))
          .otherwise(lit(3L)).as("len_bucket"),
        when(den2 > 0,
            floor(num.cast("double") * lit(1024.0)
              / sqrt(den2.cast("double")) + lit(0.5)).cast("long"))
          .otherwise(lit(0L)).as("len_z_ticks"))
      .orderBy(col("doc_id"))
  }

  /** ROC curve bins for [[p17RocAuc]] — the reference evaluator's
    * numBins downsampling knob.
    */
  private[graft] val RocBins = 32

  /** p17: binned ROC curve + AUC for a score/label pair — the
    * reference's binary-classification evaluation surface (reference:
    * /root/reference/mllib/src/main/scala/org/apache/spark/mllib/
    * evaluation/BinaryClassificationMetrics.scala:1, whose `numBins`
    * parameter performs EXACTLY this curve downsampling at scale).
    * Score: the distinct-token-ratio ticks (v3) of the shared
    * [[TextAnalysis.docFeatures]] frame; label: lang = 'en' — the
    * same (feature, label) pair whose separability the tree family
    * already exercises. Scores land on the stump family's
    * data-derived [[RocBins]] grid (1-row broadcast [min, max]);
    * per-bin (positives, negatives) come from ONE partial-agg'd
    * corpus pass, and every curve point and the AUC are EXACT
    * integers on that binned curve: descending cumulative TP/FP per
    * threshold, tpr/fpr in 2^20 ticks (non-negative, so `div` ≡
    * `//`), and the trapezoid AUC as the tie-aware Mann-Whitney
    * doubling 2U = Σ_b pos_b · (2·neg_below + neg_b) (the q54
    * midrank identity on bins). Headroom: 2U ≤ 2·P·N and
    * 2U·2^20 < 2^63 up to P·N ≈ 4·10^12 — the documented retune
    * reports (2U, 2PN) alone at corpus scale.
    *
    * Output: one row per populated bin (ascending) with constant
    * (auc2_num, auc_ticks) columns — the curve AND the scalar in one
    * result, the evaluator's roc()/areaUnderROC() pair.
    *
    * Scale shape: one corpus scan to bin (map-side partial agg to
    * ≤ [[RocBins]] rows); every window and join after runs on the
    * bin frame. Nothing scales with corpus size.
    */
  def p17RocAuc(spark: SparkSession, sfDir: String): DataFrame = {
    val f = TextAnalysis.docFeatures(spark, sfDir)
      .select(col("y"), col("v3").as("x"))
    val st = f.agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val perBin = f.crossJoin(broadcast(st))
      .withColumn("bin", expr(s"((x - mn) * $RocBins) div (mx - mn + 1)"))
      .groupBy(col("bin"))
      .agg(sum(col("y")).as("n_pos"), sum(lit(1L) - col("y")).as("n_neg"))
      .ckpt(true)
    val tot = perBin.agg(sum(col("n_pos")).as("p"), sum(col("n_neg")).as("nn"))
    val wDesc = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBelow = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cu = perBin
      .withColumn("cum_tp", sum(col("n_pos")).over(wDesc))
      .withColumn("cum_fp", sum(col("n_neg")).over(wDesc))
      .withColumn("neg_below",
        coalesce(sum(col("n_neg")).over(wBelow), lit(0L)))
      .ckpt(true)
    val u2 = cu.agg(sum(col("n_pos")
      * (lit(2L) * col("neg_below") + col("n_neg"))).as("auc2_num"))
    // single-class inputs (p = 0 or nn = 0) report 0 ticks by the
    // family's shared CASE zero-denominator convention in BOTH
    // engines (Spark div would NULL where DuckDB // errors)
    cu.crossJoin(broadcast(tot)).crossJoin(broadcast(u2))
      .select(col("bin"), col("n_pos"), col("n_neg"),
        col("cum_tp"), col("cum_fp"),
        expr("CASE WHEN p > 0 THEN (cum_tp * 1048576L) div p " +
          "ELSE 0L END").as("tpr_ticks"),
        expr("CASE WHEN nn > 0 THEN (cum_fp * 1048576L) div nn " +
          "ELSE 0L END").as("fpr_ticks"),
        col("auc2_num"),
        expr("CASE WHEN p > 0 AND nn > 0 THEN " +
          "(auc2_num * 1048576L) div (2L * p * nn) ELSE 0L END")
          .as("auc_ticks"))
      .orderBy(col("bin"))
  }

  /** p18: regression-evaluation metrics for the q49 ridge fit — the
    * reference's regression scoring surface (reference: /root/
    * reference/mllib/src/main/scala/org/apache/spark/mllib/
    * evaluation/RegressionMetrics.scala:1 — meanAbsoluteError,
    * meanSquaredError, r2, explainedVariance), computed per model
    * group over the SAME on-grid feature frame q49 trains on
    * ([[Relational.ridgeBase]], the resubstitution framing t19/t20
    * already state honestly).
    *
    * Exactness contract: the fitted coefficients live on the 2⁻¹²
    * grid and every feature is integer or 2⁻¹²-grid, so the
    * prediction c0·f0 + … + c3·f3 and the residual r − ŷ are EXACT
    * dyadic doubles on the 2⁻²⁴ grid (each |term| < 2⁵³·2⁻²⁴ —
    * order-independent). Residual/target/prediction quantize to
    * integer grids BEFORE squaring (|r|·2¹² for the linear MAE sum,
    * ·2⁶ for the squared sums) — the q49 overflow ladder: at sf0.1
    * Σr6² < 2⁵⁷/1048576 and n·Σy6² < 2⁶⁰, with the documented
    * corpus-scale retune being a coarser square grid (2⁴) plus the
    * s13 two-level segmented sum. All ratio outputs are truncating
    * integer divisions of non-negative longs (div ≡ //, the s15
    * agreement): MAE and MSE in 2²⁰ ticks of y-units, R² ticks as
    * 2²⁰ − SSE·2²⁰ div (SST div n·n-form), explained variance via
    * the n·Σx²−(Σx)² centered form (non-negative by Cauchy-Schwarz).
    *
    * Scale shape: the 3-row model broadcasts back onto one corpus
    * scan; per-group state is 7 running sums. Nothing else.
    */
  def p18RegressionEval(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Relational.ridgeBase(spark, sfDir)
    val model = graft.operators.Recommend.solveSide(base, "l_returnflag")
      .select(Seq(col("l_returnflag")) ++
        (0 to 3).map(k => col(s"f$k").as(s"c$k")): _*)
    regressionMetrics(base, model)
  }

  /** The p18 scoring tail over an arbitrary on-grid (group, r,
    * f0..f3) frame and (group, c0..c3) model — package-private so the
    * planted-exact-fit spec can pin the metric endpoints (residual 0
    * ⇒ mae = mse = 0, r2 = 2²⁰).
    */
  private[graft] def regressionMetrics(base: DataFrame,
      model: DataFrame): DataFrame =
    regressionMetricsBy(base, model, Nil)

  /** [[regressionMetrics]] with extra MODEL-side grouping keys
    * (p29 scores one held-out scan against several models at once —
    * the join on l_returnflag fans each row out to every model
    * variant and the aggregate groups them apart again).
    */
  private[graft] def regressionMetricsBy(base: DataFrame,
      model: DataFrame, extraKeys: Seq[String]): DataFrame = {
    val keys = extraKeys :+ "l_returnflag"
    base.join(broadcast(model), "l_returnflag")
      .withColumn("pred", expr("c0*f0 + c1*f1 + c2*f2 + c3*f3"))
      .withColumn("res", col("r") - col("pred"))
      .select(keys.map(col) ++ Seq(
        expr("CAST(floor(res * 4096.0 + 0.5) AS BIGINT)").as("r12"),
        expr("CAST(floor(res * 64.0 + 0.5) AS BIGINT)").as("r6"),
        expr("CAST(floor(r * 64.0 + 0.5) AS BIGINT)").as("y6"),
        expr("CAST(floor(pred * 64.0 + 0.5) AS BIGINT)").as("p6")): _*)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(abs(col("r12"))).as("sae12"),
        sum(col("r6") * col("r6")).as("sse6"),
        sum(col("y6")).as("sy6"),
        sum(col("y6") * col("y6")).as("syy6"),
        sum(col("p6")).as("sp6"),
        sum(col("p6") * col("p6")).as("spp6"))
      .select(keys.map(col) ++ Seq(col("n"),
        expr("(sae12 * 256) div n").as("mae_ticks"),
        expr("(sse6 * 256) div n").as("mse_ticks"),
        // zero-variance target -> R^2 reported 0 by a shared CASE
        // (the s19 convention; DuckDB would error on the division)
        expr("""CASE WHEN (n * syy6 - sy6 * sy6) div n > 0
               |THEN 1048576 - (sse6 * 1048576)
               |  div ((n * syy6 - sy6 * sy6) div n)
               |ELSE CAST(0 AS BIGINT) END""".stripMargin).as("r2_ticks"),
        expr("(((n * spp6 - sp6 * sp6) div n) * 256) div n")
          .as("evar_ticks")): _*)
      .orderBy(keys.map(col): _*)
  }

  /** p20: reproducible random feature attachment — the reference's
    * synthetic-data surface (reference: /root/reference/mllib/src/
    * main/scala/org/apache/spark/mllib/random/RandomRDDs.scala:1 —
    * uniformRDD / normalRDD, seeded per-partition generators) and
    * the deterministic replacement for `rand(seed)` (whose values
    * depend on partition layout — NOT reproducible across
    * repartitioning, while a pipeline's split/sample/noise steps
    * must be): every row's draws are a pure function of its KEY
    * through the md5 stream ('rnd:' prefix), so they survive any
    * partitioning, retry, or engine (the p01 split-assign rule
    * generalized to continuous draws).
    *
    * Draws: u_ticks = the first 20 md5 bits — exact uniform on
    * [0, 2²⁰); z_ticks = Σ_{k=1..12} u_k − 6·2²⁰ — the Irwin-Hall
    * sum, mean 0 and variance exactly 12·Var(u) ≈ 2⁴⁰ so
    * z_ticks/2²⁰ approximates N(0,1) with all arithmetic exact
    * integers (the q50 no-transcendental rule applied to sampling:
    * no Box-Muller log/cos anywhere). Per-row map, no shuffle, no
    * state — the generator scales like the scan itself.
    */
  def p20RandomFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    def u(tag: String): Column =
      conv(substring(md5(concat(lit(s"rnd:$tag:"),
        col("doc_id").cast("string"))), 1, 5), 16, 10).cast("long")
    val z = (1 to 12).map(k => u(s"z$k")).reduce(_ + _) - lit(6L * 1048576L)
    Tables.documents(spark, sfDir).select(col("doc_id"))
      .withColumn("u_ticks", u("u"))
      .withColumn("z_ticks", z)
      .orderBy(col("doc_id"))
  }

  /** p20's DuckDB twin — the same md5 bit-slice arithmetic. */
  private[graft] def p20OracleSql: String = {
    def u(tag: String): String =
      s"CAST(('0x' || substr(md5('rnd:$tag:' || CAST(doc_id AS VARCHAR)), " +
        "1, 5))::UBIGINT AS BIGINT)"
    val z = (1 to 12).map(k => u(s"z$k")).mkString(" + ") + " - 6 * 1048576"
    s"""SELECT doc_id, ${u("u")} AS u_ticks, $z AS z_ticks
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** p23: the remaining ml/feature vector transformers in one pass —
    * Normalizer (L2), Binarizer, ElementwiseProduct (reference:
    * /root/reference/mllib/src/main/scala/org/apache/spark/mllib/
    * feature/Normalizer.scala:1, ml/feature/Binarizer.scala:1,
    * mllib/feature/ElementwiseProduct.scala:1) applied to the
    * embedding corpus in long form: per (vec_id, dim) the quantized
    * 2¹⁰ tick, the L2-normalized component in 2²⁰ ticks (the ONLY
    * double step — q/√(Σq²) through one shared tree on exact
    * integers, the s19 convention; √ runs once per ROW-dim pair on
    * the same integer pair both engines hold), the Binarizer bit
    * (x > 0), and the elementwise product against the fixed literal
    * weight vector w_d = d%4+1 (exact long). Zero vectors emit
    * normalized 0 by a shared CASE.
    *
    * Scale shape: one exploded scan; Σq² partial-aggregates per
    * vector on the explode's own key (no second corpus read — the
    * grouped sums join back vec-keyed); everything else is a pure
    * per-row map.
    */
  def p23VectorTransforms(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), posexplode(expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1024.0D + 0.5D) AS BIGINT))"))
        .as(Seq("d", "q")))
      .select(col("vec_id"), col("d").cast("long").as("d"), col("q"))
      .ckpt(true)
    val n2 = e.groupBy(col("vec_id")).agg(sum(expr("q * q")).as("n2"))
    e.join(n2, "vec_id")
      .select(col("vec_id"), col("d"), col("q").as("q_ticks"),
        expr("""CASE WHEN n2 > 0
               |THEN CAST(floor(CAST(q AS DOUBLE) / sqrt(CAST(n2 AS DOUBLE))
               |  * 1048576.0D + 0.5D) AS BIGINT)
               |ELSE CAST(0 AS BIGINT) END""".stripMargin).as("unit_ticks"),
        (col("q") > 0L).cast("long").as("bin"),
        (col("q") * (col("d") % 4L + 1L)).as("ewp_ticks"))
      .orderBy(col("vec_id"), col("d"))
  }

  /** p23's DuckDB twin — the same explode, Σq² join-back, and tree. */
  private[graft] def p23OracleSql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(a.i AS BIGINT) AS d,
      |    CAST(floor(CAST(embedding[a.i + 1] AS DOUBLE) * 1024.0 + 0.5)
      |      AS BIGINT) AS q
      |  FROM embeddings, UNNEST(generate_series(0, 63)) AS a(i)),
      |n2 AS (SELECT vec_id, CAST(sum(q * q) AS BIGINT) AS n2
      |       FROM e GROUP BY vec_id)
      |SELECT e.vec_id, e.d, e.q AS q_ticks,
      |  CASE WHEN n2.n2 > 0
      |  THEN CAST(floor(CAST(e.q AS DOUBLE) / sqrt(CAST(n2.n2 AS DOUBLE))
      |    * 1048576.0 + 0.5) AS BIGINT)
      |  ELSE CAST(0 AS BIGINT) END AS unit_ticks,
      |  CASE WHEN e.q > 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS bin,
      |  e.q * (e.d % 4 + 1) AS ewp_ticks
      |FROM e JOIN n2 ON e.vec_id = n2.vec_id
      |ORDER BY e.vec_id, e.d""".stripMargin

  /** The z-score tree both engines evaluate verbatim (the t09
    * shared-literal contract): sample-std standardization
    * z = (q·n − s1)·√(n−1) / √(n·(n·s2 − s1²)) in 2¹⁰ ticks —
    * every input an exact long (q ≤ 2¹⁰ ticks, n·s2 − s1² exact to
    * n·q² < 2⁶³), one fixed double tree, constant dimensions
    * (n·s2 = s1², includes n = 1) CASE to 0.
    */
  private[graft] val ScalerZExpr: String =
    """CASE WHEN n * s2 - s1 * s1 > 0
      |THEN CAST(floor(CAST(q * n - s1 AS DOUBLE)
      |  * sqrt(CAST(n - 1 AS DOUBLE))
      |  / sqrt(CAST(n AS DOUBLE) * CAST(n * s2 - s1 * s1 AS DOUBLE))
      |  * 1024.0 + 0.5) AS BIGINT)
      |ELSE CAST(0 AS BIGINT) END""".stripMargin

  /** The two FULLY-INTEGER scaler columns — min-max to [0, 2²⁰] and
    * max-abs to [−2²⁰, 2²⁰] — rendered for either engine (`div` /
    * `//`; truncating agreement is the established s15 contract,
    * and max-abs is the one signed division).
    */
  private[graft] def scalerDivCols(div: String): Seq[(String, String)] = Seq(
    "mm_ticks" -> (s"CAST(CASE WHEN mx > mn THEN ((q - mn) * 1048576) $div " +
      "(mx - mn) ELSE 0 END AS BIGINT)"),
    "ma_ticks" -> (s"CAST(CASE WHEN mabs > 0 THEN (q * 1048576) $div mabs " +
      "ELSE 0 END AS BIGINT)"))

  /** p25: the three ml/feature scalers in one exploded pass —
    * StandardScaler (sample-std z-score, [[ScalerZExpr]]),
    * MinMaxScaler and MaxAbsScaler (both exact integer maps,
    * [[scalerDivCols]]) over the embedding corpus in long form
    * (reference: /root/reference/mllib/src/main/scala/org/apache/
    * spark/ml/feature/StandardScaler.scala:1, MinMaxScaler.scala:1,
    * MaxAbsScaler.scala:1 — fit computes per-dimension summary
    * stats, transform maps each component; here fit is ONE
    * partial-agg'd pass to a 64-row (d, n, s1, s2, mn, mx, mabs)
    * stats frame and transform is a broadcast join back — the p23
    * posture completing the ml/feature scaler family).
    *
    * Scale shape: one exploded scan collapses map-side to 64 stat
    * rows; the transform join is a 64-row broadcast; nothing
    * shuffles but the presentation sort. At any corpus the stats
    * frame stays dimension-sized.
    */
  def p25FeatureScalers(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), posexplode(expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1024.0D + 0.5D) AS BIGINT))"))
        .as(Seq("d", "q")))
      .select(col("vec_id"), col("d").cast("long").as("d"), col("q"))
      .ckpt(true)
    val st = e.groupBy(col("d")).agg(count(lit(1)).as("n"),
      sum(col("q")).as("s1"), sum(col("q") * col("q")).as("s2"),
      min(col("q")).as("mn"), max(col("q")).as("mx"),
      max(abs(col("q"))).as("mabs"))
    val joined = e.join(broadcast(st), "d")
      .withColumn("z_kticks", expr(ScalerZExpr))
    scalerDivCols("div").foldLeft(joined) {
        case (df, (c, x)) => df.withColumn(c, expr(x))
      }
      .select(col("vec_id"), col("d"), col("q").as("q_ticks"),
        col("z_kticks"), col("mm_ticks"), col("ma_ticks"))
      .orderBy(col("vec_id"), col("d"))
  }

  /** p25's DuckDB twin — the same explode, 64-row stats frame, the
    * shared z tree and the `//`-rendered integer scaler columns.
    */
  private[graft] def p25OracleSql: String = {
    val divCols = scalerDivCols("//")
      .map { case (c, x) => s"$x AS $c" }.mkString(",\n  ")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(a.i AS BIGINT) AS d,
       |    CAST(floor(CAST(embedding[a.i + 1] AS DOUBLE) * 1024.0 + 0.5)
       |      AS BIGINT) AS q
       |  FROM embeddings, UNNEST(generate_series(0, 63)) AS a(i)),
       |st AS (
       |  SELECT d, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(q) AS BIGINT) AS s1, CAST(sum(q * q) AS BIGINT) AS s2,
       |    CAST(min(q) AS BIGINT) AS mn, CAST(max(q) AS BIGINT) AS mx,
       |    CAST(max(abs(q)) AS BIGINT) AS mabs
       |  FROM e GROUP BY d)
       |SELECT vec_id, d, q AS q_ticks,
       |  $ScalerZExpr AS z_kticks,
       |  $divCols
       |FROM e JOIN st USING (d)
       |ORDER BY vec_id, d""".stripMargin
  }

  /** DCT length for [[p26FeatureExpand]]. */
  private[graft] val DctDims = 8

  /** DCT-II tick table: w(k)(n) = floor(cos(π(n+1/2)k/8)·2²⁰ + 0.5),
    * computed ONCE here and interpolated into BOTH engines as
    * literal integers (the p19 NDCG-discount convention — no
    * transcendental runs in either engine at query time; the
    * orthogonal-basis identities survive the quantization exactly
    * where the table is symmetric, spec'd).
    */
  private[graft] lazy val DctTicks: Seq[Seq[Long]] =
    (0 until DctDims).map(k => (0 until DctDims).map(n =>
      math.floor(math.cos(math.Pi * (n + 0.5) * k / DctDims)
        * 1048576.0 + 0.5).toLong))

  /** The 8 DCT output columns as shared expression strings over the
    * tick columns q0..q7 — exact long dot products against the
    * literal table (|term| ≤ 2¹⁰·2²⁰, 8 terms → ≤ 2³³).
    */
  private[graft] def dctExprs: Seq[(String, String)] =
    (0 until DctDims).map { k =>
      s"dct$k" -> (0 until DctDims).map(n => s"q$n * ${DctTicks(k)(n)}")
        .mkString("(", " + ", ")")
    }

  /** The degree-2 PolynomialExpansion terms of the first 3
    * components — exact tick products; the cross terms (i ≠ j) ARE
    * the reference Interaction transformer's column products.
    */
  private[graft] def polyExprs: Seq[(String, String)] =
    for { i <- 0 until 3; j <- i until 3 }
      yield s"p$i$j" -> s"q$i * q$j"

  /** p26: the remaining SUBSTANTIVE ml/feature transforms in one
    * projection — DCT (reference ml/feature/DCT.scala — the one
    * transform whose basis is transcendental, carried as the
    * [[DctTicks]] literal table), degree-2 PolynomialExpansion
    * (reference ml/feature/PolynomialExpansion.scala) and Interaction
    * (reference ml/feature/Interaction.scala — the cross products)
    * over the embedding head. Everything is exact long arithmetic in
    * ONE codegen'd projection — no shuffle beyond the presentation
    * sort. (The remaining ml/feature members are API plumbing with no
    * computational content on this engine: VectorAssembler/Slicer/
    * SizeHint/Indexer assemble or subset arrays the DataFrame API
    * expresses directly, SQLTransformer IS the engine, RFormula is a
    * parser over the same fits, Tokenizer/StopWordsRemover/NGram are
    * the t03/t02/d04 text kernels, FeatureHasher is t30's hashing on
    * mixed columns, and Imputer needs null data this corpus does not
    * contain — each usable through existing keys, none omitted for
    * difficulty.)
    */
  def p26FeatureExpand(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.embeddings(spark, sfDir).select(
      col("vec_id") +: (0 until DctDims).map(i =>
        expr(s"CAST(floor(CAST(element_at(embedding, ${i + 1}) AS DOUBLE)" +
          " * 1024.0D + 0.5D) AS BIGINT)").as(s"q$i")): _*)
    val out = (polyExprs ++ dctExprs).foldLeft(base) {
      case (df, (c, x)) => df.withColumn(c, expr(x))
    }
    out.select(col("vec_id") +:
        ((0 until 3).map(i => col(s"q$i").as(s"q${i}_ticks")) ++
          polyExprs.map { case (c, _) => col(c) } ++
          dctExprs.map { case (c, _) => col(c) }): _*)
      .orderBy(col("vec_id"))
  }

  /** p26's DuckDB twin — the same tick head, the SAME interpolated
    * literal table and product strings.
    */
  private[graft] def p26OracleSql: String = {
    val head = (0 until DctDims).map(i =>
      s"CAST(floor(CAST(embedding[${i + 1}] AS DOUBLE) * 1024.0 + 0.5)" +
        s" AS BIGINT) AS q$i").mkString(",\n    ")
    val cols = ((0 until 3).map(i => s"q$i AS q${i}_ticks") ++
      polyExprs.map { case (c, x) => s"$x AS $c" } ++
      dctExprs.map { case (c, x) => s"$x AS $c" }).mkString(",\n  ")
    s"""WITH b AS (
       |  SELECT vec_id,
       |    $head
       |  FROM embeddings)
       |SELECT vec_id,
       |  $cols
       |FROM b ORDER BY vec_id""".stripMargin
  }

  /** Folds used by [[p22CrossValidation]]. */
  private[graft] val CvFolds = 4

  /** p22: k-fold cross-validation of the q49 ridge model — the
    * reference's model-selection surface (reference: /root/reference/
    * mllib/src/main/scala/org/apache/spark/ml/tuning/
    * CrossValidator.scala:1 — split into k folds, fit on each
    * complement, evaluate on the held-out fold) and the engine's
    * first HELD-OUT evaluation: p15/p18/p19 state the resubstitution
    * framing honestly; this key is the answer — fold ids are a pure
    * md5 function of the row key (the p20 partition-invariance
    * rule, so folds survive any repartitioning — Spark's
    * randomSplit does NOT), each fold's model trains on the other
    * k−1 folds via the SAME solveSide chain as q49, and the
    * held-out fold is scored by the SAME integer metric tail as p18.
    * Held-out R² may sit below the resubstitution R² — that gap IS
    * the generalization measurement.
    *
    * Scale shape: k passes over the feature scan (each one
    * partial-agg'd Gram + a 3-row model broadcast back onto the
    * held-out partition — the q49/p18 shapes verbatim); the base
    * frame is checkpointed once and shared by all 2k reads.
    *
    * Output: per (fold, group) the p18 metric row, hash-verified.
    */
  def p22CrossValidation(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Relational.ridgeBase(spark, sfDir).ckpt(true)
    (0 until CvFolds).map { f =>
      val model = graft.operators.Recommend
        .solveSide(base.filter(col("fold") =!= f.toLong), "l_returnflag")
        .select(Seq(col("l_returnflag")) ++
          (0 to 3).map(k => col(s"f$k").as(s"c$k")): _*)
      regressionMetrics(base.filter(col("fold") === f.toLong), model)
        .withColumn("fold", lit(f.toLong))
    }.reduce(_ unionByName _)
      .select(col("fold"), col("l_returnflag"), col("n"), col("mae_ticks"),
        col("mse_ticks"), col("r2_ticks"), col("evar_ticks"))
      .orderBy(col("fold"), col("l_returnflag"))
  }

  /** λ grid for [[p29ParamSweep]]: ridge coefficients as exact
    * dyadic literals (so both engines parse the identical double)
    * with their 2¹² ticks. The middle value is q49/p22's fixed 0.25
    * — the sweep brackets the production default one octave-ish to
    * each side.
    */
  private[graft] val SweepLams: Seq[(String, Long)] =
    Seq(("0.0625", 256L), ("0.25", 1024L), ("1.0", 4096L))

  /** The held-out fold of p29's single train/validation split. */
  private[graft] val SweepValFold = 0L

  /** p29: hyperparameter grid search over the ridge λ at a FIXED
    * train/validation split — the reference's other model-selection
    * half (reference: /root/reference/mllib/src/main/scala/org/
    * apache/spark/ml/tuning/TrainValidationSplit.scala:1 +
    * ParamGridBuilder.scala:1 — one split, one fit per grid point,
    * pick the best by the evaluator; p22 varies the folds at fixed
    * λ, this key varies λ at a fixed fold). Folds are p22's md5
    * row-key ids (partition-invariant); train = folds ≠ 0, held-out
    * = fold 0; the evaluator is the SAME integer metric tail as p18;
    * best-λ per group = lowest held-out mse_ticks, ties to the
    * smaller λ (row_number over the ≤ groups×|grid| frame — both
    * engines run the identical ordering).
    *
    * Scale shape BEATS the reference's loop: the training Gram is
    * paid ONCE (one partial-agg'd scan — λ only enters the solve's
    * diagonal, so all grid points share the aggregate; the reference
    * refits per point, re-scanning the corpus |grid| times), and the
    * held-out scan is also paid once — the 3 solved models union
    * into one ≤ groups×3-row broadcast and every λ scores in the
    * same pass, grouped apart by lam_ticks.
    *
    * Output: per (lam_ticks, group) the p18 metric row + is_best.
    */
  def p29ParamSweep(spark: SparkSession, sfDir: String): DataFrame =
    paramSweepCore(Relational.ridgeBase(spark, sfDir))

  /** The sweep over an arbitrary on-grid (fold, l_returnflag, r,
    * f0..f3) frame — package-private so the spec can plant a split
    * where the MIDDLE λ wins (train slope 1.5× the held-out truth,
    * Σf1²/n = 1/2 ⇒ the ridge x1 = 1.5·S2/(S2 + λn) crosses 1.0
    * exactly at λ = 0.25).
    */
  private[graft] def paramSweepCore(baseIn: DataFrame): DataFrame = {
    val base = baseIn.ckpt(true)
    val gram = graft.operators.Recommend.gramFor(
      base.filter(col("fold") =!= SweepValFold), "l_returnflag").ckpt(true)
    val models = SweepLams.map { case (coef, ticks) =>
      graft.operators.Recommend.solveGram(gram, "l_returnflag", coef)
        .select(Seq(lit(ticks).as("lam_ticks"), col("l_returnflag")) ++
          (0 to 3).map(k => col(s"f$k").as(s"c$k")): _*)
    }.reduce(_ unionByName _)
    val scored = regressionMetricsBy(
      base.filter(col("fold") === SweepValFold), models, Seq("lam_ticks"))
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("mse_ticks"), col("lam_ticks"))
    scored
      .withColumn("is_best", row_number().over(w) === 1)
      .orderBy(col("lam_ticks"), col("l_returnflag"))
  }

  /** Buckets produced by [[p21QuantileBins]]. */
  private[graft] val QuantBuckets = 4

  /** p21: quantile discretization of document length — the
    * reference's ml/feature/QuantileDiscretizer.scala:1 surface
    * (data-derived splits + Bucketizer assignment; p16's Bucketizer
    * used FIXED splits — this op derives them from the data, which
    * is the part QuantileDiscretizer exists for). Where the
    * reference computes splits by approxQuantile (sketch-based,
    * seed/merge-order dependent), the engine uses the EXACT type-1
    * (lower) quantile off the value-grid CDF: split_p = min{v :
    * 4·cum(v) ≥ p·n} — pure integer comparisons, no division, no
    * interpolation, deterministic at any partitioning; the grid is
    * bounded by the VALUE RANGE (n_chars), never the corpus (the
    * q53 posture). Documents bucket by how many splits they exceed,
    * so buckets are left-closed and quantile-balanced up to value
    * ties (ties all land in one bucket — stated; the approxQuantile
    * behavior at relativeError 0 matches this lower-quantile rule).
    *
    * Output: per bucket (bucket, split_upper = its upper split or
    * the corpus max for the last, n_docs, min/max chars) — the
    * discretization report + the splits themselves, hash-verified.
    *
    * Scale shape: one map-side (value → count) partial agg to the
    * grid, a grid-bounded window, a 1-row splits broadcast back onto
    * one corpus scan, then a ≤4-group aggregate.
    */
  def p21QuantileBins(spark: SparkSession, sfDir: String): DataFrame =
    quantileBinsCore(Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars").as("v")))

  /** The discretizer core over any (doc_id, v long) frame —
    * package-private for the planted exact-quartile spec.
    */
  private[graft] def quantileBinsCore(docs: DataFrame): DataFrame = {
    val grid = docs.groupBy(col("v")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, 0)))
    val nf = docs.agg(count(lit(1)).as("n"))
    val splits = grid.crossJoin(broadcast(nf))
      .agg((1 until QuantBuckets).map(p =>
        min(when(col("cum") * lit(QuantBuckets.toLong) >= col("n") * lit(p.toLong),
          col("v"))).as(s"s$p")).head,
        (1 until QuantBuckets).map(p =>
          min(when(col("cum") * lit(QuantBuckets.toLong) >= col("n") * lit(p.toLong),
            col("v"))).as(s"s$p")).tail: _*)
      .ckpt(true)
    val bucket = (1 until QuantBuckets).map(p =>
      (col("v") > col(s"s$p")).cast("long")).reduce(_ + _)
    docs.crossJoin(broadcast(splits))
      .withColumn("bucket", bucket)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        Seq(min(col("v")).as("min_chars"), max(col("v")).as("max_chars")) ++
          (1 until QuantBuckets).map(p => max(col(s"s$p")).as(s"s$p")): _*)
      .select(col("bucket"),
        expr((1 until QuantBuckets).map(p =>
          s"WHEN bucket = ${p - 1} THEN s$p").mkString(
          "CASE ", " ", " ELSE max_chars END")).as("split_upper"),
        col("n_docs"), col("min_chars"), col("max_chars"))
      .orderBy(col("bucket"))
  }

  /** p21's DuckDB twin — the same grid CDF and integer split rule. */
  private[graft] def p21OracleSql: String = {
    val b = QuantBuckets
    val sCols = (1 until b).map(p =>
      s"min(CASE WHEN cum * $b >= n * $p THEN v END) AS s$p").mkString(", ")
    val bucketExpr = (1 until b).map(p =>
      s"CASE WHEN d.n_chars > s$p THEN 1 ELSE 0 END").mkString(" + ")
    val splitCase = "CASE " + (1 until b).map(p =>
      s"WHEN bucket = ${p - 1} THEN s$p").mkString(" ") + " ELSE mx END"
    s"""WITH grid AS (
       |  SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS c
       |  FROM documents GROUP BY 1),
       |cg AS (
       |  SELECT v, c, CAST(sum(c) OVER (ORDER BY v
       |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
       |    CAST((SELECT count(*) FROM documents) AS BIGINT) AS n
       |  FROM grid),
       |sp AS (SELECT $sCols FROM cg),
       |bk AS (
       |  SELECT CAST($bucketExpr AS BIGINT) AS bucket, d.n_chars AS v
       |  FROM documents d, sp),
       |ag AS (
       |  SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
       |    min(v) AS min_chars, max(v) AS max_chars
       |  FROM bk GROUP BY bucket)
       |SELECT bucket, $splitCase AS split_upper, n_docs, min_chars, max_chars
       |FROM ag, sp, (SELECT max(n_chars) AS mx FROM documents) m
       |ORDER BY bucket""".stripMargin
  }

  /** Discount-weight tick table for p19's NDCG: w_i =
    * floor(2²⁰ / log2(i + 1)) for rank i = 1..[[graft.operators
    * .Recommend.RecTopK]]. Computed ONCE here and interpolated as
    * LITERALS into both engines' texts (the solveSteps convention —
    * no transcendental runs inside either engine), so a libm
    * difference cannot split the hash.
    */
  private[graft] val NdcgWTicks: Seq[Long] =
    (1 to graft.operators.Recommend.RecTopK)
      .map(i => math.floor(1048576.0 / (math.log(i + 1.0) / math.log(2.0))).toLong)

  /** Ideal-DCG prefix sums: idcg(m) = Σ_{i≤m} w_i, m = 1..k. */
  private[graft] val NdcgIdcgTicks: Seq[Long] =
    NdcgWTicks.scanLeft(0L)(_ + _).tail

  /** p19: ranking-metrics evaluation of the s25 recommendation list —
    * the reference's mllib/evaluation/RankingMetrics.scala:1 surface
    * (precisionAt, meanAveragePrecisionAt, recallAt, ndcgAt) over the
    * served top-k vs the customer's actually-purchased supplier set
    * (reconstruction framing: the factors are trained on the same
    * matrix — stated, the p15/p18 posture; what this measures is how
    * well the rank-4 factorization reconstructs each customer's
    * preference set).
    *
    * All-integer contract: per customer the hit flags come from ONE
    * left join of the k-row serve list against the rated pairs
    * (co-keyed on customer — the serve list is k rows/customer, the
    * window partitions are k-bounded, never corpus-sized); cumulative
    * hits ride a k-row window; AP terms are (cumhits·2²⁰ div rank)
    * summed over hit ranks then div min(k, n_rel) (the @k form);
    * NDCG uses the [[NdcgWTicks]] literal table and div idcg(min(k,
    * n_rel)). Corpus means are exact long sums div n_users
    * (non-negative throughout, div ≡ //). Headroom: per-user ticks
    * ≤ 5·2⁴⁰, so the global sums are safe past 2²⁰ users — documented
    * retune = mean via two-level segmented sums (the s13 note).
    *
    * Scale shape: serve list k·|users| rows co-partitioned by
    * customer, rated pairs shuffle once on customer, k-bounded
    * window, one final 1-row aggregate. Nothing corpus-wide buffers.
    */
  def p19RankingEval(spark: SparkSession, sfDir: String): DataFrame =
    rankingMetricsOf(
      graft.operators.Recommend.s25RecommendTopk(spark, sfDir),
      graft.operators.Recommend.purchaseRatings(spark, sfDir)
        .select(col("c"), col("s")))

  /** The p19 metric tail over arbitrary (o_custkey, rank, l_suppkey)
    * serve and (c, s) relevant-pair frames — shared by exact p19 and
    * the sampled p28 so the two keys differ ONLY in which users are
    * scored.
    */
  private[graft] def rankingMetricsOf(
      rec: DataFrame, rel: DataFrame): DataFrame = {
    val k = graft.operators.Recommend.RecTopK
    val nrel = rel.groupBy(col("c")).agg(count(lit(1)).as("nrel"))
    val wCase = (1 to k).map(i =>
      s"WHEN $i THEN ${NdcgWTicks(i - 1)}L").mkString(" ")
    val idcgCase = (1 to k).map(m =>
      s"WHEN $m THEN ${NdcgIdcgTicks(m - 1)}L").mkString(" ")
    val hits = rec.join(rel.withColumn("hit_src", lit(1L)),
        rec("o_custkey") === rel("c") && rec("l_suppkey") === rel("s"),
        "left")
      .select(col("o_custkey"), col("rank"),
        coalesce(col("hit_src"), lit(0L)).as("hit"))
      .withColumn("cumhits", sum(col("hit")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_custkey")).orderBy(col("rank"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    val perUser = hits.groupBy(col("o_custkey"))
      .agg(sum(col("hit")).as("hits_k"),
        sum(expr("hit * ((cumhits * 1048576) div rank)")).as("ap_num"),
        sum(expr(s"hit * (CASE rank $wCase END)")).as("dcg"))
      .join(nrel.withColumnRenamed("c", "o_custkey"), "o_custkey")
      .select(
        expr(s"(hits_k * 1048576) div $k").as("p_ticks"),
        expr(s"ap_num div least($k, nrel)").as("ap_ticks"),
        expr("(hits_k * 1048576) div nrel").as("rec_ticks"),
        expr(s"(dcg * 1048576) div (CASE least($k, nrel) $idcgCase END)")
          .as("ndcg_ticks"))
    perUser.agg(count(lit(1)).as("n_users"),
        sum(col("p_ticks")).as("sp"), sum(col("ap_ticks")).as("sa"),
        sum(col("rec_ticks")).as("sr"), sum(col("ndcg_ticks")).as("sn"))
      .select(col("n_users"),
        expr("sp div n_users").as("p_at_k_ticks"),
        expr("sa div n_users").as("map_at_k_ticks"),
        expr("sr div n_users").as("recall_at_k_ticks"),
        expr("sn div n_users").as("ndcg_at_k_ticks"))
  }

  /** p19's DuckDB twin over the shared s25 `rk` CTE chain — identical
    * literal tick tables, `//` for every (non-negative) div.
    */
  private[graft] def p19OracleSql(recCtes: String): String = {
    val k = graft.operators.Recommend.RecTopK
    val wCase = (1 to k).map(i =>
      s"WHEN $i THEN ${NdcgWTicks(i - 1)}").mkString(" ")
    val idcgCase = (1 to k).map(m =>
      s"WHEN $m THEN ${NdcgIdcgTicks(m - 1)}").mkString(" ")
    s"""WITH $recCtes,
       |rel AS (SELECT DISTINCT c, s FROM ratings),
       |nrel AS (SELECT c, CAST(count(*) AS BIGINT) AS nrel FROM rel GROUP BY c),
       |h AS (
       |  SELECT rk.c, rk.rank,
       |    CASE WHEN rel.s IS NULL THEN 0 ELSE 1 END AS hit
       |  FROM rk LEFT JOIN rel ON rk.c = rel.c AND rk.s = rel.s),
       |ch AS (
       |  SELECT c, rank, hit,
       |    sum(hit) OVER (PARTITION BY c ORDER BY rank
       |      ROWS UNBOUNDED PRECEDING) AS cumhits
       |  FROM h),
       |pu AS (
       |  SELECT ch.c,
       |    CAST(sum(hit) AS BIGINT) AS hits_k,
       |    CAST(sum(hit * ((cumhits * 1048576) // rank)) AS BIGINT) AS ap_num,
       |    CAST(sum(hit * (CASE rank $wCase END)) AS BIGINT) AS dcg
       |  FROM ch GROUP BY ch.c),
       |pm AS (
       |  SELECT (pu.hits_k * 1048576) // $k AS p_ticks,
       |    pu.ap_num // least($k, nrel.nrel) AS ap_ticks,
       |    (pu.hits_k * 1048576) // nrel.nrel AS rec_ticks,
       |    (pu.dcg * 1048576) //
       |      (CASE least($k, nrel.nrel) $idcgCase END) AS ndcg_ticks
       |  FROM pu JOIN nrel ON pu.c = nrel.c)
       |SELECT CAST(count(*) AS BIGINT) AS n_users,
       |  CAST(CAST(sum(p_ticks) AS BIGINT) // count(*) AS BIGINT) AS p_at_k_ticks,
       |  CAST(CAST(sum(ap_ticks) AS BIGINT) // count(*) AS BIGINT) AS map_at_k_ticks,
       |  CAST(CAST(sum(rec_ticks) AS BIGINT) // count(*) AS BIGINT) AS recall_at_k_ticks,
       |  CAST(CAST(sum(ndcg_ticks) AS BIGINT) // count(*) AS BIGINT) AS ndcg_at_k_ticks
       |FROM pm""".stripMargin
  }

  /** Deterministic user-sample percentage for [[p28RankingEvalSampled]]
    * (the p01 md5-bucket rule on the customer key).
    */
  private[graft] val RecEvalSamplePct = 25L

  /** The p01 bucket of a key column: first 16 bits of md5 over the
    * decimal rendering, mod 100.
    */
  private[graft] def md5Bucket(c: org.apache.spark.sql.Column):
      org.apache.spark.sql.Column =
    conv(substring(md5(c.cast("string")), 1, 4), 16, 10).cast("long") % 100

  /** p28: the SAMPLED ranking eval — p19's exact users×catalog scoring
    * is quadratic by semantics (the mllib recommendForAllUsers shape;
    * 308.8 s at sf1), and at 100 TB nobody scores the full cross
    * product for an eval METRIC. The production posture (reference
    * anchor mllib/evaluation/RankingMetrics.scala:1, which is
    * sample-agnostic — it evaluates whatever (predictions, labels)
    * pairs it is given): evaluate a deterministic md5-bucketed
    * [[RecEvalSamplePct]]% user subset, selected BEFORE the serve
    * scoring so the expensive users×catalog pass shrinks by the
    * sample rate — the p01 hash rule, so the subset is a pure
    * function of the customer key (stable across runs, engines,
    * partitionings; no random()).
    *
    * Same metric tail as p19 ([[rankingMetricsOf]] — the two keys
    * differ ONLY in which users are scored), so at 100% the sampled
    * metric IS the exact metric (spec-pinned); exact p19 remains the
    * gate for the full-population number.
    */
  def p28RankingEvalSampled(spark: SparkSession, sfDir: String): DataFrame =
    rankingEvalSampledAt(spark, sfDir, RecEvalSamplePct)

  /** [[p28RankingEvalSampled]] at an explicit sample percentage —
    * package-private so the spec can pin pct=100 ≡ exact p19.
    */
  private[graft] def rankingEvalSampledAt(
      spark: SparkSession, sfDir: String, pct: Long): DataFrame = {
    val (users, items) =
      graft.operators.Recommend.purchaseFactors(spark, sfDir)
    val su = users.filter(md5Bucket(col("c")) < pct)
    val rec = graft.operators.Recommend.serveTopk(su, items)
    val rel = graft.operators.Recommend.purchaseRatings(spark, sfDir)
      .select(col("c"), col("s"))
      .filter(md5Bucket(col("c")) < pct)
    rankingMetricsOf(rec, rel)
  }

  /** p28's DuckDB twin: the p19 chain with the p01 md5-bucket sample
    * predicate applied to both the ranked serve list and the
    * relevant pairs.
    */
  private[graft] def p28OracleSql(recCtes: String): String = {
    val k = graft.operators.Recommend.RecTopK
    val wCase = (1 to k).map(i =>
      s"WHEN $i THEN ${NdcgWTicks(i - 1)}").mkString(" ")
    val idcgCase = (1 to k).map(m =>
      s"WHEN $m THEN ${NdcgIdcgTicks(m - 1)}").mkString(" ")
    val pick = (col: String) =>
      s"(('0x' || substr(md5(CAST($col AS VARCHAR)), 1, 4))::UBIGINT % 100" +
        s" < $RecEvalSamplePct)"
    s"""WITH $recCtes,
       |rel AS (SELECT DISTINCT c, s FROM ratings WHERE ${pick("c")}),
       |rks AS (SELECT * FROM rk WHERE ${pick("c")}),
       |nrel AS (SELECT c, CAST(count(*) AS BIGINT) AS nrel FROM rel GROUP BY c),
       |h AS (
       |  SELECT rks.c, rks.rank,
       |    CASE WHEN rel.s IS NULL THEN 0 ELSE 1 END AS hit
       |  FROM rks LEFT JOIN rel ON rks.c = rel.c AND rks.s = rel.s),
       |ch AS (
       |  SELECT c, rank, hit,
       |    sum(hit) OVER (PARTITION BY c ORDER BY rank
       |      ROWS UNBOUNDED PRECEDING) AS cumhits
       |  FROM h),
       |pu AS (
       |  SELECT ch.c,
       |    CAST(sum(hit) AS BIGINT) AS hits_k,
       |    CAST(sum(hit * ((cumhits * 1048576) // rank)) AS BIGINT) AS ap_num,
       |    CAST(sum(hit * (CASE rank $wCase END)) AS BIGINT) AS dcg
       |  FROM ch GROUP BY ch.c),
       |pm AS (
       |  SELECT (pu.hits_k * 1048576) // $k AS p_ticks,
       |    pu.ap_num // least($k, nrel.nrel) AS ap_ticks,
       |    (pu.hits_k * 1048576) // nrel.nrel AS rec_ticks,
       |    (pu.dcg * 1048576) //
       |      (CASE least($k, nrel.nrel) $idcgCase END) AS ndcg_ticks
       |  FROM pu JOIN nrel ON pu.c = nrel.c)
       |SELECT CAST(count(*) AS BIGINT) AS n_users,
       |  CAST(CAST(sum(p_ticks) AS BIGINT) // count(*) AS BIGINT) AS p_at_k_ticks,
       |  CAST(CAST(sum(ap_ticks) AS BIGINT) // count(*) AS BIGINT) AS map_at_k_ticks,
       |  CAST(CAST(sum(rec_ticks) AS BIGINT) // count(*) AS BIGINT) AS recall_at_k_ticks,
       |  CAST(CAST(sum(ndcg_ticks) AS BIGINT) // count(*) AS BIGINT) AS ndcg_at_k_ticks
       |FROM pm""".stripMargin
  }

  /** p17 oracle: the same grid/cumulative/midrank arithmetic over the
    * shared stump base CTEs — every quantity a non-negative exact
    * integer, so `//` replicates `div` bit for bit.
    */
  private[graft] def p17OracleSql(baseCtes: String, bins: Int): String =
    s"""WITH $baseCtes,
       |sc AS (SELECT y, v3 AS x FROM d2),
       |stt AS (SELECT min(x) AS mn, max(x) AS mx FROM sc),
       |bn AS (SELECT y,
       |    ((x - (SELECT mn FROM stt)) * $bins)
       |      // ((SELECT mx FROM stt) - (SELECT mn FROM stt) + 1) AS bin
       |  FROM sc),
       |pb AS MATERIALIZED (
       |  SELECT bin, CAST(sum(y) AS BIGINT) AS n_pos,
       |    CAST(sum(1 - y) AS BIGINT) AS n_neg
       |  FROM bn GROUP BY bin),
       |tot AS (SELECT CAST(sum(n_pos) AS BIGINT) AS p,
       |  CAST(sum(n_neg) AS BIGINT) AS nn FROM pb),
       |cu AS (SELECT bin, n_pos, n_neg,
       |    CAST(sum(n_pos) OVER (ORDER BY bin DESC) AS BIGINT) AS cum_tp,
       |    CAST(sum(n_neg) OVER (ORDER BY bin DESC) AS BIGINT) AS cum_fp,
       |    CAST(coalesce(sum(n_neg) OVER (ORDER BY bin
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS neg_below
       |  FROM pb),
       |uu AS (SELECT CAST(sum(n_pos * (2 * neg_below + n_neg)) AS BIGINT)
       |  AS auc2_num FROM cu)
       |SELECT cu.bin, cu.n_pos, cu.n_neg, cu.cum_tp, cu.cum_fp,
       |  CASE WHEN t.p > 0 THEN (cu.cum_tp * 1048576) // t.p
       |    ELSE CAST(0 AS BIGINT) END AS tpr_ticks,
       |  CASE WHEN t.nn > 0 THEN (cu.cum_fp * 1048576) // t.nn
       |    ELSE CAST(0 AS BIGINT) END AS fpr_ticks,
       |  uu.auc2_num,
       |  CASE WHEN t.p > 0 AND t.nn > 0
       |    THEN (uu.auc2_num * 1048576) // (2 * t.p * t.nn)
       |    ELSE CAST(0 AS BIGINT) END AS auc_ticks
       |FROM cu, tot t, uu ORDER BY cu.bin""".stripMargin

  /** The evaluation fold [[p24DataScaling]] holds out — the LAST
    * p22 fold, DERIVED from [[CvFolds]] so the nesting-excludes-eval
    * invariant is structural: the training pools (fold ≤ t,
    * t < CvFolds − 1) can never include the eval fold however
    * CvFolds is retuned.
    */
  private[graft] val ScaleEvalFold: Long = CvFolds - 1L

  /** The learning-curve core over a p22-shaped (l_returnflag, fold,
    * r, f0..f3) frame: for t = 0, 1, 2 train the q49 ridge on the
    * NESTED pools fold ≤ t (1/3, 2/3, all of the non-eval data —
    * nesting is what makes a learning curve a curve rather than
    * three unrelated samples), evaluate every model on the SAME
    * held-out fold [[ScaleEvalFold]] through the p18 metric tail.
    * n_train is solveSide's own per-group count (≡ count(*) of the
    * pool). Package-private so the spec can drive hand-built folds.
    */
  private[graft] def dataScaling(base: DataFrame): DataFrame = {
    val eval = base.filter(col("fold") === ScaleEvalFold)
    (0 until CvFolds - 1).map { t =>
      val model = graft.operators.Recommend
        .solveSide(base.filter(col("fold") <= t.toLong), "l_returnflag")
        .select(Seq(col("l_returnflag"), col("n_rated").as("n_train")) ++
          (0 to 3).map(k => col(s"f$k").as(s"c$k")): _*)
      regressionMetrics(eval, model.drop("n_train"))
        .join(broadcast(model.select(col("l_returnflag"), col("n_train"))),
          "l_returnflag")
        .withColumn("train_folds", lit((t + 1).toLong))
    }.reduce(_ unionByName _)
      .select(col("train_folds"), col("l_returnflag"), col("n_train"),
        col("n"), col("mae_ticks"), col("mse_ticks"), col("r2_ticks"),
        col("evar_ticks"))
      .orderBy(col("train_folds"), col("l_returnflag"))
  }

  /** p24: the data-scaling (learning-curve) report — held-out error
    * of the q49 ridge model as a function of TRAINING-SET SIZE, the
    * measurement behind every "do we need more data?" curation
    * decision (the scaling-law instrument in miniature; reference
    * surface anchor: ml/tuning/CrossValidator.scala:1 and
    * TrainValidationSplit — the reference varies hyperparameters at
    * fixed data, this key varies DATA at fixed hyperparameters,
    * same split/fit/evaluate machinery): p22's md5 row-key folds
    * give the nested pools (partition-invariant, so the curve is a
    * pure corpus function), each pool trains via the SAME solveSide
    * chain as q49, every model scores the SAME held-out fold via
    * the p18 metric tail — three train scans + three broadcast-model
    * eval scans over one checkpointed base, all Gram sums
    * partial-agg'd (the q49 scale shape ×3).
    */
  def p24DataScaling(spark: SparkSession, sfDir: String): DataFrame =
    dataScaling(graft.operators.Relational.ridgeBase(spark, sfDir)
      .ckpt(true))
}
