package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import java.time.Instant

/** Structured Streaming twins of the batch event operators: tumbling
  * window aggregation with a watermark, and stateful gap-based
  * sessionization via flatMapGroupsWithState.
  *
  * The streaming shapes match [[graft.operators.Events]] q30/q31 so a
  * pipeline can run the same logic in batch (backfill) or streaming
  * (live) mode — the lambda-architecture-free pattern Structured
  * Streaming is built for.
  */
object StreamOps {

  /** Declared schema for the current testdata generation: ts is
    * microsecond parquet with no UTC adjustment (TIMESTAMP_NTZ). A
    * file stream needs the schema declared up front; [[readEventStream]]
    * probes the on-disk generation at open and swaps the ts type, so
    * the streaming reader tracks [[graft.Tables.events]]'s generation
    * adaptivity instead of being pinned to one generation.
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Open a file-based event stream over a directory of parquet, with
    * ts normalized to a session-zone microsecond timestamp exactly as
    * the batch loader does. One driver-side batch footer read at open
    * selects the declared ts type matching the on-disk generation
    * (ns-INT64 long vs TIMESTAMP_NTZ — the batch loader's
    * normalizeEventTs then collapses both identically), so a testdata
    * rollback degrades nothing.
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // An empty (not-yet-written) stream directory has no footer to
    // probe — default to the current generation's declared type.
    val onDiskTs =
      try spark.read.parquet(dir).schema("ts").dataType
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          eventSchema("ts").dataType
      }
    val declared = StructType(eventSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = onDiskTs) else f))
    graft.Tables.normalizeEventTs(
      spark.readStream.schema(declared).parquet(dir))
  }

  /** Tumbling 1-hour window aggregation with a 2-hour watermark: the
    * streaming twin of q30. At scale the watermark bounds state; the
    * partial-agg before the shuffle bounds traffic.
    */
  def windowAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      // group by the window STRUCT (not a projected field) so the
      // event-time column stays linked to the watermark — required
      // for append-mode sinks; project start afterwards
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Stream-stream inner join: purchases within 1 hour after a click
    * by the same user. Both sides carry a 2-hour watermark and the
    * join condition bounds event time on both sides, so the state
    * store retains at most ~3 hours of rows per side (the pattern of
    * StreamingSymmetricHashJoinExec; unbounded state otherwise). The
    * same body works on batch frames (EliminateEventTimeWatermark
    * drops the watermark), so the batch twin IS this function —
    * stream==batch equality is checked through one code path.
    */
  def clickPurchaseJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "2 hours")
    clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") > col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("interval 1 hour"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
  }

  /** Stream-stream LEFT OUTER join: every click, with its within-1h
    * purchase where one exists. Same watermark + event-time-bound
    * conditions as [[clickPurchaseJoin]] — for OUTER joins they are
    * mandatory, not just state hygiene: an unmatched click can only
    * emit its null-extended row once the watermark proves no matching
    * purchase can still arrive (watermark past click_ts + 1h), so
    * null results trail the watermark by design. Batch twin: same
    * body (a batch left join nulls immediately — end-of-input proves
    * absence).
    */
  def clickPurchaseLeftJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "2 hours")
    clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") > col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("interval 1 hour"),
      "left_outer")
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
  }

  /** Stream-static enrichment: the event stream joined against a
    * static dimension frame (user tier derived from customer — any
    * static DataFrame works). The static side is (re)broadcast per
    * micro-batch by Spark; no state store involved, so this is the
    * cheap join to prefer whenever one side is genuinely static.
    * Batch twin: same body.
    */
  def enrichEvents(events: DataFrame, users: DataFrame): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(users), Seq("user_id"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts"), col("value"), col("user_tier"))

  /** Derive a static user-dimension frame from the customer table:
    * user_id joins events.user_id, tier from the market segment.
    */
  def userDim(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("user_id"),
        upper(col("c_mktsegment")).as("user_tier"))

  /** Streaming exactly-once dedup on event_id (duplicate-delivery
    * elimination): dropDuplicatesWithinWatermark — plain
    * dropDuplicates(event_id) under a watermark never EVICTS state
    * (eviction requires the event-time column in the key set), so a
    * long-running stream leaks one state entry per event_id forever;
    * the WithinWatermark variant expires each key once the watermark
    * passes its event time, making the 2-hour dedup horizon real.
    * On batch frames it degenerates to plain dropDuplicates, so the
    * batch twin is this same body.
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(Seq("event_id"))

  /** On-disk documents schema for a streaming ingest of new docs. */
  val documentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming quality gate: batch t02's scorer applied UNCHANGED to
    * a document stream and thresholded — possible precisely because
    * the scorer is a pure per-row map (no aggregate, no window, no
    * watermark or state; [[graft.operators.TextAnalysis.qualityScored]]),
    * so the live-ingest filter and the batch backfill are one code
    * path, the lambda-architecture-free property the library's
    * streaming twins exist to prove. Emits the scored columns so the
    * sink can audit WHY a document passed.
    */
  def qualityGate(docs: DataFrame, floor: Double): DataFrame =
    graft.operators.TextAnalysis.qualityScored(docs)
      .filter(col("quality_score") >= floor)

  /** Streaming naive-Bayes serve path, stream stage: incoming
    * documents explode to tokens and probe the BATCH-trained model
    * (TextAnalysis.nbModelFrames — train batch, score stream, one
    * model, the standard serving decomposition) via a stateless
    * stream-static broadcast join. Unseen tokens drop out of the
    * join, which IS the model contract: the trained vocabulary
    * defines the feature space and out-of-vocabulary tokens are
    * intentionally unscored (the sklearn CountVectorizer→NB
    * convention). Note the smoothed floor log2(t_c + V) an OOV token
    * WOULD pay is class-dependent (t_c varies per class), so this is
    * a deliberate feature-space restriction — batch t19 scores the
    * same restriction, which is why stream equals batch row-for-row.
    *
    * Emits (doc_id, cls, q); the per-micro-batch sink
    * ([[nbClassifyBatch]]) does the per-doc aggregation — exact
    * because a document's tokens all share its micro-batch (one
    * source row explodes inside the batch; the annTopKBatch
    * argument).
    */
  def nbScoreStream(docs: DataFrame, model: DataFrame): DataFrame = {
    graft.functions.registerAll(docs.sparkSession)
    docs.select(col("doc_id"),
        explode(call_function("word_grams", lower(col("text")), lit(1)))
          .as("token"))
      .join(broadcast(model), "token")
      .select(col("doc_id"), col("cls"), col("q"))
  }

  /** Sink-side per-micro-batch classification for [[nbScoreStream]]:
    * exact long NLL sums per (doc, class), priors added, argmin via
    * min(struct(nll, cls)) — the IDENTICAL tail batch t19 runs, so
    * stream and batch predictions are bit-equal (spec'd).
    */
  def nbClassifyBatch(scored: DataFrame, priors: DataFrame): DataFrame =
    scored.groupBy(col("doc_id"), col("cls")).agg(sum(col("q")).as("sq"))
      .join(broadcast(priors), "cls")
      .select(col("doc_id"), col("cls"), (col("sq") + col("prior_q")).as("nll"))
      .groupBy(col("doc_id"))
      .agg(min(struct(col("nll"), col("cls"))).as("b"))
      .select(col("doc_id"), col("b.cls").as("predicted"),
        col("b.nll").as("nll_ticks"))

  /** Streaming topic serve path, stream stage: incoming documents
    * explode to tokens and probe the BATCH-trained t23 topic model
    * (Recommend.topicFactors' term side — train batch, score
    * stream, one model: the nbScoreStream decomposition) via a
    * stateless stream-static broadcast join. Out-of-vocabulary
    * tokens drop out — the trained vocabulary defines the feature
    * space, exactly the NB serve contract. Emits one (doc_id,
    * f0..f3 ticks) row per in-vocabulary token occurrence.
    */
  def topicScoreStream(docs: DataFrame, termTicks: DataFrame): DataFrame = {
    graft.functions.registerAll(docs.sparkSession)
    docs.select(col("doc_id"),
        explode(call_function("word_grams", lower(col("text")), lit(1)))
          .as("token"))
      .join(broadcast(termTicks), "token")
  }

  /** Sink-side per-micro-batch topic fold-in for
    * [[topicScoreStream]]: exact long component sums per doc (the
    * standard cold-start fold-in — a new document's topic mixture is
    * the sum of its terms' topic loadings), dominant topic by
    * max(struct(sum, −k)) so ties take the smaller component —
    * deterministic across partitionings. Exact because a document's
    * tokens all share its micro-batch (the annTopKBatch argument).
    * Emits (doc_id, topic, score_ticks).
    */
  def topicAssignBatch(scored: DataFrame): DataFrame = {
    val n = graft.operators.Recommend.AlsRank
    val summed = scored.groupBy(col("doc_id"))
      .agg(sum(col("t0")).as("s0"),
        (1 until n).map(k => sum(col(s"t$k")).as(s"s$k")): _*)
    val best = greatest((0 until n).map(k =>
      struct(col(s"s$k").as("s"), lit(-k).cast("long").as("nk"))): _*)
    summed.select(col("doc_id"), best.as("b"))
      .select(col("doc_id"), (-col("b.nk")).as("topic"),
        col("b.s").as("score_ticks"))
  }

  /** Streaming twin of s35's posterior semantics, serve side: each
    * arriving embedding vector is scored against the BROADCAST
    * trained soft-GMM model ([[graft.operators.Similarity.
    * gmmSoftModelRow]]) — stateless stream-static, so stream ≡ batch
    * bit-for-bit by construction (the stream_nb / stream_topic /
    * stream_recommend "one stream, one model" posture). Emits the
    * raw soft-score row; quantization and the argmax belong in the
    * sink via [[gmmAssignBatch]].
    */
  def gmmAssignStream(vecs: DataFrame, modelRow: DataFrame): DataFrame =
    graft.operators.Similarity.softScore(
      graft.operators.Similarity.gmmTicksLazy(vecs), modelRow)

  /** Sink-side posterior quantization for [[gmmAssignStream]]: per
    * vector the 2²⁰-tick responsibilities (the s35 normalization
    * contract — they sum to 2²⁰ ± K), the dominant component (ties
    * to the smaller k) and the normalization boolean. Per-row
    * stateless, so exact regardless of micro-batch boundaries.
    */
  def gmmAssignBatch(scored: DataFrame): DataFrame = {
    val K = graft.operators.Similarity.GmmK
    val best = greatest((0 until K).map(k =>
      struct(col(s"r$k").as("r"), lit(-k.toLong).as("nk"))): _*)
    scored.select(Seq(col("vec_id")) ++
      (0 until K).map(k =>
        floor(col(s"r$k") * lit(1048576.0) + lit(0.5)).cast("long")
          .as(s"r${k}_ticks")) ++
      Seq((-best.getField("nk")).as("component"), col("norm_ok")): _*)
  }

  /** Streaming twin of t35's posterior serve, stream stage: arriving
    * documents explode to tokens and probe the BROADCAST trained LDA
    * model ([[graft.operators.Recommend.ldaServeModel]] — vocab ×
    * trained φ; train batch, serve stream). Stateless (scalar
    * tokenize + stream-static broadcast join; OOV tokens drop, the
    * t32 contract), emitting one (doc_id, w) row per in-vocab token
    * occurrence. The per-doc posterior fold-in is an AGGREGATION and
    * belongs in the sink via [[ldaAssignBatch]] — a doc's tokens
    * share its micro-batch, so the sink's per-batch group-by is
    * exact, where a stream-side group-by would need unbounded keyed
    * state (the d10 sink-fold rationale).
    */
  def ldaAssignStream(docs: DataFrame, model: DataFrame): DataFrame = {
    graft.functions.registerAll(docs.sparkSession)
    docs.select(col("doc_id"),
        explode(call_function("word_grams", lower(col("text")), lit(1)))
          .as("token"))
      .join(broadcast(model.select(col("token"), col("w"))), "token")
      .select(col("doc_id"), col("w"))
  }

  /** Sink-side posterior fold-in + quantization for
    * [[ldaAssignStream]]: group the batch's (doc_id, w) rows per
    * doc, run the θ-only EM against the clamped φ
    * ([[graft.operators.Recommend.ldaFoldInTheta]] — the SAME code
    * path batch callers use, so stream ≡ batch row-for-row), then
    * the s35/gmm quantization contract: 2²⁰-tick θ (sums to
    * 2²⁰ ± K), dominant topic (ties to the smaller k), norm
    * boolean. φ is read off the model frame's (identical) rows.
    */
  def ldaAssignBatch(rows: DataFrame, model: DataFrame): DataFrame = {
    val K = graft.operators.Recommend.LdaK
    val phi = model
      .select((0 until K).map(k => col(s"phi$k")): _*).limit(1)
    val th = graft.operators.Recommend.ldaFoldInTheta(rows, phi)
    val ticks = th.select(Seq(col("doc_id")) ++ (0 until K).map(k =>
      floor(expr(s"element_at(th, ${k + 1})") * lit(1048576.0) + lit(0.5))
        .cast("long").as(s"t${k}_ticks")): _*)
    val best = greatest((0 until K).map(k =>
      struct(col(s"t${k}_ticks").as("t"), lit(-k.toLong).as("nk"))): _*)
    ticks
      .withColumn("topic", -best.getField("nk"))
      .withColumn("norm_ok",
        abs((0 until K).map(k => col(s"t${k}_ticks")).reduce(_ + _) -
          lit(1048576L)) <= lit(K.toLong))
  }

  /** Streaming twin of d10 incremental dedup, candidate stage: new
    * documents arrive as a stream and probe the STATIC corpus band
    * index — the continuous form of the daily batch-vs-corpus probe.
    * Entirely stateless (banding is a scalar-expression generator,
    * the index join is stream-static), so no state store grows with
    * the stream. Emits one row per (new doc, corpus match, MATCHING
    * BAND); pair-level dedup and the expensive exact verify belong in
    * the sink via [[verifyDedupCandidates]] — all bands of a doc
    * share its micro-batch, so a per-batch distinct there is exact,
    * whereas a streaming-side `dropDuplicates` would grow unbounded
    * keyed state and a pre-distinct verify would re-run the Jaccard
    * kernel once per band (a true dup collides in all 16).
    *
    * `corpusIndex` is [[graft.operators.Dedup.corpusBandIndex]]
    * output, pre-materialized (production: written bucketed by
    * (band_id, band_hash) so the per-batch probe is shuffle-free on
    * the corpus side).
    */
  def incrementalDedupCandidates(newDocs: DataFrame,
      corpusIndex: DataFrame): DataFrame =
    graft.operators.Dedup.bandedSignatures(
      newDocs, shingleN = 3, bands = 16, rows = 8, keep = Seq("text"))
      .select(col("doc_id").as("new_id"), col("band_id"), col("band_hash"),
        col("text").as("text_n"))
      .join(corpusIndex, Seq("band_id", "band_hash"))
      .select(col("new_id"), col("corpus_id"), col("text_n"))

  /** Sink-side verify for [[incrementalDedupCandidates]], run per
    * micro-batch inside foreachBatch (batch semantics): distinct the
    * band matches to one row per pair, join the corpus text, and
    * exact-verify with the codegen Jaccard kernel — once per pair,
    * not once per matching band.
    */
  def verifyDedupCandidates(candidates: DataFrame,
      corpusDocs: DataFrame): DataFrame =
    candidates.dropDuplicates("new_id", "corpus_id")
      .join(corpusDocs.select(col("doc_id").as("corpus_id"),
        col("text").as("text_c")), "corpus_id")
      .withColumn("jaccard",
        call_function("ngram_jaccard", col("text_n"), col("text_c"), lit(3)))
      .filter(col("jaccard") >= 0.7)
      .select(col("new_id"), col("corpus_id"),
        round(col("jaccard"), 4).as("jaccard"))

  /** Stateless stream-side stage of streaming contamination checking
    * (the d06/d12 twin): per incoming document, one row carrying the
    * doc's total distinct-shingle count (`sh` null) UNIONed with one
    * row per shingle that survives the benchmark BLOOM prefilter —
    * the sketch rides the streaming plan as a literal, so the codegen
    * `bloom_contains` decimates shingles inside the micro-batch with
    * zero state and no stream-side join. Nothing here is stateful:
    * project + explode + filter + self-union, so any watermark/output
    * mode works and a document's rows always share its micro-batch.
    */
  def contaminationStream(docs: DataFrame, bloomBytes: Array[Byte]): DataFrame = {
    graft.functions.registerAll(docs.sparkSession)
    val sh = docs.select(col("doc_id"),
      array_distinct(call_function("word_grams", col("text"), lit(3))).as("sh"))
    val totals = sh.select(col("doc_id"),
      size(col("sh")).cast("long").as("n_sh"),
      lit(null).cast("string").as("sh"))
    // an EMPTY benchmark blooms to null (same contract as d12's
    // guard): nothing can match, so stream only the totals — a null
    // literal would fail bloom_contains' analysis, killing the query
    // at construction where the batch twin returns an all-clear report
    if (bloomBytes == null) totals
    else totals.union(
      sh.select(col("doc_id"), lit(-1L).as("n_sh"), explode(col("sh")).as("sh"))
        .filter(call_function("bloom_contains", lit(bloomBytes), xxhash64(col("sh")))))
  }

  /** Sink-side per-micro-batch rollup for [[contaminationStream]]:
    * exact-verify the prefiltered shingles against the benchmark set
    * (bloom false positives die here) and emit one report row per
    * document — exact because a doc's total row and all its shingle
    * rows arrive in the same batch. Same output contract as batch
    * d06/d12 (n_sh, n_matched, containment, contaminated >= 0.5).
    */
  def contaminationReportBatch(batch: DataFrame, bench: DataFrame): DataFrame = {
    val totals = batch.filter(col("sh").isNull)
      .select(col("doc_id"), col("n_sh"))
    val matched = batch.filter(col("sh").isNotNull)
      .join(broadcast(bench), Seq("sh"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_matched"))
    totals.join(matched, Seq("doc_id"), "left")
      .withColumn("n_matched", coalesce(col("n_matched"), lit(0L)))
      .withColumn("containment",
        round(col("n_matched").cast("double")
          / greatest(col("n_sh"), lit(1L)).cast("double"), 4))
      .withColumn("contaminated",
        (col("n_matched").cast("double")
          / greatest(col("n_sh"), lit(1L)).cast("double")) >= 0.5)
  }

  /** Stateless stream-side stage of streaming ANN enrichment: each
    * incoming embedding is banded with the SAME hyperplane LSH as
    * the batch index (s02/s05, seed 7) and probes the static
    * corpus band index via a stream-static equi-join — no state, no
    * stream-side shuffle beyond the probe join. `corpusBands` is the
    * pre-materialized (production: bucketed by (band_id, band_val))
    * banded corpus with its embeddings.
    *
    * `bits` MUST equal the value the corpus index was built with
    * (buckets never match otherwise — the probe join silently emits
    * ZERO candidates): a streaming frame cannot count itself, so the
    * caller derives it ONCE from the corpus —
    * `Similarity.annBitsFor(corpus.count())` — and passes the same
    * value to both [[corpusBandIndexAnn]] and here. Deliberately NO
    * default on either side: two independently-defaulted parameters
    * made the desync representable, and a recall-0 stream has no
    * error to notice.
    *
    * Emits candidate rows (query_id, qv, vec_id, embedding); the
    * per-batch sink dedups pairs and ranks ([[annTopKBatch]]) — a
    * query's bands all share its micro-batch, so in-batch top-k is
    * exact over the candidate set, same contract as batch s02.
    */
  def annProbeStream(newVecs: DataFrame, corpusBands: DataFrame,
      bits: Int): DataFrame =
    graft.operators.Similarity.annBanded(newVecs, "vec_id", "embedding",
        bits = bits)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("band_id"), col("band_val"))
      .join(corpusBands, Seq("band_id", "band_val"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qv"), col("vec_id"), col("embedding"))

  /** The matching batch-side banded corpus index for
    * [[annProbeStream]] (band_id, band_val, vec_id, embedding) —
    * the SAME banding definition as s02/s05 by construction
    * (Similarity.annBanded), with `bits` shared explicitly with the
    * stream side (see [[annProbeStream]]'s bits contract).
    */
  def corpusBandIndexAnn(corpus: DataFrame, bits: Int): DataFrame =
    graft.operators.Similarity.annBanded(corpus, "vec_id", "embedding",
        bits = bits)
      .select(col("band_id"), col("band_val"), col("vec_id"), col("embedding"))

  /** Sink-side per-micro-batch ranking for [[annProbeStream]]: dedup
    * candidate pairs (a pair matches once per shared band), score with
    * the codegen cosine, rank with the bounded top-k aggregate — the
    * exact tail batch s02 runs.
    */
  def annTopKBatch(candidates: DataFrame, k: Int = 10): DataFrame =
    candidates.dropDuplicates("query_id", "vec_id")
      .withColumn("cos_raw",
        call_function("cosine_sim", col("qv"), col("embedding")))
      .groupBy(col("query_id"))
      .agg(call_function("top_k_by_score", col("cos_raw"), col("vec_id"), lit(k)).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.id").as("neighbor_id"),
        round(col("t.score"), 4).as("cos"), (col("pos") + 1).cast("long").as("rank"))

  case class Ev(event_id: Long, ts: Instant, user_id: Long,
      event_type: String, value: Double)
  case class SessionState(sessionId: Long, startUs: Long, lastUs: Long,
      nEvents: Long, totalValue: Double)
  case class SessionOut(user_id: Long, session_id: Long,
      session_start: Instant, session_end: Instant,
      n_events: Long, session_value: Double)

  val GapUs: Long = 1800L * 1000000L

  /** CDC upsert sink: drain a stream of keyed updates into a
    * partitioned parquet table via [[graft.sources.Sources.upsertParquet]]
    * — the change-data-capture landing pattern (each micro-batch is
    * one MERGE confined to the partitions it touches; untouched
    * history is never read or rewritten). foreachBatch is the right
    * tool because the merge needs batch-only primitives (anti-join +
    * dynamic partition overwrite); exactly-once comes from the sink
    * checkpoint + the merge's idempotence (re-applying a batch of
    * keyed upserts lands the same state). Empty micro-batches are
    * skipped — upsertParquet treats an empty updates frame as a bug.
    *
    * `versionCol` (the CDC change ordinal — LSN, change timestamp)
    * resolves a key changed TWICE within one micro-batch to its
    * latest row; without it such a batch fails loud in upsertParquet
    * rather than landing two rows for one key (see its key
    * contract). Real CDC feeds should always pass it.
    */
  def cdcUpsert(updates: DataFrame, targetDir: String,
      keyCol: String, partitionCol: String,
      versionCol: Option[String] = None): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    updates.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          graft.sources.Sources.upsertParquet(
            batch.sparkSession, targetDir, batch, keyCol, partitionCol, versionCol)
      }

  private def usOf(i: Instant): Long = i.getEpochSecond * 1000000L + i.getNano / 1000L
  private def fromUs(u: Long): Instant =
    Instant.ofEpochSecond(u / 1000000L, (u % 1000000L) * 1000L)

  private def sessionOut(userId: Long, st: SessionState,
      mkId: SessionState => Long): SessionOut =
    SessionOut(userId, mkId(st), fromUs(st.startUs), fromUs(st.lastUs),
      st.nEvents, st.totalValue)

  /** Fold one micro-batch of a user's events into the open-session
    * state, emitting sessions the gap rule closes. Within a
    * micro-batch events may arrive unordered: the batch is sorted
    * (bounded by batch size, not stream length). `mkId` picks the
    * session identity — callers choose a sequential counter or the
    * start time.
    */
  private def foldGaps(userId: Long, evs: Iterator[Ev], st0: Option[SessionState],
      mkId: SessionState => Long): (Option[SessionState], Seq[SessionOut]) = {
    val sorted = evs.toSeq.sortBy(e => (usOf(e.ts), e.event_id))
    var st = st0.orNull
    val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
    sorted.foreach { e =>
      val eUs = usOf(e.ts)
      if (st == null) {
        st = SessionState(1L, eUs, eUs, 1L, e.value)
      } else if (eUs - st.lastUs > GapUs) {
        out += sessionOut(userId, st, mkId)
        st = SessionState(st.sessionId + 1L, eUs, eUs, 1L, e.value)
      } else {
        st = st.copy(lastUs = eUs, nEvents = st.nEvents + 1L,
          totalValue = st.totalValue + e.value)
      }
    }
    (Option(st), out.toSeq)
  }

  /** Trailing ring buffer behind [[anomalyStream]] — at most
    * [[graft.operators.Events.AnomWindow]] value ticks, oldest first.
    */
  case class AnomState(ring: Seq[Long])

  /** One flagged anomaly — the q52 output row. */
  case class AnomOut(user_id: Long, ts_us: Long, event_id: Long,
      v_ticks: Long, w_n: Long, w_sum: Long, w_sumsq: Long)

  /** Streaming twin of q52's rolling z-score gate: per user a ring
    * buffer of the trailing [[graft.operators.Events.AnomWindow]]
    * value ticks (≤ 20 longs of state — bounded, unlike a
    * window-function buffer), each event judged against the SAME
    * all-integer denominator-cleared z² > 9 test before it enters
    * the ring, so stream output equals the batch window rows
    * EXACTLY (spec'd row-for-row). Within a micro-batch events sort
    * by (ts, event_id) — the foldGaps posture; across batches the
    * per-key arrival order must be the event order (the file/Kafka
    * per-partition ordering contract the sessionizer also rides).
    */
  def anomalyStream(events: Dataset[Ev]): Dataset[AnomOut] = {
    import events.sparkSession.implicits._
    val w = graft.operators.Events.AnomWindow
    val minN = graft.operators.Events.AnomMinN
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[AnomState, AnomOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[AnomState]) =>
          val sorted = evs.toSeq.sortBy(e => (usOf(e.ts), e.event_id))
          var ring = state.getOption.map(_.ring.toVector)
            .getOrElse(Vector.empty[Long])
          val out = scala.collection.mutable.ArrayBuffer[AnomOut]()
          sorted.foreach { e =>
            val v = math.floor(e.value * 1024.0).toLong
            val n = ring.length.toLong
            val s = ring.sum
            val q = ring.map(x => x * x).sum
            if (n >= minN &&
                (n * v - s) * (n * v - s) > 9L * (n * q - s * s))
              out += AnomOut(userId, usOf(e.ts), e.event_id, v, n, s, q)
            ring = (ring :+ v).takeRight(w)
          }
          state.update(AnomState(ring))
          out.iterator
      }
  }

  /** Per-shard packing cursor — ONE long of state: the running token
    * offset (never the documents themselves).
    */
  case class PackState(offset: Long)

  /** One packed document — the p02 output row. */
  case class PackOut(doc_id: Long, shard: Long, n_tokens: Long,
      start_offset: Long, chunk_id: Long, spans_boundary: Boolean)

  /** Streaming twin of p02's sequence packing — the CONTINUOUS
    * corpus-writer: documents stream in, each shard's cursor (one
    * long) assigns the running start offset, chunk id, and
    * boundary-straddle flag with the SAME arithmetic as the batch
    * window, so stream output equals batch p02 row-for-row when the
    * per-shard arrival order is the batch's packing order (doc_id —
    * spec'd across a batch boundary; within a micro-batch rows sort
    * by doc_id, the anomalyStream posture). Token counts ride the
    * same whitespace-split expression as p02. State is O(1) per
    * shard and shards are the parallelism unit — the writer scales
    * by adding shards, exactly like the batch layout.
    */
  def packStream(docs: DataFrame): Dataset[PackOut] = {
    import docs.sparkSession.implicits._
    val seqLen = graft.operators.Pipeline.SeqLen
    val n = graft.operators.Pipeline.NShards
    docs.select(col("doc_id").cast("long"),
        size(split(trim(col("text")), " ")).cast("long").as("n_tokens"),
        pmod(col("doc_id"), lit(n)).cast("long").as("shard"))
      .as[(Long, Long, Long)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[PackState, PackOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: Long, rows: Iterator[(Long, Long, Long)],
            state: GroupState[PackState]) =>
          val sorted = rows.toSeq.sortBy(_._1)
          var off = state.getOption.map(_.offset).getOrElse(0L)
          val out = sorted.map { case (docId, nTokens, _) =>
            val chunk = off / seqLen
            val spans = nTokens > 0L && (off + nTokens - 1L) / seqLen != chunk
            val r = PackOut(docId, shard, nTokens, off, chunk, spans)
            off += nTokens
            r
          }
          state.update(PackState(off))
          out.iterator
      }
  }

  /** Funnel progress per user — three optional stage timestamps,
    * O(1) bounded state (never the user's event history).
    */
  case class FunnelState(signupUs: Option[Long], clickUs: Option[Long],
      purchaseUs: Option[Long])

  /** One newly-reached funnel stage (Append output). */
  case class FunnelOut(user_id: Long, stage: String, ts_us: Long)

  /** Streaming twin of q32's conversion funnel: per user an O(1)
    * state of the three stage timestamps, advanced greedily in event
    * order — which equals the batch min-over-window semantics
    * (first signup IS min signup; the first later click with
    * ts STRICTLY past the signup IS min click > signup_ts; same for
    * purchase past the click), so the distinct-user stage counts a
    * sink folds from the emissions equal batch q32 exactly (spec'd).
    * Within a micro-batch events sort by (ts, event_id) — the
    * anomalyStream posture; across batches the per-key ordering
    * contract the sessionizer rides. Each stage emits AT MOST once
    * per user (state transitions fire the row), so sink-side
    * distinct-count state is user-bounded, not event-bounded.
    */
  def funnelStream(events: Dataset[Ev]): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[FunnelState]) =>
          val sorted = evs.toSeq.sortBy(e => (usOf(e.ts), e.event_id))
          var st = state.getOption.getOrElse(FunnelState(None, None, None))
          val out = scala.collection.mutable.ArrayBuffer[FunnelOut]()
          sorted.foreach { e =>
            val us = usOf(e.ts)
            e.event_type match {
              case "signup" if st.signupUs.isEmpty =>
                st = st.copy(signupUs = Some(us))
                out += FunnelOut(userId, "signup", us)
              case "click" if st.clickUs.isEmpty &&
                  st.signupUs.exists(us > _) =>
                st = st.copy(clickUs = Some(us))
                out += FunnelOut(userId, "click_after", us)
              case "purchase" if st.purchaseUs.isEmpty &&
                  st.clickUs.exists(us > _) =>
                st = st.copy(purchaseUs = Some(us))
                out += FunnelOut(userId, "purchase_after", us)
              case _ => ()
            }
          }
          state.update(st)
          out.iterator
      }
  }

  /** Per-micro-batch stage of the streaming distribution-drift gate
    * (the q53 twin): the batch's (event_type, value-tick) partial
    * counts — the monoid delta a sink folds into its running state.
    * Stateless stream-side; the heavy lifting (grid CDF + pair KS)
    * runs sink-side on the BOUNDED state frame.
    */
  def driftCountsBatch(batch: DataFrame): DataFrame =
    graft.operators.Events.tickCountsOf(batch)

  /** Monoid merge of drift-count state with a micro-batch delta —
    * counts add, so the folded state equals the batch-computed counts
    * of everything seen so far EXACTLY (spec'd). The state frame is
    * bounded by the tick GRID (value range × 2¹⁰) × the type
    * vocabulary, not the stream length; production persists it keyed
    * (t, tick) partitioned by t (the cdcUpsert path), touching only
    * the batch's ticks.
    */
  def driftMerge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta)
      .groupBy(col("t"), col("tick")).agg(sum(col("c")).as("c"))

  /** The drift report over the folded state: the SAME pair-KS
    * computation as batch q53 ([[graft.operators.Events
    * .ksReportFromCounts]]), so after any batch the stream's report
    * equals q53 run over exactly the events folded so far — the
    * continuous "has this telemetry slice drifted from that one"
    * gate with no per-event state.
    */
  def driftReport(state: DataFrame): DataFrame =
    graft.operators.Events.ksReportFromCounts(state)

  /** stream_ab_test: the reference's streaming significance test
    * (reference: /root/reference/mllib/src/main/scala/org/apache/
    * spark/mllib/stat/test/StreamingTest.scala:1, which folds
    * arriving (group, value) pairs into per-group summaries and
    * re-tests after every batch) re-expressed on the drift-gate
    * state machinery: events carry an ARM from the deterministic
    * unit-hash assignment ([[abArm]] — user parity here, the
    * assignment-by-unit rule), the stream folds (arm, value-tick)
    * counts by the [[driftMerge]] monoid (stateless stream side,
    * grid-bounded state), and the per-batch report is the SAME
    * tie-aware Mann-Whitney the batch q54 runs
    * ([[graft.operators.Events.rankSumFromCounts]]). The rank-sum
    * was the engine's documented variant while mllib's
    * Welch/Student t had no exact-integer form; q59's
    * division-cleared posture closed that, so BOTH members now ride
    * the same state — [[tTestReport]] is the parametric twin. After
    * any batch the A/B report equals the batch rank-sum over exactly
    * the events folded so far (spec'd).
    */
  def abArm(events: DataFrame): DataFrame =
    events.select(
      when(col("user_id") % 2 === 0, lit("A")).otherwise(lit("B")).as("t"),
      floor(col("value") * lit(1024.0)).cast("long").as("tick"))

  /** Per-micro-batch (arm, tick) partial counts — the monoid delta. */
  def abCountsBatch(batch: DataFrame): DataFrame =
    abArm(batch).groupBy(col("t"), col("tick")).agg(count(lit(1)).as("c"))

  /** The A/B report over folded arm-count state: batch q54's exact
    * midrank machinery (2U_A for arm A vs arm B).
    */
  def abTestReport(state: DataFrame): DataFrame =
    graft.operators.Events.rankSumFromCounts(state)

  /** stream_t_test: the PARAMETRIC member beside [[abTestReport]] on
    * the SAME folded arm-count state — batch q59's Student + Welch t
    * on exact integer moments ([[graft.operators.Events
    * .tTestFromCounts]]), completing the reference StreamingTest's
    * StudentTTest/WelchTTest surface (reference: /root/reference/
    * mllib/src/main/scala/org/apache/spark/mllib/stat/test/
    * StreamingTest.scala:1) in streaming form: the state is the
    * grid-bounded counts monoid (nothing per-event), and after any
    * batch the report equals batch q59 over exactly the events
    * folded so far (spec'd).
    */
  def tTestReport(state: DataFrame): DataFrame =
    graft.operators.Events.tTestFromCounts(state)

  /** stream_moments: q60's higher-moment profile as a streaming fold
    * — per event type the EXACT raw power sums (n, Σv, Σv², Σv³,
    * Σv⁴) on the whole-dollar grid are a perfect addition monoid
    * (the driftMerge posture: 5 numbers per type, nothing
    * per-event), and the report is batch q60's shared tree
    * ([[graft.operators.Relational.skewKurtReport]]) — so after any
    * batch the stream's skewness/kurtosis equal the batch
    * computation over exactly the events folded so far (spec'd).
    * The continuous distribution-shape gate beside [[driftReport]]'s
    * KS and [[tTestReport]]'s location tests.
    */
  def momentsBatch(batch: DataFrame): DataFrame =
    batch.select(col("event_type").as("t"),
        floor(col("value") + lit(0.5)).cast("long").as("v"))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("n"),
        sum(col("v")).as("s1"),
        sum(col("v") * col("v")).as("s2"),
        sum((col("v") * col("v") * col("v")).cast("decimal(38,0)")).as("s3"),
        sum((col("v") * col("v")).cast("decimal(38,0)")
          * (col("v") * col("v"))).as("s4"))

  /** Monoid merge of moment state with a micro-batch delta. */
  def momentsMerge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta)
      .groupBy(col("t"))
      .agg(sum(col("n")).as("n"), sum(col("s1")).as("s1"),
        sum(col("s2")).as("s2"), sum(col("s3")).as("s3"),
        sum(col("s4")).as("s4"))

  /** The skew/kurtosis report over folded moment state. */
  def momentsReport(state: DataFrame): DataFrame =
    graft.operators.Relational.skewKurtReport(state, "t")

  /** stream_recommend: the recommender serve path on a stream — the
    * streaming analog of the reference's
    * `recommendProductsForUsers` batch serve (reference: /root/
    * reference/mllib/src/main/scala/org/apache/spark/mllib/
    * recommendation/MatrixFactorizationModel.scala:1), the "train
    * batch, score stream, ONE model" posture stream_nb_classify and
    * stream_topic_classify established: the s13/s25 factor frames
    * are the batch-trained model; each micro-batch of arriving
    * customer ids joins its factor slice (stateless stream side —
    * a keyed lookup against the factor table, broadcast-sized here)
    * and runs the IDENTICAL [[graft.operators.Recommend.serveTopk]]
    * scoring tail — exact integer tick dots, the same (score desc,
    * supplier asc) total order — so streamed recommendations are
    * bit-equal to the batch s25 rows for those customers (spec'd).
    */
  def recommendServeBatch(batch: DataFrame, users: DataFrame,
      items: DataFrame): DataFrame =
    graft.operators.Recommend.serveTopk(
      batch.select(col("o_custkey").as("c")).distinct()
        .join(users, "c"), items)

  /** stream_graph_ann: the graph-ANN serve path on a stream — the
    * streaming analog of s33's batch serve, in the stream_recommend /
    * stream_ann_probe "build the index batch-side, serve the stream"
    * posture: the s20/s33 refined neighbor graph is the batch-built
    * index; each micro-batch of (query_id, qv) rows runs the
    * IDENTICAL [[graft.operators.Similarity.beamSearchFor]] tail —
    * same coarse entry layer, hops and tie order — so streamed results are
    * bit-equal to the batch s33 rows for those queries (spec'd).
    * Stateless stream side: the graph and corpus are the batch index,
    * per-batch work is queries×beam sized.
    */
  def graphAnnServeBatch(batch: DataFrame, emb: DataFrame,
      graph: DataFrame): DataFrame =
    // per-query dedup picks the lexicographic MIN vector, not an
    // arbitrary row — a micro-batch carrying one query_id with two
    // different qv vectors would otherwise serve a nondeterministic
    // result and silently break the bit-equal-to-batch contract
    {
      val q = batch.select(col("query_id"), col("qv"))
        .groupBy(col("query_id")).agg(min(col("qv")).as("qv"))
      graft.operators.Similarity.beamSearchFor(emb, graph, q,
        graft.operators.Similarity.BeamWidth,
        graft.operators.Similarity.BeamHops,
        entries = Some(graft.operators.Similarity.coarseEntries(emb, q)))
    }

  /** stream_linreg: the reference's streaming linear regression
    * (reference: /root/reference/mllib/src/main/scala/org/apache/
    * spark/mllib/regression/StreamingLinearRegressionWithSGD.scala:1
    * — trainOn takes one SGD step per arriving batch; predictOn uses
    * the current model) as a foreachBatch fold on the q57 integer
    * contract: state is the 4 weight ticks (ONE row, never
    * collected); each micro-batch runs one partial-agg'd gradient
    * pass and the exact q50-family update
    * w' = clamp(w − g div (4·n·2²⁴)) — squared loss, λ = 0 (the
    * lasso prox composes where sparsity is wanted). Exact longs make
    * the streamed model ≡ the same fold applied by hand to the
    * ordered batches (the stream_kmeans posture, spec'd).
    */
  def linregInitState(spark: SparkSession): DataFrame =
    spark.range(1).select((0 to 3).map(j => lit(0L).as(s"w$j")): _*)

  /** stream_huber: the ROBUST member of the streaming-GD family —
    * one clamped-gradient step per micro-batch on q65's integer
    * contract (the pinball/squared siblings' posture; reference:
    * /root/reference/mllib/src/main/scala/org/apache/spark/mllib/
    * regression/StreamingLinearRegressionWithSGD.scala:1 — one step
    * per arriving batch): residual clamp least(greatest(r24, −δ), δ)
    * before the gradient, then the exact q50-family update. State is
    * the 4 weight ticks zero-initialized ([[linregInitState]] — the
    * batch warm-start aggregate has no stateless-fold analogue, the
    * stream_poisson documented divergence). Exact longs make the
    * streamed model ≡ the same fold applied by hand to the ordered
    * batches (spec'd), and a planted outlier batch moves the robust
    * fold strictly less than the squared-loss fold (spec'd).
    */
  def huberFoldBatch(state: DataFrame, batch: DataFrame,
      delta24: Long = graft.operators.Relational.HuberDelta24): DataFrame = {
    val m24 = (0 to 3).map(j => col(s"w$j") * col(s"f$j")).reduce(_ + _)
    val clamp = graft.operators.Relational.HuberClamp
    val g = batch.crossJoin(broadcast(state))
      .withColumn("r24", m24 - col("y12") * lit(4096L))
      .withColumn("cr",
        least(greatest(col("r24"), lit(-delta24)), lit(delta24)))
      .agg(count(lit(1)).as("n"),
        (0 to 3).map(j => sum(col("cr") * col(s"f$j")).as(s"g$j")): _*)
    state.crossJoin(broadcast(g))
      .select((0 to 3).map(j =>
        least(greatest(col(s"w$j") -
          coalesce(
            expr(s"g$j div (4L * greatest(n, 1L) * 16777216L)"), lit(0L)),
          lit(-clamp)), lit(clamp)).as(s"w$j")): _*)
  }

  /** stream_mlp state: the q66 network row — W2₀ zero-initialized
    * (the batch moment warm start has no stateless-fold analogue,
    * the stream_poisson documented divergence), hidden W2 and W1 at
    * the SAME literal inits as batch q66.
    */
  def mlpInitState(spark: SparkSession): DataFrame = {
    val H = graft.operators.Relational.MlpHidden
    spark.range(1).select(
      Seq(lit(0L).as("w2_0")) ++
        (1 to H).map(h =>
          lit(graft.operators.Relational.mlpW2Init(h)).as(s"w2_$h")) ++
        (for (h <- 0 until H; j <- 0 to 3) yield
          lit(graft.operators.Relational.mlpW1Init(h, j))
            .as(s"w1_${h}_$j")): _*)
  }

  /** stream_mlp: the NETWORK member of the streaming-GD family — one
    * exact integer backprop step per micro-batch on q66's ReLU
    * contract (reference posture StreamingLinearRegressionWithSGD's
    * train-per-batch): per batch one partial-agg'd pass computing the
    * identical forward (relu hidden, constant bias unit), clamped
    * residual, and both layers' gradients, then the identical
    * layer-wise updates. Exact longs make the streamed model ≡ the
    * same fold applied by hand to the ordered batches (spec'd).
    */
  def mlpFoldBatch(state: DataFrame, batch: DataFrame): DataFrame = {
    val H = graft.operators.Relational.MlpHidden
    val clamp = graft.operators.Relational.MlpClamp
    val rc = graft.operators.Relational.MlpResidClamp24
    var scan = batch.crossJoin(broadcast(state))
    for (h <- 0 until H)
      scan = scan.withColumn(s"a_$h",
        (0 to 3).map(j => col(s"w1_${h}_$j") * col(s"f$j")).reduce(_ + _))
    for (h <- 0 until H)
      scan = scan.withColumn(s"h12_${h + 1}",
        expr(s"greatest(a_$h, 0L) div 4096L"))
    scan = scan
      .withColumn("h12_0", lit(4096L))
      .withColumn("yhat24",
        (0 to H).map(h => col(s"w2_$h") * col(s"h12_$h")).reduce(_ + _))
      .withColumn("cr12", expr(
        s"least(greatest(yhat24 - y12 * 4096L, ${-rc}L), ${rc}L) div 4096L"))
    val aggCols =
      (0 to H).map(h => sum(col("cr12") * col(s"h12_$h")).as(s"g2_$h")) ++
        (for (h <- 0 until H; j <- 0 to 3) yield
          sum(col("cr12") * col(s"w2_${h + 1}") *
            (col(s"a_$h") > 0L).cast("long") * col(s"f$j"))
            .as(s"g1_${h}_$j"))
    val g = scan.agg(count(lit(1)).as("n"), aggCols: _*)
    state.crossJoin(broadcast(g))
      .select(
        (0 to H).map(h =>
          least(greatest(col(s"w2_$h") -
            coalesce(
              expr(s"g2_$h div (4L * greatest(n, 1L) * 4096L)"), lit(0L)),
            lit(-clamp)), lit(clamp)).as(s"w2_$h")) ++
        (for (h <- 0 until H; j <- 0 to 3) yield
          least(greatest(col(s"w1_${h}_$j") -
            coalesce(
              expr(s"g1_${h}_$j div (4L * greatest(n, 1L) * 1048576L)"),
              lit(0L)),
            lit(-clamp)), lit(clamp)).as(s"w1_${h}_$j")): _*)
  }

  /** stream_logreg: the classifier sibling (reference: /root/
    * reference/mllib/src/main/scala/org/apache/spark/mllib/
    * classification/StreamingLogisticRegressionWithSGD.scala:1) —
    * one hard-sigmoid gradient step per micro-batch on q50's exact
    * integer contract (margin/residual/update arithmetic identical
    * to one [[graft.operators.Relational.logregRounds]] round, so
    * the streamed model after batches B1..Bn equals the hand fold).
    */
  def logregFoldBatch(state: DataFrame, batch: DataFrame): DataFrame = {
    val m24 = (0 to 3).map(j => col(s"w$j") * col(s"f$j")).reduce(_ + _)
    val clamp = graft.operators.Relational.LogregClamp
    val g = batch.crossJoin(broadcast(state))
      .withColumn("m24", m24)
      .withColumn("p26",
        least(greatest(col("m24") + lit(33554432L), lit(0L)), lit(67108864L)))
      .withColumn("r26", col("p26") - col("y") * lit(67108864L))
      .agg(count(lit(1)).as("n"),
        (0 to 3).map(j => sum(col("r26") * col(s"f$j")).as(s"g$j")): _*)
    state.crossJoin(broadcast(g))
      .select((0 to 3).map(j =>
        least(greatest(col(s"w$j") -
          coalesce(
            expr(s"(g$j * 4L) div (greatest(n, 1L) * 67108864L)"), lit(0L)),
          lit(-clamp)), lit(clamp)).as(s"w$j")): _*)
  }

  /** stream_ovr: multi-class serve on a stream — the q63 one-vs-rest
    * models in the established "train batch, score stream, ONE
    * model" posture (stream_nb/stream_topic/stream_recommend):
    * arriving feature rows cross the broadcast 1-row K-model frame
    * and run the IDENTICAL
    * [[graft.operators.Relational.ovrPredict]] tail — exact-long
    * margins, the shared argmax CASE, first-maximum tie-break — so
    * streamed predictions are bit-equal to batch q63 for those rows
    * (spec'd). Stateless stream side; per-batch work is rows×K.
    */
  def ovrServeBatch(batch: DataFrame, model: DataFrame): DataFrame =
    graft.operators.Relational.ovrPredict(batch, model)
      .select(batch.columns.map(col) :+ col("predicted"): _*)

  /** Constant trust-region step for [[poissonFoldBatch]] — batch
    * q64's halving ladder needs a round index a stateless fold does
    * not carry (the stream_quantile documented divergence), so the
    * streaming member steps at the ladder's midpoint.
    */
  private[graft] val PoisStreamStep = 256L

  /** stream_poisson state: the 3 weight ticks, zero-initialized
    * (the streaming fold has no warm-start aggregate — the model
    * climbs from zero at [[PoisStreamStep]] per batch).
    */
  def poissonInitState(spark: SparkSession): DataFrame =
    spark.range(1).select((0 to 2).map(j => lit(0L).as(s"w$j")): _*)

  /** stream_poisson: the GLM member of the streaming-GD family
    * (reference posture: /root/reference/mllib/src/main/scala/org/
    * apache/spark/mllib/regression/
    * StreamingLinearRegressionWithSGD.scala:1 — one step per
    * arriving batch) on q64's PL-exp2 log2-link integer contract:
    * each micro-batch runs ONE partial-agg'd pass through the
    * IDENTICAL [[graft.operators.Relational.poisStages]] link
    * pipeline and applies the trust-region update with the constant
    * [[PoisStreamStep]]. Exact longs make the streamed model ≡ the
    * same fold applied by hand to the ordered batches (spec'd). An
    * EMPTY micro-batch folds to the identity: the gradient agg joins
    * back onto the state with coalesce(g, 0), so a trigger with no
    * new files never nulls the model (the GD-family convention).
    */
  def poissonFoldBatch(state: DataFrame, batch: DataFrame): DataFrame = {
    val clamp = graft.operators.Relational.PoisClamp
    var scan = batch.crossJoin(broadcast(state))
    graft.operators.Relational.poisStages("div").foreach {
      case (c, e) => scan = scan.withColumn(c, expr(e))
    }
    val g = scan.agg(count(lit(1)).as("n"),
      (0 to 2).map(j => sum(col("r24") * col(s"f$j")).as(s"g$j")): _*)
    state.crossJoin(broadcast(g))
      .select((0 to 2).map(j =>
        least(greatest(col(s"w$j") -
          least(greatest(
            coalesce(expr(s"g$j div (greatest(n, 1L) * 67108864L)"), lit(0L)),
            lit(-PoisStreamStep)), lit(PoisStreamStep)),
          lit(-clamp)), lit(clamp)).as(s"w$j")): _*)
  }

  /** One micro-batch fold: state × (y12, f0..f3) batch → state. */
  def linregFoldBatch(state: DataFrame, batch: DataFrame): DataFrame = {
    val m24 = (0 to 3).map(j => col(s"w$j") * col(s"f$j")).reduce(_ + _)
    val clamp = graft.operators.Relational.LassoClamp
    val g = batch.crossJoin(broadcast(state))
      .withColumn("r24", m24 - col("y12") * lit(4096L))
      .agg(count(lit(1)).as("n"),
        (0 to 3).map(j => sum(col("r24") * col(s"f$j")).as(s"g$j")): _*)
    state.crossJoin(broadcast(g))
      .select((0 to 3).map(j =>
        least(greatest(col(s"w$j") -
          coalesce(
            expr(s"g$j div (4L * greatest(n, 1L) * 16777216L)"), lit(0L)),
          lit(-clamp)), lit(clamp)).as(s"w$j")): _*)
  }

  /** stream_quantile: the τ-quantile member of the streaming-GD
    * family (the pinball sibling of [[linregFoldBatch]] — reference
    * anchor: /root/reference/mllib/src/main/scala/org/apache/spark/
    * mllib/regression/StreamingLinearRegressionWithSGD.scala:1 takes
    * one SGD step per arriving batch; here the loss is q62's
    * piecewise-linear pinball, so the step is an integer CASE): state
    * is THREE rows (tau4, w0..w3) — one model per quantile, all
    * folded by the same single partial-agg'd pass per micro-batch
    * (×3 map-side fan-out, the q62 shape) with the CONSTANT
    * [[graft.operators.Relational.QrStep]] step (the streaming-SGD
    * convention — batch q62's halved schedule needs a round index a
    * stateless fold does not carry; documented divergence). Exact
    * longs make the streamed models ≡ the same folds applied by hand
    * to the ordered batches (spec'd, including the hand-pinned
    * first-fold intercepts tau4·step/4 on all-under-predicted data).
    */
  def quantileInitState(spark: SparkSession): DataFrame =
    spark.range(1)
      .select(explode(array((1 to 3).map(q => lit(q.toLong)): _*)).as("tau4"))
      .select(Seq(col("tau4")) ++ (0 to 3).map(j => lit(0L).as(s"w$j")): _*)

  /** One micro-batch fold: 3-row state × (y12, f0..f3) batch → state.
    * The gradient frame LEFT-joins back onto the state, so an EMPTY
    * micro-batch (a trigger with no new files) folds to the identity
    * instead of silently emptying the model — the same no-op-trigger
    * safety every GD-family fold builds in via coalesce(g, 0).
    */
  def quantileFoldBatch(state: DataFrame, batch: DataFrame): DataFrame = {
    val m24 = (0 to 3).map(j => col(s"w$j") * col(s"f$j")).reduce(_ + _)
    val clamp = graft.operators.Relational.QrClamp
    val step = graft.operators.Relational.QrStep
    val g = batch.crossJoin(broadcast(state))
      .withColumn("r24", m24 - col("y12") * lit(4096L))
      .withColumn("cq",
        (col("r24") >= 0L).cast("long") * lit(4L) - col("tau4"))
      .groupBy(col("tau4"))
      .agg(count(lit(1)).as("n"),
        (0 to 3).map(j => sum(col("cq") * col(s"f$j")).as(s"g$j")): _*)
    state.join(broadcast(g), Seq("tau4"), "left")
      .select(Seq(col("tau4")) ++ (0 to 3).map(j =>
        least(greatest(col(s"w$j") -
          coalesce(
            expr(s"(g$j * ${step}L) div (4L * greatest(n, 1L) * 4096L)"),
            lit(0L)),
          lit(-clamp)), lit(clamp)).as(s"w$j")): _*)
  }

  /** Stateful sessionization: emits a session when a 30-min gap
    * closes it. State per user is O(1): the open session only.
    * NoTimeout — idle sessions stay open until the next event or a
    * batch drain; [[sessionizeWithTimeout]] is the production variant
    * that closes them in-stream.
    */
  def sessionize(events: Dataset[Ev]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          val (st, out) = foldGaps(userId, evs, state.getOption, _.sessionId)
          st.foreach(state.update)
          out.iterator
      }
  }

  /** Production sessionization: the [[sessionize]] gap logic plus
    * EventTimeTimeout, so an IDLE session closes in-stream once the
    * watermark passes its last event + gap — no batch drain needed,
    * and the state store stays bounded (timed-out state is removed).
    *
    * Session identity is the session START MICROS, not the sequential
    * counter: once a user's timed-out state is removed, a counter
    * restarts at 1 and would collide with that user's earlier emitted
    * sessions; the start time is unique per user (sessions never
    * overlap) and survives state expiry.
    */
  def sessionizeWithTimeout(events: Dataset[Ev],
      watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val closed = sessionOut(userId, state.get, _.startUs)
            state.remove()
            Iterator.single(closed)
          } else {
            val (st, out) = foldGaps(userId, evs, state.getOption, _.startUs)
            st.foreach { s =>
              state.update(s)
              // close once the watermark passes last event + gap; the
              // timeout timestamp must sit above the current watermark
              // or Spark rejects it (a late batch could otherwise set
              // one already expired)
              state.setTimeoutTimestamp(math.max(
                (s.lastUs + GapUs) / 1000L, state.getCurrentWatermarkMs() + 1L))
            }
            out.iterator
          }
      }
  }

  /** Flush helper for tests/batch-drain: the open sessions still held
    * in state are not emitted by the stream; a final batch pass over
    * the same data closes them. (In production a state timeout emits
    * them; tests compare closed sessions only.)
    */
  def closedSessionsBatch(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    graft.Tables.events(spark, sfDir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("next_us", lead(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > GapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(byUser))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"), sum(col("value")).as("session_value"),
        max(col("next_us").isNull).as("is_open"))
      .filter(!col("is_open"))
      .drop("is_open")
  }

  /** Embedding dimensionality of the corpus vectors (the Similarity
    * family's contract).
    */
  private val KmDim = 64

  /** stream_kmeans: the reference's StreamingKMeans update (reference:
    * /root/reference/mllib/src/main/scala/org/apache/spark/mllib/
    * clustering/StreamingKMeans.scala:1) as a foreachBatch fold with
    * decay 1/2 on the Similarity family's integer-tick grid. State is
    * one row per cell — (cid, w, s: array<long>) with s_j the 2^10
    * tick sum of member coordinates and the live centroid cv_j =
    * s_j / (1024 * w) — so the fold is exact long arithmetic:
    * order-independent within a micro-batch (long sums), sequential
    * across batches exactly like the reference's model update.
    *
    * Per batch: assign every arriving vector to its argmax-cosine
    * cell of the CURRENT centroids (broadcast k-row frame, partial-
    * agg'd argmax — the s04 assignment shape), reduce the batch to
    * per-cell (m, tick-sum array), then fold every cell by
    * w' = w div 2 + m, s' = s div 2 + b elementwise — the mllib
    * halflife update with decayFactor 1/2 on the integer grid (an
    * untouched cell keeps its centroid up to div truncation while its
    * weight decays, exactly the reference's forgetfulness semantics).
    *
    * Scale shape: state is k rows; each micro-batch costs one
    * broadcast assignment pass + one partial agg to k rows — the
    * streaming twin of one Lloyd round.
    */
  def kmeansInitState(centroids: DataFrame): DataFrame = {
    graft.functions.registerAll(centroids.sparkSession)
    centroids.select(col("cid"), lit(1L).as("w"),
      array((0 until KmDim).map(j =>
        floor(element_at(col("cv"), j + 1).cast("double") * 1024.0 + 0.5)
          .cast("long")): _*).as("s"))
  }

  /** Live (cid, w, cv) centroids of a kmeans state frame. */
  def kmeansCentroidsOf(state: DataFrame): DataFrame =
    state.select(col("cid"), col("w"),
      expr("transform(s, x -> CAST(CAST(x AS DOUBLE)" +
        " / (1024.0 * greatest(w, 1L)) AS FLOAT))").as("cv"))

  /** stream_survival state: the q67 Kaplan–Meier counts monoid —
    * an empty (cohort, t_obs, d, c) frame. Counts ADD across
    * micro-batches and the curve is a pure function of the
    * accumulated counts, so the streamed curve after batches B1..Bn
    * IS batch q67 on B1 ∪ … ∪ Bn (spec'd) — the strongest stream ≡
    * batch contract in the suite (no step-order divergence at all).
    */
  def survivalInitState(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").as("cohort"), col("id").as("t_obs"),
      col("id").as("d"), col("id").as("c"))

  /** One micro-batch fold: arriving (cohort, t_obs, is_event)
    * subject rows add into the counts state. An empty micro-batch
    * unions nothing — the identity fold, no guard needed. State
    * stays ≤ cohorts × horizon rows.
    */
  def survivalFoldBatch(state: DataFrame, batch: DataFrame): DataFrame =
    state.unionByName(
        batch.groupBy(col("cohort"), col("t_obs"))
          .agg(sum(col("is_event")).as("d"),
            sum(lit(1L) - col("is_event")).as("c")))
      .groupBy(col("cohort"), col("t_obs"))
      .agg(sum(col("d")).as("d"), sum(col("c")).as("c"))

  /** Live product-limit curve of a survival counts state — the
    * IDENTICAL q67 tail ([[graft.operators.Events.kmFromCounts]]).
    */
  def survivalCurve(state: DataFrame): DataFrame =
    graft.operators.Events.kmFromCounts(state)

  /** One micro-batch fold: pure state x batch -> state (the
    * foreachBatch body and the spec's hand-fold are the same
    * function, so stream == sequential batch folds by construction).
    */
  def kmeansFoldBatch(state: DataFrame, batch: DataFrame): DataFrame = {
    val spark = state.sparkSession
    graft.functions.registerAll(spark)
    val cents = kmeansCentroidsOf(state)
    val assigned = batch.crossJoin(broadcast(cents))
      .withColumn("cs", call_function("cosine_sim", col("embedding"), col("cv")))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cs"), (-col("cid")).as("negc"),
        col("embedding").as("e"))).as("m"))
      .select((-col("m.negc")).as("cid"), col("m.e").as("embedding"))
    val sumCols = (0 until KmDim).map(j =>
      sum(floor(element_at(col("embedding"), j + 1).cast("double") * 1024.0 + 0.5)
        .cast("long")).as(s"b$j"))
    val perCell = assigned.groupBy(col("cid"))
      .agg(count(lit(1)).as("m"), sumCols: _*)
      .select(col("cid"), col("m"),
        array((0 until KmDim).map(j => col(s"b$j")): _*).as("b"))
    state.join(perCell, Seq("cid"), "left")
      .select(col("cid"),
        (expr("w div 2") + coalesce(col("m"), lit(0L))).as("w"),
        expr("zip_with(s, coalesce(b, array_repeat(0L, " + KmDim + ")), " +
          "(x, y) -> x div 2 + y)").as("s"))
  }
}
