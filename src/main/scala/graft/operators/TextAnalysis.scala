package graft.operators

import graft.Ckpt._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.registerAll

/** Text-analysis operators for LLM-corpus curation (SURVEY §2).
  *
  * Everything here is per-document map work over built-in codegen'd
  * functions (split / filter / regexp) or graft expressions — zero
  * shuffles except final presentation sorts, so at 100 TB each
  * operator is a single embarrassingly-parallel scan whose output can
  * be written back partition-local.
  */
object TextAnalysis {

  /** t01: language ID — score = fraction of lowercased tokens hitting
    * each language's stopword profile, argmax with ties to the larger
    * lang string. One codegen'd `langid_top` kernel call per row (the
    * builtin formulation — 5 × filter/array_contains lambdas — runs
    * interpreted per token × language: 1.3s vs ~0.3s at sf0.1).
    */
  def t01Langid(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        call_function("langid_top", col("text")).as("best"),
        col("lang").as("labeled_lang"))
      .select(col("doc_id"),
        col("best.lang").as("pred_lang"),
        round(col("best.score"), 4).as("confidence"),
        col("labeled_lang"))
      .orderBy(col("doc_id"))
  }

  /** t02: quality scoring — length / punctuation / stopword /
    * repeated-token signals combined into one score, replicated
    * bit-for-bit by the DuckDB oracle (rounding to 4dp on every
    * ratio). The stopword count runs as the codegen'd `stopword_hits`
    * kernel (canonical profile:
    * [[graft.functions.Kernels.LangProfiles]]) — the array-HOF
    * formulation evaluated its lambda interpreted per token and was
    * t02's dominant cost.
    */
  def t02QualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark)
    qualityScored(Tables.documents(spark, sfDir)).orderBy(col("doc_id"))
  }

  /** t02's scorer over any (doc_id, text) frame — a PURE PER-ROW map
    * (no aggregate, no window), which is what lets the identical
    * column expressions run on a batch frame or a stream
    * ([[graft.streaming.StreamOps.qualityGate]]) with no watermark or
    * state. Package-private for the streaming twin and specs.
    */
  private[graft] def qualityScored(docs: DataFrame): DataFrame = {
    registerAll(docs.sparkSession)
    val nChars = length(col("text"))
    val toks = split(col("text"), " ")
    val nToks = size(toks)
    val punctStripped = length(regexp_replace(col("text"), "[.,!?;:]", ""))
    val stopHits = call_function("stopword_hits", col("text"))
    val distinctToks = size(array_distinct(toks))
    docs.select(
      col("doc_id"),
      nChars.as("n_chars_m"),
      nToks.as("n_tokens"),
      round((nChars - punctStripped).cast("double") / nChars.cast("double"), 4)
        .as("punct_ratio"),
      round(stopHits.cast("double") / nToks.cast("double"), 4).as("stopword_ratio"),
      round(distinctToks.cast("double") / nToks.cast("double"), 4).as("distinct_ratio"))
      .withColumn("quality_score",
        // 5dp: weighted sums of 4dp ratios have ≤5 exact decimals, so
        // rounding at 5 never hits a half-way case (4dp would, and
        // Spark HALF_UP vs DuckDB binary-round then disagree).
        round(least(lit(1.0), col("n_tokens").cast("double") / lit(100.0)) * lit(0.4)
          + col("stopword_ratio") * lit(0.3)
          + col("distinct_ratio") * lit(0.3), 5))
  }

  /** t03: token counting — whitespace tokens + a BPE-ish regex pass
    * (letter runs / digit runs / single other-symbols), the standard
    * pre-tokenizer shape. Per-doc, plus corpus totals by source.
    */
  def t03TokenCount(spark: SparkSession, sfDir: String): DataFrame = {
    val wsTokens = size(split(trim(col("text")), " "))
    val bpeTokens = size(regexp_extract_all(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0)))
    Tables.documents(spark, sfDir)
      .select(col("source"), wsTokens.as("ws_t"), bpeTokens.as("bpe_t"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ws_t")).as("ws_tokens"),
        sum(col("bpe_t")).as("bpe_tokens"),
        round(avg(col("ws_t")), 4).as("avg_ws_tokens"))
      .orderBy(col("source"))
  }

  /** t04: winnowing document fingerprints (Schleimer et al. 2003) via
    * the graft `winnow_fingerprint` expression: char 8-gram rolling
    * hashes, window 4. Output is per-doc fingerprint stats plus the
    * count of docs sharing ≥1 fingerprint — the containment-detection
    * use. Shared-fingerprint join shuffles only (hash, doc_id) pairs.
    */
  def t04Fingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark)
    val fps = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        call_function("winnow_fingerprint", col("text"), lit(8), lit(4)).as("fps"))
    // array_distinct before explode: one (doc, fp) row per distinct fp
    // per doc, so count(*) per fp counts distinct docs. Shared-fp
    // detection is count > 1 + semi-join — no collect_set, so a hot
    // fingerprint (boilerplate shared by millions of docs) costs a
    // counter, not an unbounded set buffer.
    val exploded = fps.select(col("doc_id"), explode(array_distinct(col("fps"))).as("fp"))
    val sharedFp = exploded.groupBy(col("fp"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .select(col("fp"))
    val sharing = exploded.join(sharedFp, Seq("fp"), "left_semi")
      .select(col("doc_id"))
      .distinct()
      .withColumn("shares_fp", lit(true))
    fps.select(col("doc_id"), size(col("fps")).as("n_fp"),
        array_min(col("fps")).as("fp_min"), array_max(col("fps")).as("fp_max"))
      .join(sharing, Seq("doc_id"), "left")
      .withColumn("shares_fp", coalesce(col("shares_fp"), lit(false)))
      .orderBy(col("doc_id"))
  }

  /** t05: repetition scoring (Gopher-style quality rule): the share of
    * a document taken by its single most repeated word 2-gram.
    * One codegen'd `repetition_top` kernel call per row (hash-count
    * pass, ties to the binary-smallest gram) — NO shuffle at all. At
    * 100 TB this is an embarrassingly-parallel scan; the
    * groupBy-per-gram alternative would shuffle every gram of every
    * document, and a `transform`/`aggregate` lambda formulation runs
    * interpreted per element (measured 14s vs <1s at sf0.1).
    */
  def t05Repetition(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), call_function("repetition_top", col("text"), lit(2)).as("f"))
      .filter(col("f").isNotNull)
      .select(
        col("doc_id"),
        col("f.n_grams").as("n_2g"),
        col("f.top_gram").as("top_gram"),
        col("f.top_n").as("top_n"),
        round(col("f.top_n").cast("double") / col("f.n_grams").cast("double"), 4).as("rep_ratio"))
      .orderBy(col("doc_id"))
  }

  /** t06: identifier detection + redaction — the anonymization pass a
    * curation pipeline runs before text leaves a trust boundary.
    * Entity names carry embedded numeric ids (`Customer#000000042`);
    * each row reports how many id characters were found and the
    * redacted form. Pure per-row regex map (codegen'd), zero shuffle;
    * the union is two scans appended, not joined.
    */
  def t06RedactIds(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir).select(
      lit("customer").as("entity"), col("c_custkey").as("key"), col("c_name").as("name"))
    val supp = Tables.supplier(spark, sfDir).select(
      lit("supplier").as("entity"), col("s_suppkey").as("key"), col("s_name").as("name"))
    cust.union(supp)
      .withColumn("redacted", regexp_replace(col("name"), "[0-9]", "X"))
      .withColumn("n_id_chars",
        (length(col("name")) - length(regexp_replace(col("name"), "[0-9]", "")))
          .cast("long"))
      .withColumn("has_id", col("n_id_chars") > 0)
      .orderBy(col("entity"), col("key"))
  }

  /** t08: character-entropy scoring — Shannon entropy (nats) of each
    * document's byte distribution, the cheap gibberish /
    * compressibility filter (near-zero entropy = repeated filler,
    * near-log(256) = random bytes; natural text sits in between).
    * One codegen `char_entropy` kernel pass per row, zero shuffle
    * beyond the presentation sort. The kernel sums in ascending byte
    * order so the DuckDB oracle reproduces the float sum exactly
    * (addition order is part of the contract); low/high flags use the
    * UNROUNDED value.
    */
  def t08Entropy(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark)
    val h = call_function("char_entropy", col("text"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        round(h, 4).as("entropy"),
        (h < 2.0).as("low_entropy"))
      .orderBy(col("doc_id"))
  }

  /** t07: corpus vocabulary with document frequency and smoothed IDF
    * — the global statistics pass behind TF-IDF features, stopword
    * discovery, and tokenizer fitting. One explode + one
    * partial-agg'd groupBy on token (count + count-distinct both
    * decompose map-side), doc count broadcast — at 100 TB the
    * shuffle carries one row per distinct (token, doc) pair, not the
    * corpus. Top-100 by document frequency, ties alphabetical.
    */
  def t07Vocab(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        call_function("word_grams", lower(col("text")), lit(1)).as("toks"))
    val nDocs = Tables.documents(spark, sfDir).agg(count(lit(1)).as("n_docs"))
    docs.select(col("doc_id"), explode(col("toks")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .crossJoin(broadcast(nDocs))
      .withColumn("idf", round(log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))), 4))
      .select(col("token"), col("tf"), col("df"), col("idf"))
      .orderBy(col("df").desc, col("token"))
      .limit(100)
  }

  /** Ticks per bit for [[t09Surprisal]]'s quantized code lengths (2²⁰). */
  private val SurprisalScale = 1048576.0

  /** t09: unigram surprisal — each document's mean code length in
    * bits/token under the corpus's own add-1-smoothed unigram model:
    * the LM-free perplexity proxy used as a quality filter (high
    * surprisal = rare-token gibberish, very low = boilerplate
    * repetition). Two passes: (1) unigram counts — one (token)
    * shuffle, partial-agg'd — with the per-DISTINCT-token code length
    * quantized to integer ticks `q = floor(−log2(p)·2²⁰ + 0.5)`;
    * (2) docs explode to (doc, token) and join the model, and the
    * per-doc tick sums are LONG sums — exact and order-independent
    * where double sums are neither (the s03/t08 fixed-point pattern),
    * so scores are deterministic across partitionings and
    * reproducible in the DuckDB oracle. log2 is evaluated once per
    * vocab entry (never per occurrence), so cross-engine libm ULP
    * differences are confined to a ~2⁻³¹ floor-boundary window per
    * distinct token, and a flipped tick moves a doc mean by 2⁻²⁰/n
    * bits — invisible at the 4-decimal contract. At 100 TB the model
    * is a small (token, q) frame: broadcast it when the vocab fits,
    * shuffle-join otherwise; everything else is linear scans.
    */
  def t09Surprisal(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark)
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(call_function("word_grams", lower(col("text")), lit(1))).as("token"))
    val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")).as("t_total"), count(lit(1)).as("v_size"))
    val model = counts.crossJoin(broadcast(totals))
      .withColumn("q",
        floor(-log2((col("cnt") + lit(1)).cast("double") /
            (col("t_total") + col("v_size")).cast("double")) *
          lit(SurprisalScale) + lit(0.5)).cast("long"))
      .select(col("token"), col("q"))
    val perDoc = toks.join(model, "token")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("q")).as("sq"))
    Tables.documents(spark, sfDir).select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_toks"), lit(0L)).as("n_tokens"),
        when(col("n_toks") > 0,
          round(col("sq").cast("double") / (lit(SurprisalScale) * col("n_toks")), 4))
          .otherwise(lit(null).cast("double")).as("surprisal_bits"))
      .orderBy(col("doc_id"))
  }

  /** Minimum pair count for [[t11Collocations]] — PMI is unstable on
    * rare pairs (one co-occurrence of two rare words maxes the
    * score), so the standard practice is a count floor first.
    */
  private val CollocMinPair = 10
  private val CollocTopK = 30

  /** t11: collocation mining — word bigrams ranked by pointwise
    * mutual information, PMI = log2(p(xy) / (p(x)·p(y))): the
    * phrase-discovery pass behind tokenizer merge rules and
    * stop-phrase lists (high PMI = words that occur together far
    * more than chance — names, idioms, templates). Three partial-agg
    * aggregations (unigram counts, bigram counts, their 1-row
    * totals); the bigram→unigram probability join is
    * vocabulary-sized (broadcast when it fits, shuffle otherwise —
    * same regime as t09's model join). Probabilities divide longs as
    * doubles in a fixed op order so the oracle reproduces each PMI
    * bit-for-bit; ranking uses the ROUNDED score (ties lexicographic)
    * so a cross-engine log2 ULP can't reorder the top-k.
    */
  def t11Collocations(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark)
    val docs = Tables.documents(spark, sfDir)
    val uni = docs
      .select(explode(call_function("word_grams", lower(col("text")), lit(1))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val uniTotal = uni.agg(sum(col("cu")).as("t_uni"))
    val bi = docs
      .select(explode(call_function("word_grams", lower(col("text")), lit(2))).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n_pair"))
    val biTotal = bi.agg(sum(col("n_pair")).as("t_bi"))
    bi.filter(col("n_pair") >= CollocMinPair)
      .withColumn("x", split(col("bigram"), " ")(0))
      .withColumn("y", split(col("bigram"), " ")(1))
      .join(uni.select(col("w").as("x"), col("cu").as("cx")), "x")
      .join(uni.select(col("w").as("y"), col("cu").as("cy")), "y")
      .crossJoin(broadcast(uniTotal))
      .crossJoin(broadcast(biTotal))
      .withColumn("pmi", round(
        log2((col("n_pair").cast("double") / col("t_bi").cast("double")) /
          ((col("cx").cast("double") / col("t_uni").cast("double")) *
           (col("cy").cast("double") / col("t_uni").cast("double")))), 4))
      .select(col("bigram"), col("n_pair"), col("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(CollocTopK)
  }

  /** Candidate floor and per-source depth for [[t13DistinctiveTokens]]. */
  private val DistinctMinCount = 5
  private val DistinctTopK = 5

  /** t13: distinctive tokens per source — the top tokens by LIFT,
    * p(token | source) / p(token | corpus): the drift/fingerprint
    * report that tells you what a source is ABOUT (and catches an
    * ingest gone wrong — a source whose distinctive tokens are
    * boilerplate markers). Two partial-agg counts (per-source and
    * corpus token counts share one explode via rollup-free
    * aggregation on (source, token) then a re-aggregate), a rare-
    * token floor ([[DistinctMinCount]] — lift is unstable on
    * singletons, t11's PMI argument), lift from long counts divided
    * as doubles in fixed order, and a per-source top-k window over
    * the ROUNDED score (partition = a source's qualifying vocab —
    * bounded; ties lexicographic so both engines rank identically).
    */
  def t13DistinctiveTokens(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    registerAll(spark)
    val st = Tables.documents(spark, sfDir)
      .select(col("source"),
        explode(call_function("word_grams", lower(col("text")), lit(1))).as("token"))
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("c_st"))
    val perSource = st.groupBy(col("source")).agg(sum(col("c_st")).as("t_s"))
    val perToken = st.groupBy(col("token")).agg(sum(col("c_st")).as("c_t"))
    val total = perToken.agg(sum(col("c_t")).as("t_all"))
    val lifted = st.filter(col("c_st") >= DistinctMinCount)
      .join(broadcast(perSource), "source")
      .join(perToken, "token")
      .crossJoin(broadcast(total))
      .withColumn("lift", round(
        (col("c_st").cast("double") / col("t_s").cast("double")) /
          (col("c_t").cast("double") / col("t_all").cast("double")), 4))
    lifted
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("lift").desc, col("token"))))
      .filter(col("rank") <= DistinctTopK)
      .select(col("source"), col("rank").cast("long").as("rank"),
        col("token"), col("c_st").as("n_in_source"), col("lift"))
      .orderBy(col("source"), col("rank"))
  }

  /** Rank depth for [[t12ZipfFit]] — the fit runs over the top-N
    * tokens: bounded input (the single-task ranking window and the
    * regression sums stay small and well-conditioned at any corpus
    * size) and standard practice — Zipf behavior lives in the head,
    * the long tail just bends the line.
    */
  private val ZipfTopN = 1000

  /** t12: Zipf rank-frequency fit — regress log2(tf) on log2(rank)
    * over the top-[[ZipfTopN]] tokens: the corpus-health check that
    * natural language obeys Zipf's law (slope ≈ −1; templated or
    * machine-generated corpora flatten or kink the line, so a
    * drifting slope is an ingest alarm). Shape: one token shuffle
    * for tf, a global top-N (partial top-k per partition, then the
    * tiny sorted head), ranks from a window over the BOUNDED 1000-row
    * frame (single task by construction — not q27's unbounded group),
    * and one regression aggregation reusing q40's streaming-moment
    * functions. Ranking ties break lexicographically so both engines
    * regress the identical point set; 4dp rounding absorbs float
    * reassociation across partitions (the q40 contract).
    */
  def t12ZipfFit(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    registerAll(spark)
    val tf = Tables.documents(spark, sfDir)
      .select(explode(call_function("word_grams", lower(col("text")), lit(1))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("tf"))
    tf.orderBy(col("tf").desc, col("token")).limit(ZipfTopN)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("tf").desc, col("token"))))
      .select(log2(col("rank")).as("lx"), log2(col("tf")).as("ly"))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(expr("regr_slope(ly, lx)"), 4).as("slope"),
        round(expr("regr_intercept(ly, lx)"), 4).as("intercept"),
        round(expr("regr_r2(ly, lx)"), 4).as("r2"))
  }

  /** t10: frequent-items sketch beside its exact twin — the third
    * member of the sketch family (q34 covers HLL + quantiles): the
    * corpus's top-20 tokens by term frequency computed exactly
    * (hash-compared), with a `sketch_ok` contract column checking
    * Spark's `approx_top_k` frequent-items sketch against it. With
    * `maxItemsTracked` ≥ the vocabulary size the sketch's counts are
    * exact, so every token STRICTLY above the rank-20 boundary must
    * appear in the sketch's top-20; boundary ties are vacuously ok
    * (any correct top-k may break ties either way — same
    * tie-robustness reasoning as q34's error-bound booleans). At
    * 100 TB the sketch is the point: fixed-size partial states vs
    * t07's exact (token, count) shuffle.
    */
  def t10TopkSketch(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark)
    val toks = Tables.documents(spark, sfDir)
      .select(explode(call_function("word_grams", lower(col("text")), lit(1))).as("token"))
    val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("tf"))
    // checkpointed: the boundary min and the final join both read this
    // 20-row frame — unmaterialized, each consumer re-runs the whole
    // exact token aggregation + global sort (no cross-branch reuse)
    val top20 = exact.orderBy(col("tf").desc, col("token")).limit(20)
      .ckpt(true)
    val boundary = top20.agg(min(col("tf")).as("__b"))
    val sketch = toks
      .agg(expr("approx_top_k(token, 20, 65536)").as("tk"))
      .select(explode(col("tk")).as("s"))
      .select(col("s.item").as("sk_token"))
    top20.crossJoin(broadcast(boundary))
      .join(broadcast(sketch.withColumn("hit", lit(true))),
        col("token") === col("sk_token"), "left")
      .select(col("token"), col("tf"),
        (col("tf") === col("__b") || coalesce(col("hit"), lit(false))).as("sketch_ok"))
      .orderBy(col("tf").desc, col("token"))
  }

  /** t14: per-document top-5 TF-IDF terms — the classic keyword /
    * topic-signal extraction a curation pipeline files next to each
    * document (near-dup triage, topic balancing, retrieval keys).
    * Same tokenizer as t07 (word_grams over lowercased text), idf
    * smoothed `ln((N+1)/(df+1))` rounded to 4dp BEFORE the tf
    * multiply — the single libm call per DISTINCT token, so
    * cross-engine ULP exposure matches t07's proven contract — and
    * scores rounded to 4dp with ties broken token-ascending.
    *
    * Scale shape: tf is one (doc, token) shuffle (partial-agg'd); df
    * derives from tf's output, NOT a second corpus scan; N is a
    * 1-row broadcast; the per-doc top-5 is a window partitioned by
    * doc_id — bounded by tokens-per-document, never a global sort.
    */
  def t14Tfidf(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    registerAll(spark)
    val tf = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(call_function("word_grams", lower(col("text")), lit(1))).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val nDocs = Tables.documents(spark, sfDir).agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("idf",
        round(log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))), 4))
      .withColumn("tfidf", round(col("tf") * (col("idf") + lit(1.0)), 4))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("token"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("doc_id"), col("token"), col("tf"), col("tfidf"), col("rank"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** t15: bigram-LM fluency score — per-document mean CONDITIONAL
    * surprisal −log2 P(w2|w1) under the corpus's own bigram model
    * with add-one smoothing (the CCNet-style LM quality filter,
    * complementing t09's unigram rarity: t09 asks "are these words
    * rare", t15 asks "are these TRANSITIONS unusual" — boilerplate
    * and templates score low bits, shuffled or disfluent text scores
    * high even when every word is common). P(w2|w1) =
    * (cb(w1w2)+1)/(cu(w1)+V); every scored bigram is in the model by
    * construction (the doc contributed it), so smoothing only damps
    * rare transitions, never divides by zero.
    *
    * Determinism: t09's proven contract — one libm log2 per DISTINCT
    * model bigram, quantized to 2⁻²⁰-tick longs
    * (`floor(−log2(P)·2^20 + 0.5)`), per-doc mean of an
    * order-independent long sum, rounded 4dp.
    *
    * Scale shape: two corpus token scans (unigram + bigram counts),
    * both partial-agg'd; the model join is bigram-vocabulary-sized
    * (broadcast when it fits — t09's model-join regime); the per-doc
    * aggregation shuffles (doc_id, tick) longs only.
    */
  def t15BigramBits(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark)
    val docs = Tables.documents(spark, sfDir)
    val uni = docs
      .select(explode(call_function("word_grams", lower(col("text")), lit(1))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val vsize = uni.agg(count(lit(1)).as("v_size"))
    val bisByDoc = docs.select(col("doc_id"),
      explode(call_function("word_grams", lower(col("text")), lit(2))).as("bigram"))
    val model = bisByDoc.groupBy(col("bigram")).agg(count(lit(1)).as("cb"))
      .withColumn("w1", split(col("bigram"), " ")(0))
      .join(uni.select(col("w").as("w1"), col("cu")), "w1")
      .crossJoin(broadcast(vsize))
      .withColumn("q",
        floor(-log2((col("cb") + lit(1)).cast("double") /
            (col("cu") + col("v_size")).cast("double")) *
          lit(SurprisalScale) + lit(0.5)).cast("long"))
      .select(col("bigram"), col("q"))
    val perDoc = bisByDoc.join(model, "bigram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nb"), sum(col("q")).as("sq"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("nb"), lit(0L)).as("n_bigrams"),
        when(col("nb") > 0,
          round(col("sq").cast("double") / (lit(SurprisalScale) * col("nb")), 4))
          .otherwise(lit(null).cast("double")).as("bigram_bits"))
      .orderBy(col("doc_id"))
  }

  /** t16: per-source KL divergence from the corpus unigram model —
    * the data-mixture drift diagnostic: KL(source ‖ corpus) in bits
    * answers "how far does this source's token distribution sit from
    * the blend", the number a mixture designer watches when a new
    * crawl snapshot or domain is added (near 0 = redundant with the
    * blend, large = distributionally novel). Output one row per
    * source: (source, n_tokens, src_vocab, kl_bits).
    *
    * Determinism is the t09 tick contract: each (source, token) term
    * p_s(w)·log2(p_s(w)/p(w)) is computed from integer counts in one
    * fixed expression (products stay < 2⁻⁵³-exact doubles), quantized
    * to 2⁻²⁰-tick longs, and summed as longs — order-independent and
    * bit-identical in the DuckDB oracle. Terms are signed (p_s < p
    * gives a negative term); the long sum is exact so the signed
    * cancellation is too.
    *
    * Scale shape: ONE corpus scan (the (source, token) partial-agg'd
    * count); everything downstream is vocabulary-sized — corpus
    * counts derive from the per-source counts by a second vocab-sized
    * agg (no second scan, the t14 lesson), the totals joins are a
    * broadcast of |sources| and 1 rows, and the final agg carries
    * |sources| rows.
    */
  def t16SourceKl(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark)
    val st = Tables.documents(spark, sfDir)
      .select(col("source"),
        explode(call_function("word_grams", lower(col("text")), lit(1))).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c_sw"))
    val corpus = st.groupBy(col("w")).agg(sum(col("c_sw")).as("c_w"))
    val perSrc = st.groupBy(col("source"))
      .agg(sum(col("c_sw")).as("n_s"), count(lit(1)).as("src_vocab"))
    val total = corpus.agg(sum(col("c_w")).as("n"))
    val ticks = st
      .join(corpus, "w")
      .join(broadcast(perSrc), "source")
      .crossJoin(broadcast(total))
      .withColumn("q",
        floor((col("c_sw").cast("double") / col("n_s")) *
          log2((col("c_sw").cast("double") * col("n")) /
            (col("c_w").cast("double") * col("n_s"))) *
          lit(SurprisalScale) + lit(0.5)).cast("long"))
      .groupBy(col("source")).agg(sum(col("q")).as("sq"))
    perSrc.join(ticks, "source")
      .select(col("source"), col("n_s").as("n_tokens"), col("src_vocab"),
        round(col("sq").cast("double") / lit(SurprisalScale), 4).as("kl_bits"))
      .orderBy(col("source"))
  }

  /** Delimiter inventory for [[t17RakeKeyphrases]]: the English
    * closed-class profile ([[graft.functions.Kernels.LangProfiles]],
    * the library's canonical stopword list) plus the bare article
    * "a". The oracle inlines the same 11 words.
    */
  private[graft] val RakeStopwords: Seq[String] =
    graft.functions.Kernels.LangProfiles.head._2 :+ "a"

  /** Keyphrases [[t17RakeKeyphrases]] reports. */
  private val RakeTopK = 30

  /** Candidate length cap: only phrases this many tokens or fewer are
    * RANKED (word statistics still cover the full inventory) — the
    * standard RAKE-variant guard against delimiter-free documents
    * surfacing their entire text as one "phrase".
    */
  private val RakeMaxPhraseLen = 4

  /** t17: RAKE keyphrase extraction (Rose et al., "Automatic Keyword
    * Extraction from Individual Documents", 2010) — the cheap
    * unsupervised "what is this corpus about" signal: candidate
    * phrases are maximal stopword-free token runs (the gaps-and-
    * islands trick on token positions, per-doc windows so partitions
    * stay document-bounded), each word scores deg/freq over the
    * phrase inventory (deg = Σ length of phrases containing the
    * word, freq = its phrase occurrences), a phrase scores the sum
    * of its word scores, and identical phrase texts aggregate
    * corpus-wide into a top-[[RakeTopK]].
    *
    * Determinism: word scores are integer ticks `(deg · 2²⁰) div
    * freq` — positive floor-div agrees between Spark's truncating
    * `div` and DuckDB's flooring `//` — and phrase scores are exact
    * long sums of those ticks (the oracle CASTs its sums back from
    * HUGEINT, the g01 lesson); the final cut orders by (score desc,
    * phrase), a total order. Scale shape: two (doc, phrase-group)
    * shuffles + one token-keyed partial agg; the word-score frame is
    * vocabulary-sized. At extreme corpus sizes deg · 2²⁰ needs the
    * headroom check every tick contract carries (long overflows past
    * deg ≈ 8.8e12; production drops to 2¹⁰ ticks well before that).
    */
  def t17RakeKeyphrases(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tk = Tables.documents(spark, sfDir).select(col("doc_id"),
      expr("filter(split(lower(text), '[ \\n\\t\\r]+'), x -> x <> '')").as("t"))
    val tok = tk.select(col("doc_id"), posexplode(col("t")).as(Seq("pos", "token")))
    val ns = tok.filter(!col("token").isin(RakeStopwords: _*))
      .withColumn("grp", col("pos") -
        row_number().over(Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
    val pl = ns.groupBy(col("doc_id"), col("grp")).agg(count(lit(1)).as("plen"))
    val ws = ns.join(pl, Seq("doc_id", "grp"))
      .groupBy(col("token"))
      .agg(expr("(sum(plen) * 1048576) div count(*)").as("w"))
    ns.join(ws, "token")
      .groupBy(col("doc_id"), col("grp"))
      .agg(sum(col("w")).as("score"), count(lit(1)).as("plen"),
        array_join(expr(
          "transform(sort_array(collect_list(struct(pos, token))), s -> s.token)"),
          " ").as("phrase"))
      // rank only phrases within the candidate length cap — word
      // stats above still cover the FULL phrase inventory (canonical
      // RAKE scoring); without the cap a delimiter-free document's
      // whole text outranks every real keyphrase
      .filter(col("plen") <= RakeMaxPhraseLen)
      .groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occ"), max(col("score")).as("score_ticks"))
      .orderBy(col("score_ticks").desc, col("phrase"))
      .limit(RakeTopK)
  }

  /** Merge rounds learned by [[t18BpeMerges]]. Fixed, not
    * convergence-tested: the output is a pure function of the corpus
    * and the oracle unrolls exactly this many rounds.
    */
  private[graft] val BpeRounds = 6

  /** t18: BPE merge induction — tokenizer TRAINING, the step upstream
    * of t03's "BPE-ish regex" tokenization: learn the first
    * [[BpeRounds]] byte-pair-encoding merges from the corpus's own
    * frequency-weighted word vocabulary (Sennrich et al. 2016, the
    * algorithm behind GPT/Llama tokenizers). Round t: count adjacent
    * symbol pairs across the vocabulary weighted by word frequency,
    * merge the most frequent pair (ties: lexicographically smallest
    * (left, right)) everywhere it occurs, repeat on the re-segmented
    * vocabulary. Output: one row per round — (round, left_sym,
    * right_sym, merged_sym, pair_cnt, symbols_after), where
    * symbols_after is the frequency-weighted corpus symbol count
    * after that round's merge, so the hash check covers the
    * re-segmentation itself, not just the chosen pairs.
    *
    * Merge-application contract: a word's segmentation is a
    * single-space-joined symbol string with sentinel spaces, and a
    * merge applies by DOUBLING every boundary space, one leftmost
    * resume-after-replacement replace of " l  r " with " lr ", then
    * collapsing the doubles back. The doubled boundary means a
    * match's trailing space never consumes the next occurrence's
    * leading space, so the single pass merges ALL non-overlapping
    * occurrences left to right — exactly the reference trainers'
    * greedy application ("a a a a a" → "aa aa a" in one round), with
    * token-boundary integrity on both sides (an "ab" token can never
    * half-match an "a" pattern). Both engines' `replace` implements
    * the same leftmost resume-after-replacement scan, so
    * re-segmentation is cross-engine identical by construction
    * (greedy contract pinned in TextMultimodalSpec, runs included).
    *
    * Scale shape: the corpus is scanned ONCE (the word-frequency
    * aggregation — one partial-agg'd token shuffle); every round
    * after that touches only the distinct-word vocabulary (~10^7
    * rows at 100 TB, vs 10^11 corpus rows) — the standard BPE-trainer
    * decomposition. Per round: one vocabulary-local pair explode +
    * partial-agg'd pair count, a 1-row TakeOrdered argmax (no global
    * sort, no driver fetch — broadcast back), and a per-row replace.
    * Vocabulary is eagerly ckpt'd per round (flat lineage,
    * the g01 lesson).
    */
  def t18BpeMerges(spark: SparkSession, sfDir: String): DataFrame =
    bpeTrainedOnCorpus(spark, sfDir)._1

  /** The trainer core over an arbitrary (w, freq) word-frequency
    * frame — package-private so the known-merge and run-contract
    * specs can drive it with synthetic vocabularies.
    */
  private[graft] def bpeMerges(wordFreq: DataFrame): DataFrame =
    bpeTrain(wordFreq)._1

  /** The trainer returning BOTH the merge rows and the final
    * re-segmented vocabulary (w, freq, sym) — t21's encoder input.
    */
  private[graft] def bpeTrain(wordFreq: DataFrame): (DataFrame, DataFrame) = {
    var vocab = wordFreq
      .withColumn("sym",
        concat(lit(" "), regexp_replace(col("w"), "(.)", "$1 ")))
      .ckpt(true)
    val rounds = (1 to BpeRounds).map { rnd =>
      val pairs = vocab
        .select(col("freq"), split(trim(col("sym")), " ").as("a"))
        .withColumn("la", slice(col("a"), lit(1), size(col("a")) - 1))
        .withColumn("ra", slice(col("a"), lit(2), size(col("a")) - 1))
        .select(col("freq"), explode(arrays_zip(col("la"), col("ra"))).as("p"))
        .groupBy(col("p.la").as("l"), col("p.ra").as("r"))
        .agg(sum(col("freq")).as("pair_cnt"))
      val best = pairs.orderBy(col("pair_cnt").desc, col("l"), col("r"))
        .limit(1).ckpt(true)
      // LEFT join on true, not crossJoin: when the vocabulary fully
      // merges before the round budget, `best` is EMPTY and a cross
      // join would erase the vocabulary — the encoder (t21) must keep
      // the last segmentation instead; the oracle mirrors with
      // LEFT JOIN ... ON TRUE.
      vocab = vocab
        .join(broadcast(best.select(col("l").as("__l"), col("r").as("__r"))),
          lit(true), "left")
        .withColumn("sym",
          when(col("__l").isNotNull, replace(replace(replace(
            col("sym"), lit(" "), lit("  ")),
            concat(lit(" "), col("__l"), lit("  "), col("__r"), lit(" ")),
            concat(lit(" "), col("__l"), col("__r"), lit(" "))),
            lit("  "), lit(" ")))
          .otherwise(col("sym")))
        .drop("__l", "__r")
        .ckpt(true)
      val after = vocab.agg(
        sum(col("freq") * size(split(trim(col("sym")), " ")))
          .as("symbols_after"))
      best.withColumn("round", lit(rnd).cast("long"))
        .crossJoin(broadcast(after))
        .select(col("round"), col("l").as("left_sym"), col("r").as("right_sym"),
          concat(col("l"), col("r")).as("merged_sym"), col("pair_cnt"),
          col("symbols_after"))
    }
    (rounds.reduce(_ unionByName _).orderBy(col("round")), vocab)
  }

  /** Ticks per bit for [[t19NaiveBayes]]'s quantized log-probs (2²⁰ —
    * the t09 contract).
    */
  private[graft] val NbScale = 1048576.0

  /** t19: multinomial naive Bayes language classification — the
    * reference's mllib/classification surface (reference:
    * /root/reference/mllib/src/main/scala/org/apache/spark/mllib/
    * classification/NaiveBayes.scala:1) on the t09 determinism
    * contract: add-1-smoothed per-(class, token) code lengths
    * quantized to 2²⁰-tick longs — one log2 per (class, DISTINCT
    * token), never per occurrence — plus prior ticks per class; a
    * document's class score is an exact long sum, the prediction the
    * argmin via min(struct(nll, class)) (ties to the
    * lexicographically smallest class, deterministic across
    * partitionings and engines).
    *
    * Trained and scored on the same corpus (resubstitution — the
    * honest framing: this is the model-fit diagnostic and the
    * labeling-quality check, not a held-out accuracy claim; p01's
    * split machinery is the held-out path and p15 reports the
    * resulting confusion surface). On THIS synthetic corpus the text
    * carries little language signal (all langs draw from a shared
    * vocabulary), so accuracy sits at ~0.47 vs the 0.44
    * majority-class baseline — the verified property is the exact
    * model mechanics; the spec plants a separable corpus and
    * requires perfect recovery there.
    *
    * Model completeness: the model covers the FULL (class × corpus
    * vocabulary) cross — an absent (class, token) pair contributes
    * the smoothed floor 1/(T_c + V), so no document scores on
    * missing rows. At 100 TB the model is (V·C) rows — broadcast
    * when it fits, shuffle-join on token otherwise (the t09 regime);
    * everything else is one token scan + partial-agg'd long sums.
    *
    * Output: (doc_id, lang, predicted, nll_ticks, correct).
    */
  /** Memo for the trained NB token model — THREE consumers (t19's
    * batch scoring, p15's evaluation report, the streaming serve
    * path), and the (class, token) count pass behind it is the
    * expensive part. Priors recompute per call — one cheap doc-count
    * aggregation, not worth a second memo.
    */
  private val nbModelMemo = new graft.FrameMemo[org.apache.spark.sql.DataFrame]

  /** Materialize-once BPE trainer result (merge rows, final
    * re-segmented vocabulary) per (session, dir, documents
    * fingerprint) — t18 reads the merges and t21 the vocabulary, and
    * the [[BpeRounds]]-round trainer is the family's most expensive
    * derived computation; re-running it per key in one sweep is the
    * same waste the nb-model memo removed. Both frames come out of
    * ONE compute, so they share a memo entry (and its block set).
    */
  private val bpeMemo =
    new graft.FrameMemo[(org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)]

  /** Persistent-RDD ids backing the live text memos — the
    * [[graft.FrameMemo]] bench-harness cleanup contract.
    */
  private[graft] def memoRetainedIds: Set[Int] =
    nbModelMemo.retainedIds ++ bpeMemo.retainedIds ++ htfMemo.retainedIds

  /** Drop the text memos and unpersist their blocks. */
  private[graft] def clearMemos(): Unit = {
    nbModelMemo.clear(); bpeMemo.clear(); htfMemo.clear()
  }

  /** The memoized trainer over the corpus word-frequency frame —
    * the shared entry behind t18/t21.
    */
  private[graft] def bpeTrainedOnCorpus(
      spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    registerAll(spark)
    bpeMemo.getOrCompute(spark, sfDir,
      Tables.fingerprint(spark, sfDir, "documents") + "|bpe") {
      val tok = Tables.documents(spark, sfDir)
        .select(explode(call_function("word_grams", lower(col("text")), lit(1)))
          .as("w"))
      bpeTrain(tok.groupBy(col("w")).agg(count(lit(1)).as("freq")))
    }
  }

  /** The trained NB model frames — (cls, token, q) over the FULL
    * class × vocabulary cross (memoized), and (cls, prior_q) —
    * shared by t19's batch scoring, p15, and the streaming serve
    * path (StreamOps.nbScoreStream): train batch, score stream, one
    * model.
    */
  private[graft] def nbModelFrames(
      spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    registerAll(spark)
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("lang"))
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(call_function("word_grams", lower(col("text")), lit(1)))
          .as("token"))
    val model = nbModelMemo.getOrCompute(spark, sfDir,
      graft.Tables.fingerprint(spark, sfDir, "documents") + "|nbmodel") {
      // per-(class, token) counts and per-class token totals
      val ct = toks.join(docs, "doc_id")
        .groupBy(col("lang").as("cls"), col("token"))
        .agg(count(lit(1)).as("n_ct"))
        .ckpt(true)
      val totals = ct.groupBy(col("cls")).agg(sum(col("n_ct")).as("t_c"))
      val vocab = toks.select(col("token")).distinct()
      val vSize = vocab.agg(count(lit(1)).as("v"))
      // full class x vocabulary cross with the smoothed floor
      vocab.crossJoin(broadcast(totals)).crossJoin(broadcast(vSize))
        .join(ct, Seq("cls", "token"), "left")
        .select(col("cls"), col("token"),
          floor(-log2((coalesce(col("n_ct"), lit(0L)) + lit(1)).cast("double") /
              (col("t_c") + col("v")).cast("double")) *
            lit(NbScale) + lit(0.5)).cast("long").as("q"))
        .ckpt(true)
    }
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val priors = docs.groupBy(col("lang").as("cls"))
      .agg(count(lit(1)).as("n_c"))
      .crossJoin(broadcast(nDocs))
      .select(col("cls"),
        floor(-log2(col("n_c").cast("double") / col("n_docs").cast("double")) *
          lit(NbScale) + lit(0.5)).cast("long").as("prior_q"))
      .ckpt(true)
    (model, priors)
  }

  def t19NaiveBayes(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark)
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("lang"))
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(call_function("word_grams", lower(col("text")), lit(1)))
          .as("token"))
    val (model, priors) = nbModelFrames(spark, sfDir)
    val scored = toks.join(model, "token")
      .groupBy(col("doc_id"), col("cls"))
      .agg(sum(col("q")).as("sq"))
      .join(priors, "cls")
      .select(col("doc_id"), col("cls"), (col("sq") + col("prior_q")).as("nll"))
    val best = scored.groupBy(col("doc_id"))
      .agg(min(struct(col("nll"), col("cls"))).as("b"))
      .select(col("doc_id"), col("b.cls").as("predicted"),
        col("b.nll").as("nll_ticks"))
    docs.join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("predicted"), lit("none")).as("predicted"),
        coalesce(col("nll_ticks"), lit(0L)).as("nll_ticks"),
        (col("lang") === coalesce(col("predicted"), lit("none"))).as("correct"))
      .orderBy(col("doc_id"))
  }

  /** Bins per feature for [[t20DecisionStump]]'s split search — the
    * mllib maxBins idea: candidate thresholds are bin edges, so the
    * search cost is (features × bins), independent of corpus size.
    */
  private[graft] val StumpBins = 16

  /** t20: decision-stump induction — the reference's mllib/tree
    * surface (reference: /root/reference/mllib/src/main/scala/org/
    * apache/spark/mllib/tree/DecisionTree.scala:1) reduced to its
    * load-bearing core, the BINNED split search: per integer feature
    * (n_chars; token count; distinct-token-ratio ticks), fixed-width
    * [[StumpBins]] bins over the data-derived [min, max] (1-row
    * broadcast, q48 pattern), per-(feature, bin) label counts from
    * ONE partial-agg'd pass, cumulative window over the ≤16-row bin
    * frame, and the weighted-Gini argmin via the deterministic
    * (cost, feature, bin) order. Gini per side quantizes to 2²⁰
    * ticks (single double division of exact integer squares — pos ≤
    * corpus ≤ 2²⁶ keeps pos² exact; beyond that the documented
    * retune casts before squaring), and the weighted cost is an
    * exact long sum.
    *
    * Label: lang = 'en' (the corpus's majority class) — like t19,
    * the verified property is exact mechanics; the spec plants a
    * separable feature and requires the stump to find it.
    *
    * Output: ONE row — (feature, split_bin, f_min, f_max,
    * cost_ticks, n_left, pos_left, predict_left, n_right, pos_right,
    * predict_right); a bin b splits as `bin ≤ b goes left`, so the
    * raw threshold is reconstructible from (f_min, f_max, bin).
    *
    * Scale shape: one stacked scan (3 rows per doc), two tiny
    * broadcast joins, one partial-agg'd (feature, bin) count, and
    * everything after is a 48-row frame. The mllib deep-tree
    * extension repeats this per node on filtered partitions — the
    * same primitive, now executable as [[t22DecisionTree]].
    */
  /** The (y, v1, v2, v3) feature frame behind t20/t22 — label plus
    * the three integer features (n_chars, token count,
    * distinct-token-ratio ticks).
    */
  private[graft] def docFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark)
    Tables.documents(spark, sfDir).select(col("doc_id"),
      when(col("lang") === "en", lit(1L)).otherwise(lit(0L)).as("y"),
      col("n_chars").cast("long").as("v1"),
      call_function("word_grams", lower(col("text")), lit(1)).as("toks"))
      .select(col("doc_id"), col("y"), col("v1"),
        size(col("toks")).cast("long").as("v2"),
        when(size(col("toks")) > 0,
          expr("(size(array_distinct(toks)) * 1048576L) div size(toks)"))
          .otherwise(lit(0L)).as("v3"))
  }

  /** The binned split-search primitive over a (y, v1, v2, v3) node
    * frame — ONE best-split row (empty when no feature has ≥ 2
    * populated bins, i.e. the node is unsplittable). t20 is this on
    * the full corpus; t22 re-runs it per child partition — the mllib
    * per-node recursion made executable.
    */
  private[graft] def stumpCore(docs: DataFrame): DataFrame =
    stumpCoreW(docs.withColumn("w", lit(1L)))

  /** The WEIGHTED split-search primitive over a (y, w, v1, v2, v3)
    * frame — stumpCore with per-row long weights (bin mass = Σw,
    * positives = Σ w·y); [[stumpCore]] is the w ≡ 1 instance, and
    * the boosted ensemble (t26) re-runs this with its re-weighted
    * rows each round. Weighted Gini stays deterministic cross-engine:
    * the tick numerators are exact longs and both engines run the
    * identical long→double conversion and division. (With weights
    * capped at 2¹² and ~10¹¹ rows the pos² term would overflow
    * int64 — the documented retune coarsens the weight grid, the
    * f02 convention.)
    */
  private[graft] def stumpCoreW(docs: DataFrame): DataFrame = {
    val lf = docs.select(col("y"), col("w"),
      expr("stack(3, 'n_chars', v1, 'n_tokens', v2, 'distinct_ratio', v3)")
        .as(Seq("feature", "x")))
    val stats = lf.groupBy(col("feature"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val binned = lf.join(broadcast(stats), "feature")
      .withColumn("bin", expr(s"((x - mn) * $StumpBins) div (mx - mn + 1)"))
    val perBin = binned.groupBy(col("feature"), col("bin"))
      .agg(sum(col("w")).as("n"), sum(col("w") * col("y")).as("pos"))
      .ckpt(true)
    val tot = perBin.groupBy(col("feature"))
      .agg(sum(col("n")).as("nn"), sum(col("pos")).as("npos"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("feature")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def giniTicks(pos: Column, n: Column): Column =
      floor((lit(1.0) - (pos * pos + (n - pos) * (n - pos)) /
          (n.cast("double") * n.cast("double"))) * lit(NbScale) + lit(0.5))
        .cast("long")
    val cand = perBin
      .withColumn("nl", sum(col("n")).over(w))
      .withColumn("posl", sum(col("pos")).over(w))
      .join(tot, "feature")
      .filter(col("nl") < col("nn"))
      .withColumn("cost_ticks",
        col("nl") * giniTicks(col("posl"), col("nl")) +
          (col("nn") - col("nl")) *
          giniTicks(col("npos") - col("posl"), col("nn") - col("nl")))
    val best = cand
      .orderBy(col("cost_ticks"), col("feature"), col("bin")).limit(1)
      .select(col("feature"), col("bin").as("split_bin"), col("cost_ticks"),
        col("nl").as("n_left"), col("posl").as("pos_left"),
        (col("posl") * 2 >= col("nl")).as("predict_left"),
        (col("nn") - col("nl")).as("n_right"),
        (col("npos") - col("posl")).as("pos_right"),
        ((col("npos") - col("posl")) * 2 >= col("nn") - col("nl"))
          .as("predict_right"))
    best.join(broadcast(stats), "feature")
      .select(col("feature"), col("split_bin"),
        col("mn").as("f_min"), col("mx").as("f_max"), col("cost_ticks"),
        col("n_left"), col("pos_left"), col("predict_left"),
        col("n_right"), col("pos_right"), col("predict_right"))
  }

  def t20DecisionStump(spark: SparkSession, sfDir: String): DataFrame =
    stumpCore(docFeatures(spark, sfDir))

  /** t22: depth-2 decision tree — t20's binned primitive recursed
    * once per child, the mllib per-node loop made executable
    * (reference: /root/reference/mllib/src/main/scala/org/apache/
    * spark/mllib/tree/DecisionTree.scala:1 runs exactly this
    * findBestSplits pass level by level over node-filtered rows):
    * the root split partitions the corpus by the root feature's bin
    * (same data-derived [min, max] grid), and each child re-runs the
    * SAME bounded (feature, bin) search with CHILD-LOCAL bin ranges
    * — candidate count stays (features × bins) per node, independent
    * of corpus size, and each level is one partial-agg'd pass over
    * the node's rows. An unsplittable child (every feature a single
    * populated bin) emits no row — the leaf case. Output: t20's
    * columns prefixed by node ∈ {root, left, right}, ordered by
    * node.
    */
  def t22DecisionTree(spark: SparkSession, sfDir: String): DataFrame = {
    val f = docFeatures(spark, sfDir).ckpt(true)
    val root = stumpCore(f).ckpt(true)
    val withBin = f.crossJoin(broadcast(root.select(
        col("feature").as("rf"), col("split_bin").as("rb"),
        col("f_min").as("rmn"), col("f_max").as("rmx"))))
      .withColumn("xr",
        when(col("rf") === "n_chars", col("v1"))
          .when(col("rf") === "n_tokens", col("v2"))
          .otherwise(col("v3")))
      .withColumn("rbin",
        expr(s"((xr - rmn) * $StumpBins) div (rmx - rmn + 1)"))
    val kids = Seq(
      "left" -> withBin.filter(col("rbin") <= col("rb")),
      "right" -> withBin.filter(col("rbin") > col("rb")))
    val out = root.select(lit("root").as("node"), col("*")) +:
      kids.map { case (name, part) =>
        stumpCore(part.select(col("doc_id"), col("y"),
            col("v1"), col("v2"), col("v3")))
          .select(lit(name).as("node"), col("*"))
      }
    out.reduce(_ unionByName _).orderBy(col("node"))
  }

  /** Split levels of [[t33DeepTree]] — the depth-D generalization;
    * [[t22DecisionTree]] is the D = 2 instance of the same per-level
    * recursion (kept as its own key for the named root/left/right
    * report shape).
    */
  private[graft] val DeepTreeDepth = 3

  /** The NODE-KEYED split-search primitive over a (node, y, v1, v2,
    * v3) frame — [[stumpCore]] with the tree-node id carried through
    * EVERY group key, so one bounded pass finds the best split of
    * every live node simultaneously: the reference's level-by-level
    * findBestSplits made literal (reference: /root/reference/mllib/
    * src/main/scala/org/apache/spark/mllib/tree/DecisionTree.scala:1
    * trains one level per pass over node-assigned rows, histogram
    * keyed by (node, feature, bin) — exactly this plan). Every
    * window group stays bounded: the cumulative runs over
    * ≤ [[StumpBins]] rows per (node, feature), the best-per-node
    * row_number over ≤ 3·StumpBins candidate rows per node — never
    * corpus-sized. Returns one row per SPLITTABLE node; an
    * unsplittable node (every feature one populated bin) emits
    * nothing — the leaf case.
    */
  private[graft] def nodeStumpCore(docs: DataFrame): DataFrame = {
    val lf = docs.select(col("node"), col("y"),
      expr("stack(3, 'n_chars', v1, 'n_tokens', v2, 'distinct_ratio', v3)")
        .as(Seq("feature", "x")))
    // ≤ 2^D·3 rows; read by the binning pass AND the final join
    val stats = lf.groupBy(col("node"), col("feature"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .ckpt(true)
    val binned = lf.join(broadcast(stats), Seq("node", "feature"))
      .withColumn("bin", expr(s"((x - mn) * $StumpBins) div (mx - mn + 1)"))
    val perBin = binned.groupBy(col("node"), col("feature"), col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      .ckpt(true)
    val tot = perBin.groupBy(col("node"), col("feature"))
      .agg(sum(col("n")).as("nn"), sum(col("pos")).as("npos"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("node"), col("feature")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def giniTicks(pos: Column, n: Column): Column =
      floor((lit(1.0) - (pos * pos + (n - pos) * (n - pos)) /
          (n.cast("double") * n.cast("double"))) * lit(NbScale) + lit(0.5))
        .cast("long")
    val cand = perBin
      .withColumn("nl", sum(col("n")).over(w))
      .withColumn("posl", sum(col("pos")).over(w))
      .join(tot, Seq("node", "feature"))
      .filter(col("nl") < col("nn"))
      .withColumn("cost_ticks",
        col("nl") * giniTicks(col("posl"), col("nl")) +
          (col("nn") - col("nl")) *
          giniTicks(col("npos") - col("posl"), col("nn") - col("nl")))
    val wBest = Window.partitionBy(col("node"))
      .orderBy(col("cost_ticks"), col("feature"), col("bin"))
    val best = cand.withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("node"), col("feature"), col("bin").as("split_bin"),
        col("cost_ticks"),
        col("nl").as("n_left"), col("posl").as("pos_left"),
        (col("posl") * 2 >= col("nl")).as("predict_left"),
        (col("nn") - col("nl")).as("n_right"),
        (col("npos") - col("posl")).as("pos_right"),
        ((col("npos") - col("posl")) * 2 >= col("nn") - col("nl"))
          .as("predict_right"))
    best.join(broadcast(stats), Seq("node", "feature"))
      .select(col("node"), col("feature"), col("split_bin"),
        col("mn").as("f_min"), col("mx").as("f_max"), col("cost_ticks"),
        col("n_left"), col("pos_left"), col("predict_left"),
        col("n_right"), col("pos_right"), col("predict_right"))
  }

  /** The depth-D level loop over any (y, v1, v2, v3) feature frame —
    * heap node ids (root 1, children 2n / 2n+1), one
    * [[nodeStumpCore]] pass per level, split application a broadcast
    * join against the ≤ 2^level-row split frame with CHILD-LOCAL bin
    * grids recomputed next level. Rows of unsplittable (leaf) nodes
    * drop out of the assignment frame (inner join), so deeper levels
    * never re-split a settled leaf. Package-private for the planted
    * parity spec; [[t33DeepTree]] is this over [[docFeatures]].
    */
  private[graft] def deepTreeFrom(features: DataFrame, depth: Int): DataFrame = {
    var asg = features.select(col("y"), col("v1"), col("v2"), col("v3"))
      .withColumn("node", lit(1L)).ckpt(true)
    val levels = (1 to depth).map { l =>
      val best = nodeStumpCore(asg).ckpt(true)
      if (l < depth) {
        val sel = best.select(col("node"), col("feature").as("rf"),
          col("split_bin").as("rb"), col("f_min").as("rmn"),
          col("f_max").as("rmx"))
        asg = asg.join(broadcast(sel), Seq("node"))
          .withColumn("xr", when(col("rf") === "n_chars", col("v1"))
            .when(col("rf") === "n_tokens", col("v2")).otherwise(col("v3")))
          .withColumn("cbin",
            expr(s"((xr - rmn) * $StumpBins) div (rmx - rmn + 1)"))
          .select(col("y"), col("v1"), col("v2"), col("v3"),
            (col("node") * 2 + when(col("cbin") <= col("rb"), lit(0L))
              .otherwise(lit(1L))).as("node"))
          .ckpt(true)
      }
      best
    }
    levels.reduce(_ unionByName _).orderBy(col("node"))
  }

  /** t33: depth-[[DeepTreeDepth]] decision tree over the document
    * quality features — the reference's arbitrary-depth
    * level-by-level training (reference: /root/reference/mllib/src/
    * main/scala/org/apache/spark/mllib/tree/DecisionTree.scala:1)
    * with the (node × feature × bin) histogram as the only
    * data-plane pass per level. Cost: depth × one corpus scan, model
    * state ≤ 2^depth broadcast rows, candidate sets independent of
    * corpus size (the t22 contract, now parameterized). Output: one
    * row per splittable node in heap order — (node, feature,
    * split_bin, f_min, f_max, cost_ticks, n/pos/predict per side).
    */
  def t33DeepTree(spark: SparkSession, sfDir: String): DataFrame =
    deepTreeFrom(docFeatures(spark, sfDir), DeepTreeDepth)

  /** Trees in [[t25RandomForest]]. */
  private[graft] val RfTrees = 6

  /** Boosting rounds in [[t26BoostedStumps]]. */
  private[graft] val BoostRounds = 3

  /** t26: boosted stumps — the reference's gradient-boosting surface
    * (reference: /root/reference/mllib/src/main/scala/org/apache/
    * spark/mllib/tree/GradientBoostedTrees.scala:1) as discrete
    * AdaBoost over the weighted split primitive, on an ALL-INTEGER
    * weight contract so the DuckDB twin replicates every round
    * bit-exactly:
    *
    *  - weights start at the 2¹² grid; each round's stump is
    *    [[stumpCoreW]] over the weighted rows;
    *  - err/total are exact long sums E, W; the round's vote weight
    *    is alpha_ticks = ⌊log2((W−E)/E)·2²⁰ + 0.5⌋ — ONE log2 per
    *    round over exact integer operands (the t09 contract), with
    *    max(·,1) guards shared by both engines so a perfect stump
    *    (E = 0) stays finite;
    *  - the multiplicative update w·(W−E) for misclassified vs w·E
    *    for correct keeps relative weights exactly AdaBoost's
    *    (W−E)/E ratio in integers, then max-norm renormalizes back
    *    to the 2¹² grid ((w·4096) div max, floored at 1) — the
    *    truncating div both engines share, the s17 normalization
    *    posture.
    *
    * Output: one MODEL row per round — t20's stump columns plus
    * (err_w, total_w, alpha_ticks); ensemble prediction is
    * sign-weighted voting over these rows (the planted spec
    * exercises it: a column no single stump can classify is
    * separated by 2 boosted rounds).
    *
    * Scale shape: per round ONE weighted feature scan (the bounded
    * (feature, bin) histogram), one classify pass against a 1-row
    * broadcast stump, two 1-row aggregates, one weight map — all
    * partial-agg'd, nothing grows with rounds.
    */
  def t26BoostedStumps(spark: SparkSession, sfDir: String): DataFrame = {
    val f = docFeatures(spark, sfDir).ckpt(true)
    var wts = f.select(col("doc_id"), lit(4096L).as("w")).ckpt(true)
    val rounds = (1 to BoostRounds).map { r =>
      val fw = f.join(wts, "doc_id")
      val best = stumpCoreW(fw).ckpt(true)
      val cls = fw.crossJoin(broadcast(best.select(
          col("feature").as("rf"), col("split_bin").as("rb"),
          col("f_min").as("rmn"), col("f_max").as("rmx"),
          col("predict_left").as("pl"), col("predict_right").as("pr"))))
        .withColumn("pred",
          when(expr(s"(((CASE WHEN rf = 'n_chars' THEN v1 WHEN rf = 'n_tokens' THEN v2 ELSE v3 END) - rmn) * $StumpBins) div (rmx - rmn + 1)") <= col("rb"),
            col("pl")).otherwise(col("pr")))
        .withColumn("correct", col("pred") === (col("y") === 1))
        .ckpt(true)
      val er = cls.agg(sum(col("w")).as("tw"),
          sum(when(!col("correct"), col("w")).otherwise(lit(0L))).as("ewr"))
        .select(col("tw"), col("ewr"),
          greatest(col("ewr"), lit(1L)).as("e1"),
          greatest(col("tw") - col("ewr"), lit(1L)).as("g1"))
        .withColumn("alpha_ticks", expr(
          "CAST(floor(log2(CAST(g1 AS DOUBLE) / CAST(e1 AS DOUBLE)) * 1048576.0D + 0.5D) AS BIGINT)"))
        .ckpt(true)
      val raw = cls.crossJoin(broadcast(er.select(col("e1"), col("g1"))))
        .select(col("doc_id"),
          (col("w") * when(col("correct"), col("e1")).otherwise(col("g1")))
            .as("wr"))
      val wmax = raw.agg(greatest(max(col("wr")), lit(1L)).as("wm"))
      wts = raw.crossJoin(broadcast(wmax))
        .select(col("doc_id"),
          greatest(expr("(wr * 4096) div wm"), lit(1L)).as("w"))
        .ckpt(true)
      best.crossJoin(broadcast(er.select(col("ewr").as("err_w"),
          col("tw").as("total_w"), col("alpha_ticks"))))
        .select(lit(r.toLong).as("round"), col("*"))
    }
    rounds.reduce(_ unionByName _).orderBy(col("round"))
  }

  /** t25: random forest of bagged stumps — the reference's ensemble
    * surface (reference: /root/reference/mllib/src/main/scala/org/
    * apache/spark/mllib/tree/RandomForest.scala:1) on the repo's
    * determinism contract: each tree trains on a DETERMINISTIC
    * bootstrap (row kept iff md5₁₆("rf:<tree>:<doc>") mod 4 < 3 —
    * the p03/d20 draw, so the DuckDB twin rebuilds every subsample
    * exactly) with per-tree feature dropout (tree t zeroes feature
    * t mod 3; a constant feature has one populated bin and provably
    * never produces a candidate — mllib's featureSubsetStrategy made
    * deterministic). Each tree is one [[stumpCore]] pass; a tree
    * whose surviving features are all constant emits no row (the
    * leaf case, same contract as t22). Output: the forest MODEL —
    * t20's columns per tree, fully hash-verified; majority-vote
    * prediction is a per-row map over these rows (the planted spec
    * exercises it).
    *
    * Scale shape: [[RfTrees]] independent bounded split searches over
    * ~3/4 subsamples of ONE shared feature scan — embarrassingly
    * parallel, candidate count per tree still (features × bins).
    */
  def t25RandomForest(spark: SparkSession, sfDir: String): DataFrame = {
    val f = docFeatures(spark, sfDir).ckpt(true)
    val trees = (0 until RfTrees).map { t =>
      val keep = (k: Int, c: Column) => if (t % 3 == k) lit(0L) else c
      val sampled = f.filter(expr(
          s"CAST(conv(substring(md5(concat('rf:$t:', CAST(doc_id AS STRING))), 1, 4), 16, 10) AS BIGINT) % 4 < 3"))
        .select(col("doc_id"), col("y"),
          keep(0, col("v1")).as("v1"), keep(1, col("v2")).as("v2"),
          keep(2, col("v3")).as("v3"))
      stumpCore(sampled).select(lit(t.toLong).as("tree"), col("*"))
    }
    trees.reduce(_ unionByName _).orderBy(col("tree"))
  }

  /** The (yr, v1, v3, v4) regression frame behind [[t34RfRegression]]:
    * target yr = token count (the t31 target), features n_chars,
    * distinct-ratio ticks, distinct-token count.
    */
  private[graft] def regForestFeatures(
      spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark)
    Tables.documents(spark, sfDir).select(col("doc_id"),
        col("n_chars").cast("long").as("v1"),
        call_function("word_grams", lower(col("text")), lit(1)).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("yr"),
        col("v1"),
        when(size(col("toks")) > 0,
          expr("(size(array_distinct(toks)) * 1048576L) div size(toks)"))
          .otherwise(lit(0L)).as("v3"),
        size(array_distinct(col("toks"))).cast("long").as("v4"))
  }

  /** Variance-reduction split search over an (r, v1, v3, v4) frame —
    * the REGRESSION stump core: mean leaves instead of majority
    * votes, and the split maximizes the SSE complement
    * S_L²/n_L + S_R²/n_R (minimizing SSE_L + SSE_R is equivalent
    * since ΣS² is split-invariant — so the per-candidate score needs
    * only the CUMULATIVE (n, Σr), never Σr²). Same bounded machinery
    * as [[stumpCore]]: per-frame [min, max] bin grids (so bagged
    * trees derive grids from their own sample), one partial-agg'd
    * (feature, bin) pass, the rest on a ≤ 3×[[StumpBins]]-row frame.
    * gain_ticks = floor(S_L²/n_L + S_R²/n_R + 0.5) — one fixed
    * double tree over exact longs (sums exact as doubles to 2⁵³,
    * i.e. Σ|r| < 9·10¹⁵; the documented retune coarsens the target
    * grid); leaf means report as exact (S·2¹⁰) div n sub-ticks.
    * Argmax by the deterministic (gain desc, feature, bin) order.
    * ONE best-split row; empty when no feature has ≥ 2 populated
    * bins. Package-private for the planted spec and the forest.
    */
  private[graft] def regStumpCore(rows: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lf = rows.select(col("r"),
      expr("stack(3, 'n_chars', v1, 'distinct_ratio', v3, 'n_distinct', v4)")
        .as(Seq("feature", "x")))
    val stats = lf.groupBy(col("feature"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .ckpt(true)
    val perBin = lf.join(broadcast(stats), "feature")
      .withColumn("bin", expr(s"((x - mn) * $StumpBins) div (mx - mn + 1)"))
      .groupBy(col("feature"), col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("r")).as("s"))
      .ckpt(true)
    val tot = perBin.groupBy(col("feature"))
      .agg(sum(col("n")).as("nn"), sum(col("s")).as("ss"))
    val cumw = Window.partitionBy(col("feature")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cand = perBin
      .withColumn("nl", sum(col("n")).over(cumw))
      .withColumn("sl", sum(col("s")).over(cumw))
      .join(tot, "feature").filter(col("nl") < col("nn"))
      .withColumn("gain_ticks",
        floor(col("sl").cast("double") * col("sl") / col("nl")
          + (col("ss") - col("sl")).cast("double") * (col("ss") - col("sl"))
            / (col("nn") - col("nl")) + lit(0.5)).cast("long"))
    cand.orderBy(col("gain_ticks").desc, col("feature"), col("bin")).limit(1)
      .join(broadcast(stats), "feature")
      .select(col("feature"), col("bin").as("split_bin"),
        col("mn").as("f_min"), col("mx").as("f_max"), col("gain_ticks"),
        col("nl").as("n_left"),
        expr("(sl * 1024) div nl").as("mean_left_sticks"),
        (col("nn") - col("nl")).as("n_right"),
        expr("((ss - sl) * 1024) div (nn - nl)").as("mean_right_sticks"))
  }

  /** t34: random-forest REGRESSION — the last reference tree-family
    * member without a counterpart (reference:
    * /root/reference/mllib/src/main/scala/org/apache/spark/ml/
    * regression/RandomForestRegressor.scala:1; the classification
    * forest is t25, the boosted regression ensemble t31, and this is
    * t25's bagging + feature-masking applied to [[regStumpCore]]'s
    * variance splits): [[RfTrees]] trees, each on a deterministic
    * md5 3/4 subsample with one feature masked (t mod 3 — the
    * per-tree feature-subspace convention), each reporting its
    * best variance split and mean leaves. The ensemble prediction is
    * the mean of member leaf means — left to the consumer exactly as
    * t25 leaves the vote, so the model rows ARE the output.
    *
    * Scale shape: [[RfTrees]] independent bounded split searches over
    * ~3/4 subsamples of ONE shared feature scan — embarrassingly
    * parallel, candidate count per tree still (features × bins).
    */
  def t34RfRegression(spark: SparkSession, sfDir: String): DataFrame = {
    val f = regForestFeatures(spark, sfDir).ckpt(true)
    val trees = (0 until RfTrees).map { t =>
      val keep = (k: Int, c: Column) => if (t % 3 == k) lit(0L) else c
      val sampled = f.filter(expr(
          s"CAST(conv(substring(md5(concat('rfr:$t:', CAST(doc_id AS STRING))), 1, 4), 16, 10) AS BIGINT) % 4 < 3"))
        .select(col("doc_id"), col("yr").as("r"),
          keep(0, col("v1")).as("v1"), keep(1, col("v3")).as("v3"),
          keep(2, col("v4")).as("v4"))
      regStumpCore(sampled).select(lit(t.toLong).as("tree"), col("*"))
    }
    trees.reduce(_ unionByName _).orderBy(col("tree"))
  }

  /** The DuckDB twin of [[t20DecisionStump]]: 3-way UNION ALL for the
    * stacked feature frame, the same binning/Gini-tick/argmin chain.
    */
  private[graft] def stumpOracleSql: String =
    """WITH d AS (
      |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
      |    CAST(n_chars AS BIGINT) AS v1,
      |    CAST(len(list_filter(regexp_split_to_array(lower(text), '[ \n\t\r]+'),
      |                         t -> t <> '')) AS BIGINT) AS v2,
      |    list_filter(regexp_split_to_array(lower(text), '[ \n\t\r]+'),
      |                t -> t <> '') AS tk
      |  FROM documents),
      |d2 AS (
      |  SELECT y, v1, v2,
      |    CASE WHEN v2 > 0
      |      THEN (CAST(len(list_distinct(tk)) AS BIGINT) * 1048576) // v2
      |      ELSE 0 END AS v3
      |  FROM d),
      |lf AS (
      |  SELECT y, 'n_chars' AS feature, v1 AS x FROM d2
      |  UNION ALL SELECT y, 'n_tokens', v2 FROM d2
      |  UNION ALL SELECT y, 'distinct_ratio', v3 FROM d2),
      |st AS (SELECT feature, min(x) AS mn, max(x) AS mx FROM lf GROUP BY 1),
      |bn AS (
      |  SELECT lf.y, lf.feature,
      |    ((lf.x - st.mn) * 16) // (st.mx - st.mn + 1) AS bin
      |  FROM lf JOIN st ON lf.feature = st.feature),
      |pb AS (
      |  SELECT feature, bin, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(y) AS BIGINT) AS pos
      |  FROM bn GROUP BY 1, 2),
      |tt AS (SELECT feature, CAST(sum(n) AS BIGINT) AS nn,
      |         CAST(sum(pos) AS BIGINT) AS npos FROM pb GROUP BY 1),
      |cu AS (
      |  SELECT feature, bin,
      |    CAST(sum(n) OVER (PARTITION BY feature ORDER BY bin) AS BIGINT) AS nl,
      |    CAST(sum(pos) OVER (PARTITION BY feature ORDER BY bin) AS BIGINT) AS posl
      |  FROM pb),
      |ca AS (
      |  SELECT cu.feature, cu.bin, cu.nl, cu.posl, tt.nn, tt.npos,
      |    cu.nl * CAST(floor((1.0 - (cu.posl * cu.posl
      |                  + (cu.nl - cu.posl) * (cu.nl - cu.posl))
      |                 / (CAST(cu.nl AS DOUBLE) * CAST(cu.nl AS DOUBLE)))
      |               * 1048576.0 + 0.5) AS BIGINT)
      |    + (tt.nn - cu.nl) * CAST(floor((1.0
      |        - ((tt.npos - cu.posl) * (tt.npos - cu.posl)
      |           + ((tt.nn - cu.nl) - (tt.npos - cu.posl))
      |             * ((tt.nn - cu.nl) - (tt.npos - cu.posl)))
      |          / (CAST(tt.nn - cu.nl AS DOUBLE) * CAST(tt.nn - cu.nl AS DOUBLE)))
      |        * 1048576.0 + 0.5) AS BIGINT) AS cost_ticks
      |  FROM cu JOIN tt ON cu.feature = tt.feature
      |  WHERE cu.nl < tt.nn),
      |b AS (SELECT * FROM ca ORDER BY cost_ticks, feature, bin LIMIT 1)
      |SELECT b.feature, b.bin AS split_bin, st.mn AS f_min, st.mx AS f_max,
      |  b.cost_ticks, b.nl AS n_left, b.posl AS pos_left,
      |  b.posl * 2 >= b.nl AS predict_left,
      |  b.nn - b.nl AS n_right, b.npos - b.posl AS pos_right,
      |  (b.npos - b.posl) * 2 >= b.nn - b.nl AS predict_right
      |FROM b JOIN st ON b.feature = st.feature""".stripMargin

  /** One suffixed binned-split-search CTE chain over `src` (a
    * (y, v1, v2, v3) frame) — the SQL twin of [[stumpCore]], reused
    * per tree node by [[treeOracleSql]].
    */
  private def stumpChainCtes(sfx: String, src: String): String =
    s"""lf$sfx AS (
       |  SELECT y, 'n_chars' AS feature, v1 AS x FROM $src
       |  UNION ALL SELECT y, 'n_tokens', v2 FROM $src
       |  UNION ALL SELECT y, 'distinct_ratio', v3 FROM $src),
       |st$sfx AS MATERIALIZED (
       |  SELECT feature, min(x) AS mn, max(x) AS mx FROM lf$sfx GROUP BY 1),
       |bn$sfx AS (
       |  SELECT lf.y, lf.feature,
       |    ((lf.x - st.mn) * $StumpBins) // (st.mx - st.mn + 1) AS bin
       |  FROM lf$sfx lf JOIN st$sfx st ON lf.feature = st.feature),
       |pb$sfx AS MATERIALIZED (
       |  SELECT feature, bin, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(y) AS BIGINT) AS pos
       |  FROM bn$sfx GROUP BY 1, 2),
       |tt$sfx AS (SELECT feature, CAST(sum(n) AS BIGINT) AS nn,
       |         CAST(sum(pos) AS BIGINT) AS npos FROM pb$sfx GROUP BY 1),
       |cu$sfx AS (
       |  SELECT feature, bin,
       |    CAST(sum(n) OVER (PARTITION BY feature ORDER BY bin) AS BIGINT) AS nl,
       |    CAST(sum(pos) OVER (PARTITION BY feature ORDER BY bin) AS BIGINT) AS posl
       |  FROM pb$sfx),
       |ca$sfx AS (
       |  SELECT cu.feature, cu.bin, cu.nl, cu.posl, tt.nn, tt.npos,
       |    cu.nl * CAST(floor((1.0 - (cu.posl * cu.posl
       |                  + (cu.nl - cu.posl) * (cu.nl - cu.posl))
       |                 / (CAST(cu.nl AS DOUBLE) * CAST(cu.nl AS DOUBLE)))
       |               * 1048576.0 + 0.5) AS BIGINT)
       |    + (tt.nn - cu.nl) * CAST(floor((1.0
       |        - ((tt.npos - cu.posl) * (tt.npos - cu.posl)
       |           + ((tt.nn - cu.nl) - (tt.npos - cu.posl))
       |             * ((tt.nn - cu.nl) - (tt.npos - cu.posl)))
       |          / (CAST(tt.nn - cu.nl AS DOUBLE) * CAST(tt.nn - cu.nl AS DOUBLE)))
       |        * 1048576.0 + 0.5) AS BIGINT) AS cost_ticks
       |  FROM cu$sfx cu JOIN tt$sfx tt ON cu.feature = tt.feature
       |  WHERE cu.nl < tt.nn),
       |b$sfx AS MATERIALIZED (
       |  SELECT * FROM ca$sfx ORDER BY cost_ticks, feature, bin LIMIT 1)"""
      .stripMargin

  /** One labelled output row from a suffixed chain (`labelSql` is
    * the leading projection, e.g. `'root' AS node` or
    * `CAST(3 AS BIGINT) AS tree`).
    */
  private def stumpLabelledSelect(labelSql: String, sfx: String): String =
    s"""SELECT $labelSql, b.feature, b.bin AS split_bin,
       |  st.mn AS f_min, st.mx AS f_max,
       |  b.cost_ticks, b.nl AS n_left, b.posl AS pos_left,
       |  b.posl * 2 >= b.nl AS predict_left,
       |  b.nn - b.nl AS n_right, b.npos - b.posl AS pos_right,
       |  (b.npos - b.posl) * 2 >= b.nn - b.nl AS predict_right
       |FROM b$sfx b JOIN st$sfx st ON b.feature = st.feature""".stripMargin

  /** The DuckDB twin of [[t22DecisionTree]]: the shared feature
    * frame, the root chain, the two child partitions filtered by the
    * root split, and a re-suffixed chain per child.
    */
  /** Shared (doc_id, y, v1, v2, v3) feature CTEs — the SQL twin of
    * [[docFeatures]], reused by the tree and forest oracles.
    */
  private[graft] def stumpBaseCtes: String =
    """d AS (
      |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
      |    CAST(n_chars AS BIGINT) AS v1,
      |    CAST(len(list_filter(regexp_split_to_array(lower(text), '[ \n\t\r]+'),
      |                         t -> t <> '')) AS BIGINT) AS v2,
      |    list_filter(regexp_split_to_array(lower(text), '[ \n\t\r]+'),
      |                t -> t <> '') AS tk
      |  FROM documents),
      |d2 AS MATERIALIZED (
      |  SELECT doc_id, y, v1, v2,
      |    CASE WHEN v2 > 0
      |      THEN (CAST(len(list_distinct(tk)) AS BIGINT) * 1048576) // v2
      |      ELSE 0 END AS v3
      |  FROM d)""".stripMargin

  private[graft] def treeOracleSql: String =
    s"""WITH $stumpBaseCtes,
       |${stumpChainCtes("0", "d2")},
       |broot AS MATERIALIZED (
       |  SELECT b.feature, b.bin, st.mn, st.mx
       |  FROM b0 b JOIN st0 st ON b.feature = st.feature),
       |dl AS MATERIALIZED (
       |  SELECT d2.y, d2.v1, d2.v2, d2.v3 FROM d2, broot
       |  WHERE ((CASE broot.feature WHEN 'n_chars' THEN d2.v1
       |            WHEN 'n_tokens' THEN d2.v2 ELSE d2.v3 END
       |          - broot.mn) * $StumpBins) // (broot.mx - broot.mn + 1)
       |        <= broot.bin),
       |dr AS MATERIALIZED (
       |  SELECT d2.y, d2.v1, d2.v2, d2.v3 FROM d2, broot
       |  WHERE ((CASE broot.feature WHEN 'n_chars' THEN d2.v1
       |            WHEN 'n_tokens' THEN d2.v2 ELSE d2.v3 END
       |          - broot.mn) * $StumpBins) // (broot.mx - broot.mn + 1)
       |        > broot.bin),
       |${stumpChainCtes("1", "dl")},
       |${stumpChainCtes("2", "dr")}
       |SELECT * FROM (
       |${stumpLabelledSelect("'root' AS node", "0")}
       |UNION ALL
       |${stumpLabelledSelect("'left' AS node", "1")}
       |UNION ALL
       |${stumpLabelledSelect("'right' AS node", "2")}
       |) ORDER BY node""".stripMargin

  /** One NODE-KEYED suffixed split-search chain over `src` (a
    * (node, y, v1, v2, v3) frame) — the SQL twin of
    * [[nodeStumpCore]]: every group key and window partition carries
    * the node id, best-per-node by the same (cost, feature, bin)
    * row_number tie rule.
    */
  private def nodeChainCtes(sfx: String, src: String): String =
    s"""lf$sfx AS (
       |  SELECT node, y, 'n_chars' AS feature, v1 AS x FROM $src
       |  UNION ALL SELECT node, y, 'n_tokens', v2 FROM $src
       |  UNION ALL SELECT node, y, 'distinct_ratio', v3 FROM $src),
       |st$sfx AS MATERIALIZED (
       |  SELECT node, feature, min(x) AS mn, max(x) AS mx
       |  FROM lf$sfx GROUP BY 1, 2),
       |bn$sfx AS (
       |  SELECT lf.node, lf.y, lf.feature,
       |    ((lf.x - st.mn) * $StumpBins) // (st.mx - st.mn + 1) AS bin
       |  FROM lf$sfx lf JOIN st$sfx st
       |    ON lf.node = st.node AND lf.feature = st.feature),
       |pb$sfx AS MATERIALIZED (
       |  SELECT node, feature, bin, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(y) AS BIGINT) AS pos
       |  FROM bn$sfx GROUP BY 1, 2, 3),
       |tt$sfx AS (SELECT node, feature, CAST(sum(n) AS BIGINT) AS nn,
       |         CAST(sum(pos) AS BIGINT) AS npos FROM pb$sfx GROUP BY 1, 2),
       |cu$sfx AS (
       |  SELECT node, feature, bin,
       |    CAST(sum(n) OVER (PARTITION BY node, feature ORDER BY bin)
       |      AS BIGINT) AS nl,
       |    CAST(sum(pos) OVER (PARTITION BY node, feature ORDER BY bin)
       |      AS BIGINT) AS posl
       |  FROM pb$sfx),
       |ca$sfx AS (
       |  SELECT cu.node, cu.feature, cu.bin, cu.nl, cu.posl, tt.nn, tt.npos,
       |    cu.nl * CAST(floor((1.0 - (cu.posl * cu.posl
       |                  + (cu.nl - cu.posl) * (cu.nl - cu.posl))
       |                 / (CAST(cu.nl AS DOUBLE) * CAST(cu.nl AS DOUBLE)))
       |               * 1048576.0 + 0.5) AS BIGINT)
       |    + (tt.nn - cu.nl) * CAST(floor((1.0
       |        - ((tt.npos - cu.posl) * (tt.npos - cu.posl)
       |           + ((tt.nn - cu.nl) - (tt.npos - cu.posl))
       |             * ((tt.nn - cu.nl) - (tt.npos - cu.posl)))
       |          / (CAST(tt.nn - cu.nl AS DOUBLE) * CAST(tt.nn - cu.nl AS DOUBLE)))
       |        * 1048576.0 + 0.5) AS BIGINT) AS cost_ticks
       |  FROM cu$sfx cu JOIN tt$sfx tt
       |    ON cu.node = tt.node AND cu.feature = tt.feature
       |  WHERE cu.nl < tt.nn),
       |b$sfx AS MATERIALIZED (
       |  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY node
       |      ORDER BY cost_ticks, feature, bin) AS rn FROM ca$sfx)
       |  WHERE rn = 1)""".stripMargin

  /** The split-application CTE: next level's (node, y, v1, v2, v3)
    * rows from this level's per-node best splits (leaf nodes drop
    * out — the inner-join posture of [[deepTreeFrom]]).
    */
  private def nodeApplyCte(next: String, src: String, sfx: String): String =
    s"""$next AS MATERIALIZED (
       |  SELECT s.y, s.v1, s.v2, s.v3,
       |    s.node * 2 + CASE WHEN ((CASE b.feature WHEN 'n_chars' THEN s.v1
       |        WHEN 'n_tokens' THEN s.v2 ELSE s.v3 END
       |        - st.mn) * $StumpBins) // (st.mx - st.mn + 1) <= b.bin
       |      THEN 0 ELSE 1 END AS node
       |  FROM $src s JOIN b$sfx b ON b.node = s.node
       |  JOIN st$sfx st ON st.node = s.node AND st.feature = b.feature)"""
      .stripMargin

  /** The DuckDB twin of [[t33DeepTree]]: the shared feature frame
    * seeded at node 1, then per level one node-keyed chain + one
    * split application, unrolled [[DeepTreeDepth]] times.
    */
  private[graft] def deepTreeOracleSql: String = {
    def levelSel(l: Int): String =
      s"""SELECT b.node, b.feature, b.bin AS split_bin, st.mn AS f_min,
         |  st.mx AS f_max, b.cost_ticks, b.nl AS n_left, b.posl AS pos_left,
         |  b.posl * 2 >= b.nl AS predict_left,
         |  b.nn - b.nl AS n_right, b.npos - b.posl AS pos_right,
         |  (b.npos - b.posl) * 2 >= b.nn - b.nl AS predict_right
         |FROM bdt$l b JOIN stdt$l st
         |  ON st.node = b.node AND st.feature = b.feature""".stripMargin
    val lvls = (1 to DeepTreeDepth).map(levelSel).mkString("\nUNION ALL\n")
    val chains = (1 to DeepTreeDepth).map { l =>
      val apply = if (l < DeepTreeDepth)
        ",\n" + nodeApplyCte(s"ndt${l + 1}", s"ndt$l", s"dt$l") else ""
      nodeChainCtes(s"dt$l", s"ndt$l") + apply
    }.mkString(",\n")
    s"""WITH $stumpBaseCtes,
       |ndt1 AS MATERIALIZED (
       |  SELECT y, v1, v2, v3, CAST(1 AS BIGINT) AS node FROM d2),
       |$chains
       |SELECT * FROM (
       |$lvls
       |) ORDER BY node""".stripMargin
  }

  /** The DuckDB twin of [[t25RandomForest]]: the shared feature
    * CTEs, one md5-bootstrap + feature-dropout source per tree, and
    * a re-suffixed split-search chain each.
    */
  private[graft] def forestOracleSql: String = {
    val trees = (0 until RfTrees).map { t =>
      val v = (k: Int) => if (t % 3 == k) "CAST(0 AS BIGINT)" else s"v${k + 1}"
      s"""df$t AS MATERIALIZED (
         |  SELECT doc_id, y, ${v(0)} AS v1, ${v(1)} AS v2, ${v(2)} AS v3
         |  FROM d2
         |  WHERE ('0x' || substr(md5('rf:$t:' || CAST(doc_id AS VARCHAR)), 1, 4))
         |          ::UBIGINT % 4 < 3),
         |${stumpChainCtes(s"f$t", s"df$t")}""".stripMargin
    }
    val union = (0 until RfTrees)
      .map(t => stumpLabelledSelect(s"CAST($t AS BIGINT) AS tree", s"f$t"))
      .mkString("\nUNION ALL\n")
    s"""WITH $stumpBaseCtes,
       |${trees.mkString(",\n")}
       |SELECT * FROM (
       |$union
       |) ORDER BY tree""".stripMargin
  }

  /** t34 oracle: the t25 md5-bagging chains with the REGRESSION
    * split search — cumulative (n, Σr), the same gain double tree,
    * mean sub-tick leaves, one chain per tree.
    */
  private[graft] def regForestOracleSql: String = {
    val base =
      """dr AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS v1,
        |    list_filter(regexp_split_to_array(lower(text), '[ \n\t\r]+'),
        |                t -> t <> '') AS tk
        |  FROM documents),
        |dr2 AS (
        |  SELECT doc_id, CAST(len(tk) AS BIGINT) AS yr, v1,
        |    CASE WHEN len(tk) > 0
        |      THEN (CAST(len(list_distinct(tk)) AS BIGINT) * 1048576) // len(tk)
        |      ELSE 0 END AS v3,
        |    CAST(len(list_distinct(tk)) AS BIGINT) AS v4
        |  FROM dr)""".stripMargin
    def chain(sfx: String, src: String): String =
      s"""lf$sfx AS (
         |  SELECT r, 'n_chars' AS feature, v1 AS x FROM $src
         |  UNION ALL SELECT r, 'distinct_ratio', v3 FROM $src
         |  UNION ALL SELECT r, 'n_distinct', v4 FROM $src),
         |st$sfx AS MATERIALIZED (
         |  SELECT feature, min(x) AS mn, max(x) AS mx FROM lf$sfx GROUP BY 1),
         |pb$sfx AS MATERIALIZED (
         |  SELECT lf.feature,
         |    ((lf.x - st.mn) * $StumpBins) // (st.mx - st.mn + 1) AS bin,
         |    CAST(count(*) AS BIGINT) AS n, CAST(sum(lf.r) AS BIGINT) AS s
         |  FROM lf$sfx lf JOIN st$sfx st ON lf.feature = st.feature
         |  GROUP BY 1, 2),
         |tt$sfx AS (SELECT feature, CAST(sum(n) AS BIGINT) AS nn,
         |  CAST(sum(s) AS BIGINT) AS ss FROM pb$sfx GROUP BY 1),
         |cu$sfx AS (
         |  SELECT feature, bin,
         |    CAST(sum(n) OVER (PARTITION BY feature ORDER BY bin) AS BIGINT) AS nl,
         |    CAST(sum(s) OVER (PARTITION BY feature ORDER BY bin) AS BIGINT) AS sl
         |  FROM pb$sfx),
         |ca$sfx AS (
         |  SELECT cu.feature, cu.bin, cu.nl, cu.sl, tt.nn, tt.ss,
         |    CAST(floor(CAST(cu.sl AS DOUBLE) * cu.sl / cu.nl
         |      + CAST(tt.ss - cu.sl AS DOUBLE) * (tt.ss - cu.sl)
         |        / (tt.nn - cu.nl) + 0.5) AS BIGINT) AS gain_ticks
         |  FROM cu$sfx cu JOIN tt$sfx tt ON cu.feature = tt.feature
         |  WHERE cu.nl < tt.nn),
         |b$sfx AS (SELECT * FROM ca$sfx
         |  ORDER BY gain_ticks DESC, feature, bin LIMIT 1)""".stripMargin
    val trees = (0 until RfTrees).map { t =>
      val v = (k: Int, name: String) =>
        if (t % 3 == k) "CAST(0 AS BIGINT)" else name
      s"""dfr$t AS MATERIALIZED (
         |  SELECT doc_id, yr AS r, ${v(0, "v1")} AS v1, ${v(1, "v3")} AS v3,
         |    ${v(2, "v4")} AS v4
         |  FROM dr2
         |  WHERE ('0x' || substr(md5('rfr:$t:' || CAST(doc_id AS VARCHAR)), 1, 4))
         |          ::UBIGINT % 4 < 3),
         |${chain(s"r$t", s"dfr$t")}""".stripMargin
    }
    val union = (0 until RfTrees).map { t =>
      s"""SELECT CAST($t AS BIGINT) AS tree, b.feature, b.bin AS split_bin,
         |  st.mn AS f_min, st.mx AS f_max, b.gain_ticks,
         |  b.nl AS n_left, (b.sl * 1024) // b.nl AS mean_left_sticks,
         |  b.nn - b.nl AS n_right,
         |  ((b.ss - b.sl) * 1024) // (b.nn - b.nl) AS mean_right_sticks
         |FROM br$t b JOIN str$t st ON b.feature = st.feature""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $base,
       |${trees.mkString(",\n")}
       |SELECT * FROM (
       |$union
       |) ORDER BY tree""".stripMargin
  }

  /** WEIGHTED suffixed split-search chain over `src` (a (y, w, v1,
    * v2, v3) frame) — the SQL twin of [[stumpCoreW]]: bin mass is
    * Σw, positives Σ w·y.
    */
  private def stumpChainCtesW(sfx: String, src: String): String =
    s"""lf$sfx AS (
       |  SELECT y, w, 'n_chars' AS feature, v1 AS x FROM $src
       |  UNION ALL SELECT y, w, 'n_tokens', v2 FROM $src
       |  UNION ALL SELECT y, w, 'distinct_ratio', v3 FROM $src),
       |st$sfx AS MATERIALIZED (
       |  SELECT feature, min(x) AS mn, max(x) AS mx FROM lf$sfx GROUP BY 1),
       |bn$sfx AS (
       |  SELECT lf.y, lf.w, lf.feature,
       |    ((lf.x - st.mn) * $StumpBins) // (st.mx - st.mn + 1) AS bin
       |  FROM lf$sfx lf JOIN st$sfx st ON lf.feature = st.feature),
       |pb$sfx AS MATERIALIZED (
       |  SELECT feature, bin, CAST(sum(w) AS BIGINT) AS n,
       |    CAST(sum(w * y) AS BIGINT) AS pos
       |  FROM bn$sfx GROUP BY 1, 2),
       |tt$sfx AS (SELECT feature, CAST(sum(n) AS BIGINT) AS nn,
       |         CAST(sum(pos) AS BIGINT) AS npos FROM pb$sfx GROUP BY 1),
       |cu$sfx AS (
       |  SELECT feature, bin,
       |    CAST(sum(n) OVER (PARTITION BY feature ORDER BY bin) AS BIGINT) AS nl,
       |    CAST(sum(pos) OVER (PARTITION BY feature ORDER BY bin) AS BIGINT) AS posl
       |  FROM pb$sfx),
       |ca$sfx AS (
       |  SELECT cu.feature, cu.bin, cu.nl, cu.posl, tt.nn, tt.npos,
       |    cu.nl * CAST(floor((1.0 - (cu.posl * cu.posl
       |                  + (cu.nl - cu.posl) * (cu.nl - cu.posl))
       |                 / (CAST(cu.nl AS DOUBLE) * CAST(cu.nl AS DOUBLE)))
       |               * 1048576.0 + 0.5) AS BIGINT)
       |    + (tt.nn - cu.nl) * CAST(floor((1.0
       |        - ((tt.npos - cu.posl) * (tt.npos - cu.posl)
       |           + ((tt.nn - cu.nl) - (tt.npos - cu.posl))
       |             * ((tt.nn - cu.nl) - (tt.npos - cu.posl)))
       |          / (CAST(tt.nn - cu.nl AS DOUBLE) * CAST(tt.nn - cu.nl AS DOUBLE)))
       |        * 1048576.0 + 0.5) AS BIGINT) AS cost_ticks
       |  FROM cu$sfx cu JOIN tt$sfx tt ON cu.feature = tt.feature
       |  WHERE cu.nl < tt.nn),
       |b$sfx AS MATERIALIZED (
       |  SELECT * FROM ca$sfx ORDER BY cost_ticks, feature, bin LIMIT 1)"""
      .stripMargin

  /** The DuckDB twin of [[t26BoostedStumps]]: per round a weighted
    * chain, a 1-row stump summary, the classify pass, exact E/W
    * sums + the alpha tick, and the integer weight update.
    */
  private[graft] def boostOracleSql: String = {
    val rounds = (1 to BoostRounds).map { r =>
      val sfx = s"b$r"
      s"""fw$r AS MATERIALIZED (
         |  SELECT d2.doc_id, d2.y, d2.v1, d2.v2, d2.v3, w$r.w
         |  FROM d2 JOIN w$r ON d2.doc_id = w$r.doc_id),
         |${stumpChainCtesW(sfx, s"fw$r")},
         |bs$r AS MATERIALIZED (
         |  SELECT b.feature, b.bin, st.mn, st.mx,
         |    b.posl * 2 >= b.nl AS pl,
         |    (b.npos - b.posl) * 2 >= b.nn - b.nl AS pr
         |  FROM b$sfx b JOIN st$sfx st ON b.feature = st.feature),
         |cl$r AS MATERIALIZED (
         |  SELECT fw.doc_id, fw.y, fw.w,
         |    (CASE WHEN (((CASE WHEN bb.feature = 'n_chars' THEN fw.v1
         |                WHEN bb.feature = 'n_tokens' THEN fw.v2
         |                ELSE fw.v3 END) - bb.mn) * $StumpBins)
         |              // (bb.mx - bb.mn + 1) <= bb.bin
         |       THEN bb.pl ELSE bb.pr END) = (fw.y = 1) AS correct
         |  FROM fw$r fw CROSS JOIN bs$r bb),
         |er$r AS MATERIALIZED (
         |  SELECT tw, ewr, greatest(ewr, 1) AS e1, greatest(tw - ewr, 1) AS g1,
         |    CAST(floor(log2(CAST(greatest(tw - ewr, 1) AS DOUBLE)
         |                    / CAST(greatest(ewr, 1) AS DOUBLE))
         |               * 1048576.0 + 0.5) AS BIGINT) AS alpha_ticks
         |  FROM (SELECT CAST(sum(w) AS BIGINT) AS tw,
         |          CAST(coalesce(sum(CASE WHEN NOT correct THEN w ELSE 0 END), 0)
         |               AS BIGINT) AS ewr
         |        FROM cl$r) s),
         |wr$r AS (
         |  SELECT cl.doc_id,
         |    cl.w * (CASE WHEN cl.correct THEN er.e1 ELSE er.g1 END) AS wr
         |  FROM cl$r cl CROSS JOIN er$r er),
         |wm$r AS (SELECT greatest(max(wr), 1) AS wm FROM wr$r),
         |w${r + 1} AS MATERIALIZED (
         |  SELECT doc_id, greatest((wr * 4096) // (SELECT wm FROM wm$r), 1) AS w
         |  FROM wr$r)""".stripMargin
    }
    val union = (1 to BoostRounds).map { r =>
      val sfx = s"b$r"
      s"""SELECT CAST($r AS BIGINT) AS round, b.feature, b.bin AS split_bin,
         |  st.mn AS f_min, st.mx AS f_max,
         |  b.cost_ticks, b.nl AS n_left, b.posl AS pos_left,
         |  b.posl * 2 >= b.nl AS predict_left,
         |  b.nn - b.nl AS n_right, b.npos - b.posl AS pos_right,
         |  (b.npos - b.posl) * 2 >= b.nn - b.nl AS predict_right,
         |  er.ewr AS err_w, er.tw AS total_w, er.alpha_ticks
         |FROM b$sfx b JOIN st$sfx st ON b.feature = st.feature
         |CROSS JOIN er$r er""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $stumpBaseCtes,
       |w1 AS MATERIALIZED (SELECT doc_id, CAST(4096 AS BIGINT) AS w FROM d2),
       |${rounds.mkString(",\n")}
       |SELECT * FROM (
       |$union
       |) ORDER BY round""".stripMargin
  }

  /** The DuckDB twin of [[t19NaiveBayes]] — the same tick model as
    * CTEs; argmin via row_number over (nll, cls).
    */
  private[graft] def nbOracleSql: String =
    """WITH tk AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(text), '[ \n\t\r]+'), t -> t <> '') AS t
      |  FROM documents),
      |tok AS (SELECT doc_id, unnest(t) AS token FROM tk),
      |ct AS (SELECT d.lang AS cls, tok.token, CAST(count(*) AS BIGINT) AS n_ct
      |       FROM tok JOIN documents d USING (doc_id) GROUP BY 1, 2),
      |tot AS (SELECT cls, CAST(sum(n_ct) AS BIGINT) AS t_c FROM ct GROUP BY cls),
      |vo AS (SELECT DISTINCT token FROM tok),
      |vs AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vo),
      |model AS (
      |  SELECT tot.cls, vo.token,
      |    CAST(floor(-log2((coalesce(ct.n_ct, 0) + 1)
      |                     / CAST(tot.t_c + vs.v AS DOUBLE))
      |               * 1048576.0 + 0.5) AS BIGINT) AS q
      |  FROM vo CROSS JOIN tot CROSS JOIN vs
      |  LEFT JOIN ct ON ct.cls = tot.cls AND ct.token = vo.token),
      |pr AS (
      |  SELECT lang AS cls,
      |    CAST(floor(-log2(count(*) / CAST((SELECT count(*) FROM documents) AS DOUBLE))
      |               * 1048576.0 + 0.5) AS BIGINT) AS prior_q
      |  FROM documents GROUP BY lang),
      |sc AS (
      |  SELECT tok.doc_id, model.cls,
      |    CAST(sum(model.q) AS BIGINT) + any_value(pr.prior_q) AS nll
      |  FROM tok JOIN model ON tok.token = model.token
      |  JOIN pr ON pr.cls = model.cls
      |  GROUP BY tok.doc_id, model.cls),
      |best AS (
      |  SELECT doc_id, cls AS predicted, nll AS nll_ticks,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY nll, cls) AS rn
      |  FROM sc)
      |SELECT d.doc_id, d.lang,
      |  coalesce(b.predicted, 'none') AS predicted,
      |  coalesce(b.nll_ticks, 0) AS nll_ticks,
      |  d.lang = coalesce(b.predicted, 'none') AS correct
      |FROM documents d
      |LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  /** The DuckDB twin of [[t18BpeMerges]]: the same tokenization as
    * t07's oracle, then [[BpeRounds]] unrolled CTE rounds — pair
    * counts from 1-based list slicing, the argmax as ORDER BY ...
    * LIMIT 1, re-segmentation via the same single-pass `replace`
    * contract.
    */
  private[graft] def bpeOracleSql: String = {
    val outs = (1 to BpeRounds).map { i =>
      s"SELECT CAST($i AS BIGINT) AS round, b$i.l AS left_sym, b$i.r AS right_sym, " +
        s"b$i.l || b$i.r AS merged_sym, b$i.pair_cnt, a$i.symbols_after FROM b$i, a$i"
    }
    s"""WITH $bpeOracleCtes
       |${outs.mkString("\nUNION ALL\n")}
       |ORDER BY round""".stripMargin
  }

  /** t21: BPE encoding report — t18's learned merges APPLIED back to
    * the corpus (trainer → encoder, the composition a tokenizer
    * pipeline actually ships): the final re-segmented vocabulary
    * from [[bpeTrain]] maps every word to its symbol count, and the
    * per-source rollup reports words / symbols / characters plus the
    * symbols-per-character compression as 2²⁰ ticks (positive
    * integer div, engines agree) — the metric that tells a corpus
    * owner which sources the tokenizer fits worst (high ticks =
    * poorly merged = out-of-domain text). The tick numerator
    * n_symbols·2²⁰ overflows int64 once a single source exceeds
    * ~8.8·10¹² symbols — plausible at corpus scale — and the
    * documented retune is the f02 one: drop the tick scale to 2¹⁰
    * (per-mille-grade resolution, numerator safe to ~9·10¹⁵
    * symbols/source). The encode join is vocabulary-sized (the
    * trained vocab broadcast in production); the rollup is one
    * partial-agg'd scan.
    */
  def t21BpeEncode(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark)
    val tokSrc = Tables.documents(spark, sfDir)
      .select(col("source"),
        explode(call_function("word_grams", lower(col("text")), lit(1)))
          .as("w"))
    val (_, vocab) = bpeTrainedOnCorpus(spark, sfDir)
    val enc = vocab.select(col("w"),
      size(split(trim(col("sym")), " ")).cast("long").as("nsym"))
    tokSrc.join(enc, "w")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_words"), sum(col("nsym")).as("n_symbols"),
        sum(length(col("w"))).as("n_chars"))
      .withColumn("compression_ticks",
        expr("(n_symbols * 1048576) div n_chars"))
      .orderBy(col("source"))
  }

  /** The DuckDB twin of [[t21BpeEncode]]: the shared trainer CTEs,
    * then the encode join + per-source rollup.
    */
  private[graft] def bpeEncodeOracleSql: String =
    s"""WITH $bpeOracleCtes,
       |enc AS (SELECT w, CAST(len(string_split(trim(sym), ' ')) AS BIGINT) AS nsym
       |        FROM v$BpeRounds),
       |ts AS (
       |  SELECT source,
       |    unnest(list_filter(regexp_split_to_array(lower(text), '[ \\n\\t\\r]+'),
       |           t -> t <> '')) AS w
       |  FROM documents)
       |SELECT ts.source, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(enc.nsym) AS BIGINT) AS n_symbols,
       |  CAST(sum(len(ts.w)) AS BIGINT) AS n_chars,
       |  CAST((CAST(sum(enc.nsym) AS BIGINT) * 1048576)
       |       // CAST(sum(len(ts.w)) AS BIGINT) AS BIGINT) AS compression_ticks
       |FROM ts JOIN enc ON ts.w = enc.w
       |GROUP BY ts.source
       |ORDER BY ts.source""".stripMargin

  /** The shared trainer CTE chain (tokenize, v0 init, all rounds) —
    * ends with v[[BpeRounds]] holding the final vocabulary; used by
    * the t18 and t21 oracles.
    */
  private[graft] def bpeOracleCtes: String = {
    val rounds = (1 to BpeRounds).map { i =>
      val prev = s"v${i - 1}"
      s"""p$i AS (SELECT a[i] AS l, a[i+1] AS r, CAST(sum(freq) AS BIGINT) AS pair_cnt
         |  FROM (SELECT freq, string_split(trim(sym), ' ') AS a FROM $prev) s,
         |       UNNEST(generate_series(1, len(a)-1)) AS u(i)
         |  GROUP BY 1, 2),
         |b$i AS (SELECT l, r, pair_cnt FROM p$i ORDER BY pair_cnt DESC, l, r LIMIT 1),
         |v$i AS (
         |  SELECT p.w, p.freq,
         |    CASE WHEN b.l IS NULL THEN p.sym
         |         ELSE replace(replace(replace(p.sym, ' ', '  '),
         |                ' '||b.l||'  '||b.r||' ', ' '||b.l||b.r||' '),
         |                '  ', ' ')
         |    END AS sym
         |  FROM $prev p LEFT JOIN b$i b ON TRUE),
         |a$i AS (SELECT CAST(sum(freq * len(string_split(trim(sym), ' '))) AS BIGINT)
         |    AS symbols_after FROM v$i)""".stripMargin
    }
    s"""tk AS (
       |  SELECT list_filter(regexp_split_to_array(lower(text), '[ \\n\\t\\r]+'),
       |         t -> t <> '') AS t
       |  FROM documents),
       |tok AS (SELECT unnest(t) AS w FROM tk),
       |v0 AS (SELECT w, CAST(count(*) AS BIGINT) AS freq,
       |         ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS sym
       |       FROM tok GROUP BY w),
       |${rounds.mkString(",\n")}""".stripMargin
  }

  /** t27: χ² contingency analysis of lang × source — the reference's
    * mllib/stat independence-test surface (reference:
    * /root/reference/mllib/src/main/scala/org/apache/spark/mllib/
    * stat/Statistics.scala:1, chiSqTest): is the language mix
    * independent of the source? — the drift question a corpus owner
    * asks before reweighting a mixture. Mechanics on the determinism
    * contract: observed counts are one partial-agg'd scan; the cell
    * grid is the DISTINCT langs × DISTINCT sources cross (two tiny
    * broadcast frames, zero cells included — χ² needs them);
    * expected_ticks = (R_l·C_s·2²⁰) div N is EXACT integer
    * arithmetic (R·C·2²⁰ ≤ N²·2²⁰, int64-safe to N ≈ 2²¹ docs —
    * beyond, the documented retune computes it in the shared double
    * tree); the cell statistic (O·N − R·C)²/(N·R·C) quantizes to
    * 2²⁰ ticks via the IDENTICAL double tree in both engines (the
    * s19 convention — the squared numerator exceeds int64 first).
    * The test statistic is the exact long sum of cell ticks and the
    * dof (|langs|−1)(|sources|−1) — both derivable from the rows; a
    * p-value needs the χ² CDF, which neither engine evaluates
    * deterministically in SQL (documented residual — the spec pins
    * the statistic's behavior on planted independent and dependent
    * tables instead). Output: (lang, source, observed,
    * expected_ticks, chi2_ticks), cells ordered.
    */
  def t27Chi2(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("lang"), col("source"))
    val obs = docs.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("o")).ckpt(true)
    val rl = obs.groupBy(col("lang")).agg(sum(col("o")).as("r"))
    val cs = obs.groupBy(col("source")).agg(sum(col("o")).as("c"))
    val nn = obs.agg(sum(col("o")).as("n"))
    val grid = rl.crossJoin(broadcast(cs))
      .join(obs, Seq("lang", "source"), "left")
      .crossJoin(broadcast(nn))
      .select(col("lang"), col("source"),
        coalesce(col("o"), lit(0L)).as("observed"),
        expr("(r * c * 1048576) div n").as("expected_ticks"),
        expr("""CAST(floor(
               |  CAST(observed * n - r * c AS DOUBLE)
               |  * CAST(observed * n - r * c AS DOUBLE)
               |  / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
               |  * 1048576.0D + 0.5D) AS BIGINT)""".stripMargin)
          .as("chi2_ticks"))
    // the TEST itself: total chi2 (an order-free exact tick sum) and
    // df = (R-1)(C-1), mapped to p by the shared closed-form
    // survival (reference ChiSqTest.scala pValue surface); constant
    // over the report's rows, the p19 literal-frame posture
    val tot = grid.agg(sum(col("chi2_ticks")).as("chi2_total_ticks"),
      ((countDistinct(col("lang")) - lit(1L)) *
        (countDistinct(col("source")) - lit(1L))).as("dof"))
    grid.crossJoin(broadcast(tot))
      .withColumn("chi2_total",
        col("chi2_total_ticks").cast("double") / lit(1048576.0))
      .select(col("lang"), col("source"), col("observed"),
        col("expected_ticks"), col("chi2_ticks"),
        col("chi2_total_ticks"), col("dof"),
        round(expr(graft.functions.PValues.chi2SfSql("chi2_total", "dof")), 4)
          .as("p_value"))
      .orderBy(col("lang"), col("source"))
  }

  /** The DuckDB twin of [[t27Chi2]]. */
  private[graft] def chi2OracleSql: String =
    s"""WITH obs AS MATERIALIZED (
      |  SELECT lang, source, CAST(count(*) AS BIGINT) AS o
      |  FROM documents GROUP BY 1, 2),
      |rl AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM obs GROUP BY 1),
      |cs AS (SELECT source, CAST(sum(o) AS BIGINT) AS c FROM obs GROUP BY 1),
      |nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs),
      |grid AS (
      |  SELECT rl.lang, cs.source, rl.r, cs.c,
      |    coalesce(obs.o, 0) AS observed, (SELECT n FROM nn) AS n
      |  FROM rl CROSS JOIN cs
      |  LEFT JOIN obs ON obs.lang = rl.lang AND obs.source = cs.source),
      |cells AS (
      |  SELECT lang, source, observed,
      |    (r * c * 1048576) // n AS expected_ticks,
      |    CAST(floor(
      |      CAST(observed * n - r * c AS DOUBLE)
      |      * CAST(observed * n - r * c AS DOUBLE)
      |      / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
      |      * 1048576.0 + 0.5) AS BIGINT) AS chi2_ticks
      |  FROM grid),
      |tot AS (
      |  SELECT CAST(sum(chi2_ticks) AS BIGINT) AS chi2_total_ticks,
      |    CAST((count(DISTINCT lang) - 1) * (count(DISTINCT source) - 1)
      |      AS BIGINT) AS dof
      |  FROM cells)
      |SELECT lang, source, observed, expected_ticks, chi2_ticks,
      |  chi2_total_ticks, dof,
      |  round(${graft.functions.PValues.chi2SfSql("chi2_total", "dof")}, 4)
      |    AS p_value
      |FROM (SELECT cells.*, tot.chi2_total_ticks, tot.dof,
      |        CAST(tot.chi2_total_ticks AS DOUBLE) / 1048576.0 AS chi2_total
      |      FROM cells CROSS JOIN tot)
      |ORDER BY lang, source""".stripMargin

  /** Hash-bucket count for [[t30HashingTf]] — the fixed feature
    * dimensionality (64, matching the embeddings table's width so
    * the hashed vectors drop straight into the ANN family).
    */
  private[graft] val HtfBuckets = 64L

  /** IDF tick scale for t30 (2¹⁰). */
  private[graft] val HtfScale = 1024.0

  /** t30: feature hashing + IDF — the deterministic text→vector
    * bridge (reference: /root/reference/mllib/src/main/scala/org/
    * apache/spark/mllib/feature/HashingTF.scala:1 and IDF.scala:1):
    * every token hashes to one of [[HtfBuckets]] buckets via the
    * engine-portable md5 idiom (conv(substr(md5, 1, 4)) mod B — the
    * p01/m04 salt convention, bit-identical in DuckDB), and the
    * bucket weight is Σ_tokens tf · idf_ticks with idf_ticks =
    * floor(log2((N+1)/(df+1))·2¹⁰ + 0.5) — the g11 log2-tick
    * convention (exact-integer-valued double ratio, one libm call,
    * floor agreed cross-engine in practice across all SFs). Output
    * long-form: (doc_id, bucket, w_ticks) for occupied buckets —
    * the sparse vector a downstream ANN or classifier consumes;
    * smoothed IDF keeps every weight ≥ 0.
    *
    * Scale shape: tf is the t14 per-(doc, token) partial agg; df is
    * vocabulary-sized; idf joins back vocabulary-sized; the bucket
    * projection is a map-side expression and the final (doc, bucket)
    * agg emits ≤ [[HtfBuckets]] rows per doc. No window, no sort
    * except the presentation order. The fixed bucket count is the
    * POINT of feature hashing: memory is corpus-independent, and
    * collisions are the documented accuracy trade (Weinberger et
    * al., ICML 2009).
    */
  /** Memo for the hashed-TF-IDF frame — t30 reports it and s22
    * searches over it; the tokenize+count scan behind it runs once
    * per sweep.
    */
  private val htfMemo = new graft.FrameMemo[org.apache.spark.sql.DataFrame]

  /** The memoized (doc_id, bucket, w_ticks) hashed frame (see
    * [[t30HashingTf]] for the contract). Package-private so the
    * similarity family can search over it.
    */
  private[graft] def hashedTfidf(spark: SparkSession, sfDir: String): DataFrame =
    htfMemo.getOrCompute(spark, sfDir,
      Tables.fingerprint(spark, sfDir, "documents") + "|htf") {
      registerAll(spark)
      val tf = Tables.documents(spark, sfDir)
        .select(col("doc_id"),
          explode(call_function("word_grams", lower(col("text")), lit(1)))
            .as("token"))
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
        .ckpt(true)
      val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val nDocs = Tables.documents(spark, sfDir).agg(count(lit(1)).as("n_docs"))
      tf.join(dfreq, "token")
        .crossJoin(broadcast(nDocs))
        .withColumn("idf_ticks",
          floor(log2((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))) *
            lit(HtfScale) + lit(0.5)).cast("long"))
        .withColumn("bucket",
          pmod(conv(substring(md5(concat(lit("htf:"), col("token"))), 1, 4),
            16, 10).cast("long"), lit(HtfBuckets)))
        .groupBy(col("doc_id"), col("bucket"))
        .agg(sum(col("tf") * col("idf_ticks")).as("w_ticks"))
        .ckpt(true)
    }

  def t30HashingTf(spark: SparkSession, sfDir: String): DataFrame =
    hashedTfidf(spark, sfDir).orderBy(col("doc_id"), col("bucket"))

  /** The t30 hashed frame as a CTE chain ending in
    * `h(doc_id, bucket, w_ticks)` — shared by the t30 and s22
    * oracles.
    */
  private[graft] def htfOracleCtes: String =
    s"""WITH tok AS (
       |  SELECT doc_id,
       |    unnest(list_filter(regexp_split_to_array(lower(text), '[ \\n\\t\\r]+'),
       |           t -> t <> '')) AS token
       |  FROM documents),
       |tf AS MATERIALIZED (
       |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
       |  FROM tok GROUP BY 1, 2),
       |dfr AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |h AS MATERIALIZED (
       |  SELECT tf.doc_id,
       |    CAST((('0x' || substr(md5('htf:' || tf.token), 1, 4))::UBIGINT
       |      % ${HtfBuckets}) AS BIGINT) AS bucket,
       |    CAST(sum(tf.tf * CAST(floor(
       |      log2((n.n_docs + 1.0) / (dfr.df + 1.0)) * ${HtfScale} + 0.5)
       |      AS BIGINT)) AS BIGINT) AS w_ticks
       |  FROM tf JOIN dfr ON dfr.token = tf.token, n
       |  GROUP BY 1, 2)""".stripMargin

  /** The DuckDB twin of [[t30HashingTf]]. */
  private[graft] def t30OracleSql: String =
    s"""$htfOracleCtes
       |SELECT doc_id, bucket, w_ticks FROM h
       |ORDER BY doc_id, bucket""".stripMargin

  /** Tokens reported by [[t29Chi2Select]]. */
  private[graft] val Chi2SelTopK = 30

  /** Document-frequency floor for selectable tokens (tiny expected
    * cells make χ² meaningless; the t13 min-count posture).
    */
  private[graft] val Chi2SelMinDf = 5

  /** t29: χ²-based feature selection — the top tokens whose document
    * presence is most dependent on the language label, the feature-
    * selection pass run before training a classifier like t19
    * (reference surface: /root/reference/mllib/src/main/scala/org/
    * apache/spark/mllib/feature/ChiSqSelector.scala:1). Per token w
    * with document frequency n_w over N docs and per-class counts
    * n_wl (docs of lang l containing w) / n_l (docs of lang l), the
    * 2×C contingency χ² collapses algebraically to
    * Σ_l (n_wl·N − n_w·n_l)² / (n_w·n_l·(N−n_w)) — and is computed
    * as EXACT per-class integer ticks with a stated two-step floor:
    * term = ((num² div (n_w·(N−n_w))) · 2²⁰) div n_l, summed as
    * longs (order-independent; cross-engine identical by
    * construction, unlike a float sum over classes). Tokens present
    * in no doc or every doc are excluded (χ² degenerate/zero there),
    * as are tokens below [[Chi2SelMinDf]]. Output: top-
    * [[Chi2SelTopK]] by (chi2_ticks desc, token asc) —
    * (token, doc_freq, chi2_ticks).
    *
    * Scale shape: presence is a distinct (doc, token, lang) frame
    * collapsing map-side; all counts are vocabulary-(×classes-)sized
    * partial aggs; the class grid completes via a broadcast cross
    * join against the per-class totals; the final cut is a
    * TakeOrdered, no global sort. Long headroom: num² div the
    * positive denominator stays < N³/MinDf — the ·2²⁰ product
    * overflows past N ≈ 2·10⁵ docs, where the documented retune
    * drops the tick scale (the f02 posture).
    */
  def t29Chi2Select(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
    val pres = docs.select(col("doc_id"), col("lang"),
        explode(call_function("word_grams", lower(col("text")), lit(1)))
          .as("token"))
      .distinct()
    val nl = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_l"))
    val nn = docs.agg(count(lit(1)).as("nn"))
    val nwl = pres.groupBy(col("token"), col("lang"))
      .agg(count(lit(1)).as("n_wl"))
      .ckpt(true)
    val nw = nwl.groupBy(col("token")).agg(sum(col("n_wl")).as("n_w"))
    nw.crossJoin(broadcast(nl))
      .join(nwl, Seq("token", "lang"), "left")
      .crossJoin(broadcast(nn))
      .withColumn("n_wl", coalesce(col("n_wl"), lit(0L)))
      .filter(col("n_w") >= Chi2SelMinDf && col("n_w") < col("nn"))
      .withColumn("num", col("n_wl") * col("nn") - col("n_w") * col("n_l"))
      .withColumn("term_ticks",
        expr("(((num * num) div (n_w * (nn - n_w))) * 1048576) div n_l"))
      .groupBy(col("token"), col("n_w").as("doc_freq"))
      .agg(sum(col("term_ticks")).as("chi2_ticks"))
      .orderBy(col("chi2_ticks").desc, col("token"))
      .limit(Chi2SelTopK)
      // per-token p from the tick-exact statistic, df = L - 1 (the
      // presence x lang table is 2 x L); shared closed-form survival
      .crossJoin(broadcast(nl.agg(
        (countDistinct(col("lang")) - lit(1L)).as("dof"))))
      .withColumn("chi2", col("chi2_ticks").cast("double") / lit(1048576.0))
      .select(col("token"), col("doc_freq"), col("chi2_ticks"),
        round(expr(graft.functions.PValues.chi2SfSql("chi2", "dof")), 4)
          .as("p_value"))
      .orderBy(col("chi2_ticks").desc, col("token"))
  }

  /** The DuckDB twin of [[t29Chi2Select]]. */
  private[graft] def t29OracleSql: String =
    s"""WITH tk0 AS (
       |  SELECT doc_id, lang,
       |    unnest(list_filter(regexp_split_to_array(lower(text), '[ \\n\\t\\r]+'),
       |           t -> t <> '')) AS token
       |  FROM documents),
       |tk AS MATERIALIZED (SELECT DISTINCT doc_id, lang, token FROM tk0),
       |nl AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_l
       |       FROM documents GROUP BY 1),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM documents),
       |nwl AS MATERIALIZED (
       |  SELECT token, lang, CAST(count(*) AS BIGINT) AS n_wl
       |  FROM tk GROUP BY 1, 2),
       |nw AS (SELECT token, CAST(sum(n_wl) AS BIGINT) AS n_w
       |       FROM nwl GROUP BY 1),
       |g AS (
       |  SELECT nw.token, nw.n_w, nl.lang, nl.n_l,
       |    COALESCE(nwl.n_wl, CAST(0 AS BIGINT)) AS n_wl,
       |    (SELECT nn FROM nn) AS nn
       |  FROM nw CROSS JOIN nl
       |  LEFT JOIN nwl ON nwl.token = nw.token AND nwl.lang = nl.lang
       |  WHERE nw.n_w >= ${Chi2SelMinDf} AND nw.n_w < (SELECT nn FROM nn)),
       |sel AS (
       |  SELECT token, n_w AS doc_freq,
       |    CAST(sum((((n_wl * nn - n_w * n_l) * (n_wl * nn - n_w * n_l))
       |      // (n_w * (nn - n_w)) * 1048576) // n_l) AS BIGINT) AS chi2_ticks
       |  FROM g GROUP BY 1, 2
       |  ORDER BY chi2_ticks DESC, token LIMIT ${Chi2SelTopK}),
       |dd AS (SELECT CAST(count(DISTINCT lang) - 1 AS BIGINT) AS dof FROM nl)
       |SELECT token, doc_freq, chi2_ticks,
       |  round(${graft.functions.PValues.chi2SfSql("chi2", "dof")}, 4)
       |    AS p_value
       |FROM (SELECT sel.*, dd.dof,
       |        CAST(chi2_ticks AS DOUBLE) / 1048576.0 AS chi2
       |      FROM sel CROSS JOIN dd)
       |ORDER BY chi2_ticks DESC, token""".stripMargin

  /** Boosting rounds for [[t31GbtStumps]] — fixed so the model is a
    * pure function of the corpus and the oracle can unroll the
    * rounds exactly (the KmeansIters convention).
    */
  private[graft] val GbtRounds = 3

  /** t31: gradient-boosted regression stumps — the reference's
    * mllib GradientBoostedTrees surface (reference: /root/reference/
    * mllib/src/main/scala/org/apache/spark/mllib/tree/
    * GradientBoostedTrees.scala:1) with squared-error loss, depth-1
    * trees, and shrinkage 1/2, on the exact-integer contract the
    * tree family (t20/t22/t25/t26) already carries. Target: token
    * count (v2); features: n_chars (v1) and distinct-token-ratio
    * ticks (v3) on the SHARED [[docFeatures]] frame and the same
    * [[StumpBins]] fixed-width grid (global per-feature [min, max] —
    * computed once, constant across rounds, so every engine bins
    * identically every round).
    *
    * Round m: residuals r = y - F_{m-1} (exact longs), one
    * partial-agg'd (feature, bin) pass for (count, sum r), the
    * variance-gain argmax over the <= 2x16-row candidate frame with
    * score = sl^2/nl + sr^2/nr quantized by floor(.+0.5) (doubles of
    * exact longs — sl^2 stays inside 2^53 for |sl| < 9.4e7; the
    * corpus-scale retune coarsens the residual grid, the f02
    * convention), leaf steps gl = floor(sl / (2*nl)) via DOUBLE
    * floor — floor division in BOTH engines (Spark `div` truncates
    * toward zero and residual sums go negative, the one place the
    * family's truncating-div convention would diverge), and a
    * broadcast 1-row model join updates F. SSE is reported per round
    * as an exact long sum (corpus-scale retune: DECIMAL(38,0)).
    *
    * Output: one row per round — (round, feature, split_bin, f_min,
    * f_max, gain_ticks, left_step, right_step, f0, sse_after); the
    * spec asserts SSE is non-increasing round over round (the
    * boosting invariant).
    *
    * Scale shape: per round one corpus scan to bin residuals
    * (map-side partial agg to <= 32 rows), one 1-row broadcast join
    * to update F, one partial-agg'd SSE scan — the textbook
    * distributed GBT iteration; no window over data rows, no
    * driver-side model state beyond the 1-row split.
    */
  def t31GbtStumps(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val f = docFeatures(spark, sfDir)
      .select(col("doc_id"), col("v2").as("yr"), col("v1"), col("v3"))
      .ckpt(true)
    val stats = f.select(
        expr("stack(2, 'n_chars', v1, 'distinct_ratio', v3)")
          .as(Seq("feature", "x")))
      .groupBy(col("feature")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .ckpt(true)
    // base prediction as a 1-row broadcast frame (NOT a driver-side
    // collect — the operator stays a pure declarative plan, the
    // ADVICE r10 fix; the identical floor(Σy/n) both engines compute)
    val f0f = f.agg(sum(col("yr")).as("s"), count(lit(1)).as("n"))
      .select(floor(col("s").cast("double") / col("n").cast("double"))
        .cast("long").as("f0"))
      .ckpt(true)
    var cur = f.crossJoin(broadcast(f0f))
      .withColumn("fhat", col("f0")).drop("f0").ckpt(true)
    val cumw = Window.partitionBy(col("feature")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var out: DataFrame = null
    for (m <- 1 to GbtRounds) {
      val lf = cur.select((col("yr") - col("fhat")).as("r"),
        expr("stack(2, 'n_chars', v1, 'distinct_ratio', v3)")
          .as(Seq("feature", "x")))
      val perBin = lf.join(broadcast(stats), "feature")
        .withColumn("bin", expr(s"((x - mn) * $StumpBins) div (mx - mn + 1)"))
        .groupBy(col("feature"), col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("r")).as("s"))
        .ckpt(true)
      val tot = perBin.groupBy(col("feature"))
        .agg(sum(col("n")).as("nn"), sum(col("s")).as("ss"))
      val cand = perBin
        .withColumn("nl", sum(col("n")).over(cumw))
        .withColumn("sl", sum(col("s")).over(cumw))
        .join(tot, "feature")
        .filter(col("nl") < col("nn"))
        .withColumn("score_ticks",
          floor(col("sl").cast("double") * col("sl") / col("nl")
            + (col("ss") - col("sl")).cast("double") * (col("ss") - col("sl"))
              / (col("nn") - col("nl")) + lit(0.5)).cast("long"))
      val best = cand
        .orderBy(col("score_ticks").desc, col("feature"), col("bin")).limit(1)
        .join(broadcast(stats), "feature")
        .select(col("feature").as("bf"), col("bin").as("bb"),
          col("mn").as("bmn"), col("mx").as("bmx"), col("score_ticks"),
          floor(col("sl").cast("double") / (lit(2.0) * col("nl")))
            .cast("long").as("gl"),
          floor((col("ss") - col("sl")).cast("double")
              / (lit(2.0) * (col("nn") - col("nl"))))
            .cast("long").as("gr"))
        .ckpt(true)
      cur = cur.crossJoin(broadcast(best))
        .withColumn("fhat", col("fhat") + when(
          expr(s"(((CASE WHEN bf = 'n_chars' THEN v1 ELSE v3 END) - bmn)" +
            s" * $StumpBins) div (bmx - bmn + 1)") <= col("bb"),
          col("gl")).otherwise(col("gr")))
        .select(col("doc_id"), col("yr"), col("v1"), col("v3"), col("fhat"))
        .ckpt(true)
      val sse = cur.agg(
        sum((col("yr") - col("fhat")) * (col("yr") - col("fhat"))).as("sse"))
      val row = best.crossJoin(broadcast(sse)).crossJoin(broadcast(f0f))
        .select(
          lit(m.toLong).as("round"), col("bf").as("feature"),
          col("bb").as("split_bin"), col("bmn").as("f_min"),
          col("bmx").as("f_max"), col("score_ticks").as("gain_ticks"),
          col("gl").as("left_step"), col("gr").as("right_step"),
          col("f0"), col("sse").as("sse_after"))
      out = if (out == null) row else out.union(row)
    }
    out.orderBy(col("round"))
  }

  /** t31 oracle: the boosting chain unrolled round by round — the
    * SAME global bin grid, residual aggregation, gain argmax, and
    * double-floor leaf steps as the engine, one CTE block per round.
    */
  private[graft] def gbtOracleSql: String = {
    val rounds = (1 to GbtRounds).map { m =>
      val prev = s"fr${m - 1}"
      s"""lf$m AS (
         |  SELECT yr - fhat AS r, 'n_chars' AS feature, v1 AS x FROM $prev
         |  UNION ALL SELECT yr - fhat, 'distinct_ratio', v3 FROM $prev),
         |pb$m AS MATERIALIZED (
         |  SELECT lf.feature,
         |    ((lf.x - g.mn) * $StumpBins) // (g.mx - g.mn + 1) AS bin,
         |    CAST(count(*) AS BIGINT) AS n, CAST(sum(lf.r) AS BIGINT) AS s
         |  FROM lf$m lf JOIN gstats g USING (feature) GROUP BY 1, 2),
         |tt$m AS (SELECT feature, CAST(sum(n) AS BIGINT) AS nn,
         |         CAST(sum(s) AS BIGINT) AS ss FROM pb$m GROUP BY 1),
         |cu$m AS (
         |  SELECT feature, bin,
         |    CAST(sum(n) OVER (PARTITION BY feature ORDER BY bin) AS BIGINT) AS nl,
         |    CAST(sum(s) OVER (PARTITION BY feature ORDER BY bin) AS BIGINT) AS sl
         |  FROM pb$m),
         |b$m AS MATERIALIZED (
         |  SELECT cu.feature, cu.bin, cu.nl, cu.sl, tt.nn, tt.ss, g.mn, g.mx,
         |    CAST(floor(CAST(cu.sl AS DOUBLE) * cu.sl / cu.nl
         |      + CAST(tt.ss - cu.sl AS DOUBLE) * (tt.ss - cu.sl)
         |        / (tt.nn - cu.nl) + 0.5) AS BIGINT) AS score_ticks,
         |    CAST(floor(CAST(cu.sl AS DOUBLE) / (2.0 * cu.nl)) AS BIGINT) AS gl,
         |    CAST(floor(CAST(tt.ss - cu.sl AS DOUBLE)
         |      / (2.0 * (tt.nn - cu.nl))) AS BIGINT) AS gr
         |  FROM cu$m cu JOIN tt$m tt USING (feature)
         |  JOIN gstats g USING (feature)
         |  WHERE cu.nl < tt.nn
         |  ORDER BY score_ticks DESC, cu.feature, cu.bin LIMIT 1),
         |fr$m AS MATERIALIZED (
         |  SELECT f.doc_id, f.yr, f.v1, f.v3,
         |    f.fhat + CASE WHEN (((CASE WHEN b.feature = 'n_chars'
         |          THEN f.v1 ELSE f.v3 END) - b.mn) * $StumpBins)
         |        // (b.mx - b.mn + 1) <= b.bin
         |      THEN b.gl ELSE b.gr END AS fhat
         |  FROM $prev f CROSS JOIN b$m b),
         |se$m AS (SELECT CAST(sum((yr - fhat) * (yr - fhat)) AS BIGINT) AS sse
         |  FROM fr$m)""".stripMargin
    }.mkString(",\n")
    val selects = (1 to GbtRounds).map { m =>
      s"""SELECT CAST($m AS BIGINT) AS round, b.feature, b.bin AS split_bin,
         |  b.mn AS f_min, b.mx AS f_max, b.score_ticks AS gain_ticks,
         |  b.gl AS left_step, b.gr AS right_step,
         |  (SELECT f0 FROM ag0) AS f0,
         |  (SELECT sse FROM se$m) AS sse_after
         |FROM b$m b""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $stumpBaseCtes,
       |gstats AS MATERIALIZED (
       |  SELECT feature, min(x) AS mn, max(x) AS mx FROM (
       |    SELECT 'n_chars' AS feature, v1 AS x FROM d2
       |    UNION ALL SELECT 'distinct_ratio', v3 FROM d2) GROUP BY 1),
       |ag0 AS (SELECT CAST(floor(CAST(sum(v2) AS DOUBLE) / count(*)) AS BIGINT)
       |  AS f0 FROM d2),
       |fr0 AS MATERIALIZED (
       |  SELECT doc_id, v2 AS yr, v1, v3, (SELECT f0 FROM ag0) AS fhat FROM d2),
       |$rounds
       |SELECT * FROM ($selects) ORDER BY round""".stripMargin
  }
}
