package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamOps

/** Streaming twins must produce the same rows as their batch
  * counterparts when the whole dataset is drained through the stream
  * (memory sink, processAllAvailable).
  */
class StreamingSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  // The file stream source needs a directory; stage the single-file
  // events parquet into one.
  private lazy val streamDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  lazy val spark: SparkSession = TestSpark.spark

  test("stream_incremental_dedup: probe converges to the batch d10 result") {
    import graft.operators.Dedup
    // static side: corpus docs + the materialized band index
    // (production pre-materializes it; localCheckpoint is the
    // sandbox stand-in so per-micro-batch reads hit stored blocks)
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val isNew = pmod(col("doc_id"), lit(10)) === 7
    val corpus = docs.filter(!isNew)
    val index = Dedup.corpusBandIndex(corpus).localCheckpoint(true)
    // delta arrives as TWO micro-batches (split by doc_id half)
    val delta = docs.filter(isNew)
    val mid = delta.agg(percentile_approx(col("doc_id"), lit(0.5), lit(100)))
      .collect()(0).getLong(0)
    val src = java.nio.file.Files.createTempDirectory("graft-d10-stream")
    def stage(cond: org.apache.spark.sql.Column, name: String): Unit = {
      val d = java.nio.file.Files.createTempDirectory(s"graft-d10-$name")
      Tables.documents(spark, sfDir).filter(isNew && cond)
        .coalesce(1).write.mode("overwrite").parquet(d.toString)
      val part = java.nio.file.Files.list(d).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      // stage atomically: the query is polling src, and a half-copied
      // parquet (missing footer) would fail the micro-batch
      val tmp = java.nio.file.Paths.get(part).resolveSibling(s"$name.parquet")
      java.nio.file.Files.copy(java.nio.file.Paths.get(part), tmp)
      java.nio.file.Files.move(tmp, src.resolve(s"$name.parquet"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    val got = scala.collection.mutable.Set[(Long, Long, Double)]()
    var nBatches = 0
    val stream = spark.readStream.schema(StreamOps.documentSchema)
      .parquet(src.toString)
      .select(col("doc_id"), col("text"))
    val q = StreamOps.incrementalDedupCandidates(stream, index)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        // sink-side verify: per-batch pair distinct is exact since all
        // bands of a doc share its batch; Jaccard runs once per pair
        val rows = StreamOps.verifyDedupCandidates(df, corpus).collect()
        got.synchronized {
          nBatches += 1
          rows.foreach(r => got += ((r.getLong(0), r.getLong(1), r.getDouble(2))))
        }
      }
      .start()
    try {
      stage(col("doc_id") <= mid, "b0")
      q.processAllAvailable()
      stage(col("doc_id") > mid, "b1")
      q.processAllAvailable()
    } finally q.stop()
    assert(nBatches >= 2, s"expected at least two micro-batches, got $nBatches")
    val want = Dedup.d10DedupIncremental(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(want.nonEmpty && got.toSet == want,
      s"missing=${want -- got} extra=${got.toSet -- want}")
  }

  test("stream_quality_gate drains to the batch t02-filtered result") {
    val dir = java.nio.file.Files.createTempDirectory("graft-qgate")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"),
      dir.resolve("documents.parquet"))
    val floor = 0.35
    val stream = spark.readStream.schema(StreamOps.documentSchema)
      .parquet(dir.toString)
    val q = StreamOps.qualityGate(stream, floor)
      .writeStream.outputMode("append")
      .format("memory").queryName("qgate_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("qgate_out").orderBy(col("doc_id")).collect().toSeq
    val expected = operators.TextAnalysis.t02QualityScore(spark, sfDir)
      .filter(col("quality_score") >= floor)
      .orderBy(col("doc_id")).collect().toSeq
    assert(got.nonEmpty && got == expected)
    // the gate is a real decision boundary on this corpus
    val total = Tables.documents(spark, sfDir).count()
    assert(got.size < total, "the floor must reject some documents")
  }

  test("stream_nb_classify drains to the batch t19 predictions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nbserve")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"),
      dir.resolve("documents.parquet"))
    // train batch, score stream: ONE model, two ingestion paths
    val (model, priors) = operators.TextAnalysis.nbModelFrames(spark, sfDir)
    val stream = spark.readStream.schema(StreamOps.documentSchema)
      .parquet(dir.toString)
    val buf = scala.collection.mutable.ArrayBuffer[(Long, String, Long)]()
    val q = StreamOps.nbScoreStream(stream, model).writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        buf.synchronized {
          buf ++= StreamOps.nbClassifyBatch(batch, priors).collect()
            .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        }
        ()
      }
      .start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = buf.sortBy(_._1).toSeq
    // zero-token docs never reach the stream join; batch marks them 'none'
    val expected = operators.TextAnalysis.t19NaiveBayes(spark, sfDir).collect()
      .filter(_.getString(2) != "none")
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3))).toSeq
    assert(got.nonEmpty && got == expected,
      s"stream/batch drift: ${got.size} vs ${expected.size}")
  }

  test("stream_topic_classify drains to the batch fold-in assignment") {
    val dir = java.nio.file.Files.createTempDirectory("graft-topicserve")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"),
      dir.resolve("documents.parquet"))
    // train batch (t23 term factors), score stream: one model
    val terms = operators.Recommend.topicFactors(spark, sfDir)._2
    val ticks = terms.select(Seq(col("s").as("token")) ++
      (0 until operators.Recommend.AlsRank).map(k => col(s"t$k")): _*)
      .localCheckpoint(true)
    val stream = spark.readStream.schema(StreamOps.documentSchema)
      .parquet(dir.toString)
    val buf = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val q = StreamOps.topicScoreStream(stream, ticks).writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        buf.synchronized {
          buf ++= StreamOps.topicAssignBatch(batch).collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        }
        ()
      }
      .start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = buf.sortBy(_._1).toSeq
    // batch twin: the same fold-in over batch-ingested documents
    val batchDocs = Tables.documents(spark, sfDir)
    val expected = StreamOps.topicAssignBatch(
        StreamOps.topicScoreStream(batchDocs, ticks))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got.nonEmpty && got == expected,
      s"stream/batch drift: ${got.size} vs ${expected.size}")
    // the assignment is a real decision: more than one topic used
    assert(got.map(_._2).distinct.size > 1,
      "fold-in must distribute docs over topics")
  }

  test("stream_window_agg drains to the batch q30 result") {
    val stream = StreamOps.readEventStream(spark, streamDir)
    val q = StreamOps.windowAgg(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_agg_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("win_agg_out")
      .orderBy(col("win_start"), col("event_type"))
      .collect().toSeq
    val expected = operators.Events.q30EventWindowAgg(spark, sfDir).collect().toSeq
    assert(got == expected)
  }

  test("stream_join: stream-stream join drains to the batch twin result") {
    val stream = StreamOps.readEventStream(spark, streamDir)
    val q = StreamOps.clickPurchaseJoin(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("ss_join_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val cols = Seq("user_id", "click_id", "purchase_id")
    val got = spark.table("ss_join_out")
      .orderBy(cols.map(col): _*).collect().toSeq
    val expected = StreamOps.clickPurchaseJoin(Tables.events(spark, sfDir))
      .orderBy(cols.map(col): _*).collect().toSeq
    assert(got.nonEmpty && got == expected)
  }

  test("stream_enrich: stream-static enrichment drains to the batch twin result") {
    val dim = StreamOps.userDim(spark, sfDir)
    val stream = StreamOps.readEventStream(spark, streamDir)
    val q = StreamOps.enrichEvents(stream, dim)
      .writeStream.outputMode("append")
      .format("memory").queryName("enrich_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("enrich_out")
      .orderBy(col("event_id")).collect().toSeq
    val expected = StreamOps.enrichEvents(Tables.events(spark, sfDir), dim)
      .orderBy(col("event_id")).collect().toSeq
    assert(got.nonEmpty && got == expected)
  }

  test("stream_dedup: duplicate delivery eliminated exactly") {
    // stage the SAME events file twice: an at-least-once source
    val dupDir = java.nio.file.Files.createTempDirectory("graft-events-dup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dupDir.resolve("events_a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dupDir.resolve("events_b.parquet"))
    val stream = StreamOps.readEventStream(spark, dupDir.toString)
    val q = StreamOps.dedupEvents(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("dedup_out").orderBy(col("event_id")).collect().toSeq
    val expected = Tables.events(spark, sfDir).orderBy(col("event_id")).collect().toSeq
    assert(got.nonEmpty && got == expected)
  }

  test("windowed aggregate drains through the parquet file sink") {
    val out = java.nio.file.Files.createTempDirectory("graft-file-sink").toString
    val chk = java.nio.file.Files.createTempDirectory("graft-file-chk").toString
    val stream = StreamOps.readEventStream(spark, streamDir)
    val q = StreamOps.windowAgg(stream)
      .writeStream.outputMode("append")
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", chk)
      .start()
    try { q.processAllAvailable() } finally { q.stop() }
    // append mode emits only watermark-finalized windows: the file
    // rows must be a non-empty subset of the batch q30 result
    val got = spark.read.parquet(out)
      .collect().map(_.toSeq).toSet
    val batch = operators.Events.q30EventWindowAgg(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(got.nonEmpty, "file sink must receive finalized windows")
    assert(got.subsetOf(batch), "file-sink rows must match batch windows")
  }

  test("stream_resume: file-sink stream resumes from its checkpoint without reprocessing") {
    // exactly-once across restarts: drain half the data, stop, add
    // the other half, restart with the SAME checkpoint + sink — the
    // output must be the full set with no re-emitted rows.
    val src = java.nio.file.Files.createTempDirectory("graft-resume-src")
    val out = java.nio.file.Files.createTempDirectory("graft-resume-out").toString
    val chk = java.nio.file.Files.createTempDirectory("graft-resume-chk").toString
    // ts stays in its on-disk form (TIMESTAMP_NTZ): staged rewrites
    // keep the schema readEventStream declares
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    def stage(cond: org.apache.spark.sql.Column, name: String): Unit = {
      val d = java.nio.file.Files.createTempDirectory(s"graft-stage-$name")
      raw.filter(cond).coalesce(1).write.mode("overwrite").parquet(d.toString)
      val part = java.nio.file.Files.list(d).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet")).head
      // stage atomically: the query is polling src, and a half-copied
      // parquet (missing footer) would fail the micro-batch
      val tmp = java.nio.file.Paths.get(part).resolveSibling(s"$name.parquet")
      java.nio.file.Files.copy(java.nio.file.Paths.get(part), tmp)
      java.nio.file.Files.move(tmp, src.resolve(s"$name.parquet"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    def drain(): Unit = {
      val q = StreamOps.readEventStream(spark, src.toString)
        .select(col("event_id"), col("user_id"), col("value"))
        .writeStream.outputMode("append")
        .format("parquet").option("path", out)
        .option("checkpointLocation", chk)
        .start()
      try { q.processAllAvailable() } finally { q.stop() }
    }
    stage(col("event_id") % 2 === 0, "evens")
    drain()
    val firstIds = spark.read.parquet(out).select("event_id")
      .collect().map(_.getLong(0)).sorted
    stage(col("event_id") % 2 === 1, "odds")
    drain()
    val allIds = spark.read.parquet(out).select("event_id")
      .collect().map(_.getLong(0)).sorted
    val expected = raw.select("event_id").collect().map(_.getLong(0)).sorted
    assert(firstIds.nonEmpty && firstIds.forall(_ % 2 == 0))
    assert(allIds.length == allIds.distinct.length, "restart must not re-emit rows")
    assert(allIds.sameElements(expected), "resume must process exactly the new file")
  }

  test("stream_update_upsert: update-mode aggregation via foreachBatch converges to the batch result") {
    // two micro-batches IN TIME ORDER (batch 2 split mid-window so
    // one window updates across batches): update mode re-emits only
    // changed windows; folding the per-batch updates last-write-wins
    // must converge to the full batch aggregation (foreachBatch = the
    // escape hatch for sinks Spark lacks; the fold is an idempotent
    // upsert). Splitting by anything but event time would make batch
    // 2 late against batch 1's watermark and be legitimately dropped.
    val src = java.nio.file.Files.createTempDirectory("graft-upd-src")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    // ts is TIMESTAMP_NTZ on disk; cutoff = 2024-01-15 00:30 UTC
    // mid-window, as an NTZ literal so the pushed filter stays typed
    val cutoffNtz = java.time.LocalDateTime.of(2024, 1, 15, 0, 30)
    def stage(cond: org.apache.spark.sql.Column, name: String): Unit = {
      val d = java.nio.file.Files.createTempDirectory(s"graft-upd-$name")
      raw.filter(cond).coalesce(1).write.mode("overwrite").parquet(d.toString)
      val part = java.nio.file.Files.list(d).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      // stage atomically: the query is polling src, and a half-copied
      // parquet (missing footer) would fail the micro-batch
      val tmp = java.nio.file.Paths.get(part).resolveSibling(s"$name.parquet")
      java.nio.file.Files.copy(java.nio.file.Paths.get(part), tmp)
      java.nio.file.Files.move(tmp, src.resolve(s"$name.parquet"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    val state = scala.collection.mutable.Map[(java.sql.Timestamp, String), (Long, Double)]()
    stage(col("ts") < lit(cutoffNtz), "first_half")
    val q = StreamOps.windowAgg(StreamOps.readEventStream(spark, src.toString))
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach { r =>
          state.synchronized {
            state((r.getTimestamp(0), r.getString(1))) = (r.getLong(2), r.getDouble(3))
          }
        }
      }
      .start()
    try {
      q.processAllAvailable()
      stage(col("ts") >= lit(cutoffNtz), "second_half")
      q.processAllAvailable()
    } finally q.stop()
    val expected = operators.Events.q30EventWindowAgg(spark, sfDir).collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(state.nonEmpty && state.toMap == expected)
  }

  test("stream_outer_join: LEFT OUTER join nulls unmatched clicks after the watermark") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[StreamOps.Ev]
    val q = StreamOps.clickPurchaseLeftJoin(ms.toDS().toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("loj_out").start()
    try {
      val t0 = java.time.Instant.parse("2024-01-15T00:00:00Z")
      ms.addData(
        StreamOps.Ev(1L, t0, 1L, "click", 0.0),               // will match
        StreamOps.Ev(2L, t0, 2L, "click", 0.0),               // never matches
        StreamOps.Ev(3L, t0.plusSeconds(1800), 1L, "purchase", 9.0))
      q.processAllAvailable()
      // matched row may emit immediately; the unmatched click may NOT
      // until the watermark proves no purchase can still arrive
      val early = spark.table("loj_out").collect()
      assert(!early.exists(r => r.getLong(0) == 2L),
        "unmatched click must not null-emit before the watermark passes")
      // sentinels on BOTH sides: the query's global watermark is the
      // MIN across the two watermark nodes (multipleWatermarkPolicy
      // default), so advancing only clicks leaves the purchase-side
      // watermark at t0+30min and nothing evicts. Eviction runs on
      // the batch after the one that moved the watermark.
      ms.addData(
        StreamOps.Ev(4L, t0.plusSeconds(6 * 3600), 9L, "click", 0.0),
        StreamOps.Ev(5L, t0.plusSeconds(6 * 3600), 8L, "purchase", 0.0))
      q.processAllAvailable()
      ms.addData(
        StreamOps.Ev(6L, t0.plusSeconds(6 * 3600 + 10), 9L, "click", 0.0),
        StreamOps.Ev(7L, t0.plusSeconds(6 * 3600 + 10), 8L, "purchase", 0.0))
      q.processAllAvailable()
      val rows = spark.table("loj_out")
        .select("user_id", "click_id", "purchase_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
        .toSet
      assert(rows.contains((1L, 1L, 3L)), "matched pair must appear")
      assert(rows.contains((2L, 2L, -1L)),
        "unmatched click must null-emit once the watermark proves absence")
      assert(!rows.contains((1L, 1L, -1L)), "matched click must not also null-emit")
    } finally q.stop()
  }

  test("stream_session_timeout: sessionizeWithTimeout closes an idle session via event-time timeout alone") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[StreamOps.Ev]
    val q = StreamOps.sessionizeWithTimeout(ms.toDS(), "1 minute")
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_timeout_out").start()
    try {
      val t0 = java.time.Instant.parse("2024-01-15T00:00:00Z")
      ms.addData(
        StreamOps.Ev(1L, t0, 42L, "click", 1.0),
        StreamOps.Ev(2L, t0.plusSeconds(60), 42L, "click", 2.5))
      q.processAllAvailable()
      assert(spark.table("sess_timeout_out").isEmpty,
        "session still open, nothing may be emitted")
      // events from ANOTHER user push the watermark past user 42's
      // last event + gap; user 42 itself never sends again and no
      // batch flush runs — the idle session must close via timeout.
      // (Watermark advances at batch END, so the timeout fires in the
      // batch after the one that moved it.)
      ms.addData(StreamOps.Ev(3L, t0.plusSeconds(7200), 7L, "click", 0.0))
      q.processAllAvailable()
      ms.addData(StreamOps.Ev(4L, t0.plusSeconds(7210), 7L, "click", 0.0))
      q.processAllAvailable()
      val got = spark.table("sess_timeout_out")
        .filter(col("user_id") === 42L).collect()
      assert(got.length == 1, s"timeout must close exactly one session, got ${got.length}")
      val r = got(0)
      assert(r.getLong(4) == 2L, "both events belong to the closed session")
      assert(r.getDouble(5) == 3.5)
      assert(r.getTimestamp(2).toInstant == t0 &&
        r.getTimestamp(3).toInstant == t0.plusSeconds(60))
    } finally q.stop()
  }

  test("stream_sessionize emits exactly the closed sessions of the batch twin") {
    import spark.implicits._
    val stream = StreamOps.readEventStream(spark, streamDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[StreamOps.Ev]
    val q = StreamOps.sessionize(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("sess_out")
      .withColumn("session_value", round(col("session_value"), 2))
      .orderBy(col("user_id"), col("session_id"))
      .collect().toSeq
    val expected = StreamOps.closedSessionsBatch(spark, sfDir)
      .withColumn("session_value", round(col("session_value"), 2))
      .orderBy(col("user_id"), col("session_id"))
      .collect().toSeq
    assert(got.nonEmpty && got == expected)
  }

  test("stream_anomaly emits exactly the batch q52 rows") {
    import spark.implicits._
    val stream = StreamOps.readEventStream(spark, streamDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[StreamOps.Ev]
    val q = StreamOps.anomalyStream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("anom_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("anom_out")
      .orderBy(col("user_id"), col("ts_us"), col("event_id"))
      .collect().toSeq.map(_.toSeq)
    val expected = operators.Events.q52RollingAnomaly(spark, sfDir)
      .collect().toSeq.map(_.toSeq)
    assert(got.nonEmpty && got == expected,
      s"stream/batch drift: ${got.size} vs ${expected.size}")
  }

  test("built-in session_window assembles the same sessions as q31") {
    // Spark's native session_window (usable batch AND streaming) must
    // agree with the hand-rolled gap logic (q31 / flatMapGroupsWithState
    // twin) on membership and metrics. Boundary note: session_window
    // splits at gap >= 30min where q31 splits at > 30min — the corpus
    // has no exact-boundary gap (checked), so disagreement here means
    // a real sessionization bug, not tie semantics.
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime,
        r.getLong(3), r.getDouble(4))
    val ev = Tables.events(spark, sfDir)
    val built = ev
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("session_value"))
      .select("user_id", "session_start", "session_end", "n_events", "session_value")
      .collect().map(key).sorted.toSeq
    val custom = operators.Events.q31Sessionize(spark, sfDir)
      .select("user_id", "session_start", "session_end", "n_events", "session_value")
      .collect().map(key).sorted.toSeq
    assert(built.nonEmpty && built == custom,
      s"session_window diverged from q31: ${built.length} vs ${custom.length} sessions")
  }

  test("late rows beyond the watermark are dropped AND accounted for") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft-late")
    val t0 = 1700000000L // epoch seconds
    // NTZ rows so the staged files carry the schema readEventStream
    // declares (the current testdata generation's timestamp[us])
    def ldt(sec: Long): java.time.LocalDateTime =
      java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC)
    def stage(name: String,
              rows: Seq[(Long, java.time.LocalDateTime, Long, String, Double, String)]): Unit = {
      val d = java.nio.file.Files.createTempDirectory(s"graft-late-$name")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(d.toString)
      val part = java.nio.file.Files.list(d).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      java.nio.file.Files.move(java.nio.file.Paths.get(part),
        src.resolve(s"$name.parquet"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    val q = StreamOps.windowAgg(
      StreamOps.readEventStream(spark, src.toString))
      .writeStream.outputMode("append")
      .format("memory").queryName("late_out").start()
    try {
      // batch 1 advances the watermark to t0+6h-2h = t0+4h
      stage("b1", Seq(
        (1L, ldt(t0), 10L, "click", 1.0, "{}"),
        (2L, ldt(t0 + 6 * 3600), 11L, "click", 1.0, "{}")))
      q.processAllAvailable()
      // batch 2: an event 3h BEFORE the watermark — its window closed
      stage("b2", Seq((3L, ldt(t0 + 3600), 12L, "click", 1.0, "{}")))
      q.processAllAvailable()
      val dropped = q.recentProgress
        .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
      assert(dropped >= 1,
        "the late row must be dropped by the watermark AND visible in metrics")
    } finally q.stop()
  }

  test("stream_cdc_upsert: micro-batches upsert into partitioned parquet, touching only their partitions") {
    import spark.implicits._
    import graft.sources.Sources
    val base = java.nio.file.Files.createTempDirectory("graft-cdc").toString
    val target = s"$base/t"
    Seq((1L, "p1", "old1"), (2L, "p1", "old2"), (3L, "p2", "old3"),
      (4L, "p3", "old4"))
      .toDF("id", "part", "payload")
      .write.partitionBy("part").parquet(target)
    def p3Files = new java.io.File(s"$target/part=p3").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified)).toSeq
    val before = p3Files
    // stage two CDC files; maxFilesPerTrigger=1 forces two sequential
    // micro-batches (an update-then-insert ordering, the CDC shape)
    val src = java.nio.file.Files.createTempDirectory("graft-cdc-src").toString
    Seq((2L, "p1", "NEW2")).toDF("id", "part", "payload")
      .coalesce(1).write.parquet(s"$src/a")
    Seq((5L, "p2", "NEW5"), (2L, "p1", "NEWER2")).toDF("id", "part", "payload")
      .coalesce(1).write.parquet(s"$src/b")
    new java.io.File(src).listFiles().filter(_.isDirectory).foreach { d =>
      val f = d.listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(src, s"${d.getName}.parquet"))
    }
    // the file source orders micro-batches by file timestamp — pin
    // distinct mtimes so a (update) strictly precedes b (newer update)
    new java.io.File(s"$src/a.parquet").setLastModified(System.currentTimeMillis() - 60000)
    new java.io.File(s"$src/b.parquet").setLastModified(System.currentTimeMillis())
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("part", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val chk = java.nio.file.Files.createTempDirectory("graft-cdc-chk").toString
    val q = StreamOps.cdcUpsert(stream, target, "id", "part")
      .option("checkpointLocation", chk).start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.read.parquet(target)
      .select(col("id"), col("payload"), col("part"))
      .orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    // id=2 was upserted twice across micro-batches: last write wins
    assert(got == Seq((1L, "old1", "p1"), (2L, "NEWER2", "p1"),
      (3L, "old3", "p2"), (4L, "old4", "p3"), (5L, "NEW5", "p2")),
      s"unexpected table state: $got")
    assert(p3Files == before, "untouched partition rewritten by CDC upsert")
  }

  test("stream_gmm_assign: streamed posterior scoring equals the batch " +
    "soft model bit-for-bit; ticks normalize") {
    import org.apache.spark.sql.types._
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    // one trained model, broadcast to both paths (the s02 contract)
    val model = Similarity.gmmSoftModelRow(emb).localCheckpoint(true)
    val probe = emb.filter(col("vec_id") < 5)
    val src = java.nio.file.Files.createTempDirectory("graft-gmm-stream")
    probe.coalesce(1).write.mode("overwrite").parquet(src.toString)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val stream = spark.readStream.schema(schema).parquet(src.toString)
    val got = scala.collection.mutable.Set[Seq[Any]]()
    val q = StreamOps.gmmAssignStream(stream, model)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamOps.gmmAssignBatch(df).collect().foreach(r =>
          got.synchronized { got += r.toSeq })
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val expected = StreamOps.gmmAssignBatch(
      StreamOps.gmmAssignStream(probe, model)).collect().map(_.toSeq).toSet
    assert(got.nonEmpty && got.toSet == expected,
      s"streaming GMM posteriors diverged: ${got.toSet} vs $expected")
    // the s35 normalization contract holds row-wise on the stream
    // output: ticks sum to 2^20 within K half-ulp roundings, the
    // norm boolean is true, the component is a valid index
    got.foreach { r =>
      val ticks = (1 to Similarity.GmmK).map(i => r(i).asInstanceOf[Long])
      assert(math.abs(ticks.sum - 1048576L) <= Similarity.GmmK,
        s"ticks do not normalize: $r")
      val comp = r(Similarity.GmmK + 1).asInstanceOf[Long]
      assert(comp >= 0 && comp < Similarity.GmmK, s"bad component: $r")
      assert(r(Similarity.GmmK + 2).asInstanceOf[Boolean], s"norm_ok false: $r")
    }
  }

  test("stream_lda_assign: streamed posterior fold-in equals the batch " +
    "fold-in row-for-row; ticks normalize; seed docs recover topics") {
    import org.apache.spark.sql.types._
    import graft.operators.Recommend
    // one trained model, broadcast to both paths (the gmm contract)
    val model = Recommend.ldaServeModel(
      Recommend.ldaCorpusTf(spark, sfDir)).localCheckpoint(true)
    val probe = Tables.documents(spark, sfDir)
      .select("doc_id", "text").filter(col("doc_id") < 5)
    val src = java.nio.file.Files.createTempDirectory("graft-lda-stream")
    probe.coalesce(1).write.mode("overwrite").parquet(src.toString)
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType)))
    val stream = spark.readStream.schema(schema).parquet(src.toString)
    val got = scala.collection.mutable.Set[Seq[Any]]()
    val q = StreamOps.ldaAssignStream(stream, model)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamOps.ldaAssignBatch(df, model).collect().foreach(r =>
          got.synchronized { got += r.toSeq })
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val expected = StreamOps.ldaAssignBatch(
      StreamOps.ldaAssignStream(probe, model), model)
      .collect().map(_.toSeq).toSet
    assert(got.nonEmpty && got.toSet == expected,
      s"streaming LDA posteriors diverged: ${got.toSet} vs $expected")
    val K = Recommend.LdaK
    got.foreach { r =>
      val ticks = (1 to K).map(i => r(i).asInstanceOf[Long])
      assert(ticks.forall(_ >= 0L), s"negative tick: $r")
      assert(math.abs(ticks.sum - 1048576L) <= K.toLong,
        s"ticks do not normalize: $r")
      val topic = r(K + 1).asInstanceOf[Long]
      assert(topic >= 0 && topic < K, s"bad topic: $r")
      assert(r(K + 2).asInstanceOf[Boolean], s"norm_ok false: $r")
    }
    // determinism of the whole serve path
    assert(StreamOps.ldaAssignBatch(
      StreamOps.ldaAssignStream(probe, model), model)
      .collect().map(_.toSeq).toSet == expected)
  }

  test("stream_ann_probe: probe of the static band index equals batch s02") {
    import org.apache.spark.sql.types._
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    // the bits contract: ONE corpus-derived value passed to BOTH the
    // batch index and the stream probe (batch s02 derives the same
    // value internally, so stream==batch holds at any corpus size)
    val bits = graft.operators.Similarity.annBitsFor(emb.count())
    val index = StreamOps.corpusBandIndexAnn(emb, bits).localCheckpoint(true)
    val src = java.nio.file.Files.createTempDirectory("graft-ann-stream")
    emb.filter(col("vec_id") < 5)
      .coalesce(1).write.mode("overwrite").parquet(src.toString)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val stream = spark.readStream.schema(schema).parquet(src.toString)
    val got = scala.collection.mutable.Set[(Long, Long, Double, Long)]()
    val q = StreamOps.annProbeStream(stream, index, bits)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamOps.annTopKBatch(df).collect().foreach(r =>
          got.synchronized {
            got += ((r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
          })
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val expected = graft.operators.Similarity.s02AnnLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got.nonEmpty && got.toSet == expected,
      s"streaming ANN diverged from batch s02: ${got.size} vs ${expected.size}")
  }

  test("stream_contamination: bloom contamination equals the batch d06/d12 report") {
    import graft.operators.Dedup
    val (bench, _) = Dedup.contaminationFrames(spark, sfDir)
    val bloom = Dedup.benchmarkBloom(bench)
    assert(bloom != null)
    val benchSet = bench.localCheckpoint(true) // static side, read per batch
    // stage the corpus (non-benchmark docs) as one streamed file; the
    // per-doc rollup is within-batch, so batch boundaries only need to
    // respect document boundaries (they do: rows derive per doc row)
    val src = java.nio.file.Files.createTempDirectory("graft-d06-stream")
    Tables.documents(spark, sfDir).filter(col("source") =!= "src0")
      .select("doc_id", "source", "text")
      .coalesce(1).write.mode("overwrite").parquet(src.toString)
    val stream = spark.readStream.schema(StreamOps.documentSchema)
      .parquet(src.toString).select(col("doc_id"), col("text"))
    val got = scala.collection.mutable.Map[Long, (Long, Long, Double, Boolean)]()
    val q = StreamOps.contaminationStream(stream, bloom)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamOps.contaminationReportBatch(df, benchSet).collect().foreach { r =>
          got.synchronized {
            got(r.getLong(0)) = (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))
          }
        }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val expected = Dedup.d06Contamination(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(got.nonEmpty && got.toMap == expected,
      s"stream report diverged: ${got.size} vs ${expected.size} docs")
  }

  test("stream_drift: folded tick state reports exactly the batch q53 KS") {
    // two staged halves split by event_id (value-tick counts carry no
    // time semantics, so any split works); the sink folds each
    // batch's (type, tick) counts by the monoid merge and the final
    // report must equal batch q53 over the whole corpus row-for-row.
    val src = java.nio.file.Files.createTempDirectory("graft-drift-src")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val mid = raw.agg(org.apache.spark.sql.functions.expr(
      "percentile_approx(event_id, 0.5)")).head().getLong(0)
    def stage(cond: org.apache.spark.sql.Column, name: String): Unit = {
      val d = java.nio.file.Files.createTempDirectory(s"graft-drift-$name")
      raw.filter(cond).coalesce(1).write.mode("overwrite").parquet(d.toString)
      val part = java.nio.file.Files.list(d).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      val tmp = java.nio.file.Paths.get(part).resolveSibling(s"$name.parquet")
      java.nio.file.Files.copy(java.nio.file.Paths.get(part), tmp)
      java.nio.file.Files.move(tmp, src.resolve(s"$name.parquet"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    var state: Option[org.apache.spark.sql.DataFrame] = None
    var batches = 0
    stage(col("event_id") <= mid, "first_half")
    val q = StreamOps.readEventStream(spark, src.toString)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val delta = StreamOps.driftCountsBatch(df)
        this.synchronized {
          val merged = state.map(s => StreamOps.driftMerge(s, delta))
            .getOrElse(delta).localCheckpoint(true)
          state.foreach(_.unpersist())
          state = Some(merged)
          batches += 1
        }
        ()
      }.start()
    try {
      q.processAllAvailable()
      stage(col("event_id") > mid, "second_half")
      q.processAllAvailable()
    } finally q.stop()
    assert(batches >= 2, "the fold must have crossed a batch boundary")
    val got = StreamOps.driftReport(state.get).collect().toSeq
    val expected = operators.Events.q53KsTest(spark, sfDir).collect().toSeq
    assert(got.nonEmpty && got == expected,
      s"drift report diverged from batch q53: $got vs $expected")
  }

  test("stream_funnel: stage emissions fold to the batch q32 counts") {
    // time-ordered halves (the update-mode posture: splitting by
    // anything but event time would break the per-user ordering
    // contract the greedy fold rides); the sink folds distinct users
    // per stage and must match the batch q32 row exactly.
    val src = java.nio.file.Files.createTempDirectory("graft-funnel-src")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val cutoffNtz = java.time.LocalDateTime.of(2024, 1, 15, 0, 30)
    def stage(cond: org.apache.spark.sql.Column, name: String): Unit = {
      val d = java.nio.file.Files.createTempDirectory(s"graft-funnel-$name")
      raw.filter(cond).coalesce(1).write.mode("overwrite").parquet(d.toString)
      val part = java.nio.file.Files.list(d).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      val tmp = java.nio.file.Paths.get(part).resolveSibling(s"$name.parquet")
      java.nio.file.Files.copy(java.nio.file.Paths.get(part), tmp)
      java.nio.file.Files.move(tmp, src.resolve(s"$name.parquet"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    val reached = scala.collection.mutable.Map[String,
      scala.collection.mutable.Set[Long]]()
    stage(col("ts") < lit(cutoffNtz), "first_half")
    import spark.implicits._
    val q = StreamOps.funnelStream(
        StreamOps.readEventStream(spark, src.toString).as[StreamOps.Ev])
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamOps.FunnelOut],
          _: Long) =>
        df.collect().foreach { o =>
          reached.synchronized {
            reached.getOrElseUpdate(o.stage,
              scala.collection.mutable.Set.empty) += o.user_id
          }
        }
        ()
      }.start()
    try {
      q.processAllAvailable()
      stage(col("ts") >= lit(cutoffNtz), "second_half")
      q.processAllAvailable()
    } finally q.stop()
    val batch = operators.Events.q32EventFunnel(spark, sfDir).head()
    assert(reached("signup").size.toLong == batch.getLong(0),
      "signup count diverged")
    assert(reached("click_after").size.toLong == batch.getLong(1),
      "click-after count diverged")
    assert(reached("purchase_after").size.toLong == batch.getLong(2),
      "purchase-after count diverged")
    // a stage can only be reached once per user (append-once contract)
    assert(reached.values.forall(_.nonEmpty))
  }

  test("stream_pack: per-shard cursors reproduce batch p02 row-for-row") {
    // halves split by doc_id — the batch packing order is doc_id
    // within each shard, so a doc_id split preserves every shard's
    // arrival-order contract while forcing the cursor state to
    // carry across a batch boundary.
    val src = java.nio.file.Files.createTempDirectory("graft-pack-src")
    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
    val mid = raw.agg(org.apache.spark.sql.functions.expr(
      "percentile_approx(doc_id, 0.5)")).head().getLong(0)
    def stage(cond: org.apache.spark.sql.Column, name: String): Unit = {
      val d = java.nio.file.Files.createTempDirectory(s"graft-pack-$name")
      raw.filter(cond).coalesce(1).write.mode("overwrite").parquet(d.toString)
      val part = java.nio.file.Files.list(d).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      val tmp = java.nio.file.Paths.get(part).resolveSibling(s"$name.parquet")
      java.nio.file.Files.copy(java.nio.file.Paths.get(part), tmp)
      java.nio.file.Files.move(tmp, src.resolve(s"$name.parquet"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    val got = scala.collection.mutable.Map[Long, (Long, Long, Long, Long, Boolean)]()
    stage(col("doc_id") <= mid, "first_half")
    val stream = spark.readStream.schema(StreamOps.documentSchema)
      .parquet(src.toString)
    val q = StreamOps.packStream(stream)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamOps.PackOut],
          _: Long) =>
        df.collect().foreach { o =>
          got.synchronized {
            got(o.doc_id) =
              (o.shard, o.n_tokens, o.start_offset, o.chunk_id, o.spans_boundary)
          }
        }
        ()
      }.start()
    try {
      q.processAllAvailable()
      stage(col("doc_id") > mid, "second_half")
      q.processAllAvailable()
    } finally q.stop()
    val expected = operators.Pipeline.p02PackChunks(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5))))
      .toMap
    assert(got.nonEmpty && got.toMap == expected,
      s"stream packing diverged: ${got.size} vs ${expected.size} docs")
  }

  test("stream_ab_test: folded arm counts reproduce the batch rank-sum exactly") {
    import org.apache.spark.sql.types._
    val ev = Tables.events(spark, sfDir).select("event_id", "user_id", "value")
    val h1 = ev.filter(col("event_id") % 2 === 0).localCheckpoint(true)
    val h2 = ev.filter(col("event_id") % 2 === 1).localCheckpoint(true)
    val srcDir = java.nio.file.Files.createTempDirectory("graft-ab-stream")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("value", DoubleType)))
    var state: org.apache.spark.sql.DataFrame = null
    val q = spark.readStream.schema(schema).parquet(srcDir.toString)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!df.isEmpty) {
          val delta = StreamOps.abCountsBatch(df)
          state = (if (state == null) delta
            else StreamOps.driftMerge(state, delta)).localCheckpoint(true)
        }
        ()
      }.start()
    try {
      h1.coalesce(1).write.mode("append").parquet(srcDir.toString)
      q.processAllAvailable()
      h2.coalesce(1).write.mode("append").parquet(srcDir.toString)
      q.processAllAvailable()
    } finally q.stop()
    // after both batches the stream report equals the batch rank-sum
    // over ALL events, row for row
    val got = StreamOps.abTestReport(state).collect().toSeq
    val want = StreamOps.abTestReport(StreamOps.abCountsBatch(ev)).collect().toSeq
    assert(got.nonEmpty && got == want, s"stream/batch divergence:\n$got\n$want")
    // one (A, B) pair; sample sizes cover the corpus; U in range
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(2) + r.getLong(3) == ev.count())
    assert(r.getLong(4) >= 0L && r.getLong(4) <= 2L * r.getLong(2) * r.getLong(3))
  }

  test("stream_t_test: the parametric twin on the same folded state " +
    "reproduces batch q59 exactly") {
    import org.apache.spark.sql.types._
    val ev = Tables.events(spark, sfDir).select("event_id", "user_id", "value")
    val h1 = ev.filter(col("event_id") % 2 === 0).localCheckpoint(true)
    val h2 = ev.filter(col("event_id") % 2 === 1).localCheckpoint(true)
    val srcDir = java.nio.file.Files.createTempDirectory("graft-tt-stream")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("value", DoubleType)))
    var state: org.apache.spark.sql.DataFrame = null
    val q = spark.readStream.schema(schema).parquet(srcDir.toString)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!df.isEmpty) {
          val delta = StreamOps.abCountsBatch(df)
          state = (if (state == null) delta
            else StreamOps.driftMerge(state, delta)).localCheckpoint(true)
        }
        ()
      }.start()
    try {
      h1.coalesce(1).write.mode("append").parquet(srcDir.toString)
      q.processAllAvailable()
      h2.coalesce(1).write.mode("append").parquet(srcDir.toString)
      q.processAllAvailable()
    } finally q.stop()
    // after both batches the parametric report equals batch q59's
    // machinery over ALL events, row for row (same fold as rank-sum —
    // ONE state frame serves both members)
    val got = StreamOps.tTestReport(state).collect().toSeq
    val want = StreamOps.tTestReport(StreamOps.abCountsBatch(ev)).collect().toSeq
    assert(got.nonEmpty && got == want, s"stream/batch divergence:\n$got\n$want")
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(2) + r.getLong(3) == ev.count())
    // ticks non-negative; Welch dof within (min(n)-1, n_a+n_b-2]
    assert(r.getLong(7) >= 0L && r.getLong(8) >= 0L)
    val dof = r.getLong(9).toDouble / 1048576.0
    assert(dof <= (r.getLong(2) + r.getLong(3) - 2).toDouble + 1e-9 &&
      dof >= (math.min(r.getLong(2), r.getLong(3)) - 1).toDouble - 1e-9,
      s"Welch dof out of range: $dof")
  }

  test("stream_moments: folded power sums reproduce the batch " +
    "skew/kurtosis report exactly") {
    import org.apache.spark.sql.types._
    val ev = Tables.events(spark, sfDir)
      .select("event_id", "event_type", "value")
    val h1 = ev.filter(col("event_id") % 2 === 0).localCheckpoint(true)
    val h2 = ev.filter(col("event_id") % 2 === 1).localCheckpoint(true)
    val srcDir = java.nio.file.Files.createTempDirectory("graft-mom-stream")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    var state: org.apache.spark.sql.DataFrame = null
    val q = spark.readStream.schema(schema).parquet(srcDir.toString)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!df.isEmpty) {
          val delta = StreamOps.momentsBatch(df)
          state = (if (state == null) delta
            else StreamOps.momentsMerge(state, delta)).localCheckpoint(true)
        }
        ()
      }.start()
    try {
      h1.coalesce(1).write.mode("append").parquet(srcDir.toString)
      q.processAllAvailable()
      h2.coalesce(1).write.mode("append").parquet(srcDir.toString)
      q.processAllAvailable()
    } finally q.stop()
    val got = StreamOps.momentsReport(state).collect().toSeq
    val want = StreamOps.momentsReport(StreamOps.momentsBatch(ev)).collect().toSeq
    assert(got.nonEmpty && got == want, s"stream/batch divergence:\n$got\n$want")
    // all five types, counts cover the corpus, m2 > 0 on real data
    assert(got.length == 5)
    assert(got.map(_.getLong(1)).sum == ev.count())
    got.foreach { r =>
      assert(r.getLong(1) * r.getLong(3) > r.getLong(2) * r.getLong(2),
        s"n*s2 must exceed s1^2 on non-constant data: $r")
    }
  }

  test("stream_recommend: streamed serve rows are bit-equal to batch s25") {
    import org.apache.spark.sql.types._
    val (users, items) = graft.operators.Recommend.purchaseFactors(spark, sfDir)
    val (u, it) = (users.localCheckpoint(true), items.localCheckpoint(true))
    val custs = u.select(col("c").as("o_custkey")).localCheckpoint(true)
    val h1 = custs.filter(col("o_custkey") % 2 === 0).localCheckpoint(true)
    val h2 = custs.filter(col("o_custkey") % 2 === 1).localCheckpoint(true)
    val srcDir = java.nio.file.Files.createTempDirectory("graft-rec-stream")
    val schema = StructType(Seq(StructField("o_custkey", LongType)))
    val served = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    val q = spark.readStream.schema(schema).parquet(srcDir.toString)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!df.isEmpty)
          served ++= StreamOps.recommendServeBatch(df, u, it).collect()
        ()
      }.start()
    try {
      h1.coalesce(1).write.mode("append").parquet(srcDir.toString)
      q.processAllAvailable()
      h2.coalesce(1).write.mode("append").parquet(srcDir.toString)
      q.processAllAvailable()
    } finally q.stop()
    val got = served.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).sortBy(t => (t._1, t._2))
    val want = graft.operators.Recommend.s25RecommendTopk(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(t => (t._1, t._2))
    assert(got.nonEmpty && got.toSeq == want.toSeq,
      s"streamed serve diverged: ${got.length} vs ${want.length} rows")
  }

  test("stream_graph_ann: streamed beam-search serve is bit-equal to batch s33") {
    import org.apache.spark.sql.types._
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).localCheckpoint(true)
    val graph = graft.operators.Similarity.refinedKnnGraph(spark, sfDir)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .localCheckpoint(true)
    val h1 = queries.filter(col("query_id") % 2 === 0).localCheckpoint(true)
    val h2 = queries.filter(col("query_id") % 2 === 1).localCheckpoint(true)
    val srcDir = java.nio.file.Files.createTempDirectory("graft-gann-stream")
    val schema = StructType(Seq(StructField("query_id", LongType),
      StructField("qv", ArrayType(FloatType))))
    val served = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    val q = spark.readStream.schema(schema).parquet(srcDir.toString)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!df.isEmpty)
          served ++= StreamOps.graphAnnServeBatch(df, emb, graph).collect()
        ()
      }.start()
    try {
      h1.coalesce(1).write.mode("append").parquet(srcDir.toString)
      q.processAllAvailable()
      h2.coalesce(1).write.mode("append").parquet(srcDir.toString)
      q.processAllAvailable()
    } finally q.stop()
    val got = served.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getLong(3))).sortBy(t => (t._1, t._4))
    val want = graft.operators.Similarity.s33GraphAnn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).sortBy(t => (t._1, t._4))
    assert(got.nonEmpty && got.toSeq == want.toSeq,
      s"streamed beam serve diverged: ${got.length} vs ${want.length} rows")
  }

  test("stream_ovr: streamed multi-class serve is bit-equal to batch " +
    "q63 predictions for the same rows") {
    import org.apache.spark.sql.types._
    val sess = spark
    import sess.implicits._
    import graft.operators.Relational
    // the q63 one-hot planted geometry trains a diagonal model
    val train = (
      (1 to 10).map(_ => ("A", 4096L, 4096L, 0L, 0L)) ++
      (1 to 10).map(_ => ("N", 4096L, 0L, 4096L, 0L)) ++
      (1 to 10).map(_ => ("R", 4096L, 0L, 0L, 4096L))
    ).toDF("flag", "f0", "f1", "f2", "f3")
    val model = Relational.ovrModel(train).localCheckpoint(true)
    // serve rows: one per class geometry plus an all-zero tie row
    val rows = Seq(
      (1L, 4096L, 4096L, 0L, 0L), (2L, 4096L, 0L, 4096L, 0L),
      (3L, 4096L, 0L, 0L, 4096L), (4L, 0L, 0L, 0L, 0L))
      .toDF("row_id", "f0", "f1", "f2", "f3")
    val h1 = rows.filter(col("row_id") <= 2L).localCheckpoint(true)
    val h2 = rows.filter(col("row_id") > 2L).localCheckpoint(true)
    val srcDir = java.nio.file.Files.createTempDirectory("graft-ovr-stream")
    val schema = StructType(Seq("row_id", "f0", "f1", "f2", "f3")
      .map(StructField(_, LongType)))
    val served = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val q = spark.readStream.schema(schema).parquet(srcDir.toString)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!df.isEmpty)
          served ++= StreamOps.ovrServeBatch(df, model)
            .select(col("row_id"), col("predicted")).collect()
            .map(r => (r.getLong(0), r.getString(1)))
        ()
      }.start()
    try {
      h1.coalesce(1).write.mode("append").parquet(srcDir.toString)
      q.processAllAvailable()
      h2.coalesce(1).write.mode("append").parquet(srcDir.toString)
      q.processAllAvailable()
    } finally q.stop()
    val want = Relational.ovrPredict(rows, model)
      .select(col("row_id"), col("predicted")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(served.toSeq.sorted == want,
      s"stream/batch drift: ${served.toSeq.sorted} vs $want")
    // the trained model separates the one-hot geometry; the zero row
    // ties every margin at 0 and must break to the first class
    assert(want == Seq((1L, "A"), (2L, "N"), (3L, "R"), (4L, "A")))
  }

  test("stream_poisson: streamed GLM folds equal sequential hand folds " +
    "and climb toward the planted mean") {
    import org.apache.spark.sql.types._
    val sess = spark
    import sess.implicits._
    // constant plant y = 8: from w = 0 the PL-exp2 gives mu = 1, the
    // mean gradient is -7*2^36/n per weight-tick of f0, and the
    // trust region clamps each batch's intercept move to +256
    val feats = (1 to 16).map(i => (8L, 4096L, 0L, 0L, i.toLong))
      .toDF("y", "f0", "f1", "f2", "idx")
    val h1 = feats.filter(col("idx") <= 8L).drop("idx").localCheckpoint(true)
    val h2 = feats.filter(col("idx") > 8L).drop("idx").localCheckpoint(true)
    val srcDir = java.nio.file.Files.createTempDirectory("graft-pois-stream")
    val schema = StructType(Seq("y", "f0", "f1", "f2")
      .map(StructField(_, LongType)))
    var state = StreamOps.poissonInitState(spark).localCheckpoint(true)
    val init = state
    val q = spark.readStream.schema(schema).parquet(srcDir.toString)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!df.isEmpty)
          state = StreamOps.poissonFoldBatch(state, df).localCheckpoint(true)
        ()
      }.start()
    try {
      h1.coalesce(1).write.mode("append").parquet(srcDir.toString)
      q.processAllAvailable()
      h2.coalesce(1).write.mode("append").parquet(srcDir.toString)
      q.processAllAvailable()
    } finally q.stop()
    val expected = StreamOps.poissonFoldBatch(
      StreamOps.poissonFoldBatch(init, h1), h2)
    val got = state.collect().head
    val want = expected.collect().head
    assert((0 to 2).forall(j => got.getLong(j) == want.getLong(j)),
      s"streamed model diverged: $got vs $want")
    // two clamped +256 intercept steps toward log2(8) = 3 (12288)
    assert(got.getLong(0) == 2L * StreamOps.PoisStreamStep,
      s"intercept ${got.getLong(0)}")
    assert(got.getLong(1) == 0L && got.getLong(2) == 0L,
      "absent features must stay zero")
  }

  test("stream_linreg: streamed GD folds equal sequential batch folds and learn") {
    import org.apache.spark.sql.types._
    val sess = spark
    import sess.implicits._
    // planted stream: y = 2*x1 exactly, on-grid
    val feats = (1 to 16).map { i =>
      val f1 = (i % 4 + 1) * 1024L
      (2L * f1, 4096L, f1, 0L, 0L)
    }.toDF("y12", "f0", "f1", "f2", "f3")
    val h1 = feats.filter(col("f1") <= 2048L).localCheckpoint(true)
    val h2 = feats.filter(col("f1") > 2048L).localCheckpoint(true)
    val srcDir = java.nio.file.Files.createTempDirectory("graft-lr-stream")
    val schema = StructType(Seq("y12", "f0", "f1", "f2", "f3")
      .map(StructField(_, LongType)))
    var state = StreamOps.linregInitState(spark).localCheckpoint(true)
    val init = state
    val q = spark.readStream.schema(schema).parquet(srcDir.toString)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!df.isEmpty)
          state = StreamOps.linregFoldBatch(state, df).localCheckpoint(true)
        ()
      }.start()
    try {
      h1.coalesce(1).write.mode("append").parquet(srcDir.toString)
      q.processAllAvailable()
      h2.coalesce(1).write.mode("append").parquet(srcDir.toString)
      q.processAllAvailable()
    } finally q.stop()
    val expected = StreamOps.linregFoldBatch(
      StreamOps.linregFoldBatch(init, h1), h2)
    val got = state.collect().head
    val want = expected.collect().head
    assert((0 to 3).forall(j => got.getLong(j) == want.getLong(j)),
      s"streamed model diverged: $got vs $want")
    // the model learns the right direction: positive slope and
    // intercept after two steps on y = 2*x1 > 0 data
    assert(got.getLong(1) > 0L, s"slope ${got.getLong(1)}")
    assert(got.getLong(2) == 0L && got.getLong(3) == 0L,
      "absent features must stay zero")
  }

  test("stream_mlp: streamed backprop folds equal hand folds; both layers move") {
    import org.apache.spark.sql.types._
    val sess = spark
    import sess.implicits._
    // planted nonlinearity split across two ordered batches
    val rows = (-8 to 8).map { i =>
      val f1 = i * 256L
      (math.abs(f1 - 2048L) / 8L, 4096L, f1, 0L, 0L)
    }
    val h1 = rows.take(9).toDF("y12", "f0", "f1", "f2", "f3").localCheckpoint(true)
    val h2 = rows.drop(9).toDF("y12", "f0", "f1", "f2", "f3").localCheckpoint(true)
    val srcDir = java.nio.file.Files.createTempDirectory("graft-mlp-stream")
    val schema = StructType(Seq("y12", "f0", "f1", "f2", "f3")
      .map(StructField(_, LongType)))
    var state = StreamOps.mlpInitState(spark).localCheckpoint(true)
    val init = state
    val q = spark.readStream.schema(schema).parquet(srcDir.toString)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!df.isEmpty)
          state = StreamOps.mlpFoldBatch(state, df).localCheckpoint(true)
        ()
      }.start()
    try {
      h1.coalesce(1).write.mode("append").parquet(srcDir.toString)
      q.processAllAvailable()
      h2.coalesce(1).write.mode("append").parquet(srcDir.toString)
      q.processAllAvailable()
    } finally q.stop()
    val expected = StreamOps.mlpFoldBatch(StreamOps.mlpFoldBatch(init, h1), h2)
    val got = state.collect().head
    val want = expected.collect().head
    val n = got.length
    assert((0 until n).forall(j => got.getLong(j) == want.getLong(j)),
      s"streamed model diverged: $got vs $want")
    // backprop reached both layers across the two folds
    val initRow = init.collect().head
    val H = graft.operators.Relational.MlpHidden
    assert((0 to H).exists(j => got.getLong(j) != initRow.getLong(j)),
      "output layer frozen")
    assert((H + 1 until n).exists(j => got.getLong(j) != initRow.getLong(j)),
      "hidden layer frozen")
  }

  test("stream_huber: streamed robust folds equal hand folds; outlier batch moves it less") {
    import org.apache.spark.sql.types._
    val sess = spark
    import sess.implicits._
    // batch 1: clean y = 2*x1; batch 2: the same plus one huge outlier
    val clean = (1 to 8).map { i =>
      val f1 = (i % 4 + 1) * 1024L
      (2L * f1, 4096L, f1, 0L, 0L)
    }
    val h1 = clean.toDF("y12", "f0", "f1", "f2", "f3").localCheckpoint(true)
    val h2 = (clean :+ ((120000L, 4096L, 1024L, 0L, 0L)))
      .toDF("y12", "f0", "f1", "f2", "f3").localCheckpoint(true)
    val srcDir = java.nio.file.Files.createTempDirectory("graft-huber-stream")
    val schema = StructType(Seq("y12", "f0", "f1", "f2", "f3")
      .map(StructField(_, LongType)))
    var state = StreamOps.linregInitState(spark).localCheckpoint(true)
    val init = state
    val q = spark.readStream.schema(schema).parquet(srcDir.toString)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!df.isEmpty)
          state = StreamOps.huberFoldBatch(state, df).localCheckpoint(true)
        ()
      }.start()
    try {
      h1.coalesce(1).write.mode("append").parquet(srcDir.toString)
      q.processAllAvailable()
      h2.coalesce(1).write.mode("append").parquet(srcDir.toString)
      q.processAllAvailable()
    } finally q.stop()
    val expected = StreamOps.huberFoldBatch(
      StreamOps.huberFoldBatch(init, h1), h2)
    val got = state.collect().head
    val want = expected.collect().head
    assert((0 to 3).forall(j => got.getLong(j) == want.getLong(j)),
      s"streamed model diverged: $got vs $want")
    // robustness: on the outlier batch the clamped fold's intercept
    // moves strictly less than the squared-loss fold's
    val pre = StreamOps.huberFoldBatch(init, h1).localCheckpoint(true)
    val hub = StreamOps.huberFoldBatch(pre, h2).collect().head.getLong(0)
    val sq = StreamOps.linregFoldBatch(pre, h2).collect().head.getLong(0)
    assert(hub < sq, s"clamp must damp the outlier pull: huber $hub vs ls $sq")
    // and it still learns: positive slope, absent features exactly 0
    assert(got.getLong(1) > 0L, s"slope ${got.getLong(1)}")
    assert(got.getLong(2) == 0L && got.getLong(3) == 0L)
  }

  test("stream_quantile: streamed pinball folds equal hand folds; " +
    "first-fold intercepts pin at tau*step/4 and order") {
    import org.apache.spark.sql.types._
    val sess = spark
    import sess.implicits._
    // all-positive plant: y in {4..16}*256, intercept-only features
    val feats = (1 to 16).map(i => ((i % 4 + 4) * 1024L, 4096L, 0L, 0L, 0L))
      .toDF("y12", "f0", "f1", "f2", "f3")
    val h1 = feats.filter(col("y12") <= 6144L).localCheckpoint(true)
    val h2 = feats.filter(col("y12") > 6144L).localCheckpoint(true)
    val srcDir = java.nio.file.Files.createTempDirectory("graft-qr-stream")
    val schema = StructType(Seq("y12", "f0", "f1", "f2", "f3")
      .map(StructField(_, LongType)))
    var state = StreamOps.quantileInitState(spark).localCheckpoint(true)
    val init = state
    val q = spark.readStream.schema(schema).parquet(srcDir.toString)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!df.isEmpty)
          state = StreamOps.quantileFoldBatch(state, df).localCheckpoint(true)
        ()
      }.start()
    try {
      h1.coalesce(1).write.mode("append").parquet(srcDir.toString)
      q.processAllAvailable()
      h2.coalesce(1).write.mode("append").parquet(srcDir.toString)
      q.processAllAvailable()
    } finally q.stop()
    val expected = StreamOps.quantileFoldBatch(
      StreamOps.quantileFoldBatch(init, h1), h2)
    val got = state.collect().map(r =>
      r.getLong(0) -> (1 to 4).map(r.getLong).toSeq).toMap
    val want = expected.collect().map(r =>
      r.getLong(0) -> (1 to 4).map(r.getLong).toSeq).toMap
    assert(got == want, s"streamed models diverged: $got vs $want")
    // hand pin: zero init + all-positive y means every first-fold row
    // under-predicts (ind = 0, cq = -tau4), so w0 after fold 1 is
    // EXACTLY tau4*step/4 for each quantile; the constant further
    // folds preserve the tau ordering
    val afterH1 = StreamOps.quantileFoldBatch(init, h1).collect().map(r =>
      r.getLong(0) -> r.getLong(1)).toMap
    val step = graft.operators.Relational.QrStep
    (1L to 3L).foreach { t =>
      assert(afterH1(t) == t * step / 4L, s"fold-1 intercept tau=$t")
    }
    assert(got(1L).head < got(2L).head && got(2L).head < got(3L).head,
      s"tau ordering after folds: $got")
    // an EMPTY micro-batch folds to the identity — a no-op trigger
    // must never destroy the 3-row model state
    val empty = StreamOps.quantileFoldBatch(state, h1.limit(0)).collect()
      .map(r => r.getLong(0) -> (1 to 4).map(r.getLong).toSeq).toMap
    assert(empty == got, s"empty fold must be the identity: $empty vs $got")
  }

  test("stream_logreg: streamed hard-sigmoid steps equal q50 rounds on the same data") {
    import org.apache.spark.sql.types._
    val sess = spark
    import sess.implicits._
    // separable plant: class 1 has f1, class 0 doesn't
    val feats = ((1 to 8).map(_ => (1L, 4096L, 4096L, 0L, 0L)) ++
      (1 to 8).map(_ => (0L, 4096L, 0L, 4096L, 0L)))
      .toDF("y", "f0", "f1", "f2", "f3")
    val h1 = feats.filter(col("f1") > 0).localCheckpoint(true)
    val h2 = feats.filter(col("f1") === 0).localCheckpoint(true)
    val srcDir = java.nio.file.Files.createTempDirectory("graft-lg-stream")
    val schema = StructType(Seq("y", "f0", "f1", "f2", "f3")
      .map(StructField(_, LongType)))
    var state = StreamOps.linregInitState(spark).localCheckpoint(true)
    val init = state
    val q = spark.readStream.schema(schema).parquet(srcDir.toString)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!df.isEmpty)
          state = StreamOps.logregFoldBatch(state, df).localCheckpoint(true)
        ()
      }.start()
    try {
      h1.coalesce(1).write.mode("append").parquet(srcDir.toString)
      q.processAllAvailable()
      h2.coalesce(1).write.mode("append").parquet(srcDir.toString)
      q.processAllAvailable()
    } finally q.stop()
    val expected = StreamOps.logregFoldBatch(
      StreamOps.logregFoldBatch(init, h1), h2)
    val (got, want) = (state.collect().head, expected.collect().head)
    assert((0 to 3).forall(j => got.getLong(j) == want.getLong(j)),
      s"streamed model diverged: $got vs $want")
    // single-batch contract: one fold over the FULL frame equals
    // q50's round-1 weights on the same frame (the shared arithmetic)
    val oneStep = StreamOps.logregFoldBatch(init, feats).collect().head
    val q50r1 = graft.operators.Relational.logregRounds(feats)
      .filter(col("round") === 1L).collect().head
    assert((0 to 3).forall(j => oneStep.getLong(j) == q50r1.getLong(j + 3)),
      s"fold != q50 round 1: $oneStep vs $q50r1")
  }

  test("stream_kmeans: streamed decay folds equal sequential batch folds") {
    import org.apache.spark.sql.types._
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val init = StreamOps.kmeansInitState(
      graft.operators.Similarity.kmeansCentroids(spark, sfDir, 1))
      .localCheckpoint(true)
    val h1 = emb.filter(col("vec_id") % 2 === 0).localCheckpoint(true)
    val h2 = emb.filter(col("vec_id") % 2 === 1).localCheckpoint(true)
    // drive two ordered micro-batches through the same fold the spec
    // applies by hand: write file 1, drain, write file 2, drain
    val srcDir = java.nio.file.Files.createTempDirectory("graft-km-stream")
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    var state = init
    val stream = spark.readStream.schema(schema).parquet(srcDir.toString)
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!df.isEmpty)
          state = StreamOps.kmeansFoldBatch(state, df).localCheckpoint(true)
        ()
      }.start()
    try {
      h1.coalesce(1).write.mode("append").parquet(srcDir.toString)
      q.processAllAvailable()
      h2.coalesce(1).write.mode("append").parquet(srcDir.toString)
      q.processAllAvailable()
    } finally q.stop()
    val expected = StreamOps.kmeansFoldBatch(
      StreamOps.kmeansFoldBatch(init, h1), h2)
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Long](2).toVector))).toMap
    val (got, want) = (asMap(state), asMap(expected))
    assert(got.nonEmpty && got == want,
      s"streamed state diverged: ${got.size} vs ${want.size} cells")
    // decay contract: batch-1 mass has halved (div-truncated), batch-2
    // mass is whole — total weight sits in (n2, n1/2 + n2]
    val (n1, n2) = (h1.count(), h2.count())
    val w = got.values.map(_._1).sum
    assert(w > n2 && w <= n1 / 2 + n2, s"total weight $w vs n1=$n1 n2=$n2")
    assert(got.keySet == asMap(init).keySet, "cell set must be stable")
  }

  test("GD foldBatch family: an empty micro-batch folds to the identity " +
    "(no fold may null the model on a no-op trigger)") {
    val sess = spark
    import sess.implicits._
    val b4 = Seq((900L, 4096L, 512L, 128L, 32L), (1800L, 4096L, 1024L, 0L, 64L))
      .toDF("y12", "f0", "f1", "f2", "f3").localCheckpoint(true)
    val cls = Seq((1L, 4096L, 512L, 128L, 32L), (0L, 4096L, 1024L, 0L, 64L))
      .toDF("y", "f0", "f1", "f2", "f3").localCheckpoint(true)
    val p3 = Seq((8L, 4096L, 512L, 128L), (3L, 4096L, 1024L, 0L))
      .toDF("y", "f0", "f1", "f2").localCheckpoint(true)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Long]] =
      df.collect().toSeq.map(r => r.toSeq.map(_.asInstanceOf[Long]))
    val folds: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      ("linreg", StreamOps.linregFoldBatch(
        StreamOps.linregInitState(spark), b4)),
      ("huber", StreamOps.huberFoldBatch(
        StreamOps.linregInitState(spark), b4)),
      ("logreg", StreamOps.logregFoldBatch(
        StreamOps.linregInitState(spark), cls)),
      ("poisson", StreamOps.poissonFoldBatch(
        StreamOps.poissonInitState(spark), p3)),
      ("mlp", StreamOps.mlpFoldBatch(StreamOps.mlpInitState(spark), b4)))
    folds.foreach { case (name, warmed) =>
      val st = warmed.localCheckpoint(true)
      val got = rows(name match {
        case "linreg" => StreamOps.linregFoldBatch(st, b4.limit(0))
        case "huber" => StreamOps.huberFoldBatch(st, b4.limit(0))
        case "logreg" => StreamOps.logregFoldBatch(st, cls.limit(0))
        case "poisson" => StreamOps.poissonFoldBatch(st, p3.limit(0))
        case "mlp" => StreamOps.mlpFoldBatch(st, b4.limit(0))
      })
      val want = rows(st)
      assert(got == want, s"$name: empty fold must be identity: $got vs $want")
      assert(want.head.exists(_ != 0L), s"$name: warm state must be non-zero")
    }
  }

  test("stream_survival: streamed Kaplan-Meier counts fold equals batch q67 " +
    "on the union of the arrived subjects; empty fold is the identity") {
    import org.apache.spark.sql.types._
    val sess = spark
    import sess.implicits._
    // the q67 planted sample split across two ordered micro-batches
    val all = Seq(
      (0L, 1L, 1L), (0L, 1L, 1L), (0L, 2L, 0L), (0L, 3L, 1L), (0L, 8L, 0L),
      (1L, 8L, 0L))
    val h1 = all.take(3).toDF("cohort", "t_obs", "is_event").localCheckpoint(true)
    val h2 = all.drop(3).toDF("cohort", "t_obs", "is_event").localCheckpoint(true)
    val srcDir = java.nio.file.Files.createTempDirectory("graft-surv-stream")
    val schema = StructType(Seq("cohort", "t_obs", "is_event")
      .map(StructField(_, LongType)))
    var state = StreamOps.survivalInitState(spark).localCheckpoint(true)
    val q = spark.readStream.schema(schema).parquet(srcDir.toString)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        state = StreamOps.survivalFoldBatch(state, df).localCheckpoint(true)
        ()
      }.start()
    try {
      h1.coalesce(1).write.mode("append").parquet(srcDir.toString)
      q.processAllAvailable()
      h2.coalesce(1).write.mode("append").parquet(srcDir.toString)
      q.processAllAvailable()
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // streamed curve == batch q67 tail on the union of all subjects
    val streamed = rows(StreamOps.survivalCurve(state))
    val batch = rows(graft.operators.Events.kmCurve(
      all.toDF("cohort", "t_obs", "is_event")))
    assert(streamed == batch, s"stream vs batch:\n$streamed\n$batch")
    // the hand-pinned q67 values hold through the stream
    assert(streamed.contains((0L, 1L, 5L, 2L, 0L, 10066330L)))
    assert(streamed.contains((0L, 3L, 2L, 1L, 0L, 5033165L)))
    // an empty micro-batch folds to the identity
    val empty = StreamOps.survivalFoldBatch(state, h1.limit(0))
    assert(empty.collect().toSeq.map(_.toSeq).sortBy(_.toString) ==
      state.collect().toSeq.map(_.toSeq).sortBy(_.toString))
  }
}
