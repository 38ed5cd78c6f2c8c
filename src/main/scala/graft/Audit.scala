package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.catalyst.expressions.aggregate.Partial
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import graft.plans.PlanAudit

/** EXECUTED metrics per query — the runtime complement to
  * [[graft.plans.PlanAudit]]'s structural counts, and the library
  * analogue of the reference's instrumented shuffle (the OPS delta
  * sets fetch/merge task metrics in its shuffle reader; reference:
  * /root/reference/core/src/main/scala/org/apache/spark/shuffle/
  * OpsShuffleReader.scala:44-58). Where PlanAudit answers "does the
  * plan HAVE a partial aggregate before the shuffle", this answers
  * "how many rows did the partial aggregate actually remove, and how
  * many bytes did the shuffle actually move" — the numbers a 100 TB
  * capacity review needs, read off the SQLMetrics Spark already
  * maintains per node (no custom instrumentation in the hot path).
  *
  * Two consumption modes:
  *  - [[Audit.executedMetrics]]: drive one frame and read its plan's
  *    metrics (spec/bench usage);
  *  - [[Audit.attach]]: a [[QueryExecutionListener]] that records one
  *    labeled [[ExecutedMetrics]] row per completed action — the
  *    sweep-wide report a pipeline run leaves behind
  *    ([[Audit.sweep]] renders it as a DataFrame).
  */
object Audit {

  /** Runtime counters summed across the executed plan (through AQE
    * stages, exchange reuse, and subqueries — [[PlanAudit.allNodes]]).
    *
    *  - shuffle written/read: bytes and records crossing every
    *    shuffle exchange (read side = local + remote fetch — the
    *    local[n] test harness reports all-local; the split is real on
    *    a cluster);
    *  - spillBytes: disk spill summed over every node exposing a
    *    spill metric (sort, hash-agg fallback, shuffled join);
    *  - partialAggInput/OutputRows: rows entering vs leaving every
    *    Partial-mode aggregate — their ratio is the map-side combine
    *    reduction, THE number that decides whether a groupBy shuffle
    *    carries combined state or raw rows at scale.
    */
  case class ExecutedMetrics(
      shuffleBytesWritten: Long,
      shuffleRecordsWritten: Long,
      shuffleBytesRead: Long,
      shuffleRecordsRead: Long,
      spillBytes: Long,
      outputRows: Long,
      partialAggInputRows: Long,
      partialAggOutputRows: Long) {

    /** Map-side combine factor: >1 means the shuffle moved combined
      * state, not raw rows; 1.0 when no partial aggregate ran.
      */
    def partialAggReduction: Double =
      if (partialAggOutputRows <= 0L) 1.0
      else partialAggInputRows.toDouble / partialAggOutputRows.toDouble
  }

  private def metric(n: SparkPlan, key: String): Long =
    n.metrics.get(key).map(_.value).filter(_ > 0L).getOrElse(0L)

  /** Nearest descendant row count — a Partial aggregate's input rows
    * are its child's output rows, but nodes fused into the same
    * codegen stage (Project) carry no numOutputRows; walk down to the
    * first node that does (Filter, scan, exchange — each preserves
    * the row count the aggregate actually consumed).
    */
  private def descendantRows(n: SparkPlan): Long =
    PlanAudit.allNodes(n).iterator
      .flatMap(_.metrics.get("numOutputRows").map(_.value).filter(_ >= 0L))
      .nextOption().getOrElse(0L)

  /** Sum the runtime counters off an already-executed plan.
    *
    * Nodes are deduplicated by REFERENCE identity first:
    * [[PlanAudit.allNodes]] deliberately traverses a reused exchange
    * once per consumer (right for structural counts — each use is
    * real work), but SQLMetrics live on the one shared instance, and
    * summing it per consumer would double-count the bytes the
    * shuffle actually moved. Identity, not structural equality: two
    * genuinely separate but identical scans must still both count.
    */
  def metricsOf(plan: SparkPlan): ExecutedMetrics = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    val nodes = PlanAudit.allNodes(plan).filter(seen.add)
    val shuffles = nodes.collect { case e: ShuffleExchangeExec => e }
    val partials = nodes.collect {
      case a: BaseAggregateExec if a.aggregateExpressions.nonEmpty &&
        a.aggregateExpressions.forall(_.mode == Partial) => a
    }
    ExecutedMetrics(
      shuffleBytesWritten = shuffles.map(metric(_, "shuffleBytesWritten")).sum,
      shuffleRecordsWritten = shuffles.map(metric(_, "shuffleRecordsWritten")).sum,
      shuffleBytesRead = shuffles
        .map(e => metric(e, "localBytesRead") + metric(e, "remoteBytesRead")).sum,
      shuffleRecordsRead = shuffles.map(metric(_, "recordsRead")).sum,
      spillBytes = nodes.map(metric(_, "spillSize")).sum,
      outputRows = plan.metrics.get("numOutputRows").map(_.value)
        .filter(_ >= 0L).getOrElse(descendantRows(plan)),
      partialAggInputRows = partials.map(a => descendantRows(a.children.head)).sum,
      partialAggOutputRows = partials.map(metric(_, "numOutputRows")).sum)
  }

  /** Execute `df` (internal rows only — nothing lands on the driver)
    * and read its runtime counters.
    */
  def executedMetrics(df: DataFrame): ExecutedMetrics =
    metricsOf(PlanAudit.executedPlan(df))

  /** Listener that records one labeled metrics row per completed
    * action. Set [[label]] before each action (the listener thread
    * can't see caller-side state otherwise — single-driver sweeps set
    * it between queries, exactly how [[sweep]] uses it).
    */
  final class MetricsListener extends QueryExecutionListener {
    @volatile var label: String = "unlabeled"
    private val buf =
      scala.collection.mutable.ArrayBuffer[(String, Long, ExecutedMetrics)]()

    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit = {
      val plan = qe.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      buf.synchronized { buf += ((label, durationNs, metricsOf(plan))) }
    }

    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit = ()

    def rows: Seq[(String, Long, ExecutedMetrics)] =
      buf.synchronized { buf.toSeq }

    def clear(): Unit = buf.synchronized { buf.clear() }
  }

  /** Register a fresh [[MetricsListener]] on the session. Caller owns
    * removal: `spark.listenerManager.unregister(l)`.
    */
  def attach(spark: SparkSession): MetricsListener = {
    val l = new MetricsListener
    spark.listenerManager.register(l)
    l
  }

  /** Run each named query against `sfDir` and return the per-query
    * executed-metrics table — the report a pipeline run files next to
    * its results. Columns are plain longs/doubles so the table can be
    * written anywhere.
    */
  def sweep(spark: SparkSession, sfDir: String,
      names: Seq[String] = SparkEntry.queries.keys.toSeq.sorted): DataFrame = {
    import spark.implicits._
    names.map { name =>
      val m = executedMetrics(SparkEntry.queries(name)(spark, sfDir))
      // same between-query block release as Bench: a sweep in ONE
      // session otherwise accumulates every query's checkpoint
      // blocks (the measured 3-9x mid-sweep tax)
      FrameMemo.releaseTransientBlocks(spark)
      (name, m.shuffleBytesWritten, m.shuffleRecordsWritten,
        m.shuffleBytesRead, m.shuffleRecordsRead, m.spillBytes,
        m.outputRows, m.partialAggInputRows, m.partialAggOutputRows,
        m.partialAggReduction)
    }.toDF("query", "shuffle_bytes_written", "shuffle_records_written",
      "shuffle_bytes_read", "shuffle_records_read", "spill_bytes",
      "output_rows", "partial_agg_input_rows", "partial_agg_output_rows",
      "partial_agg_reduction")
  }

  /** Sweep every SparkEntry query and print one line per query:
    * PlanAudit's structural counts + this file's runtime counters +
    * scale warnings — the round's "is this the plan you'd want"
    * review as a runnable tool.
    *
    * Usage: runMain graft.Audit [sfDir] (default sf0.001; plan SHAPE
    * is scale-independent, so the smallest data answers fastest —
    * runtime counters scale with the chosen SF).
    */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var flagged = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = PlanAudit.executedPlan(fn(spark, sfDir))
        val r = PlanAudit.report(plan)
        val m = metricsOf(plan)
        val w = r.warnings
        println(f"$name%-24s scans=${r.scans}(pushed=${r.scansWithPushedFilters})" +
          f" shuffles=${r.shuffleExchanges} bcast=${r.broadcastJoins}" +
          f" shfjoin=${r.shuffledJoins} nl=${r.nestedLoopJoins}(big=${r.largeNestedLoopJoins})" +
          f" cart=${r.cartesianProducts} agg=${r.partialAggregates}P/${r.finalAggregates}F" +
          f" win=${r.windows}" +
          f" shufKB=${m.shuffleBytesWritten / 1024}%d" +
          f" spillKB=${m.spillBytes / 1024}%d aggRed=${m.partialAggReduction}%.1f")
        if (w.nonEmpty) { flagged += 1; w.foreach(x => println(s"  !! $x")) }
      } catch {
        case e: Throwable => println(s"$name AUDIT FAILED: ${e.getMessage}")
      }
      FrameMemo.releaseTransientBlocks(spark)
    }
    println(s"[audit] ${SparkEntry.queries.size} queries, $flagged with warnings")
    spark.stop()
  }
}
