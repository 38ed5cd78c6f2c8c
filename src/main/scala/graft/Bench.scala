package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: one JSON line on stdout with total wall
  * seconds at SPARK_GRAFT_SF_DIR. A warmup sweep at sf0.001 first so
  * timings measure steady-state execution, not first-query
  * JVM/codegen warmup.
  *
  * Two harness lessons are baked in:
  *
  *  - The driver's stdout capture is tail-bounded — BENCH_r05/r06
  *    lost the head of the (4-5 KB) per-query map to truncation, so
  *    the driver-side artifact recorded `parsed: null`. The stdout
  *    line now carries the per-query map ONLY when the whole line
  *    stays under a conservative budget (subset runs); the full map
  *    always goes un-truncated to SPARK_GRAFT_BENCH_OUT (default
  *    `bench_full.json`).
  *
  *  - One JVM running 103 queries back-to-back accumulates every
  *    query's `localCheckpoint(true)` blocks (bucket counts, k-means
  *    cells, multi-pass frames …), and by mid-sweep the storage/GC
  *    churn taxes whatever runs next — BENCH_r06 measured nine
  *    contiguous queries at 3-9x their isolated time with unchanged
  *    code. After each timed query the harness now unpersists every
  *    persistent RDD EXCEPT blocks backing the two deliberate
  *    materialize-once memos (Dedup cluster labels, Similarity k-NN
  *    graph — [[FrameMemo.retainedIds]]): those memos are the
  *    production "materialize labels once" pattern shared by
  *    d07/d08/d14 and s05/s06, and freeing them would misprice the
  *    second consumer. The cleanup runs OUTSIDE the timed window —
  *    it is harness bookkeeping, not query cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // dev isolation: SPARK_GRAFT_ONLY=q01_pricing_summary,m03_... runs
    // a subset (the driver never sets it — full sweep by default)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // noop sink (not count): count() lets Catalyst prune unreferenced
    // output columns, under-measuring projection-heavy queries.
    def run(name: String, dir: String): Unit =
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
    // Free checkpoint blocks parked by the previous query, keeping
    // live memo blocks (see class doc). Diagnostics to stderr only —
    // stdout must stay a single parseable JSON line.
    def cleanup(): Unit = FrameMemo.releaseTransientBlocks(spark)
    names.foreach { n =>
      try run(n, warmDir)
      catch { case e: Throwable =>
        System.err.println(s"bench warmup failed: $n ${e.getClass.getName}") }
      cleanup()
    }
    // warm-dir memos would only be evicted (and freed) when the first
    // sf query probes them — drop them now so the timed sweep starts
    // with zero parked blocks.
    FrameMemo.clearAllMemos()
    cleanup()
    val errors = scala.collection.mutable.ArrayBuffer[String]()
    val results = names.map { name =>
      val t0 = System.nanoTime()
      // a failed query must not masquerade as a fast one: record it
      try run(name, sfDir) catch { case _: Throwable => errors += name }
      val dt = (System.nanoTime() - t0) / 1e9
      cleanup()
      name -> dt
    }
    // Locale.ROOT: a comma-decimal default locale (de_DE …) would
    // format 1.234 as "1,234" — malformed JSON.
    def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    def line(queryMap: String): String =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_queries":${results.size},"queries":$queryMap,"errors":$errs,"sf":"$sfDir"}"""
    val full = line(qs)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (full + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () } // stdout line still carries the result
    // Tail-bounded driver capture (~3.5 KB observed): emit the
    // per-query map inline only when the line safely fits; the full
    // map is always in bench_full.json either way.
    println(if (full.length <= 2500) full else line("{}"))
    spark.stop()
  }
}
