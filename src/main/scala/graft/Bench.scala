package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: one JSON line on stdout with per-query and
  * total wall seconds at SPARK_GRAFT_SF_DIR. A warmup sweep at
  * sf0.001 first so timings measure steady-state execution, not
  * first-query JVM/codegen warmup.
  *
  * The driver's stdout capture is tail-bounded — BENCH_r05.json lost
  * 40 per-query times to head truncation of the (then ~5 KB) line. Two
  * fixes: per-query seconds are rounded to 3 decimals (halves the line
  * length; ms precision is far below run-to-run noise), and the SAME
  * JSON is also written un-truncated to SPARK_GRAFT_BENCH_OUT
  * (default `bench_full.json` in the working directory) so the full
  * map survives any capture window.
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
    names.foreach { n =>
      try run(n, warmDir) catch { case _: Throwable => () }
    }
    val errors = scala.collection.mutable.ArrayBuffer[String]()
    val results = names.map { name =>
      val t0 = System.nanoTime()
      // a failed query must not masquerade as a fast one: record it
      try run(name, sfDir) catch { case _: Throwable => errors += name }
      name -> (System.nanoTime() - t0) / 1e9
    }
    def r3(v: Double): String = "%.3f".format(v)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () } // stdout line still carries the result
    println(line)
    spark.stop()
  }
}
