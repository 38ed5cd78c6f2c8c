package graft

import org.apache.spark.sql.SparkSession
import graft.plans.PlanAudit

/** Sweep every SparkEntry query through [[graft.plans.PlanAudit]] and
  * print one line per query plus its scale warnings — the round's
  * "is this the plan you'd want" review as a runnable tool.
  *
  * Usage: runMain graft.Audit [sfDir] (default sf0.001; plan SHAPE is
  * scale-independent, so the smallest data answers fastest).
  */
object Audit {
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
        val r = PlanAudit.audit(fn(spark, sfDir))
        val w = r.warnings
        println(f"$name%-24s scans=${r.scans}(pushed=${r.scansWithPushedFilters})" +
          f" shuffles=${r.shuffleExchanges} bcast=${r.broadcastJoins}" +
          f" shfjoin=${r.shuffledJoins} nl=${r.nestedLoopJoins}(big=${r.largeNestedLoopJoins})" +
          f" cart=${r.cartesianProducts} agg=${r.partialAggregates}P/${r.finalAggregates}F" +
          f" win=${r.windows}")
        if (w.nonEmpty) { flagged += 1; w.foreach(x => println(s"  !! $x")) }
      } catch {
        case e: Throwable => println(s"$name AUDIT FAILED: ${e.getMessage}")
      }
    }
    println(s"[audit] ${SparkEntry.queries.size} queries, $flagged with warnings")
    spark.stop()
  }
}
