package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev-only plan dumper for the optimization rounds: writes each
  * named query's `.explain("formatted")` text to `<outDir>/<key>.txt`
  * so before/after plan evidence (Exchange count, join strategy,
  * PushedFilters/ReadSchema, codegen spans) can be committed next to
  * the round log. Never run by the driver.
  *
  * args: sfDir outDir [comma-separated query subset]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val only = args.lift(2).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Engine.tuneSql(spark)
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          // queryExecution.explainString == explain("formatted"), but
          // returned instead of printed. NOTE: for the iterative
          // operators this is the FINAL action's plan — earlier
          // rounds ran as their own jobs during construction.
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/$name.txt"), txt)
          System.err.println(s"[plandump] $name ok")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
        FrameMemo.releaseTransientBlocks(spark)
      }
    spark.stop()
  }
}
