package graft

import org.apache.spark.sql.SparkSession

/** One shared test session for every suite. Suites run in one JVM and
  * `SparkSession.builder().getOrCreate()` silently reuses whichever
  * session was built first — so the session with the graft extensions
  * (and the plan-shape test posture: AQE off, auto-broadcast off, so
  * any broadcast/pre-aggregate in a plan is attributable to
  * [[graft.plans.PreAggregateBeforeShuffleRule]]) must be the only one
  * ever constructed.
  */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
    .getOrCreate()
}
