package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.CatalogTables

/** Catalog registration + ANALYZE statistics, and the plan change
  * attributable to them: the same query under the same confs plans a
  * shuffled join before ANALYZE and a broadcast join after — only
  * the statistics moved.
  */
class CatalogSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private val db = "graft_cat"

  lazy val spark: SparkSession = TestSpark.spark

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("registration exposes the star schema through the catalog, data external") {
    CatalogTables.register(spark, sfDir, db)
    assert(spark.table(s"$db.nation").count() == 25L)
    assert(spark.table(s"$db.customer").count() ==
      Tables.customer(spark, sfDir).count())
    // registration is metadata-only and idempotent
    CatalogTables.register(spark, sfDir, db)
    assert(spark.table(s"$db.nation").count() == 25L)
  }

  test("ANALYZE fills optimizer-visible row counts") {
    CatalogTables.register(spark, sfDir, db)
    CatalogTables.analyze(spark, db)
    withConfs("spark.sql.cbo.enabled" -> "true") {
      val (size, rows) = CatalogTables.stats(spark, s"$db.customer")
      assert(size > 0)
      assert(rows.contains(BigInt(Tables.customer(spark, sfDir).count())),
        s"rowCount $rows missing or wrong after ANALYZE")
    }
  }

  test("events registers as raw table + casting view, stats-driven") {
    CatalogTables.register(spark, sfDir, db)
    val viewed = spark.table(s"$db.events")
    // the view applies the same ns→timestamp cast as the path read
    assert(viewed.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val direct = Tables.events(spark, sfDir)
    assert(viewed.count() == direct.count())
    val wantTs = direct.select(max(col("ts"))).collect()(0).getTimestamp(0)
    assert(viewed.select(max(col("ts"))).collect()(0).getTimestamp(0) == wantTs)
    // the backing table ANALYZEs like any other — event queries against
    // the view see real row counts instead of selectivity-1 file bytes
    CatalogTables.analyze(spark, db)
    withConfs("spark.sql.cbo.enabled" -> "true") {
      val (size, rows) = CatalogTables.stats(spark, s"$db.events_raw")
      assert(size > 0 && rows.contains(BigInt(direct.count())),
        s"events_raw stats missing after ANALYZE: $rows")
      // and they propagate THROUGH the view's projection
      val viewRows = spark.table(s"$db.events")
        .queryExecution.optimizedPlan.stats.rowCount
      assert(viewRows.contains(BigInt(direct.count())),
        s"view must inherit the base table's row count, got $viewRows")
    }
  }

  test("column statistics flip a filtered-dimension join to broadcast") {
    // register a FRESH db so the 'before' side is guaranteed unanalyzed
    val db2 = "graft_cat_flip"
    CatalogTables.register(spark, sfDir, db2)
    def query() = spark.table(s"$db2.orders")
      .join(spark.table(s"$db2.customer").filter(col("c_nationkey") === 3),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_name"))
    def hasBroadcast(df: org.apache.spark.sql.DataFrame): Boolean = {
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      graft.plans.PlanAudit.report(plan).broadcastJoins > 0 ||
        plan.toString.contains("BroadcastHashJoin")
    }
    // threshold just UNDER the join's own pre-ANALYZE estimate of its
    // smaller side (column pruning already scales the raw file bytes,
    // so the raw table size is not the number the planner compares;
    // without stats the filter keeps that estimate — selectivity 1)
    val preSides = query().queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        Seq(j.left.stats.sizeInBytes, j.right.stats.sizeInBytes).min
    }
    assert(preSides.nonEmpty, "query plans no join?")
    val threshold = (preSides.min * 8 / 10).toString
    // graft's own PreAggregateBeforeShuffleRule hints broadcasts from
    // the SAME statistics (its independent graft.broadcast.threshold
    // defaults to 8 MiB) — pin it to the test threshold too, so the
    // flip below shows the stats driving BOTH decision points
    withConfs(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> threshold,
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> threshold,
      "graft.broadcast.threshold" -> threshold) {
      assert(!hasBroadcast(query()),
        "without statistics the filtered dimension must estimate at raw size " +
          "(selectivity 1) and stay above the broadcast threshold")
      CatalogTables.analyze(spark, db2)
      assert(hasBroadcast(query()),
        "with rowCount + c_nationkey NDV the filter estimates ~1/25 of the " +
          "dimension and must drop under the broadcast threshold")
    }
  }

  test("persistent metastore: saveAsTable + view survive a context restart") {
    // spark.sql.catalogImplementation is a static conf — the shared
    // in-memory-catalog test context can't flip to Hive, so the
    // Derby-metastore round trip runs in its own JVM (MetastoreCheck):
    // session 1 writes a table + view, stops its context; session 2
    // must resolve both from the metastore alone.
    val work = java.nio.file.Files.createTempDirectory("graft_metastore").toString
    val addOpens = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
      .filter(a => a.startsWith("--add-opens") || a.contains("=ALL-UNNAMED"))
    val cmd = Seq("java") ++ addOpens ++ Seq("-Xmx2g",
      "-Dderby.stream.error.file=" + s"$work/derby.log",
      "-cp", System.getProperty("java.class.path"),
      "graft.sources.MetastoreCheck", work)
    val out = new StringBuilder
    val exit = scala.sys.process.Process(cmd)
      .!(scala.sys.process.ProcessLogger(l => out.append(l).append('\n'), _ => ()))
    assert(exit == 0 && out.toString.contains("METASTORE_OK"),
      s"metastore round trip failed (exit $exit):\n${out.toString.takeRight(2000)}")
  }
}
