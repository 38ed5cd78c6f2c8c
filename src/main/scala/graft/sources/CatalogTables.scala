package graft.sources

import org.apache.spark.sql.SparkSession

import graft.Tables

/** Session-catalog registration + ANALYZE statistics for the star
  * schema — the CBO surface the reference exposes through its
  * ANALYZE commands (reference: /root/reference/sql/core/src/main/
  * scala/org/apache/spark/sql/execution/command/
  * AnalyzeTableCommand.scala:1 and AnalyzeColumnCommand.scala:1),
  * re-expressed as catalog DDL over the same external parquet.
  *
  * WHY this matters at 100 TB: path-based reads carry only a file
  * size, so the optimizer sees every filter as selectivity 1 and
  * every join side as its raw bytes — broadcast decisions and join
  * ordering then depend on what the FILES happen to weigh, not what
  * the QUERY will produce. ANALYZE'd catalog tables give the
  * optimizer row counts and per-column NDV/min/max; under
  * `spark.sql.cbo.enabled` a filtered dimension estimates down to
  * its true cardinality and flips to the broadcast side — the exact
  * plan change CatalogSpec pins.
  *
  * Tables are EXTERNAL (`USING parquet LOCATION ...`): registration
  * adds metadata only, the driver-generated parquet stays the single
  * copy of the data, and DROP leaves it untouched.
  */
object CatalogTables {

  /** Filter/join columns worth column-level stats (NDV, min/max,
    * null count) — the inputs to CBO's selectivity estimation. Kept
    * to the keys the operators actually filter and join on; stats on
    * never-filtered payload columns are ANALYZE time wasted.
    */
  val KeyColumns: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey"),
    "nation" -> Seq("n_nationkey", "n_regionkey"),
    "customer" -> Seq("c_custkey", "c_nationkey", "c_mktsegment"),
    "supplier" -> Seq("s_suppkey", "s_nationkey"),
    "part" -> Seq("p_partkey", "p_size"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_returnflag", "l_linestatus", "l_shipdate"),
    // events stats live on the BACKING table (events_raw): ts is
    // stored as whatever the files carry (legacy ns long or
    // TIMESTAMP_NTZ), and either form gets min/max — the view's
    // derived timestamp column inherits selectivity from the
    // key columns below, which is what event queries filter on
    "events_raw" -> Seq("event_id", "user_id", "event_type", "ts"),
    "documents" -> Seq("doc_id", "source", "lang"),
    "embeddings" -> Seq("vec_id", "label"))

  /** Register every star-schema table under `db` as an external
    * parquet table. Idempotent: an existing registration is replaced
    * (the location may point at a different SF dir), data files are
    * never written or removed.
    *
    * `events` registers in two layers, because its timestamp needs
    * read-side logic plain table DDL can't express (the
    * [[Tables.events]] normalization): the parquet registers as
    * `$db.events_raw` (ts stays whatever the files carry — raw ns
    * long in the legacy testdata generation, TIMESTAMP_NTZ in the
    * current one — ANALYZE-able like any column), and `$db.events` is
    * a VIEW applying the generation-matched cast the path read
    * applies. Event queries against the view are stats-driven through
    * the view's projection (CBO propagates the base table's column
    * stats through aliases); the legacy ns generation additionally
    * needs `spark.sql.legacy.parquet.nanosAsLong`, which this method
    * sets on the session — the same conf [[Tables.events]] sets per
    * call.
    */
  def register(spark: SparkSession, sfDir: String, db: String = "graft"): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    Tables.names.filterNot(_ == "events").foreach { t =>
      val path = s"$sfDir/$t.parquet"
      if (pathExists(spark, path)) {
        spark.sql(s"DROP TABLE IF EXISTS $db.$t")
        spark.sql(s"CREATE TABLE $db.$t USING parquet LOCATION '$path'")
      }
    }
    val eventsPath = s"$sfDir/events.parquet"
    if (pathExists(spark, eventsPath)) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.sql(s"DROP VIEW IF EXISTS $db.events")
      spark.sql(s"DROP TABLE IF EXISTS $db.events_raw")
      spark.sql(s"CREATE TABLE $db.events_raw USING parquet LOCATION '$eventsPath'")
      // generation-matched cast, mirroring Tables.normalizeEventTs
      val tsExpr =
        spark.table(s"$db.events_raw").schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType => "timestamp_micros(ts div 1000)"
          case _ => "CAST(ts AS TIMESTAMP)"
        }
      spark.sql(
        s"""CREATE VIEW $db.events AS
           |SELECT event_id, $tsExpr AS ts,
           |       user_id, event_type, value, props
           |FROM $db.events_raw""".stripMargin)
    }
  }

  private def pathExists(spark: SparkSession, path: String): Boolean = {
    val fsPath = new org.apache.hadoop.fs.Path(path)
    fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(fsPath)
  }

  /** ANALYZE every registered table: table-level (size + row count)
    * always, plus column-level stats for [[KeyColumns]] when
    * `withColumns`. One data scan per table per level — at 100 TB
    * this is a scheduled maintenance job, not a per-query cost, and
    * it is exactly what makes every subsequent plan stats-driven.
    */
  def analyze(spark: SparkSession, db: String = "graft",
      withColumns: Boolean = true): Unit =
    (Tables.names.filterNot(_ == "events") :+ "events_raw")
      .filter(t => spark.catalog.tableExists(s"$db.$t"))
      .foreach { t =>
        spark.sql(s"ANALYZE TABLE $db.$t COMPUTE STATISTICS")
        val cols = KeyColumns.getOrElse(t, Nil)
        if (withColumns && cols.nonEmpty)
          spark.sql(s"ANALYZE TABLE $db.$t COMPUTE STATISTICS " +
            s"FOR COLUMNS ${cols.mkString(", ")}")
      }

  /** Optimizer-visible statistics of a registered table:
    * (sizeInBytes, rowCount if ANALYZE'd and CBO exposes it).
    */
  def stats(spark: SparkSession, table: String): (BigInt, Option[BigInt]) = {
    val s = spark.table(table).queryExecution.optimizedPlan.stats
    (s.sizeInBytes, s.rowCount)
  }
}
