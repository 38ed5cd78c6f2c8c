package graft.sources

import org.apache.spark.sql.SparkSession

/** Persistent-metastore round trip — the durable-catalog surface the
  * reference ships as sql/hive (reference:
  * /root/reference/sql/hive/src/main/scala/org/apache/spark/sql/hive/HiveExternalCatalog.scala:1):
  * `saveAsTable` + `CREATE VIEW` metadata must survive a full
  * SparkSession/SparkContext stop and be readable by a fresh session
  * pointed at the same Derby-backed metastore.
  *
  * A `main`, not a spec body, because
  * `spark.sql.catalogImplementation` is a STATIC conf: the test
  * suite's shared in-memory-catalog context can't host a Hive catalog
  * mid-JVM, so CatalogSpec drives this as a separate process
  * (classpath + --add-opens inherited from the forked test JVM).
  *
  * Scale note: the metastore holds METADATA only (schemas, partition
  * lists, table → path mappings) — the 100 TB data path is untouched;
  * what the durable catalog buys at scale is shared table identity
  * across jobs (every pipeline stage resolves `documents_v2` to the
  * same bucketed layout instead of re-declaring paths), which is what
  * makes bucket-join co-location reusable between applications.
  *
  * Prints METASTORE_OK on success; any failure leaves a nonzero exit
  * for the spawning spec to assert on.
  */
object MetastoreCheck {
  def main(args: Array[String]): Unit = {
    val work = args(0)
    def session(): SparkSession = SparkSession.builder()
      .master("local[4]")
      .appName("graft-metastore-check")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", s"$work/warehouse")
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$work/metastore_db;create=true")
      .enableHiveSupport()
      .getOrCreate()
    val s1 = session()
    s1.sparkContext.setLogLevel("WARN")
    locally {
      import s1.implicits._
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
        .write.mode("overwrite").format("parquet").saveAsTable("graft_meta_t")
      s1.sql("CREATE OR REPLACE VIEW graft_meta_v AS " +
        "SELECT k, upper(v) AS vv FROM graft_meta_t")
    }
    s1.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // a FRESH context against the same metastore: the catalog state
    // must come from Derby, not from in-memory session state
    val s2 = session()
    s2.sparkContext.setLogLevel("WARN")
    val ok =
      try {
        require(s2.catalog.tableExists("graft_meta_t"), "table metadata lost")
        require(s2.catalog.tableExists("graft_meta_v"), "view metadata lost")
        val n = s2.table("graft_meta_t").count()
        require(n == 3, s"table rows lost: $n")
        val vSum = s2.sql("SELECT sum(k) AS s FROM graft_meta_v").head().getLong(0)
        require(vSum == 6, s"view definition lost: sum=$vSum")
        true
      } finally s2.stop()
    if (ok) println("METASTORE_OK")
  }
}
