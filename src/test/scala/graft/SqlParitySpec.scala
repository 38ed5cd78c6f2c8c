package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.CatalogTables

/** The SQL front door: a reference user queries through SQL text as
  * much as through the DataFrame API, so the catalog views + the
  * extension-registered functions must expose the SAME surface.
  * Each test runs a pipeline twice — once as `spark.sql` text over
  * the registered catalog, once through the DataFrame operators —
  * and pins row-for-row equality. (The DuckDB oracle gate already
  * proves the DataFrame side against an independent engine; this
  * proves the SQL text path reaches identical plans/results inside
  * graft itself.)
  */
class SqlParitySpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private val db = "graftsql"

  lazy val spark: SparkSession = TestSpark.spark

  private lazy val registered: Unit = CatalogTables.register(spark, sfDir, db)

  private def parity(sql: String, df: DataFrame): Unit = {
    registered
    val viaSql = spark.sql(sql)
    assert(viaSql.columns.toSeq == df.columns.toSeq,
      s"column drift: ${viaSql.columns.toSeq} vs ${df.columns.toSeq}")
    val a = viaSql.collect().toSeq
    val b = df.collect().toSeq
    assert(a == b, s"sql row drift: ${a.take(3)} vs ${b.take(3)} (${a.size}/${b.size} rows)")
    assert(a.nonEmpty, "parity on an empty result proves nothing")
  }

  test("q01 pricing summary: SQL text equals the DataFrame pipeline") {
    parity(
      s"""SELECT l_returnflag, l_linestatus,
         |  round(sum(l_quantity), 2) AS sum_qty,
         |  round(sum(l_extendedprice), 2) AS sum_base_price,
         |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
         |  round(avg(l_quantity), 4) AS avg_qty,
         |  round(avg(l_extendedprice), 4) AS avg_price,
         |  round(avg(l_discount), 4) AS avg_disc,
         |  count(1) AS count_order
         |FROM $db.lineitem
         |WHERE l_shipdate <= TIMESTAMP'1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
      SparkEntry.queries("q01_pricing_summary")(spark, sfDir))
  }

  test("q03 join-agg-topk: SQL text equals the DataFrame pipeline") {
    parity(
      s"""SELECT /*+ BROADCAST(c) */ l_orderkey, o_orderdate,
         |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         |FROM $db.lineitem l
         |JOIN $db.orders o ON l.l_orderkey = o.o_orderkey
         |JOIN $db.customer c ON o.o_custkey = c.c_custkey
         |WHERE c.c_mktsegment = 'BUILDING'
         |  AND o.o_orderdate < TIMESTAMP'1998-01-01 00:00:00'
         |  AND l.l_shipdate > TIMESTAMP'1998-01-01 00:00:00'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey
         |LIMIT 10""".stripMargin,
      SparkEntry.queries("q03_join_agg_topk")(spark, sfDir))
  }

  test("q08 window rank: SQL text equals the DataFrame pipeline") {
    parity(
      s"""SELECT s_suppkey, s_name, s_nationkey, s_acctbal,
         |  CAST(rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC)
         |       AS BIGINT) AS bal_rank
         |FROM $db.supplier
         |ORDER BY s_nationkey, bal_rank, s_suppkey""".stripMargin,
      SparkEntry.queries("q08_window_rank")(spark, sfDir))
  }

  test("extension functions resolve from SQL text identically") {
    graft.functions.registerAll(spark)
    parity(
      s"""SELECT doc_id, simhash64(text) AS sig,
         |  round(char_entropy(text), 4) AS ent,
         |  size(word_grams(lower(text), 2)) AS n_bigrams
         |FROM $db.documents
         |ORDER BY doc_id""".stripMargin,
      Tables.documents(spark, sfDir)
        .select(col("doc_id"),
          call_function("simhash64", col("text")).as("sig"),
          round(call_function("char_entropy", col("text")), 4).as("ent"),
          size(call_function("word_grams", lower(col("text")), lit(2)))
            .as("n_bigrams"))
        .orderBy(col("doc_id")))
  }

  test("events view: SQL text over the casting view equals the path loader") {
    parity(
      s"""SELECT event_type, count(1) AS n, min(ts) AS first_ts, max(ts) AS last_ts
         |FROM $db.events
         |GROUP BY event_type
         |ORDER BY event_type""".stripMargin,
      Tables.events(spark, sfDir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), min(col("ts")).as("first_ts"),
          max(col("ts")).as("last_ts"))
        .orderBy(col("event_type")))
  }

  test("q53 KS test: SQL text equals the DataFrame pipeline") {
    // the round-10 statistical-test family through the SQL front
    // door: grid CDF, integer KS max, `div` ticks — all plain
    // Spark SQL over the registered catalog
    parity(
      s"""WITH ct AS (
         |  SELECT event_type AS t, CAST(floor(value * 1024.0) AS LONG) AS tick,
         |    count(1) AS c
         |  FROM $db.events GROUP BY 1, 2),
         |grid AS (SELECT DISTINCT tick FROM ct),
         |ty AS (SELECT t, sum(c) AS n FROM ct GROUP BY t),
         |cd AS (
         |  SELECT g.tick, ty.t, ty.n, coalesce(ct.c, 0L) AS c,
         |    sum(coalesce(ct.c, 0L)) OVER (PARTITION BY ty.t ORDER BY g.tick
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM grid g CROSS JOIN ty
         |  LEFT JOIN ct ON ct.t = ty.t AND ct.tick = g.tick)
         |SELECT type_a, type_b, n_a, n_b, d_num, d_ticks,
         |  round(${graft.functions.PValues.qksSql("lam")}, 4) AS p_value
         |FROM (
         |SELECT *, ${graft.functions.PValues.ksLambdaSql("ne", "dks")} AS lam
         |FROM (
         |SELECT type_a, type_b, n_a, n_b, d_num,
         |  (d_num * 1048576L) div (n_a * n_b) AS d_ticks,
         |  CAST(d_num AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) AS dks,
         |  CAST(n_a * n_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS ne
         |FROM (
         |  SELECT a.t AS type_a, b.t AS type_b, a.n AS n_a, b.n AS n_b,
         |    max(abs(b.n * a.cum - a.n * b.cum)) AS d_num
         |  FROM cd a JOIN cd b ON a.tick = b.tick AND a.t < b.t
         |  GROUP BY 1, 2, 3, 4)))
         |ORDER BY type_a, type_b""".stripMargin,
      SparkEntry.queries("q53_ks_test")(spark, sfDir))
  }

  test("s26 Spearman: SQL text equals the DataFrame pipeline") {
    // the rank-correlation pipeline is plain Spark SQL end to end:
    // posexplode quantization, grid-CDF midranks, a vec-keyed
    // self-join Gram (the declarative twin of the array outer
    // product — same exact integer sums), and the identical final
    // double tree
    parity(
      s"""WITH e AS (
         |  SELECT vec_id, CAST(pos AS LONG) AS i,
         |    CAST(floor(CAST(x AS DOUBLE) * 1024.0D + 0.5D) AS LONG) AS t
         |  FROM $db.embeddings LATERAL VIEW posexplode(embedding) AS pos, x),
         |nn AS (SELECT count(1) AS n FROM $db.embeddings),
         |grid AS (SELECT i, t, count(1) AS c FROM e GROUP BY 1, 2),
         |mg AS (
         |  SELECT i, t,
         |    2L * coalesce(sum(c) OVER (PARTITION BY i ORDER BY t
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0L)
         |      + c + 1L - ((SELECT n FROM nn) + 1L) AS m
         |  FROM grid),
         |r AS (SELECT e.vec_id, e.i, mg.m
         |      FROM e JOIN mg ON e.i = mg.i AND e.t = mg.t),
         |p AS (SELECT a.i AS i, b.i AS j, sum(a.m * b.m) AS p
         |      FROM r a JOIN r b ON a.vec_id = b.vec_id GROUP BY 1, 2),
         |dg AS (SELECT i AS d, p AS pd FROM p WHERE i = j)
         |SELECT p.i AS dim_i, p.j AS dim_j,
         |  CASE WHEN di.pd > 0 AND dj.pd > 0
         |  THEN CAST(floor(CAST(p.p AS DOUBLE)
         |    / sqrt(CAST(di.pd AS DOUBLE) * CAST(dj.pd AS DOUBLE))
         |    * 1048576.0D + 0.5D) AS LONG)
         |  ELSE 0L END AS rho_ticks
         |FROM p JOIN dg di ON di.d = p.i JOIN dg dj ON dj.d = p.j
         |ORDER BY dim_i, dim_j""".stripMargin,
      SparkEntry.queries("s26_spearman")(spark, sfDir))
  }
}
