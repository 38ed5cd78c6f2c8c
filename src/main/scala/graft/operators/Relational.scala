package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational core: the Spark SQL surface the reference engine
  * (a Spark 2.4.3 fork — /root/reference/sql) exposes, re-expressed
  * as declarative DataFrame plans on Spark 4 so Catalyst handles
  * pushdown, pruning, join selection and AQE handles runtime
  * coalescing/skew.
  *
  * Conventions (driver-oracle parity):
  *  - every aggregate/computed column is aliased identically here and
  *    in [[graft.SparkEntry.oracleSql]];
  *  - money sums rounded to 2dp, averages to 4dp, so double summation
  *    order cannot flip the driver's value hash;
  *  - every result has a deterministic ORDER BY over output columns.
  */
object Relational {

  private def ts(s: String): Column = to_timestamp(lit(s))

  /** q01: scan→filter→groupBy multi-aggregate (TPC-H Q1 shape).
    * Partial aggregation (map-side combine) is the OPS-style shuffle
    * reducer here: 6 groups leave each task, not 60k rows.
    */
  def q01PricingSummary(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** q02: selective filter + narrow projection. Both the predicate and
    * the 4-column read schema must reach the parquet scan (verified in
    * the explain audit: PushedFilters + ReadSchema).
    */
  def q02FilterProject(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= ts("1997-01-01 00:00:00") &&
              col("l_shipdate") <  ts("1997-02-01 00:00:00") &&
              col("l_quantity") < 4)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_partkey"), col("l_quantity"), col("l_extendedprice"))

  /** q03: 3-way join → agg → top-k (TPC-H Q3 shape). customer is small
    * relative to lineitem → broadcast; orders⋈lineitem shuffles on the
    * order key once, and the final top-10 is a TakeOrdered, not a full
    * sort.
    */
  def q03JoinAggTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, sfDir).filter(col("o_orderdate") < ts("1998-01-01 00:00:00"))
    val li = Tables.lineitem(spark, sfDir).filter(col("l_shipdate") > ts("1998-01-01 00:00:00"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** q04: left-semi join (EXISTS) with a cross-table predicate:
    * orders that had a line shipped after the order date.
    */
  def q04Semijoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
              col("o_orderdate") <  ts("1996-07-01 00:00:00"))
    val li = Tables.lineitem(spark, sfDir)
    ord.join(li,
        col("l_orderkey") === col("o_orderkey") && col("l_shipdate") > col("o_orderdate"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** q05: 6-way join with broadcast dimensions (TPC-H Q5 shape).
    * region/nation/supplier are dims → broadcast; only the
    * customer⋈orders⋈lineitem chain shuffles, keyed so AQE can
    * coalesce.
    */
  def q05MultiwayJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
              col("o_orderdate") <  ts("1998-01-01 00:00:00"))
    val li = Tables.lineitem(spark, sfDir)
    val sup = Tables.supplier(spark, sfDir)
    val nat = Tables.nation(spark, sfDir)
    val reg = Tables.region(spark, sfDir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("n_name"))
  }

  /** q06: tight range filter + single global aggregate (TPC-H Q6).
    * Fully pushed scan; one partial-agg per task, one exchange of six
    * doubles — the minimal-shuffle shape.
    */
  def q06SelectiveAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
              col("l_shipdate") <  ts("1997-01-01 00:00:00") &&
              col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
              col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))
}
