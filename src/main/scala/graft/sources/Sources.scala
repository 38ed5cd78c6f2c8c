package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Non-parquet sources and layout-aware sinks (SURVEY §2 infra).
  *
  * Scale posture baked in:
  *  - reads take an EXPLICIT schema — schema inference is a full extra
  *    pass over the data (unacceptable at 100 TB) and silently widens
  *    types; FAILFAST surfaces corrupt records instead of nulling them.
  *  - partitioned writes give the reader partition pruning (a filter
  *    on the partition column skips whole directories);
  *  - bucketed writes give co-located joins: two tables bucketed on
  *    the same key with the same bucket count join WITHOUT a shuffle.
  */
object Sources {

  /** CSV read with explicit schema; header expected by default. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("mode", "FAILFAST")
      .csv(path)

  /** JSON-lines read with explicit schema. */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("mode", "FAILFAST")
      .json(path)

  /** CSV write (header on), for round-trip interchange. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** JSON-lines write. */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC read with explicit schema — the other columnar interchange
    * format next to parquet; same pushdown/pruning behavior.
    */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** ORC write. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Hive-style partitioned parquet write: one directory per value of
    * the partition columns. Keep partition-column cardinality modest
    * (≤ ~10⁴ directories) — per-key file explosion is its own scale
    * failure.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Bucketed + sorted managed table: `nBuckets` files per partition,
    * rows hash-distributed by `bucketCol` and sorted within buckets —
    * equi-joins between tables bucketed identically need no exchange.
    */
  def writeBucketedTable(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
