package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the test-data star schema. All operators go
  * through these so filters/projections stay declarative and reach
  * the parquet scan (pushdown + pruning).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.ts has shipped in two testdata generations: nanosecond
    * INT64 (Spark 4 rejects ns timestamps — surfaced as a long via the
    * legacy conf, then floor-divided to microseconds with integer
    * `div`, not `/`, because epoch-nanos exceed double's exact-integer
    * range) and, since the round-8 refresh, timestamp[us] with no UTC
    * adjustment (Spark reads TIMESTAMP_NTZ). [[normalizeEventTs]]
    * collapses both to the same session-zone TimestampType values:
    * every entry point pins the session zone to UTC, so the NTZ cast
    * is value-preserving, and both generations match the oracles'
    * `CAST(ts AS TIMESTAMP)` (a microsecond truncation on ns data, a
    * no-op on us data) on the DuckDB side.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(load(s, d, "events"))
  }

  /** Generation-adaptive ts normalization (see [[events]]): long
    * nanos → floor-divide to micros; TIMESTAMP_NTZ → session-zone
    * (UTC) timestamp; already-zoned timestamps pass through.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Cheap layout-level fingerprint of one table's files (count +
    * total bytes + max mtime; a single driver-side FS listing) — the
    * cache key ingredient for session-scoped memos (d07/d08 cluster
    * labels, s05/s06 k-NN graph): a rewrite of the data invalidates
    * the memo instead of serving results for rows that no longer
    * exist. Layout-level, not content-level — a same-size-same-mtime
    * in-place rewrite would still hit; that is the documented
    * contract.
    */
  def fingerprint(s: SparkSession, d: String, name: String): String = {
    val path = new org.apache.hadoop.fs.Path(s"$d/$name.parquet")
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(path).filter(_.isFile)
    s"${files.length}:${files.map(_.getLen).sum}:" +
      s"${if (files.isEmpty) 0L else files.map(_.getModificationTime).max}"
  }
}
