package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Encodes the OPS insight (minimize + pre-combine shuffled data;
  * reference: /root/reference/core/src/main/scala/org/apache/spark/
  * shuffle/OpsShuffleReader.scala) at the conf level where modern
  * Spark exposes it: AQE (runtime coalescing + skew-join splitting),
  * broadcast-join conversion, and right-sized shuffle partitions.
  */
object Engine {
  /** Tune an externally-built session (Verify/Bench create their own). */
  def configure(spark: SparkSession): SparkSession = {
    val c = spark.conf
    c.set("spark.sql.adaptive.enabled", "true")
    c.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    c.set("spark.sql.adaptive.skewJoin.enabled", "true")
    c.set("spark.sql.session.timeZone", "UTC")
    graft.functions.registerAll(spark)
    spark
  }

  def build(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    configure(spark)
  }
}
