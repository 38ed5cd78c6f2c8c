package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** TEMPORARY r17 measurement probe — times the s05 pipeline pieces at
  * sf0.1 under bench-like confs. Deleted before the round closes.
  */
class S05ProbeSpec extends AnyFunSuite {
  test("probe s05 pieces", org.scalatest.Tag("probe")) {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("s05probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Engine.tuneSql(spark)
    graft.functions.registerAll(spark)
    val cpu = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) cpu.addAndGet(t.taskMetrics.executorCpuTime)
    })
    def time[T](label: String)(f: => T): T = {
      Thread.sleep(300); cpu.set(0L)
      val t0 = System.nanoTime()
      val r = f
      Thread.sleep(300)
      println(f"[probe] $label wall=${(System.nanoTime() - t0) / 1e9}%.2f cpu=${cpu.get / 1e9}%.2f")
      r
    }
    val sfDir = "/root/testdata/sf0.1"
    val emb = Tables.embeddings(spark, sfDir).select(F.col("vec_id"), F.col("embedding"))
    val n = time("emb.count")(emb.count())
    val bits = operators.Similarity.annBitsFor(n)
    println(s"[probe] n=$n bits=$bits")
    val bands = operators.Similarity.annBanded(emb, "vec_id", "embedding",
      keepVec = false, bits = bits)
    time("bands.count")(bands.count())
    val half = operators.Dedup.bucketPairs(bands, Seq("band_id", "band_val"),
      F.col("vec_id"), operators.Dedup.MaxBucket, operators.Dedup.PairStreamBucket)
      .select(F.col("a").as("query_id"), F.col("b").as("vec_id"))
    val nh = time("half.count (bucketPairs)")(half.count())
    println(s"[probe] half pairs=$nh")
    val candIds = half.union(
      half.select(F.col("vec_id").as("query_id"), F.col("query_id").as("vec_id")))
    val scored = candIds
      .join(emb.select(F.col("vec_id").as("query_id"), F.col("embedding").as("qv")), "query_id")
      .join(emb, "vec_id")
      .withColumn("cos_raw", F.call_function("cosine_sim", F.col("qv"), F.col("embedding")))
    time("scored noop")(scored.write.format("noop").mode("overwrite").save())
    val topk = scored
      .groupBy(F.col("query_id"))
      .agg(F.call_function("top_k_by_score", F.col("cos_raw"), F.col("vec_id"), F.lit(3)).as("top"))
    time("topk noop")(topk.write.format("noop").mode("overwrite").save())
    time("full knnGraphFor ckpt") {
      import graft.Ckpt._
      operators.Similarity.knnGraphFor(emb).ckpt(true)
    }
    spark.stop()
  }
}
