package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev-only work-count harness for the optimization rounds: runs each
  * named query once (same full-width toRdd.count action as Bench) with
  * a listener summing jobs / stages / tasks / executor run + CPU time.
  * Host-regime bursts inflate wall time ~uniformly but leave the job
  * count and (mostly) the CPU cycle count alone, so A/B comparisons
  * of these figures discriminate real plan changes where single-shot
  * wall timings on this host cannot. Never run by the driver.
  *
  * args: sfDir [comma-separated query subset]
  */
object JobStats {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val only = args.lift(1).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Engine.tuneSql(spark)
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val runMs = new AtomicLong(0L)
    val cpuNs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) {
          runMs.addAndGet(t.taskMetrics.executorRunTime)
          cpuNs.addAndGet(t.taskMetrics.executorCpuTime)
        }
      }
    })
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // private listener bus: settle by sleeping briefly after each run
    // (dev harness — 300 ms is far past the bus's drain latency)
    def settle(): Unit = Thread.sleep(300)
    names.foreach { name =>
      settle()
      jobs.set(0); stages.set(0); tasks.set(0); runMs.set(0L); cpuNs.set(0L)
      val t0 = System.nanoTime()
      try {
        val plan =
          graft.plans.PlanAudit.executedPlan(SparkEntry.queries(name)(spark, sfDir))
        settle()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[jobstats] $name jobs=${jobs.get} stages=${stages.get} " +
          f"tasks=${tasks.get} run_s=${runMs.get / 1e3}%.2f " +
          f"cpu_s=${cpuNs.get / 1e9}%.2f wall_s=$wall%.2f")
        // optional per-node SQLMetrics dump of the FINAL action's plan
        // (loop rounds ran as earlier jobs and are not covered)
        if (sys.env.contains("SPARK_GRAFT_NODEMETRICS"))
          graft.plans.PlanAudit.allNodes(plan).foreach { n =>
            val ms = n.metrics.toSeq
              .filter { case (_, m) => m.value > 0 }
              .sortBy(-_._2.value)
              .take(6)
              .map { case (k, m) => s"$k=${m.value}" }.mkString(" ")
            if (ms.nonEmpty)
              println(s"[nodemetrics] $name ${n.nodeName} $ms")
          }
      } catch { case e: Throwable =>
        println(s"[jobstats] $name FAILED ${e.getClass.getName}: ${e.getMessage}")
      }
      FrameMemo.releaseTransientBlocks(spark)
    }
    spark.stop()
  }
}
