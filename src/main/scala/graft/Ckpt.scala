package graft

import org.apache.spark.sql.Dataset

/** Lineage truncation with a production escape hatch.
  *
  * Every iterative operator in the suite truncates lineage per round
  * (the exponential-plan lesson from connectedComponents). The
  * default mechanism is `localCheckpoint` — executor-local blocks,
  * no filesystem round-trip, exactly right at local[32] and the
  * fastest option on a healthy cluster. But local checkpoint blocks
  * DIE WITH THEIR EXECUTOR: at 1000 executors over a long iterative
  * job, executor loss is routine, and a lost block fails the job
  * because the truncated lineage cannot be recomputed.
  *
  * The opt-in: set `graft.checkpoint.dir` on the session (any
  * Hadoop-visible path — HDFS, S3A, …) and every lineage-truncation
  * point in the library switches to RELIABLE `checkpoint` into that
  * directory, surviving executor loss at the price of a write per
  * truncation. Unset (the default), behavior is byte-identical to
  * `localCheckpoint` — operators call [[Ckpt.CkptOps.ckpt]]
  * uniformly and the conf decides. Results are identical either way
  * (checkpointing changes WHERE a frame is materialized, never its
  * rows); the spec pins that.
  *
  * Mirrors the reference's posture split: its RDD lineage offers the
  * same two checkpoint flavors (reference: /root/reference/core/src/
  * main/scala/org/apache/spark/rdd/RDD.scala:1 — `checkpoint` vs
  * `localCheckpoint`, with the same executor-loss caveat documented
  * on the local variant).
  *
  * Lazy-ckpt caveat in RELIABLE mode: the iterative operators'
  * digest-converged loops call `ckpt(false)` and let the 1-row
  * convergence digest materialize the round frame ("one job instead
  * of two"). That fusion is real only for `localCheckpoint` — with
  * [[DirConf]] set, `checkpoint(false)` still runs a SEPARATE write
  * job on the first action, RECOMPUTING the round frame after the
  * digest job. The digest and the persisted blocks therefore come
  * from two different computations of the same plan; this is safe
  * only because every round frame in the library is
  * value-deterministic (pure aggregations over checkpointed inputs).
  * A future round frame with nondeterminism (sampling without a
  * seed, timestamps, …) must NOT adopt the lazy pattern — use
  * `ckpt(true)` so the digest reads the persisted computation.
  *
  * Disk-growth tradeoff of the opt-in: Spark does NOT delete
  * reliable-checkpoint files when the frame goes out of scope unless
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true`, and the
  * iterative operators write one checkpoint per round per
  * invocation — a long-lived session with the conf set accumulates
  * checkpoint directories unbounded. Set the cleaner conf alongside
  * [[DirConf]] for long-lived sessions (it is a SparkContext conf,
  * so it must be set at session build time, not per-query), or point
  * the dir at storage with a TTL/lifecycle rule.
  */
object Ckpt {
  /** Session conf key: when set (non-empty), lineage truncation uses
    * reliable `checkpoint` into this directory.
    */
  val DirConf = "graft.checkpoint.dir"

  implicit final class CkptOps[T](private val ds: Dataset[T]) extends AnyVal {
    /** The library's single lineage-truncation point: reliable
      * `checkpoint(eager)` when [[DirConf]] is set, `localCheckpoint
      * (eager)` otherwise. The SparkContext checkpoint dir is set
      * lazily from the conf on first use and left alone if the caller
      * already configured one (their choice wins).
      */
    def ckpt(eager: Boolean): Dataset[T] = {
      val spark = ds.sparkSession
      spark.conf.getOption(DirConf).filter(_.nonEmpty) match {
        case Some(dir) =>
          val sc = spark.sparkContext
          if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
          ds.checkpoint(eager)
        case None => ds.localCheckpoint(eager)
      }
    }
  }
}
