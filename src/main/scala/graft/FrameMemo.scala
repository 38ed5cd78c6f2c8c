package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Single-entry materialize-once memo for an eagerly checkpointed
  * frame, keyed by (session, dir, content fingerprint) — the shared
  * lifecycle behind Dedup's cluster labels and Similarity's k-NN
  * graph (see their scaladocs for WHY each memoizes).
  *
  * What this class adds over the raw `private var` memos it replaced
  * is block accounting: `localCheckpoint(true)` parks storage blocks
  * that outlive the query that created them, and a long sweep (the
  * 103-query bench) accumulating every query's checkpoint blocks in
  * one JVM taxes whatever runs next (measured: nine mid-sweep queries
  * 3-9x their isolated time in BENCH_r06). The sweep harness must
  * free blocks between queries — but blindly unpersisting EVERY
  * persistent RDD would also kill the blocks behind a live memo,
  * whose frame is then unreadable (a local checkpoint truncates
  * lineage; lost blocks cannot be recomputed). So:
  *
  *  - `getOrCompute` records the persistent-RDD ids that appear while
  *    `compute` runs (the memo's own checkpoint plus any transient
  *    checkpoints its pipeline makes — a small over-approximation,
  *    freed together at eviction);
  *  - `retainedIds` exposes them so [[Bench]] can unpersist
  *    everything EXCEPT live memo blocks at each query boundary;
  *  - eviction (key mismatch) and `clear()` unpersist the recorded
  *    ids atomically with dropping the reference — the invalidation
  *    contract that makes the harness-side cleanup safe.
  *
  * Single-threaded creation is assumed (all callers synchronize on
  * their operator object via this memo's own lock); the id-diff
  * recording is only meaningful when one compute runs at a time,
  * which the `synchronized` here guarantees.
  *
  * LOCK-ORDER INVARIANT: a `compute` block must NEVER call another
  * memo's `getOrCompute` (no nested memo computes). `getOrCompute`
  * takes this instance's monitor first and the process-wide
  * [[FrameMemo.computeLock]] second; a nested call from inside a
  * compute block would try to take a SECOND instance monitor while
  * holding `computeLock`, which deadlocks against a thread that holds
  * that other monitor and is waiting on `computeLock`. If an operator
  * memo ever needs to derive from another memoized frame, compute the
  * upstream frame BEFORE entering `getOrCompute` and close over the
  * result.
  */
private[graft] final class FrameMemo[T] {
  private var entry: Option[(SparkSession, String, String, T, Set[Int])] = None

  def getOrCompute(spark: SparkSession, dir: String, fp: String)(
      compute: => T): T = synchronized {
    entry match {
      case Some((s, d, f, frame, _)) if (s eq spark) && d == dir && f == fp =>
        frame
      case prev =>
        prev.foreach { case (s, _, _, _, ids) => unpersistIds(s, ids) }
        entry = None
        // The before/after diff is only attributable when no OTHER
        // memo computes concurrently: two instances each hold their
        // own lock, and an overlapped compute would capture the other
        // memo's checkpoint ids — whose later eviction would then
        // unpersist blocks backing a live lineage-truncated frame
        // (unrecoverable). One process-wide lock across all memo
        // computes makes the diff exact.
        FrameMemo.computeLock.synchronized {
          val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
          val frame = compute
          val ids = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
          entry = Some((spark, dir, fp, frame, ids))
          frame
        }
    }
  }

  /** Persistent-RDD ids backing the live entry (empty when vacant). */
  def retainedIds: Set[Int] = synchronized {
    entry.map(_._5).getOrElse(Set.empty)
  }

  /** Drop the entry and unpersist its blocks. Safe when vacant. */
  def clear(): Unit = synchronized {
    entry.foreach { case (s, _, _, _, ids) => unpersistIds(s, ids) }
    entry = None
  }

  private def unpersistIds(spark: SparkSession, ids: Set[Int]): Unit =
    if (!spark.sparkContext.isStopped)
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (ids.contains(id)) rdd.unpersist(blocking = false)
      }
}

private[graft] object FrameMemo {
  /** Process-wide lock serializing every memo's compute+diff section
    * — see the attribution note in [[FrameMemo.getOrCompute]].
    */
  private val computeLock = new Object

  /** Unpersist every persistent RDD EXCEPT blocks backing the live
    * library memos (Dedup cluster labels, Similarity k-NN graph) —
    * the between-query cleanup any long sweep over many operators in
    * ONE session needs: accumulated localCheckpoint blocks measured
    * a 3-9x mid-sweep tax on unrelated queries (BENCH_r06). Shared
    * by [[graft.Bench]] and [[graft.Audit]]'s sweeps.
    */
  def releaseTransientBlocks(spark: SparkSession): Unit = {
    val retained = graft.operators.Dedup.memoRetainedIds ++
      graft.operators.Similarity.memoRetainedIds ++
      graft.operators.Graph.memoRetainedIds ++
      graft.operators.Itemsets.memoRetainedIds ++
      graft.operators.TextAnalysis.memoRetainedIds ++
      graft.operators.Recommend.memoRetainedIds ++
      graft.operators.Events.memoRetainedIds
    spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!retained.contains(id)) rdd.unpersist(blocking = false)
    }
  }

  /** Drop every library memo (and its blocks) — the full reset a
    * harness runs between data regimes (e.g. warm dir → timed dir).
    */
  def clearAllMemos(): Unit = {
    graft.operators.Dedup.clearMemos()
    graft.operators.Similarity.clearMemos()
    graft.operators.Graph.clearMemos()
    graft.operators.Itemsets.clearMemos()
    graft.operators.TextAnalysis.clearMemos()
    graft.operators.Recommend.clearMemos()
    graft.operators.Events.clearMemos()
  }
}
