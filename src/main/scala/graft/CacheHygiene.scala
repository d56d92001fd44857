package graft

import org.apache.spark.sql.SparkSession

/** Harness-side checkpoint hygiene (VERDICT r17 #1).
  *
  * Several operators return a `localCheckpoint`ed frame by design — the
  * self-cleaning contract materializes a bounded verdict so the operator
  * can free its own corpus-sized caches before returning (d11b/d12,
  * d02c, d19/d19b, g02b, …) — and some keep INTERMEDIATE checkpoints
  * that never appear in the returned plan at all (g01's per-iteration
  * rank frames). Those blocks are freed only when the ContextCleaner
  * GCs the RDD reference, and on a large driver heap a full bench suite
  * can finish before a single major GC: each rep of each such query
  * stacks another generation of dead blocks, and later suite neighbors
  * time block-manager eviction churn instead of their own work — the
  * r17 artifact's unattributed >2× min-of-reps inflation on
  * d16/d17/s02/s03 (sf10) and q33/q34 (sf1), reproduced and cleared by
  * the REGRESSION_AB_r18 A/B.
  *
  * [[freeTransient]] unpersists every block-manager-resident RDD except
  * the ones the long-lived memo caches pinned (Dedup's cluster table,
  * Graph's projection/arrays tables — the "write once, query many
  * times" layouts that are SUPPOSED to survive). Call it where nothing
  * is in flight: between bench reps, between verify queries, after a
  * consume-once result has been fully drained. Do NOT call it in a
  * session with a concurrent workload (a streaming gate mid-batch) —
  * its in-flight persists would be swept too; the gates free their own
  * frames instead.
  */
object CacheHygiene {

  /** Unpersist all non-memo-pinned persistent RDDs; returns how many
    * were freed (0 = nothing was resident — the hygiene assertion).
    * Blocking by default so eviction IO cannot backwash into whatever
    * runs next (the A/B showed async frees slowing the NEXT query 3×).
    */
  def freeTransient(spark: SparkSession, blocking: Boolean = true): Int =
    freeTransientKeeping(spark, Nil, blocking)

  /** [[freeTransient]] with extra caller-held frames pinned: a harness
    * that keeps a checkpointed frame alive ACROSS sweeps (Recall's
    * ground-truth top-k, scored against every ANN method in turn) must
    * pin it or the sweep unpersists it — and a localCheckpoint's lineage
    * is truncated, so the next read is CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND,
    * not a recompute.
    */
  def freeTransientKeeping(spark: SparkSession,
      keep: Seq[org.apache.spark.sql.DataFrame],
      blocking: Boolean = true): Int = {
    val si = org.apache.spark.sql.graft.SparkInternals
    val pinned = graft.operators.Dedup.memoCheckpointRddIds ++
      graft.operators.Graph.memoCheckpointRddIds ++
      keep.flatMap(si.checkpointRddIds)
    si.freeTransientCheckpoints(spark, pinned, blocking)
  }
}
