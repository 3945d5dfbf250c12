package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Shared infrastructure for iterative DataFrame algorithms
  * ([[DedupOps.connectedComponents]], [[GraphOps.pageRank]]): every round
  * must TRUNCATE the Catalyst plan, not just cache the data — persist
  * keeps the logical plan, and a round that references the previous
  * frame twice doubles the analyzed plan per iteration (2^rounds
  * subtrees; driver OOM long before the data is large). The RDD
  * round-trip replaces the round's plan with a leaf while keeping cache
  * lifetime EXPLICIT (per-round unpersist — checkpoint blocks would only
  * be reclaimed asynchronously). */
private[ops] object IterPlan {

  /** Persisted plan-truncating leaf. `eager = true` materializes NOW —
    * required when the caller unpersists the PREVIOUS leaf right after
    * (a lazy leaf would re-chain through every already-released round
    * when finally executed); pass `eager = false` when a later action in
    * the same round (e.g. a convergence count) forces it anyway.
    *
    * The leaf wraps the INTERNAL row RDD (`toRdd` via the graftbridge) —
    * the public `createDataFrame(df.rdd, schema)` equivalent decodes every
    * row to an external Row and re-encodes it back per materialization,
    * a double per-row codec pass the iterative ops paid every round. */
  def persistedLeaf(df: DataFrame, eager: Boolean = true): DataFrame = {
    val leaf = org.apache.spark.sql.graftbridge.CatalystBridge.planTruncatedLeaf(df)
    leaf.persist(StorageLevel.MEMORY_AND_DISK)
    if (eager) leaf.count()
    leaf
  }

  /** Plan-truncating leaf that ALSO cuts RDD lineage (localCheckpoint):
    * [[persistedLeaf]] truncates the Catalyst plan but each round's RDD
    * still references the previous round's, so a DEEP loop (the batched
    * BPE trainer's 64 rounds — the rich-fixture probe overflowed the task
    * stack deserializing ~800 chained stages; CC/PageRank converge in
    * ≤ ~20 rounds and never get there) must periodically drop history.
    * Tradeoff made explicit: localCheckpoint blocks are NOT recomputable
    * after executor loss — on a cluster that turns an executor failure
    * into a query restart, the standard trainer-loop boundary (Spark's
    * own iterative algorithms checkpoint every N rounds for the same
    * reason); a durability-critical deployment would checkpoint to the
    * cluster FS instead. */
  def localCheckpointLeaf(df: DataFrame, eager: Boolean = true): DataFrame =
    df.localCheckpoint(eager)
}
