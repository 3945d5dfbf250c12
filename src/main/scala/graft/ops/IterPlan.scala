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
    * the same round (e.g. a convergence count) forces it anyway. */
  def persistedLeaf(df: DataFrame, eager: Boolean = true): DataFrame = {
    val leaf = df.sparkSession.createDataFrame(df.rdd, df.schema)
    leaf.persist(StorageLevel.MEMORY_AND_DISK)
    if (eager) leaf.count()
    leaf
  }
}
