package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Link-graph operators for web-corpus curation. PageRank is the classic
 * page-authority signal (OPIC/harmonic-centrality variants rank Common
 * Crawl's frontier; a rank floor is a standard crawl-corpus quality
 * filter) — [[DedupOps.connectedComponents]]'s iterative machinery,
 * applied to a directed graph with per-round mass redistribution.
 */
object GraphOps {

  /**
   * PageRank over a directed edge list: `iters` power iterations of
   * `rank' = (1-d)/N + d·(Σ_in rank/outdeg + danglingMass/N)` with
   * uniform teleport and uniform dangling-mass redistribution (the
   * standard treatment — a node with no out-links donates its rank to
   * everyone, else total mass leaks). Parallel edges collapse first;
   * nodes are everything appearing as src OR dst.
   *
   * 100 TB design: the edge table (joined once with out-degrees) is
   * PERSISTED and reused across iterations; each iteration is EXACTLY
   * TWO driver actions (asserted by a listener spec): the leaf
   * conversion of the next ranks, and ONE join-free aggregate that
   * doubles as both the eager cache materialization of that leaf AND
   * the next round's dangling-mass computation. The rank state carries
   * a `has_out` flag stamped ONCE at setup, so the dangling mass is a
   * map-side-combinable `sum(when(!has_out, rank))` over the fresh
   * leaf — one O(nodes) scan that populates the cache as a side
   * effect; the separate per-iteration `count()`, the dangling
   * anti-join, and the broadcast-build of the old one-row dm frame are
   * all gone. The dangling mass enters the update as a LITERAL (one
   * bounded double off a one-row aggregate — the same boundedness as a
   * one-row broadcast, same addends, so ranks are numerically
   * unchanged). Every round truncates the Catalyst plan with the same
   * persisted-RDD-leaf trick as [[DedupOps.connectedComponents]] (each
   * round references the previous ranks twice — contributions +
   * dangling — so the analyzed plan would otherwise double per round);
   * materialization stays eager (via the dm aggregate) so the previous
   * round's cache can be dropped deterministically.
   *
   * Returns `(id, rank)` with ranks summing to 1 (up to float wobble).
   */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 10, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1), got $damping")
    def persistedLeaf(df: DataFrame, eager: Boolean = true): DataFrame =
      IterPlan.persistedLeaf(df, eager)
    val eDist = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val outDeg = eDist.groupBy("src").agg(count(lit(1)).as("outdeg"))
      // out-degree rides the edge row, so iterations never re-join it
      val ew = persistedLeaf(eDist.join(outDeg, "src")
        .select(col("src"), col("dst"), col("outdeg")))
      // node state carries a has_out flag stamped ONCE: the per-round
      // dangling-mass read is then a join-free scan of the rank leaf
      // (dangling = nodes appearing only as dst)
      val nodes = persistedLeaf(
        eDist.select(col("src").as("id"))
          .unionAll(eDist.select(col("dst").as("id"))).distinct()
          .join(ew.select(col("src").as("id"), lit(true).as("__has_out"))
            .distinct(), Seq("id"), "left")
          .select(col("id"), coalesce(col("__has_out"), lit(false)).as("has_out")))
      // nodes was just force-counted by persistedLeaf; this count reads
      // the fresh cache entry
      val n = nodes.count().toDouble
      // Materialize a new ranks leaf AND read off its dangling mass in
      // ONE action: the aggregate's scan of the fresh (lazily persisted)
      // leaf populates the cache exactly like persistedLeaf's eager
      // count did, and its one-row result is the NEXT round's dm — so
      // an iteration costs two driver actions total (leaf conversion +
      // this aggregate), with no separate count, no join, and no
      // broadcast build. The previous leaf is still cached while this
      // runs, so the lazy leaf never re-chains through released rounds.
      def materializeWithDm(df: DataFrame): (DataFrame, Double) = {
        val leaf = persistedLeaf(df, eager = false)
        val dm = leaf
          .agg(coalesce(sum(when(!col("has_out"), col("rank"))), lit(0.0)))
          .head().getDouble(0)
        (leaf, dm)
      }
      var (ranks, dm) = materializeWithDm(
        nodes.select(col("id"), (lit(1.0) / lit(n)).as("rank"), col("has_out")))
      try {
        var i = 0
        while (i < iters) {
          // one combinable contribution shuffle; dm enters as a literal
          // (same addends and sum as the former one-row broadcast, so
          // ranks are numerically unchanged)
          val contribs = ew.join(ranks, ew("src") === ranks("id"))
            .select(col("dst").as("id"),
              (col("rank") / col("outdeg").cast("double")).as("c"))
            .groupBy("id").agg(sum("c").as("c"))
          val (next, dmNext) = materializeWithDm(
            nodes.join(contribs, Seq("id"), "left")
              .select(col("id"),
                (lit((1.0 - damping)) / lit(n) + lit(damping) *
                  (coalesce(col("c"), lit(0.0)) + lit(dm) / lit(n)))
                  .as("rank"),
                col("has_out")))
          ranks.unpersist()
          ranks = next
          dm = dmNext
          i += 1
        }
        // re-materialize off the cache so the entry can be dropped
        val result = ranks.select(col("id"), col("rank")).localCheckpoint(true)
        result
      } finally {
        // also covers mid-iteration failures: the CURRENT ranks leaf is
        // always the one persisted entry not yet released
        ranks.unpersist()
        ew.unpersist(); nodes.unpersist()
      }
    } finally eDist.unpersist()
  }
}
