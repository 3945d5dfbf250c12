package graft

import graft.ops.DedupOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Bucket-cap audit for the GRADED near-dup entries (run manually, see
 * SCALE.md round 15): the LSH generators cap degenerate buckets at 100
 * members by default — the right production guard, but a graded entry
 * whose oracle counts EVERY pair must not lose pairs to it at any sf
 * (d35 lost 30 pairs at sf1 this way). For each graded generator config,
 * prints capped vs uncapped pair counts plus the oversized-bucket audit,
 * so the "cap never bites" claim is measured, not assumed.
 */
object CapProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val toks = graft.ops.TextOps.tokens(col("text"))
    val mutated = docs.where("doc_id % 5 = 0").select(
      (col("doc_id") + 1000000L).as("doc_id"),
      concat_ws(" ", slice(toks, lit(1), greatest(size(toks) - 1, lit(1))))
        .as("text"))
    val nearDups = docs.unionByName(mutated)

    def check(label: String, capped: Long, uncapped: Long): Unit =
      println(s"CAPPROBE $label: capped=$capped uncapped=$uncapped " +
        (if (capped == uncapped) "CAP-NEVER-BITES" else "CAP-BITES"))

    // d34/d45/d54/d57/d108 all consume this exact config
    check("minhash sf-neardups",
      DedupOps.minhashLshPairs(nearDups, "doc_id", "text").count(),
      DedupOps.minhashLshPairs(nearDups, "doc_id", "text",
        maxBucket = 1 << 20).count())

    // d35's config (reversed-token duplicates)
    val reversed = docs.where("doc_id % 5 = 0").select(
      (col("doc_id") + 1000000L).as("doc_id"),
      concat_ws(" ", reverse(split(trim(col("text")), "\\s+"))).as("text"))
    val simCorpus = docs.unionByName(reversed)
    check("simhash sf-reversed",
      DedupOps.simhashPairs(simCorpus, "doc_id", "text", maxHamming = 3)
        .count(),
      DedupOps.simhashPairs(simCorpus, "doc_id", "text", maxHamming = 3,
        maxBucket = 1 << 20).count())

    spark.stop()
  }
}
