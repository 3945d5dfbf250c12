package graft

import graft.ops.{DedupOps, GraphOps}
import org.apache.spark.sql.functions._

/** Deep-iteration probe (r16 verdict item 5): the 64-round BPE trainer
  * overflowed task deserialization at ~800 chained stages before the
  * lineage cut landed; the OTHER iterative loops (PageRank, PPR, LPA, CC)
  * converge in ≤ ~20 rounds on every fixture and had never run deep. Force
  * each to its depth cap and record wall + driver health: no stack/driver
  * growth expected because every round's plan is truncated to a leaf and
  * the per-round RDD lineage depth is constant-bounded per round (the
  * leaves chain, but at 2-3 stages/round even 64 rounds sit far under the
  * ~800-stage overflow point measured for BPE).
  *
  * Run: `sbt -batch "Test/runMain graft.DeepIterProbe [sfDir]"` — results
  * recorded in SCALE.md.
  */
object DeepIterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = TestSpark.spark
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[deepiter] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id")
    val edges = docs.select(col("doc_id").as("src"),
        ((col("doc_id") * 7 + 13) % 101).as("dst"))
      .unionByName(docs.select(col("doc_id").as("src"),
        (col("doc_id") % 97).as("dst")))

    val pr = timed("pageRank 64 iterations") {
      GraphOps.pageRank(edges, "src", "dst", iters = 64, damping = 0.875)
        .agg(sum("rank")).collect()(0).getDouble(0)
    }
    println(f"[deepiter] pagerank mass: $pr%.9f")

    val ppr = timed("personalizedPageRank 64 iterations") {
      GraphOps.personalizedPageRank(edges, "src", "dst",
          Seq(3L, 5L, 7L, 11L), iters = 64, damping = 0.875)
        .agg(sum("rank")).collect()(0).getDouble(0)
    }
    println(f"[deepiter] ppr mass: $ppr%.9f")

    val lpa = timed("labelPropagation 32 rounds (its cap)") {
      GraphOps.labelPropagation(edges, "src", "dst", iters = 32).count()
    }
    println(s"[deepiter] lpa rows: $lpa")

    // CC's depth driver is graph DIAMETER (pointer jumping: rounds ~
    // log2(diameter)); a 100k-node chain forces ~17 real rounds — the
    // deepest CC run on record
    import spark.implicits._
    val chain = spark.range(0, 100000)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val cc = timed("connectedComponents on a 100k chain (~17 rounds)") {
      DedupOps.connectedComponents(chain, maxIter = 20)
        .agg(countDistinct(col("component"))).collect()(0).getLong(0)
    }
    println(s"[deepiter] chain components: $cc (want 1)")
    assert(cc == 1L)
    println("[deepiter] DONE — no lineage/stack failure at depth caps")
  }
}
