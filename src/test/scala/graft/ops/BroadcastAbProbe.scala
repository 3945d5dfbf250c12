package graft.ops

/** A/B the implicit-broadcast pathology at sf1: run headline queries with
  * default thresholds vs autoBroadcastJoinThreshold=-1 (explicit
  * broadcast() hints unaffected). Not part of the suite.
  * Run: `sbt "Test/runMain graft.ops.BroadcastAbProbe [sfDir]"`. */
object BroadcastAbProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val qs = Seq("d34_minhash_pairs", "d62_dup_span_stats", "d71_winnow_overlap",
      "d76_bm25_topk", "d81_decontaminate_spans", "d56_fuzzy_decontaminate",
      "e43_semantic_dedup", "j02_range_join", "m42_image_neardup")
    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (name <- qs) {
      runOnce(name) // warm
      val base = runOnce(name)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      runOnce(name) // warm under new conf
      val noBc = runOnce(name)
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      println(f"ABPROBE $name: default=$base%.2f s  no-implicit-broadcast=$noBc%.2f s")
    }
  }
}
