package graft
object ProbeNewPlans {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // round-16 slice twins (streaming drains excluded — their plans live
    // inside the micro-batch runner; state shape spec-pinned): the
    // OUTPUT-filtered ones should show the window filter ABOVE the
    // full-corpus pair/search pipeline (that's the design — full-scale
    // signatures/caps, windowed compare), and the INPUT-windowed ones
    // should show the base filter pushed INTO the parquet scan
    for (name <- Seq("d34_minhash_pairs_slice", "d45_neardup_clusters_slice",
        "d56_fuzzy_decontaminate_slice", "e44_knn_graph_slice",
        "d89_dup_source_matrix_slice")) {
      println(s"========== $name ==========")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
  }
}
