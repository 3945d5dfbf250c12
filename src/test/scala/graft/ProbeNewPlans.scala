package graft
object ProbeNewPlans {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // round-14 additions + the reshaped entries (streaming drains
    // excluded — their plans live inside the micro-batch runner; their
    // state shape is spec-pinned)
    for (name <- Seq("j09_ohlc_downsample", "e62_knn_ivfpq_search_only",
        "e44_knn_graph_approx", "q01_pricing_summary")) {
      println(s"========== $name ==========")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
  }
}
