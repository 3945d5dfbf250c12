package graft
object ProbeNewPlans {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // round-13 additions (streaming drains excluded — their plans live
    // inside the micro-batch runner; their state shape is spec-pinned)
    for (name <- Seq("j09_ohlc_downsample", "d104_bm25_incremental",
        "d82_bm25_search_only", "e62_knn_ivfpq_index",
        "d105_stratified_split", "d106_split_leakage",
        "e63_knn_sq8_index")) {
      println(s"========== $name ==========")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
  }
}
