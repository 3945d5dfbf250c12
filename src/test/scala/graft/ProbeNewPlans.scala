package graft
object ProbeNewPlans {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // latest round-14 additions (streaming drains excluded — their
    // plans live inside the micro-batch runner; state shape spec-pinned)
    for (name <- Seq("d116_contamination_report", "q28_window_stats",
        "e66_margin_mining_ivf", "d115_dsir_incremental")) {
      println(s"========== $name ==========")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
  }
}
