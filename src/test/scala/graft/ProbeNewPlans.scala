package graft
object ProbeNewPlans {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    for (name <- Seq("j08_interp_resample", "d91_repetition_signals", "e58_filtered_knn")) {
      println(s"========== $name ==========")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
  }
}
