package graft
object ProbeNewPlans {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    for (name <- Seq("d88_length_quantiles", "j06_locf_resample", "e55_knn_matryoshka")) {
      println(s"========== $name ==========")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
  }
}
