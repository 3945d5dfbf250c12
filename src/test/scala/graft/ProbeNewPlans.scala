package graft
object ProbeNewPlans {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    for (name <- Seq("d92_curation_pipeline", "d93_fuzzy_match", "d94_script_profile")) {
      println(s"========== $name ==========")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
  }
}
