package graft
object ProbeNewPlans {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    for (name <- Seq("e59_hard_negatives", "d96_temperature_mix", "d95_corpus_card")) {
      println(s"========== $name ==========")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
  }
}
