package graft
object ProbeNewPlans {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // round-14 continuation additions (streaming drains excluded — their
    // plans live inside the micro-batch runner; state shape spec-pinned)
    for (name <- Seq("d112_dsir_select", "e65_margin_mining")) {
      println(s"========== $name ==========")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
  }
}
