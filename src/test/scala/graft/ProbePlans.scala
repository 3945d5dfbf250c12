package graft

/** Print physical plans of headline queries for pushdown/broadcast review. */
object ProbePlans {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    for (name <- Seq("q02_filter_pushdown", "q04_broadcast_join", "q05_multi_join",
        "g27_partition_prune")) {
      println(s"========== $name ==========")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
  }
}
