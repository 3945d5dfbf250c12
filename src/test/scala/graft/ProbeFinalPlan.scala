package graft

/** Print the FINAL (post-AQE) physical plan of one SparkEntry query —
  * explain() on a lazy frame shows isFinalPlan=false, hiding runtime
  * exchange reuse; this forces the action first. */
object ProbeFinalPlan {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val name = args.headOption.getOrElse("d100_pmi_collocations")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    println(s"========== $name (final) ==========")
    println(df.queryExecution.executedPlan.toString)
  }
}
