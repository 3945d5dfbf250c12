package graft.ops

/** Time a single [[graft.SparkEntry.queries]] entry (warm + N measured runs)
  * at any sf dir — the minimal harness for A/B-ing one plan change without
  * paying for the whole bench. Not part of the suite.
  * Run: `sbt "Test/runMain graft.ops.QueryTimeProbe <query> [sfDir] [runs]"`. */
object QueryTimeProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: QueryTimeProbe <query> [sfDir] [runs]"))
    val sfDir = if (args.length > 1) args(1) else "/tmp/sf1"
    val runs = if (args.length > 2) args(2).toInt else 2
    // default = the suite's local[4] session (comparable with historic
    // SCALE.md probe numbers); SPARK_GRAFT_CPUS opts into a bench-grade
    // session for reads where 4 cores would spill-bound a big sf
    val spark = sys.env.get("SPARK_GRAFT_CPUS") match {
      case Some(cpus) =>
        val s = org.apache.spark.sql.SparkSession.builder()
          .master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus)
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.sql.legacy.parquet.nanosAsLong", "true")
          .config("spark.sql.extensions", "graft.spark.GraftSqlExtensions")
          .config("spark.ui.enabled", "false")
          .getOrCreate()
        s.sparkContext.setLogLevel("WARN")
        s
      case None => graft.TestSpark.spark
    }
    def runOnce(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    runOnce() // warm
    val ts = Seq.fill(runs)(runOnce())
    println(f"TIMEPROBE $name @ $sfDir: ${ts.map(t => f"$t%.2f").mkString(", ")} s (min ${ts.min}%.2f)")
  }
}
