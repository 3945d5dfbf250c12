package graft.ops

/** Dump a subset of SparkEntry queries + their oracle SQL in the Verify
  * layout so tools/compare_local.py can grade just those entries — the
  * fast loop for wiring a new oracle without re-running the full dump.
  * Run: `sbt "Test/runMain graft.ops.NewQueryCheck <outDir> <sfDir> <q1> [q2...]"`. */
object NewQueryCheck {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: NewQueryCheck <outDir> <sfDir> <q1> [q2...]")
    val outDir = args(0); val sfDir = args(1); val names = args.drop(2).toSeq
    val spark = graft.TestSpark.spark
    for (n <- names) {
      graft.SparkEntry.queries(n)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$n")
      println(s"DUMPED $n")
    }
    val sqls = names.flatMap(n => graft.SparkEntry.oracleSql.get(n).map(n -> _))
    val json = sqls.map { case (n, q) =>
      val esc = q.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n")
      s""""$n": "$esc""""
    }.mkString("{", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    println(s"WROTE ${sqls.size} oracle entries")
  }
}
