package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.spark.GraftSqlExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // local-iteration filter: SPARK_GRAFT_ONLY=d59,d62 runs a subset;
    // unset (the driver's invocation) runs everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(pfx) => SparkEntry.queries.filter { case (n, _) => pfx.exists(n.startsWith) }
      case None      => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      try {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        // the r12 j09/s60 lesson: a session-tz TIMESTAMP output hashes
        // differently from the oracle's naive timestamp even when every
        // value matches — OutputTypeDisciplineSpec fails the suite on
        // this; the dump-time warning makes it loud at the gate too
        val ltz = df.schema.fields.filter(
          _.dataType == org.apache.spark.sql.types.TimestampType).map(_.name)
        if (ltz.nonEmpty)
          System.err.println(s"[verify] WARNING $name emits session-tz " +
            s"TIMESTAMP column(s) ${ltz.mkString(",")} — cast to timestamp_ntz")
        // r13 lesson: DECIMAL outputs hash-fail on the driver even when
        // value-equal (decimal128 vs float fetch) — OutputTypeDisciplineSpec
        // fails the suite on this; the dump-time warning is the gate echo
        val dec = df.schema.fields.filter(
          _.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType]).map(_.name)
        if (dec.nonEmpty)
          System.err.println(s"[verify] WARNING $name emits DECIMAL " +
            s"column(s) ${dec.mkString(",")} — cast to double/bigint")
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        // per-entry wall time on stderr: the sf1 full-suite sweep reads
        // these to find scaling cliffs without a separate bench run
        System.err.println(f"[verify] $name dumped in " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
