package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Input-split scaling demo for the map-only kernel tier (r16 verdict
  * item 3): the sf3 probe walls for d119/d120 were single-threaded because
  * the synthetic corpus was ONE parquet row group — parquet splits align
  * to row groups, so `maxPartitionBytes` cannot split it and "map-only ⇒
  * scales" was asserted, not measured. This probe builds the SAME ~30×
  * corpus twice — once as a single file with one giant row group (the
  * pathological layout), once as 32 files (any sane writer's layout) — and
  * times the d119 (unigram entropy) and d120 (featurize + 2 fixed-point
  * gradient steps) kernels on each, printing scan partition counts.
  *
  * Run: `SPARK_GRAFT_CPUS=32 sbt -batch "Test/runMain graft.MapKernelScaleProbe"`
  */
object MapKernelScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[mapscale] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val base = java.nio.file.Files.createTempDirectory("graft-mapscale").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    // 30x corpus, deterministic new ids (the sf3 probe's scale)
    val big = docs
      .withColumn("copy", explode(sequence(lit(0L), lit(29L))))
      .select((col("doc_id") + col("copy") * 10000000L).as("doc_id"),
        col("text"))
    // layout A: ONE file, one giant row group (block size > data) — the
    // exact sf3-probe pathology
    big.coalesce(1).write
      .option("parquet.block.size", (1L << 30).toString)
      .mode("overwrite").parquet(s"$base/onegroup")
    // layout B: 32 files (default row groups)
    big.repartition(32).write.mode("overwrite").parquet(s"$base/split32")

    def d119(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      graft.functions.GraftFunctions.unigram_entropy(
        graft.ops.TextOps.tokens(col("text"))).as("h"))
    for ((name, path) <- Seq("onegroup" -> s"$base/onegroup",
        "split32" -> s"$base/split32")) {
      val df = spark.read.parquet(path)
      println(s"[mapscale] $name scan partitions: " +
        df.rdd.getNumPartitions)
      // warm (footer caches, codegen), then 2 timed runs
      d119(df).write.mode("overwrite").format("noop").save()
      for (i <- 1 to 2) timed(s"d119 unigram_entropy $name #$i") {
        d119(df).write.mode("overwrite").format("noop").save()
      }
      for (i <- 1 to 2) timed(s"d120 trainLogReg(2 iters) $name #$i") {
        graft.ops.TextOps.trainLogReg(df, "text",
          (col("doc_id") % 3 === 0).cast("int"), iters = 2)
      }
    }
    println("[mapscale] DONE")
    spark.stop()
  }
}
