package graft.ops

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** Timing decomposition for the APPROX kNN-graph config (auto sqrt-nlist,
  * nprobe 4) — the bench headline. Not part of the suite.
  * Run: `sbt "Test/runMain graft.ops.KnnApproxProbe [sfDir]"`. */
object KnnApproxProbe {
  private def timed[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"TIMER $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val nl = math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)
    println(s"corpus=$n nlist=$nl")

    timed("warm full approx knnGraph") {
      SimilarityOps.knnGraph(emb, "vec_id", "embedding", k = 3, nprobe = 4)
        .write.mode("overwrite").format("noop").save()
    }
    timed("full approx knnGraph") {
      SimilarityOps.knnGraph(emb, "vec_id", "embedding", k = 3, nprobe = 4)
        .write.mode("overwrite").format("noop").save()
    }
    val sample = timed("sampleVectors(4096)") {
      SimilarityOps.sampleVectors(emb, "embedding", 4096)
    }
    val centers = timed("trainKmeans") {
      SimilarityOps.trainKmeans(sample, nl, iters = 10, 42L)
    }
    val cells = emb.select(col("vec_id").as("nbr_id"), col("embedding").as("cvec"),
      GraftFunctions.nearest_centroid(col("embedding"), centers).as("cell"))
    timed("assign pass only (count)") { cells.count() }
    val probes = emb.select(col("vec_id").as("src_id"), col("embedding").as("qvec"),
      explode(GraftFunctions.nearest_centroids(col("embedding"), centers, 4)).as("cell"))
    timed("probe pass only (count)") { probes.count() }
    val scored = cells.join(probes, Seq("cell"))
      .where(col("src_id") =!= col("nbr_id"))
      .select(col("src_id"), col("nbr_id"),
        GraftFunctions.cosine_similarity(col("cvec"), col("qvec")).as("cosine"))
    timed("join+cosine (count)") { println("pairs=" + scored.count()) }
    println("JOIN EXEC: " + scored.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("Join")).mkString(" | ").take(200))
    val scoredSHJ = cells.hint("shuffle_hash").join(probes, Seq("cell"))
      .where(col("src_id") =!= col("nbr_id"))
      .select(col("src_id"), col("nbr_id"),
        GraftFunctions.cosine_similarity(col("cvec"), col("qvec")).as("cosine"))
    timed("SHJ-hint sum(cosine)") { scoredSHJ.agg(sum("cosine")).head() }
    timed("SHJ-hint topk agg") {
      scoredSHJ.groupBy("src_id")
        .agg(GraftFunctions.top_k_by(col("cosine"), col("nbr_id"), 3).as("tk"))
        .write.mode("overwrite").format("noop").save()
    }
    timed("sum(cosine) no groupBy") {
      scored.agg(sum("cosine")).head()
    }
    timed("groupBy sum(cosine) hash agg") {
      scored.groupBy("src_id").agg(sum("cosine"))
        .write.mode("overwrite").format("noop").save()
    }
    timed("topk agg (default fallback threshold 128)") {
      scored.groupBy("src_id")
        .agg(GraftFunctions.top_k_by(col("cosine"), col("nbr_id"), 3).as("tk"))
        .write.mode("overwrite").format("noop").save()
    }
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
    timed("topk agg (fallback threshold 1e6)") {
      scored.groupBy("src_id")
        .agg(GraftFunctions.top_k_by(col("cosine"), col("nbr_id"), 3).as("tk"))
        .write.mode("overwrite").format("noop").save()
    }
    timed("full approx knnGraph (threshold 1e6)") {
      SimilarityOps.knnGraph(emb, "vec_id", "embedding", k = 3, nprobe = 4)
        .write.mode("overwrite").format("noop").save()
    }
    spark.conf.unset("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
  }
}
