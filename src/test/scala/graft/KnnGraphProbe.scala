package graft

import graft.functions.GraftFunctions
import graft.ops.SimilarityOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Local timing decomposition for e44_knn_graph (not part of the suite). */
object KnnGraphProbe {
  private def timed[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"TIMER $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb.count()

    timed("warm full knnGraph") {
      SimilarityOps.knnGraph(emb, "vec_id", "embedding", k = 3, nlist = 16, nprobe = 16)
        .write.mode("overwrite").format("noop").save()
    }
    timed("full knnGraph") {
      SimilarityOps.knnGraph(emb, "vec_id", "embedding", k = 3, nlist = 16, nprobe = 16)
        .write.mode("overwrite").format("noop").save()
    }
    // decomposition
    val sample = emb.select(col("embedding")).limit(4096).collect().map(_.getSeq[Float](0).toArray)
    val centers = timed("kmeans train") {
      val m = SimilarityOps.getClass.getDeclaredMethods.find(_.getName == "trainKmeans").get
      m.setAccessible(true)
      m.invoke(SimilarityOps, sample, Integer.valueOf(16), Integer.valueOf(10),
        java.lang.Long.valueOf(42L)).asInstanceOf[Array[Array[Float]]]
    }
    val cells = emb.select(col("vec_id").as("nbr_id"), col("embedding").as("cvec"),
      GraftFunctions.nearest_centroid(col("embedding"), centers).as("cell"))
    val probes = emb.select(col("vec_id").as("src_id"), col("embedding").as("qvec"),
      explode(GraftFunctions.nearest_centroids(col("embedding"), centers, 16)).as("cell"))
    val scored = cells.join(probes, Seq("cell"))
      .where(col("src_id") =!= col("nbr_id"))
      .select(col("src_id"), col("nbr_id"),
        GraftFunctions.cosine_similarity(col("cvec"), col("qvec")).as("cosine"))
    timed("join+cosine only (count)") { println("pairs=" + scored.count()) }
    val w = Window.partitionBy("src_id").orderBy(col("cosine").desc, col("nbr_id").asc)
    timed("window topk on scored") {
      scored.withColumn("rank", row_number().over(w)).where(col("rank") <= 3)
        .write.mode("overwrite").format("noop").save()
    }
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= 3).explain("formatted")

    // which aggregate exec does the top_k_by path get?
    val g = SimilarityOps.knnGraph(emb, "vec_id", "embedding", k = 3, nlist = 16, nprobe = 16)
    println("AGG-EXEC: " + g.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Aggregate")).mkString(" | "))
    timed("topk-agg only on scored") {
      scored.groupBy("src_id")
        .agg(GraftFunctions.top_k_by(col("cosine"), col("nbr_id"), 3).as("t"))
        .write.mode("overwrite").format("noop").save()
    }

    // auto-nlist (sqrt rule) candidate volume: the cell join must stay
    // sub-quadratic as the corpus grows — candidate pairs ≈ n²·nprobe/nlist,
    // so auto nlist=ceil(sqrt(n)) gives ~n^1.5·nprobe
    val n = emb.count()
    val autoNlist = math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)
    for ((label, nlist, nprobe) <- Seq(
        ("fixed nlist=16 nprobe=4", 16, 4),
        (s"auto nlist=$autoNlist nprobe=4", autoNlist, 4))) {
      val sample2 = emb.select(col("embedding")).limit(4096).collect()
        .map(_.getSeq[Float](0).toArray)
      val m = SimilarityOps.getClass.getDeclaredMethods.find(_.getName == "trainKmeans").get
      m.setAccessible(true)
      val ctr = m.invoke(SimilarityOps, sample2, Integer.valueOf(nlist),
        Integer.valueOf(10), java.lang.Long.valueOf(42L)).asInstanceOf[Array[Array[Float]]]
      val cells2 = emb.select(col("vec_id").as("nbr_id"),
        GraftFunctions.nearest_centroid(col("embedding"), ctr).as("cell"))
      val probes2 = emb.select(col("vec_id").as("src_id"),
        explode(GraftFunctions.nearest_centroids(col("embedding"), ctr, nprobe)).as("cell"))
      val cand = timed(s"candidates: $label") {
        cells2.join(probes2, Seq("cell")).where(col("src_id") =!= col("nbr_id")).count()
      }
      println(f"CANDIDATES $label: $cand%,d of n^2=${n * n}%,d " +
        f"(${cand.toDouble / (n.toDouble * n)}%.4f of quadratic)")
      timed(s"full knnGraph: $label") {
        SimilarityOps.knnGraph(emb, "vec_id", "embedding", k = 3,
            nlist = nlist, nprobe = nprobe)
          .write.mode("overwrite").format("noop").save()
      }
    }
  }
}
