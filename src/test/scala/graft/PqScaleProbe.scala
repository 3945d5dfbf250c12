package graft

import graft.functions.GraftFunctions
import graft.ops.SimilarityOps
import org.apache.spark.sql.functions._

/** Local PQ diagnostics for e45 (not part of the suite): how hard does the
  * residual bound prune, and what does the exactness cost vs brute force?
  * Run: `sbt "Test/runMain graft.PqScaleProbe [sfDir]"`. */
object PqScaleProbe {
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
    val n = emb.count()
    val queries = emb.where("vec_id < 8")
      .selectExpr("vec_id AS qid", "embedding AS qvec")
    val nq = queries.count()
    println(s"corpus=$n queries=$nq")

    for (label <- Seq("warm", "timed")) {
      timed(s"$label brute") {
        SimilarityOps.topKBruteForce(emb, "vec_id", "embedding",
          queries, "qid", "qvec", k = 5)
          .write.mode("overwrite").format("noop").save()
      }
      timed(s"$label sq8") {
        SimilarityOps.topKSq8(emb, "vec_id", "embedding",
          queries, "qid", "qvec", k = 5, dim = 64)
          .write.mode("overwrite").format("noop").save()
      }
      timed(s"$label pq m=8 ksub=16") {
        SimilarityOps.topKPq(emb, "vec_id", "embedding",
          queries, "qid", "qvec", k = 5, dim = 64, m = 8, ksub = 16)
          .write.mode("overwrite").format("noop").save()
      }
      timed(s"$label pq m=8 ksub=64") {
        SimilarityOps.topKPq(emb, "vec_id", "embedding",
          queries, "qid", "qvec", k = 5, dim = 64, m = 8, ksub = 64)
          .write.mode("overwrite").format("noop").save()
      }
    }

    // candidate-set size admitted by the per-vector residual bound, by
    // codebook quality (rebuilt with the same seed/sample as topKPq)
    for (ksub <- Seq(16, 64)) {
      val m = 8; val dim = 64; val dsub = dim / m
      val sample = emb.select(col("embedding")).limit(4096).collect()
        .map(_.getSeq[Float](0).padTo(dim, 0f).toArray)
      val codebooks = new Array[Float](m * ksub * dsub)
      for (s <- 0 until m) {
        val sub = sample.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
        val centers = SimilarityOps.trainKmeansL2(sub, ksub, iters = 10, 42L + s)
        for (c <- 0 until ksub)
          System.arraycopy(centers(c), 0, codebooks, (s * ksub + c) * dsub, dsub)
      }
      val enc = emb.select(col("vec_id"),
          GraftFunctions.pq_encode(col("embedding"), codebooks, m, ksub, dsub).as("p"))
        .select(col("vec_id"), col("p.codes").as("codes"), col("p.resid").as("resid"))
      val qdf = queries.select(col("qid").as("query_id"),
        GraftFunctions.pq_lut(col("qvec"), codebooks, m, ksub, dsub).as("lut"),
        sqrt(GraftFunctions.dot_product(col("qvec"), col("qvec"))).as("qnorm"))
      val bounded = enc.crossJoin(broadcast(qdf))
        .select(col("query_id"), col("vec_id"),
          GraftFunctions.pq_adc(col("codes"), col("lut"), ksub).as("adc"),
          (col("qnorm") * col("resid") + lit(1e-6)).as("err"))
      val taus = bounded.groupBy("query_id")
        .agg(GraftFunctions.top_k_by(col("adc") - col("err"), col("vec_id"), 5).as("tk"))
        .select(col("query_id"), element_at(col("tk"), 5).getField("score").as("tau"))
      val cand = bounded.join(broadcast(taus), Seq("query_id"))
        .where(col("adc") + col("err") >= col("tau")).count()
      val total = n * nq
      println(f"PQ ksub=$ksub: candidates=$cand / $total (${cand * 100.0 / total}%.2f%%)")
    }
    // clustered corpus (the data PQ is FOR): 64 centers, sigma=0.05 noise.
    // Near-uniform random unit vectors are incompressible (resid ≈ 0.76 of
    // the norm above), so the bound admits everything; clustered data
    // quantizes tightly and the bound prunes.
    {
      val rnd = new scala.util.Random(7)
      val dim = 64
      val centers = Array.fill(64, dim)(rnd.nextGaussian().toFloat)
      val rows = (0 until 20000).map { i =>
        val c = centers(i % 64)
        val v = Array.tabulate(dim)(j => c(j) + 0.05f * rnd.nextGaussian().toFloat)
        val nrm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
        (i.toLong, v.map(_ / nrm).toSeq)
      }
      import spark.implicits._
      val cemb = rows.toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
        .repartition(32).cache()
      cemb.count()
      val cq = cemb.where("vec_id < 8").selectExpr("vec_id AS qid", "embedding AS qvec")
      val m = 8; val ksub = 64; val dsub = dim / m
      val sample = cemb.select(col("embedding")).limit(4096).collect()
        .map(_.getSeq[Float](0).padTo(dim, 0f).toArray)
      val codebooks = new Array[Float](m * ksub * dsub)
      for (s <- 0 until m) {
        val sub = sample.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
        val cs = SimilarityOps.trainKmeansL2(sub, ksub, iters = 10, 42L + s)
        for (c <- 0 until ksub)
          System.arraycopy(cs(c), 0, codebooks, (s * ksub + c) * dsub, dsub)
      }
      val enc = cemb.select(col("vec_id"),
          GraftFunctions.pq_encode(col("embedding"), codebooks, m, ksub, dsub).as("p"))
        .select(col("vec_id"), col("p.codes").as("codes"), col("p.resid").as("resid"))
      val qdf = cq.select(col("qid").as("query_id"),
        GraftFunctions.pq_lut(col("qvec"), codebooks, m, ksub, dsub).as("lut"),
        sqrt(GraftFunctions.dot_product(col("qvec"), col("qvec"))).as("qnorm"))
      val bounded = enc.crossJoin(broadcast(qdf))
        .select(col("query_id"), col("vec_id"),
          GraftFunctions.pq_adc(col("codes"), col("lut"), ksub).as("adc"),
          (col("qnorm") * col("resid") + lit(1e-6)).as("err"))
      val taus = bounded.groupBy("query_id")
        .agg(GraftFunctions.top_k_by(col("adc") - col("err"), col("vec_id"), 5).as("tk"))
        .select(col("query_id"), element_at(col("tk"), 5).getField("score").as("tau"))
      val cand = bounded.join(broadcast(taus), Seq("query_id"))
        .where(col("adc") + col("err") >= col("tau")).count()
      val avgResid = enc.agg(avg(col("resid"))).collect().head.getDouble(0)
      println(f"CLUSTERED PQ ksub=$ksub: candidates=$cand / ${20000 * 8} " +
        f"(${cand * 100.0 / (20000 * 8)}%.2f%%), avg resid=$avgResid%.4f")
      timed("clustered pq topKPq") {
        SimilarityOps.topKPq(cemb, "vec_id", "embedding", cq, "qid", "qvec",
          k = 5, dim = 64, m = 8, ksub = 64)
          .write.mode("overwrite").format("noop").save()
      }
      timed("clustered brute") {
        SimilarityOps.topKBruteForce(cemb, "vec_id", "embedding", cq, "qid", "qvec", k = 5)
          .write.mode("overwrite").format("noop").save()
      }
    }
    val resid = {
      val m = 8; val dim = 64; val dsub = 8; val ksub = 16
      val sample = emb.select(col("embedding")).limit(4096).collect()
        .map(_.getSeq[Float](0).padTo(dim, 0f).toArray)
      val codebooks = new Array[Float](m * ksub * dsub)
      for (s <- 0 until m) {
        val sub = sample.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
        val centers = SimilarityOps.trainKmeansL2(sub, ksub, iters = 10, 42L + s)
        for (c <- 0 until ksub)
          System.arraycopy(centers(c), 0, codebooks, (s * ksub + c) * dsub, dsub)
      }
      emb.select(
          GraftFunctions.pq_encode(col("embedding"), codebooks, m, ksub, dsub)
            .getField("resid").as("r"),
          sqrt(GraftFunctions.dot_product(col("embedding"), col("embedding"))).as("nrm"))
        .agg(avg(col("r")), avg(col("nrm"))).collect().head
    }
    println(s"avg resid=${resid.getDouble(0)} avg |v|=${resid.getDouble(1)}")
    spark.stop()
  }
}
