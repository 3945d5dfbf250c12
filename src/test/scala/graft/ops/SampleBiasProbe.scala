package graft.ops

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Local diagnostics for the r11→r12 trainer-sampling fix (not part of
  * the suite): on a SOURCE-CLUSTERED corpus layout — the 100 TB reality,
  * where physical order follows ingest source — how much IVF pruning
  * power does a head-of-corpus `limit(n)` training sample lose vs the
  * deterministic hash-ordered draw ([[SimilarityOps.sampleVectors]])?
  *
  * Builds a 4-source corpus (each source's vectors offset into a
  * distinct region of the space, laid out source-contiguously, so the
  * first n rows are ALL source 0), trains an IVF codebook both ways,
  * and reports recall@5 of nprobe=4 probes plus the candidate volume
  * the cell join scores. Results are recorded in SCALE.md.
  *
  * Run: `sbt "Test/runMain graft.ops.SampleBiasProbe [sfDir]"`.
  */
object SampleBiasProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    // 8 "sources": source s shifts dims [8s, 8s+8) by +2, so sources
    // occupy geometrically distinct regions; the corpus is laid out
    // source-contiguously (repartition(1) + sort), so a 4096-row head
    // sample sees ~2 of 8 sources — the ingest-ordered 100 TB layout in
    // miniature
    val sourced = (0 until 8).map { s =>
      emb.select(
        (col("vec_id") + lit(s * 10000000L)).as("vec_id"),
        expr(s"transform(embedding, (x, i) -> CAST(x + (CASE WHEN i >= ${s * 8} AND i < ${s * 8 + 8} THEN 2.0 ELSE 0.0 END) AS FLOAT))")
          .as("embedding"),
        lit(s).as("source"))
    }.reduce(_ unionByName _)
    val corpus = sourced.repartition(1).sortWithinPartitions("source", "vec_id")
      .persist()
    val n = corpus.count()
    println(s"corpus=$n (8 sources, source-contiguous layout)")

    val queries = corpus.where("vec_id % 10000000 < 4") // 4 per source
      .select(col("vec_id").as("qid"), col("embedding").as("qvec")).persist()
    val truth = SimilarityOps.topKBruteForce(corpus, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5)
      .select(col("query_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val nl = math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)
    def headSample(k: Int): Array[Array[Float]] =
      corpus.select(col("embedding")).limit(k).collect()
        .map(_.getSeq[Float](0).toArray)

    val nQueries = queries.count()
    for ((label, sample) <- Seq(
        "head-of-corpus limit(4096)" -> headSample(4096),
        "hash-ordered sampleVectors(4096)" ->
          SimilarityOps.sampleVectors(corpus, "embedding", 4096))) {
      val centers = SimilarityOps.trainKmeans(sample, nl, iters = 10, 42L)
      val cells = corpus.select(col("vec_id"), col("embedding"),
        GraftFunctions.nearest_centroid(col("embedding"), centers).as("cell"))
        .persist()
      val biggestCell = cells.groupBy("cell").count()
        .agg(max("count")).head().getLong(0)
      for (nprobe <- Seq(4, 8, 16)) {
        val probes = queries.select(col("qid"), col("qvec"),
          explode(GraftFunctions.nearest_centroids(col("qvec"), centers, nprobe)).as("cell"))
        val scored = cells.join(broadcast(probes), Seq("cell"))
          .select(col("qid").as("query_id"), col("vec_id"),
            GraftFunctions.cosine_similarity(col("embedding"), col("qvec")).as("cosine"))
          .persist()
        val candVolume = scored.count()
        val got = scored
          .withColumn("rank", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("query_id")
              .orderBy(col("cosine").desc, col("vec_id"))))
          .where("rank <= 5")
          .select("query_id", "vec_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        scored.unpersist()
        val recall = (got & truth).size.toDouble / truth.size
        println(f"PROBE $label nprobe=$nprobe: nlist=$nl recall@5=$recall%.3f " +
          f"candidateRows=$candVolume (${candVolume.toDouble / (nQueries * n)}%.3f of brute) " +
          f"maxCell=$biggestCell (${biggestCell.toDouble / n}%.3f of corpus)")
      }
      cells.unpersist()
    }
    queries.unpersist(); corpus.unpersist()
  }
}
