package graft.ops
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
object CellHistProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    val emb = spark.read.parquet("/tmp/sf1/embeddings.parquet")
    val n = emb.count()
    val nl = math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)
    val sample = SimilarityOps.sampleVectors(emb, "embedding", 4096)
    val centers = SimilarityOps.trainKmeans(sample, nl, iters = 10, 42L)
    val cells = emb.select(col("vec_id"),
      GraftFunctions.nearest_centroid(col("embedding"), centers).as("cell"))
    val hist = cells.groupBy("cell").count().orderBy(desc("count")).limit(10).collect()
    println("TOP CELLS: " + hist.map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(", "))
    val probes = emb.select(col("vec_id").as("src_id"),
      explode(GraftFunctions.nearest_centroids(col("embedding"), centers, 4)).as("cell"))
    val pairHist = cells.join(probes, Seq("cell")).groupBy("cell").count()
      .orderBy(desc("count")).limit(10).collect()
    println("TOP PAIR CELLS: " + pairHist.map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(", "))
  }
}
