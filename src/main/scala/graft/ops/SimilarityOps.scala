package graft.ops

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an `array<float>` embedding
 * column. Two paths:
 *
 *  - [[topKBruteForce]]: the exact baseline — broadcast the (small) query
 *    batch against the corpus, cosine via a codegen'd expression, top-k by
 *    window. Cost O(|corpus| × |queries|) but a single map-side pass over
 *    the corpus plus one shuffle on query_id; correct at any scale where
 *    the query batch fits in a broadcast.
 *
 *  - [[topKLsh]]: the scale path — corpus is bucketed once by
 *    random-hyperplane signature (map-only, reusable across query batches);
 *    each query probes its own bucket plus all buckets within Hamming
 *    distance `probeBits` (multi-probe), and only those candidates are
 *    scored. The join key is the bucket id, so the comparison volume is
 *    |corpus| / 2^nbits per probe instead of |corpus|.
 */
object SimilarityOps {

  /** Exact top-k: (query_id, vec_id, cosine, rank), rank 1..k per query.
    * Ties broken by corpus id for determinism. */
  def topKBruteForce(corpus: DataFrame, corpusId: String, corpusVec: String,
                     queries: DataFrame, queryId: String, queryVec: String,
                     k: Int): DataFrame = {
    val scored = corpus
      .select(col(corpusId).as("vec_id"), col(corpusVec).as("cvec"))
      .crossJoin(broadcast(
        queries.select(col(queryId).as("query_id"), col(queryVec).as("qvec"))))
      .select(col("query_id"), col("vec_id"),
        GraftFunctions.cosine_similarity(col("cvec"), col("qvec")).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** LSH-bucketed approximate top-k with multi-probe. Same output shape as
    * the brute-force path; recall depends on nbits/probeBits. */
  def topKLsh(corpus: DataFrame, corpusId: String, corpusVec: String,
              queries: DataFrame, queryId: String, queryVec: String,
              k: Int, dim: Int, nbits: Int = 8, probeBits: Int = 1): DataFrame = {
    val planes = GraftFunctions.makePlanes(nbits, dim)
    val bucketed = corpus.select(col(corpusId).as("vec_id"), col(corpusVec).as("cvec"),
      GraftFunctions.hyperplane_sig(col(corpusVec), planes).as("bucket"))
    val qsig = queries.select(col(queryId).as("query_id"), col(queryVec).as("qvec"),
      GraftFunctions.hyperplane_sig(col(queryVec), planes).as("qsig"))
    // multi-probe: the exact bucket plus every bucket within Hamming
    // distance `probeBits`; the XOR masks are constants, so the probe set
    // is a tiny driver-built literal array exploded per query
    val masks: Seq[Int] = Seq(0) ++
      (if (probeBits >= 1) (0 until nbits).map(1 << _) else Nil) ++
      (if (probeBits >= 2)
        for { i <- 0 until nbits; j <- (i + 1) until nbits } yield (1 << i) | (1 << j)
      else Nil)
    val probes = qsig.withColumn("bucket",
      explode(array(masks.map(m => col("qsig").bitwiseXOR(lit(m))): _*)))
    val scored = bucketed.join(broadcast(probes), Seq("bucket"))
      .select(col("query_id"), col("vec_id"),
        GraftFunctions.cosine_similarity(col("cvec"), col("qvec")).as("cosine"))
      .groupBy("query_id", "vec_id").agg(max("cosine").as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
