package graft

import graft.ops.{CorpusOps, SimilarityOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Distributed k-means (fixed-point reproducibility, known clusters, empty
  * clusters) and the positional inverted index. */
class KmeansIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def vecs(rows: (Long, Array[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("kmeans separates two obvious directional clusters") {
    // cluster around +x and around +y; cosine k-means must split them
    val df = vecs(
      0L -> Array(1f, 0.1f), 1L -> Array(0.1f, 1f),
      2L -> Array(0.9f, 0.2f), 3L -> Array(1f, 0f),
      4L -> Array(0.2f, 0.9f), 5L -> Array(0f, 1f),
      6L -> Array(0.8f, 0.1f), 7L -> Array(0.1f, 0.8f))
    val out = SimilarityOps.kmeans(df, "vec_id", "embedding", k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val xCluster = out(0L)
    assert(Set(2L, 3L, 6L).forall(out(_) == xCluster))
    val yCluster = out(1L)
    assert(yCluster != xCluster)
    assert(Set(4L, 5L, 7L).forall(out(_) == yCluster))
  }

  test("kmeans centroids are bitwise identical under different partitioning") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = SimilarityOps.kmeansFit(emb.repartition(1), "vec_id", "embedding",
      k = 4, iters = 2)
    val b = SimilarityOps.kmeansFit(emb.repartition(7, $"vec_id"),
      "vec_id", "embedding", k = 4, iters = 2)
    assert(a.centroids.length == b.centroids.length)
    a.centroids.zip(b.centroids).foreach { case (x, y) =>
      assert(java.util.Arrays.equals(x, y),
        "fixed-point centroid update must not depend on partitioning")
    }
    val ra = a.assignments.orderBy("vec_id").collect().map(_.toSeq).toSeq
    val rb = b.assignments.orderBy("vec_id").collect().map(_.toSeq).toSeq
    assert(ra == rb)
  }

  test("kmeans keeps an empty cluster's previous centroid and stays total") {
    // ids 0 and 1 share a vector, so the two init centroids are identical:
    // round 1 ties every row to cluster 0 (strict-> keeps the first best),
    // cluster 1 goes EMPTY and must keep its init centroid (1,0). The
    // final assignment then splits: exact (1,0) rows return to the kept
    // centroid, the off-axis rows stay with the mean.
    val df = vecs(
      0L -> Array(1f, 0f), 1L -> Array(1f, 0f),
      2L -> Array(0.9f, 0.1f), 3L -> Array(0.95f, 0.05f))
    val m = SimilarityOps.kmeansFit(df, "vec_id", "embedding", k = 2, iters = 1)
    assert(java.util.Arrays.equals(m.centroids(1), Array(1f, 0f)),
      "empty cluster must retain its init centroid")
    val out = m.assignments.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 1L, 1L -> 1L, 2L -> 0L, 3L -> 0L))
  }

  test("kmeans update shuffles k aggregate buffers, not vectors") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val init = emb.orderBy("vec_id").limit(4).select("embedding")
      .collect().map(_.getSeq[Float](0).toArray)
    val agg = emb.groupBy(
        graft.functions.GraftFunctions.nearest_centroid($"embedding", init).as("cl"))
      .agg(graft.functions.GraftFunctions.vector_sum_fixed($"embedding", 24).as("s"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"vector_sum_fixed must run as a real aggregate:\n$plan")
    // partial aggregation: the exchange input is the partial-agg output
    assert(plan.contains("partial_vector_sum_fixed") ||
      plan.toLowerCase.contains("partial"),
      s"expected map-side partial aggregation:\n$plan")
  }

  test("vector_sum_fixed: exact sums, null rows skipped, ragged vectors loud") {
    val df = Seq(
      (1L, Array(0.5f, -0.25f)),
      (2L, Array(0.25f, 0.75f)),
      (3L, Array(1.0f, 1.0f))).toDF("id", "v")
    val r = df.agg(graft.functions.GraftFunctions
        .vector_sum_fixed($"v", 2).as("s"))
      .selectExpr("s.sums", "s.n").as[(Seq[Long], Long)].head()
    // floor(x*4): [2,-1]+[1,3]+[4,4] = [7,6]; n=3
    assert(r == (Seq(7L, 6L), 3L))
    val ragged = Seq((1L, Array(1f)), (2L, Array(1f, 2f))).toDF("id", "v")
      .coalesce(1)
    val err = intercept[Exception] {
      ragged.agg(graft.functions.GraftFunctions.vector_sum_fixed($"v").as("s"))
        .collect()
    }
    assert(err.getMessage != null)
  }

  test("invertedIndex: postings, positions, df bounds, brute-force parity") {
    val docs = Seq(
      (1L, "a b a c"),
      (2L, "b b d"),
      (3L, "a d d"),
      (4L, "")).toDF("doc_id", "text")
    val out = CorpusOps.invertedIndex(docs, "doc_id", "text")
      .orderBy("term", "doc_id")
      .select($"term", $"df", $"doc_id", $"tf",
        array_join($"positions", ",").as("p"))
      .as[(String, Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      ("a", 2L, 1L, 2L, "1,3"),
      ("a", 2L, 3L, 1L, "1"),
      ("b", 2L, 1L, 1L, "2"),
      ("b", 2L, 2L, 2L, "1,2"),
      ("c", 1L, 1L, 1L, "4"),
      ("d", 2L, 2L, 1L, "3"),
      ("d", 2L, 3L, 2L, "2,3")))
    // df bounds drop hapaxes and stopwords
    val bounded = CorpusOps.invertedIndex(docs, "doc_id", "text",
        minDf = 2L, maxDf = 2L)
      .select("term").distinct().as[String].collect().toSet
    assert(bounded == Set("a", "b", "d"))
    intercept[IllegalArgumentException] {
      CorpusOps.invertedIndex(docs, "doc_id", "text", minDf = 3L, maxDf = 2L)
    }
  }

  test("meanPool: exact mean, bitwise stable across partitionings") {
    val df = Seq(
      (0, Array(1.0f, 0.0f)), (0, Array(0.0f, 1.0f)),
      (1, Array(0.5f, 0.5f))).toDF("label", "embedding")
    val r = SimilarityOps.meanPool(df, "label", "embedding")
      .orderBy("label")
      .as[(Int, Long, Seq[Float])].collect().toSeq
    assert(r == Seq((0, 2L, Seq(0.5f, 0.5f)), (1, 1L, Seq(0.5f, 0.5f))))
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = SimilarityOps.meanPool(emb.repartition(1), "label", "embedding")
      .orderBy("label").collect().map(_.toSeq).toSeq
    val b = SimilarityOps.meanPool(emb.repartition(5, $"vec_id"),
        "label", "embedding")
      .orderBy("label").collect().map(_.toSeq).toSeq
    assert(a == b, "pooled floats must not depend on partitioning")
  }

  test("invertedIndex plan has no window (stopword-skew guard)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = CorpusOps.invertedIndex(docs, "doc_id", "text", minDf = 3L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"df must come from a combinable count + join, not a per-term window:\n$plan")
  }
}
