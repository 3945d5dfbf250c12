package graft

import graft.ops.{DedupOps, SimilarityOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off probe: can the approximate operators (LSH/IVF/simhash) be given
  * EXACT oracles at the driver's correctness scale (sf0.01)? The testdata is
  * deterministic and all pipelines are seeded, so equality observed here is
  * equality every round. Run: `Test/runMain graft.ProbeOracles`. */
object ProbeOracles {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.where("vec_id < 8")

    def knnSet(df: DataFrame): Set[(Long, Long, Int)] =
      df.select("query_id", "vec_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    val bf = knnSet(SimilarityOps.topKBruteForce(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 5))
    for (pb <- Seq(2, 3)) {
      val lsh = knnSet(SimilarityOps.topKLsh(emb, "vec_id", "embedding",
        q, "vec_id", "embedding", k = 5, dim = 64, nbits = 8, probeBits = pb))
      println(s"PROBE e38 lsh(probeBits=$pb) == bf: ${lsh == bf} (diff=${(lsh -- bf).size}+${(bf -- lsh).size})")
    }
    for (np <- Seq(4, 8, 16)) {
      val ivf = knnSet(SimilarityOps.topKIvf(emb, "vec_id", "embedding",
        q, "vec_id", "embedding", k = 5, nlist = 16, nprobe = np))
      println(s"PROBE e40 ivf(nprobe=$np) == bf: ${ivf == bf} (diff=${(ivf -- bf).size}+${(bf -- ivf).size})")
    }

    // ---- d34: lsh banding vs full-cross exact jaccard >= 0.7
    val corpus = SparkEntry.corpusWithNearDups(spark, dir).cache()
    val sh = corpus.select($"doc_id",
      DedupOps.shingles($"text", 3).as("sh")).where(size($"sh") > 0).cache()
    val cross = sh.as("a").join(sh.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
        DedupOps.jaccard($"a.sh", $"b.sh").as("jaccard")).cache()
    val exact07 = cross.where($"jaccard" >= 0.7)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((b, r) <- Seq((8, 4), (16, 2), (32, 2))) {
      val lsh34 = DedupOps.minhashLshPairs(corpus, "doc_id", "text",
          bands = b, rowsPerBand = r, shingleN = 3, threshold = 0.7)
        .select("id_a", "id_b").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      println(s"PROBE d34 lsh(${b}x$r)==cross@0.7: ${lsh34 == exact07} (lsh=${lsh34.size} exact=${exact07.size} miss=${(exact07 -- lsh34).size})")
    }

    // ---- d35 via token-reversal plants: simhash is order-independent
    // (token multiset), so a reversed-token duplicate has hamming 0 —
    // guaranteed recall. Oracle-able iff discovered == multiset-equal pairs
    // (no organic hamming-1..3 pairs with distinct multisets).
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val revToks = reverse(split(trim($"text"), "\\s+"))
    val reversed = docs.where("doc_id % 5 = 0").select(
      ($"doc_id" + 1000000L).as("doc_id"),
      concat_ws(" ", revToks).as("text"))
    val corpus35 = docs.unionByName(reversed)
    val simPairs35 = DedupOps.simhashPairs(corpus35, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multiset = corpus35.select($"doc_id",
      sort_array(split(trim($"text"), "\\s+")).as("ms"))
    val msPairs = multiset.as("a").join(multiset.as("b"), $"a.doc_id" < $"b.doc_id")
      .where($"a.ms" === $"b.ms")
      .select($"a.doc_id", $"b.doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"PROBE d35-rev simhash=${simPairs35.size} multisetEq=${msPairs.size} " +
      s"equal=${simPairs35 == msPairs} extra=${(simPairs35 -- msPairs).take(5)} missed=${(msPairs -- simPairs35).take(5)}")
    for (mh <- Seq(0, 1)) {
      val p = DedupOps.simhashPairs(corpus35, "doc_id", "text", maxHamming = mh)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"PROBE d35-rev maxHamming=$mh: n=${p.size} equalToMultiset=${p == msPairs}")
    }

    // ---- e38 full-radius probe must equal brute force exactly
    val lshFull = knnSet(SimilarityOps.topKLsh(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 5, dim = 64, nbits = 8, probeBits = 8))
    println(s"PROBE e38 lsh(probeBits=8/full) == bf: ${lshFull == bf}")

    // ---- e39: scaled-plant pairs found exactly, cosine rounds to 1.0
    val planted = emb.where("vec_id % 10 = 0").select(
      ($"vec_id" + 1000000L).as("vec_id"),
      transform($"embedding", x => x * 2.0f).as("embedding"))
    val corpus39 = emb.select($"vec_id", $"embedding").unionByName(planted)
    val found = DedupOps.embeddingNearDupPairs(corpus39, "vec_id", "embedding",
        dim = 64, nbits = 4, threshold = 0.99)
      .select($"id_a", $"id_b", round($"cosine", 3).as("c")).collect()
    val wantN = emb.where("vec_id % 10 = 0").count()
    val allOne = found.forall(_.getDouble(2) == 1.0)
    val pairsOk = found.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      emb.where("vec_id % 10 = 0").select("vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(0) + 1000000L)).toSet
    println(s"PROBE e39 planted: found=${found.length}/$wantN pairsOk=$pairsOk allCosine1.0=$allOne")
    spark.stop()
  }
}
