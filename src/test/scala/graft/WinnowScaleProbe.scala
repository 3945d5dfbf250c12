package graft

import graft.ops.{DedupOps, MultimodalOps, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Scale probe (run manually against /tmp/sf1, see SCALE.md) for the
 * round-11 additions:
 *  1. d70 winnowing: selection density must track the theoretical
 *     2/(w+1) winnowing density, and the fingerprint table must have no
 *     over-cap `fp_hash` buckets on a natural corpus (the cap exists for
 *     boilerplate, which this corpus lacks);
 *  2. d71 overlap: a passage planted into many documents must pair them
 *     all via the fingerprint SUBSET join, and a boilerplate line planted
 *     into 20% of the corpus must surface in `oversizedBuckets` (the
 *     audit contract) rather than exploding the join;
 *  3. d72 stripHtml: map-only wall-clock at corpus scale (regex chain is
 *     the whole cost — no shuffle to hide behind);
 *  4. m46 audio fingerprints: map-only decode→fingerprint throughput.
 */
object WinnowScaleProbe {
  private def timed[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"TIMER $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args.headOption.getOrElse("/tmp/sf1")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").cache()
    val nDocs = docs.count()
    println(s"docs: $nDocs")

    // 1. density + bucket audit
    val fps = DedupOps.winnowFingerprints(docs, "doc_id", "text", k = 5, w = 4)
      .cache()
    val nFps = timed("d70 winnow fingerprints")(fps.count())
    val nGrams = docs.select(sum(greatest(
      size(split(trim(col("text")), "\\s+")) - 4, lit(0)))).head.getLong(0)
    val density = nFps.toDouble / nGrams
    println(f"grams: $nGrams fps: $nFps density: $density%.3f (theory 2/(w+1) = 0.400)")
    assert(density > 0.25 && density < 0.55, "density off the winnowing theory")
    val over = DedupOps.oversizedBuckets(
      fps.select(col("doc_id"), col("fp_hash")).distinct(),
      Seq("fp_hash"), DedupOps.DefaultMaxBucket).count()
    println(s"over-cap fp buckets (natural corpus): $over")

    // 2. a 30-word passage planted into exactly 100 docs (= the bucket
    // cap, so the cap never drops a member) must pair them ALL: 26 grams
    // → 23 windows fully inside the run → ~10 shared selections, far
    // past minShared = 2. Boilerplate planted into 20% of the corpus
    // must trip the bucket AUDIT (the cap's contract: oversized buckets
    // are boilerplate, not dedup signal).
    val passage = (1 to 30).map(i => s"winnowprobe$i").mkString(" ")
    val boiler = "subscribe to our newsletter for updates and special offers today"
    val seeded = docs.withColumn("text",
      when(col("doc_id") % 500 === 0, concat(col("text"), lit(" " + passage)))
        .otherwise(col("text")))
      .withColumn("text",
        when(col("doc_id") % 5 === 0, concat(lit(boiler + " "), col("text")))
          .otherwise(col("text")))
    val sfps = DedupOps.winnowFingerprints(seeded, "doc_id", "text", 5, 4)
    val overSeeded = DedupOps.oversizedBuckets(
      sfps.select(col("doc_id"), col("fp_hash")).distinct(),
      Seq("fp_hash"), DedupOps.DefaultMaxBucket).count()
    println(s"over-cap fp buckets (boilerplate-seeded): $overSeeded")
    assert(overSeeded > 0, "planted boilerplate must trip the bucket audit")
    val pairs = DedupOps.winnowOverlapPairs(seeded, "doc_id", "text", 5, 4,
      minShared = 2)
    val nPairs = timed("d71 winnow overlap pairs (seeded)")(pairs.cache().count())
    val passagePairs = pairs
      .where(col("id_a") % 500 === 0 && col("id_b") % 500 === 0).count()
    val expectPassagePairs = {
      val n = (nDocs + 499) / 500
      n * (n - 1) / 2
    }
    println(s"pairs: $nPairs passage-pairs: $passagePairs (expect >= $expectPassagePairs)")
    assert(passagePairs >= expectPassagePairs,
      "every planted-passage doc pair must surface")

    // 3. stripHtml wall-clock
    val paged = docs.select(col("doc_id"), concat(
      lit("<html><head><style>p{c}</style><script>var i=0;</script></head><body><p>"),
      col("text"), lit("</p><!-- c --></body></html>")).as("text"))
    val cleanLen = timed("d72 stripHtml full corpus")(
      paged.select(sum(length(TextOps.stripHtml(col("text"))))).head.getLong(0))
    println(s"clean chars: $cleanLen")

    // 4. m46 audio fingerprints, map-only
    val clips = MultimodalOps.syntheticAudioCorpus(docs.limit(20000), "doc_id")
    val nFp = timed("m46 audio fingerprints (20k clips)")(
      MultimodalOps.audioEnergyFingerprint(clips, 25).count())
    println(s"audio fps: $nFp")
    assert(nFp == math.min(20000L, nDocs))

    println("WINNOW PROBE DONE")
    spark.stop()
  }
}
