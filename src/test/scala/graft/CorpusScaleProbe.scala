package graft

import graft.ops.{CorpusOps, DedupOps, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale probe (run manually against /tmp/sf1, see SCALE.md): validates the
 * round-9 corpus-prep tail where its scale claims live —
 *  1. d59 `dedupLines` must be a FIXPOINT (a second pass changes nothing)
 *     and never drop a document;
 *  2. d62/d63 exact-substring span dedup must catch a passage planted
 *     into 1,000 documents and keep exactly its first occurrence;
 *  3. d60 `shuffleShards` positions must stay dense per shard (they are
 *     the training-file line numbers) with no global sort;
 *  4. d61 `resampleMix` copy counts must be exact and reproducible;
 *  5. d64 `tfidfKeywords` must surface a planted salient token at rank 1;
 *  6. d65 `lmQualityScore` must rank a planted mojibake document in the
 *     corpus's bottom percentile (the perplexity-filter contract).
 */
object CorpusScaleProbe {
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
    import spark.implicits._
    val sfDir = args.headOption.getOrElse("/tmp/sf1")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "source").cache()
    val nDocs = docs.count()
    println(s"docs: $nDocs")

    // 1. d59 line dedup: fixpoint, no docs dropped
    val pass1 = CorpusOps.dedupLines(docs, "doc_id", "text").cache()
    val p1n = timed("d59 dedupLines pass 1")(pass1.count())
    assert(p1n == nDocs, "dedupLines must keep every document")
    val pass2 = CorpusOps.dedupLines(pass1.select("doc_id", "text"), "doc_id", "text")
    val changed = timed("d59 fixpoint check")(
      pass1.select("doc_id", "text").as[(Long, String)]
        .joinWith(pass2.select("doc_id", "text").as[(Long, String)],
          pass1("doc_id") === pass2("doc_id"))
        .filter(p => p._1._2 != p._2._2).count())
    assert(changed == 0, s"dedupLines must be a fixpoint, $changed docs changed")
    println(s"d59 OK: fixpoint over $nDocs docs, no drops")
    pass1.unpersist()

    // 2. d62/d63 planted passage: 40 unique tokens appended to 1,000 docs
    val passage = (1 to 40).map(i => s"zqxv$i").mkString(" ")
    val planted = docs.withColumn("text",
      when(col("doc_id") % 50 === 0, concat(col("text"), lit(" " + passage)))
        .otherwise(col("text")))
    val nPlanted = planted.where(col("text").contains("zqxv1 ")).count()
    val stats = DedupOps.duplicateSpanStats(planted, "doc_id", "text").cache()
    timed("d62 duplicateSpanStats @50k docs")(stats.count())
    val flagged = stats.where(col("dup_tokens") >= 40).count()
    stats.unpersist()
    val cut = DedupOps.removeDuplicateSpans(planted, "doc_id", "text").cache()
    val cutN = timed("d63 removeDuplicateSpans @50k docs")(cut.count())
    val survivors = cut.where(col("text").contains("zqxv1 zqxv2")).count()
    assert(cutN == nDocs, "span removal must keep every document")
    cut.unpersist()
    assert(flagged >= nPlanted - 1,
      s"all non-first planted copies must be flagged: $flagged of $nPlanted")
    assert(survivors == 1,
      s"exactly the first planted occurrence keeps the passage, got $survivors")
    println(s"d62/d63 OK: passage planted in $nPlanted docs, 1 survivor, " +
      s"$flagged flagged")

    // 3. d60 shard shuffle: dense positions, deterministic, no global sort
    val sharded = CorpusOps.shuffleShards(docs, "doc_id", "epoch0", numShards = 64).cache()
    timed("d60 shuffleShards 64 @50k docs")(sharded.count())
    val dense = sharded.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"))
      .where(col("n") =!= col("mx") || col("mn") =!= 1).count()
    assert(dense == 0, "per-shard positions must be dense 1..n")
    val rerun = CorpusOps.shuffleShards(docs, "doc_id", "epoch0", numShards = 64)
    assert(sharded.select("doc_id", "shard", "pos")
      .exceptAll(rerun.select("doc_id", "shard", "pos")).count() == 0,
      "shuffleShards must be deterministic")
    val shardPlan = sharded.queryExecution.executedPlan.toString
    assert(!shardPlan.contains("Sort [") || !shardPlan.contains("global=true"),
      "sharding must never global-sort")
    sharded.unpersist()
    println("d60 OK: dense, deterministic, no global sort")

    // 4. d61 mix resample: exact copy counts (2.25 => 2 or 3 per doc)
    val mixed = CorpusOps.resampleMix(docs, "doc_id", "source",
      Map("src0" -> 2.25, "src1" -> 0.5), defaultWeight = 1.0,
      seed = "mix0").cache()
    timed("d61 resampleMix @50k docs")(mixed.count())
    val bySrc = mixed.groupBy("source").agg(
      countDistinct("doc_id").as("docs"), count(lit(1)).as("rows"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (d0, r0) = bySrc("src0")
    assert(r0 >= d0 * 2 && r0 <= d0 * 3, s"src0 at 2.25x must emit 2-3 copies: $r0/$d0")
    assert(math.abs(r0.toDouble / 2500 - 2.25) < 0.05, s"src0 rate ${r0 / 2500.0}")
    val (_, r1) = bySrc("src1")
    assert(math.abs(r1.toDouble / 2500 - 0.5) < 0.05, s"src1 rate ${r1 / 2500.0}")
    mixed.unpersist()
    println(f"d61 OK: src0 ${r0 / 2500.0}%.3fx (target 2.25), " +
      f"src1 ${r1 / 2500.0}%.3fx (target 0.5)")

    // 5. d64 TF-IDF: a planted doc repeating a unique token ranks it #1
    val salient = docs.limit(0).select(col("doc_id"), col("text"))
      .unionByName(Seq((999999999L,
        "qwzzt qwzzt qwzzt qwzzt qwzzt the the a a of"))
        .toDF("doc_id", "text"))
      .unionByName(docs.select("doc_id", "text"))
    val kw = CorpusOps.tfidfKeywords(salient, "doc_id", "text", k = 5).cache()
    timed("d64 tfidfKeywords @50k docs")(kw.count())
    val top = kw.where(col("doc_id") === 999999999L && col("rank") === 1)
      .select("token").as[String].collect()
    assert(top.sameElements(Array("qwzzt")), s"planted salient token must rank 1: ${top.mkString}")
    assert(kw.groupBy("doc_id").count().where(col("count") > 5).count() == 0)
    kw.unpersist()
    println("d64 OK: planted salient token rank 1 over 50k docs")

    // 6. d65 LM quality: planted mojibake lands in the bottom percentile
    val junk = new scala.util.Random(7).alphanumeric.take(100)
      .zipWithIndex.map { case (c, i) => (c.toInt + i * 31 % 4000 + 1000).toChar }
      .mkString
    val withJunk = docs.select(col("doc_id"), col("text"))
      .unionByName(Seq((999999998L, junk)).toDF("doc_id", "text"))
    val scored = TextOps.lmQualityScore(withJunk, "doc_id", "text").cache()
    timed("d65 lmQualityScore @50k docs")(scored.count())
    val junkScore = scored.where(col("doc_id") === 999999998L)
      .select("avg_logp").as[Double].head()
    val below = scored.where(col("avg_logp") < junkScore).count()
    scored.unpersist()
    assert(below <= nDocs / 100,
      s"mojibake must score in the bottom 1%: $below organic docs below it")
    println(f"d65 OK: mojibake avg_logp $junkScore%.2f, $below of $nDocs below it")

    // 7. d51 repetition score (native gram path): full corpus, sane range
    val repScored = CorpusOps.repetitionScore(docs, "doc_id", "text", n = 2).cache()
    timed("d51 repetitionScore @50k docs")(repScored.count())
    val repBad = repScored.where(col("dup_fraction") < 0 || col("dup_fraction") > 1).count()
    assert(repBad == 0, "dup_fraction must stay in [0,1]")
    repScored.unpersist()
    println("d51 OK: native gram path over 50k docs")

    // 8. e43 SemDeDup at 20k vectors: planted x2-scaled dups (cosine
    // exactly 1, provably same cluster) — survivors must be EXACTLY the
    // originals, each planted source reporting exactly its one dup
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").cache()
    val nVec = emb.count()
    val plantedEmb = emb.where(col("vec_id") % 10 === 0).select(
      (col("vec_id") + 1000000000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val nPlantedEmb = plantedEmb.count()
    val sem = DedupOps.semanticDedup(
      emb.unionByName(plantedEmb), "vec_id", "embedding",
      kClusters = 64, threshold = 0.99).cache()
    val nSurv = timed(s"e43 semanticDedup @${nVec + nPlantedEmb} vectors")(sem.count())
    assert(nSurv == nVec, s"survivors must be exactly the originals: $nSurv vs $nVec")
    val wrongDups = sem.where(
      (col("vec_id") % 10 === 0 && col("n_dups") =!= 1) ||
      (col("vec_id") % 10 =!= 0 && col("n_dups") =!= 0)).count()
    assert(wrongDups == 0, s"$wrongDups survivors have a wrong n_dups")
    sem.unpersist(); emb.unpersist()
    println(s"e43 OK: $nPlantedEmb planted dups all dropped, n_dups exact")

    // 9. d66 contamination score at 50k docs: every truncated-variant
    // source must score > 0; the corpus-wide hit count stays plausible
    val testSide = docs.where(col("doc_id") % 50 === 0).select(
      concat_ws(" ", slice(split(trim(col("text")), "\\s+"), lit(1),
        greatest(size(split(trim(col("text")), "\\s+")) - 1, lit(1)))).as("text"))
    val contam = CorpusOps.contaminationScore(docs.select("doc_id", "text"),
      testSide, "doc_id", "text", n = 8).cache()
    val nContam = timed("d66 contaminationScore @50k docs")(contam.count())
    assert(nContam == nDocs, "every doc must be scored")
    val missedSources = contam.where(
      col("doc_id") % 50 === 0 && col("n_grams") >= 9 && col("n_shared") === 0).count()
    assert(missedSources == 0, s"$missedSources truncation sources scored 0")
    contam.unpersist()
    println("d66 OK: all truncation sources detected over 50k docs")

    println("ALL CORPUS SCALE PROBES DONE")
    spark.stop()
  }
}
