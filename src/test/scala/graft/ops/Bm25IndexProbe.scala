package graft.ops

import graft.catalog.HadoopCatalog
import graft.meta.{PartitionField, PartitionSpec}
import graft.types.SparkSchemaConverter
import org.apache.spark.sql.functions._

/** Amortization probe for the persisted BM25 index (d82): the bench entry
  * times build + bucketed table write + reload + search per run; this
  * measures what repeated query batches actually pay — search-only
  * against the already-persisted index — plus the file pruning the
  * pushed vocabulary achieves. Not part of the suite.
  * Run: `sbt "Test/runMain graft.ops.Bm25IndexProbe [sfDir]"`. */
object Bm25IndexProbe {
  private def timed[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"TIMER $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val queries = docs.where("doc_id % 97 = 0")
      .select(col("doc_id").as("query_id"),
        array_join(slice(graft.ops.TextOps.tokens(col("text")), 1, 4), " ").as("qtext"))
    val wh = java.nio.file.Files.createTempDirectory("graft-bm25-probe").toString
    val cat = new HadoopCatalog(wh)
    val (pTbl, sTbl) = timed("build + bucketed write") {
      val (postings, stats) = CorpusOps.bm25Index(docs, "doc_id", "text")
      val pSchema = SparkSchemaConverter.fromSpark(postings.schema)
      val p = cat.createTable("postings", pSchema,
        partitionSpec = PartitionSpec(0, Seq(PartitionField(
          pSchema.fieldByName("term").get.id, 1000, "term_bucket", "bucket[16]"))))
      p.append(postings)
      val s = cat.createTable("stats", SparkSchemaConverter.fromSpark(stats.schema))
      s.append(stats)
      (p, s)
    }
    val vocab = queries.select(explode(TextOps.tokens(col("qtext"))).as("t"))
      .distinct().collect().map(_.getString(0)).sorted
    val allFiles = pTbl.scan().planFiles().size
    val probed = pTbl.scan(predicates =
      Seq(graft.table.InPred("term", vocab.toSeq))).planFiles().size
    println(s"PRUNING: query vocab ${vocab.length} terms probes $probed of $allFiles index files")
    for (round <- Seq("warm", "timed")) {
      timed(s"$round search-only vs persisted index") {
        CorpusOps.bm25SearchIndexed(pTbl.toDF(spark), sTbl.toDF(spark),
            queries, "query_id", "qtext", k = 5, k1 = 1.25, b = 0.75)
          .write.mode("overwrite").format("noop").save()
      }
      timed(s"$round one-shot bm25TopK (recompute)") {
        CorpusOps.bm25TopK(docs, "doc_id", "text",
            queries, "query_id", "qtext", k = 5, k1 = 1.25, b = 0.75)
          .write.mode("overwrite").format("noop").save()
      }
    }
    // scan-path decomposition
    timed("postings toDF count") { println("rows=" + pTbl.toDF(spark).count()) }
    timed("postings toDF where-isin count") {
      println("rows=" + pTbl.toDF(spark)
        .where(col("term").isin(vocab.toSeq: _*)).count())
    }
    timed("postings scan(preds).toDF count") {
      val sc = pTbl.scan(predicates = Seq(graft.table.InPred("term", vocab.toSeq)))
      println("rows=" + sc.toDF(spark).count())
    }
    // isolate: same bm25Search, table-backed vs recomputed postings
    val (computedP, computedS) = CorpusOps.bm25Index(docs, "doc_id", "text")
    val tableP = pTbl.toDF(spark).where(col("term").isin(vocab.toSeq: _*))
    val tableS = sTbl.toDF(spark)
    timed("bm25Search over computed postings") {
      CorpusOps.bm25Search(computedP, computedS, queries, "query_id", "qtext",
        k = 5, k1 = 1.25, b = 0.75).write.mode("overwrite").format("noop").save()
    }
    timed("bm25Search over table postings") {
      CorpusOps.bm25Search(tableP, tableS, queries, "query_id", "qtext",
        k = 5, k1 = 1.25, b = 0.75).write.mode("overwrite").format("noop").save()
    }
    timed("bm25Search over table postings, computed stats") {
      CorpusOps.bm25Search(tableP, computedS, queries, "query_id", "qtext",
        k = 5, k1 = 1.25, b = 0.75).write.mode("overwrite").format("noop").save()
    }
    timed("bm25Search over computed postings, table stats") {
      CorpusOps.bm25Search(computedP, tableS, queries, "query_id", "qtext",
        k = 5, k1 = 1.25, b = 0.75).write.mode("overwrite").format("noop").save()
    }
    println("PARTS tableP=" + tableP.rdd.getNumPartitions +
      " computedP=" + computedP.rdd.getNumPartitions)
    val planA = CorpusOps.bm25Search(computedP, computedS, queries, "query_id",
      "qtext", k = 5, k1 = 1.25, b = 0.75).queryExecution.executedPlan.toString
    val planB = CorpusOps.bm25Search(tableP, tableS, queries, "query_id",
      "qtext", k = 5, k1 = 1.25, b = 0.75).queryExecution.executedPlan.toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/planA.txt"), planA)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/planB.txt"), planB)
    println("PLANS WRITTEN")
    // stage-wise timing over table postings
    val qterms2 = queries.select(col("query_id"),
      explode(TextOps.tokens(col("qtext"))).as("term")).distinct()
    val qvocab2 = qterms2.select("term").distinct()
    val dfreq2 = tableP.join(broadcast(qvocab2), Seq("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
    timed("stage dfreq collect") { println("dfreq rows=" + dfreq2.count()) }
    val termScore2 = tableP
      .join(broadcast(dfreq2), Seq("term"))
      .join(broadcast(qterms2), Seq("term"))
      .crossJoin(broadcast(tableS))
      .select(col("query_id"), col("doc_id"), col("tf"), col("dl"))
    timed("stage termScore count") { println("ts rows=" + termScore2.count()) }
    val scored2 = termScore2.groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("c"))
    timed("stage scored count") { println("scored rows=" + scored2.count()) }
    timed("bm25Search table postings repartitioned by doc_id") {
      CorpusOps.bm25Search(tableP.repartition(col("doc_id")), tableS, queries,
        "query_id", "qtext", k = 5, k1 = 1.25, b = 0.75)
        .write.mode("overwrite").format("noop").save()
    }
    // write-path decomposition
    timed("bm25Index compute only (noop)") {
      val (p2, _) = CorpusOps.bm25Index(docs, "doc_id", "text")
      p2.write.mode("overwrite").format("noop").save()
    }
    timed("raw parquet write of postings") {
      val (p2, _) = CorpusOps.bm25Index(docs, "doc_id", "text")
      p2.write.mode("overwrite").parquet("/tmp/bm25-raw-postings")
    }
    timed("graft append to bucketed table (2nd table)") {
      val (p2, _) = CorpusOps.bm25Index(docs, "doc_id", "text")
      val pSchema2 = SparkSchemaConverter.fromSpark(p2.schema)
      val p3 = cat.createTable("postings2", pSchema2,
        partitionSpec = PartitionSpec(0, Seq(PartitionField(
          pSchema2.fieldByName("term").get.id, 1000, "term_bucket", "bucket[16]"))))
      p3.append(p2)
    }
    timed("graft append unpartitioned (3rd table)") {
      val (p2, _) = CorpusOps.bm25Index(docs, "doc_id", "text")
      val p4 = cat.createTable("postings3",
        SparkSchemaConverter.fromSpark(p2.schema))
      p4.append(p2)
    }
  }
}
