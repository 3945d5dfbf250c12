package graft

/** Plan audit for the BM25 paths: the one-shot form's corpus scans and
  * the persisted-index search's compact-table scans. */
object ProbeD76 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val df = SparkEntry.queries("d76_bm25_topk")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    println("ONESHOT_SCANS=" + raw"Scan parquet".r.findAllIn(plan).length)

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val (postings, stats) = ops.CorpusOps.bm25Index(docs, "doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("bm25probe").toString
    postings.write.parquet(s"$tmp/postings")
    stats.write.parquet(s"$tmp/stats")
    val queries = docs.where("doc_id % 97 = 0")
      .select(org.apache.spark.sql.functions.col("doc_id").as("query_id"),
        org.apache.spark.sql.functions.col("text").as("qtext"))
    val searched = ops.CorpusOps.bm25Search(
      spark.read.parquet(s"$tmp/postings"), spark.read.parquet(s"$tmp/stats"),
      queries, "query_id", "qtext", k = 5)
    searched.collect()
    val splan = searched.queryExecution.executedPlan.toString
    // corpus (documents.parquet) should appear ONLY for the query batch
    println("SEARCH_CORPUS_SCANS=" +
      raw"documents\.parquet".r.findAllIn(splan).length)
    println("SEARCH_INDEX_SCANS=" + raw"postings".r.findAllIn(
      raw"Scan parquet[^\n]*".r.findAllIn(splan).mkString("\n")).length)
  }
}
