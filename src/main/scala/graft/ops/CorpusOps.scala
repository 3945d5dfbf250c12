package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-preparation operators a large-scale LLM training pipeline needs
 * beyond dedup/similarity (which live in [[DedupOps]]/[[SimilarityOps]]):
 * sequence packing, train/test decontamination, stratified sampling,
 * vocabulary statistics. All are declarative DataFrame plans — Catalyst
 * keeps filters pushed and aggregation partial, and nothing here collects
 * to the driver.
 */
object CorpusOps {

  /**
   * Concat-and-chunk sequence packing: documents are laid out back-to-back
   * in a deterministic order and cut into fixed `ctxLen`-token training
   * windows; each document learns its byte-offset and first chunk id.
   *
   * 100 TB design: packing is per `partitionCol` group (e.g. source shard),
   * so the only shuffle is a hash partition on the group key and the
   * running sum is a window inside each partition — no global total order,
   * which would be a single-reducer sort at corpus scale. Groups pack
   * independently exactly like sharded training data files do.
   */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    partitionCol: String, ctxLen: Int): DataFrame = {
    val w = Window.partitionBy(partitionCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col(partitionCol),
        TextOps.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("start_offset", sum("n_tokens").over(w) - col("n_tokens"))
      .withColumn("chunk_id", floor(col("start_offset") / ctxLen))
  }

  /** Word n-grams of `textCol`, hashed to md5 hex (32 bytes ride the
    * shuffle instead of unbounded gram strings); empty when the document
    * has fewer than `n` tokens. */
  private def gramSet(textCol: Column, n: Int): Column = {
    val toks = TextOps.tokens(textCol)
    val grams = when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - lit(n - 1)),
        i => md5(array_join(slice(toks, i, lit(n)), " ").cast("binary"))))
      .otherwise(array().cast("array<string>"))
    array_distinct(grams)
  }

  /**
   * Train/test decontamination: which training documents share at least
   * one word `n`-gram with any test/benchmark document (the standard
   * "n-gram collision" contamination test). Returns one row per
   * contaminated training doc with the number of distinct shared grams.
   *
   * 100 TB design: both sides explode to (doc, gram-hash) and meet in ONE
   * shuffle join keyed on the 32-byte hash — no document pair matrix. The
   * test side is a benchmark suite (tiny next to the corpus), so its
   * distinct gram set broadcasts; Spark's AQE does this from runtime stats,
   * the explicit hint makes it unconditional.
   */
  def ngramOverlap(train: DataFrame, test: DataFrame, idCol: String,
                   textCol: String, n: Int = 8): DataFrame = {
    val trainGrams = train
      .select(col(idCol), explode(gramSet(col(textCol), n)).as("gram"))
    val testGrams = test
      .select(explode(gramSet(col(textCol), n)).as("gram")).distinct()
    trainGrams.join(broadcast(testGrams), "gram")
      .groupBy(idCol) // grams are distinct per doc: count == distinct count
      .agg(count(lit(1)).as("n_shared"))
  }

  /**
   * Deterministic stratified sampling: each stratum keeps the documents
   * whose content-hash first hex digit falls in its allowed set (so rates
   * are multiples of 1/16). Like [[graft.SparkEntry]]'s d43 sample but
   * with per-stratum rates — e.g. downsample the dominant language hard
   * and keep the tail. Map-only, reproducible across runs and engines:
   * membership depends only on document content.
   */
  def stratifiedSample(df: DataFrame, textCol: String, strataCol: String,
                       hexPrefixes: Map[String, Seq[String]],
                       defaultPrefixes: Seq[String]): DataFrame = {
    val h = substring(md5(col(textCol).cast("binary")), 1, 1)
    val keep = hexPrefixes.foldLeft(
      when(lit(false), lit(true))) { case (acc, (stratum, hexes)) =>
        acc.when(col(strataCol) === stratum, h.isin(hexes: _*))
    }.otherwise(h.isin(defaultPrefixes: _*))
    df.where(keep)
  }

  /** Global token vocabulary, top `k` by frequency (ties broken by token
    * text for determinism). Partial aggregation combines per-partition
    * counts map-side; the final top-k is TakeOrderedAndProject — no global
    * sort materializes the full vocabulary. */
  def vocabTopK(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(k)
}
