package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * Session-extension injector: `--conf spark.sql.extensions=
 * graft.functions.GraftSparkExtensions` makes the graft SQL functions
 * (`iceberg_bucket`, `iceberg_truncate`, `cosine_similarity`,
 * `text_fingerprint`) available in every session of the cluster without any
 * driver-side registration call — the deployment path for a shared Spark
 * service (SURVEY.md §2.9: matching how Spark-Iceberg exposes
 * `system.bucket`). In-process users can keep calling
 * [[GraftFunctions.register]].
 */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("iceberg_bucket"),
      info("iceberg_bucket", "iceberg_bucket(n, col) - spec murmur3 bucket of col into n"),
      (exprs: Seq[Expression]) =>
        IcebergBucket(exprs(1), exprs.head.eval().asInstanceOf[Int])))
    ext.injectFunction((FunctionIdentifier("iceberg_truncate"),
      info("iceberg_truncate", "iceberg_truncate(w, col) - spec truncate of col to width w"),
      (exprs: Seq[Expression]) =>
        IcebergTruncate(exprs(1), exprs.head.eval().asInstanceOf[Int])))
    ext.injectFunction((FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", "cosine_similarity(a, b) - cosine of two float vectors"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("text_fingerprint"),
      info("text_fingerprint", "text_fingerprint(s) - 64-bit FNV-1a fingerprint"),
      (exprs: Seq[Expression]) => TextFingerprint(exprs.head)))
    ext.injectFunction((FunctionIdentifier("unicode_normalize"),
      info("unicode_normalize",
        "unicode_normalize(s, form) - NFC/NFD/NFKC/NFKD normalization"),
      (exprs: Seq[Expression]) =>
        UnicodeNormalize(exprs(0), exprs(1).eval().toString)))
    ext.injectFunction((FunctionIdentifier("repetition_stats"),
      info("repetition_stats",
        "repetition_stats(s, n) - Gopher repetition signals (dup lines, top n-gram)"),
      (exprs: Seq[Expression]) =>
        RepetitionStats(exprs(0), exprs(1).eval().asInstanceOf[Int])))
    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - dot product of two float vectors"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("hamming_words"),
      info("hamming_words",
        "hamming_words(a, b) - Hamming distance of two bigint-word bit vectors"),
      (exprs: Seq[Expression]) => HammingWords(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("unigram_entropy"),
      info("unigram_entropy",
        "unigram_entropy(tokens) - entropy of the array's own unigram distribution"),
      (exprs: Seq[Expression]) => UnigramEntropy(exprs.head)))
  }
}
