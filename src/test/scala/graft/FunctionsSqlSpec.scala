package graft

import graft.functions.{GraftFunctions, GraftSparkExtensions}
import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

/** SQL-registered graft functions + the session-extensions injector. */
class FunctionsSqlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("functions usable from SQL after register()") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT iceberg_bucket(16, CAST(34 AS BIGINT)) AS b, " +
        "iceberg_truncate(3, 'iceberg') AS t, " +
        "cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c")
      .collect().head
    assert(r.getInt(0) == (2017239379 & Int.MaxValue) % 16)
    assert(r.getString(1) == "ice")
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("text functions usable from SQL: unicode_normalize, repetition_stats") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT unicode_normalize('é', 'NFC') AS n, " +
        "repetition_stats('a b\na b', 2) AS s")
      .selectExpr("n", "s.n_lines", "s.dup_line_frac", "s.n_grams", "s.top_gram_frac")
      .collect().head
    assert(r.getString(0) == "é")
    assert(r.getLong(1) == 2L && r.getDouble(2) == 0.5)
    // tokens [a b a b] -> grams [a b, b a, a b]
    assert(r.getLong(3) == 3L && math.abs(r.getDouble(4) - 2.0 / 3) < 1e-15)
  }

  test("vector kernels usable from SQL: dot_product, hamming_words") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT dot_product(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "                 array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d, " +
        "hamming_words(array(CAST(5 AS BIGINT)), array(CAST(6 AS BIGINT))) AS h")
      .collect().head
    assert(math.abs(r.getDouble(0) - 11.0) < 1e-12)
    assert(r.getLong(1) == 2L) // 0b101 xor 0b110 = 0b011
  }

  test("text functions usable from SQL: unigram_entropy") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT unigram_entropy(array('a', 'b', 'a', 'b')) AS h, " +
        "unigram_entropy(CAST(array() AS ARRAY<STRING>)) AS h0")
      .collect().head
    assert(math.abs(r.getDouble(0) - math.log(2.0)) < 1e-12)
    assert(r.getDouble(1) == 0.0)
  }

  test("extensions injector builds in a fresh session") {
    val fresh = spark.newSession()
    // apply the same builders the extension injects, through its code path
    new GraftSparkExtensions().apply(new SparkSessionExtensions)
    // and prove per-session registration works on the new session too
    GraftFunctions.register(fresh)
    assert(fresh.sql("SELECT iceberg_bucket(4, CAST(34 AS BIGINT))")
      .collect().head.getInt(0) == (2017239379 & Int.MaxValue) % 4)
  }
}
