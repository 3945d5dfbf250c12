package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The null-element contract of the codegen kernels that replaced
  * null-propagating HOF folds (r15 advice): a NULL array ELEMENT must
  * make random_project / dsir_score / dsir_buckets NULL — the semantics
  * of the `aggregate`/`transform` forms they replaced — not read garbage
  * (`getDouble` on a null slot) or NPE (`getUTF8String(i).getBytes`).
  * token_weight_sum treats a NULL token as out-of-vocabulary (skip).
  * Exercised through a real plan, so whichever path Spark picks
  * (codegen or interpreted fallback) is the one under test, plus the
  * interpreted path pinned explicitly via eval. */
class NullElementGuardSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // array<double> with containsNull = true: build via sql to control the type
  test("random_project: NULL element => NULL; null-free row unchanged") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        | (1L, array(cast(1.0 as double), 2.0, 3.0, 4.0)),
        | (2L, array(cast(1.0 as double), NULL, 3.0, 4.0)),
        | (3L, NULL)
        | AS t(id, vec)""".stripMargin)
    val out = df.select($"id",
        GraftFunctions.random_project(col("vec"), 4, 7L).as("p"))
      .orderBy("id").collect()
    assert(out(0).get(1) != null, "null-free vector must project")
    assert(out(1).isNullAt(1), "a NULL element must null the projection")
    assert(out(2).isNullAt(1), "a NULL vector must stay NULL")
    // the null-free projection must be IDENTICAL to projecting through a
    // containsNull=false array type (the fast path skips the guard scan)
    val fast = spark.sql(
        "SELECT array(cast(1.0 as double), 2.0, 3.0, 4.0) AS vec")
      .select(GraftFunctions.random_project(col("vec"), 4, 7L).as("p"))
      .collect()(0).getSeq[Double](0)
    assert(out(0).getSeq[Double](1) == fast)
  }

  test("dsir_score / dsir_buckets: NULL token => NULL; null-free unchanged") {
    val deltas = Array.fill(16)(0.5)
    val df = spark.sql(
      """SELECT * FROM VALUES
        | (1L, array('a', 'b', 'c')),
        | (2L, array('a', NULL, 'c')),
        | (3L, cast(NULL as array<string>))
        | AS t(id, toks)""".stripMargin)
    val out = df.select($"id",
        GraftFunctions.dsir_score(col("toks"), deltas).as("s"),
        GraftFunctions.dsir_buckets(col("toks"), 16).as("b"))
      .orderBy("id").collect()
    assert(out(0).getDouble(1) == 1.0) // 2 bigrams x 0.5
    assert(out(0).getSeq[Int](2).length == 2)
    assert(out(1).isNullAt(1) && out(1).isNullAt(2),
      "a NULL token must null the fold, like the HOF it replaced")
    assert(out(2).isNullAt(1) && out(2).isNullAt(2))
  }

  test("token_weight_sum: NULL token is out-of-vocabulary (skipped)") {
    val df = spark.sql(
      "SELECT array('good', NULL, 'bad') AS toks")
    val out = df.select(GraftFunctions.token_weight_sum(col("toks"),
        Array("good", "bad"), Array(1.0, -2.0), bias = 0.25).as("w"))
      .collect()(0).getDouble(0)
    assert(out == 1.0 - 2.0 + 0.25)
  }

  test("unigram_entropy: values, empty, NULL element, NULL array") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        | (1L, array('a', 'b', 'a', 'b')),
        | (2L, array('a', 'a', 'a', 'a')),
        | (3L, array('a', 'a', 'b', 'c')),
        | (4L, cast(array() as array<string>)),
        | (5L, array('a', NULL, 'b')),
        | (6L, cast(NULL as array<string>))
        | AS t(id, toks)""".stripMargin)
    val out = df.select($"id",
        GraftFunctions.unigram_entropy(col("toks")).as("h"))
      .orderBy("id").collect()
    // two symbols at p=1/2 each: H = ln 2
    assert(math.abs(out(0).getDouble(1) - math.log(2.0)) < 1e-12)
    // a single repeated symbol carries no information
    assert(out(1).getDouble(1) == 0.0)
    // {a:2, b:1, c:1} over N=4: ln 4 - (2 ln 2)/4
    assert(math.abs(out(2).getDouble(1) -
      (math.log(4.0) - 2.0 * math.log(2.0) / 4.0)) < 1e-12)
    assert(out(3).getDouble(1) == 0.0, "empty array => 0.0 by definition")
    assert(out(4).isNullAt(1),
      "a NULL token must null the result, like the d-kernel fold class")
    assert(out(5).isNullAt(1), "a NULL array must stay NULL")
  }

  test("term_counts: first-occurrence order, tf values, empty, NULL element, NULL array") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        | (1L, array('b', 'a', 'b', 'c', 'a', 'b')),
        | (2L, cast(array() as array<string>)),
        | (3L, array('a', NULL, 'b')),
        | (4L, cast(NULL as array<string>))
        | AS t(id, toks)""".stripMargin)
    val out = df.select($"id",
        GraftFunctions.term_counts(col("toks")).as("tc"))
      .orderBy("id").collect()
    val r0 = out(0).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(r0 == Seq(("b", 3L), ("a", 2L), ("c", 1L)),
      "first-occurrence order with exact tf — deterministic per content")
    assert(out(1).getSeq[org.apache.spark.sql.Row](1).isEmpty,
      "empty array => empty postings")
    assert(out(2).isNullAt(1),
      "a NULL token must null the result, like the d-kernel fold class")
    assert(out(3).isNullAt(1), "a NULL array must stay NULL")
  }

  test("broadcastSet memoizes by content: same elems => same broadcast") {
    import graft.functions.GraftFunctions.broadcastSet
    val a = broadcastSet(Array("x", "y", "z"))
    val b = broadcastSet(Array("x", "y", "z"))
    assert(a.id == b.id,
      "identical membership sets must reuse ONE broadcast (r15 advice: " +
        "repeated plan rebuilds pinned a fresh copy per rebuild)")
    val c = broadcastSet(Array("x", "y"))
    assert(c.id != a.id, "different sets must not collide")
    // length-prefixing keeps concatenation-ambiguous element lists apart
    val d = broadcastSet(Array("xy", "z"))
    val e = broadcastSet(Array("x", "yz"))
    assert(d.id != e.id, "digest must be length-prefixed, not concatenated")
  }
}
