package graft

import graft.ops.{CorpusOps, TextOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("packSequences: per-group running offsets and chunk boundaries") {
    val docs = Seq(
      (1L, "a b c", "s1"),   // 3 tokens, offset 0, chunk 0
      (2L, "d e", "s1"),     // 2 tokens, offset 3, chunk 0
      (3L, "f g h i", "s1"), // 4 tokens, offset 5, chunk 1 (ctx=4)
      (10L, "x y z w q", "s2")) // other group packs from 0
      .toDF("doc_id", "text", "source")
    val packed = CorpusOps.packSequences(docs, "doc_id", "text", "source", ctxLen = 4)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "start_offset", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(packed.toSeq == Seq((1L, 3L, 0L, 0L), (2L, 2L, 3L, 0L),
      (3L, 4L, 5L, 1L), (10L, 5L, 0L, 0L)))
  }

  test("pmiCollocations: hand-computed PMI, minCount prune, empty docs, deterministic order") {
    val docs = Seq(
      (1L, "new york new york"), // (new,york) x2, (york,new) x1
      (2L, "york new"),          // (york,new) -> c=2 total
      (3L, "alpha beta"),        // hapax bigram -> pruned at minCount=2
      (4L, ""))                  // empty text -> no tokens, no bigrams
      .toDF("doc_id", "text")
    // W = 8 tokens; c(new)=3, c(york)=3; both surviving pairs have
    // ratio = 2*8/(3*3) = 16/9, pmi = ln(16/9) = 0.575364 (round 6)
    val got = CorpusOps.pmiCollocations(docs, "text", minCount = 2L, k = 10)
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("new", "york", 2L, 0.575364),
      ("york", "new", 2L, 0.575364)))
  }

  test("ngramNovelty: shared-gram fractions, within-doc dups count once, short docs surface") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9"),  // grams {g(1..8), g(2..9)}
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 x"),   // shares g(1..8) with doc 1
      (3L, "p p p p p p p p p"),           // 2 positions, ONE distinct gram, unshared
      (4L, "a b"))                         // < 8 tokens -> (0, 0, null)
      .toDF("doc_id", "text")
    val got = CorpusOps.ngramNovelty(docs, "doc_id", "text", n = 8)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else java.lang.Double.valueOf(r.getDouble(3))))
    assert(got.toSeq == Seq(
      (1L, 2L, 1L, java.lang.Double.valueOf(0.5)),
      (2L, 2L, 1L, java.lang.Double.valueOf(0.5)),
      (3L, 1L, 0L, java.lang.Double.valueOf(1.0)),
      (4L, 0L, 0L, null)))
  }

  test("repetitionSignals: dup-line fractions, char weighting, blank filter, top-gram") {
    val docs = Seq(
      (1L, "aaa bbb\naaa bbb\nccc"), // 2 dup lines of 3; dup chars 14/17
      (2L, ""),                      // no lines, no grams
      (3L, "x\n\n  \ny")             // blank + whitespace-only lines filtered
    ).toDF("doc_id", "text")
    val r = CorpusOps.repetitionSignals(docs, "doc_id", "text", n = 2)
      .orderBy("doc_id").collect()
    assert(r.length == 3, "every input doc keeps a row")
    val d1 = r(0)
    assert(d1.getLong(1) == 3L)                     // n_lines
    assert(math.abs(d1.getDouble(2) - 1.0 / 3) < 1e-15)   // dup_line_frac
    assert(math.abs(d1.getDouble(3) - 14.0 / 17) < 1e-15) // dup_line_char_frac
    // tokens [aaa bbb aaa bbb ccc] -> grams x4, "aaa bbb" twice
    assert(d1.getLong(4) == 4L && d1.getDouble(5) == 0.5)
    val d2 = r(1)
    assert(d2.getLong(1) == 0L && d2.isNullAt(2) && d2.isNullAt(3))
    assert(d2.getLong(4) == 0L && d2.isNullAt(5))
    val d3 = r(2)
    assert(d3.getLong(1) == 2L && d3.getDouble(2) == 0.0)
    assert(d3.getLong(4) == 1L && d3.getDouble(5) == 1.0)
  }

  test("repetitionSignals plan: map-only, zero exchanges") {
    val docs = Seq((1L, "a b\na b")).toDF("doc_id", "text")
    val plan = CorpusOps.repetitionSignals(docs, "doc_id", "text")
      .queryExecution.executedPlan
    def countExchanges(p: org.apache.spark.sql.execution.SparkPlan): Int =
      (p match {
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => 1
        case _ => 0
      }) + p.children.map(countExchanges).sum
    assert(countExchanges(plan) == 0,
      s"repetition signals must stay a single map pass:\n$plan")
  }

  test("ngramOverlap: shared 8-gram found; short docs produce no grams") {
    val train = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9"),  // shares grams 1-8 and 2-9? test has 1-8 only
      (2L, "u1 u2 u3 u4 u5 u6 u7 u8"),     // disjoint tokens
      (3L, "short doc")).toDF("doc_id", "text")
    val test = Seq(Tuple1("zz t1 t2 t3 t4 t5 t6 t7 t8")).toDF("text")
    val hits = CorpusOps.ngramOverlap(train, test, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // only doc 1 shares exactly one 8-gram (t1..t8) with the test doc
    assert(hits.toSeq == Seq((1L, 1L)))
  }

  test("ngramOverlapBloom equals ngramOverlap exactly (no false negatives survive)") {
    val train = (1L to 200L).map(i =>
      (i, if (i % 7 == 0) s"c t1 t2 t3 t4 t5 t6 t7 t8 x$i" else s"a$i b$i " + (1 to 8).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val test = Seq(Tuple1("zz t1 t2 t3 t4 t5 t6 t7 t8")).toDF("text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val exact = rows(CorpusOps.ngramOverlap(train, test, "doc_id", "text", n = 8))
    val bloomed = rows(CorpusOps.ngramOverlapBloom(train, test, "doc_id", "text",
      n = 8, expectedTestGrams = 1024, fpp = 0.01))
    assert(exact.nonEmpty && bloomed == exact)
    // a deliberately tiny/over-saturated sketch still never loses a hit
    val saturated = rows(CorpusOps.ngramOverlapBloom(train, test, "doc_id", "text",
      n = 8, expectedTestGrams = 2, fpp = 0.5))
    assert(saturated == exact)
  }

  test("contaminationScore: per-doc fraction, zero rows kept, short docs 0") {
    val train = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9"),  // 2 grams, 1 shared → 0.5
      (2L, "u1 u2 u3 u4 u5 u6 u7 u8"),     // 1 gram, clean → 0.0
      (3L, "short doc")).toDF("doc_id", "text") // no grams → 0.0
    val test = Seq(Tuple1("zz t1 t2 t3 t4 t5 t6 t7 t8")).toDF("text")
    val scored = CorpusOps.contaminationScore(train, test, "doc_id", "text", n = 8)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(scored == Seq((1L, 2L, 1L, 0.5), (2L, 1L, 0L, 0.0), (3L, 0L, 0L, 0.0)))
  }

  test("qualityReasons: stable reason strings, keep == empty reasons") {
    val good = ("the a of and to in is " + (1 to 20).map(i => s"word$i").mkString(" "))
    val docs = Seq(
      (1L, good),                         // passes all four signals
      (2L, "tiny doc"),                   // too short + no stopwords
      (3L, good + " !!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!")) // punctuation
      .toDF("doc_id", "text")
    val r = docs.select(col("doc_id"), TextOps.qualityReasons(col("text")).as("reasons"))
      .collect().map(x => (x.getLong(0), x.getString(1))).toMap
    assert(r(1L) == "")
    assert(r(2L).contains("length") && r(2L).contains("stopwords"))
    assert(r(3L).contains("punctuation"))
    // reasons are ordered by the fixed signal order, comma-joined
    assert(r(2L) == r(2L).split(",").toSeq.mkString(","))
  }

  test("selectWithinBudget: quality-ordered fill, budget-crossing doc included") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", 10, 5L), (2L, "en", 9, 4L), (3L, "en", 8, 2L),
      (4L, "fr", 7, 100L), (5L, "fr", 6, 1L)).toDF("id", "lang", "q", "tok")
    val kept = CorpusOps.selectWithinBudget(docs, "id", "lang", "q", "tok", 8L)
      .select("id").as[Long].collect().toSet
    // en: cum-before 0,5,9 -> 1,2 kept, 3 over; fr: the first doc always
    // fits (crossing doc included), the next starts past the budget
    assert(kept == Set(1L, 2L, 4L))
  }

  test("selectWithinBudget: two-phase bucketed plan equals the single-window reference") {
    import spark.implicits._
    // deterministic pseudo-random corpus: quality ties, zero-token docs,
    // a null quality, a NULL stratum (its own budgeted group, like
    // Window.partitionBy), several strata of very different sizes
    val rows = (1 to 500).map { i =>
      val lang = if (i % 13 == 0) null
        else if (i % 7 == 0) "fr" else if (i % 11 == 0) "de" else "en"
      val q: java.lang.Double =
        if (i == 123) null
        else java.lang.Double.valueOf(((i * 2654435761L) % 97).toDouble / 10.0)
      val tok = if (i % 53 == 0) 0L else ((i * 40503L) % 300) + 1L
      (i.toLong, lang, q, tok)
    }
    val docs = rows.toDF("id", "lang", "q", "tok")
    // the old exact single-window semantics, inline as the oracle
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      .orderBy(col("q").desc, col("id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val want = docs.withColumn("c", sum(col("tok")).over(w))
      .where(col("c") - col("tok") < 3000L)
      .select("id").as[Long].collect().toSet
    for (buckets <- Seq(1, 3, 64)) {
      val got = CorpusOps.selectWithinBudget(
        docs, "id", "lang", "q", "tok", 3000L, numBuckets = buckets)
        .select("id").as[Long].collect()
      assert(got.length == got.distinct.length, s"dup rows at numBuckets=$buckets")
      assert(got.toSet == want, s"mismatch at numBuckets=$buckets")
    }
  }

  test("selectWithinBudget: fractional tokens sum in native type (no truncation)") {
    import spark.implicits._
    // windowed reference sums doubles natively; per-row long truncation
    // would keep an extra doc (0.9+0.9+0.9 truncates to 0)
    val docs = Seq(
      (1L, "en", 10, 0.9), (2L, "en", 9, 0.9), (3L, "en", 8, 0.9),
      (4L, "en", 7, 0.9)).toDF("id", "lang", "q", "tok")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      .orderBy(col("q").desc, col("id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val want = docs.withColumn("c", sum(col("tok")).over(w))
      .where(col("c") - col("tok") < 2L).select("id").as[Long].collect().toSet
    for (buckets <- Seq(1, 64)) {
      val got = CorpusOps.selectWithinBudget(
        docs, "id", "lang", "q", "tok", 2L, numBuckets = buckets)
        .select("id").as[Long].collect().toSet
      assert(got == want, s"mismatch at numBuckets=$buckets")
    }
  }

  test("selectWithinBudget: reserved working columns rejected loudly") {
    import spark.implicits._
    val docs = Seq((1L, "en", 1, 1L, 0L)).toDF("id", "lang", "q", "tok", "__swb_b")
    val e = intercept[IllegalArgumentException] {
      CorpusOps.selectWithinBudget(docs, "id", "lang", "q", "tok", 10L)
    }
    assert(e.getMessage.contains("__swb_b"))
  }

  test("domainBlocklist: subdomain suffix matching, multi-match, clean and schemeless hosts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "https://ads.tracker.net/x"),        // subdomain of a blocked domain
      (2L, "https://x.spam.bad/p?q=1"),          // matches TWO entries
      (3L, "https://goodsite.org/ok"),           // clean
      (4L, "HTTPS://TRACKER.NET:8080/y"),        // exact host, case+port
      (5L, "not a url at all")).toDF("id", "url")
    val block = Seq("tracker.net", "spam.bad", "x.spam.bad").toDF("domain")
    val out = CorpusOps.domainBlocklist(docs, "id", "url", block)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(2), Option(r.getString(3))))
    assert(out.toSeq == Seq(
      (1L, "ads.tracker.net", Some("tracker.net")),
      (2L, "x.spam.bad", Some("spam.bad,x.spam.bad")),
      (3L, "goodsite.org", None),
      (4L, "tracker.net", Some("tracker.net")),
      (5L, "", None)))
  }

  test("domainBlocklist: duplicate blocklist rows do not multiply matches") {
    import spark.implicits._
    val docs = Seq((1L, "https://ads.tracker.net/x")).toDF("id", "url")
    val block = Seq("tracker.net", "tracker.net", "tracker.net").toDF("domain")
    val out = CorpusOps.domainBlocklist(docs, "id", "url", block).collect()
    assert(out.length == 1 && out(0).getString(3) == "tracker.net")
  }

  test("domainBlocklist: output-contract column collision rejected loudly") {
    import spark.implicits._
    val docs = Seq((1L, "https://a.b/x", "pre")).toDF("id", "url", "host")
    val block = Seq("b").toDF("domain")
    val e = intercept[IllegalArgumentException] {
      CorpusOps.domainBlocklist(docs, "id", "url", block)
    }
    assert(e.getMessage.contains("host"))
  }

  test("stratifiedSample is deterministic and respects per-stratum rates") {
    val docs = (0 until 400).map(i => (i.toLong, s"doc number $i content", if (i % 2 == 0) "en" else "fr"))
      .toDF("doc_id", "text", "lang")
    val s1 = CorpusOps.stratifiedSample(docs, "text", "lang",
      Map("en" -> Seq("0", "1")), Seq("0", "1", "2", "3"))
    val s2 = CorpusOps.stratifiedSample(docs, "text", "lang",
      Map("en" -> Seq("0", "1")), Seq("0", "1", "2", "3"))
    assert(s1.collect().map(_.getLong(0)).sorted.toSeq ==
      s2.collect().map(_.getLong(0)).sorted.toSeq)
    val counts = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // en keeps ~2/16 of 200, fr ~4/16 of 200; generous bounds, determinism
    // is the contract (exact counts are locked by the d49 oracle)
    assert(counts.getOrElse("en", 0L) < counts.getOrElse("fr", 0L))
  }

  test("vocabTopK breaks count ties by token text") {
    val docs = Seq(Tuple1("b b a a c")).toDF("text")
    val top = CorpusOps.vocabTopK(docs, "text", 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top.toSeq == Seq(("a", 2L), ("b", 2L)))
  }

  test("redactPii scrubs emails and phones, counts match") {
    val df = Seq(Tuple1("hello bob.smith@corp.io call +1-555-0042 or +1-555-9999 end"))
      .toDF("text")
    val r = df.select(
      TextOps.redactPii(col("text")).as("red"),
      TextOps.emailCount(col("text")).as("ne"),
      TextOps.phoneCount(col("text")).as("np")).head()
    assert(r.getString(0) == "hello <EMAIL> call <PHONE> or <PHONE> end")
    assert(r.getInt(1) == 1 && r.getInt(2) == 2)
  }

  test("repetitionScore: duplicated-bigram fraction, short docs score 0") {
    val docs = Seq(
      (1L, "a b a b a"),  // bigrams: ab ba ab ba -> 4 total, 2 distinct -> 0.5
      (2L, "x y z"),      // all distinct -> 0.0
      (3L, "solo")).toDF("doc_id", "text") // < n tokens -> 0 grams, 0.0
    val r = CorpusOps.repetitionScore(docs, "doc_id", "text", n = 2)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    assert(r.toSeq == Seq((1L, 4L, 0.5), (2L, 2L, 0.0), (3L, 0L, 0.0)))
  }

  test("chunkDocuments: stride windows with overlap, clamped tail") {
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")), (2L, ""))
      .toDF("doc_id", "text")
    val chunks = CorpusOps.chunkDocuments(docs, "doc_id", "text",
        chunkTokens = 4, strideTokens = 3)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // starts 1,4,7,10 -> lengths 4,4,4,1; empty doc yields nothing
    assert(chunks.toSeq == Seq((1L, 0L, 4L), (1L, 1L, 4L), (1L, 2L, 4L), (1L, 3L, 1L)))
  }

  test("packSequences plan: one shuffle on the group key, no global sort") {
    val docs = Seq((1L, "a b", "s1")).toDF("doc_id", "text", "source")
    val plan = CorpusOps.packSequences(docs, "doc_id", "text", "source", 512)
      .queryExecution.executedPlan.toString
    // a global orderBy would show a rangepartitioning exchange
    assert(plan.contains("hashpartitioning(source"))
    assert(!plan.contains("rangepartitioning"))
  }

  test("sourceDrift: hand-computed KL, zero for a distribution-identical stratum, one tokenize") {
    import spark.implicits._
    // corpus: 'a' appears 3x, 'b' 1x. s1 = (a a), s2 = (a b):
    //   q(a)=3/4, q(b)=1/4
    //   s1: p(a)=1  -> KL = 1*ln(1/(3/4))            = ln(4/3)
    //   s2: p(a)=p(b)=1/2 -> ln(2/3)/2 + ln(2)/2
    val docs = Seq(("s1", "a a"), ("s2", "a b")).toDF("src", "text")
    val got = CorpusOps.sourceDrift(docs, "src", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got("s1") == ((2L, 1L, r6(math.log(4.0 / 3.0)))))
    assert(got("s2") == ((2L, 2L,
      r6(0.5 * math.log((0.5) / (3.0 / 4.0)) + 0.5 * math.log((0.5) / (1.0 / 4.0))))))
    // a stratum whose distribution equals the corpus-wide one drifts 0
    val uni = Seq(("u1", "x y"), ("u2", "x y")).toDF("src", "text")
    val kls = CorpusOps.sourceDrift(uni, "src", "text")
      .select("kl").as[Double].collect()
    assert(kls.toSeq == Seq(0.0, 0.0))
    // the scale claim: ONE tokenize pass — all four consumers of the
    // compact (stratum, token) counts reuse a single exchange (the d100
    // canonicalization trick; without the vacuous isnotnulls the corpus
    // tokenizes four times)
    val df = CorpusOps.sourceDrift(docs, "src", "text")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val finalSection = plan.split("== Initial Plan ==").head
    val nGen = "Generate explode".r.findAllIn(finalSection).size
    assert(nGen == 1, s"expected ONE tokenize pass in the final plan, got $nGen:\n$finalSection")
  }

  test("splitAssign: growth-stable, duplicates co-split, proportions track, map-only") {
    import spark.implicits._
    val docs = (0L until 2000L).map(i => (i, s"document number $i body")).toDF("doc_id", "text")
    val split = CorpusOps.splitAssign(docs, col("text"))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // proportions track 80/10/10 within hash noise on 2k docs
    val n = split.size.toDouble
    val frac = split.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(frac("train") - 0.8) < 0.05 &&
      math.abs(frac("val") - 0.1) < 0.03 && math.abs(frac("test") - 0.1) < 0.03,
      s"split proportions off: $frac")
    // STABILITY UNDER GROWTH: the same docs inside a 2x corpus keep
    // their split — the property that keeps eval sets fixed across
    // dataset versions
    val grown = docs.unionByName(
      (10000L until 12000L).map(i => (i, s"new arrival $i")).toDF("doc_id", "text"))
    val regrown = CorpusOps.splitAssign(grown, col("text"))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(split.forall { case (id, s) => regrown(id) == s })
    // verbatim duplicates land in the SAME split (content-keyed): no
    // cross-split leakage through exact dups
    val dups = Seq((1L, "same body"), (2L, "same body"), (3L, "same body"))
      .toDF("doc_id", "text")
    assert(CorpusOps.splitAssign(dups, col("text"))
      .select("split").distinct().count() == 1L)
    // custom weights and the weight guard
    val custom = CorpusOps.splitAssign(docs, col("text"),
      Seq("a" -> 1L, "b" -> 1L)).select("split").distinct()
      .as[String].collect().toSet
    assert(custom == Set("a", "b"))
    intercept[IllegalArgumentException] {
      CorpusOps.splitAssign(docs, col("text"), Seq("a" -> 0L))
    }
    // map-only: zero exchange in the executed plan
    val plan = CorpusOps.splitAssign(docs, col("text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"splitAssign must not shuffle:\n$plan")
  }

  test("weightedSample: deterministic, layout-independent, weight-tilted, guards") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val docs = (0L until 300L).map(i => (i, if (i % 2 == 0) "a" else "b", 1.0 + (i % 5)))
      .toDF("doc_id", "grp", "w")
    val s1 = CorpusOps.weightedSample(docs, "doc_id", "grp", col("w"), k = 10, seed = "t1")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    // reproducible and independent of physical layout
    val s2 = CorpusOps.weightedSample(docs.repartition(7), "doc_id", "grp", col("w"),
      k = 10, seed = "t1")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(s1 == s2, "sample must not depend on partitioning")
    // dense ranks 1..k per stratum; a fresh seed is a fresh draw
    assert(s1.groupBy(_._1).forall { case (_, rs) => rs.map(_._3).sorted == (1L to 10L) })
    val s3 = CorpusOps.weightedSample(docs, "doc_id", "grp", col("w"), k = 10, seed = "t2")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(s1 != s3, "different seeds must give different draws")
    // matches the window-form ES ranking exactly (aggregate vs window)
    val expected = {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val hex = md5(concat(lit("t1"), lit(":"), col("doc_id").cast("string")).cast("binary"))
      val nib = (i: Int) => instr(lit("0123456789abcdef"), substring(hex, i, 1)) - 1
      val bk = ((nib(1) * 16 + nib(2)) * 16 + nib(3)) * 16 + nib(4)
      val key = log((bk.cast("double") + lit(0.5)) / lit(65536.0)) / col("w")
      docs.withColumn("__k", key)
        .withColumn("rank", row_number().over(
          Window.partitionBy("grp").orderBy(col("__k").desc, col("doc_id"))).cast("long"))
        .where(col("rank") <= 10).select("grp", "doc_id", "rank")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    }
    assert(s1 == expected, "top_k_by aggregate must equal the window ES ranking")
    // weight tilt: one heavy doc (w=50) vs 9 unit docs — ES inclusion
    // probability for rank 1 is 50/59 ≈ 0.85, so across 40 seeds the
    // heavy doc should win most draws (binomial p<1e-6 of <= 20 wins)
    val skew = ((0L until 9L).map(i => (i, "g", 1.0)) :+ (99L, "g", 50.0))
      .toDF("doc_id", "grp", "w")
    val wins = (0 until 40).count { s =>
      CorpusOps.weightedSample(skew, "doc_id", "grp", col("w"), k = 1, seed = s"seed$s")
        .collect()(0).getLong(1) == 99L
    }
    assert(wins > 20, s"heavy doc won only $wins/40 draws — tilt broken")
    // non-positive and null weights never enter
    val bad = Seq((1L, "g", 0.0), (2L, "g", -3.0), (3L, "g", 1.0))
      .toDF("doc_id", "grp", "w")
      .unionByName(Seq((4L, "g")).toDF("doc_id", "grp").withColumn("w", lit(null).cast("double")))
    val kept = CorpusOps.weightedSample(bad, "doc_id", "grp", col("w"), k = 10, seed = "t1")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L))
    intercept[IllegalArgumentException] {
      CorpusOps.weightedSample(docs, "doc_id", "grp", col("w"), k = 0, seed = "t1")
    }
    // scale shape: the exchange carries pre-combined top-k, not the corpus
    val plan = CorpusOps.weightedSample(docs, "doc_id", "grp", col("w"), k = 10, seed = "t1")
      .queryExecution.executedPlan.toString
    assert(plan.contains("top_k_by") && !plan.contains("Window"),
      s"must plan as the map-side-combining aggregate, not a window:\n$plan")
  }

  test("dsirSelect: importance tilts toward target, deterministic, bounded model") {
    import org.apache.spark.sql.functions.{col, lit}
    // target docs repeat one phrase, raw docs a disjoint one, mixed docs
    // straddle — logw must order target > mixed > raw with the right signs
    val tgt = (0L until 40L).map(i =>
      (i, "en", "the quick brown fox jumps over the lazy dog"))
    val raw = (100L until 140L).map(i =>
      (i, "xx", "lorem ipsum dolor sit amet consectetur adipiscing elit"))
    val mixed = (200L until 240L).map(i =>
      (i, "xx", "the quick brown fox sit amet"))
    val docs = (tgt ++ raw ++ mixed).toDF("doc_id", "lang", "text")
    val deltas = CorpusOps.dsirDeltas(docs, "text", col("lang") === "en")
    assert(deltas.length == 256, "model must be the bounded bucket array")
    // k >= corpus: every doc surfaces with its logw
    val logwById = CorpusOps.dsirSelectWith(docs, "doc_id", "text", deltas,
        k = 200, seed = "s1")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert((0L until 40L).forall(i => logwById(i) > 0),
      "target docs must score positive log importance")
    assert((100L until 140L).forall(i => logwById(i) < 0),
      "raw docs must score negative log importance")
    assert((200L until 240L).forall(i =>
      logwById(i) > logwById(100L) && logwById(i) < logwById(0L)),
      "mixed docs must land strictly between")
    // the Gumbel draw at k=30 is dominated by the 40 target docs (their
    // logw gap to everything else is far beyond Gumbel noise)
    val sel = CorpusOps.dsirSelectWith(docs, "doc_id", "text", deltas,
      k = 30, seed = "s1").collect()
    assert(sel.map(_.getLong(2)).sorted.toSeq == (1L to 30L))
    assert(sel.count(_.getLong(0) < 40L) >= 25,
      "selection must tilt hard toward the target distribution")
    // deterministic, layout-independent; a new seed is a fresh draw
    val again = CorpusOps.dsirSelectWith(docs.repartition(7), "doc_id",
      "text", deltas, k = 30, seed = "s1").collect().toSeq
    assert(sel.toSeq == again, "selection must not depend on partitioning")
    val other = CorpusOps.dsirSelectWith(docs, "doc_id", "text", deltas,
      k = 30, seed = "s2").collect().toSeq
    assert(sel.toSeq != other, "different seeds must give different draws")
    // gram-free docs fold to exactly logw 0 and stay eligible
    val withEmpty = docs.unionByName(
      Seq((300L, "xx", ""), (301L, "xx", "one")).toDF("doc_id", "lang", "text"))
    val lw2 = CorpusOps.dsirSelectWith(withEmpty, "doc_id", "text", deltas,
        k = 300, seed = "s1")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(lw2(300L) == 0.0 && lw2(301L) == 0.0)
    // guards
    intercept[IllegalArgumentException] {
      CorpusOps.dsirSelectWith(docs, "doc_id", "text", deltas, k = 0, seed = "s1")
    }
    intercept[IllegalArgumentException] {
      CorpusOps.dsirDeltas(docs, "text", col("lang") === "en", buckets = 100)
    }
    // scale shape: scoring is map-only into the combinable top-k — no
    // window, and the corpus never shuffles ungrouped rows
    val plan = CorpusOps.dsirSelectWith(docs, "doc_id", "text", deltas,
      k = 30, seed = "s1").queryExecution.executedPlan.toString
    assert(plan.contains("top_k_by") && !plan.contains("Window"),
      s"DSIR selection must rank via top_k_by, not a window:\n$plan")
  }

  test("bpeTrainMerges: hand-computed merges, greedy non-overlap, filters") {
    import org.apache.spark.sql.functions.col
    // vocabulary: aaab x3, ab x2 — merge math by hand:
    //   round 1: (a,a) appears 2x inside aaab => 6 > (a,b) 3+2=5 -> merge (a,a,6)
    //            greedy non-overlap: |a|a|a|b| -> |aa|a|b| (FIRST pair only)
    //   round 2: (aa,a) 3, (a,b) 5 -> merge (a,b,5)
    //   round 3: only (aa,ab) 3 remains -> merge (aa,ab,3)
    val docs = Seq((1L, "aaab aaab ab"), (2L, "aaab ab"),
      (3L, "XYZ a|b 123")).toDF("doc_id", "text")
    val merges = CorpusOps.bpeTrainMerges(docs, "text", iters = 3)
      .orderBy("iter")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(merges == Seq((1L, "a", "a", 6L), (2L, "a", "b", 5L),
      (3L, "aa", "ab", 3L)),
      s"merge sequence diverged from the hand computation: $merges")
    // non-[a-z]+ tokens (uppercase, digits, delimiter chars) never enter
    // the vocabulary — doc 3 must contribute nothing (already implied by
    // the exact counts above, pinned here against a filter regression)
    val only = CorpusOps.bpeTrainMerges(
      Seq((1L, "XYZ 42 a|b")).toDF("doc_id", "text"), "text", iters = 3)
    assert(only.count() == 0, "no eligible words must yield no merges")
    // deterministic and layout-independent
    val again = CorpusOps.bpeTrainMerges(docs.repartition(5), "text", iters = 3)
      .orderBy("iter")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(merges == again)
    // single-symbol-word corpora stop early instead of looping
    val tiny = CorpusOps.bpeTrainMerges(
      Seq((1L, "a b c")).toDF("doc_id", "text"), "text", iters = 3)
    assert(tiny.count() == 0)
    intercept[IllegalArgumentException] {
      CorpusOps.bpeTrainMerges(docs, "text", iters = 0)
    }
  }

  test("contaminationReport equals per-suite scores on random corpora") {
    import org.apache.spark.sql.functions.{col, count, lit, round, when}
    val rnd = new scala.util.Random(41)
    for (_ <- 1 to 3) {
      val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh",
        "ii", "jj", "kk", "ll")
      val train = (0L until 40L).map { i =>
        (i, (0 until (6 + rnd.nextInt(8)))
          .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val sA = train.where("doc_id % 6 = 0").select(col("text"))
      val sB = train.where("doc_id % 11 = 3").select(col("text"))
      val got = CorpusOps.contaminationReport(train,
          Seq("A" -> sA, "B" -> sB), "doc_id", "text", n = 8)
        .orderBy("suite").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSeq
      val exp = Seq("A" -> sA, "B" -> sB).map { case (nm, t) =>
        val r = CorpusOps.contaminationScore(train, t, "doc_id", "text",
            n = 8)
          .agg(count(when(col("frac") > 0, 1)).as("nf"),
            count(when(col("frac") >= 0.5, 1)).as("nh"),
            count(lit(1)).as("n"))
          .select(col("nf"), col("nh"),
            round(col("nf").cast("double") / col("n").cast("double"), 6))
          .collect()(0)
        (nm, r.getLong(0), r.getLong(1), r.getDouble(2))
      }
      assert(got == exp, s"report diverged\n got: $got\n exp: $exp")
    }
    // a CLEAN suite (disjoint vocabulary) must report a zeros row, not
    // vanish — "missing" and "uncontaminated" are different findings
    val train = (0L until 10L).map(i =>
      (i, "aa bb cc dd ee ff gg hh ii")).toDF("doc_id", "text")
    val clean = Seq(Tuple1("zz yy xx ww vv uu tt ss rr")).toDF("text")
    val r = CorpusOps.contaminationReport(train,
        Seq("clean" -> clean), "doc_id", "text", n = 8)
      .collect()
    assert(r.length == 1 && r(0).getLong(1) == 0L &&
      r(0).getLong(2) == 0L && r(0).getDouble(3) == 0.0,
      s"clean suite must report zeros, got ${r.toSeq}")
  }

  test("packingEfficiency: hand-computed wastes, power-of-two guard") {
    import org.apache.spark.sql.functions.col
    // source a: docs of 3, 2, 4 tokens at ctx=4:
    //   padded: ceil(3/4)+ceil(2/4)+ceil(4/4) = 3 chunks, waste 12-9=3
    //   packed: ceil(9/4) = 3 chunks, waste 3 (equal here by chance)
    // source b: 5 docs of 1 token:
    //   padded: 5 chunks, waste 15; packed: 2 chunks, waste 3
    val docs = Seq(
      (1L, "a", "x y z"), (2L, "a", "x y"), (3L, "a", "w x y z"),
      (4L, "b", "q"), (5L, "b", "q"), (6L, "b", "q"), (7L, "b", "q"),
      (8L, "b", "q")).toDF("doc_id", "source", "text")
    val r = CorpusOps.packingEfficiency(docs, "text", "source", ctxLen = 4)
      .orderBy("source").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5), x.getLong(6))).toSeq
    assert(r == Seq(
      ("a", 3L, 9L, 3L, 3L, 3L, 3L),
      ("b", 5L, 5L, 5L, 2L, 15L, 3L)), s"got $r")
    intercept[IllegalArgumentException] {
      CorpusOps.packingEfficiency(docs, "text", "source", ctxLen = 48)
    }
  }

  test("contaminationReport equals aggregated contaminationScore per suite") {
    import org.apache.spark.sql.functions.{col, count, lit, round, when}
    val train = (0L until 30L).map(i =>
      (i, s"w$i a b c d e f g h i$i j k l m n o p")).toDF("doc_id", "text")
    val suiteA = train.where("doc_id % 4 = 0").select(col("text"))
    val suiteB = train.where("doc_id % 9 = 0")
      .select(org.apache.spark.sql.functions.concat(col("text"), lit(" zz"))
        .as("text"))
    val got = CorpusOps.contaminationReport(train,
        Seq("a" -> suiteA, "b" -> suiteB), "doc_id", "text", n = 8)
      .orderBy("suite").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    val expected = Seq("a" -> suiteA, "b" -> suiteB).map { case (nm, t) =>
      val r = CorpusOps.contaminationScore(train, t, "doc_id", "text", n = 8)
        .agg(count(when(col("frac") > 0, 1)).as("nf"),
          count(when(col("frac") >= 0.5, 1)).as("nh"),
          count(lit(1)).as("n"))
        .select(col("nf"), col("nh"),
          round(col("nf").cast("double") / col("n").cast("double"), 6))
        .collect()(0)
      (nm, r.getLong(0), r.getLong(1), r.getDouble(2))
    }
    assert(got == expected,
      s"one-pass report must equal per-suite scores\n got: $got\n exp: $expected")
    intercept[IllegalArgumentException] {
      CorpusOps.contaminationReport(train, Seq.empty, "doc_id", "text")
    }
  }

  test("dsirHistogram: folding per-batch histograms equals one full train") {
    import org.apache.spark.sql.functions.{col, sum}
    val docs = ((0L until 60L).map(i => (i, "en", "the quick brown fox")) ++
      (100L until 160L).map(i => (i, "xx", "lorem ipsum dolor sit")))
      .toDF("doc_id", "lang", "text")
    val full = CorpusOps.dsirDeltas(docs, "text", col("lang") === "en")
    def hist(p: String) = CorpusOps.dsirHistogram(
      docs.where(p).repartition(3), "text", col("lang") === "en")
    val folded = hist("doc_id % 3 = 0")
      .unionByName(hist("doc_id % 3 = 1"))
      .unionByName(hist("doc_id % 3 = 2"))
      .groupBy("bucket")
      .agg(sum("n_raw").as("n_raw"), sum("n_target").as("n_target"))
    val inc = CorpusOps.dsirDeltasFromHistogram(folded, 256)
    assert(inc.toSeq == full.toSeq,
      "histogram fold must reproduce the full-train deltas bitwise")
    // the histogram itself is the bounded persistable artifact
    assert(CorpusOps.dsirHistogram(docs, "text", col("lang") === "en")
      .count() <= 256)
  }

  test("bpeSegmentStats: applies merges in learned order, exact fertility") {
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, "en", "aaab aaab ab"), (2L, "en", "aaab ab"),
      (3L, "fr", "cd cd")).toDF("doc_id", "lang", "text")
    // with no merges, every word splits to characters
    val none = CorpusOps.bpeSegmentStats(docs, "lang", "text", Seq.empty)
      .orderBy("lang").collect()
    assert(none.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))).toSeq ==
      Seq(("en", 5L, 16L, 3.2), ("fr", 2L, 4L, 2.0)))
    // the full learned chain from the sibling trainer collapses the en
    // vocabulary to single symbols: |a|a|a|b| -(a,a)-> |aa|a|b|
    // -(a,b)-> |aa|ab| -(aa,ab)-> |aaab|
    val merges = Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    val full = CorpusOps.bpeSegmentStats(docs, "lang", "text", merges)
      .orderBy("lang").collect()
    assert(full.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))).toSeq ==
      Seq(("en", 5L, 5L, 1.0), ("fr", 2L, 4L, 2.0)),
      "merges must apply in order and only to matching symbols")
    // order matters: applying (aa,ab) FIRST is a no-op on unmerged text
    val wrongOrder = CorpusOps.bpeSegmentStats(docs, "lang", "text",
      Seq(("aa", "ab"))).where(col("lang") === "en").collect()(0)
    assert(wrongOrder.getLong(2) == 16L,
      "a merge over never-built symbols must not fire")
    // Sennrich parity on back-to-back NON-overlapping repeats: 'banana'
    // + (a,n) must merge BOTH occurrences → b,an,an,a (4 symbols). A
    // single-delimiter encoding under-merges here because adjacent
    // matches share the delimiter character.
    val banana = CorpusOps.bpeSegmentStats(
      Seq((1L, "xx", "banana")).toDF("doc_id", "lang", "text"),
      "lang", "text", Seq(("a", "n"))).collect()(0)
    assert(banana.getLong(2) == 4L,
      s"'banana' + (a,n) must yield 4 symbols (b,an,an,a), got ${banana.getLong(2)}")
    // ...while OVERLAPPING repeats stay greedy-first-only: 'aaa' + (a,a)
    val aaa = CorpusOps.bpeSegmentStats(
      Seq((1L, "xx", "aaa")).toDF("doc_id", "lang", "text"),
      "lang", "text", Seq(("a", "a"))).collect()(0)
    assert(aaa.getLong(2) == 2L,
      s"'aaa' + (a,a) must yield 2 symbols (aa,a), got ${aaa.getLong(2)}")
  }

  test("splitRepair: clusters co-split, reps keep theirs, non-members untouched, idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = (0L until 400L).map(i => (i, s"document number $i body text"))
      .toDF("doc_id", "text")
    val assigned = CorpusOps.splitAssign(docs, col("text"))
    // synthetic near-dup components: {0,1,2}, {10,11}; labels are min ids
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("id_a", "id_b")
    val comps = graft.ops.DedupOps.connectedComponents(pairs)
    val repaired = CorpusOps.splitRepair(assigned, "doc_id", "split", comps)
    val before = assigned.select("doc_id", "split").as[(Long, String)].collect().toMap
    val after = repaired.select("doc_id", "split").as[(Long, String)].collect().toMap
    // every cluster member lands on its representative's ORIGINAL split
    for ((members, rep) <- Seq(Seq(0L, 1L, 2L) -> 0L, Seq(10L, 11L) -> 10L);
         m <- members)
      assert(after(m) == before(rep), s"member $m must take rep $rep's split")
    // non-members keep their assignment bit for bit
    val memberIds = Set(0L, 1L, 2L, 10L, 11L)
    assert(before.forall { case (id, s) => memberIds(id) || after(id) == s })
    // the moved flag counts exactly the members whose split changed
    val movedIds = repaired.where(col("moved") === 1L)
      .select("doc_id").as[Long].collect().toSet
    assert(movedIds == memberIds.filter(id => after(id) != before(id)))
    // idempotent: repairing the repaired assignment moves nothing
    val again = CorpusOps.splitRepair(
      repaired.select("doc_id", "text", "split"), "doc_id", "split", comps)
    assert(again.where(col("moved") === 1L).count() == 0L)
    // guard: the split column must exist
    intercept[IllegalArgumentException] {
      CorpusOps.splitRepair(docs, "doc_id", "split", comps)
    }
    // end-to-end with REAL near-dups: after repair, no minhash pair
    // straddles splits (the d106 leak, closed)
    val corpus = SparkEntry.corpusWithNearDups(spark, "/root/testdata/sf0.001")
    val realAssigned = CorpusOps.splitAssign(corpus, col("text"))
    val realPairs = graft.ops.DedupOps.minhashLshPairs(corpus, "doc_id", "text",
      bands = 8, rowsPerBand = 4, shingleN = 3, threshold = 0.7)
      .select("id_a", "id_b")
    val realComps = graft.ops.DedupOps.connectedComponents(realPairs)
    val realRepaired = CorpusOps.splitRepair(realAssigned, "doc_id", "split", realComps)
    val splitOf = realRepaired.select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    val straddling = realPairs.as[(Long, Long)].collect()
      .filter { case (a, b) => splitOf(a) != splitOf(b) }
    assert(straddling.isEmpty,
      s"near-dup pairs still straddle splits after repair: ${straddling.take(5).toSeq}")
    assert(realRepaired.where(col("moved") === 1L).count() > 0L,
      "planted mutants must force at least one move")
  }

  test("shuffleShards: deterministic permutation, dense per-shard positions, no global sort") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val a = graft.ops.CorpusOps.shuffleShards(docs, "doc_id", "s1", 8)
    val b = graft.ops.CorpusOps.shuffleShards(docs, "doc_id", "s1", 8)
    assert(a.collect().toSet == b.collect().toSet)                 // reproducible
    val rows = a.select("shard", "pos", "doc_id").as[(Int, Long, Long)].collect()
    assert(rows.length == 200 && rows.map(_._3).distinct.length == 200)
    assert(rows.map(_._1).forall(s => s >= 0 && s < 8))
    rows.groupBy(_._1).foreach { case (_, rs) =>                   // dense 1..n per shard
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq)
    }
    val c = graft.ops.CorpusOps.shuffleShards(docs, "doc_id", "s2", 8)
    assert(a.collect().toSet != c.collect().toSet)                 // new seed, new layout
    val plan = a.queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"), "must not global-sort")
  }

  test("shuffleShards: uniform occupancy at 4,096 shards (widened key space)") {
    import spark.implicits._
    // the four-nibble key space must spread 100k ids over 4,096 shards
    // with Poisson-like occupancy (λ≈24.4): every shard hit, no hot shard
    val docs = spark.range(100000L).toDF("doc_id")
    val counts = graft.ops.CorpusOps.shuffleShards(docs, "doc_id", "u1", 4096)
      .groupBy("shard").count().as[(Int, Long)].collect()
    assert(counts.length == 4096, s"only ${counts.length}/4096 shards occupied")
    val max = counts.map(_._2).max
    assert(max <= 60L, s"hot shard: $max docs vs λ≈24.4")
    // cap honored loudly
    val e = intercept[IllegalArgumentException] {
      graft.ops.CorpusOps.shuffleShards(docs, "doc_id", "u1", 65537)
    }
    assert(e.getMessage.contains("65536"))
  }

  test("resampleMix: exact copy counts per weight, map-only plan") {
    import spark.implicits._
    val docs = (0L until 400L).map(i => (i, if (i % 2 == 0) "up" else "down"))
      .toDF("doc_id", "source")
    val out = graft.ops.CorpusOps.resampleMix(docs, "doc_id", "source",
      Map("up" -> 2.25, "down" -> 0.5), 1.0, "s")
    val counts = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(counts("up") >= 2 * 200 && counts("up") <= 3 * 200)
    assert(counts("down") < 200 && counts("down") > 0)
    // every doc's copies are 0..k-1 with no gaps
    val copies = out.select("doc_id", "copy").as[(Long, Long)].collect()
      .groupBy(_._1).values
    copies.foreach(cs => assert(cs.map(_._2).sorted.toSeq == (0L until cs.size).toSeq))
    // weight 0 drops, weight 1 with frac 0 keeps exactly once
    val once = graft.ops.CorpusOps.resampleMix(docs, "doc_id", "source",
      Map("up" -> 0.0), 1.0, "s")
    assert(once.where($"source" === "up").count() == 0)
    assert(once.where($"source" === "down").count() == 200)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "resample must be map-only")
  }

  test("tfidfKeywords: integer-exact ranking, standard score reported") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "apple date date date")).toDF("doc_id", "text")
    val out = graft.ops.CorpusOps.tfidfKeywords(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank")
      .as[(Long, Int, String, Long, Long, Double)].collect().toSeq
    // df: apple 2, banana 2, cherry 1, date 1; N = 3
    assert(out.map(r => (r._1, r._2, r._3, r._4, r._5)) == Seq(
      (1L, 1, "apple", 2L, 2L), (1L, 2, "banana", 1L, 2L),
      (2L, 1, "cherry", 1L, 1L), (2L, 2, "banana", 1L, 2L),
      (3L, 1, "date", 3L, 1L), (3L, 2, "apple", 1L, 2L)))
    val byKey = out.map(r => (r._1, r._3) -> r._6).toMap
    assert(math.abs(byKey((1L, "apple")) - 2 * math.log(3.0 / 2)) < 1e-5)
    assert(math.abs(byKey((3L, "date")) - 3 * math.log(3.0)) < 1e-5)
  }

  test("lmQualityScore: self-trained trigram LM, short docs null, model broadcast") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa"), (2L, "aaab"), (3L, "ab")).toDF("doc_id", "text")
    val out = graft.ops.TextOps.lmQualityScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // model: aaa -> 3, aab -> 1; total 4
    assert(out(0).getLong(1) == 2 &&
      math.abs(out(0).getDouble(2) - math.log(3.0 / 4)) < 1e-5)
    assert(out(1).getLong(1) == 2 &&
      math.abs(out(1).getDouble(2) - (math.log(3.0 / 4) + math.log(1.0 / 4)) / 2) < 1e-5)
    assert(out(2).getLong(1) == 0 && out(2).isNullAt(2))
    val plan = graft.ops.TextOps.lmQualityScore(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "model must join broadcast")
  }

  test("dedupLines keeps first occurrence, preserves order and empty lines, never drops docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "boiler\nalpha\n\nbeta"),   // first bearer of "boiler", has an empty line
      (2L, "boiler\ngamma"),             // loses the boilerplate, keeps its body
      (3L, "boiler")                      // ALL content is boilerplate: empty doc, kept
    ).toDF("doc_id", "text")
    val out = graft.ops.CorpusOps.dedupLines(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "boiler\nalpha\n\nbeta", 4L, 0L),
      (2L, "gamma", 1L, 1L),
      (3L, "", 0L, 1L)))
  }

  test("dedupLines: string doc ids dedup correctly (no silent null-key loss)") {
    // an arithmetic id*1e6+idx key casts string ids to NULL and drops
    // every content line; the struct key orders any id type
    val docs = Seq(
      ("alpha", "boiler\nkeep-a"),
      ("beta", "boiler\nkeep-b")).toDF("doc_id", "text")
    val out = CorpusOps.dedupLines(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("alpha", "boiler\nkeep-a", 0L),
      ("beta", "keep-b", 1L)))
  }

  test("dedupLines: a >1e6-line document does not bleed into the next id's key space") {
    // packed keys collide here: (id=1, idx=1000002) and (id=2, idx=2)
    // both packed to 2000002 — first-bearer attribution went to BOTH;
    // the lexicographic struct key keeps doc 1's copy and drops doc 2's
    val big = (1 to 1000010)
      .map(i => if (i == 1000002) "shared-line" else s"u$i").mkString("\n")
    val docs = Seq((1L, big), (2L, "other\nshared-line\nmore")).toDF("doc_id", "text")
    val out = CorpusOps.dedupLines(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 1000010L, 0L), (2L, 2L, 1L)))
  }

  test("corpusDiff classifies added/removed/changed; unchanged dropped by default") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val neu = Seq((1L, "a"), (2L, "B2"), (4L, "d")).toDF("doc_id", "text")
    val got = CorpusOps.corpusDiff(old, neu, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(got == Seq((2L, "changed"), (3L, "removed"), (4L, "added")))
    val all = CorpusOps.corpusDiff(old, neu, "doc_id", "text",
        includeUnchanged = true)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(all == Seq((1L, "unchanged"), (2L, "changed"),
      (3L, "removed"), (4L, "added")))
    // the diff plan shuffles hashes, not documents: no text column
    // survives past the scans
    val plan = CorpusOps.corpusDiff(old, neu, "doc_id", "text")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("text#") ||
      plan.indexOf("md5") < plan.indexOf("Join"),
      s"text must reduce to md5 before the join:\n$plan")
  }

  test("removeBoilerplate: shared sentences drop everywhere, order kept, all-boiler docs go empty") {
    val footer = "All rights reserved."
    val df = Seq(
      (1L, s"Unique alpha. $footer Unique beta."),
      (2L, s"$footer Unique gamma."),
      (3L, s"Unique delta."),
      (4L, footer)) // nothing but boilerplate
      .toDF("doc_id", "text")
    val got = CorpusOps.removeBoilerplate(df, "doc_id", "text", maxDocs = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got(1L) == ("Unique alpha. Unique beta.", 1L), "middle sentence cut, order kept")
    assert(got(2L) == ("Unique gamma.", 1L))
    assert(got(3L) == ("Unique delta.", 0L), "clean doc untouched")
    assert(got(4L) == ("", 1L), "all-boilerplate doc survives as an empty row")
    // below the bar nothing drops
    val loose = CorpusOps.removeBoilerplate(df, "doc_id", "text", maxDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(loose.values.forall(_ == 0L))
  }

  test("temperatureMix: equals the global (md5, id) rank cut; flattens the head; T=1 natural") {
    // 3 strata with a dominant head: 64 / 16 / 4 docs
    val rows = (0 until 64).map(i => (i.toLong, "big", s"doc big $i")) ++
      (0 until 16).map(i => (100L + i, "mid", s"doc mid $i")) ++
      (0 until 4).map(i => (200L + i, "small", s"doc small $i"))
    val df = rows.toDF("doc_id", "lang", "text")
    val got = CorpusOps.temperatureMix(df, "doc_id", "lang", "text",
      totalBudget = 30L, temperature = 2.0)
    // reference: integer sqrt weights 8/4/2 (tot 14) -> budgets
    // floor(30*8/14)=17, floor(30*4/14)=8, floor(30*2/14)=4
    val perLang = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang == Map("big" -> 17L, "mid" -> 8L, "small" -> 4L))
    // selection = the budget's smallest (md5(text), doc_id) per stratum —
    // replay with a plain window over the same keys
    val expected = df
      .withColumn("__h", md5(col("text").cast("binary")))
      .withColumn("__rk", row_number().over(
        Window.partitionBy("lang").orderBy(col("__h"), col("doc_id"))))
      .withColumn("__b", when(col("lang") === "big", 17)
        .when(col("lang") === "mid", 8).otherwise(4))
      .where(col("__rk") <= col("__b"))
      .select("doc_id").as[Long].collect().toSet
    assert(got.select("doc_id").as[Long].collect().toSet == expected)
    // T=1 keeps the natural ratio: integer weights 64/16/4 (tot 84)
    val nat = CorpusOps.temperatureMix(df, "doc_id", "lang", "text",
        totalBudget = 42L, temperature = 1.0)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(nat == Map("big" -> 32L, "mid" -> 8L, "small" -> 2L))
  }

  test("vocabCoverage: OOV counting, duplicate vocab tokens don't inflate") {
    val docs = Seq(
      ("en", "a b a c"),   // 4 tokens: a,b in vocab -> 1 oov (c)
      ("fr", "x a"))       // 2 tokens: a in vocab  -> 1 oov (x)
      .toDF("lang", "text")
    val vocab = Seq("a", "b", "a").toDF("token") // deliberate duplicate
    val r = CorpusOps.vocabCoverage(docs, "lang", "text", vocab, "token")
      .collect().map(x => x.getAs[String]("lang") ->
        (x.getAs[Long]("n_tokens"), x.getAs[Long]("n_oov"),
          x.getAs[Double]("oov_rate"))).toMap
    assert(r("en") == ((4L, 1L, 0.25)))
    assert(r("fr") == ((2L, 1L, 0.5)))
  }

  test("temperatureMix: two-phase selection equals the single-window reference on a random corpus") {
    // deterministic pseudo-random corpus: 4 strata of very different
    // sizes, duplicate texts (md5 ties -> id tiebreak), one null text
    val rows = (1 to 800).map { i =>
      val lang = if (i % 11 == 0) "de" else if (i % 5 == 0) "fr"
        else if (i % 2 == 0) "en" else "es"
      val text = if (i == 400) null
        else s"w${(i * 2654435761L) % 97} x${(i * 40503L) % 13}" // collisions
      (i.toLong, lang, text)
    }
    val docs = rows.toDF("doc_id", "lang", "text")
    for (budget <- Seq(0L, 5L, 37L, 200L, 10000L)) {
      val got = CorpusOps.temperatureMix(docs, "doc_id", "lang", "text",
        totalBudget = budget, temperature = 2.0)
        .select("doc_id").as[Long].collect().toSet
      // reference: per-stratum integer budgets + a single global window
      val clean = docs.where(col("text").isNotNull)
      val n = clean.groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val w = n.map { case (k, c) => k -> math.floor(math.sqrt(c.toDouble)).toLong }
      val tot = w.values.sum
      val b = w.map { case (k, x) => k -> (if (tot == 0) 0L else budget * x / tot) }
      val bCol = b.foldLeft(lit(-1L)) { case (acc, (k, v)) =>
        when(col("lang") === k, lit(v)).otherwise(acc) }
      val want = clean
        .withColumn("__h", md5(col("text").cast("binary")))
        .withColumn("__rk", row_number().over(
          Window.partitionBy("lang").orderBy(col("__h"), col("doc_id"))))
        .where(col("__rk") <= bCol)
        .select("doc_id").as[Long].collect().toSet
      assert(got == want, s"budget=$budget: two-phase != window reference")
    }
  }

  test("corpusCard: dup accounting, histogram-derived totals, null text excluded everywhere") {
    val df = Seq(
      (1L, "en", "a b c"), (2L, "en", "a b c"), // exact-dup pair
      (3L, "en", "d e"), (4L, "fr", "x y z w"),
      (5L, "fr", null.asInstanceOf[String])     // must not count anywhere
    ).toDF("doc_id", "lang", "text")
    val card = CorpusOps.corpusCard(df, "lang", "text")
      .collect().map(r => r.getAs[String]("lang") -> r).toMap
    assert(card.size == 2)
    val en = card("en")
    assert(en.getAs[Long]("n_docs") == 3L)
    assert(en.getAs[Long]("n_dup_docs") == 1L)
    assert(en.getAs[Long]("n_tokens") == 8L)
    assert(en.getAs[Long]("p50") == 3L)
    val fr = card("fr")
    assert(fr.getAs[Long]("n_docs") == 1L)
    assert(fr.getAs[Long]("n_dup_docs") == 0L)
    assert(fr.getAs[Long]("n_tokens") == 4L)
    assert(fr.getAs[Long]("p95") == 4L)
  }

  test("groupQuantiles: inverted-CDF percentiles match a plain-Scala reference; nulls excluded") {
    // deterministic skewed values with repeats
    val rows = for (g <- Seq("a", "b"); i <- 1 to 37)
      yield (g, java.lang.Long.valueOf(((i * i * 7 + g.hashCode.abs) % 23).toLong))
    val withNulls = rows ++ Seq(("a", null.asInstanceOf[java.lang.Long]),
      ("b", null.asInstanceOf[java.lang.Long]))
    val df = withNulls.toDF("g", "v")
    val ps = Seq(1, 50, 90, 99, 100)
    val got = CorpusOps.groupQuantiles(df, "g", col("v"), ps)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), ps.indices.map(i => r.getLong(2 + i))))
      .toMap
    // reference: p-th percentile = sorted(ceil(total*p/100) - 1)
    val byG = rows.groupBy(_._1).view.mapValues(_.map(_._2.longValue).sorted)
    for ((g, vs) <- byG) {
      val (n, qs) = got(g)
      assert(n == vs.size, s"null rows must not count for $g")
      for ((p, q) <- ps.zip(qs)) {
        val want = vs((vs.size * p + 99) / 100 - 1)
        assert(q == want, s"group $g p$p: got $q want $want")
      }
    }
    // the percentile window runs over the histogram, not the input: the
    // aggregate below the window must be the (group, value) count, and
    // the only exchanges are the histogram partial/final and the window's
    // re-key — the final percentile group-by reuses the window's
    // partitioning on the group
    val q = CorpusOps.groupQuantiles(df, "g", col("v"), ps)
    assert(q.queryExecution.optimizedPlan.toString.contains("Window"))
    // string count: AQE wraps the tree, hiding Exchange nodes from collect
    val planStr = q.queryExecution.executedPlan.toString
    val nShuffles = "Exchange hashpartitioning".r.findAllIn(planStr).size
    assert(nShuffles == 2,
      s"histogram + window exchanges only:\n$planStr")
  }
}
