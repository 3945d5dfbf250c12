package graft

import graft.ops._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** LLM-pipeline operators: text analysis, dedup (exact/minhash/simhash/
  * embedding), ANN search — verified against constructed ground truth and
  * the driver's real testdata. */
class OpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("text ops: token/punct/quality/lang on knowns") {
    val df = Seq(
      (1L, "The quick brown fox, and the lazy dog. It is a test of the system."),
      (2L, ""),
      (3L, "le chat est sur la table et le chien est la"),
      (4L, "der hund ist ein guter hund und die katze ist da"),
      (5L, "!!! ??? ...")).toDF("id", "text")
    val r = df.select($"id",
      TextOps.tokenCount($"text").as("toks"),
      TextOps.punctCount($"text").as("punct"),
      TextOps.langId($"text").as("lang"),
      TextOps.qualityScore($"text").as("q"))
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getInt(1) == 15)
    assert(r(1L).getInt(2) == 3)
    assert(r(1L).getString(3) == "en")
    assert(r(2L).getInt(1) == 0)
    assert(r(2L).getString(3) == "und")
    assert(r(3L).getString(3) == "fr")
    assert(r(4L).getString(3) == "de")
    assert(r(1L).getInt(4) >= 3) // clean english sentence scores high
    assert(r(5L).getInt(4) <= 1) // punctuation soup scores low
  }

  test("normalizeText: markup, controls, NFC, whitespace, idempotence") {
    val df = Seq(
      (1L, "a \u0000 <b>bold</b>\ttext here"),          // NUL + tag + tab
      (2L, "zero\u200Bwidth and cafe\u0301 accents"),  // Cf + decomposed
      (3L, "  already clean  "),
      (4L, "caf\u00e9")                                 // precomposed stays
    ).toDF("id", "text")
    val out = df.select($"id", TextOps.normalizeText($"text").as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "a bold text here")
    // ZWSP is a word-JOINER in display but we conservatively break tokens
    assert(out(2L) == "zero width and caf\u00e9 accents")
    assert(out(2L).contains("caf\u00e9") && !out(2L).contains("\u0301"))
    assert(out(3L) == "already clean")
    assert(out(4L) == "caf\u00e9")
    // idempotent: a normalized corpus re-normalizes to itself
    val once = df.select(TextOps.normalizeText($"text").as("t"))
    val twice = once.select(TextOps.normalizeText($"t").as("t"))
    assert(once.collect().map(_.getString(0)).toSeq ==
      twice.collect().map(_.getString(0)).toSeq)
    // lowercase + no-markup-strip variants
    val v = df.where($"id" === 1L).select(
      TextOps.normalizeText($"text", stripMarkup = false, lowercase = true))
      .collect().head.getString(0)
    assert(v == "a <b>bold</b> text here")
  }

  test("classifierScore: linear margin over tokens, case-folded, map-only") {
    val w = Map("the" -> 0.25, "cat" -> 0.5, "bad" -> -1.0)
    val df = Seq(
      (1L, "The cat sat on the mat"),   // 0.25 + 0.5 + 0.25 = 1.0
      (2L, "BAD bad Bad"),              // -3.0
      (3L, ""),                         // bias only
      (4L, "nothing matches here")      // bias only
    ).toDF("id", "text")
    val got = df.select($"id", TextOps.classifierScore($"text", w, bias = -0.5))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 0.5, 2L -> -3.5, 3L -> -0.5, 4L -> -0.5))
    // vocab keys are case-folded too
    val got2 = df.where($"id" === 1L)
      .select(TextOps.classifierScore($"text", Map("THE" -> 1.0)))
      .collect().head.getDouble(0)
    assert(got2 == 2.0)
  }

  test("fingerprint: deterministic, content-sensitive") {
    val df = Seq((1L, "hello world"), (2L, "hello world"), (3L, "hello worle")).toDF("id", "text")
    val fps = df.select(TextOps.fingerprint($"text")).collect().map(_.getLong(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("exact dedup keeps min-id winner per duplicate group") {
    val df = Seq((10L, "aaa"), (3L, "aaa"), (7L, "bbb"), (1L, "ccc"), (9L, "ccc"))
      .toDF("doc_id", "text")
    val winners = DedupOps.exactDedupRows(df, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(winners == Seq(1L, 3L, 7L))
    val counts = DedupOps.exactDedup(df, "doc_id", "text")
      .select("doc_id", "dup_count").as[(Long, Long)].collect().toMap
    assert(counts(3L) == 2 && counts(7L) == 1 && counts(1L) == 2)
  }

  test("duplicate spans: keep-first cross-doc and intra-doc, islands merge, clean docs zero") {
    val df = Seq(
      (1L, "a b c d e f"),            // original — all its grams are firsts
      (2L, "x y a b c d z"),          // contains doc1's "a b c","b c d" → span [3,6]
      (3L, "a b c a b c a b c"),      // p1 dups doc1; p4..p7 dup its own p1..p3 → all covered
      (4L, "p q r")                   // shorter than w: no grams, clean
    ).toDF("doc_id", "text")
    val stats = DedupOps.duplicateSpanStats(df, "doc_id", "text", w = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(stats == Seq(
      (1L, 6L, 0L, 0L, 0.0),
      (2L, 7L, 4L, 1L, 4.0 / 7),
      (3L, 9L, 9L, 1L, 1.0),
      (4L, 3L, 0L, 0L, 0.0)))
    val cut = DedupOps.removeDuplicateSpans(df, "doc_id", "text", w = 3)
      .orderBy("doc_id")
      .select("doc_id", "text", "n_tokens_kept")
      .as[(Long, String, Long)].collect().toSeq
    assert(cut == Seq(
      (1L, "a b c d e f", 6L),
      (2L, "x y z", 3L),
      (3L, "", 0L),
      (4L, "p q r", 3L)))
    val plan = DedupOps.duplicateSpanStats(df, "doc_id", "text", w = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning") && !plan.contains("Cartesian"))
  }

  test("native minhash signature is bit-exact with the composed HOF form") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(200)
      .select($"doc_id", DedupOps.shingles($"text", 3).as("sh"))
    val k = 32
    // the HOF reference form the native expression replaced
    val hof = aggregate($"sh",
      array_repeat(lit(Long.MaxValue), k),
      (acc, s) => zip_with(acc,
        transform(sequence(lit(1), lit(k)), i => xxhash64(s, i)),
        (a, h) => least(a, h)))
    val diff = docs
      .select($"doc_id", DedupOps.minhashSignature($"sh", k).as("native"), hof.as("ref"))
      .where(not($"native" <=> $"ref".cast("array<bigint>")))
      .count()
    assert(diff == 0)
  }

  test("native positional gram hashes are bit-exact with the composed HOF form") {
    val w = 3
    val edge = Seq((9000001L, ""), (9000002L, "   "), (9000003L, "a b"),
      (9000004L, "a b c"), (9000005L, "  x\ty \n z  w ")).toDF("doc_id", "text")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(200)
      .select($"doc_id", $"text").unionByName(edge)
    val toks = TextOps.tokens($"text")
    // the HOF reference form the native expression replaced (hex md5 string)
    val hof = when(size(toks) >= w,
      transform(sequence(lit(1), size(toks) - w + 1),
        i => struct(i.as("p"),
          md5(concat_ws(" ", slice(toks, i, lit(w))).cast("binary")).as("h"))))
      .otherwise(array().cast("array<struct<p:int,h:string>>"))
    val native = graft.functions.GraftFunctions.positional_gram_hashes($"text", w)
    val diff = docs
      .select(
        transform(native, g => struct(g.getField("p").as("p"),
          lower(hex(g.getField("h"))).as("h"))).as("native"),
        hof.as("ref"))
      .where(not($"native" <=> $"ref")).count()
    assert(diff == 0)
  }

  test("native char trigrams are codepoint-exact (incl. surrogate pairs)") {
    val edge = Seq((9000001L, ""), (9000002L, "ab"), (9000003L, "abc"),
      (9000004L, "abcd"),
      (9000005L, "a😀b😁"), // 😀/😁: 4 codepoints → 2 trigrams
      (9000006L, "héllo wörld")).toDF("doc_id", "text")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(200)
      .select($"doc_id", $"text").unionByName(edge)
    // the substring-per-position reference form the native expression replaced
    val hof = when(length($"text") >= 3,
      transform(sequence(lit(1), length($"text") - 2),
        i => substring($"text", i, lit(3))))
      .otherwise(array().cast("array<string>"))
    val diff = docs
      .select(TextOps.charTrigrams($"text").as("native"), hof.as("ref"))
      .where(not($"native" <=> $"ref")).count()
    assert(diff == 0)
    val emoji = docs.where($"doc_id" === 9000005L)
      .select(TextOps.charTrigrams($"text")).as[Seq[String]].head()
    assert(emoji == Seq("a😀b", "😀b😁"))
  }

  test("semanticDedup: identical-direction dups dropped in-cluster, orthogonal rows survive") {
    val rows = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(2f, 0f, 0f, 0f)),   // same direction as 1 → dropped (larger id)
      (3L, Array(0f, 1f, 0f, 0f)),
      (4L, Array(0f, 2f, 0f, 0f)),   // same direction as 3 → dropped
      (5L, Array(0f, 0f, 1f, 0f)),   // unique
      (6L, Array(0f, 0f, 0f, 1f)))   // unique
      .toDF("vec_id", "embedding")
    val out = DedupOps.semanticDedup(rows, "vec_id", "embedding",
        kClusters = 3, threshold = 0.99, trainSample = 10)
      .orderBy("vec_id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L), (3L, 1L), (5L, 0L), (6L, 0L)))
  }

  test("connected components: chain, triangle, pair; dedup keeps representatives") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21} (pair)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (21L, 20L)).toDF("id_a", "id_b")
    val cc = DedupOps.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))

    val docs = (Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L, 21L, 99L))
      .toDF("doc_id") // 99 is isolated: untouched by dedup
    val kept = DedupOps.dedupByClusters(docs, "doc_id", pairs)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 10L, 20L, 99L))
  }

  test("clusterRepresentatives keeps the best-quality member per cluster") {
    // {1,2,3}: quality peaks at 2; {10,11}: tie on quality -> min id wins
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val attrs = Seq((1L, 1L), (2L, 5L), (3L, 3L), (10L, 2L), (11L, 2L), (99L, 9L))
      .toDF("doc_id", "quality")
    val reps = DedupOps.clusterRepresentatives(pairs, attrs, "doc_id", "quality")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    // isolated 99 never enters the graph: clusters only
    assert(reps == Seq((1L, 2L, 5L, 3L), (10L, 10L, 2L, 2L)))
  }

  test("connectedComponents releases every cache entry it creates") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    def cachedCount: Int = {
      System.gc() // let the ContextCleaner reap dropped checkpoint blocks
      spark.sparkContext.getPersistentRDDs.size
    }
    val before = cachedCount
    for (_ <- 1 to 3) DedupOps.connectedComponents(pairs).count()
    // repeated calls must not pin cache entries for the context's
    // lifetime; the ContextCleaner reaps dropped checkpoint blocks
    // ASYNCHRONOUSLY, so poll instead of asserting a racy instant
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    var now = cachedCount
    while (now > before && System.nanoTime() < deadline) {
      Thread.sleep(200)
      now = cachedCount
    }
    assert(now <= before,
      s"cache grew from $before to $now persistent RDDs and stayed there")
  }

  test("connectedComponents survives a deep-diameter chain (lineage truncation)") {
    // a 40-node path graph: one-hop propagation alone would need ~40
    // rounds; pointer jumping doubles reach per round, so it must
    // converge within ~log2(40)+slack. Before per-round lineage
    // truncation the analyzed plan doubled per round (each round
    // references the previous labels frame twice) and a >10-round graph
    // OOM'd the DRIVER in Catalyst — found by m47's image-hash collision
    // chains, regression-locked here via the tight maxIter
    val chain = (0L until 39L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = DedupOps.connectedComponents(chain, maxIter = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size == 40 && cc.values.forall(_ == 0L),
      "the whole chain must collapse to component 0")
    // non-convergence is LOUD — silent capping would hand downstream
    // dedup labels that split one component into several
    val err = intercept[graft.InvalidDataError] {
      DedupOps.connectedComponents(chain, maxIter = 2).collect()
    }
    assert(err.getMessage.contains("did not converge"))
  }

  test("native simhash is bit-exact with the composed HOF form") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(200)
      .select($"doc_id", TextOps.tokens($"text").as("toks"))
    // the HOF reference form the native expression replaced
    val bitsums = aggregate($"toks",
      array_repeat(lit(0L), 64),
      (acc, t) => zip_with(acc,
        transform(sequence(lit(0), lit(63)),
          i => when(call_function("shiftright", xxhash64(t), i).bitwiseAND(1) === 1, 1L)
            .otherwise(-1L)),
        (x, y) => x + y))
    val hof = aggregate(
      zip_with(bitsums, sequence(lit(0), lit(63)),
        (s, i) => when(s > 0, call_function("shiftleft", lit(1L), i)).otherwise(0L)),
      lit(0L), (a, b) => a.bitwiseOR(b))
    val diff = docs
      .select(graft.functions.GraftFunctions.simhash64($"toks").as("native"), hof.as("ref"))
      .where(not($"native" <=> $"ref")).count()
    assert(diff == 0)
  }

  test("minhash LSH finds near-dups, skips unrelated; recall vs brute force") {
    val base = "spark shuffle partition join aggregate filter scan hash sort merge " +
      "broadcast exchange codegen stage task executor memory spill row column"
    val nearDup = base.replace("memory", "ram") // tiny edit
    val unrelated = "completely different words about cooking pasta tomatoes basil " +
      "garlic olive oil parmesan salt pepper onions recipe dinner kitchen stove pan"
    val docs = Seq((1L, base), (2L, nearDup), (3L, unrelated)).toDF("doc_id", "text")
    val pairs = DedupOps.minhashLshPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L))

    // recall check on real documents + synthesized dups
    val real = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").limit(40)
    val dups = real.select(($"doc_id" + 100000).as("doc_id"),
      // drop the last 2 tokens: still ≳90% shingle overlap for 150+ char docs
      concat_ws(" ", slice(split($"text", " "), lit(1),
        greatest(size(split($"text", " ")) - 2, lit(1)))).as("text"))
    val corpus = real.unionAll(dups)
    val truth = DedupOps.ngramJaccardPairs(corpus, "doc_id", "text",
        spark.range(40).select(col("id").as("id_a"), (col("id") + 100000).as("id_b")))
      .where($"jaccard" >= 0.7).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val found = DedupOps.minhashLshPairs(corpus, "doc_id", "text", threshold = 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty)
    val recall = truth.count(found.contains).toDouble / truth.size
    assert(recall >= 0.8, s"minhash recall $recall over ${truth.size} true pairs")
    // verification stage guarantees precision: every reported pair really has j>=0.7
    assert(found.subsetOf(
      DedupOps.ngramJaccardPairs(corpus, "doc_id", "text",
        found.toSeq.toDF("id_a", "id_b")).where($"jaccard" >= 0.7)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet))
  }

  test("fuzzyDecontaminate drops near-dup test leakage, keeps clean docs, broadcasts the test side") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"lang", $"text").limit(30)
    // test suite = mutated variants of docs 0..9 (drop last 2 tokens):
    // near-dups that exact-8-gram decon could miss on paraphrase
    val test = corpus.where($"doc_id" < 10).select(
      concat_ws(" ", slice(split($"text", " "), lit(1),
        greatest(size(split($"text", " ")) - 2, lit(1)))).as("text"))
    val cleaned = DedupOps.fuzzyDecontaminate(corpus, test, "doc_id", "text")
    val keptIds = cleaned.select("doc_id").as[Long].collect().toSet
    // ground truth by brute force
    val truthBad = DedupOps.ngramJaccardPairs(
        corpus.unionAll(test.select(lit(-1L).as("doc_id"), lit("xx").as("lang"), $"text")),
        "doc_id", "text",
        corpus.select($"doc_id".as("id_a")).crossJoin(
          test.select(lit(-1L).as("id_b"))).distinct())
      .where($"jaccard" >= 0.7).select("id_a").as[Long].collect().toSet
    assert(keptIds == corpus.select("doc_id").as[Long].collect().toSet -- truthBad,
      "cleaned corpus must equal brute-force ground truth")
    assert(truthBad.nonEmpty, "the planted mutations must actually contaminate")
    assert(cleaned.columns.toSeq == Seq("doc_id", "lang", "text"),
      "output keeps the corpus's own columns")
    // the corpus never shuffles: every join in the plan broadcasts
    val exchanges = cleaned.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size <= 2, // candidate distinct + bad-id distinct only
      s"corpus-side shuffles leaked into the plan:\n${cleaned.queryExecution.executedPlan}")
  }

  test("incrementalNearDup: batch dedups against accepted state, never re-hashing the corpus") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val accepted = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").where($"doc_id" < 20)
    val stateBands = DedupOps.bandSignatures(accepted, "doc_id", "text")
    // batch: 5 near-dup mutants of accepted docs + 5 fresh (unseen) docs
    val mutants = accepted.where($"doc_id" < 5).select(
      ($"doc_id" + 1000).as("doc_id"),
      concat_ws(" ", slice(split($"text", " "), lit(1),
        greatest(size(split($"text", " ")) - 2, lit(1)))).as("text"))
    val fresh = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").where($"doc_id" >= 30 && $"doc_id" < 35)
    val batch = mutants.unionAll(fresh)

    val (clean, newBands) = DedupOps.incrementalNearDup(
      batch, stateBands, accepted, "doc_id", "text")
    val kept = clean.select("doc_id").as[Long].collect().toSet

    // brute-force ground truth: batch doc is a dup iff j >= 0.7 vs ANY accepted
    val all = accepted.unionAll(batch)
    val pairs = batch.select($"doc_id".as("id_a"))
      .crossJoin(accepted.select($"doc_id".as("id_b")))
    val trueDups = DedupOps.ngramJaccardPairs(all, "doc_id", "text", pairs)
      .where($"jaccard" >= 0.7).select("id_a").as[Long].collect().toSet
    assert(trueDups.nonEmpty, "planted mutants must collide")
    assert(kept == batch.select("doc_id").as[Long].collect().toSet -- trueDups)
    assert(fresh.select("doc_id").as[Long].collect().toSet.subsetOf(kept),
      "fresh docs must always be accepted")
    // the state delta covers exactly the accepted batch docs, 8 bands each
    val bandCounts = newBands.groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    assert(bandCounts.keySet == kept && bandCounts.values.forall(_ == 8L))
    // plan shape: the accepted corpus rides broadcast joins only — the
    // sole shuffles are the two tiny candidate/dup-id distincts
    val exchanges = clean.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size <= 2,
      s"accepted-side shuffle leaked into the incremental plan:\n${clean.queryExecution.executedPlan}")
  }

  test("incrementalEmbeddingNearDup: scaled dups rejected, negated vectors accepted") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val sigs = DedupOps.embeddingSignatures(emb, "vec_id", "embedding", dim = 64)
    val dups = emb.where($"vec_id" < 5).select(($"vec_id" + 1000).as("vec_id"),
      transform($"embedding", x => x * lit(2.0f)).as("embedding"))
    val fresh = emb.where($"vec_id" >= 5 && $"vec_id" < 10)
      .select(($"vec_id" + 2000).as("vec_id"),
        transform($"embedding", x => -x).as("embedding"))
    val (clean, newSigs) = DedupOps.incrementalEmbeddingNearDup(
      dups.unionByName(fresh), sigs, emb, "vec_id", "embedding", dim = 64)
    val kept = clean.select("vec_id").as[Long].collect().toSet
    assert(kept == (2005L to 2009L).toSet,
      s"scaled copies are dups (cos=1), negated are novel (cos=-1); got $kept")
    assert(newSigs.select("id").as[Long].collect().toSet == kept)
  }

  test("incrementalEmbeddingNearDup multi-probe: full-radius probing equals brute force") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val sigs = DedupOps.embeddingSignatures(emb, "vec_id", "embedding", dim = 64)
    // perturbed copies: alternate +-8% per-coordinate scaling -> cosine is
    // high but below 1, so the signature can land a few bits away from
    // the source's bucket — exactly what multi-probe exists for
    val batch = emb.where($"vec_id" < 20).select(($"vec_id" + 5000).as("vec_id"),
      transform($"embedding", (x, i) =>
        x * (lit(1.0f) + lit(0.08f) * ((i % 2) * 2 - 1).cast("float")))
        .as("embedding"))
    // ground truth: brute-force max cosine vs the whole accepted corpus
    val trueDups = batch.as("b").crossJoin(emb.as("a"))
      .where(GraftFunctions.cosine_similarity($"a.embedding", $"b.embedding") >= 0.95)
      .select($"b.vec_id").as[Long].collect().toSet
    assert(trueDups.nonEmpty)
    // probeBits = nbits covers the whole code space -> provably brute force
    val (cleanFull, _) = DedupOps.incrementalEmbeddingNearDup(
      batch, sigs, emb, "vec_id", "embedding", dim = 64, nbits = 12,
      probeBits = 12)
    val keptFull = cleanFull.select("vec_id").as[Long].collect().toSet
    assert(keptFull == batch.select("vec_id").as[Long].collect().toSet -- trueDups,
      "full-radius multi-probe must equal brute force")
    // default probing never accepts MORE than the exact result allows
    // (precision is exact at any probe setting; probing affects recall only)
    val (cleanDefault, _) = DedupOps.incrementalEmbeddingNearDup(
      batch, sigs, emb, "vec_id", "embedding", dim = 64, nbits = 12)
    val keptDefault = cleanDefault.select("vec_id").as[Long].collect().toSet
    assert(keptFull.subsetOf(keptDefault),
      "fewer probes can only miss dups (accept more), never reject clean docs")
  }

  test("degenerate buckets are capped: 1k identical docs don't go quadratic") {
    // 1000 byte-identical documents hash to ONE band bucket in every band
    // (and one simhash chunk bucket, one hyperplane bucket). Uncapped that
    // is ~500k candidate pairs from boilerplate alone; the cap bounds it to
    // maxBucket²/2 while real near-dup corpora (small buckets) see no change.
    val boiler = (1L to 1000L).map(i => (i, "the same boilerplate footer text repeated"))
      .toDF("doc_id", "text")
    val cap = 20
    val mh = DedupOps.minhashLshPairs(boiler, "doc_id", "text", maxBucket = cap).count()
    assert(mh <= cap.toLong * (cap - 1) / 2, s"minhash pairs $mh exceed cap bound")
    assert(mh > 0) // the representatives are still linked
    val sh = DedupOps.simhashPairs(boiler, "doc_id", "text", maxBucket = cap).count()
    assert(sh <= cap.toLong * (cap - 1) / 2, s"simhash pairs $sh exceed cap bound")

    // the diagnostic reports what the cap dropped
    val banded = boiler.select($"doc_id", lit(0L).as("band_hash"))
    val over = DedupOps.oversizedBuckets(banded, Seq("band_hash"), cap).collect()
    assert(over.length == 1 && over.head.getLong(1) == 1000L)

    // normal (distinct) corpora are untouched by the cap
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text")
    val capped = DedupOps.minhashLshPairs(docs, "doc_id", "text").count()
    val uncapped = DedupOps.minhashLshPairs(docs, "doc_id", "text",
      maxBucket = Int.MaxValue).count()
    assert(capped == uncapped)
  }

  test("simhash: identical == ; near-dup within small hamming; pairs found") {
    val base = "spark shuffle partition join aggregate filter scan hash sort merge " +
      "broadcast exchange codegen stage task executor memory spill row column " +
      "driver cluster node rack disk network serializer buffer page batch"
    val df = Seq((1L, base), (2L, base), (3L, base + " extra"), (4L, "tiny doc"))
      .toDF("doc_id", "text")
    val sims = df.select($"doc_id", DedupOps.simhash($"text").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sims(1L) == sims(2L))
    assert(java.lang.Long.bitCount(sims(1L) ^ sims(3L)) <= 6)
    assert(java.lang.Long.bitCount(sims(1L) ^ sims(4L)) > 10)
    val pairs = DedupOps.simhashPairs(df, "doc_id", "text", maxHamming = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("embedding near-dup pairs via hyperplane LSH") {
    val v = Array.tabulate(8)(i => 1.0f / (i + 1))
    val near = v.clone(); near(7) = near(7) * 1.01f
    val far = Array.tabulate(8)(i => if (i % 2 == 0) -1.0f else 1.0f)
    val df = Seq((1L, v.toSeq), (2L, near.toSeq), (3L, far.toSeq)).toDF("id", "vec")
    val pairs = DedupOps.embeddingNearDupPairs(df, "id", "vec", dim = 8, nbits = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("brute-force top-k: self is rank 1; scores ordered") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.limit(3).select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val top = SimilarityOps.topKBruteForce(emb, "vec_id", "embedding",
      queries, "qid", "qvec", k = 5)
    val byQ = top.collect().groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 3)
    byQ.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.head.getAs[Long]("vec_id") == q) // self first (cosine 1)
      assert(sorted.head.getAs[Double]("cosine") > 0.9999)
      val sims = sorted.map(_.getAs[Double]("cosine"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("hard negatives: excludes self and positives, equals filtered top-k") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.limit(4).select($"vec_id".as("qid"), $"embedding".as("qvec"))
    // positives = the unexcluded top-3 (rank 1 is the anchor itself), so
    // both exclusion rules demonstrably bite
    val positives = SimilarityOps.topKBruteForce(emb, "vec_id", "embedding",
        queries, "qid", "qvec", k = 3)
      .select($"query_id", $"vec_id".as("pos_id"))
    val posSet = positives.as[(Long, Long)].collect().toSet
    val negs = SimilarityOps.hardNegatives(emb, "vec_id", "embedding",
        queries, "qid", "qvec", positives, "query_id", "pos_id", k = 5)
      .collect()
    assert(negs.map(_.getAs[Long]("query_id")).distinct.length == 4)
    negs.foreach { r =>
      val q = r.getAs[Long]("query_id"); val v = r.getAs[Long]("vec_id")
      assert(v != q, s"self $q mined as negative")
      assert(!posSet.contains((q, v)), s"positive ($q,$v) mined as negative")
    }
    // equals brute-force top-k over the manually pre-filtered candidates:
    // the negatives are exactly the unexcluded ranks 4..8
    val wide = SimilarityOps.topKBruteForce(emb, "vec_id", "embedding",
        queries, "qid", "qvec", k = 8)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)].collect()
    val expected = wide.filter(r => r._3 >= 4).map(r => (r._1, r._2)).toSet
    assert(negs.map(r => (r.getAs[Long]("query_id"),
      r.getAs[Long]("vec_id"))).toSet == expected)
  }

  test("margin mining: demotes hubs, deterministic, bounded backward pass") {
    // three near-orthogonal queries; a HUB close to all of them; a
    // genuine match y close only to q1. Raw cosine ranks the hub first
    // for q1; the margin divides each candidate's neighborhood density
    // out, so the genuine pair must win.
    def v(a: Double, b: Double, c: Double, d: Double) =
      Array(a.toFloat, b.toFloat, c.toFloat, d.toFloat)
    val queries = Seq(
      (1L, v(1, 0, 0, 0)), (2L, v(0, 1, 0, 0)), (3L, v(0, 0, 1, 0)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, v(1, 1, 1, 0)),       // hub: cosine 0.577 to EVERY query
      (11L, v(0.5, 0, 0, 0.866)), // genuine match for q1 only (cos 0.5)
      (12L, v(0, 0, 0, 1)),       // background
      (13L, v(0.05, 0, 0, 1)))    // background
      .toDF("vec_id", "embedding")
    val got = SimilarityOps.marginMineTopK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 2, navg = 2, candidates = 4)
    val q1 = got.where($"query_id" === 1L).orderBy("rank").collect()
    // raw-cosine order for q1 would put the hub first; margin must not
    val rawTop = SimilarityOps.topKBruteForce(corpus, "vec_id", "embedding",
      queries.where($"vec_id" === 1L), "vec_id", "embedding", k = 1)
      .collect()(0).getAs[Long]("vec_id")
    assert(rawTop == 10L, "fixture broken: hub should win on raw cosine")
    assert(q1(0).getAs[Long]("vec_id") == 11L,
      s"margin must rank the genuine match over the hub, got ${q1.toSeq}")
    // margins are finite, positive, and ranked desc
    val ms = got.orderBy("query_id", "rank")
      .select("query_id", "margin").as[(Long, Double)].collect()
    assert(ms.forall(m => m._2 >= 0 && !m._2.isNaN && !m._2.isInfinite))
    // deterministic and layout-independent
    val again = SimilarityOps.marginMineTopK(corpus.repartition(5),
      "vec_id", "embedding", queries, "vec_id", "embedding",
      k = 2, navg = 2, candidates = 4)
      .orderBy("query_id", "rank").collect().toSeq
    assert(got.orderBy("query_id", "rank").collect().toSeq == again)
    // scale shape: ranking is the map-side-combining aggregate, and the
    // backward density never windows the corpus
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("top_k_by") && !plan.contains("Window"),
      s"margin mining must rank via top_k_by, not a window:\n$plan")
    intercept[IllegalArgumentException] {
      SimilarityOps.marginMineTopK(corpus, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5, navg = 2, candidates = 4)
    }
  }

  test("margin mining via IVF candidates equals brute force at full probe") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.where($"vec_id" < 6)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank")
        .select("query_id", "vec_id", "margin", "rank")
        .collect().toSeq
    val bf = rows(SimilarityOps.marginMineTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5, navg = 4, candidates = 16))
    val ivf = rows(SimilarityOps.marginMineTopKIvf(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5, navg = 4, candidates = 16,
      nlist = 8, nprobe = 8))
    assert(bf == ivf, "full probe must reproduce the brute-force margins")
    // an approximate probe still returns k ranked rows per query
    val approx = SimilarityOps.marginMineTopKIvf(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5, navg = 4, candidates = 16,
      nlist = 8, nprobe = 2)
    assert(approx.groupBy("query_id").count().collect()
      .forall(_.getLong(1) == 5L))
  }

  test("annRecall: perfect, partial, zero-hit, and truncated-truth queries") {
    val approx = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 99L), (3L, 98L),
      (3L, 97L), (4L, 40L)).toDF("query_id", "vec_id")
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L), (3L, 30L),
      (3L, 31L), (4L, 40L)).toDF("query_id", "vec_id")
    val r = SimilarityOps.annRecall(approx, exact)
      .collect().map(x => x.getAs[Long]("query_id") ->
        (x.getAs[Long]("n_hits"), x.getAs[Double]("recall"))).toMap
    assert(r(1L) == ((2L, 1.0)))   // perfect
    assert(r(2L) == ((1L, 0.5)))   // partial
    assert(r(3L) == ((0L, 0.0)))   // zero hits still reported
    assert(r(4L) == ((1L, 1.0)))   // truth truncated to 1 normalizes to 1
    assert(r.size == 4)
  }

  test("LSH top-k recall vs brute force on real embeddings") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.limit(5).select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val exact = SimilarityOps.topKBruteForce(emb, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = SimilarityOps.topKLsh(emb, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5, dim = 64, nbits = 6, probeBits = 2)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.6, s"LSH recall $recall") // multiprobe-2 on 8 bits
  }

  test("ivfRecallCurve: recalls monotone, exact at full probe, flags pinned") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val curve = SimilarityOps.ivfRecallCurve(emb, "vec_id", "embedding",
        emb.where($"vec_id" < 32), "vec_id", "embedding",
        k = 5, nprobes = Seq(1, 4, 16), nlist = 16)
      .orderBy("nprobe")
      .as[(Long, Long, Double, Long, Long, Long)].collect().toSeq
    assert(curve.map(_._1) == Seq(1L, 4L, 16L))
    assert(curve.forall(_._2 == 32L), s"n_queries: $curve")
    val recalls = curve.map(_._3)
    // the nested-candidate invariant: recall non-decreasing in nprobe
    assert(recalls.zip(recalls.drop(1)).forall { case (a, b) => b >= a },
      s"recalls must be monotone: $recalls")
    // full probe (nprobe = nlist) IS brute force — exactly 1.0
    assert(recalls.last == 1.0, s"full probe must be exact: $recalls")
    // a sane single-cell probe beats the broken-path floor by far; no
    // UPPER bound — nothing prevents nprobe=1 from legitimately reaching
    // recall 1.0 on a small or well-clustered fixture, so asserting < 1.0
    // would fail a correct implementation on k-means geometry
    assert(recalls.head >= 0.05, s"nprobe=1 recall out of range: $recalls")
    assert(curve.forall(r => r._4 == 1L && r._5 == 1L && r._6 == 1L),
      s"flags must pin at 1: $curve")
  }

  test("matryoshka top-k: full prefix equals brute force; 16-dim prefix keeps recall") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.limit(5).select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val exact = SimilarityOps.topKBruteForce(emb, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)].collect().toSet
    // degenerate config: prefix = full dim and a shortlist >= corpus means
    // stage 1 IS brute force and stage 2 re-ranks everything -> identical
    val full = SimilarityOps.topKMatryoshka(emb, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5, prefixDims = 64, nCandidates = 100000)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(full == exact, "prefix=dim + unbounded shortlist must equal brute force")
    // Recall needs MRL-SHAPED data (information concentrated in the
    // prefix) — on the isotropic random fixture a 16-of-64 prefix
    // correlates only ~sqrt(16/64) with the full cosine and recall is
    // ~0.5 by construction, which says nothing about the operator. Build
    // prefix-heavy vectors: strong first 16 dims, small noise tail.
    def mrlVec(i: Int): Seq[Float] = {
      val r = new scala.util.Random(i)
      Seq.tabulate(64)(d => (if (d < 16) r.nextGaussian() else 0.1 * r.nextGaussian()).toFloat)
    }
    val mrlCorpus = (0 until 300).map(i => (i.toLong, mrlVec(i))).toDF("vec_id", "embedding")
    val mrlQueries = (0 until 5).map(i => (i.toLong, mrlVec(i))).toDF("qid", "qvec")
    val mrlExact = SimilarityOps.topKBruteForce(mrlCorpus, "vec_id", "embedding",
        mrlQueries, "qid", "qvec", k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val mrl = SimilarityOps.topKMatryoshka(mrlCorpus, "vec_id", "embedding",
        mrlQueries, "qid", "qvec", k = 5, prefixDims = 16, nCandidates = 32)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = mrlExact.count(mrl.contains).toDouble / mrlExact.size
    assert(recall >= 0.9, s"matryoshka recall on prefix-heavy data: $recall")
    // plan shape: the corpus never shuffles — the only exchanges are the
    // two top_k_by partial/final aggregates; queries and the shortlist
    // ride broadcasts
    val plan = SimilarityOps.topKMatryoshka(emb, "vec_id", "embedding",
      queries, "qid", "qvec", k = 5, prefixDims = 16, nCandidates = 32)
    // (string count: AQE wraps the tree, hiding Exchange nodes from a
    // plain collect)
    val planStr = plan.queryExecution.executedPlan.toString
    val nShuffles = "Exchange hashpartitioning".r.findAllIn(planStr).size
    assert(nShuffles == 2,
      s"expected exactly the two top-k agg exchanges:\n$planStr")
  }

  test("nearDupSourceMatrix: pairs fold to symmetric source counts") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = Seq(
      (1L, base, "srcA"),
      (2L, base, "srcB"),            // cross-source dup with 1
      (3L, base, "srcB"),            // J=1 dup of 1 and 2 (banding-certain)
      (4L, "one two three four five six seven eight nine ten", "srcC"),
      (5L, "one two three four five six seven eight nine ten", "srcC") // intra-source dup
    ).toDF("id", "text", "src")
    val m = DedupOps.nearDupSourceMatrix(df, "id", "text", "src")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // pairs: (1,2) A-B, (1,3) A-B, (2,3) B-B, (4,5) C-C
    assert(m == Map(
      ("srcA", "srcB") -> 2L,
      ("srcB", "srcB") -> 1L,
      ("srcC", "srcC") -> 1L))
  }

  test("SQ8 top-k equals exact MIPS top-k (error-bounded candidates)") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.limit(5).select($"vec_id".as("qid"), $"embedding".as("qvec"))
    // exact MIPS reference via the same dot expression
    val scored = emb.select($"vec_id", $"embedding").crossJoin(
        broadcast(queries))
      .select($"qid".as("query_id"), $"vec_id",
        graft.functions.GraftFunctions.dot_product($"embedding", $"qvec").as("dot"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy($"dot".desc, $"vec_id".asc)
    val exact = scored.withColumn("rank", row_number().over(w)).where($"rank" <= 5)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)].collect().toSet
    val sq8 = SimilarityOps.topKSq8(emb, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5, dim = 64)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(sq8 == exact, "SQ8 must be EXACT, not approximate")
    // and the candidate bound actually prunes: fewer rescored rows than corpus×queries
    // (sanity only at this scale; the invariant above is the real check)
  }

  test("PQ top-k equals exact MIPS top-k regardless of codebook quality") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.limit(5).select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val scored = emb.select($"vec_id", $"embedding").crossJoin(
        broadcast(queries))
      .select($"qid".as("query_id"), $"vec_id",
        graft.functions.GraftFunctions.dot_product($"embedding", $"qvec").as("dot"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy($"dot".desc, $"vec_id".asc)
    val exact = scored.withColumn("rank", row_number().over(w)).where($"rank" <= 5)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)].collect().toSet
    val pq = SimilarityOps.topKPq(emb, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5, dim = 64, m = 8, ksub = 16)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(pq == exact, "PQ must be EXACT, not approximate")
    // a DELIBERATELY terrible codebook (2 centroids/subspace from an
    // 8-vector sample) must still be exact — only the candidate volume,
    // never the answer, depends on codebook quality
    val pqBad = SimilarityOps.topKPq(emb, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5, dim = 64, m = 4, ksub = 2,
        trainSample = 8, seed = 7L)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(pqBad == exact, "PQ exactness must not depend on training")
  }

  test("IVFPQ top-k: full probe equals exact MIPS; partial probe keeps recall") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.limit(5).select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val scored = emb.select($"vec_id", $"embedding").crossJoin(broadcast(queries))
      .select($"qid".as("query_id"), $"vec_id",
        graft.functions.GraftFunctions.dot_product($"embedding", $"qvec").as("dot"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy($"dot".desc, $"vec_id".asc)
    val exact = scored.withColumn("rank", row_number().over(w)).where($"rank" <= 5)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)].collect().toSet
    // nprobe = nlist probes every cell; the PQ bound never drops a probed
    // candidate, so the composed path must equal brute force exactly
    val full = SimilarityOps.topKIvfPq(emb, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5, dim = 64, nlist = 16, nprobe = 16,
        m = 8, ksub = 16)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(full == exact, "IVFPQ at full probe must be EXACT")
    // partial probe: only cell recall is approximate
    val approx = SimilarityOps.topKIvfPq(emb, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5, dim = 64, nlist = 16, nprobe = 8,
        m = 8, ksub = 16)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = exact.count { case (q, v, _) => approx.contains((q, v)) }.toDouble / exact.size
    assert(recall >= 0.5, s"IVFPQ recall $recall")
  }

  test("PQ top-k: string corpus ids; corpus smaller than k") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(3)
      .select(concat(lit("doc-"), $"vec_id").as("sid"), $"embedding")
    val queries = emb.limit(2).select($"sid".as("qid"), $"embedding".as("qvec"))
    val got = SimilarityOps.topKPq(emb, "sid", "embedding",
        queries, "qid", "qvec", k = 5, dim = 64, m = 8, ksub = 4)
      .select("query_id", "vec_id", "rank").as[(String, String, Int)].collect().toSet
    // 3-vector corpus, k=5 → τ is absent, every vector ranks
    assert(got.size == 6)
    val exact = emb.crossJoin(broadcast(queries))
      .select($"qid".as("query_id"), $"sid".as("vec_id"),
        graft.functions.GraftFunctions.dot_product($"embedding", $"qvec").as("dot"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy($"dot".desc, $"vec_id".asc)))
      .select("query_id", "vec_id", "rank").as[(String, String, Int)].collect().toSet
    assert(got == exact)
  }

  test("multi-probe masks: combinatorial generation, safe at large nbits") {
    // matches the brute enumeration on a small space
    val brute = (0 until (1 << 8)).filter(m => Integer.bitCount(m) <= 2).toSet
    assert(SimilarityOps.hammingMasks(8, 2).toSet == brute)
    assert(SimilarityOps.hammingMasks(8, 2).size == 1 + 8 + 28)
    // nbits where `1 << nbits` used to overflow / burn 2^nbits driver CPU
    val wide = SimilarityOps.hammingMasks(31, 1)
    assert(wide.size == 32 && wide.contains(0) && wide.contains(1 << 30))
    assert(SimilarityOps.hammingMasks(24, 2).size == 1 + 24 + 24 * 23 / 2)
    // no duplicate masks; popcounts within bound
    val m = SimilarityOps.hammingMasks(16, 3)
    assert(m.distinct.size == m.size)
    assert(m.forall(x => Integer.bitCount(x) <= 3))
    // bounded probe sets fail fast instead of exploding the broadcast
    assertThrows[InvalidDataError](SimilarityOps.hammingMasks(31, 5))
    assertThrows[IllegalArgumentException](SimilarityOps.hammingMasks(32, 1))
  }

  test("IVF top-k recall vs brute force; full probe = exact") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.limit(5).select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val exact = SimilarityOps.topKBruteForce(emb, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    // these embeddings are near-uniform (IVF's worst case — no cluster
    // structure), so probe a generous fraction of the cells
    val ivf = SimilarityOps.topKIvf(emb, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5, nlist = 16, nprobe = 8)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(ivf.contains).toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall $recall")
    // probing every cell must reproduce the exact result
    val full = SimilarityOps.topKIvf(emb, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5, nlist = 16, nprobe = 16)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(full == exact)
  }

  test("TopKBuffer: heap keeps exactly the k best with window-identical ordering") {
    val rng = new java.util.Random(7)
    val pairs = Array.fill(5000)((rng.nextInt(1000) / 500.0, rng.nextLong() % 10000))
    val b = new graft.functions.TopKBuffer(16)
    pairs.foreach { case (s, i) => b.add(s, i) }
    val want = pairs.toSeq.distinct
      .sortWith((a, c) => a._1 > c._1 || (a._1 == c._1 && a._2 < c._2))
    // reference: sort all, dedup exact pairs NOT applied — buffer keeps
    // duplicates too, so compare against the plain sorted prefix
    val wantAll = pairs.toSeq
      .sortWith((a, c) => a._1 > c._1 || (a._1 == c._1 && a._2 < c._2)).take(16)
    assert(b.sortedPairs.toSeq == wantAll, s"distinct-ref head=${want.take(3)}")
    // serde round trip preserves content
    val rt = graft.functions.TopKBuffer.fromBytes(b.toBytes)
    assert(rt.sortedPairs.toSeq == wantAll)
    // merge of two disjoint halves equals the single-pass buffer
    val (h1, h2) = pairs.splitAt(2500)
    val b1 = new graft.functions.TopKBuffer(16)
    val b2 = new graft.functions.TopKBuffer(16)
    h1.foreach { case (s, i) => b1.add(s, i) }
    h2.foreach { case (s, i) => b2.add(s, i) }
    b1.merge(b2)
    assert(b1.sortedPairs.toSeq == wantAll)
    // NaN ranks first (Spark sort order); fewer inputs than k is fine
    val bn = new graft.functions.TopKBuffer(4)
    bn.add(0.5, 1L); bn.add(Double.NaN, 2L); bn.add(0.9, 3L)
    assert(bn.sortedPairs.map(_._2).toSeq == Seq(2L, 3L, 1L))
  }

  test("top_k_by: string ids take the generic buffer and match the window reference") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(100)
    // string doc ids — the common real-world corpus shape the long-only
    // fast path used to reject with a TypeCheckFailure
    val sc = emb.select(concat(lit("doc-"), format_string("%04d", $"vec_id")).as("sid"),
      $"embedding")
    val queries = sc.limit(4).select($"sid".as("qid"), $"embedding".as("qvec"))
    val got = SimilarityOps.topKBruteForce(sc, "sid", "embedding",
        queries, "qid", "qvec", k = 5)
      .select($"query_id", $"vec_id", $"rank")
      .as[(String, String, Int)].collect().toSet
    val scored = sc.select($"sid".as("vec_id"), $"embedding".as("cvec"))
      .crossJoin(broadcast(queries.select($"qid".as("query_id"), $"qvec")))
      .select($"query_id", $"vec_id",
        graft.functions.GraftFunctions.cosine_similarity($"cvec", $"qvec").as("cosine"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
      .orderBy($"cosine".desc, $"vec_id".asc)
    val want = scored.withColumn("rank", row_number().over(w)).where($"rank" <= 5)
      .select($"query_id", $"vec_id", $"rank")
      .as[(String, String, Int)].collect().toSet
    assert(got == want)
    // repartitioned input forces partial buffers through serialize/merge
    val gotShuffled = SimilarityOps.topKBruteForce(sc.repartition(13), "sid",
        "embedding", queries, "qid", "qvec", k = 5)
      .select($"query_id", $"vec_id", $"rank")
      .as[(String, String, Int)].collect().toSet
    assert(gotShuffled == want)
    // non-orderable id types stay loudly rejected
    val bad = sc.select($"sid", map(lit("a"), lit(1)).as("m"), $"embedding")
    val e = intercept[Exception] {
      bad.groupBy("sid")
        .agg(graft.functions.GraftFunctions.top_k_by(lit(1.0), $"m", 2))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("top_k_by"))
  }

  test("knnGraph: full probe equals the brute-force neighbor graph; recall degrades gracefully") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(200)
    // brute-force graph via the query-batch path with corpus as queries,
    // self-pairs re-ranked away
    val self = emb.select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val bf = SimilarityOps.topKBruteForce(emb, "vec_id", "embedding",
        self, "qid", "qvec", k = 4)
      .where($"query_id" =!= $"vec_id") // self is always rank 1 (cos=1)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    val full = SimilarityOps.knnGraph(emb, "vec_id", "embedding",
        k = 3, nlist = 8, nprobe = 8)
      .select($"src_id", $"nbr_id").as[(Long, Long)].collect()
    assert(full.length == full.distinct.length)
    assert(full.toSet == bf)
    val approx = SimilarityOps.knnGraph(emb, "vec_id", "embedding",
        k = 3, nlist = 8, nprobe = 4)
      .select($"src_id", $"nbr_id").as[(Long, Long)].collect().toSet
    val recall = bf.count(approx.contains).toDouble / bf.size
    assert(recall >= 0.5, s"knnGraph recall $recall")
    // approximate results are a subset of valid pairs, never fabricated ids
    assert(approx.forall { case (a, b) => a != b })
    // auto nlist (nlist = 0): 200 vectors → max(16, ceil(sqrt(200))) = 16
    // cells; at nprobe = 16 that is a full probe, so auto must equal brute
    // force — pins the sqrt rule without depending on kmeans geometry
    val auto = SimilarityOps.knnGraph(emb, "vec_id", "embedding",
        k = 3, nprobe = 16)
      .select($"src_id", $"nbr_id").as[(Long, Long)].collect()
    assert(auto.toSet == bf, "auto-nlist full probe must equal brute force")
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.knnGraph(emb, "vec_id", "embedding", k = 3, nlist = -1)
    }
    assert(e.getMessage.contains("auto"))
  }

  test("multimodal: ImageIO decodes real BMP pixels bit-exactly; frame sampling") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(20)
    // BMP corpus: real 24-bit files, decoded by javax.imageio on executors
    val img = MultimodalOps.syntheticImageCorpus(docs, "doc_id")
    val feats = MultimodalOps.decodeFeatures(img).orderBy("media_id").collect()
    assert(feats.length == 20)
    for (r <- feats) {
      val id = r.getLong(0)
      val f = r.getSeq[Float](2)
      val (w, h) = (MediaFixtures.widthFor(id), MediaFixtures.heightFor(id))
      // expected per-channel sums straight from the generating formula
      val exp = Array.fill(3)(0L)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        exp(c) += MediaFixtures.channelValue(id, w, x, y, c)
      assert(f == Seq(w.toFloat, h.toFloat, exp(0).toFloat, exp(1).toFloat, exp(2).toFloat),
        s"decode mismatch for id=$id")
    }
    // WAV: synthesize a 16-bit PCM file via the JDK and decode it back
    val sr = 8000f
    val samples = Array.tabulate[Short](64)(i => (i * 100 - 3200).toShort)
    val bytes = {
      val raw = java.nio.ByteBuffer.allocate(samples.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.foreach(raw.putShort)
      val fmt = new javax.sound.sampled.AudioFormat(sr, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw.array()), fmt, samples.length.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val wav = new JdkMediaDecoder().decode("audio", bytes)
    assert(wav.toSeq == Seq(1f, sr, samples.length.toFloat,
      samples.map(s => math.abs(s.toInt)).sum.toFloat, 0f))
    // unparseable bytes and video decode to the zero vector, never throw
    assert(new JdkMediaDecoder().decode("image", Array[Byte](1, 2, 3)).forall(_ == 0f))
    assert(new JdkMediaDecoder().decode("video", bytes).forall(_ == 0f))

    val media = MultimodalOps.syntheticCorpus(docs, "doc_id", "text")
    assert(media.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq ==
      MultimodalOps.mediaSchema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq)
    val frames = MultimodalOps.sampleFrames(media, frameBytes = 32, stride = 2)
    val perDoc = frames.groupBy("media_id").count().collect()
    assert(perDoc.forall(_.getLong(1) >= 1))
    assert(frames.columns.toSeq == Seq("media_id", "kind", "frame_no", "frame"))
  }

  test("image aHash: upscale-invariant through the real codec; near-dup pairs planted and found") {
    // per-image: the 2x pixel-duplication upscale decodes to different
    // bytes but the identical 64-bit average-hash
    for (id <- Seq(0L, 3L, 11L, 42L)) {
      val h1 = graft.ops.MediaAHashUtil.aHash64(MediaFixtures.bmpForId(id))
      val h2 = graft.ops.MediaAHashUtil.aHash64(MediaFixtures.bmpForIdScaled(id, 2))
      val h3 = graft.ops.MediaAHashUtil.aHash64(MediaFixtures.bmpForIdScaled(id, 3))
      assert(h1 != null && h1 == h2 && h1 == h3, s"id=$id")
      // bytes really differ (exact hashing would NOT find these)
      assert(!java.util.Arrays.equals(
        MediaFixtures.bmpForId(id), MediaFixtures.bmpForIdScaled(id, 2)))
    }
    // undecodable bytes and non-image kinds hash to null
    assert(graft.ops.MediaAHashUtil.aHash64(Array[Byte](9, 9, 9)) == null)
    assert(graft.ops.MediaAHashUtil.aHashOrNull(
      org.apache.spark.unsafe.types.UTF8String.fromString("video"),
      MediaFixtures.bmpForId(1L)) == null)

    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(30)
    val base = MultimodalOps.syntheticImageCorpus(docs, "doc_id")
    val ups = MultimodalOps.syntheticImageCorpusScaled(
      docs.where("doc_id % 7 = 0"), "doc_id", scale = 2, idOffset = 1000000L)
    val pairs = MultimodalOps.imageNearDup(base.unionByName(ups))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = docs.where("doc_id % 7 = 0").collect()
      .map(r => (r.getLong(0), r.getLong(0) + 1000000L)).toSet
    // every planted upscale is found, attributed to its original (organic
    // collisions among the tiny fixtures may add pairs; planted must hold)
    assert(planted.forall { case (k, d) =>
      pairs.contains((k, d)) || pairs.exists(_._2 == d)
    })
    assert(pairs.nonEmpty)
  }

  test("imageNearDupPairs: Hamming band join equals brute force; bumps flip only their cells") {
    // a bumped cell's sampled pixel goes white at scale 4, where every
    // grid cell samples a DISTINCT pixel: the bumped bits are forced to 1
    // and only the shifted mean can flip other (borderline) bits
    for (id <- Seq(0L, 3L, 11L, 42L)) {
      val h0 = graft.ops.MediaAHashUtil.aHash64(MediaFixtures.bmpForIdScaled(id, 4))
      val hb = graft.ops.MediaAHashUtil.aHash64(
        MediaFixtures.bmpForIdBumped(id, 4, Array(0, 27, 54)))
      assert(h0 != null && hb != null)
      for (c <- Seq(0, 27, 54))
        assert((hb.longValue() >> c & 1L) == 1L, s"id=$id cell $c not forced to 1")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(60)
    val base = MultimodalOps.syntheticImageCorpus(docs, "doc_id")
    val bumped = MultimodalOps.syntheticImageCorpusBumped(
      docs.where("doc_id % 11 = 0"), "doc_id", scale = 4,
      idOffset = 2000000L, cells = Seq(0, 27, 54))
    val corpus = base.unionByName(bumped)
    val got = MultimodalOps.imageNearDupPairs(corpus, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force over the collected hashes — the band join must be EXACT
    // at Hamming <= 3 (pigeonhole over the 4x16-bit chunks)
    val hashes = MultimodalOps.imageAHash(corpus).where("ahash is not null")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val want = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d)).toSet
    assert(got == want)
    // the planted near-misses produce pairs the exact-hash op cannot see
    val exact = MultimodalOps.imageNearDup(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nearOnly = got.filter(p => p._3 > 0 && !exact.contains((p._1, p._2)))
    assert(nearOnly.nonEmpty, "expected near-miss pairs beyond exact-hash equality")
  }

  test("videoNearDupPairs: scene-sharing videos pair, maxFrameDf kills universal frames") {
    val ids = Seq(0L, 12L, 1000L).toDF("doc_id")
    val vids = MultimodalOps.syntheticVideoCorpus(ids, "doc_id",
      scenes = 3, framesPerScene = 4)
    // videos 0 and 12 share scene images {12, 24} bit-exactly
    val pairs = MultimodalOps.videoNearDupPairs(vids, nFrames = 12,
        minShared = 2, maxFrameDf = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((0L, 12L)) && pairs((0L, 12L)) >= 2L)
    // maxFrameDf = 1: every shared hash lives in >= 2 videos -> all cut
    val cut = MultimodalOps.videoNearDupPairs(vids, nFrames = 12,
      minShared = 1, maxFrameDf = 1).count()
    assert(cut == 0L, "df cut must remove every cross-video frame hash")
  }

  test("videoNearDupPairs: exact parity with a plain-Scala frame-set reference") {
    val n = 50
    val ids = (0L until n.toLong).toDF("doc_id")
    val vids = MultimodalOps.syntheticVideoCorpus(ids, "doc_id",
      scenes = 3, framesPerScene = 4)
    val got = MultimodalOps.videoNearDupPairs(vids, nFrames = 12,
        minShared = 2, maxFrameDf = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // reference: per-video distinct frame-hash sets straight off the
    // fixture codec (frames within a scene are identical, so the set is
    // the 3 scene images' hashes)
    val sets = (0L until n.toLong).map { id =>
      id -> (0 until 3).map(sc =>
        MediaAHashUtil.aHash64(MediaFixtures.bmpForId(id + sc * 12L)).longValue).toSet
    }.toMap
    val want = (for {
      a <- 0L until n.toLong; b <- (a + 1) until n.toLong
      shared = (sets(a) intersect sets(b)).size
      if shared >= 2
    } yield (a, b) -> shared.toLong).toMap
    assert(got == want)
  }

  test("videoSceneCuts: cuts exactly at scene boundaries, via the real codec") {
    val ids = Seq(1L, 2L, 5L, 10L)
    val docs = ids.toDF("doc_id")
    val vids = MultimodalOps.syntheticVideoCorpus(docs, "doc_id",
      scenes = 3, framesPerScene = 4)
    val cuts = MultimodalOps.videoSceneCuts(vids, nFrames = 12, minHamming = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // ground truth: a cut at a scene boundary iff the two scene images
    // hash differently (computed through the single-image path, which the
    // band-join spec already grades against brute force)
    val sceneIds = ids.flatMap(id => Seq(id, id + 12, id + 24)).distinct
    val hmap = MultimodalOps.imageAHash(
        MultimodalOps.syntheticImageCorpus(sceneIds.toDF("doc_id"), "doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val want = ids.flatMap { id =>
      Seq((id, 4, java.lang.Long.bitCount(hmap(id) ^ hmap(id + 12))),
          (id, 8, java.lang.Long.bitCount(hmap(id + 12) ^ hmap(id + 24))))
    }.collect { case (id, f, d) if d >= 1 => (id, f, d) }.toSet
    assert(want.nonEmpty, "fixture degenerate: no differing scene hashes")
    assert(cuts == want)
    // identical intra-scene frames never cut — every cut is a boundary
    assert(cuts.forall { case (_, f, _) => f == 4 || f == 8 })
    // the frame explode + hash stays map-side: only the bounded per-video
    // window shuffles, and it shuffles 8-byte hashes, not pixels
    val plan = MultimodalOps.videoSceneCuts(vids, nFrames = 12)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"))
  }

  test("audioDownsample: decimated samples equal the plain-Scala truncating pair-average") {
    val ids = Seq(0L, 3L, 11L)
    val clips = MultimodalOps.syntheticAudioCorpus(ids.toDF("doc_id"), "doc_id")
    val got = MultimodalOps.audioDownsample(clips, factor = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def sample(id: Long, i: Int): Long =
      if (Math.floorMod(i / 100 + id, 3L) == 0L) 0L
      else Math.floorMod(id * 31L + i * 7L, 2000L) - 1000L
    ids.foreach { id =>
      // truncating division, like the SQL oracle's //
      val want = (0 until 800).map(j => (sample(id, 2 * j) + sample(id, 2 * j + 1)) / 2)
      assert(got(id) == want, s"clip $id decimation mismatch")
      // the formula produces negative odd sums, so truncation direction
      // is actually exercised
      assert(want.exists(_ < 0))
    }
  }

  test("imageDownsample: shrunk channel values equal the plain-Scala box average") {
    // ids chosen to cover odd widths/heights (trailing row/col dropped):
    // id 0 -> 3x2, id 4 -> 7x2, id 9 -> 6x3
    val ids = Seq(0L, 4L, 9L)
    val imgs = MultimodalOps.syntheticImageCorpus(ids.toDF("doc_id"), "doc_id")
    val got = MultimodalOps.imageDownsample(imgs, factor = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def v(id: Long, w0: Int, x: Int, y: Int, c: Int): Long =
      Math.floorMod(id * 31L + ((y.toLong * w0 + x) * 3L + c) * 7L, 256L)
    ids.foreach { id =>
      val w0 = (id % 6 + 3).toInt; val h0 = (id % 4 + 2).toInt
      val want = for {
        y <- 0 until h0 / 2; x <- 0 until w0 / 2; c <- 0 until 3
      } yield (v(id, w0, 2 * x, 2 * y, c) + v(id, w0, 2 * x + 1, 2 * y, c) +
        v(id, w0, 2 * x, 2 * y + 1, c) + v(id, w0, 2 * x + 1, 2 * y + 1, c)) / 4
      assert(got(id) == want, s"image $id box downsample mismatch " +
        s"(w0=$w0 h0=$h0): got ${got(id)} want $want")
    }
    // undecodable bytes -> null, not a crash
    import org.apache.spark.sql.functions.{col, lit}
    val junk = Seq(1L).toDF("media_id")
      .select(col("media_id"), lit("junk".getBytes).as("content"))
    assert(MultimodalOps.imageDownsample(junk).head().isNullAt(1))
  }

  test("audioSilenceSegments: real-codec energies match the PCM formula") {
    val ids = Seq(0L, 1L, 7L)
    val clips = MultimodalOps.syntheticAudioCorpus(ids.toDF("doc_id"), "doc_id")
    val got = MultimodalOps.audioSilenceSegments(clips)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getInt(3), r.getLong(4), r.getLong(5))).toSet
    // independent recomputation from the fixture's PCM formula
    def energy(id: Long, f: Int): Long =
      if ((f + id) % 3 == 0) 0L
      else (f * 100 until (f + 1) * 100)
        .map(i => math.abs(Math.floorMod(id * 31 + i * 7L, 2000L) - 1000L)).sum
    val want = ids.flatMap { id =>
      val segs = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Boolean, Int, Long, Long)]
      for (f <- 0 until 16) {
        val s = (f + id) % 3 == 0
        val e = energy(id, f)
        if (segs.isEmpty || segs.last._3 != s)
          segs += ((id, segs.size.toLong, s, f, 1L, e))
        else {
          val l = segs.last
          segs(segs.size - 1) = (id, l._2, s, l._4, l._5 + 1, l._6 + e)
        }
      }
      segs
    }.toSet
    assert(got == want)
    // undecodable bytes (text as "audio") produce no segments, not garbage
    val junk = MultimodalOps.syntheticCorpus(
      Seq((1L, "not audio at all")).toDF("doc_id", "text"), "doc_id", "text")
      .withColumn("kind", lit("audio"))
    assert(MultimodalOps.audioSilenceSegments(junk).count() == 0)
  }

  test("audioEnergyFingerprint: exact bits vs PCM formula, gain-invariant") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val ids = Seq(3L, 7L, 12L)
    def corpus(gain: Int, offset: Long) = {
      val rows = ids.map { id =>
        Row(id + offset, "audio", MediaFixtures.wavForIdGain(id, gain), null)
      }
    spark.createDataFrame(spark.sparkContext.parallelize(rows),
        StructType(Seq(StructField("media_id", LongType),
          StructField("kind", StringType), StructField("content", BinaryType),
          StructField("meta", StringType))))
    }
    val fp1 = MultimodalOps.audioEnergyFingerprint(corpus(1, 0L), frameSamples = 25)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    // independent recompute from the fixture's PCM formula
    def energy(id: Long, f: Int): Long =
      (f * 25 until (f + 1) * 25).map { i =>
        if (Math.floorMod(i / 100 + id, 3L) == 0L) 0L
        else math.abs(Math.floorMod(id * 31 + i * 7L, 2000L) - 1000L)
      }.sum
    for (id <- ids) {
      val e = (0 until 64).map(f => energy(id, f))
      val want = (0 to 62).map(f => if (e(f + 1) > e(f)) 1L << f else 0L).sum
      assert(fp1(id) == ((64, want)), s"clip $id")
    }
    // volume remaster (gain 2): identical fingerprint, so near-dup pairs
    // find every (id, id+offset) at Hamming 0
    val both = corpus(1, 0L).unionByName(corpus(2, 1000L))
    val pairs = MultimodalOps.audioNearDupPairs(both, frameSamples = 25,
        maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ids.map(id => (id, id + 1000L)).toSet.subsetOf(pairs))
  }

  test("winnowFingerprints: exact MOSS selection vs a plain-Scala reference") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    // independent reimplementation: k-gram md5s, per-window min with the
    // (hash asc, position desc) robust-winnowing tie rule, distinct
    def winnow(text: String, k: Int, w: Int): Set[(Long, String)] = {
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      if (toks.length < k) return Set.empty
      val grams = (0 to toks.length - k)
        .map(i => (i + 1, md5hex(toks.slice(i, i + k).mkString(" "))))
      (1 to math.max(grams.length - w + 1, 1)).map { s =>
        grams.slice(s - 1, math.min(s - 1 + w, grams.length))
          .minBy { case (p, h) => (h, -p) }
      }.map { case (p, h) => (p.toLong, h) }.toSet
    }
    val texts = Seq(
      (1L, "a b c d e f g h i j a b c d e"), // repeated run → shared grams
      (2L, "x y z a b c d e f q"),
      (3L, "one two"),                        // < k tokens: no fingerprints
      (4L, "p q r s t"),                      // exactly k: the one gram
      (5L, ""))
    val got = DedupOps.winnowFingerprints(
        texts.toDF("id", "text"), "id", "text", k = 5, w = 4)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getString(2))))
      .groupBy(_._1).map { case (id, v) => id -> v.map(_._2).toSet }
    for ((id, text) <- texts)
      assert(got.getOrElse(id, Set.empty) == winnow(text, 5, 4), s"doc $id")
    // the winnowing guarantee: any two docs sharing a k+w-1 = 8-word run
    // select at least one common fingerprint hash
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val fps = DedupOps.winnowFingerprints(
        Seq((10L, s"xx yy $shared zz"), (11L, s"$shared pp qq rr"))
          .toDF("id", "text"), "id", "text", k = 5, w = 4)
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert((fps.filter(_._1 == 10L).map(_._2).toSet &
      fps.filter(_._1 == 11L).map(_._2).toSet).nonEmpty)
  }

  test("winnowFingerprints/stripHtml/audioEnergyFingerprint are shuffle-free map plans") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val plans = Seq(
      DedupOps.winnowFingerprints(docs, "doc_id", "text", 5, 4),
      docs.select(TextOps.stripHtml($"text")),
      MultimodalOps.audioEnergyFingerprint(
        MultimodalOps.syntheticAudioCorpus(docs, "doc_id"), 25))
    for (p <- plans) {
      val exchanges = p.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"map-only op grew a shuffle:\n${p.queryExecution.executedPlan}")
    }
  }

  test("winnowOverlapPairs: shared-run docs pair, disjoint docs do not") {
    val docs = Seq(
      (1L, "the small cat sat on the very large warm mat today ok"),
      (2L, "intro words the small cat sat on the very large warm mat today ok trailing"),
      (3L, "completely different text with nothing matching at all here now"))
      .toDF("id", "text")
    val pairs = DedupOps.winnowOverlapPairs(docs, "id", "text",
        k = 5, w = 4, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 >= 1L))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("persisted IVF index: table round trip exact at full probe, cell partitions prune") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val (centroids, assignments) =
      SimilarityOps.buildIvfIndex(emb, "vec_id", "embedding", nlist = 8)
    val wh = java.nio.file.Files.createTempDirectory("graft-ivf-spec").toString
    val cat = new graft.catalog.HadoopCatalog(wh)
    val cTbl = cat.createTable("cent", graft.types.SparkSchemaConverter.fromSpark(centroids.schema))
    cTbl.append(centroids)
    val aSchema = graft.types.SparkSchemaConverter.fromSpark(assignments.schema)
    val aTbl = cat.createTable("assign", aSchema,
      partitionSpec = graft.meta.PartitionSpec(0, Seq(graft.meta.PartitionField(
        aSchema.fieldByName("cell").get.id, 1000, "cell", "identity"))))
    aTbl.append(assignments)
    val queries = emb.where("vec_id < 4")
    // full probe through the STORED index == the one-shot in-memory form
    val fromIndex = SimilarityOps.topKIvfFromIndex(
        cTbl.toDF(spark), aTbl.toDF(spark), queries, "vec_id", "embedding",
        k = 5, nprobe = 8)
      .select($"query_id", $"vec_id", $"rank").as[(Long, Long, Int)].collect().toSet
    val oneShot = SimilarityOps.topKIvf(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5, nlist = 8, nprobe = 8)
      .select($"query_id", $"vec_id", $"rank").as[(Long, Long, Int)].collect().toSet
    assert(fromIndex == oneShot && fromIndex.nonEmpty)
    // the scale claim: a cell predicate prunes index FILES via the
    // identity partition — low-nprobe probes read a fraction of storage
    val allFiles = aTbl.scan().planFiles().size
    val oneCell = aTbl.scan(predicates = Seq(graft.table.EqPred("cell", 0)))
      .planFiles().size
    assert(oneCell < allFiles,
      s"cell partition did not prune: $oneCell of $allFiles files")
  }

  test("filtered kNN: allow-list top-k equals brute force over the filtered corpus at full probe") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val (centroids, assignments) =
      SimilarityOps.buildIvfIndex(emb, "vec_id", "embedding", nlist = 8)
    val queries = emb.where("vec_id < 4")
    val allowed = emb.where("label % 3 = 0").select("vec_id")
    val filtered = SimilarityOps.topKIvfFromIndex(
        centroids, assignments, queries, "vec_id", "embedding",
        k = 5, nprobe = 8, allowIds = Some(allowed))
      .select($"query_id", $"vec_id", $"rank").as[(Long, Long, Int)].collect()
    // every returned candidate passes the filter
    val allowedSet = allowed.as[Long].collect().toSet
    assert(filtered.nonEmpty && filtered.forall(r => allowedSet(r._2)))
    // full probe + semi-join == brute force over the pre-filtered corpus
    val brute = SimilarityOps.topKBruteForce(
        emb.where("label % 3 = 0"), "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5)
      .select($"query_id", $"vec_id", $"rank").as[(Long, Long, Int)].collect()
    assert(filtered.toSet == brute.toSet)
    // an empty allow list returns no candidates rather than erroring
    val none = SimilarityOps.topKIvfFromIndex(
        centroids, assignments, queries, "vec_id", "embedding",
        k = 5, nprobe = 8, allowIds = Some(allowed.where(lit(false))))
      .count()
    assert(none == 0L)
  }

  test("persisted PQ index: table round trip equals one-shot PQ; codes table carries no vectors") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val (codebook, codes) = SimilarityOps.buildPqIndex(
      emb, "vec_id", "embedding", dim = 64, m = 8, ksub = 16)
    // the stored index column is compact BY SCHEMA: codes + resid only —
    // the raw embedding never lands in the index table
    assert(codes.schema.fieldNames.toSet == Set("vec_id", "codes", "resid"))
    val wh = java.nio.file.Files.createTempDirectory("graft-pq-spec").toString
    val cat = new graft.catalog.HadoopCatalog(wh)
    val cbTbl = cat.createTable("cb", graft.types.SparkSchemaConverter.fromSpark(codebook.schema))
    cbTbl.append(codebook)
    val cdTbl = cat.createTable("cd", graft.types.SparkSchemaConverter.fromSpark(codes.schema))
    cdTbl.append(codes)
    val queries = emb.where("vec_id < 4")
    val fromIndex = SimilarityOps.topKPqFromIndex(
        cbTbl.toDF(spark), cdTbl.toDF(spark), emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5)
      .select($"query_id", $"vec_id", $"rank").as[(Long, Long, Int)].collect().toSet
    val oneShot = SimilarityOps.topKPq(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5, dim = 64, m = 8, ksub = 16)
      .select($"query_id", $"vec_id", $"rank").as[(Long, Long, Int)].collect().toSet
    assert(fromIndex == oneShot && fromIndex.nonEmpty)
  }

  test("persisted SQ8 index: round trip exact, trainerless delta append, zero-vector edge") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // plant a zero vector: scale-0 encode must survive the round trip
    // and never NaN the bound
    val planted = emb.unionByName(
      emb.limit(1).select(lit(999999L).as("vec_id"),
        transform($"embedding", _ => lit(0.0f)).as("embedding"),
        $"label"))
    val codes = SimilarityOps.buildSq8Index(planted, "vec_id", "embedding")
    // compact BY SCHEMA: codes + scale + resid, no raw vector copy
    assert(codes.schema.fieldNames.toSet == Set("vec_id", "codes", "scale", "resid"))
    val z = codes.where($"vec_id" === 999999L).head()
    assert(z.getDouble(2) == 0.0 && z.getDouble(3) == 0.0)
    val wh = java.nio.file.Files.createTempDirectory("graft-sq8-spec").toString
    val cat = new graft.catalog.HadoopCatalog(wh)
    val cTbl = cat.createTable("codes",
      graft.types.SparkSchemaConverter.fromSpark(codes.schema))
    // TRAINERLESS incremental maintenance: two appends of independent
    // encodes are exactly a full encode — no codebook, no drift
    cTbl.append(SimilarityOps.buildSq8Index(
      planted.where("vec_id % 2 = 0"), "vec_id", "embedding"))
    cTbl.append(SimilarityOps.buildSq8Index(
      planted.where("vec_id % 2 = 1"), "vec_id", "embedding"))
    assert(cTbl.toDF(spark).count() == planted.count())
    val queries = emb.where("vec_id < 4")
    val fromIndex = SimilarityOps.topKSq8FromIndex(
        cTbl.toDF(spark), planted, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5)
      .select($"query_id", $"vec_id", $"rank").as[(Long, Long, Int)].collect().toSet
    val bruteTop = planted.select($"vec_id".as("cand_id"), $"embedding".as("cvec"))
      .crossJoin(queries.select($"vec_id".as("query_id"), $"embedding".as("qvec")))
      .select($"query_id", $"cand_id",
        graft.functions.GraftFunctions.dot_product($"cvec", $"qvec").as("dot"))
      .withColumn("rank", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy($"query_id").orderBy($"dot".desc, $"cand_id")))
      .where($"rank" <= 5)
      .select($"query_id", $"cand_id", $"rank").as[(Long, Long, Int)].collect().toSet
    assert(fromIndex == bruteTop && fromIndex.nonEmpty)
  }

  test("persisted IVF+PQ index: full probe exact, cell partitions prune, delta fold == rebuild") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = emb.where("vec_id % 5 != 0")
    val delta = emb.where("vec_id % 5 = 0")
    val (centroids, codebook, baseEntries) = SimilarityOps.buildIvfPqIndex(
      base, "vec_id", "embedding", dim = 64, nlist = 8, m = 8, ksub = 16)
    // the stored entries are compact BY SCHEMA: cell + codes + resid —
    // no raw vector copy rides the index table
    assert(baseEntries.schema.fieldNames.toSet ==
      Set("vec_id", "cell", "codes", "resid"))
    val wh = java.nio.file.Files.createTempDirectory("graft-ivfpq-spec").toString
    val cat = new graft.catalog.HadoopCatalog(wh)
    val cTbl = cat.createTable("cent",
      graft.types.SparkSchemaConverter.fromSpark(centroids.schema))
    cTbl.append(centroids)
    val cbTbl = cat.createTable("cb",
      graft.types.SparkSchemaConverter.fromSpark(codebook.schema))
    cbTbl.append(codebook)
    val eSchema = graft.types.SparkSchemaConverter.fromSpark(baseEntries.schema)
    val eTbl = cat.createTable("entries", eSchema,
      partitionSpec = graft.meta.PartitionSpec(0, Seq(graft.meta.PartitionField(
        eSchema.fieldByName("cell").get.id, 1000, "cell", "identity"))))
    eTbl.append(baseEntries)
    // incremental fold: the delta encodes+assigns under the PERSISTED
    // codebooks in one map pass, and the grown table equals a rebuild
    // over the whole corpus under the same codebooks
    eTbl.append(SimilarityOps.addToIvfPqIndex(
      delta, "vec_id", "embedding", cTbl.toDF(spark), cbTbl.toDF(spark)))
    val entryKey = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2).toSeq, r.getDouble(3))
    val rebuilt = SimilarityOps.addToIvfPqIndex(
        emb, "vec_id", "embedding", cTbl.toDF(spark), cbTbl.toDF(spark))
      .select($"vec_id", $"cell", $"codes", $"resid").collect()
      .map(entryKey).toSet
    val grown = eTbl.toDF(spark)
      .select($"vec_id", $"cell", $"codes", $"resid").collect()
      .map(entryKey).toSet
    assert(grown == rebuilt && grown.size == emb.count())
    // full probe through the stored three-table index == brute-force MIPS
    val queries = emb.where("vec_id < 4")
    val fromIndex = SimilarityOps.topKIvfPqFromIndex(
        cTbl.toDF(spark), cbTbl.toDF(spark), eTbl.toDF(spark),
        emb, "vec_id", "embedding", queries, "vec_id", "embedding",
        k = 5, nprobe = 8)
      .select($"query_id", $"vec_id", $"rank").as[(Long, Long, Int)].collect().toSet
    val bruteTop = emb.select($"vec_id".as("cand_id"), $"embedding".as("cvec"))
      .crossJoin(queries.select($"vec_id".as("query_id"), $"embedding".as("qvec")))
      .select($"query_id", $"cand_id",
        graft.functions.GraftFunctions.dot_product($"cvec", $"qvec").as("dot"))
      .withColumn("rank", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy($"query_id").orderBy($"dot".desc, $"cand_id")))
      .where($"rank" <= 5)
      .select($"query_id", $"cand_id", $"rank").as[(Long, Long, Int)].collect().toSet
    assert(fromIndex == bruteTop && fromIndex.nonEmpty)
    // the scale claim: a cell predicate prunes entry FILES via the
    // identity partition — low-nprobe probes read a fraction of storage
    val allFiles = eTbl.scan().planFiles().size
    val oneCell = eTbl.scan(predicates = Seq(graft.table.EqPred("cell", 0)))
      .planFiles().size
    assert(oneCell < allFiles,
      s"cell partition did not prune: $oneCell of $allFiles files")
  }

  test("sentences: greedy terminator-run segmentation, order preserved") {
    val df = Seq(
      (1L, "Hello world. Second one! Third?"),
      (2L, "No terminator at all"),
      (3L, "Multi!!! Runs... collapse? yes."),
      (4L, "...leading dots vanish. tail"),
      (5L, ""),
      (6L, "   ")).toDF("id", "text")
    val got = df.select($"id", TextOps.sentences($"text").as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(got(1L) == List("Hello world.", "Second one!", "Third?"))
    assert(got(2L) == List("No terminator at all"))
    // terminator RUNS stay with their sentence; mid-run splits never occur
    assert(got(3L) == List("Multi!!!", "Runs...", "collapse?", "yes."))
    // a terminator-only prefix attaches to no sentence
    assert(got(4L) == List("leading dots vanish.", "tail"))
    assert(got(5L).isEmpty && got(6L).isEmpty)
  }

  test("exactDedupKeepBest: max score wins, ties on min id, null scores lose") {
    val df = Seq(
      (1L, "same text", 2.0),
      (2L, "same text", 5.0),  // best copy
      (3L, "same text", 5.0),  // tie: larger id loses
      (4L, "unique", 0.0),
      (5L, "other", Double.NaN)).toDF("id", "text", "score")
      .withColumn("score", when(col("id") === 5L, lit(null)).otherwise(col("score")))
    val got = DedupOps.exactDedupKeepBest(df, "id", "text", "score")
      .select("id").as[Long].collect().toSet
    assert(got == Set(2L, 4L, 5L))
    // null vs non-null in one group: the non-null copy wins
    val mixed = Seq((10L, "x", None: Option[Double]), (11L, "x", Some(1.0)))
      .toDF("id", "text", "score")
    val got2 = DedupOps.exactDedupKeepBest(mixed, "id", "text", "score")
      .select("id").as[Long].collect().toSet
    assert(got2 == Set(11L))
  }

  test("fuzzyMatch: best candidate in block, distance ties on min id, unmatched stay null") {
    val catalog = Seq(
      (10L, "red widget"),
      (11L, "red widget"),   // exact duplicate name: tie must pick id 10
      (12L, "red gadget"),
      (20L, "blue bolt")).toDF("cid", "cname")
    val dirty = Seq(
      (1L, "red widgex"),    // lev 1 to "red widget" (10/11), 2 to gadget
      (2L, "red gadget"),    // exact hit, lev 0
      (3L, "blue bolts!!!"), // lev 3 to "blue bolt" -> over maxDistance 2
      (4L, "green hat"))     // block with no catalog rows at all
      .toDF("did", "dname")
    val got = DedupOps.fuzzyMatch(dirty, "did", "dname",
        catalog, "cid", "cname",
        dirtyBlock = split(col("dname"), " ").getItem(0),
        catalogBlock = split(col("cname"), " ").getItem(0),
        maxDistance = 2)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Int]))).toMap
    assert(got.size == 4, "left-outer: every dirty row keeps a row")
    assert(got(1L) == (Some(10L), Some(1)), "min distance, then min catalog id")
    assert(got(2L) == (Some(12L), Some(0)))
    assert(got(3L) == (None, None), "past maxDistance -> unmatched")
    assert(got(4L) == (None, None), "empty block -> unmatched")
  }

  test("fuzzyMatch: parity with a plain-Scala blocked argmin on pseudo-random strings") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rnd = new scala.util.Random(23)
    def word() = (1 to 2 + rnd.nextInt(5)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    val cat = (1 to 120).map(i => (i.toLong, word()))
    // the 'z' row blocks to an empty catalog bucket -> guaranteed unmatched
    val dirt = (1 to 80).map(i => (1000L + i, word())) :+ (1999L, "zzzz")
    val maxD = 2
    val got = DedupOps.fuzzyMatch(
        dirt.toDF("did", "dname"), "did", "dname",
        cat.toDF("cid", "cname"), "cid", "cname",
        dirtyBlock = substring(col("dname"), 1, 1),
        catalogBlock = substring(col("cname"), 1, 1),
        maxDistance = maxD)
      .collect().map(r => r.getLong(0) ->
        Option(r.get(1)).map(m => (m.asInstanceOf[Long], r.getInt(2)))).toMap
    val want = dirt.map { case (id, dn) =>
      val cands = cat.filter(_._2.head == dn.head)
        .map { case (cid, cn) => (cid, lev(dn, cn)) }
        .filter(_._2 <= maxD)
      id -> (if (cands.isEmpty) None
             else Some(cands.minBy { case (cid, d) => (d, cid) }))
    }.toMap
    assert(got == want && want.values.exists(_.isDefined)
      && want.values.exists(_.isEmpty))
  }

  test("chunkBySentences: boundary-aligned packing, sentences never split") {
    // sentences of 3/4/5/4 tokens; budget 8:
    // prefixes 0,3,7,12 -> chunks 0,0,0,1 (the 5-token sentence starting
    // at prefix 7 < 8 joins chunk 0 and overflows it — the documented
    // alignment trade)
    val df = Seq(
      (1L, "one two three. a b c d! p q r s t? tail w x y."),
      (2L, "short.")).toDF("id", "text")
    val got = CorpusOps.chunkBySentences(df, "id", "text", chunkTokens = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4))).toMap
    assert(got((1L, 0L)) == (("one two three. a b c d! p q r s t?", 3L, 12L)))
    assert(got((1L, 1L)) == (("tail w x y.", 1L, 4L)))
    assert(got((2L, 0L)) == (("short.", 1L, 1L)))
    assert(got.size == 3)
    // reassembling chunks in order reproduces the segmented document
    val rejoined = got.toSeq.filter(_._1._1 == 1L).sortBy(_._1._2)
      .map(_._2._1).mkString(" ")
    assert(rejoined == "one two three. a b c d! p q r s t? tail w x y.")
  }

  test("rangeSearch: exact threshold semantics vs plain-Scala cosine") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.where("vec_id < 4")
    val got = SimilarityOps.rangeSearch(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // plain-Scala reference over the full cross product
    val vecs = emb.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      if (na == 0 || nb == 0) 0.0 else d / math.sqrt(na * nb)
    }
    val want = (for {
      q <- vecs.keys if q < 4
      c <- vecs.keys if cos(vecs(c), vecs(q)) >= 0.5
    } yield (q, c)).toSet
    assert(got == want && got.nonEmpty)
    // every query matches itself at cosine 1
    assert((0L until 4L).forall(q => got.contains((q, q))))
    // tightening the threshold can only shrink the result
    val tight = SimilarityOps.rangeSearch(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight.subsetOf(got))
  }

  test("incremental IVF index: delta append equals full re-assignment, pruning survives") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = emb.where("vec_id % 4 != 0")
    val delta = emb.where("vec_id % 4 = 0")
    val (centroids, baseAssign) =
      SimilarityOps.buildIvfIndex(base, "vec_id", "embedding", nlist = 8)
    val wh = java.nio.file.Files.createTempDirectory("graft-ivf-inc").toString
    val cat = new graft.catalog.HadoopCatalog(wh)
    val cTbl = cat.createTable("cent",
      graft.types.SparkSchemaConverter.fromSpark(centroids.schema))
    cTbl.append(centroids)
    val aSchema = graft.types.SparkSchemaConverter.fromSpark(baseAssign.schema)
    val aTbl = cat.createTable("assign", aSchema,
      partitionSpec = graft.meta.PartitionSpec(0, Seq(graft.meta.PartitionField(
        aSchema.fieldByName("cell").get.id, 1000, "cell", "identity"))))
    aTbl.append(baseAssign)
    // the incremental append: assignment is a pure function of the
    // persisted codebook, so the grown table must EQUAL a from-scratch
    // re-assignment of the whole corpus under the same centroids
    aTbl.append(SimilarityOps.assignToIndex(
      delta, "vec_id", "embedding", cTbl.toDF(spark)))
    val incr = aTbl.toDF(spark).select($"vec_id", $"cell")
      .as[(Long, Int)].collect().toSet
    val full = SimilarityOps.assignToIndex(emb, "vec_id", "embedding", cTbl.toDF(spark))
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toSet
    assert(incr == full && incr.size == emb.count())
    // full probe over the two-commit index == brute force over the union
    val queries = emb.where("vec_id < 4")
    val fromIndex = SimilarityOps.topKIvfFromIndex(
        cTbl.toDF(spark), aTbl.toDF(spark), queries, "vec_id", "embedding",
        k = 5, nprobe = 8)
      .select($"query_id", $"vec_id", $"rank").as[(Long, Long, Int)].collect().toSet
    val brute = SimilarityOps.topKBruteForce(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5)
      .select($"query_id", $"vec_id", $"rank").as[(Long, Long, Int)].collect().toSet
    assert(fromIndex == brute && fromIndex.nonEmpty)
    // the scale claim survives growth: a cell predicate still prunes
    // index FILES after the incremental commit
    val allFiles = aTbl.scan().planFiles().size
    val oneCell = aTbl.scan(predicates = Seq(graft.table.EqPred("cell", 0)))
      .planFiles().size
    assert(oneCell < allFiles,
      s"cell partition did not prune after delta commit: $oneCell of $allFiles files")
    // and the pruning happens in the EXECUTED plan through the DSv2 read
    // path (what the e47/e53 entries use): the cell filter must reach the
    // graft scan as a pushed filter — GraftV1Scan plans files WITH the
    // pushed predicates, so together with the file-count assertion above
    // this proves the query's own plan prunes, not just the scan API
    val dsv2Plan = spark.read.format("graft").load(aTbl.location)
      .where($"cell" === 0).queryExecution.executedPlan.toString
    assert(dsv2Plan.contains("PushedFilters: [IsNotNull(cell), EqualTo(cell,0)]"),
      s"cell filter not pushed into the DSv2 scan:\n$dsv2Plan")
  }

  test("canonicalizeUrl: fetch-variants of one page collapse to one key") {
    val urls = Seq(
      (1L, "HTTP://Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag"),
      (2L, "http://example.com/a/b?a=1&b=2&utm_campaign=z"),
      (3L, "https://News.site.org:443/path/"),
      (4L, "https://news.site.org/path"),
      (5L, "ftp://files.host:21/x"), // non-http scheme keeps its port
      (6L, "not a url at all"),      // unparseable passes through
      (7L, "https://shop.io//"),
      (8L, "https://shop.io")).toDF("id", "url")
    val out = urls.select($"id", CorpusOps.canonicalizeUrl($"url"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "http://example.com/a/b?a=1&b=2")
    assert(out(1L) == out(2L)) // the dedup key property
    assert(out(3L) == "https://news.site.org/path" && out(3L) == out(4L))
    assert(out(5L) == "ftp://files.host:21/x")
    assert(out(6L) == "not a url at all")
    assert(out(7L) == "https://shop.io/" && out(7L) == out(8L))
  }

  test("stripHtml: script/style bodies, comments, tags, entities, idempotent prose") {
    val df = Seq(
      (1L, "<html><head><style>p{x}</style><script>var i=0; if(i<3){i++}" +
        "</script></head><body><p>Hello <b>world</b></p><!-- c --></body></html>"),
      (2L, "A &amp;amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end"),
      (3L, "plain text stays")).toDF("id", "text")
    val out = df.select($"id", TextOps.stripHtml($"text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "Hello world") // script/style BODIES gone, not kept as prose
    assert(out(2L) == "A &amp; B <tag> \"q\" 's' end") // &amp;amp; decodes once
    assert(out(3L) == "plain text stays")
  }

  test("bm25TopK: matches a plain-Scala BM25 reference; rare terms outrank stopwords") {
    val corpus = Seq(
      (1L, "apple banana cherry apple"),
      (2L, "banana banana banana banana banana banana"),
      (3L, "apple zebra"),
      (4L, "the the the the the the the the"),
      (5L, "zebra quagga okapi"),
      (6L, "")).toDF("doc_id", "text")
    val queries = Seq((100L, "apple zebra"), (200L, "banana")).toDF("qid", "qtext")
    val got = CorpusOps.bm25TopK(corpus, "doc_id", "text",
        queries, "qid", "qtext", k = 3, k1 = 1.25, b = 0.75)
      .collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2)))
      .toMap

    // plain-Scala reference on the same corpus
    val docs = Map(
      1L -> Seq("apple", "banana", "cherry", "apple"),
      2L -> Seq.fill(6)("banana"),
      3L -> Seq("apple", "zebra"),
      4L -> Seq.fill(8)("the"),
      5L -> Seq("zebra", "quagga", "okapi"),
      6L -> Seq.empty[String])
    val n = docs.size.toDouble
    val avgdl = docs.values.map(_.size).sum.toDouble / n
    def df(t: String) = docs.values.count(_.contains(t)).toDouble
    def bm25(q: Seq[String], d: Seq[String]): Double = {
      val dl = d.size.toDouble
      val s = q.distinct.filter(t => d.contains(t)).map { t =>
        val tf = d.count(_ == t).toDouble
        math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) *
          (tf * 2.25) / (tf + 1.25 * (0.25 + 0.75 * dl / avgdl))
      }.sum
      math.rint(s * 1e6) / 1e6
    }
    val q1 = Seq("apple", "zebra")
    val expect1 = docs.toSeq.map { case (id, d) => (id, bm25(q1, d)) }
      .filter(_._2 > 0).sortBy { case (id, s) => (-s, id) }.take(3)
    expect1.zipWithIndex.foreach { case ((id, s), i) =>
      val (gid, gs) = got((100L, i + 1))
      assert(gid == id && math.abs(gs - s) < 1e-9, s"rank ${i + 1}: got ($gid,$gs) want ($id,$s)")
    }
    // doc 3 (short, both rare terms) must beat doc 1 (one term, longer)
    assert(got((100L, 1))._1 == 3L)
    // banana query: doc 2 saturates tf but wins; doc 1 second
    assert(got((200L, 1))._1 == 2L && got((200L, 2))._1 == 1L)
    // stopword-only doc 4 and empty doc 6 never surface for these queries
    assert(!got.values.exists(v => v._1 == 4L || v._1 == 6L))

    // production path: persist the index, reload, search — identical
    // results, and the search plan reads the COMPACT tables, not the corpus
    val (postings, stats) = CorpusOps.bm25Index(corpus, "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    postings.write.mode("overwrite").parquet(s"$dir/postings")
    stats.write.mode("overwrite").parquet(s"$dir/stats")
    val viaIndex = CorpusOps.bm25Search(
        spark.read.parquet(s"$dir/postings"), spark.read.parquet(s"$dir/stats"),
        queries, "qid", "qtext", k = 3, k1 = 1.25, b = 0.75)
      .collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(viaIndex == got)
    // dl rides the posting row: doc 1 has 4 tokens on every posting
    val p1 = postings.where("doc_id = 1").collect()
    assert(p1.length == 3 && p1.forall(_.getAs[Long]("dl") == 4L))

    // maxDf stopword cut: apple/zebra/banana all have df = 2, so maxDf = 1
    // drops every query term from scoring — no candidates at all — while
    // maxDf = 2 changes nothing
    assert(CorpusOps.bm25TopK(corpus, "doc_id", "text", queries,
      "qid", "qtext", k = 3, k1 = 1.25, b = 0.75, maxDf = 1L).count() == 0)
    val atDf2 = CorpusOps.bm25TopK(corpus, "doc_id", "text", queries,
        "qid", "qtext", k = 3, k1 = 1.25, b = 0.75, maxDf = 2L)
      .collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(atDf2 == got)
  }

  test("persisted BM25 index: bucket round trip exact, query vocabulary prunes files") {
    val corpus = Seq(
      (1L, "apple banana cherry apple"),
      (2L, "banana banana banana banana banana banana"),
      (3L, "apple zebra"),
      (4L, "the the the the the the the the"),
      (5L, "zebra quagga okapi"),
      (6L, "date elderberry fig grape hazelnut")).toDF("doc_id", "text")
    val queries = Seq((100L, "apple zebra"), (200L, "banana")).toDF("qid", "qtext")
    val (postings, stats) = CorpusOps.bm25Index(corpus, "doc_id", "text")
    val wh = java.nio.file.Files.createTempDirectory("graft-bm25-spec").toString
    val cat = new graft.catalog.HadoopCatalog(wh)
    val pSchema = graft.types.SparkSchemaConverter.fromSpark(postings.schema)
    val pTbl = cat.createTable("postings", pSchema,
      partitionSpec = graft.meta.PartitionSpec(0, Seq(graft.meta.PartitionField(
        pSchema.fieldByName("term").get.id, 1000, "term_bucket", "bucket[8]"))))
    pTbl.append(postings)
    val sTbl = cat.createTable("stats",
      graft.types.SparkSchemaConverter.fromSpark(stats.schema))
    sTbl.append(stats)
    // search through the RELOADED index == search over the in-memory frames
    val indexed = CorpusOps.bm25SearchIndexed(pTbl.toDF(spark), sTbl.toDF(spark),
        queries, "qid", "qtext", k = 3, k1 = 1.25, b = 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val direct = CorpusOps.bm25Search(postings, stats,
        queries, "qid", "qtext", k = 3, k1 = 1.25, b = 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(indexed == direct && indexed.nonEmpty)
    // the scale claim: the pushed term-IN filter prunes index FILES via
    // the bucket partition — a query batch reads a fraction of storage
    val allFiles = pTbl.scan().planFiles().size
    val probed = pTbl.scan(predicates = Seq(graft.table.InPred("term",
      Seq("apple", "zebra", "banana")))).planFiles().size
    assert(probed < allFiles,
      s"term buckets did not prune: $probed of $allFiles files")
    // the vocabulary guard is LOUD, not truncating
    val e = intercept[graft.InvalidDataError] {
      CorpusOps.bm25SearchIndexed(pTbl.toDF(spark), sTbl.toDF(spark),
        queries, "qid", "qtext", k = 3, maxQueryTerms = 1)
    }
    assert(e.getMessage.contains("distinct terms"))
  }

  test("appendToBm25Index: incremental == full rebuild, pruning survives, dup guard throws") {
    val base = Seq(
      (1L, "apple banana cherry apple"),
      (2L, "banana banana banana banana banana banana"),
      (4L, "the the the the the the the the")).toDF("doc_id", "text")
    val delta = Seq(
      (3L, "apple zebra"),
      (5L, "zebra quagga okapi"),
      (6L, "date elderberry fig grape hazelnut")).toDF("doc_id", "text")
    val full = base.unionByName(delta)
    val queries = Seq((100L, "apple zebra"), (200L, "banana")).toDF("qid", "qtext")
    val (bPost, bStats) = CorpusOps.bm25Index(base, "doc_id", "text")
    val wh = java.nio.file.Files.createTempDirectory("graft-bm25-inc-spec").toString
    val cat = new graft.catalog.HadoopCatalog(wh)
    val pSchema = graft.types.SparkSchemaConverter.fromSpark(bPost.schema)
    val pTbl = cat.createTable("postings", pSchema,
      partitionSpec = graft.meta.PartitionSpec(0, Seq(graft.meta.PartitionField(
        pSchema.fieldByName("term").get.id, 1000, "term_bucket", "bucket[8]"))))
    pTbl.append(bPost)
    val sTbl = cat.createTable("stats",
      graft.types.SparkSchemaConverter.fromSpark(bStats.schema))
    sTbl.append(bStats)
    val (dPost, mStats) = CorpusOps.appendToBm25Index(
      pTbl.toDF(spark), sTbl.toDF(spark), delta, "doc_id", "text")
    pTbl.append(dPost)
    sTbl.overwrite(mStats)
    // merged stats == full-rebuild stats, including the exact int totals
    val (fullPost, fullStats) = CorpusOps.bm25Index(full, "doc_id", "text")
    assert(sTbl.toDF(spark).collect().toSeq == fullStats.collect().toSeq)
    // incrementally maintained postings == full rebuild (set equality —
    // posting rows are per-document and delta docs are new)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("term"),
        r.getAs[Long]("tf"), r.getAs[Long]("dl"))
    assert(pTbl.toDF(spark).collect().map(key).toSet ==
      fullPost.collect().map(key).toSet)
    // search over the maintained index == search over a from-scratch one
    val viaInc = CorpusOps.bm25SearchIndexed(pTbl.toDF(spark), sTbl.toDF(spark),
        queries, "qid", "qtext", k = 3, k1 = 1.25, b = 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val viaFull = CorpusOps.bm25Search(fullPost, fullStats,
        queries, "qid", "qtext", k = 3, k1 = 1.25, b = 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(viaInc == viaFull && viaInc.nonEmpty)
    // the term-IN manifest pruning survives the append: a probe over a
    // strict term subset plans fewer files than the whole table
    val allFiles = pTbl.scan().planFiles().size
    val probed = pTbl.scan(predicates = Seq(graft.table.InPred("term",
      Seq("apple", "zebra", "banana")))).planFiles().size
    assert(probed < allFiles,
      s"term buckets did not prune after append: $probed of $allFiles files")
    // re-indexing an already-indexed document is a silent df corruption —
    // the guard is LOUD
    val e = intercept[graft.InvalidDataError] {
      CorpusOps.appendToBm25Index(pTbl.toDF(spark), sTbl.toDF(spark),
        Seq((3L, "apple zebra")).toDF("doc_id", "text"), "doc_id", "text")
    }
    assert(e.getMessage.contains("already"))
  }

  test("trainCharTrigramLm/scoreWithLm: Laplace floor for unseen, cross-corpus parity") {
    val clean = Seq((1L, "abcabc"), (2L, "abcd")).toDF("doc_id", "text")
    val model = TextOps.trainCharTrigramLm(clean, "text")
    val m = model.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // trigrams of abcabc: abc bca cab abc ; of abcd: abc bcd
    assert(m == Map("abc" -> 3L, "bca" -> 1L, "cab" -> 1L, "bcd" -> 1L))
    val t = m.values.sum.toDouble // 6
    val v = m.size.toDouble       // 4
    val test = Seq((10L, "abc"), (11L, "xyz"), (12L, "ab"), (13L, "abcx"))
      .toDF("doc_id", "text")
    val out = TextOps.scoreWithLm(test, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    def lp(c: Long) = math.log((c + 1.0) / (t + v))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out(10L) == ((1L, r6(lp(3)))))           // in-model trigram
    assert(out(11L) == ((1L, r6(lp(0)))))           // unseen -> count-0 floor
    assert(out(12L)._1 == 0L && out(12L)._2.isNaN)  // too short -> NULL score
    assert(out(13L) == ((2L, r6((lp(3) + lp(0)) / 2.0)))) // mixed
    // the floor scores strictly below every in-model trigram
    assert(out(11L)._2 < out(10L)._2)

    // the captured map-only (stream-safe) form scores identically to the
    // broadcast-join batch form, with a shuffle-free plan
    val (counts, denom) = TextOps.collectLmModel(model)
    assert(denom == t + v)
    val local = test.select($"doc_id",
      TextOps.scoreWithLmLocal($"text", counts, denom).as("s"))
    val localOut = local.collect().map(r => r.getLong(0) -> {
      val s = r.getStruct(1)
      (s.getLong(0), if (s.isNullAt(1)) Double.NaN else r6(s.getDouble(1)))
    }).toMap
    assert(Seq(10L, 11L, 13L).forall(id => localOut(id) == out(id)))
    assert(localOut(12L)._1 == 0L && localOut(12L)._2.isNaN)
    val lplan = local.queryExecution.executedPlan.toString
    assert(!lplan.contains("Exchange"), s"expected map-only plan:\n$lplan")

    // an EMPTY trained model (nothing long enough to train on) degrades
    // to null scores like the batch form — not a crash
    val emptyModel = TextOps.trainCharTrigramLm(
      Seq((1L, "ab")).toDF("doc_id", "text"), "text")
    val (ec, ed) = TextOps.collectLmModel(emptyModel)
    assert(ec.isEmpty && ed == 0.0)
    val degraded = test.select($"doc_id",
        TextOps.scoreWithLmLocal($"text", ec, ed).as("s"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    assert(degraded(10L).getLong(0) == 1L && degraded(10L).isNullAt(1))
    assert(degraded(12L).getLong(0) == 0L && degraded(12L).isNullAt(1))
  }

  test("mmrSelect: NaN-poisoned candidates degrade to array order, never crash") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    val good = new GenericArrayData(Array(1f, 0f))
    val bad = new GenericArrayData(Array(Float.NaN, 1f))
    // one clean candidate + two whose scores are NaN: after the clean pick,
    // every remaining value is NaN and the strict > never selects — the
    // guard must fall back to array order instead of indexing picked(-1)
    val arr = new GenericArrayData(Array[Any](
      new GenericInternalRow(Array[Any](0.9d, good)),
      new GenericInternalRow(Array[Any](Double.NaN, bad)),
      new GenericInternalRow(Array[Any](Double.NaN, bad))))
    val sel = graft.functions.BucketUtil.mmrSelect(arr, 3, 0.5)
    val picks = (0 until sel.numElements()).map(sel.getInt)
    assert(picks == Seq(0, 1, 2))
  }

  test("trainCharTrigramLm caps: minCount/maxVocab prune, collectLmModel guards") {
    val corpus = Seq((1L, "abcabc"), (2L, "abcd")).toDF("doc_id", "text")
    // trigram counts: abc->3, bca->1, cab->1, bcd->1

    // prune threshold 1 == unpruned (bitwise-identical model)
    val unpruned = TextOps.trainCharTrigramLm(corpus, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val pruned1 = TextOps.trainCharTrigramLm(corpus, "text", minCount = 1L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pruned1 == unpruned)

    // minCount drops the singleton tail
    val floored = TextOps.trainCharTrigramLm(corpus, "text", minCount = 2L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(floored == Map("abc" -> 3L))

    // maxVocab keeps top-V by (count desc, trigram asc) — deterministic cut
    val topV = TextOps.trainCharTrigramLm(corpus, "text", maxVocab = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(topV == Map("abc" -> 3L, "bca" -> 1L))

    // a pruned model scores through the UNCHANGED consumers: pruned
    // trigrams hit the Laplace count-0 floor like any unseen trigram
    val scored = TextOps.scoreWithLm(
        Seq((10L, "bca")).toDF("doc_id", "text"), "doc_id", "text",
        TextOps.trainCharTrigramLm(corpus, "text", minCount = 2L))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val r6 = (x: Double) => math.rint(x * 1e6) / 1e6
    assert(scored(10L) == r6(math.log(1.0 / (3 + 1)))) // t=3, V=1, c(bca)=0

    // the capture guard is LOUD, not truncating: an over-vocabulary model
    // must be pruned at train time, not silently cut at capture
    val model = TextOps.trainCharTrigramLm(corpus, "text") // 4 rows
    val e = intercept[graft.InvalidDataError] {
      TextOps.collectLmModel(model, maxModelRows = 3)
    }
    assert(e.getMessage.contains("prune at train time"))
    // at or under the bound the capture is complete and exact
    val (rows, denom) = TextOps.collectLmModel(model, maxModelRows = 4)
    assert(rows.length == 4 && denom == 10.0) // total 6 + V 4
  }

  test("contaminatedSpans: leaked passages cut from every doc, rest survives") {
    val leak = (1 to 10).map(i => s"q$i").mkString(" ") // 10-token benchmark item
    val corpus = Seq(
      (1L, s"intro text here $leak outro text tail words"), // leak mid-doc
      (2L, s"$leak"),                                       // doc IS the leak
      (3L, "totally clean document with original words"),   // untouched
      (4L, s"$leak and again $leak")                        // two hits merge/cut
    ).toDF("doc_id", "text")
    val test = Seq(leak).toDF("text")

    val spans = DedupOps.contaminatedSpans(corpus, "doc_id", "text", test,
        "text", w = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // doc 1: leak occupies tokens 4..13 -> grams 4..6 start there, span 4..13
    assert(spans.contains((1L, 4, 13)))
    // doc 2: the whole doc
    assert(spans.contains((2L, 1, 10)))
    // doc 3 clean
    assert(!spans.exists(_._1 == 3L))

    val out = DedupOps.removeContaminatedSpans(corpus, "doc_id", "text",
        test, "text", w = 8)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == (("intro text here outro text tail words", 7L)))
    assert(out(2L) == (("", 0L)))
    assert(out(3L) == (("totally clean document with original words", 6L)))
    // doc 4: both leak occurrences go; the 2-token bridge has no
    // 8-gram fully inside a leak so it stays
    assert(out(4L) == (("and again", 2L)))
  }

  test("BPE: hand-traced merges, lossless roundtrip, Zipf compression, stream-safe plan") {
    import graft.functions.BpeUtil
    // corpus: "low" x5, "lower" x2, "newest" x6, "widest" x3 — the
    // Sennrich paper's classic example shape
    val freq = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = BpeUtil.train(freq, numMerges = 10)
    // first merge must be the most frequent pair: (e,s) with count 9
    // (newest x6 + widest x3); then (es,t) 9, then (est,</w>) 9
    assert(merges.take(3).toSeq == Seq(("e", "s"), ("es", "t"), ("est", "</w>")))
    val ranks = {
      val m = new java.util.HashMap[String, Integer]()
      merges.zipWithIndex.foreach { case ((a, b), i) => m.put(a + " " + b, i) }
      m
    }
    // "lowest" was never a training word but reuses learned subwords:
    // rank order applies (e,s)(es,t)(est,</w>) then (l,o)(lo,w)
    assert(BpeUtil.encodeWord("lowest", ranks).toSeq == Seq("low", "est</w>"))
    // lossless roundtrip on arbitrary words incl. unseen characters
    for (w <- Seq("low", "lower", "newest", "widest", "lowest", "zzz", "a",
        "née", "x1y2")) {
      val subs = BpeUtil.encodeWord(w, ranks)
      assert(subs.mkString.stripSuffix("</w>") == w, s"roundtrip of $w")
    }

    // column form over a DataFrame: counts consistent + deterministic
    val docs = Seq((1L, "low lower newest"), (2L, ""), (3L, "newest newest"))
      .toDF("doc_id", "text")
    val out = docs.select($"doc_id",
        TextOps.bpeEncode($"text", merges).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(2L).isEmpty)
    // "newest" is a whole learned unit after 10 merges
    assert(out(3L) == Seq("newest</w>", "newest</w>"))
    // "lower" shares low but e/r stay characters
    assert(out(1L) == Seq("low</w>", "low", "e", "r", "</w>", "newest</w>"))
    // trained-corpus text compresses well below characters
    val real = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val m2 = TextOps.trainBpe(real, "text", numMerges = 200)
    val stats = real.select(
        size(TextOps.bpeEncode($"text", m2)).as("bpe"),
        length($"text").as("chars"),
        size(TextOps.tokens($"text")).as("ws"))
      .agg(sum("bpe"), sum("chars"), sum("ws")).collect()(0)
    val (bpe, chars, ws) = (stats.getLong(0), stats.getLong(1), stats.getLong(2))
    assert(bpe < chars / 2, s"BPE $bpe should compress chars $chars")
    assert(bpe >= ws, s"BPE $bpe can never go below one token per word $ws")
    // map-only: no exchange in the encode plan
    val plan = real.select(TextOps.bpeEncode($"text", m2))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected map-only plan:\n$plan")
  }

  test("heavyHitters: exact at the threshold, partition-invariant, minimal capacity") {
    // 1000 rows: "a" x400, "b" x200, "c" x100 (exactly 1/10), "d" x99
    // (just under), 201 singletons
    val toks = Seq.fill(400)("a") ++ Seq.fill(200)("b") ++
      Seq.fill(100)("c") ++ Seq.fill(99)("d") ++
      (0 until 201).map(i => s"x$i")
    assert(toks.size == 1000)
    val df = toks.toDF("term")
    def run(d: org.apache.spark.sql.DataFrame, cap: Int = 0) =
      CorpusOps.heavyHitters(d, "term", num = 1L, den = 10L, capacity = cap)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Map("a" -> 400L, "b" -> 200L, "c" -> 100L)
    assert(run(df) == want)                    // c (exactly n/10) in, d out
    assert(run(df.repartition(13)) == want)    // summary-merge invariance
    assert(run(df.repartition(1)) == want)
    assert(run(df, cap = 10) == want)          // minimal guaranteed capacity
    // capacity below the guarantee is rejected loudly, not silently lossy
    intercept[IllegalArgumentException](run(df, cap = 5))
    // nulls are not rows: threshold denominator counts non-null only
    val withNulls = df.unionByName(
      Seq.fill(9000)(null.asInstanceOf[String]).toDF("term"))
    assert(run(withNulls) == want)
    // empty input -> empty output with the right schema
    val empty = run(df.where("term = 'nope'"))
    assert(empty.isEmpty)
  }

  test("pageRank: plain-Scala power-iteration parity, dangling mass conserved") {
    // 1 <-> 2 hub pair, 3/4 feed 1, 5 is DANGLING (only appears as dst)
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 1L), (4L, 1L), (1L, 5L),
      (3L, 1L) /* parallel edge collapses */).toDF("src", "dst")
    val got = GraphOps.pageRank(edges, "src", "dst", iters = 5, damping = 0.875)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // reference: same formula, plain Scala
    val e = Set((1L, 2L), (2L, 1L), (3L, 1L), (4L, 1L), (1L, 5L))
    val nodes = e.flatMap { case (a, b) => Seq(a, b) }
    val out = e.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val n = nodes.size.toDouble
    val d = 0.875
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 5) {
      val r0 = r
      // toSeq everywhere: mapping a Set through the rank fn would DEDUPE
      // equal contributions (nodes 3 and 4 contribute identical values)
      // 2^-24 dyadic floor on every summed addend, mirroring GraphOps
      def q24(x: Double) = math.floor(x * 16777216.0) / 16777216.0
      val dm = nodes.toSeq.filterNot(out.contains).map(v => q24(r0(v))).sum
      r = nodes.toSeq.map { v =>
        val c = e.toSeq.filter(_._2 == v)
          .map { case (s, _) => q24(r0(s) / out(s)) }.sum
        v -> ((1.0 - d) / n + d * (c + dm / n))
      }.toMap
    }
    assert(got.keySet == nodes)
    nodes.foreach { v =>
      assert(math.abs(got(v) - r(v)) < 1e-12, s"node $v: ${got(v)} vs ${r(v)}")
    }
    // mass conserved and the in-hub 1 dominates
    assert(math.abs(got.values.sum - 1.0) < 3e-5) // dyadic floor leaks <= (edges+nodes)*2^-24*iters
    assert(got(1L) == got.values.max)
    assert(got(4L) == got.values.min) // nothing links to 4
  }

  test("personalizedPageRank: plain-Scala parity; seeds absorb the teleport") {
    // 1 <-> 2 hub pair, 3/4 feed 1, 5 is DANGLING
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 1L), (4L, 1L), (1L, 5L))
      .toDF("src", "dst")
    val seeds = Seq(3L, 4L)
    val got = GraphOps.personalizedPageRank(edges, "src", "dst",
        seeds.map(_.asInstanceOf[Any]), iters = 5, damping = 0.875)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val e = Set((1L, 2L), (2L, 1L), (3L, 1L), (4L, 1L), (1L, 5L))
    val nodes = e.flatMap { case (a, b) => Seq(a, b) }
    val out = e.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val d = 0.875
    def t(v: Long) = if (seeds.contains(v)) 1.0 / seeds.size else 0.0
    var r = nodes.map(v => v -> t(v)).toMap
    def q24(x: Double) = math.floor(x * 16777216.0) / 16777216.0
    for (_ <- 1 to 5) {
      val r0 = r
      val dm = nodes.toSeq.filterNot(out.contains).map(v => q24(r0(v))).sum
      r = nodes.toSeq.map { v =>
        val c = e.toSeq.filter(_._2 == v)
          .map { case (s, _) => q24(r0(s) / out(s)) }.sum
        v -> ((1.0 - d) * t(v) + d * (c + dm * t(v)))
      }.toMap
    }
    assert(got.keySet == nodes)
    nodes.foreach { v =>
      assert(math.abs(got(v) - r(v)) < 1e-12, s"node $v: ${got(v)} vs ${r(v)}")
    }
    // mass conserved (all seeds are graph nodes), and the seed-adjacent
    // hub outranks the global-PageRank favourite ordering change: node 1
    // collects the seeds' teleport directly
    assert(math.abs(got.values.sum - 1.0) < 3e-5) // dyadic floor leaks <= (edges+nodes)*2^-24*iters
    assert(got(1L) == got.values.max)
    // a node unreachable from the seeds except via teleport decay gets
    // strictly less than under uniform PageRank's floor
    assert(got(2L) > 0.0 && got(5L) > 0.0)
  }

  test("hits: plain-Scala parity; hubs and authorities separate") {
    // 3 and 4 point at both 1 and 2 (pure hubs); 1 and 2 are authorities;
    // 5 dangles off 1
    val edges = Seq((3L, 1L), (3L, 2L), (4L, 1L), (4L, 2L), (1L, 5L))
      .toDF("src", "dst")
    val got = GraphOps.hits(edges, "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap

    val e = Set((3L, 1L), (3L, 2L), (4L, 1L), (4L, 2L), (1L, 5L))
    val nodes = e.flatMap { case (a, b) => Seq(a, b) }
    var hub = nodes.map(_ -> 1.0).toMap
    var auth = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to 3) {
      auth = nodes.toSeq.map(v =>
        v -> e.toSeq.filter(_._2 == v).map(ed => hub(ed._1)).sum).toMap
      hub = nodes.toSeq.map(v =>
        v -> e.toSeq.filter(_._1 == v).map(ed => auth(ed._2)).sum).toMap
    }
    val sh = hub.values.sum
    val sa = auth.values.sum
    assert(got.keySet == nodes)
    nodes.foreach { v =>
      assert(math.abs(got(v)._1 - hub(v) / sh) < 1e-12, s"hub $v")
      assert(math.abs(got(v)._2 - auth(v) / sa) < 1e-12, s"auth $v")
    }
    // structure: 3/4 are the top hubs with ZERO authority; 1/2 the top
    // authorities; normalized columns each sum to 1
    assert(got(3L)._1 == got.values.map(_._1).max && got(3L)._2 == 0.0)
    assert(got(4L)._1 == got(3L)._1)
    assert(got(1L)._2 == got.values.map(_._2).max)
    assert(math.abs(got.values.map(_._1).sum - 1.0) < 1e-9)
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-9)
  }

  test("pageRank: exactly one driver action per iteration") {
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 1L), (4L, 1L), (1L, 5L))
      .toDF("src", "dst")
    // count driver ACTIONS (query executions) — under AQE one action spans
    // several Spark jobs, so QueryExecutionListener is the stable unit;
    // events flow through the async bus, so poll until the count settles
    def actionsFor(iters: Int): Int = {
      val counter = new java.util.concurrent.atomic.AtomicInteger
      val names = new java.util.concurrent.ConcurrentLinkedQueue[String]
      val l = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = { names.add(funcName); counter.incrementAndGet() }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            error: Exception): Unit = ()
      }
      spark.listenerManager.register(l)
      try {
        GraphOps.pageRank(edges, "src", "dst", iters = iters).count()
        var last = -1
        while (counter.get != last) { last = counter.get; Thread.sleep(200) }
        info(s"iters=$iters actions: " + scala.jdk.CollectionConverters
          .CollectionHasAsScala(names).asScala.groupBy(identity)
          .map { case (k, v) => s"$k=${v.size}" }.mkString(", "))
        counter.get
      } finally spark.listenerManager.unregister(l)
    }
    val oneIter = actionsFor(1)
    val fourIters = actionsFor(4)
    // setup + teardown actions are identical across runs; the delta is the
    // per-iteration cost: ONE action — the dangling-mass aggregate, whose
    // scan doubles as the lazy next-ranks leaf materialization (the r17
    // internal-row leaf no longer fires a separate conversion execution)
    assert(fourIters - oneIter == 3,
      s"expected 1 action/iteration (delta 3), got ${fourIters - oneIter} " +
        s"($oneIter @ 1 iter, $fourIters @ 4 iters)")
  }

  test("labelPropagation: exactly one driver action per iteration") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L))
      .toDF("src", "dst")
    // same QueryExecutionListener protocol as the pageRank action audit
    def actionsFor(iters: Int): Int = {
      val counter = new java.util.concurrent.atomic.AtomicInteger
      val l = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = counter.incrementAndGet()
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            error: Exception): Unit = ()
      }
      spark.listenerManager.register(l)
      try {
        GraphOps.labelPropagation(edges, "src", "dst", iters = iters).count()
        var last = -1
        while (counter.get != last) { last = counter.get; Thread.sleep(200) }
        counter.get
      } finally spark.listenerManager.unregister(l)
    }
    val oneIter = actionsFor(1)
    val fourIters = actionsFor(4)
    // the only per-round work is the next-labels persisted leaf, which
    // now costs ONE tracked action: its eager count (the internal-row
    // plan-truncating leaf no longer fires a conversion execution)
    assert(fourIters - oneIter == 3,
      s"expected 1 action/iteration (delta 3), got ${fourIters - oneIter} " +
        s"($oneIter @ 1 iter, $fourIters @ 4 iters)")
  }

  test("topKBinaryQuant: exact at full rerank depth; useful recall at depth 32") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count().toInt
    val q = emb.where("vec_id < 4")
    val plain = SimilarityOps.topKBruteForce(emb, "vec_id", "embedding",
        q, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    // rerank depth = corpus size: candidates are ALL vectors, the cosine
    // rerank IS brute force
    val full = SimilarityOps.topKBinaryQuant(emb, "vec_id", "embedding",
        q, "vec_id", "embedding", k = 5, rerank = n)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    assert(full == plain)
    // the real config: sign-bit Hamming candidates at depth 32 keep most
    // of the true top-5
    val bq = SimilarityOps.topKBinaryQuant(emb, "vec_id", "embedding",
        q, "vec_id", "embedding", k = 5, rerank = 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val truth = plain.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val recall = truth.keys.toSeq.map(qid =>
      (bq(qid) & truth(qid)).size.toDouble / truth(qid).size).sum / truth.size
    assert(recall >= 0.5, s"BQ recall collapsed: $recall")
    // each query returns exactly k distinct ids, self always found (its
    // Hamming distance to itself is 0 and cosine is 1)
    assert(bq.values.forall(_.size == 5))
    assert(bq.forall { case (qid, ids) => ids.contains(qid) })
    // empty corpus vectors are unencodable: they silently never become
    // candidates (no sequence(0,-1) crash), everything else still ranks
    val withEmpty = emb.limit(50).select($"vec_id", $"embedding")
      .unionByName(Seq((9999L, Array.empty[Float])).toDF("vec_id", "embedding"))
    val r = SimilarityOps.topKBinaryQuant(withEmpty, "vec_id", "embedding",
        withEmpty.where("vec_id = 0"), "vec_id", "embedding", k = 3, rerank = 8)
      .collect().map(_.getLong(1))
    assert(r.length == 3 && !r.contains(9999L))
  }

  test("topKDiverse: lambda=1 equals exact top-k; lambda<1 trades score for diversity") {
    // lambda = 1 reproduces topKBruteForce exactly on the real fixture
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.where("vec_id < 4")
    val plain = SimilarityOps.topKBruteForce(emb, "vec_id", "embedding",
        q, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    val mmr1 = SimilarityOps.topKDiverse(emb, "vec_id", "embedding",
        q, "vec_id", "embedding", k = 5, candidates = 24, lambda = 1.0)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    assert(mmr1 == plain)

    // constructed diversity case: a at 10 deg, b at 20 deg (crowds a),
    // c at 80 deg; query at 0 deg. Plain top-2 = (a, b); at lambda=0.3
    // the redundancy penalty flips the second pick to c.
    def v(deg: Double) = Array(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val corpus = Seq((10L, v(10)), (20L, v(20)), (80L, v(80)))
      .toDF("vec_id", "embedding")
    val query = Seq((0L, v(0))).toDF("vec_id", "embedding")
    def picks(lambda: Double) = SimilarityOps.topKDiverse(
        corpus, "vec_id", "embedding", query, "vec_id", "embedding",
        k = 2, candidates = 3, lambda = lambda)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(picks(1.0) == Seq(10L, 20L))
    assert(picks(0.3) == Seq(10L, 80L))
  }

  test("randomProject: plain-Scala parity, partition-invariance, zero shuffle") {
    val vecs = (0L until 40L).map { id =>
      (id, Array.tabulate(8)(i => ((id * 31 + i * 17) % 13 - 6).toFloat / 4f))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val out = SimilarityOps.randomProject(df, "vec_id", "embedding",
        outDim = 4, seed = 7L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap

    // the exact formula, re-derived in plain Scala
    def sign(i: Int, j: Int): Double = {
      val m = 2147483647L
      val h1 = (16807L * ((i * 4099L + j * 8191L + 8L) % m)) % m
      if ((16807L * h1) % m < m / 2) -1.0 else 1.0
    }
    vecs.foreach { case (id, v) =>
      val want = Array.tabulate(4) { j =>
        v.indices.map(i => v(i).toDouble * sign(i, j)).sum / 2.0
      }
      assert(out(id).toArray.sameElements(want), s"vec $id")
    }
    // signs are roughly balanced (not constant, not alternating-degenerate)
    val signs = for (i <- 0 until 64; j <- 0 until 16) yield sign(i, j)
    val neg = signs.count(_ < 0)
    assert(neg > 64 * 16 * 3 / 10 && neg < 64 * 16 * 7 / 10, s"neg=$neg")
    // partitioning does not change the (exact dyadic) values
    val re = SimilarityOps.randomProject(df.repartition(7), "vec_id",
        "embedding", outDim = 4, seed = 7L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(vecs.forall { case (id, _) => re(id) == out(id) })
    // empty vector -> NULL projection, and the plan is map-only
    val empty = Seq((99L, Array.empty[Float])).toDF("vec_id", "embedding")
    assert(SimilarityOps.randomProject(empty, "vec_id", "embedding", 4)
      .collect().head.isNullAt(1))
    val plan = SimilarityOps.randomProject(df, "vec_id", "embedding", 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
  }

  test("zipf slope: ~-1 on a planted power law, partition-invariant") {
    import graft.ops.CorpusOps
    // token w_r appears floor(512/r) times, r = 1..16: an exact-ish
    // power law whose ln-ln regression slope must sit near -1
    val words = (1 to 16).flatMap(r => Seq.fill(512 / r)(s"w$r"))
    val df = Seq((1L, "z", words.mkString(" "))).toDF("id", "lang", "text")
    val out = CorpusOps.zipfSlope(df, "lang", "text", k = 16).collect()
    assert(out.length == 1 && out(0).getLong(1) == 16L)
    val slope = out(0).getDouble(2)
    assert(slope > -1.1 && slope < -0.9, s"planted power law: slope=$slope")
    // a flat (uniform) vocabulary must flatten the slope toward 0
    val flat = Seq((1L, "z", (1 to 16).flatMap(r =>
      Seq.fill(32)(s"w$r")).mkString(" "))).toDF("id", "lang", "text")
    val s0 = CorpusOps.zipfSlope(flat, "lang", "text", k = 16)
      .collect()(0).getDouble(2)
    assert(s0 == 0.0, s"uniform vocabulary must be slope 0, got $s0")
    // fixed-point term sums: identical output on any layout
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val a = CorpusOps.zipfSlope(docs, "lang", "text").collect().toSet
    val b = CorpusOps.zipfSlope(docs.repartition(7), "lang", "text")
      .collect().toSet
    assert(a == b, "slope must be partition-invariant")
  }

  test("power iteration: partition-invariant, unit norm, dominant direction") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val v = SimilarityOps.powerIterationFit(emb, "embedding", dim = 64, iters = 4)
    // fixed-point per-dim sums: BITWISE identical iterate on any layout
    val vRepart = SimilarityOps.powerIterationFit(
      emb.repartition(11), "embedding", dim = 64, iters = 4)
    assert(v.toSeq == vRepart.toSeq,
      "floored contributions must make the iterate partition-invariant")
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-9, s"iterate must be unit norm, got $norm")
    // Cauchy–Schwarz: |projection| <= ||x|| for every vector
    val rows = emb.select($"embedding",
      SimilarityOps.principalProjection($"embedding", v).as("p")).collect()
    assert(rows.forall { r =>
      val x = r.getSeq[Float](0)
      math.abs(r.getDouble(1)) <=
        math.sqrt(x.map(f => f.toDouble * f.toDouble).sum) + 1e-9
    })
    // the power iterate explains at least as much second moment as the
    // best single BASIS direction (it dominates its own init e_0, and
    // 4 rounds only improve the Rayleigh quotient up to the fixed-point
    // floor, which is orders below this margin)
    val proj2 = rows.map(r => r.getDouble(1) * r.getDouble(1)).sum
    val basis2 = (0 until 64).map(j =>
      rows.map { r => val x = r.getSeq[Float](0)(j).toDouble; x * x }.sum).max
    assert(proj2 >= basis2 * 0.999,
      s"dominant direction must not lose to a basis axis: $proj2 vs $basis2")
    intercept[IllegalArgumentException] {
      SimilarityOps.powerIterationFit(emb, "embedding", dim = 64, iters = 0)
    }
  }

  test("logistic-regression trainer: partition-invariant, learning, guarded") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"lang", $"text")
    val isEn = when($"lang" === "en", lit(1.0)).otherwise(lit(0.0))
    val w = TextOps.trainLogReg(docs, "text", isEn, iters = 2)
    // fixed-point gradient sums: BITWISE identical weights on any layout
    val wRepart = TextOps.trainLogReg(docs.repartition(13), "text", isEn, iters = 2)
    assert(w.toSeq == wRepart.toSeq,
      "floored gradient sums must make training partition-invariant")
    assert(w.exists(_ != 0.0), "two iterations must move off the origin")
    // every score is a probability; NULL only for NULL text
    val scored = docs.select(isEn.as("y"),
      TextOps.scoreLogReg($"text", w).as("p"), $"text").collect()
    assert(scored.forall(r => (r.isNullAt(1) && r.isNullAt(2)) ||
      (r.getDouble(1) > 0.0 && r.getDouble(1) < 1.0)))
    // gradient ASCENT on the log-likelihood: positives must average a
    // higher predicted probability than negatives after two steps
    val (pos, neg) = scored.filter(!_.isNullAt(1)).partition(_.getDouble(0) == 1.0)
    val meanP = (rs: Array[org.apache.spark.sql.Row]) =>
      rs.map(_.getDouble(1)).sum / rs.length
    assert(pos.nonEmpty && neg.nonEmpty && meanP(pos) > meanP(neg),
      s"en-mean ${meanP(pos)} must exceed non-en-mean ${meanP(neg)}")
    // bad shapes refuse
    intercept[IllegalArgumentException] {
      TextOps.scoreLogReg($"text", Array(1.0, 2.0))
    }
    intercept[IllegalArgumentException] {
      TextOps.trainLogReg(docs, "text", isEn, iters = 0)
    }
  }

  test("cluster-balanced sample: exact budgets, members only, reproducible") {
    import graft.ops.{CorpusOps, SimilarityOps}
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val asg = SimilarityOps.kmeans(emb, "vec_id", "embedding", k = 4, iters = 1)
    val members = asg.collect()
      .groupBy(_.getLong(1)).map { case (c, rs) => c -> rs.map(_.getLong(0)).toSet }
    val pick = CorpusOps.weightedSample(asg, "vec_id", "cluster",
        lit(1.0d), k = 3, seed = "cbt")
      .collect().groupBy(_.getLong(0))
    // every cluster contributes exactly min(3, |cluster|), ranks 1..n,
    // and only its own members
    members.foreach { case (c, ids) =>
      val rows = pick.getOrElse(c, Array.empty)
      assert(rows.length == math.min(3, ids.size), s"cluster $c budget")
      assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to rows.length),
        s"cluster $c ranks must be contiguous")
      assert(rows.map(_.getLong(1)).forall(ids), s"cluster $c foreign id")
    }
    // RNG-free: the same seed reproduces the identical selection; a new
    // seed is a fresh draw (clusters big enough that equality is ~0)
    val again = CorpusOps.weightedSample(asg, "vec_id", "cluster",
        lit(1.0d), k = 3, seed = "cbt")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == pick.values.flatten
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
    val reseeded = CorpusOps.weightedSample(asg, "vec_id", "cluster",
        lit(1.0d), k = 3, seed = "cbt2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(reseeded != again, "a new seed must be a fresh draw")
  }
}
