package graft

import graft.ops.CorpusOps
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks for BM25 retrieval and heavy hitters: random
  * corpora vs plain-Scala references. Deterministic: generators run from
  * fixed seeds. */
class RetrievalPropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // small Zipf-ish vocabulary: low word indexes are much more likely
  private val genWord: Gen[String] =
    Gen.frequency(
      (8, Gen.choose(0, 2)), (4, Gen.choose(3, 8)), (1, Gen.choose(9, 29)))
      .map(i => s"w$i")

  private val genDocs: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 40)
    docs <- Gen.listOfN(n, Gen.choose(0, 12).flatMap(len =>
      Gen.listOfN(len, genWord).map(_.mkString(" "))))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def bm25Reference(docs: Seq[(Long, String)],
                            queries: Seq[(Long, String)], k: Int,
                            maxDf: Long): Map[(Long, Int), (Long, Double)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.trim.split("\\s+").filter(_.nonEmpty).toSeq
    }.toMap
    val n = docs.size.toDouble
    val tot = toks.values.map(_.size).sum
    val avgdl = tot.toDouble / n
    def df(t: String) = toks.values.count(_.contains(t)).toLong
    val out = scala.collection.mutable.Map.empty[(Long, Int), (Long, Double)]
    queries.foreach { case (qid, qtext) =>
      val qts = qtext.trim.split("\\s+").filter(_.nonEmpty).distinct
        .filter(t => df(t) >= 1 && df(t) <= maxDf)
      val scored = toks.toSeq.flatMap { case (docId, d) =>
        val s = qts.filter(d.contains).map { t =>
          val tf = d.count(_ == t).toDouble
          val dfl = df(t).toDouble
          math.log(1.0 + (n - dfl + 0.5) / (dfl + 0.5)) *
            (tf * 2.25) / (tf + 1.25 * (0.25 + 0.75 * d.size / avgdl))
        }.sum
        if (s == 0.0) None else Some((docId, math.rint(s * 1e6) / 1e6))
      }
      scored.sortBy { case (id, s) => (-s, id) }.take(k).zipWithIndex
        .foreach { case ((id, s), r) => out((qid, r + 1)) = (id, s) }
    }
    out.toMap
  }

  test("bm25TopK equals the reference on random corpora, with and without maxDf") {
    for (seed <- 1 to 4) {
      val docs = genDocs.pureApply(Gen.Parameters.default, Seed(500L + seed))
      val queries = docs.filter(_._1 % 3 == 0).take(5)
        .map { case (id, t) =>
          (id + 1000L, t.split("\\s+").take(3).mkString(" "))
        }
        .filter(_._2.nonEmpty)
      if (queries.nonEmpty) {
        val corpusDf = docs.toDF("doc_id", "text")
        val queriesDf = queries.toDF("qid", "qtext")
        for (maxDf <- Seq(Long.MaxValue, math.max(1L, docs.size / 2L))) {
          val want = bm25Reference(docs, queries, k = 4, maxDf)
          val got = CorpusOps.bm25TopK(corpusDf, "doc_id", "text",
              queriesDf, "qid", "qtext", k = 4, k1 = 1.25, b = 0.75,
              maxDf = maxDf)
            .collect()
            .map(r => (r.getLong(0), r.getInt(3)) ->
              (r.getLong(1), r.getDouble(2)))
            .toMap
          assert(got.keySet == want.keySet,
            s"result keys drifted (seed=$seed maxDf=$maxDf): " +
              s"got ${got.keySet.toSeq.sorted}, want ${want.keySet.toSeq.sorted}")
          for ((key, (wid, ws)) <- want) {
            val (gid, gs) = got(key)
            assert(gid == wid && math.abs(gs - ws) < 1e-9,
              s"seed=$seed maxDf=$maxDf $key: got ($gid,$gs) want ($wid,$ws)")
          }
        }
      }
    }
  }

  test("bm25Index postings (map-only term_counts) == explode/groupBy reference") {
    import org.apache.spark.sql.functions._
    for (seed <- 1 to 4) {
      val docs = genDocs.pureApply(Gen.Parameters.default, Seed(700L + seed))
      val df = docs.toDF("doc_id", "text")
      val (postings, _) = CorpusOps.bm25Index(df, "doc_id", "text")
      // the pre-r17 two-exchange shape, as the reference
      val occ = df.select(col("doc_id"),
        explode(graft.ops.TextOps.tokens(col("text"))).as("term"))
      val ref = occ.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
        .withColumn("dl", sum("tf").over(
          org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      val key = (r: org.apache.spark.sql.Row) =>
        (r.getAs[Long]("doc_id"), r.getAs[String]("term"),
          r.getAs[Long]("tf"), r.getAs[Long]("dl"))
      assert(postings.collect().map(key).sorted.toSeq ==
        ref.collect().map(key).sorted.toSeq,
        s"postings drifted from the two-exchange reference (seed=$seed)")
    }
  }

  test("chunkBySentences (map-only kernel) == window/groupBy reference on whitespace-hostile docs") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // pieces chosen to exercise every token-count edge the kernel must
    // replicate bit-exactly: tabs/newlines adjacent to terminators (Spark
    // trim strips ASCII space ONLY, so '\t'-led sentences grow a leading
    // empty token), trailing whitespace (split keeps trailing empties),
    // terminator-only runs ("..." attaches to no sentence), empty docs
    val genPiece: Gen[String] = Gen.frequency(
      (6, genWord), (2, Gen.oneOf(".", "!", "?")),
      (4, Gen.oneOf(" ", "\n", "\t", "  ", ".\n", "! ", "\t.")),
      (1, Gen.oneOf("...", "??", "a.b", "", "\r\n", ". \t ")))
    val genDoc: Gen[String] = Gen.choose(0, 60)
      .flatMap(n => Gen.listOfN(n, genPiece).map(_.mkString(" ")))
    for (seed <- 1 to 6) {
      val docs = (1 to 30).map(i => (i.toLong,
        genDoc.pureApply(Gen.Parameters.default, Seed(1100L * seed + i))))
      val df = docs.toDF("doc_id", "text")
      val got = CorpusOps.chunkBySentences(df, "doc_id", "text", chunkTokens = 5)
      // the pre-r18 two-exchange shape (per-doc prefix-sum window +
      // (doc, chunk) collect_list groupBy), as the reference
      val sents = df.select(col("doc_id"),
          posexplode(graft.ops.TextOps.sentences(col("text"))))
        .select(col("doc_id"), (col("pos") + 1).as("sent_idx"),
          col("col").as("sentence"),
          size(graft.ops.TextOps.tokens(col("col"))).cast("long").as("n_toks"))
      val w = Window.partitionBy("doc_id").orderBy("sent_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
      val ref = sents.withColumn("chunk_idx",
          (coalesce(sum("n_toks").over(w), lit(0L)) / lit(5L)).cast("long"))
        .groupBy(col("doc_id"), col("chunk_idx"))
        .agg(array_join(transform(
            array_sort(collect_list(struct(col("sent_idx"), col("sentence")))),
            s => s.getField("sentence")), " ").as("text"),
          count(lit(1)).as("n_sentences"), sum("n_toks").as("n_tokens"))
      val key = (r: org.apache.spark.sql.Row) =>
        (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4))
      val g = got.collect().map(key).sorted.toSeq
      val rf = ref.collect().map(key).sorted.toSeq
      assert(g == rf, s"chunks drifted from the two-exchange reference (seed=$seed)")
      assert(g.nonEmpty, s"degenerate fixture (seed=$seed)")
    }
  }

  test("appendToBm25Index == full rebuild on random corpora and split points") {
    for (seed <- 1 to 4) {
      val docs = genDocs.pureApply(Gen.Parameters.default, Seed(900L + seed))
      if (docs.size >= 2) {
        val cut = 1 + ((seed * 7) % (docs.size - 1))
        val base = docs.take(cut).toDF("doc_id", "text")
        val delta = docs.drop(cut).toDF("doc_id", "text")
        val (bPost, bStats) = CorpusOps.bm25Index(base, "doc_id", "text")
        val (dPost, mStats) = CorpusOps.appendToBm25Index(
          bPost, bStats, delta, "doc_id", "text")
        val (fPost, fStats) = CorpusOps.bm25Index(
          docs.toDF("doc_id", "text"), "doc_id", "text")
        val key = (r: org.apache.spark.sql.Row) =>
          (r.getAs[Long]("doc_id"), r.getAs[String]("term"),
            r.getAs[Long]("tf"), r.getAs[Long]("dl"))
        assert(bPost.unionByName(dPost).collect().map(key).toSet ==
          fPost.collect().map(key).toSet, s"postings drifted (seed=$seed cut=$cut)")
        // the stats row must be BITWISE the rebuild's (incl. the double
        // division) — the whole point of carrying integer totals
        assert(mStats.collect().toSeq == fStats.collect().toSeq,
          s"stats drifted (seed=$seed cut=$cut)")
      }
    }
  }

  test("topKDiverse equals a plain-Scala greedy MMR reference on random vectors") {
    import graft.ops.SimilarityOps
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
    }
    for (seed <- 1 to 4) {
      val gen = Gen.listOfN(25, Gen.listOfN(6, Gen.choose(-1.0, 1.0)))
      val vecs = gen.pureApply(Gen.Parameters.default, Seed(900L + seed))
        .zipWithIndex.map { case (v, i) => (i.toLong, v.map(_.toFloat).toArray) }
      val corpus = vecs.toDF("vec_id", "embedding")
      val query = Seq((1000L, vecs.head._2)).toDF("vec_id", "embedding")
      for (lambda <- Seq(1.0, 0.7, 0.3)) {
        val got = SimilarityOps.topKDiverse(corpus, "vec_id", "embedding",
            query, "vec_id", "embedding", k = 6, candidates = 25, lambda)
          .orderBy("rank").collect().map(_.getLong(1)).toSeq

        // reference: sort candidates (score desc, id asc), greedy MMR with
        // position tie-break — the documented algorithm re-derived
        val scored = vecs.map { case (id, v) => (id, v, cos(v, vecs.head._2)) }
          .sortBy { case (id, _, s) => (-s, id) }
        val picked = scala.collection.mutable.ArrayBuffer.empty[Int]
        val maxSim = Array.fill(scored.size)(0.0)
        for (r <- 0 until 6) {
          var best = -1
          var bestVal = Double.NegativeInfinity
          for (j <- scored.indices if !picked.contains(j)) {
            val v = if (r == 0) scored(j)._3
              else lambda * scored(j)._3 - (1.0 - lambda) * maxSim(j)
            if (v > bestVal) { bestVal = v; best = j }
          }
          picked += best
          for (m <- scored.indices if !picked.contains(m)) {
            val s = cos(scored(m)._2, scored(best)._2)
            if (r == 0 || s > maxSim(m)) maxSim(m) = s
          }
        }
        val want = picked.map(scored(_)._1).toSeq
        assert(got == want, s"seed=$seed lambda=$lambda: got $got want $want")
      }
    }
  }

  test("pageRank matches the reference on random graphs with dangling nodes") {
    import graft.ops.GraphOps
    for (seed <- 1 to 3) {
      val edges = Gen.listOfN(60, for {
        a <- Gen.choose(0L, 19L); b <- Gen.choose(0L, 24L)
      } yield (a, b)).pureApply(Gen.Parameters.default, Seed(1100L + seed))
        .distinct
      val got = GraphOps.pageRank(edges.toDF("src", "dst"), "src", "dst",
          iters = 4, damping = 0.875)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

      val e = edges.toSet
      val nodes = e.toSeq.flatMap { case (a, b) => Seq(a, b) }.distinct
      val out = e.toSeq.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
      val n = nodes.size.toDouble
      var r = nodes.map(_ -> 1.0 / n).toMap
      def q24(x: Double) = math.floor(x * 16777216.0) / 16777216.0
      for (_ <- 1 to 4) {
        val r0 = r
        val dm = nodes.filterNot(out.contains).map(v => q24(r0(v))).sum
        r = nodes.map { v =>
          val c = e.toSeq.filter(_._2 == v)
            .map { case (s, _) => q24(r0(s) / out(s)) }.sum
          v -> (0.125 / n + 0.875 * (c + dm / n))
        }.toMap
      }
      assert(got.keySet == nodes.toSet, s"seed=$seed node set")
      nodes.foreach(v => assert(math.abs(got(v) - r(v)) < 1e-10,
        s"seed=$seed node $v: ${got(v)} vs ${r(v)}"))
      assert(math.abs(got.values.sum - 1.0) < 3e-5, s"seed=$seed mass") // dyadic-floor leak bound
    }
  }

  test("personalizedPageRank matches the reference on random graphs and seed sets") {
    import graft.ops.GraphOps
    for (seed <- 1 to 3) {
      val edges = Gen.listOfN(60, for {
        a <- Gen.choose(0L, 19L); b <- Gen.choose(0L, 24L)
      } yield (a, b)).pureApply(Gen.Parameters.default, Seed(2100L + seed))
        .distinct
      val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      // seed core: a deterministic subset of actual graph nodes
      val core = nodes.sorted.take(math.max(1, nodes.size / 5))
      val got = GraphOps.personalizedPageRank(edges.toDF("src", "dst"),
          "src", "dst", core.map(_.asInstanceOf[Any]), iters = 4, damping = 0.875)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

      val e = edges.toSet
      val out = e.toSeq.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
      def t(v: Long) = if (core.contains(v)) 1.0 / core.size else 0.0
      var r = nodes.map(v => v -> t(v)).toMap
      def q24(x: Double) = math.floor(x * 16777216.0) / 16777216.0
      for (_ <- 1 to 4) {
        val r0 = r
        val dm = nodes.filterNot(out.contains).map(v => q24(r0(v))).sum
        r = nodes.map { v =>
          val c = e.toSeq.filter(_._2 == v)
            .map { case (s, _) => q24(r0(s) / out(s)) }.sum
          v -> (0.125 * t(v) + 0.875 * (c + dm * t(v)))
        }.toMap
      }
      assert(got.keySet == nodes.toSet, s"seed=$seed node set")
      nodes.foreach(v => assert(math.abs(got(v) - r(v)) < 1e-10,
        s"seed=$seed node $v: ${got(v)} vs ${r(v)}"))
      // every seed is a graph node, so mass is conserved
      assert(math.abs(got.values.sum - 1.0) < 3e-5, s"seed=$seed mass") // dyadic-floor leak bound
    }
  }

  test("hits matches the reference on random graphs") {
    import graft.ops.GraphOps
    for (seed <- 1 to 3) {
      val edges = Gen.listOfN(60, for {
        a <- Gen.choose(0L, 19L); b <- Gen.choose(0L, 24L)
      } yield (a, b)).pureApply(Gen.Parameters.default, Seed(3100L + seed))
        .distinct
      val got = GraphOps.hits(edges.toDF("src", "dst"), "src", "dst", iters = 3)
        .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap

      val e = edges.toSet
      val nodes = e.toSeq.flatMap { case (a, b) => Seq(a, b) }.distinct
      var hub = nodes.map(_ -> 1.0).toMap
      var auth = nodes.map(_ -> 1.0).toMap
      for (_ <- 1 to 3) {
        auth = nodes.map(v =>
          v -> e.toSeq.filter(_._2 == v).map(ed => hub(ed._1)).sum).toMap
        hub = nodes.map(v =>
          v -> e.toSeq.filter(_._1 == v).map(ed => auth(ed._2)).sum).toMap
      }
      val sh = hub.values.sum
      val sa = auth.values.sum
      assert(got.keySet == nodes.toSet, s"seed=$seed node set")
      nodes.foreach { v =>
        assert(math.abs(got(v)._1 - (if (sh == 0) 0.0 else hub(v) / sh)) < 1e-10,
          s"seed=$seed hub $v")
        assert(math.abs(got(v)._2 - (if (sa == 0) 0.0 else auth(v) / sa)) < 1e-10,
          s"seed=$seed auth $v")
      }
    }
  }

  test("labelPropagation matches the plain-Scala synchronous LPA on random graphs") {
    import graft.ops.GraphOps
    for (seed <- 1 to 3) {
      val edges = Gen.listOfN(60, for {
        a <- Gen.choose(0L, 19L); b <- Gen.choose(0L, 24L)
      } yield (a, b)).pureApply(Gen.Parameters.default, Seed(4100L + seed))
        .distinct
      val got = GraphOps.labelPropagation(edges.toDF("src", "dst"),
          "src", "dst", iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      // reference: undirected, self-loops dropped from VOTING (a node
      // whose only edges are self-loops stays a singleton community),
      // synchronous rounds, argmax by (vote count desc, label asc)
      val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
        .filter { case (a, b) => a != b }.distinct
      val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      val voting = und.map(_._1).distinct
      val nbrs = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var lbl = voting.map(v => v -> v).toMap
      for (_ <- 1 to 3) {
        val l0 = lbl
        lbl = voting.map { v =>
          val counts = nbrs(v).groupBy(l0).view.mapValues(_.size).toMap
          v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
        }.toMap
      }
      assert(got.keySet == nodes.toSet, s"seed=$seed node set")
      nodes.foreach(v => assert(got(v) == lbl.getOrElse(v, v),
        s"seed=$seed node $v: got ${got(v)} want ${lbl.getOrElse(v, v)}"))
    }
    // a node whose ONLY edges are self-loops must surface as a singleton
    // community, not vanish (1<->2 oscillates back to self-labels in 2
    // synchronous rounds — the deterministic bipartite 2-cycle)
    val single = graft.ops.GraphOps.labelPropagation(
        Seq((5L, 5L), (1L, 2L)).toDF("src", "dst"), "src", "dst", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(single == Map(5L -> 5L, 1L -> 1L, 2L -> 2L), s"got $single")
  }

  test("heavyHitters equals the exact filter on random multisets and thresholds") {
    for (seed <- 1 to 4) {
      val terms = Gen.listOfN(300, genWord)
        .pureApply(Gen.Parameters.default, Seed(700L + seed))
      val df = terms.toDF("term")
      for ((num, den) <- Seq((1L, 20L), (1L, 8L), (3L, 100L))) {
        val n = terms.size.toLong
        val want = terms.groupBy(identity).view.mapValues(_.size.toLong)
          .filter { case (_, c) => c * den >= n * num }.toMap
        val got = CorpusOps.heavyHitters(df, "term", num, den)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(got == want, s"seed=$seed threshold=$num/$den")
        // partition-invariance of the mergeable sketch
        val got7 = CorpusOps.heavyHitters(df.repartition(7), "term", num, den)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(got7 == want, s"seed=$seed threshold=$num/$den repartitioned")
      }
    }
  }
}
