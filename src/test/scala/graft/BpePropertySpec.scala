package graft

import graft.ops.CorpusOps
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks for BPE merge training and application: random
  * [a-z] corpora vs an INDEPENDENT plain-Scala reference implementing
  * Sennrich merge training (frequency-weighted word types, greedy
  * left-to-right non-overlapping application, (count desc, pair asc)
  * tie-break). Deterministic: generators run from fixed seeds. */
class BpePropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // short words over a 3-letter alphabet force heavy pair collisions,
  // repeated-pair words ('aaab', 'banana'-likes), and count ties —
  // exactly the regimes where encoding/tie-break bugs hide
  private val genWord: Gen[String] = for {
    len <- Gen.frequency((3, Gen.choose(1, 3)), (5, Gen.choose(4, 6)))
    cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
  } yield cs.mkString

  private val genDocs: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 25)
    docs <- Gen.listOfN(n, Gen.choose(0, 8).flatMap(len =>
      Gen.listOfN(len, genWord).map(_.mkString(" "))))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  /** Greedy left-to-right non-overlapping single-merge application. */
  private def applyMerge(s: Vector[String], a: String,
                         b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += s(i); i += 1 }
    }
    out.result()
  }

  /** Reference trainer over frequency-weighted word types. */
  private def refTrain(words: Map[String, Long], iters: Int)
      : Seq[(String, String, Long)] = {
    var types = words.toVector.map { case (w, n) =>
      (w.map(_.toString).toVector, n)
    }
    val out = Seq.newBuilder[(String, String, Long)]
    var it = 0
    var done = false
    while (it < iters && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((syms, n) <- types; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += n
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.minBy { case ((x, y), n) => (-n, x, y) }
        out += ((a, b, c))
        types = types.map { case (syms, n) => (applyMerge(syms, a, b), n) }
        it += 1
      }
    }
    out.result()
  }

  private def wordCounts(docs: Seq[(Long, String)]): Map[String, Long] =
    docs.flatMap(_._2.trim.split("\\s+")).filter(_.matches("^[a-z]+$"))
      .groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }

  /** Reference BATCHED trainer: per round, greedy skip-on-conflict over
    * the (count desc, pair asc)-ordered pair list — a pair is skipped if
    * it shares a symbol with, or its merged symbol collides with, one
    * already accepted this round — then all accepted merges applied to
    * the PRE-round types. Mirrors the engine's maxMergesPerRound
    * semantics independently, including the 4·M candidate-list bound
    * (part of the documented contract: a conflict-heavy round may
    * accept fewer than M). */
  private def refTrainBatched(words: Map[String, Long], rounds: Int,
                              m: Int): Seq[(String, String, Long)] = {
    var types = words.toVector.map { case (w, n) =>
      (w.map(_.toString).toVector, n)
    }
    val out = Seq.newBuilder[(String, String, Long)]
    var round = 0
    var done = false
    while (round < rounds && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((syms, n) <- types; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += n
      val ordered = counts.toVector.sortBy { case ((x, y), n) => (-n, x, y) }
        .take(4 * m)
      val touched = scala.collection.mutable.Set.empty[String]
      val accepted = scala.collection.mutable.ArrayBuffer
        .empty[(String, String, Long)]
      for (((a, b), c) <- ordered if accepted.size < m)
        if (!touched(a) && !touched(b) && !touched(a + b)) {
          accepted += ((a, b, c))
          touched += a; touched += b; touched += (a + b)
        }
      if (accepted.isEmpty) done = true
      else {
        out ++= accepted
        // disjointness makes application order irrelevant — assert it:
        // forward and reverse application must land on the same types
        val fwd = types.map { case (s, n) =>
          (accepted.foldLeft(s) { case (v, (a, b, _)) => applyMerge(v, a, b) }, n)
        }
        val rev = types.map { case (s, n) =>
          (accepted.reverse.foldLeft(s) { case (v, (a, b, _)) =>
            applyMerge(v, a, b)
          }, n)
        }
        assert(fwd == rev,
          s"batched merges must commute, accepted=$accepted")
        types = fwd
        round += 1
      }
    }
    out.result()
  }

  test("bpeTrainMerges equals the plain-Scala Sennrich reference on random corpora") {
    for (seed <- 1 to 5) {
      val docs = genDocs.pureApply(Gen.Parameters.default, Seed(900L + seed))
      val words = wordCounts(docs)
      val expected = refTrain(words, 3)
      val got = CorpusOps.bpeTrainMerges(docs.toDF("doc_id", "text"),
          "text", iters = 3)
        .orderBy("iter").collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
      assert(got == expected,
        s"seed $seed: merges diverged\n engine: $got\n ref:    $expected\n corpus: $words")
      // BPE invariant: the max pair count never increases round over
      // round (every new pair instance contains a merged instance)
      val cnts = got.map(_._3)
      assert(cnts.zip(cnts.drop(1)).forall { case (x, y) => y <= x },
        s"seed $seed: pair counts must be non-increasing, got $cnts")
    }
  }

  test("batched bpeTrainMerges equals the plain-Scala batched reference") {
    for (seed <- 1 to 5; m <- Seq(2, 4)) {
      val docs = genDocs.pureApply(Gen.Parameters.default, Seed(1200L + seed))
      val words = wordCounts(docs)
      val expected = refTrainBatched(words, rounds = 3, m = m)
      val got = CorpusOps.bpeTrainMerges(docs.toDF("doc_id", "text"),
          "text", iters = 3, maxMergesPerRound = m)
        .orderBy("iter").collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
      assert(got == expected,
        s"seed $seed m=$m: merges diverged\n engine: $got\n ref:    " +
          s"$expected\n corpus: $words")
      // the iter column must be the application ordinal 1..N
      val iters = CorpusOps.bpeTrainMerges(docs.toDF("doc_id", "text"),
          "text", iters = 3, maxMergesPerRound = m)
        .orderBy("iter").collect().map(_.getLong(0)).toSeq
      assert(iters == (1L to iters.size.toLong),
        s"seed $seed m=$m: iter must be 1..N, got $iters")
    }
  }

  test("batched trainer at maxMergesPerRound=1 is exactly Sennrich") {
    for (seed <- 1 to 4) {
      val docs = genDocs.pureApply(Gen.Parameters.default, Seed(1300L + seed))
      val words = wordCounts(docs)
      val expected = refTrain(words, 4)
      val got = CorpusOps.bpeTrainMerges(docs.toDF("doc_id", "text"),
          "text", iters = 4, maxMergesPerRound = 1)
        .orderBy("iter").collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
      assert(got == expected,
        s"seed $seed: M=1 must equal Sennrich\n engine: $got\n ref: $expected")
    }
  }

  test("bpeSegmentStats equals reference segmentation with the learned merges") {
    for (seed <- 1 to 4) {
      val docs = genDocs.pureApply(Gen.Parameters.default, Seed(950L + seed))
      val words = wordCounts(docs)
      if (words.nonEmpty) {
        val merges = refTrain(words, 3).map { case (a, b, _) => (a, b) }
        val refSymbols = words.toSeq.map { case (w, n) =>
          val syms = merges.foldLeft(w.map(_.toString).toVector) {
            case (s, (a, b)) => applyMerge(s, a, b)
          }
          syms.size.toLong * n
        }.sum
        val refWords = words.values.sum
        val got = CorpusOps.bpeSegmentStats(
            docs.toDF("doc_id", "text").withColumn("g", col("doc_id") * 0),
            "g", "text", merges)
          .collect()
        assert(got.length == 1 && got(0).getLong(1) == refWords &&
          got(0).getLong(2) == refSymbols,
          s"seed $seed: (words, symbols) = " +
            s"(${got(0).getLong(1)}, ${got(0).getLong(2)}) " +
            s"vs ref ($refWords, $refSymbols)")
      }
    }
  }
}
