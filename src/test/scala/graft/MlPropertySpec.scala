package graft

import graft.ops.{CorpusOps, SimilarityOps, TextOps}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks for the round-16 trainable-model tier: random
  * corpora/vector sets vs INDEPENDENT plain-Scala references that
  * re-implement the published definitions sequentially (one loop, no
  * Spark) — the fixed-point designs promise the distributed results
  * equal the sequential definitions BITWISE, so most comparisons below
  * are exact, not tolerant. Deterministic: generators run from fixed
  * seeds. */
class MlPropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val genWord: Gen[String] = for {
    len <- Gen.choose(1, 4)
    cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c', 'd'))
  } yield cs.mkString

  private val genDocs: Gen[List[(Long, String, Long)]] = for {
    n <- Gen.choose(2, 30)
    docs <- Gen.listOfN(n, for {
      len <- Gen.choose(0, 12)
      ws <- Gen.listOfN(len, genWord)
      y <- Gen.oneOf(0L, 1L)
    } yield (ws.mkString(" "), y))
  } yield docs.zipWithIndex.map { case ((t, y), i) => (i.toLong, t, y) }

  /** Whitespace tokens, mirroring TextOps.tokens (empty text -> none). */
  private def toks(text: String): Array[String] =
    if (text.trim.isEmpty) Array.empty else text.trim.split("\\s+")

  private def md5Nibble(tok: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (md.digest(tok.getBytes("UTF-8"))(0) & 0xff) >>> 4
  }

  test("unigram_entropy equals the plain definition on random arrays") {
    for (seed <- 1 to 40) {
      val words = Gen.listOf(genWord)
        .pureApply(Gen.Parameters.default, Seed(2000L + seed))
      val got = Seq(Tuple1(words)).toDF("toks")
        .select(graft.functions.GraftFunctions.unigram_entropy(col("toks")))
        .collect()(0).getDouble(0)
      val want =
        if (words.isEmpty) 0.0
        else {
          val n = words.length.toDouble
          val cs = words.groupBy(identity).values.map(_.length.toDouble)
          math.log(n) - cs.map(c => c * math.log(c)).sum / n
        }
      // summation ORDER differs between the kernel's hash map and the
      // reference's, so this one comparison is tolerant, not exact
      assert(math.abs(got - want) < 1e-9, s"seed=$seed got=$got want=$want")
    }
  }

  /** Sequential reference for TextOps.trainLogReg (same centered
    * features, same 2^-16 gradient flooring, same update arithmetic). */
  private def refLogReg(rows: Seq[(Double, Array[Long], Long)],
                        iters: Int, lr: Double): Array[Double] = {
    val w = Array.fill(17)(0.0)
    for (_ <- 0 until iters) {
      val s = Array.fill(17)(0L)
      var n = 0L
      for ((y, h, ntok) <- rows) {
        val nn = math.max(ntok, 1L).toDouble
        def x(j: Int): Double = h(j).toDouble * 16.0 / nn - 1.0
        var z = w(0) * x(0)
        for (j <- 1 until 16) z += w(j) * x(j)
        z += w(16)
        val zq = math.floor(z * 65536.0) / 65536.0
        val p = 1.0 / (1.0 + math.exp(-zq))
        for (j <- 0 until 16) s(j) += math.floor((y - p) * x(j) * 65536.0).toLong
        s(16) += math.floor((y - p) * 65536.0).toLong
        n += 1
      }
      for (j <- 0 until 17) w(j) = w(j) + lr * (s(j).toDouble / 65536.0 / n)
    }
    w
  }

  test("trainLogReg equals the sequential reference bitwise on random corpora") {
    for (seed <- 1 to 12) {
      val docs = genDocs.pureApply(Gen.Parameters.default, Seed(2100L + seed))
      val df = docs.toDF("id", "text", "y").repartition(5)
      val got = TextOps.trainLogReg(df, "text", col("y").cast("double"),
        iters = 3, lr = 2.0)
      val rows = docs.map { case (_, t, y) =>
        val h = Array.fill(16)(0L)
        toks(t).foreach(w => h(md5Nibble(w)) += 1L)
        (y.toDouble, h, toks(t).length.toLong)
      }
      val want = refLogReg(rows, iters = 3, lr = 2.0)
      assert(got.toSeq == want.toSeq, s"seed=$seed got=${got.toSeq} want=${want.toSeq}")
    }
  }

  /** Sequential reference for SimilarityOps.powerIterationFit. */
  private def refPower(vecs: Seq[Array[Float]], dim: Int,
                       iters: Int): Array[Double] = {
    var v = Array.tabulate(dim)(j => if (j == 0) 1.0 else 0.0)
    for (_ <- 0 until iters) {
      val s = Array.fill(dim)(0L)
      for (x <- vecs) {
        var d = v(0) * x(0).toDouble
        for (j <- 1 until dim) d += v(j) * x(j).toDouble
        for (j <- 0 until dim)
          s(j) += math.floor(d * x(j).toDouble * 16777216.0).toLong
      }
      val t = s.map(_.toDouble / 16777216.0)
      val norm = math.sqrt(t.foldLeft(0.0)((a, tj) => a + tj * tj))
      v = t.map(_ / norm)
    }
    v
  }

  test("powerIterationFit equals the sequential reference bitwise") {
    val genVecs: Gen[List[Array[Float]]] = for {
      n <- Gen.choose(2, 40)
      vs <- Gen.listOfN(n, Gen.listOfN(6,
        Gen.choose(-100, 100).map(_.toFloat / 64f)).map(_.toArray))
    } yield vs
    for (seed <- 1 to 12) {
      val vecs = genVecs.pureApply(Gen.Parameters.default, Seed(2200L + seed))
        // keep the e_0 component of the corpus nonzero so the first
        // iterate has a nonzero norm (an all-orthogonal corpus would
        // make BOTH sides 0/0 — the degenerate case is not under test)
        .map { v => if (v(0) == 0f) { v(0) = 0.25f }; v }
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding").repartition(3)
      val got = SimilarityOps.powerIterationFit(df, "embedding", dim = 6,
        iters = 3)
      val want = refPower(vecs, dim = 6, iters = 3)
      assert(got.toSeq == want.toSeq, s"seed=$seed")
    }
  }

  /** Sequential reference for powerIterationDeflatedFit. */
  private def refDeflated(vecs: Seq[Array[Float]], dim: Int,
                          v1: Array[Double], iters: Int): Array[Double] = {
    var u = Array.tabulate(dim)(j => if (j == 0) 1.0 else 0.0)
    def d1(x: Array[Float]): Double = {
      var d = v1(0) * x(0).toDouble
      for (j <- 1 until dim) d += v1(j) * x(j).toDouble
      d
    }
    for (_ <- 0 until iters) {
      val s = Array.fill(dim)(0L)
      for (x <- vecs) {
        val d = d1(x)
        def xd(j: Int): Double = x(j).toDouble - d * v1(j)
        var du = u(0) * xd(0)
        for (j <- 1 until dim) du += u(j) * xd(j)
        for (j <- 0 until dim)
          s(j) += math.floor(du * xd(j) * 16777216.0).toLong
      }
      val t = s.map(_.toDouble / 16777216.0)
      val norm = math.sqrt(t.foldLeft(0.0)((a, tj) => a + tj * tj))
      u = t.map(_ / norm)
    }
    u
  }

  test("powerIterationDeflatedFit equals the sequential reference bitwise") {
    val genVecs: Gen[List[Array[Float]]] = for {
      n <- Gen.choose(3, 30)
      vs <- Gen.listOfN(n, Gen.listOfN(5,
        Gen.choose(-100, 100).map(_.toFloat / 64f)).map(_.toArray))
    } yield vs
    for (seed <- 1 to 8) {
      val vecs = genVecs.pureApply(Gen.Parameters.default, Seed(2400L + seed))
        .map { v => if (v(0) == 0f) { v(0) = 0.25f }; if (v(1) == 0f) { v(1) = -0.5f }; v }
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding").repartition(3)
      val v1 = SimilarityOps.powerIterationFit(df, "embedding", dim = 5,
        iters = 3)
      val got = SimilarityOps.powerIterationDeflatedFit(df, "embedding",
        dim = 5, v1 = v1, iters = 3)
      val want = refDeflated(vecs, dim = 5, v1 = v1, iters = 3)
      assert(got.toSeq == want.toSeq, s"seed=$seed")
    }
  }

  /** Sequential reference for CorpusOps.zipfSlope (same top-k rank rule
    * and 2^-24 term flooring). */
  private def refZipf(texts: Seq[String], k: Int): Option[(Long, Double, Double)] = {
    val counts = texts.flatMap(toks).groupBy(identity)
      .map { case (t, xs) => (t, xs.length.toLong) }
    if (counts.isEmpty) return None
    val ranked = counts.toSeq
      .sortBy { case (t, c) => (-c, t) }.take(k)
      .zipWithIndex.map { case ((_, c), i) => ((i + 1).toDouble, c.toDouble) }
    var (fx, fy, fxy, fxx) = (0L, 0L, 0L, 0L)
    for ((r, c) <- ranked) {
      val x = math.log(r); val y = math.log(c)
      fx += math.floor(x * 16777216.0).toLong
      fy += math.floor(y * 16777216.0).toLong
      fxy += math.floor(x * y * 16777216.0).toLong
      fxx += math.floor(x * x * 16777216.0).toLong
    }
    val n = ranked.length.toDouble
    val (sx, sy, sxy, sxx) = (fx / 16777216.0, fy / 16777216.0,
      fxy / 16777216.0, fxx / 16777216.0)
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    def r6(d: Double) = BigDecimal(d)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    Some((ranked.length.toLong, r6(slope), r6(icept)))
  }

  test("zipfSlope equals the sequential reference on random corpora") {
    for (seed <- 1 to 12) {
      val docs = genDocs.pureApply(Gen.Parameters.default, Seed(2300L + seed))
      // need >= 2 vocabulary types or the OLS denominator is 0/0 on
      // both sides (not under test)
      val vocab = docs.flatMap(d => toks(d._2)).distinct
      if (vocab.length >= 2) {
        val df = docs.map(d => (d._1, "z", d._2)).toDF("id", "lang", "text")
          .repartition(4)
        val got = CorpusOps.zipfSlope(df, "lang", "text", k = 10).collect()
        val want = refZipf(docs.map(_._2), k = 10).get
        assert(got.length == 1)
        assert(got(0).getLong(1) == want._1, s"seed=$seed n_terms")
        assert(got(0).getDouble(2) == want._2,
          s"seed=$seed slope ${got(0).getDouble(2)} vs ${want._2}")
        assert(got(0).getDouble(3) == want._3,
          s"seed=$seed intercept ${got(0).getDouble(3)} vs ${want._3}")
      }
    }
  }
}
