package graft

import graft.ops.SimilarityOps
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based check for margin-based pair mining: random vector sets
  * vs an INDEPENDENT plain-Scala reference implementing the Artetxe &
  * Schwenk ratio margin with the engine's exact arithmetic contract
  * (double-accumulated cosine over float inputs in the kernel's
  * dot/sqrt(na*nb) operation order, 16-frac-bit quantization before
  * density averaging, mean over neighbors present, (margin desc, id)
  * ranking). Deterministic: fixed generator seeds. */
class MarginPropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val genVec: Gen[Array[Float]] = for {
    cs <- Gen.listOfN(8, Gen.choose(-64, 64))
  } yield cs.map(c => (c / 64.0f)).toArray

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  private def q16(c: Double): Double = math.floor(c * 65536.0) / 65536.0

  private def refMargin(corpus: Seq[(Long, Array[Float])],
                        queries: Seq[(Long, Array[Float])],
                        k: Int, navg: Int, candidates: Int)
      : Seq[(Long, Long, Double, Int)] = {
    val scored = for ((qid, qv) <- queries; (cid, cv) <- corpus)
      yield (qid, cid, cosine(cv, qv))
    def avgTop(xs: Seq[Double]): Double = {
      val top = xs.map(q16).sorted(Ordering[Double].reverse).take(navg)
      top.sum / top.size
    }
    val fwd = queries.map { case (qid, _) =>
      qid -> avgTop(scored.filter(_._1 == qid).map(_._3))
    }.toMap
    val cand = queries.flatMap { case (qid, _) =>
      scored.filter(_._1 == qid)
        .sortBy { case (_, cid, c) => (-c, cid) }.take(candidates)
    }
    val bwd = cand.map(_._2).distinct.map { cid =>
      val cv = corpus.find(_._1 == cid).get._2
      cid -> avgTop(queries.map { case (_, qv) => cosine(cv, qv) })
    }.toMap
    cand.flatMap { case (qid, cid, c) =>
      val denom = fwd(qid) + bwd(cid)
      if (denom > 0) Some((qid, cid, q16(c) / (denom / 2.0))) else None
    }.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      rows.sortBy { case (_, cid, m) => (-m, cid) }.take(k).zipWithIndex
        .map { case ((qid, cid, m), r) =>
          (qid, cid, math.rint(m * 1e6) / 1e6 + 0.0, r + 1) }
    }.sortBy(r => (r._1, r._4))
  }

  test("marginMineTopK equals the plain-Scala reference on random vectors") {
    for (s <- 1 to 4) {
      val params = Gen.Parameters.default
      val corpus = (0L until 25L).map(i =>
        (i, genVec.pureApply(params, Seed(2000L * s + i))))
      val queries = corpus.take(5)
      val expected = refMargin(corpus, queries, k = 4, navg = 3,
        candidates = 10)
      val got = SimilarityOps.marginMineTopK(
          corpus.toDF("vec_id", "embedding"), "vec_id", "embedding",
          queries.toDF("vec_id", "embedding"), "vec_id", "embedding",
          k = 4, navg = 3, candidates = 10)
        .orderBy("query_id", "rank").collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
          r.getAs[Double]("margin"), r.getAs[Int]("rank"))).toSeq
      assert(got == expected,
        s"seed $s: margins diverged\n engine: $got\n ref:    $expected")
    }
  }
}
