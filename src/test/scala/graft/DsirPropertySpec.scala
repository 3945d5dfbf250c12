package graft

import graft.ops.CorpusOps
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based check for DSIR selection: random corpora vs an
  * INDEPENDENT plain-Scala reference (java MessageDigest md5, explicit
  * add-1 smoothing, 16-frac-bit quantization, Gumbel keys, (key desc,
  * id asc) ranking). Deterministic: fixed generator seeds. */
class DsirPropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val genWord: Gen[String] = for {
    len <- Gen.choose(2, 5)
    cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c', 'd'))
  } yield cs.mkString

  private val genDocs: Gen[List[(Long, String, String)]] = for {
    n <- Gen.choose(4, 30)
    docs <- Gen.listOfN(n, for {
      len <- Gen.choose(0, 10)
      ws <- Gen.listOfN(len, genWord)
      lang <- Gen.oneOf("en", "xx", "fr")
    } yield (lang, ws.mkString(" ")))
  } yield docs.zipWithIndex.map { case ((l, t), i) => (i.toLong, l, t) }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def bigrams(text: String): Seq[String] = {
    val t = text.trim
    val toks = if (t.isEmpty) Array.empty[String] else t.split("\\s+")
    toks.toSeq.zip(toks.toSeq.drop(1)).map { case (a, b) => s"$a $b" }
  }

  private def refSelect(docs: Seq[(Long, String, String)], k: Int,
                        seed: String): Seq[(Long, Double, Long)] = {
    val B = 256
    def bucket(g: String) = Integer.parseInt(md5hex(g).substring(0, 2), 16)
    val cq = new Array[Long](B); val cp = new Array[Long](B)
    docs.foreach { case (_, lang, text) =>
      bigrams(text).foreach { g =>
        val b = bucket(g)
        cq(b) += 1; if (lang == "en") cp(b) += 1
      }
    }
    val tq = cq.sum.toDouble; val tp = cp.sum.toDouble
    val deltas = Array.tabulate(B) { b =>
      val d = math.log((cp(b) + 1).toDouble / (tp + B)) -
        math.log((cq(b) + 1).toDouble / (tq + B))
      math.floor(d * 65536.0) / 65536.0
    }
    val keyed = docs.map { case (id, _, text) =>
      val logw = bigrams(text).foldLeft(0.0)((acc, g) => acc + deltas(bucket(g)))
      val bk = Integer.parseInt(md5hex(s"$seed:$id").substring(0, 4), 16)
      val u = (bk.toDouble + 0.5) / 65536.0
      (id, logw, logw + (-math.log(-math.log(u))))
    }
    keyed.sortBy { case (id, _, key) => (-key, id) }.take(k).zipWithIndex
      .map { case ((id, lw, _), r) =>
        (id, math.rint(lw * 1e6) / 1e6 + 0.0, (r + 1).toLong) }
  }

  test("dsirSelect equals the plain-Scala reference on random corpora") {
    for (s <- 1 to 5) {
      val docs = genDocs.pureApply(Gen.Parameters.default, Seed(700L + s))
      val expected = refSelect(docs, k = 10, seed = "p1")
      val got = CorpusOps.dsirSelect(docs.toDF("doc_id", "lang", "text"),
          "doc_id", "text", col("lang") === "en", k = 10, seed = "p1")
        .orderBy("rank").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
      assert(got == expected,
        s"seed $s: selection diverged\n engine: $got\n ref:    $expected")
    }
  }
}
