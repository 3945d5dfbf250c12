package graft

import graft.ops.JoinOps
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks for the temporal joins: random timelines vs a
  * plain-Scala reference for every (direction, allowExactMatches,
  * tolerance) combination; random intervals/bin widths vs the predicate
  * join. Deterministic: generators run from fixed seeds. */
class JoinPropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private case class L(id: Long, key: Int, t: Long)
  private case class R(key: Int, t: Long, v: Long)

  // duplicate (key, t) on the LEFT is legal; the right side is deduped so
  // the match target is unique (the operator's documented contract)
  private val genLefts: Gen[List[L]] = for {
    n <- Gen.choose(0, 60)
    rows <- Gen.listOfN(n, for {
      key <- Gen.choose(0, 4)
      t <- Gen.choose(0L, 50L)
    } yield (key, t))
  } yield rows.zipWithIndex.map { case ((k, t), i) => L(i.toLong, k, t) }

  private val genRights: Gen[List[R]] = for {
    n <- Gen.choose(0, 40)
    rows <- Gen.listOfN(n, for {
      key <- Gen.choose(0, 4)
      t <- Gen.choose(0L, 50L)
      v <- Gen.choose(0L, 999L)
    } yield (key, t, v))
  } yield rows.groupBy(r => (r._1, r._2)).map { case ((k, t), g) =>
    R(k, t, g.map(_._3).max)
  }.toList

  private def reference(lefts: Seq[L], rights: Seq[R], direction: String,
                        exact: Boolean, tol: Option[Double]): Map[Long, Option[R]] =
    lefts.map { l =>
      val cands = rights.filter(_.key == l.key)
      def ok(r: R, back: Boolean): Boolean =
        if (back) (if (exact) r.t <= l.t else r.t < l.t)
        else (if (exact) r.t >= l.t else r.t > l.t)
      val bw = cands.filter(ok(_, back = true)).sortBy(_.t).lastOption
      val fw = cands.filter(ok(_, back = false)).sortBy(_.t).headOption
      val m = direction match {
        case "backward" => bw
        case "forward" => fw
        case "nearest" => (bw, fw) match {
          case (Some(b), Some(f)) =>
            if (math.abs(l.t - b.t) <= math.abs(f.t - l.t)) Some(b) else Some(f)
          case (b, f) => b.orElse(f)
        }
      }
      l.id -> m.filter(r => tol.forall(math.abs((l.t - r.t).toDouble) <= _))
    }.toMap

  test("asofJoin equals the reference for every direction/exactness/tolerance") {
    for (seed <- 1 to 5) {
      val lefts = genLefts.pureApply(Gen.Parameters.default, Seed(100L + seed))
      val rights = genRights.pureApply(Gen.Parameters.default, Seed(200L + seed))
      val lDf = lefts.map(l => (l.id, l.key, l.t)).toDF("id", "key", "t")
      val rDf = rights.map(r => (r.key, r.t, r.v)).toDF("key", "t", "v")
      for {
        direction <- Seq("backward", "forward", "nearest")
        exact <- Seq(true, false)
        tol <- Seq(None, Some(7.0))
      } {
        val want = reference(lefts, rights, direction, exact, tol)
        val got = JoinOps.asofJoin(lDf, rDf, "t", "t", by = Seq("key"),
            direction = direction, tolerance = tol,
            allowExactMatches = exact)
          .select("id", "right_t", "right_v")
          .collect()
          .map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) None
             else Some((r.getLong(1), r.getLong(2)))))
          .toMap
        assert(got.keySet == want.keySet,
          s"row set drifted (seed=$seed dir=$direction exact=$exact tol=$tol)")
        for ((id, w) <- want) {
          assert(got(id) == w.map(r => (r.t, r.v)),
            s"mismatch id=$id seed=$seed dir=$direction exact=$exact tol=$tol: " +
              s"got ${got(id)}, want $w")
        }
      }
    }
  }

  test("rangeJoin equals the predicate join for random intervals and bin widths") {
    for (seed <- 1 to 5) {
      val pts = Gen.listOfN(40, Gen.choose(-100.0, 100.0))
        .pureApply(Gen.Parameters.default, Seed(300L + seed))
        .zipWithIndex.map { case (x, i) => (i.toLong, x) }
      val ivs = Gen.listOfN(15, for {
        lo <- Gen.choose(-100.0, 100.0)
        len <- Gen.choose(0.0, 40.0)
      } yield (lo, lo + len))
        .pureApply(Gen.Parameters.default, Seed(400L + seed))
        .zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
      val pDf = pts.toDF("pid", "x")
      val iDf = ivs.toDF("iid", "lo", "hi")
      val want = (for {
        (pid, x) <- pts
        (iid, lo, hi) <- ivs
        if x >= lo && x <= hi
      } yield (pid, iid)).toSet
      for (bw <- Seq(1.5, 10.0, 200.0)) {
        val got = JoinOps.rangeJoin(pDf, "x", iDf, "lo", "hi", binWidth = bw)
          .select("pid", "iid").as[(Long, Long)].collect()
        assert(got.length == got.toSet.size,
          s"duplicate pairs at binWidth=$bw seed=$seed")
        assert(got.toSet == want, s"pair drift at binWidth=$bw seed=$seed")
      }
    }
  }

  test("intervalJoin equals the overlap predicate join for random intervals") {
    for (seed <- 1 to 5) {
      def gen(n: Int, s: Long) = Gen.listOfN(n, for {
        lo <- Gen.choose(-100.0, 100.0)
        len <- Gen.choose(0.0, 50.0)
      } yield (lo, lo + len)).pureApply(Gen.Parameters.default, Seed(s))
        .zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
      val as = gen(20, 700L + seed)
      val bs = gen(25, 800L + seed)
      val want = (for {
        (aid, alo, ahi) <- as
        (bid, blo, bhi) <- bs
        if alo <= bhi && blo <= ahi
      } yield (aid, bid)).toSet
      val aDf = as.toDF("a_id", "a_lo", "a_hi")
      val bDf = bs.toDF("b_id", "b_lo", "b_hi")
      for (bw <- Seq(4.0, 30.0, 1000.0)) {
        val got = JoinOps.intervalJoin(aDf, "a_lo", "a_hi",
            bDf, "b_lo", "b_hi", binWidth = bw)
          .select("a_id", "b_id").as[(Long, Long)].collect()
        assert(got.length == got.toSet.size,
          s"duplicate overlap pairs at binWidth=$bw seed=$seed")
        assert(got.toSet == want, s"overlap drift at binWidth=$bw seed=$seed")
      }
    }
  }

  test("skewJoin equals the plain join for random multiplicities and salts") {
    for (seed <- 1 to 3) {
      val ls = Gen.listOfN(50, Gen.choose(0, 6))
        .pureApply(Gen.Parameters.default, Seed(500L + seed))
        .zipWithIndex.map { case (k, i) => (i.toLong, k) }
      val rs = Gen.listOfN(20, for {
        k <- Gen.choose(0, 6); v <- Gen.choose(0, 99)
      } yield (k, v)).pureApply(Gen.Parameters.default, Seed(600L + seed))
      val lDf = ls.toDF("lid", "key")
      val rDf = rs.toDF("key", "v")
      val plain = lDf.join(rDf, Seq("key")).select("lid", "v")
        .as[(Long, Int)].collect().sorted.toSeq
      for (salts <- Seq(1, 3, 16)) {
        val got = JoinOps.skewJoin(lDf, rDf, Seq("key"), salts = salts)
          .select("lid", "v").as[(Long, Int)].collect().sorted.toSeq
        assert(got == plain, s"skewJoin drift at salts=$salts seed=$seed")
      }
    }
  }
}
