package graft

import graft.catalog.MemoryCatalog
import graft.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based append→scan round-trip over arbitrary typed rows
  * (SURVEY §5: the ScalaCheck analogue of `test/table_test.rb:54-99`).
  * Deterministic: generators are driven from fixed seeds. */
class RoundTripPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = Schema(0, Seq(
    NestedField(1, "id", ILong, required = true),
    NestedField(2, "flag", IBoolean, required = false),
    NestedField(3, "qty", IInt, required = false),
    NestedField(4, "amount", IDouble, required = false),
    NestedField(5, "price", IDecimal(9, 2), required = false),
    NestedField(6, "day", IDate, required = false),
    NestedField(7, "name", IString, required = false),
    NestedField(8, "payload", IBinary, required = false)))

  private case class R(id: Long, flag: Option[Boolean], qty: Option[Int],
                       amount: Option[Double], price: Option[BigDecimal],
                       day: Option[java.time.LocalDate], name: Option[String],
                       payload: Option[Array[Byte]])

  private val genRow: Gen[R] = for {
    id <- Gen.choose(0L, 1000000L)
    flag <- Gen.option(Gen.oneOf(true, false))
    qty <- Gen.option(Gen.choose(Int.MinValue, Int.MaxValue))
    amount <- Gen.option(Gen.frequency(9 -> Gen.choose(-1e9, 1e9), 1 -> Gen.const(0.0)))
    price <- Gen.option(Gen.choose(-9999999L, 9999999L)
      .map(c => BigDecimal(java.math.BigDecimal.valueOf(c, 2))))
    day <- Gen.option(Gen.choose(-30000L, 30000L).map(java.time.LocalDate.ofEpochDay))
    name <- Gen.option(Gen.alphaNumStr.map(_.take(40)))
    payload <- Gen.option(Gen.listOfN(8, Gen.choose(Byte.MinValue, Byte.MaxValue))
      .map(_.toArray))
  } yield R(id, flag, qty, amount, price, day, name, payload)

  test("arbitrary typed rows survive append → scan exactly") {
    val cat = new MemoryCatalog()
    for (n <- 1 to 3) {
      val rowList = Gen.listOfN(20, genRow)
        .pureApply(Gen.Parameters.default, Seed(42L + n))
      val rows: Seq[Map[String, Any]] = rowList.zipWithIndex.map { case (r, i) =>
        Map[String, Any]("id" -> (r.id * 100 + i)) ++
          r.flag.map("flag" -> _) ++ r.qty.map("qty" -> _) ++
          r.amount.map("amount" -> _) ++ r.price.map("price" -> _) ++
          r.day.map("day" -> _) ++ r.name.map("name" -> _) ++
          r.payload.map("payload" -> _)
      }
      val tbl = cat.createTable(s"prop_$n", schema)
      tbl.append(rows, spark)
      val got = tbl.toA(spark).sortBy(_("id").asInstanceOf[Long])
      val want = rows.sortBy(_("id").asInstanceOf[Long])
      assert(got.size == want.size)
      got.zip(want).foreach { case (g, w) =>
        assert(g("id") == w("id"))
        assert(g("flag") == w.getOrElse("flag", null))
        assert(g("qty") == w.getOrElse("qty", null))
        assert(g("amount") == w.getOrElse("amount", null))
        // decimal comes back as java.math.BigDecimal at scale 2
        val wantPrice = w.get("price")
          .map(p => p.asInstanceOf[BigDecimal].bigDecimal.setScale(2)).orNull
        assert(g("price") == wantPrice)
        val gotDay = g("day") match {
          case d: java.sql.Date => d.toLocalDate
          case other => other
        }
        assert(gotDay == w.get("day").orNull)
        assert(g("name") == w.getOrElse("name", null))
        (g("payload"), w.get("payload").orNull) match {
          case (gb: Array[Byte], wb: Array[Byte]) => assert(gb.sameElements(wb))
          case (gp, wp) => assert(gp == wp)
        }
      }
    }
  }
}
