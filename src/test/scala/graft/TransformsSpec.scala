package graft

import graft.functions.GraftFunctions
import graft.transforms._
import graft.types._
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Partition transforms: the Iceberg spec's published Appendix-B hash test
  * vectors (cross-writer compatibility depends on these exact values), the
  * truncate arithmetic (incl. negatives and decimals), the time transforms
  * (incl. pre-epoch floor semantics), the validity matrix the reference
  * asserts (`/root/reference/test/transforms_test.rb:4-59`), and JVM-eval vs
  * Catalyst-codegen parity for bucket/truncate. */
class TransformsSpec extends AnyFunSuite {

  // ------------------------------------- spec Appendix B known-answer vectors
  test("murmur3 spec test vectors") {
    assert(Murmur3.hashLong(34L) == 2017239379) // int & long hash identically
    assert(Murmur3.hashLong(17486L) == -653330422) // date 2017-11-16
    assert(Murmur3.hashLong(81068000000L) == -662762989) // time 22:31:08 µs
    assert(Murmur3.hashLong(1510871468000000L) == -2047944441) // ts 2017-11-16T22:31:08 µs
    assert(Murmur3.hashString("iceberg") == 1210000089)
    assert(Murmur3.hashBytes(Array[Byte](0, 1, 2, 3)) == -188683207)
    assert(Murmur3.hashDecimal(new java.math.BigDecimal("14.20")) == -500754589)
    assert(Murmur3.hashUuid(
      java.util.UUID.fromString("f79c3e09-677c-4bbd-a479-3f349cb785e7")) == 1488055340)
  }

  test("bucket value = (hash & Int.MaxValue) % n") {
    val b = BucketTransform(16)
    assert(b.apply(34, IInt) == (2017239379 & Int.MaxValue) % 16)
    assert(b.apply(34L, ILong) == b.apply(34, IInt)) // int/long agree (spec)
    assert(b.apply(null, ILong) == null)
  }

  // ----------------------------------------------------------- truncate
  test("truncate semantics") {
    val t10 = TruncateTransform(10)
    assert(t10.apply(7, IInt) == 0)
    assert(t10.apply(17L, ILong) == 10L)
    assert(t10.apply(-3, IInt) == -10) // floor, not toward zero (spec)
    assert(t10.apply(-10, IInt) == -10)
    assert(TruncateTransform(3).apply("iceberg", IString) == "ice")
    assert(TruncateTransform(9).apply("ice", IString) == "ice")
    // decimal: truncate the unscaled value (spec: scaled truncate)
    assert(TruncateTransform(50).apply(new java.math.BigDecimal("10.65"), IDecimal(9, 2))
      .asInstanceOf[java.math.BigDecimal].toPlainString == "10.50")
  }

  // ------------------------------------------------------ time transforms
  test("time transforms incl. pre-epoch floor") {
    val d = java.time.LocalDate.of(2017, 11, 16)
    assert(YearTransform.apply(d, IDate) == 47)
    assert(MonthTransform.apply(d, IDate) == 47 * 12 + 10)
    assert(DayTransform.apply(d, IDate) == 17486)
    val ts = java.time.LocalDateTime.of(2017, 11, 16, 22, 31, 8)
    assert(HourTransform.apply(ts, ITimestamp) == 1510871468L / 3600)
    // pre-epoch: floor division — 1969-12-31T23:00 is hour -1, not 0
    val pre = java.time.LocalDateTime.of(1969, 12, 31, 23, 0, 0)
    assert(HourTransform.apply(pre, ITimestamp) == -1)
    assert(YearTransform.apply(pre, ITimestamp) == -1)
    assert(MonthTransform.apply(pre, ITimestamp) == -1)
    assert(DayTransform.apply(pre, ITimestamp) == -1)
  }

  // ------------------------------------------------------ validity matrix
  test("validity matrix (ref transforms_test.rb)") {
    def spec(tr: String) = graft.meta.PartitionSpec(0,
      Seq(graft.meta.PartitionField(1, 1000, "b", tr)))
    def schemaOf(t: IType) = Schema(0, Seq(NestedField(1, "a", t, required = false)))
    def ok(tr: String, t: IType): Unit =
      graft.catalog.CatalogUtil.validateSpec(schemaOf(t), spec(tr))
    def bad(tr: String, t: IType): Unit =
      assertThrows[GraftError](graft.catalog.CatalogUtil.validateSpec(schemaOf(t), spec(tr)))

    ok("identity", IInt); ok("bucket[3]", IInt)
    ok("truncate[3]", IString); bad("truncate[3]", IDate)
    Seq("year", "month", "day", "hour").foreach { tr =>
      ok(tr, ITimestamp); bad(tr, IInt)
    }
    ok("year", IDate); ok("day", IDate); bad("hour", IDate)
    ok("void", IInt)
    ok("zorder[a,b]", IInt) // unknown transform: parse-preserving, any type
  }

  test("unknown transform is value-opaque (null, never prunes wrong)") {
    val u = Transform.parse("zorder[a,b]")
    assert(u.isInstanceOf[UnknownTransform])
    assert(u.apply(42, IInt) == null)
  }

  // --------------------------------------- JVM eval vs Catalyst codegen
  test("bucket/truncate expressions match JVM transform eval") {
    val spark = TestSpark.spark
    import spark.implicits._
    val values = Seq(-100L, -1L, 0L, 1L, 34L, 12345678L)
    val df = values.toDF("v").select(
      col("v"),
      GraftFunctions.iceberg_bucket(8, col("v")).as("b"),
      GraftFunctions.iceberg_truncate(10, col("v")).as("t"))
    df.collect().foreach { r =>
      val v = r.getLong(0)
      assert(r.getInt(1) == BucketTransform(8).apply(v, ILong))
      assert(r.getLong(2) == TruncateTransform(10).apply(v, ILong))
    }
    val sdf = Seq("iceberg", "ice", "spark-graft").toDF("s").select(
      col("s"), GraftFunctions.iceberg_truncate(3, col("s")).as("t"),
      GraftFunctions.iceberg_bucket(16, col("s")).as("b"))
    sdf.collect().foreach { r =>
      assert(r.getString(1) == TruncateTransform(3).apply(r.getString(0), IString))
      assert(r.getInt(2) == BucketTransform(16).apply(r.getString(0), IString))
    }
  }
}
