package graft

import graft.catalog.MemoryCatalog
import graft.table.ArrowExport
import graft.types._
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.scalatest.funsuite.AnyFunSuite

/** Arrow record-batch export (§2.2 parity with the reference's
  * `scan.to_arrow` / `arrow_c_stream`): Arrow → rows equals collect. */
class ArrowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = Schema(0, Seq(
    NestedField(1, "id", ILong, required = true),
    NestedField(2, "name", IString),
    NestedField(3, "price", IDecimal(9, 2)),
    NestedField(4, "score", IDouble),
    NestedField(5, "flag", IBoolean),
    NestedField(6, "day", IDate)))

  test("scan → Arrow batches → values equal collect") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val tbl = cat.createTable("arrow_t", schema)
    val df = Seq(
      (1L, "a", BigDecimal("1.50"), 0.5, true, java.sql.Date.valueOf("2020-01-01")),
      (2L, null, BigDecimal("2.25"), -1.0, false, java.sql.Date.valueOf("2021-06-15")),
      (3L, "c", null, 9.75, true, null))
      .toDF("id", "name", "price", "score", "flag", "day")
    tbl.append(df)

    val expected = tbl.toDF(spark).orderBy("id").collect()
    val allocator = new RootAllocator()
    val roots = ArrowExport.toBatches(tbl.toDF(spark).orderBy("id"), schema, allocator)
    try {
      assert(roots.map(_.getRowCount).sum == 3)
      // arrow schema carries names, nullability, and the iceberg field ids
      val aschema = roots.head.getSchema
      assert(aschema.getFields.size() == 6)
      assert(aschema.getFields.get(0).getMetadata.get("PARQUET:field_id") == "1")
      assert(!aschema.getFields.get(0).isNullable && aschema.getFields.get(1).isNullable)

      val rows = roots.flatMap { root =>
        val id = root.getVector("id").asInstanceOf[BigIntVector]
        val name = root.getVector("name").asInstanceOf[VarCharVector]
        val price = root.getVector("price").asInstanceOf[DecimalVector]
        val score = root.getVector("score").asInstanceOf[Float8Vector]
        val flag = root.getVector("flag").asInstanceOf[BitVector]
        val day = root.getVector("day").asInstanceOf[DateDayVector]
        (0 until root.getRowCount).map { i =>
          (id.get(i),
            if (name.isNull(i)) null else new String(name.get(i), "UTF-8"),
            if (price.isNull(i)) null else price.getObject(i),
            score.get(i),
            flag.get(i) == 1,
            if (day.isNull(i)) null else java.time.LocalDate.ofEpochDay(day.get(i).toLong))
        }
      }
      val want = expected.map { r =>
        (r.getLong(0),
          if (r.isNullAt(1)) null else r.getString(1),
          if (r.isNullAt(2)) null else r.getDecimal(2),
          r.getDouble(3),
          r.getBoolean(4),
          if (r.isNullAt(5)) null
          else r.get(5) match {
            case d: java.sql.Date => d.toLocalDate
            case d: java.time.LocalDate => d
          })
      }.toSeq
      assert(rows == want)
    } finally {
      roots.foreach(_.close())
      allocator.close()
    }
  }

  test("nested types are rejected with UnsupportedFeatureError") {
    val nested = Schema(0, Seq(
      NestedField(1, "xs", IList(2, IInt, elementRequired = false))))
    assertThrows[UnsupportedFeatureError](ArrowExport.arrowSchema(nested))
  }
}
