package graft

import graft.catalog.MemoryCatalog
import graft.meta.MetadataJson
import graft.types._
import org.scalatest.funsuite.AnyFunSuite

/** Column default values (ref `test/create_table_test.rb:4-20`): missing
  * column on append fills write_default, else null; defaults survive the
  * metadata JSON round-trip. */
class DefaultsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("write_default fills missing column on append; null without one") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val schema = Schema(0, Seq(
      NestedField(1, "id", ILong, required = true),
      NestedField(2, "status", IString, required = false,
        writeDefault = Some("active")),
      NestedField(3, "note", IString, required = false)))
    val tbl = cat.createTable("with_defaults", schema)
    tbl.append(Seq(1L, 2L).toDF("id"))
    val rows = tbl.toDF(spark).orderBy("id").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("active", "active"))
    assert(rows.forall(_.isNullAt(2)))
  }

  test("defaults round-trip through metadata JSON") {
    val schema = Schema(0, Seq(
      NestedField(1, "n", IInt, required = false,
        initialDefault = Some(7), writeDefault = Some(42)),
      NestedField(2, "s", IString, required = false, writeDefault = Some("x"))))
    val meta = graft.meta.TableMetadata.create("/tmp/wh/d", schema,
      graft.meta.PartitionSpec.Unpartitioned, graft.meta.SortOrder.Unsorted, Map.empty)
    val back = MetadataJson.read(MetadataJson.write(meta))
    val f = back.currentSchema.fields
    assert(f.head.initialDefault.contains(7) && f.head.writeDefault.contains(42))
    assert(f(1).writeDefault.contains("x"))
  }
}
