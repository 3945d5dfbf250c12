package graft

import graft.catalog.MemoryCatalog
import graft.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema evolution on read (SURVEY §7.4, the PyIceberg-interop scenario of
  * `test/sql_test.rb:109-117`): another writer renames/drops/adds columns;
  * files written under the OLD schema must resolve through the CURRENT
  * schema by field id — renames follow, drops disappear, adds read null. */
class EvolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("old data files project through renamed/dropped/added columns by field id") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val v0 = Schema(0, Seq(
      NestedField(1, "a", IInt, required = false),
      NestedField(2, "b", IString, required = false)))
    val tbl = cat.createTable("evolving", v0)
    tbl.append(Seq((1, "one"), (2, "two")).toDF("a", "b")) // files under schema 0

    // simulate an external writer's schema evolution commit:
    // rename a→x (same id 1), drop b (id 2), add c long (id 3)
    val v1 = Schema(1, Seq(
      NestedField(1, "x", IInt, required = false),
      NestedField(3, "c", ILong, required = false)))
    val meta = tbl.refresh().metadata
    cat.commitTable(tbl.ident, meta, meta.copy(
      schemas = meta.schemas :+ v1, currentSchemaId = 1, lastColumnId = 3))
    tbl.refresh()
    assert(tbl.currentSchema.fields.map(_.name) == Seq("x", "c"))

    // new data lands under schema 1
    tbl.append(Seq((3, 30L)).toDF("x", "c"))

    val rows = tbl.toDF(spark).orderBy("x").collect()
    assert(tbl.toDF(spark).columns.toSeq == Seq("x", "c"))
    // old rows: a-values visible under the new name, c null; new row: c set
    assert(rows.map(r => (r.getInt(0), if (r.isNullAt(1)) null else r.getLong(1))).toSeq ==
      Seq((1, null), (2, null), (3, 30L)))
  }
}
