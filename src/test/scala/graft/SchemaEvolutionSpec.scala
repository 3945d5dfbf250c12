package graft

import graft.catalog.MemoryCatalog
import graft.meta.{PartitionField, PartitionSpec}
import graft.table.{EqPred, GtPred}
import graft.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema evolution (`Table.updateSchema`): the engine-side capability the
  * reference exercises through external writers (its interop test
  * `test/support/schema_changes.py` renames `a`→`c`, drops `b`, then
  * appends under the new schema). Reads resolve BY FIELD ID per write
  * schema, so evolved tables stay readable across every version. */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions.col

  private val schema = Schema(0, Seq(
    NestedField(1, "a", ILong, required = false),
    NestedField(2, "b", IInt, required = false)))

  test("interop-test shape: rename a->c, drop b, append under new schema") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val tbl = cat.createTable("events", schema)
    tbl.append(Seq((1L, 10), (2L, 20)).toDF("a", "b"))

    tbl.updateSchema().renameColumn("a", "c").deleteColumn("b").commit()

    assert(tbl.currentSchema.fields.map(_.name) == Seq("c"))
    assert(tbl.currentSchema.fieldByName("c").get.id == 1) // id preserved
    tbl.append(Seq(3L).toDF("c"))
    // old rows resolve under the new name; b is gone everywhere
    assert(tbl.toDF(spark).columns.toSeq == Seq("c"))
    assert(tbl.toDF(spark).select("c").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L))
    // two schema versions tracked; reload sees the evolution
    assert(tbl.schemas.size == 2 && tbl.currentSchemaId == 1)
    assert(cat.loadTable("events").currentSchema.fields.map(_.name) == Seq("c"))
  }

  test("added optional column reads null for old files; default fills for required") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val tbl = cat.createTable("t_add", schema)
    tbl.append(Seq((1L, 10)).toDF("a", "b"))

    tbl.updateSchema()
      .addColumn("note", IString)
      .addRequiredColumn("src", IString, "backfill")
      .commit()

    val r0 = tbl.toDF(spark).where(col("a") === 1L).collect().head
    assert(r0.isNullAt(r0.fieldIndex("note")))
    assert(r0.getString(r0.fieldIndex("src")) == "backfill") // initial-default
    // append WITHOUT src: write-default kicks in; with src: value kept
    tbl.append(Seq((2L, 20, "hi")).toDF("a", "b", "note"))
    tbl.append(Seq((3L, 30, "x", "live")).toDF("a", "b", "note", "src"))
    val bySrc = tbl.toDF(spark).collect()
      .map(r => r.getLong(r.fieldIndex("a")) -> r.getString(r.fieldIndex("src"))).toMap
    assert(bySrc == Map(1L -> "backfill", 2L -> "backfill", 3L -> "live"))
  }

  test("type widening int->long; narrowing rejected") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val tbl = cat.createTable("t_widen", schema)
    tbl.append(Seq((1L, 2147483647)).toDF("a", "b"))
    tbl.updateSchema().updateColumnType("b", ILong).commit()
    tbl.append(Seq((2L, 9999999999L)).toDF("a", "b"))
    assert(tbl.toDF(spark).select("b").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(2147483647L, 9999999999L))
    assertThrows[InvalidDataError](
      tbl.updateSchema().updateColumnType("b", IInt).commit())
    assertThrows[InvalidDataError](
      tbl.updateSchema().updateColumnType("a", IString).commit())
  }

  test("invalid evolutions rejected; partition-source column protected") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val spec = PartitionSpec(0, Seq(PartitionField(2, 1000, "b", "identity")))
    val tbl = cat.createTable("t_guard", schema, partitionSpec = spec)
    tbl.append(Seq((1L, 10)).toDF("a", "b"))
    assertThrows[InvalidDataError](tbl.updateSchema().deleteColumn("b").commit())
    assertThrows[InvalidDataError](tbl.updateSchema().renameColumn("a", "b").commit())
    assertThrows[InvalidDataError](tbl.updateSchema().deleteColumn("zzz").commit())
    assertThrows[InvalidDataError](tbl.updateSchema().addColumn("a", IString).commit())
    assertThrows[InvalidDataError](
      tbl.updateSchema().deleteColumn("a").deleteColumn("b").commit())
    // nothing committed by the failures
    assert(tbl.schemas.size == 1 && tbl.currentSchemaId == 0)
  }

  test("identical schema version is reused, not re-added") {
    val cat = new MemoryCatalog()
    val tbl = cat.createTable("t_reuse", schema)
    tbl.updateSchema().renameColumn("a", "x").commit()
    assert(tbl.currentSchemaId == 1)
    tbl.updateSchema().renameColumn("x", "a").commit()
    assert(tbl.currentSchemaId == 0) // back to the original version
    assert(tbl.schemas.size == 2)    // no third copy
  }

  test("pruning still fires on renamed columns (partition + bounds)") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val spec = PartitionSpec(0, Seq(PartitionField(2, 1000, "b", "identity")))
    val tbl = cat.createTable("t_prune", schema, partitionSpec = spec)
    tbl.append((1L to 8L).map(i => (i, (i % 2).toInt)).toDF("a", "b"))
    tbl.updateSchema().renameColumn("b", "bucketed").renameColumn("a", "seq").commit()

    // partition prune via new name: only b=1 partition files survive
    val part = tbl.scan(predicates = Seq(EqPred("bucketed", 1))).planFiles()
    assert(part.nonEmpty && part.forall(_.file.partition.get("b").contains("1")))
    // bounds prune via new name: no file has a > 8
    assert(tbl.scan(predicates = Seq(GtPred("seq", 100L))).planFiles().isEmpty)
    // results correct under the renamed filter
    assert(tbl.scan(predicates = Seq(EqPred("bucketed", 1))).toDF(spark).count() == 4)
  }

  test("predicate on a post-evolution column prunes pre-evolution files") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val tbl = cat.createTable("t_newcol", schema)
    tbl.append(Seq((1L, 10)).toDF("a", "b")) // written before `tag` existed
    tbl.updateSchema().addColumn("tag", IString).commit()
    tbl.append(Seq((2L, 20, "keep")).toDF("a", "b", "tag"))
    // old file can only read tag=null -> provably cannot match EqPred
    val tasks = tbl.scan(predicates = Seq(EqPred("tag", "keep"))).planFiles()
    assert(tasks.size < tbl.scan().planFiles().size)
    assert(tbl.scan(predicates = Seq(EqPred("tag", "keep"))).toDF(spark)
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    // but a default-valued required column DOES match through old files
    tbl.updateSchema().addRequiredColumn("src", IString, "backfill").commit()
    val viaDefault = tbl.scan(predicates = Seq(EqPred("src", "backfill"))).planFiles()
    assert(viaDefault.size == tbl.scan().planFiles().size)
  }

  test("metadata JSON round-trips the evolution (reload from disk)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-evo").toString
    val cat = new graft.catalog.HadoopCatalog(dir)
    cat.createNamespace(Seq("ns"))
    val tbl = cat.createTable("ns.evo", schema)
    tbl.append(Seq((1L, 10)).toDF("a", "b"))
    tbl.updateSchema().renameColumn("a", "c").deleteColumn("b")
      .addRequiredColumn("src", IString, "backfill").commit()
    val re = cat.loadTable("ns.evo")
    assert(re.currentSchema.fields.map(_.name) == Seq("c", "src"))
    assert(re.currentSchema.fieldByName("src").get.initialDefault.contains("backfill"))
    assert(re.schemas.size == 2 && re.lastColumnId == 3)
    assert(re.toDF(spark).collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "backfill")))
  }
}
