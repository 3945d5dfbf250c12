package graft

import graft.catalog.MemoryCatalog
import graft.meta.{PartitionField, PartitionSpec}
import graft.table.{EqPred, GePred}
import graft.types._
import org.scalatest.funsuite.AnyFunSuite

/** Merge-on-read DML WRITE path (engine capability beyond the reference,
  * which never writes delete files): DELETE/UPDATE emit position-delete
  * files + a delete manifest instead of rewriting data files; the existing
  * MOR read side (MorSpec) applies them; [[Table.applyPendingDeletes]]
  * folds them back into data files. */
class MorWriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = Schema(0, Seq(
    NestedField(1, "id", ILong, required = false),
    NestedField(2, "k", IString, required = false),
    NestedField(3, "v", ILong, required = false)))

  private def freshTable(name: String, props: Map[String, String]) = {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val tbl = cat.createTable(name, schema, properties = props)
    tbl.append((1L to 10L).map(i => (i, if (i % 2 == 0) "even" else "odd", i * 10))
      .toDF("id", "k", "v"))
    tbl
  }

  test("MOR delete: no data file rewritten; deletes apply on scan; time travel intact") {
    val tbl = freshTable("mor_del", Map("write.delete.mode" -> "merge-on-read"))
    val filesBefore = tbl.scan().planFiles().map(_.filePath).toSet
    val preDelete = tbl.currentSnapshotId.get

    tbl.delete(spark, Seq(EqPred("k", "even")))

    assert(tbl.toDF(spark).select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L, 5L, 7L, 9L))
    // the data files are untouched — only delete files were added
    val after = tbl.scan().planFiles()
    assert(after.map(_.filePath).toSet == filesBefore)
    assert(after.forall(_.deleteFiles.nonEmpty))
    val snap = tbl.currentSnapshot.get
    assert(snap.summary("operation") == "delete")
    assert(snap.summary("added-position-deletes") == "5")
    assert(snap.summary("total-records") == "5")
    // time travel to before the delete sees all rows
    assert(tbl.toDF(spark, Some(preDelete)).count() == 10)
  }

  test("MOR delete twice: second delete doesn't re-record dead rows") {
    val tbl = freshTable("mor_del2", Map("write.delete.mode" -> "merge-on-read"))
    tbl.delete(spark, Seq(EqPred("k", "even")))
    // overlapping predicate: evens already dead, only odd ids >= 7 are live
    tbl.delete(spark, Seq(GePred("id", 7L)))
    assert(tbl.currentSnapshot.get.summary("added-position-deletes") == "2") // 7, 9
    assert(tbl.toDF(spark).select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L, 5L))
  }

  test("MOR delete matching nothing live is a no-op (no new snapshot)") {
    val tbl = freshTable("mor_del0", Map("write.delete.mode" -> "merge-on-read"))
    val snaps = tbl.snapshots.size
    tbl.delete(spark, Seq(EqPred("id", 999L)))
    assert(tbl.snapshots.size == snaps)
  }

  test("MOR update: delete + reinsert in one snapshot; updated rows visible") {
    val tbl = freshTable("mor_upd", Map("write.update.mode" -> "merge-on-read"))
    val filesBefore = tbl.scan().planFiles().map(_.filePath).toSet

    tbl.update(spark, Seq(EqPred("k", "odd")), Map("v" -> "v + 1"))

    val rows = tbl.toDF(spark).select("id", "v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == (1L to 10L).map(i =>
      i -> (if (i % 2 == 1) i * 10 + 1 else i * 10)).toMap)
    // old data files all still present (plus new ones for updated images)
    val pathsAfter = tbl.scan().planFiles().map(_.filePath).toSet
    assert(filesBefore.subsetOf(pathsAfter) && pathsAfter.size > filesBefore.size)
    val snap = tbl.currentSnapshot.get
    assert(snap.summary("operation") == "overwrite")
    assert(snap.summary("added-position-deletes") == "5")
    assert(snap.summary("added-records") == "5")
    assert(snap.summary("total-records") == "10")
  }

  test("MOR on a partitioned table: delete files only for the matching partition") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val spec = PartitionSpec(0, Seq(PartitionField(2, 1000, "k", "identity")))
    val tbl = cat.createTable("mor_part", schema, partitionSpec = spec,
      properties = Map("write.delete.mode" -> "merge-on-read"))
    tbl.append((1L to 10L).map(i => (i, if (i % 2 == 0) "even" else "odd", i))
      .toDF("id", "k", "v"))

    tbl.delete(spark, Seq(EqPred("k", "even"), GePred("id", 6L)))

    assert(tbl.toDF(spark).select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L, 7L, 9L))
    // odd-partition files carry no deletes (partition pruning scoped the scan)
    val odd = tbl.scan(predicates = Seq(EqPred("k", "odd"))).planFiles()
    assert(odd.forall(_.deleteFiles.isEmpty))
  }

  test("applyPendingDeletes folds deletes into data files and drops delete manifests") {
    val tbl = freshTable("mor_fold", Map(
      "write.delete.mode" -> "merge-on-read", "write.update.mode" -> "merge-on-read"))
    tbl.delete(spark, Seq(EqPred("k", "even")))
    tbl.update(spark, Seq(EqPred("id", 3L)), Map("v" -> "999"))
    assert(tbl.scan().planFiles().exists(_.deleteFiles.nonEmpty))

    tbl.applyPendingDeletes(spark)

    val tasks = tbl.scan().planFiles()
    assert(tasks.forall(_.deleteFiles.isEmpty))
    val rows = tbl.toDF(spark).select("id", "v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(1L -> 10L, 3L -> 999L, 5L -> 50L, 7L -> 70L, 9L -> 90L))
    // second run is a no-op
    val snaps = tbl.snapshots.size
    tbl.applyPendingDeletes(spark)
    assert(tbl.snapshots.size == snaps)
  }

  test("unknown write.delete.mode rejected; default stays copy-on-write") {
    val tbl = freshTable("mor_mode", Map("write.delete.mode" -> "sideways"))
    assertThrows[InvalidDataError](tbl.delete(spark, Seq(EqPred("k", "even"))))
    val cow = freshTable("cow_default", Map.empty)
    val filesBefore = cow.scan().planFiles().map(_.filePath).toSet
    cow.delete(spark, Seq(EqPred("k", "even")))
    // copy-on-write: affected files replaced, no delete files anywhere
    assert(cow.scan().planFiles().forall(_.deleteFiles.isEmpty))
    assert(cow.toDF(spark).count() == 5)
    assert(filesBefore.nonEmpty)
  }
}
