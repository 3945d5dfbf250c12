package graft

import graft.catalog.MemoryCatalog
import graft.meta.{PartitionField, PartitionSpec}
import graft.table.{EqPred, GePred}
import graft.types._
import org.scalatest.funsuite.AnyFunSuite

/** Copy-on-write DELETE / OVERWRITE (engine capability beyond the
  * reference; SQL DELETE still errors for parity — `SqlSpec`). */
class DeleteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = Schema(0, Seq(
    NestedField(1, "id", ILong, required = false),
    NestedField(2, "k", IString, required = false)))

  test("delete rewrites only matching rows; time travel sees old data") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val tbl = cat.createTable("cow", schema)
    tbl.append((1L to 10L).map(i => (i, if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "k"))
    val preDelete = tbl.currentSnapshotId.get

    tbl.delete(spark, Seq(EqPred("k", "even")))

    assert(tbl.toDF(spark).select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L, 5L, 7L, 9L))
    // snapshot bookkeeping
    val snap = tbl.currentSnapshot.get
    assert(snap.summary("operation") == "overwrite")
    assert(snap.summary("total-records") == "5")
    // old snapshot untouched (copy-on-write, not in-place)
    assert(tbl.toDF(spark, Some(preDelete)).count() == 10)
  }

  test("delete on a partitioned table rewrites only the matching partition") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val spec = PartitionSpec(0, Seq(PartitionField(2, 1000, "k", "identity")))
    val tbl = cat.createTable("cow_parted", schema, partitionSpec = spec)
    tbl.append((1L to 10L).map(i => (i, if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "k"))
    val oddFilesBefore = tbl.scan(predicates = Seq(EqPred("k", "odd")))
      .planFiles().map(_.filePath).toSet

    tbl.delete(spark, Seq(EqPred("k", "even"), GePred("id", 6L)))

    // ids 6,8,10 gone; odd partition files untouched (same physical paths)
    assert(tbl.toDF(spark).select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L, 7L, 9L))
    val oddFilesAfter = tbl.scan(predicates = Seq(EqPred("k", "odd")))
      .planFiles().map(_.filePath).toSet
    assert(oddFilesAfter == oddFilesBefore)
  }

  test("delete with no possible matches is a no-op (no new snapshot)") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val tbl = cat.createTable("cow_noop", schema)
    tbl.append(Seq((1L, "a")).toDF("id", "k"))
    val before = tbl.currentSnapshotId
    tbl.delete(spark, Seq(EqPred("k", "zzz-not-there")))
    assert(tbl.refresh().currentSnapshotId == before)
  }

  test("overwrite atomically replaces contents; old snapshot readable") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val tbl = cat.createTable("cow_ow", schema)
    tbl.append(Seq((1L, "a"), (2L, "b")).toDF("id", "k"))
    val pre = tbl.currentSnapshotId.get
    tbl.overwrite(Seq((100L, "new")).toDF("id", "k"))
    assert(tbl.toDF(spark).collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((100L, "new")))
    assert(tbl.toDF(spark, Some(pre)).count() == 2)
    assert(tbl.currentSnapshot.get.summary("total-records") == "1")
  }

  test("COW rewrites only files that actually hold a match; others carried verbatim") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val tbl = cat.createTable("cow_discover", schema)
    // interleaved ids: both files' [min,max] bounds contain id=3, so
    // bounds pruning CANNOT separate them — only the discovery pass can
    tbl.append(Seq((1L, "a"), (3L, "a"), (5L, "a")).toDF("id", "k").coalesce(1))
    tbl.append(Seq((2L, "b"), (4L, "b"), (6L, "b")).toDF("id", "k").coalesce(1))
    val before = tbl.scan().planFiles().map(_.filePath).toSet
    assert(before.size == 2)

    tbl.delete(spark, Seq(EqPred("id", 3L)))
    val after = tbl.scan().planFiles().map(_.filePath).toSet
    // the b-file was affected-by-bounds but held no match: same path lives on
    assert(after.size == 2)
    assert((before & after).size == 1, s"expected exactly one carried file, got ${before & after}")
    assert(tbl.toDF(spark).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 4L, 5L, 6L))

    // a delete whose bounds-affected files hold NO matching row is a no-op
    val snaps = tbl.snapshots.size
    tbl.delete(spark, Seq(EqPred("id", 3L))) // already gone; bounds still admit 3
    assert(tbl.snapshots.size == snaps, "matchless COW delete must not commit")

    // arbitrary-condition COW delete (nothing prunable) still only
    // rewrites the single file holding matches
    val pre = tbl.scan().planFiles().map(_.filePath).toSet
    tbl.deleteWhere(spark, "k = 'b' AND id = 2")
    val post = tbl.scan().planFiles().map(_.filePath).toSet
    assert((pre & post).size == 1, "a-file must be carried, not rewritten")
    assert(tbl.toDF(spark).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 4L, 5L, 6L))
  }
}
