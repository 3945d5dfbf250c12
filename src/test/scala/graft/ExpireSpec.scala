package graft

import graft.catalog.MemoryCatalog
import graft.table.EqPred
import graft.types._
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot rollback and expiration with orphan-file reclamation. */
class ExpireSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = Schema(0, Seq(
    NestedField(1, "id", ILong, required = false),
    NestedField(2, "k", IString, required = false)))

  test("rollback restores an earlier snapshot as current") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val tbl = cat.createTable("rb", schema)
    tbl.append(Seq((1L, "a")).toDF("id", "k"))
    val s1 = tbl.currentSnapshotId.get
    tbl.append(Seq((2L, "b")).toDF("id", "k"))
    assert(tbl.toDF(spark).count() == 2)
    tbl.rollback(s1)
    assert(tbl.toDF(spark).count() == 1)
    assert(tbl.currentSnapshotId.contains(s1))
    assertThrows[InvalidDataError](tbl.rollback(999999L))
  }

  test("expire deletes files referenced only by expired snapshots") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val tbl = cat.createTable("exp", schema)
    tbl.append(Seq((1L, "keep"), (2L, "drop")).toDF("id", "k").coalesce(1))
    val oldFiles = tbl.scan().planFiles().map(_.filePath)
    // COW delete rewrites the file; old one stays for time travel
    tbl.delete(spark, Seq(EqPred("k", "drop")))
    val fs = new Path(tbl.location).getFileSystem(tbl.hadoopConf)
    assert(oldFiles.forall(p => fs.exists(new Path(p))), "pre-expire: old files kept")

    tbl.expireSnapshots(olderThanMs = System.currentTimeMillis() + 1000)

    assert(tbl.snapshots.size == 1) // only current retained
    assert(oldFiles.forall(p => !fs.exists(new Path(p))), "expired data reclaimed")
    // current snapshot fully readable after reclamation
    assert(tbl.toDF(spark).collect().map(_.getLong(0)).toSeq == Seq(1L))
    // expiring again is a no-op
    tbl.expireSnapshots(olderThanMs = System.currentTimeMillis() + 1000)
    assert(tbl.snapshots.size == 1)
  }

  test("ref targets are protected from expiration") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val tbl = cat.createTable("exp_ref", schema)
    tbl.append(Seq((1L, "a")).toDF("id", "k"))
    tbl.createTag("v1")
    tbl.append(Seq((2L, "b")).toDF("id", "k"))
    tbl.expireSnapshots(olderThanMs = System.currentTimeMillis() + 1000)
    // tagged snapshot survives and still reads
    assert(tbl.snapshots.size == 2)
    assert(tbl.scanRef("v1").toDF(spark).count() == 1)
  }
}
