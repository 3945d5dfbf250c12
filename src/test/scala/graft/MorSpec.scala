package graft

import graft.catalog.MemoryCatalog
import graft.manifest.{DataFile, ManifestEntry, ManifestFile, Manifests}
import graft.meta.{Snapshot, SnapshotLogEntry, SnapshotRef}
import graft.table.Table
import graft.types.{ILong, IString, NestedField, Schema}
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Merge-on-read delete-file application (§2.2: the reference reads, never
  * writes, delete files — same here; tests commit hand-built delete
  * manifests through the catalog CAS):
  *  - two equality-delete files keyed on DIFFERENT column sets each
  *    anti-join on their own key;
  *  - spec sequence scoping: an equality delete applies only to data files
  *    with strictly smaller sequence number, so re-inserted rows survive;
  *  - position deletes remove (file, row ordinal) pairs. */
class MorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = Schema(0, Seq(
    NestedField(1, "id", ILong, required = false),
    NestedField(2, "name", IString, required = false)))

  /** Commit a delete-manifest snapshot through the catalog's CAS. */
  private def commitDeletes(cat: MemoryCatalog, tbl: Table,
                            files: Seq[DataFile]): Unit = {
    val meta = tbl.refresh().metadata
    val fs = new Path(meta.location).getFileSystem(tbl.hadoopConf)
    val seq = meta.lastSequenceNumber + 1
    val snapId = math.abs(java.util.UUID.randomUUID().getLeastSignificantBits)
    val mPath = new Path(meta.location, s"metadata/del-$snapId-m0.avro")
    val mLen = Manifests.writeManifest(fs, mPath,
      files.map(f => ManifestEntry(ManifestEntry.StatusAdded, snapId, seq, f)),
      meta.currentSchema, meta.defaultPartitionSpec)
    val mf = ManifestFile(mPath.toString, mLen, partitionSpecId = 0,
      addedSnapshotId = snapId, addedFilesCount = files.size,
      addedRowsCount = files.map(_.recordCount).sum,
      schemaId = meta.currentSchemaId, content = 1,
      sequenceNumber = seq, minSequenceNumber = seq)
    val parents = meta.currentSnapshot
      .map(s => Manifests.readManifestList(fs, new Path(s.manifestList)))
      .getOrElse(Nil)
    val listPath = new Path(meta.location, s"metadata/snap-$snapId-del.avro")
    Manifests.writeManifestList(fs, listPath, parents :+ mf)
    val now = System.currentTimeMillis()
    val snap = Snapshot(snapId, meta.currentSnapshotId, seq, now,
      listPath.toString, Map("operation" -> "delete"), Some(meta.currentSchemaId))
    val updated = meta.copy(
      lastSequenceNumber = seq, lastUpdatedMs = now,
      currentSnapshotId = Some(snapId), snapshots = meta.snapshots :+ snap,
      snapshotLog = meta.snapshotLog :+ SnapshotLogEntry(now, snapId),
      refs = meta.refs.updated("main", SnapshotRef(snapId, "branch")))
    cat.commitTable(tbl.ident, meta, updated)
    tbl.refresh()
  }

  private def writeDeleteParquet(tbl: Table, name: String,
                                 df: org.apache.spark.sql.DataFrame,
                                 content: Int, eqIds: Seq[Int]): DataFile = {
    val dir = new Path(tbl.location, s"data/deletes-$name")
    df.coalesce(1).write.mode("overwrite").parquet(dir.toString)
    val fs = dir.getFileSystem(tbl.hadoopConf)
    val f = fs.listStatus(dir).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    DataFile(f.toString, "PARQUET", Map.empty,
      recordCount = df.count(), fileSizeInBytes = fs.getFileStatus(f).getLen,
      content = content, equalityIds = eqIds)
  }

  test("equality deletes: per-key-set grouping + sequence scoping") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val tbl = cat.createTable("mor_eq", schema)
    tbl.append(Seq(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d", 5L -> "e")
      .toDF("id", "name")) // seq 1
    tbl.append(Seq(6L -> "f", 7L -> "g", 8L -> "h").toDF("id", "name")) // seq 2

    // two delete files with DIFFERENT equality-id sets in one commit (seq 3):
    //  - by id: delete ids 2 and 6
    //  - by name: delete name "d" (id 4)
    val delById = writeDeleteParquet(tbl, "by-id",
      Seq(2L, 6L).toDF("id"), content = 2, eqIds = Seq(1))
    val delByName = writeDeleteParquet(tbl, "by-name",
      Seq("d").toDF("name"), content = 2, eqIds = Seq(2))
    commitDeletes(cat, tbl, Seq(delById, delByName))

    assert(tbl.toDF(spark).select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L, 5L, 7L, 8L))

    // re-insert id 2 at seq 4: the seq-3 delete must NOT hit it
    tbl.append(Seq(2L -> "b2").toDF("id", "name"))
    assert(tbl.toDF(spark).select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 5L, 7L, 8L))
    assert(tbl.toDF(spark).where("id = 2").select("name").collect()
      .map(_.getString(0)).toSeq == Seq("b2"))
  }

  test("equality deletes treat NULL as a matching value (null-safe anti-join)") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val tbl = cat.createTable("mor_eq_null", schema)
    tbl.append(Seq(Some(1L) -> "a", None -> "nullkey", Some(3L) -> "c")
      .toDF("id", "name")) // seq 1

    // a spec-correct foreign writer may record a NULL key in an equality
    // delete — Iceberg semantics: it hides null-key data rows (SQL
    // equality would match nothing)
    val delNull = writeDeleteParquet(tbl, "by-null",
      Seq[Option[Long]](None, Some(3L)).toDF("id"), content = 2, eqIds = Seq(1))
    commitDeletes(cat, tbl, Seq(delNull))

    assert(tbl.toDF(spark).select("name").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("a"))
  }

  test("position deletes remove (file, ordinal) rows, manifest-form paths") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val tbl = cat.createTable("mor_pos", schema)
    // single input partition → one data file, row order = insert order
    tbl.append(Seq(10L -> "x", 11L -> "y", 12L -> "z")
      .toDF("id", "name").coalesce(1)) // seq 1

    // reference the file the way a spec-correct delete writer would: by the
    // path recorded in the MANIFEST ("file:/x"), not Spark's rendered
    // "_metadata.file_path" ("file:///x") — the scan must normalize
    val files = tbl.scan().planFiles()
    assert(files.size == 1)
    val manifestPath = files.head.filePath
    assert(manifestPath.startsWith("file:/") && !manifestPath.startsWith("file:///"))
    val posDel = writeDeleteParquet(tbl, "pos",
      Seq((manifestPath, 1L)).toDF("file_path", "pos"), // ordinal 1 = id 11
      content = 1, eqIds = Nil)
    commitDeletes(cat, tbl, Seq(posDel))

    assert(tbl.toDF(spark).select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(10L, 12L))
  }
}
