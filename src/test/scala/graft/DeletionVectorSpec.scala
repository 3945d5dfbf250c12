package graft

import graft.catalog.MemoryCatalog
import graft.puffin.{DeletionVector, Puffin}
import graft.table.{EqPred, LtPred}
import graft.types.{ILong, IString, NestedField, Schema}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col
import org.roaringbitmap.longlong.Roaring64NavigableMap
import org.scalatest.funsuite.AnyFunSuite

/** Format-v3 substance: Puffin deletion vectors as the merge-on-read
  * delete representation, and row lineage (`next-row-id` / `first_row_id`
  * / `_row_id`). A v3 table must never write position-delete parquet, must
  * keep at most ONE live DV per data file (merging + superseding), and its
  * row ids must be stable across DV-based DML. */
class DeletionVectorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = Schema(0, Seq(
    NestedField(1, "id", ILong, required = false),
    NestedField(2, "name", IString, required = false)))

  private def v3Table(cat: MemoryCatalog, name: String) =
    cat.createTable(name, schema, properties = Map(
      "format-version" -> "3",
      "write.delete.mode" -> "merge-on-read",
      "write.update.mode" -> "merge-on-read",
      "write.merge.mode" -> "merge-on-read"))

  private def rowsOf(tbl: graft.table.Table): Set[(Long, String)] = {
    import spark.implicits._
    tbl.toDF(spark).as[(Long, String)].collect().toSet
  }

  test("puffin file + deletion-vector blob round-trip, spec layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft-puffin").toString
    val fs = new Path(dir).getFileSystem(new Configuration())
    val positions = Seq(0L, 3L, 5L, 1000000L, (1L << 33) + 7L)
    val blobData = DeletionVector.serialize(DeletionVector.of(positions.iterator))
    val p = new Path(dir, "dv.puffin")
    val (len, metas) = Puffin.write(fs, p, Seq(
      Puffin.Blob(DeletionVector.BlobType, Nil, -1L, -1L, blobData,
        Map("referenced-data-file" -> "f1.parquet",
          "cardinality" -> positions.size.toString))))
    assert(len == fs.getFileStatus(p).getLen)

    // container layout: magic at file head, and again heading the footer
    val head = new Array[Byte](4)
    val in = fs.open(p)
    try in.readFully(0, head) finally in.close()
    assert(head.sameElements(Puffin.Magic))

    val (blobs, _) = Puffin.readFooter(fs, p)
    assert(blobs.size == 1)
    val bm = blobs.head
    assert(bm.blobType == "deletion-vector-v1")
    assert(bm.offset == 4 && bm.length == blobData.length)
    assert(bm.properties("referenced-data-file") == "f1.parquet")
    val back = DeletionVector.deserialize(Puffin.readBlob(fs, p, bm.offset, bm.length))
    assert(positions.forall(back.contains))
    assert(back.getLongCardinality == positions.size)

    // blob layout: 4-byte BE length, then the D1 D3 39 64 magic
    assert(blobData(4) == 0xD1.toByte && blobData(5) == 0xD3.toByte &&
      blobData(6) == 0x39.toByte && blobData(7) == 0x64.toByte)
    // CRC corruption must be detected
    val corrupt = blobData.clone(); corrupt(9) = (corrupt(9) ^ 0x1).toByte
    assertThrows[IllegalArgumentException](DeletionVector.deserialize(corrupt))
  }

  test("v3 MOR delete writes a deletion vector, not parquet; v2 keeps parquet") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val t3 = v3Table(cat, "t3")
    t3.append(Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "name"))
    t3.delete(spark, Seq(LtPred("id", 3L)))
    assert(rowsOf(t3) == Set((3L, "c"), (4L, "d")))

    // the delete entries are Puffin DVs referencing their data file
    val dels = t3.scan().planFiles().flatMap(_.deleteFiles)
    assert(dels.nonEmpty && dels.forall(_.isDeletionVector))
    assert(dels.forall(_.referencedDataFile.isDefined))
    assert(dels.forall(d => d.contentOffset.isDefined && d.contentSizeInBytes.isDefined))
    assert(t3.currentSnapshot.get.summary("added-position-deletes") == "2")
    assert(t3.currentSnapshot.get.summary("total-records") == "2")

    // a v2 table on the same path still writes position-delete parquet
    val t2 = cat.createTable("t2", schema,
      properties = Map("write.delete.mode" -> "merge-on-read"))
    t2.append(Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    t2.delete(spark, Seq(EqPred("id", 1L)))
    val dels2 = t2.scan().planFiles().flatMap(_.deleteFiles)
    assert(dels2.nonEmpty && dels2.forall(d => !d.isDeletionVector &&
      d.fileFormat == "PARQUET"))
    assert(rowsOf(t2) == Set((2L, "b")))
  }

  test("second delete on the same file merges the DV and supersedes the old one") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val tbl = v3Table(cat, "t")
    // one append => one data file (driver-built coalesce(1) via row path)
    tbl.append((1L to 10L).map(i => (i, s"n$i")).toDF("id", "name").coalesce(1))
    tbl.delete(spark, Seq(LtPred("id", 3L)))   // hides 1, 2
    val snapAfterFirst = tbl.currentSnapshotId.get
    tbl.delete(spark, Seq(EqPred("id", 7L)))   // hides 7 → merged DV {1,2,7}
    assert(rowsOf(tbl).map(_._1) == Set(3L, 4L, 5L, 6L, 8L, 9L, 10L))

    // exactly ONE live DV per data file, carrying the union of positions
    val tasks = tbl.scan().planFiles()
    val dataWithDeletes = tasks.filter(_.deleteFiles.nonEmpty)
    assert(dataWithDeletes.size == 1)
    val dvs = dataWithDeletes.head.deleteFiles
    assert(dvs.size == 1 && dvs.head.isDeletionVector)
    assert(dvs.head.recordCount == 3) // merged cardinality
    // newly-hidden count (1), not merged cardinality (3), in the summary
    assert(tbl.currentSnapshot.get.summary("added-position-deletes") == "1")
    assert(tbl.currentSnapshot.get.summary("total-records") == "7")

    // the merged bitmap really holds both commits' ordinals
    val fs = new Path(tbl.location).getFileSystem(tbl.hadoopConf)
    val dv = dvs.head
    val bitmap = DeletionVector.deserialize(Puffin.readBlob(fs,
      new Path(dv.filePath), dv.contentOffset.get, dv.contentSizeInBytes.get))
    assert(bitmap.getLongCardinality == 3)

    // time travel before the second delete sees the first DV only
    import spark.implicits._
    val asOf = tbl.scan(Some(snapAfterFirst)).toDF(spark)
      .select("id").as[Long].collect().toSet
    assert(asOf == Set(3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L))
  }

  test("multi-file DV delete: executor-written Puffin files, one live DV per file") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val tbl = v3Table(cat, "dv_multi")
    // several appends -> several data files; a spanning delete touches all
    for (b <- 0 until 4)
      tbl.append((0 until 25).map(i => (b * 100L + i, s"n$b-$i")).toDF("id", "name").coalesce(1))
    assert(tbl.scan().planFiles().size == 4)

    tbl.delete(spark, Seq(EqPred("name", "n2-3")))      // one file affected
    tbl.delete(spark, Seq(LtPred("id", 210L)))          // three files affected, one merges
    val tasks = tbl.scan().planFiles()
    val dvs = tasks.flatMap(_.deleteFiles).filter(_.isDeletionVector)
    // ONE live DV per affected data file, even after the merge commit
    assert(dvs.map(_.referencedDataFile.get).distinct.size == 3)
    assert(dvs.groupBy(_.referencedDataFile.get).forall(_._2.size == 1))
    // the DV puffin files are task-written (attempt-id naming), and the
    // second commit's spanning delete may produce several of them
    assert(dvs.forall(_.filePath.matches(".*-dv-p\\d+-a\\d+\\.puffin")))
    // read-back: rows >= 210 plus the never-touched file, minus nothing else
    val want = (0 until 4).flatMap(b => (0 until 25).map(i => b * 100L + i))
      .filter(id => id >= 210L).toSet
    assert(rowsOf(tbl).map(_._1) == want)
    // merged bitmap cardinality counts dead rows once: file 2's DV holds
    // exactly {200..209} (203 was already dead and is not double-counted)
    assert(dvs.map(_.recordCount).sorted.toSeq == Seq(10L, 25L, 25L),
      s"cardinalities were ${dvs.map(_.recordCount)}")
  }

  test("v3 update via DV + row lineage: _row_id stable across MOR DML") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val tbl = v3Table(cat, "t")
    assert(tbl.nextRowId == 0L)
    tbl.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name").coalesce(1))
    assert(tbl.nextRowId == 3L)
    assert(tbl.currentSnapshot.get.firstRowId.contains(0L))
    val ids0 = tbl.scan().toDFWithRowIds(spark)
      .select("id", "_row_id").as[(Long, Long)].collect().toMap
    assert(ids0 == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))

    // MOR update: survivor row ids unchanged; the updated row's new image
    // is a NEW row (fresh id) — v3 semantics for DV-based updates here
    tbl.update(spark, Seq(EqPred("id", 2L)), Map("name" -> "'B'"))
    val after = tbl.scan().toDFWithRowIds(spark)
      .select("id", "name", "_row_id").as[(Long, String, Long)].collect().toSet
    assert(after.contains((1L, "a", 0L)) && after.contains((3L, "c", 2L)))
    assert(after.exists { case (id, n, rid) => id == 2L && n == "B" && rid == 3L })
    assert(tbl.nextRowId == 4L)

    // appends continue the table-global counter
    tbl.append(Seq((9L, "z")).toDF("id", "name"))
    assert(tbl.nextRowId == 5L)
    assert(tbl.currentSnapshot.get.firstRowId.contains(4L))

    // metadata JSON round-trips the v3 lineage fields
    val json = graft.meta.MetadataJson.write(tbl.metadata)
    val back = graft.meta.MetadataJson.read(json)
    assert(back.nextRowId == 5L)
    assert(back.currentSnapshot.get.firstRowId == tbl.currentSnapshot.get.firstRowId)
    assert(back.formatVersion == 3)
  }

  test("v3 merge (MOR) deletes via DV and maintenance folds DVs in") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val tbl = v3Table(cat, "t")
    tbl.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name").coalesce(1))
    tbl.merge(spark, Seq((2L, "B2"), (4L, "d")).toDF("id", "name"), Seq("id"))
    assert(rowsOf(tbl) == Set((1L, "a"), (2L, "B2"), (3L, "c"), (4L, "d")))
    val dels = tbl.scan().planFiles().flatMap(_.deleteFiles)
    assert(dels.nonEmpty && dels.forall(_.isDeletionVector))

    // applyPendingDeletes rewrites DV'd files; scans go delete-free
    tbl.applyPendingDeletes(spark)
    assert(tbl.scan().planFiles().forall(_.deleteFiles.isEmpty))
    assert(rowsOf(tbl) == Set((1L, "a"), (2L, "B2"), (3L, "c"), (4L, "d")))
  }
}
