package graft

import graft.catalog.MemoryCatalog
import graft.table.{EqPred, GePred}
import graft.types._
import org.scalatest.funsuite.AnyFunSuite

/** COW UPDATE, compaction, and named refs (tags/branches). */
class MaintenanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = Schema(0, Seq(
    NestedField(1, "id", ILong, required = false),
    NestedField(2, "qty", IInt, required = false),
    NestedField(3, "k", IString, required = false)))

  test("update rewrites matching rows in place, others verbatim") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val tbl = cat.createTable("upd", schema)
    tbl.append((1L to 6L).map(i => (i, i.toInt * 10, if (i <= 3) "a" else "b"))
      .toDF("id", "qty", "k"))
    tbl.update(spark, Seq(EqPred("k", "a"), GePred("id", 2L)),
      Map("qty" -> "qty + 1000", "k" -> "'bumped'"))
    val rows = tbl.toDF(spark).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(rows == Seq(
      (1L, 10, "a"), (2L, 1020, "bumped"), (3L, 1030, "bumped"),
      (4L, 40, "b"), (5L, 50, "b"), (6L, 60, "b")))
    assert(tbl.currentSnapshot.get.summary("operation") == "overwrite")
    assertThrows[InvalidDataError](
      tbl.update(spark, Seq(EqPred("k", "b")), Map("nope" -> "1")))
  }

  test("compaction merges small files without changing rows") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val tbl = cat.createTable("compact_t", schema)
    // many micro-appends → many small files
    for (i <- 1 to 5)
      tbl.append(Seq((i.toLong, i, s"v$i")).toDF("id", "qty", "k").coalesce(1))
    val before = tbl.scan().planFiles()
    assert(before.size == 5)
    val pre = tbl.currentSnapshotId.get

    tbl.compact(spark)

    val after = tbl.scan().planFiles()
    assert(after.size == 1)
    assert(tbl.toDF(spark).select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      (1L to 5L))
    assert(tbl.currentSnapshot.get.summary("total-records") == "5")
    // old snapshot still readable with the small files
    assert(tbl.toDF(spark, Some(pre)).count() == 5)
    // idempotent: nothing left to compact
    val snapCount = tbl.snapshots.size
    tbl.compact(spark)
    assert(tbl.refresh().snapshots.size == snapCount)
  }

  test("rewriteManifests consolidates to one manifest per era; answers unchanged") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    import graft.manifest.Manifests
    val cat = new MemoryCatalog()
    val tbl = cat.createTable("rwm_t", schema)
    // fragment the manifest list: 3 appends + 2 upserts (each upsert adds
    // a data manifest AND an equality-delete manifest)
    for (i <- 1 to 3)
      tbl.append(Seq((i.toLong, i, s"v$i")).toDF("id", "qty", "k"))
    tbl.upsert(spark, Seq((2L, 20, "V2")).toDF("id", "qty", "k"), Seq("id"))
    tbl.upsert(spark, Seq((4L, 40, "V4")).toDF("id", "qty", "k"), Seq("id"))
    val fs = new Path(tbl.location).getFileSystem(tbl.hadoopConf)
    def manifests() =
      Manifests.readManifestList(fs, new Path(tbl.currentSnapshot.get.manifestList))
    val before = manifests()
    assert(before.size >= 7)
    val want = tbl.toDF(spark).orderBy("id").collect().toSeq
    val pre = tbl.currentSnapshotId.get

    tbl.rewriteManifests()

    // one data manifest + one delete manifest (single schema/spec era)
    val after = manifests()
    assert(after.map(_.content).sorted == Seq(0, 1))
    assert(tbl.currentSnapshot.get.summary("operation") == "replace")
    assert(tbl.toDF(spark).orderBy("id").collect().toSeq == want)
    // sequence scoping survives: upserted keys still show the LAST version
    assert(tbl.toDF(spark).where("id = 2").select("k").head().getString(0) == "V2")
    // time travel to the pre-rewrite snapshot intact
    assert(tbl.toDF(spark, Some(pre)).orderBy("id").collect().toSeq == want)
    // idempotent: already one manifest per era
    val snaps = tbl.snapshots.size
    tbl.rewriteManifests()
    assert(tbl.refresh().snapshots.size == snaps)
    // a post-rewrite upsert still wins over consolidated history
    tbl.upsert(spark, Seq((2L, 200, "V2b")).toDF("id", "qty", "k"), Seq("id"))
    assert(tbl.toDF(spark).where("id = 2").select("k").head().getString(0) == "V2b")
    assert(tbl.toDF(spark).count() == 4)
  }

  test("removeOrphanFiles deletes unreferenced files, keeps live + recent ones") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val cat = new MemoryCatalog()
    val tbl = cat.createTable("orphans_t", schema)
    tbl.append(Seq((1L, 1, "a"), (2L, 2, "b")).toDF("id", "qty", "k"))
    tbl.append(Seq((3L, 3, "c")).toDF("id", "qty", "k"))

    // plant orphans the way a crashed writer would leave them
    val fs = new Path(tbl.location).getFileSystem(tbl.hadoopConf)
    val orphanData = new Path(tbl.location, "data/dead-commit/part-0.parquet")
    val orphanManifest = new Path(tbl.location, "metadata/dead-commit-m0.avro")
    val strayJson = new Path(tbl.location, "metadata/notes.json")
    Seq(orphanData, orphanManifest, strayJson).foreach { p =>
      val out = fs.create(p, true); out.write(1); out.close()
    }

    // nothing is old enough yet → nothing swept
    assert(tbl.removeOrphanFiles(olderThanMs = 1L).isEmpty)

    val swept = tbl.removeOrphanFiles(System.currentTimeMillis() + 60000)
    assert(swept.map(new Path(_).getName).toSet ==
      Set("part-0.parquet", "dead-commit-m0.avro"))
    assert(!fs.exists(orphanData) && !fs.exists(orphanManifest))
    // non-avro metadata (catalog's domain) untouched; table fully readable
    assert(fs.exists(strayJson))
    assert(tbl.toDF(spark).select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L))
    // idempotent
    assert(tbl.removeOrphanFiles(System.currentTimeMillis() + 60000).isEmpty)
  }

  test("expireSnapshots after rewriteManifests reclaims old manifests, keeps data") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val cat = new MemoryCatalog()
    val tbl = cat.createTable("rwm_exp", schema)
    for (i <- 1 to 3)
      tbl.append(Seq((i.toLong, i, s"v$i")).toDF("id", "qty", "k"))
    tbl.rewriteManifests()
    val want = tbl.toDF(spark).orderBy("id").collect().toSeq

    // expire everything but the rewrite snapshot: the pre-rewrite
    // fragmented manifests are referenced only by expired snapshots
    tbl.expireSnapshots(System.currentTimeMillis() + 60000, retainLast = 1)
    assert(tbl.snapshots.size == 1)
    assert(tbl.toDF(spark).orderBy("id").collect().toSeq == want)
    // and the orphan sweep finds nothing else to delete
    assert(tbl.removeOrphanFiles(System.currentTimeMillis() + 60000).isEmpty)
  }

  test("scanAsOf: timestamp time travel follows the snapshot log") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val tbl = cat.createTable("asof_t", schema)
    tbl.append(Seq((1L, 1, "a")).toDF("id", "qty", "k"))
    val snap1 = tbl.currentSnapshotId.get
    val t1 = System.currentTimeMillis()
    Thread.sleep(10)
    tbl.append(Seq((2L, 2, "b")).toDF("id", "qty", "k"))

    assert(tbl.scanAsOf(t1).toDF(spark).count() == 1)
    assert(tbl.scanAsOf(System.currentTimeMillis()).toDF(spark).count() == 2)
    assertThrows[InvalidDataError](tbl.scanAsOf(0L))

    // rollback re-logs the old snapshot id: "as of now" sees the
    // rolled-back state, while "as of t1" still resolves through the log
    Thread.sleep(10)
    tbl.rollback(snap1)
    assert(tbl.scanAsOf(System.currentTimeMillis()).toDF(spark).count() == 1)
    assert(tbl.scanAsOf(t1).toDF(spark).count() == 1)
  }

  test("maintain() runs the full maintenance chain; answers unchanged") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val tbl = cat.createTable("maint_all", schema,
      properties = Map("write.delete.mode" -> "merge-on-read"))
    for (i <- 1 to 4)
      tbl.append(Seq((i.toLong, i, s"v$i")).toDF("id", "qty", "k"))
    tbl.delete(spark, Seq(EqPred("id", 2L))) // pending MOR delete debt
    val want = tbl.toDF(spark).orderBy("id").collect().toSeq

    // retention 0 → everything but the final state is reclaimable
    tbl.maintain(spark, snapshotRetentionMs = -60000L)

    assert(tbl.toDF(spark).orderBy("id").collect().toSeq == want)
    assert(tbl.scan().planFiles().forall(_.deleteFiles.isEmpty)) // debt folded
    assert(tbl.scan().planFiles().size == 1) // compacted
    assert(tbl.snapshots.size == 1) // expired to the retained head
    // steady state: a second run changes nothing
    val snaps = tbl.currentSnapshotId
    tbl.maintain(spark, snapshotRetentionMs = -60000L)
    assert(tbl.refresh().currentSnapshotId == snaps)
  }

  test("zorder clusters files so BOTH dimensions prune; rows unchanged") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val zschema = Schema(0, Seq(
      NestedField(1, "x", ILong, required = false),
      NestedField(2, "y", ILong, required = false),
      NestedField(3, "payload", IString, required = false)))
    val tbl = cat.createTable("z_t", zschema)
    // a shuffled 32x32 grid in ONE file: neither dimension prunes anything
    val grid = scala.util.Random.shuffle(
      for { x <- 0L until 32L; y <- 0L until 32L } yield (x, y, s"p$x-$y"))
    tbl.append(grid.toDF("x", "y", "payload").coalesce(1))
    assert(tbl.scan().planFiles().size == 1)

    tbl.zorder(spark, Seq("x", "y"), targetFileBytes = 1024)

    val files = tbl.scan().planFiles()
    assert(files.size >= 4, s"expected a multi-file layout, got ${files.size}")
    // row set unchanged
    assert(tbl.toDF(spark).count() == 1024)
    assert(tbl.toDF(spark).agg(org.apache.spark.sql.functions.sum("x"))
      .head().getLong(0) == 32 * (31 * 32 / 2))
    // the z-layout prunes on EACH dimension independently
    val px = tbl.scan(predicates = Seq(GePred("x", 24L))).planFiles().size
    val py = tbl.scan(predicates = Seq(GePred("y", 24L))).planFiles().size
    assert(px < files.size, s"x-pred kept all $px of ${files.size}")
    assert(py < files.size, s"y-pred kept all $py of ${files.size}")
    // and the pruned scans still answer correctly
    assert(tbl.scan(predicates = Seq(GePred("x", 24L))).toDF(spark).count() == 8 * 32)
    // guards
    assertThrows[InvalidDataError](tbl.zorder(spark, Seq("nope")))
    assertThrows[IllegalArgumentException](tbl.zorder(spark, Nil))
  }

  test("addFiles imports foreign parquet without rewrite; stats prune; guards hold") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val cat = new MemoryCatalog()
    val tbl = cat.createTable("addf_t", schema)
    // foreign files written by plain Spark (no field ids, no graft layout)
    val ext = java.nio.file.Files.createTempDirectory("graft-addfiles").toString
    Seq((1L, 10, "a"), (2L, 20, "b")).toDF("id", "qty", "k")
      .coalesce(1).write.mode("overwrite").parquet(s"$ext/p1")
    Seq((100L, 1000, "z")).toDF("id", "qty", "k")
      .coalesce(1).write.mode("overwrite").parquet(s"$ext/p2")
    val fs = new Path(ext).getFileSystem(tbl.hadoopConf)
    def parts(d: String): Seq[String] =
      fs.listStatus(new Path(d)).map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq

    tbl.addFiles(spark, parts(s"$ext/p1") ++ parts(s"$ext/p2"))

    assert(tbl.toDF(spark).collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 100L))
    assert(tbl.currentSnapshot.get.summary("operation-detail") == "add-files")
    assert(tbl.scan().planFiles().size == 2) // no rewrite: the two foreign files
    // footer bounds made it into the manifest → pruning skips the other file
    assert(tbl.scan(predicates = Seq(GePred("id", 50L))).planFiles().size == 1)
    // guards: type mismatch rejected; a multi-valued file cannot enter an
    // identity-partitioned table (p1 holds k = a AND b)
    Seq(("x", 1)).toDF("id", "qty").write.mode("overwrite").parquet(s"$ext/bad")
    assertThrows[InvalidDataError](tbl.addFiles(spark, parts(s"$ext/bad")))
    val part = cat.createTable("addf_part", schema, partitionSpec =
      graft.meta.PartitionSpec(0, Seq(graft.meta.PartitionField(3, 1000, "k", "identity"))))
    assertThrows[InvalidDataError](part.addFiles(spark, parts(s"$ext/p1")))

    // identity-partitioned import: single-valued files derive their tuple
    // from footer stats; partition pruning then works like native data
    Seq((1L, 10, "a"), (2L, 20, "a")).toDF("id", "qty", "k")
      .coalesce(1).write.mode("overwrite").parquet(s"$ext/pa")
    Seq((3L, 30, "b")).toDF("id", "qty", "k")
      .coalesce(1).write.mode("overwrite").parquet(s"$ext/pb")
    part.addFiles(spark, parts(s"$ext/pa") ++ parts(s"$ext/pb"))
    assert(part.toDF(spark).collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    val pruned = part.scan(predicates = Seq(EqPred("k", "b"))).planFiles()
    assert(pruned.size == 1 && pruned.head.file.partition == Map("k" -> "b"))
    assert(part.scan(predicates = Seq(EqPred("k", "b"))).toDF(spark)
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
    // a non-identity spec still refuses foreign files
    val bucketed = cat.createTable("addf_bucket", schema, partitionSpec =
      graft.meta.PartitionSpec(0, Seq(graft.meta.PartitionField(1, 1001, "id_bucket", "bucket[4]"))))
    assertThrows[InvalidDataError](bucketed.addFiles(spark, parts(s"$ext/pa")))
    // imported data participates in DML like native data
    tbl.delete(spark, Seq(EqPred("k", "b")))
    assert(tbl.toDF(spark).collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 100L))
  }

  test("write-audit-publish: branch appends stay invisible until fastForward") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val tbl = cat.createTable("wap_t", schema)
    tbl.append(Seq((1L, 1, "a")).toDF("id", "qty", "k"))

    // audit writes land on the branch; main is untouched
    tbl.appendToBranch("audit", Seq((2L, 2, "b")).toDF("id", "qty", "k"))
    tbl.appendToBranch("audit", Seq((3L, 3, "c")).toDF("id", "qty", "k"))
    assert(tbl.toDF(spark).count() == 1)
    assert(tbl.scanRef("audit").toDF(spark).count() == 3)

    // publish: one CAS makes both audited commits visible
    tbl.fastForward("main", "audit")
    assert(tbl.toDF(spark).select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L))
    // idempotent publish
    val snaps = tbl.snapshots.size
    tbl.fastForward("main", "audit")
    assert(tbl.refresh().snapshots.size == snaps)

    // diverged histories are rejected (no merge semantics)
    tbl.append(Seq((4L, 4, "d")).toDF("id", "qty", "k")) // main moves past audit
    tbl.appendToBranch("audit", Seq((5L, 5, "e")).toDF("id", "qty", "k"))
    assertThrows[InvalidDataError](tbl.fastForward("main", "audit"))
    // tags are immutable on both sides
    tbl.createTag("v1")
    assertThrows[InvalidDataError](tbl.fastForward("v1", "audit"))
    assertThrows[InvalidDataError](
      tbl.appendToBranch("v1", Seq((9L, 9, "x")).toDF("id", "qty", "k")))
    // and an unknown source ref errors
    assertThrows[InvalidDataError](tbl.fastForward("main", "nope"))
  }

  test("branch-scoped DML: delete/update/upsert fix a branch; main invisible until publish") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val tbl = cat.createTable("wap_fix", schema,
      properties = Map("write.delete.mode" -> "merge-on-read"))
    tbl.append(Seq((1L, 10, "a"), (2L, 20, "b")).toDF("id", "qty", "k"))
    tbl.appendToBranch("audit", Seq((3L, 30, "bad"), (4L, 40, "d")).toDF("id", "qty", "k"))

    // the audit pipeline REPAIRS the branch: MOR delete of the bad row,
    // COW update of another, and an upsert — all committing to the
    // branch ref with the normal CAS discipline
    tbl.delete(spark, Seq(EqPred("k", "bad")), branch = "audit")
    tbl.update(spark, Seq(EqPred("id", 4L)), Map("qty" -> "qty + 1"), branch = "audit")
    tbl.upsert(spark, Seq((2L, 200, "B")).toDF("id", "qty", "k"), Seq("id"),
      branch = "audit")

    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, String)] =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet

    // main is untouched by every branch-scoped op
    assert(rows(tbl.toDF(spark)) == Set((1L, 10, "a"), (2L, 20, "b")))
    // the branch sees the fixed state
    val fixed = Set((1L, 10, "a"), (2L, 200, "B"), (4L, 41, "d"))
    assert(rows(tbl.scanRef("audit").toDF(spark)) == fixed)

    // publish: one fast-forward makes the audited+fixed state main
    tbl.fastForward("main", "audit")
    assert(rows(tbl.toDF(spark)) == fixed)

    // tags reject DML like they reject appends
    tbl.createTag("rel")
    assertThrows[InvalidDataError](
      tbl.delete(spark, Seq(EqPred("id", 1L)), branch = "rel"))
    assertThrows[InvalidDataError](
      tbl.update(spark, Seq(EqPred("id", 1L)), Map("qty" -> "0"), branch = "rel"))
    assertThrows[InvalidDataError](
      tbl.upsert(spark, Seq((1L, 0, "x")).toDF("id", "qty", "k"), Seq("id"),
        branch = "rel"))
  }

  test("tags and branches pin scans to snapshots") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val tbl = cat.createTable("refs_t", schema)
    tbl.append(Seq((1L, 1, "a")).toDF("id", "qty", "k"))
    tbl.createTag("v1")
    tbl.append(Seq((2L, 2, "b")).toDF("id", "qty", "k"))
    tbl.createBranch("dev")

    assert(tbl.scanRef("v1").toDF(spark).count() == 1)
    assert(tbl.scanRef("dev").toDF(spark).count() == 2)
    assert(tbl.refsDF(spark).collect().map(_.getString(0)).sorted.toSeq ==
      Seq("dev", "main", "v1"))
    assertThrows[InvalidDataError](tbl.scanRef("nope"))
    assertThrows[InvalidDataError](tbl.createTag("bad", Some(12345L)))
  }
}
