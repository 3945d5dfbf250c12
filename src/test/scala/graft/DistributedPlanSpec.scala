package graft

import graft.catalog.MemoryCatalog
import graft.meta.{PartitionField, PartitionSpec}
import graft.table.EqPred
import graft.types._
import org.scalatest.funsuite.AnyFunSuite

/** Distributed manifest planning: executor-side manifest reads + pruning
  * must return exactly the driver-parallel plan (tasks, pruning, deletes). */
class DistributedPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = Schema(0, Seq(
    NestedField(1, "id", ILong, required = false),
    NestedField(2, "grp", IString, required = false),
    NestedField(3, "v", IDouble, required = false)))

  test("distributed plan == driver plan, including partition pruning") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val spec = PartitionSpec(0, Seq(PartitionField(2, 1000, "grp", "identity")))
    val tbl = cat.createTable("dist_plan", schema, partitionSpec = spec)
    // several commits → several manifests (fast append adds one per commit)
    for (i <- 0 until 6) {
      tbl.append(Seq(
        (i * 10L, "a", 1.5), (i * 10L + 1, "b", 2.5), (i * 10L + 2, "c", 3.5))
        .toDF("id", "grp", "v"))
    }

    def key(t: graft.table.FileScanTask) = (t.filePath, t.schemaId, t.sequenceNumber)
    val full = tbl.scan()
    assert(full.planFilesDistributed(spark, threshold = 2).map(key).sorted ==
      full.planFiles().map(key).sorted)

    // pruning happens on the executors too
    val pruned = tbl.scan(predicates = Seq(EqPred("grp", "b")))
    val dist = pruned.planFilesDistributed(spark, threshold = 2)
    assert(dist.map(key).sorted == pruned.planFiles().map(key).sorted)
    assert(dist.nonEmpty && dist.size < full.planFiles().size)

    // and the materialized result is identical either way
    assert(pruned.toDF(spark).collect().map(_.getLong(0)).sorted.toSeq ==
      (0 until 6).map(i => i * 10L + 1).sorted)
  }

  test("manifest-list 507 summaries prune whole manifests; DML never loses files") {
    import spark.implicits._
    import graft.manifest.Manifests
    import graft.table.{GePred, ScanPruning}
    import org.apache.hadoop.fs.Path
    val cat = new MemoryCatalog()
    val spec = PartitionSpec(0, Seq(PartitionField(2, 1000, "grp", "identity")))
    val tbl = cat.createTable("sum507", schema, partitionSpec = spec)
    // one append per partition value → one manifest per partition value
    for ((g, base) <- Seq("a" -> 0L, "b" -> 10L, "c" -> 20L))
      tbl.append(Seq((base, g, 1.0), (base + 1, g, 2.0)).toDF("id", "grp", "v"))

    val meta = tbl.metadata
    val fs = new Path(tbl.location).getFileSystem(tbl.hadoopConf)
    val mfs = Manifests.readManifestList(fs, new Path(tbl.currentSnapshot.get.manifestList))
    assert(mfs.size == 3 && mfs.forall(_.partitions.nonEmpty))

    // the summaries alone identify the one manifest that can hold grp='b'
    val curSchema = meta.currentSchema
    val kept = mfs.filter(mf => ScanPruning.keepManifestEvolved(
      Seq(EqPred("grp", "b")), mf.partitions, spec, curSchema, curSchema))
    assert(kept.size == 1)
    assert(tbl.scan(predicates = Seq(EqPred("grp", "b"))).toDF(spark)
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(10L, 11L))

    // numeric summaries: a second spec field would work the same; here,
    // verify a non-pruning predicate keeps all manifests (conservative)
    assert(mfs.forall(mf => ScanPruning.keepManifestEvolved(
      Seq(GePred("id", 0L)), mf.partitions, spec, curSchema, curSchema)))

    // CRITICAL safety: COW DML plans with manifest-skipping DISABLED —
    // deleting grp='a' must carry the b/c files into the new snapshot
    tbl.delete(spark, Seq(EqPred("grp", "a")))
    assert(tbl.toDF(spark).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(10L, 11L, 20L, 21L))
  }

  test("changesBetween delete-diff plans distributed past 64 manifests") {
    // the r13 gap: the non-append changesBetween branch (two-snapshot
    // file diff + exceptAll) was exercised only at small manifest counts
    // — here BOTH sides of a delete-containing diff sit past the
    // 64-manifest DistributedPlanThreshold, so the diff's planning runs
    // the executor-side path, and the changelog must still equal the
    // independently computed snapshot difference (the oracle).
    import spark.implicits._
    import graft.manifest.Manifests
    import org.apache.hadoop.fs.Path
    val cat = new MemoryCatalog()
    val tbl = cat.createTable("cdc_dist", schema)
    // 66 fast-append commits → 66 data manifests (one per commit)
    for (i <- 0 until 66) {
      tbl.append(Seq(
        (i * 2L, if (i % 2 == 0) "a" else "b", i.toDouble),
        (i * 2L + 1, if (i % 2 == 0) "a" else "b", i + 0.5))
        .toDF("id", "grp", "v"))
    }
    val base = tbl.currentSnapshot.get
    def dataManifestCount(snap: graft.meta.Snapshot): Int = {
      val fs = new Path(tbl.location).getFileSystem(tbl.hadoopConf)
      Manifests.readManifestList(fs, new Path(snap.manifestList))
        .count(_.content == 0)
    }
    assert(dataManifestCount(base) >= graft.table.TableScan.DistributedPlanThreshold,
      s"fixture must sit past the distributed-planning threshold, " +
        s"got ${dataManifestCount(base)} data manifests")
    val before = tbl.toDF(spark)

    // COW delete across a VALUE boundary: commit i's file holds v = i and
    // i + 0.5, so v >= 10.3 drops files 11..65 whole AND rewrites file 10
    // (10.5 goes, 10.0 survives) — one commit whose diff carries removed
    // files and an added rewrite file, the full exceptAll branch, not the
    // MOR fast path
    tbl.delete(spark, Seq(graft.table.GePred("v", 10.3)))
    val head = tbl.currentSnapshot.get
    // the COW commit consolidates carried files into fresh manifests, so
    // the HEAD side re-plans small — the scale-relevant side of a delete
    // diff is the PARENT (the standing 100 TB table), which stays past
    // the threshold and is what changesBetween plans distributed
    assert(dataManifestCount(head) < dataManifestCount(base))
    val after = tbl.toDF(spark)

    // plan-shape pin: at the parent's manifest count the executor-side
    // planner is the one that runs inside changesBetween — its result
    // must equal the driver plan at both endpoints
    def key(t: graft.table.FileScanTask) = (t.filePath, t.schemaId, t.sequenceNumber)
    for (sid <- Seq(base.snapshotId, head.snapshotId)) {
      val scan = tbl.scan(Some(sid))
      assert(scan.planFilesDistributed(spark).map(key).sorted ==
        scan.planFiles().map(key).sorted)
    }

    // oracle equality: the changelog over (base, head] must equal the
    // independently computed multiset snapshot difference
    val changes = graft.streaming.StreamingOps.changesBetween(
      spark, tbl, Some(base.snapshotId))
    assert(changes.select("_commit_snapshot_id").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(head.snapshotId))
    val dels = changes.where($"_change_type" === "delete").select("id", "grp", "v")
    val inss = changes.where($"_change_type" === "insert").select("id", "grp", "v")
    assert(dels.exceptAll(before.exceptAll(after)).isEmpty &&
      before.exceptAll(after).exceptAll(dels).isEmpty,
      "changelog deletes must equal the snapshot multiset difference")
    assert(inss.exceptAll(after.exceptAll(before)).isEmpty &&
      after.exceptAll(before).exceptAll(inss).isEmpty,
      "changelog inserts must equal the snapshot multiset difference")
    // 1 row from the rewritten file 10 + 2 rows from each of files 11..65;
    // the surviving rewritten row (v = 10.0) cancels in the multiset diff,
    // so a COW rewrite emits no phantom inserts
    assert(dels.count() == 111 && inss.count() == 0)
  }
}
