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
}
