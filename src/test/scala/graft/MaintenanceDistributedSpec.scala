package graft

import graft.catalog.HadoopCatalog
import graft.table.EqPred
import graft.types.{ILong, IString, NestedField, Schema}
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Cluster-scale maintenance: past the distributed threshold, the
  * reachability walks of removeOrphanFiles / expireSnapshots /
  * rewriteManifests run as Spark jobs with membership-as-join, and must
  * produce exactly the driver-parallel path's results. One table with >64
  * manifests exercises all three. */
class MaintenanceDistributedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = Schema(0, Seq(
    NestedField(1, "id", ILong, required = false),
    NestedField(2, "k", IString, required = false)))

  test("distributed sweeps at >64 manifests match the driver path and keep data intact") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-dist-maint").toString
    val cat = new HadoopCatalog(wh)
    val tbl = cat.createTable("t", schema)
    // 66 fast appends → 66 data manifests in the current snapshot
    for (i <- 1 to 66)
      tbl.append(Seq((i.toLong, s"v$i")).toDF("id", "k").coalesce(1))
    val fs = new Path(tbl.location).getFileSystem(tbl.hadoopConf)
    assert(graft.table.Reachability.manifestInventory(
      fs, Seq(tbl.currentSnapshot.get)).size == 66)

    def allRows = tbl.toDF(spark).select("id").as[Long].collect().toSet
    val fullSet = (1L to 66L).toSet
    assert(allRows == fullSet)

    // ---- orphan sweep: plant identical orphans twice, driver vs Spark —
    // the two paths must delete exactly the same set
    def plant(): Set[String] = {
      val paths = Seq(
        new Path(tbl.location, "data/orphan-1.parquet"),
        new Path(tbl.location, "data/deadcommit/orphan-2.parquet"),
        new Path(tbl.location, "metadata/orphan-3.avro"))
      paths.foreach { p =>
        val out = fs.create(p, true); out.write(Array[Byte](1, 2, 3)); out.close()
        fs.setTimes(p, System.currentTimeMillis() - 3600_000, -1)
      }
      // a metadata .json is the catalog's, never swept; recent files and
      // markers are protected by the age cutoff / name filters
      paths.map(p => fs.makeQualified(p).toString).toSet
    }
    // deleted paths come back in whatever form the listing produced;
    // compare fully qualified on both sides
    def qual(ps: Seq[String]): Set[String] =
      ps.map(p => fs.makeQualified(new Path(p)).toString).toSet
    val cutoff = System.currentTimeMillis() - 1000
    val planted1 = plant()
    val driverDeleted = qual(tbl.removeOrphanFiles(cutoff))
    assert(driverDeleted == planted1)
    val planted2 = plant()
    val sparkDeleted = qual(tbl.removeOrphanFiles(spark, cutoff, 2)) // force Spark path
    assert(sparkDeleted == planted2, "distributed sweep != driver sweep")
    assert(allRows == fullSet)

    // ---- distributed rewriteManifests: 66 manifests → 1, rows unchanged
    tbl.rewriteManifests(spark, 2, 2)
    assert(graft.table.Reachability.manifestInventory(
      fs, Seq(tbl.refresh().currentSnapshot.get)).size == 1)
    assert(allRows == fullSet)

    // ---- distributed expireSnapshots: a COW delete leaves the old files
    // for time travel; expiring all but the head must reclaim them
    tbl.delete(spark, Seq(EqPred("id", 66L)))
    val before = tbl.scan(Some(tbl.snapshots.init.last.snapshotId)) // pre-delete head
    val headFiles = tbl.scan().planFiles().map(_.filePath).toSet
    tbl.expireSnapshots(spark, System.currentTimeMillis() + 1000, 1, 2)
    assert(tbl.refresh().snapshots.size == 1)
    // the old snapshots' manifest lists are gone; head files all survive
    assert(headFiles.forall(p => fs.exists(new Path(p))))
    assert(allRows == fullSet - 66L)
  }
}
