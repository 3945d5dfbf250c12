package graft

import graft.catalog.MemoryCatalog
import graft.types.{ILong, IString, NestedField, Schema}
import org.scalatest.funsuite.AnyFunSuite

/** SQL-queryable metadata tables (snapshots/history/manifests/files/refs). */
class MetadataTablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("metadata DataFrames reflect commits and are SQL-joinable") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val schema = Schema(0, Seq(
      NestedField(1, "id", ILong, required = false),
      NestedField(2, "v", IString, required = false)))
    val tbl = cat.createTable("meta_t", schema)
    tbl.append(Seq(1L -> "a", 2L -> "b").toDF("id", "v"))
    tbl.append(Seq(3L -> "c").toDF("id", "v"))

    val snaps = tbl.snapshotsDF(spark)
    assert(snaps.count() == 2)
    assert(snaps.select("operation").distinct().collect().map(_.getString(0)).toSeq
      == Seq("append"))
    // sequence numbers 1, 2; parent chain intact
    assert(snaps.select("sequence_number").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L))

    val hist = tbl.historyDF(spark)
    assert(hist.count() == 2)
    assert(hist.where("is_current_ancestor").count() == 2)

    val mans = tbl.manifestsDF(spark)
    assert(mans.count() == 2) // fast append: one manifest per commit
    assert(mans.where("content = 0").count() == 2)

    val files = tbl.filesDF(spark)
    assert(files.count() >= 2) // at least one data file per append
    assert(files.agg(org.apache.spark.sql.functions.sum("record_count"))
      .collect().head.getLong(0) == 3L)

    val refs = tbl.refsDF(spark)
    assert(refs.collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("main", "branch")))
    assert(refs.collect().head.getLong(2) == tbl.currentSnapshotId.get)

    // SQL-joinable: data count per file via metadata
    tbl.filesDF(spark).createOrReplaceTempView("meta_files")
    val n = spark.sql("SELECT CAST(SUM(record_count) AS BIGINT) FROM meta_files")
      .collect().head.getLong(0)
    assert(n == 3L)
  }

  test("partitions metadata table rolls up live files per partition tuple") {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val schema = Schema(0, Seq(
      NestedField(1, "id", ILong, required = false),
      NestedField(2, "k", IString, required = false)))
    val spec = graft.meta.PartitionSpec(0,
      Seq(graft.meta.PartitionField(2, 1000, "k", "identity")))
    val tbl = cat.createTable("part_meta", schema, partitionSpec = spec)
    tbl.append(Seq(1L -> "a", 2L -> "a", 3L -> "b").toDF("id", "k"))
    tbl.append(Seq(4L -> "b").toDF("id", "k"))

    val parts = tbl.partitionsDF(spark).collect()
      .map(r => r.getMap[String, String](0)("k") ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(parts("a") == (1L, 2L)) // 1 file, 2 records
    assert(parts("b") == (2L, 2L)) // one file per append
    // rolls up the LIVE view: a delete shrinks the partition
    tbl.delete(spark, Seq(graft.table.EqPred("k", "a")))
    assert(!tbl.partitionsDF(spark).collect()
      .exists(_.getMap[String, String](0).get("k").contains("a")))
  }
}
