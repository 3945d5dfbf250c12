package graft

import graft.streaming.StreamingOps
import graft.types.SparkSchemaConverter
import org.apache.spark.sql.functions._

/**
 * Scale probe (run manually against /tmp/sf1, see SCALE.md): CDC
 * replication at 10× the gated scale. The claims under test:
 *  1. the initial replication of a large table is one pure-insert merge
 *     per commit (no target reads — the mirror is empty), i.e. its cost
 *     is the cost of writing the data once;
 *  2. an INCREMENTAL replication pass costs O(changed rows), not
 *     O(table): a 1%-of-table CDC batch into a 1.5M-row mirror must not
 *     re-read or re-write the unaffected rows (merge prunes target files
 *     by the batch's key bounds);
 *  3. the mirror equals the live source exactly after every pass
 *     (count + keyed checksum), including delete propagation.
 */
object ReplicationScaleProbe {
  private def timed[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"TIMER $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val sfDir = args.headOption.getOrElse("/tmp/sf1")

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
    val nOrders = orders.count()
    println(s"orders rows: $nOrders")

    val wh = java.nio.file.Files.createTempDirectory("graft-repl").toString
    val cat = new graft.catalog.HadoopCatalog(wh)
    val src = cat.createTable("default.repl_src",
      SparkSchemaConverter.fromSpark(orders.schema))
    val tgt = cat.createTable("default.repl_tgt",
      SparkSchemaConverter.fromSpark(orders.schema))

    def fingerprint(t: graft.table.Table): (Long, Double) = {
      val r = t.refresh().toDF(spark)
        .agg(count(lit(1)), sum(col("o_orderkey") * col("o_totalprice")))
        .collect()(0)
      (r.getLong(0), r.getDouble(1))
    }

    // 1. source history: bulk load + a 1% upsert + a 0.1% targeted delete
    src.append(orders)
    src.upsert(spark, orders.where("o_orderkey % 100 = 7")
      .selectExpr("o_orderkey", "o_totalprice + 10 AS o_totalprice",
        "o_orderstatus"), Seq("o_orderkey"))
    src.refresh().deleteWhere(spark, "o_orderkey % 1000 = 13")

    val ckpt = timed(s"initial replication ($nOrders rows + 1% upsert + 0.1% delete)") {
      StreamingOps.replicateChanges(spark, src, tgt, Seq("o_orderkey"))
    }
    val (srcN, srcSum) = fingerprint(src)
    val (tgtN, tgtSum) = fingerprint(tgt)
    assert(srcN == tgtN && math.abs(srcSum - tgtSum) < 1e-6 * math.abs(srcSum),
      s"mirror diverged after initial replication: $srcN/$srcSum vs $tgtN/$tgtSum")
    println(s"initial OK: mirror == live at $tgtN rows")

    // 2. clustered incremental pass — the "CDC batch touches one day"
    // shape from applyChanges' scale note: the batch's keys sit in one
    // narrow range, so the merge's source-key-bounds pruning plans only
    // the mirror files whose bounds intersect it (the bulk-load files
    // inherit the source parquet's key clustering). Cost must track the
    // BATCH, not the mirror.
    val Array(qlo, qhi) = orders.stat
      .approxQuantile("o_orderkey", Array(0.40, 0.41), 0.001)
    val clustered = orders.where(s"o_orderkey >= ${qlo.toLong} AND " +
      s"o_orderkey < ${qhi.toLong}")
    println(s"clustered batch rows: ${clustered.count()}")
    src.refresh().upsert(spark, clustered
      .selectExpr("o_orderkey", "o_totalprice + 20 AS o_totalprice",
        "o_orderstatus"), Seq("o_orderkey"))
    val ckpt2 = timed("incremental replication (clustered 1% batch)") {
      StreamingOps.replicateChanges(spark, src, tgt, Seq("o_orderkey"), ckpt)
    }
    assert(ckpt2 == src.refresh().currentSnapshotId)
    val (srcN2, srcSum2) = fingerprint(src)
    val (tgtN2, tgtSum2) = fingerprint(tgt)
    assert(srcN2 == tgtN2 && math.abs(srcSum2 - tgtSum2) < 1e-6 * math.abs(srcSum2),
      s"mirror diverged after clustered pass: $srcN2/$srcSum2 vs $tgtN2/$tgtSum2")
    println(s"clustered incremental OK: mirror == live at $tgtN2 rows")

    // 3. scattered incremental pass — the honest worst case: keys hit
    // every file's bounds (o_orderkey % 100 spans the full range), so
    // no pruning is sound and copy-on-write re-reads the intersecting
    // files. The remedy at 100 TB is layout (partition/sort the mirror
    // so CDC batches stay clustered), not a different merge algorithm.
    src.refresh().upsert(spark, orders.where("o_orderkey % 100 = 21")
      .selectExpr("o_orderkey", "o_totalprice + 30 AS o_totalprice",
        "o_orderstatus"), Seq("o_orderkey"))
    val ckpt3 = timed("incremental replication (scattered 1% batch)") {
      StreamingOps.replicateChanges(spark, src, tgt, Seq("o_orderkey"), ckpt2)
    }
    assert(ckpt3 == src.refresh().currentSnapshotId)
    val (srcN3, srcSum3) = fingerprint(src)
    val (tgtN3, tgtSum3) = fingerprint(tgt)
    assert(srcN3 == tgtN3 && math.abs(srcSum3 - tgtSum3) < 1e-6 * math.abs(srcSum3),
      s"mirror diverged after scattered pass: $srcN3/$srcSum3 vs $tgtN3/$tgtSum3")
    println(s"scattered incremental OK: mirror == live at $tgtN3 rows")

    // 4. no-op pass past the checkpoint: zero mirror commits
    val before = tgt.refresh().currentSnapshotId
    assert(StreamingOps.replicateChanges(spark, src, tgt,
      Seq("o_orderkey"), ckpt3) == ckpt3)
    assert(tgt.refresh().currentSnapshotId == before, "no-op pass committed")
    println("no-op OK: checkpoint pass leaves the mirror untouched")

    println("ALL REPLICATION SCALE PROBES DONE")
    spark.stop()
  }
}
