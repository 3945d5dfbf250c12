package graft

import graft.meta.{PartitionField, PartitionSpec}
import graft.table.EqPred
import graft.types.SparkSchemaConverter
import org.apache.spark.sql.functions._

/**
 * Scale probe (run manually against /tmp/sf1, see SCALE.md): measures the
 * round-9 overwrite family where its scale claims live —
 *  1. partition-aligned `overwriteWhere` must be metadata-only on the
 *     delete side (strict full-file drop) vs the row-level rewrite the
 *     same overwrite pays when the predicate is not provable;
 *  2. dynamic-partition overwrite cost must track the REPLACED data, not
 *     the table size (same replacement into a 10× table ≈ same time);
 *  3. the V2 fanout writer must take a whole multi-million-row partition
 *     through SQL dynamic INSERT OVERWRITE;
 *  4. streaming toTable must drain a 50k-doc table into a partitioned
 *     target through per-epoch atomic commits.
 */
object OverwriteScaleProbe {
  private def timed[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"TIMER $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    import spark.implicits._

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_returnflag")
    val spec = PartitionSpec(0, Seq(PartitionField(3, 1000, "l_returnflag", "identity")))
    def mkParted(name: String, df: org.apache.spark.sql.DataFrame): graft.table.Table = {
      val wh = java.nio.file.Files.createTempDirectory(s"graft-scale-$name").toString
      val cat = new graft.catalog.HadoopCatalog(wh)
      val t = cat.createTable(s"default.$name",
        SparkSchemaConverter.fromSpark(df.schema), partitionSpec = spec)
      t.append(df)
      t
    }

    val total = li.count()
    println(s"SF rows: $total")
    val repl = li.where("l_returnflag = 'R'").limit(1000).cache()
    repl.count()

    // 1a. partition-aligned overwrite: strict drop, nothing read
    val t1 = mkParted("strict", li)
    val rBefore = t1.scan(predicates = Seq(EqPred("l_returnflag", "R"))).planFiles().size
    timed("overwriteWhere partition-aligned (strict drop)") {
      t1.overwriteWhere(spark, Seq(EqPred("l_returnflag", "R")), repl)
    }
    val s1 = t1.currentSnapshot.get.summary
    println(s"STRICT deleted-files=${s1("deleted-data-files")} (partition had $rBefore) " +
      s"added-files=${s1("added-data-files")}")
    assert(s1("deleted-data-files").toInt == rBefore, "strict path must drop ALL partition files")

    // 1b. the same overwrite forced row-level (condition → discovery+rewrite)
    val t2 = mkParted("rowlevel", li)
    timed("overwriteWhere same rows, row-level (condition forces rewrite)") {
      t2.overwriteWhere(spark, Seq(EqPred("l_returnflag", "R")), repl,
        condition = Some("l_returnflag = 'R'"))
    }
    val c1 = t1.toDF(spark).count(); val c2 = t2.toDF(spark).count()
    assert(c1 == c2, s"both overwrite tiers must agree: $c1 vs $c2")
    println(s"CORRECT both tiers end at $c1 rows")

    // 2. dynamic overwrite cost tracks replaced data, not table size
    val sf01 = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_returnflag")
    val small = mkParted("dynsmall", sf01)
    val big = mkParted("dynbig", li)
    timed(s"dynamic overwrite of 1 partition (1000 rows) into ${sf01.count()}-row table") {
      small.overwritePartitions(repl)
    }
    timed(s"dynamic overwrite of 1 partition (1000 rows) into $total-row table") {
      big.overwritePartitions(repl)
    }

    // 3. SQL dynamic INSERT OVERWRITE pushes a whole partition through the
    // V2 fanout writer (executor-side parquet, partition-tuple routing)
    val cat3wh = java.nio.file.Files.createTempDirectory("graft-scale-sql").toString
    val cat3 = new graft.catalog.HadoopCatalog(cat3wh)
    graft.spark.GraftSparkCatalog.register(spark, "gscale", cat3)
    li.createOrReplaceTempView("scale_li_src")
    spark.sql("CREATE TABLE gscale.default.li PARTITIONED BY (l_returnflag) " +
      "AS SELECT * FROM scale_li_src")
    val rRows = li.where("l_returnflag = 'R'").count()
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try timed(s"SQL dynamic INSERT OVERWRITE, full $rRows-row partition via V2 fanout writer") {
      spark.sql("INSERT OVERWRITE gscale.default.li " +
        "SELECT l_orderkey, l_quantity + 1, l_returnflag FROM scale_li_src " +
        "WHERE l_returnflag = 'R'")
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    val got = spark.sql("SELECT count(*) FROM gscale.default.li WHERE l_returnflag = 'R'")
      .collect().head.getLong(0)
    assert(got == rRows, s"fanout writer must land the whole partition: $got vs $rRows")
    println(s"CORRECT fanout partition overwrite: $got rows")

    // 4. streaming toTable drains a 50k-doc table into a partitioned target
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "n_chars")
    val wh4 = java.nio.file.Files.createTempDirectory("graft-scale-s48").toString
    val cat4 = new graft.catalog.HadoopCatalog(wh4)
    graft.spark.GraftSparkCatalog.register(spark, "gscale4", cat4)
    val src4 = cat4.createTable("default.src", SparkSchemaConverter.fromSpark(docs.schema))
    src4.append(docs.where("doc_id % 2 = 0"))
    src4.append(docs.where("doc_id % 2 = 1"))
    spark.sql("CREATE TABLE gscale4.default.out (doc_id BIGINT, lang STRING, " +
      "n_chars BIGINT) PARTITIONED BY (lang)")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-scale-s48-cp").toString
    timed(s"streaming toTable, ${docs.count()} docs → partitioned target") {
      val q = spark.readStream.format("graft").load(s"$wh4/default/src")
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable("gscale4.default.out")
      q.awaitTermination()
    }
    val outN = cat4.loadTable("default.out").toDF(spark).count()
    assert(outN == docs.count(), s"stream must land every doc: $outN")
    println(s"CORRECT streaming toTable: $outN docs")
    println("ALL SCALE PROBES DONE")
  }
}
