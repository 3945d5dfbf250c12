package graft

import graft.catalog.MemoryCatalog
import graft.table.{EqPred, ParquetStats}
import graft.types._
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Footer-stats extraction invariants, especially the merge ACROSS row
  * groups: string bounds must merge lexicographically (the order Parquet
  * computed them in and the order scan pruning compares them in) — never
  * numerically, even when every value parses as a number. */
class ParquetStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def conf = spark.sparkContext.hadoopConfiguration

  private def onlyParquet(dir: String): String = {
    val fs = new Path(dir).getFileSystem(conf)
    fs.listStatus(new Path(dir)).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get.toString
  }

  private def rowGroups(file: String): Int = {
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(file), conf))
    try r.getFooter.getBlocks.asScala.size finally r.close()
  }

  test("string bounds merge lexicographically across row groups; pruning keeps the file") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pqstats").toString
    // 100 rows of "9" then 100 of "10"; a 1 KiB block size flushes the
    // first row group at parquet's 100-record check, so the two values
    // land in separate row groups and the bug (if present) is exercised
    // by the MERGE, not masked by parquet's own per-group comparator.
    val rows = (0 until 100).map(i => (i.toLong, "9")) ++
      (100 until 200).map(i => (i.toLong, "10"))
    rows.toDF("id", "c").coalesce(1)
      .write.option("parquet.block.size", "1024").mode("overwrite").parquet(s"$dir/d")
    val file = onlyParquet(s"$dir/d")
    assert(rowGroups(file) >= 2, "test needs >=2 row groups to exercise the merge")

    val st = ParquetStats.read(conf, new Path(file))
    assert(st.recordCount == 200)
    // lexicographic: "10" < "9"
    assert(st.lowerBounds("c") == "10", s"lower was ${st.lowerBounds("c")}")
    assert(st.upperBounds("c") == "9", s"upper was ${st.upperBounds("c")}")
    // id is numeric: bounds merge numerically
    assert(st.lowerBounds("id") == "0" && st.upperBounds("id") == "199")

    // end-to-end through the manifest: a numeric merge would have recorded
    // lower="9"/upper="10" and EqPred(c,"10") ("10" < "9" lexicographically)
    // would prune the very file that holds the rows — silently wrong
    val cat = new MemoryCatalog()
    val tbl = cat.createTable("pqstats_t", Schema(0, Seq(
      NestedField(1, "id", ILong, required = false),
      NestedField(2, "c", IString, required = false))))
    tbl.addFiles(spark, Seq(file))
    assert(tbl.scan(predicates = Seq(EqPred("c", "10"))).planFiles().size == 1)
    assert(tbl.scan(predicates = Seq(EqPred("c", "10"))).toDF(spark).count() == 100)
    assert(tbl.scan(predicates = Seq(EqPred("c", "9"))).toDF(spark).count() == 100)
    // metadata-level max is the lexicographic one
    assert(tbl.scan().planFiles().head.file.upperBounds("c") == "9")
  }

  test("decimal bounds are recorded scale-normalized") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pqdec").toString
    spark.sql("SELECT CAST(67.89 AS DECIMAL(9,2)) AS p32, CAST(67.89 AS DECIMAL(18,2)) AS p64")
      .union(spark.sql("SELECT CAST(123.45 AS DECIMAL(9,2)), CAST(123.45 AS DECIMAL(18,2))"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/d")
    val st = ParquetStats.read(conf, new Path(onlyParquet(s"$dir/d")))
    assert(st.lowerBounds("p32") == "67.89" && st.upperBounds("p32") == "123.45")
    assert(st.lowerBounds("p64") == "67.89" && st.upperBounds("p64") == "123.45")
  }

  test("NaN poisons float/double bounds; raw binary records none") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pqnan").toString
    Seq(1.0, Double.NaN, 2.0).toDF("x").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/nan")
    val stNan = ParquetStats.read(conf, new Path(onlyParquet(s"$dir/nan")))
    // either the writer skipped NaN (bounds unusable for Spark MIN/MAX —
    // we cannot detect that here, consumers decline float/double) or it
    // propagated NaN and the bounds are poisoned; both must avoid NaN text
    stNan.lowerBounds.get("x").foreach(b => assert(b != "NaN"))
    stNan.upperBounds.get("x").foreach(b => assert(b != "NaN"))

    Seq(Array[Byte](1, 2), Array[Byte](3)).toDF("b").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/bin")
    val stBin = ParquetStats.read(conf, new Path(onlyParquet(s"$dir/bin")))
    assert(!stBin.lowerBounds.contains("b") && !stBin.upperBounds.contains("b"))
  }
}
