package graft

import graft.catalog.{Catalog, JdbcCatalog}
import org.scalatest.funsuite.AnyFunSuite

/** The shared catalog behavioral contract over the SQL (JDBC) backend on
  * embedded Derby (reference: sqlite catalog, `test/test_helper.rb:26-59`),
  * plus the pointer-swap CAS commit protocol. */
class JdbcCatalogSpec extends AnyFunSuite with CatalogBehavior {
  System.setProperty("derby.stream.error.file", "/tmp/graft-derby.log")

  def cat(): Catalog = {
    val dir = java.nio.file.Files.createTempDirectory("graft-jdbc").toString
    new JdbcCatalog(s"jdbc:derby:$dir/db;create=true", warehouse = s"$dir/wh")
  }

  test("table read/write round-trips through the JDBC pointer swap") {
    val spark = TestSpark.spark
    import spark.implicits._
    val c = cat()
    val t = c.createTable("kv", schema)
    t.append(Seq((1, "one"), (2, "two")).toDF("a", "b"))
    t.append(Seq((3, "three")).toDF("a", "b"))
    assert(t.toDF(spark).orderBy("a").collect().map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "one"), (2, "two"), (3, "three")))
    assert(t.snapshots.size == 2)
    assert(c.loadTable("kv").toDF(spark).count() == 3)
  }

  test("spark.readStream.table streams a JDBC-catalog table (cross-backend loader)") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.types.{ILong, NestedField, Schema}
    val c = cat().asInstanceOf[JdbcCatalog]
    graft.spark.GraftSparkCatalog.register(spark, "gjdbc", c)
    val tbl = c.createTable("stream_src", Schema(0, Seq(
      NestedField(1, "id", ILong, required = false))))
    tbl.append(Seq(1L, 2L).toDF("id"))
    val q = spark.readStream.table("gjdbc.stream_src")
      .writeStream.format("memory").queryName("jdbc_stream").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(q.lastProgress.sources.head.description.startsWith("GraftMicroBatchStream"))
      def ids = spark.table("jdbc_stream").collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L))
      // the new commit resolves through the JDBC pointer swap per trigger
      tbl.refresh().append(Seq(3L).toDF("id"))
      q.processAllAvailable()
      assert(ids == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stale handle conflicts (updateCount 0 → CommitConflictError) and retries") {
    val spark = TestSpark.spark
    import spark.implicits._
    val c = cat()
    c.createTable("race", schema)
    val h1 = c.loadTable("race")
    val h2 = c.loadTable("race") // both handles pin the same base version
    h1.append(Seq((1, "x")).toDF("a", "b"))
    // h2's base is stale; append must refresh-and-retry via the CAS
    h2.append(Seq((2, "y")).toDF("a", "b"))
    assert(c.loadTable("race").toDF(spark).count() == 2)
  }
}
