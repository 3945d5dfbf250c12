package graft

import graft.catalog.MemoryCatalog
import graft.spark.GraftSparkCatalog
import org.scalatest.funsuite.AnyFunSuite

/** SQL UPDATE / MERGE INTO via GraftSqlExtensions (registered on the shared
  * TestSpark session): statements on graft DSv2 tables execute graft's
  * native DML; everything else falls through to Spark untouched. */
class SqlDmlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val cat = new MemoryCatalog(name = "dmlmem")
  private val C = "gdml"

  private def sql(q: String) = spark.sql(q)
  private lazy val init: Unit = {
    GraftSparkCatalog.register(spark, C, cat)
    cat.createNamespace(Seq("s"), ifNotExists = true)
  }

  test("UPDATE ... WHERE runs as native copy-on-write update") {
    init
    sql(s"CREATE TABLE $C.s.acct (id BIGINT, bal DOUBLE, tier STRING)")
    sql(s"INSERT INTO $C.s.acct VALUES (1, 10.0, 'a'), (2, 20.0, 'b'), (3, 30.0, 'b')")
    sql(s"UPDATE $C.s.acct SET bal = bal + 5.0, tier = 'vip' WHERE id >= 2")
    val rows = sql(s"SELECT id, bal, tier FROM $C.s.acct ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(rows.toSeq == Seq((1L, 10.0, "a"), (2L, 25.0, "vip"), (3L, 35.0, "vip")))
    assert(cat.loadTable("s.acct").snapshots.length == 2)
  }

  test("UPDATE with OR/LIKE condition routes through row-level updateWhere") {
    init
    sql(s"CREATE TABLE $C.s.acct2 (id BIGINT, bal DOUBLE, tier STRING)")
    sql(s"INSERT INTO $C.s.acct2 VALUES (1, 10.0, 'az'), (2, 20.0, 'b'), (3, 300.0, 'c')")
    sql(s"UPDATE $C.s.acct2 SET bal = -1.0 WHERE tier LIKE 'a%' OR bal > 100")
    val bals = sql(s"SELECT bal FROM $C.s.acct2 ORDER BY id").collect().map(_.getDouble(0))
    assert(bals.toSeq == Seq(-1.0, 20.0, -1.0))
  }

  test("UPDATE without WHERE updates every row") {
    init
    sql(s"CREATE TABLE $C.s.acct3 (id BIGINT, bal DOUBLE)")
    sql(s"INSERT INTO $C.s.acct3 VALUES (1, 1.0), (2, 2.0)")
    sql(s"UPDATE $C.s.acct3 SET bal = bal * 10")
    val bals = sql(s"SELECT bal FROM $C.s.acct3 ORDER BY id").collect().map(_.getDouble(0))
    assert(bals.toSeq == Seq(10.0, 20.0))
  }

  test("DELETE with OR condition routes through row-level deleteWhere") {
    init
    sql(s"CREATE TABLE $C.s.del2 (id BIGINT, tier STRING)")
    sql(s"INSERT INTO $C.s.del2 VALUES (1, 'a'), (2, 'b'), (3, 'c'), (4, 'a')")
    sql(s"DELETE FROM $C.s.del2 WHERE tier = 'a' OR id = 3")
    val ids = sql(s"SELECT id FROM $C.s.del2 ORDER BY id").collect().map(_.getLong(0))
    assert(ids.toSeq == Seq(2L))
    assert(cat.loadTable("s.del2").snapshots.length == 2)
  }

  test("complex-condition DML honors the table's write mode (COW stays delete-file-free)") {
    init
    // default (copy-on-write) table: OR-condition DELETE/UPDATE must NOT
    // accumulate delete files — they rewrite the affected files
    sql(s"CREATE TABLE $C.s.cow (id BIGINT, tier STRING)")
    sql(s"INSERT INTO $C.s.cow VALUES (1, 'a'), (2, 'b'), (3, 'c'), (4, 'a')")
    sql(s"DELETE FROM $C.s.cow WHERE tier = 'a' OR id = 3")
    sql(s"UPDATE $C.s.cow SET tier = 'x' WHERE tier LIKE 'b%' OR id > 100")
    val cow = cat.loadTable("s.cow")
    assert(cow.scan().planFiles().forall(_.deleteFiles.isEmpty),
      "COW table accumulated delete files from complex-condition SQL DML")
    val rows = sql(s"SELECT id, tier FROM $C.s.cow ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((2L, "x")))
    // MOR table: the same DML writes position deletes, no rewrite
    sql(s"""CREATE TABLE $C.s.morx (id BIGINT, tier STRING) TBLPROPERTIES
           | ('write.delete.mode'='merge-on-read','write.update.mode'='merge-on-read')""".stripMargin)
    sql(s"INSERT INTO $C.s.morx VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    sql(s"DELETE FROM $C.s.morx WHERE tier = 'a' OR id = 3")
    val mor = cat.loadTable("s.morx")
    assert(mor.scan().planFiles().exists(_.deleteFiles.nonEmpty),
      "MOR table should delete via position deletes")
    assert(sql(s"SELECT id FROM $C.s.morx").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("subquery in a DML condition fails loudly, not wrongly") {
    init
    val e = intercept[UnsupportedFeatureError](
      sql(s"UPDATE $C.s.acct SET bal = 0 WHERE id IN (SELECT id FROM $C.s.acct WHERE bal > 5)"))
    assert(e.getMessage.contains("not supported"))
  }

  test("MERGE INTO: UPDATE SET * / INSERT * upsert semantics") {
    init
    sql(s"CREATE TABLE $C.s.m1 (id BIGINT, v DOUBLE)")
    sql(s"INSERT INTO $C.s.m1 VALUES (1, 1.0), (2, 2.0)")
    sql(s"""MERGE INTO $C.s.m1 t
           |USING (SELECT * FROM VALUES (2, 20.0), (3, 30.0) AS src(id, v)) s
           |ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val rows = sql(s"SELECT id, v FROM $C.s.m1 ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSeq == Seq((1L, 1.0), (2L, 20.0), (3L, 30.0)))
  }

  test("MERGE INTO: UPDATE SET with expressions over target and source") {
    init
    sql(s"CREATE TABLE $C.s.m2 (id BIGINT, v DOUBLE)")
    sql(s"INSERT INTO $C.s.m2 VALUES (1, 1.0), (2, 2.0)")
    sql(s"""MERGE INTO $C.s.m2 t
           |USING (SELECT * FROM VALUES (1, 100.0), (9, 900.0) AS src(id, v)) s
           |ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET v = t.v + s.v
           |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""".stripMargin)
    val rows = sql(s"SELECT id, v FROM $C.s.m2 ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSeq == Seq((1L, 101.0), (2L, 2.0), (9L, 900.0)))
  }

  test("MERGE INTO: WHEN MATCHED DELETE, merge-on-read table") {
    init
    sql(s"""CREATE TABLE $C.s.m3 (id BIGINT, v DOUBLE)
           |TBLPROPERTIES ('write.merge.mode' = 'merge-on-read')""".stripMargin)
    sql(s"INSERT INTO $C.s.m3 VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    sql(s"""MERGE INTO $C.s.m3 t
           |USING (SELECT * FROM VALUES (CAST(2 AS BIGINT)) AS src(id)) s
           |ON t.id = s.id
           |WHEN MATCHED THEN DELETE""".stripMargin)
    val ids = sql(s"SELECT id FROM $C.s.m3 ORDER BY id").collect().map(_.getLong(0))
    assert(ids.toSeq == Seq(1L, 3L))
  }

  test("concurrent SQL MERGEs on disjoint keys all commit (CAS retry)") {
    init
    sql(s"CREATE TABLE $C.s.conc (id BIGINT, v BIGINT)")
    sql(s"INSERT INTO $C.s.conc VALUES (0, 0)")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val merges = (1 to 4).map { k =>
      Future(sql(
        s"""MERGE INTO $C.s.conc t
           |USING (SELECT CAST($k AS BIGINT) AS id, CAST(${k * 10} AS BIGINT) AS v) s
           |ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin))
    }
    Await.result(Future.sequence(merges), 120.seconds)
    val rows = sql(s"SELECT id, v FROM $C.s.conc ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((0L, 0L), (1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)))
    // every merge inserted (no lost update): 1 create + 1 insert + 4 merges
    assert(cat.loadTable("s.conc").snapshots.length >= 5)
  }

  test("non-graft tables keep Spark's own (rejecting) DML path") {
    init
    spark.range(3).createOrReplaceTempView("plain_view")
    val e = intercept[Exception](sql("UPDATE plain_view SET id = 0 WHERE id = 1"))
    assert(!e.isInstanceOf[UnsupportedFeatureError])
  }

  test("MERGE with NOT MATCHED BY SOURCE runs a full sync") {
    init
    sql(s"CREATE TABLE $C.s.sync (id BIGINT, v STRING)")
    sql(s"INSERT INTO $C.s.sync VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    sql(s"""MERGE INTO $C.s.sync t
           |USING (SELECT * FROM VALUES (2, 'B'), (9, 'i') AS src(id, v)) s
           |ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *
           |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    val rows = sql(s"SELECT id, v FROM $C.s.sync ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((2L, "B"), (9L, "i")))

    sql(s"""MERGE INTO $C.s.sync t
           |USING (SELECT * FROM VALUES (2, 'B') AS src(id, v)) s
           |ON t.id = s.id
           |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = concat(t.v, '_stale')""".stripMargin)
    val rows2 = sql(s"SELECT id, v FROM $C.s.sync ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows2.toSeq == Seq((2L, "B"), (9L, "i_stale")))
  }
}
