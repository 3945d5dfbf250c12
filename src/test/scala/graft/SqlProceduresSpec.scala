package graft

import graft.catalog.MemoryCatalog
import graft.spark.GraftSparkCatalog
import org.scalatest.funsuite.AnyFunSuite

/** SQL CALL maintenance procedures (Spark 4 DSv2 ProcedureCatalog). */
class SqlProceduresSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val cat = new MemoryCatalog(name = "procmem")
  private val C = "gproc"

  private def sql(q: String) = spark.sql(q)
  private lazy val init: Unit = GraftSparkCatalog.register(spark, C, cat)

  test("CALL compact bin-packs small files") {
    init
    sql(s"CREATE TABLE $C.default.c (id BIGINT)")
    (1 to 4).foreach(i => sql(s"INSERT INTO $C.default.c VALUES ($i)"))
    val before = cat.loadTable("c").scan().planFiles().length
    val msg = sql(s"CALL $C.system.compact(`table` => 'c')").head().getString(0)
    assert(msg == "compacted")
    val after = cat.loadTable("c").scan().planFiles().length
    assert(before == 4 && after == 1)
    assert(sql(s"SELECT count(*) FROM $C.default.c").head().getLong(0) == 4)
  }

  test("CALL rollback + expire_snapshots") {
    init
    sql(s"CREATE TABLE $C.default.r (id BIGINT)")
    sql(s"INSERT INTO $C.default.r VALUES (1)")
    val t = cat.loadTable("r")
    val first = t.currentSnapshotId.get
    sql(s"INSERT INTO $C.default.r VALUES (2)")
    sql(s"CALL $C.system.rollback(`table` => 'r', snapshot_id => $first)")
    assert(sql(s"SELECT count(*) FROM $C.default.r").head().getLong(0) == 1)
    // expire everything older than now except the current state
    val msg = sql(s"CALL $C.system.expire_snapshots(`table` => 'r', " +
      s"older_than_ms => ${System.currentTimeMillis() + 1000})").head().getString(0)
    assert(msg == "expired")
    assert(sql(s"SELECT count(*) FROM $C.default.r").head().getLong(0) == 1)
  }

  test("CALL fast_forward publishes a WAP branch") {
    init
    sql(s"CREATE TABLE $C.default.w (id BIGINT)")
    sql(s"INSERT INTO $C.default.w VALUES (1)")
    import spark.implicits._
    cat.loadTable("w").appendToBranch("audit", Seq(2L, 3L).toDF("id"))
    sql(s"CALL $C.system.fast_forward(`table` => 'w', branch => 'main', `from` => 'audit')")
    assert(sql(s"SELECT count(*) FROM $C.default.w").head().getLong(0) == 3)
  }

  test("CALL cherrypick_snapshot publishes a staged append after main diverged") {
    init
    import spark.implicits._
    sql(s"CREATE TABLE $C.default.cp (id BIGINT)")
    sql(s"INSERT INTO $C.default.cp VALUES (1)")
    val t = cat.loadTable("cp")
    // stage on an audit branch, then let main move on — fast-forward now
    // impossible (histories diverged), cherry-pick is the publish path
    t.appendToBranch("audit", Seq(10L, 11L).toDF("id"))
    val staged = t.refresh().snapshotForRef("audit").get.snapshotId
    sql(s"INSERT INTO $C.default.cp VALUES (2)")
    val ff = intercept[Exception](
      t.refresh().fastForward("main", "audit"))
    assert(ff.getMessage.contains("diverged"))
    sql(s"CALL $C.system.cherrypick_snapshot(`table` => 'cp', snapshot_id => $staged)")
    assert(sql(s"SELECT id FROM $C.default.cp ORDER BY id").collect().map(_.getLong(0)).toSeq
      == Seq(1L, 2L, 10L, 11L))
    // provenance recorded; picking again is a no-op
    val cur = cat.loadTable("cp").currentSnapshot.get
    assert(cur.summary.get("source-snapshot-id").contains(staged.toString))
    sql(s"CALL $C.system.cherrypick_snapshot(`table` => 'cp', snapshot_id => $staged)")
    assert(sql(s"SELECT count(*) FROM $C.default.cp").head().getLong(0) == 4)
    assert(cat.loadTable("cp").currentSnapshot.get.snapshotId == cur.snapshotId)
    // non-append snapshots are rejected: take the delete commit off
    // main's ancestry (rollback), then try to pick it
    val preDelete = cat.loadTable("cp").currentSnapshot.get.snapshotId
    sql(s"DELETE FROM $C.default.cp WHERE id = 11")
    val del = cat.loadTable("cp").currentSnapshot.get.snapshotId
    sql(s"CALL $C.system.rollback(`table` => 'cp', snapshot_id => $preDelete)")
    val err = intercept[Exception](
      cat.loadTable("cp").cherrypickSnapshot(del))
    assert(err.getMessage.contains("not an append"))
  }

  test("CALL maintain runs the whole chain; defaults apply") {
    init
    sql(s"CREATE TABLE $C.default.m (id BIGINT)")
    (1 to 3).foreach(i => sql(s"INSERT INTO $C.default.m VALUES ($i)"))
    val msg = sql(s"CALL $C.system.maintain(`table` => 'm')").head().getString(0)
    assert(msg.startsWith("maintained"))
    assert(sql(s"SELECT count(*) FROM $C.default.m").head().getLong(0) == 3)
  }

  test("CALL add_files registers a directory of foreign parquet") {
    init
    import spark.implicits._
    sql(s"CREATE TABLE $C.default.af (id BIGINT, k STRING)")
    val ext = java.nio.file.Files.createTempDirectory("graft-proc-addf").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "k")
      .coalesce(1).write.mode("overwrite").parquet(ext)
    val msg = sql(s"CALL $C.system.add_files(`table` => 'af', source_dir => '$ext')")
      .head().getString(0)
    assert(msg == "added 1 files")
    assert(sql(s"SELECT id FROM $C.default.af ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("unknown procedure raises") {
    init
    intercept[Exception](sql(s"CALL $C.system.nope()"))
  }
}
