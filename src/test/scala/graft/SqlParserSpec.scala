package graft

import graft.spark.{GraftAddPartitionFieldCommand, GraftCreateRefCommand,
  GraftDropPartitionFieldCommand, GraftDropRefCommand, GraftSqlParser,
  GraftWriteOrderedCommand}
import org.scalatest.funsuite.AnyFunSuite

/** The injected DDL parser must claim EXACTLY its statements — anything
  * else falls through to Spark's grammar (returning None here). */
class SqlParserSpec extends AnyFunSuite {
  private def parse(sql: String) = GraftSqlParser.parsePartitionDdl(sql)

  test("ADD PARTITION FIELD forms") {
    assert(parse("ALTER TABLE c.ns.t ADD PARTITION FIELD k") ==
      Some(GraftAddPartitionFieldCommand(Seq("c", "ns", "t"), "k", "identity", None)))
    assert(parse("alter table t add partition field bucket(16, id)") ==
      Some(GraftAddPartitionFieldCommand(Seq("t"), "id", "bucket[16]", None)))
    assert(parse("ALTER TABLE t ADD PARTITION FIELD truncate( 10 , s ) AS s_t") ==
      Some(GraftAddPartitionFieldCommand(Seq("t"), "s", "truncate[10]", Some("s_t"))))
    assert(parse("ALTER TABLE `odd name`.t ADD PARTITION FIELD day(ts)") ==
      Some(GraftAddPartitionFieldCommand(Seq("odd name", "t"), "ts", "day", None)))
  }

  test("DROP PARTITION FIELD: name or transform form") {
    assert(parse("ALTER TABLE t DROP PARTITION FIELD k") ==
      Some(GraftDropPartitionFieldCommand(Seq("t"), "k")))
    assert(parse("ALTER TABLE t DROP PARTITION FIELD bucket(4, id)") ==
      Some(GraftDropPartitionFieldCommand(Seq("t"), "id_bucket")))
    assert(parse("ALTER TABLE t DROP PARTITION FIELD hour(ts)") ==
      Some(GraftDropPartitionFieldCommand(Seq("t"), "ts_hour")))
  }

  test("WRITE ORDERED BY / UNORDERED") {
    assert(parse("ALTER TABLE t WRITE ORDERED BY a DESC NULLS LAST, b") ==
      Some(GraftWriteOrderedCommand(Seq("t"),
        Seq(("a", "desc", Some("nulls-last")), ("b", "asc", None)))))
    assert(parse("ALTER TABLE t WRITE UNORDERED") ==
      Some(GraftWriteOrderedCommand(Seq("t"), Nil)))
    // malformed item: NOT claimed — Spark raises its own parse error
    assert(parse("ALTER TABLE t WRITE ORDERED BY a + b").isEmpty)
  }

  test("CREATE/DROP BRANCH and TAG") {
    assert(parse("ALTER TABLE t CREATE BRANCH audit") ==
      Some(GraftCreateRefCommand(Seq("t"), "branch", "audit", None)))
    assert(parse("ALTER TABLE t CREATE TAG v1 AS OF VERSION 42") ==
      Some(GraftCreateRefCommand(Seq("t"), "tag", "v1", Some(42L))))
    assert(parse("ALTER TABLE t DROP TAG v1") ==
      Some(GraftDropRefCommand(Seq("t"), "tag", "v1")))
  }

  test("everything else falls through to Spark") {
    for (sql <- Seq(
      "SELECT 1",
      "ALTER TABLE t SET TBLPROPERTIES ('a'='b')",
      "ALTER TABLE t ADD COLUMN c INT",
      "ALTER TABLE t DROP PARTITION (k='a')", // Spark's own partition DDL
      "ALTER TABLE t RENAME TO u",
      "INSERT INTO t VALUES (1)"))
      assert(parse(sql).isEmpty, s"must not claim: $sql")
  }
}
