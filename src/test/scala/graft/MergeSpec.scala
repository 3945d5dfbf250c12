package graft

import graft.catalog.MemoryCatalog
import graft.table.{WhenMatched, WhenNotMatched, WhenNotMatchedBySource}
import graft.types._
import org.scalatest.funsuite.AnyFunSuite

/** MERGE (upsert) — `Table.merge`: CDC folds and insert-if-absent in one
  * commit, copy-on-write and merge-on-read modes. */
class MergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = Schema(0, Seq(
    NestedField(1, "id", ILong, required = false),
    NestedField(2, "k", IString, required = false),
    NestedField(3, "v", ILong, required = false)))

  private def freshTable(name: String, props: Map[String, String] = Map.empty) = {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val tbl = cat.createTable(name, schema, properties = props)
    tbl.append((1L to 6L).map(i => (i, if (i % 2 == 0) "even" else "odd", i * 10))
      .toDF("id", "k", "v"))
    tbl
  }

  private def contents(tbl: graft.table.Table): Map[Long, (String, Long)] =
    tbl.toDF(spark).collect().filterNot(_.isNullAt(0))
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

  test("COW upsert: matched rows updated, unmatched inserted") {
    import spark.implicits._
    val tbl = freshTable("m_upsert")
    val src = Seq((5L, "five", 555L), (6L, "six", 666L), (9L, "nine", 999L))
      .toDF("id", "k", "v")

    tbl.merge(spark, src, Seq("id"))

    assert(contents(tbl) == Map(
      1L -> ("odd", 10L), 2L -> ("even", 20L), 3L -> ("odd", 30L),
      4L -> ("even", 40L), 5L -> ("five", 555L), 6L -> ("six", 666L),
      9L -> ("nine", 999L)))
    val snap = tbl.currentSnapshot.get
    assert(snap.summary("operation") == "overwrite")
  }

  test("COW UpdateSet with source references; not-matched ignored") {
    import spark.implicits._
    val tbl = freshTable("m_set")
    val src = Seq((2L, "x", 5L), (99L, "x", 5L)).toDF("id", "k", "v")

    tbl.merge(spark, src, Seq("id"),
      whenMatched = WhenMatched.UpdateSet(Map("v" -> "v + __src_v")),
      whenNotMatched = WhenNotMatched.Ignore)

    assert(contents(tbl) == Map(
      1L -> ("odd", 10L), 2L -> ("even", 25L), 3L -> ("odd", 30L),
      4L -> ("even", 40L), 5L -> ("odd", 50L), 6L -> ("even", 60L)))
  }

  test("COW matched-delete; inserts still applied") {
    import spark.implicits._
    val tbl = freshTable("m_del")
    val src = Seq((1L, "", 0L), (3L, "", 0L), (7L, "seven", 70L)).toDF("id", "k", "v")

    tbl.merge(spark, src, Seq("id"), whenMatched = WhenMatched.Delete)

    assert(contents(tbl).keySet == Set(2L, 4L, 5L, 6L, 7L))
    assert(contents(tbl)(7L) == ("seven", 70L))
  }

  test("pure insert when no target file intersects the source key range") {
    import spark.implicits._
    val tbl = freshTable("m_insert")
    val before = tbl.scan().planFiles().map(_.filePath).toSet
    val src = Seq((100L, "new", 1L), (101L, "new", 2L)).toDF("id", "k", "v")

    tbl.merge(spark, src, Seq("id"))

    assert(tbl.toDF(spark).count() == 8)
    // key bounds [100,101] are disjoint from [1,6]: append path, no rewrite
    assert(before.subsetOf(tbl.scan().planFiles().map(_.filePath).toSet))
    assert(tbl.currentSnapshot.get.summary("operation") == "append")
  }

  test("duplicate source keys rejected; null keys never match") {
    import spark.implicits._
    val tbl = freshTable("m_dupnull")
    assertThrows[InvalidDataError](
      tbl.merge(spark, Seq((1L, "a", 1L), (1L, "b", 2L)).toDF("id", "k", "v"), Seq("id")))
    // null-keyed source row inserts (never matches)
    val src = Seq((Some(2L), "upd", 222L), (None, "nullkey", 0L))
      .toDF("id", "k", "v")
    tbl.merge(spark, src, Seq("id"))
    val rows = tbl.toDF(spark).collect()
    assert(rows.length == 7)
    assert(rows.count(_.isNullAt(0)) == 1)
    assert(contents(tbl).get(2L).contains(("upd", 222L)))
  }

  test("composite keys; empty source is a no-op") {
    import spark.implicits._
    val tbl = freshTable("m_comp")
    val snaps = tbl.snapshots.size
    tbl.merge(spark, Seq.empty[(Long, String, Long)].toDF("id", "k", "v"), Seq("id", "k"))
    assert(tbl.snapshots.size == snaps)
    tbl.merge(spark, Seq((2L, "even", 0L), (2L, "odd", -1L)).toDF("id", "k", "v"),
      Seq("id", "k"))
    // (2,even) matched-updated; (2,odd) had no match → inserted
    val row2 = tbl.toDF(spark).where("id = 2").collect()
      .map(r => (r.getString(1), r.getLong(2))).toSet
    assert(row2 == Set(("even", 0L), ("odd", -1L)))
  }

  test("MOR merge: deletes+inserts in one commit, no data file rewritten") {
    import spark.implicits._
    val tbl = freshTable("m_mor", Map("write.merge.mode" -> "merge-on-read"))
    val before = tbl.scan().planFiles().map(_.filePath).toSet
    val src = Seq((5L, "five", 555L), (9L, "nine", 999L)).toDF("id", "k", "v")

    tbl.merge(spark, src, Seq("id"))

    assert(contents(tbl)(5L) == ("five", 555L))
    assert(contents(tbl)(9L) == ("nine", 999L))
    assert(tbl.toDF(spark).count() == 7)
    // original files all still present; only delete files + new data added
    assert(before.subsetOf(tbl.scan().planFiles().map(_.filePath).toSet))
    val snap = tbl.currentSnapshot.get
    assert(snap.summary("added-position-deletes") == "1")
    // fold the delete debt; same answer after
    tbl.applyPendingDeletes(spark)
    assert(contents(tbl)(5L) == ("five", 555L) && tbl.toDF(spark).count() == 7)
  }

  test("MOR matched-delete only (no images, no inserts)") {
    import spark.implicits._
    val tbl = freshTable("m_mordel", Map("write.merge.mode" -> "merge-on-read"))
    val src = Seq((2L, "", 0L), (4L, "", 0L)).toDF("id", "k", "v")
    tbl.merge(spark, src, Seq("id"),
      whenMatched = WhenMatched.Delete, whenNotMatched = WhenNotMatched.Ignore)
    assert(contents(tbl).keySet == Set(1L, 3L, 5L, 6L))
    assert(tbl.currentSnapshot.get.summary("added-position-deletes") == "2")
  }

  test("merge validation: unknown keys, key assignment, bad mode") {
    import spark.implicits._
    val tbl = freshTable("m_bad")
    val src = Seq((1L, "a", 1L)).toDF("id", "k", "v")
    assertThrows[InvalidDataError](tbl.merge(spark, src, Seq("zzz")))
    assertThrows[InvalidDataError](
      tbl.merge(spark, src.withColumnRenamed("id", "sid"), Seq("id")))
    assertThrows[InvalidDataError](tbl.merge(spark, src, Seq("id"),
      whenMatched = WhenMatched.UpdateSet(Map("id" -> "1"))))
    assertThrows[InvalidDataError](tbl.merge(spark, src, Seq("id"),
      whenMatched = WhenMatched.UpdateSet(Map("zzz" -> "1"))))
    val bad = freshTable("m_badmode", Map("write.merge.mode" -> "sideways"))
    assertThrows[InvalidDataError](bad.merge(spark, src, Seq("id")))
  }

  test("NOT MATCHED BY SOURCE DELETE: full-sync mirror, both modes") {
    import spark.implicits._
    for (props <- Seq(Map.empty[String, String],
                      Map("write.merge.mode" -> "merge-on-read"))) {
      val tbl = freshTable(s"m_sync_${props.size}", props)
      // source keeps 2 and 4 (4 mutated), adds 9; everything else must go
      val src = Seq((2L, "even", 20L), (4L, "four", 444L), (9L, "nine", 999L))
        .toDF("id", "k", "v")
      tbl.merge(spark, src, Seq("id"),
        bySource = WhenNotMatchedBySource.Delete)
      assert(contents(tbl) == Map(
        2L -> ("even", 20L), 4L -> ("four", 444L), 9L -> ("nine", 999L)),
        s"mode=$props")
    }
  }

  test("NOT MATCHED BY SOURCE UPDATE SET marks stale rows, both modes") {
    import spark.implicits._
    for (props <- Seq(Map.empty[String, String],
                      Map("write.merge.mode" -> "merge-on-read"))) {
      val tbl = freshTable(s"m_stale_${props.size}", props)
      val src = Seq((1L, "one", 111L)).toDF("id", "k", "v")
      tbl.merge(spark, src, Seq("id"),
        whenNotMatched = WhenNotMatched.Ignore,
        bySource = WhenNotMatchedBySource.UpdateSet(Map("k" -> "'stale'")))
      assert(contents(tbl) == Map(
        1L -> ("one", 111L), 2L -> ("stale", 20L), 3L -> ("stale", 30L),
        4L -> ("stale", 40L), 5L -> ("stale", 50L), 6L -> ("stale", 60L)),
        s"mode=$props")
    }
  }

  test("NOT MATCHED BY SOURCE with an EMPTY source applies table-wide") {
    import spark.implicits._
    val tbl = freshTable("m_empty_sync")
    val src = Seq.empty[(Long, String, Long)].toDF("id", "k", "v")
    tbl.merge(spark, src, Seq("id"), bySource = WhenNotMatchedBySource.Delete)
    assert(contents(tbl).isEmpty)
  }
}
