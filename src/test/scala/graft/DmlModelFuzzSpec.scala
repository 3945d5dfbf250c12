package graft

import graft.catalog.MemoryCatalog
import graft.table.Table
import graft.types._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Model-based DML fuzz: random interleavings of append / upsert /
 * deleteWhere / updateWhere / compact / rewriteManifests /
 * expireSnapshots against an in-memory reference model, in BOTH
 * copy-on-write and merge-on-read write modes (MOR also on a
 * format-v3 table, where deletes land as Puffin deletion vectors).
 * After EVERY op the table's visible rows must equal the model exactly.
 * This exercises the combinations unit specs don't enumerate: equality
 * deletes scoped below later re-inserts of the same key, MOR folds
 * under compaction, maintenance ops interleaved mid-history, and no-op
 * predicates on rows another op already removed.
 */
class DmlModelFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = Schema(0, Seq(
    NestedField(1, "id", ILong, required = false),
    NestedField(2, "grp", ILong, required = false),
    NestedField(3, "v", ILong, required = false)))

  private def check(tbl: Table, model: Map[Long, (Long, Long)], ctx: String): Unit = {
    import spark.implicits._
    val got = tbl.toDF(spark).select("id", "grp", "v")
      .as[(Long, Long, Long)].collect().toSet
    val want = model.map { case (id, (g, v)) => (id, g, v) }.toSet
    assert(got == want,
      s"$ctx: table ${got.size} rows != model ${want.size} rows; " +
        s"extra=${(got -- want).take(5)} missing=${(want -- got).take(5)}")
  }

  private def runSequence(mode: String, formatVersion: String, seed: Long,
                          nOps: Int, partitioned: Boolean = false): Unit = {
    import spark.implicits._
    val cat = new MemoryCatalog()
    val spec =
      if (partitioned)
        graft.meta.PartitionSpec(0,
          Seq(graft.meta.PartitionField(2, 1000, "grp", "identity")))
      else graft.meta.PartitionSpec.Unpartitioned
    var tbl = cat.createTable(s"fuzz_${mode.take(3)}_p${partitioned}_$seed",
      schema, partitionSpec = spec,
      properties = Map(
        "write.delete.mode" -> mode,
        "write.update.mode" -> mode,
        "write.merge.mode" -> mode,
        "format-version" -> formatVersion))
    var model = Map.empty[Long, (Long, Long)]
    var nextId = 0L
    val rnd = new scala.util.Random(seed)
    def freshRows(n: Int): Seq[(Long, Long, Long)] =
      (0 until n).map { _ =>
        val id = nextId
        nextId += 1
        (id, rnd.nextInt(4).toLong, rnd.nextInt(100).toLong)
      }
    for (op <- 0 until nOps) {
      val dice = if (op == 0) 0 else rnd.nextInt(10)
      dice match {
        case 0 | 1 | 2 => // append a batch of fresh ids
          val rows = freshRows(1 + rnd.nextInt(8))
          tbl.append(rows.toDF("id", "grp", "v"))
          model ++= rows.map(r => r._1 -> (r._2, r._3))
        case 3 | 4 => // upsert: replace some existing keys + insert fresh ones
          val pool = model.keys.toSeq.sorted
          val existing =
            if (pool.isEmpty) Seq.empty[Long]
            else (0 until rnd.nextInt(4)).map(_ => pool(rnd.nextInt(pool.size))).distinct
          val rows = existing.map(id =>
            (id, rnd.nextInt(4).toLong, 1000L + rnd.nextInt(100))) ++
            freshRows(rnd.nextInt(3))
          if (rows.nonEmpty) {
            tbl.upsert(spark, rows.toDF("id", "grp", "v"), Seq("id"))
            model ++= rows.map(r => r._1 -> (r._2, r._3))
          }
        case 5 => // delete a whole group (often a no-op re-delete)
          val g = rnd.nextInt(4)
          tbl.deleteWhere(spark, s"grp = $g")
          model = model.filter { case (_, (gg, _)) => gg != g }
        case 6 => // delete an id range
          val lo = if (nextId == 0) 0L else rnd.between(0L, nextId)
          val hi = lo + 1 + rnd.nextInt(10)
          tbl.deleteWhere(spark, s"id >= $lo AND id < $hi")
          model = model.filter { case (id, _) => id < lo || id >= hi }
        case 7 => // update a group's values
          val g = rnd.nextInt(4)
          tbl.updateWhere(spark, s"grp = $g", Map("v" -> "v + 1"))
          model = model.map { case (id, (gg, v)) =>
            id -> (gg, if (gg == g) v + 1 else v)
          }
        case 8 => // maintenance must never change visible rows
          if (rnd.nextBoolean()) tbl.refresh().compact(spark)
          else tbl.refresh().rewriteManifests()
        case 9 => // expire history mid-sequence; current content unchanged
          tbl.refresh().expireSnapshots(System.currentTimeMillis() + 1000,
            retainLast = 1)
      }
      tbl = tbl.refresh()
      check(tbl, model, s"mode=$mode v$formatVersion seed=$seed op=$op dice=$dice")
    }
  }

  for {
    (mode, fv) <- Seq(("copy-on-write", "2"), ("merge-on-read", "2"),
      ("merge-on-read", "3"))
    seed <- Seq(11L, 42L)
  } test(s"random DML sequence matches the model ($mode, v$fv, seed $seed)") {
    runSequence(mode, fv, seed, 20)
  }

  // identity-partitioned on grp: the same sequences drive partition-tuple
  // fanout on write and partition pruning inside every group-predicate
  // delete/update — file layouts and prune paths the unpartitioned runs
  // never touch
  for ((mode, fv) <- Seq(("copy-on-write", "2"), ("merge-on-read", "3")))
    test(s"random DML sequence matches the model ($mode, v$fv, partitioned)") {
      runSequence(mode, fv, seed = 42L, nOps = 20, partitioned = true)
    }
}
