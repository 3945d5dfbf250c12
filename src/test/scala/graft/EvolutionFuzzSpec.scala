package graft

import graft.catalog.MemoryCatalog
import graft.types._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/**
 * Model-based SCHEMA-EVOLUTION fuzz: random interleavings of appends,
 * add/rename/drop column, int→long widening, and row deletes, checked
 * against an in-memory model after every op. This exercises the
 * field-id evolution-on-read contract in sequences unit specs don't
 * enumerate: files written under an old schema must project correctly
 * under every later rename/drop/widen (values follow FIELD IDS, renamed
 * columns keep their data, re-added names never resurrect dropped
 * values, pre-evolution rows read null for later columns).
 */
class EvolutionFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def runSequence(seed: Long, nOps: Int): Unit = {
    val cat = new MemoryCatalog()
    val rnd = new scala.util.Random(seed)
    var nextFieldName = 0
    var cols = Vector(("id", "long"))
    var tbl = cat.createTable(s"evo_$seed",
      Schema(0, Seq(NestedField(1, "id", ILong, required = false))))
    var model = Map.empty[Long, Map[String, Any]] // id -> non-id values
    var nextId = 0L
    def randVal(kind: String): Any = kind match {
      case "long"   => rnd.nextInt(1000).toLong
      case "int"    => rnd.nextInt(1000)
      case "string" => "s" + rnd.nextInt(100)
    }
    for (op <- 0 until nOps) {
      val dice = if (op == 0) 0 else rnd.nextInt(8)
      dice match {
        case 0 | 1 | 2 => // append a batch under the CURRENT schema
          val rows = (0 until 1 + rnd.nextInt(5)).map { _ =>
            val id = nextId
            nextId += 1
            val vals = cols.tail.map { case (c, k) => c -> randVal(k) }
            model += id -> vals.toMap
            Row.fromSeq(id +: vals.map(_._2))
          }
          val sparkSchema = StructType(cols.map { case (c, k) =>
            StructField(c, k match {
              case "long" => LongType
              case "int" => IntegerType
              case "string" => StringType
            })
          })
          tbl.append(spark.createDataFrame(rows.asJava, sparkSchema))
        case 3 => // add a nullable column; pre-existing rows read null
          val kind = Seq("long", "int", "string")(rnd.nextInt(3))
          val name = s"c$nextFieldName"
          nextFieldName += 1
          tbl.updateSchema().addColumn(name, kind match {
            case "long" => ILong
            case "int" => IInt
            case "string" => IString
          }).commit()
          cols = cols :+ ((name, kind))
        case 4 => // rename: data follows the field id, not the name
          if (cols.size > 1) {
            val i = 1 + rnd.nextInt(cols.size - 1)
            val (old, k) = cols(i)
            val nu = s"r$nextFieldName"
            nextFieldName += 1
            tbl.updateSchema().renameColumn(old, nu).commit()
            cols = cols.updated(i, (nu, k))
            model = model.view.mapValues(m =>
              m.map { case (c, v) => (if (c == old) nu else c) -> v }).toMap
          }
        case 5 => // drop a non-id column
          if (cols.size > 2) {
            val i = 1 + rnd.nextInt(cols.size - 1)
            val (old, _) = cols(i)
            tbl.updateSchema().deleteColumn(old).commit()
            cols = cols.patch(i, Nil, 1)
            model = model.view.mapValues(_ - old).toMap
          }
        case 6 => // widen the first int column to long (old files reproject)
          cols.zipWithIndex.find { case ((_, k), i) => i > 0 && k == "int" } match {
            case Some(((c, _), i)) =>
              tbl.updateSchema().updateColumnType(c, ILong).commit()
              cols = cols.updated(i, (c, "long"))
              model = model.view.mapValues(m => m.map { case (cc, v) =>
                cc -> (if (cc == c && v != null) v.asInstanceOf[Int].toLong else v)
              }).toMap
            case None => ()
          }
        case 7 => // delete an id range (files span many schema eras)
          val lo = if (nextId == 0) 0L else rnd.between(0L, nextId)
          val hi = lo + 1 + rnd.nextInt(8)
          tbl.deleteWhere(spark, s"id >= $lo AND id < $hi")
          model = model.filter { case (id, _) => id < lo || id >= hi }
      }
      tbl = tbl.refresh()
      val df = tbl.toDF(spark)
      assert(df.columns.toSeq == cols.map(_._1),
        s"seed=$seed op=$op: columns ${df.columns.toSeq} != ${cols.map(_._1)}")
      val got = df.collect().map(r => cols.indices.map(r.get).toList).toSet
      val want = model.map { case (id, m) =>
        (id: Any) :: cols.tail.map { case (c, _) => m.getOrElse(c, null) }.toList
      }.toSet
      assert(got == want, s"seed=$seed op=$op dice=$dice: " +
        s"extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
    }
  }

  for (seed <- Seq(7L, 21L, 63L))
    test(s"random evolution sequence matches the model (seed $seed)") {
      runSequence(seed, 18)
    }
}
