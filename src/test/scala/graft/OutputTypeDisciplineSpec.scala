package graft

import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Structural guard for the driver's oracle gate: NO `SparkEntry.queries`
  * entry may emit a session-tz TIMESTAMP (LTZ) column. The DuckDB oracle
  * produces naive timestamps, and the driver's hasher distinguishes
  * tz-aware from naive even when every value is identical — which is how
  * r10 (events.ts generations) and r12 (`date_trunc`'s silent NTZ→LTZ
  * widening in j09/s60) each turned a value-correct entry into a red hash
  * row. Every timestamp that escapes an entry must be TIMESTAMP_NTZ.
  *
  * This walks EVERY entry at sf0.001 — including the streaming drains and
  * catalog round-trips, whose output schema only exists after the closure
  * runs — so a new entry that leaks an LTZ column fails `sbt test`, not
  * the round gate. */
class OutputTypeDisciplineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def ltzPaths(dt: DataType, path: String): Seq[String] = dt match {
    case TimestampType        => Seq(path)
    case s: StructType        => s.fields.toSeq.flatMap(f => ltzPaths(f.dataType, s"$path.${f.name}"))
    case a: ArrayType         => ltzPaths(a.elementType, s"$path[]")
    case m: MapType           => ltzPaths(m.keyType, s"$path<key>") ++ ltzPaths(m.valueType, s"$path<val>")
    case _                    => Nil
  }

  test("no SparkEntry.queries output column is a session-tz TIMESTAMP (all NTZ)") {
    val leaks = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val schema =
        try fn(spark, sfDir).schema
        catch { case e: Throwable => fail(s"$name: entry failed to build: $e") }
      ltzPaths(schema, "").map(p => s"$name:${p.stripPrefix(".")}")
    }
    assert(leaks.isEmpty,
      s"LTZ timestamp columns escape these entries (cast to timestamp_ntz): ${leaks.mkString(", ")}")
  }
}
