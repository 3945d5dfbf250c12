package graft

import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, MapType, StructType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Structural guard for the driver's oracle gate: NO `SparkEntry.queries`
  * entry may emit a session-tz TIMESTAMP (LTZ) column or a DECIMAL column.
  *
  * LTZ: the DuckDB oracle produces naive timestamps, and the driver's
  * hasher distinguishes tz-aware from naive even when every value is
  * identical — which is how r10 (events.ts generations) and r12
  * (`date_trunc`'s silent NTZ→LTZ widening in j09/s60) each turned a
  * value-correct entry into a red hash row. Every timestamp that escapes
  * an entry must be TIMESTAMP_NTZ.
  *
  * DECIMAL: the r13 verdict established that the only three hash-red rows
  * in the 210-query suite (j09/s60/s66) were exactly the only three whose
  * output contained DECIMAL columns — the driver hashes a decimal128
  * parquet fetch and the oracle's float-converted fetch differently even
  * when value-equal, a channel the value-comparing local mimic cannot
  * see. Decimal arithmetic may be used INTERNALLY (bitwise-replayable
  * partial sums); the final projection must cast to DOUBLE/BIGINT.
  *
  * This walks EVERY entry at sf0.001 — including the streaming drains and
  * catalog round-trips, whose output schema only exists after the closure
  * runs — so a new entry that leaks a banned type fails `sbt test`, not
  * the round gate. */
class OutputTypeDisciplineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def bannedPaths(dt: DataType, path: String): Seq[String] = dt match {
    case TimestampType        => Seq(s"$path(ltz)")
    case _: DecimalType       => Seq(s"$path(decimal)")
    case s: StructType        => s.fields.toSeq.flatMap(f => bannedPaths(f.dataType, s"$path.${f.name}"))
    case a: ArrayType         => bannedPaths(a.elementType, s"$path[]")
    case m: MapType           => bannedPaths(m.keyType, s"$path<key>") ++ bannedPaths(m.valueType, s"$path<val>")
    case _                    => Nil
  }

  test("every queries entry has an oracle and every oracle has an entry") {
    // round 14 reached zero rows-only entries (even the approx ones grade
    // through threshold flags); this pins that property so a new entry
    // cannot silently regress to the driver's weaker rows-only check, and
    // an orphaned oracle (renamed entry, stale key) fails loudly here
    // instead of as a missing row in the round gate.
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"entries without an oracle: ${(q -- o).toSeq.sorted.mkString(", ")}")
    assert((o -- q).isEmpty, s"oracles without an entry: ${(o -- q).toSeq.sorted.mkString(", ")}")
  }

  test("no SparkEntry.queries output column is a session-tz TIMESTAMP or a DECIMAL") {
    val leaks = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val schema =
        try fn(spark, sfDir).schema
        catch { case e: Throwable => fail(s"$name: entry failed to build: $e") }
      bannedPaths(schema, "").map(p => s"$name:${p.stripPrefix(".")}")
    }
    assert(leaks.isEmpty,
      s"Banned output column types escape these entries (LTZ → cast timestamp_ntz; " +
        s"DECIMAL → cast double/bigint): ${leaks.mkString(", ")}")
  }
}
