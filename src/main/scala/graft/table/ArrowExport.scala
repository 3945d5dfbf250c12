package graft.table

import graft.types._
import org.apache.arrow.memory.BufferAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit}
import org.apache.spark.sql.{DataFrame, Row}

import scala.jdk.CollectionConverters._

/**
 * Arrow record-batch export of a scan result (§2.2 parity with the
 * reference's `scan.to_arrow` / `arrow_c_stream`, `ext/iceberg/src/
 * scan.rs:65-79`, `lib/iceberg/table_scan.rb:26-30`): the table's Iceberg
 * schema maps to an Arrow schema (field ids preserved as metadata), rows
 * land in columnar `VectorSchemaRoot` batches of bounded size. Primitive
 * types only (the reference's own Arrow surface is primitive-typed through
 * its FFI); nested types raise [[graft.UnsupportedFeatureError]].
 *
 * Scale note: this is a DRIVER-side materialization, same as the
 * reference's `to_arrow` (their scan collects into an Arrow table). For
 * distributed output, write Parquet; Arrow export is the in-process
 * interchange path (e.g. handing a result to a C/Python consumer).
 */
object ArrowExport {

  def arrowField(f: NestedField): Field = {
    val t: ArrowType = f.fieldType match {
      case IBoolean => ArrowType.Bool.INSTANCE
      case IInt => new ArrowType.Int(32, true)
      case ILong => new ArrowType.Int(64, true)
      case IFloat => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case IDouble => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case IDecimal(p, s) => new ArrowType.Decimal(p, s, 128)
      case IDate => new ArrowType.Date(DateUnit.DAY)
      case ITime => new ArrowType.Time(TimeUnit.MICROSECOND, 64)
      case ITimestamp | ITimestampNano => new ArrowType.Timestamp(TimeUnit.MICROSECOND, null)
      case ITimestampTz | ITimestampTzNano => new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC")
      case IString => ArrowType.Utf8.INSTANCE
      case IUuid => ArrowType.Utf8.INSTANCE
      case IBinary | IFixed(_) => ArrowType.Binary.INSTANCE
      case other => throw new graft.UnsupportedFeatureError(
        s"Arrow export does not support nested type ${other.typeString} (column ${f.name})")
    }
    new Field(f.name,
      new FieldType(!f.required, t, null,
        Map("PARQUET:field_id" -> f.id.toString).asJava),
      java.util.List.of())
  }

  def arrowSchema(schema: Schema): ArrowSchema =
    new ArrowSchema(schema.fields.map(arrowField).asJava)

  /** Materialize a DataFrame (already projected to `schema`) as Arrow
    * batches of at most `maxRowsPerBatch` rows. Caller closes the roots.
    *
    * WARNING — DRIVER-SIDE ONLY: this collects the full result into driver memory
    * first (API parity with the reference's `to_arrow`, which also fully
    * materializes — `scan.rs:57-63`). It is for handing modest results to
    * Arrow consumers, NOT an export path for big tables — large exports
    * should `df.write.parquet` from the executors instead. */
  def toBatches(df: DataFrame, schema: Schema, allocator: BufferAllocator,
                maxRowsPerBatch: Int = 4096): Seq[VectorSchemaRoot] = {
    val rows = df.collect()
    rows.grouped(math.max(1, maxRowsPerBatch)).map { batch =>
      val root = VectorSchemaRoot.create(arrowSchema(schema), allocator)
      root.allocateNew()
      schema.fields.zipWithIndex.foreach { case (f, col) =>
        val vec = root.getVector(f.name)
        batch.zipWithIndex.foreach { case (row, i) => setValue(vec, f.fieldType, i, row, col) }
      }
      root.setRowCount(batch.length)
      root
    }.toSeq
  }

  private def setValue(vec: FieldVector, t: IType, i: Int, row: Row, col: Int): Unit = {
    if (row.isNullAt(col)) { setNull(vec, i); return }
    (vec, t) match {
      case (v: BitVector, _) => v.setSafe(i, if (row.getBoolean(col)) 1 else 0)
      case (v: IntVector, _) => v.setSafe(i, row.getInt(col))
      case (v: BigIntVector, ITime) => v.setSafe(i, row.getLong(col))
      case (v: BigIntVector, _) => v.setSafe(i, row.getLong(col))
      case (v: Float4Vector, _) => v.setSafe(i, row.getFloat(col))
      case (v: Float8Vector, _) => v.setSafe(i, row.getDouble(col))
      case (v: DecimalVector, _) => v.setSafe(i, row.getDecimal(col))
      case (v: DateDayVector, _) => row.get(col) match {
        case d: java.time.LocalDate => v.setSafe(i, d.toEpochDay.toInt)
        case d: java.sql.Date => v.setSafe(i, d.toLocalDate.toEpochDay.toInt)
        case n: Number => v.setSafe(i, n.intValue())
      }
      case (v: TimeMicroVector, _) => v.setSafe(i, row.getLong(col))
      case (v: TimeStampMicroVector, _) => row.get(col) match {
        case ts: java.time.LocalDateTime =>
          v.setSafe(i, ts.toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L +
            ts.getNano / 1000 % 1000)
        case ts: java.sql.Timestamp =>
          v.setSafe(i, ts.getTime * 1000L + ts.getNanos / 1000 % 1000)
        case n: Number => v.setSafe(i, n.longValue())
      }
      case (v: TimeStampMicroTZVector, _) => row.get(col) match {
        case inst: java.time.Instant =>
          v.setSafe(i, inst.getEpochSecond * 1000000L + inst.getNano / 1000)
        case ts: java.sql.Timestamp =>
          v.setSafe(i, ts.getTime * 1000L + ts.getNanos / 1000 % 1000)
        case n: Number => v.setSafe(i, n.longValue())
      }
      case (v: VarCharVector, _) =>
        v.setSafe(i, row.get(col).toString.getBytes("UTF-8"))
      case (v: VarBinaryVector, _) => v.setSafe(i, row.getAs[Array[Byte]](col))
      case (v, other) => throw new graft.UnsupportedFeatureError(
        s"Arrow export: unsupported vector ${v.getClass.getSimpleName} for $other")
    }
  }

  private def setNull(vec: FieldVector, i: Int): Unit = vec match {
    case v: BaseFixedWidthVector => v.setNull(i)
    case v: BaseVariableWidthVector => v.setNull(i)
    case v => throw new graft.UnsupportedFeatureError(
      s"Arrow export: unsupported vector ${v.getClass.getSimpleName}")
  }
}
