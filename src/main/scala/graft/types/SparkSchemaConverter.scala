package graft.types

import org.apache.spark.sql.types._

/**
 * Bidirectional converter between the Iceberg-style [[Schema]] and Spark's
 * [[StructType]]. Field ids ride in `StructField.metadata` under the key
 * `"field_id"` — the same convention Spark's own Parquet writer uses for
 * `parquet.field.id` — so ids survive a round trip through a DataFrame.
 *
 * Type mapping follows SURVEY.md §1.2: `time` → LongType (micros),
 * `timestamp_ns`/`timestamptz_ns` → Spark µs timestamps (documented
 * truncation), `uuid` → StringType, `fixed(L)` → BinaryType.
 */
object SparkSchemaConverter {
  val FieldIdKey = "field_id"
  val DocKey = "doc"

  def toSparkType(t: IType): DataType = t match {
    case IBoolean => BooleanType
    case IInt => IntegerType
    case ILong => LongType
    case IFloat => FloatType
    case IDouble => DoubleType
    case IDecimal(p, s) => DecimalType(p, s)
    case IDate => DateType
    case ITime => LongType // micros since midnight
    case ITimestamp => TimestampNTZType
    case ITimestampTz => TimestampType
    case ITimestampNano => TimestampNTZType // µs precision (truncation documented)
    case ITimestampTzNano => TimestampType
    case IString => StringType
    case IUuid => StringType // canonical text form
    case IFixed(_) => BinaryType
    case IBinary => BinaryType
    case IStruct(fields) => StructType(fields.map(toSparkField))
    case IList(_, e, req) => ArrayType(toSparkType(e), containsNull = !req)
    case IMap(_, k, _, v, req) => MapType(toSparkType(k), toSparkType(v), valueContainsNull = !req)
  }

  def toSparkField(f: NestedField): StructField = {
    val mb = new MetadataBuilder().putLong(FieldIdKey, f.id.toLong)
    f.doc.foreach(mb.putString(DocKey, _))
    StructField(f.name, toSparkType(f.fieldType), nullable = !f.required, metadata = mb.build())
  }

  def toSpark(schema: Schema): StructType = StructType(schema.fields.map(toSparkField))

  /** Spark → Iceberg; uses embedded field ids when present, otherwise
    * auto-assigns sequentially (the reference's Arrow-schema path,
    * `ext/iceberg/src/schema.rs:27-44`). */
  def fromSpark(struct: StructType, schemaId: Int = 0): Schema = {
    val allHaveIds = struct.fields.forall(_.metadata.contains(FieldIdKey))
    if (allHaveIds) {
      Schema(schemaId, struct.fields.toSeq.map(fromSparkField))
    } else {
      Schema.autoAssign(
        struct.fields.toSeq.map(f => (f.name, fromSparkType(f.dataType), !f.nullable)),
        schemaId)
    }
  }

  private def fromSparkField(f: StructField): NestedField = {
    val id = if (f.metadata.contains(FieldIdKey)) f.metadata.getLong(FieldIdKey).toInt else 0
    val doc = if (f.metadata.contains(DocKey)) Some(f.metadata.getString(DocKey)) else None
    NestedField(id, f.name, fromSparkType(f.dataType), required = !f.nullable, doc = doc)
  }

  def fromSparkType(dt: DataType): IType = dt match {
    case BooleanType => IBoolean
    case ByteType | ShortType | IntegerType => IInt
    case LongType => ILong
    case FloatType => IFloat
    case DoubleType => IDouble
    case d: DecimalType => IDecimal(d.precision, d.scale)
    case DateType => IDate
    case TimestampNTZType => ITimestamp
    case TimestampType => ITimestampTz
    case StringType => IString
    case BinaryType => IBinary
    case s: StructType => IStruct(s.fields.toSeq.map(fromSparkField))
    case a: ArrayType => IList(0, fromSparkType(a.elementType), !a.containsNull)
    case m: MapType => IMap(0, fromSparkType(m.keyType), 0, fromSparkType(m.valueType), !m.valueContainsNull)
    case other => throw new IllegalArgumentException(s"unsupported Spark type: $other")
  }
}
