package graft.types

/**
 * Iceberg-style type system: 16 primitives + 3 nested types.
 *
 * Modeled on the reference surface (ankane/iceberg-ruby
 * `lib/iceberg/types.rb:14-136`, `ext/iceberg/src/schema.rs:104-255`),
 * re-expressed as a Scala ADT. Each type knows its canonical spec string
 * (the form used inside table-metadata JSON).
 */
sealed trait IType {
  /** Canonical Iceberg spec string, e.g. "int", "decimal(38, 8)". */
  def typeString: String
  def isPrimitive: Boolean = true
  override def toString: String = typeString
}

case object IBoolean extends IType { val typeString = "boolean" }
case object IInt extends IType { val typeString = "int" }
case object ILong extends IType { val typeString = "long" }
case object IFloat extends IType { val typeString = "float" }
case object IDouble extends IType { val typeString = "double" }
final case class IDecimal(precision: Int, scale: Int) extends IType {
  require(precision >= 1 && precision <= 38, s"decimal precision out of range: $precision")
  val typeString = s"decimal($precision, $scale)"
}
case object IDate extends IType { val typeString = "date" }
/** Time of day, microsecond precision. Spark has no direct time type;
  * values are carried as LongType micros (documented limitation, matching
  * the reference's own Todo at `ext/iceberg/src/utils.rs:145`). */
case object ITime extends IType { val typeString = "time" }
case object ITimestamp extends IType { val typeString = "timestamp" }
case object ITimestampTz extends IType { val typeString = "timestamptz" }
case object ITimestampNano extends IType { val typeString = "timestamp_ns" }
case object ITimestampTzNano extends IType { val typeString = "timestamptz_ns" }
case object IString extends IType { val typeString = "string" }
case object IUuid extends IType { val typeString = "uuid" }
final case class IFixed(length: Int) extends IType {
  val typeString = s"fixed[$length]"
}
case object IBinary extends IType { val typeString = "binary" }

final case class IStruct(fields: Seq[NestedField]) extends IType {
  override def isPrimitive = false
  def typeString = fields.map(f => s"${f.id}: ${f.name}: ${f.fieldType}").mkString("struct<", ", ", ">")
  def fieldByName(name: String): Option[NestedField] = fields.find(_.name == name)
  def fieldById(id: Int): Option[NestedField] = fields.find(_.id == id)
}

final case class IList(elementId: Int, element: IType, elementRequired: Boolean) extends IType {
  override def isPrimitive = false
  def typeString = s"list<$element>"
}

final case class IMap(keyId: Int, key: IType, valueId: Int, value: IType, valueRequired: Boolean)
    extends IType {
  override def isPrimitive = false
  def typeString = s"map<$key, $value>"
}

/** A named, id-tracked field (ref `ext/iceberg/src/schema.rs:100-181`). */
final case class NestedField(
    id: Int,
    name: String,
    fieldType: IType,
    required: Boolean = false,
    doc: Option[String] = None,
    initialDefault: Option[Any] = None,
    writeDefault: Option[Any] = None)

/** Versioned schema: ordered fields with unique ids
  * (ref `ext/iceberg/src/schema.rs:16-98`). */
final case class Schema(
    schemaId: Int,
    fields: Seq[NestedField],
    identifierFieldIds: Seq[Int] = Nil) {

  def asStruct: IStruct = IStruct(fields)

  def fieldByName(name: String): Option[NestedField] = fields.find(_.name == name)
  def fieldById(id: Int): Option[NestedField] = {
    def find(fs: Seq[NestedField]): Option[NestedField] =
      fs.collectFirst { case f if f.id == id => f }.orElse {
        fs.iterator.map(f => findInType(f.fieldType)).collectFirst { case Some(x) => x }
      }
    def findInType(t: IType): Option[NestedField] = t match {
      case IStruct(fs) => find(fs)
      case _ => None
    }
    find(fields)
  }

  def highestFieldId: Int = {
    def maxOfType(t: IType): Int = t match {
      case IStruct(fs) => if (fs.isEmpty) 0 else fs.map(maxOf).max
      case IList(eid, e, _) => math.max(eid, maxOfType(e))
      case IMap(kid, k, vid, v, _) => Seq(kid, vid, maxOfType(k), maxOfType(v)).max
      case _ => 0
    }
    def maxOf(f: NestedField): Int = math.max(f.id, maxOfType(f.fieldType))
    if (fields.isEmpty) 0 else fields.map(maxOf).max
  }

  def columnNames: Seq[String] = fields.map(_.name)
}

object Schema {
  /** Build a schema auto-assigning sequential field ids, as the reference
    * does for Arrow-derived schemas (`ext/iceberg/src/schema.rs:27-44`). */
  def autoAssign(fields: Seq[(String, IType, Boolean)], schemaId: Int = 0): Schema = {
    var next = 0
    def assignType(t: IType): IType = t match {
      case IStruct(fs) => IStruct(fs.map(assign))
      case IList(_, e, r) => { next += 1; val id = next; IList(id, assignType(e), r) }
      case IMap(_, k, _, v, r) =>
        next += 1; val kid = next
        next += 1; val vid = next
        IMap(kid, assignType(k), vid, assignType(v), r)
      case p => p
    }
    def assign(f: NestedField): NestedField = {
      next += 1
      val id = next
      f.copy(id = id, fieldType = assignType(f.fieldType))
    }
    Schema(schemaId, fields.map { case (n, t, req) =>
      assign(NestedField(0, n, t, required = req))
    })
  }

  /** Parse a type name string with Rails-style aliases, mirroring
    * `lib/iceberg/table_definition.rb:3-12`. */
  def parseTypeName(s: String): IType = s.trim.toLowerCase match {
    case "boolean" | "bool" => IBoolean
    case "int" | "integer" => IInt
    case "long" | "bigint" => ILong
    case "float" | "real" => IFloat
    case "double" => IDouble
    case "date" => IDate
    case "time" => ITime
    case "timestamp" | "datetime" => ITimestamp
    case "timestamptz" => ITimestampTz
    case "timestamp_ns" | "timestamp_nano" => ITimestampNano
    case "timestamptz_ns" | "timestamptz_nano" => ITimestampTzNano
    case "string" | "text" | "varchar" => IString
    case "uuid" => IUuid
    case "binary" | "blob" => IBinary
    case other =>
      val dec = """decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
      val fix = """fixed\s*[\[(]\s*(\d+)\s*[\])]""".r
      other match {
        case dec(p, sc) => IDecimal(p.toInt, sc.toInt)
        case fix(l) => IFixed(l.toInt)
        case _ => throw new IllegalArgumentException(s"unknown type: $s")
      }
  }
}
