package graft.meta

import graft.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * JSON (de)serialization of [[TableMetadata]] following the published
 * Iceberg table-spec metadata layout (format-version 1/2/3 fields), the
 * same shape the reference reads/writes via the iceberg Rust crate and
 * ships as its golden fixture `test/support/metadata.json`.
 */
object MetadataJson {

  // ---------------------------------------------------------------- types

  def typeToJson(t: IType): JValue = t match {
    case IStruct(fields) =>
      JObject(
        "type" -> JString("struct"),
        "fields" -> JArray(fields.toList.map(fieldToJson)))
    case IList(eid, e, req) =>
      JObject(
        "type" -> JString("list"),
        "element-id" -> JInt(eid),
        "element" -> typeToJson(e),
        "element-required" -> JBool(req))
    case IMap(kid, k, vid, v, req) =>
      JObject(
        "type" -> JString("map"),
        "key-id" -> JInt(kid),
        "key" -> typeToJson(k),
        "value-id" -> JInt(vid),
        "value" -> typeToJson(v),
        "value-required" -> JBool(req))
    case p => JString(p.typeString.replace(" ", "")) // "decimal(38,8)"
  }

  def typeFromJson(j: JValue): IType = j match {
    case JString(s) => parsePrimitive(s)
    case o: JObject =>
      (o \ "type") match {
        case JString("struct") =>
          IStruct((o \ "fields").asInstanceOf[JArray].arr.map(fieldFromJson))
        case JString("list") =>
          IList(
            intOf(o \ "element-id"),
            typeFromJson(o \ "element"),
            boolOf(o \ "element-required"))
        case JString("map") =>
          IMap(
            intOf(o \ "key-id"), typeFromJson(o \ "key"),
            intOf(o \ "value-id"), typeFromJson(o \ "value"),
            boolOf(o \ "value-required"))
        case other => throw new IllegalArgumentException(s"bad nested type: $other")
      }
    case other => throw new IllegalArgumentException(s"bad type json: $other")
  }

  private def parsePrimitive(s: String): IType = s match {
    case "boolean" => IBoolean
    case "int" => IInt
    case "long" => ILong
    case "float" => IFloat
    case "double" => IDouble
    case "date" => IDate
    case "time" => ITime
    case "timestamp" => ITimestamp
    case "timestamptz" => ITimestampTz
    case "timestamp_ns" => ITimestampNano
    case "timestamptz_ns" => ITimestampTzNano
    case "string" => IString
    case "uuid" => IUuid
    case "binary" => IBinary
    case other =>
      val dec = """decimal\((\d+),\s*(\d+)\)""".r
      val fix = """fixed\[(\d+)\]""".r
      other match {
        case dec(p, sc) => IDecimal(p.toInt, sc.toInt)
        case fix(l) => IFixed(l.toInt)
        case _ => throw new IllegalArgumentException(s"unknown primitive: $other")
      }
  }

  private def defaultToJson(t: IType, v: Any): JValue = v match {
    case null => JNull
    case b: Boolean => JBool(b)
    case i: Int => JInt(i)
    case l: Long => JInt(l)
    case f: Float => JDouble(f.toDouble)
    case d: Double => JDouble(d)
    case s: String => JString(s)
    case b: Array[Byte] => JString(b.map("%02X".format(_)).mkString)
    case other => throw new IllegalArgumentException(
      s"unsupported default value $other for $t") // parity: ref Todo utils.rs:127-165
  }

  private def defaultFromJson(t: IType, j: JValue): Option[Any] = j match {
    case JNothing | JNull => None
    case JBool(b) => Some(b)
    case JInt(i) => t match {
      case IInt => Some(i.toInt)
      case ILong => Some(i.toLong)
      case IFloat => Some(i.toFloat)
      case IDouble => Some(i.toDouble)
      case _ => Some(i.toLong)
    }
    case JDouble(d) => if (t == IFloat) Some(d.toFloat) else Some(d)
    case JDecimal(d) => Some(d)
    case JString(s) => t match {
      case IBinary | IFixed(_) =>
        Some(s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
      case _ => Some(s)
    }
    case other => throw new IllegalArgumentException(s"bad default: $other")
  }

  def fieldToJson(f: NestedField): JValue = {
    val base = List(
      "id" -> JInt(f.id),
      "name" -> JString(f.name),
      "required" -> JBool(f.required),
      "type" -> typeToJson(f.fieldType))
    val doc = f.doc.map(d => "doc" -> JString(d)).toList
    val init = f.initialDefault.map(v => "initial-default" -> defaultToJson(f.fieldType, v)).toList
    val write = f.writeDefault.map(v => "write-default" -> defaultToJson(f.fieldType, v)).toList
    JObject(base ++ doc ++ init ++ write)
  }

  def fieldFromJson(j: JValue): NestedField = {
    val t = typeFromJson(j \ "type")
    NestedField(
      id = intOf(j \ "id"),
      name = strOf(j \ "name"),
      fieldType = t,
      required = boolOf(j \ "required"),
      doc = (j \ "doc") match { case JString(s) => Some(s); case _ => None },
      initialDefault = defaultFromJson(t, j \ "initial-default"),
      writeDefault = defaultFromJson(t, j \ "write-default"))
  }

  def schemaToJson(s: Schema): JValue = {
    val base = List(
      "type" -> JString("struct"),
      "schema-id" -> JInt(s.schemaId),
      "fields" -> JArray(s.fields.toList.map(fieldToJson)))
    val idf =
      if (s.identifierFieldIds.nonEmpty)
        List("identifier-field-ids" -> JArray(s.identifierFieldIds.toList.map(JInt(_))))
      else Nil
    JObject(base ++ idf)
  }

  def schemaFromJson(j: JValue): Schema = Schema(
    schemaId = intOf(j \ "schema-id"),
    fields = (j \ "fields").asInstanceOf[JArray].arr.map(fieldFromJson),
    identifierFieldIds = (j \ "identifier-field-ids") match {
      case JArray(xs) => xs.map(intOf)
      case _ => Nil
    })

  // ------------------------------------------------------------ specs etc.

  def specToJson(s: PartitionSpec): JValue = JObject(
    "spec-id" -> JInt(s.specId),
    "fields" -> JArray(s.fields.toList.map(f => JObject(
      "source-id" -> JInt(f.sourceId),
      "field-id" -> JInt(f.fieldId),
      "name" -> JString(f.name),
      "transform" -> JString(f.transform)))))

  def specFromJson(j: JValue): PartitionSpec = PartitionSpec(
    specId = intOf(j \ "spec-id"),
    fields = (j \ "fields").asInstanceOf[JArray].arr.map(f => PartitionField(
      sourceId = intOf(f \ "source-id"),
      fieldId = intOf(f \ "field-id"),
      name = strOf(f \ "name"),
      transform = strOf(f \ "transform"))))

  def sortOrderToJson(s: SortOrder): JValue = JObject(
    "order-id" -> JInt(s.orderId),
    "fields" -> JArray(s.fields.toList.map(f => JObject(
      "source-id" -> JInt(f.sourceId),
      "transform" -> JString(f.transform),
      "direction" -> JString(f.direction),
      "null-order" -> JString(f.nullOrder)))))

  def sortOrderFromJson(j: JValue): SortOrder = SortOrder(
    orderId = intOf(j \ "order-id"),
    fields = (j \ "fields").asInstanceOf[JArray].arr.map(f => new SortField(
      sourceId = intOf(f \ "source-id"),
      transform = strOf(f \ "transform"),
      direction = strOf(f \ "direction"),
      nullOrder = strOf(f \ "null-order"))))

  def snapshotToJson(s: Snapshot): JValue = {
    val base = List(
      "snapshot-id" -> JInt(s.snapshotId),
      "sequence-number" -> JInt(s.sequenceNumber),
      "timestamp-ms" -> JInt(s.timestampMs),
      "manifest-list" -> JString(s.manifestList),
      "summary" -> JObject(s.summary.toList.map { case (k, v) => k -> JString(v) }))
    val parent = s.parentSnapshotId.map(p => "parent-snapshot-id" -> JInt(BigInt(p))).toList
    val sid = s.schemaId.map(i => "schema-id" -> JInt(i)).toList
    val fri = s.firstRowId.map(i => "first-row-id" -> JInt(BigInt(i))).toList
    JObject(base ++ parent ++ sid ++ fri)
  }

  def snapshotFromJson(j: JValue): Snapshot = Snapshot(
    snapshotId = longOf(j \ "snapshot-id"),
    parentSnapshotId = (j \ "parent-snapshot-id") match {
      case JInt(i) => Some(i.toLong); case _ => None
    },
    sequenceNumber = (j \ "sequence-number") match {
      case JInt(i) => i.toLong; case _ => 0L
    },
    timestampMs = longOf(j \ "timestamp-ms"),
    manifestList = strOf(j \ "manifest-list"),
    summary = (j \ "summary") match {
      case JObject(fs) => fs.collect { case (k, JString(v)) => k -> v }.toMap
      case _ => Map.empty
    },
    schemaId = (j \ "schema-id") match { case JInt(i) => Some(i.toInt); case _ => None },
    firstRowId = (j \ "first-row-id") match { case JInt(i) => Some(i.toLong); case _ => None })

  // -------------------------------------------------------------- metadata

  def toJson(m: TableMetadata): JValue = {
    // version-correct field sets: last-sequence-number is v2+; next-row-id
    // (row lineage) is v3; v1 additionally carries the legacy singular
    // "schema"/"partition-spec" fields required by v1 readers
    val head = List[JField](
      "format-version" -> JInt(m.formatVersion),
      "table-uuid" -> JString(m.tableUuid),
      "location" -> JString(m.location)) ++
      (if (m.formatVersion >= 2)
        List[JField]("last-sequence-number" -> JInt(BigInt(m.lastSequenceNumber)))
      else Nil)
    val v1Legacy: List[JField] =
      if (m.formatVersion == 1)
        List(
          "schema" -> schemaToJson(m.currentSchema),
          "partition-spec" -> JArray(m.defaultPartitionSpec.fields.toList.map(f => JObject(
            "source-id" -> JInt(f.sourceId),
            "field-id" -> JInt(f.fieldId),
            "name" -> JString(f.name),
            "transform" -> JString(f.transform)))))
      else Nil
    val tail = List[JField](
      "last-updated-ms" -> JInt(BigInt(m.lastUpdatedMs)),
      "last-column-id" -> JInt(m.lastColumnId),
      "current-schema-id" -> JInt(m.currentSchemaId),
      "schemas" -> JArray(m.schemas.toList.map(schemaToJson)),
      "default-spec-id" -> JInt(m.defaultSpecId),
      "partition-specs" -> JArray(m.partitionSpecs.toList.map(specToJson)),
      "last-partition-id" -> JInt(m.lastPartitionId),
      "default-sort-order-id" -> JInt(m.defaultSortOrderId),
      "sort-orders" -> JArray(m.sortOrders.toList.map(sortOrderToJson)),
      "properties" -> JObject(m.properties.toList.map { case (k, v) => k -> (JString(v): JValue) }),
      "current-snapshot-id" -> m.currentSnapshotId.map(i => JInt(BigInt(i)): JValue).getOrElse(JInt(-1)),
      "snapshots" -> JArray(m.snapshots.toList.map(snapshotToJson)),
      "snapshot-log" -> JArray(m.snapshotLog.toList.map(e => JObject(
        "timestamp-ms" -> JInt(BigInt(e.timestampMs)), "snapshot-id" -> JInt(BigInt(e.snapshotId))))),
      "metadata-log" -> JArray(m.metadataLog.toList.map(e => JObject(
        "timestamp-ms" -> JInt(BigInt(e.timestampMs)), "metadata-file" -> JString(e.metadataFile)))),
      "refs" -> JObject(m.refs.toList.map { case (k, r) => k -> (JObject(
        "snapshot-id" -> JInt(BigInt(r.snapshotId)), "type" -> JString(r.refType)): JValue) }),
      "statistics" -> JArray(m.statistics.toList.map(s => JObject(
        "snapshot-id" -> JInt(BigInt(s.snapshotId)),
        "statistics-path" -> JString(s.statisticsPath),
        "file-size-in-bytes" -> JInt(BigInt(s.fileSizeInBytes)),
        "file-footer-size-in-bytes" -> JInt(BigInt(s.fileFooterSizeInBytes)),
        "blob-metadata" -> JArray(s.blobMetadata.toList.map(blobMetaToJson))))),
      "partition-statistics" -> JArray(m.partitionStatistics.toList.map(s => JObject(
        "snapshot-id" -> JInt(BigInt(s.snapshotId)),
        "statistics-path" -> JString(s.statisticsPath),
        "file-size-in-bytes" -> JInt(BigInt(s.fileSizeInBytes)))))) ++
      (if (m.formatVersion >= 3)
        List[JField]("next-row-id" -> JInt(BigInt(m.nextRowId)))
      else Nil)
    JObject(head ++ v1Legacy ++ tail)
  }

  def fromJson(j: JValue): TableMetadata = {
    val schemasJ = (j \ "schemas") match {
      case JArray(xs) => xs.map(schemaFromJson)
      case _ =>
        // v1 metadata may carry a single "schema" field
        (j \ "schema") match {
          case o: JObject => List(schemaFromJson(o))
          case _ => Nil
        }
    }
    val specsJ = (j \ "partition-specs") match {
      case JArray(xs) => xs.map(specFromJson)
      case _ => List(PartitionSpec.Unpartitioned)
    }
    val ordersJ = (j \ "sort-orders") match {
      case JArray(xs) => xs.map(sortOrderFromJson)
      case _ => List(SortOrder.Unsorted)
    }
    TableMetadata(
      formatVersion = intOf(j \ "format-version"),
      tableUuid = strOf(j \ "table-uuid"),
      location = strOf(j \ "location"),
      lastSequenceNumber = (j \ "last-sequence-number") match {
        case JInt(i) => i.toLong; case _ => 0L
      },
      lastUpdatedMs = longOf(j \ "last-updated-ms"),
      lastColumnId = intOf(j \ "last-column-id"),
      currentSchemaId = (j \ "current-schema-id") match {
        case JInt(i) => i.toInt; case _ => 0
      },
      schemas = schemasJ,
      defaultSpecId = (j \ "default-spec-id") match { case JInt(i) => i.toInt; case _ => 0 },
      partitionSpecs = specsJ,
      lastPartitionId = (j \ "last-partition-id") match {
        case JInt(i) => i.toInt; case _ => PartitionSpec.FirstFieldId - 1
      },
      defaultSortOrderId = (j \ "default-sort-order-id") match { case JInt(i) => i.toInt; case _ => 0 },
      sortOrders = ordersJ,
      properties = (j \ "properties") match {
        case JObject(fs) => fs.collect { case (k, JString(v)) => k -> v }.toMap
        case _ => Map.empty
      },
      currentSnapshotId = (j \ "current-snapshot-id") match {
        case JInt(i) if i >= 0 => Some(i.toLong)
        case _ => None
      },
      snapshots = (j \ "snapshots") match {
        case JArray(xs) => xs.map(snapshotFromJson); case _ => Nil
      },
      snapshotLog = (j \ "snapshot-log") match {
        case JArray(xs) => xs.map(e => SnapshotLogEntry(longOf(e \ "timestamp-ms"), longOf(e \ "snapshot-id")))
        case _ => Nil
      },
      metadataLog = (j \ "metadata-log") match {
        case JArray(xs) => xs.map(e => MetadataLogEntry(longOf(e \ "timestamp-ms"), strOf(e \ "metadata-file")))
        case _ => Nil
      },
      refs = (j \ "refs") match {
        case JObject(fs) => fs.map { case (k, v) =>
          k -> SnapshotRef(longOf(v \ "snapshot-id"), strOf(v \ "type"))
        }.toMap
        case _ => Map.empty
      },
      statistics = (j \ "statistics") match {
        case JArray(xs) => xs.map(s => StatisticsFile(
          longOf(s \ "snapshot-id"), strOf(s \ "statistics-path"),
          longOf(s \ "file-size-in-bytes"),
          (s \ "file-footer-size-in-bytes") match { case JInt(i) => i.toLong; case _ => 0L },
          (s \ "blob-metadata") match {
            case JArray(bs) => bs.map(blobMetaFromJson)
            case _ => Nil
          }))
        case _ => Nil
      },
      partitionStatistics = (j \ "partition-statistics") match {
        case JArray(xs) => xs.map(s => PartitionStatisticsFile(
          longOf(s \ "snapshot-id"), strOf(s \ "statistics-path"),
          longOf(s \ "file-size-in-bytes")))
        case _ => Nil
      },
      nextRowId = (j \ "next-row-id") match { case JInt(i) => i.toLong; case _ => 0L })
  }

  def write(m: TableMetadata): String =
    JsonMethods.pretty(JsonMethods.render(toJson(m)))

  def read(s: String): TableMetadata = fromJson(JsonMethods.parse(s))

  // ---------------------------------------------------------------- utils

  /** Spec-shaped statistics blob metadata (type / snapshot-id /
    * sequence-number / fields / properties) to and from the generic map
    * carried on [[StatisticsFile]]. */
  private def blobMetaToJson(m: Map[String, Any]): JValue = JObject(
    "type" -> JString(m.getOrElse("type", "").toString),
    "snapshot-id" -> JInt(BigInt(m.getOrElse("snapshot-id", 0L).toString)),
    "sequence-number" -> JInt(BigInt(m.getOrElse("sequence-number", 0L).toString)),
    "fields" -> JArray(m.getOrElse("fields", Seq.empty[Int])
      .asInstanceOf[Seq[Int]].toList.map(JInt(_))),
    "properties" -> JObject(m.getOrElse("properties", Map.empty[String, String])
      .asInstanceOf[Map[String, String]].toList
      .map { case (k, v) => k -> (JString(v): JValue) }))

  private def blobMetaFromJson(j: JValue): Map[String, Any] = Map(
    "type" -> strOf(j \ "type"),
    "snapshot-id" -> longOf(j \ "snapshot-id"),
    "sequence-number" -> longOf(j \ "sequence-number"),
    "fields" -> ((j \ "fields") match {
      case JArray(xs) => xs.map(intOf)
      case _ => Seq.empty[Int]
    }),
    "properties" -> ((j \ "properties") match {
      case JObject(fs) => fs.collect { case (k, JString(v)) => k -> v }.toMap
      case _ => Map.empty[String, String]
    }))

  private def intOf(j: JValue): Int = j match {
    case JInt(i) => i.toInt
    case other => throw new IllegalArgumentException(s"expected int, got $other")
  }
  private def longOf(j: JValue): Long = j match {
    case JInt(i) => i.toLong
    case other => throw new IllegalArgumentException(s"expected long, got $other")
  }
  private def strOf(j: JValue): String = j match {
    case JString(s) => s
    case other => throw new IllegalArgumentException(s"expected string, got $other")
  }
  private def boolOf(j: JValue): Boolean = j match {
    case JBool(b) => b
    case _ => false
  }
}
