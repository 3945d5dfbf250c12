package graft.meta

import graft.types._

/** One immutable table version (ref `ext/iceberg/src/snapshot.rs:20-37`). */
final case class Snapshot(
    snapshotId: Long,
    parentSnapshotId: Option[Long],
    sequenceNumber: Long,
    timestampMs: Long,
    manifestList: String,
    summary: Map[String, String],
    schemaId: Option[Int],
    // format-v3 row lineage: the _row_id assigned to this snapshot's first
    // new row; data files added by the snapshot carry explicit
    // first_row_id values starting here
    firstRowId: Option[Long] = None) {
  def operation: Option[String] = summary.get("operation")
}

final case class SnapshotLogEntry(timestampMs: Long, snapshotId: Long)
final case class MetadataLogEntry(timestampMs: Long, metadataFile: String)

final case class PartitionField(sourceId: Int, fieldId: Int, name: String, transform: String)

final case class PartitionSpec(specId: Int, fields: Seq[PartitionField]) {
  def isUnpartitioned: Boolean = fields.isEmpty
}
object PartitionSpec {
  val Unpartitioned: PartitionSpec = PartitionSpec(0, Nil)
  /** Partition field ids start at 1000 by spec convention. */
  val FirstFieldId = 1000
}

final case class SortField(
    sourceId: Int,
    transform: String,
    direction: String, // "asc" | "desc"
    nullOrder: String) // "nulls-first" | "nulls-last"
object SortField {
  /** Defaults from ref `ext/iceberg/src/sorting.rs:59-85`:
    * direction=asc; null order first-if-asc, last-if-desc. */
  def apply(sourceId: Int, transform: String = "identity",
            direction: String = "asc", nullOrder: String = null): SortField = {
    val no = Option(nullOrder).getOrElse(if (direction == "asc") "nulls-first" else "nulls-last")
    new SortField(sourceId, transform, direction, no)
  }
}

final case class SortOrder(orderId: Int, fields: Seq[SortField]) {
  def isUnsorted: Boolean = fields.isEmpty
}
object SortOrder { val Unsorted: SortOrder = SortOrder(0, Nil) }

final case class StatisticsFile(
    snapshotId: Long, statisticsPath: String, fileSizeInBytes: Long,
    fileFooterSizeInBytes: Long, blobMetadata: Seq[Map[String, Any]] = Nil)
final case class PartitionStatisticsFile(
    snapshotId: Long, statisticsPath: String, fileSizeInBytes: Long)
final case class EncryptedKey(keyId: String, encryptedKeyMetadata: String,
    encryptedById: Option[String] = None, properties: Map[String, String] = Map.empty)

/**
 * Full table metadata — the content of `vN.metadata.json`
 * (ref `ext/iceberg/src/table.rs:149-341`, Iceberg spec v2).
 */
final case class TableMetadata(
    formatVersion: Int,
    tableUuid: String,
    location: String,
    lastSequenceNumber: Long,
    lastUpdatedMs: Long,
    lastColumnId: Int,
    currentSchemaId: Int,
    schemas: Seq[Schema],
    defaultSpecId: Int,
    partitionSpecs: Seq[PartitionSpec],
    lastPartitionId: Int,
    defaultSortOrderId: Int,
    sortOrders: Seq[SortOrder],
    properties: Map[String, String],
    currentSnapshotId: Option[Long],
    snapshots: Seq[Snapshot],
    snapshotLog: Seq[SnapshotLogEntry],
    metadataLog: Seq[MetadataLogEntry],
    refs: Map[String, SnapshotRef] = Map.empty,
    statistics: Seq[StatisticsFile] = Nil,
    partitionStatistics: Seq[PartitionStatisticsFile] = Nil,
    encryptionKeys: Seq[EncryptedKey] = Nil,
    nextRowId: Long = 0L) {

  def currentSchema: Schema = schemas.find(_.schemaId == currentSchemaId)
    .getOrElse(throw new IllegalStateException(s"no schema with id $currentSchemaId"))
  def schemaById(id: Int): Option[Schema] = schemas.find(_.schemaId == id)
  def defaultPartitionSpec: PartitionSpec = partitionSpecs.find(_.specId == defaultSpecId)
    .getOrElse(PartitionSpec.Unpartitioned)
  def partitionSpecById(id: Int): Option[PartitionSpec] = partitionSpecs.find(_.specId == id)
  def defaultSortOrder: SortOrder = sortOrders.find(_.orderId == defaultSortOrderId)
    .getOrElse(SortOrder.Unsorted)
  def sortOrderById(id: Int): Option[SortOrder] = sortOrders.find(_.orderId == id)
  def currentSnapshot: Option[Snapshot] = currentSnapshotId.flatMap(snapshotById)
  def snapshotById(id: Long): Option[Snapshot] = snapshots.find(_.snapshotId == id)
  def snapshotForRef(ref: String): Option[Snapshot] =
    refs.get(ref).flatMap(r => snapshotById(r.snapshotId))
  def nextSequenceNumber: Long = lastSequenceNumber + 1
  def statisticsForSnapshot(id: Long): Seq[StatisticsFile] =
    statistics.filter(_.snapshotId == id)
  def partitionStatisticsForSnapshot(id: Long): Seq[PartitionStatisticsFile] =
    partitionStatistics.filter(_.snapshotId == id)
  def history: Seq[SnapshotLogEntry] = snapshotLog
}

final case class SnapshotRef(snapshotId: Long, refType: String, // "branch" | "tag"
    minSnapshotsToKeep: Option[Int] = None, maxSnapshotAgeMs: Option[Long] = None,
    maxRefAgeMs: Option[Long] = None)

object TableMetadata {
  val DefaultFormatVersion = 2

  /** Fresh metadata for a newly created table (no snapshots yet). The
    * reserved `format-version` table property is a creation directive (ref
    * `ext/iceberg/src/catalog.rs:320-334` honors it the same way): it picks
    * the metadata version and is stripped from the stored properties. */
  def create(location: String, schema: Schema, spec: PartitionSpec,
             sortOrder: SortOrder, properties: Map[String, String],
             formatVersion: Int = DefaultFormatVersion): TableMetadata = {
    val fv = properties.get("format-version") match {
      case Some(v) =>
        val n = try v.trim.toInt catch {
          case _: NumberFormatException =>
            throw new graft.InvalidDataError(s"invalid format-version: $v")
        }
        if (n < 1 || n > 3)
          throw new graft.InvalidDataError(s"unsupported format-version: $n")
        n
      case None => formatVersion
    }
    val s0 = if (schema.schemaId == 0) schema else schema.copy(schemaId = 0)
    val lastPartId =
      if (spec.fields.isEmpty) PartitionSpec.FirstFieldId - 1
      else spec.fields.map(_.fieldId).max
    TableMetadata(
      formatVersion = fv,
      tableUuid = java.util.UUID.randomUUID().toString,
      location = location,
      lastSequenceNumber = 0L,
      lastUpdatedMs = System.currentTimeMillis(),
      lastColumnId = s0.highestFieldId,
      currentSchemaId = 0,
      schemas = Seq(s0),
      defaultSpecId = spec.specId,
      partitionSpecs = Seq(spec),
      lastPartitionId = lastPartId,
      defaultSortOrderId = sortOrder.orderId,
      sortOrders = Seq(sortOrder),
      properties = properties - "format-version",
      currentSnapshotId = None,
      snapshots = Nil,
      snapshotLog = Nil,
      metadataLog = Nil)
  }
}
