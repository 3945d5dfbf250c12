package graft.manifest

import org.apache.avro.{Schema => AvroSchema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.json4s._
import org.json4s.jackson.JsonMethods

import scala.jdk.CollectionConverters._

/** One data file tracked by a manifest (ref `scan.rs:82-109` FileScanTask
  * accessors). Partition values and column bounds are carried as JSON maps
  * (a documented simplification of the spec's binary single-value
  * serialization — same pruning power, one writer/reader). */
final case class DataFile(
    filePath: String,
    fileFormat: String, // "PARQUET"
    partition: Map[String, String], // partition field name -> value string ("" = null)
    recordCount: Long,
    fileSizeInBytes: Long,
    // column stats by source field NAME at write time (bounds as strings)
    lowerBounds: Map[String, String] = Map.empty,
    upperBounds: Map[String, String] = Map.empty,
    nullCounts: Map[String, Long] = Map.empty,
    content: Int = 0, // 0=data, 1=position deletes, 2=equality deletes
    equalityIds: Seq[Int] = Nil)

/** A manifest entry: a data file + its lifecycle status. */
final case class ManifestEntry(
    status: Int, // 0=existing 1=added 2=deleted
    snapshotId: Long,
    sequenceNumber: Long,
    dataFile: DataFile) {
  def isLive: Boolean = status != ManifestEntry.StatusDeleted
}
object ManifestEntry {
  val StatusExisting = 0
  val StatusAdded = 1
  val StatusDeleted = 2
}

/** Manifest-list entry: one manifest file + roll-up stats used for pruning
  * (which schema wrote it, how many rows it adds). */
final case class ManifestFile(
    manifestPath: String,
    manifestLength: Long,
    partitionSpecId: Int,
    addedSnapshotId: Long,
    addedFilesCount: Int,
    addedRowsCount: Long,
    schemaId: Int,
    content: Int = 0) // 0=data manifests, 1=delete manifests

/**
 * Avro reader/writer for manifests and manifest lists (Iceberg-style
 * two-level metadata tree: snapshot → manifest-list → manifests → data
 * files). Avro (not JSON) so a 100 TB table's million-file metadata stays
 * compact and splittable; maps are encoded as JSON strings inside the
 * records for schema simplicity.
 *
 * INTEROP NOTE: this is graft's OWN manifest schema, not the Iceberg spec's
 * manifest/manifest-list Avro layout (field-id-keyed binary bounds,
 * partition structs). Tables written here are fully self-consistent — and
 * the metadata.json layer IS spec-shaped — but spec-compliant Iceberg
 * readers cannot consume these manifests, nor vice versa. Adopting the spec
 * schemas is a contained change (this file only): both sides already carry
 * the same information.
 */
object Manifests {

  private val entrySchema: AvroSchema = SchemaBuilder
    .record("manifest_entry").namespace("graft")
    .fields()
    .requiredInt("status")
    .requiredLong("snapshot_id")
    .requiredLong("sequence_number")
    .requiredInt("content")
    .requiredString("file_path")
    .requiredString("file_format")
    .requiredString("partition_json")
    .requiredLong("record_count")
    .requiredLong("file_size_in_bytes")
    .optionalString("lower_bounds_json")
    .optionalString("upper_bounds_json")
    .optionalString("null_counts_json")
    .optionalString("equality_ids_json")
    .endRecord()

  private val manifestFileSchema: AvroSchema = SchemaBuilder
    .record("manifest_file").namespace("graft")
    .fields()
    .requiredString("manifest_path")
    .requiredLong("manifest_length")
    .requiredInt("partition_spec_id")
    .requiredLong("added_snapshot_id")
    .requiredInt("added_files_count")
    .requiredLong("added_rows_count")
    .requiredInt("schema_id")
    .requiredInt("content")
    .endRecord()

  private def mapToJson(m: Map[String, String]): String =
    JsonMethods.compact(JsonMethods.render(JObject(m.toList.map { case (k, v) => k -> (JString(v): JValue) })))
  private def longMapToJson(m: Map[String, Long]): String =
    JsonMethods.compact(JsonMethods.render(JObject(m.toList.map { case (k, v) => k -> (JInt(BigInt(v)): JValue) })))
  private def jsonToMap(s: String): Map[String, String] = JsonMethods.parse(s) match {
    case JObject(fs) => fs.collect { case (k, JString(v)) => k -> v }.toMap
    case _ => Map.empty
  }
  private def jsonToLongMap(s: String): Map[String, Long] = JsonMethods.parse(s) match {
    case JObject(fs) => fs.collect { case (k, JInt(v)) => k -> v.toLong }.toMap
    case _ => Map.empty
  }

  // ------------------------------------------------------------- manifests

  def writeManifest(fs: FileSystem, path: Path, entries: Seq[ManifestEntry]): Long = {
    val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](entrySchema))
    val out = fs.create(path, true)
    try {
      writer.create(entrySchema, out)
      entries.foreach { e =>
        val r = new GenericData.Record(entrySchema)
        r.put("status", e.status)
        r.put("snapshot_id", e.snapshotId)
        r.put("sequence_number", e.sequenceNumber)
        r.put("content", e.dataFile.content)
        r.put("file_path", e.dataFile.filePath)
        r.put("file_format", e.dataFile.fileFormat)
        r.put("partition_json", mapToJson(e.dataFile.partition))
        r.put("record_count", e.dataFile.recordCount)
        r.put("file_size_in_bytes", e.dataFile.fileSizeInBytes)
        r.put("lower_bounds_json", mapToJson(e.dataFile.lowerBounds))
        r.put("upper_bounds_json", mapToJson(e.dataFile.upperBounds))
        r.put("null_counts_json", longMapToJson(e.dataFile.nullCounts))
        r.put("equality_ids_json",
          JsonMethods.compact(JsonMethods.render(JArray(e.dataFile.equalityIds.toList.map(i => JInt(i): JValue)))))
        writer.append(r)
      }
    } finally writer.close()
    fs.getFileStatus(path).getLen
  }

  def readManifest(fs: FileSystem, path: Path): Seq[ManifestEntry] = {
    val in = new org.apache.avro.file.SeekableByteArrayInput(readFully(fs, path))
    val reader = new DataFileReader[GenericRecord](in, new GenericDatumReader[GenericRecord](entrySchema))
    try {
      reader.iterator().asScala.map { r =>
        def str(k: String): String = Option(r.get(k)).map(_.toString).getOrElse("")
        ManifestEntry(
          status = r.get("status").asInstanceOf[Int],
          snapshotId = r.get("snapshot_id").asInstanceOf[Long],
          sequenceNumber = r.get("sequence_number").asInstanceOf[Long],
          dataFile = DataFile(
            filePath = str("file_path"),
            fileFormat = str("file_format"),
            partition = if (str("partition_json").isEmpty) Map.empty else jsonToMap(str("partition_json")),
            recordCount = r.get("record_count").asInstanceOf[Long],
            fileSizeInBytes = r.get("file_size_in_bytes").asInstanceOf[Long],
            lowerBounds = if (str("lower_bounds_json").isEmpty) Map.empty else jsonToMap(str("lower_bounds_json")),
            upperBounds = if (str("upper_bounds_json").isEmpty) Map.empty else jsonToMap(str("upper_bounds_json")),
            nullCounts = if (str("null_counts_json").isEmpty) Map.empty else jsonToLongMap(str("null_counts_json")),
            content = r.get("content").asInstanceOf[Int],
            equalityIds = if (str("equality_ids_json").isEmpty) Nil else
              JsonMethods.parse(str("equality_ids_json")) match {
                case JArray(xs) => xs.collect { case JInt(i) => i.toInt }
                case _ => Nil
              }))
      }.toList
    } finally reader.close()
  }

  // --------------------------------------------------------- manifest list

  def writeManifestList(fs: FileSystem, path: Path, manifests: Seq[ManifestFile]): Long = {
    val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](manifestFileSchema))
    val out = fs.create(path, true)
    try {
      writer.create(manifestFileSchema, out)
      manifests.foreach { m =>
        val r = new GenericData.Record(manifestFileSchema)
        r.put("manifest_path", m.manifestPath)
        r.put("manifest_length", m.manifestLength)
        r.put("partition_spec_id", m.partitionSpecId)
        r.put("added_snapshot_id", m.addedSnapshotId)
        r.put("added_files_count", m.addedFilesCount)
        r.put("added_rows_count", m.addedRowsCount)
        r.put("schema_id", m.schemaId)
        r.put("content", m.content)
        writer.append(r)
      }
    } finally writer.close()
    fs.getFileStatus(path).getLen
  }

  def readManifestList(fs: FileSystem, path: Path): Seq[ManifestFile] = {
    val in = new org.apache.avro.file.SeekableByteArrayInput(readFully(fs, path))
    val reader = new DataFileReader[GenericRecord](in, new GenericDatumReader[GenericRecord](manifestFileSchema))
    try {
      reader.iterator().asScala.map { r =>
        ManifestFile(
          manifestPath = r.get("manifest_path").toString,
          manifestLength = r.get("manifest_length").asInstanceOf[Long],
          partitionSpecId = r.get("partition_spec_id").asInstanceOf[Int],
          addedSnapshotId = r.get("added_snapshot_id").asInstanceOf[Long],
          addedFilesCount = r.get("added_files_count").asInstanceOf[Int],
          addedRowsCount = r.get("added_rows_count").asInstanceOf[Long],
          schemaId = r.get("schema_id").asInstanceOf[Int],
          content = r.get("content").asInstanceOf[Int])
      }.toList
    } finally reader.close()
  }

  private def readFully(fs: FileSystem, path: Path): Array[Byte] = {
    val len = fs.getFileStatus(path).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(path)
    try in.readFully(0, buf) finally in.close()
    buf
  }

  def newConf(): Configuration = new Configuration()
}
