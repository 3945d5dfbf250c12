package graft

import graft.manifest.{DataFile, ManifestEntry, ManifestFile, Manifests, SingleValue}
import graft.meta.{PartitionField, PartitionSpec}
import graft.types._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/**
 * Golden-fixture assertions that the Avro manifest layout matches the
 * published Iceberg table-spec v2 (the format the reference consumes via
 * the iceberg crate, `ext/iceberg/src/scan.rs:36-51`; its PyIceberg
 * cross-writer test `test/sql_test.rb:109-117` relies on spec-shaped
 * manifests): field ids on every field, field-id-keyed binary bounds with
 * single-value serialization, typed r102 partition struct, self-describing
 * headers, and the manifest_file record's 500-series field ids.
 */
class ManifestsSpec extends AnyFunSuite {

  private val schema = Schema(0, Seq(
    NestedField(1, "id", ILong, required = true),
    NestedField(2, "name", IString),
    NestedField(3, "price", IDouble),
    NestedField(4, "day", IDate)))
  private val spec = PartitionSpec(0, Seq(
    PartitionField(4, 1000, "day", "identity"),
    PartitionField(1, 1001, "id_bucket", "bucket[16]")))

  private def fieldId(f: org.apache.avro.Schema.Field): Int =
    f.getObjectProp("field-id").asInstanceOf[Number].intValue()

  test("manifest_entry avro schema carries the spec v2 field ids") {
    val avro = Manifests.entryAvroSchema(spec, schema)
    assert(avro.getName == "manifest_entry")
    assert(fieldId(avro.getField("status")) == 0)
    assert(fieldId(avro.getField("snapshot_id")) == 1)
    assert(fieldId(avro.getField("data_file")) == 2)
    assert(fieldId(avro.getField("sequence_number")) == 3)
    assert(fieldId(avro.getField("file_sequence_number")) == 4)

    val df = avro.getField("data_file").schema()
    assert(df.getName == "r2")
    assert(fieldId(df.getField("content")) == 134)
    assert(fieldId(df.getField("file_path")) == 100)
    assert(fieldId(df.getField("file_format")) == 101)
    assert(fieldId(df.getField("partition")) == 102)
    assert(fieldId(df.getField("record_count")) == 103)
    assert(fieldId(df.getField("file_size_in_bytes")) == 104)
    assert(fieldId(df.getField("null_value_counts")) == 110)
    assert(fieldId(df.getField("lower_bounds")) == 125)
    assert(fieldId(df.getField("upper_bounds")) == 128)
    assert(fieldId(df.getField("equality_ids")) == 135)

    // bounds maps: key/value arrays (logicalType map) with binary values
    // and spec key/value ids
    val lower = df.getField("lower_bounds").schema().getTypes.get(1)
    assert(lower.getType == org.apache.avro.Schema.Type.ARRAY)
    assert(lower.getObjectProp("logicalType") == "map")
    val kv = lower.getElementType
    assert(kv.getName == "k126_v127")
    assert(fieldId(kv.getField("key")) == 126)
    assert(fieldId(kv.getField("value")) == 127)
    assert(kv.getField("value").schema().getType == org.apache.avro.Schema.Type.BYTES)

    // typed partition struct r102 with the spec's partition field ids
    val part = df.getField("partition").schema()
    assert(part.getName == "r102")
    assert(fieldId(part.getField("day")) == 1000)
    assert(fieldId(part.getField("id_bucket")) == 1001)
    // identity(date) -> date-typed; bucket[16] -> int
    assert(part.getField("day").schema().getTypes.get(1).getLogicalType
      .isInstanceOf[org.apache.avro.LogicalTypes.Date])
    assert(part.getField("id_bucket").schema().getTypes.get(1).getType ==
      org.apache.avro.Schema.Type.INT)
  }

  test("manifest_file avro schema carries the spec v2 500-series field ids") {
    val avro = Manifests.manifestFileAvroSchema
    assert(avro.getName == "manifest_file")
    val want = Map(
      "manifest_path" -> 500, "manifest_length" -> 501, "partition_spec_id" -> 502,
      "added_snapshot_id" -> 503, "added_files_count" -> 504,
      "existing_files_count" -> 505, "deleted_files_count" -> 506,
      "added_rows_count" -> 512, "existing_rows_count" -> 513,
      "deleted_rows_count" -> 514, "sequence_number" -> 515,
      "min_sequence_number" -> 516, "content" -> 517)
    want.foreach { case (name, id) =>
      assert(fieldId(avro.getField(name)) == id, s"field $name")
    }
  }

  test("single-value serialization: spec Appendix D known answers") {
    // int 34 -> 4 bytes little-endian
    assert(SingleValue.toBytes(IInt, "34").get.toSeq ==
      Seq[Byte](0x22, 0x00, 0x00, 0x00))
    // long 34
    assert(SingleValue.toBytes(ILong, "34").get.toSeq ==
      Seq[Byte](0x22, 0, 0, 0, 0, 0, 0, 0))
    // boolean
    assert(SingleValue.toBytes(IBoolean, "true").get.toSeq == Seq[Byte](1))
    assert(SingleValue.toBytes(IBoolean, "false").get.toSeq == Seq[Byte](0))
    // float 1.0 -> 00 00 80 3F LE
    assert(SingleValue.toBytes(IFloat, "1.0").get.toSeq ==
      Seq[Byte](0x00, 0x00, 0x80.toByte, 0x3F))
    // string: UTF-8
    assert(SingleValue.toBytes(IString, "iceberg").get.toSeq ==
      "iceberg".getBytes("UTF-8").toSeq)
    // decimal unscaled big-endian minimal two's-complement: 12.34 scale 2 -> 1234 -> 04 D2
    // (canonical string form is the SCALED value; bytes are the spec's unscaled int)
    assert(SingleValue.toBytes(IDecimal(9, 2), "12.34").get.toSeq ==
      Seq[Byte](0x04, 0xD2.toByte))
    // date as epoch days (physical int form)
    assert(SingleValue.toBytes(IDate, "18262").get.toSeq ==
      Seq[Byte](0x56, 0x47, 0x00, 0x00))
    // round-trips
    for ((t, v) <- Seq[(IType, String)](
      IInt -> "-7", ILong -> "123456789012", IFloat -> "1.5", IDouble -> "-2.25",
      IBoolean -> "true", IString -> "héllo wörld", IDate -> "19000",
      ITimestamp -> "1700000000000000", IDecimal(18, 2) -> "-999.25",
      IUuid -> "f79c3e09-677c-4bbd-a479-3f349cb785e7"))
      assert(SingleValue.fromBytes(t, SingleValue.toBytes(t, v).get) == v, s"$t")
  }

  test("manifest round-trip: bounds, nulls, typed partition, equality ids") {
    val conf = new Configuration()
    val dir = java.nio.file.Files.createTempDirectory("graft-manifests").toString
    val path = new Path(dir, "m0.avro")
    val fs = path.getFileSystem(conf)

    val f1 = DataFile(
      filePath = s"$dir/data/f1.parquet", fileFormat = "PARQUET",
      partition = Map("day" -> "2020-01-05", "id_bucket" -> "7"),
      recordCount = 100, fileSizeInBytes = 2048,
      lowerBounds = Map("id" -> "1", "name" -> "aardvark", "price" -> "0.5", "day" -> "18262"),
      upperBounds = Map("id" -> "99", "name" -> "zebra", "price" -> "9.75", "day" -> "18290"),
      nullCounts = Map("name" -> 3L, "price" -> 0L))
    val f2 = DataFile( // null partition value + equality-delete file
      filePath = s"$dir/data/f2.parquet", fileFormat = "PARQUET",
      partition = Map("day" -> "", "id_bucket" -> ""),
      recordCount = 5, fileSizeInBytes = 128,
      content = 2, equalityIds = Seq(1, 2))
    val entries = Seq(
      ManifestEntry(ManifestEntry.StatusAdded, 42L, 7L, f1),
      ManifestEntry(ManifestEntry.StatusExisting, 42L, 3L, f2))

    Manifests.writeManifest(fs, path, entries, schema, spec)
    val back = Manifests.readManifest(fs, path)
    assert(back == entries)
  }

  test("manifest header is self-describing (schema + partition spec JSON)") {
    val conf = new Configuration()
    val dir = java.nio.file.Files.createTempDirectory("graft-manifests-hdr").toString
    val path = new Path(dir, "m1.avro")
    val fs = path.getFileSystem(conf)
    Manifests.writeManifest(fs, path, Nil, schema, spec)

    val in = new org.apache.avro.file.SeekableByteArrayInput(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, "m1.avro")))
    val reader = new org.apache.avro.file.DataFileReader[org.apache.avro.generic.GenericRecord](
      in, new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    try {
      assert(reader.getMetaString("format-version") == "2")
      assert(reader.getMetaString("content") == "data")
      assert(reader.getMetaString("partition-spec-id") == "0")
      val schemaBack = graft.meta.MetadataJson.schemaFromJson(
        org.json4s.jackson.JsonMethods.parse(reader.getMetaString("schema")))
      assert(schemaBack == schema)
      assert(reader.getMetaString("partition-spec").contains("\"field-id\":1000"))
    } finally reader.close()
  }

  test("manifest list round-trip with v2 stats") {
    val conf = new Configuration()
    val dir = java.nio.file.Files.createTempDirectory("graft-mlist").toString
    val path = new Path(dir, "snap-1.avro")
    val fs = path.getFileSystem(conf)
    val mfs = Seq(
      ManifestFile(s"$dir/m0.avro", 1234, 0, 42L, 10, 1000L, 0, content = 0,
        sequenceNumber = 5, minSequenceNumber = 2,
        existingFilesCount = 3, existingRowsCount = 300L),
      ManifestFile(s"$dir/m1.avro", 99, 0, 42L, 0, 0L, 0, content = 1,
        sequenceNumber = 5, minSequenceNumber = 5))
    Manifests.writeManifestList(fs, path, mfs, snapshotId = 42L,
      parentSnapshotId = Some(41L), sequenceNumber = 5L)
    assert(Manifests.readManifestList(fs, path) == mfs)
  }

  test("507 partition summaries: computation + list round-trip") {
    import graft.manifest.FieldSummary
    val files = Seq(
      DataFile(s"/w/f1.parquet", "PARQUET",
        Map("day" -> "2020-01-05", "id_bucket" -> "7"), 10, 100),
      DataFile(s"/w/f2.parquet", "PARQUET",
        Map("day" -> "2020-01-02", "id_bucket" -> ""), 10, 100)) // null bucket
    val sums = Manifests.partitionSummaries(files, spec, schema)
    assert(sums.size == 2)
    // day: identity(date) → date-typed single-value bounds (epoch days LE)
    assert(!sums(0).containsNull)
    assert(sums(0).lowerBound.isDefined && sums(0).upperBound.isDefined)
    assert(SingleValue.fromBytes(IDate, sums(0).lowerBound.get.toArray) ==
      java.time.LocalDate.parse("2020-01-02").toEpochDay.toString)
    assert(SingleValue.fromBytes(IDate, sums(0).upperBound.get.toArray) ==
      java.time.LocalDate.parse("2020-01-05").toEpochDay.toString)
    // id_bucket: one null value → containsNull; bounds from the non-null
    assert(sums(1).containsNull)
    assert(SingleValue.fromBytes(IInt, sums(1).lowerBound.get.toArray) == "7")

    // unparseable (era-re-keyed) value → unknown bounds, never wrong ones
    val bad = Manifests.partitionSummaries(
      files :+ DataFile("/w/f3.parquet", "PARQUET",
        Map("day" -> "not-a-date", "id_bucket" -> "1"), 1, 1), spec, schema)
    assert(bad(0) == FieldSummary(containsNull = false, None, None))

    // round-trip through the manifest list
    val conf = new Configuration()
    val dir = java.nio.file.Files.createTempDirectory("graft-mlist507").toString
    val path = new Path(dir, "snap-s.avro")
    val fs = path.getFileSystem(conf)
    val mf = ManifestFile(s"$dir/m0.avro", 10, 0, 1L, 2, 20L, 0,
      sequenceNumber = 1, minSequenceNumber = 1, partitions = sums)
    Manifests.writeManifestList(fs, path, Seq(mf))
    assert(Manifests.readManifestList(fs, path) == Seq(mf))
  }

  test("pre-spec-layout files raise a descriptive error, not NPE") {
    val conf = new Configuration()
    val dir = java.nio.file.Files.createTempDirectory("graft-prespec").toString

    // an Avro file with neither the 'schema' header nor spec record fields
    val legacy = org.apache.avro.SchemaBuilder.record("legacy").fields()
      .requiredString("manifest_path").endRecord()
    def writeLegacy(name: String): Path = {
      val p = new Path(dir, name)
      val w = new org.apache.avro.file.DataFileWriter[org.apache.avro.generic.GenericRecord](
        new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](legacy))
      val out = p.getFileSystem(conf).create(p, true)
      w.create(legacy, out)
      val r = new org.apache.avro.generic.GenericData.Record(legacy)
      r.put("manifest_path", "x"); w.append(r); w.close()
      p
    }

    val fs = new Path(dir).getFileSystem(conf)
    val e1 = intercept[InvalidDataError](Manifests.readManifest(fs, writeLegacy("m-old.avro")))
    assert(e1.getMessage.contains("spec-v2"))
    val e2 = intercept[InvalidDataError](Manifests.readManifestList(fs, writeLegacy("l-old.avro")))
    assert(e2.getMessage.contains("spec-v2"))
  }

  test("position-delete bounds prefer reserved ids over same-named table columns") {
    val conf = new Configuration()
    val dir = java.nio.file.Files.createTempDirectory("graft-resv").toString
    val path = new Path(dir, "m-resv.avro")
    val fs = path.getFileSystem(conf)
    // a table that happens to have columns literally named file_path/pos —
    // the delete file's own bounds must still key under the spec's
    // reserved ids (2147483546/2147483545), string/long typed
    val clashSchema = Schema(0, Seq(
      NestedField(1, "file_path", ILong), // wrong type on purpose
      NestedField(2, "pos", IString)))
    val del = DataFile(
      filePath = s"$dir/data/d.parquet", fileFormat = "PARQUET",
      partition = Map.empty, recordCount = 2, fileSizeInBytes = 64,
      lowerBounds = Map("file_path" -> "file:/w/data/a.parquet", "pos" -> "0"),
      upperBounds = Map("file_path" -> "file:/w/data/a.parquet", "pos" -> "5"),
      content = 1)
    Manifests.writeManifest(fs, path,
      Seq(ManifestEntry(ManifestEntry.StatusAdded, 1L, 1L, del)),
      clashSchema, PartitionSpec(0, Nil))

    // raw Avro: bound keys are the reserved ids, not table ids 1/2
    val in = new org.apache.avro.file.SeekableByteArrayInput(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, "m-resv.avro")))
    val reader = new org.apache.avro.file.DataFileReader[org.apache.avro.generic.GenericRecord](
      in, new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    try {
      val df = reader.next().get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
      val keys = df.get("lower_bounds").asInstanceOf[java.util.List[_]]
        .toArray.map(_.asInstanceOf[org.apache.avro.generic.GenericRecord]
          .get("key").asInstanceOf[Int]).toSet
      assert(keys == Set(2147483546, 2147483545))
    } finally reader.close()
    // and they round-trip through our own reader with the right types
    val back = Manifests.readManifest(fs, path)
    assert(back.head.dataFile.lowerBounds("file_path") == "file:/w/data/a.parquet")
    assert(back.head.dataFile.lowerBounds("pos") == "0")
    assert(back.head.dataFile.upperBounds("pos") == "5")
  }

  test("unparseable partition value is written as null, not a commit failure") {
    val conf = new Configuration()
    val dir = java.nio.file.Files.createTempDirectory("graft-badpart").toString
    val path = new Path(dir, "m-bad.avro")
    val fs = path.getFileSystem(conf)
    // 'id_bucket' (int-typed) carries a value that cannot parse as int —
    // e.g. a kept file re-keyed under an evolved same-named field
    val f = DataFile(
      filePath = s"$dir/data/f.parquet", fileFormat = "PARQUET",
      partition = Map("day" -> "2020-01-05", "id_bucket" -> "not-an-int"),
      recordCount = 1, fileSizeInBytes = 10)
    Manifests.writeManifest(fs, path, Seq(ManifestEntry(ManifestEntry.StatusAdded, 1L, 1L, f)), schema, spec)
    val back = Manifests.readManifest(fs, path)
    assert(back.head.dataFile.partition == Map("day" -> "2020-01-05", "id_bucket" -> ""))
  }
}
