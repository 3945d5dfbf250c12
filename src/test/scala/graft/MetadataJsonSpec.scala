package graft

import graft.meta._
import graft.types._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata JSON round-trip fidelity (spec-shaped layer; the golden-fixture
  * analogue of `/root/reference/test/static_table_test.rb` +
  * `test/support/metadata.json`). */
class MetadataJsonSpec extends AnyFunSuite {

  private def richMetadata: TableMetadata = {
    val schema = Schema(0, Seq(
      NestedField(1, "id", ILong, required = true),
      NestedField(2, "name", IString, required = false, doc = Some("display name")),
      NestedField(3, "price", IDecimal(9, 2), required = false),
      NestedField(4, "ts", ITimestamp, required = false),
      NestedField(5, "tags", IList(6, IString, elementRequired = false), required = false),
      NestedField(7, "attrs",
        IMap(8, IString, 9, ILong, valueRequired = false), required = false),
      NestedField(10, "point", IStruct(Seq(
        NestedField(11, "x", IDouble, required = true),
        NestedField(12, "y", IDouble, required = true))), required = false)))
    val spec = PartitionSpec(0, Seq(
      PartitionField(4, 1000, "ts_day", "day"),
      PartitionField(1, 1001, "id_bucket", "bucket[16]")))
    val order = SortOrder(1, Seq(SortField(1, "identity", "asc", "nulls-first")))
    val base = TableMetadata.create("/tmp/wh/t", schema, spec, order,
      Map("write.target-file-rows" -> "100000"))
    val snap = Snapshot(
      snapshotId = 42L, parentSnapshotId = None, sequenceNumber = 1L,
      timestampMs = 1700000000000L, manifestList = "/tmp/wh/t/metadata/snap-42.avro",
      summary = Map("operation" -> "append", "added-records" -> "3"),
      schemaId = Some(0))
    base.copy(
      lastSequenceNumber = 1L,
      currentSnapshotId = Some(42L),
      snapshots = Seq(snap),
      snapshotLog = Seq(SnapshotLogEntry(1700000000000L, 42L)),
      metadataLog = Seq(MetadataLogEntry(1699999999000L, "/tmp/wh/t/metadata/v1.metadata.json")),
      refs = Map("main" -> SnapshotRef(42L, "branch")))
  }

  test("write → read round-trips every field") {
    val m = richMetadata
    val json = MetadataJson.write(m)
    val back = MetadataJson.read(json)
    assert(back == m)
  }

  test("JSON uses the spec's field names") {
    val json = MetadataJson.write(richMetadata)
    for (key <- Seq("format-version", "table-uuid", "location",
        "last-sequence-number", "last-updated-ms", "last-column-id",
        "current-schema-id", "schemas", "partition-specs", "default-spec-id",
        "sort-orders", "default-sort-order-id", "snapshots",
        "current-snapshot-id", "snapshot-log", "metadata-log", "refs"))
      assert(json.contains("\"" + key + "\""), s"missing $key")
  }

  test("golden v2 metadata parses (hand-built spec-shaped document)") {
    // mirrors the shape of the reference's test/support/metadata.json
    // (v2, schema {a:int, b:string}, no snapshots) without copying it
    val json =
      """{
        |  "format-version": 2,
        |  "table-uuid": "9c12d441-03fe-4693-9a96-a0705ddf69c1",
        |  "location": "/tmp/wh/golden",
        |  "last-sequence-number": 0,
        |  "last-updated-ms": 1602638573590,
        |  "last-column-id": 2,
        |  "current-schema-id": 0,
        |  "schemas": [{
        |    "type": "struct", "schema-id": 0,
        |    "fields": [
        |      {"id": 1, "name": "a", "required": false, "type": "int"},
        |      {"id": 2, "name": "b", "required": false, "type": "string"}
        |    ]}],
        |  "default-spec-id": 0,
        |  "partition-specs": [{"spec-id": 0, "fields": []}],
        |  "last-partition-id": 999,
        |  "default-sort-order-id": 0,
        |  "sort-orders": [{"order-id": 0, "fields": []}],
        |  "properties": {},
        |  "snapshots": [],
        |  "snapshot-log": [],
        |  "metadata-log": []
        |}""".stripMargin
    val m = MetadataJson.read(json)
    assert(m.formatVersion == 2)
    assert(m.tableUuid == "9c12d441-03fe-4693-9a96-a0705ddf69c1")
    assert(m.currentSchema.fields.map(f => (f.id, f.name, f.fieldType)) ==
      Seq((1, "a", IInt), (2, "b", IString)))
    assert(m.currentSnapshot.isEmpty)
    assert(m.defaultPartitionSpec.fields.isEmpty)
  }

  test("format-version property drives creation and version-correct JSON") {
    val schema = Schema(0, Seq(NestedField(1, "a", IInt)))
    def create(props: Map[String, String]) = TableMetadata.create(
      "/tmp/wh/fv", schema, PartitionSpec.Unpartitioned, SortOrder.Unsorted, props)

    // v1: legacy singular schema/partition-spec present; v2+/v3 fields absent
    val m1 = create(Map("format-version" -> "1"))
    assert(m1.formatVersion == 1)
    assert(!m1.properties.contains("format-version")) // creation directive, not a property
    val j1 = MetadataJson.write(m1)
    assert(j1.contains("\"schema\"") && j1.contains("\"partition-spec\""))
    assert(!j1.contains("\"last-sequence-number\"") && !j1.contains("\"next-row-id\""))
    assert(MetadataJson.read(j1).formatVersion == 1)

    // v2 (default): sequence numbers, no row lineage
    val m2 = create(Map.empty)
    assert(m2.formatVersion == 2)
    val j2 = MetadataJson.write(m2)
    assert(j2.contains("\"last-sequence-number\"") && !j2.contains("\"next-row-id\""))
    assert(MetadataJson.read(j2) == m2)

    // v3: row lineage field present and round-trips
    val m3 = create(Map("format-version" -> "3"))
    assert(m3.formatVersion == 3)
    val j3 = MetadataJson.write(m3)
    assert(j3.contains("\"next-row-id\""))
    assert(MetadataJson.read(j3) == m3)

    // invalid values rejected
    intercept[InvalidDataError](create(Map("format-version" -> "4")))
    intercept[InvalidDataError](create(Map("format-version" -> "x")))
  }
}
