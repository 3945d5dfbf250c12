package graft

import graft.catalog.{MemoryCatalog, TableIdent}
import graft.types._
import org.scalatest.funsuite.AnyFunSuite

/** Catalog/namespace DDL behavior and error-class parity with the reference
  * suite (`/root/reference/test/catalog_test.rb`, `test/namespace_test.rb`). */
class CatalogSpec extends AnyFunSuite {

  private def schema = Schema(0, Seq(
    NestedField(1, "a", IInt, required = false),
    NestedField(2, "b", IString, required = false)))

  private def cat() = new MemoryCatalog()

  test("load/drop missing table raises NoSuchTableError") {
    val c = cat()
    assertThrows[NoSuchTableError](c.loadTable("events"))
    assertThrows[NoSuchTableError](c.dropTable("events"))
    c.dropTable("events", ifExists = true) // soft
  }

  test("create duplicate table raises TableAlreadyExistsError") {
    val c = cat()
    c.createTable("events", schema)
    assertThrows[TableAlreadyExistsError](c.createTable("events", schema))
  }

  test("namespace create/exists/properties/update/drop") {
    val c = cat()
    c.createNamespace(Seq("ns1"), Map("k" -> "v"))
    assert(c.namespaceExists(Seq("ns1")))
    assert(c.namespaceProperties(Seq("ns1")) == Map("k" -> "v"))
    c.updateNamespace(Seq("ns1"), Map("k2" -> "v2"))
    assert(c.namespaceProperties(Seq("ns1")) == Map("k2" -> "v2"))
    assertThrows[NamespaceAlreadyExistsError](c.createNamespace(Seq("ns1")))
    c.createNamespace(Seq("ns1"), ifNotExists = true) // soft
    c.dropNamespace(Seq("ns1"))
    assert(!c.namespaceExists(Seq("ns1")))
    assertThrows[NoSuchNamespaceError](c.dropNamespace(Seq("ns1")))
    c.dropNamespace(Seq("ns1"), ifExists = true) // soft
    assertThrows[NoSuchNamespaceError](c.namespaceProperties(Seq("missing")))
  }

  test("nested namespaces list by parent") {
    val c = cat()
    c.createNamespace(Seq("outer"))
    c.createNamespace(Seq("outer", "inner"))
    assert(c.listNamespaces(Some(Seq("outer"))) == Seq(Seq("outer", "inner")))
    assert(c.listNamespaces().contains(Seq("outer")))
    // non-empty (has child namespace) → refuses drop
    assertThrows[GraftError](c.dropNamespace(Seq("outer")))
  }

  test("drop non-empty namespace (has table) raises") {
    val c = cat()
    c.createNamespace(Seq("ns2"))
    c.createTable("ns2.events", schema)
    val e = intercept[GraftError](c.dropNamespace(Seq("ns2")))
    assert(e.getMessage.contains("not empty"))
  }

  test("table_exists is false (not an error) on missing namespace") {
    val c = cat()
    assert(!c.tableExists("nope.events"))
  }

  test("rename table moves the metadata pointer") {
    val c = cat()
    c.createTable("events", schema)
    c.renameTable("events", "events2")
    assert(!c.tableExists("events") && c.tableExists("events2"))
    assertThrows[NoSuchTableError](c.renameTable("events", "events3"))
    c.createTable("events", schema)
    assertThrows[TableAlreadyExistsError](c.renameTable("events", "events2"))
  }

  test("register_table adopts an existing metadata.json; missing file raises") {
    val c = cat()
    val t = c.createTable("events", schema)
    // locate the created table's metadata by writing it out like Hadoop does
    assertThrows[NoSuchTableError](c.registerTable("adopted", "/nonexistent/metadata.json"))
    // round-trip through a real metadata file
    val dir = java.nio.file.Files.createTempDirectory("graft-reg")
    val f = dir.resolve("v1.metadata.json")
    java.nio.file.Files.writeString(f, graft.meta.MetadataJson.write(t.metadata))
    val adopted = c.registerTable("adopted", f.toString)
    assert(adopted.currentSchema.fields.map(_.name) == Seq("a", "b"))
    assert(adopted.uuid == t.uuid)
  }

  test("purge_table removes table and its files") {
    val c = cat()
    val t = c.createTable("events", schema)
    val loc = new java.io.File(new java.net.URI("file://" + t.location).getPath)
    c.purgeTable("events")
    assert(!c.tableExists("events"))
    assert(!loc.exists())
  }

  test("identifier resolution: dotted strings split, dotted parts rejected") {
    assert(TableIdent.parse("a.b.t", Seq("default")) ==
      TableIdent(Seq("a", "b"), "t"))
    assert(TableIdent.parse("t", Seq("default")) == TableIdent(Seq("default"), "t"))
    assertThrows[InvalidDataError](TableIdent.of(Seq("a.b", "t")))
  }
}
