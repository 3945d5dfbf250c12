package graft

import graft.catalog.{Catalog, MemoryCatalog, RestCatalog, RestCatalogServer, TableIdent}
import graft.types._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Catalog/namespace DDL behavior and error-class parity with the reference
 * suite (`/root/reference/test/catalog_test.rb`, `test/namespace_test.rb`),
 * parameterized over backends like the reference's `CATALOG` env matrix
 * (`test/test_helper.rb:26-59`): each backend subclass runs the same
 * behavioral contract.
 */
trait CatalogBehavior { this: AnyFunSuite =>

  /** A FRESH catalog with an empty store. */
  def cat(): Catalog

  protected def schema = Schema(0, Seq(
    NestedField(1, "a", IInt, required = false),
    NestedField(2, "b", IString, required = false)))

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

  test("list tables in default namespace") {
    val c = cat()
    c.createTable("t_one", schema)
    c.createTable("t_two", schema)
    assert(c.listTables().map(_.last).sorted == Seq("t_one", "t_two"))
  }
}

/** The reference test suite's default backend (in-process map). */
class CatalogSpec extends AnyFunSuite with CatalogBehavior {
  def cat(): Catalog = new MemoryCatalog()

  test("identifier resolution: dotted strings split, dotted parts rejected") {
    assert(TableIdent.parse("a.b.t", Seq("default")) ==
      TableIdent(Seq("a", "b"), "t"))
    assert(TableIdent.parse("t", Seq("default")) == TableIdent(Seq("default"), "t"))
    assertThrows[InvalidDataError](TableIdent.of(Seq("a.b", "t")))
  }
}

/** Same behavioral contract over the REST backend + in-process fixture
  * (reference: REST backend run against `apache/iceberg-rest-fixture` in
  * CI, `.github/workflows/build.yml:5-31`). */
class RestCatalogSpec extends AnyFunSuite with CatalogBehavior
    with org.scalatest.BeforeAndAfterAll {
  private val servers = scala.collection.mutable.ArrayBuffer[RestCatalogServer]()

  def cat(): Catalog = {
    val s = new RestCatalogServer().start()
    servers += s
    new RestCatalog(s.uri)
  }

  override def afterAll(): Unit = servers.foreach(_.stop())

  test("table read/write round-trips through the REST commit protocol") {
    val spark = TestSpark.spark
    import spark.implicits._
    val c = cat()
    val t = c.createTable("kv", schema)
    t.append(Seq((1, "one"), (2, "two")).toDF("a", "b"))
    t.append(Seq((3, "three")).toDF("a", "b"))
    assert(t.toDF(spark).orderBy("a").collect().map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "one"), (2, "two"), (3, "three")))
    assert(t.snapshots.size == 2)
    // reload through the catalog sees the committed state
    assert(c.loadTable("kv").toDF(spark).count() == 3)
  }

  test("REST error conformance: status + payload shape map to the exact error classes") {
    val s = new RestCatalogServer().start()
    servers += s
    val c = new RestCatalog(s.uri)

    // ---- client-side: each spec error type raises the reference's class
    assertThrows[NoSuchTableError](c.loadTable("nope"))            // 404
    assertThrows[NoSuchTableError](c.dropTable("nope"))            // 404
    assertThrows[NoSuchNamespaceError](c.namespaceProperties(Seq("ghost"))) // 404
    assertThrows[NoSuchNamespaceError](c.dropNamespace(Seq("ghost")))       // 404
    c.createTable("dup", schema)
    assertThrows[TableAlreadyExistsError](c.createTable("dup", schema))     // 409
    c.createNamespace(Seq("already"))
    assertThrows[NamespaceAlreadyExistsError](c.createNamespace(Seq("already"))) // 409
    // non-empty namespace drop: base-class error with the same message the
    // local backends produce (test/catalog_test.rb pins this message family)
    val e = intercept[GraftError](c.dropNamespace(Seq("default")))
    assert(e.getClass == classOf[GraftError] &&
      e.getMessage.contains("Namespace is not empty"), e.getMessage)

    // ---- wire-level: the published spec's error model — HTTP status, and a
    // payload of {"error": {message, type, code}} with code echoing status
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val http = java.net.http.HttpClient.newHttpClient()
    def get(path: String): (Int, JValue) = {
      val r = http.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(s"${s.uri}/v1/$path"))
          .GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      (r.statusCode(), JsonMethods.parse(r.body()))
    }
    val (nsCode, nsBody) = get("namespaces/ghost")
    assert(nsCode == 404)
    assert((nsBody \ "error" \ "type") == JString("NoSuchNamespaceException"))
    assert((nsBody \ "error" \ "code") == JInt(404))
    assert((nsBody \ "error" \ "message").isInstanceOf[JString])
    val (tCode, tBody) = get("namespaces/default/tables/nope")
    assert(tCode == 404)
    assert((tBody \ "error" \ "type") == JString("NoSuchTableException"))
    assert((tBody \ "error" \ "code") == JInt(404))

    // conflict wire shape: re-creating "dup" must be 409 + TableAlreadyExists
    val createBody = """{"name":"dup","schema":{"type":"struct","schema-id":0,"fields":[]}}"""
    val r = http.send(
      java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"${s.uri}/v1/namespaces/default/tables"))
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(createBody)).build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    assert(r.statusCode() == 409, r.body())
    val conflict = JsonMethods.parse(r.body())
    assert((conflict \ "error" \ "type") == JString("TableAlreadyExistsException"))
    assert((conflict \ "error" \ "code") == JInt(409))
  }

  test("stale handle conflicts (409 → CommitConflictError) and retries") {
    val spark = TestSpark.spark
    import spark.implicits._
    val c = cat()
    c.createTable("race", schema)
    val h1 = c.loadTable("race")
    val h2 = c.loadTable("race") // both handles pin the same base version
    h1.append(Seq((1, "x")).toDF("a", "b"))
    // h2's base is stale now; append must refresh-and-retry internally
    h2.append(Seq((2, "y")).toDF("a", "b"))
    assert(c.loadTable("race").toDF(spark).count() == 2)
  }
}
