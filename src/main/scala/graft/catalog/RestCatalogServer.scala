package graft.catalog

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft._
import graft.meta.{MetadataJson, PartitionSpec, SortOrder}
import org.json4s._
import org.json4s.jackson.JsonMethods

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/**
 * In-process Iceberg-REST-style catalog server: the sandbox stand-in for
 * `apache/iceberg-rest-fixture`, which the reference's CI runs its REST
 * backend against on every push (`/root/reference/.github/workflows/
 * build.yml:5-31`). Serves the REST catalog spec's v1 routes (config,
 * namespaces, tables, rename, register, commit) over a [[MemoryCatalog]]
 * store, with the spec's error model (`{"error": {message, type, code}}`).
 *
 * Commit simplification (documented divergence): real servers apply an
 * update/requirement list; graft's writers produce whole replacement
 * metadata, so the commit body carries the full new metadata plus the
 * base-version fingerprint, and the server CAS-checks the fingerprint —
 * same optimistic-concurrency contract, one requirement type.
 */
final class RestCatalogServer(port: Int = 0,
    warehouse: String = java.nio.file.Files.createTempDirectory("graft-rest-wh").toString) {

  private val store = new MemoryCatalog("rest-store", warehouse)
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  def uri: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  def start(): RestCatalogServer = {
    server.createContext("/v1", (ex: HttpExchange) => handle(ex))
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    this
  }

  def stop(): Unit = server.stop(0)

  // ---------------------------------------------------------------- routing

  private val Sep = "\u001f" // spec: multipart namespace separator in URLs

  private def handle(ex: HttpExchange): Unit = {
    val method = ex.getRequestMethod
    val path = ex.getRequestURI.getPath.stripPrefix("/v1").stripPrefix("/")
    val segs = path.split('/').toList.filter(_.nonEmpty)
      .map(s => java.net.URLDecoder.decode(s, "UTF-8"))
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    try {
      (method, segs) match {
        case ("GET", List("config")) =>
          json(ex, 200, JObject("defaults" -> JObject(), "overrides" -> JObject()))

        case ("GET", List("namespaces")) =>
          val parent = Option(ex.getRequestURI.getQuery)
            .flatMap(_.split('&').find(_.startsWith("parent=")))
            .map(q => java.net.URLDecoder.decode(q.stripPrefix("parent="), "UTF-8"))
            .map(_.split(Sep).toSeq)
          val nss = store.listNamespaces(parent)
          json(ex, 200, JObject("namespaces" ->
            JArray(nss.toList.map(ns => JArray(ns.toList.map(JString(_)))))))

        case ("POST", List("namespaces")) =>
          val j = JsonMethods.parse(body)
          val ns = (j \ "namespace").asInstanceOf[JArray].arr.map(_.asInstanceOf[JString].s)
          store.createNamespace(ns, props(j \ "properties"))
          json(ex, 200, JObject(
            "namespace" -> JArray(ns.toList.map(JString(_))),
            "properties" -> toProps(store.namespaceProperties(ns))))

        case ("GET", List("namespaces", ns)) =>
          val parts = ns.split(Sep).toSeq
          json(ex, 200, JObject(
            "namespace" -> JArray(parts.toList.map(JString(_))),
            "properties" -> toProps(store.namespaceProperties(parts))))

        case ("HEAD", List("namespaces", ns)) =>
          if (store.namespaceExists(ns.split(Sep).toSeq)) respond(ex, 204, "")
          else error(ex, 404, "NoSuchNamespaceException", s"Namespace does not exist: $ns")

        case ("DELETE", List("namespaces", ns)) =>
          store.dropNamespace(ns.split(Sep).toSeq)
          respond(ex, 204, "")

        case ("POST", List("namespaces", ns, "properties")) =>
          val parts = ns.split(Sep).toSeq
          val j = JsonMethods.parse(body)
          val removals = (j \ "removals") match {
            case JArray(xs) => xs.collect { case JString(s) => s }
            case _ => Nil
          }
          val updates = props(j \ "updates")
          val merged = (store.namespaceProperties(parts) -- removals) ++ updates
          store.updateNamespace(parts, merged)
          json(ex, 200, JObject(
            "updated" -> JArray(updates.keys.toList.map(JString(_))),
            "removed" -> JArray(removals.toList.map(JString(_)))))

        case ("GET", List("namespaces", ns, "tables")) =>
          val tables = store.listTables(Some(ns.split(Sep).toSeq))
          json(ex, 200, JObject("identifiers" -> JArray(tables.toList.map(parts =>
            JObject("namespace" -> JArray(parts.init.toList.map(JString(_))),
              "name" -> JString(parts.last))))))

        case ("POST", List("namespaces", ns, "tables")) =>
          val j = JsonMethods.parse(body)
          val name = (j \ "name").asInstanceOf[JString].s
          val schema = MetadataJson.schemaFromJson(j \ "schema")
          val spec = (j \ "partition-spec") match {
            case JNothing | JNull => PartitionSpec.Unpartitioned
            case s => MetadataJson.specFromJson(s)
          }
          val order = (j \ "write-order") match {
            case JNothing | JNull => SortOrder.Unsorted
            case s => MetadataJson.sortOrderFromJson(s)
          }
          val location = (j \ "location") match {
            case JString(s) => Some(s); case _ => None
          }
          val ident = (ns.split(Sep).toSeq :+ name).mkString(".")
          val t = store.createTable(ident, schema, location, spec, order, props(j \ "properties"))
          loadResult(ex, t.metadata)

        case ("GET", List("namespaces", ns, "tables", t)) =>
          val meta = store.currentMetadata(
            TableIdent(ns.split(Sep).toSeq, t))
          loadResult(ex, meta)

        case ("HEAD", List("namespaces", ns, "tables", t)) =>
          if (store.tableExists((ns.split(Sep).toSeq :+ t).mkString(".")))
            respond(ex, 204, "")
          else error(ex, 404, "NoSuchTableException", s"Table does not exist: $ns.$t")

        case ("DELETE", List("namespaces", ns, "tables", t)) =>
          val purge = Option(ex.getRequestURI.getQuery).exists(_.contains("purgeRequested=true"))
          val ident = (ns.split(Sep).toSeq :+ t).mkString(".")
          if (purge) store.purgeTable(ident) else store.dropTable(ident)
          respond(ex, 204, "")

        case ("POST", List("namespaces", ns, "tables", t)) => // commit
          val j = JsonMethods.parse(body)
          val ident = TableIdent(ns.split(Sep).toSeq, t)
          val baseFp = (j \ "base-fingerprint").asInstanceOf[JString].s
          val updated = MetadataJson.fromJson(j \ "metadata")
          val current = store.currentMetadata(ident)
          if (CatalogUtil.versionFingerprint(current) != baseFp)
            throw new CommitConflictError(s"concurrent commit to $ident")
          val committed = store.commitTable(ident, current, updated)
          loadResult(ex, committed)

        case ("POST", List("namespaces", ns, "register")) =>
          val j = JsonMethods.parse(body)
          val name = (j \ "name").asInstanceOf[JString].s
          val loc = (j \ "metadata-location").asInstanceOf[JString].s
          val ident = (ns.split(Sep).toSeq :+ name).mkString(".")
          val t = store.registerTable(ident, loc)
          loadResult(ex, t.metadata)

        case ("POST", List("tables", "rename")) =>
          val j = JsonMethods.parse(body)
          def identOf(v: JValue): String = {
            val nsParts = (v \ "namespace").asInstanceOf[JArray].arr.map(_.asInstanceOf[JString].s)
            (nsParts :+ (v \ "name").asInstanceOf[JString].s).mkString(".")
          }
          store.renameTable(identOf(j \ "source"), identOf(j \ "destination"))
          respond(ex, 204, "")

        case _ =>
          error(ex, 404, "NotFoundException", s"no route: $method /v1/${segs.mkString("/")}")
      }
    } catch {
      case e: NoSuchTableError => error(ex, 404, "NoSuchTableException", e.getMessage)
      case e: NoSuchNamespaceError => error(ex, 404, "NoSuchNamespaceException", e.getMessage)
      case e: TableAlreadyExistsError => error(ex, 409, "TableAlreadyExistsException", e.getMessage)
      case e: NamespaceAlreadyExistsError =>
        error(ex, 409, "NamespaceAlreadyExistsException", e.getMessage)
      case e: CommitConflictError => error(ex, 409, "CommitFailedException", e.getMessage)
      case e: InvalidDataError => error(ex, 400, "BadRequestException", e.getMessage)
      case e: GraftError if e.getMessage != null && e.getMessage.contains("not empty") =>
        error(ex, 409, "NamespaceNotEmptyException", e.getMessage)
      case e: Exception => error(ex, 500, "InternalServerError", String.valueOf(e.getMessage))
    }
  }

  // ---------------------------------------------------------------- helpers

  private def props(j: JValue): Map[String, String] = j match {
    case JObject(fs) => fs.collect { case (k, JString(v)) => k -> v }.toMap
    case _ => Map.empty
  }
  private def toProps(m: Map[String, String]): JObject =
    JObject(m.toList.map { case (k, v) => k -> (JString(v): JValue) })

  private def loadResult(ex: HttpExchange, meta: graft.meta.TableMetadata): Unit =
    json(ex, 200, JObject(
      "metadata-location" -> JString(s"memory://${meta.tableUuid}"),
      "metadata" -> MetadataJson.toJson(meta)))

  private def json(ex: HttpExchange, code: Int, j: JValue): Unit =
    respond(ex, code, JsonMethods.compact(JsonMethods.render(j)))

  private def error(ex: HttpExchange, code: Int, typ: String, msg: String): Unit =
    json(ex, code, JObject("error" -> JObject(
      "message" -> JString(msg), "type" -> JString(typ), "code" -> JInt(code))))

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    // HEAD/204 must not carry a body
    if (bytes.isEmpty) ex.sendResponseHeaders(code, -1)
    else { ex.sendResponseHeaders(code, bytes.length); ex.getResponseBody.write(bytes) }
    ex.close()
  }
}
