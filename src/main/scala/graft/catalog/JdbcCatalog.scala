package graft.catalog

import graft._
import graft.meta._
import graft.table.Table
import graft.types.Schema
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import java.sql.{Connection, DriverManager, SQLException}

/**
 * SQL (JDBC) catalog backend (ref `ext/iceberg/src/catalog.rs:57`; the
 * reference tests it on sqlite, `test/test_helper.rb:26-59` — here embedded
 * Derby, the JDBC engine on the Spark classpath). Uses the Iceberg
 * JdbcCatalog's published schema: an `iceberg_tables` row per table holding
 * the current metadata pointer, and `iceberg_namespace_properties` rows per
 * namespace (with the `exists` marker property). Metadata JSON lives on the
 * filesystem next to the data; a commit is the classic pointer swap —
 * `UPDATE ... SET metadata_location = new WHERE metadata_location = old`,
 * with updateCount 1 as the atomic CAS gate, so any JDBC database with
 * atomic single-row updates gives safe optimistic concurrency.
 */
final class JdbcCatalog(
    val jdbcUri: String,
    val warehouse: String,
    val name: String = "jdbc",
    val defaultNamespace: Seq[String] = Seq("default"),
    val hadoopConf: Configuration = new Configuration()) extends Catalog {

  private val ExistsMarker = "exists"
  private val conn: Connection = DriverManager.getConnection(jdbcUri)
  private val lock = new Object

  initSchema()
  if (!namespaceExists(defaultNamespace)) createNamespace(defaultNamespace, ifNotExists = true)

  private def initSchema(): Unit = lock.synchronized {
    // 'table already exists' SQLStates across engines: Derby X0Y32,
    // Postgres 42P07, MySQL 42S01; unknown states fall back to probing the
    // table (reconnecting to an existing catalog must not throw).
    val duplicateStates = Set("X0Y32", "42P07", "42S01")
    def tableExists(name: String): Boolean =
      try {
        val rs = conn.getMetaData.getTables(null, null, null, Array("TABLE"))
        try {
          var found = false
          while (!found && rs.next()) found = rs.getString("TABLE_NAME").equalsIgnoreCase(name)
          found
        } finally rs.close()
      } catch { case _: SQLException => false }
    def createIgnoringExists(name: String, ddl: String): Unit =
      try { val st = conn.createStatement(); try st.execute(ddl) finally st.close() }
      catch {
        case e: SQLException if duplicateStates.contains(e.getSQLState) => ()
        case e: SQLException => if (!tableExists(name)) throw e
      }
    createIgnoringExists("iceberg_tables",
      """CREATE TABLE iceberg_tables (
        | catalog_name VARCHAR(255) NOT NULL,
        | table_namespace VARCHAR(255) NOT NULL,
        | table_name VARCHAR(255) NOT NULL,
        | metadata_location VARCHAR(5500),
        | previous_metadata_location VARCHAR(5500),
        | PRIMARY KEY (catalog_name, table_namespace, table_name))""".stripMargin)
    createIgnoringExists("iceberg_namespace_properties",
      """CREATE TABLE iceberg_namespace_properties (
        | catalog_name VARCHAR(255) NOT NULL,
        | namespace VARCHAR(255) NOT NULL,
        | property_key VARCHAR(255) NOT NULL,
        | property_value VARCHAR(1000),
        | PRIMARY KEY (catalog_name, namespace, property_key))""".stripMargin)
  }

  // ------------------------------------------------------------ sql helpers

  private def query[A](sql: String, params: Seq[String])(read: java.sql.ResultSet => A): Seq[A] =
    lock.synchronized {
      val ps = conn.prepareStatement(sql)
      try {
        params.zipWithIndex.foreach { case (p, i) => ps.setString(i + 1, p) }
        val rs = ps.executeQuery()
        val out = scala.collection.mutable.ArrayBuffer[A]()
        while (rs.next()) out += read(rs)
        out.toSeq
      } finally ps.close()
    }

  private def update(sql: String, params: Seq[String]): Int = lock.synchronized {
    val ps = conn.prepareStatement(sql)
    try {
      params.zipWithIndex.foreach { case (p, i) => ps.setString(i + 1, p) }
      ps.executeUpdate()
    } finally ps.close()
  }

  private def nsStr(ns: Seq[String]): String = ns.mkString(".")

  // ------------------------------------------------------------- namespaces

  def listNamespaces(parent: Option[Seq[String]] = None): Seq[Seq[String]] = {
    val all = query(
      "SELECT DISTINCT namespace FROM iceberg_namespace_properties WHERE catalog_name = ?",
      Seq(name))(_.getString(1)).map(_.split('.').toSeq)
    parent match {
      case None => all.filter(_.length == 1).sortBy(_.mkString("."))
      case Some(p) =>
        if (!namespaceExists(p))
          throw new NoSuchNamespaceError(s"Namespace does not exist: ${nsStr(p)}")
        all.filter(ns => ns.length == p.length + 1 && ns.startsWith(p))
          .sortBy(_.mkString("."))
    }
  }

  def createNamespace(ns: Seq[String], properties: Map[String, String] = Map.empty,
                      ifNotExists: Boolean = false): Unit = {
    if (namespaceExists(ns)) {
      if (!ifNotExists)
        throw new NamespaceAlreadyExistsError(s"Namespace already exists: ${nsStr(ns)}")
      return
    }
    (properties + (ExistsMarker -> "true")).foreach { case (k, v) =>
      update("INSERT INTO iceberg_namespace_properties VALUES (?, ?, ?, ?)",
        Seq(name, nsStr(ns), k, v))
    }
  }

  def namespaceExists(ns: Seq[String]): Boolean =
    query("SELECT 1 FROM iceberg_namespace_properties WHERE catalog_name = ? AND namespace = ? FETCH FIRST 1 ROWS ONLY",
      Seq(name, nsStr(ns)))(_ => 1).nonEmpty

  def namespaceProperties(ns: Seq[String]): Map[String, String] = {
    if (!namespaceExists(ns))
      throw new NoSuchNamespaceError(s"Namespace does not exist: ${nsStr(ns)}")
    query("SELECT property_key, property_value FROM iceberg_namespace_properties WHERE catalog_name = ? AND namespace = ?",
      Seq(name, nsStr(ns)))(rs => rs.getString(1) -> rs.getString(2))
      .toMap - ExistsMarker
  }

  def updateNamespace(ns: Seq[String], properties: Map[String, String]): Unit = {
    if (!namespaceExists(ns))
      throw new NoSuchNamespaceError(s"Namespace does not exist: ${nsStr(ns)}")
    update("DELETE FROM iceberg_namespace_properties WHERE catalog_name = ? AND namespace = ? AND property_key <> ?",
      Seq(name, nsStr(ns), ExistsMarker))
    properties.foreach { case (k, v) =>
      if (k != ExistsMarker)
        update("INSERT INTO iceberg_namespace_properties VALUES (?, ?, ?, ?)",
          Seq(name, nsStr(ns), k, v))
    }
  }

  def dropNamespace(ns: Seq[String], ifExists: Boolean = false): Unit = {
    if (!namespaceExists(ns)) {
      if (!ifExists)
        throw new NoSuchNamespaceError(s"Namespace does not exist: ${nsStr(ns)}")
      return
    }
    if (listTables(Some(ns)).nonEmpty || listNamespaces(Some(ns)).nonEmpty)
      throw new GraftError(s"Namespace is not empty: ${nsStr(ns)}")
    update("DELETE FROM iceberg_namespace_properties WHERE catalog_name = ? AND namespace = ?",
      Seq(name, nsStr(ns)))
  }

  // ----------------------------------------------------------------- tables

  def listTables(ns: Option[Seq[String]] = None): Seq[Seq[String]] = {
    val target = ns.getOrElse(defaultNamespace)
    if (!namespaceExists(target))
      throw new NoSuchNamespaceError(s"Namespace does not exist: ${nsStr(target)}")
    query("SELECT table_name FROM iceberg_tables WHERE catalog_name = ? AND table_namespace = ?",
      Seq(name, nsStr(target)))(_.getString(1))
      .map(t => target :+ t).sortBy(_.mkString("."))
  }

  private def pointerOf(ident: TableIdent): Option[String] =
    query("SELECT metadata_location FROM iceberg_tables WHERE catalog_name = ? AND table_namespace = ? AND table_name = ?",
      Seq(name, nsStr(ident.namespace), ident.name))(_.getString(1)).headOption

  private def metadataPath(location: String, version: Int): Path =
    new Path(new Path(location, "metadata"),
      f"$version%05d-${java.util.UUID.randomUUID()}.metadata.json")

  def createTable(tableName: String, schema: Schema,
                  location: Option[String] = None,
                  partitionSpec: PartitionSpec = PartitionSpec.Unpartitioned,
                  sortOrder: SortOrder = SortOrder.Unsorted,
                  properties: Map[String, String] = Map.empty): Table = {
    val ident = resolveIdent(tableName)
    if (!namespaceExists(ident.namespace))
      throw new NoSuchNamespaceError(s"Namespace does not exist: ${nsStr(ident.namespace)}")
    if (pointerOf(ident).isDefined)
      throw new TableAlreadyExistsError(s"Table already exists: $ident")
    CatalogUtil.validateSpec(schema, partitionSpec)
    val loc = location.getOrElse(
      (Seq(warehouse) ++ ident.namespace ++ Seq(ident.name)).mkString("/"))
    val meta = TableMetadata.create(loc, schema, partitionSpec, sortOrder, properties)
    val p = metadataPath(loc, 1)
    CatalogUtil.writeMetadataFile(p, meta, hadoopConf, overwrite = false)
    try update("INSERT INTO iceberg_tables VALUES (?, ?, ?, ?, NULL)",
      Seq(name, nsStr(ident.namespace), ident.name, p.toString))
    catch { case e: SQLException if e.getSQLState == "23505" => // PK violation: racer won
      throw new TableAlreadyExistsError(s"Table already exists: $ident")
    }
    new Table(Some(this), ident, meta, hadoopConf)
  }

  def loadTable(tableName: String): Table = {
    val ident = resolveIdent(tableName)
    new Table(Some(this), ident, currentMetadata(ident), hadoopConf)
  }

  def dropTable(tableName: String, ifExists: Boolean = false): Unit = {
    val ident = resolveIdent(tableName)
    val n = update("DELETE FROM iceberg_tables WHERE catalog_name = ? AND table_namespace = ? AND table_name = ?",
      Seq(name, nsStr(ident.namespace), ident.name))
    if (n == 0 && !ifExists)
      throw new NoSuchTableError(s"Table does not exist: $ident")
  }

  def purgeTable(tableName: String): Unit = {
    val ident = resolveIdent(tableName)
    val meta = currentMetadata(ident)
    dropTable(tableName)
    val p = new Path(meta.location)
    val fs = p.getFileSystem(hadoopConf)
    if (fs.exists(p)) fs.delete(p, true)
  }

  def tableExists(tableName: String): Boolean = {
    val ident = resolveIdent(tableName)
    namespaceExists(ident.namespace) && pointerOf(ident).isDefined
  }

  def renameTable(oldName: String, newName: String): Unit = {
    val oldIdent = resolveIdent(oldName)
    val newIdent = resolveIdent(newName)
    if (pointerOf(oldIdent).isEmpty)
      throw new NoSuchTableError(s"Table does not exist: $oldIdent")
    if (!namespaceExists(newIdent.namespace))
      throw new NoSuchNamespaceError(s"Namespace does not exist: ${nsStr(newIdent.namespace)}")
    if (pointerOf(newIdent).isDefined)
      throw new TableAlreadyExistsError(s"Table already exists: $newIdent")
    update("UPDATE iceberg_tables SET table_namespace = ?, table_name = ? WHERE catalog_name = ? AND table_namespace = ? AND table_name = ?",
      Seq(nsStr(newIdent.namespace), newIdent.name, name, nsStr(oldIdent.namespace), oldIdent.name))
  }

  def registerTable(tableName: String, metadataLocation: String): Table = {
    val ident = resolveIdent(tableName)
    if (!namespaceExists(ident.namespace))
      throw new NoSuchNamespaceError(s"Namespace does not exist: ${nsStr(ident.namespace)}")
    if (pointerOf(ident).isDefined)
      throw new TableAlreadyExistsError(s"Table already exists: $ident")
    val meta = CatalogUtil.readMetadataFile(metadataLocation, hadoopConf)
    update("INSERT INTO iceberg_tables VALUES (?, ?, ?, ?, NULL)",
      Seq(name, nsStr(ident.namespace), ident.name, metadataLocation))
    new Table(Some(this), ident, meta, hadoopConf)
  }

  // -------------------------------------------------------- commit protocol

  private[graft] override def supportsStagedPublish: Boolean = true
  private[graft] override def defaultTableLocation(ident: TableIdent): String =
    (Seq(warehouse) ++ ident.namespace ++ Seq(ident.name)).mkString("/")

  private[graft] def commitTable(ident: TableIdent, base: TableMetadata,
                                 updated: TableMetadata): TableMetadata = {
    val currentPtr = pointerOf(ident).getOrElse(
      throw new NoSuchTableError(s"Table does not exist: $ident"))
    val current = CatalogUtil.readMetadataFile(currentPtr, hadoopConf)
    if (CatalogUtil.versionFingerprint(current) != CatalogUtil.versionFingerprint(base))
      throw new CommitConflictError(s"concurrent commit to $ident")
    val withLog = updated.copy(metadataLog = updated.metadataLog :+
      MetadataLogEntry(System.currentTimeMillis(), currentPtr))
    val newPath = metadataPath(updated.location, withLog.metadataLog.length + 1)
    CatalogUtil.writeMetadataFile(newPath, withLog, hadoopConf, overwrite = false)
    // the CAS: exactly one row updated iff the pointer is still `currentPtr`
    val n = update(
      "UPDATE iceberg_tables SET metadata_location = ?, previous_metadata_location = ? WHERE catalog_name = ? AND table_namespace = ? AND table_name = ? AND metadata_location = ?",
      Seq(newPath.toString, currentPtr, name, nsStr(ident.namespace), ident.name, currentPtr))
    if (n != 1) {
      val fs = newPath.getFileSystem(hadoopConf)
      fs.delete(newPath, false) // orphaned attempt
      throw new CommitConflictError(s"concurrent commit to $ident")
    }
    withLog
  }

  private[graft] def currentMetadata(ident: TableIdent): TableMetadata = {
    val ptr = pointerOf(ident).getOrElse(
      throw new NoSuchTableError(s"Table does not exist: $ident"))
    CatalogUtil.readMetadataFile(ptr, hadoopConf)
  }

  def close(): Unit = lock.synchronized(conn.close())
}
