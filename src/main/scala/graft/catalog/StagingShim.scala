package graft.catalog

import graft.GraftError
import graft.meta.TableMetadata

/**
 * The catalog a STAGED table commits into: an in-memory metadata pointer
 * with the same CAS contract as the real backends, so the whole write
 * path (append, fast-append retry, rewrite commits) runs unchanged while
 * nothing is published. `commitStagedChanges` then swaps the accumulated
 * metadata into the real catalog in ONE `commitTable` CAS — the atomic
 * half of `CREATE/REPLACE TABLE … AS SELECT`.
 */
private[graft] final class StagingShim(backing: Catalog,
                                       @volatile private var staged: TableMetadata)
  extends Catalog {

  def current: TableMetadata = staged

  override def name: String = s"${backing.name}-staging"
  override def defaultNamespace: Seq[String] = backing.defaultNamespace

  private[graft] override def commitTable(ident: TableIdent, base: TableMetadata,
                                          updated: TableMetadata): TableMetadata =
    synchronized {
      if (CatalogUtil.versionFingerprint(staged) != CatalogUtil.versionFingerprint(base))
        throw new graft.CommitConflictError(s"concurrent commit to staged $ident")
      staged = updated
      updated
    }

  private[graft] override def currentMetadata(ident: TableIdent): TableMetadata = staged

  private def notStaged(): Nothing =
    throw new GraftError("a staged table's catalog only accepts commits")

  override def listNamespaces(parent: Option[Seq[String]]): Seq[Seq[String]] = notStaged()
  override def createNamespace(ns: Seq[String], properties: Map[String, String],
                               ifNotExists: Boolean): Unit = notStaged()
  override def namespaceExists(ns: Seq[String]): Boolean = notStaged()
  override def namespaceProperties(ns: Seq[String]): Map[String, String] = notStaged()
  override def updateNamespace(ns: Seq[String], properties: Map[String, String]): Unit = notStaged()
  override def dropNamespace(ns: Seq[String], ifExists: Boolean): Unit = notStaged()
  override def listTables(ns: Option[Seq[String]]): Seq[Seq[String]] = notStaged()
  override def createTable(name: String, schema: graft.types.Schema,
                           location: Option[String],
                           partitionSpec: graft.meta.PartitionSpec,
                           sortOrder: graft.meta.SortOrder,
                           properties: Map[String, String]): graft.table.Table = notStaged()
  override def loadTable(name: String): graft.table.Table = notStaged()
  override def dropTable(name: String, ifExists: Boolean): Unit = notStaged()
  override def purgeTable(name: String): Unit = notStaged()
  override def tableExists(name: String): Boolean = notStaged()
  override def renameTable(oldName: String, newName: String): Unit = notStaged()
  override def registerTable(name: String, metadataLocation: String): graft.table.Table = notStaged()
}
