package graft.table

import graft._
import graft.types._

/**
 * Schema-evolution builder (engine capability the reference consumes but
 * does not author: its interop test evolves schemas through PyIceberg —
 * `test/support/schema_changes.py` renames `a`→`c` and drops `b`, then
 * appends under the new schema — and `lib/iceberg/table.rb:45-61` exposes
 * the multi-schema metadata this produces). Iceberg evolution rules:
 *
 *  - field ids are never reused; added columns take fresh ids
 *  - rename keeps the id, so existing data files resolve by id (the read
 *    side projects per-manifest write schema → current schema BY FIELD ID)
 *  - type changes are widening-only (int→long, float→double, decimal
 *    precision growth): every written value must remain readable
 *  - a required column can only be added with a default (old files have no
 *    value for it; the default is what their rows read back as)
 *
 * All ops stage against the CURRENT schema and re-validate + re-apply on
 * commit conflict (names are re-resolved against the winner's schema).
 * Commit is metadata-only: O(1) cost regardless of table size — no data
 * file is touched, which is what makes evolution viable at 100 TB.
 */
final class UpdateSchema private[table] (table: Table) {
  import UpdateSchema._

  private val ops = scala.collection.mutable.ArrayBuffer[Op]()

  /** Add an optional column (fresh field id; old files read it as null). */
  def addColumn(name: String, tpe: IType, doc: Option[String] = None): UpdateSchema = {
    ops += AddColumn(name, tpe, required = false, doc, None); this
  }

  /** Add a required column with a default: old files read `default`
    * (initial-default), writers omitting the column write `default`
    * (write-default). */
  def addRequiredColumn(name: String, tpe: IType, default: Any,
                        doc: Option[String] = None): UpdateSchema = {
    ops += AddColumn(name, tpe, required = true, doc, Some(default)); this
  }

  /** Rename, keeping the field id (old data files still resolve). */
  def renameColumn(from: String, to: String): UpdateSchema = {
    ops += RenameColumn(from, to); this
  }

  /** Drop a column. Its id is retired, never reused; data files keep the
    * physical column, readers stop projecting it. */
  def deleteColumn(name: String): UpdateSchema = {
    ops += DeleteColumn(name); this
  }

  /** Widen a column's type (int→long, float→double, decimal(p,s)→(p',s)
    * with p'≥p). Narrowing throws: written values must stay readable. */
  def updateColumnType(name: String, to: IType): UpdateSchema = {
    ops += UpdateType(name, to); this
  }

  /** Drop the NOT NULL constraint. (The reverse is not allowed: existing
    * rows may hold nulls.) */
  def makeColumnOptional(name: String): UpdateSchema = {
    ops += MakeOptional(name); this
  }

  def updateColumnDoc(name: String, doc: Option[String]): UpdateSchema = {
    ops += UpdateDoc(name, doc); this
  }

  /** Validate against the table's current schema and commit a new schema
    * version (CAS through the catalog; ops re-apply on conflict). */
  def commit(): Unit = {
    require(ops.nonEmpty, "updateSchema: no changes staged")
    table.commitSchemaUpdate { base =>
      val cur = base.currentSchema
      var fields = cur.fields
      var identifiers = cur.identifierFieldIds
      var nextId = math.max(base.lastColumnId, cur.highestFieldId)

      def idx(name: String): Int = {
        val i = fields.indexWhere(_.name == name)
        if (i < 0) throw new InvalidDataError(s"no such column: $name")
        i
      }

      ops.foreach {
        case AddColumn(name, tpe, required, doc, default) =>
          if (fields.exists(_.name == name))
            throw new InvalidDataError(s"column already exists: $name")
          nextId += 1
          fields = fields :+ NestedField(nextId, name, tpe, required, doc,
            initialDefault = default, writeDefault = default)

        case RenameColumn(from, to) =>
          if (fields.exists(_.name == to))
            throw new InvalidDataError(s"column already exists: $to")
          val i = idx(from)
          fields = fields.updated(i, fields(i).copy(name = to))

        case DeleteColumn(name) =>
          val f = fields(idx(name))
          val referencing = base.partitionSpecs
            .filter(_.fields.exists(_.sourceId == f.id)).map(_.specId)
          if (referencing.nonEmpty)
            throw new InvalidDataError(
              s"cannot delete column $name: referenced by partition spec(s) ${referencing.mkString(", ")}")
          fields = fields.filterNot(_.id == f.id)
          identifiers = identifiers.filterNot(_ == f.id)

        case UpdateType(name, to) =>
          val i = idx(name)
          val from = fields(i).fieldType
          if (!UpdateSchema.isWidening(from, to))
            throw new InvalidDataError(s"cannot change $name from $from to $to (widening only)")
          fields = fields.updated(i, fields(i).copy(fieldType = to))

        case MakeOptional(name) =>
          val i = idx(name)
          fields = fields.updated(i, fields(i).copy(required = false))

        case UpdateDoc(name, doc) =>
          val i = idx(name)
          fields = fields.updated(i, fields(i).copy(doc = doc))
      }

      if (fields.isEmpty)
        throw new InvalidDataError("schema evolution would leave no columns")
      (Schema(0, fields, identifiers), nextId) // schemaId assigned at commit
    }
  }
}

private[table] object UpdateSchema {
  private sealed trait Op
  private final case class AddColumn(name: String, tpe: IType, required: Boolean,
                                     doc: Option[String], default: Option[Any]) extends Op
  private final case class RenameColumn(from: String, to: String) extends Op
  private final case class DeleteColumn(name: String) extends Op
  private final case class UpdateType(name: String, to: IType) extends Op
  private final case class MakeOptional(name: String) extends Op
  private final case class UpdateDoc(name: String, doc: Option[String]) extends Op

  /** Spec-allowed primitive type promotions. */
  def isWidening(from: IType, to: IType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (IInt, ILong) => true
    case (IFloat, IDouble) => true
    case (IDecimal(p1, s1), IDecimal(p2, s2)) => s1 == s2 && p2 >= p1
    case _ => false
  }
}
