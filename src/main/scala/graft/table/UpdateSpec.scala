package graft.table

import graft._
import graft.meta.{PartitionField, PartitionSpec}
import graft.transforms.{Transform, UnknownTransform}

/**
 * Partition-spec evolution builder. Iceberg's headline scale feature: the
 * partition layout can change WITHOUT rewriting data — each manifest
 * records its spec id (the reference surfaces the resulting multi-spec
 * metadata via `table.partition_specs` / `partition_spec_by_id`,
 * `lib/iceberg/table.rb:63-77`), old files keep their old layout, new
 * writes use the new one, and the scan prunes each manifest under its own
 * spec. Commit is metadata-only: evolving a 100 TB table's partitioning
 * costs one metadata CAS, and scans over mixed eras prune both layouts.
 *
 * Rules: added fields take fresh partition-field ids (never reused);
 * removing a field just drops it from the new spec (v2 semantics); source
 * columns resolve against the CURRENT schema at commit time.
 */
final class UpdateSpec private[table] (table: Table) {
  import UpdateSpec._

  private val ops = scala.collection.mutable.ArrayBuffer[Op]()

  /** Partition by `transform(sourceColumn)`. `name` defaults to the
    * Iceberg convention: the source name for identity, else
    * `source_transform` ("ts_day", "id_bucket"). */
  def addField(sourceColumn: String, transform: String = "identity",
               name: Option[String] = None): UpdateSpec = {
    ops += AddField(sourceColumn, transform, name); this
  }

  /** Remove the partition field named `name` from the default spec. */
  def removeField(name: String): UpdateSpec = {
    ops += RemoveField(name); this
  }

  def commit(): Unit = {
    require(ops.nonEmpty, "updateSpec: no changes staged")
    table.commitSpecUpdate { base =>
      val schema = base.currentSchema
      var fields = base.defaultPartitionSpec.fields
      var nextId = math.max(base.lastPartitionId, PartitionSpec.FirstFieldId - 1)

      ops.foreach {
        case RemoveField(name) =>
          if (!fields.exists(_.name == name))
            throw new InvalidDataError(s"no partition field named: $name")
          fields = fields.filterNot(_.name == name)

        case AddField(source, transformStr, nameOpt) =>
          val f = schema.fieldByName(source).getOrElse(
            throw new InvalidDataError(s"no such column: $source"))
          val transform = Transform.parse(transformStr)
          if (!applicable(transform, f.fieldType))
            throw new InvalidDataError(
              s"transform $transformStr cannot apply to ${f.fieldType} column $source")
          val name = nameOpt.getOrElse(defaultName(source, transformStr))
          if (fields.exists(_.name == name))
            throw new InvalidDataError(s"partition field already exists: $name")
          if (fields.exists(pf => pf.sourceId == f.id && pf.transform == transformStr))
            throw new InvalidDataError(
              s"duplicate partition field: $transformStr($source) already in spec")
          nextId += 1
          fields = fields :+ PartitionField(f.id, nextId, name, transformStr)
      }
      (fields, nextId)
    }
  }
}

private[graft] object UpdateSpec {
  private sealed trait Op
  private final case class AddField(source: String, transform: String,
                                    name: Option[String]) extends Op
  private final case class RemoveField(name: String) extends Op

  def defaultName(source: String, transformStr: String): String =
    Transform.parse(transformStr) match {
      case graft.transforms.IdentityTransform => source
      case graft.transforms.BucketTransform(_) => s"${source}_bucket"
      case graft.transforms.TruncateTransform(_) => s"${source}_trunc"
      case t => s"${source}_${t.toString.toLowerCase}"
    }

  /** Spec type-applicability table for each transform. */
  import graft.transforms._
  import graft.types._
  private def applicable(t: Transform, ft: IType): Boolean = t match {
    case IdentityTransform | VoidTransform => true
    case BucketTransform(_) => ft match {
      case IInt | ILong | IDate | ITime | ITimestamp | ITimestampTz |
           ITimestampNano | ITimestampTzNano | IString | IUuid | IBinary |
           IFixed(_) | IDecimal(_, _) => true
      case _ => false
    }
    case TruncateTransform(_) => ft match {
      case IInt | ILong | IString | IBinary | IDecimal(_, _) => true
      case _ => false
    }
    case YearTransform | MonthTransform | DayTransform => ft match {
      case IDate | ITimestamp | ITimestampTz | ITimestampNano | ITimestampTzNano => true
      case _ => false
    }
    case HourTransform => ft match {
      case ITimestamp | ITimestampTz | ITimestampNano | ITimestampTzNano => true
      case _ => false
    }
    case UnknownTransform(_) => false
  }
}
