package graft.spark

import graft.InvalidDataError
import graft.meta.{PartitionField, PartitionSpec}
import graft.types.Schema
import org.apache.spark.sql.connector.expressions.{Expressions, Literal, NamedReference, Transform}

/**
 * Bridges DSv2 partition [[Transform]]s (`PARTITIONED BY (bucket(4, id),
 * days(ts))`) and graft's spec model ([[PartitionSpec]], SURVEY.md §2.5).
 * Field names follow the Iceberg defaults (`col`, `col_bucket`,
 * `col_trunc`, `col_year`…); transform strings are graft's canonical
 * `identity` / `bucket[N]` / `truncate[W]` / `year|month|day|hour`.
 */
object TransformBridge {

  def toGraftSpec(transforms: Array[Transform], schema: Schema): PartitionSpec = {
    if (transforms.isEmpty) return PartitionSpec.Unpartitioned
    val fields = transforms.toSeq.zipWithIndex.map { case (t, i) =>
      val colName = singleColumn(t)
      val src = schema.fields.find(_.name == colName)
        .orElse(schema.fields.find(_.name.equalsIgnoreCase(colName)))
        .getOrElse(throw new InvalidDataError(
          s"partition transform references unknown column: $colName"))
      val (graftName, fieldName) = t.name() match {
        case "identity" => ("identity", src.name)
        case "bucket" => (s"bucket[${intArg(t)}]", s"${src.name}_bucket")
        case "truncate" => (s"truncate[${intArg(t)}]", s"${src.name}_trunc")
        case "years" | "year" => ("year", s"${src.name}_year")
        case "months" | "month" => ("month", s"${src.name}_month")
        case "days" | "day" => ("day", s"${src.name}_day")
        case "hours" | "hour" => ("hour", s"${src.name}_hour")
        case other => throw new InvalidDataError(s"unsupported partition transform: $other")
      }
      PartitionField(src.id, PartitionSpec.FirstFieldId + i, fieldName, graftName)
    }
    PartitionSpec(0, fields)
  }

  def toSparkTransforms(spec: PartitionSpec, schema: Schema): Array[Transform] = {
    val Bucket = """bucket\[(\d+)\]""".r
    val Truncate = """truncate\[(\d+)\]""".r
    spec.fields.flatMap { f =>
      schema.fields.find(_.id == f.sourceId).map(_.name).map { colName =>
        f.transform match {
          case "identity" => Expressions.identity(colName)
          case Bucket(n) => Expressions.bucket(n.toInt, colName)
          case Truncate(w) =>
            Expressions.apply("truncate",
              Expressions.literal(Integer.valueOf(w.toInt)), Expressions.column(colName))
          case "year" => Expressions.years(colName)
          case "month" => Expressions.months(colName)
          case "day" => Expressions.days(colName)
          case "hour" => Expressions.hours(colName)
          case other => Expressions.apply(other, Expressions.column(colName))
        }
      }
    }.toArray
  }

  /** The single column a transform applies to; nested refs rejected. */
  private def singleColumn(t: Transform): String = {
    val refs = t.references()
    if (refs.length != 1)
      throw new InvalidDataError(s"partition transform must reference one column: $t")
    val parts = refs(0).fieldNames()
    if (parts.length != 1)
      throw new InvalidDataError(s"nested partition columns are not supported: ${parts.mkString(".")}")
    parts(0)
  }

  /** The single int literal argument (bucket count / truncate width),
    * whichever side of the column it was written on. */
  private def intArg(t: Transform): Int =
    t.arguments().collectFirst {
      case l: Literal[_] if !l.isInstanceOf[NamedReference] => l.value() match {
        case i: java.lang.Integer => i.intValue()
        case l2: java.lang.Long => l2.intValue()
        case s: String => s.toInt
        case other => throw new InvalidDataError(s"bad transform argument: $other")
      }
    }.getOrElse(throw new InvalidDataError(s"transform $t needs an integer argument"))
}
