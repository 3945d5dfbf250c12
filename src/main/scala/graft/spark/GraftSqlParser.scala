package graft.spark

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/**
 * Partition-evolution DDL that Spark's grammar lacks, matching the
 * Iceberg-extensions surface:
 *
 * {{{
 * ALTER TABLE t ADD PARTITION FIELD <col | bucket(N, col) | truncate(W, col)
 *                                   | year(col) | month(col) | day(col) | hour(col)>
 *               [AS <name>]
 * ALTER TABLE t DROP PARTITION FIELD <field-name | same transform forms>
 * ALTER TABLE t WRITE ORDERED BY c1 [ASC|DESC] [NULLS FIRST|LAST], c2 ...
 * ALTER TABLE t WRITE UNORDERED
 * ALTER TABLE t CREATE BRANCH b [AS OF VERSION <snapshot-id>]
 * ALTER TABLE t CREATE TAG g [AS OF VERSION <snapshot-id>]
 * ALTER TABLE t DROP BRANCH b  |  ALTER TABLE t DROP TAG g
 * }}}
 *
 * A tiny delegating parser: two anchored regexes decide whether the
 * statement is ours; everything else — including every other ALTER TABLE
 * form — goes verbatim to Spark's parser. The produced commands carry the
 * raw identifier; catalog resolution happens in the planner strategy
 * where the session's CatalogManager is at hand.
 */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.parsePartitionDdl(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType = delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType = delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {
  // identifiers: unquoted dotted parts or `backquoted` segments
  private val Ident = """((?:[\w]+|`[^`]+`)(?:\.(?:[\w]+|`[^`]+`))*)"""
  private val AddRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+ADD\s+PARTITION\s+FIELD\s+(.+?)(?:\s+AS\s+([\w]+))?\s*;?\s*$""").r
  private val DropRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+DROP\s+PARTITION\s+FIELD\s+(.+?)\s*;?\s*$""").r
  private val OrderedRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+WRITE\s+ORDERED\s+BY\s+(.+?)\s*;?\s*$""").r
  private val UnorderedRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+""" + Ident + """\s+WRITE\s+UNORDERED\s*;?\s*$""").r
  private val OrderItemRe =
    """(?i)^([\w]+)(?:\s+(ASC|DESC))?(?:\s+NULLS\s+(FIRST|LAST))?$""".r
  private val CreateRefRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+CREATE\s+(BRANCH|TAG)\s+([\w]+)(?:\s+AS\s+OF\s+VERSION\s+(\d+))?\s*;?\s*$""").r
  private val DropRefRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+DROP\s+(BRANCH|TAG)\s+([\w]+)\s*;?\s*$""").r

  private val BucketRe = """(?i)^bucket\s*\(\s*(\d+)\s*,\s*([\w]+)\s*\)$""".r
  private val TruncateRe = """(?i)^truncate\s*\(\s*(\d+)\s*,\s*([\w]+)\s*\)$""".r
  private val TimeRe = """(?i)^(year|month|day|hour)\s*\(\s*([\w]+)\s*\)$""".r
  private val BareRe = """^([\w]+)$""".r

  /** SQL transform form → (source column, graft transform string). */
  private[spark] def parseTransform(s: String): Option[(String, String)] = s.trim match {
    case BucketRe(n, col) => Some((col, s"bucket[$n]"))
    case TruncateRe(w, col) => Some((col, s"truncate[$w]"))
    case TimeRe(unit, col) => Some((col, unit.toLowerCase))
    case BareRe(col) => Some((col, "identity"))
    case _ => None
  }

  private def identParts(raw: String): Seq[String] =
    raw.split('.').toSeq.map(p => if (p.startsWith("`")) p.substring(1, p.length - 1) else p)

  private[graft] def parsePartitionDdl(sqlText: String): Option[LogicalPlan] = sqlText match {
    case AddRe(ident, transform, name) =>
      parseTransform(transform).map { case (src, t) =>
        GraftAddPartitionFieldCommand(identParts(ident), src, t, Option(name))
      }
    case DropRe(ident, what) =>
      // a transform form maps to its default field name; else a field name
      val fieldName = parseTransform(what) match {
        case Some((src, t)) if t != "identity" =>
          graft.table.UpdateSpec.defaultName(src, t)
        case Some((src, _)) => src // identity: field name == source name
        case None => what.trim
      }
      Some(GraftDropPartitionFieldCommand(identParts(ident), fieldName))
    case OrderedRe(ident, items) =>
      val parsed = items.split(',').toSeq.map(_.trim).map {
        case OrderItemRe(c, dir, nulls) =>
          Some((c, Option(dir).map(_.toLowerCase).getOrElse("asc"),
            Option(nulls).map(n => s"nulls-${n.toLowerCase}")))
        case _ => None // malformed item: not ours — let Spark's parser error
      }
      if (parsed.exists(_.isEmpty)) None
      else Some(GraftWriteOrderedCommand(identParts(ident), parsed.flatten))
    case UnorderedRe(ident) =>
      Some(GraftWriteOrderedCommand(identParts(ident), Nil))
    case CreateRefRe(ident, kind, name, version) =>
      Some(GraftCreateRefCommand(identParts(ident), kind.toLowerCase, name,
        Option(version).map(_.toLong)))
    case DropRefRe(ident, kind, name) =>
      Some(GraftDropRefCommand(identParts(ident), kind.toLowerCase, name))
    case _ => None
  }
}
