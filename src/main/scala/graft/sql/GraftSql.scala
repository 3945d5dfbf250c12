package graft.sql

import graft._
import graft.catalog.Catalog
import graft.table.Result
import graft.types.{NestedField, Schema}
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.mutable

/**
 * The reference's SQL surface (`catalog.sql(query, params)`,
 * `lib/iceberg/catalog.rb:103-108` → `ext/iceberg/src/catalog.rs:443-508`)
 * re-expressed on Spark SQL: catalog tables are registered as temp views
 * (refreshed to the current snapshot on every call), Catalyst plays
 * DataFusion's role, and the reference's semantics are enforced at the
 * wrapper: single statement only, unique output column names, positional
 * `$1..$n` params, UPDATE/DELETE rejected (`test/sql_test.rb`).
 */
object GraftSql {

  /** View names created via CREATE VIEW, per (session, catalog) — these are
    * not clobbered by the per-call table-view refresh. */
  private val userViews = mutable.Map[(String, String), mutable.Set[String]]()

  def sql(catalog: Catalog, spark: SparkSession, query: String,
          params: Seq[Any] = Nil): Result = {
    val stmt = singleStatement(query)
    val bound = bindParams(stmt, params)
    val trimmed = bound.trim
    val head = trimmed.split("\\s+").headOption.map(_.toLowerCase).getOrElse("")

    head match {
      case "update" | "delete" =>
        throw new UnsupportedFeatureError(s"$head is not supported")
      case "create" => createStatement(catalog, spark, trimmed)
      case "insert" => insertStatement(catalog, spark, trimmed)
      case _ =>
        refreshTableViews(catalog, spark)
        toResult(spark.sql(trimmed))
    }
  }

  /** SELECT via spark with catalog views registered; DataFrame out (the
    * Spark-idiomatic entry — `Result` is the row-API parity wrapper). */
  def sqlDF(catalog: Catalog, spark: SparkSession, query: String,
            params: Seq[Any] = Nil): DataFrame = {
    refreshTableViews(catalog, spark)
    spark.sql(bindParams(singleStatement(query), params))
  }

  // ------------------------------------------------------------- routing

  private val CreateTableRe =
    """(?is)^\s*create\s+table\s+([\w.]+)\s*\((.*)\)\s*$""".r
  private val CreateViewRe =
    """(?is)^\s*create\s+(?:or\s+replace\s+)?view\s+([\w.]+)\s+as\s+(.+)$""".r
  private val InsertRe =
    """(?is)^\s*insert\s+into\s+([\w.]+)\s*(\([\w\s,]*\))?\s*(values\s*.+|select\s+.+|with\s+.+)$""".r

  private def createStatement(catalog: Catalog, spark: SparkSession,
                              stmt: String): Result = stmt match {
    case CreateTableRe(name, colsRaw) =>
      val fields = splitTopLevel(colsRaw).zipWithIndex.map { case (defRaw, i) =>
        val d = defRaw.trim
        val notNull = d.toLowerCase.endsWith("not null")
        val core = if (notNull) d.substring(0, d.length - "not null".length).trim else d
        val sp = core.indexOf(' ')
        if (sp < 0) throw new InvalidDataError(s"bad column definition: $defRaw")
        val colName = core.substring(0, sp).trim.stripPrefix("\"").stripSuffix("\"")
        val typeName = core.substring(sp + 1).trim
        NestedField(i + 1, colName, Schema.parseTypeName(typeName), required = notNull)
      }
      catalog.createTable(name, Schema(0, fields))
      Result(Nil, Nil)
    case CreateViewRe(name, body) =>
      refreshTableViews(catalog, spark)
      // materialized at creation time: the view pins the data it saw (the
      // reference's DataFusion views behave the same, sql_test.rb:71-86)
      val df = spark.sql(body)
      df.createOrReplaceTempView(name)
      userViews.getOrElseUpdate(key(catalog, spark), mutable.Set.empty) += name
      Result(Nil, Nil)
    case _ =>
      throw new UnsupportedFeatureError(s"unsupported DDL: ${stmt.take(60)}")
  }

  private def insertStatement(catalog: Catalog, spark: SparkSession,
                              stmt: String): Result = stmt match {
    case InsertRe(name, colListRaw, body) =>
      val t = catalog.loadTable(name)
      refreshTableViews(catalog, spark)
      val src =
        if (body.trim.toLowerCase.startsWith("values"))
          spark.sql(s"SELECT * FROM ($body)")
        else spark.sql(body)
      val schema = t.currentSchema
      val targetCols: Seq[String] = Option(colListRaw) match {
        case Some(list) =>
          list.stripPrefix("(").stripSuffix(")").split(',').map(_.trim).toSeq
        case None => schema.fields.map(_.name).take(src.columns.length)
      }
      if (targetCols.length != src.columns.length)
        throw new InvalidDataError(
          s"INSERT has ${src.columns.length} expressions but ${targetCols.length} target columns")
      val renamed = src.toDF(targetCols: _*)
      t.append(renamed)
      Result(Nil, Nil)
    case _ =>
      throw new UnsupportedFeatureError(s"unsupported INSERT: ${stmt.take(60)}")
  }

  // ------------------------------------------------------------ plumbing

  private def key(catalog: Catalog, spark: SparkSession): (String, String) =
    (String.valueOf(System.identityHashCode(spark)), catalog.name)

  /** Register every catalog table as a temp view over its CURRENT snapshot.
    * Default-namespace tables get their bare name (the reference sets the
    * session's default catalog+schema the same way, `catalog.rs:449-455`).
    * Metadata views `<name>_snapshots` / `<name>_history` / `<name>_refs`
    * ride along (driver-memory only — no manifest IO at registration). */
  private def refreshTableViews(catalog: Catalog, spark: SparkSession): Unit = {
    val views = userViews.getOrElse(key(catalog, spark), mutable.Set.empty)
    val ns = catalog.defaultNamespace
    catalog.listTables(Some(ns)).foreach { parts =>
      val tableName = parts.last
      if (!views.contains(tableName)) {
        val t = catalog.loadTable((ns :+ tableName).mkString("."))
        t.toDF(spark).createOrReplaceTempView(tableName)
        t.snapshotsDF(spark).createOrReplaceTempView(s"${tableName}_snapshots")
        t.historyDF(spark).createOrReplaceTempView(s"${tableName}_history")
        t.refsDF(spark).createOrReplaceTempView(s"${tableName}_refs")
        // partitionsDF/filesDF/manifestsDF are NOT auto-registered: they
        // plan manifests, and registration must stay metadata-memory-only
      }
    }
  }

  /** Reference parity: exactly one statement per call (`sql_test.rb:95-101`). */
  private def singleStatement(query: String): String = {
    val parts = splitStatements(query)
    if (parts.length != 1)
      throw new InvalidDataError("expected exactly one statement")
    parts.head
  }

  private def splitStatements(q: String): Seq[String] = {
    val out = mutable.ArrayBuffer[String]()
    val sb = new StringBuilder
    var inS = false; var inD = false
    var i = 0
    while (i < q.length) {
      val c = q.charAt(i)
      c match {
        case '\\' if (inS || inD) && i + 1 < q.length => // escaped char, see bindParams
          sb += c; sb += q.charAt(i + 1); i += 1
        case '\'' if !inD => inS = !inS; sb += c
        case '"' if !inS => inD = !inD; sb += c
        case ';' if !inS && !inD => out += sb.toString; sb.clear()
        case c2 => sb += c2
      }
      i += 1
    }
    out += sb.toString
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Split "a int, d decimal(10, 2)" on top-level commas only. */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = mutable.ArrayBuffer[String]()
    val sb = new StringBuilder
    var depth = 0
    for (c <- s) c match {
      case '(' => depth += 1; sb += c
      case ')' => depth -= 1; sb += c
      case ',' if depth == 0 => out += sb.toString; sb.clear()
      case c2 => sb += c2
    }
    if (sb.nonEmpty) out += sb.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Positional `$1..$n` binding by literal splice, with the reference's
    * type table (`catalog.rs:467-495`); extra params are ignored. Quote-aware
    * like [[splitStatements]]: a literal dollar-number INSIDE a string
    * (`WHERE note = 'costs $1'`) is data, not a placeholder. */
  private[graft] def bindParams(stmt: String, params: Seq[Any]): String = {
    if (params.isEmpty) return stmt
    val sb = new StringBuilder
    var inS = false; var inD = false
    var i = 0
    while (i < stmt.length) {
      val c = stmt.charAt(i)
      c match {
        // Spark SQL string literals accept backslash escapes by default, so
        // `\'` / `\"` inside a literal must not toggle the in-string state
        // (else a `$n` inside the literal would be spliced, or a real
        // placeholder after it treated as data). Consume the escaped char.
        case '\\' if (inS || inD) && i + 1 < stmt.length =>
          sb += c; sb += stmt.charAt(i + 1); i += 2
        case '\'' if !inD => inS = !inS; sb += c; i += 1
        case '"' if !inS => inD = !inD; sb += c; i += 1
        case '$' if !inS && !inD && i + 1 < stmt.length && stmt.charAt(i + 1).isDigit =>
          var j = i + 1
          while (j < stmt.length && stmt.charAt(j).isDigit) j += 1
          val n = stmt.substring(i + 1, j).toInt
          if (n < 1 || n > params.length)
            throw new InvalidDataError(s"no value for placeholder $$$n")
          sb ++= literal(params(n - 1))
          i = j
        case other => sb += other; i += 1
      }
    }
    sb.toString
  }

  private def literal(v: Any): String = v match {
    case null | None => "NULL"
    case b: Boolean => b.toString
    case i: Int => i.toString
    case l: Long => l.toString
    // the 'D' suffix keeps Spark from reading these as DECIMAL literals
    // (reference binds Float params as f64, catalog.rs:474)
    case f: Float => s"CAST('$f' AS DOUBLE)"
    case d: Double => s"CAST('$d' AS DOUBLE)"
    case d: java.math.BigDecimal => d.toPlainString
    case d: BigDecimal => d.bigDecimal.toPlainString
    case s: String => "'" + s.replace("'", "''") + "'"
    case d: java.time.LocalDate => s"DATE '$d'"
    case d: java.sql.Date => s"DATE '${d.toLocalDate}'"
    case t: java.time.LocalDateTime =>
      s"TIMESTAMP_NTZ '${t.toString.replace('T', ' ')}'"
    case t: java.time.Instant => s"TIMESTAMP '${t.toString.replace("T", " ").stripSuffix("Z")}'"
    case t: java.sql.Timestamp => s"TIMESTAMP '${t.toLocalDateTime.toString.replace('T', ' ')}'"
    case other => throw new InvalidDataError(s"unsupported parameter type: ${other.getClass}")
  }

  /** Reference parity: duplicate output names rejected (`sql_test.rb:103-107`). */
  private def toResult(df: DataFrame): Result = {
    val cols = df.columns.toSeq
    val dups = cols.groupBy(identity).collect { case (c, g) if g.size > 1 => c }
    if (dups.nonEmpty)
      throw new InvalidDataError(s"duplicate column names: ${dups.mkString(", ")}")
    Result(cols, df.collect().toSeq.map(_.toSeq))
  }
}
