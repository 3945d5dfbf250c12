package graft.spark

import graft.InvalidDataError
import graft.table.{StaticTable, Table => GTable}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog.{Table => SparkTable}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * Path-based reads without a catalog — the reference's StaticTable
 * (`lib/iceberg/static_table.rb`) surfaced as a Spark data source:
 *
 * {{{
 * spark.read.format("graft").load("/warehouse/ns/t")            // table dir
 * spark.read.format("graft").load(".../v7.metadata.json")       // pinned metadata
 * spark.read.format("graft").option("snapshot-id", "123").load(dir)
 * spark.read.format("graft").option("branch", "audit").load(dir)
 * spark.read.format("graft").option("as-of-timestamp-ms", ms).load(dir)
 * spark.read.format("graft").option("hadoop.fs.s3a.endpoint", e).load(dir)
 * }}}
 *
 * Options prefixed `hadoop.` overlay the Hadoop Configuration used to
 * resolve and read the table — the analogue of the reference's
 * `storage_options:` passthrough (`lib/iceberg/table.rb:151-159`), for
 * per-read filesystem settings (endpoints, credentials providers) without
 * touching the session-wide conf.
 *
 * A directory resolves through `metadata/version-hint.text` (the Hadoop
 * catalog layout), falling back to the highest `v*.metadata.json`. Tables
 * loaded this way have no catalog, so they are read-only — writes fail
 * with the read-only error, matching StaticTable semantics.
 */
class GraftDataSource extends org.apache.spark.sql.connector.catalog.TableProvider
    with DataSourceRegister
    with org.apache.spark.sql.sources.StreamSourceProvider
    with org.apache.spark.sql.sources.StreamSinkProvider {

  override def shortName(): String = "graft"

  override def createSink(sqlContext: org.apache.spark.sql.SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    if (partitionColumns.nonEmpty)
      throw new InvalidDataError(
        "partitionBy on the graft sink is ignored state — partitioning comes " +
          "from the TABLE's spec; remove partitionBy")
    // The sink COMMITS what each trigger hands it. Complete mode re-emits
    // every result row every trigger — appending that duplicates the table
    // each micro-batch. Update mode re-emits changed rows, which is only
    // sound when each batch upserts on a key (merge-keys); appended, the
    // old versions of updated rows would survive alongside the new.
    import org.apache.spark.sql.streaming.OutputMode
    if (outputMode == OutputMode.Complete())
      throw new graft.UnsupportedFeatureError(
        "the graft sink does not support Complete output mode: each trigger " +
          "re-emits ALL rows and an appending sink would duplicate the table " +
          "every micro-batch; use Append, or Update with merge-keys")
    if (outputMode == OutputMode.Update() && !parameters.get("merge-keys").exists(_.trim.nonEmpty))
      throw new InvalidDataError(
        "Update output mode on the graft sink requires the merge-keys option: " +
          "updated rows re-emit and must upsert on a key, not append")
    new GraftStreamSink(parameters)
  }

  // ---- streaming source: spark.readStream.format("graft").load(dir) ----

  /** The table directory a stream resolves through: an explicit path, or
    * the Hadoop-catalog layout derived from warehouse+table (Spark builds
    * the V1 fallback relation EAGERLY even when the V2 stream will be
    * chosen, so this must resolve for every addressing mode the V2 path
    * accepts). */
  private def streamPath(parameters: Map[String, String]): String =
    parameters.get("path").orElse {
      (parameters.get("warehouse"), parameters.get("table")) match {
        case (Some(wh), Some(name)) => Some((wh +: name.split('.').toSeq).mkString("/"))
        case _ => None
      }
    }.getOrElse(throw new InvalidDataError(
      "readStream format(\"graft\") requires a path, or warehouse+table options"))

  override def sourceSchema(sqlContext: org.apache.spark.sql.SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    ("graft", schema.getOrElse {
      val conf = new Configuration()
      parameters.foreach { case (k, v) =>
        if (k.startsWith("hadoop.")) conf.set(k.substring("hadoop.".length), v)
      }
      val t = StaticTable.load(
        GraftDataSource.metadataPathFor(streamPath(parameters), conf), conf)
      val base = graft.types.SparkSchemaConverter.toSpark(t.currentSchema)
      if (parameters.get("read-changes").exists(_.toBoolean))
        GraftStreamSource.withChangeColumns(base)
      else base
    })

  override def createSource(sqlContext: org.apache.spark.sql.SQLContext,
                            metadataPath: String, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): org.apache.spark.sql.execution.streaming.Source =
    new GraftStreamSource(sqlContext, streamPath(parameters), parameters)

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    resolve(options).schema()

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): SparkTable =
    resolve(new CaseInsensitiveStringMap(properties))

  private def resolve(options: CaseInsensitiveStringMap): GraftSparkTable = {
    val conf = new Configuration()
    options.asCaseSensitiveMap().forEach { (k, v) =>
      if (k.startsWith("hadoop.")) conf.set(k.substring("hadoop.".length), v)
    }
    // two addressing modes: a table/metadata path (read-only StaticTable),
    // or warehouse+table naming a Hadoop-catalog table (catalog-backed —
    // the form the streaming sink uses, so its schema resolves here too)
    val t = Option(options.get("path")) match {
      case Some(path) =>
        StaticTable.load(GraftDataSource.metadataPathFor(path, conf), conf)
      case None =>
        (Option(options.get("warehouse")), Option(options.get("table"))) match {
          case (Some(wh), Some(name)) =>
            new graft.catalog.HadoopCatalog(wh, hadoopConf = conf).loadTable(name)
          case _ => throw new InvalidDataError(
            "format(\"graft\") requires a path, or warehouse+table options")
        }
    }
    val pinned: Option[Long] =
      (Option(options.get("snapshot-id")), Option(options.get("branch")),
        Option(options.get("as-of-timestamp-ms"))) match {
        case (Some(sid), None, None) =>
          val id = sid.toLong
          if (t.snapshotById(id).isEmpty)
            throw new InvalidDataError(s"no snapshot with id $id")
          Some(id)
        case (None, Some(ref), None) =>
          Some(t.snapshotForRef(ref).getOrElse(
            throw new InvalidDataError(s"no ref named $ref")).snapshotId)
        case (None, None, Some(ts)) =>
          Some(t.snapshotAsOf(ts.toLong).getOrElse(
            throw new InvalidDataError(s"no snapshot at or before $ts")).snapshotId)
        case (None, None, None) => None
        case _ => throw new InvalidDataError(
          "use at most one of snapshot-id / branch / as-of-timestamp-ms")
      }
    // the raw options travel with the table: a streaming read needs them to
    // re-resolve the table per trigger (path, rate limits, hadoop overlays)
    val optMap = {
      val b = Map.newBuilder[String, String]
      options.asCaseSensitiveMap().forEach((k, v) => b += (k.toLowerCase -> v))
      b.result()
    }
    new GraftSparkTable(t, pinned, optMap)
  }
}

object GraftDataSource {
  /** A `*.metadata.json` path passes through; a table directory resolves
    * via `metadata/version-hint.text`, else the highest version file.
    * The hint rewrite is not atomic, so a concurrent reader (a streaming
    * source polls every trigger) can observe it empty or pointing at a
    * not-yet-visible version — any unusable hint falls back to the
    * version listing instead of failing the read. */
  private[spark] def metadataPathFor(path: String,
                                     conf: Configuration = new Configuration()): String = {
    if (path.endsWith(".metadata.json")) return path
    val dir = new Path(path, "metadata")
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir))
      throw new InvalidDataError(s"not a graft table (no metadata/ under $path)")
    val hint = new Path(dir, "version-hint.text")
    val fromHint: Option[String] =
      if (!fs.exists(hint)) None
      else try {
        val in = fs.open(hint)
        val v = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
                finally in.close()
        val p = new Path(dir, s"v$v.metadata.json")
        if (v.nonEmpty && fs.exists(p)) Some(p.toString) else None
      } catch { case _: java.io.IOException => None }
    fromHint.getOrElse {
      val VRe = """v(\d+)\.metadata\.json""".r
      val versions = fs.listStatus(dir).toSeq.map(_.getPath.getName).collect {
        case VRe(n) => n.toInt
      }
      if (versions.isEmpty)
        throw new InvalidDataError(s"no metadata json found under $dir")
      new Path(dir, s"v${versions.max}.metadata.json").toString
    }
  }
}
