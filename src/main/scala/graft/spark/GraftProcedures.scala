package graft.spark

import graft.catalog.{Catalog => GCatalog}
import graft.table.{Table => GTable}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * SQL-callable maintenance (Spark 4 DSv2 procedures):
 * {{{
 * CALL graft.system.compact(`table` => 'ns.t')
 * CALL graft.system.expire_snapshots(`table` => 'ns.t', older_than_ms => ...)
 * CALL graft.system.remove_orphan_files(`table` => 'ns.t', older_than_ms => ...)
 * CALL graft.system.rewrite_manifests(`table` => 'ns.t')
 * CALL graft.system.rollback(`table` => 'ns.t', snapshot_id => 123)
 * CALL graft.system.fast_forward(`table` => 'ns.t', branch => 'main', `from` => 'audit')
 * CALL graft.system.zorder(`table` => 'ns.t', columns => 'a,b')
 * CALL graft.system.maintain(`table` => 'ns.t')
 * CALL graft.system.add_files(`table` => 'ns.t', source_dir => '/data/in')
 * }}}
 * Each returns one summary row. The heavy work is the same cluster-safe
 * maintenance the programmatic API runs (distributed reachability walks,
 * CAS commits) — CALL is just the SQL door to it.
 */
private[spark] object GraftProcedures {

  def list: Array[String] = Array("compact", "expire_snapshots",
    "rewrite_manifests", "remove_orphan_files", "rollback", "fast_forward",
    "zorder", "maintain", "add_files", "cherrypick_snapshot", "analyze",
    "analyze_partitions")

  def load(backing: GCatalog, name: String): Option[UnboundProcedure] = {
    def t(input: InternalRow): GTable =
      backing.loadTable(input.getUTF8String(0).toString)
    def spark = SparkSession.active
    name match {
      case "compact" => Some(proc(name,
        Seq(p("table", StringType),
          p("small_file_bytes", LongType, Some("67108864")),
          p("min_input_files", IntegerType, Some("2"))),
        in => { t(in).compact(spark, in.getLong(1), in.getInt(2)); "compacted" }))
      case "expire_snapshots" => Some(proc(name,
        Seq(p("table", StringType), p("older_than_ms", LongType),
          p("retain_last", IntegerType, Some("1"))),
        in => { t(in).expireSnapshots(spark, in.getLong(1), in.getInt(2),
            graft.table.TableScan.DistributedPlanThreshold)
          "expired" }))
      case "rewrite_manifests" => Some(proc(name,
        Seq(p("table", StringType), p("min_input_manifests", IntegerType, Some("2"))),
        in => { t(in).rewriteManifests(spark, in.getInt(1),
            graft.table.TableScan.DistributedPlanThreshold)
          "rewritten" }))
      case "remove_orphan_files" => Some(proc(name,
        Seq(p("table", StringType), p("older_than_ms", LongType)),
        in => { val removed = t(in).removeOrphanFiles(spark, in.getLong(1))
          s"removed ${removed.length} orphan files" }))
      case "rollback" => Some(proc(name,
        Seq(p("table", StringType), p("snapshot_id", LongType)),
        in => { t(in).rollback(in.getLong(1)); s"rolled back to ${in.getLong(1)}" }))
      case "fast_forward" => Some(proc(name,
        Seq(p("table", StringType), p("branch", StringType), p("from", StringType)),
        in => { t(in).fastForward(in.getUTF8String(1).toString,
            in.getUTF8String(2).toString)
          s"fast-forwarded ${in.getUTF8String(1)} to ${in.getUTF8String(2)}" }))
      case "zorder" => Some(proc(name,
        Seq(p("table", StringType), p("columns", StringType)),
        in => { val cols = in.getUTF8String(1).toString.split(',').map(_.trim).toSeq
          t(in).zorder(spark, cols); s"zordered by ${cols.mkString(",")}" }))
      case "maintain" => Some(proc(name,
        Seq(p("table", StringType),
          p("snapshot_retention_ms", LongType, Some((7L * 24 * 3600 * 1000).toString)),
          p("retain_last", IntegerType, Some("1")),
          p("small_file_bytes", LongType, Some("67108864"))),
        in => { val removed = t(in).maintain(spark, in.getLong(1), in.getInt(2), in.getLong(3))
          s"maintained; removed ${removed.length} files" }))
      case "cherrypick_snapshot" => Some(proc(name,
        Seq(p("table", StringType), p("snapshot_id", LongType),
          p("branch", StringType, Some("'main'"))),
        in => { t(in).cherrypickSnapshot(in.getLong(1), in.getUTF8String(2).toString)
          s"cherry-picked ${in.getLong(1)}" }))
      case "add_files" => Some(proc(name,
        Seq(p("table", StringType), p("source_dir", StringType)),
        in => {
          val tbl = t(in)
          val dir = new org.apache.hadoop.fs.Path(in.getUTF8String(1).toString)
          val fs = dir.getFileSystem(tbl.hadoopConf)
          val files = fs.listStatus(dir)
            .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
            .map(_.getPath.toString).toSeq
          tbl.addFiles(spark, files)
          s"added ${files.size} files"
        }))
      case "analyze" => Some(proc(name,
        Seq(p("table", StringType),
          p("columns", StringType, Some("''")),
          p("approx", BooleanType, Some("true"))),
        in => {
          val cols = in.getUTF8String(1).toString.split(',')
            .map(_.trim).filter(_.nonEmpty).toSeq
          val sf = t(in).analyze(spark, cols, in.getBoolean(2))
          s"analyzed ${sf.blobMetadata.size} columns -> ${sf.statisticsPath}"
        }))
      case "analyze_partitions" => Some(proc(name,
        Seq(p("table", StringType)),
        in => {
          val pf = t(in).analyzePartitions(spark)
          s"partition stats -> ${pf.statisticsPath}"
        }))
      case _ => None
    }
  }

  private def p(name: String, dt: DataType,
                default: Option[String] = None): ProcedureParameter = {
    val b = ProcedureParameter.in(name, dt)
    default.foreach(b.defaultValue)
    b.build()
  }

  private def proc(procName: String, params: Seq[ProcedureParameter],
                   body: InternalRow => String): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = s"graft maintenance: $procName"
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = procName
        override def description(): String = s"graft maintenance: $procName"
        override def parameters(): Array[ProcedureParameter] = params.toArray
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val msg = body(input)
          val out: Scan = new LocalScan {
            override def readSchema(): StructType =
              StructType(Seq(StructField("result", StringType, nullable = false)))
            override def rows(): Array[InternalRow] =
              Array(new GenericInternalRow(Array[Any](UTF8String.fromString(msg))))
          }
          java.util.List.of(out).iterator()
        }
      }
    }
}
