package graft.table

import graft.manifest.{DataFile, Manifests}
import graft.meta.{PartitionSpec, Snapshot}
import graft.transforms._
import graft.types._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Simple scan predicates used for manifest-level pruning (before Spark ever
  * sees the file list). The same predicates are re-applied as Catalyst
  * filters so parquet row-group pushdown still happens inside each file. */
sealed trait ScanPredicate { def column: String }
final case class EqPred(column: String, value: Any) extends ScanPredicate
final case class LtPred(column: String, value: Any) extends ScanPredicate
final case class LePred(column: String, value: Any) extends ScanPredicate
final case class GtPred(column: String, value: Any) extends ScanPredicate
final case class GePred(column: String, value: Any) extends ScanPredicate
final case class InPred(column: String, values: Seq[Any]) extends ScanPredicate

/** One unit of scan work: a data file + the delete files that apply to it
  * (ref `scan.rs:82-109`). Spec scoping: an equality delete applies only to
  * data files with STRICTLY smaller data sequence number (rows re-inserted
  * after the delete survive); a position delete applies at equal-or-smaller. */
final case class FileScanTask(file: DataFile, schemaId: Int,
                              sequenceNumber: Long, deleteFiles: Seq[DataFile]) {
  def filePath: String = file.filePath
  def recordCount: Long = file.recordCount
}

/**
 * Snapshot-pinned table scan (ref `lib/iceberg/table_scan.rb:2-31`,
 * `ext/iceberg/src/scan.rs:17-79`): manifest-driven file planning with
 * partition-transform and column-bounds pruning, materialized as a DataFrame.
 *
 * Schema evolution: files are grouped by the schema that wrote them
 * (recorded per-manifest) and projected to the current schema BY FIELD ID,
 * so renamed/dropped columns resolve correctly (SURVEY.md §7.4).
 *
 * Planning runs on the driver with parallel manifest reads; beyond
 * [[TableScan.DistributedPlanThreshold]] manifests, [[planFilesDistributed]]
 * fans the manifest reads + pruning out as a Spark job so a snapshot with
 * O(10⁵-10⁷) manifests never serializes on driver IO — only the surviving
 * (pruned) tasks come back to the driver.
 */
final class TableScan(
    table: Table,
    val snapshot: Option[Snapshot],
    predicates: Seq[ScanPredicate] = Nil) {

  def planFiles(): Seq[FileScanTask] = planEntries().collect { case (t, true) => t }

  /** One manifest-planning pass split by the scan predicates: `(affected,
    * kept)` where `affected` files MAY contain matching rows and `kept`
    * provably cannot. Copy-on-write DML needs both sets; planning them in
    * one pass instead of two halves the manifest reads per commit attempt
    * (at 10⁵ manifests that is the dominant commit cost). */
  private[graft] def planFilesPartitioned(): (Seq[FileScanTask], Seq[FileScanTask]) = {
    val all = planEntries()
    (all.collect { case (t, true) => t }, all.collect { case (t, false) => t })
  }

  private def planEntries(): Seq[(FileScanTask, Boolean)] = {
    import scala.collection.parallel.CollectionConverters._
    val snap = snapshot.getOrElse(return Nil)
    val conf = table.hadoopConf
    val listPath = new Path(snap.manifestList)
    val fs = listPath.getFileSystem(conf)
    val manifests = Manifests.readManifestList(fs, listPath)
    val meta = table.metadata
    val (dataManifests, deleteManifests) = manifests.partition(_.content == 0)
    // Manifests are read in parallel: planning a snapshot with thousands of
    // manifests (one per commit at minimum) must not serialize on the
    // driver's metadata round-trips — the per-manifest work is independent.
    // (delete file, its data sequence number)
    val deleteEntries: Seq[(DataFile, Long)] = deleteManifests.par.flatMap { mf =>
      Manifests.readManifest(fs, new Path(mf.manifestPath)).filter(_.isLive)
        .map(e => (e.dataFile, e.sequenceNumber))
    }.seq
    def applicableDeletes(dataSeq: Long): Seq[DataFile] = deleteEntries.collect {
      case (d, delSeq) if d.content == 2 && delSeq > dataSeq => d // equality: strictly newer
      case (d, delSeq) if d.content == 1 && delSeq >= dataSeq => d // position: same commit counts
    }
    dataManifests.par.flatMap { mf =>
      val spec = meta.partitionSpecById(mf.partitionSpecId).getOrElse(PartitionSpec.Unpartitioned)
      val writeSchema = meta.schemaById(mf.schemaId).getOrElse(meta.currentSchema)
      Manifests.readManifest(fs, new Path(mf.manifestPath))
        .filter(_.isLive)
        .map(e => (FileScanTask(e.dataFile, mf.schemaId, e.sequenceNumber,
          applicableDeletes(e.sequenceNumber)), keepFile(e.dataFile, spec, writeSchema)))
    }.seq
  }

  /**
   * Distributed manifest planning: ship (manifest path, spec id, schema id)
   * triples to executors, read + prune there, collect only surviving
   * entries. Driver cost drops from O(total file entries) IO to O(kept
   * files); a million-manifest snapshot plans at cluster parallelism.
   * Below [[TableScan.DistributedPlanThreshold]] data manifests this
   * delegates to the driver-parallel [[planFiles]] (a Spark job has fixed
   * overhead a small table shouldn't pay).
   */
  def planFilesDistributed(spark: SparkSession,
                           threshold: Int = TableScan.DistributedPlanThreshold): Seq[FileScanTask] = {
    import scala.collection.parallel.CollectionConverters._
    val snap = snapshot.getOrElse(return Nil)
    val conf = table.hadoopConf
    val listPath = new Path(snap.manifestList)
    val fs = listPath.getFileSystem(conf)
    val manifests = Manifests.readManifestList(fs, listPath)
    val meta = table.metadata
    val (dataManifests, deleteManifests) = manifests.partition(_.content == 0)
    if (dataManifests.size < threshold) return planFiles()

    // delete manifests are few relative to data manifests; driver-parallel
    val deleteEntries: Seq[(DataFile, Long)] = deleteManifests.par.flatMap { mf =>
      Manifests.readManifest(fs, new Path(mf.manifestPath)).filter(_.isLive)
        .map(e => (e.dataFile, e.sequenceNumber))
    }.seq
    def applicableDeletes(dataSeq: Long): Seq[DataFile] = deleteEntries.collect {
      case (d, delSeq) if d.content == 2 && delSeq > dataSeq => d
      case (d, delSeq) if d.content == 1 && delSeq >= dataSeq => d
    }

    // only immutable, serializable state enters the closure
    val preds = predicates
    val specById = meta.partitionSpecs.map(s => s.specId -> s).toMap
    val schemaById = meta.schemas.map(s => s.schemaId -> s).toMap
    val currentSchema = meta.currentSchema
    val confSer = new SerializableHadoopConf(conf)
    val work = dataManifests.map(mf => (mf.manifestPath, mf.partitionSpecId, mf.schemaId))
    val slices = math.max(1, math.min(work.size,
      spark.sparkContext.defaultParallelism * 4))
    val kept = spark.sparkContext.parallelize(work, slices)
      .flatMap { case (path, specId, schemaId) =>
        val p = new Path(path)
        val f = p.getFileSystem(confSer.value)
        val spec = specById.getOrElse(specId, PartitionSpec.Unpartitioned)
        val writeSchema = schemaById.getOrElse(schemaId, currentSchema)
        Manifests.readManifest(f, p)
          .filter(_.isLive)
          .filter(e => ScanPruning.keepFile(preds, e.dataFile, spec, writeSchema))
          .map(e => (schemaId, e.sequenceNumber, e.dataFile))
      }
      .collect()
    kept.toSeq.map { case (schemaId, seqNum, df) =>
      FileScanTask(df, schemaId, seqNum, applicableDeletes(seqNum))
    }
  }

  private def keepFile(df: DataFile, spec: PartitionSpec, schema: Schema): Boolean =
    ScanPruning.keepFile(predicates, df, spec, schema)

  // ------------------------------------------------------- materialization

  /** Materialize as a DataFrame: group files by (writer schema, applicable
    * delete set), project each group to the current schema by field id,
    * apply that group's merge-on-read deletes, union, and re-apply
    * predicates (for in-file parquet row-group pushdown). */
  def toDF(spark: SparkSession): DataFrame =
    predicates.foldLeft(materializeTasks(spark, planFilesDistributed(spark)))(
      (d, p) => d.filter(predicateToColumn(p)))

  /** Materialize an explicit task list to the current schema WITHOUT the
    * scan predicates (used by copy-on-write rewrites, which need every row
    * of the affected files, not just matching ones). */
  private[graft] def materializeTasks(spark: SparkSession,
                                      tasks: Seq[FileScanTask]): DataFrame = {
    val meta = table.metadata
    val current = meta.currentSchema
    val currentSpark = SparkSchemaConverter.toSpark(current)
    if (tasks.isEmpty) {
      return spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), currentSpark)
    }
    // delete scoping is per data file; group by the applicable delete set so
    // each group gets exactly its own anti-joins
    val byDeletes = tasks.groupBy(_.deleteFiles.map(_.filePath).toSet)
    val deleteGroups: Seq[DataFrame] = byDeletes.toSeq.map { case (_, delGroup) =>
      val parts: Seq[DataFrame] = delGroup.groupBy(_.schemaId).toSeq.map { case (schemaId, group) =>
        val writeSchema = meta.schemaById(schemaId).getOrElse(current)
        val writeSpark = SparkSchemaConverter.toSpark(writeSchema)
        val raw = spark.read.schema(writeSpark).parquet(group.map(_.filePath): _*)
        // field-id projection: current field -> column name at write time
        val byId = writeSchema.fields.map(f => f.id -> f).toMap
        val projection = current.fields.map { cf =>
          byId.get(cf.id) match {
            case Some(wf) =>
              col(wf.name).cast(SparkSchemaConverter.toSparkType(cf.fieldType)).as(cf.name)
            case None =>
              lit(null).cast(SparkSchemaConverter.toSparkType(cf.fieldType)).as(cf.name)
          }
        }
        raw.select(projection: _*)
      }
      applyDeletes(spark, parts.reduce(_ unionAll _), delGroup.head.deleteFiles)
    }
    deleteGroups.reduce(_ unionAll _)
  }

  private[graft] def predicateToColumn(p: ScanPredicate): Column = p match {
    case EqPred(c, v) => col(c) === lit(v)
    case LtPred(c, v) => col(c) < lit(v)
    case LePred(c, v) => col(c) <= lit(v)
    case GtPred(c, v) => col(c) > lit(v)
    case GePred(c, v) => col(c) >= lit(v)
    case InPred(c, vs) => col(c).isin(vs.map(lit(_)): _*)
  }

  /** Merge-on-read: equality deletes anti-join on their identifier columns
    * (grouped by equality-ID set — two delete files keyed on different
    * columns each get their own anti-join); position deletes anti-join on
    * (file, row ordinal) via metadata columns. Small delete sets broadcast;
    * large ones fall back to a shuffled anti-join so a big delete set never
    * OOMs the driver. The reference reads (but never writes) delete files. */
  private val BroadcastDeleteBytes = 32L * 1024 * 1024

  private def applyDeletes(spark: SparkSession, data: DataFrame,
                           deletes: Seq[DataFile]): DataFrame = {
    if (deletes.isEmpty) return data
    val current = table.metadata.currentSchema
    def maybeBroadcast(df: DataFrame, files: Seq[DataFile]): DataFrame =
      if (files.map(_.fileSizeInBytes).sum <= BroadcastDeleteBytes) broadcast(df) else df
    var out = data
    for ((ids, group) <- deletes.filter(_.content == 2).groupBy(_.equalityIds.toSet)) {
      val idCols = ids.toSeq.sorted.flatMap(id => current.fieldById(id)).map(_.name)
      if (idCols.nonEmpty) {
        val delDf = spark.read.parquet(group.map(_.filePath): _*).select(idCols.map(col): _*)
        out = out.join(maybeBroadcast(delDf, group), idCols, "left_anti")
      }
    }
    val posDeletes = deletes.filter(_.content == 1)
    if (posDeletes.nonEmpty) {
      // position delete files carry (file_path, pos). URI scheme-slash
      // variance must not break the match: Spark's _metadata.file_path
      // renders local paths as "file:///x" while Hadoop Path.toString (the
      // manifest form a spec-correct delete writer records) is "file:/x" —
      // normalize both sides or deletes silently stop applying.
      val norm: Column => Column = c => regexp_replace(c, "^file:/+", "file:/")
      val delDf = spark.read.parquet(posDeletes.map(_.filePath): _*)
        .select(norm(col("file_path")).as("file_path"), col("pos"))
      val withMeta = out
        .withColumn("__file", norm(col("_metadata.file_path")))
        .withColumn("__pos", col("_metadata.row_index"))
      out = withMeta.join(maybeBroadcast(delDf, posDeletes),
          withMeta("__file") === delDf("file_path") && withMeta("__pos") === delDf("pos"),
          "left_anti")
        .drop("__file", "__pos")
    }
    out
  }

  /** Execute → row-oriented Result (ref `scan.rs:57-63` + `result.rs`). */
  def collect(spark: SparkSession): Result = {
    val df = toDF(spark)
    Result(df.columns.toSeq, df.collect().toSeq.map(_.toSeq))
  }

  /** Execute → Arrow record batches (ref `scan.to_arrow` /
    * `arrow_c_stream`, `scan.rs:65-79`). Caller closes the returned roots
    * and the allocator. */
  def toArrowBatches(spark: SparkSession,
                     allocator: org.apache.arrow.memory.BufferAllocator,
                     maxRowsPerBatch: Int = 4096): Seq[org.apache.arrow.vector.VectorSchemaRoot] =
    ArrowExport.toBatches(toDF(spark), table.metadata.currentSchema, allocator, maxRowsPerBatch)
}

object TableScan {
  /** Data-manifest count beyond which planning fans out as a Spark job. */
  val DistributedPlanThreshold = 64
}

/** Manifest-level file pruning, separated from [[TableScan]] so the
  * distributed planning path can evaluate it INSIDE executor tasks (the
  * object is stateless; predicates travel with the closure). */
private[table] object ScanPruning extends Serializable {

  def keepFile(predicates: Seq[ScanPredicate], df: DataFile,
               spec: PartitionSpec, schema: Schema): Boolean =
    predicates.forall(p => keepByPartition(p, df, spec, schema) && keepByBounds(p, df, schema))

  /** Partition pruning: rewrite the predicate through each partition
    * transform over the predicate's source column. */
  private def keepByPartition(p: ScanPredicate, df: DataFile,
                              spec: PartitionSpec, schema: Schema): Boolean = {
    val field = schema.fieldByName(p.column).getOrElse(return true)
    spec.fields.filter(_.sourceId == field.id).forall { pf =>
      val raw = df.partition.getOrElse(pf.name, return true)
      if (raw.isEmpty) return true // null partition — keep
      val transform = Transform.parse(pf.transform)
      val resultType = transform.resultType(field.fieldType)
      val partVal = parseValue(raw, resultType).getOrElse(return true)
      p match {
        case EqPred(_, v) =>
          canonEq(transform(v, field.fieldType), partVal)
        case InPred(_, vs) =>
          vs.exists(v => canonEq(transform(v, field.fieldType), partVal))
        case _ if isMonotonic(transform) =>
          val bound = transform(valueOf(p), field.fieldType)
          (p, canonNum(bound), canonNum(partVal)) match {
            // transforms are order-preserving but lossy, so boundaries stay inclusive
            case (_: LtPred | _: LePred, Some(b), Some(x)) => x <= b
            case (_: GtPred | _: GePred, Some(b), Some(x)) => x >= b
            case _ => true
          }
        case _ => true
      }
    }
  }

  /** File skipping on footer min/max bounds (unpartitioned pruning). */
  private def keepByBounds(p: ScanPredicate, df: DataFile, schema: Schema): Boolean = {
    val field = schema.fieldByName(p.column).getOrElse(return true)
    val lower = df.lowerBounds.get(p.column).flatMap(parsePhysical(_, field.fieldType))
    val upper = df.upperBounds.get(p.column).flatMap(parsePhysical(_, field.fieldType))
    if (lower.isEmpty && upper.isEmpty) return true
    def num(v: Any): Option[BigDecimal] = canonNum(physicalOf(v, field.fieldType))
    p match {
      case EqPred(_, v) =>
        (num(v), lower.flatMap(canonNum), upper.flatMap(canonNum)) match {
          case (Some(x), Some(lo), Some(hi)) => x >= lo && x <= hi
          case _ => strRange(v, lower, upper)
        }
      case LtPred(_, v) => cmpLow(num(v), lower, strict = true, v)
      case LePred(_, v) => cmpLow(num(v), lower, strict = false, v)
      case GtPred(_, v) => cmpHigh(num(v), upper, strict = true, v)
      case GePred(_, v) => cmpHigh(num(v), upper, strict = false, v)
      case InPred(_, vs) => vs.exists(v => keepByBounds(EqPred(p.column, v), df, schema))
    }
  }

  private def cmpLow(x: Option[BigDecimal], lower: Option[Any], strict: Boolean, raw: Any): Boolean =
    (x, lower.flatMap(canonNum)) match {
      case (Some(v), Some(lo)) => if (strict) lo < v else lo <= v
      case _ => (raw, lower) match {
        case (s: String, Some(lo: String)) => if (strict) lo < s else lo <= s
        case _ => true
      }
    }
  private def cmpHigh(x: Option[BigDecimal], upper: Option[Any], strict: Boolean, raw: Any): Boolean =
    (x, upper.flatMap(canonNum)) match {
      case (Some(v), Some(hi)) => if (strict) hi > v else hi >= v
      case _ => (raw, upper) match {
        case (s: String, Some(hi: String)) => if (strict) hi > s else hi >= s
        case _ => true
      }
    }
  private def strRange(v: Any, lower: Option[Any], upper: Option[Any]): Boolean = v match {
    case s: String =>
      lower.forall { case lo: String => lo <= s; case _ => true } &&
        upper.forall { case hi: String => hi >= s; case _ => true }
    case _ => true
  }

  private def isMonotonic(t: Transform): Boolean = t match {
    case IdentityTransform | YearTransform | MonthTransform | DayTransform | HourTransform => true
    case TruncateTransform(_) => true
    case _ => false
  }

  private def valueOf(p: ScanPredicate): Any = p match {
    case LtPred(_, v) => v
    case LePred(_, v) => v
    case GtPred(_, v) => v
    case GePred(_, v) => v
    case EqPred(_, v) => v
    case InPred(_, vs) => vs.head
  }

  /** Parse a partition-dir value string into the transform result type. */
  private def parseValue(raw: String, t: IType): Option[Any] = try {
    t match {
      case IInt => Some(raw.toInt)
      case ILong => Some(raw.toLong)
      case IString | IUuid => Some(raw)
      case IDate => Some(java.time.LocalDate.parse(raw))
      case IDouble => Some(raw.toDouble)
      case IFloat => Some(raw.toFloat)
      case IBoolean => Some(raw.toBoolean)
      case IDecimal(_, _) => Some(new java.math.BigDecimal(raw))
      case _ => None
    }
  } catch { case _: Exception => None }

  /** Parquet footer bounds are physical values (dates as epoch days,
    * timestamps as micros). */
  private def parsePhysical(raw: String, t: IType): Option[Any] = try {
    t match {
      case IInt | IDate => Some(raw.toLong)
      case ILong | ITimestamp | ITimestampTz | ITime => Some(raw.toLong)
      case IFloat | IDouble => Some(raw.toDouble)
      case IDecimal(_, _) => Some(BigDecimal(raw))
      case IString | IUuid => Some(raw)
      case IBoolean => Some(raw.toBoolean)
      case _ => None
    }
  } catch { case _: Exception => None }

  /** Canonical physical encoding of a user-supplied predicate value. */
  private def physicalOf(v: Any, t: IType): Any = v match {
    case d: java.time.LocalDate => d.toEpochDay
    case d: java.sql.Date => d.toLocalDate.toEpochDay
    case ts: java.sql.Timestamp => ts.getTime * 1000L
    case i: java.time.Instant => i.getEpochSecond * 1000000L + i.getNano / 1000
    case ldt: java.time.LocalDateTime =>
      ldt.toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    case other => other
  }

  private def canonNum(v: Any): Option[BigDecimal] = v match {
    case null => None
    case i: Int => Some(BigDecimal(i))
    case l: Long => Some(BigDecimal(l))
    case f: Float => Some(BigDecimal(f.toDouble))
    case d: Double => Some(BigDecimal(d))
    case d: java.math.BigDecimal => Some(BigDecimal(d))
    case d: BigDecimal => Some(d)
    case d: java.time.LocalDate => Some(BigDecimal(d.toEpochDay))
    case d: java.sql.Date => Some(BigDecimal(d.toLocalDate.toEpochDay))
    case _ => None
  }

  private def canonEq(a: Any, b: Any): Boolean = (canonNum(a), canonNum(b)) match {
    case (Some(x), Some(y)) => x == y
    case _ => String.valueOf(a) == String.valueOf(b)
  }
}

/** Hadoop `Configuration` is not `Serializable`; this carries it through a
  * Spark closure by writing its key/value state (the same trick Spark's own
  * internal wrapper uses). */
private[table] class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
