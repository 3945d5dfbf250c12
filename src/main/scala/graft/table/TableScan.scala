package graft.table

import graft.manifest.{DataFile, ManifestEntry, Manifests}
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
                              sequenceNumber: Long, deleteFiles: Seq[DataFile],
                              specId: Int = 0) {
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

  def planFiles(): Seq[FileScanTask] =
    planEntries(skipPrunedManifests = true).collect { case (t, true) => t }

  /** One manifest-planning pass split by the scan predicates: `(affected,
    * kept)` where `affected` files MAY contain matching rows and `kept`
    * provably cannot. Copy-on-write DML needs both sets; planning them in
    * one pass instead of two halves the manifest reads per commit attempt
    * (at 10⁵ manifests that is the dominant commit cost).
    *
    * Manifest-level (507) skipping is DISABLED here: a skipped manifest's
    * files would land in neither set, and a rewrite commit built from
    * these sets would silently drop them from the table. */
  private[graft] def planFilesPartitioned(): (Seq[FileScanTask], Seq[FileScanTask]) = {
    val all = planEntries(skipPrunedManifests = false)
    (all.collect { case (t, true) => t }, all.collect { case (t, false) => t })
  }

  private def planEntries(skipPrunedManifests: Boolean): Seq[(FileScanTask, Boolean)] = {
    import scala.collection.parallel.CollectionConverters._
    val snap = snapshot.getOrElse(return Nil)
    val conf = table.hadoopConf
    val listPath = new Path(snap.manifestList)
    val fs = listPath.getFileSystem(conf)
    val manifests = Manifests.readManifestList(fs, listPath)
    val meta = table.metadata
    val (allDataManifests, deleteManifests) = manifests.partition(_.content == 0)
    // pure-read planning skips whole manifests via the list's partition
    // field summaries (spec 507) BEFORE any manifest IO: on a snapshot
    // with one manifest per day-partition, a one-day scan reads one
    val dataManifests =
      if (!skipPrunedManifests) allDataManifests
      else allDataManifests.filter { mf =>
        val spec = meta.partitionSpecById(mf.partitionSpecId).getOrElse(PartitionSpec.Unpartitioned)
        val writeSchema = meta.schemaById(mf.schemaId).getOrElse(meta.currentSchema)
        ScanPruning.keepManifestEvolved(predicates, mf.partitions, spec,
          writeSchema, meta.currentSchema)
      }
    // Manifests are read in parallel: planning a snapshot with thousands of
    // manifests (one per commit at minimum) must not serialize on the
    // driver's metadata round-trips — the per-manifest work is independent.
    // (delete file, its data sequence number)
    val deleteEntries: Seq[(DataFile, Long)] = deleteManifests.par.flatMap { mf =>
      Manifests.readManifest(fs, new Path(mf.manifestPath)).filter(_.isLive)
        .map(e => (e.dataFile, e.sequenceNumber))
    }.seq
    def applicableDeletes(dataFile: DataFile, dataSeq: Long): Seq[DataFile] =
      deleteEntries.collect {
        case (d, delSeq) if ScanPruning.deleteApplies(d, delSeq, dataFile, dataSeq) => d
      }
    dataManifests.par.flatMap { mf =>
      val spec = meta.partitionSpecById(mf.partitionSpecId).getOrElse(PartitionSpec.Unpartitioned)
      val writeSchema = meta.schemaById(mf.schemaId).getOrElse(meta.currentSchema)
      Manifests.readManifest(fs, new Path(mf.manifestPath))
        .filter(_.isLive)
        .map(e => (FileScanTask(e.dataFile, mf.schemaId, e.sequenceNumber,
          applicableDeletes(e.dataFile, e.sequenceNumber), mf.partitionSpecId),
          ScanPruning.keepFileEvolved(predicates, e.dataFile, spec, writeSchema, meta.currentSchema)))
    }.seq
  }

  /**
   * Files ADDED by this scan's pinned snapshot, planned from ONLY the
   * manifests that commit itself wrote: the manifest list records each
   * manifest's `addedSnapshotId` (spec field 503) and each entry its
   * status/snapshot, so "what did commit S add" never needs the parent
   * snapshot or the rest of the table — O(commit) metadata IO, the unit
   * an incremental/CDC consumer pays per micro-batch. (The equivalent
   * set difference `planFiles(S) -- planFiles(parent)` walks EVERY
   * manifest of both snapshots — O(table) per commit, a catch-up batch
   * over C commits on a 10⁶-file table would re-read each manifest ~2C
   * times.)
   *
   * `deleteFiles` is empty by construction: a delete file applies only to
   * data files with equal-or-smaller data sequence number, and files
   * added by commit S carry S's sequence number — no delete committed at
   * or before S can hide their rows at snapshot S.
   */
  private[graft] def addedFiles(): Seq[FileScanTask] = {
    import scala.collection.parallel.CollectionConverters._
    val snap = snapshot.getOrElse(return Nil)
    val conf = table.hadoopConf
    val listPath = new Path(snap.manifestList)
    val fs = listPath.getFileSystem(conf)
    val mine = Manifests.readManifestList(fs, listPath)
      .filter(mf => mf.content == 0 && mf.addedSnapshotId == snap.snapshotId)
    mine.par.flatMap { mf =>
      Manifests.readManifest(fs, new Path(mf.manifestPath))
        .filter(e => e.status == ManifestEntry.StatusAdded &&
          e.snapshotId == snap.snapshotId)
        .map(e => FileScanTask(e.dataFile, mf.schemaId, e.sequenceNumber,
          Nil, mf.partitionSpecId))
    }.seq.sortBy(_.filePath)
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
    val (allDataManifests, deleteManifests) = manifests.partition(_.content == 0)
    // same manifest-level 507 skipping as planFiles — pruned BEFORE the
    // Spark job, so skipped manifests never even ship to executors
    val dataManifests = allDataManifests.filter { mf =>
      val spec = meta.partitionSpecById(mf.partitionSpecId).getOrElse(PartitionSpec.Unpartitioned)
      val writeSchema = meta.schemaById(mf.schemaId).getOrElse(meta.currentSchema)
      ScanPruning.keepManifestEvolved(predicates, mf.partitions, spec,
        writeSchema, meta.currentSchema)
    }
    if (dataManifests.size < threshold) return planFiles()

    // delete manifests are few relative to data manifests; driver-parallel
    val deleteEntries: Seq[(DataFile, Long)] = deleteManifests.par.flatMap { mf =>
      Manifests.readManifest(fs, new Path(mf.manifestPath)).filter(_.isLive)
        .map(e => (e.dataFile, e.sequenceNumber))
    }.seq
    def applicableDeletes(dataFile: DataFile, dataSeq: Long): Seq[DataFile] =
      deleteEntries.collect {
        case (d, delSeq) if ScanPruning.deleteApplies(d, delSeq, dataFile, dataSeq) => d
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
          .filter(e => ScanPruning.keepFileEvolved(preds, e.dataFile, spec, writeSchema, currentSchema))
          .map(e => (schemaId, specId, e.sequenceNumber, e.dataFile))
      }
      .collect()
    kept.toSeq.map { case (schemaId, specId, seqNum, df) =>
      FileScanTask(df, schemaId, seqNum, applicableDeletes(df, seqNum), specId)
    }
  }

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
    * of the affected files, not just matching ones). With `withPositions`,
    * two extra columns ride along: `__file` (normalized source path) and
    * `__pos` (row ordinal in that file) — what a merge-on-read DML writer
    * needs to emit position deletes. */
  private[graft] def materializeTasks(spark: SparkSession,
                                      tasks: Seq[FileScanTask],
                                      withPositions: Boolean = false): DataFrame = {
    val meta = table.metadata
    val current = meta.currentSchema
    val currentSpark = SparkSchemaConverter.toSpark(current)
    if (tasks.isEmpty) {
      val empty =
        if (!withPositions) currentSpark
        else currentSpark.add("__file", org.apache.spark.sql.types.StringType)
          .add("__pos", org.apache.spark.sql.types.LongType)
      return spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), empty)
    }
    // delete scoping is per data file; group by the applicable delete set so
    // each group gets exactly its own anti-joins. The key must include the
    // blob offset: deletion-vector entries of one commit share a single
    // Puffin FILE path but are distinct deletes (one blob per data file) —
    // path alone would collapse them into one group and silently apply
    // only the first task's DV.
    val byDeletes = tasks.groupBy(
      _.deleteFiles.map(d => (d.filePath, d.contentOffset.getOrElse(-1L))).toSet)
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
              // column added after these files were written: rows read the
              // initial-default (spec v3 semantics), else null
              cf.initialDefault.map(lit).getOrElse(lit(null))
                .cast(SparkSchemaConverter.toSparkType(cf.fieldType)).as(cf.name)
          }
        }
        val posCols =
          if (!withPositions) Nil
          else Seq(normPath(col("_metadata.file_path")).as("__file"),
            col("_metadata.row_index").as("__pos"))
        raw.select(projection ++ posCols: _*)
      }
      val unioned = parts.reduce(_ unionAll _)
      if (withPositions) applyDeletesPositioned(spark, unioned, delGroup.head.deleteFiles)
      else applyDeletes(spark, unioned, delGroup.head.deleteFiles)
    }
    deleteGroups.reduce(_ unionAll _)
  }

  /** Rows of `tasks` matching the scan predicates, with live MOR deletes
    * applied, as current-schema columns plus `__file` (the MANIFEST-form
    * source path, not Spark's rendered form) and `__pos`. The input to a
    * merge-on-read DELETE/UPDATE: only matched (file, pos) pairs and row
    * content ever leave the scan — no data file is rewritten. */
  private[graft] def matchedRowsWithPositions(spark: SparkSession,
                                              tasks: Seq[FileScanTask],
                                              extraCondition: Option[Column] = None): DataFrame = {
    val all = materializeTasks(spark, tasks, withPositions = true)
    val predFiltered = predicates.foldLeft(all)((d, p) => d.filter(predicateToColumn(p)))
    val filtered = extraCondition.foldLeft(predFiltered)(_ filter _)
    // translate the rendered path back to the manifest-form path so the
    // recorded position deletes are spec-shaped (scheme-slash variance!)
    import spark.implicits._
    val mapping = tasks.map(t => (normPathStr(t.filePath), t.filePath))
      .distinct.toDF("__file", "__mpath")
    filtered.join(broadcast(mapping), Seq("__file"))
      .drop("__file").withColumnRenamed("__mpath", "__file")
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
    val withMeta =
      if (deletes.forall(_.content != 1)) data
      else data.withColumn("__file", normPath(col("_metadata.file_path")))
        .withColumn("__pos", col("_metadata.row_index"))
    applyDeletesPositioned(spark, withMeta, deletes).drop("__file", "__pos")
  }

  /** Delete application over data that already carries normalized `__file`
    * / `__pos` columns (or needs none: no position deletes present). */
  private def applyDeletesPositioned(spark: SparkSession, data: DataFrame,
                                     deletes: Seq[DataFile]): DataFrame = {
    if (deletes.isEmpty) return data
    val current = table.metadata.currentSchema
    def maybeBroadcast(df: DataFrame, files: Seq[DataFile]): DataFrame =
      if (files.map(_.fileSizeInBytes).sum <= BroadcastDeleteBytes) broadcast(df) else df
    var out = data
    for ((ids, group) <- deletes.filter(_.content == 2).groupBy(_.equalityIds.toSet)) {
      val idCols = ids.toSeq.sorted.flatMap(id => current.fieldById(id)).map(_.name)
      if (idCols.nonEmpty) {
        // Iceberg equality deletes treat NULL as a value: a delete row with
        // a null key hides null-key data rows. SQL equality would never
        // match them, so the anti-join must be null-safe (<=>) per column.
        val delDf = spark.read.parquet(group.map(_.filePath): _*)
          .select(idCols.map(c => col(c).as(s"__d_$c")): _*)
        val cond = idCols.map(c => out(c) <=> delDf(s"__d_$c")).reduce(_ && _)
        out = out.join(maybeBroadcast(delDf, group), cond, "left_anti")
      }
    }
    val (dvs, posDeletes) = deletes.filter(_.content == 1).partition(_.isDeletionVector)
    if (posDeletes.nonEmpty || dvs.nonEmpty) {
      // position delete files carry (file_path, pos); renamed on the delete
      // side so a table column named "file_path"/"pos" can never collide
      val parquetDel =
        if (posDeletes.isEmpty) None
        else Some(spark.read.parquet(posDeletes.map(_.filePath): _*)
          .select(normPath(col("file_path")).as("__dfile"), col("pos").as("__dpos")))
      val dvDel = if (dvs.isEmpty) None else Some(dvPositions(spark, dvs))
      val delDf = (parquetDel.toSeq ++ dvDel.toSeq).reduce(_ unionAll _)
      // broadcast sizing: a DV blob expands ~8-30× from compressed bitmap
      // to (string, long) rows, so its byte budget is its content size ×32
      val weighted = posDeletes.map(_.fileSizeInBytes).sum +
        dvs.map(d => d.contentSizeInBytes.getOrElse(d.fileSizeInBytes) * 32).sum
      val sized = if (weighted <= BroadcastDeleteBytes) broadcast(delDf) else delDf
      out = out.join(sized,
          out("__file") === delDf("__dfile") && out("__pos") === delDf("__dpos"),
          "left_anti")
    }
    out
  }

  /** Expand deletion-vector blobs (v3) into `(__dfile, __dpos)` rows. The
    * blob reads happen INSIDE a Spark job — each task does one ranged read
    * of its blob and iterates the roaring bitmap, so a scan over many
    * DV'd files never serializes blob IO on the driver and expanded
    * positions never materialize driver-side. */
  private def dvPositions(spark: SparkSession, dvs: Seq[DataFile]): DataFrame = {
    import graft.puffin.{DeletionVector, Puffin}
    import spark.implicits._
    val confSer = new SerializableHadoopConf(table.hadoopConf)
    val descs = dvs.map(d => (d.filePath, d.contentOffset.getOrElse(0L),
      d.contentSizeInBytes.getOrElse(d.fileSizeInBytes),
      normPathStr(d.referencedDataFile.getOrElse(""))))
    spark.createDataset(descs)
      .repartition(math.min(descs.size, spark.sparkContext.defaultParallelism))
      .flatMap { case (path, off, len, ref) =>
        val p = new Path(path)
        val fs = p.getFileSystem(confSer.value)
        val bitmap = DeletionVector.deserialize(Puffin.readBlob(fs, p, off, len))
        val it = bitmap.getLongIterator
        new Iterator[(String, Long)] {
          def hasNext: Boolean = it.hasNext
          def next(): (String, Long) = (ref, it.next())
        }
      }.toDF("__dfile", "__dpos")
  }

  /**
   * Format-v3 row lineage surface: the scan's rows plus a `_row_id`
   * column (the file's explicit `first_row_id` + the row's ordinal).
   * Stable across merge-on-read DML — deletes/updates via deletion
   * vectors never rewrite surviving rows. Files without lineage metadata
   * (pre-v3 history) read a null `_row_id`.
   */
  def toDFWithRowIds(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val tasks = planFilesDistributed(spark)
    val all = materializeTasks(spark, tasks, withPositions = true)
    val filtered = predicates.foldLeft(all)((d, p) => d.filter(predicateToColumn(p)))
    val mapping = tasks.map(t => (normPathStr(t.filePath),
        t.file.firstRowId.map(java.lang.Long.valueOf).orNull))
      .distinct.toDF("__file", "__first_row_id")
    filtered.join(broadcast(mapping), Seq("__file"), "left")
      .withColumn("_row_id", col("__first_row_id") + col("__pos"))
      .drop("__file", "__pos", "__first_row_id")
  }

  /** URI scheme-slash normalization: Spark's `_metadata.file_path` renders
    * local paths as "file:///x" while Hadoop Path.toString (the manifest
    * form a spec-correct delete writer records) is "file:/x" — normalize
    * both sides or position deletes silently stop applying. */
  private def normPath(c: Column): Column = regexp_replace(c, "^file:/+", "file:/")
  private def normPathStr(s: String): String = s.replaceFirst("^file:/+", "file:/")

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
private[graft] object ScanPruning extends Serializable {

  def keepFile(predicates: Seq[ScanPredicate], df: DataFile,
               spec: PartitionSpec, schema: Schema): Boolean =
    predicates.forall(p => keepByPartition(p, df, spec, schema) && keepByBounds(p, df, schema))

  /** Schema-evolution-aware pruning: predicates name CURRENT-schema
    * columns, but a file's partition values and bounds are keyed by its
    * WRITE-TIME names. Resolve current name → field id → write-time name
    * before pruning, so a scan on a renamed column still skips files. A
    * predicate on a column the write schema lacks means every row of the
    * file reads the column's initial-default (or null) — evaluate the
    * predicate against that constant instead of keeping conservatively. */
  def keepFileEvolved(predicates: Seq[ScanPredicate], df: DataFile, spec: PartitionSpec,
                      writeSchema: Schema, currentSchema: Schema): Boolean = {
    if (writeSchema.schemaId == currentSchema.schemaId)
      return keepFile(predicates, df, spec, writeSchema)
    predicates.forall { p =>
      currentSchema.fieldByName(p.column) match {
        case None => true // not a schema column; downstream filter decides
        case Some(cf) => writeSchema.fieldById(cf.id) match {
          case Some(wf) =>
            val wp = withColumnName(p, wf.name)
            keepByPartition(wp, df, spec, writeSchema) && keepByBounds(wp, df, writeSchema)
          case None => constMatches(p, cf.initialDefault.orNull)
        }
      }
    }
  }

  /**
   * Manifest-level pruning on the manifest list's `partitions` field
   * summaries (spec field 507): skip READING a whole manifest when no
   * file in it can satisfy the predicates. A range check on the transform
   * RESULT is valid for equality under any transform (if `t(v)` is
   * outside [lo, hi], no file holds it); inequalities additionally need
   * an order-preserving transform, same rule as [[keepByPartition]].
   * Conservative everywhere data could hide: absent summaries, unknown
   * bounds, non-schema columns all keep the manifest.
   */
  def keepManifestEvolved(predicates: Seq[ScanPredicate],
                          summaries: Seq[graft.manifest.FieldSummary],
                          spec: PartitionSpec, writeSchema: Schema,
                          currentSchema: Schema): Boolean = {
    if (summaries.isEmpty) return true
    predicates.forall { p =>
      val resolved: Option[ScanPredicate] =
        if (writeSchema.schemaId == currentSchema.schemaId) Some(p)
        else currentSchema.fieldByName(p.column).flatMap(cf =>
          writeSchema.fieldById(cf.id).map(wf => withColumnName(p, wf.name)))
      resolved match {
        // dropped/unknown column: per-file constant check decides later
        case None => true
        case Some(wp) => keepManifestPred(wp, summaries, spec, writeSchema)
      }
    }
  }

  private def keepManifestPred(p: ScanPredicate,
                               summaries: Seq[graft.manifest.FieldSummary],
                               spec: PartitionSpec, schema: Schema): Boolean = {
    val field = schema.fieldByName(p.column).getOrElse(return true)
    spec.fields.zipWithIndex.filter(_._1.sourceId == field.id).forall { case (pf, i) =>
      val sum = summaries.lift(i).getOrElse(return true)
      val transform = Transform.parse(pf.transform)
      val resultType = transform.resultType(field.fieldType)
      def bound(b: Option[Seq[Byte]]): Option[Any] = b.flatMap { bytes =>
        parsePhysical(graft.manifest.SingleValue.fromBytes(resultType, bytes.toArray), resultType)
      }
      val lo = bound(sum.lowerBound)
      val hi = bound(sum.upperBound)
      if (lo.isEmpty && hi.isEmpty) true
      else {
        def within(tv: Any): Boolean =
          (canonNum(tv), lo.flatMap(canonNum), hi.flatMap(canonNum)) match {
            case (Some(x), l, h) => l.forall(x >= _) && h.forall(x <= _)
            case _ => (tv, lo, hi) match {
              case (s: String, l, h) =>
                l.forall { case ls: String => ls <= s; case _ => true } &&
                  h.forall { case hs: String => hs >= s; case _ => true }
              case _ => true
            }
          }
        p match {
          case EqPred(_, v) => within(transform(v, field.fieldType))
          case InPred(_, vs) => vs.exists(v => within(transform(v, field.fieldType)))
          case _ if isMonotonic(transform) =>
            val b = canonNum(transform(valueOf(p), field.fieldType))
            p match {
              // transforms are order-preserving but lossy → inclusive cuts
              case _: LtPred | _: LePred => (b, lo.flatMap(canonNum)) match {
                case (Some(bv), Some(l)) => l <= bv
                case _ => true
              }
              case _: GtPred | _: GePred => (b, hi.flatMap(canonNum)) match {
                case (Some(bv), Some(h)) => h >= bv
                case _ => true
              }
              case _ => true
            }
          case _ => true
        }
      }
    }
  }

  /**
   * STRICT (all-rows) match: true only when EVERY live row of the file
   * provably satisfies every predicate — the overwrite fast path that
   * drops a fully-matched file without ever reading it. Dual of
   * [[keepFileEvolved]] ("some row may match"): here every uncertainty
   * answers false, so a partition-aligned `INSERT OVERWRITE` on a
   * 100 TB table drops the target partition's files from metadata alone.
   *
   * Soundness notes: an identity partition value pins every row's value
   * exactly; column bounds satisfy lower ≤ min ≤ max ≤ upper even when
   * string bounds are truncated (lower==upper==v still implies all rows
   * == v); bounds cover deleted rows too — a superset, so "all rows
   * match" stays valid for the live subset. Float/double columns are
   * excluded outright (NaN breaks bound ordering); files whose null
   * count for the column is unknown or nonzero are never strict.
   */
  def strictFileEvolved(predicates: Seq[ScanPredicate], df: DataFile, spec: PartitionSpec,
                        writeSchema: Schema, currentSchema: Schema): Boolean =
    predicates.nonEmpty &&
      predicates.forall(p => strictPred(p, df, spec, writeSchema, currentSchema))

  private def strictPred(p0: ScanPredicate, df: DataFile, spec: PartitionSpec,
                         writeSchema: Schema, currentSchema: Schema): Boolean = {
    val (p, field) =
      if (writeSchema.schemaId == currentSchema.schemaId) {
        val f = writeSchema.fieldByName(p0.column).getOrElse(return false)
        (p0, f)
      } else {
        val cf = currentSchema.fieldByName(p0.column).getOrElse(return false)
        writeSchema.fieldById(cf.id) match {
          case Some(wf) => (withColumnName(p0, wf.name), wf)
          // column absent from the write schema: every row reads the
          // initial-default constant — strict iff the constant matches
          case None => return constMatches(p0, cf.initialDefault.orNull)
        }
      }
    field.fieldType match {
      case IFloat | IDouble => return false // NaN-unsafe for strict claims
      case _ =>
    }
    val identityVal = spec.fields
      .find(pf => pf.sourceId == field.id && Transform.parse(pf.transform) == IdentityTransform)
      .flatMap(pf => df.partition.get(pf.name))
    identityVal match {
      case Some(raw) if raw.isEmpty => false // all-null partition: no row matches
      case Some(raw) =>
        parseValue(raw, field.fieldType) match {
          case Some(v) => constMatches(p, v)
          case None => boundsStrict(p, df, field)
        }
      case None => boundsStrict(p, df, field)
    }
  }

  private def boundsStrict(p: ScanPredicate, df: DataFile, field: graft.types.NestedField): Boolean = {
    if (!df.nullCounts.get(field.name).contains(0L)) return false // null rows never match
    val lower = df.lowerBounds.get(field.name).flatMap(parsePhysical(_, field.fieldType))
    val upper = df.upperBounds.get(field.name).flatMap(parsePhysical(_, field.fieldType))
    if (lower.isEmpty || upper.isEmpty) return false
    def num(v: Any): Option[BigDecimal] = canonNum(physicalOf(v, field.fieldType))
    def eqAll(v: Any): Boolean =
      (num(v), lower.flatMap(canonNum), upper.flatMap(canonNum)) match {
        case (Some(x), Some(lo), Some(hi)) => x == lo && x == hi
        case _ => (v, lower.get, upper.get) match {
          case (s: String, lo: String, hi: String) => lo == s && hi == s
          case _ => false
        }
      }
    def cmpAll(v: Any, takeUpper: Boolean, ok: Int => Boolean): Boolean = {
      val bound = if (takeUpper) upper else lower
      (num(v), bound.flatMap(canonNum)) match {
        case (Some(x), Some(b)) => ok(b.compare(x))
        case _ => (v, bound.get) match {
          case (s: String, b: String) => ok(b.compareTo(s))
          case _ => false
        }
      }
    }
    p match {
      case EqPred(_, v) => eqAll(v)
      case InPred(_, vs) => vs.exists(eqAll)
      case LtPred(_, v) => cmpAll(v, takeUpper = true, _ < 0)
      case LePred(_, v) => cmpAll(v, takeUpper = true, _ <= 0)
      case GtPred(_, v) => cmpAll(v, takeUpper = false, _ > 0)
      case GePred(_, v) => cmpAll(v, takeUpper = false, _ >= 0)
    }
  }

  private def withColumnName(p: ScanPredicate, name: String): ScanPredicate = p match {
    case EqPred(_, v) => EqPred(name, v)
    case LtPred(_, v) => LtPred(name, v)
    case LePred(_, v) => LePred(name, v)
    case GtPred(_, v) => GtPred(name, v)
    case GePred(_, v) => GePred(name, v)
    case InPred(_, vs) => InPred(name, vs)
  }

  /** Can a row whose column is the constant `v` satisfy `p`? (SQL
    * comparison semantics: anything vs null is false.) */
  private def constMatches(p: ScanPredicate, v: Any): Boolean = {
    if (v == null) return false
    def cmp(x: Any): Option[Int] = (canonNum(v), canonNum(x)) match {
      case (Some(a), Some(b)) => Some(a.compare(b))
      case _ => (v, x) match {
        case (a: String, b: String) => Some(a.compareTo(b))
        case _ => None
      }
    }
    p match {
      case EqPred(_, x) => canonEq(v, x)
      case InPred(_, xs) => xs.exists(canonEq(v, _))
      case LtPred(_, x) => cmp(x).forall(_ < 0)
      case LePred(_, x) => cmp(x).forall(_ <= 0)
      case GtPred(_, x) => cmp(x).forall(_ > 0)
      case GePred(_, x) => cmp(x).forall(_ >= 0)
    }
  }

  /** Plan-time delete-file scoping. Sequence rule per spec (equality:
    * strictly newer; position: same commit counts), then two prunes that
    * keep a delete in one partition from taxing every other partition's
    * scan with an anti-join: (a) a delete file recording a partition tuple
    * applies only within that partition (empty tuple = global — the form
    * external writers commonly produce); (b) a position-delete file's
    * referenced-data-file bounds (`file_path` min/max, spec reserved field
    * 2147483546) exclude data files outside its path range. Both prunes
    * are conservative: absent metadata means "applies". */
  def deleteApplies(del: DataFile, delSeq: Long,
                    data: DataFile, dataSeq: Long): Boolean = {
    val seqOk = if (del.content == 2) delSeq > dataSeq else delSeq >= dataSeq
    if (!seqOk) return false
    // a deletion vector (v3) names its ONE data file exactly — no
    // conservative fallbacks needed
    del.referencedDataFile match {
      case Some(ref) => return normPath(ref) == normPath(data.filePath)
      case None =>
    }
    if (del.partition.exists { case (_, v) => v.nonEmpty } && del.partition != data.partition)
      return false
    if (del.content == 1) {
      val p = normPath(data.filePath)
      del.lowerBounds.get("file_path").forall(lo => normPath(lo) <= p) &&
        del.upperBounds.get("file_path").forall(hi => p <= normPath(hi))
    } else true
  }

  private def normPath(s: String): String = s.replaceFirst("^file:/+", "file:/")

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
private[graft] class SerializableHadoopConf(@transient var value: Configuration)
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
