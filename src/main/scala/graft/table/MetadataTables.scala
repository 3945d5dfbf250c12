package graft.table

import graft.manifest.Manifests
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/**
 * SQL-queryable metadata tables over a graft [[Table]] — the Spark-idiomatic
 * exposure of the §2.4 metadata accessors (like Spark-Iceberg's
 * `t.snapshots` / `t.files` / `t.history`): small driver-built DataFrames,
 * so `spark.sql` can join table data against its own lineage.
 */
object MetadataTables {

  private def df(spark: SparkSession, schema: StructType, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(rows.asJava, schema)

  def snapshots(spark: SparkSession, table: Table): DataFrame = {
    val schema = StructType(Seq(
      StructField("committed_at", TimestampType, nullable = false),
      StructField("snapshot_id", LongType, nullable = false),
      StructField("parent_id", LongType, nullable = true),
      StructField("sequence_number", LongType, nullable = false),
      StructField("operation", StringType, nullable = true),
      StructField("manifest_list", StringType, nullable = false),
      StructField("summary", MapType(StringType, StringType), nullable = false)))
    df(spark, schema, table.snapshots.map { s =>
      Row(new java.sql.Timestamp(s.timestampMs), s.snapshotId,
        s.parentSnapshotId.orNull, s.sequenceNumber,
        s.summary.getOrElse("operation", null), s.manifestList, s.summary)
    })
  }

  def history(spark: SparkSession, table: Table): DataFrame = {
    val currentAncestors: Set[Long] = {
      // walk parent links from the current snapshot
      val byId = table.snapshots.map(s => s.snapshotId -> s).toMap
      Iterator.iterate(table.currentSnapshot)(s =>
        s.flatMap(_.parentSnapshotId).flatMap(byId.get))
        .takeWhile(_.isDefined).flatten.map(_.snapshotId).toSet
    }
    val schema = StructType(Seq(
      StructField("made_current_at", TimestampType, nullable = false),
      StructField("snapshot_id", LongType, nullable = false),
      StructField("is_current_ancestor", BooleanType, nullable = false)))
    df(spark, schema, table.history.map { e =>
      Row(new java.sql.Timestamp(e.timestampMs), e.snapshotId,
        currentAncestors.contains(e.snapshotId))
    })
  }

  def manifests(spark: SparkSession, table: Table): DataFrame = {
    val schema = StructType(Seq(
      StructField("path", StringType, nullable = false),
      StructField("length", LongType, nullable = false),
      StructField("partition_spec_id", IntegerType, nullable = false),
      StructField("added_snapshot_id", LongType, nullable = false),
      StructField("added_data_files_count", IntegerType, nullable = false),
      StructField("added_rows_count", LongType, nullable = false),
      StructField("content", IntegerType, nullable = false)))
    val rows = table.currentSnapshot.toSeq.flatMap { s =>
      val listPath = new Path(s.manifestList)
      val fs = listPath.getFileSystem(table.hadoopConf)
      Manifests.readManifestList(fs, listPath).map { m =>
        Row(m.manifestPath, m.manifestLength, m.partitionSpecId,
          m.addedSnapshotId, m.addedFilesCount, m.addedRowsCount, m.content)
      }
    }
    df(spark, schema, rows)
  }

  def files(spark: SparkSession, table: Table): DataFrame = {
    val schema = StructType(Seq(
      StructField("content", IntegerType, nullable = false),
      StructField("file_path", StringType, nullable = false),
      StructField("file_format", StringType, nullable = false),
      StructField("partition", MapType(StringType, StringType), nullable = false),
      StructField("record_count", LongType, nullable = false),
      StructField("file_size_in_bytes", LongType, nullable = false),
      StructField("null_counts", MapType(StringType, LongType), nullable = false),
      StructField("lower_bounds", MapType(StringType, StringType), nullable = false),
      StructField("upper_bounds", MapType(StringType, StringType), nullable = false)))
    val rows = table.scan().planFiles().map { t =>
      val f = t.file
      Row(f.content, f.filePath, f.fileFormat, f.partition, f.recordCount,
        f.fileSizeInBytes, f.nullCounts, f.lowerBounds, f.upperBounds)
    }
    df(spark, schema, rows)
  }

  /** Per-partition roll-up of the live files (Iceberg's `t.partitions`):
    * file/record/byte counts keyed by the partition tuple. Computed from
    * the already-planned file list — no data read. */
  def partitions(spark: SparkSession, table: Table): DataFrame = {
    val schema = StructType(Seq(
      StructField("partition", MapType(StringType, StringType), nullable = false),
      StructField("spec_id", IntegerType, nullable = false),
      StructField("file_count", LongType, nullable = false),
      StructField("record_count", LongType, nullable = false),
      StructField("total_size_in_bytes", LongType, nullable = false)))
    val rows = table.scan().planFiles()
      .groupBy(t => (t.file.partition, t.specId)).toSeq
      .sortBy(_._1._1.toSeq.sorted.mkString(","))
      .map { case ((part, specId), group) =>
        Row(part, specId, group.size.toLong,
          group.map(_.recordCount).sum,
          group.map(_.file.fileSizeInBytes).sum)
      }
    df(spark, schema, rows)
  }

  /** Committed table-statistics files ([[Table.analyze]]): one row per
    * statistics entry, blob metadata flattened to (type, fields,
    * properties) structs — `properties['ndv']` is the interop distinct
    * count. Metadata-only, nothing is read from the Puffin files. */
  def statisticsTable(spark: SparkSession, table: Table): DataFrame = {
    val blobType = StructType(Seq(
      StructField("type", StringType, nullable = false),
      StructField("fields", ArrayType(IntegerType, containsNull = false), nullable = false),
      StructField("properties", MapType(StringType, StringType), nullable = false)))
    val schema = StructType(Seq(
      StructField("snapshot_id", LongType, nullable = false),
      StructField("statistics_path", StringType, nullable = false),
      StructField("file_size_in_bytes", LongType, nullable = false),
      StructField("file_footer_size_in_bytes", LongType, nullable = false),
      StructField("blob_metadata", ArrayType(blobType, containsNull = false), nullable = false)))
    val rows = table.statistics.sortBy(s => (s.snapshotId, s.statisticsPath))
      .map { s =>
        Row(s.snapshotId, s.statisticsPath, s.fileSizeInBytes,
          s.fileFooterSizeInBytes,
          s.blobMetadata.map { bm =>
            Row(bm.getOrElse("type", "").toString,
              bm.getOrElse("fields", Seq.empty[Int]).asInstanceOf[Seq[Int]],
              bm.getOrElse("properties", Map.empty[String, String])
                .asInstanceOf[Map[String, String]])
          })
      }
    df(spark, schema, rows)
  }

  /** Committed partition-statistics files ([[Table.analyzePartitions]]):
    * one row per entry. The roll-up content itself is the referenced
    * parquet file — read it with `spark.read.parquet(statistics_path)`. */
  def partitionStatisticsTable(spark: SparkSession, table: Table): DataFrame = {
    val schema = StructType(Seq(
      StructField("snapshot_id", LongType, nullable = false),
      StructField("statistics_path", StringType, nullable = false),
      StructField("file_size_in_bytes", LongType, nullable = false)))
    val rows = table.partitionStatistics
      .sortBy(s => (s.snapshotId, s.statisticsPath))
      .map(s => Row(s.snapshotId, s.statisticsPath, s.fileSizeInBytes))
    df(spark, schema, rows)
  }

  /** Entry-level view of the current snapshot's manifests (Iceberg's
    * `t.entries`): one row per manifest entry INCLUDING the tombstoned
    * ones (`status = 2`) — this is where "which commit deleted that file"
    * is answered. Ordered by (file_path, status) for determinism. */
  def entries(spark: SparkSession, table: Table): DataFrame = {
    val schema = StructType(Seq(
      StructField("status", IntegerType, nullable = false),
      StructField("snapshot_id", LongType, nullable = false),
      StructField("sequence_number", LongType, nullable = false),
      StructField("content", IntegerType, nullable = false),
      StructField("file_path", StringType, nullable = false),
      StructField("partition", MapType(StringType, StringType), nullable = false),
      StructField("record_count", LongType, nullable = false),
      StructField("file_size_in_bytes", LongType, nullable = false)))
    val rows = table.currentSnapshot.toSeq.flatMap { s =>
      val listPath = new Path(s.manifestList)
      val fs = listPath.getFileSystem(table.hadoopConf)
      Manifests.readManifestList(fs, listPath).flatMap { m =>
        Manifests.readManifest(fs, new Path(m.manifestPath)).map { e =>
          Row(e.status, e.snapshotId, e.sequenceNumber, e.dataFile.content,
            e.dataFile.filePath, e.dataFile.partition, e.dataFile.recordCount,
            e.dataFile.fileSizeInBytes)
        }
      }
    }.sortBy(r => (r.getString(4), r.getInt(0)))
    df(spark, schema, rows)
  }

  /** Manifests of EVERY snapshot still in metadata (Iceberg's
    * `t.all_manifests`): the per-snapshot rows carry
    * `reference_snapshot_id`, so a manifest shared by five snapshots
    * appears five times — that is the table's reuse structure, visible. */
  def allManifests(spark: SparkSession, table: Table): DataFrame = {
    val schema = StructType(Seq(
      StructField("reference_snapshot_id", LongType, nullable = false),
      StructField("path", StringType, nullable = false),
      StructField("length", LongType, nullable = false),
      StructField("partition_spec_id", IntegerType, nullable = false),
      StructField("added_snapshot_id", LongType, nullable = false),
      StructField("content", IntegerType, nullable = false)))
    val rows = table.snapshots.sortBy(s => (s.sequenceNumber, s.snapshotId)).flatMap { s =>
      val listPath = new Path(s.manifestList)
      val fs = listPath.getFileSystem(table.hadoopConf)
      Manifests.readManifestList(fs, listPath).map { m =>
        Row(s.snapshotId, m.manifestPath, m.manifestLength, m.partitionSpecId,
          m.addedSnapshotId, m.content)
      }
    }
    df(spark, schema, rows)
  }

  /** Files referenced from ANY snapshot still in metadata (Iceberg's
    * `all_files` family): every distinct manifest is read once, live
    * entries surface once per file path (first appearance wins — paths
    * are content-addressed and immutable, duplicates carry identical
    * stats). This is the "what can removeOrphanFiles never touch" view. */
  def allFiles(spark: SparkSession, table: Table): DataFrame = {
    val schema = StructType(Seq(
      StructField("content", IntegerType, nullable = false),
      StructField("file_path", StringType, nullable = false),
      StructField("file_format", StringType, nullable = false),
      StructField("partition", MapType(StringType, StringType), nullable = false),
      StructField("record_count", LongType, nullable = false),
      StructField("file_size_in_bytes", LongType, nullable = false)))
    val manifestPaths = scala.collection.mutable.LinkedHashSet[String]()
    table.snapshots.sortBy(s => (s.sequenceNumber, s.snapshotId)).foreach { s =>
      val listPath = new Path(s.manifestList)
      val fs = listPath.getFileSystem(table.hadoopConf)
      Manifests.readManifestList(fs, listPath).foreach(m => manifestPaths += m.manifestPath)
    }
    val seen = scala.collection.mutable.HashSet[String]()
    val rows = manifestPaths.toSeq.flatMap { mp =>
      val p = new Path(mp)
      val fs = p.getFileSystem(table.hadoopConf)
      Manifests.readManifest(fs, p).collect {
        case e if e.isLive && seen.add(e.dataFile.filePath) =>
          Row(e.dataFile.content, e.dataFile.filePath, e.dataFile.fileFormat,
            e.dataFile.partition, e.dataFile.recordCount, e.dataFile.fileSizeInBytes)
      }
    }.sortBy(_.getString(1))
    df(spark, schema, rows)
  }

  /** The metadata-file lineage (Iceberg's `t.metadata_log_entries`): one
    * row per superseded metadata.json, in supersession order. File-backed
    * catalogs append on every commit; in-memory tables have no files and
    * show an empty log. */
  def metadataLogEntries(spark: SparkSession, table: Table): DataFrame = {
    val schema = StructType(Seq(
      StructField("timestamp", TimestampType, nullable = false),
      StructField("file", StringType, nullable = false)))
    df(spark, schema, table.metadata.metadataLog.map(e =>
      Row(new java.sql.Timestamp(e.timestampMs), e.metadataFile)))
  }

  def refs(spark: SparkSession, table: Table): DataFrame = {
    val schema = StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("type", StringType, nullable = false),
      StructField("snapshot_id", LongType, nullable = false)))
    df(spark, schema, table.metadata.refs.toSeq.sortBy(_._1).map { case (n, r) =>
      Row(n, r.refType, r.snapshotId)
    })
  }
}
