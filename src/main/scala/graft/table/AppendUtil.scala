package graft.table

import graft._
import graft.functions.GraftFunctions
import graft.meta.{PartitionSpec, SortOrder}
import graft.types._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Write-path helpers: schema alignment (name-based binding + casts, ref
  * `table.rs:343-384`), partition-transform columns, the Parquet write
  * itself, and row-hash → DataFrame coercion (ref `batch.rs:60-174`). */
object AppendUtil {

  /** Bind df columns to the table schema by NAME (column order independent —
    * ref `test/polars_test.rb:58-63`), cast to the table types, null-fill
    * missing optional columns, reject extras and missing required ones. */
  def align(df: DataFrame, schema: Schema): DataFrame = {
    val dfCols = df.columns.toSet
    val schemaCols = schema.fields.map(_.name).toSet
    val extra = dfCols -- schemaCols
    if (extra.nonEmpty)
      throw new InvalidDataError(s"unknown columns: ${extra.mkString(", ")}")
    val projected = schema.fields.map { f =>
      val target = SparkSchemaConverter.toSparkType(f.fieldType)
      if (dfCols.contains(f.name)) col(f.name).cast(target).as(f.name)
      else f.writeDefault match {
        case Some(v) => lit(v).cast(target).as(f.name) // required-with-default ok
        case None if f.required =>
          throw new InvalidDataError(s"missing required column: ${f.name}")
        case None => lit(null).cast(target).as(f.name)
      }
    }
    df.select(projected: _*)
  }

  /** Spark Column computing a partition transform over its source column.
    * Uses our codegen'd expressions for bucket/truncate; built-in functions
    * for the time transforms (all stay inside WholeStageCodegen). */
  def transformColumn(transformStr: String, source: Column, sourceType: IType): Column = {
    import graft.transforms._
    Transform.parse(transformStr) match {
      case IdentityTransform => source
      case BucketTransform(n) => GraftFunctions.iceberg_bucket(n, source)
      case TruncateTransform(w) => GraftFunctions.iceberg_truncate(w, source)
      case YearTransform => (year(source) - lit(1970)).cast("int")
      case MonthTransform => ((year(source) - lit(1970)) * 12 + month(source) - lit(1)).cast("int")
      case DayTransform => datediff(source.cast("date"), to_date(lit("1970-01-01"))).cast("int")
      case HourTransform =>
        // NTZ timestamps reject CAST(... AS BIGINT); EpochMicros reads the
        // physical micros directly (timezone-independent, stays in codegen)
        floor(GraftFunctions.epoch_micros(source) / lit(3600000000L)).cast("int")
      case VoidTransform => lit(null).cast("int")
      case UnknownTransform(_) => lit(null).cast("string")
    }
  }

  private val PartColPrefix = "_p_"

  /**
   * Write the aligned DataFrame as Parquet data files and return manifest
   * entries with footer-derived stats.
   *
   * Scale notes: partitioned writes shuffle on (transform columns, salt) so
   * a hot partition tuple (one day, one bucket) is produced by up to
   * `saltBuckets` tasks instead of one straggler/OOM task, while small
   * partitions still collapse to few files; sort order applies within
   * partitions only (no global sort / range shuffle); files stay where they
   * are written (no rename pass — object-store friendly), the manifest is
   * the source of truth for file paths. The caller passes a fresh
   * per-commit directory so inventorying new files lists only this job's
   * output, never the whole table (O(commit), not O(table)).
   */
  def writeData(aligned: DataFrame, schema: Schema, spec: PartitionSpec,
                sortOrder: SortOrder, dataDir: Path, conf: Configuration,
                targetFileRows: Long = 5000000L,
                saltBuckets: Int = 4): Seq[graft.manifest.DataFile] = {
    val fieldById = schema.fields.map(f => f.id -> f).toMap
    val partCols = spec.fields.map { pf =>
      val src = fieldById.getOrElse(pf.sourceId,
        throw new InvalidDataError(s"partition source id ${pf.sourceId} not in schema"))
      (pf, transformColumn(pf.transform, col(src.name), src.fieldType).as(PartColPrefix + pf.fieldId))
    }

    val sortCols: Seq[Column] = sortOrder.fields.flatMap { sf =>
      fieldById.get(sf.sourceId).map { src =>
        val base = transformColumn(sf.transform, col(src.name), src.fieldType)
        (sf.direction, sf.nullOrder) match {
          case ("asc", "nulls-first") => base.asc_nulls_first
          case ("asc", _) => base.asc_nulls_last
          case (_, "nulls-first") => base.desc_nulls_first
          case _ => base.desc_nulls_last
        }
      }
    }

    val writer =
      if (spec.isUnpartitioned) {
        val sorted = if (sortCols.nonEmpty) aligned.sortWithinPartitions(sortCols: _*) else aligned
        sorted.write.option("maxRecordsPerFile", targetFileRows)
      } else {
        val withParts = partCols.foldLeft(aligned) { case (d, (pf, c)) =>
          d.withColumn(PartColPrefix + pf.fieldId, c)
        }
        val partNames = partCols.map { case (pf, _) => PartColPrefix + pf.fieldId }
        // deterministic salt: spreads a skewed partition tuple over up to
        // saltBuckets tasks; maxRecordsPerFile still bounds file size
        val salt = pmod(xxhash64(aligned.columns.map(col).toSeq: _*), lit(saltBuckets.toLong))
        val shuffled = withParts.repartition(partNames.map(col) :+ salt: _*)
        val sorted = if (sortCols.nonEmpty) shuffled.sortWithinPartitions(sortCols: _*) else shuffled
        sorted.write.partitionBy(partNames: _*).option("maxRecordsPerFile", targetFileRows)
      }
    writer.parquet(dataDir.toString)

    // Inventory what was written; parse partition tuples back from the
    // Hive-style directory names. Listing is scoped to THIS commit's
    // directory (O(files written), not O(table)); footer-stat reads are
    // independent per file and run in parallel — a 10k-file append must
    // not serialize 10k footer round-trips on the driver.
    import scala.collection.parallel.CollectionConverters._
    val fs = dataDir.getFileSystem(conf)
    val nameByFieldId = spec.fields.map(pf => (PartColPrefix + pf.fieldId) -> pf.name).toMap
    val it = fs.listFiles(dataDir, true)
    val listed = scala.collection.mutable.ArrayBuffer[(Path, Long)]()
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet"))
        listed += ((st.getPath, st.getLen))
    }
    listed.toSeq.par.map { case (p, len) =>
      val partition = p.toString.split('/').flatMap { seg =>
        val i = seg.indexOf('=')
        if (i > 0) {
          val k = seg.substring(0, i)
          nameByFieldId.get(k).map { humanName =>
            val raw = unescapePathName(seg.substring(i + 1))
            humanName -> (if (raw == "__HIVE_DEFAULT_PARTITION__") "" else raw)
          }
        } else None
      }.toMap
      val stats = ParquetStats.read(conf, p)
      graft.manifest.DataFile(
        filePath = p.toString,
        fileFormat = "PARQUET",
        partition = partition,
        recordCount = stats.recordCount,
        fileSizeInBytes = len,
        lowerBounds = stats.lowerBounds,
        upperBounds = stats.upperBounds,
        nullCounts = stats.nullCounts)
    }.seq
  }

  /** Write position-delete files (spec content=1: rows of `(file_path,
    * pos)`, sorted by file then ordinal). One shuffle on `file_path` keeps
    * every delete file covering a contiguous run of data files, so the
    * read-side anti-join stream-matches instead of spraying. Cost is
    * O(matched rows) — the whole point of merge-on-read DML: a selective
    * DELETE on a 100 TB table writes kilobytes, not rewritten gigabytes.
    * Empty parts are dropped from the inventory (no rows ⇒ no commit). */
  def writePositionDeletes(posDf: DataFrame, dir: Path, conf: Configuration,
                           targetFileRows: Long = 5000000L): Seq[graft.manifest.DataFile] = {
    import scala.collection.parallel.CollectionConverters._
    // RANGE partitioning (not hash): each delete file then covers a
    // lexicographically contiguous run of data-file paths, so the recorded
    // file_path bounds are tight and plan-time delete scoping
    // (ScanPruning.deleteApplies) attaches each delete file to only the
    // data files it can reference — a hash shuffle would smear every
    // file's bounds across the whole path range.
    val shaped = posDf
      .select(col("file_path").cast("string").as("file_path"), col("pos").cast("long").as("pos"))
      .repartitionByRange(col("file_path"), col("pos"))
      .sortWithinPartitions("file_path", "pos")
    shaped.write.option("maxRecordsPerFile", targetFileRows).parquet(dir.toString)
    val fs = dir.getFileSystem(conf)
    val it = fs.listFiles(dir, true)
    val listed = scala.collection.mutable.ArrayBuffer[(Path, Long)]()
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet"))
        listed += ((st.getPath, st.getLen))
    }
    listed.toSeq.par.flatMap { case (p, len) =>
      val stats = ParquetStats.read(conf, p)
      if (stats.recordCount == 0L) None
      else Some(graft.manifest.DataFile(
        filePath = p.toString,
        fileFormat = "PARQUET",
        partition = Map.empty,
        recordCount = stats.recordCount,
        fileSizeInBytes = len,
        // referenced-data-file bounds (spec reserved field 2147483546):
        // the only bounds a position-delete file carries
        lowerBounds = stats.lowerBounds.view.filterKeys(_ == "file_path").toMap,
        upperBounds = stats.upperBounds.view.filterKeys(_ == "file_path").toMap,
        content = 1))
    }.seq
  }

  /** Write equality-delete files (spec content=2): rows are the key tuples
    * whose OLDER versions become invisible; `equalityIds` records which
    * field ids the equality is over. The upsert primitive: a delete file
    * at sequence N hides matching rows in data files with sequence < N,
    * while same-commit data files (sequence N) are untouched — so one
    * commit of (equality deletes + new rows) is an atomic last-wins
    * upsert, O(batch) cost regardless of table size. */
  def writeEqualityDeletes(keysDf: DataFrame, keyFields: Seq[graft.types.NestedField],
                           dir: Path, conf: Configuration,
                           targetFileRows: Long = 5000000L): Seq[graft.manifest.DataFile] = {
    import scala.collection.parallel.CollectionConverters._
    val keyNames = keyFields.map(_.name)
    keysDf.select(keyNames.map(col): _*).distinct()
      .write.option("maxRecordsPerFile", targetFileRows).parquet(dir.toString)
    val fs = dir.getFileSystem(conf)
    val it = fs.listFiles(dir, true)
    val listed = scala.collection.mutable.ArrayBuffer[(Path, Long)]()
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet"))
        listed += ((st.getPath, st.getLen))
    }
    val keySet = keyNames.toSet
    listed.toSeq.par.flatMap { case (p, len) =>
      val stats = ParquetStats.read(conf, p)
      if (stats.recordCount == 0L) None
      else Some(graft.manifest.DataFile(
        filePath = p.toString,
        fileFormat = "PARQUET",
        partition = Map.empty,
        recordCount = stats.recordCount,
        fileSizeInBytes = len,
        lowerBounds = stats.lowerBounds.view.filterKeys(keySet).toMap,
        upperBounds = stats.upperBounds.view.filterKeys(keySet).toMap,
        content = 2,
        equalityIds = keyFields.map(_.id)))
    }.seq
  }

  /**
   * Bit-interleaved z-order value over up to 4 columns, composed from
   * built-in (codegen'd) bit ops: each column is normalized to a 16-bit
   * rank within its [min, max] range, then bit j of dimension i lands at
   * position j*k+i. Rows close in z-value are close in EVERY dimension,
   * so range-partitioning by this column gives files whose bounds are
   * tight on all clustered columns at once — multi-dimensional pruning
   * from one layout. NULLs rank at the minimum.
   */
  def zorderColumn(cols: Seq[Column], mins: Seq[Double], maxs: Seq[Double]): Column = {
    require(cols.nonEmpty && cols.size <= 4, "zorder takes 1-4 columns")
    val k = cols.size
    val norms = cols.zipWithIndex.map { case (c, i) =>
      val range = maxs(i) - mins(i)
      if (range <= 0 || range.isNaN) lit(0L)
      else least(lit(65535L), greatest(lit(0L),
        ((coalesce(c.cast("double"), lit(mins(i))) - mins(i)) / range * 65535.0)
          .cast("long")))
    }
    val terms = for {
      j <- 0 until 16
      i <- 0 until k
    } yield shiftleft(shiftright(norms(i), j).bitwiseAND(lit(1L)), j * k + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Inverse of Hive's escapePathName (%xx sequences). */
  def unescapePathName(s: String): String = {
    if (!s.contains('%')) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        try {
          sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
          i += 3
        } catch { case _: NumberFormatException => sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // ------------------------------------------------- row-hash append path

  /** Convert row hashes to a DataFrame with the reference's coercion rules
    * (`batch.rs:60-174`): missing column → null; decimals accept
    * Integer/Float/String; wrong types raise InvalidDataError. */
  def rowsToDF(spark: SparkSession, rows: Seq[Map[String, Any]], schema: Schema): DataFrame = {
    val sparkSchema = SparkSchemaConverter.toSpark(schema)
    val sparkRows: Seq[Row] = rows.map { m =>
      val unknown = m.keySet -- schema.fields.map(_.name).toSet
      if (unknown.nonEmpty)
        throw new InvalidDataError(s"unknown columns: ${unknown.mkString(", ")}")
      Row.fromSeq(schema.fields.map { f =>
        coerce(m.getOrElse(f.name, null), f.fieldType, f.name)
      })
    }
    // row-hash appends are driver-built small batches: one task → one data
    // file, matching the reference's single rolling writer (1 append ⇒ 1
    // file, `test/table_scan_test.rb:4-7`); df appends keep their partitioning
    spark.createDataFrame(sparkRows.asJava, sparkSchema).coalesce(1)
  }

  def coerce(v: Any, t: IType, field: String): Any = {
    if (v == null) return null
    def bad(): Nothing =
      throw new InvalidDataError(s"can't convert $v (${v.getClass.getSimpleName}) to $t for column $field")
    t match {
      case IBoolean => v match { case b: Boolean => b; case _ => bad() }
      case IInt => v match {
        case i: Int => i
        case l: Long if l.isValidInt => l.toInt
        case _ => bad()
      }
      case ILong => v match { case l: Long => l; case i: Int => i.toLong; case _ => bad() }
      case IFloat => v match { case f: Float => f; case d: Double => d.toFloat; case i: Int => i.toFloat; case _ => bad() }
      case IDouble => v match { case d: Double => d; case f: Float => f.toDouble; case i: Int => i.toDouble; case l: Long => l.toDouble; case _ => bad() }
      case IDecimal(p, s) =>
        val bd = v match {
          case d: java.math.BigDecimal => d
          case d: BigDecimal => d.bigDecimal
          case i: Int => java.math.BigDecimal.valueOf(i.toLong)
          case l: Long => java.math.BigDecimal.valueOf(l)
          case d: Double => java.math.BigDecimal.valueOf(d)
          case str: String =>
            try new java.math.BigDecimal(str)
            catch { case _: NumberFormatException => bad() }
          case _ => bad()
        }
        bd.setScale(s, java.math.RoundingMode.UNNECESSARY)
      case IDate => v match {
        case d: java.sql.Date => d
        case d: java.time.LocalDate => d
        case _ => bad()
      }
      case ITime => v match {
        case l: Long => l
        case t: java.time.LocalTime => t.toNanoOfDay / 1000L
        case _ => bad()
      }
      case ITimestamp | ITimestampNano => v match {
        case t: java.time.LocalDateTime => t
        case ts: java.sql.Timestamp => ts.toLocalDateTime
        case i: java.time.Instant => java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC)
        case _ => bad()
      }
      case ITimestampTz | ITimestampTzNano => v match {
        case i: java.time.Instant => i
        case ts: java.sql.Timestamp => ts.toInstant
        case t: java.time.LocalDateTime => t.toInstant(java.time.ZoneOffset.UTC)
        case _ => bad()
      }
      case IString | IUuid => v match { case s: String => s; case _ => bad() }
      case IBinary | IFixed(_) => v match {
        case b: Array[Byte] => b
        case s: String => s.getBytes("UTF-8")
        case _ => bad()
      }
      case IStruct(fields) => v match {
        case m: Map[_, _] =>
          val mm = m.asInstanceOf[Map[String, Any]]
          Row.fromSeq(fields.map(f => coerce(mm.getOrElse(f.name, null), f.fieldType, s"$field.${f.name}")))
        case r: Row => r
        case _ => bad()
      }
      case IList(_, e, _) => v match {
        case s: Seq[_] => s.map(x => coerce(x, e, field))
        case _ => bad()
      }
      case IMap(_, k, _, vt, _) => v match {
        case m: Map[_, _] => m.map { case (kk, vv) =>
          coerce(kk, k, field) -> coerce(vv, vt, field)
        }
        case _ => bad()
      }
    }
  }
}
