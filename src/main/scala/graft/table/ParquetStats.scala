package graft.table

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

import scala.jdk.CollectionConverters._
import scala.util.Try

/** Per-file stats pulled from Parquet footers after a write — row count plus
  * per-column min/max/null-count, recorded into the manifest so scans can
  * skip files without opening them (the same role as Iceberg's data-file
  * stats; ref `table.rs:83-112` collects these from its writer). */
object ParquetStats {
  final case class FileStats(
      recordCount: Long,
      lowerBounds: Map[String, String],
      upperBounds: Map[String, String],
      nullCounts: Map[String, Long])

  def read(conf: Configuration, file: Path): FileStats = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala
      val recordCount = blocks.map(_.getRowCount).sum
      val lower = scala.collection.mutable.Map[String, String]()
      val upper = scala.collection.mutable.Map[String, String]()
      val nulls = scala.collection.mutable.Map[String, Long]()
      for (block <- blocks; col <- block.getColumns.asScala) {
        // only top-level primitive columns
        if (col.getPath.size == 1) {
          val name = col.getPath.toDotString
          val st = col.getStatistics
          if (st != null && !st.isEmpty) {
            nulls(name) = nulls.getOrElse(name, 0L) + st.getNumNulls
            if (st.hasNonNullValue) {
              val (mn, mx) = boundsOf(col.getPrimitiveType.getPrimitiveTypeName, st)
              for (m <- mn) lower(name) = lower.get(name).fold(m)(prev => minStr(prev, m))
              for (m <- mx) upper(name) = upper.get(name).fold(m)(prev => maxStr(prev, m))
            }
          }
        }
      }
      FileStats(recordCount, lower.toMap, upper.toMap, nulls.toMap)
    } finally reader.close()
  }

  private def boundsOf(t: org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName,
                       st: org.apache.parquet.column.statistics.Statistics[_]): (Option[String], Option[String]) =
    Try {
      t match {
        case INT32 | INT64 | FLOAT | DOUBLE | BOOLEAN =>
          (Some(st.genericGetMin.toString), Some(st.genericGetMax.toString))
        case BINARY =>
          val mn = st.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary]
          val mx = st.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary]
          (Some(mn.toStringUsingUTF8), Some(mx.toStringUsingUTF8))
        case _ => (None, None)
      }
    }.getOrElse((None, None))

  /** Bounds compare as numbers when both parse, else lexicographically. */
  private def minStr(a: String, b: String): String =
    if (numLt(a, b).getOrElse(a < b)) a else b
  private def maxStr(a: String, b: String): String =
    if (numLt(a, b).getOrElse(a < b)) b else a
  private def numLt(a: String, b: String): Option[Boolean] =
    Try(BigDecimal(a) < BigDecimal(b)).toOption
}
