package graft.spark

import graft.table.{Table => GTable}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.Sink

/**
 * Streaming SINK over a graft table:
 * {{{
 * df.writeStream.format("graft")
 *   .option("warehouse", "/wh").option("table", "ns.t")
 *   .option("checkpointLocation", cp).start()
 * }}}
 * Each micro-batch commits atomically; the batch id and the query scope
 * land in the snapshot summary, so a replayed batch (foreachBatch /
 * V1 sinks are at-least-once) is detected and skipped — effectively
 * exactly-once per batch, the txnAppId/txnVersion pattern. With
 * `merge-keys` (comma-separated) each batch upserts on those keys
 * (equality deletes + append, O(batch) regardless of table size); with
 * `branch`, batches stage on that branch for write-audit-publish.
 *
 * The warehouse+table options name a Hadoop-catalog table (a bare table
 * dir has no committing catalog).
 */
class GraftStreamSink(parameters: Map[String, String]) extends Sink {

  private def required(k: String): String = parameters.getOrElse(k,
    throw new graft.InvalidDataError(
      s"writeStream format(\"graft\") requires option '$k'"))

  private val warehouse = required("warehouse")
  private val tableName = required("table")
  private val branch = parameters.getOrElse("branch", "main")
  private val mergeKeys: Seq[String] = parameters.get("merge-keys")
    .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
  // Batch ids are only meaningful WITHIN one query's lifecycle; replay
  // detection is scoped by the query id Spark persists at
  // <checkpoint>/metadata — NOT by the checkpoint path string: a fresh
  // query reusing a wiped checkpoint path restarts batch ids at 0, and a
  // path-keyed scope would silently drop its first batches as "already
  // committed". No checkpointLocation option = no stable identity to
  // scope by, so it is required (the sink never falls back to a
  // table-global scope for the same reason).
  private val checkpointLoc = required("checkpointLocation")

  private def loadTable(): GTable =
    new graft.catalog.HadoopCatalog(warehouse).loadTable(tableName)

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val table = loadTable()
    val scope = graft.streaming.StreamingOps
      .queryScope(data.sparkSession, checkpointLoc)
    val already = graft.streaming.StreamingOps
      .lastCommittedBatchId(table, scope).exists(_ >= batchId)
    if (already) return
    val summary = Map(
      "streaming-query-id" -> scope,
      "streaming-batch-id" -> batchId.toString)
    // the V1 sink hands a streaming-tagged view of the micro-batch; rebind
    // it as a batch frame, then commit like the programmatic paths do
    val batch = org.apache.spark.sql.graftbridge.CatalystBridge.asBatchDataFrame(data)
    if (mergeKeys.nonEmpty)
      table.upsert(batch.sparkSession, batch, mergeKeys, extraSummary = summary)
    else if (branch == "main") table.append(batch, summary)
    else table.appendToBranch(branch, batch, summary)
  }

  override def toString: String = s"GraftStreamSink($warehouse/$tableName)"
}
