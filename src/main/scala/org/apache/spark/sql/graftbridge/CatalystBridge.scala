package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Two more `private[sql]` re-exports (see [[ColumnBridge]] for why this
  * file lives in the spark namespace): materializing a resolved logical
  * plan as a DataFrame (the MERGE source), and converting a Catalyst
  * literal's internal value (UTF8String, day-int, micros-long) to the
  * external Scala value our scan predicates carry. */
object CatalystBridge {
  def dataFrame(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def literalToScala(value: Any, dataType: org.apache.spark.sql.types.DataType): Any =
    CatalystTypeConverters.convertToScala(value, dataType)

  /** The session's CatalogManager (private[sql]) — parser-injected DDL
    * resolves its raw identifiers against it at planning time. */
  def catalogManager(spark: SparkSession): org.apache.spark.sql.connector.catalog.CatalogManager =
    spark.asInstanceOf[classic.SparkSession].sessionState.catalogManager

  /** Re-tag a batch DataFrame as streaming (private[sql]
    * internalCreateDataFrame) — what a V1 streaming Source must return
    * from getBatch. The physical rows are the batch plan's own RDD, taken
    * lazily. */
  def asStreamingDataFrame(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      df.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]].queryExecution.toRdd,
      df.schema, isStreaming = true)
  }

  /** The inverse: a V1 Sink's addBatch frame arrives streaming-tagged and
    * refuses batch writes; rebind its micro-batch rows as a batch frame. */
  def asBatchDataFrame(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      df.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]].queryExecution.toRdd,
      df.schema)
  }

  /** Plan-truncating leaf over the INTERNAL row RDD — the same LogicalRDD
    * wrap as [[asBatchDataFrame]], named for its other use: replacing an
    * iterative round's Catalyst plan with a leaf. The public equivalent
    * `createDataFrame(df.rdd, schema)` pays a full per-row decode to
    * external Row plus a re-encode back to InternalRow on every
    * materialization; `toRdd` keeps rows internal end-to-end (the
    * downstream RDDScanExec re-projects to UnsafeRow itself, so row reuse
    * is handled by the normal operator contract). */
  def planTruncatedLeaf(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      df.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]].queryExecution.toRdd,
      df.schema)
  }
}
