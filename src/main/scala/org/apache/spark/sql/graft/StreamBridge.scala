package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{SparkSession => ClassicSparkSession}
import org.apache.spark.sql.types.StructType

/** Bridge into Spark's `private[sql]` streaming-batch constructor.
  *
  * A v1 streaming [[org.apache.spark.sql.execution.streaming.Source]]
  * must hand `getBatch` results back with `isStreaming = true` — the
  * micro-batch engine asserts it — and the only constructor that sets
  * the flag, `SparkSession.internalCreateDataFrame`, is `private[sql]`.
  * Every external v1 connector (the Delta streaming source being the
  * best-known) reaches it the same way: one tiny object compiled into
  * the `org.apache.spark.sql` package. Nothing else in this repository
  * lives outside the `graft` namespace, and nothing here does more than
  * forward the call. */
object StreamBridge {

  /** `rows` (already in the table's internal representation, e.g. from
    * `df.queryExecution.toRdd`) as a STREAMING DataFrame of `schema`. */
  def streamingBatch(spark: SparkSession, schema: StructType,
                     rows: RDD[InternalRow]): DataFrame =
    spark.asInstanceOf[ClassicSparkSession]
      .internalCreateDataFrame(rows, schema, isStreaming = true)

  /** The inverse direction, for a v1 streaming SINK: the DataFrame a
    * `Sink.addBatch` receives is bound to the engine's incremental
    * execution and must not be re-planned by batch writers — the
    * established pattern (FileStreamSink does the same) is to lift its
    * `queryExecution.toRdd` back into a plain BATCH DataFrame. */
  def batchFrame(spark: SparkSession, schema: StructType,
                 rows: RDD[InternalRow]): DataFrame =
    spark.asInstanceOf[ClassicSparkSession]
      .internalCreateDataFrame(rows, schema, isStreaming = false)
}
