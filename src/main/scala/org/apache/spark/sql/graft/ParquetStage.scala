package org.apache.spark.sql.graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Executor-side parquet staging for `InternalRow`s — the write half a
  * DataSource V2 delta write needs ([[graft.sources.VersionedCatalog]]'s
  * SQL `UPDATE`/`MERGE INTO` path): each writer TASK streams the rows
  * the engine hands it straight into a parquet file under the table's
  * staging directory, and only file PATHS travel back to the driver in
  * commit messages. Nothing row-shaped ever funnels through the driver,
  * so the path scales with executors, not with the statement's delta.
  *
  * Built on Spark's own [[ParquetWriteSupport]] (the exact consumer
  * `spark.write.parquet` uses), so staged files round-trip through
  * `spark.read.parquet` with full type fidelity — nested structs,
  * arrays, decimals, timestamps. The bridge lives under
  * `org.apache.spark.sql` for [[SerializableConfiguration]]
  * (`private[spark]`), the same one-forwarding-object pattern as
  * [[StreamBridge]]/[[ExprBridge]]. */
object ParquetStage {

  /** The Hadoop conf, wrapped serializable for the writer factory the
    * engine ships to tasks. */
  def carryConf(conf: Configuration): SerializableConfiguration =
    new SerializableConfiguration(conf)

  /** Open one staged parquet file for `schema`-shaped internal rows.
    * The write-support keys [[ParquetWriteSupport.init]] asserts on are
    * pinned here (modern layout, proleptic-Gregorian timestamps —
    * matching what the session's own parquet writes produce under
    * default conf), so staging never depends on task-side SQLConf. */
  def open(path: String, schema: StructType,
           conf: Configuration): ParquetWriter[InternalRow] = {
    val c = new Configuration(conf)
    ParquetWriteSupport.setSchema(schema, c)
    c.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key, "false")
    c.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key, "TIMESTAMP_MICROS")
    c.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    c.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    c.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key, "false")
    c.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key, "false")
    new ParquetWriter[InternalRow](
      new Path(path), new ParquetWriteSupport,
      CompressionCodecName.SNAPPY,
      ParquetWriter.DEFAULT_BLOCK_SIZE, ParquetWriter.DEFAULT_PAGE_SIZE,
      ParquetWriter.DEFAULT_PAGE_SIZE,
      ParquetWriter.DEFAULT_IS_DICTIONARY_ENABLED,
      ParquetWriter.DEFAULT_IS_VALIDATING_ENABLED,
      ParquetWriter.DEFAULT_WRITER_VERSION, c)
  }
}
