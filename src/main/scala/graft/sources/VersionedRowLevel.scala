package graft.sources

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.graft.ParquetStage
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

import _root_.graft.operators.Versioned

/** SQL `UPDATE` / `MERGE INTO` / general-predicate `DELETE` on a
  * catalog-registered versioned table — the DataSource V2 row-level
  * operation surface ([[org.apache.spark.sql.connector.write.SupportsDelta]]),
  * DELTA-based: the engine's rewrite feeds this operation ONLY the
  * changed rows (delete ids, updated rows, inserted rows), never the
  * unmatched remainder — at 100 TB an UPDATE touching 0.01% of rows
  * moves 0.01% of the data, where a group-based (copy-on-write-in-the-
  * engine) rewrite would rewrite every row of every matched file
  * through the query plan.
  *
  * Dataflow, built to never funnel rows through the driver:
  *   1. the engine scans the table (the same pinned [[VersionedRelation]]
  *      path every read uses — DV masks, rename map, manifest pruning),
  *      joins/filters per the statement, and hands each writer TASK its
  *      partition of the delta;
  *   2. each task streams its rows straight into staged parquet under
  *      `<table>/_staged/` ([[ParquetStage]]) — an upsert file (updated
  *      + inserted rows, full row schema) and a delete-id file (row-id
  *      schema); only FILE PATHS ride the commit messages;
  *   3. the driver commit reads the staged files back (a distributed
  *      parquet read) and lands everything as ONE atomic
  *      [[Versioned.applyDelta]] commit, PINNED to the version the
  *      engine scanned — an interleaved commit that contested a file or
  *      id this statement read refuses typed instead of clobbering.
  *
  * Update rows arrive as (old row id, new row): the old id joins the
  * removal set and the new row the upsert set, so `SET id = ...` moves
  * the row across ids correctly. The row id IS the table's `idColumn`
  * (its last-wins key) — engine-side this requires the column
  * non-nullable, which [[VersionedCatalog.createTable]] guarantees with
  * the auto `NOT NULL` CHECK constraint. Delta/Iceberg's position-delta
  * writers are shape references only (SPARK-35801); this
  * implementation keys deltas on the LOGICAL id, not file positions,
  * so it composes with the table's rename mapping and MoR vectors. */
private[sources] class VersionedDeltaOperation(
    tableDir: String, ident: String, idCol: String, pinned: Int,
    cmd: RowLevelOperation.Command,
    scanBuilderOf: CaseInsensitiveStringMap => ScanBuilder)
    extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    scanBuilderOf(options)

  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(idCol))

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite =
        new VersionedDeltaWrite(tableDir, ident, idCol, pinned, info)
    }

  override def description(): String =
    s"graft-versioned $ident@v$pinned $cmd by $idCol"
}

/** The staged-delta write: one stage directory per statement, one
  * atomic [[Versioned.applyDelta]] commit at the end. */
private[sources] class VersionedDeltaWrite(
    tableDir: String, ident: String, idCol: String, pinned: Int,
    info: LogicalWriteInfo) extends DeltaWrite {

  private def spark: SparkSession = SparkSession.active

  private val dataSchema: StructType = info.schema()
  private val idSchema: StructType = {
    val opt = info.rowIdSchema()
    if (opt.isPresent) opt.get()
    else StructType(dataSchema.fields.filter(_.name == idCol))
  }

  // statement-unique: two row-level statements racing the same table
  // stage disjoint directories; queryId alone repeats across retries
  private val stageDir =
    s"$tableDir/_staged/rlo_${info.queryId()}_${UUID.randomUUID().toString.take(8)}"

  private def cleanupStage(): Unit =
    try {
      val p = new Path(stageDir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true): Unit
    } catch { case _: Throwable => () }

  override def toBatch: DeltaBatchWrite = new DeltaBatchWrite {

    override def createBatchWriterFactory(pInfo: PhysicalWriteInfo): DeltaWriterFactory =
      VersionedDeltaWriterFactory(stageDir, dataSchema.json, idSchema.json,
        ParquetStage.carryConf(spark.sparkContext.hadoopConfiguration))

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val msgs = messages.collect { case m: DeltaStageMessage => m }.toSeq
      val dataFiles = msgs.flatMap(_.dataFiles)
      val idFiles = msgs.flatMap(_.idFiles)
      try {
        // a statement matching zero rows commits nothing: SQL's 0-rows
        // UPDATE/DELETE is a no-op, not an empty table version
        if (dataFiles.nonEmpty || idFiles.nonEmpty) {
          def readStaged(files: Seq[String], schema: StructType): DataFrame =
            if (files.nonEmpty) spark.read.schema(schema).parquet(files: _*)
            else spark.createDataFrame(new java.util.ArrayList[Row](), schema)
          val upserts = readStaged(dataFiles, dataSchema)
          val removes = readStaged(idFiles, idSchema)
          Versioned.applyDelta(upserts, removes, tableDir, idCol,
            baseVersion = Some(pinned)): Unit
        }
      } finally cleanupStage()
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit =
      cleanupStage()
  }

  override def description(): String = s"graft-versioned delta write $ident"
}

/** Per-task staged file lists — paths and counts only, never rows. */
private[sources] case class DeltaStageMessage(
    dataFiles: Seq[String], dataRows: Long,
    idFiles: Seq[String], idRows: Long) extends WriterCommitMessage

/** Ships to executors; opens staged parquet writers LAZILY so a task
  * that saw no deletes (or no upserts) leaves no empty file behind. */
private[sources] case class VersionedDeltaWriterFactory(
    stageDir: String, dataSchemaJson: String, idSchemaJson: String,
    conf: SerializableConfiguration) extends DeltaWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new DeltaWriter[InternalRow] {
      private val dataSchema =
        org.apache.spark.sql.types.DataType.fromJson(dataSchemaJson)
          .asInstanceOf[StructType]
      private val idSchema =
        org.apache.spark.sql.types.DataType.fromJson(idSchemaJson)
          .asInstanceOf[StructType]
      private val dataPath = s"$stageDir/data-$partitionId-$taskId.parquet"
      private val idPath = s"$stageDir/del-$partitionId-$taskId.parquet"
      private var dataW: ParquetWriter[InternalRow] = _
      private var idW: ParquetWriter[InternalRow] = _
      private var dataRows = 0L
      private var idRows = 0L

      private def dataWriter(): ParquetWriter[InternalRow] = {
        if (dataW == null) dataW = ParquetStage.open(dataPath, dataSchema, conf.value)
        dataW
      }
      private def idWriter(): ParquetWriter[InternalRow] = {
        if (idW == null) idW = ParquetStage.open(idPath, idSchema, conf.value)
        idW
      }

      override def delete(meta: InternalRow, id: InternalRow): Unit = {
        idWriter().write(id); idRows += 1
      }
      override def update(meta: InternalRow, id: InternalRow,
                          row: InternalRow): Unit = {
        // old id -> removal set, new row -> upsert set: covers both an
        // in-place update and a SET that moves the row to a new id
        idWriter().write(id); idRows += 1
        dataWriter().write(row); dataRows += 1
      }
      override def insert(row: InternalRow): Unit = {
        dataWriter().write(row); dataRows += 1
      }

      private def closeAll(): Unit = {
        if (dataW != null) { dataW.close(); dataW = null }
        if (idW != null) { idW.close(); idW = null }
      }

      override def commit(): WriterCommitMessage = {
        closeAll()
        DeltaStageMessage(
          if (dataRows > 0) Seq(dataPath) else Seq.empty, dataRows,
          if (idRows > 0) Seq(idPath) else Seq.empty, idRows)
      }

      override def abort(): Unit = {
        closeAll()
        val hc = conf.value
        Seq(dataPath, idPath).foreach { p =>
          try { val hp = new Path(p); hp.getFileSystem(hc).delete(hp, false): Unit }
          catch { case _: Throwable => () }
        }
      }

      override def close(): Unit = closeAll()
    }
}
