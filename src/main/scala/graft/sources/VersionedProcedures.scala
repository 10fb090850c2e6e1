package graft.sources

import java.util.{Iterator => JIterator}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import _root_.graft.operators.Versioned

/** The versioned table's MAINTENANCE surface as SQL stored procedures —
  * `CALL graft.compact(table => 'docs')` and friends, resolved through
  * [[org.apache.spark.sql.connector.catalog.ProcedureCatalog]]. This is
  * the operational half a lakehouse table needs beside DML: the
  * reference's dump/hygiene endpoints (executor.py:227-236) in
  * scheduler-callable form, with zero library imports on the user side.
  *
  * Every procedure is a thin SQL binding over the library op (one
  * commit path — the procedure adds parsing, never semantics), returns
  * its outcome as a one-result scan (rows for `history`, a single
  * summary row for the rest), and costs what the op costs: `detail` /
  * `history` are manifest-metadata-only, `compact_if_needed` decides
  * from ONE manifest read and rewrites only when the standing debt
  * crosses the recorded bars, `vacuum` deletes only below the retention
  * horizon. Iceberg's Spark procedures are a shape reference only
  * (the CALL surface itself is Spark 4's own API). */
private[sources] object VersionedProcedures {

  /** One procedure: fixed parameters, fixed result schema, a driver-side
    * body over the library API. Binding is trivial (parameters are
    * static); the engine coerces and default-fills arguments. */
  private final class GraftProcedure(
      procName: String,
      params: Array[ProcedureParameter],
      resultSchema: StructType,
      run: (SparkSession, InternalRow) => Seq[InternalRow])
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = params
    override def call(input: InternalRow): JIterator[Scan] = {
      val out = run(SparkSession.active, input).toArray
      java.util.List.of[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = out
        override def readSchema(): StructType = resultSchema
        override def description(): String = s"graft procedure $procName"
      }).iterator()
    }
  }

  private def p(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()
  private def pd(name: String, dt: DataType, default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  private def str(r: InternalRow, i: Int): String = r.getUTF8String(i).toString
  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  private def versionRow(v: Int): Seq[InternalRow] =
    Seq(new GenericInternalRow(Array[Any](v)))
  private val versionSchema = StructType(Seq(
    StructField("version", IntegerType, nullable = false)))

  /** A DataFrame's rows as the procedure result (history/detail — both
    * bounded by retained versions, never by data). */
  private def dfResult(df: org.apache.spark.sql.DataFrame)
      : (StructType, Seq[InternalRow]) =
    (df.schema, df.queryExecution.executedPlan.executeCollect().toSeq)

  /** Build the registry against the owning catalog (identifiers resolve
    * through ITS warehouse paths — procedures never take raw paths, so
    * they compose with rename/drop exactly like table statements). */
  def registry(dirOf: String => String): Map[String, UnboundProcedure] = {
    def proc(name: String, params: Array[ProcedureParameter],
             schema: StructType,
             run: (SparkSession, InternalRow) => Seq[InternalRow]): (String, UnboundProcedure) =
      name -> new GraftProcedure(name, params, schema, run)

    // history/detail serve the library frame's LIVE schema (declaring a
    // static copy here would drift) — the result scan carries it per call
    def dfProc(procName: String,
               run: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (String, UnboundProcedure) =
      procName -> new UnboundProcedure {
        override def name(): String = procName
        override def bind(inputType: StructType): BoundProcedure =
          new BoundProcedure {
            override def name(): String = procName
            override def parameters(): Array[ProcedureParameter] =
              Array(p("table", StringType))
            override def isDeterministic: Boolean = false
            override def call(input: InternalRow): JIterator[Scan] = {
              val (schema, out) = dfResult(
                run(SparkSession.active, dirOf(str(input, 0))))
              java.util.List.of[Scan](new LocalScan {
                override def rows(): Array[InternalRow] = out.toArray
                override def readSchema(): StructType = schema
                override def description(): String = s"graft procedure $procName"
              }).iterator()
            }
          }
      }

    Map(
      // ---- observability (manifest-metadata-only reads) ----
      dfProc("history", Versioned.history),
      dfProc("detail", Versioned.detail),
      // ---- layout maintenance ----
      proc("compact",
        Array(p("table", StringType), pd("target_mb", IntegerType, "128")),
        versionSchema, (s, in) =>
          versionRow(Versioned.compact(s, dirOf(str(in, 0)),
            targetBytes = in.getInt(1).toLong << 20))),
      proc("compact_zorder",
        Array(p("table", StringType), p("dims", StringType),
          pd("num_ranges", IntegerType, "32")),
        versionSchema, (s, in) =>
          versionRow(Versioned.compactZOrder(s, dirOf(str(in, 0)),
            str(in, 1).split(",").map(_.trim).toSeq,
            numRanges = in.getInt(2)))),
      proc("compact_if_needed",
        Array(p("table", StringType), pd("target_mb", IntegerType, "128")),
        StructType(Seq(StructField("compacted", BooleanType, nullable = false),
          StructField("version", IntegerType, nullable = true))),
        (s, in) => {
          val v = Versioned.compactIfNeeded(s, dirOf(str(in, 0)),
            targetBytes = in.getInt(1).toLong << 20)
          Seq(new GenericInternalRow(Array[Any](v.isDefined, v.orNull)))
        }),
      proc("vacuum",
        Array(p("table", StringType), pd("keep_versions", IntegerType, "1"),
          pd("min_age_ms", LongType, "0")),
        StructType(Seq(
          StructField("deleted_files", LongType, nullable = false),
          StructField("kept_files", LongType, nullable = false),
          StructField("dropped_versions", ArrayType(IntegerType), nullable = false))),
        (s, in) => {
          val st = Versioned.vacuum(s, dirOf(str(in, 0)),
            keepVersions = in.getInt(1), minAgeMs = in.getLong(2))
          Seq(new GenericInternalRow(Array[Any](st.deletedFiles, st.keptFiles,
            new GenericArrayData(st.droppedVersions.toArray))))
        }),
      // ---- lineage ----
      proc("restore", Array(p("table", StringType), p("version", IntegerType)),
        versionSchema, (s, in) =>
          versionRow(Versioned.restore(s, dirOf(str(in, 0)), in.getInt(1)))),
      proc("clone", Array(p("src", StringType), p("dst", StringType)),
        versionSchema, (s, in) =>
          versionRow(Versioned.cloneShallow(s, dirOf(str(in, 0)),
            dirOf(str(in, 1))))),
      // ---- table contracts ----
      proc("add_constraint",
        Array(p("table", StringType), p("name", StringType),
          p("check", StringType)),
        versionSchema, (s, in) =>
          versionRow(Versioned.addConstraint(s, dirOf(str(in, 0)),
            str(in, 1), str(in, 2)))),
      proc("drop_constraint",
        Array(p("table", StringType), p("name", StringType)),
        versionSchema, (s, in) =>
          versionRow(Versioned.dropConstraint(s, dirOf(str(in, 0)), str(in, 1)))),
      proc("set_change_files",
        Array(p("table", StringType), p("enabled", BooleanType)),
        versionSchema, (s, in) =>
          versionRow(Versioned.setChangeFiles(s, dirOf(str(in, 0)),
            in.getBoolean(1)))),
      // ---- schema evolution (the ALTER TABLE twins, procedure form) ----
      proc("add_column",
        Array(p("table", StringType), p("name", StringType),
          p("type", StringType)),
        versionSchema, (s, in) =>
          versionRow(Versioned.addColumn(s, dirOf(str(in, 0)), str(in, 1),
            org.apache.spark.sql.types.DataType.fromDDL(str(in, 2))))),
      proc("rename_column",
        Array(p("table", StringType), p("old", StringType),
          p("new", StringType)),
        versionSchema, (s, in) =>
          versionRow(Versioned.renameColumn(s, dirOf(str(in, 0)),
            str(in, 1), str(in, 2))))
    )
  }
}
