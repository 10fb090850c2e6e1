package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column => _, _}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.{procedures => procedures0}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, SupportsTruncate, V1Write, WriteBuilder}
import org.apache.spark.sql.sources.{BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import _root_.graft.operators.Versioned

/** The [[Versioned]] table as a DataSource V2 CATALOG — the surface
  * that makes the table's lifecycle PLAIN SQL, no library imports and
  * no per-table DDL options:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft",
  *     classOf[graft.sources.VersionedCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.graft.warehouse", "/data/graft")
  *
  *   CREATE TABLE graft.docs (doc_id BIGINT, text STRING)
  *     TBLPROPERTIES ('idColumn' = 'doc_id', 'statsColumn' = 'doc_id')
  *   INSERT INTO graft.docs VALUES (1, 'hello')
  *   SELECT * FROM graft.docs VERSION AS OF 0        -- time travel
  *   SELECT * FROM graft.docs TIMESTAMP AS OF '...'  -- by commit stamp
  *   DELETE FROM graft.docs WHERE doc_id = 1         -- merge-on-read
  *   UPDATE graft.docs SET text = 'hi' WHERE ...     -- delta commit
  *   MERGE INTO graft.docs t USING updates s ON t.doc_id = s.doc_id
  *     WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * This closes the walls the v1 `graft-versioned` provider leaves
  * (reference semantics: executor.py:170-225's update/delete endpoints,
  * reachable until now only through the library API): SQL time-travel
  * syntax (`VERSION AS OF` / `TIMESTAMP AS OF` resolve through
  * [[TableCatalog.loadTable]]'s versioned forms instead of re-creating
  * the table with pinned reader options), row-level SQL DELETE
  * (`DELETE FROM ... WHERE` routes through
  * [[Versioned.deleteIdsMergeOnRead]] — an O(deleted ids) sidecar
  * commit, never a rewrite of what the predicate didn't touch), and
  * SQL `UPDATE` / `MERGE INTO` (the delta-based row-level operation
  * surface — see [[VersionedDeltaOperation]] — landing each statement
  * as ONE atomic [[Versioned.applyDelta]] commit).
  *
  * Design lines, same as everywhere in this library:
  *   - ONE scan path: the v2 Scan is a [[V1Scan]] handing execution to
  *     the existing [[VersionedRelation]] machinery — manifest
  *     stats/bloom pruning, DV masks, rename mapping, widen-only
  *     keep-sets. No parallel reader to drift from the library reads.
  *   - ONE commit path: `INSERT INTO` is a [[V1Write]] onto
  *     [[Versioned.append]] (constraints, conflict rebase, schema
  *     evolution all gate SQL ingests); DELETE is the library's MoR
  *     delete; `INSERT OVERWRITE` is one [[Versioned.replaceContent]]
  *     commit and `TRUNCATE TABLE` a delete-all — both VERSIONED and
  *     revertible (RESTORE undoes them). Only `REPLACE TABLE` refuses:
  *     it would destroy the lineage itself, and a versioned corpus is
  *     never silently replaced.
  *   - Tables are MANAGED under the catalog's `warehouse` directory and
  *     identified purely by path ([[Identifier]] segments are directory
  *     segments), so the catalog itself holds ZERO mutable state — the
  *     table's own manifests are the catalog entry, and concurrent
  *     sessions see exactly what the commit protocol published.
  *   - Catalog-level table properties (`idColumn`, `statsColumn`,
  *     `bloomColumn`) are stamped into the CREATE commit's metadata
  *     under `catalog.`-prefixed keys and carry forward with every
  *     commit (the same standing-metadata channel `cdf`/`colmap` use),
  *     so DELETE knows its id column and ingests keep the pruning
  *     layout with no session state.
  *
  * Scale notes: loadTable is one manifest resolution; time travel adds
  * the newest-first stamp walk; DELETE's cost is one pruned read of the
  * candidate files plus an O(ids) sidecar write. The Delta/Iceberg
  * catalog surfaces are shape references only. */
class VersionedCatalog extends TableCatalog with ProcedureCatalog
    with StagingTableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog '$name' requires option 'warehouse' " +
          s"(spark.sql.catalog.$name.warehouse = <dir tables live under>)"))
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  private def dirFor(ident: Identifier): String =
    (warehouse +: ident.namespace.toSeq :+ ident.name).mkString("/")

  private def exists(ident: Identifier): Boolean =
    Versioned.versions(spark, dirFor(ident)).nonEmpty

  override def tableExists(ident: Identifier): Boolean = exists(ident)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val root = new Path((warehouse +: namespace.toSeq).mkString("/"))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) {
      if (namespace.isEmpty) Array.empty
      else throw new NoSuchNamespaceException(namespace.toSeq)
    } else
      fs.listStatus(root).toSeq
        .filter(s => s.isDirectory && !s.getPath.getName.startsWith(".") &&
          fs.exists(new Path(s.getPath, "_manifests")))
        .map(s => Identifier.of(namespace, s.getPath.getName))
        .toArray
  }

  override def loadTable(ident: Identifier): Table = {
    if (!exists(ident)) throw new NoSuchTableException(ident)
    new VersionedV2Table(dirFor(ident), ident.toString, None)
  }

  /** `VERSION AS OF n` — the SQL form of the library's `versionAsOf`
    * reader option: the identifier resolves onto one PINNED committed
    * version. */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!exists(ident)) throw new NoSuchTableException(ident)
    val v = try version.toInt catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"VERSION AS OF wants this table's integer commit version, got " +
          s"'$version' (see the table's history for valid versions)")
    }
    new VersionedV2Table(dirFor(ident), ident.toString, Some(v))
  }

  /** `TIMESTAMP AS OF t` — the engine hands micros since epoch; the
    * stamp resolves through the same newest-first walk batch time
    * travel uses ([[Versioned.versionAsOf]], typed pre-history and
    * vacuumed-history errors included). */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    if (!exists(ident)) throw new NoSuchTableException(ident)
    val dir = dirFor(ident)
    new VersionedV2Table(dir, ident.toString,
      Some(Versioned.versionAsOf(spark, dir, timestampMicros / 1000L)))
  }

  /** CREATE-side validation shared by [[createTable]] and the staged
    * CTAS path: refuses layouts and properties this catalog doesn't
    * record, stamps the id column non-nullable with its enforcing CHECK
    * constraint, and returns everything [[Versioned.init]] needs. */
  private def validateCreate(ident: Identifier, schema: StructType,
                             partitions: Array[Transform],
                             properties: util.Map[String, String])
      : (StructType, Map[String, String], Option[String], Option[String]) = {
    require(partitions.isEmpty,
      "graft tables own their physical layout (manifest stats/blooms, " +
        "z-order clustering) — PARTITIONED BY does not apply; set the " +
        "'statsColumn'/'bloomColumn' table properties instead")
    if (exists(ident)) throw new TableAlreadyExistsException(ident)
    val props = properties.asScala
    props.get(TableCatalog.PROP_LOCATION).foreach { loc =>
      throw new UnsupportedOperationException(
        s"external LOCATION '$loc' is not supported: this catalog is " +
          "purely path-derived (zero catalog state), so a table lives " +
          "under its identifier's warehouse path — register foreign " +
          "directories with the v1 provider " +
          "(CREATE TABLE ... USING `graft-versioned` OPTIONS (tableDir ...))")
    }
    // the catalog-level properties ride the v0 commit's metadata and
    // carry forward with every commit — the table IS its own catalog
    // entry, so a second session (or engine) sees them with no shared
    // service. Unknown keys are rejected: silently dropping a typo'd
    // property is how a DELETE discovers at runtime that its id column
    // was never recorded.
    val known = Set("idcolumn", "statscolumn", "bloomcolumn")
    val engineKeys = Set(TableCatalog.PROP_PROVIDER, TableCatalog.PROP_OWNER,
      TableCatalog.PROP_COMMENT, TableCatalog.PROP_TABLE_TYPE,
      TableCatalog.PROP_EXTERNAL, TableCatalog.PROP_IS_MANAGED_LOCATION)
    val unknown = props.keys.filterNot(k =>
      known(k.toLowerCase(java.util.Locale.ROOT)) || engineKeys(k) ||
        k.startsWith(TableCatalog.OPTION_PREFIX))
    require(unknown.isEmpty,
      s"unknown table properties ${unknown.mkString(", ")} — this catalog " +
        "records idColumn, statsColumn, bloomColumn")
    def prop(k: String): Option[String] = props.collectFirst {
      case (key, v) if key.equalsIgnoreCase(k) => v }
    val idProp = prop("idColumn")
    idProp.foreach(id => require(schema.fieldNames.contains(id),
      s"idColumn '$id' is not a column of the table " +
        s"(have ${schema.fieldNames.mkString(", ")})"))
    val meta = Seq("idColumn", "statsColumn", "bloomColumn")
      .flatMap(k => prop(k).map(v => s"catalog.$k" -> v)).toMap ++
      // the id column of a KEYED table is non-null by contract (upserts,
      // MoR vectors and SQL row-level deltas all key on it); the CHECK
      // constraint makes every ingest enforce it, and the committed
      // schema records it non-nullable — which is also what lets the
      // engine accept it as the row-level operations' row ID
      // (NULLABLE_ROW_ID_ATTRIBUTES refuses a nullable key)
      idProp.map(id => s"constraint.${id}_not_null" -> s"$id IS NOT NULL")
    val stamped = idProp match {
      case Some(id) => StructType(schema.map(f =>
        if (f.name == id) f.copy(nullable = false) else f))
      case None => schema
    }
    (stamped, meta, prop("statsColumn"), prop("bloomColumn"))
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    val (stamped, meta, statsCol, bloomCol) =
      validateCreate(ident, schema, partitions, properties)
    // v0 is an EMPTY schema-stamped commit (zero manifest entries —
    // proven-empty parts never enter a manifest; readers serve the
    // stamped schema with no files); the first INSERT is then an
    // ordinary append
    val empty = spark.createDataFrame(new util.ArrayList[Row](), stamped)
    Versioned.init(empty, dirFor(ident), meta, statsCol, bloomCol): Unit
    loadTable(ident)
  }

  // ------------------------------------------------------------------
  // Staged DDL: CREATE TABLE ... AS SELECT atomically, and the
  // REPLACE family refused WITHOUT collateral damage. The engine's
  // non-staging fallbacks are trapdoors on a versioned table: a
  // non-atomic CTAS can leave a half-created table behind its failure
  // cleanup, and non-atomic REPLACE TABLE DROPS the existing table
  // before write planning discovers the (deliberately absent) truncate
  // capability — a refused statement must never destroy the corpus it
  // refused to replace. Staging closes both: CTAS builds the full
  // table (v0 + the query's append commit) under a hidden
  // `.staging/<uuid>` path and ONE directory rename publishes it —
  // readers see a complete table or none — and stageReplace refuses
  // typed before the engine touches the existing table.
  // ------------------------------------------------------------------
  override def stageCreate(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): StagedTable = {
    val (stamped, meta, statsCol, bloomCol) =
      validateCreate(ident, schema, partitions, properties)
    val staged = s"$warehouse/.staging/${java.util.UUID.randomUUID().toString}"
    val empty = spark.createDataFrame(new util.ArrayList[Row](), stamped)
    Versioned.init(empty, staged, meta, statsCol, bloomCol): Unit
    new StagedVersionedTable(staged, dirFor(ident), ident,
      spark.sparkContext.hadoopConfiguration)
  }

  override def stageReplace(ident: Identifier, schema: StructType,
                            partitions: Array[Transform],
                            properties: util.Map[String, String]): StagedTable =
    throw new UnsupportedOperationException(
      s"REPLACE TABLE $ident refuses: a versioned corpus is never " +
        "silently replaced — its history IS the table. DROP TABLE first " +
        "if the lineage is genuinely disposable, or mutate through " +
        "INSERT / UPDATE / MERGE / DELETE and keep time travel working")

  /** CREATE OR REPLACE degrades to a plain staged CREATE when the table
    * does not exist (nothing is being replaced); on an existing table it
    * refuses exactly like REPLACE — before anything is touched. */
  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
                                    partitions: Array[Transform],
                                    properties: util.Map[String, String]): StagedTable =
    if (exists(ident)) stageReplace(ident, schema, partitions, properties)
    else stageCreate(ident, schema, partitions, properties)

  /** ALTER TABLE, scoped to the two schema evolutions the versioned
    * table supports as METADATA-ONLY commits (zero bytes rewritten at
    * any scale): `ADD COLUMN` (nullable, appended — existing files
    * null-fill on read) and `RENAME COLUMN` (the colmap commit — old
    * files keep their physical name, every pruning layer survives).
    * Each change is one commit, so `ALTER TABLE t ADD COLUMNS (a, b)`
    * versions twice — honest lineage over statement atomicity here,
    * since half-applied multi-changes are visible (and re-runnable) in
    * the history. Everything else (type changes, drops, positions,
    * NOT NULL adds) refuses typed: a versioned corpus widens, it never
    * silently narrows or rewrites. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!exists(ident)) throw new NoSuchTableException(ident)
    val dir = dirFor(ident)
    changes.foreach {
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          "nested fields are not addressable — graft schema evolution is top-level")
        require(a.isNullable,
          s"ADD COLUMN ${a.fieldNames.head} NOT NULL refuses: existing rows " +
            "cannot satisfy it (add nullable, backfill, then constrain)")
        require(a.position == null,
          "ADD COLUMN ... FIRST/AFTER is not supported — new columns append " +
            "at the end (manifest schema order is commit order)")
        Versioned.addColumn(spark, dir, a.fieldNames.head, a.dataType): Unit
      case r: TableChange.RenameColumn =>
        require(r.fieldNames.length == 1,
          "nested fields are not addressable — graft schema evolution is top-level")
        Versioned.renameColumn(spark, dir, r.fieldNames.head, r.newName): Unit
      // SET/UNSET TBLPROPERTIES for the pruning layout: a metadata-only
      // commit retargeting what FUTURE ingests record (existing files
      // keep their stats — compact() re-baselines them to the new
      // layout). The idColumn is IDENTITY, not layout: deletion
      // vectors, constraints and row-level deltas all key on it, so it
      // refuses — recreate (or CTAS) to re-key a corpus.
      case sp: TableChange.SetProperty
          if Set("statscolumn", "bloomcolumn")
            .contains(sp.property.toLowerCase(java.util.Locale.ROOT)) =>
        val canonical = if (sp.property.equalsIgnoreCase("statsColumn"))
          "statsColumn" else "bloomColumn"
        val schema = loadTable(ident).schema()
        require(schema.fieldNames.contains(sp.value),
          s"${sp.property} '${sp.value}' is not a column of the table " +
            s"(have ${schema.fieldNames.mkString(", ")})")
        Versioned.setStandingMeta(spark, dir,
          s"catalog.$canonical", Some(sp.value)): Unit
      case rp: TableChange.RemoveProperty
          if Set("statscolumn", "bloomcolumn")
            .contains(rp.property.toLowerCase(java.util.Locale.ROOT)) =>
        val canonical = if (rp.property.equalsIgnoreCase("statsColumn"))
          "statsColumn" else "bloomColumn"
        Versioned.setStandingMeta(spark, dir, s"catalog.$canonical", None): Unit
      case other => throw new UnsupportedOperationException(
        s"ALTER TABLE change $other is not supported: schema evolution on " +
          "a versioned corpus is widen-only (ADD COLUMN, RENAME COLUMN), " +
          "and of the table properties only the pruning layout " +
          "(statsColumn, bloomColumn) may move — the idColumn is the " +
          "table's identity (vectors, constraints and row-level deltas " +
          "key on it); type changes and drops need an explicit rewrite")
    }
    loadTable(ident)
  }

  /** DROP TABLE deletes the managed directory — manifests, data,
    * sidecars. Every table under this catalog is managed (external
    * locations refuse at CREATE), so the standard managed-drop contract
    * applies; `purgeTable` is the same operation. */
  override def dropTable(ident: Identifier): Boolean = {
    val root = new Path(dirFor(ident))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!exists(ident)) false
    else { Versioned.snapshotCacheClear(); fs.delete(root, true) }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!exists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (exists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    val fs = new Path(warehouse)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = new Path(dirFor(newIdent))
    fs.mkdirs(dst.getParent): Unit
    Versioned.snapshotCacheClear()
    require(fs.rename(new Path(dirFor(oldIdent)), dst),
      s"rename ${oldIdent} -> ${newIdent} failed (filesystem refused)")
    // manifest paths travel absolutely: point them at the new home, or
    // every data read of the renamed table dangles (metadata-only)
    Versioned.relocateManifests(spark, dirFor(newIdent), dirFor(oldIdent))
  }

  override def invalidateTable(ident: Identifier): Unit =
    Versioned.snapshotCacheClear()

  // ------------------------------------------------------------------
  // Namespaces, path-derived like everything else: a namespace IS a
  // warehouse subdirectory that is not itself a table (no _manifests)
  // and not hidden. Zero catalog state — CREATE NAMESPACE is mkdirs,
  // DROP NAMESPACE (non-cascade) refuses while anything lives inside,
  // and there is no namespace metadata to alter (a comment or owner
  // would have to live in some side store this catalog deliberately
  // does not have). Namespaced TABLES already resolve with no help
  // from this surface — identifiers are paths — so this exists for
  // the DDL statements themselves: SHOW NAMESPACES, CREATE/DROP
  // NAMESPACE, and the engines' existence probes.
  // ------------------------------------------------------------------
  private def nsPath(namespace: Seq[String]): Path =
    new Path((warehouse +: namespace).mkString("/"))

  private def isTableDir(fs: org.apache.hadoop.fs.FileSystem, p: Path): Boolean =
    fs.exists(new Path(p, "_manifests"))

  override def namespaceExists(namespace: Array[String]): Boolean = {
    if (namespace.isEmpty) true
    else {
      val p = nsPath(namespace.toSeq)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      namespace.forall(!_.startsWith(".")) && fs.exists(p) &&
        fs.getFileStatus(p).isDirectory && !isTableDir(fs, p)
    }
  }

  override def listNamespaces(): Array[Array[String]] =
    listNamespaces(Array.empty)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace.toSeq)
    val p = nsPath(namespace.toSeq)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Array.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith(".") &&
        !isTableDir(fs, s.getPath))
      .map(s => namespace :+ s.getPath.getName)
      .toArray
  }

  override def loadNamespaceMetadata(namespace: Array[String])
      : util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace.toSeq)
    new util.HashMap[String, String]() // zero-state: nothing recorded
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    require(namespace.nonEmpty && namespace.forall(n =>
      n.nonEmpty && !n.startsWith(".") && !n.contains("/")),
      s"invalid namespace ${namespace.mkString(".")}")
    val meaningful = metadata.asScala.keys
      .filterNot(Set(SupportsNamespaces.PROP_OWNER))
    require(meaningful.isEmpty,
      s"namespace properties (${meaningful.mkString(", ")}) are not " +
        "supported: this catalog is purely path-derived and records no " +
        "namespace metadata")
    if (namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis
        .NamespaceAlreadyExistsException(namespace)
    val p = nsPath(namespace.toSeq)
    require(!isTableDir(p.getFileSystem(spark.sparkContext.hadoopConfiguration), p),
      s"${namespace.mkString(".")} is a table, not a namespace")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(p): Unit
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "ALTER NAMESPACE is not supported: this catalog records no " +
        "namespace metadata (purely path-derived, zero state)")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) false
    else {
      val p = nsPath(namespace.toSeq)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!cascade && fs.listStatus(p).nonEmpty)
        throw new org.apache.spark.sql.catalyst.analysis
          .NonEmptyNamespaceException(namespace)
      Versioned.snapshotCacheClear() // cascade may remove tables
      fs.delete(p, true)
    }
  }

  // ------------------------------------------------------------------
  // Stored procedures: the maintenance surface as plain SQL —
  // `CALL graft.compact(table => 'docs')`, vacuum, restore, clone,
  // history/detail, constraints, CDF toggle, schema evolution (see
  // VersionedProcedures). Table arguments are identifiers under THIS
  // catalog ('docs' or 'ns.docs'), resolved through the same
  // warehouse-path derivation as table statements.
  // ------------------------------------------------------------------
  private lazy val procedures: Map[String, procedures0.UnboundProcedure] =
    VersionedProcedures.registry(name => {
      val parts = name.split('.').toSeq
      dirFor(Identifier.of(parts.init.toArray, parts.last))
    })

  override def loadProcedure(ident: Identifier): procedures0.UnboundProcedure = {
    require(ident.namespace.isEmpty || ident.namespace.sameElements(Array("system")),
      s"procedures live at the catalog root (CALL $catalogName.${ident.name}(...)) " +
        s"or under 'system'; got namespace ${ident.namespace.mkString(".")}")
    procedures.getOrElse(ident.name.toLowerCase(java.util.Locale.ROOT),
      throw new UnsupportedOperationException(
        s"unknown procedure '${ident.name}' — this catalog has " +
          procedures.keys.toSeq.sorted.mkString(", ")))
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] = {
    require(namespace.isEmpty || namespace.sameElements(Array("system")),
      s"procedures live at the catalog root or under 'system'")
    procedures.keys.toSeq.sorted.map(Identifier.of(namespace, _)).toArray
  }
}

/** One catalog-resolved versioned table (optionally PINNED to a
  * time-traveled version): reads through a [[V1Scan]] onto the
  * [[VersionedRelation]] scan machinery, writes through a [[V1Write]]
  * onto [[Versioned.append]], row-level SQL DELETE through
  * [[Versioned.deleteIdsMergeOnRead]]. */
private[sources] class VersionedV2Table(tableDir: String, ident: String,
                                        version: Option[Int])
    extends Table with SupportsRead with SupportsWrite with SupportsDeleteV2
    with SupportsRowLevelOperations {

  private def spark: SparkSession = SparkSession.active

  /** Pinned once, exactly like the v1 relation: the table object's
    * lifetime serves one committed state. */
  private val pinned: Int =
    Versioned.snapshot(spark, tableDir, version).version

  private val snapMeta: Map[String, String] =
    Versioned.snapshot(spark, tableDir, Some(pinned)).meta

  private def catalogProp(k: String): Option[String] =
    snapMeta.get(s"catalog.$k").filter(_.nonEmpty)

  override def name(): String = ident

  private lazy val committedSchema: StructType = {
    val base = new VersionedRelation(spark.sqlContext, tableDir, Some(pinned)).schema
    // the table's key is non-null by contract (the catalog's CREATE
    // stamps the enforcing CHECK constraint) — reporting it nullable
    // would make the engine refuse it as the row-level row ID
    catalogProp("idColumn") match {
      case Some(id) => StructType(base.map(f =>
        if (f.name == id) f.copy(nullable = false) else f))
      case None => base
    }
  }

  override def schema(): StructType = committedSchema

  override def columns(): Array[Column] =
    committedSchema.fields.map(f => Column.create(f.name, f.dataType, f.nullable))

  override def properties(): util.Map[String, String] =
    (Map("version" -> pinned.toString, "tableDir" -> tableDir) ++
      Seq("idColumn", "statsColumn", "bloomColumn")
        .flatMap(k => catalogProp(k).map(k -> _))).asJava

  override def capabilities(): util.Set[TableCapability] = {
    val caps = util.EnumSet.of(TableCapability.BATCH_READ)
    // a time-traveled resolution is read-only: commits land on latest
    if (version.isEmpty) {
      caps.add(TableCapability.V1_BATCH_WRITE): Unit
      caps.add(TableCapability.TRUNCATE): Unit // INSERT OVERWRITE, versioned
    }
    caps
  }

  // ------------------------------------------------------------------
  // Read: pushdown collects v1 filters + required columns, the V1Scan
  // hands execution to the existing pruned relation scan — and declares
  // every filter unhandled, so the engine re-applies them above the
  // widen-only manifest pruning (I/O decision, never semantics).
  // ------------------------------------------------------------------
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownFilters
        with SupportsPushDownRequiredColumns {
      private var filters: Array[Filter] = Array.empty
      private var required: StructType = schema

      override def pushFilters(fs: Array[Filter]): Array[Filter] = {
        filters = fs
        fs // all post-scan: pruning is I/O-only, the engine re-evaluates
      }
      override def pushedFilters(): Array[Filter] = filters
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema

      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = required
        override def toV1TableScan[T <: BaseRelation with TableScan](
            context: SQLContext): T =
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = context
            override def schema: StructType = required
            override def buildScan(): RDD[Row] =
              new VersionedRelation(context, tableDir, Some(pinned))
                .buildScan(required.fieldNames, filters)
          }.asInstanceOf[T]
        override def description(): String =
          s"graft-versioned $ident@v$pinned " +
            s"[${filters.mkString(", ")}] -> ${required.fieldNames.mkString(",")}"
      }
    }

  // ------------------------------------------------------------------
  // Write: INSERT INTO as one append commit (constraints, rebase,
  // evolution rules and the recorded pruning layout all apply).
  // INSERT OVERWRITE is one replaceContent commit — a versioned,
  // REVERTIBLE full refresh (every old version stays time-travelable;
  // RESTORE undoes it), not the lineage-destroying replace that
  // REPLACE TABLE still refuses. TRUNCATE TABLE arrives through the
  // SupportsDeleteV2 default (delete-all) below, a merge-on-read
  // commit of its own.
  // ------------------------------------------------------------------
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var replace = false
      override def truncate(): WriteBuilder = { replace = true; this }
      override def build(): org.apache.spark.sql.connector.write.Write =
        new V1Write {
          override def toInsertableRelation: InsertableRelation =
            new InsertableRelation {
              override def insert(data: DataFrame, overwrite: Boolean): Unit = {
                if (replace || overwrite)
                  Versioned.replaceContent(data, tableDir,
                    statsCol = catalogProp("statsColumn"),
                    bloomCol = catalogProp("bloomColumn")): Unit
                else
                  Versioned.append(data, tableDir,
                    statsCol = catalogProp("statsColumn"),
                    bloomCol = catalogProp("bloomColumn")): Unit
              }
            }
        }
    }

  // ------------------------------------------------------------------
  // UPDATE / MERGE INTO / general-predicate DELETE: the DSv2 row-level
  // operation surface, DELTA-based — the engine feeds the operation
  // only the changed rows, each task stages them as parquet, and the
  // driver lands ONE atomic Versioned.applyDelta commit pinned to the
  // scanned version (see VersionedRowLevel.scala). Simple-predicate
  // DELETEs never reach here: OptimizeMetadataOnlyDeleteFromTable
  // rewrites them onto the SupportsDeleteV2 path above, which commits
  // a merge-on-read vector without touching data files.
  // ------------------------------------------------------------------
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder = {
    if (version.nonEmpty) throw new UnsupportedOperationException(
      s"$ident resolved time-traveled (VERSION/TIMESTAMP AS OF): " +
        "row-level SQL writes land on the table's LATEST state only")
    val idCol = catalogProp("idColumn").getOrElse(
      throw new IllegalStateException(
        s"${info.command} on $ident needs the table's id column: create " +
          "the table with TBLPROPERTIES ('idColumn' = '<primary id>') — " +
          "row-level deltas key on it"))
    new RowLevelOperationBuilder {
      override def build(): RowLevelOperation =
        new VersionedDeltaOperation(tableDir, ident, idCol, pinned,
          info.command, newScanBuilder)
    }
  }

  // ------------------------------------------------------------------
  // DELETE FROM ... WHERE: resolve the matching ids under the LATEST
  // snapshot, commit them as one merge-on-read deletion vector —
  // O(matched ids) write cost, the same linearized commit the library
  // delete makes. The predicate itself decides id membership through a
  // real (pruned) read, so it is NOT limited to id-shaped or even
  // source-filter-shaped conditions: the V2 Predicate tree (which
  // carries general scalar expressions — arithmetic, modulo, string
  // predicates) translates straight to Columns and replays over the
  // table's own scan. A shape the translator doesn't know returns
  // false through canDeleteWhere, and the engine falls back to the
  // row-level delta path above (scan + staged delete-ids) — slower,
  // never silently under- or over-deleting.
  // ------------------------------------------------------------------
  override def canDeleteWhere(predicates: Array[Predicate]): Boolean =
    predicates.forall(p => VersionedV2Table.v2ToColumn(p).isDefined)

  override def deleteWhere(predicates: Array[Predicate]): Unit = {
    val idCol = catalogProp("idColumn").getOrElse(
      throw new IllegalStateException(
        s"DELETE FROM $ident needs the table's id column: create the table " +
          "with TBLPROPERTIES ('idColumn' = '<primary id>') — deletes " +
          "commit as merge-on-read vectors keyed on it"))
    val cond = predicates.map(p => VersionedV2Table.v2ToColumn(p).getOrElse(
      throw new IllegalStateException(
        s"unreachable: canDeleteWhere accepted untranslatable predicate $p")))
      .reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    // a table with zero live files (fresh CREATE, or fully deleted)
    // has nothing to match: the no-op mirrors SQL DELETE's 0-rows case
    if (Versioned.snapshot(spark, tableDir).entries.nonEmpty) {
      val ids = Versioned.read(spark, tableDir).filter(cond).select(idCol)
      Versioned.deleteIdsMergeOnRead(ids, tableDir, idCol): Unit
    }
  }
}

/** A table mid-CTAS: a fully-formed versioned table at a hidden
  * `.staging/<uuid>` path, writable through the ordinary append path
  * (constraints, layout, evolution rules all apply to the staged
  * write). `commitStagedChanges` publishes it with ONE directory
  * rename — a concurrent reader sees a complete table or none, and a
  * failed query's `abortStagedChanges` reclaims the staging directory
  * without the final path ever having existed. On object stores the
  * rename is the store's usual copy trade, same as table RENAME.
  * Commit refuses (and cleans up) if the identifier was created
  * concurrently during the write — the staged result never overwrites
  * a table that won the race. */
private[sources] class StagedVersionedTable(
    stagedDir: String, finalDir: String, ident: Identifier,
    hadoopConf: org.apache.hadoop.conf.Configuration)
    extends VersionedV2Table(stagedDir, ident.toString, None)
    with StagedTable {

  override def commitStagedChanges(): Unit = {
    val src = new Path(stagedDir)
    val dst = new Path(finalDir)
    val fs = dst.getFileSystem(hadoopConf)
    Versioned.snapshotCacheClear()
    if (fs.exists(dst)) {
      fs.delete(src, true): Unit
      throw new TableAlreadyExistsException(ident)
    }
    fs.mkdirs(dst.getParent): Unit
    require(fs.rename(src, dst),
      s"publishing staged table $ident failed: rename $src -> $dst " +
        "refused by the filesystem (staging left in place)")
    // manifest paths travel absolutely: re-point them from the hidden
    // staging prefix to the published home (metadata-only; the path is
    // exclusively ours until the first reader resolves it)
    Versioned.relocateManifests(SparkSession.active, finalDir, stagedDir)
  }

  override def abortStagedChanges(): Unit = {
    Versioned.snapshotCacheClear()
    val src = new Path(stagedDir)
    src.getFileSystem(hadoopConf).delete(src, true): Unit
  }

  // CREATE OR REPLACE writes into the staged table with REPLACE
  // semantics — an OverwriteByExpression(true), i.e. truncate+append.
  // A staged table is EMPTY by construction (v0 only, never visible to
  // another writer), so truncation is vacuously done and the write is
  // the ordinary append commit. The PUBLISHED table still refuses
  // truncate: this capability lives only on the staging wrapper.
  override def capabilities(): util.Set[TableCapability] = {
    val caps = super.capabilities()
    caps.add(TableCapability.TRUNCATE): Unit
    caps
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val append = super.newWriteBuilder(info)
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this // staged: empty, done
      override def build(): org.apache.spark.sql.connector.write.Write =
        new V1Write {
          override def toInsertableRelation: InsertableRelation =
            new InsertableRelation {
              override def insert(data: DataFrame, overwrite: Boolean): Unit =
                // overwrite of nothing == append; route to the parent's
                // single commit path with the recorded layout
                append.build().asInstanceOf[V1Write].toInsertableRelation
                  .insert(data, overwrite = false)
            }
        }
    }
  }
}

private[sources] object VersionedV2Table {
  import org.apache.spark.sql.functions.{abs, coalesce, col, lit, lower, upper}
  import org.apache.spark.sql.{Column => SColumn}
  import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, GeneralScalarExpression, Literal => V2Literal, NamedReference}
  import org.apache.spark.sql.connector.expressions.filter.{AlwaysFalse, AlwaysTrue}

  /** V2 connector expression -> Column, for replaying a DELETE
    * predicate over the table's own read path. Covers the predicate
    * shapes AND the general scalar expressions (arithmetic, modulo,
    * string functions) the engine's V2ExpressionBuilder emits — so
    * `DELETE FROM t WHERE doc_id % 7 = 3` commits instead of refusing.
    * Literals arrive catalyst-internal (UTF8String, Decimal, day/micro
    * counts) and convert through [[org.apache.spark.sql.graft.ExprBridge]]
    * — never through `lit`, which expects external values. None for an
    * unknown shape (-> canDeleteWhere false, the engine's typed
    * cannot-delete error): unknown means refused, never approximated. */
  private[sources] def v2ToColumn(e: V2Expression): Option[SColumn] = e match {
    case ref: NamedReference => Some(col(ref.fieldNames.mkString(".")))
    case _: AlwaysTrue  => Some(lit(true))
    case _: AlwaysFalse => Some(lit(false))
    case l: V2Literal[_] =>
      Some(org.apache.spark.sql.graft.ExprBridge.internalLiteral(l.value, l.dataType))
    case g: GeneralScalarExpression =>
      val kids = g.children.toSeq.map(v2ToColumn)
      if (kids.exists(_.isEmpty)) None
      else {
        val c = kids.flatten.toIndexedSeq
        (g.name, c.size) match {
          case ("=", 2)           => Some(c(0) === c(1))
          case ("<>", 2)          => Some(c(0) =!= c(1))
          case ("<=>", 2)         => Some(c(0) <=> c(1))
          case (">", 2)           => Some(c(0) > c(1))
          case (">=", 2)          => Some(c(0) >= c(1))
          case ("<", 2)           => Some(c(0) < c(1))
          case ("<=", 2)          => Some(c(0) <= c(1))
          case ("+", 2)           => Some(c(0) + c(1))
          case ("-", 2)           => Some(c(0) - c(1))
          case ("-", 1)           => Some(-c(0))
          case ("*", 2)           => Some(c(0) * c(1))
          case ("/", 2)           => Some(c(0) / c(1))
          case ("%", 2)           => Some(c(0) % c(1))
          case ("AND", 2)         => Some(c(0) && c(1))
          case ("OR", 2)          => Some(c(0) || c(1))
          case ("NOT", 1)         => Some(!c(0))
          case ("IS_NULL", 1)     => Some(c(0).isNull)
          case ("IS_NOT_NULL", 1) => Some(c(0).isNotNull)
          // x IN (a, b, ...) == (x = a OR x = b OR ...), null
          // semantics included — the OR chain IS SQL IN's definition
          case ("IN", n) if n >= 2 =>
            Some(c.tail.map(_ === c(0)).reduce(_ || _))
          case ("STARTS_WITH", 2) => Some(c(0).startsWith(c(1)))
          case ("ENDS_WITH", 2)   => Some(c(0).endsWith(c(1)))
          case ("CONTAINS", 2)    => Some(c(0).contains(c(1)))
          case ("ABS", 1)         => Some(abs(c(0)))
          case ("LOWER", 1)       => Some(lower(c(0)))
          case ("UPPER", 1)       => Some(upper(c(0)))
          case ("COALESCE", n) if n >= 1 => Some(coalesce(c: _*))
          case _                  => None
        }
      }
    case _ => None
  }
}
