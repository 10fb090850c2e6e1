package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

import graft.operators.Versioned

/** The [[Versioned]] table as a BATCH DataSource:
  * `spark.read.format("graft-versioned").option("tableDir", …).load()`
  * — the surface that lets plain `spark.read` / SQL-view users consume
  * a versioned corpus (with time travel via `versionAsOf` /
  * `timestampAsOf` options) without touching the library API.
  *
  * Built on the v1 `PrunedFilteredScan` contract because its shape IS
  * this table's shape: Catalyst hands down the required columns and
  * the conjunctive filters, the relation turns them into MANIFEST
  * pruning — per-file min/max stats boxes for range-shaped filters,
  * per-file Bloom filters for string equality, both resolved through
  * the rename map — and serves only the surviving files. Pruning here
  * is an I/O decision, never a semantics change: the engine re-applies
  * every filter on the returned rows (this relation deliberately
  * declares them all unhandled), so an over-kept file costs I/O, and
  * over-PRUNING is impossible by the same widen-only arithmetic the
  * library read paths use. Deletion-vector masks and logical/physical
  * column mapping apply exactly as in [[Versioned.read]] — one scan
  * path, not a parallel one.
  *
  * The snapshot is PINNED at relation creation (`load()` time): every
  * action on the returned DataFrame sees one version, racing commits
  * never mix — the same snapshot-isolation line the library draws.
  *
  * Scale note: the v1 row-based handoff converts at the relation
  * boundary, so the library-native `Versioned.read*` calls remain the
  * hot path for performance-critical jobs; this surface buys
  * ecosystem reach (BI tools, plain-SQL users, `createOrReplaceTempView`)
  * where compatibility outranks the last cycle. */
class VersionedRelation(override val sqlContext: SQLContext,
                        tableDir: String, version: Option[Int],
                        statsCol: Option[String] = None,
                        bloomCol: Option[String] = None)
    extends BaseRelation with PrunedFilteredScan with InsertableRelation {

  private def spark = sqlContext.sparkSession

  /** `INSERT INTO` on a catalog-registered table (and
    * `df.write.insertInto`): routes through [[Versioned.append]], so
    * constraints, conflict rebase, and schema-evolution rules gate SQL
    * ingests exactly like library ones — and the relation's creation-
    * time `statsColumn`/`bloomColumn` options ride along, so a table
    * registered with a pruning layout KEEPS it on every SQL ingest
    * (exactly as createRelation-with-data and the streaming sink do).
    * `INSERT OVERWRITE` lands as ONE [[Versioned.replaceContent]]
    * commit — the versioned, RESTORE-revertible full refresh, same as
    * the v2 catalog's overwrite; a time-traveled relation refuses —
    * commits land on latest only. */
  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    require(version.isEmpty,
      "INSERT into a time-traveled relation is not allowed — a commit " +
        "always lands on the table's latest version; re-resolve the table " +
        "without versionAsOf/timestampAsOf")
    if (overwrite)
      Versioned.replaceContent(data, tableDir, statsCol = statsCol,
        bloomCol = bloomCol): Unit
    else
      Versioned.append(data, tableDir, statsCol = statsCol,
        bloomCol = bloomCol): Unit
  }

  /** Resolved ONCE: "latest" pins to a concrete version here, so the
    * DataFrame's whole lifetime (including re-executions) serves one
    * committed state. */
  private val pinned: Int = Versioned.snapshot(spark, tableDir, version).version

  override val schema: StructType = {
    val snap = Versioned.snapshot(spark, tableDir, Some(pinned))
    // the committed logical schema (one manifest read, zero footers);
    // pre-schema-tracking manifests fall back to planning the scan —
    // except a ZERO-FILE pre-tracking snapshot, which has nothing to
    // plan (read refuses on it): derive from the nearest version that
    // does know its schema (stamped, or non-empty and plannable), so
    // load() of a fully-deleted old-format version serves an EMPTY
    // relation instead of a misleading 'no files' failure
    snap.schema.getOrElse {
      if (snap.entries.nonEmpty) Versioned.read(spark, tableDir, Some(pinned)).schema
      else {
        val vs = Versioned.versions(spark, tableDir).sorted
        val neighbors = vs.filter(_ < pinned).reverse ++ vs.filter(_ > pinned)
        neighbors.iterator.map { v =>
          val s2 = Versioned.snapshot(spark, tableDir, Some(v))
          s2.schema.orElse(
            if (s2.entries.nonEmpty)
              Some(Versioned.read(spark, tableDir, Some(v)).schema)
            else None)
        }.collectFirst { case Some(s) => s }.getOrElse(
          throw new IllegalStateException(
            s"schema unknown for empty pre-schema-tracking v$pinned of " +
              s"$tableDir: no retained version is schema-stamped or " +
              "non-empty — recommit (append) to stamp a schema"))
      }
    }
  }

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val snap = Versioned.snapshot(spark, tableDir, Some(pinned))
    val keep = VersionedRelation.pruneFiles(snap, filters.toSeq)
    val base: DataFrame =
      if (keep.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[Row](), schema)
      else Versioned.scanFiles(spark, snap, keep)
    // column pruning: the select reaches the parquet scan through
    // Catalyst (ReadSchema narrows); zero required columns (count(*))
    // legally yields empty rows
    val projected =
      if (requiredColumns.isEmpty) base.select()
      else base.select(requiredColumns.map(col).toIndexedSeq: _*)
    projected.rdd
  }

  // every filter is re-applied by the engine: pruning above is I/O
  // only, so correctness never depends on the keep-set being tight
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  override def toString: String = s"VersionedRelation[$tableDir@v$pinned]"
}

object VersionedRelation {

  /** The file subset `filters` can possibly touch under `snap` — pure
    * manifest arithmetic (zero file opens). Widen-only by construction:
    * a filter shape (or value type) the stats can't prove keeps every
    * file; a file without the relevant triple/bloom is always kept;
    * range bounds use the INCLUSIVE box intersection, so boundary
    * values over-keep rather than over-prune. Conjunctive filters
    * intersect their keep-sets (Catalyst hands the top-level AND as
    * separate array elements); Or/And compose recursively. */
  private[graft] def pruneFiles(snap: Versioned.Snapshot,
                                filters: Seq[Filter]): Seq[String] = {
    val all = snap.entries.map(_.path)
    val kept = filters.foldLeft(all.toSet) { (acc, f) =>
      keepFor(snap, f).map(acc.intersect).getOrElse(acc)
    }
    // preserve manifest order (stable scans, deterministic plans)
    all.filter(kept)
  }

  private def integral(v: Any): Option[Long] = v match {
    case b: Byte  => Some(b.toLong)
    case s: Short => Some(s.toLong)
    case i: Int   => Some(i.toLong)
    case l: Long  => Some(l)
    case _        => None
  }

  private def rangeKeep(snap: Versioned.Snapshot, c: String,
                        lo: Long, hi: Long): Set[String] = {
    val phys = Versioned.physOf(snap, c)
    Versioned.filesForRangeIn(snap.entries, phys, lo, hi).toSet
  }

  private def bloomKeep(snap: Versioned.Snapshot, c: String,
                        value: String): Set[String] =
    Versioned.bloomFilesIn(snap.entries, Versioned.physOf(snap, c), value).toSet

  /** Keep-set for one filter; None = "cannot prune on this" (keep all). */
  private def keepFor(snap: Versioned.Snapshot, f: Filter): Option[Set[String]] =
    f match {
      case EqualTo(c, v) => integral(v) match {
        case Some(n) => Some(rangeKeep(snap, c, n, n))
        case None    => v match {
          case s: String => Some(bloomKeep(snap, c, s))
          case _         => None
        }
      }
      // null-safe equality prunes like equality for non-null probes
      // (stats/blooms ignore nulls, so null probes keep everything)
      case EqualNullSafe(c, v) if v != null => keepFor(snap, EqualTo(c, v))
      case GreaterThan(c, v)        => integral(v).map(rangeKeep(snap, c, _, Long.MaxValue))
      case GreaterThanOrEqual(c, v) => integral(v).map(rangeKeep(snap, c, _, Long.MaxValue))
      case LessThan(c, v)           => integral(v).map(rangeKeep(snap, c, Long.MinValue, _))
      case LessThanOrEqual(c, v)    => integral(v).map(rangeKeep(snap, c, Long.MinValue, _))
      case In(c, vs) if vs.nonEmpty =>
        val ns = vs.toSeq.map(integral)
        if (ns.forall(_.isDefined)) {
          val longs = ns.flatten
          Some(rangeKeep(snap, c, longs.min, longs.max))
        } else if (vs.forall(_.isInstanceOf[String]))
          // union of bloom probes — exact per-value, no coarse box
          Some(vs.toSet.flatMap((s: Any) => bloomKeep(snap, c, s.asInstanceOf[String])))
        else None
      case And(l, r) =>
        (keepFor(snap, l), keepFor(snap, r)) match {
          case (Some(a), Some(b)) => Some(a.intersect(b))
          case (a, b)             => a.orElse(b)
        }
      case Or(l, r) =>
        // sound only when BOTH sides prune: an un-prunable side means
        // the disjunction can match anywhere
        for (a <- keepFor(snap, l); b <- keepFor(snap, r)) yield a.union(b)
      case _ => None
    }
}

/** `format("graft-versioned")` registration.
  *
  * Reads: pinned-snapshot relation with manifest pruning (above).
  * Writes: `df.write.format("graft-versioned")` ROUTES THROUGH the
  * library's commit discipline — `Append` is [[Versioned.append]]
  * (conflict rebase, CHECK constraints, stats/rows recording, schema
  * evolution rules all apply, because it IS that call),
  * `ErrorIfExists` is [[Versioned.init]], `Ignore` no-ops on an
  * existing table. `Overwrite` is [[Versioned.replaceContent]] — the
  * versioned, RESTORE-revertible full refresh (init on a missing
  * table): nothing is silently replaced when every prior version
  * still serves, which is the line that keeps training data alive.
  * Write-side options may carry `statsColumn` /
  * `bloomColumn` so DataSource ingests keep the pruning layout.
  * SQL writes: `INSERT INTO` a catalog-registered table commits
  * through the same append discipline ([[VersionedRelation.insert]]);
  * `INSERT OVERWRITE` is the same replaceContent commit. Catalog-cached
  * resolutions keep
  * serving their pinned snapshot (the snapshot-isolation line, and the
  * standard v1 catalog contract) — `REFRESH TABLE` re-pins to latest.
  * Streaming writes: `df.writeStream.format("graft-versioned")` is
  * [[graft.streaming.VersionedSink]] — one atomic commit per
  * micro-batch under the batch-id exactly-once guard. */
class VersionedSourceProvider extends RelationProvider
    with CreatableRelationProvider with StreamSinkProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-versioned"

  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink = {
    val p = parameters.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
    val tableDir = p.getOrElse("tabledir",
      throw new IllegalArgumentException(
        "graft-versioned requires option 'tableDir' (versioned table root)"))
    require(partitionColumns.isEmpty,
      "graft-versioned owns its physical layout (manifest stats/blooms, " +
        "z-order clustering) — partitionBy does not apply; set " +
        "statsColumn/bloomColumn options instead")
    require(outputMode == OutputMode.Append(),
      s"graft-versioned sink accepts OutputMode.Append only, got $outputMode: " +
        "a versioned commit appends rows — maintain aggregates through the " +
        "change feed's signed contributions, not in-place rewrites")
    new graft.streaming.VersionedSink(sqlContext.sparkSession, tableDir,
      p.getOrElse("writerid", graft.streaming.TableStream.DefaultWriterId),
      p.get("statscolumn"), p.get("bloomcolumn"))
  }

  override def createRelation(sqlContext: SQLContext,
                              mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    val p = parameters.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
    val tableDir = p.getOrElse("tabledir",
      throw new IllegalArgumentException(
        "graft-versioned requires option 'tableDir' (versioned table root)"))
    require(!p.contains("versionasof") && !p.contains("timestampasof"),
      "time-travel options do not apply to writes — a commit always lands " +
        "on the table's latest version")
    val statsCol = p.get("statscolumn")
    val bloomCol = p.get("bloomcolumn")
    val spark = sqlContext.sparkSession
    val exists = Versioned.versions(spark, tableDir).nonEmpty
    import org.apache.spark.sql.SaveMode._
    mode match {
      case Append if exists =>
        Versioned.append(data, tableDir, statsCol = statsCol,
          bloomCol = bloomCol): Unit
      case Append =>
        throw new IllegalArgumentException(
          s"no versioned table at $tableDir to append to — create it with " +
            "mode('errorifexists') (Versioned.init)")
      case ErrorIfExists =>
        // init's own existence require produces the typed refusal
        Versioned.init(data, tableDir, statsCol = statsCol,
          bloomCol = bloomCol): Unit
      case Ignore =>
        if (!exists) Versioned.init(data, tableDir, statsCol = statsCol,
          bloomCol = bloomCol): Unit
      case Overwrite =>
        // the versioned full refresh: ONE replaceContent commit on an
        // existing table (history intact, RESTORE undoes it — nothing
        // is silently replaced when every prior version still serves),
        // an ordinary init on a missing one
        if (exists) Versioned.replaceContent(data, tableDir,
          statsCol = statsCol, bloomCol = bloomCol): Unit
        else Versioned.init(data, tableDir, statsCol = statsCol,
          bloomCol = bloomCol): Unit
    }
    createRelation(sqlContext, parameters)
  }

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val p = parameters.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
    val tableDir = p.getOrElse("tabledir",
      throw new IllegalArgumentException(
        "graft-versioned requires option 'tableDir' (versioned table root)"))
    val spark = sqlContext.sparkSession
    val version = (p.get("versionasof"), p.get("timestampasof")) match {
      case (Some(_), Some(_)) => throw new IllegalArgumentException(
        "versionAsOf and timestampAsOf are mutually exclusive")
      case (Some(v), None)    => Some(v.toInt)
      case (None, Some(ts))   =>
        val millis = scala.util.Try(ts.toLong).getOrElse(
          java.time.Instant.parse(ts).toEpochMilli)
        Some(Versioned.versionAsOf(spark, tableDir, millis))
      case (None, None)       => None
    }
    new VersionedRelation(sqlContext, tableDir, version,
      p.get("statscolumn"), p.get("bloomcolumn"))
  }
}
