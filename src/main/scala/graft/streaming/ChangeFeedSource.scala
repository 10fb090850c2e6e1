package graft.streaming

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsTriggerAvailableNow, Offset => ConnectorOffset}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.graft.StreamBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.operators.Versioned

/** The [[Versioned]] table's change data feed as a STRUCTURED STREAMING
  * source: `spark.readStream.format("graft-changes")` turns every
  * committed version into exactly-once micro-batch input — the
  * lakehouse CDC loop (table commits -> row-level changes -> downstream
  * incremental job) with the streaming engine, not a hand-rolled poll
  * loop, owning offsets, retries, and recovery. Complements
  * [[graft.operators.Versioned.consumeChanges]] (the synchronous,
  * one-file-checkpoint form) the way `readStream` complements a cron
  * job: checkpointed offsets, trigger policy, and sink transactionality
  * come from the engine.
  *
  * Offsets ARE version numbers (`LongOffset(v)` = "changes of all
  * commits <= v consumed"), so a micro-batch is a half-open version
  * range served by [[graft.operators.Versioned.changeFeed]] — O(what
  * those commits touched) per trigger (O(changes) once the table opts
  * into materialized change files), never a table rescan. Offset
  * arithmetic is exact because version numbers are CAS-unique and
  * dense: recovery replays the same range byte-for-byte, which is what
  * makes the engine's checkpoint+sink contract deliver exactly-once.
  *
  * Options:
  *   - `tableDir` (required): the versioned table root.
  *   - `idColumn` (required): the id column changes key on.
  *   - `startingVersion` (default `latest`): first version whose
  *     changes enter the stream — an integer, or `earliest` (all
  *     retained history, i.e. every commit after the v0 baseline), or
  *     `latest` (only commits after stream start; v0's init rows are a
  *     BASELINE, not a change — Delta's CDF draws the same line).
  *   - `startingTimestamp` (millis or ISO instant; exclusive with
  *     startingVersion): changes of every commit stamped at-or-after
  *     t — "stream what happened since last Tuesday" without a
  *     recorded version number, the timestamp-travel twin.
  *   - `maxVersionsPerBatch` (optional): admission control — at most
  *     this many commits per micro-batch, for bounded trigger latency
  *     on a backlogged stream.
  *   - `endingVersion` (optional): changes of versions <= this only —
  *     a BOUNDED backfill; paired with `Trigger.AvailableNow` the query
  *     drains the (start, end] window and terminates.
  *   - `endingTimestamp` (optional, exclusive with endingVersion):
  *     the same ceiling resolved by commit stamp — changes of commits
  *     stamped at-or-before t ("replay last week's window"), via the
  *     batch time-travel resolution. Must name an ALREADY-COMMITTED
  *     past instant: the ceiling resolves once at query start, so a
  *     future t pins at the start-time latest (late-landing commits
  *     stamped <= t are the next run's window), and a t before the
  *     first retained commit refuses typed.
  *
  * Scale posture: `getOffset` is one manifest-directory listing;
  * `getBatch` plans (lazily) the feed's pruned reads. Nothing here
  * collects data on the driver. Schema is pinned at stream start — a
  * mid-stream rename/widen makes the next batch REFUSE typed (restart
  * the stream to adopt the new schema) rather than silently serving
  * rows under a shifted shape. */
class ChangeFeedSource(spark: SparkSession, tableDir: String, idCol: String,
                       startVersion: Long, maxVersionsPerBatch: Option[Long],
                       endVersion: Option[Long] = None)
    extends Source with SupportsTriggerAvailableNow with Logging {

  require(endVersion.forall(_ > startVersion),
    s"endingVersion ${endVersion.get} is not after the starting base " +
      s"v$startVersion — the bounded window is empty")

  // schema anchors at the table's LATEST version at stream start, and
  // every batch PROJECTS to that anchor (changeFeed's projectToVersion)
  // — so a history whose schema evolved before the stream started still
  // serves uniformly under the current shape, whichever side of the
  // rename/widen a micro-batch's range falls on; only a MID-stream
  // evolution trips the drift refusal below. An empty single-version
  // feed range is the cheapest way to materialize the exact output
  // schema (zero steps computed).
  private val anchor: Int = {
    val vs = Versioned.versions(spark, tableDir)
    require(vs.nonEmpty, s"no versioned table at $tableDir")
    vs.max
  }

  override val schema: StructType =
    Versioned.changeFeed(spark, tableDir, anchor, anchor, idCol).schema

  /** Furthest version this source has HANDED TO the engine — never
    * rewound: getOffset must not emit an offset below a checkpoint-
    * recovered position, or the engine would build a reversed batch
    * range. -1 = fresh stream (no engine position seen yet; the floor
    * falls back to `startingVersion`). Bumped by getBatch (recovery
    * replays the last uncommitted batch through it) and commit (the
    * engine re-commits the prior batch's offsets on restart) — so a
    * restarted `startingVersion=latest` stream continues from its
    * CHECKPOINT, it does not re-anchor to a newer "latest" and skip
    * the commits that landed while it was down. */
  @volatile private var planned: Long = -1L

  private def value(o: Offset): Long = o match {
    case l: LongOffset       => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other               => other.json.toLong
  }

  /** Offset ceiling frozen by [[prepareForTriggerAvailableNow]]: an
    * AvailableNow run drains up to here in cap-paced batches and
    * terminates, ignoring commits that land mid-drain (they're the next
    * run's work — the trigger's contract). Fresh per query start
    * (createSource constructs a new source). */
  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    val latest = Versioned.versions(spark, tableDir).max.toLong
    availableNowTarget = Some(endVersion.fold(latest)(math.min(latest, _)))
  }

  private def floorNow: Long = if (planned >= 0L) planned else startVersion

  private def targetOffset(): Long = {
    val latest0 = Versioned.versions(spark, tableDir).max.toLong
    // endingVersion bounds a BACKFILL: the stream drains the window
    // (start, end] and then reports no further offsets — under
    // Trigger.AvailableNow that is a job that terminates, the replay-a-
    // historical-window shape (Delta CDF's startingVersion/endingVersion
    // pair; shape reference only)
    val bounded = endVersion.fold(latest0)(math.min(latest0, _))
    val latest = availableNowTarget.fold(bounded)(math.min(bounded, _))
    val floor = floorNow
    math.max(floor, maxVersionsPerBatch match {
      case Some(m) => math.min(latest, floor + m)
      case None    => latest
    })
  }

  override def getOffset: Option[Offset] = {
    val target = targetOffset()
    if (target > floorNow) Some(LongOffset(target)) else None
  }

  // SupportsAdmissionControl half (the engine consults it INSTEAD of
  // getOffset when present — and must, for SupportsTriggerAvailableNow
  // to pace a capped drain across multiple batches instead of freezing
  // the first getOffset answer as the run's only window). The pacing
  // knob is maxVersionsPerBatch, so the engine-side limit stays
  // allAvailable.
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: ConnectorOffset, limit: ReadLimit): ConnectorOffset = {
    // the engine hands back its current position — recovery-safe floor
    Option(start).foreach(o => planned = math.max(planned, connectorValue(o)))
    LongOffset(targetOffset())
  }

  // progress metrics must see the TRUE backlog: the uncapped (but
  // endVersion-bounded) latest, not the admission-controlled target —
  // lag alerting built on latestOffset minus endOffset would otherwise
  // read ~zero on a badly backlogged capped stream
  override def reportLatestOffset(): ConnectorOffset = {
    val latest = Versioned.versions(spark, tableDir).max.toLong
    LongOffset(endVersion.fold(latest)(math.min(latest, _)))
  }

  private def connectorValue(o: ConnectorOffset): Long = o match {
    case l: LongOffset => l.offset
    case other         => other.json.trim.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val to = value(end)
    // the engine's checkpointed start is AUTHORITATIVE: never clamp it
    // toward startVersion — on a restarted startingVersion=latest
    // stream, startVersion re-anchored to a NEWER latest, and clamping
    // would silently skip the commits that landed while the stream was
    // down (or reverse the range outright when recovery replays the
    // last uncommitted batch). startVersion only seeds the very first
    // batch of a fresh checkpoint.
    val from = start.map(value).getOrElse(startVersion)
    planned = math.max(planned, to)
    val feed = Versioned.changeFeed(spark, tableDir, from.toInt, to.toInt, idCol,
      projectToVersion = Some(math.max(anchor.toLong, to).toInt))
    // names + types must hold exactly; nullability may legitimately
    // differ between the anchor's empty range and a computed step
    def shape(s: StructType) = s.fields.map(f => (f.name, f.dataType)).toSeq
    if (shape(feed.schema) != shape(schema))
      throw new IllegalStateException(
        s"change stream schema drift at v$to of $tableDir: the stream was " +
          s"started under ${schema.simpleString} but the feed now serves " +
          s"${feed.schema.simpleString} (a rename/widen committed mid-stream) " +
          "— restart the stream to adopt the evolved schema")
    logInfo(s"graft-changes batch: $tableDir versions (v$from, v$to]")
    StreamBridge.streamingBatch(spark, schema, feed.queryExecution.toRdd)
  }

  override def commit(end: Offset): Unit = {
    // the engine re-commits the last completed batch's offsets on
    // restart — the bump keeps getOffset monotonic past it. Version
    // retention is the table's vacuum policy, not the stream's: a
    // consumer restarting beyond the horizon fails typed in changeFeed.
    planned = math.max(planned, value(end))
  }

  override def stop(): Unit = ()

  override def toString: String = s"ChangeFeedSource[$tableDir]"
}

/** `format("graft-changes")` registration (v1 [[StreamSourceProvider]]
  * — the API whose `getBatch` returns a planned DataFrame, which is
  * exactly what a change feed over manifest-pruned parquet reads is;
  * the file-list-shipping DSv2 `MicroBatchStream` shape would force
  * the feed's join/mask logic onto bare executor-side readers). */
class ChangeFeedSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-changes"

  private def parse(parameters: Map[String, String])
      : (String, String, Map[String, String], Option[Long], Option[Long]) = {
    val p = parameters.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
    val tableDir = p.getOrElse("tabledir",
      throw new IllegalArgumentException(
        "graft-changes requires option 'tableDir' (versioned table root)"))
    val idCol = p.getOrElse("idcolumn",
      throw new IllegalArgumentException(
        "graft-changes requires option 'idColumn' (the id changes key on)"))
    require(!(p.contains("startingversion") && p.contains("startingtimestamp")),
      "startingVersion and startingTimestamp are mutually exclusive")
    val maxPer = p.get("maxversionsperbatch").map(_.toLong)
    maxPer.foreach(m => require(m > 0, s"maxVersionsPerBatch must be > 0, got $m"))
    require(!(p.contains("endingversion") && p.contains("endingtimestamp")),
      "endingVersion and endingTimestamp are mutually exclusive")
    (tableDir, idCol, p, maxPer, p.get("endingversion").map(_.toLong))
  }

  /** `endingVersion` / `endingTimestamp` as the bounded-backfill
    * ceiling: changes of commits <= N, or of commits stamped at-or-
    * before t ([[graft.operators.Versioned.versionAsOf]] — the same
    * resolution batch time travel uses). None = unbounded.
    *
    * `endingTimestamp` must refer to an ALREADY-COMMITTED PAST instant:
    * the ceiling resolves ONCE at query start, so a future t pins it at
    * the start-time latest version — commits stamped <= t that land
    * after the query starts are the NEXT run's window, exactly like
    * commits landing mid-drain under Trigger.AvailableNow. A t before
    * the first retained commit refuses with a stream-specific message
    * (there is no commit for the window to end at). */
  private def resolveEnd(spark: SparkSession, tableDir: String,
                         p: Map[String, String],
                         endVersion: Option[Long]): Option[Long] =
    endVersion.orElse(p.get("endingtimestamp").map { ts =>
      val millis = scala.util.Try(ts.toLong).getOrElse(
        java.time.Instant.parse(ts).toEpochMilli)
      try Versioned.versionAsOf(spark, tableDir, millis).toLong
      catch { case e: IllegalArgumentException =>
        throw new IllegalArgumentException(
          s"endingTimestamp $millis predates the first retained commit of " +
            s"$tableDir — the bounded window has no commit to end at; pass " +
            "a stamp of an already-committed past instant " +
            s"(${e.getMessage})", e)
      }
    })

  /** The stream's BASE version from the starting options: changes of
    * every commit AFTER the base enter the stream.
    *   - `startingVersion`: `latest` (default) / `earliest` / N
    *     (changes of v N and later => base N-1).
    *   - `startingTimestamp` (millis or ISO instant): changes of every
    *     commit stamped at-or-after t — resolved through
    *     [[graft.operators.Versioned.versionAtOrAfter]] (Delta-CDF's
    *     startingTimestamp semantics; shape reference only). A t past
    *     the latest stamp anchors at latest (only future commits); a t
    *     before retained history streams everything retained. */
  private def resolveBase(spark: SparkSession, tableDir: String,
                          p: Map[String, String], latest: Long): Long =
    p.get("startingtimestamp") match {
      case Some(ts) =>
        val millis = scala.util.Try(ts.toLong).getOrElse(
          java.time.Instant.parse(ts).toEpochMilli)
        Versioned.versionAtOrAfter(spark, tableDir, millis) match {
          case Some(v) => math.max(0L, v - 1L)
          case None    => latest
        }
      case None =>
        p.get("startingversion").map(_.toLowerCase(java.util.Locale.ROOT)) match {
          case None | Some("latest") => latest
          case Some("earliest")      => 0L
          case Some(n)               => math.max(0L, n.toLong - 1L)
        }
    }

  /** Schema this provider instance derived at `readStream.load()` time,
    * keyed by (tableDir, idColumn). The engine resolves sourceSchema
    * (load) and createSource (query start) through ONE DataSource —
    * hence one provider instance — but hands createSource only the
    * USER-specified schema, which this source forbids, so the provider
    * must remember its own answer to detect a commit landing between
    * the two calls. Instance state, not a file: each load() builds a
    * fresh DataSource, so the capture never outlives its query. */
  private val loadTimeSchemas =
    scala.collection.concurrent.TrieMap.empty[(String, String), StructType]

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty,
      "graft-changes derives its schema from the table's committed schema — " +
        "a user-specified schema cannot apply")
    val (tableDir, idCol, _, _, _) = parse(parameters)
    val spark = sqlContext.sparkSession
    val vs = Versioned.versions(spark, tableDir)
    require(vs.nonEmpty, s"no versioned table at $tableDir")
    val derived = Versioned.changeFeed(spark, tableDir, vs.max, vs.max, idCol).schema
    loadTimeSchemas((tableDir, idCol)) = derived
    (shortName(), derived)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val (tableDir, idCol, opts, maxPer, end) = parse(parameters)
    val spark = sqlContext.sparkSession
    val vs = Versioned.versions(spark, tableDir)
    require(vs.nonEmpty, s"no versioned table at $tableDir")
    val base = initialBase(spark, metadataPath,
      resolveBase(spark, tableDir, opts, vs.max.toLong))
    val source = new ChangeFeedSource(spark, tableDir, idCol, base, maxPer,
      resolveEnd(spark, tableDir, opts, end))
    // the engine planned the query under the schema sourceSchema derived
    // at readStream.load() (createSource's schema param carries only a
    // USER schema, which this source forbids — the engine passes None
    // here); the source just anchored its own at query start — a
    // rename/widen commit landing BETWEEN the two must refuse with the
    // same typed drift error getBatch raises, not surface later as the
    // engine's opaque positional-binding assertion. The load-time shape
    // comes from this provider instance's own sourceSchema capture (the
    // engine calls both through one DataSource); an explicit schema
    // param, if a direct caller passes one, is held to the same bar.
    schema.orElse(loadTimeSchemas.get((tableDir, idCol))).foreach { captured =>
      def shape(s: StructType) = s.fields.map(f => (f.name, f.dataType)).toSeq
      if (shape(captured) != shape(source.schema))
        throw new IllegalStateException(
          s"change stream schema drift at $tableDir: readStream.load() " +
            s"captured ${captured.simpleString} but the table now serves " +
            s"${source.schema.simpleString} (a rename/widen committed between " +
            "load() and query start) — re-plan the stream to adopt the " +
            "evolved schema")
    }
    source
  }

  /** The stream's FIRST base version, durable under the source's
    * engine-assigned `metadataPath` (the v1 contract Kafka and
    * FileStreamSource persist their initial offsets through): resolved
    * ONCE at first start and recovered from disk ever after. Without
    * this, a query that crashes after the offset-log write but before
    * the first commit replays batch 0 as `getBatch(None, end)` — and a
    * re-resolved `startingVersion=latest` would re-anchor to the NEW
    * latest, silently skipping every commit that landed while the
    * stream was down (or reversing the range outright). */
  private def initialBase(spark: SparkSession, metadataPath: String,
                          resolveNow: => Long): Long = {
    val p = new org.apache.hadoop.fs.Path(metadataPath, "graft-initial-base")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def read(): Long = {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
    if (fs.exists(p)) read()
    else {
      val v = resolveNow
      fs.mkdirs(p.getParent): Unit
      val tmp = new org.apache.hadoop.fs.Path(metadataPath,
        ".graft-initial-base.tmp")
      val out = fs.create(tmp, true)
      try out.write(v.toString.getBytes("UTF-8")) finally out.close()
      // rename is the atomic publish; a lost race means another starter
      // already persisted the authoritative base — read theirs
      if (fs.rename(tmp, p)) v
      else { fs.delete(tmp, false): Unit; read() }
    }
  }
}
