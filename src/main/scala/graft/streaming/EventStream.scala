package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.Lifecycle

/** Structured Streaming renditions of the engine's incremental paths
  * (SURVEY §2.9 E5). The reference's incrementality is RPC-driven
  * (`/index` batches arriving over gRPC, `/root/reference/executor.py:127`);
  * stream-time-driven Spark equivalents:
  *
  *  - [[hourlyCounts]]: the event-time windowed aggregate of
  *    [[graft.operators.EventOps.hourlyAgg]] with a watermark for state
  *    eviction — at scale this is the only state-bounded form.
  *  - [[upsertEachBatch]]: `foreachBatch` last-wins upsert into a Parquet
  *    corpus — the streaming form of `/index` (O11).
  *  - [[runningUserCounts]]: `mapGroupsWithState` custom state, the
  *    extension point HNSW-style incremental structures would hang off.
  */
object EventStream {

  /** Corpus-existence probe through the Hadoop filesystem of the path —
    * a `java.io.File` check is always false on HDFS/S3, which would make
    * the merge path silently degrade to overwrite-with-batch-only. */
  private def corpusExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Streaming source over the fixture events file(s). `readStream`
    * requires a user-supplied schema, and `ts`'s physical type has drifted
    * across fixture generations (nanos-as-long vs timestamp[us]) — so take
    * the schema from a batch read of the same file and reuse
    * [[graft.sources.Tables.adaptTs]] for the normalization. The batch
    * schema probe is footer-metadata only, no data read. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val fileSchema = spark.read.parquet(s"$dir/events.parquet").schema
    graft.sources.Tables.adaptTs(
      spark.readStream
        .schema(fileSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
  }

  /** Watermarked event-time tumbling window counts (append mode capable). */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n_events"))

  /** Run a streaming frame into an in-memory table until the source is
    * drained (test/demo harness). Returns the completed query handle. */
  def runToMemory(df: DataFrame, name: String,
                  mode: OutputMode = OutputMode.Complete()): StreamingQuery = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q
  }

  /** Streaming `/index`: each micro-batch is last-wins-upserted into the
    * Parquet corpus table keyed by `idCol` — the O11 semantics
    * (`executor.py:151-164`) under continuous arrival.
    *
    * Fixture-scale demo: read-all + overwrite is O(corpus) per batch.
    * The scale form is [[upsertEachBatchPartitioned]], which touches only
    * the id-bucket partitions the batch lands in. */
  def upsertEachBatch(stream: DataFrame, corpusPath: String,
                      idCol: String = "event_id"): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val stamped = batch.withColumn("batch", lit(batchId))
        val merged =
          if (corpusExists(spark, corpusPath)) {
            val existing = spark.read.parquet(corpusPath)
            Lifecycle.upsertById(existing, stamped, idCol, "batch")
          } else stamped
        // localCheckpoint breaks the lineage into the path being overwritten
        merged.localCheckpoint(true)
          .write.mode("overwrite").parquet(corpusPath)
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Scale form of the streaming upsert: the corpus lives partitioned by
    * a stable id bucket (`__bkt = pmod(xxhash64(id), nBuckets)`), and each
    * micro-batch (1) reads back ONLY the bucket partitions its ids touch
    * (partition pruning on the filter) and (2) rewrites ONLY those
    * partitions via dynamic partition overwrite. Per-batch work is
    * O(touched buckets), not O(corpus) — with 4k buckets over 100 TB a
    * point-update batch rewrites ~25 GB, not the table. */
  def upsertEachBatchPartitioned(stream: DataFrame, corpusPath: String,
                                 idCol: String = "event_id",
                                 nBuckets: Int = 16): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val stamped = batch
          .withColumn("batch", lit(batchId))
          .withColumn("__bkt", pmod(xxhash64(col(idCol)), lit(nBuckets.toLong)).cast("int"))
        val merged =
          if (corpusExists(spark, corpusPath)) {
            // touched-bucket list is metadata-sized (<= nBuckets ints)
            val touched = stamped.select("__bkt").distinct().collect()
              .map(r => Integer.valueOf(r.getInt(0)))
            val existing = spark.read.parquet(corpusPath)
              .filter(col("__bkt").isin(touched: _*))
            Lifecycle.upsertById(existing, stamped, idCol, "batch")
          } else stamped
        val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try
          merged.localCheckpoint(true)
            .write.mode("overwrite").partitionBy("__bkt").parquet(corpusPath)
        finally prev match {
          case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
          case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Stream-static enrichment: join every micro-batch against a BATCH
    * dimension frame. The dim side is broadcast — re-planned per batch,
    * no streaming state, no watermark; this is how a 100 TB/day stream
    * picks up a reference table (labels, weights, routing) that lives in
    * the warehouse. Inner equi-join keeps the result append-only. */
  def enrichWithDim(stream: DataFrame, dim: DataFrame,
                    key: String = "event_type"): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key))

  /** Stream-stream interval self-join: pair each event with the same
    * user's events from the preceding `horizon`. Both sides are
    * watermarked and the join carries an event-time range constraint, so
    * state is bounded: Spark evicts buffered rows once the watermark
    * passes the interval — the only join form that survives an unbounded
    * stream. Output (user_id, ts, prior_ts, event_type, prior_type). */
  def joinRecentPriors(events: DataFrame, horizon: String = "30 minutes",
                       watermark: String = "2 hours"): DataFrame = {
    val cur = events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), col("event_type"))
    val prior = events.withWatermark("ts", watermark)
      .select(col("user_id").as("p_user"), col("ts").as("prior_ts"),
        col("event_type").as("prior_type"))
    cur.join(prior,
      col("user_id") === col("p_user") &&
        col("prior_ts") >= col("ts") - expr(s"INTERVAL $horizon") &&
        col("prior_ts") < col("ts"))
      .select(col("user_id"), col("ts"), col("prior_ts"),
        col("event_type"), col("prior_type"))
  }

  /** Streaming exact dedup (E1 under continuous arrival): drop rows whose
    * id was already seen inside the watermark horizon. State is bounded
    * by the watermark — ids older than the horizon are evicted, which is
    * the only dedup form that survives an unbounded stream. */
  def dedupedStream(events: DataFrame, idCol: String = "event_id",
                    watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCol)

  /** A closed session: [start_s, end_s] in epoch seconds + event count. */
  case class SessionRow(user_id: Long, start_s: Long, end_s: Long, n_events: Long)
  /** In-flight session state (public: the state encoder's generated code
    * must reach the accessors). */
  case class OpenSession(start: Long, end: Long, n: Long)

  /** Streaming gap sessionization with EVENT-TIME TIMEOUT state closure —
    * the batch [[graft.operators.EventOps.sessionize]] semantics under
    * continuous arrival. A user's open session lives in
    * `flatMapGroupsWithState` state; it closes (and is emitted) either by
    * a later in-batch event beyond the gap, or by the event-time timeout
    * firing once the watermark passes `session end + gap` — so state is
    * bounded by (active users × one open session) and every session is
    * emitted exactly once. Gap comparisons use floor-second timestamps,
    * matching the batch operator's `unix_timestamp` arithmetic. */
  def sessionizeStream(events: DataFrame, gapSeconds: Long = 1800,
                       watermark: String = "2 hours"): Dataset[SessionRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    // the watermarked timestamp column must survive untouched into the
    // state op (a cast would strip the event-time attribute); floor to
    // whole seconds only inside the function
    events.withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, SessionRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rowsT: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[OpenSession]) =>
          val rows = rowsT.map { case (u, t) => (u, t.getTime / 1000L) }
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionRow(user, s.start, s.end, s.n))
          } else {
            // per (user, batch) rows fit memory by construction (a user's
            // events in one micro-batch); sort restores event-time order
            val ts = rows.map(_._2).toArray.sorted
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionRow]
            var open = state.getOption
            for (t <- ts) open match {
              case Some(o) if t - o.end <= gapSeconds =>
                open = Some(OpenSession(o.start, math.max(o.end, t), o.n + 1))
              case Some(o) =>
                closed += SessionRow(user, o.start, o.end, o.n)
                open = Some(OpenSession(t, t, 1))
              case None =>
                open = Some(OpenSession(t, t, 1))
            }
            open.foreach { o =>
              state.update(o)
              // timeout must sit beyond the current watermark or Spark
              // rejects it; a session already older than the watermark
              // times out on the very next trigger
              state.setTimeoutTimestamp(math.max(
                (o.end + gapSeconds) * 1000L + 1,
                state.getCurrentWatermarkMs() + 1))
            }
            closed.iterator
          }
      }
  }

  // NOT private: whole-stage codegen instantiates the encoder class from
  // generated Java, which cannot see a private Scala nested class — the
  // private form compiled, but every streaming trigger fell back to the
  // interpreter with a logged stack trace
  case class UserCount(user_id: Long, n_events: Long)

  /** Custom streaming state: running per-user event counts via
    * `mapGroupsWithState` (the arbitrary-state API a richer incremental
    * index would use). */
  def runningUserCounts(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.selectExpr("user_id").as[Long]
      .groupByKey(identity)
      .mapGroupsWithState[Long, UserCount](GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[Long], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          UserCount(user, n)
      }
      .toDF()
  }
}
