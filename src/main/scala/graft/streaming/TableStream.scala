package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.operators.Versioned

/** Streaming ingest into a [[Versioned]] table: each micro-batch is ONE
  * atomic commit, so readers always see a committed version — never a
  * half-written batch — and the stream's history is queryable per
  * trigger (time travel across micro-batches).
  *
  * Exactly-once table commits on top of foreachBatch's at-least-once
  * replay: every commit records its micro-batch id in the manifest it
  * writes (`#batchId=N` metadata line), and [[commitBatch]] consults the
  * last committed id first — a replayed batch (failure recovery,
  * checkpoint restart) is recognized and skipped, and because the id
  * rides INSIDE the atomically-renamed manifest there is no
  * commit-then-marker window to crash in.
  *
  * Scale shape: per-trigger work is one parquet write of the batch plus
  * one manifest rename (append-only — no copy-on-write read of the
  * table), and the replay guard reads manifests newest-first, stopping
  * at the first matching batch-id line — O(1) manifest reads in steady
  * state. Small per-trigger files are the deliberate trade; amortize
  * them with [[graft.operators.Versioned.compact]] (an OPTIMIZE-style
  * COMMIT that preserves every manifest — NOT
  * `Maintenance.compactSmallFiles`, whose in-place directory swap would
  * dangle every manifest's file references). */
object TableStream {

  /** Commit `batch` as the table's next version, exactly once per
    * `batchId`: replays of an already-committed id are no-ops. Batch 0
    * on an uninitialized table creates version 0. Empty batches commit
    * nothing (but still advance nothing — an empty replay is
    * indistinguishable from a skip, which is fine because it changes
    * nothing either way).
    * @return the committed version, or None when skipped */
  def commitBatch(batch: DataFrame, tableDir: String, batchId: Long,
                  writerId: String = DefaultWriterId,
                  statsCol: Option[String] = None,
                  bloomCol: Option[String] = None): Option[Int] = {
    if (batch.isEmpty) None
    else if (Versioned.lastBatchId(batch.sparkSession, tableDir,
               Some(writerId)).exists(_ >= batchId)) None
    else {
      val meta = Map("batchId" -> batchId.toString, "writerId" -> writerId)
      if (Versioned.versions(batch.sparkSession, tableDir).isEmpty)
        // two DIFFERENT writers racing batch 0 on a fresh table: the
        // init loser's data is intact (attempt-unique dir), so it lands
        // as the append it would have been had it read the winner's v0
        // (append's own retry loop absorbs any further interleaving).
        // The race surfaces two ways: CommitRaceLost when both reach
        // the manifest rename, OR init's table-already-initialized
        // require when the winner fully commits v0 between our
        // emptiness check above and init's internal re-check — the
        // IllegalArgumentException arm only fires on that window
        // (versions were empty moments ago), so it cannot mask a
        // genuine misuse of init on a long-standing table
        Some(try Versioned.init(batch, tableDir, meta, statsCol, bloomCol)
             catch {
               case _: Versioned.CommitRaceLost =>
                 Versioned.append(batch, tableDir, meta, statsCol, bloomCol)
               case _: IllegalArgumentException =>
                 Versioned.append(batch, tableDir, meta, statsCol, bloomCol)
             })
      else Some(Versioned.append(batch, tableDir, meta, statsCol, bloomCol))
    }
  }

  /** Single-writer default: every commitBatch call without an explicit
    * writerId shares one identity, preserving the original contract. */
  val DefaultWriterId = "stream"

  /** Run the stream into the versioned table at `tableDir`, one commit
    * per micro-batch via [[commitBatch]].
    *
    * `checkpointDir` is REQUIRED for any stream that must survive a
    * restart: without it Spark uses a temporary checkpoint, a restarted
    * query re-reads the source with batch ids starting at 0, and the
    * replay guard — seeing the previous run's high-water mark under the
    * same writerId — would silently skip genuinely new data. Pair a
    * fresh checkpoint with a fresh `writerId` for the same reason. */
  def commitEachBatch(stream: DataFrame, tableDir: String,
                      trigger: Trigger = Trigger.AvailableNow(),
                      checkpointDir: Option[String] = None,
                      writerId: String = DefaultWriterId): StreamingQuery = {
    val base = stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        commitBatch(batch, tableDir, id, writerId): Unit
      }
      .trigger(trigger)
    checkpointDir.fold(base)(d => base.option("checkpointLocation", d)).start()
  }
}
