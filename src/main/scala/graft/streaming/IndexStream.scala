package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.operators.{KnnHnsw, KnnIvf}

/** Streaming `/index` into a SAVED ANN index — the reference's
  * incremental `index()` endpoint (`/root/reference/executor.py:127-150`:
  * each request's batch of embeddings is added into the live hnswlib
  * graph) under continuous arrival, as Structured Streaming.
  *
  * Each micro-batch is cell-assigned with the index's stored KMeans
  * model and upserted LAST-WINS under ONLY its touched cell directories
  * ([[KnnIvf.appendTo]]). Per-batch work is O(batch + touched-cell
  * data), independent of index size: the broadcast model does the
  * assignment (a narrow map — no shuffle), and only the batch's cells
  * rewrite. Last-wins is ALSO the replay guard: foreachBatch is
  * at-least-once, and a replayed batch's ids anti-join their first
  * copies away before identical rows land again — the graph path below
  * is idempotent the same way ([[KnnHnsw.appendTo]]'s upsert).
  * Because cell assignment is a pure per-row function of the FIXED
  * stored model, the index a stream builds is row-for-row the index a
  * single batch append builds from the same rows — the stream==batch
  * contract [[DedupStream]] carries for dedup, here for index ingest
  * (gated per round by `ann_ivf_stream_ingest`).
  *
  * At 100 TB the same shape holds: the model broadcast is KB-sized,
  * each trigger's append is proportional to the trigger's data, and
  * queries keep serving from the directory tree between triggers
  * (readers of already-committed files never block on the writer). */
object IndexStream {

  /** Run the embedding stream into the saved IVF index at `indexPath`.
    * The stream's rows must carry the index corpus's columns (id +
    * `vecCol`). Foreach-batch is the right sink here, not a parquet
    * streaming sink: the append must go through the model-assign step
    * and land partitioned by the ASSIGNED cell, which is a per-batch
    * transformation of exactly the kind `foreachBatch` exists for. */
  def indexEachBatch(stream: DataFrame, indexPath: String,
                     vecCol: String = "embedding",
                     trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        KnnIvf.appendTo(batch.sparkSession, indexPath, batch, vecCol)
      }
      .trigger(trigger)
      .start()

  /** Run the embedding stream into the saved sharded-NSW graph at
    * `indexPath` — the graph rendition of [[indexEachBatch]], which is
    * the closest shape to the reference's actual lifecycle (hnswlib
    * graph + incremental `index()` calls, `executor.py:49,127-168`).
    * Each micro-batch hashes to its shards and ONLY those shards
    * rebuild ([[KnnHnsw.appendTo]]); per-trigger work is
    * O(touched shards), not O(graph). Because the per-shard build is
    * deterministic over the shard's final id set, the graph a stream
    * builds — across ANY batch split — is row-for-row IDENTICAL to one
    * batch append of the same rows (gated per round by
    * `ann_hnsw_stream_ingest` as frame identity, not just served-result
    * agreement). */
  def indexEachBatchGraph(stream: DataFrame, indexPath: String,
                          numShards: Int, m: Int = 8, efConstruction: Int = 64,
                          trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        KnnHnsw.appendTo(batch.sparkSession, indexPath, batch,
          numShards, m, efConstruction)
      }
      .trigger(trigger)
      .start()
}
