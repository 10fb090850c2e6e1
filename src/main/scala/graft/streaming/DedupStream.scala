package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.util.LongAccumulator

import graft.operators.Dedup

/** Streaming near-duplicate detection — dedup-on-ingest, the E2 × E5
  * composition: documents arrive as a stream and each is checked against
  * everything already ingested WITHOUT re-scanning the corpus.
  *
  * Shape: per micro-batch, docs are signature'd with the SAME codegen'd
  * kernels as the batch flagship ([[Dedup.minhashSignatures]] —
  * signature construction stays a narrow projection even on a stream),
  * exploded to (band, bucket) keys, and matched per bucket against
  * STATE: the (id, signature) members this bucket has seen. New arrivals
  * pair against prior state AND earlier arrivals of the same batch, so a
  * batch boundary never changes the emitted pair set (spec-pinned:
  * stream == batch candidates on the same corpus, any split).
  *
  * Only buckets touched by a batch do any work; per-bucket membership is
  * bounded by band selectivity AND, for a long-running ingest, by TWO
  * composable horizons:
  *   - `maxMembersPerBucket`: each bucket keeps its most recent cap
  *     members — state bounded by construction (buckets x cap x
  *     signature width), no arrival-rate assumptions;
  *   - `ttlMs`: a processing-time horizon — members older than the TTL
  *     are evicted when their bucket is next touched, and a bucket idle
  *     past the TTL has its WHOLE state reclaimed via
  *     `ProcessingTimeTimeout` (so cold buckets do not hold state
  *     forever, the wall-clock-bounded-ingest trade).
  * New arrivals still pair against everything inside the horizon; only
  * pairs with evicted members are missed. Every eviction — cap, sweep,
  * or idle-bucket timeout — is observable through the optional
  * `droppedAcc` accumulator. The defaults (unbounded, no TTL) are exact
  * and fine for bounded runs.
  *
  * Emitted pairs carry the signature-agreement estimate of Jaccard (the
  * unbiased MinHash estimator); exact verification needs the documents'
  * shingle sets, which is a batch join downstream of the emitted pairs —
  * candidates here, verify where the text lives.
  */
object DedupStream {

  case class BucketRow(band: Int, bh: Long, id: Long, sig: Seq[Long])
  /** `seenAt` = processing-time ms of the member's arrival batch (0 when
    * no TTL is configured — the field is then never consulted). */
  case class Member(id: Long, sig: Seq[Long], seenAt: Long = 0L)
  case class CandPair(id_a: Long, id_b: Long, est_jaccard: Double)

  /** Streaming LSH candidate pairs. May emit the same (id_a, id_b) from
    * several colliding bands (like the batch candidate stage before its
    * distinct) — consumers dedup, order, or verify downstream.
    * @param ttlMs processing-time horizon: members older than this are
    *              evicted (and idle buckets reclaimed) — Long.MaxValue
    *              = no TTL. CAUTION: with a processing-time timeout the
    *              engine re-triggers batches continuously to advance
    *              timeout checks, so (a) give the query a real trigger
    *              interval (e.g. `Trigger.ProcessingTime("1 minute")`)
    *              to bound the churn, and (b) do not wait on
    *              `processAllAvailable()` — it never observes quiescence
    *              under continuous retriggering; poll query progress or
    *              the sink instead (as StreamingSpec does). */
  def nearDupCandidatesStream(docs: DataFrame, idCol: String = "doc_id",
                              textCol: String = "text", shingleN: Int = 3,
                              numPerms: Int = 32, bands: Int = 16,
                              estThreshold: Double = 0.0,
                              maxMembersPerBucket: Int = Int.MaxValue,
                              ttlMs: Long = Long.MaxValue,
                              droppedAcc: Option[LongAccumulator] = None): Dataset[CandPair] = {
    require(numPerms % bands == 0, s"bands $bands must divide numPerms $numPerms")
    require(maxMembersPerBucket >= 1, s"bucket cap must be >= 1, got $maxMembersPerBucket")
    require(ttlMs >= 1, s"state TTL must be >= 1 ms, got $ttlMs")
    val hasTtl = ttlMs != Long.MaxValue
    val spark = docs.sparkSession
    import spark.implicits._
    val sigs = Dedup.minhashSignatures(docs, idCol, textCol, shingleN, numPerms)
    sigs
      .select(col(idCol).as("id"), col("sig"),
        posexplode(Dedup.bandHashes(col("sig"), bands, numPerms / bands))
          .as(Seq("band", "bh")))
      .select(col("band"), col("bh"), col("id"), col("sig"))
      .as[BucketRow]
      .groupByKey(r => (r.band, r.bh))
      .flatMapGroupsWithState[List[Member], CandPair](
        OutputMode.Append(),
        if (hasTtl) GroupStateTimeout.ProcessingTimeTimeout()
        else GroupStateTimeout.NoTimeout()) {
        (_: (Int, Long), rows: Iterator[BucketRow], state: GroupState[List[Member]]) =>
          if (state.hasTimedOut) {
            // idle bucket past the TTL: reclaim the whole state, counting
            // each member as an observable drop
            droppedAcc.foreach(_.add(state.getOption.map(_.size.toLong).getOrElse(0L)))
            state.remove()
            Iterator.empty
          } else {
            // id-sorted batch arrivals: emission order (and the pair set,
            // trivially) is independent of upstream row order
            val nowMs = if (hasTtl) state.getCurrentProcessingTimeMs() else 0L
            val arrivals = rows.map(r => Member(r.id, r.sig, nowMs)).toArray.sortBy(_.id)
            val out = scala.collection.mutable.ArrayBuffer.empty[CandPair]
            var seen = state.getOption.getOrElse(Nil)
            if (hasTtl) {
              // horizon sweep BEFORE pairing: expired members must not
              // pair with this batch's arrivals
              val (kept, expired) = seen.partition(_.seenAt >= nowMs - ttlMs)
              droppedAcc.foreach(_.add(expired.size.toLong))
              seen = kept
            }
            for (m <- arrivals) {
              for (o <- seen if o.id != m.id) {
                val n = math.min(o.sig.length, m.sig.length)
                var agree = 0
                var i = 0
                while (i < n) { if (o.sig(i) == m.sig(i)) agree += 1; i += 1 }
                val est = if (n == 0) 0.0 else agree.toDouble / n
                if (est >= estThreshold)
                  out += CandPair(math.min(o.id, m.id), math.max(o.id, m.id),
                    math.rint(est * 10000) / 10000)
              }
              // most-recent-first prepend, so the cap keeps the newest
              // horizon and evicts the oldest members
              seen = m :: seen
              if (seen.lengthCompare(maxMembersPerBucket) > 0) {
                seen = seen.take(maxMembersPerBucket)
                droppedAcc.foreach(_.add(1L))
              }
            }
            state.update(seen)
            if (hasTtl) state.setTimeoutDuration(ttlMs)
            out.iterator
          }
      }
  }
}
