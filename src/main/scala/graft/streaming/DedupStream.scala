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
  * bounded by band selectivity AND, for a long-running ingest, by
  * `maxMembersPerBucket`: each bucket keeps its most recent cap members,
  * so new arrivals still pair against everything inside that horizon and
  * only pairs with evicted (older-than-horizon) members are missed — the
  * same trade a state TTL makes, expressed in members instead of time so
  * state is bounded by construction (buckets x cap x signature width),
  * not by arrival-rate assumptions. Evictions are observable through the
  * optional `droppedAcc` accumulator; the default cap is unbounded,
  * which is exact and fine for bounded runs.
  *
  * Emitted pairs carry the signature-agreement estimate of Jaccard (the
  * unbiased MinHash estimator); exact verification needs the documents'
  * shingle sets, which is a batch join downstream of the emitted pairs —
  * candidates here, verify where the text lives.
  */
object DedupStream {

  case class BucketRow(band: Int, bh: Long, id: Long, sig: Seq[Long])
  case class Member(id: Long, sig: Seq[Long])
  case class CandPair(id_a: Long, id_b: Long, est_jaccard: Double)

  /** Streaming LSH candidate pairs. May emit the same (id_a, id_b) from
    * several colliding bands (like the batch candidate stage before its
    * distinct) — consumers dedup, order, or verify downstream. */
  def nearDupCandidatesStream(docs: DataFrame, idCol: String = "doc_id",
                              textCol: String = "text", shingleN: Int = 3,
                              numPerms: Int = 32, bands: Int = 16,
                              estThreshold: Double = 0.0,
                              maxMembersPerBucket: Int = Int.MaxValue,
                              droppedAcc: Option[LongAccumulator] = None): Dataset[CandPair] = {
    require(numPerms % bands == 0, s"bands $bands must divide numPerms $numPerms")
    require(maxMembersPerBucket >= 1, s"bucket cap must be >= 1, got $maxMembersPerBucket")
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
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: (Int, Long), rows: Iterator[BucketRow], state: GroupState[List[Member]]) =>
          // id-sorted batch arrivals: emission order (and the pair set,
          // trivially) is independent of upstream row order
          val arrivals = rows.map(r => Member(r.id, r.sig)).toArray.sortBy(_.id)
          val out = scala.collection.mutable.ArrayBuffer.empty[CandPair]
          var seen = state.getOption.getOrElse(Nil)
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
          out.iterator
      }
  }
}
