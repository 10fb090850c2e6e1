package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Bounded per-group top-k as a partial/final aggregation — the
  * scale-correct physical shape for batched k-NN (SURVEY §2.4 variant 2,
  * §4.2 "bounded top-k"):
  *
  * The window formulation (`row_number over (partition by query)`)
  * shuffles and sorts all Q*N scored rows. This Aggregator keeps a
  * bounded buffer per query inside each map task, so only Q*k rows per
  * partition reach the shuffle — on a 1000-executor scan of a 100 TB
  * corpus that is the difference between a Q*N-row exchange and a
  * Q*k*partitions one. Results are identical to [[Knn.knnExact]]
  * (same round-then-rank, same id tiebreak).
  */
object KnnTopK {

  /** (score, id) pairs, best-first by (score asc|desc, id asc). */
  class TopKAgg(k: Int, asc: Boolean)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

    private def better(a: (Double, Long), b: (Double, Long)): Boolean =
      if (a._1 != b._1) { if (asc) a._1 < b._1 else a._1 > b._1 }
      else a._2 < b._2

    private def best(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
      s.sortWith(better).take(k)

    // trim lazily at 4k to amortize sorting cost over appends
    private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
      if (s.length > 4 * k) best(s) else s

    override def zero: Seq[(Double, Long)] = Seq.empty
    override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
      trim(b :+ a)
    override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
      trim(x ++ y)
    override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = best(b)
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      implicitly[Encoder[Seq[(Double, Long)]]](
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder())
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      implicitly[Encoder[Seq[(Double, Long)]]](
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder())
  }

  /** Exact k-NN with aggregation-based top-k; output identical to
    * [[Knn.knnExact]]: (query_id, match_id, score, rank). */
  def knnExact(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      metric: String = "cosine",
      asDistance: Boolean = true,
      corpusId: String = "vec_id",
      corpusVec: String = "embedding",
      scoreDecimals: Int = 4): DataFrame = {
    val d = VectorOps.distance(metric, col("query_vec"), col(corpusVec))
    val rawScore = if (asDistance) d else VectorOps.distanceToSimilarity(metric, d)
    val scored = corpus
      .join(broadcast(queries))
      .select(
        col("query_id"),
        col(corpusId).as("match_id"),
        // signed-zero canonicalization — see [[Knn.knnExact]]
        (round(rawScore, scoreDecimals) + lit(0.0)).as("score"))
    boundedTopK(scored, k, asc = asDistance)
  }

  /** Shared bounded top-k finisher over a (query_id, match_id, score)
    * frame: Q·k rows per partition reach the shuffle (the [[TopKAgg]]
    * partial/final pattern), output (query_id, match_id, score, rank)
    * with a 1-based long rank. The single definition of that contract —
    * [[knnExact]] and [[KnnJoin]] both emit through here. */
  def boundedTopK(scored: DataFrame, k: Int, asc: Boolean = true): DataFrame = {
    val topk = udaf(new TopKAgg(k, asc = asc))
    scored.groupBy(col("query_id"))
      .agg(topk(col("score"), col("match_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "m")))
      .select(col("query_id"), col("m._2").as("match_id"),
        col("m._1").as("score"), (col("pos") + 1).cast("long").as("rank"))
  }
}
