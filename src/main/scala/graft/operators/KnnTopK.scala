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

  /** Mutable bounded top-k buffer: parallel (score, id) arrays arranged
    * as a binary heap with the WORST kept element at the root, so a
    * full buffer evicts in O(log k) — O(1) allocations and no per-row
    * collection copying on the hottest aggregation path in the engine
    * (every `knn_*` default and both k-NN joins ride this).
    *
    * Ordering: best-first by (score asc|desc, id asc); the heap holds at
    * most k elements at all times, never an over-allocated staging set.
    * The no-arg constructor + vars keep the class Kryo-friendly (the
    * aggregation buffer crosses the partial/final shuffle as Kryo
    * bytes — ~16 bytes per kept element). */
  final class TopKBuf(var k: Int, var asc: Boolean) extends Serializable {
    def this() = this(0, true)
    var scores: Array[Double] = new Array[Double](math.max(k, 0))
    var ids: Array[Long] = new Array[Long](math.max(k, 0))
    var n: Int = 0

    @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
      if (s1 != s2) { if (asc) s1 < s2 else s1 > s2 } else i1 < i2
    // heap predicate: does element 1 belong ABOVE element 2 (closer to
    // the root, i.e. worse)?
    @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
      better(s2, i2, s1, i1)

    def offer(s: Double, id: Long): Unit = {
      // NaN scores (0/0 cosine on a zero-norm vector) are rejected outright:
      // every NaN comparison is false, so an admitted NaN would squat in a
      // slot during fill — or, at the heap root, veto every later offer and
      // merge. Dropping it keeps the buffer's invariants total. (Divergence
      // from the replaced row_number window, which ranked NaN as LARGEST —
      // last for distances, FIRST for similarities; neither is a result a
      // caller wants.)
      if (s != s) return
      if (n < k) {
        scores(n) = s; ids(n) = id; n += 1
        var i = n - 1
        var p = (i - 1) >> 1
        while (i > 0 && worse(scores(i), ids(i), scores(p), ids(p))) {
          swap(i, p); i = p; p = (i - 1) >> 1
        }
      } else if (k > 0 && better(s, id, scores(0), ids(0))) {
        scores(0) = s; ids(0) = id
        siftDown()
      }
    }

    private def siftDown(): Unit = {
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = l + 1
        var w = i
        if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == i) done = true
        else { swap(i, w); i = w }
      }
    }

    @inline private def swap(i: Int, j: Int): Unit = {
      val ts = scores(i); scores(i) = scores(j); scores(j) = ts
      val ti = ids(i); ids(i) = ids(j); ids(j) = ti
    }

    /** Pull every element of `o` through [[offer]]; `o` is not modified. */
    def absorb(o: TopKBuf): Unit = {
      var i = 0
      while (i < o.n) { offer(o.scores(i), o.ids(i)); i += 1 }
    }

    def sortedSeq: Seq[(Double, Long)] = {
      val out = Array.tabulate(n)(i => (scores(i), ids(i)))
      out.sortWith((a, b) => better(a._1, a._2, b._1, b._2)).toSeq
    }
  }

  /** (score, id) pairs, best-first by (score asc|desc, id asc).
    * `reduce`/`merge` mutate the [[TopKBuf]] in place — the sanctioned
    * TypedImperativeAggregate contract `udaf(Aggregator)` lowers to. */
  class TopKAgg(k: Int, asc: Boolean)
      extends Aggregator[(Double, Long), TopKBuf, Seq[(Double, Long)]] {
    override def zero: TopKBuf = new TopKBuf(k, asc)
    override def reduce(b: TopKBuf, a: (Double, Long)): TopKBuf = {
      b.offer(a._1, a._2); b
    }
    override def merge(x: TopKBuf, y: TopKBuf): TopKBuf = { x.absorb(y); x }
    override def finish(b: TopKBuf): Seq[(Double, Long)] = b.sortedSeq
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.kryo[TopKBuf]
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
  def boundedTopK(scored: DataFrame, k: Int, asc: Boolean = true,
                  extraKeys: Seq[String] = Nil): DataFrame = {
    val topk = udaf(new TopKAgg(k, asc = asc))
    val keys = "query_id" +: extraKeys
    scored.groupBy(keys.map(col): _*)
      .agg(topk(col("score"), col("match_id")).as("top"))
      .select(keys.map(col) :+ posexplode(col("top")).as(Seq("pos", "m")): _*)
      .select(keys.map(col) ++ Seq(col("m._2").as("match_id"),
        col("m._1").as("score"), (col("pos") + 1).cast("long").as("rank")): _*)
  }
}
