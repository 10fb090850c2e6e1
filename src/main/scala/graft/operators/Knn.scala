package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Exact batched k-NN — the Spark rendition of the reference's `/search`
  * endpoint (`/root/reference/executor.py:73-125`, `knn_query` at `:112`).
  *
  * Shape: broadcast the (small) query set against the (large) corpus, score
  * with a codegen'd distance expression, take per-query top-k. The broadcast
  * keeps the corpus un-shuffled — one scan, no cross-join shuffle — which is
  * the plan that survives a 100 TB corpus: each corpus partition scores
  * against the in-memory query table and only Q*k rows leave each partition
  * after the window's rank filter (with AQE) or the partial aggregation of
  * [[KnnTopK]].
  */
object Knn {

  /** Per-query top-k over `corpus` for each row of `queries`.
    *
    * @param queries  (query_id, query_vec) — must be small enough to broadcast
    * @param corpus   (id, vec) named by `corpusId`/`corpusVec`
    * @param k        matches per query — clamped by callers like the
    *                 reference clamps `limit` (`executor.py:97-102`)
    * @param metric   cosine | inner_product | euclidean
    * @param asDistance when false, apply the reference's similarity
    *                 transform (`executor.py:117-124`)
    * @param scoreDecimals round the score to this many decimals *before*
    *                 ranking so Spark and a double-precision oracle rank
    *                 identically; ties broken by match id (total order)
    * @return (query_id, match_id, score, rank)
    */
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
    // Distances rank ascending, similarities descending — same as the
    // reference returning hnswlib's nearest-first order.
    val scored = corpus
      .join(broadcast(queries))
      .select(
        col("query_id"),
        col(corpusId).as("match_id"),
        // `+ 0.0` canonicalizes IEEE signed zero: a query matching itself
        // scores 1 - 1.0000000000000002 ≈ -2e-16, which rounds to -0.0 in
        // engines that round arithmetically (DuckDB) but +0.0 via Java's
        // BigDecimal — equal as numbers, different bit patterns under a
        // hash compare. x + 0.0 is the identity except -0.0 → +0.0.
        (round(rawScore, scoreDecimals) + lit(0.0)).as("score"))
    val ord: Column = if (asDistance) col("score").asc else col("score").desc
    val w = Window.partitionBy(col("query_id")).orderBy(ord, col("match_id").asc)
    // rank as long: DuckDB's row_number() yields BIGINT and the driver's
    // hash compare is type-sensitive.
    // NaN scores (0/0 cosine on a zero-norm vector) are dropped BEFORE
    // ranking: Spark's sort treats NaN as largest, which would rank a
    // garbage row last for distances but FIRST for similarities — and
    // [[KnnTopK.TopKBuf]] rejects NaN outright, so this filter keeps the
    // two formulations row-identical on degenerate inputs too.
    scored
      .filter(!isnan(col("score")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** k-NN with the reference's limit clamp: `limit` capped to the corpus
    * size (`/root/reference/executor.py:97-102`). The rank filter
    * self-clamps — per-query ranks never exceed the corpus size, so
    * `rank <= k` already returns every match when k is oversized and NO
    * corpus count runs in the query path. The reference's clamp warning
    * fires when the caller supplies a known corpus count (metadata the
    * caller typically has; deriving it here would cost a full scan per
    * query at cluster scale). */
  def knnClamped(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      metric: String = "cosine",
      knownCount: Option[Long] = None): DataFrame = {
    knownCount.filter(_ < k).foreach(n =>
      Console.err.println(s"[graft] WARN: limit $k clamped to corpus size $n"))
    knnExact(queries, corpus, k, metric)
  }

  /** k-NN + full-document materialization: join matches back to the doc
    * store by id, as `/search` does via the memmap store
    * (`/root/reference/executor.py:114-125`). `docs` is joined on `docId`.
    */
  def knnWithDocs(
      queries: DataFrame,
      corpus: DataFrame,
      docs: DataFrame,
      k: Int,
      metric: String = "cosine",
      docId: String = "doc_id"): DataFrame = {
    // bounded-aggregation top-k (the scale-default, see [[KnnTopK]]);
    // the doc join then touches only Q*k match rows
    val matches = KnnTopK.knnExact(queries, corpus, k, metric)
    matches.join(docs, matches("match_id") === docs(docId), "left").drop(docId)
  }
}
