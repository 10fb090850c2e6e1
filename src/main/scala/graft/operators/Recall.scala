package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall@k of an approximate k-NN result against its exact twin — the
  * quality contract every ANN structure is held to (the reference's HNSW
  * library publishes the same metric for its parameter sweeps; SURVEY
  * §5.2). Computed as a query so the DRIVER sees the number each round:
  * an ANN-quality regression becomes a visible diff in the correctness
  * report, not a silently-passing rows-only check.
  *
  * Scale shape: both inputs arrive top-k-bounded (Q·k rows each), so
  * every join and aggregation here is over reduced frames — the exact
  * twin's cost is the caller's choice (bound the query slice).
  */
object Recall {

  /** One-row summary: (k, n_queries, recall_at_k), recall averaged over
    * the exact result's query set (a query with no approximate rows
    * counts as 0 — silent no-answers must depress the metric, not
    * vanish from it). Both inputs use the (query_id, match_id, rank)
    * contract of [[Knn.knnExact]]/[[KnnTopK.boundedTopK]]. */
  def atK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    val a = approx.filter(col("rank") <= k).select(col("query_id"), col("match_id"))
    val e = exact.filter(col("rank") <= k).select(col("query_id"), col("match_id"))
    val hits = a.join(e, Seq("query_id", "match_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("__hits"))
    val perQuery = e.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .select(coalesce(col("__hits"), lit(0L)).as("__hits"))
    perQuery.agg(
      count(lit(1)).as("n_queries"),
      round(avg(col("__hits").cast("double") / lit(k.toDouble)), 4).as("recall_at_k"))
      .select(lit(k.toLong).as("k"), col("n_queries"), col("recall_at_k"))
  }
}
