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
    * vanish from it). The per-query denominator is `least(k, exact
    * rows)`: on a filtered/sparse corpus where a query has fewer than k
    * true neighbors, a perfect approximate answer scores 1.0, not
    * hits/k < 1 (a constant-k denominator would read as a false quality
    * regression). Both inputs use the (query_id, match_id, rank)
    * contract of [[Knn.knnExact]]/[[KnnTopK.boundedTopK]].
    *
    * Single-pass shape: the approximate frame is LEFT-joined onto the
    * exact twin and hits + denominator fall out of one aggregation, so
    * the (expensive) exact subplan appears exactly once in the plan —
    * a hits-join + separate denominator aggregate would execute it
    * twice (self-joins re-run their input subplan on both sides). */
  def atK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    val a = approx.filter(col("rank") <= k)
      .select(col("query_id"), col("match_id")).withColumn("__a", lit(1))
    val e = exact.filter(col("rank") <= k).select(col("query_id"), col("match_id"))
    val perQuery = e.join(a, Seq("query_id", "match_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(col("__a")).as("__hits"), count(lit(1)).as("__exact"))
      .select(col("__hits"),
        least(lit(k.toLong), col("__exact")).as("__denom"))
    perQuery.agg(
      count(lit(1)).as("n_queries"),
      round(avg(col("__hits").cast("double") / col("__denom").cast("double")), 4)
        .as("recall_at_k"))
      .select(lit(k.toLong).as("k"), col("n_queries"), col("recall_at_k"))
  }

  /** [[atK]] per group (e.g. per probe budget of
    * [[KnnIvf.searchPrunedMulti]]): one summary row per value in
    * `groups`, each holding the same per-query math as [[atK]]. The
    * group universe is passed explicitly so a group (or query) with no
    * approximate rows scores 0 instead of vanishing. Same single-pass
    * shape as [[atK]]: the exact twin is expanded once across the
    * (small, explicit) group universe and the approximate frame is
    * LEFT-joined onto it, so the exact subplan executes once total —
    * not twice, and not once per group as an [[atK]] loop would. */
  def atKGrouped(approx: DataFrame, exact: DataFrame, k: Int,
                 groupCol: String, groups: Seq[Long]): DataFrame = {
    require(groups.nonEmpty, "atKGrouped needs an explicit group universe")
    val a = approx.filter(col("rank") <= k)
      .select(col(groupCol), col("query_id"), col("match_id"))
      .withColumn("__a", lit(1))
    val e = exact.filter(col("rank") <= k).select(col("query_id"), col("match_id"))
      .select(explode(typedLit(groups)).as(groupCol), col("query_id"), col("match_id"))
    e.join(a, Seq(groupCol, "query_id", "match_id"), "left")
      .groupBy(col(groupCol), col("query_id"))
      .agg(count(col("__a")).as("__hits"), count(lit(1)).as("__exact"))
      .select(col(groupCol), col("__hits"),
        least(lit(k.toLong), col("__exact")).as("__denom"))
      .groupBy(col(groupCol)).agg(
        count(lit(1)).as("n_queries"),
        round(avg(col("__hits").cast("double") / col("__denom").cast("double")), 4)
          .as("recall_at_k"))
      .select(col(groupCol), lit(k.toLong).as("k"), col("n_queries"),
        col("recall_at_k"))
  }

  /** [[atK]] with a pinned floor that GATES: the row carries the floor,
    * and a recall below it raises at execution time (`raise_error`
    * inside the plan — no driver-side collect), so an ANN-quality
    * collapse becomes a hard `err` in the driver's correctness report
    * instead of a number a human must notice. The floor is the same
    * contract hnswlib holds its parameter sweeps to (SURVEY §5.2). */
  def atKGated(approx: DataFrame, exact: DataFrame, k: Int, floor: Double): DataFrame =
    atK(approx, exact, k)
      .withColumn("floor", lit(floor))
      .filter(when(col("recall_at_k") >= lit(floor), lit(true))
        .otherwise(raise_error(concat(
          lit(s"ANN quality gate: recall@$k "), col("recall_at_k"),
          lit(s" below pinned floor $floor")))))

  /** Gated set agreement between two formulations of the same result
    * (an optimized flagship vs its portable/brute-force twin): one row
    * (n_left, n_right, n_common, agreement), where agreement =
    * n_common / max(n_left, n_right). Below `floor` the row raises at
    * execution time — for exact twins (floor = 1.0 default) ANY
    * divergence between the two pipelines becomes a hard driver error.
    * Both inputs are compared as SETS of their `on`-column tuples.
    * Scale shape: both inputs arrive reduced (pair lists / top-k rows);
    * the full-outer join here is over already-small frames. */
  /** @param minCount fixture-backed gates pass >= 1: their corpora PLANT
    *                  duplicates, so both sides emptying out is itself a
    *                  regression (an upstream rename or slice filter
    *                  silently keeping nothing) and must raise rather
    *                  than ride the vacuous-agreement rule below. The
    *                  default 0 keeps vacuous perfect agreement for
    *                  corpora where empty is a legitimate outcome. */
  def setAgreement(left: DataFrame, right: DataFrame, on: Seq[String],
                   floor: Double = 1.0, minCount: Long = 0L): DataFrame = {
    val l = left.select(on.map(col): _*).distinct().withColumn("__l", lit(1))
    val r = right.select(on.map(col): _*).distinct().withColumn("__r", lit(1))
    l.join(r, on, "full_outer")
      .agg(
        count(col("__l")).as("n_left"),
        count(col("__r")).as("n_right"),
        count(when(col("__l").isNotNull && col("__r").isNotNull, lit(1))).as("n_common"))
      .withColumn("agreement",
        // Two EMPTY inputs agree vacuously (both pipelines found
        // nothing) — without this a no-near-dup corpus would read as
        // agreement 0.0 and falsely trip the gate.
        when(greatest(col("n_left"), col("n_right")) === lit(0L), lit(1.0))
          .otherwise(round(col("n_common").cast("double") /
            greatest(col("n_left"), col("n_right"), lit(1L)).cast("double"), 4)))
      .withColumn("floor", lit(floor))
      .filter(when(greatest(col("n_left"), col("n_right")) >= lit(minCount), lit(true))
        .otherwise(raise_error(concat(
          lit("twin agreement gate: both sides below minCount "),
          lit(minCount), lit(" ("), col("n_left"), lit("/"), col("n_right"),
          lit(" rows) — expected the corpus to plant comparable pairs")))))
      .filter(when(col("agreement") >= lit(floor), lit(true))
        .otherwise(raise_error(concat(
          lit("twin agreement gate: "), col("agreement"),
          lit(s" below pinned floor $floor ("),
          col("n_common"), lit(" common of "), col("n_left"), lit("/"),
          col("n_right"), lit(")")))))
  }
}
