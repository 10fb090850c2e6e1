package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** k-NN JOIN — every left row finds its top-k nearest right rows. The
  * reference's `/search` serves a SMALL query batch against a big corpus
  * (`/root/reference/executor.py:75-125`); the join form is the corpus-
  * scale generalization a training pipeline needs (kNN-dedup, retrieval
  * augmentation, hard-negative mining): BOTH sides are large, so the
  * broadcast-the-queries plan of [[KnnTopK.knnExact]] is off the table.
  *
  * Two formulations:
  *  - [[knnJoinExact]]: the exact all-pairs form. Intrinsically O(Q·N)
  *    scores — correct as an oracle/baseline, unaffordable at 100 TB.
  *  - [[annJoinIvf]]: the scale path. One IVF model assigns BOTH sides to
  *    cells (queries to their `nProbe` nearest); the join is cell-equi,
  *    so each query row is scored against its probed cells only. The
  *    shuffle moves Q·nProbe + N rows partitioned by cell — linear, not
  *    quadratic — and the per-query result is bounded by the same
  *    partial/final top-k aggregation as the exact path.
  */
object KnnJoin {

  /** Exact k-NN self/two-sided join: top-`k` right neighbors per left row,
    * self-pairs excluded when ids collide. Output (query_id, match_id,
    * score, rank) — same contract (round-then-rank, id tiebreak,
    * signed-zero canonicalization) as [[Knn.knnExact]]. */
  def knnJoinExact(left: DataFrame, right: DataFrame, k: Int,
                   metric: String = "cosine",
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   excludeSelf: Boolean = true): DataFrame = {
    // NOTE on a measured dead end: hoisting sqrt(v·v) into per-row norm
    // columns (1 vector pass per pair instead of CosineSim's fused 3)
    // benched ~20% SLOWER at sf0.1 — the fused single-expression pass
    // beats the flop savings once the extra columns ride through the
    // nested-loop join. Kept on the fused form deliberately.
    val q = left.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
    val scored = right
      .join(q, if (excludeSelf) col(idCol) =!= col("query_id") else lit(true))
      .select(col("query_id"), col(idCol).as("match_id"),
        (round(VectorOps.distance(metric, col("query_vec"), col(vecCol)), 4)
          + lit(0.0)).as("score"))
    boundedTopK(scored, k)
  }

  /** ANN join via shared IVF cell assignment. The corpus side is the
    * INDEX's cell-partitioned corpus (`index.corpusWithCell`) — there is
    * deliberately no separate right-side parameter: an index only
    * answers for the corpus it was built over, and accepting a second
    * corpus frame here would silently score against the index anyway
    * (the bug class this signature rules out). The query side replicates
    * to its `nProbe` nearest cells (computed per-row from the broadcast-
    * literal centroid table — a narrow projection, no shuffle). The only
    * wide operations are the cell-equi join and the bounded top-k
    * aggregation.
    *
    * Recall contract mirrors [[KnnIvf]]: approximate, tunable by
    * (numCells, nProbe); verified by recall@k against [[knnJoinExact]]
    * in KnnJoinSpec rather than an exactness oracle. */
  def annJoinIvf(left: DataFrame, index: KnnIvf.IvfIndex,
                 k: Int, nProbe: Int, metric: String = "cosine",
                 idCol: String = "vec_id", vecCol: String = "embedding",
                 excludeSelf: Boolean = true): DataFrame = {
    // same centroid set as KnnIvf.probeCells; field order differs because
    // array_sort's lexicographic struct order IS the (dist, cell)
    // tiebreak here, where probeCells ranks with an explicit Window
    val cents = KnnIvf.centroidSeq(index.model)
    val centArr = array(cents.map { case (i, c) =>
      struct(typedLit(c).as("cvec"), lit(i).as("cell"))
    }: _*)
    // per-row nProbe nearest cells: distance to every centroid, array-sort
    // (struct order = (dist, cell) — the id tiebreak for free), slice.
    // Pure expressions: the probe assignment never shuffles.
    val probed = left
      .select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
      .withColumn("__cells",
        slice(array_sort(transform(centArr, c =>
          struct(VectorOps.l2Sq(col("query_vec"), c.getField("cvec")).as("d"),
            c.getField("cell").as("cell")))), 1, nProbe))
      .select(col("query_id"), col("query_vec"),
        explode(col("__cells.cell")).as("cell"))
    val scored = index.corpusWithCell
      .join(probed, Seq("cell"))
      .filter(if (excludeSelf) col(idCol) =!= col("query_id") else lit(true))
      .select(col("query_id"), col(idCol).as("match_id"),
        (round(VectorOps.distance(metric, col("query_vec"), col(vecCol)), 4)
          + lit(0.0)).as("score"))
    // a query's probed cells can overlap another's corpus rows only once
    // per cell, and cells partition the corpus — no duplicate pairs.
    boundedTopK(scored, k)
  }

  private def boundedTopK(scored: DataFrame, k: Int): DataFrame =
    KnnTopK.boundedTopK(scored, k, asc = true)
}
