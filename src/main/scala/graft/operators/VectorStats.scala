package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Embedding-column statistics for corpus QA at pipeline scale: per-class
  * centroids (the building block IVF/KMeans consumes) and norm profiles.
  * Flat (label, pos, value) output keeps the aggregation a plain
  * two-key hash aggregate — map-side partials, one shuffle, no
  * wide-array state. */
object VectorStats {

  /** Per-label mean of each vector component, decimal-accumulated so the
    * result is independent of partial-aggregation order. */
  def centroidComponents(emb: DataFrame, labelCol: String = "label",
                         vecCol: String = "embedding"): DataFrame =
    emb.select(col(labelCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col(labelCol), col("pos").cast("long").as("pos"))
      .agg(round(
        (sum(col("x").cast("decimal(20,10)")) / count(lit(1))).cast("double"), 4)
        .as("mean_val"))

  /** Per-label corpus profile: row count and L2-norm statistics. */
  def labelNormStats(emb: DataFrame, labelCol: String = "label",
                     vecCol: String = "embedding"): DataFrame =
    emb.select(col(labelCol), VectorOps.norm(col(vecCol)).as("__n"))
      .groupBy(col(labelCol))
      .agg(
        count(lit(1)).as("n_vectors"),
        round((sum(col("__n").cast("decimal(20,10)")) / count(lit(1))).cast("double"), 4)
          .as("avg_norm"),
        round(min(col("__n")), 4).as("min_norm"),
        round(max(col("__n")), 4).as("max_norm"))
}
