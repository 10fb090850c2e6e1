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

  /** Matryoshka-truncation energy profile: what fraction of each vector's
    * L2 norm survives truncation to the leading `prefixDim` components —
    * the measurement behind serving embeddings at reduced dimension
    * (truncate + renormalize). `energy_ratio = ||v[:d]|| / ||v||`, both
    * norms in double from the float32 components, one rounded division —
    * engine-portable, pure projection.
    * @return (id, norm, prefix_norm, energy_ratio) */
  def truncationEnergy(emb: DataFrame, prefixDim: Int,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    require(prefixDim > 0, s"prefixDim $prefixDim must be positive")
    val full = VectorOps.norm(col(vecCol))
    val pre = VectorOps.norm(slice(col(vecCol), 1, prefixDim))
    emb.select(
      col(idCol),
      round(full, 4).as("norm"),
      round(pre, 4).as("prefix_norm"),
      round(pre / greatest(full, lit(1e-30)), 4).as("energy_ratio"))
  }

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
