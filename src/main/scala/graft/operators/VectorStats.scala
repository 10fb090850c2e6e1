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

  /** Leading principal direction of the (uncentered) embedding matrix by
    * MATRIX-FREE power iteration — the dimensionality-reduction /
    * whitening primitive (PCA top component, dominant drift axis) run
    * where the data lives instead of shipping a Gram matrix anywhere.
    *
    * Each iteration computes `v ← Xᵀ(Xv)` in one distributed pass:
    * a codegen'd per-row dot `x·v` (v folded in as literals — plan size
    * is O(dim), the SignProjection lesson), then per-dimension sums of
    * `(x·v)·xⱼ` — a posexplode + 64-key hash aggregate, map-side
    * partial-combined, ONE narrow-key shuffle of dim-sized partials
    * regardless of corpus size. The driver holds only the dim-length
    * iterate (bounded collect), normalized by max-|component| — pure
    * rational arithmetic, no sqrt, so every step is engine-replayable.
    *
    * Determinism: per-row contributions round to 8dp and sum in DECIMAL
    * (order-free under any partitioning); the normalization divides two
    * doubles derived from those exact sums. T iterations = T corpus
    * passes; unconverged by design at small T — the CONTRACT is the
    * exact T-step iterate from the all-ones start, which an oracle
    * replays bit-for-bit.
    *
    * @return (pos, loading): the dim-length direction after `iters`
    *         steps, loadings rounded to 6dp, max |loading| = 1 */
  def powerIterate(emb: DataFrame, dim: Int, iters: Int = 3,
                   vecCol: String = "embedding"): DataFrame = {
    require(dim > 0 && iters > 0)
    val spark = emb.sparkSession
    // pinned once: every iteration re-scans the casted vectors, and the
    // frame is narrow (dim doubles per row)
    val x = emb.select(transform(col(vecCol), e => e.cast("double")).as("__x"))
      .localCheckpoint(true)
    var v = Array.fill(dim)(1.0)
    for (_ <- 1 to iters) {
      val vLit = array(v.map(lit).toSeq: _*)
      val g = x
        .select(VectorOps.dot(col("__x"), vLit).as("__d"),
          posexplode(col("__x")).as(Seq("pos", "xj")))
        .groupBy(col("pos").cast("long").as("pos"))
        .agg(sum(round(col("__d") * col("xj"), 8).cast("decimal(28,8)")).as("g"))
        .orderBy("pos")
        .collect() // bounded: dim rows
        .map(_.getDecimal(1).doubleValue())
      require(g.length == dim, s"expected $dim component sums, got ${g.length}")
      val m = g.map(math.abs).max
      require(m > 0, "powerIterate hit the zero vector (degenerate input)")
      v = g.map(_ / m)
    }
    import spark.implicits._
    v.toSeq.zipWithIndex.map { case (l, p) => (p.toLong, l) }
      .toDF("pos", "loading")
      .select(col("pos"), round(col("loading"), 6).as("loading"))
  }
}
