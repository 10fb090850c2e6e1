package graft.operators

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze, Schmid, TPAMI 2011) — the
  * codebook-compression half of a billion-vector ANN stack: the vector
  * space is split into `m` subspaces, each quantized to its own
  * `k`-centroid codebook, so a d-dim float vector stores as `m` small
  * codes (64-dim float32 = 256 B -> 8 B at m=8/k=256: 32x).
  *
  * Search here reconstructs vectors from their codes (centroid concat)
  * and runs the exact operators over the reconstruction — rank-identical
  * to asymmetric-distance (ADC) lookups for L2, and the form that
  * composes with every existing k-NN/dedup operator. A production hot
  * path would fold the per-query LUT into a codegen'd expression; the
  * codebooks themselves are broadcast-sized by construction (m*k*d/m
  * doubles).
  *
  * Training is Spark ML KMeans per subspace over the corpus — `m` small
  * fits on narrow slices, each one job. Encoding/decoding are narrow
  * maps.
  */
object Pq {

  /** Per-subspace codebooks. `dim` must divide evenly by `models.size`. */
  case class PqIndex(models: Seq[KMeansModel], dim: Int) {
    def m: Int = models.size
    def subDim: Int = dim / m
    /** codebooks(s)(c) = centroid c of subspace s. */
    def codebooks: Seq[Seq[Array[Double]]] =
      models.map(_.clusterCenters.toSeq.map(_.toArray))
  }

  private def subVec(vecCol: Column, s: Int, subDim: Int): Column =
    array_to_vector(slice(vecCol, s * subDim + 1, subDim).cast("array<double>"))

  /** Fit one KMeans codebook per subspace. */
  def train(corpus: DataFrame, dim: Int, m: Int = 8, k: Int = 16,
            vecCol: String = "embedding", seed: Long = 42L): PqIndex = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subDim = dim / m
    val models = (0 until m).map { s =>
      new KMeans().setK(k).setSeed(seed + s).setMaxIter(10)
        .setInitMode("random")
        .setFeaturesCol("__sub").setPredictionCol("__code")
        .fit(corpus.select(subVec(col(vecCol), s, subDim).as("__sub")))
    }
    PqIndex(models, dim)
  }

  /** Encode: vecCol -> `pq_codes: array<int>[m]`. m model transforms,
    * all narrow. */
  def encode(index: PqIndex, corpus: DataFrame,
             vecCol: String = "embedding"): DataFrame = {
    val subDim = index.subDim
    val encoded = index.models.zipWithIndex.foldLeft(
      corpus.withColumn("__codes", array())) { case (df, (model, s)) =>
        val withSub = df.withColumn("__sub", subVec(col(vecCol), s, subDim))
        model.transform(withSub)
          .withColumn("__codes", concat(col("__codes"), array(col("__code"))))
          .drop("__sub", "__code")
    }
    encoded.withColumn("pq_codes", col("__codes").cast("array<int>"))
      .drop("__codes", vecCol)
  }

  /** Decode: reconstruct the (approximate) float vector from codes via a
    * broadcast codebook literal — one narrow projection. */
  def decode(index: PqIndex, encoded: DataFrame,
             vecCol: String = "embedding"): DataFrame = {
    val books: Column = typedLit(index.codebooks.map(_.map(_.toSeq)))
    encoded.withColumn(vecCol,
        flatten(zip_with(col("pq_codes"),
          sequence(lit(0), lit(index.m - 1)),
          (code, s) => element_at(element_at(books, s + 1), code + 1))))
      .withColumn(vecCol, transform(col(vecCol), x => x.cast("float")))
      .drop("pq_codes")
  }
}
