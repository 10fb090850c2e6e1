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

  /** Asymmetric-distance (ADC) search: score CODES, never reconstructing
    * vectors. Per query, two lookup tables are computed ONCE on the
    * (broadcast-sized) query side — `ipLut[s][c] = <q_s, centroid_{s,c}>`
    * and the constant `sqLut[s][c] = ||centroid_{s,c}||²` — and each
    * corpus row then costs `m` table lookups + adds instead of a `dim`-
    * wide float walk: the query-time arithmetic shape of a
    * billion-vector PQ deployment (Jégou et al. §IV). Because subspaces
    * are orthogonal coordinate blocks, `<q, recon> = Σ_s ipLut` and
    * `||recon||² = Σ_s sqLut` are EXACT identities, so ADC equals
    * reconstruction search up to float-vs-double rounding (spec-pinned).
    *
    * The per-pair lookup runs as the codegen'd
    * [[graft.functions.VectorExprs.AdcLookup]] primitive loop (round 3);
    * only the per-query LUT construction stays in interpreted HOFs.
    * @return (query_id, match_id, score, rank) like [[Knn.knnExact]] */
  def adcSearch(index: PqIndex, queries: DataFrame, encoded: DataFrame,
                k: Int, metric: String = "cosine",
                idCol: String = "vec_id", queryIdCol: String = "query_id",
                queryVecCol: String = "query_vec"): DataFrame = {
    val scored = encoded.crossJoin(broadcast(withLuts(index, queries, queryVecCol)))
    rankAdc(index, scored, k, metric, idCol, queryIdCol)
  }

  /** ADC restricted to IVF-probed cells — the IVFPQ composition (Jégou
    * et al. §V): `probedQueries` carries one (query_id, query_vec, cell)
    * row per probe ([[KnnIvf.probeCells]]); `encodedCells` is the
    * cell-partitioned corpus run through [[encode]] (the cell column
    * rides along). The cell-equi join scores each query against its
    * probed cells ONLY — query cost drops from |corpus| to
    * nProbe/numCells of it, on top of ADC's m-lookups-per-row. */
  def adcSearchProbed(index: PqIndex, probedQueries: DataFrame,
                      encodedCells: DataFrame, k: Int,
                      metric: String = "cosine", idCol: String = "vec_id",
                      queryIdCol: String = "query_id",
                      queryVecCol: String = "query_vec"): DataFrame = {
    val scored = encodedCells.join(
      broadcast(withLuts(index, probedQueries, queryVecCol)), Seq("cell"))
    rankAdc(index, scored, k, metric, idCol, queryIdCol)
  }

  // --------------------------------------------------------------------
  // Residual IVFADC (Jégou et al. §V.B): PQ trained and applied on the
  // RESIDUAL r = v − centroid(cell) instead of the raw vector. Residuals
  // have far less variance than the vectors themselves (the coarse
  // quantizer explains most of the energy), so the same m×k code budget
  // spends its resolution on what the cells did NOT explain — the
  // published accuracy fix for IVF+PQ at a fixed code size.
  //
  // Query-side arithmetic stays m lookups per pair via two exact
  // identities over recon = c_cell + r̂:
  //   <q, recon>    = <q, c_cell> + Σ_s ipLut[s][code_s]
  //                   (ipLut over the RESIDUAL codebooks; <q, c_cell> is
  //                   one scalar per (query, probed cell) — probe-sized)
  //   ||recon||²    = Σ_s ||c_cell,s + codeword_{s,code_s}||²
  //                   (a per-cell constant table, numCells × m × k
  //                   doubles — literal-sized by construction)
  // --------------------------------------------------------------------

  /** Per-row residual against the row's assigned cell centroid. */
  private def residualCol(ivf: KnnIvf.IvfIndex, vecCol: String): Column = {
    val cents = KnnIvf.centroidSeq(ivf.model).sortBy(_._1).map(_._2)
    zip_with(col(vecCol).cast("array<double>"),
      element_at(typedLit(cents), col("cell") + 1), (a, b) => a - b)
  }

  /** Fit the per-subspace codebooks on residuals. */
  def trainResidual(ivf: KnnIvf.IvfIndex, dim: Int, m: Int = 8, k: Int = 16,
                    vecCol: String = "embedding", seed: Long = 42L): PqIndex =
    train(ivf.corpusWithCell.withColumn("__resid", residualCol(ivf, vecCol)),
      dim, m, k, vecCol = "__resid", seed)

  /** Encode the corpus as residual codes; keeps `cell`, drops the raw
    * vector (codes + cell ARE the stored form). */
  def encodeResidual(index: PqIndex, ivf: KnnIvf.IvfIndex,
                     vecCol: String = "embedding"): DataFrame =
    encode(index, ivf.corpusWithCell.withColumn("__resid", residualCol(ivf, vecCol)),
      vecCol = "__resid").drop(vecCol)

  /** Residual ADC over IVF-probed cells — the full IVFADC query.
    * `probedQueries` as from [[KnnIvf.probeCells]]; `encodedCells` from
    * [[encodeResidual]]. Same output contract as [[adcSearch]]. */
  def adcSearchResidual(index: PqIndex, ivf: KnnIvf.IvfIndex,
                        probedQueries: DataFrame, encodedCells: DataFrame,
                        k: Int, metric: String = "cosine",
                        idCol: String = "vec_id", queryIdCol: String = "query_id",
                        queryVecCol: String = "query_vec"): DataFrame = {
    import graft.functions.VectorOps
    val kCodes = index.codebooks.head.size
    val cents = KnnIvf.centroidSeq(ivf.model).sortBy(_._1).map(_._2)
    // per-cell ||c_s + codeword||² table, subspace-major like the LUTs
    val books = index.codebooks
    val subDim = index.subDim
    val sqByCell: Seq[Seq[Double]] = cents.map { c =>
      (0 until index.m).flatMap { s =>
        books(s).map { cw =>
          var sum = 0.0
          var j = 0
          while (j < subDim) {
            val x = c(s * subDim + j) + cw(j); sum += x * x; j += 1
          }
          sum
        }
      }
    }
    val sqLit = typedLit(sqByCell)
    // <q, c_cell> per probe row — computed before withLuts drops the
    // query vector; probe frames are broadcast-sized by contract
    val withQc = probedQueries.withColumn("__qc",
      aggregate(zip_with(col(queryVecCol).cast("array<double>"),
        element_at(typedLit(cents), col("cell") + 1),
        (a, b) => a * b), lit(0.0), (acc, x) => acc + x))
    val scored0 = encodedCells.join(
      broadcast(withLuts(index, withQc, queryVecCol)), Seq("cell"))
    val ip = col("__qc") + VectorOps.adcLookup(col("pq_codes"), col("__iplut"), kCodes)
    val rsq = VectorOps.adcLookup(col("pq_codes"),
      element_at(sqLit, col("cell") + 1), kCodes)
    val dist = metric match {
      case "cosine" => lit(1.0) - ip / (col("__qnorm") * sqrt(rsq))
      case "euclidean" =>
        // clamp: for a near-exact reconstruction the operand can round to
        // a tiny negative double; sqrt would yield NaN and the TopKBuf
        // NaN rejection would silently drop a best-possible match
        sqrt(greatest(col("__qnorm") * col("__qnorm") - lit(2.0) * ip + rsq, lit(0.0)))
      case other =>
        throw new IllegalArgumentException(s"residual ADC metric '$other' unsupported")
    }
    val scored = scored0.select(col(queryIdCol).as("query_id"),
      col(idCol).as("match_id"), (round(dist, 4) + lit(0.0)).as("score"))
    val out = KnnTopK.boundedTopK(scored, k, asc = true)
    if (queryIdCol == "query_id") out
    else out.withColumnRenamed("query_id", queryIdCol)
  }

  /** Per-query lookup tables: `ipLut[s][c] = <q_s, centroid_{s,c}>` and
    * the query norm. Interpreted HOFs are fine HERE — queries are
    * broadcast-sized; the per-pair hot path is the codegen'd
    * [[graft.functions.VectorExprs.AdcLookup]] primitive loop. */
  private def withLuts(index: PqIndex, queries: DataFrame,
                       queryVecCol: String): DataFrame = {
    val m = index.m
    val subDim = index.subDim
    val booksLit: Column = typedLit(index.codebooks.map(_.map(_.toSeq)))
    val qv = col(queryVecCol)
    queries
      .withColumn("__iplut",
        flatten(transform(sequence(lit(0), lit(m - 1)), s =>
          transform(element_at(booksLit, s + 1), cv =>
            aggregate(zip_with(cv, slice(qv, s * lit(subDim) + 1, lit(subDim)),
              (a, b) => a * b.cast("double")), lit(0.0), (acc, x) => acc + x)))))
      .withColumn("__qnorm",
        sqrt(aggregate(qv, lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double"))))
      .drop(queryVecCol)
  }

  private def rankAdc(index: PqIndex, scoredInput: DataFrame, k: Int,
                      metric: String, idCol: String,
                      queryIdCol: String): DataFrame = {
    import graft.functions.VectorOps
    val kCodes = index.codebooks.head.size
    // subspace-major flattened ||centroid||² table — a plain literal
    val sqLit: Column = typedLit(index.codebooks.flatMap(_.map(c => c.map(x => x * x).sum)))
    val ip = VectorOps.adcLookup(col("pq_codes"), col("__iplut"), kCodes)
    val rsq = VectorOps.adcLookup(col("pq_codes"), sqLit, kCodes)
    val dist = metric match {
      case "cosine" => lit(1.0) - ip / (col("__qnorm") * sqrt(rsq))
      case "euclidean" =>
        // same clamp as adcSearchResidual: a tiny negative rounding
        // residue under sqrt must not NaN-drop an exact match
        sqrt(greatest(col("__qnorm") * col("__qnorm") - lit(2.0) * ip + rsq, lit(0.0)))
      case other =>
        throw new IllegalArgumentException(s"ADC metric '$other' unsupported")
    }
    // finish through the bounded partial/final top-k aggregation like
    // every other k-NN path (a per-query rank window sort-shuffles ALL
    // Q·candidates scored rows — the shape boundedTopK exists to avoid);
    // same signed-zero canonicalization as Knn.knnExact
    val scored = scoredInput
      .select(col(queryIdCol).as("query_id"), col(idCol).as("match_id"),
        (round(dist, 4) + lit(0.0)).as("score"))
    val out = KnnTopK.boundedTopK(scored, k, asc = true)
    if (queryIdCol == "query_id") out
    else out.withColumnRenamed("query_id", queryIdCol)
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
