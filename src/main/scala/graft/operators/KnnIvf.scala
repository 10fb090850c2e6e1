package graft.operators

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** IVF (inverted-file) approximate k-NN — the batch-native answer to the
  * reference's HNSW index (`/root/reference/executor.py:49,66-70,112`).
  * HNSW's incremental in-memory graph doesn't fit a scan-oriented engine;
  * the IVF equivalent keeps the same contract (approximate results, a
  * recall/speed knob) with cluster-friendly mechanics:
  *
  *  - build: KMeans centroids (Spark ML) over the corpus, each row
  *    assigned to its nearest cell — at scale, write the corpus
  *    partitioned by cell so a probe reads only matching partitions
  *    (partition pruning does the "index lookup").
  *  - search: queries go to their `nProbe` nearest cells only; exact
  *    distance + top-k within the probed cells. `nProbe` is the recall
  *    knob, playing the role of the reference's `ef_query`
  *    (`executor.py:63,92-95`, SURVEY §2.1 O19).
  */
object KnnIvf {

  /** Corpus with an IVF cell assignment + the fitted model. */
  case class IvfIndex(model: KMeansModel, corpusWithCell: DataFrame)

  /** Fit KMeans cells over the corpus embeddings and tag each row with
    * its cell. Deterministic for a fixed seed. */
  def build(corpus: DataFrame, numCells: Int,
            idCol: String = "vec_id", vecCol: String = "embedding",
            seed: Long = 42L): IvfIndex = {
    val featured = corpus.withColumn("__features",
      array_to_vector(col(vecCol).cast("array<double>")))
    val model = new KMeans()
      .setK(numCells).setSeed(seed).setMaxIter(10)
      // random init: one pass instead of k-means||'s 2+numIter scans —
      // cell balance is all IVF needs, exact centroids are irrelevant
      .setInitMode("random")
      .setFeaturesCol("__features").setPredictionCol("__cell")
      .fit(featured)
    IvfIndex(model, model.transform(featured).drop("__features")
      .withColumnRenamed("__cell", "cell"))
  }

  /** Nearest-`nProbe` cells per query, by exact distance to the (tiny,
    * literal) centroid set — no shuffle, the centroid table is inlined
    * into the expression. */
  private def queryCells(queries: DataFrame, model: KMeansModel, nProbe: Int): DataFrame = {
    val cents: Seq[(Int, Seq[Double])] =
      model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray.toSeq) }.toSeq
    val centArr = array(cents.map { case (i, c) =>
      struct(lit(i).as("cell"), typedLit(c).as("cvec"))
    }: _*)
    val probed = queries
      .withColumn("__c", explode(centArr))
      .withColumn("__cdist", VectorOps.l2Sq(col("query_vec"), col("__c.cvec")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("__cdist").asc, col("__c.cell").asc)
    probed.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= nProbe)
      .select(col("query_id"), col("query_vec"), col("__c.cell").as("cell"))
  }

  /** Approximate top-k: probe `nProbe` cells per query, exact re-rank
    * within probed cells. Same output shape as [[Knn.knnExact]]. */
  def search(index: IvfIndex, queries: DataFrame, k: Int, nProbe: Int,
             metric: String = "cosine",
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val probes = queryCells(queries, index.model, nProbe)
    val scored = index.corpusWithCell
      .join(broadcast(probes), Seq("cell"))
      .select(col("query_id"), col(idCol).as("match_id"),
        round(VectorOps.distance(metric, col("query_vec"), col(vecCol)), 4).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").asc, col("match_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= k)
  }

  /** One-call convenience for fixture-scale use. */
  def approxKnn(corpus: DataFrame, queries: DataFrame, k: Int,
                numCells: Int = 16, nProbe: Int = 4,
                metric: String = "cosine"): DataFrame =
    search(build(corpus, numCells), queries, k, nProbe, metric)
}
