package graft

import org.apache.spark.sql.SparkSession
import graft.operators.{KnnTopK, Quantize, Recall}
import graft.sources.Tables

/** Reproduction utility for the BQ / matryoshka gate floors: recall
  * across candidate pools and scales. The pinned floors in SparkEntry
  * (`ann_bq_recall` 0.75, `ann_matryoshka_recall` 0.10) came from this
  * sweep's output — rerun it before moving a floor. */
object DebugBq {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val q = Tables.defaultQueries(spark, sf)
      val exact = KnnTopK.knnExact(q, Tables.embeddings(spark, sf), k = 5)
      exact.cache().count()
      for (cand <- Seq(50, 100, 200, 400)) {
        val r = Recall.atK(
          Quantize.bqSearchRerank(q, Tables.embeddings(spark, sf), k = 5, candidates = cand),
          exact, k = 5).collect()(0)
        println(s"BQ   sf=$sf cand=$cand recall=${r.getAs[Double]("recall_at_k")}")
      }
      val q16 = q.withColumn("query_vec",
        org.apache.spark.sql.functions.slice(org.apache.spark.sql.functions.col("query_vec"), 1, 16))
      val c16 = Tables.embeddings(spark, sf).withColumn("embedding",
        org.apache.spark.sql.functions.slice(org.apache.spark.sql.functions.col("embedding"), 1, 16))
      val m = Recall.atK(KnnTopK.knnExact(q16, c16, k = 5), exact, k = 5).collect()(0)
      println(s"MATR sf=$sf recall=${m.getAs[Double]("recall_at_k")}")
      exact.unpersist()
    }
    spark.stop()
  }
}
