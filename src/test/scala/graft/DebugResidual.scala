package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: residual vs plain IVFPQ recall on fixtures. */
object DebugResidual {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{KnnIvf, KnnTopK, Pq, Recall}
    import graft.sources.Tables
    val emb = Tables.embeddings(spark, dir)
    val q = Tables.defaultQueries(spark, dir)
    val ivf = KnnIvf.build(emb, numCells = 16)
    val exact = KnnTopK.knnExact(q, emb, k = 10)
    for (nProbe <- Seq(4, 8)) {
      val probes = KnnIvf.probeCells(ivf, q, nProbe)
      val plainIdx = Pq.train(emb, dim = 64, m = 16, k = 32)
      val plain = Pq.adcSearchProbed(plainIdx, probes, Pq.encode(plainIdx, ivf.corpusWithCell), k = 10)
      val residIdx = Pq.trainResidual(ivf, dim = 64, m = 16, k = 32)
      val resid = Pq.adcSearchResidual(residIdx, ivf, probes, Pq.encodeResidual(residIdx, ivf), k = 10)
      val rp = Recall.atK(plain, exact, 10).head().getAs[Double]("recall_at_k")
      val rr = Recall.atK(resid, exact, 10).head().getAs[Double]("recall_at_k")
      println(f"[resid] nProbe=$nProbe plain=$rp%.4f residual=$rr%.4f")
    }
    spark.stop()
  }
}
