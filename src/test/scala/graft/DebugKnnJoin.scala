package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.sources.Tables

/** Scratch timer (Test scope): TopKAgg vs WindowGroupLimit formulation
  * of the exact k-NN join at sf0.1. */
object DebugKnnJoin {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, dir)

    def windowForm() = {
      val q = emb.select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score").asc, col("match_id").asc)
      emb.join(q, col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("match_id"),
          (round(VectorOps.distance("cosine", col("query_vec"), col("embedding")), 4)
            + lit(0.0)).as("score"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
    }

    for (i <- 1 to 3) {
      var t0 = System.nanoTime()
      val n1 = graft.operators.KnnJoin.knnJoinExact(emb, emb, k = 3).count()
      println(f"[debug] agg#$i:    ${(System.nanoTime() - t0) / 1e9}%.2f s ($n1 rows)")
      t0 = System.nanoTime()
      val n2 = windowForm().count()
      println(f"[debug] window#$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n2 rows)")
    }
    windowForm().explain("formatted")
    spark.stop()
  }
}
