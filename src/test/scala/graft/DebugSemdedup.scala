package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, KnnIvf}
import graft.functions.VectorOps

/** Reproduction utility for SemDeDup's cost split (kmeans / pairs /
  * select). The localCheckpoint in `semdedupSelect` exists because this
  * breakdown showed the pair subplan re-executing ~4x without it —
  * rerun before changing that pinning. */
object DebugSemdedup {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.sources.Tables.embeddings(spark, dir).select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"), col("label"))
    val emb = e.unionByName(e.filter(col("vec_id") % 25 === 0)
      .select((col("vec_id") + 10000000L).as("vec_id"),
        transform(col("embedding"), x => x * 1.5).as("embedding"), col("label")))
    def t[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $what%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    for (_ <- 1 to 2) {
      val normed = emb.withColumn("__nvec", VectorOps.l2Normalize(col("embedding")))
      val idx = t("kmeans build")(KnnIvf.build(normed, 16, "vec_id", "__nvec"))
      t("withCell count")(idx.corpusWithCell.count())
      val pairs = Dedup.cosinePairsBlocked(idx.corpusWithCell, Seq(col("cell")),
        "vec_id", "embedding", 0.99)
      t("pairs")(pairs.count())
      t("full select")(Dedup.semdedupSelect(emb, 16, 0.99).count())
    }
    spark.stop()
  }
}
