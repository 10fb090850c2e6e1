package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal}

/** Scratch profiler for the multimodal_dedup stages (not a spec). */
object DebugMm {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[mm] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.sources.Tables.documents(spark, dir)
    val d = docs.select("doc_id", "text", "lang", "source", "n_chars")
    val dupes = d.unionByName(d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars")))
    for (i <- 1 to 3) {
      val content = time(s"payload build #$i") {
        Multimodal.withTextBmpContent(dupes.repartition(32)).localCheckpoint(true)
      }
      val feats = time(s"decode+features #$i") {
        Multimodal.dhashFeaturesBatched(content).localCheckpoint(true)
      }
      time(s"lsh pairs #$i") {
        Dedup.cosinePairsLsh(feats, dim = Multimodal.dhashFeatureDim(),
          idCol = "doc_id", vecCol = "features",
          planes = 64, bands = 4, threshold = 0.99).count()
      }
    }
    spark.stop()
  }
}
