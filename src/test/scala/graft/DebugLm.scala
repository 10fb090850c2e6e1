package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Contamination, Dedup, LangModel}
import graft.sources.Tables

object DebugLm {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
    def time(what: String)(f: => Long): Unit = {
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[lm] $what%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s ($n)")
      }
    }
    time("tokens explode")(docs.select(explode(Dedup.tokens(col("text")))).count())
    time("bigram explode")(docs.select(explode(LangModel.bigramPairs(col("text")))).count())
    time("train")(LangModel.train(docs).count())
    time("selfFluency")(LangModel.selfFluency(docs).count())
    time("shingle8 explode")(docs.select(explode(Dedup.wordShingles(col("text"), 8))).count())
    time("contamination")(
      Contamination.report(
        docs.select("doc_id", "text").filter(col("doc_id") % 25 =!= 0),
        docs.select("doc_id", "text").filter(col("doc_id") % 25 === 0)).count())
    spark.stop()
  }
}
