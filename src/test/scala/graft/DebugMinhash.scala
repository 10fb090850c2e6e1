package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratch profiler for the minhash path (Test scope only). */
object DebugMinhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val corpus = docs.unionByName(docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat(col("text"), lit(" extra tail words")).as("text")))

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[debug] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    println(s"[debug] corpus rows: ${corpus.count()}")
    val sigs = Dedup.minhashSignatures(corpus, "doc_id", "text")
    time("signatures")(sigs.count())
    val buckets = sigs.select(col("doc_id"),
      posexplode(Dedup.bandHashes(col("sig"), 16, 4)).as(Seq("band", "bh")))
    val sizes = buckets.groupBy("band", "bh").count()
    time("bucket stats") {
      sizes.agg(max("count").as("max_bucket"), count(lit(1)).as("n_buckets")).show()
    }
    val a = buckets.select(col("doc_id").as("id_a"), col("band"), col("bh"))
    val b = buckets.select(col("doc_id").as("id_b"), col("band"), col("bh"))
    val cands = a.join(b, Seq("band", "bh")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    time("candidates")(println(s"[debug] n_cands = ${cands.count()}"))
    time("full pairs run1")(println(s"[debug] pairs = ${Dedup.minhashPairs(corpus, threshold = 0.5).count()}"))
    time("full pairs run2")(println(s"[debug] pairs = ${Dedup.minhashPairs(corpus, threshold = 0.5).count()}"))
    spark.stop()
  }
}
