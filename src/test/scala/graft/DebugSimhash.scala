package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratch profiler for the simhash path (Test scope only). */
object DebugSimhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
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
    val exploded = corpus
      .select(col("doc_id"), explode(Dedup.wordShingles(col("text"), 2)).as("__t"))
      .select(col("doc_id"), xxhash64(col("__t")).as("__h"))
    time("explode+hash only")(println(s"[debug] rows = ${exploded.count()}"))
    time("1-bit agg")(exploded.groupBy("doc_id")
      .agg(sum(when(shiftright(col("__h"), 0).bitwiseAND(1) === 1, 1).otherwise(-1))).count())
    val sums16 = (0 until 16).map { i =>
      sum(when(shiftright(col("__h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$i") }
    time("16-bit agg")(exploded.groupBy("doc_id").agg(sums16.head, sums16.tail: _*).count())
    val sigs = Dedup.simhashSignatures(corpus, "doc_id", "text").cache()
    time("signatures (64)")(sigs.count())
    val buckets = sigs.select(col("doc_id"),
      posexplode(Dedup.bandHashes(col("simhash"), 4, 16)).as(Seq("band", "bh")))
    val sizes = buckets.groupBy("band", "bh").count()
    time("bucket stats") {
      sizes.agg(max("count"), expr("percentile_approx(count, 0.99)"), count(lit(1))).show()
    }
    val a = buckets.select(col("doc_id").as("id_a"), col("band"), col("bh"))
    val b = buckets.select(col("doc_id").as("id_b"), col("band"), col("bh"))
    val cands = a.join(b, Seq("band", "bh")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    time("candidates")(println(s"[debug] n_cands = ${cands.count()}"))
    time("full pairs")(println(s"[debug] pairs = ${Dedup.simhashPairs(corpus).count()}"))
    spark.stop()
  }
}
