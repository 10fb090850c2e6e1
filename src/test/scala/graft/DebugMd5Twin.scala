package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch stage-timing for the md5 twin pipelines (delete after use). */
object DebugMd5Twin {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup
    val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val docs = d.unionByName(d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat(col("text"), lit(" extra tail words")).as("text")))
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[md5twin] $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s  ($n rows)")
    }
    // warm
    docs.count()
    val tk = docs.select(col("doc_id"), Dedup.tokens(col("text")).as("__ts"))
      .filter(size(col("__ts")) > 0)
    time("tokens")(tk.count())
    val sh = tk.select(col("doc_id"),
        explode(Dedup.trailingShingleStrings(col("__ts"), 3)).as("__sh"))
      .select(col("doc_id"), Dedup.portableHash64(col("__sh")).as("__h"))
    time("shingle hashes")(sh.count())
    val mins = sh.groupBy(col("doc_id"), pmod(col("__h"), lit(32)).as("__b"))
      .agg(min(col("__h")).as("__mv"))
    time("bucket mins")(mins.count())
    time("full minhash twin")(Dedup.minhashPairsPortable(docs).count())
    val sets = docs.select(col("doc_id"), Dedup.tokens(col("text")).as("__ts"))
      .select(col("doc_id"), Dedup.wordShinglesOfTokens(col("__ts"), 3).as("__set"))
    time("verify sets")(sets.count())
    time("full simhash twin")(Dedup.simhashPairsPortable(docs).count())
    val sig = Dedup.simhashSignaturesPortable(docs)
    time("simhash sigs")(sig.count())
    spark.stop()
  }
}
