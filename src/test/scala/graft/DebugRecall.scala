package graft

// Scratch A/B for the recall-entry cost attribution (r7 verdict finding
// #1): times the exact twin alone, the approx side alone, and the full
// gated entry, interleaved over several rounds. Delete after the
// adjudication lands in SCALING.md.
object DebugRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[debugrecall] $label%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s  (rows=$n)")
    }

    import graft.operators.{KnnIvf, KnnTopK, Pq, Recall}
    import graft.sources.Tables

    // mirror of the entry's wiring
    val full = SparkEntry.queries("ann_ivfpq_recall")
    // warm-up
    full(spark, sfDir).count()

    for (round <- 1 to 3) {
      println(s"--- round $round ---")
      time("exact_only") {
        KnnTopK.knnExact(Tables.defaultQueries(spark, sfDir),
          Tables.embeddings(spark, sfDir), k = 5).count()
      }
      time("approx_only") { SparkEntry.queries("ann_ivfpq")(spark, sfDir).count() }
      time("full_gated_entry") { full(spark, sfDir).count() }
    }
    spark.stop()
  }
}
