package graft

// Scratch timing for the dedup_stream_agreement machinery cost vs
// shuffle-partition count. Delete after the knob decision lands.
object DebugStreamGate {
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
    val fn = SparkEntry.queries("dedup_stream_agreement")
    fn(spark, sfDir).count() // warm-up
    for (parts <- Seq("32", "8", "32", "8")) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"[debugstream] parts=$parts%-3s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.stop()
  }
}
