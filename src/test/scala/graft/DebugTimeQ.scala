package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: Test/runMain graft.DebugTimeQ <sfDir> <name>... */
object DebugTimeQ {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args.tail; _ <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"[time] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }
    spark.stop()
  }
}
