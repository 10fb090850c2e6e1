package graft

import org.apache.spark.sql.SparkSession

/** Plan audit (Test scope): prints formatted physical plans for the
  * scale-critical queries so pushdown / broadcast / codegen spans can be
  * inspected. */
object DebugExplain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val targets = args.drop(1).toSeq match {
      case Nil => Seq("knn_cosine", "knn_topk_agg", "star_top_orders", "dedup_exact",
        "events_hourly", "star_pricing_summary")
      case xs  => xs
    }
    for (name <- targets) {
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
