package graft
import org.apache.spark.sql.SparkSession
/** Standalone machine-speed probe: the Bench canary workload, timed N
  * times, so a builder can check for the documented slow-host mode
  * BEFORE paying for a full bench run. Not part of the library. */
object DebugCanary {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions.{sum => fsum, col => fcol}
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      spark.range(200000000L).select(fsum(fcol("id") % 1000007L)).count()
      println(f"[canary] #$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
