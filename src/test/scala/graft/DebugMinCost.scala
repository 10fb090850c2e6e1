package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Scratch adjudicator for the star_min_cost_supplier r6 bench delta:
  * times the shipped decimal(38,0) fixed-point formulation against the
  * pre-r6 long formulation (which can silently overflow) on the same
  * fixture, repeated, to decide whether the +19% was the price of
  * overflow-safety or host noise. Test-scope utility; not a query path. */
object DebugMinCost {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def perPairBase(lineitem: DataFrame): DataFrame = lineitem
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(26,6)")).as("__rev"),
        sum(col("l_quantity").cast("decimal(26,6)")).as("__qty"))

    def decimalForm(lineitem: DataFrame, supplier: DataFrame): DataFrame = {
      val perPair = perPairBase(lineitem)
        .select(col("l_partkey"), col("l_suppkey"),
          ((col("__rev") * lit(1000000)).cast("decimal(38,0)") * lit(20000L) +
            (col("__qty") * lit(1000000)).cast("decimal(38,0)")).as("__num"),
          ((col("__qty") * lit(1000000)).cast("decimal(38,0)") * lit(2L)).as("__den"))
        .select(col("l_partkey"), col("l_suppkey"),
          (expr("__num DIV __den").cast("double") / lit(10000.0)).as("unit_price"))
      val w = Window.partitionBy(col("l_partkey"))
        .orderBy(col("unit_price").asc, col("l_suppkey").asc)
      perPair.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_partkey").as("p_partkey"), col("s_suppkey"),
          col("s_name"), col("unit_price"))
    }

    def longForm(lineitem: DataFrame, supplier: DataFrame): DataFrame = {
      val perPair = perPairBase(lineitem)
        .select(col("l_partkey"), col("l_suppkey"),
          ((col("__rev") * lit(1000000)).cast("long") * lit(20000L) +
            (col("__qty") * lit(1000000)).cast("long")).as("__num"),
          ((col("__qty") * lit(1000000)).cast("long") * lit(2L)).as("__den"))
        .select(col("l_partkey"), col("l_suppkey"),
          (expr("__num DIV __den").cast("double") / lit(10000.0)).as("unit_price"))
      val w = Window.partitionBy(col("l_partkey"))
        .orderBy(col("unit_price").asc, col("l_suppkey").asc)
      perPair.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_partkey").as("p_partkey"), col("s_suppkey"),
          col("s_name"), col("unit_price"))
    }

    val li = Tables.table(spark, sfDir, "lineitem")
    val supp = Tables.table(spark, sfDir, "supplier")
    // warm both plans
    decimalForm(li, supp).count(); longForm(li, supp).count()
    for (round <- 1 to 4) {
      val t0 = System.nanoTime(); decimalForm(li, supp).count()
      val tDec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); longForm(li, supp).count()
      val tLong = (System.nanoTime() - t1) / 1e9
      println(f"round $round: decimal $tDec%.3f s, long $tLong%.3f s")
    }
    spark.stop()
  }
}
