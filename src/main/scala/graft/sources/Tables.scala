package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table loaders (Parquet per the driver contract; the reference's
  * stores were an hnswlib binary + JSON id map + DocumentArrayMemmap,
  * `/root/reference/executor.py:227-236` — our persistent form is Parquet).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")

  /** events.parquet carries TIMESTAMP(NANOS), which Spark 4 rejects by
    * default — read nanos as long and floor-convert to a microsecond
    * timestamp (`DIV 1000` stays in exact integer arithmetic; DuckDB's
    * native ns read floors identically). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Default query set for the k-NN operators: first 10 vectors by id,
    * projected to (query_id, query_vec). Broadcast-sized by construction. */
  def defaultQueries(spark: SparkSession, dir: String, n: Int = 10): DataFrame =
    embeddings(spark, dir)
      .filter(col("vec_id") < n)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
}
