package graft

import org.apache.spark.sql.functions._

/** Spec-pins [[SparkEntry.fanOut]]'s 100 TB posture: the fan exists
  * for under-parallelized sources (fewer unsplittable input files than
  * cores — the fixture shape); a source that already resolves to at
  * least `defaultParallelism` input files — the production shape, where
  * the scan parallelizes natively — must pass through UNTOUCHED (no
  * repartition, no extra exchange). Without this pin a future edit
  * could silently make the fan shuffle production-shaped inputs. */
class FanOutSpec extends SparkSuite {

  private def tmp(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_fanout_spec/$name"

  test("many-file input (>= cores) is returned unchanged — the production no-op") {
    val p = tmp("many")
    val cores = spark.sparkContext.defaultParallelism
    spark.range(1000).select(col("id"), (col("id") % 7).as("k"))
      .repartition(cores * 2)
      .write.mode("overwrite").parquet(p)
    val src = spark.read.parquet(p)
    assert(src.inputFiles.length >= cores, "fixture must resolve to >= cores files")
    // referential identity: not just "no visible effect" but literally
    // the input frame — zero plan nodes added on the production shape
    assert(SparkEntry.fanOut(spark, src) eq src)
    assert(SparkEntry.fanOut(spark, src, col("k")) eq src)
  }

  test("few-file input fans to defaultParallelism (round-robin, no keys)") {
    val p = tmp("single")
    spark.range(1000).select(col("id"), (col("id") % 7).as("k"))
      .coalesce(1).write.mode("overwrite").parquet(p)
    val src = spark.read.parquet(p)
    val cores = spark.sparkContext.defaultParallelism
    assert(src.inputFiles.length < cores)
    val fanned = SparkEntry.fanOut(spark, src)
    assert(fanned.rdd.getNumPartitions == cores)
    // round-robin preserves multiset of rows
    assert(fanned.exceptAll(src).isEmpty && src.exceptAll(fanned).isEmpty)
  }

  test("keyed fan hash-partitions on the downstream keys at defaultParallelism") {
    val p = tmp("keyed")
    spark.range(1000).select(col("id"), (col("id") % 7).as("k"))
      .coalesce(1).write.mode("overwrite").parquet(p)
    val src = spark.read.parquet(p)
    val cores = spark.sparkContext.defaultParallelism
    val fanned = SparkEntry.fanOut(spark, src, col("k"))
    assert(fanned.rdd.getNumPartitions == cores)
    val plan = fanned.queryExecution.sparkPlan.toString
    assert(plan.contains("hashpartitioning(k"),
      s"expected hash partitioning on k, got:\n$plan")
    // a downstream groupBy on the fan key must not add a second exchange
    val agg = fanned.groupBy("k").agg(count(lit(1)))
    val exchanges = agg.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange "))
    assert(exchanges == 1, s"expected the fan's single exchange, got $exchanges")
  }
}
