package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cluster-scale layout and skew utilities — the pieces that turn the
  * fixture-scale operators into 100 TB plans:
  *
  *  - partitioned corpus layout: write the corpus hash- or value-
  *    partitioned so probes prune partitions instead of scanning
  *    (IVF cell -> directory = the "index lookup" of SURVEY §2.4(3));
  *  - salted aggregation: two-phase groupBy for skewed keys, the manual
  *    complement to AQE's skew-join handling.
  */
object Scale {

  /** Persist a corpus partitioned by a column (e.g. IVF `cell`, `label`,
    * or a date). Readers filtering on that column scan only matching
    * directories — `PartitionFilters` in the plan, zero data read
    * elsewhere. */
  def dumpPartitionedBy(corpus: DataFrame, path: String, partitionCol: String): Unit =
    corpus.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  /** Read back with partition pruning available. */
  def loadPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Range-partitioned, sorted-within-partition layout: files carry
    * monotone, non-overlapping value ranges for `sortCol`, so parquet
    * row-group min/max statistics turn a range predicate into skipped
    * files/row groups at planning/read time — the zone-map layout for
    * time-series and any other range-probed corpus. On 100 TB of events,
    * a one-week probe against a month of data reads ~1/4 of the files
    * instead of all of them, before any row is decoded. */
  def dumpRangeSorted(df: DataFrame, path: String, sortCol: String,
                      numRanges: Int = 8): Unit =
    df.repartitionByRange(numRanges, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(path)

  /** Skew-proof count aggregation: phase 1 groups on (key, salt) so hot
    * keys spread over `saltBuckets` reducers, phase 2 merges the partial
    * counts per key. Identical results to a plain groupBy().count(). */
  def saltedCounts(df: DataFrame, keyCol: String, saltBuckets: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets.toLong)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("n"))

  /** Salted sum for a numeric column under skewed keys (decimal-safe). */
  def saltedSum(df: DataFrame, keyCol: String, valueCol: String,
                saltBuckets: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets.toLong)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(col(valueCol).cast("decimal(26,6)")).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).cast("double").as("total"))
}
