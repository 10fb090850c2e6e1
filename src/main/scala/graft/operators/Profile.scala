package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data-quality profiling — the "what's in this table"
  * pass every ingestion pipeline runs before trusting a new drop of
  * data: per-column null counts, exact distinct cardinality, numeric
  * ranges. (The reference validates only embedding dimensionality,
  * `/root/reference/executor.py:105-110`; a corpus pipeline needs the
  * table-wide form.)
  *
  * Scale shape: ONE aggregation pass computes every per-column stat
  * (a single `agg` with 4 expressions per column), then a narrow
  * inline-table explode turns the 1-row result into one row per
  * column. The exact distinct counts make Catalyst Expand the input
  * (one replica per countDistinct) — the honest cost of exactness;
  * [[approxProfile]] swaps in HLL sketches (no Expand, one plain
  * shuffle) for the 100 TB form, at engine-specific counts.
  */
object Profile {

  /** Exact profile. Numeric columns get min/max surfaced as double
    * (exact for longs < 2^53 and for doubles); string columns get
    * null/distinct counts only.
    * @return one row per profiled column:
    *         (col_name, n_null, n_distinct, min_val, max_val) */
  def profile(df: DataFrame, numericCols: Seq[String],
              stringCols: Seq[String] = Nil): DataFrame =
    build(df, numericCols, stringCols, exact = true)

  /** HLL-sketched variant for corpus-scale tables: `n_distinct` is
    * approximate (and engine-specific — never oracle it), everything
    * else identical to [[profile]]. */
  def approxProfile(df: DataFrame, numericCols: Seq[String],
                    stringCols: Seq[String] = Nil): DataFrame =
    build(df, numericCols, stringCols, exact = false)

  private def build(df: DataFrame, numericCols: Seq[String],
                    stringCols: Seq[String], exact: Boolean): DataFrame = {
    require(numericCols.nonEmpty || stringCols.nonEmpty, "no columns to profile")
    require(numericCols.intersect(stringCols).isEmpty,
      s"columns in both lists: ${numericCols.intersect(stringCols).mkString(", ")}")
    val all = numericCols ++ stringCols
    // a repeat WITHIN one list would otherwise surface later as an
    // ambiguous-column analysis error on the __null_/__nd_ aliases
    require(all.distinct.size == all.size,
      s"duplicate columns in profile list: ${
        all.diff(all.distinct).distinct.mkString(", ")}")
    def nd(c: String) =
      if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
    val aggs = all.flatMap { c =>
      Seq(count(when(col(c).isNull, 1)).as(s"__null_$c"),
        nd(c).as(s"__nd_$c"))
    } ++ numericCols.flatMap { c =>
      Seq(min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = all.map { c =>
      val isNum = numericCols.contains(c)
      struct(lit(c).as("col_name"),
        col(s"__null_$c").as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        (if (isNum) col(s"__min_$c") else lit(null).cast("double")).as("min_val"),
        (if (isNum) col(s"__max_$c") else lit(null).cast("double")).as("max_val"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Population Stability Index between a reference slice and a current
    * slice over a categorical bucket column — the distribution-drift
    * monitor a pipeline runs on every new data drop ("did this crawl's
    * language/source/quality mix move?"). Industry-standard read:
    * < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 investigate.
    *
    * `PSI = Σ_b (p_b − q_b)·ln(p_b/q_b)` with add-half smoothing over
    * the UNION bucket set, so buckets present on only one side
    * contribute finite mass instead of ±∞ (and appear in the output
    * with an explicit zero count).
    *
    * Scale shape: two bucket-count aggregations (map-side combined, one
    * shuffle each over ≤ |buckets| keys), a full-outer join of two
    * bucket-sized frames, and two broadcast 1-row totals. Per-bucket
    * terms round to 6dp (the ln-key contract) and the total is their
    * DECIMAL sum — order-free, partition-invariant, oracle-replayable.
    *
    * @return one row per union bucket:
    *         (bucket, n_ref, n_cur, psi_term, psi_total) */
  def psi(ref: DataFrame, cur: DataFrame, bucketCol: String): DataFrame = {
    val r = ref.groupBy(col(bucketCol).as("bucket")).agg(count(lit(1)).as("n_ref"))
    val c = cur.groupBy(col(bucketCol).as("bucket")).agg(count(lit(1)).as("n_cur"))
    val joined = r.join(c, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val tot = joined.agg(count(lit(1)).as("__b"),
      sum(col("n_ref")).as("__nr"), sum(col("n_cur")).as("__nc"))
    val p = (col("n_ref").cast("double") + lit(0.5)) /
      (col("__nr").cast("double") + lit(0.5) * col("__b").cast("double"))
    val q = (col("n_cur").cast("double") + lit(0.5)) /
      (col("__nc").cast("double") + lit(0.5) * col("__b").cast("double"))
    val terms = joined.crossJoin(broadcast(tot))
      .withColumn("psi_term", round((p - q) * log(p / q), 6))
    val total = terms.agg(sum(col("psi_term").cast("decimal(18,6)")).as("__t"))
    terms.crossJoin(broadcast(total))
      .select(col("bucket"), col("n_ref"), col("n_cur"), col("psi_term"),
        round(col("__t").cast("double"), 6).as("psi_total"))
  }
}
