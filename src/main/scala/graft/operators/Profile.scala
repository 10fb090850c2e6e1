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
}
