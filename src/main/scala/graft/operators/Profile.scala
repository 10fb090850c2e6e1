package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  // --------------------------------------------------------------------
  // Expectation suite — the Deequ/Great-Expectations-style contract
  // check a pipeline runs before admitting a new data drop: named
  // predicates with exact violation counts, emitted as a small report
  // frame a scheduler can gate on. (The reference validates only
  // embedding dimensionality, executor.py:105-110; a corpus pipeline
  // needs table-wide contracts.)
  // --------------------------------------------------------------------

  /** Row-predicate and uniqueness checks over ONE table, fused into a
    * single aggregation pass (every check is two conditional aggregates
    * in the same `agg` — map-side combinable, one scan no matter how
    * many checks ride it). `violationPreds` maps check name -> boolean
    * column that is true ON A VIOLATING ROW (null predicate counts as
    * no violation — express nullability checks explicitly).
    * `uniqueCols` adds a `<col>_unique` check per listed column with
    * violations = n_non_null_rows − n_distinct (exact distinct: the
    * honest Expand cost, same adjudication as [[profile]]). NULL keys
    * are NOT uniqueness violations — missing and duplicated keys are
    * different defects, so express nullability as its own predicate
    * check (same contract as the predicate rule above).
    * @return one row per check: (check, total, violations) */
  def checkRows(df: DataFrame, violationPreds: Seq[(String, Column)],
                uniqueCols: Seq[String] = Nil): DataFrame = {
    require(violationPreds.nonEmpty || uniqueCols.nonEmpty, "no checks")
    val names = violationPreds.map(_._1) ++ uniqueCols.map(_ + "_unique")
    require(names.distinct.size == names.size,
      s"duplicate check names: ${names.diff(names.distinct).distinct.mkString(", ")}")
    val aggs = Seq(count(lit(1)).as("__total")) ++
      violationPreds.map { case (name, pred) =>
        count(when(pred, 1)).as(s"__v_$name") } ++
      uniqueCols.flatMap(c => Seq(
        count(col(c)).as(s"__nn_$c"), // count(col) skips nulls
        countDistinct(col(c)).as(s"__nd_$c")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = violationPreds.map { case (name, _) =>
      struct(lit(name).as("check"), col("__total").as("total"),
        col(s"__v_$name").as("violations"))
    } ++ uniqueCols.map { c =>
      struct(lit(s"${c}_unique").as("check"), col("__total").as("total"),
        (col(s"__nn_$c") - col(s"__nd_$c")).as("violations"))
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  /** Referential-integrity check: fact rows whose `factKey` has no match
    * in `dim.dimKey` are violations (null fact keys violate too — a
    * dangling FK and a missing FK both break the join contract;
    * exempt them upstream if the schema allows nulls).
    *
    * Scale shape: the dim side reduces to its DISTINCT key set first;
    * `broadcastDim = true` (real dimension tables) makes the probe a
    * broadcast left join — zero fact shuffle; false (fact-to-fact FKs,
    * e.g. lineitem -> orders at 100 TB) leaves the strategy to
    * AQE/sort-merge on the key. Either way the verdict is ONE
    * conditional aggregate over the joined frame.
    * @return one row: (check, total, violations) */
  def checkForeignKey(fact: DataFrame, factKey: String,
                      dim: DataFrame, dimKey: String, name: String,
                      broadcastDim: Boolean = true): DataFrame = {
    val keys0 = dim.select(col(dimKey).as("__dk")).where(col("__dk").isNotNull).distinct()
    val keys = if (broadcastDim) broadcast(keys0) else keys0
    fact.select(col(factKey).as("__fk"))
      .join(keys, col("__fk") === col("__dk"), "left")
      .agg(count(lit(1)).as("total"),
        count(when(col("__dk").isNull, 1)).as("violations"))
      .select(lit(name).as("check"), col("total"), col("violations"))
  }
}
