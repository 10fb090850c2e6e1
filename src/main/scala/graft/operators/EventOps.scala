package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over the timestamped `events` table (SURVEY
  * §2.9 E4/E5): event-time tumbling windows, JSON property extraction,
  * gap-based sessionization, per-key top-N. The batch forms here share
  * their logical plans with the Structured Streaming renditions in
  * [[graft.streaming.EventStream]] — same groupBy(window(...)) shape,
  * plus watermarking on the streaming side.
  */
object EventOps {

  /** Tumbling event-time window aggregate. Window start is emitted as
    * epoch seconds (timezone-proof for cross-engine comparison). */
  def hourlyAgg(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           // decimal accumulation: deterministic under partial aggregation
           // and bit-identical to a double-precision oracle
           round(sum(col("value").cast("decimal(18,6)")), 4).cast("double").as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Sliding event-time windows (2h size, 1h slide): each event lands in
    * two windows. Same `window()` construct streams with a watermark. */
  def slidingAgg(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n_events"))

  /** Exact per-type value quantiles (percentile with linear
    * interpolation — the deterministic form, not the approx sketch). */
  def valueQuantiles(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
        round(min(col("value")), 4).as("vmin"),
        round(max(col("value")), 4).as("vmax"))

  /** Value quartile assignment per event type: ntile(4) over a TOTAL
    * order (value, then event_id) — the tiebreak makes bucket membership
    * engine-independent. WindowGroupLimit doesn't apply (every row is
    * kept), but the window partitions by type so no global sort. */
  def valueQuartiles(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").asc, col("event_id").asc)
    events.select(col("event_id"), col("event_type"),
      round(col("value"), 4).as("value"),
      ntile(4).over(w).cast("long").as("quartile"))
  }

  /** Per-type dispersion statistics with engine-portable arithmetic:
    * sums and sums-of-squares accumulate in decimal (order-independent
    * under partial aggregation — double accumulation is not), the
    * variance formula and sqrt run once per group in double. Sample
    * variance (n-1); single-row groups are excluded rather than NULL. */
  /** Unrounded per-type (n, mean, std) via the decimal-sums formula —
    * the SINGLE definition of that arithmetic; [[valueStats]] (rounded
    * surface) and [[valueOutliers]] (unrounded threshold) both derive
    * from it, so the two can never drift. Double division of the
    * decimal sums, NOT decimal division — decimal scale rules differ
    * across engines. */
  private def typeStats(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(30,8)")).as("__s"),
        sum((col("value") * col("value")).cast("decimal(30,8)")).as("__ss"))
      .filter(col("n") > 1)
      .select(col("event_type"), col("n"),
        (col("__s").cast("double") / col("n")).as("__mean"),
        sqrt((col("__ss").cast("double") - col("__s").cast("double") *
          col("__s").cast("double") / col("n")) / (col("n") - 1)).as("__std"))

  def valueStats(events: DataFrame): DataFrame =
    typeStats(events).select(col("event_type"), col("n"),
      round(col("__mean"), 4).as("mean_value"),
      round(col("__std"), 4).as("stddev_value"))

  /** Z-score anomaly flagging: events whose value sits more than
    * `z` sample standard deviations above their type's mean. The
    * per-type stats frame is tiny (one row per type) and broadcasts;
    * the fact side is a single filtered projection — the standard
    * outlier sweep at any corpus size. Stats arithmetic is identical
    * to [[valueStats]] (decimal sums, double division), but UNROUNDED
    * — rounding the threshold would move the cut. */
  def valueOutliers(events: DataFrame, z: Double = 3.0): DataFrame = {
    val stats = typeStats(events).select(col("event_type"), col("__mean"), col("__std"))
    events.join(broadcast(stats), "event_type")
      .filter(col("value") > col("__mean") + lit(z) * col("__std"))
      .select(col("event_id"), col("event_type"), col("value"),
        round((col("value") - col("__mean")) / col("__std"), 4).as("zscore"))
  }

  /** JSON property extraction from the `props` column + aggregate by
    * event type. `try_cast` keeps malformed payloads null-safe under
    * ANSI mode. */
  def jsonPropsAgg(events: DataFrame): DataFrame =
    events
      .withColumn("k", expr("try_cast(get_json_object(props, '$.k') AS INT)"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"),
           round(avg(col("k")), 4).as("avg_k"),
           max(col("k")).as("max_k"))

  /** Gap-based sessionization: a new session starts when the gap since
    * the user's previous event exceeds `gapSeconds`. Pure window
    * functions — one shuffle on user_id; at scale this is the standard
    * sessionization plan (sort within user partitions).
    * @return per-user session stats */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val withGap = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull, 1)
          .when(unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSeconds, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withGap.groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("session_events"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
           sum(col("session_events")).as("n_events"),
           max(col("session_events")).as("max_session_events"))
  }

  /** First-touch attribution / keep-FIRST dedup by key: each user's
    * earliest event (ts, then event_id tiebreak). The window top-1 —
    * Spark 4's WindowGroupLimit discards later rows before the exchange,
    * so only one row per user per partition shuffles. The mirror of
    * upsert's keep-LAST semantics (`Lifecycle.upsertById`).
    * @return (user_id, first_type, first_ts epoch-seconds, first_value) */
  def firstTouch(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    events.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("user_id"), col("event_type").as("first_type"),
        unix_timestamp(col("ts")).as("first_ts"), round(col("value"), 4).as("first_value"))
  }

  /** As-of join, composed from built-ins (custom-operator preference (a),
    * SURVEY §2 mapping note): for each left event, the latest right event
    * with the same key and ts <= left.ts. Implemented as union + running
    * last-value over the merged timeline — one shuffle on the key, no
    * range-join pair blowup, the formulation that scales to dense
    * timelines. Right rows sort before left rows at equal ts, so
    * equal-timestamp matches are included (ASOF semantics).
    *
    * @return left rows + `asof_ts` (nullable epoch seconds of the match)
    */
  def asOfLatestPrior(left: DataFrame, right: DataFrame,
                      keyCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val l = left.withColumn("__side", lit(1))
    val r = right.select(col(keyCol), col(tsCol)).withColumn("__side", lit(0))
    val merged = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged
      .withColumn("asof_ts",
        last(when(col("__side") === 0, unix_timestamp(col(tsCol))), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side")
  }

  /** Top-N event types per user by frequency (rank tiebreak by type name
    * for determinism). */
  /** Week-over-week retention: per week, the count of users also active
    * the following week. Two aggregations (distinct user-weeks) + an
    * equi-join on (user, week + 7 days) — cohort analytics over event
    * time. Weeks are ISO (Monday-start). The join matches on CALENDAR
    * arithmetic (`date_add(week, 7)` over dates), not a fixed 604800-s
    * offset: in a non-UTC session timezone a DST-transition week spans
    * 601200/608400 s and a fixed offset silently misses the boundary.
    * Epoch seconds appear only in the output projection. */
  def weeklyRetention(events: DataFrame): DataFrame = {
    val wk = events.select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("wk")).distinct()
    wk.alias("a")
      .join(wk.alias("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b.wk") === date_add(col("a.wk"), 7))
      .groupBy(unix_timestamp(col("a.wk").cast("timestamp")).as("week"))
      .agg(count(lit(1)).as("n_retained"))
  }

  /** Ordered funnel: per stage, users whose earliest qualifying event
    * strictly follows their previous stage's time. Times compare in
    * floored epoch SECONDS so both engines order identically regardless
    * of sub-second timestamp precision. Each stage is one filtered
    * aggregation + an equi-join against the (user-level, much smaller)
    * previous-stage table — stages chain linearly, no self-join blowup.
    * @return (stage, n_users), stage prefixed with its 1-based index */
  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val sec = unix_timestamp(col("ts"))
    val perStage = stages.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (stage, _)) =>
        val hits = events.filter(col("event_type") === stage)
          .select(col("user_id"), sec.as("__s"))
        Some(prev match {
          case None =>
            hits.groupBy(col("user_id")).agg(min(col("__s")).as("__t"))
          case Some(p) =>
            hits.join(p.select(col("user_id"), col("__t").as("__prev")), "user_id")
              .filter(col("__s") > col("__prev"))
              .groupBy(col("user_id")).agg(min(col("__s")).as("__t"))
        })
    }.flatten
    perStage.zip(stages.zipWithIndex).map { case (df, (stage, i)) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(s"${i + 1}_$stage").as("stage"), col("n_users"))
    }.reduce(_.unionByName(_))
  }

  def topEventTypes(events: DataFrame, n: Int = 2): DataFrame = {
    val counts = events.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("n").desc, col("event_type").asc)
    counts.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= n)
  }

  /** Per-user activity matrix: one row per user, one count column per
    * event type (relational PIVOT). `types` is explicit — never inferred
    * — so the schema is static, the plan is a single hash aggregation
    * (no distinct-values pre-pass), and the pivot is just n conditional
    * counts wide. Missing combinations are 0, not null. */
  def typePivot(events: DataFrame, types: Seq[String]): DataFrame = {
    require(types.nonEmpty, "typePivot needs explicit event types")
    events.groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
  }

  /** Relative standing of every event's value within its type:
    * percent_rank (rank-based) and cume_dist (count-based), over the
    * total order (value, event_id) so ranks are tie-free and both
    * fractions are exact integer ratios — identical doubles in any
    * engine. */
  def valueStanding(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    events.select(col("event_id"), col("event_type"),
      round(percent_rank().over(w), 6).as("pct_rank"),
      round(cume_dist().over(w), 6).as("cume"))
  }

  /** SCD2-style status history: each user's event-type CHANGES as
    * validity intervals — `lag` marks the change points, `lead` closes
    * each interval at the next change (open = null = current status).
    * The standard slowly-changing-dimension build, windowed per user so
    * no global sort exists at any scale. Interval bounds are integer
    * epoch-microseconds (engine-exact). */
  def statusHistory(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("__us"), col("event_id"))
    events
      .select(col("user_id"), unix_micros(col("ts")).as("__us"),
        col("event_id"), col("event_type"))
      .withColumn("__prev", lag(col("event_type"), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col("event_type"))
      .select(col("user_id"), col("event_type").as("status"),
        col("__us").as("valid_from_us"),
        lead(col("__us"), 1).over(w).as("valid_to_us"))
  }

  /** Per-user inter-arrival-gap profile: lag() over (ts, event_id) gives
    * each consecutive gap in integer microseconds, then one aggregation
    * per user. Gap arithmetic stays in exact integers; only the mean is
    * a (mirrored, 4dp-rounded) double. Scale: the window sorts within a
    * user partition only. */
  def interArrival(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val us = unix_micros(col("ts"))
    events
      .select(col("user_id"), (us - lag(us, 1).over(w)).as("gap_us"))
      .filter(col("gap_us").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap_us")).as("sum_gap_us"),
        min(col("gap_us")).as("min_gap_us"),
        max(col("gap_us")).as("max_gap_us"),
        round(sum(col("gap_us")).cast("double") / count(lit(1)) / lit(1e6), 4)
          .as("mean_gap_s"))
  }

  /** Deterministic A/B readout: users hash-split 50/50 (the md5 gate of
    * [[Sampling.hashKeep]] — assignment is stable under reprocessing,
    * engine changes, and corpus growth, which is what makes an
    * experiment readout reproducible), per-variant conversion under
    * `convPred` (any row-level predicate — a user converts if ANY of
    * their events satisfies it; it must not be universally true or
    * false or z is undefined), and the two-proportion z statistic. One row:
    * (n_a, n_b, conv_a, conv_b, p_a, p_b, z).
    *
    * Scale shape: one user-grain aggregation (max-of-flag — no
    * distinct Expand), one 2-row variant rollup, one final projection;
    * z is pure arithmetic on four counts, so the double surface is
    * IEEE-exact cross-engine given the mirrored parenthesization. */
  def abTest(events: DataFrame, convPred: Column,
             userCol: String = "user_id"): DataFrame = {
    val perUser = events
      .groupBy(col(userCol))
      .agg(max(convPred).as("__conv"))
      .withColumn("__variant",
        when(substring(md5(col(userCol).cast("string")), 1, 4) < "8000", "A")
          .otherwise("B"))
    val per = perUser.groupBy(col("__variant"))
      .agg(count(lit(1)).as("__n"), count(when(col("__conv"), 1)).as("__c"))
    val w = per.agg(
      max(when(col("__variant") === "A", col("__n"))).as("n_a"),
      max(when(col("__variant") === "A", col("__c"))).as("conv_a"),
      max(when(col("__variant") === "B", col("__n"))).as("n_b"),
      max(when(col("__variant") === "B", col("__c"))).as("conv_b"))
    val pA = col("conv_a").cast("double") / col("n_a")
    val pB = col("conv_b").cast("double") / col("n_b")
    val pooled = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b"))
    w.select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
      round(pA, 4).as("p_a"), round(pB, 4).as("p_b"),
      round((pA - pB) /
        sqrt(pooled * (lit(1) - pooled) *
          (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 4).as("z"))
  }

  /** Calendar gap-fill + forward fill — the time-series densification
    * every metrics/feature pipeline needs before resampling or model
    * input: each user's daily series is completed over the user's OWN
    * [first, last] day span (sequence-explode), missing days flagged,
    * and the value carried forward from the most recent observed day
    * (`last(..., ignoreNulls)` running window — the LOCF rule).
    *
    * Scale shape: one shuffle to the (user, day) grain; the reduced
    * daily frame is pinned (`localCheckpoint`) because three plan
    * branches reference it (span bounds, calendar join, fill) — Spark
    * re-executes shared subtrees, and re-aggregating the raw event
    * stream twice is the 100 TB mistake. The calendar explode is
    * span-proportional, and the fill window sorts each user's days
    * independently. */
  def gapFillDaily(events: DataFrame, valueCol: String = "value",
                   userCol: String = "user_id"): DataFrame = {
    val daily = events
      .groupBy(col(userCol), to_date(col("ts")).as("__day"))
      .agg(round(sum(col(valueCol).cast("decimal(18,6)")), 4).cast("double").as("__v"))
      .localCheckpoint(true)
    val days = daily.groupBy(col(userCol))
      .agg(min(col("__day")).as("__lo"), max(col("__day")).as("__hi"))
      .select(col(userCol), explode(sequence(col("__lo"), col("__hi"))).as("__day"))
    val w = Window.partitionBy(col(userCol)).orderBy(col("__day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    days.join(daily, Seq(userCol, "__day"), "left")
      .withColumn("filled", last(col("__v"), ignoreNulls = true).over(w))
      .select(col(userCol),
        date_format(col("__day"), "yyyy-MM-dd").as("day"),
        col("__v").isNull.as("was_missing"),
        col("filled"))
  }

  /** Weekly cohort-retention matrix — the activation/retention readout
    * every event pipeline serves: users cohorted by the week of their
    * FIRST event, each (cohort, week-offset) cell counting the distinct
    * users active that many weeks later, with retention as the cell's
    * share of its cohort's week-0 size.
    *
    * Scale shape: one user-keyed first-event aggregation, one join back
    * (user-keyed — co-partitions with the aggregation), a distinct over
    * (cohort, user, offset) ≤ |users|·|weeks| rows, and a cohort-sized
    * matrix aggregation. Retention rounds half-up to 4dp in INTEGER
    * arithmetic — cohort sizes like 32 land exactly on the 4dp
    * half-boundary where double rounding is engine-divergent (the
    * duplicated-spans coverage lesson).
    *
    * @return (cohort, week_offset, n_users, retention) */
  def cohortRetention(events: DataFrame, tsCol: String = "ts",
                      userCol: String = "user_id"): DataFrame = {
    val firsts = events.groupBy(col(userCol))
      .agg(min(col(tsCol)).as("__first"))
      .select(col(userCol),
        to_date(date_trunc("week", col("__first"))).as("cohort"))
    val act = events.join(firsts, Seq(userCol))
      .select(col("cohort"), col(userCol),
        floor(datediff(to_date(col(tsCol)), col("cohort")) / lit(7))
          .cast("long").as("week_offset"))
      .distinct()
    val m = act.groupBy(col("cohort"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
    val base = m.filter(col("week_offset") === 0)
      .select(col("cohort"), col("n_users").as("__n0"))
    m.join(base, Seq("cohort"))
      .withColumn("retention",
        floor((col("n_users") * lit(20000L) + col("__n0")) /
          (col("__n0") * lit(2L))) / lit(10000.0))
      // cohort as ISO string — DATE columns surface as engine-specific
      // types in the oracle compare (the gap-fill convention)
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
        col("week_offset"), col("n_users"), col("retention"))
  }

  /** Pre-aggregated MERGEABLE distinct-count sketches — the incremental
    * maintenance pattern for "distinct users over an arbitrary date
    * range" at 100 TB: one DataSketches HLL per day (appended as days
    * arrive, never recomputed), a range query unions |days| sketches
    * instead of re-scanning events. Engine-specific binary state, so the
    * driver contract is an in-plan ERROR GATE against the exact count
    * (the sketch rows themselves are not oracle-comparable — same
    * adjudication as events_hll_error). */
  def dailyUserSketches(events: DataFrame, tsCol: String = "ts",
                        userCol: String = "user_id"): DataFrame =
    events.groupBy(to_date(col(tsCol)).as("day"))
      .agg(hll_sketch_agg(col(userCol)).as("sketch"))

  /** Union the per-day sketches over [from, to] and estimate; one row
    * (approx_users). */
  def distinctOverRange(sketches: DataFrame, from: String, to: String): DataFrame =
    sketches.filter(col("day").between(lit(from), lit(to)))
      .agg(round(hll_sketch_estimate(hll_union_agg(col("sketch"))), 0)
        .cast("long").as("approx_users"))
}
