package graft

import org.apache.spark.sql.functions._
import graft.operators.EventOps
import graft.sources.Tables

class EventOpsSpec extends SparkSuite {

  private lazy val events = Tables.events(spark, sfDir)

  test("as-of join: match is at or before the left timestamp, from the same key") {
    val purchases = events.filter(col("event_type") === "purchase")
    val clicks = events.filter(col("event_type") === "click")
    val joined = EventOps.asOfLatestPrior(purchases, clicks)
    // never a future match
    assert(joined.filter(col("asof_ts") > unix_timestamp(col("ts"))).count() === 0)
    // null only when the user has no click at or before the purchase
    val withPrior = purchases.alias("p")
      .join(clicks.alias("c"),
        col("p.user_id") === col("c.user_id") && col("c.ts") <= col("p.ts"), "left_semi")
      .count()
    assert(joined.filter(col("asof_ts").isNotNull).count() === withPrior)
    // the matched ts is the max prior click ts (spot-check via naive join)
    val naive = purchases.alias("p")
      .join(clicks.alias("c"),
        col("p.user_id") === col("c.user_id") && col("c.ts") <= col("p.ts"))
      .groupBy(col("p.event_id"))
      .agg(max(unix_timestamp(col("c.ts"))).as("want"))
    val diff = joined.select(col("event_id"), col("asof_ts"))
      .join(naive, "event_id")
      .filter(col("asof_ts") =!= col("want")).count()
    assert(diff === 0)
  }

  test("first touch: one row per user, at that user's minimum event time") {
    val ft = EventOps.firstTouch(events).cache()
    assert(ft.count() === events.select("user_id").distinct().count())
    val mins = events.groupBy("user_id")
      .agg(min(unix_timestamp(col("ts"))).as("want"))
    assert(ft.join(mins, "user_id")
      .filter(col("first_ts") =!= col("want")).count() === 0)
    ft.unpersist()
  }

  test("ntile quartiles are balanced within one row per event type") {
    val q = EventOps.valueQuartiles(events)
    val sizes = q.groupBy("event_type", "quartile").count()
      .groupBy("event_type")
      .agg(max(col("count")).as("mx"), min(col("count")).as("mn"),
        countDistinct(col("quartile")).as("nq"))
      .collect()
    sizes.foreach { r =>
      assert(r.getLong(3) === 4L, s"${r.getString(0)}: ${r.getLong(3)} buckets")
      assert(r.getLong(1) - r.getLong(2) <= 1L,
        s"${r.getString(0)}: unbalanced ${r.getLong(2)}..${r.getLong(1)}")
    }
  }

  test("value stats match Spark's built-in avg/stddev within rounding") {
    val got = EventOps.valueStats(events).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val want = events.groupBy("event_type")
      .agg(avg(col("value")).as("m"), stddev(col("value")).as("sd"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (t, (m, sd)) =>
      assert(math.abs(m - want(t)._1) < 1e-3, s"$t mean $m vs ${want(t)._1}")
      assert(math.abs(sd - want(t)._2) < 1e-3, s"$t stddev $sd vs ${want(t)._2}")
    }
  }

  test("sessionize invariants: events partition into sessions") {
    val sessions = EventOps.sessionize(events)
    val total = sessions.agg(sum(col("n_events"))).head().getLong(0)
    assert(total === events.count())
    assert(sessions.filter(col("max_session_events") > col("n_events")).count() === 0)
  }

  test("sliding windows hold each event exactly twice") {
    val slid = EventOps.slidingAgg(events)
    assert(slid.agg(sum(col("n_events"))).head().getLong(0) === 2 * events.count())
  }

  test("typePivot: counts partition the events, missing combos are 0 not null") {
    val types = Seq("click", "view", "purchase", "signup", "error")
    val piv = EventOps.typePivot(events, types)
    assert(piv.count() === events.select("user_id").distinct().count())
    val colSum = piv.agg(expr(types.map(t => s"sum(`$t`)").mkString(" + "))
      .as("total")).head().getLong(0)
    assert(colSum === events.count(), "pivot cells must partition the event count")
    assert(piv.filter(types.map(t => col(t).isNull).reduce(_ || _)).count() === 0)
  }

  test("valueOutliers: flags exactly the rows above the recomputed threshold") {
    val out = EventOps.valueOutliers(events, z = 2.0)
      .collect().map(_.getAs[Long]("event_id")).toSet
    // recompute the cut independently per type via built-in avg/stddev
    val stats = events.groupBy("event_type")
      .agg(avg(col("value")).as("m"), stddev(col("value")).as("sd"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val want = events.select("event_id", "event_type", "value").collect()
      .filter { r =>
        val (m, sd) = stats(r.getAs[String]("event_type"))
        r.getAs[Double]("value") > m + 2.0 * sd
      }.map(_.getAs[Long]("event_id")).toSet
    assert(out === want)
    assert(out.nonEmpty, "fixture should contain outliers at z=2")
  }

  test("statusHistory: intervals chain per user and consecutive statuses differ") {
    val hist = EventOps.statusHistory(events)
      .orderBy("user_id", "valid_from_us").collect()
    assert(hist.nonEmpty)
    for ((_, rows) <- hist.groupBy(_.getAs[Long]("user_id"))) {
      val sorted = rows.sortBy(_.getAs[Long]("valid_from_us"))
      for (Array(a, b) <- sorted.sliding(2).map(_.toArray)) {
        assert(a.getAs[Long]("valid_to_us") === b.getAs[Long]("valid_from_us"),
          "each interval must close exactly where the next opens")
        assert(a.getAs[String]("status") !== b.getAs[String]("status"),
          "consecutive intervals must change status")
      }
      assert(sorted.last.isNullAt(sorted.last.fieldIndex("valid_to_us")),
        "current status must be open-ended")
    }
  }

  test("interArrival: n_gaps = events - 1 per user and gaps telescope to last - first") {
    val gaps = EventOps.interArrival(events)
    val perUser = events.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("span_us"))
    val joined = gaps.join(perUser, "user_id").collect()
    assert(joined.nonEmpty)
    for (r <- joined) {
      assert(r.getAs[Long]("n_gaps") === r.getAs[Long]("n") - 1)
      // sum of consecutive gaps telescopes to the full span ONLY when
      // the order is consistent — catches any per-engine sort drift
      assert(r.getAs[Long]("sum_gap_us") === r.getAs[Long]("span_us"))
      assert(r.getAs[Long]("min_gap_us") >= 0L)
    }
  }

  test("abTest: split partitions users exactly, conversions bounded, null-effect z near 0") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfDir)
    val r = EventOps.abTest(ev,
      col("event_type") === "purchase" && col("value") > 100).head()
    val users = ev.select("user_id").distinct().count()
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") === users,
      "every user lands in exactly one variant")
    assert(r.getAs[Long]("conv_a") <= r.getAs[Long]("n_a"))
    assert(r.getAs[Long]("conv_b") <= r.getAs[Long]("n_b"))
    // the split is random w.r.t. behavior -> no real effect; a |z| > 5
    // here would mean the hash assignment correlates with conversion
    assert(math.abs(r.getAs[Double]("z")) < 5.0)
    // deterministic under repartition
    val again = EventOps.abTest(ev.repartition(7),
      col("event_type") === "purchase" && col("value") > 100).head()
    assert(again.toSeq === r.toSeq)
  }

  test("gapFillDaily: planted gaps densify, LOCF carries the last observed value") {
    import spark.implicits._
    // user 1: days 1, 4 observed (gap 2-3); user 2: single day
    val ev = Seq(
      (1L, "2024-03-01 10:00:00", 5.0),
      (1L, "2024-03-01 11:00:00", 1.0), // same day, sums to 6.0
      (1L, "2024-03-04 09:00:00", 2.5),
      (2L, "2024-03-10 00:30:00", 7.0)
    ).toDF("user_id", "ts_s", "value")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"), col("value"))
    val out = EventOps.gapFillDaily(ev).orderBy("user_id", "day").collect()
    val u1 = out.filter(_.getAs[Long]("user_id") == 1L)
    assert(u1.map(_.getAs[String]("day")).toSeq ===
      Seq("2024-03-01", "2024-03-02", "2024-03-03", "2024-03-04"))
    assert(u1.map(_.getAs[Double]("filled")).toSeq === Seq(6.0, 6.0, 6.0, 2.5),
      "gap days carry the last observed daily sum forward")
    assert(u1.map(_.getAs[Boolean]("was_missing")).toSeq ===
      Seq(false, true, true, false))
    val u2 = out.filter(_.getAs[Long]("user_id") == 2L)
    assert(u2.length === 1 && u2.head.getAs[Double]("filled") === 7.0)
  }

  test("cohort retention: crafted two-week matrix is exact; offsets never negative") {
    import spark.implicits._
    // week of 2024-01-01 is a Monday; users A,B cohort week0 (A returns
    // week1, B does not), user C cohorts in week1
    val ev = Seq(
      (1L, "2024-01-02 10:00:00"), (1L, "2024-01-09 10:00:00"),
      (2L, "2024-01-03 10:00:00"),
      (3L, "2024-01-10 10:00:00")
    ).toDF("user_id", "s").select(col("user_id"), col("s").cast("timestamp").as("ts"))
    val m = EventOps.cohortRetention(ev).collect()
      .map(r => (r.getAs[String]("cohort"), r.getAs[Long]("week_offset")) ->
        (r.getAs[Long]("n_users"), r.getAs[Double]("retention"))).toMap
    assert(m(("2024-01-01", 0L)) === ((2L, 1.0)))
    assert(m(("2024-01-01", 1L)) === ((1L, 0.5)))
    assert(m(("2024-01-08", 0L)) === ((1L, 1.0)))
    assert(m.size === 3)
  }

  test("cohort retention rounds half-up in integer arithmetic (the 1/32 boundary)") {
    import spark.implicits._
    // cohort of 32 users on Monday week0; exactly one returns week1:
    // 1/32 = 0.03125 — the 4dp half-boundary — must round UP to 0.0313
    val week0 = (1L to 32L).map(u => (u, "2024-01-01 08:00:00"))
    val ret = Seq((1L, "2024-01-08 08:00:00"))
    val ev = (week0 ++ ret).toDF("user_id", "s")
      .select(col("user_id"), col("s").cast("timestamp").as("ts"))
    val m = EventOps.cohortRetention(ev).collect()
      .map(r => r.getAs[Long]("week_offset") -> r.getAs[Double]("retention")).toMap
    assert(m(1L) === 0.0313, s"half-boundary must round up: $m")
  }

  test("mergeable daily HLL sketches: range union estimates within 5% of exact, any partitioning") {
    val sk = EventOps.dailyUserSketches(events)
    val approx = EventOps.distinctOverRange(sk, "2024-01-08", "2024-01-21")
      .head().getAs[Long]("approx_users")
    val exact = events
      .filter(to_date(col("ts")).between(lit("2024-01-08"), lit("2024-01-21")))
      .agg(countDistinct(col("user_id"))).head().getLong(0)
    assert(exact > 0, "fixture must cover the probe range")
    assert(math.abs(approx.toDouble / exact - 1.0) <= 0.05, s"$approx vs $exact")
    val approx2 = EventOps.distinctOverRange(
      EventOps.dailyUserSketches(events.repartition(13)), "2024-01-08", "2024-01-21")
      .head().getAs[Long]("approx_users")
    assert(approx2 === approx, "sketch estimate must be partitioning-stable")
  }
}
