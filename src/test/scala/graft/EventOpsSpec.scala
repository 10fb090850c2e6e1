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
}
