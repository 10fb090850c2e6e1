package graft

/** Mirrors the driver's smoke check: the flagship entry query returns
  * rows on sf0.001. */
class EntrySpec extends SparkSuite {
  test("entry returns rows (driver smoke contract)") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("query_id") && df.columns.contains("score"))
  }

  test("ann_ivf entry runs the persisted-index path (k rows per query)") {
    val df = SparkEntry.queries("ann_ivf")(spark, sfDir)
    assert(df.count() === 50) // 10 queries x k=5
  }

  test("every oracleSql key names a real query entry") {
    // a typo'd oracle key would be silently ignored by the driver — the
    // query would degrade to rows-only without anyone noticing
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }
}
