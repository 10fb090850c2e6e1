package graft

/** Mirrors the driver's smoke check: the flagship entry query returns
  * rows on sf0.001. */
class EntrySpec extends SparkSuite {
  test("entry returns rows (driver smoke contract)") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("query_id") && df.columns.contains("score"))
  }
}
