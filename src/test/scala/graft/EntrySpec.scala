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

  test("bruteGateSlice: exhaustive under the threshold, pair-preserving half slice above") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // planted-pair layout: base ids 0,10,20 with copies at base+1e7
    val ids = Seq(0L, 10L, 20L, 10000000L, 10000010L, 10000020L, 1L, 3L)
    val sigs = ids.toDF("doc_id").localCheckpoint(true)
    // under the threshold: identity (the gate stays exhaustive)
    assert(SparkEntry.bruteGateSlice(sigs, maxDocs = 100L).count() === ids.size)
    // above the threshold: even-parity slice — every planted (base,
    // base+1e7) pair survives WHOLE (both sides share parity), odd
    // singletons drop
    val sliced = SparkEntry.bruteGateSlice(sigs, maxDocs = 4L)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(sliced === Set(0L, 10L, 20L, 10000000L, 10000010L, 10000020L))
    // the shipped threshold leaves today's fixtures exhaustive: sf0.1's
    // near-dupe corpus is ~5.5k docs, far under the pin
    assert(SparkEntry.BruteGateMaxDocs === 20000L)
  }
}
