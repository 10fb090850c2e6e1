package graft

import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Mechanical scale-hygiene audit over the ENTIRE registered query
  * surface: every `SparkEntry.queries` entry (plus the flagship
  * `entry`) is planned at sf0.001 and its physical plan swept for
  * operators that cannot survive a 100 TB input. Today's invariant:
  * ZERO `CartesianProductExec` anywhere — every
  * deliberate cross join in the repo is `crossJoin(broadcast(<1-row
  * aggregate>))`, which plans as a BroadcastNestedLoopJoin over a
  * single broadcast row, never a partitioned cartesian. A regression
  * that drops a join condition or loses a broadcast hint lands here as
  * a named failure instead of waiting for a human plan audit. */
class PlanAuditSpec extends SparkSuite {

  /** Stream-replay gates execute a stateful streaming query during
    * CONSTRUCTION (wall-clock sleeps + trigger churn); their final
    * frames are tiny driver-local gate plans. Skipped for runtime, not
    * because they would fail the audit. */
  private val constructionReplays =
    Set("dedup_stream_agreement", "dedup_stream_ttl_gate")

  test("no registered query plans a CartesianProduct") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    def audit(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      // plain collect (not collectWithSubqueries): subquery expressions
      // of an un-executed sparkPlan still hold LOGICAL plans, which the
      // subquery walk would feed to this physical-node match
      val hits = df.queryExecution.sparkPlan.collect {
        case c: CartesianProductExec => c
      }
      if (hits.nonEmpty) offenders += s"$name (${hits.size})"
    }
    audit("entry", SparkEntry.entry(spark))
    for ((name, fn) <- SparkEntry.queries if !constructionReplays(name))
      audit(name, fn(spark, sfDir))
    assert(offenders.isEmpty,
      s"cartesian product planned by: ${offenders.mkString(", ")}")
  }
}
