package graft

import graft.operators.Recall
import org.apache.spark.sql.functions.lit

class RecallSpec extends SparkSuite {
  import spark.implicits._

  test("recall@k averages per-query overlap; a silent no-answer query counts as 0") {
    val exact = Seq(
      (1L, 10L, 1L), (1L, 11L, 2L),
      (2L, 20L, 1L), (2L, 21L, 2L),
      (3L, 30L, 1L), (3L, 31L, 2L)
    ).toDF("query_id", "match_id", "rank")
    val approx = Seq(
      (1L, 10L, 1L), (1L, 11L, 2L), // q1: 2/2
      (2L, 20L, 1L), (2L, 99L, 2L)  // q2: 1/2; q3 absent: 0/2
    ).toDF("query_id", "match_id", "rank")
    val r = Recall.atK(approx, exact, k = 2).head()
    assert(r.getAs[Long]("k") === 2L)
    assert(r.getAs[Long]("n_queries") === 3L)
    assert(r.getAs[Double]("recall_at_k") === 0.5)
  }

  test("recall@k ignores rows ranked beyond k on both sides") {
    val exact = Seq((1L, 10L, 1L), (1L, 77L, 3L)).toDF("query_id", "match_id", "rank")
    val approx = Seq((1L, 10L, 1L), (1L, 77L, 3L)).toDF("query_id", "match_id", "rank")
    // only rank 1 counts at k=1; the rank-3 agreement must not inflate
    val r = Recall.atK(approx, exact, k = 1).head()
    assert(r.getAs[Long]("n_queries") === 1L)
    assert(r.getAs[Double]("recall_at_k") === 1.0)
    val rMiss = Recall.atK(
      Seq((1L, 99L, 1L), (1L, 10L, 2L)).toDF("query_id", "match_id", "rank"),
      exact, k = 1).head()
    assert(rMiss.getAs[Double]("recall_at_k") === 0.0)
  }

  test("identical inputs give recall exactly 1") {
    val e = Seq((1L, 10L, 1L), (2L, 20L, 1L)).toDF("query_id", "match_id", "rank")
    assert(Recall.atK(e, e, k = 1).head().getAs[Double]("recall_at_k") === 1.0)
  }

  test("sparse labels: a perfect answer over <k true neighbors scores 1.0, not hits/k") {
    // q1 has only 2 true neighbors at k=5 (filtered corpus); the approx
    // path returns exactly those 2. The old constant-k denominator would
    // under-score this as 2/5 = 0.4 — a false quality regression.
    val exact = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("query_id", "match_id", "rank")
    val approx = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("query_id", "match_id", "rank")
    assert(Recall.atK(approx, exact, k = 5).head().getAs[Double]("recall_at_k") === 1.0)
    // and a HALF-answer over those 2 scores 0.5, not 1/5
    val half = Seq((1L, 10L, 1L), (1L, 99L, 2L)).toDF("query_id", "match_id", "rank")
    assert(Recall.atK(half, exact, k = 5).head().getAs[Double]("recall_at_k") === 0.5)
  }

  test("atKGated passes through (with floor column) above the floor, raises below it") {
    val e = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("query_id", "match_id", "rank")
    val ok = Recall.atKGated(e, e, k = 2, floor = 0.9).head()
    assert(ok.getAs[Double]("recall_at_k") === 1.0)
    assert(ok.getAs[Double]("floor") === 0.9)
    // sabotage: a collapsed approximate result must make the ROW raise
    // at execution time (the driver records it as a hard err)
    val bad = Seq((1L, 98L, 1L), (1L, 99L, 2L)).toDF("query_id", "match_id", "rank")
    val ex = intercept[Exception] {
      Recall.atKGated(bad, e, k = 2, floor = 0.9).collect()
    }
    assert(ex.getMessage.contains("quality gate"), ex.getMessage)
  }

  test("atKGrouped scores every group in the explicit universe; an absent group is 0") {
    val exact = Seq((1L, 10L, 1L), (1L, 11L, 2L), (2L, 20L, 1L), (2L, 21L, 2L))
      .toDF("query_id", "match_id", "rank")
    // level 1 answers only q1 fully; level 2 has NO rows at all — it must
    // still appear with recall 0, not vanish from the curve
    val approx = Seq((1L, 1L, 10L, 1L), (1L, 1L, 11L, 2L))
      .toDF("n_probe", "query_id", "match_id", "rank")
    val rows = Recall.atKGrouped(approx, exact, k = 2, "n_probe", Seq(1L, 2L))
      .collect().map(r => r.getAs[Long]("n_probe") ->
        (r.getAs[Long]("n_queries"), r.getAs[Double]("recall_at_k"))).toMap
    assert(rows.keySet === Set(1L, 2L))
    assert(rows(1L) === ((2L, 0.5)))  // q1: 2/2, q2: 0/2
    assert(rows(2L) === ((2L, 0.0)))
    // sparse-label denominator carries over: one true neighbor, found
    val e1 = Seq((1L, 10L, 1L)).toDF("query_id", "match_id", "rank")
    val a1 = Seq((7L, 1L, 10L, 1L)).toDF("g", "query_id", "match_id", "rank")
    assert(Recall.atKGrouped(a1, e1, k = 5, "g", Seq(7L))
      .head().getAs[Double]("recall_at_k") === 1.0)
  }

  test("atK references the exact twin subplan exactly once (single-pass shape)") {
    // the r7 denominator fix referenced the exact frame twice (hit join
    // + denominator aggregate), doubling the exact twin's execution; the
    // single-pass left-join shape must leave exactly TWO leaves in the
    // plan — one exact, one approx
    val exact = Seq((1L, 10L, 1L), (2L, 20L, 1L)).toDF("query_id", "match_id", "rank")
    val approx = Seq((1L, 10L, 1L), (2L, 99L, 1L)).toDF("query_id", "match_id", "rank")
    val plan = Recall.atK(approx, exact, k = 1).queryExecution.optimizedPlan
    assert(plan.collectLeaves().size === 2, plan.treeString)
    val grouped = Recall.atKGrouped(
      approx.withColumn("g", lit(1L)).select($"g", $"query_id", $"match_id", $"rank"),
      exact, k = 1, "g", Seq(1L, 2L)).queryExecution.optimizedPlan
    assert(grouped.collectLeaves().size === 2, grouped.treeString)
  }

  test("setAgreement over two empty inputs is vacuous perfect agreement, not a gate trip") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val r = Recall.setAgreement(empty, empty, on = Seq("id_a", "id_b")).head()
    assert(r.getAs[Double]("agreement") === 1.0)
    assert(r.getAs[Long]("n_common") === 0L)
  }

  test("setAgreement minCount: both-sides-empty raises for fixture-backed gates") {
    // fixture gates PLANT duplicates, so emptiness is itself a wiring
    // regression — minCount >= 1 overrides the vacuous-agreement rule
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val ex = intercept[Exception] {
      Recall.setAgreement(empty, empty, on = Seq("id_a", "id_b"), minCount = 1L).collect()
    }
    assert(ex.getMessage.contains("minCount"), ex.getMessage)
    // non-empty inputs at or above the floor pass unchanged with minCount
    val a = Seq((1L, 2L)).toDF("id_a", "id_b")
    val r = Recall.setAgreement(a, a, on = Seq("id_a", "id_b"), minCount = 1L).head()
    assert(r.getAs[Double]("agreement") === 1.0)
  }

  test("setAgreement gates exact twin equality: 1.0 passes, any divergence raises") {
    val a = Seq((1L, 2L, 0.5), (3L, 4L, 0.7)).toDF("id_a", "id_b", "jaccard")
    val same = Recall.setAgreement(a, a, on = Seq("id_a", "id_b", "jaccard")).head()
    assert(same.getAs[Double]("agreement") === 1.0)
    assert(same.getAs[Long]("n_common") === 2L)
    val b = Seq((1L, 2L, 0.5), (3L, 5L, 0.7)).toDF("id_a", "id_b", "jaccard")
    val ex = intercept[Exception] {
      Recall.setAgreement(a, b, on = Seq("id_a", "id_b", "jaccard")).collect()
    }
    assert(ex.getMessage.contains("agreement gate"), ex.getMessage)
    // a subset twin (candidate lost to a banding bug) must also raise:
    // the denominator is the LARGER side
    val sub = Seq((1L, 2L, 0.5)).toDF("id_a", "id_b", "jaccard")
    intercept[Exception] {
      Recall.setAgreement(a, sub, on = Seq("id_a", "id_b", "jaccard")).collect()
    }
  }
}
