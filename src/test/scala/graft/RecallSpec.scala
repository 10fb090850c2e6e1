package graft

import graft.operators.Recall

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
}
