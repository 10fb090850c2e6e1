package graft

import org.apache.spark.sql.functions._
import graft.operators.Graphs

class GraphsSpec extends SparkSuite {
  import spark.implicits._

  test("pageRank on a cycle stays uniform at 1/n every iteration") {
    // a->b->c->a: outdeg 1 everywhere, each node receives exactly one
    // full rank share -> (1-d)/3 + d*(1/3) = 1/3 (up to the 8dp
    // contribution rounding) at every step
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r = Graphs.pageRank(e, iters = 4)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.keySet === Set(1L, 2L, 3L))
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3.0) < 1e-6, r.toString))
  }

  test("pageRank: hub of a star outranks leaves; source-only nodes get the base share") {
    // leaves 1..6 each point at hub 0; hub has no out-edges (dangling,
    // mass drops by contract). Leaves receive nothing -> exactly
    // (1-d)/n; hub aggregates all six shares.
    val e = (1L to 6L).map(_ -> 0L).toDF("src", "dst")
    val r = Graphs.pageRank(e, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val n = 7.0
    val base = (1.0 - 0.85) / n
    // outputs are rounded to 8dp, so compare at that resolution
    (1L to 6L).foreach(l => assert(math.abs(r(l) - base) < 5e-9, r.toString))
    assert(r(0L) > 4 * base, s"hub must dominate: $r")
  }

  test("pageRank is partition-invariant (decimal contribution sums)") {
    val e = (0L until 200L).flatMap(i =>
      Seq((i, (i * 7 + 3) % 200L), (i, (i * 13 + 5) % 200L)))
      .filter { case (s, d) => s != d }.toDF("src", "dst")
    val r1 = Graphs.pageRank(e, iters = 3).orderBy("node").collect()
    val r2 = Graphs.pageRank(e.repartition(7), iters = 3).orderBy("node").collect()
    assert(r1.map(_.toSeq).toSeq === r2.map(_.toSeq).toSeq)
    // ranks are a positive signal and the graph has in-edges everywhere
    assert(r1.forall(_.getDouble(1) > 0.0))
  }
}
