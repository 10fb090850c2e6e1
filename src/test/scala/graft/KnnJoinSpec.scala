package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.operators.{KnnIvf, KnnJoin}
import graft.sources.Tables

class KnnJoinSpec extends SparkSuite {

  private lazy val emb = Tables.embeddings(spark, sfDir)

  test("exact k-NN join equals the window formulation") {
    val viaAgg = KnnJoin.knnJoinExact(emb, emb, k = 3)
    val q = emb.select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").asc, col("match_id").asc)
    val viaWindow = emb
      .join(q, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("match_id"),
        (round(VectorOps.distance("cosine", col("query_vec"), col("embedding")), 4)
          + lit(0.0)).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("exact join: every row is a query, no self-matches, ranks 1..k") {
    val r = KnnJoin.knnJoinExact(emb, emb, k = 3).cache()
    assert(r.select("query_id").distinct().count() === emb.count())
    assert(r.filter(col("query_id") === col("match_id")).isEmpty)
    val badRanks = r.groupBy("query_id")
      .agg(sort_array(collect_list(col("rank"))).as("rs"))
      .filter(col("rs") =!= typedLit(Seq(1L, 2L, 3L)))
    assert(badRanks.isEmpty)
    r.unpersist()
  }

  test("IVF-co-partitioned ANN join: recall@3 >= 0.9 vs exact") {
    // near-uniform fixture embeddings are IVF's worst case — a deep probe
    // (10 of 16 cells) is needed for the 0.9 bar, mirroring KnnSpec's
    // nProbe=12/16 recall test (measured: 4/16 -> 0.64, 8/16 -> 0.86)
    val exact = KnnJoin.knnJoinExact(emb, emb, k = 3)
      .select("query_id", "match_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = KnnJoin.annJoinIvf(emb, KnnIvf.build(emb, numCells = 16),
        k = 3, nProbe = 10)
      .select("query_id", "match_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"ANN join recall@3 = $recall")
    assert(approx.forall { case (q, m) => q != m }, "self-match leaked")
  }

  test("ANN join probes bound the scored pair space (nProbe cells per query)") {
    // with nProbe == numCells the ANN join degenerates to the exact join
    val idx = KnnIvf.build(emb, numCells = 4)
    val full = KnnJoin.annJoinIvf(emb, idx, k = 3, nProbe = 4)
    val exact = KnnJoin.knnJoinExact(emb, emb, k = 3)
    assert(full.exceptAll(exact).isEmpty && exact.exceptAll(full).isEmpty)
  }
}
