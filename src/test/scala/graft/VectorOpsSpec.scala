package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorOps

class VectorOpsSpec extends SparkSuite {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c.cast("double")).head().getDouble(0)

  private val a = typedLit(Seq(1.0f, 2.0f, 2.0f))
  private val b = typedLit(Seq(2.0f, 0.0f, 1.0f))

  test("dot product") { assert(one(VectorOps.dot(a, b)) === 4.0) }
  test("l2 squared") { assert(one(VectorOps.l2Sq(a, b)) === 6.0) } // 1+4+1
  test("norm") { assert(one(VectorOps.norm(a)) === 3.0) }
  test("cosine similarity") {
    // 4 / (3 * sqrt(5))
    assert(math.abs(one(VectorOps.cosineSimilarity(a, b)) - 4.0 / (3.0 * math.sqrt(5.0))) < 1e-12)
  }
  test("self cosine is 1, self l2 is 0") {
    assert(math.abs(one(VectorOps.cosineSimilarity(a, a)) - 1.0) < 1e-12)
    assert(one(VectorOps.l2Sq(a, a)) === 0.0)
  }
  test("metric symmetry") {
    for (m <- Seq("cosine", "euclidean", "inner_product"))
      assert(one(VectorOps.distance(m, a, b)) === one(VectorOps.distance(m, b, a)))
  }
  test("distance->similarity transform matches reference formulas") {
    // cosine/ip: 1 - d; euclidean: 1/(1+d)  (executor.py:117-124)
    assert(one(VectorOps.distanceToSimilarity("cosine", lit(0.25))) === 0.75)
    assert(one(VectorOps.distanceToSimilarity("euclidean", lit(3.0))) === 0.25)
  }
  test("unknown metric falls back to l2 (executor.py:268-273)") {
    assert(one(VectorOps.distance("bogus", a, b)) === 6.0)
  }
  test("l2Normalize yields unit vectors") {
    assert(math.abs(one(VectorOps.norm(VectorOps.l2Normalize(a))) - 1.0) < 1e-6)
  }
  test("codegen expressions match higher-order-function twins bit-for-bit") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(100)
    val pairs = emb.select($"embedding".as("x"))
      .crossJoin(emb.select($"embedding".as("y")).limit(10))
    val diffs = pairs.select(
      sum(when(VectorOps.dot($"x", $"y") =!= VectorOps.dotHof($"x", $"y"), 1).otherwise(0)).as("d1"),
      sum(when(VectorOps.l2Sq($"x", $"y") =!= VectorOps.l2SqHof($"x", $"y"), 1).otherwise(0)).as("d2"),
      sum(when(VectorOps.cosineSimilarity($"x", $"y") =!=
        VectorOps.dotHof($"x", $"y") / (sqrt(VectorOps.dotHof($"x", $"x")) * sqrt(VectorOps.dotHof($"y", $"y"))), 1)
        .otherwise(0)).as("d3")).head()
    assert(diffs.getLong(0) === 0 && diffs.getLong(1) === 0 && diffs.getLong(2) === 0)
  }

  test("SignProjection bits equal the composed per-plane dot signs") {
    val rnd = new scala.util.Random(7L)
    val hyper = Array.fill(24)(Array.fill(64)(rnd.nextGaussian()))
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(200)
    // composed twin: one when(dot >= 0) column per plane against the
    // SAME literal hyperplane rows the fused expression carries
    val bitCols = hyper.toIndexedSeq.map { h =>
      when(VectorOps.dot($"embedding", typedLit(h.toSeq)) >= 0.0, 1).otherwise(0)
    }
    val diff = emb.select(
      VectorOps.signProjection($"embedding", hyper).as("fused"),
      array(bitCols: _*).as("composed"))
      .filter($"fused" =!= $"composed").count()
    assert(diff === 0)
  }

  test("unknown metric warns and falls back to l2 (executor.py:268-273)") {
    val buf = new java.io.ByteArrayOutputStream()
    val fallback = Console.withErr(buf) { VectorOps.distance("bogus_metric", $"x", $"y") }
    val pairs = Seq((Seq(1f, 2f), Seq(3f, 5f))).toDF("x", "y")
    val Array(got, want) = pairs
      .select(fallback.as("f"), VectorOps.l2Sq($"x", $"y").as("l2"))
      .head().toSeq.map(_.asInstanceOf[Double]).toArray
    assert(got === want)
    assert(buf.toString.contains("invalid distance metric 'bogus_metric'"), buf.toString)
  }

  test("property: cosine in [-1,1] and l2sq >= 0 on fixture vectors") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(50)
    val pairs = emb.select($"embedding".as("x"))
      .crossJoin(emb.select($"embedding".as("y")).limit(5))
    val stats = pairs.select(
      min(VectorOps.cosineSimilarity($"x", $"y")).as("mn"),
      max(VectorOps.cosineSimilarity($"x", $"y")).as("mx"),
      min(VectorOps.l2Sq($"x", $"y")).as("l2min")).head()
    assert(stats.getDouble(0) >= -1.0 - 1e-9 && stats.getDouble(1) <= 1.0 + 1e-9)
    assert(stats.getDouble(2) >= 0.0)
  }

  test("powerIterate finds a planted dominant direction") {
    import graft.operators.VectorStats
    // 30 vectors strongly along e1 (varying magnitude, both signs in the
    // other dims as tiny noise) -> leading singular direction is e1
    val rows = (1 to 30).map { i =>
      val m = 5.0 + (i % 3)
      Seq(0.01f * (i % 5), m.toFloat, 0.02f * ((i % 7) - 3))
    }
    val df = rows.map(Tuple1(_)).toDF("embedding")
    val v = VectorStats.powerIterate(df, dim = 3, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(v(1L) === 1.0, s"dominant dim must carry max loading: $v")
    assert(math.abs(v(0L)) < 0.05 && math.abs(v(2L)) < 0.05, v.toString)
  }

  test("powerIterate is partition-invariant and fixed-point on rank-1 data") {
    import graft.operators.VectorStats
    val w = Seq(2.0f, -4.0f, 1.0f)
    val df = Seq.fill(12)(Tuple1(w)).toDF("embedding")
    val v = VectorStats.powerIterate(df, dim = 3, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // rank-1 corpus: every iterate is proportional to w (sign follows
    // sign(w·1⃗) = sign(2-4+1) < 0, the usual arbitrary-sign freedom of
    // power iteration); normalization pins max |loading| = 1
    assert(v(1L) === 1.0, v.toString)
    assert(math.abs(v(0L) + 0.5) < 1e-6 && math.abs(v(2L) + 0.25) < 1e-6, v.toString)
    val again = VectorStats.powerIterate(df.repartition(5), dim = 3, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again === v, "decimal sums must make the iterate partition-invariant")
  }
}
