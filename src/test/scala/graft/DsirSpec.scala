package graft

import org.apache.spark.sql.functions._
import graft.operators.Dsir

class DsirSpec extends SparkSuite {
  import spark.implicits._

  // 5 target-vocabulary docs among 25 noise docs; the target words never
  // appear outside the seed set, so seed docs separate by many nats
  private lazy val corpus = {
    val target = (1L to 5L).map(i => (i, "alpha beta gamma alpha beta gamma alpha beta gamma"))
    val noise = (100L to 124L).map(i => (i, s"red green blue cyan red green blue cyan red ${if (i % 2 == 0) "teal" else "pink"}"))
    (target ++ noise).toDF("doc_id", "text")
  }

  test("select captures the whole seed set when weights dominate the noise") {
    val picked = Dsir.select(corpus, array_contains(split(col("text"), " "), "alpha"), k = 5)
      .collect().map(_.getLong(0)).toSet
    assert(picked === (1L to 5L).toSet)
  }

  test("log-weights rank target-vocabulary docs above noise docs") {
    val all = Dsir.select(corpus, array_contains(split(col("text"), " "), "alpha"), k = 30)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val minTarget = (1L to 5L).map(all).min
    val maxNoise = (100L to 124L).map(all).max
    assert(minTarget > maxNoise,
      s"target min $minTarget should exceed noise max $maxNoise")
  }

  test("unigramLogRatios matches the hand-computed add-half formula") {
    // corpus: doc 1 (target) = "a a b", doc 2 = "b c"
    // counts: a: cs=2 ct=2; b: cs=2 ct=1; c: cs=1 ct=0; V=3, Ns=5, Nt=3
    val d = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val r = Dsir.unigramLogRatios(d, col("doc_id") === 1L)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    // operator rounds to 6dp; compare against the unrounded formula
    // within the rounding radius
    def lr(ct: Long, cs: Long): Double =
      math.log((ct + 0.5) / (3 + 0.5 * 3)) - math.log((cs + 0.5) / (5 + 0.5 * 3))
    assert(math.abs(r("a") - lr(2, 2)) < 5e-7)
    assert(math.abs(r("b") - lr(1, 2)) < 5e-7)
    assert(math.abs(r("c") - lr(0, 1)) < 5e-7)
  }

  test("gumbel noise is deterministic, finite, and id-dependent") {
    val g = corpus.select(col("doc_id"), Dsir.gumbelNoise(col("doc_id")).as("g"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val g2 = corpus.select(col("doc_id"), Dsir.gumbelNoise(col("doc_id")).as("g"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(g === g2)
    assert(g.values.forall(v => !v.isNaN && !v.isInfinite))
    assert(g.values.toSet.size > 1)
  }

  test("k larger than the corpus returns every doc exactly once") {
    val rows = Dsir.select(corpus, array_contains(split(col("text"), " "), "alpha"), k = 1000)
      .collect()
    assert(rows.length === 30)
    assert(rows.map(_.getLong(0)).distinct.length === 30)
  }

  test("hashed features with a collision-free bucket count match the exact path") {
    val pred = array_contains(split(col("text"), " "), "alpha")
    // 2^30 buckets over a 10-word vocabulary: collision-free in practice,
    // so ratios — and hence the selection and its weights — are identical
    val exact = Dsir.select(corpus, pred, k = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    val hashed = Dsir.selectHashed(corpus, pred, k = 10, numBuckets = 1 << 30)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(hashed === exact)
  }

  test("degenerate single bucket still selects k rows without crashing") {
    val pred = array_contains(split(col("text"), " "), "alpha")
    assert(Dsir.selectHashed(corpus, pred, k = 10, numBuckets = 1).count() === 10)
  }

  test("a zero-token doc competes with log-weight 0 instead of vanishing") {
    val withEmpty = corpus.union(Seq((999L, "")).toDF("doc_id", "text"))
    val pred = array_contains(split(col("text"), " "), "alpha")
    // k >= corpus size: EVERY doc must appear, including the empty one
    val rows = Dsir.select(withEmpty, pred, k = 1000).collect()
    assert(rows.length === 31)
    val empty = rows.find(_.getLong(0) === 999L).get
    assert(empty.getAs[Double]("log_weight") === 0.0)
  }
}
