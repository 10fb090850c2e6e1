package graft

import org.apache.spark.sql.functions._
import graft.operators.{Contamination, Dedup, Scoring}

class ContaminationSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "text")

  private lazy val evalSet = docs.filter($"doc_id" % 25 === 0)
  // planted contaminated docs: a 12-token verbatim span of an eval doc
  // wrapped in clean filler — 5 complete word 8-grams of overlap
  private lazy val planted = docs.filter($"doc_id" % 50 === 0).select(
    ($"doc_id" + 20000000L).as("doc_id"),
    concat(lit("clean preamble words "),
      concat_ws(" ", slice(Dedup.tokens($"text"), 1, 12)),
      lit(" closing words")).as("text"))
  private lazy val train =
    docs.filter($"doc_id" % 25 =!= 0).unionByName(planted)

  test("report matches a blind brute-force overlap; planted spans all found") {
    val flagged = Contamination.report(train, evalSet).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // independent formulation: collect the full eval gram set into one
    // row and intersect per train doc — no join, no broadcast path shared
    // with the operator under test
    val evalAll = evalSet.select(Dedup.wordShingles($"text", 8).as("egs"))
      .agg(array_distinct(flatten(collect_list($"egs"))).as("eg"))
    val naive = train.select($"doc_id", Dedup.wordShingles($"text", 8).as("gs"))
      .crossJoin(evalAll)
      .select($"doc_id", size(array_intersect($"gs", $"eg")).cast("long").as("n"))
      .filter($"n" > 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(flagged === naive, "operator disagrees with brute force")
    // every planted doc embeds a verbatim 12-token eval span -> its 5
    // span 8-grams are all in the eval gram set
    val plantedIds = planted.select("doc_id").collect().map(_.getLong(0)).toSet
    plantedIds.foreach { id =>
      assert(flagged.getOrElse(id, 0L) >= 5L,
        s"planted doc $id overlap ${flagged.getOrElse(id, 0L)} < 5")
    }
  }

  test("clean() removes exactly the flagged docs at threshold 0") {
    val flaggedIds = Contamination.report(train, evalSet)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val kept = Contamination.clean(train, evalSet)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((kept & flaggedIds).isEmpty, "contaminated doc survived cleaning")
    assert(kept.size === train.count() - flaggedIds.size)
    // the planted docs are always among the removed
    val plantedIds = planted.select("doc_id").collect().map(_.getLong(0)).toSet
    assert((plantedIds & kept).isEmpty)
  }

  test("quality model scores are in (0,1) and monotone against repetition") {
    val scored = Scoring.qualityDecisions(docs).collect()
    assert(scored.length === docs.count())
    scored.foreach { r =>
      val s = r.getDouble(1)
      assert(s > 0.0 && s < 1.0, s"score $s out of range")
      assert(r.getString(2) === (if (s >= 0.5) "keep" else "drop"))
    }
    // controlled monotonicity: same token count, same (zero) punctuation
    // and stopwords — the all-repeats doc must score strictly below the
    // all-distinct doc, isolating the repetition feature
    val synth = Seq(
      (1L, (1 to 80).map(i => s"tok$i").mkString(" ")),
      (2L, Seq.fill(80)("tok1").mkString(" "))).toDF("doc_id", "text")
    val s = Scoring.qualityDecisions(synth).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(2L) < s(1L),
      s"repetitive doc scored ${s(2L)} >= distinct doc ${s(1L)}")
  }

  test("trainLogistic learns the separating feature's sign on separable data") {
    // y == 1 iff f1 is high; f2 is pure noise-free constant -> its weight
    // must stay at 0 (gradient of a constant feature with balanced
    // residuals) while f1's weight goes positive and drives accuracy
    val rows = (0 until 40).map { i =>
      val y = if (i % 2 == 0) 1.0 else 0.0
      (i.toLong, if (y == 1.0) 1.0 else 0.0, 0.5, y)
    }
    val f = rows.toDF("id", "f1", "f2", "y")
    val m = Scoring.trainLogistic(f, "y", Seq("f1", "f2"), iters = 5)
    val w = m.weights.toMap
    assert(w("f1") > 0.2, s"separating feature weight ${w("f1")} not positive")
    // trained model separates: p(f1=1) > 0.5 > p(f1=0)
    val z1 = m.bias + w("f1") * 1.0 + w("f2") * 0.5
    val z0 = m.bias + w("f1") * 0.0 + w("f2") * 0.5
    assert(z1 > 0 && z0 < 0, s"model does not separate: z1=$z1 z0=$z0")
  }

  test("trainLogistic weights are exact under repartition and match a driver replay") {
    val full = spark.read.parquet(s"$sfDir/documents.parquet")
    val f = Scoring.qualityFeatures(full).join(
      full.select(col("doc_id"), (col("lang") === "en").cast("double").as("y")),
      "doc_id")
    val feats = Seq("len_score", "punct_ratio", "stopword_ratio", "repetition_ratio")
    val m1 = Scoring.trainLogistic(f, "y", feats)
    val m2 = Scoring.trainLogistic(f.repartition(7), "y", feats)
    assert(m1 === m2, "decimal gradient sums must make training partition-invariant")
    // driver replay with BigDecimal sums (order-free) over collected rows
    val local = f.select((col("y") +: feats.map(col)): _*).collect()
      .map(r => (r.getDouble(0), feats.indices.map(j => r.getDouble(j + 1)).toArray))
    var bias = 0.0; var w = Array(0.0, 0.0, 0.0, 0.0)
    for (_ <- 1 to 3) {
      val sums = Array.fill(5)(java.math.BigDecimal.ZERO)
      local.foreach { case (y, x) =>
        val z = x.zip(w).foldLeft(bias) { case (a, (xi, wi)) => a + wi * xi }
        val p = 0.5 * (1.0 + z / (1.0 + math.abs(z)))
        def r8(v: Double) = java.math.BigDecimal.valueOf(v)
          .setScale(8, java.math.RoundingMode.HALF_UP)
        sums(0) = sums(0).add(r8(p - y))
        x.indices.foreach(j => sums(j + 1) = sums(j + 1).add(r8((p - y) * x(j))))
      }
      val n = local.length.toDouble
      bias = bias - 0.5 * (sums(0).doubleValue() / n)
      w = w.zipWithIndex.map { case (wj, j) => wj - 0.5 * (sums(j + 1).doubleValue() / n) }
    }
    assert(m1.bias === bias)
    assert(m1.weights.map(_._2) === w.toSeq)
  }

  test("rankingAuc: perfect, inverted, interleaved, all-tied, one-class") {
    import spark.implicits._
    def auc(rows: Seq[(Double, Double)]): Option[Double] = {
      val r = Scoring.rankingAuc(rows.toDF("score", "__y")).head()
      if (r.isNullAt(2)) None else Some(r.getDouble(2))
    }
    // perfect separation -> 1.0; inverted -> 0.0
    assert(auc(Seq((0.1, 0.0), (0.2, 0.0), (0.8, 1.0), (0.9, 1.0))) === Some(1.0))
    assert(auc(Seq((0.9, 0.0), (0.8, 0.0), (0.1, 1.0), (0.2, 1.0))) === Some(0.0))
    // interleaved [0,1,0,1] by score: positive ranks 2+4 -> 0.75
    assert(auc(Seq((0.1, 0.0), (0.2, 1.0), (0.3, 0.0), (0.4, 1.0))) === Some(0.75))
    // all scores tied: average ranks give exactly 0.5
    assert(auc(Seq((0.5, 0.0), (0.5, 1.0), (0.5, 0.0), (0.5, 1.0))) === Some(0.5))
    // one-class frames have no ranking to grade -> NULL
    assert(auc(Seq((0.3, 1.0), (0.7, 1.0))) === None)
    assert(auc(Seq((0.3, 0.0), (0.7, 0.0))) === None)
    // tie straddling the classes: pos at 0.5 vs neg at 0.5 counts 1/2
    // (scores [0.2-, 0.5-, 0.5+]: avg rank of the tie = 2.5 -> AUC 0.75)
    assert(auc(Seq((0.2, 0.0), (0.5, 0.0), (0.5, 1.0))) === Some(0.75))
  }

  test("calibrationReport: hand bins, boundary clamp, empty bins absent") {
    import spark.implicits._
    val rows = Seq(
      (0.05, 0.0), (0.05, 0.0), (0.05, 1.0), // bin 0: pos_rate 1/3
      (0.45, 1.0), (0.55, 0.0),              // bins 4 and 5
      (1.0, 1.0)                             // exact 1.0 clamps to bin 9
    ).toDF("score", "__y")
    val got = Scoring.calibrationReport(rows)
      .orderBy("bin")
      .as[(Int, Long, Long, Double, Double)].collect().toSeq
    assert(got === Seq(
      (0, 3L, 1L, 0.05, 0.333333),
      (4, 1L, 1L, 0.45, 1.0),
      (5, 1L, 0L, 0.55, 0.0),
      (9, 1L, 1L, 1.0, 1.0)))
    // only populated bins emit rows
    assert(got.map(_._1) === Seq(0, 4, 5, 9))
  }

  test("thresholdReport: hand confusion cells, F1 from integers, degenerate NULLs") {
    import spark.implicits._
    // threshold 0.5: tp=2 (0.6,0.9 pos), fp=1 (0.7 neg), fn=1 (0.2 pos), tn=2
    val r = Scoring.thresholdReport(Seq(
        (0.6, 1.0), (0.9, 1.0), (0.7, 0.0), (0.2, 1.0), (0.1, 0.0), (0.4, 0.0))
      .toDF("score", "__y")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) === ((2L, 1L, 1L, 2L)))
    assert(r.getDouble(4) === 0.666667) // precision 2/3
    assert(r.getDouble(5) === 0.666667) // recall 2/3
    assert(r.getDouble(6) === 0.666667) // f1 = 4/6 from integer cells
    // all-negative predictions at threshold 1.1-equivalent: precision NULL
    val none = Scoring.thresholdReport(
      Seq((0.1, 1.0), (0.2, 0.0)).toDF("score", "__y"), threshold = 0.9).head()
    assert(none.isNullAt(4) && none.getDouble(5) === 0.0)
  }
}
