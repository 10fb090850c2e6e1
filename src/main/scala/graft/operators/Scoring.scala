package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Batch model scoring — running a trained quality classifier over the
  * corpus (the fastText-style keep/drop gate every LLM data pipeline runs
  * before training). The model here is a linear head with literal
  * weights: at 100 TB the weights are broadcast into a single codegen'd
  * projection, so inference is a pure narrow map — no shuffle, no UDF,
  * no model server in the scan path. A real exported classifier (e.g. a
  * distilled quality model's final linear layer over engineered features)
  * drops into the same shape.
  */
object Scoring {

  /** Linear model: bias + (feature column -> weight), applied in
    * declaration order (float addition is order-sensitive; a fixed order
    * keeps scores bit-reproducible across engines). */
  case class LinearModel(bias: Double, weights: Seq[(String, Double)])

  /** Rational sigmoid `0.5 * (1 + z / (1 + |z|))` — same shape and range
    * as the logistic, but pure +,*,/,abs arithmetic: IEEE-exact-rounded
    * in every engine, unlike libm `exp` whose last-ulp disagreements land
    * on rounding boundaries (the flake class that broke the round-1
    * cosine oracles). */
  def rationalSigmoid(z: Column): Column =
    lit(0.5) * (lit(1.0) + z / (lit(1.0) + abs(z)))

  /** Append `outCol` = sigmoid(bias + Σ wᵢ·featureᵢ), rounded to 4dp. */
  def score(features: DataFrame, model: LinearModel,
            outCol: String = "score"): DataFrame = {
    val z = model.weights.foldLeft(lit(model.bias): Column) {
      case (acc, (c, w)) => acc + lit(w) * col(c)
    }
    features.withColumn(outCol, round(rationalSigmoid(z), 4))
  }

  /** The default document-quality head: longer docs up, punctuation
    * noise and repetition down, stopword density mildly down. Weights
    * are illustrative but fixed — determinism is the contract. */
  val QualityModel: LinearModel = LinearModel(-1.0, Seq(
    "len_score" -> 2.5,
    "punct_ratio" -> -3.0,
    "stopword_ratio" -> -0.5,
    "repetition_ratio" -> -2.0))

  /** Feature projection for [[QualityModel]] — every feature rounded to
    * 4dp BEFORE entering the linear head so both engines combine
    * identical inputs. */
  def qualityFeatures(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(col(idCol),
      least(TextOps.tokenCount(t).cast("double") / 100.0, lit(1.0)).as("len_score"),
      round(TextOps.punctRatio(t), 4).as("punct_ratio"),
      round(TextOps.stopwordRatio(t), 4).as("stopword_ratio"),
      TextOps.repetitionRatio(t).as("repetition_ratio"))
  }

  /** End-to-end keep/drop decisions for the corpus: score every doc with
    * [[QualityModel]] and threshold. @return (idCol, score, decision) */
  def qualityDecisions(docs: DataFrame, threshold: Double = 0.5,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame =
    score(qualityFeatures(docs, idCol, textCol), QualityModel)
      .select(col(idCol), col("score"),
        when(col("score") >= threshold, lit("keep")).otherwise(lit("drop"))
          .as("decision"))

  /** TRAIN the quality classifier distributed — full-batch gradient
    * descent for a logistic-shaped linear head, the other half of the
    * fastText-style keep/drop lifecycle [[score]] serves (train the gate
    * ON the cluster that holds the corpus, no sampling to a driver
    * notebook).
    *
    * Scale shape: each iteration is ONE map-side-combinable aggregation
    * over the features frame producing m+1 gradient sums + the row count
    * — a bounded collect of m+2 numbers — after which the updated weights
    * fold back into the next iteration's codegen'd projection as
    * literals. T iterations = T corpus passes, driver state = the weight
    * vector. No per-row mutable state, no parameter server.
    *
    * Determinism (the part gradient descent usually gets wrong across
    * engines): the per-row gradient contribution `(p − y)·xⱼ` is rounded
    * to 8dp and summed in DECIMAL — order-free under any partitioning —
    * and `p` uses [[rationalSigmoid]] (+,*,/,abs only; no libm `exp`).
    * The weight update `w − lr·(g/n)` is fixed-parenthesization IEEE
    * double arithmetic, so an oracle replaying the same T iterations in
    * SQL reproduces every weight bit-for-bit.
    *
    * @param features frame holding `featureCols` (pre-rounded doubles —
    *                 see [[qualityFeatures]]) and `labelCol` ∈ {0.0, 1.0}
    * @return trained model (bias + per-feature weights, declaration
    *         order) */
  def trainLogistic(features: DataFrame, labelCol: String,
                    featureCols: Seq[String], iters: Int = 3,
                    lr: Double = 0.5): LinearModel = {
    require(featureCols.nonEmpty && iters > 0)
    // every iteration re-reads the features; pin the REDUCED frame
    // (label + m doubles per row) once so T passes don't recompute the
    // upstream feature projection (tokenization, for the text features)
    // T times — the repo's fixed-point pinning pattern
    val pinned = features
      .select((col(labelCol) +: featureCols.map(col)): _*)
      .localCheckpoint(true)
    var bias = 0.0
    var w = featureCols.map(_ => 0.0)
    var n = -1.0
    for (_ <- 1 to iters) {
      val z = featureCols.zip(w).foldLeft(lit(bias): Column) {
        case (acc, (c, wj)) => acc + lit(wj) * col(c)
      }
      val resid = (rationalSigmoid(z) - col(labelCol)).as("__r")
      val gradCols = count(lit(1)).cast("double").as("__n") +:
        sum(round(col("__r"), 8).cast("decimal(28,8)")).as("__g0") +:
        featureCols.zipWithIndex.map { case (c, j) =>
          sum(round(col("__r") * col(c), 8).cast("decimal(28,8)")).as(s"__g${j + 1}")
        }
      // one aggregation job; the collect is m+2 numbers (bounded)
      val row = pinned.select(resid +: featureCols.map(col): _*)
        .agg(gradCols.head, gradCols.tail: _*).head()
      n = row.getAs[Double]("__n")
      require(n > 0, "trainLogistic needs a non-empty features frame")
      def g(i: Int): Double = row.getDecimal(i + 1).doubleValue()
      bias = bias - lr * (g(0) / n)
      w = w.zipWithIndex.map { case (wj, j) => wj - lr * (g(j + 1) / n) }
    }
    LinearModel(bias, featureCols.zip(w))
  }

  /** [[trainLogistic]] result as a frame for the driver contract:
    * one row per parameter, weights rounded to 6dp. */
  def modelFrame(spark: org.apache.spark.sql.SparkSession,
                 model: LinearModel): DataFrame = {
    import spark.implicits._
    (("bias", model.bias) +: model.weights)
      .toDF("feature", "weight")
      .select(col("feature"), round(col("weight"), 6).as("weight"))
  }

  /** [[trainLogistic]]'s weights rounded to 6dp — the precision the
    * driver contract publishes; downstream consumers (the AUC eval)
    * score with the ROUNDED model so their arithmetic starts from the
    * exact values both engines agreed on. */
  def roundedModel(model: LinearModel): LinearModel = {
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue
    LinearModel(r6(model.bias), model.weights.map { case (f, w) => (f, r6(w)) })
  }

  /** Ranking AUC (Mann–Whitney with average-rank ties) of a scored,
    * binary-labeled frame — the eval half of the classifier lifecycle
    * ([[trainLogistic]] trains, [[score]] serves, this grades).
    *
    * Arithmetic is INTEGER until the final division: with ranks over
    * scores ascending, twice the average rank of a score s is
    * `2·|{<s}| + |{=s}| + 1`, so twice the positive rank-sum
    * S2 = Σ_scores p·(2·cumBefore + c + 1) is an exact integer sum, and
    * AUC = (S2 − P·(P+1)) / (2·P·N) — one double division, rounded 6dp,
    * bit-identical in any engine.
    *
    * Scale shape: one count/sum aggregation keyed by score (map-side
    * combinable), then a global running sum over the DISTINCT-SCORE
    * frame — bounded by construction (scores are rounded to 4dp in
    * [0, 1] ⇒ ≤ 10 001 rows through the single partition, the same
    * adjudication as the audited sweep windows). AUC is NULL when
    * either class is absent (0/0 — no ranking to grade). */
  /** Confusion matrix + threshold metrics at a fixed cut — the numbers
    * a pipeline operator actually reads before shipping a keep/drop
    * gate ([[rankingAuc]] is threshold-free; this grades the cut).
    *
    * One conditional-aggregation pass (the expectation-suite shape):
    * four integer cells, then precision = tp/(tp+fp),
    * recall = tp/(tp+fn), and F1 computed DIRECTLY from the cells as
    * 2·tp/(2·tp+fp+fn) — one division each from exact integers (an F1
    * from pre-rounded P/R would compound two roundings), 6dp, NULL on
    * empty denominators. */
  def thresholdReport(scored: DataFrame, threshold: Double = 0.5,
                      labelCol: String = "__y",
                      scoreCol: String = "score"): DataFrame = {
    val pos = col(scoreCol) >= threshold
    val y = col(labelCol) === 1.0
    def cell(p: Column) = sum(when(p, 1L).otherwise(0L))
    def ratio(num: Column, den: Column) =
      when(den > 0, round(num.cast("double") / den, 6))
    scored
      .agg(cell(pos && y).as("tp"), cell(pos && !y).as("fp"),
        cell(!pos && y).as("fn"), cell(!pos && !y).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        ratio(col("tp"), col("tp") + col("fp")).as("precision"),
        ratio(col("tp"), col("tp") + col("fn")).as("recall"),
        ratio(lit(2L) * col("tp"),
          lit(2L) * col("tp") + col("fp") + col("fn")).as("f1"))
  }

  /** Reliability-diagram calibration report: equal-width score bins
    * with observed positive rate vs mean predicted score — the
    * is-the-gate-honest check run before trusting a quality threshold
    * (AUC grades RANKING; calibration grades the PROBABILITIES the
    * threshold actually cuts on).
    *
    * One aggregation, map-side combinable. Exactness: counts are
    * integers; the per-bin score sum goes through DECIMAL(14,4) (scores
    * are 4dp by [[score]]'s contract) so the mean is exact-sum /
    * count — one double division per bin, rounded 6dp. Binning
    * arithmetic (`floor(score·bins)` clamped to bins−1) is the same
    * IEEE double op in both engines, so boundary scores land
    * identically. Empty bins emit no row (a GROUP BY can only see
    * populated bins — the same contract as the histogram rows). */
  def calibrationReport(scored: DataFrame, labelCol: String = "__y",
                        scoreCol: String = "score", bins: Int = 10): DataFrame =
    scored
      .groupBy(least(floor(col(scoreCol) * bins), lit(bins - 1))
        .cast("int").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col(labelCol).cast("long")).as("n_pos"),
        sum(col(scoreCol).cast("decimal(14,4)")).as("__ssum"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("__ssum").cast("double") / col("n"), 6).as("mean_score"),
        round(col("n_pos").cast("double") / col("n"), 6).as("pos_rate"))

  def rankingAuc(scored: DataFrame, labelCol: String = "__y",
                 scoreCol: String = "score"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byScore = scored
      .groupBy(col(scoreCol).as("s"))
      .agg(count(lit(1)).as("c"), sum(col(labelCol).cast("long")).as("p"))
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byScore
      .withColumn("cum_before", coalesce(sum(col("c")).over(w), lit(0L)))
      .agg(
        sum(col("p")).as("__P"),
        sum(col("c") - col("p")).as("__N"),
        sum(col("p") * (lit(2L) * col("cum_before") + col("c") + lit(1L)))
          .as("__S2"))
      .select(col("__P").as("n_pos"), col("__N").as("n_neg"),
        when(col("__P") > 0 && col("__N") > 0,
          round((col("__S2") - col("__P") * (col("__P") + lit(1L)))
              .cast("double") /
            (lit(2.0) * col("__P") * col("__N")), 6))
          .as("auc"))
  }
}
