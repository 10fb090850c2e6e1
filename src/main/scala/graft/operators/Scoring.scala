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
}
