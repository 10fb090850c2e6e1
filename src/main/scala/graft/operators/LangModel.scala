package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus n-gram language model — the KenLM-shaped quality signal LLM
  * pipelines score candidate documents with (low-fluency docs are
  * gibberish, OCR noise, or boilerplate). Training is two hash
  * aggregations over the corpus (bigram counts, context counts); scoring
  * joins each doc's bigrams against the model and aggregates per doc.
  *
  * Scale shape: the model is vocabulary-bounded, not corpus-bounded —
  * broadcastable for real vocabularies (1M bigrams ≈ tens of MB); past
  * that it is a plain shuffle join on the bigram key. Training shuffles
  * once per aggregation with map-side partials.
  *
  * Determinism: scores avoid libm transcendentals — the per-doc
  * aggregate is the MEAN and MIN conditional probability (pure rational
  * arithmetic; the mean accumulates in decimal so partial-aggregation
  * order cannot change the sum), not a log-space perplexity. Monotone
  * equivalent for ranking docs by fluency.
  */
object LangModel {

  /** Non-distinct consecutive word bigrams as (w1, w2) structs —
    * multiplicity matters for counting (unlike
    * [[Dedup.wordShingles]]'s distinct sets). Built by zipping the token
    * array against itself shifted by one (`arrays_zip` of two `slice`s):
    * every function here is codegen'd — the higher-order
    * `transform(sequence(...))` formulation of the same thing runs
    * interpreted and profiled ~15x slower corpus-wide. */
  def bigramPairs(text: Column): Column = {
    val ts = Dedup.tokens(text)
    val len = greatest(size(ts) - 1, lit(0))
    arrays_zip(slice(ts, lit(1), len).as("w1"), slice(ts, lit(2), len).as("w2"))
  }

  /** Train: (w1, w2, c2, c1) — bigram count and context (first-word)
    * count, so `c2/c1` is the conditional probability p(w2 | w1). The
    * context count is derived from the (vocabulary-sized) bigram table —
    * `c1 = Σ_w2 c2` by construction — so the corpus is aggregated once,
    * not twice. */
  def train(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val bg = docs.select(explode(bigramPairs(col(textCol))).as("b"))
      .select(col("b.w1"), col("b.w2"))
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    // context count as a SUM WINDOW over the reduced bigram table (the
    // [[Retrieval.bm25]] df pattern): the previous groupBy("w1") + join
    // re-executed the corpus explode+aggregate subtree a second time
    // per call — same c1 = Σ_w2 c2 values, one corpus pass
    val cw = org.apache.spark.sql.expressions.Window.partitionBy(col("w1"))
    c2.withColumn("c1", sum(col("c2")).over(cw))
  }

  /** Score docs against a trained model: per doc, the count of bigrams
    * plus the mean and minimum conditional probability. Docs scored
    * against the model trained on the same corpus have no unseen
    * bigrams; scoring a different corpus drops unseen bigrams from the
    * aggregate (inner join) — add-one smoothing is a caller-side concern.
    * @return (idCol, n_bigrams, avg_p, min_p) */
  def fluency(docs: DataFrame, model: DataFrame,
              idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val bg = docs.select(col(idCol), explode(bigramPairs(col(textCol))).as("b"))
      .select(col(idCol), col("b.w1"), col("b.w2"))
    bg.join(model, Seq("w1", "w2"))
      .withColumn("p", col("c2").cast("double") / col("c1"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        // decimal accumulation: order-insensitive under partial aggs
        round(sum(col("p").cast("decimal(18,12)")).cast("double") /
          count(lit(1)), 4).as("avg_p"),
        round(min(col("p")), 4).as("min_p"))
  }

  /** Train-on-corpus + score-the-corpus in one call (the usual QA pass). */
  def selfFluency(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    fluency(docs, train(docs, textCol), idCol, textCol)

  /** CCNet-style per-language quality terciles (Wenzek et al. 2019,
    * arXiv:1911.00359 §4.3: bucket each language's docs into
    * head/middle/tail by LM score; pipelines then keep head+middle or
    * reweight). `avg_p` is the monotone-equivalent fluency stand-in for
    * perplexity (high avg_p = head); ntile over (rounded score desc, id
    * asc) is a deterministic total order, so bucket boundaries are
    * engine-identical. One window shuffle on lang after the LM pass.
    *
    * EVERY doc gets a bucket — CCNet buckets the corpus, not the subset
    * with LM evidence: fluency is LEFT-joined onto the full id universe,
    * and a doc with no bigrams (single-token) carries `avg_p = null`,
    * ordering below every scored doc (explicit NULLS LAST — engines
    * disagree on default null order under DESC) and landing
    * deterministically in the tail tercile. The earlier inner-join form
    * silently DROPPED such docs — the same bug class as DSIR's
    * zero-token exclusion, fixed the same way.
    *
    * @return (idCol, langCol, avg_p, bucket) — avg_p null for
    *         no-evidence docs */
  def ccnetBuckets(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", langCol: String = "lang"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(langCol))
      .orderBy(col("avg_p").desc_nulls_last, col(idCol).asc)
    docs.select(col(idCol), col(langCol))
      .join(selfFluency(docs, idCol, textCol).select(col(idCol), col("avg_p")),
        Seq(idCol), "left")
      .withColumn("__t", ntile(3).over(w))
      .withColumn("bucket",
        when(col("__t") === 1, "head")
          .when(col("__t") === 2, "middle").otherwise("tail"))
      .select(col(idCol), col(langCol), col("avg_p"), col("bucket"))
  }
}
