package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain-targeted data selection via importance resampling (Xie et al.
  * 2023, "Data Selection for Language Models via Importance Resampling" —
  * DSIR, arXiv:2302.03169): score every document by the log-likelihood
  * ratio of its words under a target-domain unigram model vs the full
  * corpus model, then draw a fixed-size sample with the Gumbel top-k
  * trick (key = log w(x) + Gumbel noise; the top k keys are a weighted
  * sample without replacement — Vieira 2014).
  *
  * (Extension operator beyond the reference surface; the reference has no
  * selection machinery at all — its ingest is unconditional upsert,
  * `/root/reference/executor.py:151-161`.)
  *
  * Engine-portability choices (the whole pipeline is oracle-checkable):
  * word probabilities are exact integer ratios under add-half smoothing,
  * per-word log-ratios are rounded to 6dp before the decimal-exact
  * per-doc sum, and the Gumbel noise is derived from md5(doc_id) — no
  * engine RNG anywhere. Scale shape: the vocabulary model is one
  * word-keyed shuffle producing a vocab-bounded frame (feature-hash words
  * into fixed buckets first if the corpus vocabulary outgrows broadcast);
  * scoring is explode + broadcast join + one doc-keyed partial-agg
  * shuffle; selection is TakeOrderedAndProject — no global sort.
  */
object Dsir {

  /** (0,1) uniform derived from md5 of the id — identical in any engine
    * with md5 + hex arithmetic. */
  private def hashUniform(id: Column): Column =
    (conv(substring(md5(id.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long").cast("double") + lit(0.5)) / lit(4294967296.0)

  /** Standard Gumbel noise from the id hash, rounded for cross-engine
    * stability. */
  def gumbelNoise(id: Column): Column =
    round(-log(-log(hashUniform(id))), 6)

  /** Per-feature log importance ratios log p_tgt(f) - log p_src(f) under
    * add-half (Jeffreys) smoothing over the observed feature space.
    * `featureOf` maps a token to its feature key (the word itself, or a
    * hashed bucket). Output: (word, lr) — feature-space-bounded,
    * broadcastable. */
  def unigramLogRatios(docs: DataFrame, targetPred: Column,
                       textCol: String = "text",
                       featureOf: Column => Column = identity): DataFrame =
    // materialize the flag and the token array BEFORE the explode: a
    // single projection list [pred, explode(tokens(text))] gets the pred
    // pushed below the Generate and re-evaluated per exploded TOKEN —
    // 270k interpreted re-tokenizations at sf0.1 (3.2 s -> 0.3 s)
    ratiosFromTokens(
      docs.select(targetPred.as("__tgt"), Dedup.tokens(col(textCol)).as("__ts"))
        .select(col("__tgt"), explode(col("__ts")).as("__t")),
      featureOf)

  /** The add-half model over a pre-exploded (…, __tgt, __t) frame — the
    * ONE copy of the formula; [[unigramLogRatios]] and the selection
    * paths both delegate here so the oracled arithmetic cannot
    * desynchronize across call sites. */
  private def ratiosFromTokens(tok: DataFrame,
                               featureOf: Column => Column): DataFrame = {
    val tokW = tok.select(col("__tgt"), featureOf(col("__t")).as("__w"))
    val vc = tokW.groupBy(col("__w")).agg(
      count(lit(1)).as("__cs"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("__ct"))
    val tot = vc.agg(count(lit(1)).as("__v"), sum(col("__cs")).as("__ns"),
      sum(col("__ct")).as("__nt"))
    vc.crossJoin(broadcast(tot))
      .select(col("__w").as("word"),
        round(log((col("__ct") + lit(0.5)) / (col("__nt") + lit(0.5) * col("__v"))) -
              log((col("__cs") + lit(0.5)) / (col("__ns") + lit(0.5) * col("__v"))),
          6).as("lr"))
  }

  /** Gumbel top-k selection of documents by unigram importance weight.
    * Output: (idCol, log_weight, key), the k selected docs. */
  def select(docs: DataFrame, targetPred: Column, k: Int,
             idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    selectBy(docs, targetPred, k, idCol, textCol, identity)

  /** The 100 TB form: identical pipeline over feature-HASHED tokens
    * (bucket = pmod(xxhash64(word), numBuckets)), so the ratio frame is
    * bounded by numBuckets no matter how large the corpus vocabulary
    * grows — always broadcastable. The price is hash collisions merging
    * word statistics (the published DSIR operates on exactly this hashed
    * feature space); `dsir_hashed_agreement` pins how close the two
    * selections stay on fixtures. */
  def selectHashed(docs: DataFrame, targetPred: Column, k: Int,
                   numBuckets: Int = 1 << 16,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    selectBy(docs, targetPred, k, idCol, textCol,
      t => pmod(xxhash64(t), lit(numBuckets.toLong)).cast("string"))

  private def selectBy(docs: DataFrame, targetPred: Column, k: Int,
                       idCol: String, textCol: String,
                       featureOf: Column => Column): DataFrame =
    // pinned per call, the [[selectBothPaths]] pattern: [[selectByTok]]
    // references the exploded-token frame twice (ratio model + doc
    // scoring), so the unpinned form re-ran the corpus tokenize+explode
    // per reference
    selectByTok(tokenBase(docs, targetPred, idCol, textCol).localCheckpoint(true),
      docs.select(col(idCol)), k, idCol, featureOf)

  /** (id, __tgt, __t) exploded-token frame — pred and token array
    * materialized BEFORE the explode (see [[unigramLogRatios]]'s
    * pushdown note). */
  private def tokenBase(docs: DataFrame, targetPred: Column,
                        idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), targetPred.as("__tgt"), Dedup.tokens(col(textCol)).as("__ts"))
      .select(col(idCol), col("__tgt"), explode(col("__ts")).as("__t"))

  /** Both selection paths over ONE corpus tokenization — the agreement
    * gate's shape. The gate's compared quantity is the two selections'
    * overlap, so exploding the corpus once per side (×2 again inside
    * each side for model + scoring) bought nothing; `featureOf` applies
    * to the same exploded tokens either way, so per-path arithmetic —
    * and the oracle hash of the exact path — is unchanged.
    * Returns (exact-word selection, feature-hashed selection). */
  def selectBothPaths(docs: DataFrame, targetPred: Column, k: Int,
                      numBuckets: Int = 1 << 16,
                      idCol: String = "doc_id",
                      textCol: String = "text"): (DataFrame, DataFrame) = {
    val tokBase = tokenBase(docs, targetPred, idCol, textCol).localCheckpoint(true)
    val ids = docs.select(col(idCol)).localCheckpoint(true)
    (selectByTok(tokBase, ids, k, idCol, identity),
     selectByTok(tokBase, ids, k, idCol,
       t => pmod(xxhash64(t), lit(numBuckets.toLong)).cast("string")))
  }

  private def selectByTok(tokBase: DataFrame, ids: DataFrame, k: Int,
                          idCol: String, featureOf: Column => Column): DataFrame = {
    val ratios = ratiosFromTokens(tokBase, featureOf)
    val tok = tokBase.select(col(idCol), featureOf(col("__t")).as("__w"))
    val scored = tok.join(broadcast(ratios), tok("__w") === ratios("word"))
      .groupBy(col(idCol))
      // decimal sum: order-independent, exact, engine-identical
      .agg(sum(col("lr").cast("decimal(18,12)")).as("__lw"))
    // a doc with ZERO tokens has no rows in `tok` and would silently
    // vanish from the sample; its log-weight is 0 (empty product), so it
    // must still compete via its Gumbel noise — left-join the scores
    // back onto the full id universe
    val all = ids
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__lw"), lit(0).cast("decimal(18,12)")).as("__lw"))
    all
      // round the exact DECIMAL, not a double cast: sums of 6dp terms
      // land exactly on a 4dp half-boundary for ~1% of docs, where
      // double rounding is engine-divergent — so the key sum is decimal
      // arithmetic end-to-end as well
      .select(col(idCol), round(col("__lw"), 4).cast("double").as("log_weight"),
        round(col("__lw") + gumbelNoise(col(idCol)).cast("decimal(18,12)"), 4)
          .cast("double").as("key"))
      .orderBy(col("key").desc, col(idCol).asc)
      .limit(k)
  }
}
