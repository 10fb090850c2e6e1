package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data hygiene operator that
  * flags corpus documents sharing verbatim word n-grams with a held-out
  * evaluation set (the GPT-3 appendix-C / Dolma-style contamination
  * check). The reference engine has no analog (it only searches what it
  * indexed, `/root/reference/executor.py:73-125`); this is one of the
  * LLM-pipeline extensions the engine exists for.
  *
  * Scale shape: the eval set is benchmark data — thousands of docs, not
  * billions — so its distinct n-gram set is BROADCAST and the train side
  * never shuffles for the probe: the plan is scan → shingle projection
  * (codegen) → broadcast hash join → partial-aggregated count per doc.
  * The only exchange is the final per-doc aggregation of matches, whose
  * input is already reduced to contaminated (doc, n-gram) hits.
  */
object Contamination {

  /** Per-train-doc contamination report against `evalDocs`: documents
    * sharing at least one word `n`-gram with any eval doc, with the count
    * of distinct shared n-grams and the contaminated fraction of the
    * doc's own distinct n-grams.
    *
    * N-grams are matched as 64-bit shingle HASHES
    * ([[Dedup.shingleHashSet]] — the codegen'd image of
    * [[Dedup.wordShingles]], with the same whole-text fallback for docs
    * shorter than `n` tokens): overlap counts equal the string-set counts
    * up to negligible collisions, without interpreted string slicing in
    * the corpus-wide projection.
    *
    * @return (idCol, n_overlap, overlap_frac) — contaminated docs only
    */
  def report(train: DataFrame, evalDocs: DataFrame, n: Int = 8,
             idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val evalGrams = evalDocs
      .select(explode(Dedup.shingleHashSet(col(textCol), n)).as("g"))
      .distinct()
    val trainGrams = train
      .select(col(idCol), Dedup.shingleHashSet(col(textCol), n).as("gs"))
      .select(col(idCol), size(col("gs")).cast("long").as("__total"),
        explode(col("gs")).as("g"))
    trainGrams
      .join(broadcast(evalGrams), "g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"), min(col("__total")).as("__total"))
      .select(col(idCol), col("n_overlap"),
        round(col("n_overlap").cast("double") / col("__total"), 4)
          .as("overlap_frac"))
  }

  /** Decontaminate: drop every train doc whose contaminated n-gram
    * fraction reaches `maxOverlapFrac` (0.0 = drop on any overlap).
    *
    * The zero threshold gates on the exact `n_overlap` COUNT, not the
    * 4dp-rounded fraction: a doc with > 20k distinct grams and one hit
    * rounds to overlap_frac 0.0, and the rounded gate would let it
    * survive — breaking the "any overlap" contract (and the oracle,
    * which drops on any gram hit) precisely on the long documents that
    * matter at corpus scale. */
  def clean(train: DataFrame, evalDocs: DataFrame, n: Int = 8,
            maxOverlapFrac: Double = 0.0,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val gate =
      if (maxOverlapFrac == 0.0) col("n_overlap") >= 1
      else col("overlap_frac") > maxOverlapFrac
    val flagged = report(train, evalDocs, n, idCol, textCol)
      .filter(gate)
      .select(col(idCol))
    train.join(flagged, Seq(idCol), "left_anti")
  }
}
