package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) vocabulary learning — the
  * tokenizer-TRAINING operator of an LLM data pipeline (Sennrich et al.
  * 2016's merge loop, re-expressed as T rounds of one declarative
  * aggregation each; the learn side of the BPE-ish token COUNTING that
  * [[TextOps.bpeTokenCount]] already serves).
  *
  * Shape per merge round (the 100 TB posture):
  *  - the corpus is touched ONCE — everything iterates over the
  *    distinct-WORD frame (word, freq, symbol string), which is
  *    vocabulary-sized, not corpus-sized;
  *  - pair counting is one explode + hash aggregation with map-side
  *    partials (freq-weighted integer sums — exact, order-free);
  *  - the argmax pair is a bounded 1-ROW collect (count desc, then
  *    lexicographic (a, b) — fully deterministic, the same tiebreak both
  *    engines can replay);
  *  - the merge applies as a narrow map over the vocab frame, and the
  *    frame is localCheckpoint-pinned per round (the repo's iterated-
  *    frame pattern) so T rounds never stack T plans.
  *
  * Symbol representation: a word's symbols are kept as a DOUBLE-SPACE-
  * joined string with double sentinel spaces (`"  l  o  w  </w>  "`),
  * the end-of-word marker `</w>` a symbol of its own. Applying merge
  * (a, b) is ONE literal `replace(s, " a  b ", " ab ")`: the pattern
  * carries one leading and one trailing space (half of each boundary),
  * so a match leaves the other half in place for the NEXT match to use
  * — global left-to-right replace-and-resume is then EXACTLY the
  * classic scan, including consecutive candidates that share a
  * boundary (`a b a b` merges both pairs in one pass) and same-symbol
  * runs (`a a a a a a` → `aa aa aa`, left-aligned, odd runs keep the
  * trailing single). A single-space representation cannot do this: its
  * match consumes the WHOLE shared boundary, stalls alternate
  * candidates, and converges to a different (non-BPE) fixpoint on odd
  * runs ≥ 6 — caught by the randomized scan-equivalence spec.
  * Boundary safety: symbols never contain spaces, and any symbol
  * abutting the pattern breaks the required space flanking (an
  * existing `ab` symbol can never match `" a  b "`). Both engines run
  * the SAME replace, so equality is by construction, not analysis.
  */
object Bpe {

  /** Words longer than this are excluded from vocabulary learning
    * (pathological unbroken runs — the same guard real tokenizer
    * trainers apply). */
  val MaxWordLen = 256

  /** One learned merge: round number, the pair, its weighted count. */
  final case class Merge(t: Int, a: String, b: String, cnt: Long)

  /** The distinct-word frame: (word, freq, s) with s the double-space
    * symbol string `"  c  h  a  r  s  </w>  "` (see object doc for why
    * the boundary is two spaces). ASCII/BMP contract: per-char
    * splitting uses a regex capture over code units, matching the
    * fixture corpus; byte-level BPE would split on bytes here. */
  def wordVocab(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(Dedup.tokens(col(textCol))).as("word"))
      .where(length(col("word")) <= MaxWordLen)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"),
        concat(lit("  "), regexp_replace(col("word"), "(.)", "$1  "),
          lit("</w>  ")).as("s"))

  /** Adjacent-pair counts over the current vocab, freq-weighted. */
  def pairCounts(vocab: DataFrame): DataFrame = {
    val l = filter(split(col("s"), " "), x => x =!= "")
    vocab.select(col("freq"), l.as("l"))
      .select(col("freq"),
        slice(col("l"), lit(1), size(col("l")) - 1).as("la"),
        slice(col("l"), lit(2), size(col("l")) - 1).as("lb"))
      .select(col("freq"), explode(arrays_zip(col("la"), col("lb"))).as("p"))
      .groupBy(col("p.la").as("a"), col("p.lb").as("b"))
      .agg(sum(col("freq")).as("cnt"))
  }

  /** Apply merge (a, b) → ab to a double-space symbol string: ONE
    * literal replace whose pattern takes half of each flanking
    * boundary, making global replace-and-resume exactly the classic
    * left-to-right scan (see object doc). */
  def applyMerge(s: Column, a: String, b: String): Column =
    replace(s, lit(s" $a  $b "), lit(s" $a$b "))

  /** Training core: the merge list AND the final vocab frame (already
    * checkpointed once per round, so its lineage is flat regardless of
    * `t`). Both public faces below are views of one training run —
    * [[segmentedVocab]] previously re-ran the full training loop (t
    * extra corpus passes) just to rebuild the frame the loop already
    * had. */
  private def learnCore(docs: DataFrame, t: Int,
                        textCol: String): (Seq[Merge], DataFrame) = {
    var vocab = wordVocab(docs, textCol).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var round = 1
    var exhausted = false
    while (round <= t && !exhausted) {
      val top = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1).collect()
      if (top.isEmpty) exhausted = true // tiny corpus ran dry (not the fixtures)
      else {
        val (a, b, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(round, a, b, cnt)
        vocab = vocab.withColumn("s", applyMerge(col("s"), a, b))
          .localCheckpoint(true)
        round += 1
      }
    }
    (merges.toSeq, vocab)
  }

  /** Learn `t` merges from the corpus. Returns the merge table
    * (t, sym_a, sym_b, pair_count) as a DataFrame built from the
    * driver-side merge list — the merges ARE driver state (like the
    * power-iteration iterate): one bounded 1-row collect per round.
    * Recount mode: each round re-aggregates the whole vocab frame —
    * fewest jobs per round, right for small `t` (the oracled driver
    * row runs t=6). For tokenizer-scale `t` (32–50k merges) use
    * [[learnMergesDelta]]. */
  def learnMerges(docs: DataFrame, t: Int,
                  textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    learnCore(docs, t, textCol)._1.toDF("t", "sym_a", "sym_b", "pair_count")
  }

  /** The pair-count adjustment one merge round causes, computed from
    * ONLY the words whose symbol string contains the merge pattern:
    * after-minus-before of their pair multisets, freq-weighted.
    * [[pairCounts]] is additive over word rows and untouched rows keep
    * their pairs bit-identical, so folding this delta into the standing
    * frame reproduces a full recount EXACTLY (integer sums — no
    * rounding to drift across thousands of rounds). */
  private def touchedPairDelta(vocab: DataFrame, a: String, b: String): DataFrame = {
    val touched = vocab.filter(col("s").contains(s" $a  $b "))
    pairCounts(touched.withColumn("s", applyMerge(col("s"), a, b)))
      .unionByName(pairCounts(touched)
        .select(col("a"), col("b"), (-col("cnt")).as("cnt")))
      .groupBy("a", "b").agg(sum(col("cnt")).as("cnt"))
  }

  /** Delta-maintained training: merge-for-merge IDENTICAL to
    * [[learnMerges]] (spec-pinned at t=64), but each round's
    * aggregation scans only the words TOUCHED by the just-applied merge
    * instead of the whole vocab frame. At tokenizer scale (t = 32–50k,
    * late rounds touching a vanishing fraction of the vocabulary) this
    * is the difference between t full-frame aggregations and t small
    * ones: the standing pair-count frame (bounded by distinct adjacent
    * symbol pairs) is checkpoint-maintained across rounds, counts that
    * reach zero are dropped, and the argmax stays the same bounded
    * 1-row collect with the same (cnt desc, a, b) tiebreak. */
  def learnMergesDelta(docs: DataFrame, t: Int,
                       textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = wordVocab(docs, textCol).localCheckpoint(true)
    var pc = pairCounts(vocab).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var round = 1
    var exhausted = false
    while (round <= t && !exhausted) {
      val top = pc.orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true // maintained frame ran dry
      else {
        val (a, b, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(round, a, b, cnt)
        pc = pc.unionByName(touchedPairDelta(vocab, a, b))
          .groupBy("a", "b").agg(sum(col("cnt")).as("cnt"))
          .filter(col("cnt") > 0L)
          .localCheckpoint(true)
        vocab = vocab.withColumn("s", applyMerge(col("s"), a, b))
          .localCheckpoint(true)
        round += 1
      }
    }
    merges.toSeq.toDF("t", "sym_a", "sym_b", "pair_count")
  }

  /** The vocab AFTER applying `t` learned merges — exposed for specs
    * (segment inspection) and downstream encoding. The training loop's
    * own final frame (one run, checkpoint-flat lineage), not a re-learn
    * plus `t` stacked replaces. */
  def segmentedVocab(docs: DataFrame, t: Int,
                     textCol: String = "text"): DataFrame =
    learnCore(docs, t, textCol)._2
}
