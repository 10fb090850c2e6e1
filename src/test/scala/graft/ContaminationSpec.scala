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
}
