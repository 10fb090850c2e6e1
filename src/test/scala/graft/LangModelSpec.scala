package graft

import org.apache.spark.sql.functions._
import graft.operators.LangModel

class LangModelSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "text")

  test("trained model is a proper conditional distribution per context") {
    val model = LangModel.train(docs)
    // for every context w1: sum over w2 of p(w2|w1) == 1 exactly
    // (c1 is by construction the sum of its c2 counts)
    val bad = model.groupBy("w1")
      .agg(sum($"c2").as("sum_c2"), min($"c1").as("c1a"), max($"c1").as("c1b"))
      .filter($"sum_c2" =!= $"c1a" || $"c1a" =!= $"c1b")
    assert(bad.isEmpty, "context counts inconsistent with bigram counts")
  }

  test("self-fluency covers every multi-token doc with sane bounds") {
    val f = LangModel.selfFluency(docs).collect()
    val expected = docs
      .filter(size(filter(split(lower($"text"), "\\s+"), t => t =!= "")) >= 2)
      .count()
    assert(f.length === expected)
    f.foreach { r =>
      val (n, avg, mn) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(n >= 1)
      assert(mn > 0.0 && mn <= avg + 1e-9 && avg <= 1.0,
        s"doc ${r.getLong(0)}: min_p $mn avg_p $avg out of bounds")
    }
  }

  test("ccnetBuckets buckets EVERY doc; a single-token doc lands in the tail") {
    // a single-token doc has zero bigrams = no LM evidence; the
    // inner-join formulation silently dropped it (the DSIR zero-token
    // bug class) — the left-join form must bucket it, in the tail
    val corpus = Seq(
      (1L, "alpha beta alpha beta alpha", "en"),
      (2L, "alpha beta gamma delta", "en"),
      (3L, "gamma delta gamma delta gamma", "en"),
      (4L, "solo", "en"), // single token: no bigrams
      (5L, "alpha gamma beta delta", "en"),
      (6L, "beta alpha beta alpha", "en")
    ).toDF("doc_id", "text", "lang")
    val out = LangModel.ccnetBuckets(corpus).collect()
    assert(out.length === 6, "every doc must receive a bucket")
    val solo = out.find(_.getLong(0) == 4L).get
    assert(solo.isNullAt(2), "no-evidence doc carries avg_p null")
    assert(solo.getString(3) === "tail",
      s"no-evidence doc must order below every scored doc, got ${solo.getString(3)}")
    // terciles over 6 docs: exactly 2 per bucket, deterministic
    assert(out.groupBy(_.getString(3)).view.mapValues(_.length).toMap ===
      Map("head" -> 2, "middle" -> 2, "tail" -> 2))
  }

  test("a repeated deterministic phrase is more fluent than the corpus") {
    // doc made of one phrase repeated: every bigram it contains is highly
    // predictable IN ITS OWN training set when appended to the corpus
    val phrase = Seq.fill(30)("alpha beta").mkString(" ")
    val aug = docs.unionByName(Seq((900000L, phrase)).toDF("doc_id", "text"))
    val scores = LangModel.selfFluency(aug)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val corpusMax = scores.filter(_._1 < 900000L).values.max
    assert(scores(900000L) > corpusMax,
      s"planted fluent doc ${scores(900000L)} <= corpus max $corpusMax")
  }
}
