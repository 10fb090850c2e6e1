package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

class BpeSpec extends SparkSuite {
  import spark.implicits._

  test("learnMerges: hand-derived merge sequence on a closed corpus") {
    // corpus: to(x2) be(x2) or(x1) not(x1)
    // round 1 pair counts: (b,e)=2 (e,</w>)=2 (t,o)=2 (o,</w>)=2, rest 1
    //   -> argmax ties at 2, lexicographic: (b,e)
    // round 2: (be,</w>)=2 (t,o)=2 (o,</w>)=2 -> (be,</w>)
    // round 3: (t,o)=2 (o,</w>)=2 -> (o,</w>)
    // round 4: (t,o</w>)=2 -> (t,o</w>)
    val docs = Seq("to be or not to be").toDF("text")
    val got = Bpe.learnMerges(docs, 4)
      .orderBy("t").as[(Int, String, String, Long)].collect().toSeq
    assert(got === Seq(
      (1, "b", "e", 2L),
      (2, "be", "</w>", 2L),
      (3, "o", "</w>", 2L),
      (4, "t", "o</w>", 2L)))
  }

  test("applyMerge: left-to-right non-overlapping on same-symbol chains") {
    val cases = Seq(
      (" a a a a </w> ", " aa aa </w> "),  // even chain: pairs (1,2) (3,4)
      (" a a a </w> ", " aa a </w> "),     // odd chain: trailing single stays
      (" x a a y </w> ", " x aa y </w> "), // interior pair
      (" b c </w> ", " b c </w> ")         // no occurrence: identity
    ).toDF("s", "want")
    val bad = cases.select(col("want"),
        Bpe.applyMerge(col("s"), "a", "a").as("got"))
      .filter(!(col("got") <=> col("want"))).collect()
    assert(bad.isEmpty, s"merge mismatches: ${bad.mkString("; ")}")
    // boundary-sharing alternation resolves across passes: ababab -> 3x ab
    val chain = Seq((" a b a b a b </w> ", " ab ab ab </w> ")).toDF("s", "want")
    val badChain = chain.select(col("want"),
        Bpe.applyMerge(col("s"), "a", "b").as("got"))
      .filter(!(col("got") <=> col("want"))).collect()
    assert(badChain.isEmpty, s"chain mismatches: ${badChain.mkString("; ")}")
  }

  test("learnMerges: partition-invariant (integer counts, deterministic argmax)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Bpe.learnMerges(docs, 3).collect().toSeq.sortBy(_.getInt(0))
    val b = Bpe.learnMerges(docs.repartition(7), 3).collect().toSeq
      .sortBy(_.getInt(0))
    assert(a === b)
  }

  test("segmentedVocab: merged symbols re-concatenate to word + marker") {
    val docs = Seq("to be or not to be").toDF("text")
    val broken = Bpe.segmentedVocab(docs, 4)
      .select(col("word"), col("s"))
      .withColumn("rejoined",
        concat(array_join(filter(split(col("s"), " "), x => x =!= ""), ""),
          lit("")))
      .filter(col("rejoined") =!= concat(col("word"), lit("</w>")))
      .collect()
    assert(broken.isEmpty, s"lossy segmentation: ${broken.mkString("; ")}")
  }
}
