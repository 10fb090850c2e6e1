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
    def s(syms: String*): String = "  " + syms.mkString("  ") + "  "
    val cases = Seq(
      (s("a", "a", "a", "a", "</w>"), s("aa", "aa", "</w>")), // even chain
      (s("a", "a", "a", "</w>"), s("aa", "a", "</w>")),       // odd: single stays
      // the single-space representation's failure case: run of six must
      // merge LEFT-ALIGNED to three pairs in ONE pass, not stall at
      // [aa, a, aa, a]
      (s("a", "a", "a", "a", "a", "a", "</w>"), s("aa", "aa", "aa", "</w>")),
      (s("x", "a", "a", "y", "</w>"), s("x", "aa", "y", "</w>")), // interior
      (s("b", "c", "</w>"), s("b", "c", "</w>"))                  // identity
    ).toDF("s", "want")
    val bad = cases.select(col("want"),
        Bpe.applyMerge(col("s"), "a", "a").as("got"))
      .filter(!(col("got") <=> col("want"))).collect()
    assert(bad.isEmpty, s"merge mismatches: ${bad.mkString("; ")}")
    // boundary-sharing alternation merges ALL pairs in one pass
    val chain = Seq(
      (s("a", "b", "a", "b", "a", "b", "</w>"), s("ab", "ab", "ab", "</w>")))
      .toDF("s", "want")
    val badChain = chain.select(col("want"),
        Bpe.applyMerge(col("s"), "a", "b").as("got"))
      .filter(!(col("got") <=> col("want"))).collect()
    assert(badChain.isEmpty, s"chain mismatches: ${badChain.mkString("; ")}")
  }

  test("applyMerge: randomized equivalence with the classic left-to-right scan") {
    import org.apache.spark.sql.functions._
    // naive reference: single left-to-right scan, skip after a merge —
    // Sennrich's algorithm verbatim
    def naive(syms: List[String], a: String, b: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toList
    }
    // tiny alphabet INCLUDING the literal "ab" symbol: maximizes chains,
    // overlaps, and boundary-confusion opportunities (an existing "ab"
    // must never match the ' a b ' pattern)
    val rnd = new scala.util.Random(42)
    val alpha = Vector("a", "b", "ab")
    val cases = (1 to 300).map { _ =>
      val syms = List.fill(1 + rnd.nextInt(12))(alpha(rnd.nextInt(3)))
      val a = alpha(rnd.nextInt(2))
      val b = alpha(rnd.nextInt(3))
      (syms, a, b)
    }
    cases.groupBy { case (_, a, b) => (a, b) }.foreach { case ((a, b), grp) =>
      val df = grp.map { case (syms, _, _) =>
        ("  " + syms.mkString("  ") + "  ",
          "  " + naive(syms, a, b).mkString("  ") + "  ")
      }.toDF("s", "want")
      val bad = df.select(col("s"), col("want"),
          Bpe.applyMerge(col("s"), a, b).as("got"))
        .filter(!(col("got") <=> col("want"))).collect()
      assert(bad.isEmpty,
        s"merge ($a,$b) diverges from the scan: ${bad.take(3).mkString("; ")}")
    }
  }

  test("learnMergesDelta: merge-for-merge identical to recount mode at t=64") {
    // the delta-maintenance contract: folding after-minus-before of
    // ONLY the touched words into the standing pair-count frame
    // reproduces the full recount exactly, so sixty-four rounds deep
    // (far past the fixture's planted structure, into long-tail
    // single-count ties where any drift would change an argmax) the
    // two modes must emit the SAME merge table — counts included
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") % 5 === 0)
    val recount = Bpe.learnMerges(docs, 64)
      .orderBy("t").as[(Int, String, String, Long)].collect().toSeq
    val delta = Bpe.learnMergesDelta(docs, 64)
      .orderBy("t").as[(Int, String, String, Long)].collect().toSeq
    assert(recount.size === 64, s"fixture slice ran dry at ${recount.size} merges")
    assert(delta === recount)
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
