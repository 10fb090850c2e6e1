package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, EventOps, TextOps}
import graft.sources.Tables

class ChunkingSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "text")

  test("chunking covers every token with the declared overlap") {
    val chunkSize = 32
    val stride = 24
    val chunks = TextOps.chunkByTokens(docs, chunkSize, stride).collect()
      .groupBy(_.getLong(0))
    val tokens = docs.select($"doc_id", Dedup.tokens($"text").as("ts")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    tokens.foreach { case (id, ts) =>
      val cs = chunks(id).sortBy(_.getLong(1))
      val expectedN =
        if (ts.length <= chunkSize) 1
        else (ts.length - chunkSize + stride - 1) / stride + 1
      assert(cs.length === expectedN, s"doc $id chunk count")
      // stitching chunk strides back together reproduces the token stream
      val stitched = cs.zipWithIndex.flatMap { case (r, i) =>
        val words = r.getString(2).split(" ").toSeq
        if (i == cs.length - 1) words.drop(if (i == 0) 0 else chunkSize - stride)
        else words.take(stride)
      }
      // non-final chunks contribute their stride; the final chunk everything
      val rebuilt = cs.dropRight(1).flatMap(_.getString(2).split(" ").take(stride)) ++
        cs.last.getString(2).split(" ")
      assert(rebuilt.length >= ts.length && rebuilt.endsWith(ts.takeRight(1)),
        s"doc $id coverage")
      assert(cs.last.getString(2).split(" ").toSeq ==
        ts.takeRight(cs.last.getLong(3).toInt), s"doc $id final chunk")
      assert(stitched.nonEmpty)
    }
  }

  test("funnel counts are monotone and stage 1 is exact") {
    val f = EventOps.funnel(Tables.events(spark, sfDir),
      Seq("view", "click", "purchase")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(f.keySet === Set("1_view", "2_click", "3_purchase"))
    assert(f("1_view") >= f("2_click") && f("2_click") >= f("3_purchase"))
    val viewUsers = Tables.events(spark, sfDir)
      .filter($"event_type" === "view").select("user_id").distinct().count()
    assert(f("1_view") === viewUsers)
    assert(f("3_purchase") > 0, "fixture should contain full conversions")
  }

  test("repeatedNgramReport finds exactly the grams shared across documents") {
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9" // 9 shared words -> 2 shared 8-grams
    val corpus = Seq(
      (1L, s"alpha beta $shared"),
      (2L, s"totally different start $shared"),
      (3L, "nothing in common with anything else at all whatsoever")
    ).toDF("doc_id", "text")
    val rep = TextOps.repeatedNgramReport(corpus, n = 8, minDocs = 2)
      .collect().map(r => r.getAs[String]("gram") -> r.getAs[Long]("n_docs")).toMap
    assert(rep === Map(
      "s1 s2 s3 s4 s5 s6 s7 s8" -> 2L,
      "s2 s3 s4 s5 s6 s7 s8 s9" -> 2L))
    // a corpus of unique docs reports nothing
    assert(TextOps.repeatedNgramReport(corpus.filter($"doc_id" =!= 2L),
      n = 8, minDocs = 2).count() === 0L)
  }
}
