package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumnBridge
import graft.functions.TextExprs
import graft.operators.Dedup

class TextExprsSpec extends SparkSuite {
  import spark.implicits._

  private def shingles(toks: Seq[String], n: Int, trailing: Boolean): Seq[Long] =
    Seq(1).toDF("x").select(GraftColumnBridge.column(
        TextExprs.ShingleHashes(
          GraftColumnBridge.expression(typedLit(toks)), n, trailing)).as("h"))
      .head().getSeq[Long](0)

  private def xx(parts: String*): Long =
    Seq(1).toDF("x").select(xxhash64(parts.map(lit): _*)).head().getLong(0)

  test("shingle hashes equal Spark's multi-arg xxhash64 over the same strings") {
    assert(shingles(Seq("a", "b", "c", "d"), 3, trailing = false)
      === Seq(xx("a", "b", "c"), xx("b", "c", "d")))
  }

  test("trailing mode falls back to the position's own token") {
    assert(shingles(Seq("x", "y"), 3, trailing = true)
      === Seq(xx("x", "y", "x"), xx("y", "y", "y")))
    assert(shingles(Seq.empty, 3, trailing = true) === Seq.empty)
    assert(shingles(Seq("only"), 2, trailing = false) === Seq.empty)
  }

  test("codegen and interpreted paths agree on fixture docs") {
    val docs = sparkDocs
    val viaPlan = Dedup.shingleHashes(docs, "doc_id", "text", 3)
      .groupBy("doc_id").agg(sort_array(collect_list("__h")).as("hs"))
    val interp = docs.select(col("doc_id"),
        TextExprsSpecHelper.interpreted(col("text"), 3).as("h"))
      .select(col("doc_id"), explode(col("h")).as("__h"))
      .groupBy("doc_id").agg(sort_array(collect_list("__h")).as("hs"))
    assert(viaPlan.exceptAll(interp).isEmpty && interp.exceptAll(viaPlan).isEmpty)
  }

  private def sparkDocs =
    spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text").limit(100)
}

object TextExprsSpecHelper {
  import org.apache.spark.sql.Column
  /** Force the interpreted eval path by wrapping in a non-codegen context:
    * evaluate ShingleHashes via an untyped transform over a 1-element
    * array (higher-order functions evaluate children interpreted). */
  def interpreted(text: Column, n: Int): Column = {
    val toks = Dedup.tokens(text)
    transform(array(toks), t => GraftColumnBridge.column(
      TextExprs.ShingleHashes(GraftColumnBridge.expression(t), n, trailing = true)))
      .getItem(0)
  }
}
