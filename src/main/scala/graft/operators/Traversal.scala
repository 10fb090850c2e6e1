package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document-tree traversal (SURVEY §2.1 O2): the reference's Documents
  * are trees walked by `traverse_flat(traversal_paths)` with root /
  * chunk / match levels (`/root/reference/executor.py:86-88`, default
  * `'r'`). Relationally the tree is a nested `array<struct>` column and
  * traversal is identity (`'r'`) or an `inline` explode (`'c'`).
  */
object Traversal {

  /** Chunk a flat document table into the nested form: each doc gains
    * `chunks: array<struct<chunk_pos:int, chunk_text:string>>` (two
    * halves — a deterministic stand-in for sentence/passage chunking). */
  def withChunks(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val half = expr(s"length($textCol) div 2")
    docs.withColumn("chunks", array(
      struct(lit(0).as("chunk_pos"),
        col(textCol).substr(lit(1), half).as("chunk_text")),
      struct(lit(1).as("chunk_pos"),
        col(textCol).substr(half + 1, length(col(textCol))).as("chunk_text"))))
  }

  /** Nest a flat k-NN result ([[Knn.knnExact]] shape) into the matches
    * tree the reference's result Documents carry (`executor.py:117-124`):
    * one row per query with `matches: array<struct<rank, match_id,
    * score>>` in rank order (rank is the struct's leading field, so
    * `array_sort` orders by it). */
  def withMatches(flat: DataFrame, queryIdCol: String = "query_id"): DataFrame =
    flat.groupBy(col(queryIdCol))
      .agg(array_sort(collect_list(
        struct(col("rank"), col("match_id"), col("score")))).as("matches"))

  /** `traverse_flat`: 'r' operates on roots (identity — the path the
    * reference's endpoints take on input); 'c' flattens to one row per
    * chunk; 'm' to one row per match (`executor.py:86-88`). */
  def traverseFlat(docs: DataFrame, path: String, idCol: String = "doc_id"): DataFrame =
    path match {
      case "r" => docs
      case "c" => docs.select(col(idCol), inline(col("chunks")))
      case "m" => docs.select(col(idCol), inline(col("matches")))
      case other => throw new IllegalArgumentException(
        s"unsupported traversal path '$other' (reference supports r/c/m trees)")
    }
}
