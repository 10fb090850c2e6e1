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

  /** `traverse_flat`: 'r' operates on roots (identity — the only path the
    * reference's endpoints ever take); 'c' flattens to one row per chunk. */
  def traverseFlat(docs: DataFrame, path: String, idCol: String = "doc_id"): DataFrame =
    path match {
      case "r" => docs
      case "c" => docs.select(col(idCol), inline(col("chunks")))
      case other => throw new IllegalArgumentException(
        s"unsupported traversal path '$other' (reference supports r/c/m trees)")
    }
}
