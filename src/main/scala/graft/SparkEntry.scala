package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Knn
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator from SURVEY.md §2; entries in
  * [[oracleSql]] are the DuckDB-equivalent SQL the driver hash-compares
  * against on sf0.01. Scores are rounded *before* ranking and every ordering
  * carries an id tiebreak so both engines produce identical row sets.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's `/search` path end-to-end: k-NN + full-document
    * materialization (`/root/reference/executor.py:73-125`). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Knn.knnWithDocs(
      Tables.defaultQueries(spark, dir),
      Tables.embeddings(spark, dir),
      Tables.documents(spark, dir),
      k = 5)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- k-NN search family (SURVEY §2.1 O7-O10) ---
    "knn_cosine" -> ((s, dir) =>
      Knn.knnExact(Tables.defaultQueries(s, dir), Tables.embeddings(s, dir), k = 5, metric = "cosine")),
    "knn_l2" -> ((s, dir) =>
      Knn.knnExact(Tables.defaultQueries(s, dir), Tables.embeddings(s, dir), k = 5, metric = "euclidean")),
    "knn_ip" -> ((s, dir) =>
      Knn.knnExact(Tables.defaultQueries(s, dir), Tables.embeddings(s, dir), k = 5, metric = "inner_product")),
    "knn_similarity" -> ((s, dir) =>
      Knn.knnExact(Tables.defaultQueries(s, dir), Tables.embeddings(s, dir), k = 5,
        metric = "cosine", asDistance = false)),
    "knn_full_docs" -> ((s, dir) =>
      Knn.knnWithDocs(Tables.defaultQueries(s, dir), Tables.embeddings(s, dir),
        Tables.documents(s, dir), k = 5).select(
          col("query_id"), col("match_id"), col("score"), col("rank"),
          col("lang"), col("n_chars"))),
    "knn_filtered" -> ((s, dir) =>
      Knn.knnExact(Tables.defaultQueries(s, dir),
        Tables.embeddings(s, dir).filter(col("label") === 3), k = 5, metric = "cosine")),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "knn_cosine" -> knnOracle(
      score = "round(1.0 - list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 4)",
      asc = true),
    // squared L2, matching hnswlib's l2 space (reference executor.py:261-262)
    "knn_l2" -> knnOracle(
      score = "round(list_dot_product(qv, qv) + list_dot_product(cv, cv) - 2 * list_dot_product(qv, cv), 4)",
      asc = true),
    "knn_ip" -> knnOracle(
      score = "round(1.0 - list_dot_product(qv, cv), 4)",
      asc = true),
    "knn_similarity" -> knnOracle(
      score = "round(list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 4)",
      asc = false),
    "knn_full_docs" ->
      s"""WITH r AS (${knnOracle(
            score = "round(1.0 - list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 4)",
            asc = true)})
         SELECT r.query_id, r.match_id, r.score, r.rank, d.lang, d.n_chars
         FROM r JOIN documents d ON r.match_id = d.doc_id""",
    "knn_filtered" -> knnOracle(
      score = "round(1.0 - list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 4)",
      asc = true,
      corpusWhere = "WHERE label = 3"),
  )

  /** Shared DuckDB k-NN oracle template: round-then-rank with id tiebreak,
    * mirroring [[graft.operators.Knn.knnExact]] exactly. */
  private def knnOracle(score: String, asc: Boolean, corpusWhere: String = ""): String = {
    val dir = if (asc) "ASC" else "DESC"
    s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id < 10),
            c AS (SELECT vec_id AS match_id, CAST(embedding AS DOUBLE[]) AS cv
                  FROM embeddings $corpusWhere),
            s AS (SELECT query_id, match_id, $score AS score FROM q CROSS JOIN c),
            r AS (SELECT query_id, match_id, score,
                         row_number() OVER (PARTITION BY query_id ORDER BY score $dir, match_id ASC) AS "rank"
                  FROM s)
        SELECT query_id, match_id, score, "rank" AS rank FROM r WHERE "rank" <= 5"""
  }
}
