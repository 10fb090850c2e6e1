package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Knn, Lifecycle}
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

    // --- lifecycle: upsert / update / delete / status / validation (O11-O17) ---
    "lifecycle_upsert" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val b1 = emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("emb"), lit(1).as("batch"))
      val b2 = emb.filter(col("vec_id") % 10 === 0).select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double") * 2.0).as("emb"), lit(2).as("batch"))
      Lifecycle.upsertById(b1, b2)
        .select(col("vec_id"), col("batch"),
          round(aggregate(col("emb"), lit(0.0), (a, v) => a + v), 4).as("vec_sum"))
    }),
    "lifecycle_update" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val updates = emb.filter(col("vec_id") % 7 === 0).select(
        (col("vec_id") * 2).as("vec_id"),
        transform(col("embedding"), x => x.cast("double") + 1.0).as("emb"))
      Lifecycle.updateActions(emb, updates)
        .select(col("vec_id"), col("action"),
          round(aggregate(col("emb"), lit(0.0), (a, v) => a + v), 4).as("vec_sum"))
    }),
    "lifecycle_delete_status" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val del = emb.filter(col("vec_id") % 5 === 0).select("vec_id")
      Lifecycle.status(Lifecycle.softDelete(emb, del))
    }),
    "validate_dims" -> ((s, dir) =>
      Lifecycle.dimCounts(Tables.embeddings(s, dir))
        .select(col("dim").cast("long").as("dim"), col("n_vectors"))),

    // --- dedup suite (SURVEY §2.9 E1/E2; planted duplicates — fixtures
    //     have none naturally: 500/500 distinct texts, max cosine 0.48) ---
    "dedup_exact" -> ((s, dir) => Dedup.exactGroups(docsWithExactDupes(s, dir))),
    "dedup_minhash" -> ((s, dir) =>
      Dedup.minhashPairs(docsWithNearDupes(s, dir), threshold = 0.5)),
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(docsWithNearDupes(s, dir), maxHamming = 6)),
    "dedup_ngram" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(docsWithNearDupes(s, dir),
        blockExpr = md5(substring(col("text"), 1, 40).cast("binary")), threshold = 0.5)),
    "dedup_embedding" -> ((s, dir) =>
      Dedup.cosinePairsBlocked(embWithDupes(s, dir),
        Seq(col("label"), pmod(col("vec_id"), lit(50))), threshold = 0.99)),
    "dedup_embedding_lsh" -> ((s, dir) =>
      Dedup.cosinePairsLsh(embWithDupes(s, dir), dim = 64, threshold = 0.99)),
  )

  /** documents plus exact copies of every 10th doc at id+10M (offset clear
    * of real ids at any sf). */
  private def docsWithExactDupes(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id", "text", "lang", "source", "n_chars")
    d.unionByName(d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars")))
  }

  /** documents plus near-copies (three words appended) of every 10th doc. */
  private def docsWithNearDupes(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id", "text", "lang", "source", "n_chars")
    d.unionByName(d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat(col("text"), lit(" extra tail words")).as("text"),
        col("lang"), col("source"), col("n_chars")))
  }

  /** embeddings (as double vectors) plus direction-preserving scaled
    * copies of every 25th vector — cosine exactly 1 with its source. */
  private def embWithDupes(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"), col("label"))
    e.unionByName(e.filter(col("vec_id") % 25 === 0)
      .select((col("vec_id") + 10000000L).as("vec_id"),
        transform(col("embedding"), x => x * 1.5).as("embedding"), col("label")))
  }

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
    "lifecycle_upsert" ->
      """WITH b1 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb, 1 AS batch FROM embeddings),
              b2 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE) * 2.0) AS emb, 2 AS batch FROM embeddings WHERE vec_id % 10 = 0),
              u AS (SELECT * FROM b1 UNION ALL SELECT * FROM b2),
              r AS (SELECT vec_id, batch, emb, row_number() OVER (PARTITION BY vec_id ORDER BY batch DESC) AS rn FROM u)
         SELECT vec_id, batch, round(list_sum(emb), 4) AS vec_sum FROM r WHERE rn = 1""",
    "lifecycle_update" ->
      """WITH upd AS (SELECT vec_id * 2 AS vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE) + 1.0) AS emb
                      FROM embeddings WHERE vec_id % 7 = 0),
              ids AS (SELECT DISTINCT vec_id FROM embeddings)
         SELECT u.vec_id,
                CASE WHEN i.vec_id IS NULL THEN 'skipped_unknown' ELSE 'updated' END AS action,
                round(list_sum(u.emb), 4) AS vec_sum
         FROM upd u LEFT JOIN ids i ON u.vec_id = i.vec_id""",
    "lifecycle_delete_status" ->
      """SELECT count(*) AS count_indexed,
                count(CASE WHEN vec_id % 5 <> 0 THEN 1 END) AS count_active,
                count(CASE WHEN vec_id % 5 = 0 THEN 1 END) AS count_deleted
         FROM embeddings""",
    "validate_dims" ->
      "SELECT len(embedding) AS dim, count(*) AS n_vectors FROM embeddings GROUP BY 1",
    // dedup_minhash / dedup_simhash / dedup_embedding_lsh: signature-based
    // (xxhash64 not in DuckDB) -> rows-only check + ScalaTest recall specs
    "dedup_exact" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 10000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0)
         SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
         FROM corpus GROUP BY 1""",
    "dedup_ngram" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 10000000 AS doc_id, text || ' extra tail words' AS text
           FROM documents WHERE doc_id % 10 = 0),
         g AS (SELECT doc_id, md5(substr(text, 1, 40)) AS blk,
                      CASE WHEN length(text) >= 3
                           THEN list_distinct(list_transform(range(length(text) - 2),
                                  i -> substr(text, CAST(i + 1 AS INT), 3)))
                           ELSE [text] END AS s
               FROM corpus),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                      round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                            / CAST(len(list_distinct(a.s || b.s)) AS DOUBLE), 4) AS jaccard
               FROM g a JOIN g b ON a.blk = b.blk AND a.doc_id < b.doc_id)
         SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.5""",
    "dedup_embedding" ->
      """WITH base AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb, label
                       FROM embeddings),
         corpus AS (SELECT * FROM base
                    UNION ALL
                    SELECT vec_id + 10000000, list_transform(emb, x -> x * 1.5), label
                    FROM base WHERE vec_id % 25 = 0),
         p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                      round(list_dot_product(a.emb, b.emb)
                            / (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))), 4) AS cosine
               FROM corpus a JOIN corpus b
                 ON a.label = b.label AND a.vec_id % 50 = b.vec_id % 50 AND a.vec_id < b.vec_id)
         SELECT id_a, id_b, cosine FROM p WHERE cosine >= 0.99""",
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
