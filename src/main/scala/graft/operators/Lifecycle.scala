package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch renditions of the reference's write/maintenance endpoints:
  * `/index` upsert (`/root/reference/executor.py:127-168`), `/update`
  * (`:170-211`), `/delete` (`:213-225`), `/status` (`:246-257`).
  *
  * The corpus is a Parquet table, not a mutable in-memory index; each
  * operation is a pure `DataFrame -> DataFrame` that the caller persists
  * (the reference's `/dump`, `executor.py:227-236`, becomes
  * `df.write.parquet`). Semantics preserved exactly (SURVEY §2.1):
  * upsert is last-writer-wins by id; update skips unknown ids; delete is
  * a tombstone so `/status` arithmetic (`indexed = active + deleted`)
  * still holds.
  */
object Lifecycle {

  /** Last-writer-wins upsert by `idCol`: rows from the highest `batchCol`
    * value survive. Both inputs must share a schema plus the batch column.
    * Mirrors `/index` where re-indexing an id overwrites vector + doc in
    * place (`executor.py:151-164`).
    *
    * Scale note: one shuffle on the id (the window). With a bucketed
    * corpus table this becomes shuffle-free on the corpus side; AQE
    * handles skewed ids.
    */
  def upsertById(corpus: DataFrame, updates: DataFrame,
                 idCol: String = "vec_id", batchCol: String = "batch"): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col(batchCol).desc)
    corpus.unionByName(updates)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Update-only: apply `updates` rows whose id exists in `corpus`; report
    * unknown ids as skipped instead of inserting them (`/update` warns and
    * skips, `executor.py:186-197`; we do NOT replicate its store-anyway
    * bug, SURVEY §2.1 "quirks").
    *
    * @return updates annotated with `action` = updated | skipped_unknown
    */
  def updateActions(corpus: DataFrame, updates: DataFrame,
                    idCol: String = "vec_id"): DataFrame = {
    val ids = corpus.select(idCol).distinct()
    val applied = updates.join(ids, Seq(idCol), "left_semi")
      .withColumn("action", lit("updated"))
    val skipped = updates.join(ids, Seq(idCol), "left_anti")
      .withColumn("action", lit("skipped_unknown"))
    applied.unionByName(skipped)
  }

  /** Apply update-only semantics: corpus rows overwritten by matching
    * update rows, unknown update ids dropped. */
  def updateExisting(corpus: DataFrame, updates: DataFrame,
                     idCol: String = "vec_id", batchCol: String = "batch"): DataFrame = {
    val applicable = updates.join(corpus.select(idCol).distinct(), Seq(idCol), "left_semi")
    upsertById(corpus, applicable, idCol, batchCol)
  }

  /** Tombstone delete: mark rather than remove, so status accounting can
    * distinguish indexed/active/deleted (`mark_deleted`,
    * `executor.py:223`; counters `:252-257`). Unknown ids are ignored via
    * the join, like the reference's set intersection (`:221`). */
  def softDelete(corpus: DataFrame, deleteIds: DataFrame,
                 idCol: String = "vec_id", deletedCol: String = "deleted"): DataFrame = {
    val marks = deleteIds.select(col(idCol)).distinct().withColumn("__del", lit(true))
    corpus.join(broadcast(marks), Seq(idCol), "left")
      .withColumn(deletedCol, coalesce(col("__del"), lit(false)))
      .drop("__del")
  }

  /** `/status` counters over a tombstoned corpus
    * (`executor.py:246-257`): indexed = every slot ever used (tombstones
    * included), active = live rows, deleted = indexed - active. */
  def status(corpus: DataFrame, deletedCol: String = "deleted"): DataFrame =
    corpus.agg(
      count(lit(1)).as("count_indexed"),
      count(when(!col(deletedCol), 1)).as("count_active"),
      count(when(col(deletedCol), 1)).as("count_deleted"))

  /** `/dump`: persist the corpus table (`executor.py:227-236` — index
    * binary + id map + memmap flush collapse to one Parquet write; the
    * "index" artifacts of the approximate path are Spark ML model saves). */
  def dump(corpus: DataFrame, path: String): Unit =
    corpus.write.mode("overwrite").parquet(path)

  /** Cold-start restore (`executor.py:51-57`). */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** `/clear` (`executor.py:238-244`): an empty corpus with the same
    * schema. */
  def clear(corpus: DataFrame): DataFrame = corpus.filter(lit(false))

  /** Dimension audit (the reference hard-errors on mismatch,
    * `executor.py:105-110`; at scale a per-width count is the useful
    * diagnostic form). */
  def dimCounts(corpus: DataFrame, vecCol: String = "embedding"): DataFrame =
    corpus.groupBy(size(col(vecCol)).as("dim")).agg(count(lit(1)).as("n_vectors"))

  /** Strict validation mode — reference semantics (`executor.py:105-110`
    * raises ValueError on a wrong-width vector): rows pass through
    * unchanged, but the first mismatched row fails the job. Pure codegen'd
    * column expression (raise_error inside a when), no driver-side scan. */
  def requireDim(corpus: DataFrame, dim: Int, vecCol: String = "embedding"): DataFrame =
    corpus.withColumn(vecCol,
      when(size(col(vecCol)) === dim, col(vecCol))
        .otherwise(raise_error(concat(
          lit(s"expected embeddings of dim $dim, got dim "),
          size(col(vecCol)).cast("string")))))
}
