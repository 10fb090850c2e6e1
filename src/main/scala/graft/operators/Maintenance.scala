package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Table maintenance — the janitorial half of a 100 TB deployment that
  * the reference's single-process store never needs
  * (`/root/reference/executor.py:227-236` rewrites one memmap file), but
  * that decides whether a Spark table stays servable: every streaming
  * micro-batch, incremental append, and touched-shard rebuild in this
  * repo emits files sized by its OWN batch, and a year of small batches
  * turns a scan into millions of file-open round-trips (NameNode/S3
  * listing pressure, one task per tiny file, footer-read overhead
  * dominating data read).
  */
object Maintenance {

  /** @param filesBefore/filesAfter data files (parquet parts)
    * @param bytes total data bytes (unchanged by compaction modulo
    *              encoding drift; informational) */
  case class CompactStats(filesBefore: Long, filesAfter: Long, bytes: Long)

  private def dataFiles(fs: org.apache.hadoop.fs.FileSystem, dir: Path) =
    fs.listStatus(dir).filter(f => f.isFile && !f.getPath.getName.startsWith("_")
      && !f.getPath.getName.startsWith("."))

  /** Rewrite a (non-partitioned) parquet directory into
    * `ceil(totalBytes / targetBytes)` files of ~`targetBytes` each.
    *
    * Mechanics: list the directory (file count + byte total decide the
    * target file count — no data read), one `repartition(n)` rewrite
    * into a sibling staging dir, then a two-rename swap (old → trash,
    * staged → live, trash deleted). Readers racing the swap see either
    * the old or the new directory, never a mix; contents are row-
    * identical by construction, so the race is benign. Idempotent: a
    * second call sees `filesBefore == filesAfter` and still rewrites to
    * the same shape.
    *
    * Scale posture: the rewrite is one shuffle of the table — O(data) —
    * which is exactly the cost it amortizes away from every future scan;
    * run it when `filesBefore / filesAfter` justifies it (the stats
    * return lets a scheduler make that call). Partition-directory
    * tables compact per partition dir with the same primitive. */
  def compactSmallFiles(spark: SparkSession, path: String,
                        targetBytes: Long = 128L << 20): CompactStats = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = dataFiles(fs, p)
    val total = before.map(_.getLen).sum
    val n = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    val staging = new Path(path + "_compact_staging")
    val trash = new Path(path + "_compact_trash")
    spark.read.parquet(path).repartition(n)
      .write.mode("overwrite").parquet(staging.toString)
    if (fs.exists(trash)) fs.delete(trash, true)
    if (!fs.rename(p, trash))
      throw new java.io.IOException(s"compact: could not move $p aside")
    if (!fs.rename(staging, p)) {
      fs.rename(trash, p) // roll back — the table must stay servable
      throw new java.io.IOException(s"compact: could not promote $staging")
    }
    fs.delete(trash, true)
    CompactStats(before.length.toLong, dataFiles(fs, p).length.toLong, total)
  }
}
