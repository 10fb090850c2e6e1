package graft.sources

import org.apache.spark.sql.DataFrame

/** Line-oriented text ingest/egress — the JSONL / CSV half of the source
  * family ([[Tables]] is the Parquet half). The reference ingests
  * arbitrary user payloads over its RPC surface
  * (`/root/reference/executor.py:127-150`); a batch engine's equivalent
  * is reading the interchange formats corpora actually arrive in.
  *
  * Both functions are WRITE-then-READ round-trips on purpose: the
  * exported contract is "what this engine writes, it re-reads
  * byte-identically", which is the property that makes a format safe as
  * a pipeline boundary. Schema is always explicit on the read side —
  * schema inference is a second full pass over the data at 100 TB and
  * can silently widen/narrow types between runs.
  *
  * Scale shape:
  *   - JSONL is the scale format: newline-delimited, so the reader
  *     splits every file at arbitrary byte offsets and scans in
  *     parallel; escapes keep payload newlines out of the line
  *     structure. Prefer it for anything big.
  *   - CSV with `multiLine=true` (needed when payloads may embed
  *     newlines) is NOT splittable — each file becomes one task. The
  *     writer here keeps Spark's one-file-per-partition layout, so
  *     parallelism survives as files × tasks rather than splits, but a
  *     single huge CSV file would serialize; the scaladoc is the
  *     warning. With newline-free payloads pass `multiLine=false` and
  *     CSV splits like JSONL.
  */
object TextSources {

  /** Write `df` as JSONL (one JSON object per line, one file per
    * partition), then read it back with the writer's own schema. */
  def jsonlRoundTrip(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").json(path)
    df.sparkSession.read.schema(df.schema).json(path)
  }

  /** Write `df` as RFC-4180-style CSV (header, `"` quoting with doubled
    * embedded quotes) and read it back with the writer's schema.
    *
    * Two write defaults are overridden because they silently break the
    * round-trip: Spark trims leading/trailing whitespace from unquoted
    * values ON WRITE (`ignoreLeading/TrailingWhiteSpace` default true),
    * and its default escape char is `\` rather than the RFC's doubled
    * quote. */
  def csvRoundTrip(df: DataFrame, path: String,
                   multiLine: Boolean = true): DataFrame = {
    df.write.mode("overwrite")
      .option("header", "true")
      .option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)
    df.sparkSession.read.schema(df.schema)
      .option("header", "true")
      .option("escape", "\"")
      .option("multiLine", multiLine.toString)
      .csv(path)
  }
}
