package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table loaders (Parquet per the driver contract; the reference's
  * stores were an hnswlib binary + JSON id map + DocumentArrayMemmap,
  * `/root/reference/executor.py:227-236` — our persistent form is Parquet).
  */
object Tables {
  /** Per-session memo of fixture-table ANALYZED PLANS. `spark.read
    * .parquet(path)` pays a file listing + a footer schema inference on
    * EVERY call; the fixture files are immutable for the life of a run,
    * so the ~250-query registry re-paying that per query per sweep is
    * pure fixed overhead (the bench runs 2-4 sweeps → thousands of
    * redundant listings). A DataFrame is an immutable plan bound to its
    * session, so caching one per (session, path) is sound as long as the
    * underlying file never changes — true for the driver fixtures, NOT
    * for writable tables, which is why only the fixture loaders below go
    * through this memo and dynamic paths (versioned tables, temp dirs)
    * never do. Weak session keys: a stopped/discarded session (the test
    * suite creates many) must not pin its plans. */
  private val planMemo =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = planMemo.synchronized {
      var m = planMemo.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        planMemo.put(spark, m)
      }
      m
    }
    perSession.computeIfAbsent(s"$dir/$name.parquet",
      path => spark.read.parquet(path))
  }

  /** The r9→r10 fixture regeneration changed a physical column type and
    * silently broke 26 queries — so the loaders conform each column the
    * operators have type assumptions about back to the type the code was
    * built against. Every cast below is a no-op against the current
    * fixtures (the `conform` helper emits nothing when types already
    * match), and only fires on future drift. */
  def embeddings(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val df = conform(table(spark, dir, "embeddings"), Map("vec_id" -> LongType))
    df.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => df
      case ArrayType(other, _) =>
        // visible, not silent: a fixture that genuinely carries e.g.
        // array<double> would lose precision under this conforming
        // narrow — the drift should be loud enough to notice
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"embeddings.embedding arrived as array<${other.simpleString}>; " +
            "conforming (narrowing) to array<float> — regenerate or widen the " +
            "loaders if the wider type is intentional")
        df.withColumn("embedding", col("embedding").cast("array<float>"))
      case _ => df
    }
  }

  def documents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    conform(table(spark, dir, "documents"),
      Map("doc_id" -> LongType, "n_chars" -> LongType))
  }

  /** Cast the named columns to the expected type IF they drifted; columns
    * already matching (or absent) pass through untouched — no extra plan
    * node, so pushdown/pruning are unaffected on the happy path. */
  private def conform(df: DataFrame,
                      expected: Map[String, org.apache.spark.sql.types.DataType]): DataFrame =
    expected.foldLeft(df) { case (d, (name, want)) =>
      d.schema.fields.find(_.name == name) match {
        case Some(f) if f.dataType != want => d.withColumn(name, col(name).cast(want))
        case _ => d
      }
    }

  /** events.parquet's `ts` physical type has drifted across fixture
    * generations (TIMESTAMP(NANOS) → timestamp[us]), so adapt to whatever
    * the file actually carries instead of hard-coding one branch:
    *   - LongType (nanos surfaced via the legacy flag, which is harmless
    *     when the file is already µs): floor-convert to a µs timestamp in
    *     exact integer arithmetic — DuckDB's native ns read floors the same;
    *   - TIMESTAMP_NTZ (µs, no zone): reinterpret as session-zone TIMESTAMP.
    *     Sessions here pin UTC, so the wall-clock fields are unchanged and
    *     epoch arithmetic matches DuckDB's naive-timestamp read;
    *   - TIMESTAMP: already what downstream expects. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    adaptTs(table(spark, dir, "events"))
  }

  /** Normalize a drifting `ts` column to session-zone TIMESTAMP regardless
    * of the physical type the frame arrived with (shared by the batch
    * loader above and the streaming reader). */
  def adaptTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType =>
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    case org.apache.spark.sql.types.TimestampNTZType =>
      df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    case _ => df
  }

  /** Default query set for the k-NN operators: first 10 vectors by id,
    * projected to (query_id, query_vec). Broadcast-sized by construction. */
  def defaultQueries(spark: SparkSession, dir: String, n: Int = 10): DataFrame =
    embeddings(spark, dir)
      .filter(col("vec_id") < n)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
}
