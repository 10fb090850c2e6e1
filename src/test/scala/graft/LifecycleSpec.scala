package graft

import org.apache.spark.sql.functions._
import graft.operators.Lifecycle

class LifecycleSpec extends SparkSuite {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "v1", 1), (2L, "v1", 1), (3L, "v1", 1)
  ).toDF("vec_id", "payload", "batch")

  test("upsert is last-writer-wins by id; new ids appended (executor.py:151-164)") {
    val updates = Seq((2L, "v2", 2), (9L, "v2", 2)).toDF("vec_id", "payload", "batch")
    val out = Lifecycle.upsertById(corpus, updates)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(out === Map(
      1L -> ("v1", 1), 2L -> ("v2", 2), 3L -> ("v1", 1), 9L -> ("v2", 2)))
  }

  test("upsert is idempotent") {
    val updates = Seq((2L, "v2", 2)).toDF("vec_id", "payload", "batch")
    val once = Lifecycle.upsertById(corpus, updates)
    val twice = Lifecycle.upsertById(once, updates.withColumn("batch", lit(3)))
    assert(twice.collect().map(r => r.getLong(0) -> r.getString(1)).toMap ===
      once.collect().map(r => r.getLong(0) -> r.getString(1)).toMap)
  }

  test("update applies to existing ids and skips unknown (executor.py:186-197)") {
    val updates = Seq((2L, "v2", 2), (9L, "v2", 2)).toDF("vec_id", "payload", "batch")
    val actions = Lifecycle.updateActions(corpus, updates)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(actions === Map(2L -> "updated", 9L -> "skipped_unknown"))

    val applied = Lifecycle.updateExisting(corpus, updates)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(applied === Map(1L -> "v1", 2L -> "v2", 3L -> "v1")) // no id 9
  }

  test("empty update batch is a no-op (reference would crash; SURVEY quirks)") {
    val empty = corpus.filter(lit(false))
    assert(Lifecycle.updateExisting(corpus, empty).count() === 3)
  }

  test("tombstone delete preserves indexed = active + deleted (executor.py:252-257)") {
    val dead = Seq(2L, 3L, 77L).toDF("vec_id") // 77 unknown: ignored (executor.py:221)
    val st = Lifecycle.status(Lifecycle.softDelete(corpus, dead)).head()
    val (indexed, active, deleted) = (st.getLong(0), st.getLong(1), st.getLong(2))
    assert(indexed === 3 && active === 1 && deleted === 2)
    assert(indexed === active + deleted)
  }

  test("dimCounts flags width mismatches (executor.py:105-110)") {
    val vecs = Seq((1L, Seq(1f, 2f)), (2L, Seq(1f, 2f)), (3L, Seq(1f, 2f, 3f)))
      .toDF("vec_id", "embedding")
    val dims = Lifecycle.dimCounts(vecs).collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(dims === Map(2 -> 2L, 3 -> 1L))
  }

  test("requireDim passes matching widths through unchanged") {
    val vecs = Seq((1L, Seq(1f, 2f)), (2L, Seq(3f, 4f))).toDF("vec_id", "embedding")
    assert(Lifecycle.requireDim(vecs, dim = 2).collect().map(_.getLong(0)).sorted
      === Array(1L, 2L))
  }

  test("requireDim fails the job on a width mismatch (executor.py:105-110 ValueError)") {
    val vecs = Seq((1L, Seq(1f, 2f)), (3L, Seq(1f, 2f, 3f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] { Lifecycle.requireDim(vecs, dim = 2).collect() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => String.valueOf(x.getMessage) +: msgs(x.getCause))
    assert(msgs(e).exists(_.contains("expected embeddings of dim 2")), e.toString)
  }
}
