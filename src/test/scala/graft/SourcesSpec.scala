package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{Knn, Lifecycle, Traversal}
import graft.sources.Tables

class SourcesSpec extends SparkSuite {

  test("dump/load round-trips the corpus exactly (O14/O17)") {
    val path = Files.createTempDirectory("graft_dump").toString + "/corpus"
    val corpus = Tables.embeddings(spark, sfDir)
    Lifecycle.dump(corpus, path)
    val back = Lifecycle.load(spark, path)
    assert(back.count() === corpus.count())
    assert(back.exceptAll(corpus).count() === 0)
    assert(corpus.exceptAll(back).count() === 0)
  }

  test("clear empties the corpus but keeps the schema (O15)") {
    val corpus = Tables.embeddings(spark, sfDir)
    val cleared = Lifecycle.clear(corpus)
    assert(cleared.count() === 0)
    assert(cleared.schema === corpus.schema)
  }

  test("csv and json sinks/sources round-trip scalar tables") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "lang", "n_chars")
    for (fmt <- Seq("csv", "json")) {
      val path = Files.createTempDirectory(s"graft_$fmt").toString + s"/docs_$fmt"
      docs.write.mode("overwrite").option("header", "true").format(fmt).save(path)
      val back = spark.read.option("header", "true").option("inferSchema", "true")
        .format(fmt).load(path)
        .select(col("doc_id").cast("long"), col("lang"), col("n_chars").cast("long"))
      assert(back.count() === docs.count())
      assert(back.exceptAll(docs).count() === 0, s"$fmt round-trip drift")
    }
  }

  test("orc sink/source round-trips the full embeddings table (nested arrays)") {
    val emb = Tables.embeddings(spark, sfDir)
    val path = Files.createTempDirectory("graft_orc").toString + "/emb_orc"
    emb.write.mode("overwrite").orc(path)
    val back = spark.read.orc(path)
    assert(back.schema === emb.schema)
    assert(back.exceptAll(emb).count() === 0, "orc round-trip drift")
  }

  test("limit clamp caps k at corpus size with all rows ranked (O8)") {
    val queries = Tables.defaultQueries(spark, sfDir, n = 2)
    val corpus = Tables.embeddings(spark, sfDir).filter(col("label") === 1)
    val n = corpus.count()
    val buf = new java.io.ByteArrayOutputStream()
    val res = Console.withErr(buf) {
      Knn.knnClamped(queries, corpus, k = 100000, knownCount = Some(n))
    }
    assert(res.count() === 2 * n)
    assert(res.agg(max(col("rank"))).head().getLong(0) === n)
    assert(buf.toString.contains(s"limit 100000 clamped to corpus size $n"), buf.toString)
  }

  test("traversal: 'r' is identity, 'c' flattens chunks losslessly (O2)") {
    val docs = Tables.documents(spark, sfDir)
    val nested = Traversal.withChunks(docs)
    assert(Traversal.traverseFlat(nested, "r").count() === docs.count())
    val chunks = Traversal.traverseFlat(nested, "c")
    assert(chunks.count() === 2 * docs.count())
    // halves reassemble to the original length
    val total = chunks.groupBy(col("doc_id"))
      .agg(sum(length(col("chunk_text"))).as("n"))
      .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
      .filter(col("n") =!= col("n_chars")).count()
    assert(total === 0)
    intercept[IllegalArgumentException](Traversal.traverseFlat(nested, "x"))
  }
}
