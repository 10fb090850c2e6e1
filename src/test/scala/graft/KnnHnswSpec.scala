package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._
import graft.operators.{KnnHnsw, KnnTopK}
import graft.sources.Tables

/** The sharded-NSW contract: deterministic build, connected shard
  * graphs, exact results at exhaustive beam width, useful recall at
  * bounded beam width. */
class KnnHnswSpec extends SparkSuite {

  private lazy val corpus = Tables.embeddings(spark, sfDir)
  private lazy val queries = Tables.defaultQueries(spark, sfDir)
  private lazy val graph = KnnHnsw.build(corpus, numShards = 4)

  /** (shard, vec_id) -> (local_idx, neighbor local indices) — the full
    * persisted graph structure. */
  private def structureOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Int]("shard"), r.getAs[Long]("vec_id")) ->
      ((r.getAs[Int]("local_idx"), r.getSeq[Int](r.fieldIndex("neighbor_idx"))))).toMap

  test("build is deterministic: two builds emit identical adjacency") {
    val a = structureOf(KnnHnsw.build(corpus, numShards = 4))
    val b = structureOf(KnnHnsw.build(corpus, numShards = 4))
    assert(a === b)
  }

  test("every shard graph is connected and degree-capped at 2m") {
    val byShard = graph.collect()
      .map(r => (r.getAs[Int]("shard"), r.getAs[Int]("local_idx"),
        r.getSeq[Int](r.fieldIndex("neighbor_idx"))))
      .groupBy(_._1)
    assert(byShard.size === 4)
    byShard.foreach { case (shard, rows) =>
      val adj = rows.map(r => r._2.toLong -> r._3.map(_.toLong).toSeq).toMap
      adj.values.foreach(nbs => assert(nbs.length <= 16, s"shard $shard degree"))
      // BFS from the lowest id must reach every node (edges are mutual
      // by construction; pruning keeps the cap, not the symmetry, so
      // walk the undirected closure)
      val undirected = new mutable.HashMap[Long, mutable.Set[Long]]
      adj.foreach { case (id, nbs) =>
        nbs.foreach { nb =>
          undirected.getOrElseUpdate(id, mutable.Set.empty) += nb
          undirected.getOrElseUpdate(nb, mutable.Set.empty) += id
        }
      }
      val seen = mutable.Set(adj.keys.min)
      val frontier = mutable.Queue(adj.keys.min)
      while (frontier.nonEmpty) {
        val cur = frontier.dequeue()
        undirected.getOrElse(cur, Set.empty).foreach { nb =>
          if (seen.add(nb)) frontier.enqueue(nb)
        }
      }
      assert(seen.size === adj.size, s"shard $shard disconnected")
    }
  }

  test("exhaustive beam width recovers the exact top-k id set per query") {
    val n = corpus.count().toInt
    val exact = KnnTopK.knnExact(queries, corpus, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaGraph = KnnHnsw.search(graph, queries, k = 5, efQuery = n).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaGraph === exact)
  }

  test("bounded beam width keeps the self-match and good recall") {
    val res = KnnHnsw.search(graph, queries, k = 5, efQuery = 32).collect()
    // rank 1 = the query itself at distance 0 (queries are corpus rows)
    res.filter(_.getLong(3) == 1L).foreach { r =>
      assert(r.getLong(1) === r.getLong(0))
      assert(r.getDouble(2) === 0.0)
    }
    val exact = KnnTopK.knnExact(queries, corpus, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = res.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall@5 $recall at ef=32")
  }

  test("searchMulti per-ef rows equal search at that ef (the sweep-sharing contract)") {
    val efs = Seq(4, 8, 16, 32, 64)
    val multi = KnnHnsw.searchMulti(graph, queries, k = 5, efs)
      .select(col("ef"), col("query_id"), col("match_id"), col("score"), col("rank"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
      .toSet
    val single = efs.flatMap { ef =>
      KnnHnsw.search(graph, queries, k = 5, efQuery = ef)
        .collect()
        .map(r => (ef.toLong, r.getAs[Long]("query_id"), r.getAs[Long]("match_id"),
          r.getAs[Double]("score"), r.getAs[Long]("rank")))
    }.toSet
    assert(multi === single)
  }

  test("bq beam: exhaustive pool reranks to exactly the exact top-k (ids AND scores)") {
    // with ef = n the Hamming beam pool is the whole shard corpus, so the
    // exact-cosine rerank IS the exact computation — routing quality is
    // out of the picture and the result must match bit-for-bit
    val n = corpus.count().toInt
    val exact = KnnTopK.knnExact(queries, corpus, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaBq = KnnHnsw.searchBq(graph, queries, k = 5, efQuery = n).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaBq === exact)
  }

  test("bq beam at bounded ef keeps the self-match and useful recall") {
    val res = KnnHnsw.searchBq(graph, queries, k = 5, efQuery = 48).collect()
    // the query is a corpus row: its Hamming distance to itself is 0, so
    // the beam admits it and the exact rerank pins it at rank 1
    res.filter(_.getLong(3) == 1L).foreach { r =>
      assert(r.getLong(1) === r.getLong(0))
      assert(r.getDouble(2) === 0.0)
    }
    val exact = KnnTopK.knnExact(queries, corpus, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = res.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.5, s"bq recall@5 $recall at ef=48")
  }

  test("bq beam respects tombstones (deleted rows route but never surface)") {
    val deleted = corpus.select(col("vec_id")).filter(col("vec_id") % 5 === 0)
    val n = corpus.count().toInt
    val served = KnnHnsw.searchBq(
      KnnHnsw.markDeleted(graph, deleted), queries, k = 5, efQuery = n).collect()
    val deletedIds = deleted.collect().map(_.getLong(0)).toSet
    assert(!served.exists(r => deletedIds.contains(r.getLong(1))))
    val exact = KnnTopK.knnExact(queries,
      corpus.filter(col("vec_id") % 5 =!= 0), k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(served.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet === exact)
  }

  test("appendTo equals a from-scratch rebuild, touched shards only") {
    val base = corpus.filter(col("vec_id") % 3 =!= 0)
    val delta = corpus.filter(col("vec_id") % 3 === 0)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_hnsw_append_$sfKey"
    KnnHnsw.save(KnnHnsw.build(base, numShards = 4), path)
    KnnHnsw.appendTo(spark, path, delta, numShards = 4)
    // deterministic per-shard build over the shard's id set means the
    // appended index is bit-identical to building the union from scratch
    val appended = structureOf(KnnHnsw.load(spark, path))
    val scratch = structureOf(KnnHnsw.build(corpus, numShards = 4))
    assert(appended === scratch)
    // upsert last-wins: re-appending existing ids must not duplicate rows
    KnnHnsw.appendTo(spark, path, delta, numShards = 4)
    assert(KnnHnsw.load(spark, path).count() === corpus.count())
  }

  test("tombstoned rows route the beam but never surface (mark_deleted semantics)") {
    val deleted = corpus.select(col("vec_id")).filter(col("vec_id") % 3 === 0)
    val marked = KnnHnsw.markDeleted(graph, deleted)
    val n = corpus.count().toInt
    val served = KnnHnsw.search(marked, queries, k = 5, efQuery = n)
    val servedIds = served.select("match_id").distinct()
      .collect().map(_.getLong(0)).toSet
    // hard exclusion: no tombstoned id in any result list
    assert(servedIds.forall(_ % 3 != 0))
    // exhaustive filtered beam == exact top-k over the LIVE corpus (the
    // graph, including its tombstoned nodes' edges, still reaches every
    // live node)
    val exact = KnnTopK.knnExact(queries,
        corpus.filter(col("vec_id") % 3 =!= 0), k = 5)
      .select("query_id", "match_id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = served.select("query_id", "match_id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === exact)
    // marking is cumulative: a second mark ORs into the first
    val more = KnnHnsw.markDeleted(marked,
      corpus.select(col("vec_id")).filter(col("vec_id") % 3 === 1))
    val left = KnnHnsw.search(more, queries, k = 5, efQuery = n)
      .select("match_id").distinct().collect().map(_.getLong(0)).toSet
    assert(left.forall(id => id % 3 != 0 && id % 3 != 1))
    // an unmarked graph is untouched by the deleted-column plumbing
    val plain = KnnHnsw.search(graph, queries, k = 5, efQuery = n)
      .select("query_id", "match_id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exactAll = KnnTopK.knnExact(queries, corpus, k = 5)
      .select("query_id", "match_id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(plain === exactAll)
  }

  test("compact purges tombstones by rebuilding only touched shards") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_hnsw_compact_$sfKey"
    val deleted = corpus.select(col("vec_id")).filter(col("vec_id") % 5 === 0)
    KnnHnsw.save(KnnHnsw.markDeleted(KnnHnsw.build(corpus, numShards = 4), deleted), path)
    // tombstones survive the save/load round-trip
    assert(KnnHnsw.load(spark, path).filter(col("deleted")).count() ===
      corpus.filter(col("vec_id") % 5 === 0).count())
    KnnHnsw.compact(spark, path, numShards = 4)
    val compacted = KnnHnsw.load(spark, path)
    assert(compacted.filter(col("deleted")).count() === 0L)
    // deterministic per-shard builds: the compacted index IS the
    // from-scratch build of the live corpus
    val live = corpus.filter(col("vec_id") % 5 =!= 0)
    assert(structureOf(compacted) === structureOf(KnnHnsw.build(live, numShards = 4)))
    // idempotent: a second compact is a no-op
    KnnHnsw.compact(spark, path, numShards = 4)
    assert(structureOf(KnnHnsw.load(spark, path)) ===
      structureOf(KnnHnsw.build(live, numShards = 4)))
    // append after compact keeps the lifecycle closed: re-adding the
    // purged rows rebuilds back to the full-corpus structure
    KnnHnsw.appendTo(spark, path,
      corpus.filter(col("vec_id") % 5 === 0), numShards = 4)
    assert(structureOf(KnnHnsw.load(spark, path)) ===
      structureOf(KnnHnsw.build(corpus, numShards = 4)))
  }

  test("save/load round-trips the graph and searches identically") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_hnsw_spec_$sfKey"
    KnnHnsw.save(graph, path)
    val loaded = KnnHnsw.load(spark, path)
    // restored == rebuilt: the persisted local-index layout must carry
    // the IDENTICAL graph structure the in-session build produced (the
    // array-placement restore in search depends on exactly this)
    assert(structureOf(loaded) === structureOf(graph))
    val a = KnnHnsw.search(graph, queries, k = 3, efQuery = 32).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(1))).sorted.toSeq
    val b = KnnHnsw.search(loaded, queries, k = 3, efQuery = 32).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(1))).sorted.toSeq
    assert(a === b)
  }

  test("versioned graph: commits linearize, appendTo == scratch, lifecycle closed") {
    import graft.operators.Versioned
    val path = java.nio.file.Files.createTempDirectory("graft_hnsw_ver").toString + "/g"
    val base = corpus.filter(col("vec_id") % 3 =!= 0)
    val delta = corpus.filter(col("vec_id") % 3 === 0)
    assert(KnnHnsw.saveVersioned(KnnHnsw.build(base, numShards = 4), path, 4) === 0)
    // versioned append == from-scratch rebuild (deterministic shards)
    assert(KnnHnsw.appendToVersioned(spark, path, delta, numShards = 4) === 1)
    assert(structureOf(KnnHnsw.loadVersioned(spark, path)) ===
      structureOf(KnnHnsw.build(corpus, numShards = 4)))
    // time travel: v0 is still the base-corpus graph
    assert(structureOf(KnnHnsw.loadVersioned(spark, path, Some(0))) ===
      structureOf(KnnHnsw.build(base, numShards = 4)))
    // tombstone as a commit: marked ids route but never surface
    val doomed = corpus.filter(col("vec_id") % 5 === 0).select("vec_id")
    assert(KnnHnsw.markDeletedVersioned(spark, path, doomed) === 2)
    val g2 = KnnHnsw.loadVersioned(spark, path)
    val n = corpus.count().toInt
    val served = KnnHnsw.search(g2, queries, k = 5, efQuery = n)
    assert(served.join(doomed.select(col("vec_id").as("match_id")),
      Seq("match_id"), "left_semi").count() === 0, "tombstoned ids leaked")
    // compact as a commit: rebuilt from live rows == scratch build of live
    assert(KnnHnsw.compactVersioned(spark, path, numShards = 4) === 3)
    val live = corpus.filter(col("vec_id") % 5 =!= 0)
    val compacted = KnnHnsw.loadVersioned(spark, path)
    assert(structureOf(compacted.drop("deleted")) ===
      structureOf(KnnHnsw.build(live, numShards = 4)))
    assert(Versioned.versions(spark, path) === Seq(0, 1, 2, 3))
  }

  private def sfKey: String =
    java.lang.Long.toHexString(sfDir.hashCode.toLong & 0xffffffffL)
}
