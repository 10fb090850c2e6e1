package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-shaped ANN: shard-partitioned navigable-small-world graphs — the
  * Spark-native rendition of the reference's actual index structure
  * (`executor.py:49,66-70` wraps an HNSW library; build knobs
  * ef_construction/M at `executor.py:52-55`, query knob ef at 66-70).
  *
  * A monolithic HNSW graph is a SERVING structure: one shared memory
  * space, pointer-chasing, lock-free inserts. A distributed batch engine
  * should not emulate that shape — the scale rendition is S independent
  * shard graphs:
  *
  *   - vectors hash-partition into S shards (`pmod(xxhash64(id), S)`);
  *   - each shard builds its own in-memory single-layer NSW graph
  *     (Malkov et al. 2014 — greedy beam insert, M neighbors per node,
  *     efConstruction beam width) inside ONE `flatMapGroups` task;
  *   - a query batch broadcasts to every shard, beam-searches each shard
  *     graph at efQuery, and the per-shard top-k merge globally through
  *     the same bounded aggregation every other k-NN path uses.
  *
  * Hash-sharding makes the merge EXACT: the true global top-k is the
  * union of per-shard true top-k, so approximation error comes only from
  * within-shard graph search — and shard graphs are N/S nodes, where
  * beam search is MORE accurate than over one N-node graph. The hierarchy
  * of HNSW accelerates entry-point descent on huge graphs; bounded shards
  * don't need it (entry = first inserted node), which also keeps the
  * build single-pass deterministic (insertion in ascending id order,
  * (distance, id) ordering everywhere — same graph every run, any
  * partitioning).
  *
  * 100 TB posture: choose S so one shard's vectors + adjacency fit one
  * task's heap (at 64-dim floats, a 4 GiB task holds ~10M vectors; 100 TB
  * of 1 KiB docs with embeddings wants S in the low thousands). Build is
  * embarrassingly parallel (one task per shard, no shuffle after the
  * hash exchange); the persisted layout is shard-partitioned parquet, so
  * serving reads stay pruned and append = rebuild of touched shards only.
  * Queries are broadcast-sized by the same contract as
  * [[KnnIvf.searchPruned]]'s probe set.
  */
object KnnHnsw {

  /** Deterministic single-layer NSW over one shard, built and searched
    * entirely inside a task. Distances are cosine (1 − cos) computed
    * with the same double-accumulator loop as the codegen'd
    * `VectorExprs.CosineSim`, so emitted scores agree bit-for-bit with
    * the exact twin's. */
  private[operators] final class NswGraph(m: Int, efConstruction: Int) {
    private val mMax = 2 * m // reverse-edge degree cap (layer-0 HNSW rule)
    private[operators] val ids = new mutable.ArrayBuffer[Long]
    private[operators] val vecs = new mutable.ArrayBuffer[Array[Float]]
    private[operators] val adj = new mutable.ArrayBuffer[mutable.ArrayBuffer[Int]]

    private def dist(q: Array[Float], idx: Int): Double =
      cosineDist(q, vecs(idx))

    /** Beam search: best-first expansion keeping the ef closest found;
      * stops when the nearest open candidate is farther than the worst
      * kept result. Returns local indices sorted by (distance, id).
      * `allowed` is the tombstone filter (hnswlib `mark_deleted`
      * semantics, the reference's delete path `executor.py:223`):
      * DISALLOWED nodes still route the expansion — their edges are what
      * keep the graph connected — but never enter the result heap, so
      * they are excluded from every result list. With the default
      * always-true filter the control flow is identical to the unfiltered
      * beam (same admissions, same terminations, same results). */
    private[operators] def searchBeam(q: Array[Float], ef: Int,
        allowed: Int => Boolean = _ => true): IndexedSeq[(Double, Int)] =
      searchBeamWith(i => dist(q, i), ef, allowed)

    /** The beam core, parameterized by the node-distance function — the
      * cosine path ([[searchBeam]]) and the binary-quantized Hamming
      * path ([[KnnHnsw.searchBq]]) share identical control flow. */
    private[operators] def searchBeamWith(distFn: Int => Double, ef: Int,
        allowed: Int => Boolean = _ => true): IndexedSeq[(Double, Int)] = {
      if (ids.isEmpty) return IndexedSeq.empty
      // priority = (distance, id); candidates pop NEAREST first, results
      // track the WORST kept entry on top. Ordering includes the id so
      // ties (exact duplicate vectors) break identically every run.
      val byFar = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
        .on[(Double, Int)] { case (d, i) => (d, ids(i)) }
      val candidates = mutable.PriorityQueue.empty[(Double, Int)](byFar.reverse)
      val results = mutable.PriorityQueue.empty[(Double, Int)](byFar)
      val visited = new java.util.HashSet[Int]
      val d0 = distFn(0)
      visited.add(0); candidates.enqueue((d0, 0))
      if (allowed(0)) results.enqueue((d0, 0))
      while (candidates.nonEmpty &&
             !(results.size >= ef && byFar.gt(candidates.head, results.head))) {
        val (_, c) = candidates.dequeue()
        val nbs = adj(c)
        var i = 0
        while (i < nbs.length) {
          val nb = nbs(i)
          if (visited.add(nb)) {
            val d = distFn(nb)
            if (results.size < ef || byFar.lt((d, nb), results.head)) {
              candidates.enqueue((d, nb))
              if (allowed(nb)) {
                results.enqueue((d, nb))
                if (results.size > ef) results.dequeue()
              }
            }
          }
          i += 1
        }
      }
      results.dequeueAll.reverse.toIndexedSeq
    }

    /** NSW insert: beam-find efConstruction closest, link to the m
      * nearest bidirectionally, cap any over-degree neighbor at mMax
      * closest (its own distances, id tiebreak). */
    private[operators] def insert(id: Long, vec: Array[Float]): Unit = {
      val idx = ids.length
      ids += id; vecs += vec; adj += new mutable.ArrayBuffer[Int]
      if (idx == 0) return
      val near = searchBeam(vec, efConstruction).take(m)
      near.foreach { case (_, nb) =>
        adj(idx) += nb
        adj(nb) += idx
        if (adj(nb).length > mMax) {
          val kept = adj(nb)
            .map(x => (cosineDist(vecs(nb), vecs(x)), x))
            .sorted(Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int)
              .on[(Double, Int)] { case (d, i) => (d, i) })
            .take(mMax).map(_._2)
          adj(nb).clear(); adj(nb) ++= kept
        }
      }
    }
  }

  /** Same arithmetic as the codegen'd CosineSim kernel (double
    * accumulators over float reads, same loop order) so JVM-side scores
    * match the Catalyst exact twin's bit-for-bit. */
  private[operators] def cosineDist(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def roundHalfUp4(d: Double): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue() + 0.0

  private[operators] def buildShard(m: Int, efConstruction: Int,
      rows: Iterator[(Int, Long, Array[Float])]): Iterator[(Int, Int, Long, Array[Float], Array[Int])] = {
    val sorted = rows.toArray.sortBy(_._2) // ascending id = deterministic graph
    if (sorted.isEmpty) return Iterator.empty
    val shard = sorted.head._1
    val g = new NswGraph(m, efConstruction)
    sorted.foreach { case (_, id, vec) => g.insert(id, vec) }
    (0 until g.ids.length).iterator.map { i =>
      (shard, i, g.ids(i), g.vecs(i), g.adj(i).toArray.sorted)
    }
  }

  /** Build the sharded graph as a DataFrame (shard, local_idx, vec_id,
    * embedding, neighbor_idx): one `flatMapGroups` task per shard, each
    * holding only its own N/S vectors. Adjacency is persisted as LOCAL
    * indices alongside the row's own insertion index — the reference's
    * restore is load-once array reads (`executor.py:51-57`), and local
    * indices make OUR restore an array placement per row: no per-batch
    * re-sort and no id→index hash map at serve time (the r10 search path
    * re-derived both from global-id adjacency on every query batch).
    * `local_idx` is the rank of the id within its shard (insertion is
    * ascending-id), so the layout is deterministic and derivable —
    * storing it costs one int per row and buys an O(n) restore. */
  def build(corpus: DataFrame, numShards: Int, m: Int = 8,
            efConstruction: Int = 64,
            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import corpus.sparkSession.implicits._
    corpus
      .select(pmod(xxhash64(col(idCol)), lit(numShards)).cast("int").as("shard"),
        col(idCol).cast("long").as("id"), col(vecCol).cast("array<float>").as("vec"))
      .as[(Int, Long, Array[Float])]
      .groupByKey(_._1)
      .flatMapGroups((_: Int, rows: Iterator[(Int, Long, Array[Float])]) =>
        buildShard(m, efConstruction, rows))
      .toDF("shard", "local_idx", "vec_id", "embedding", "neighbor_idx")
  }

  /** Persist shard-partitioned (the reference persists its graph + id map
    * and restores on startup, `executor.py:227-236`); a reload scans only
    * the shards it touches. */
  def save(graph: DataFrame, path: String): Unit =
    Scale.dumpPartitionedBy(graph, path, "shard")

  def load(spark: SparkSession, path: String): DataFrame = {
    // partition-column reads widen shard to long and append it last;
    // restore the written schema so load is a true inverse of save
    val raw = Scale.loadPartitioned(spark, path)
    val base = Seq(col("shard").cast("int").as("shard"),
      col("local_idx").cast("int").as("local_idx"),
      col("vec_id"), col("embedding"),
      col("neighbor_idx").cast("array<int>").as("neighbor_idx"))
    // a graph saved after markDeleted carries its tombstones through
    // the round-trip (the reference persists its id map + deleted
    // accounting the same way, executor.py:227-236)
    if (raw.columns.contains("deleted"))
      raw.select(base :+ col("deleted").cast("boolean").as("deleted"): _*)
    else raw.select(base: _*)
  }

  /** Append/upsert into a SAVED graph: new rows hash to their shards and
    * ONLY those shards rebuild (surviving existing rows + new rows,
    * last-wins on id), dynamically overwriting just the touched shard
    * directories — the graph sibling of [[KnnIvf.appendTo]]'s
    * cell-directory append. Because the per-shard build is deterministic
    * over the shard's id set, the appended index is IDENTICAL to a
    * from-scratch rebuild of the whole corpus (spec-pinned) — incremental
    * ingest costs touched-shards work with zero quality drift. The
    * touched-shard collect is ≤ numShards ints, the same bounded
    * metadata resolve as IVF's probed-cell set. */
  def appendTo(spark: SparkSession, path: String, newRows: DataFrame,
               numShards: Int, m: Int = 8, efConstruction: Int = 64,
               idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val incoming = newRows.select(col(idCol).cast("long").as("vec_id"),
      col(vecCol).cast("array<float>").as("embedding"))
    val touched = incoming
      .select(pmod(xxhash64(col("vec_id")), lit(numShards)).cast("int").as("shard"))
      .distinct().collect().map(_.getInt(0)).sorted
    val saved = load(spark, path)
    val hasTombstones = saved.columns.contains("deleted")
    val survivingCols =
      if (hasTombstones) Seq(col("vec_id"), col("embedding"), col("deleted"))
      else Seq(col("vec_id"), col("embedding"))
    val surviving = saved
      .filter(col("shard").isin(touched.map(Integer.valueOf): _*))
      .select(survivingCols: _*)
      .join(incoming.select("vec_id"), Seq("vec_id"), "left_anti")
      .localCheckpoint(true) // read completes before its source dirs rewrite
    val rebuilt = build(
      surviving.select("vec_id", "embedding").unionByName(incoming),
      numShards, m, efConstruction)
    val withFlags =
      if (!hasTombstones) rebuilt
      else
        // tombstoned survivors keep their flag (they must keep routing);
        // an upserted id revives as live — the reference's re-index path
        // treats a deleted id as brand new (executor.py:151-161 after
        // :224 removed it from the id map)
        rebuilt.join(surviving.select(col("vec_id"), col("deleted")),
            Seq("vec_id"), "left")
          .withColumn("deleted", coalesce(col("deleted"), lit(false)))
          .select(col("shard"), col("local_idx"), col("vec_id"),
            col("embedding"), col("neighbor_idx"), col("deleted"))
    withFlags
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("shard").parquet(path)
  }

  /** Purge tombstones from a SAVED graph: shards containing any deleted
    * row rebuild from their live rows only ([[appendTo]]'s
    * touched-shard pattern — the bounded collect is ≤ numShards ints);
    * untouched shard directories are never rewritten. Deterministic
    * per-shard builds make the compacted index IDENTICAL to a
    * from-scratch build of the live corpus (spec-pinned). The
    * tombstone-and-compact pair is the graph lifecycle the reference
    * cannot offer (hnswlib never reclaims deleted slots,
    * `executor.py:223` tombstones forever): serve through the
    * routed-but-excluded tombstones while deletion churn is low, compact
    * when the deleted fraction makes the extra routing work matter. */
  def compact(spark: SparkSession, path: String, numShards: Int,
              m: Int = 8, efConstruction: Int = 64): Unit = {
    val g = load(spark, path)
    if (!g.columns.contains("deleted")) return
    val touched = g.filter(col("deleted")).select("shard").distinct()
      .collect().map(_.getInt(0)).sorted
    if (touched.isEmpty) return
    val live = g.filter(col("shard").isin(touched.map(Integer.valueOf): _*))
      .filter(!col("deleted"))
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint(true) // read completes before the dirs it read from rewrite
    build(live, numShards, m, efConstruction)
      // rebuilt shards keep the column so every file in the directory
      // tree shares one schema (the untouched shards still carry it)
      .withColumn("deleted", lit(false))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("shard").parquet(path)
    // a shard whose rows were ALL deleted emits nothing — dynamic
    // overwrite leaves its stale directory in place; drop it explicitly
    val liveShards = live
      .select(pmod(xxhash64(col("vec_id")), lit(numShards)).cast("int").as("shard"))
      .distinct().collect().map(_.getInt(0)).toSet
    val emptied = touched.filterNot(liveShards)
    if (emptied.nonEmpty) {
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      emptied.foreach { sh =>
        fs.delete(new org.apache.hadoop.fs.Path(root, s"shard=$sh"), true): Unit
      }
    }
  }

  // ---------------------------------------------------------------------
  // Versioned graph: shard rewrites under the table layer's COMMIT
  // DISCIPLINE — the [[KnnIvf.saveVersioned]] sibling for the NSW index.
  // ---------------------------------------------------------------------

  /** Cluster a graph frame ~one-file-per-shard so manifest `shard`
    * stats stay sharp. Range-partitioned on the shard ALONE so file
    * stats boxes partition the shard space without overlap — the
    * precondition for shard-disjoint racers to rebase past each other
    * (see [[KnnIvf]]'s arrangeByCell note). */
  private def arrangeByShard(df: DataFrame, nFiles: Int): DataFrame =
    df.repartitionByRange(math.max(1, nFiles), col("shard"))
      .sortWithinPartitions("shard")

  /** Persist the sharded graph as a [[Versioned]] table with per-file
    * `shard` stats: every later mutation ([[appendToVersioned]],
    * [[markDeletedVersioned]], [[compactVersioned]]) is an atomic
    * manifest commit with retry/rebase — racing SHARD-DISJOINT ingests
    * both land, overlapping ones refuse typed, and a half-written shard
    * rewrite is invisible to readers (they only see committed
    * manifests). The in-place [[save]]/[[appendTo]]/[[compact]] flavor
    * keeps the reference's single-writer dump semantics
    * (`executor.py:227-236`). */
  def saveVersioned(graph: DataFrame, path: String, numShards: Int): Int =
    Versioned.init(arrangeByShard(graph, numShards), path,
      statsCol = Some("shard"))

  /** Restore a versioned graph at a pinned version (latest by default),
    * with the same schema restoration as [[load]]. */
  def loadVersioned(spark: SparkSession, path: String,
                    version: Option[Int] = None): DataFrame = {
    val raw = Versioned.read(spark, path, version)
    val base = Seq(col("shard").cast("int").as("shard"),
      col("local_idx").cast("int").as("local_idx"),
      col("vec_id"), col("embedding"),
      col("neighbor_idx").cast("array<int>").as("neighbor_idx"))
    if (raw.columns.contains("deleted"))
      raw.select(base :+ coalesce(col("deleted"), lit(false)).as("deleted"): _*)
    else raw.select(base: _*)
  }

  /** Append/upsert into a versioned graph as a partition-COW commit:
    * new rows hash to their shards, ONLY those shards rebuild
    * (survivors ∪ batch, last-wins on id — identical to a from-scratch
    * rebuild by per-shard determinism), and the rewrite publishes via
    * [[Versioned.replacePartitions]]: racing ingests on disjoint shard
    * sets both land with linearized versions; anything that touched
    * this writer's shards (same-shard ingest, compact) refuses typed. */
  def appendToVersioned(spark: SparkSession, path: String, newRows: DataFrame,
                        numShards: Int, m: Int = 8, efConstruction: Int = 64,
                        idCol: String = "vec_id", vecCol: String = "embedding"): Int =
    appendToVersionedAt(spark, path, newRows, numShards, m, efConstruction,
      idCol, vecCol, Versioned.snapshot(spark, path))

  /** [[appendToVersioned]] against a CALLER-PINNED base snapshot — the
    * deterministic-interleave face of the race protocol (the graph twin
    * of [[KnnIvf.appendToVersionedAt]]): a stale base whose touched
    * shards were since rewritten refuses with the typed conflict; a
    * stale base whose shards survived rebases and lands. */
  private[graft] def appendToVersionedAt(spark: SparkSession, path: String,
                                         newRows: DataFrame, numShards: Int,
                                         m: Int, efConstruction: Int,
                                         idCol: String, vecCol: String,
                                         base: Versioned.Snapshot): Int = {
    val incoming = newRows.select(col(idCol).cast("long").as("vec_id"),
      col(vecCol).cast("array<float>").as("embedding"))
    val touched = incoming
      .select(pmod(xxhash64(col("vec_id")), lit(numShards)).cast("int").as("shard"))
      .distinct().collect().map(_.getInt(0)).sorted
    if (touched.isEmpty) return base.version
    val saved = loadVersioned(spark, path, Some(base.version))
    val hasTombstones = saved.columns.contains("deleted")
    val survivingCols =
      if (hasTombstones) Seq(col("vec_id"), col("embedding"), col("deleted"))
      else Seq(col("vec_id"), col("embedding"))
    val surviving = saved
      .filter(col("shard").isin(touched.map(Integer.valueOf): _*))
      .select(survivingCols: _*)
      .join(incoming.select("vec_id"), Seq("vec_id"), "left_anti")
    val rebuilt = build(
      surviving.select("vec_id", "embedding").unionByName(incoming),
      numShards, m, efConstruction)
    val withFlags =
      if (!hasTombstones) rebuilt
      else rebuilt.join(surviving.select(col("vec_id"), col("deleted")),
          Seq("vec_id"), "left")
        .withColumn("deleted", coalesce(col("deleted"), lit(false)))
        .select(col("shard"), col("local_idx"), col("vec_id"),
          col("embedding"), col("neighbor_idx"), col("deleted"))
    Versioned.replacePartitions(arrangeByShard(withFlags, touched.length),
      path, "shard", touched.map(_.toLong), base)
  }

  /** Tombstone ids in a versioned graph as a partition-COW commit:
    * shards containing a marked id rewrite with the `deleted` flag set
    * (rows keep ROUTING, never surface — [[markDeleted]] semantics,
    * now atomic and time-travelable); untouched shards carry by
    * reference and null-fill the flag on read ([[loadVersioned]]
    * coalesces it to false). */
  def markDeletedVersioned(spark: SparkSession, path: String, ids: DataFrame,
                           idCol: String = "vec_id"): Int = {
    val marks = ids.select(col(idCol).as("vec_id")).distinct()
    val base = Versioned.snapshot(spark, path)
    val g = loadVersioned(spark, path, Some(base.version))
    val touched = g.join(broadcast(marks), Seq("vec_id"), "left_semi")
      .select("shard").distinct().collect().map(_.getInt(0)).sorted
    if (touched.isEmpty) return base.version
    val rewritten = markDeleted(
      g.filter(col("shard").isin(touched.map(Integer.valueOf): _*)), marks)
    Versioned.replacePartitions(arrangeByShard(rewritten, touched.length),
      path, "shard", touched.map(_.toLong), base)
  }

  /** Purge tombstones from a versioned graph as a partition-COW commit:
    * shards with any deleted row rebuild from live rows only (identical
    * to a from-scratch build of the live corpus, per-shard determinism);
    * racing commits follow the [[appendToVersioned]] rules. A shard
    * left with no live rows simply leaves the manifest. */
  def compactVersioned(spark: SparkSession, path: String, numShards: Int,
                       m: Int = 8, efConstruction: Int = 64): Int = {
    val base = Versioned.snapshot(spark, path)
    val g = loadVersioned(spark, path, Some(base.version))
    if (!g.columns.contains("deleted")) return base.version
    val touched = g.filter(col("deleted")).select("shard").distinct()
      .collect().map(_.getInt(0)).sorted
    if (touched.isEmpty) return base.version
    val live = g.filter(col("shard").isin(touched.map(Integer.valueOf): _*))
      .filter(!col("deleted"))
      .select(col("vec_id"), col("embedding"))
    val rebuilt = build(live, numShards, m, efConstruction)
      .withColumn("deleted", lit(false))
    Versioned.replacePartitions(arrangeByShard(rebuilt, touched.length),
      path, "shard", touched.map(_.toLong), base)
  }

  /** Tombstone rows of a graph frame: every `vec_id` in `ids` keeps
    * ROUTING beam expansion (its edges are load-bearing for graph
    * connectivity — hnswlib's `mark_deleted`, the reference's delete
    * path `executor.py:213-225`: slot not reused, excluded from
    * results) but is excluded from every result list [[search]] emits.
    * Idempotent and cumulative: marking on an already-marked frame ORs
    * the tombstone sets. A plain left join — the deleted set stays
    * distributed, never collected. */
  def markDeleted(graph: DataFrame, ids: DataFrame,
                  idCol: String = "vec_id"): DataFrame = {
    val marks = ids.select(col(idCol).as("vec_id")).distinct()
      .withColumn("__mark", lit(true))
    val prior = if (graph.columns.contains("deleted")) col("deleted") else lit(false)
    graph.join(marks, Seq("vec_id"), "left")
      .withColumn("deleted", coalesce(col("__mark"), prior, lit(false)))
      .drop("__mark")
  }

  /** Search every shard graph for the broadcast query batch and merge
    * per-shard top-k globally. efQuery is the reference's ef knob
    * (`executor.py:66-70`): beam width per shard, recall-vs-cost. The
    * collect is the bounded query batch (same contract as IVF's probe
    * resolve); the graphs never leave their tasks. A `deleted` column
    * (from [[markDeleted]]) tombstones rows: routed, never returned. */
  def search(graph: DataFrame, queries: DataFrame, k: Int, efQuery: Int,
             queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    import graph.sparkSession.implicits._
    val qs: Array[(Long, Array[Float])] = queries
      .select(col(queryId).cast("long"), col(queryVec).cast("array<float>"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val ef = math.max(1, efQuery)
    val delCol =
      if (graph.columns.contains("deleted")) col("deleted") else lit(false)
    val scored = graph
      .select(col("shard"), col("local_idx"), col("vec_id"), col("embedding"),
        col("neighbor_idx"), delCol.as("deleted"))
      .as[(Int, Int, Long, Array[Float], Array[Int], Boolean)]
      // shards are whole within a hash partition; a partition may hold
      // several, so restore each shard's graph separately
      .repartition(col("shard"))
      .mapPartitions { rows =>
        val byShard = rows.toArray.groupBy(_._1)
        byShard.iterator.flatMap { case (_, shardRows) =>
          // adjacency arrives as persisted LOCAL indices: restore is one
          // array placement per row — no sort, no id→index map (the cost
          // the pre-r11 global-id layout paid per query batch)
          val n = shardRows.length
          val g = new NswGraph(1, 1) // container only; adjacency is restored
          val ids = new Array[Long](n)
          val vecs = new Array[Array[Float]](n)
          val adjs = new Array[Array[Int]](n)
          val dels = new Array[Boolean](n)
          shardRows.foreach { case (_, li, id, vec, nbs, del) =>
            ids(li) = id; vecs(li) = vec; adjs(li) = nbs; dels(li) = del
          }
          var i = 0
          while (i < n) {
            g.ids += ids(i); g.vecs += vecs(i)
            g.adj += (new mutable.ArrayBuffer[Int](adjs(i).length) ++= adjs(i))
            i += 1
          }
          val anyDeleted = dels.exists(identity)
          val allowed: Int => Boolean =
            if (anyDeleted) (i: Int) => !dels(i) else (_: Int) => true
          qs.iterator.flatMap { case (qid, qvec) =>
            g.searchBeam(qvec, ef, allowed).take(k).map { case (d, i) =>
              (qid, g.ids(i), roundHalfUp4(d))
            }
          }
        }
      }
      .toDF("query_id", "match_id", "score")
    KnnTopK.boundedTopK(scored, k, asc = true)
  }

  /** [[search]] at SEVERAL beam widths in ONE pass over the graph — the
    * ef-sweep shape ([[KnnIvf.searchPrunedMulti]]'s precedent for the
    * graph index): each shard graph is shuffled and restored ONCE and
    * then beam-searched per (ef, query), instead of the sweep paying the
    * full exchange + O(n) restore once per ef value. Per-ef results are
    * IDENTICAL to [[search]] at that ef — same beam control flow, same
    * per-shard take(k), same bounded global merge, now keyed by
    * (ef, query) — spec-pinned in KnnHnswSpec.
    * @return (query_id, ef, match_id, score, rank) with ef as long */
  def searchMulti(graph: DataFrame, queries: DataFrame, k: Int,
                  efQueries: Seq[Int], queryId: String = "query_id",
                  queryVec: String = "query_vec"): DataFrame = {
    import graph.sparkSession.implicits._
    val qs: Array[(Long, Array[Float])] = queries
      .select(col(queryId).cast("long"), col(queryVec).cast("array<float>"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val efs = efQueries.map(e => math.max(1, e))
    val delCol =
      if (graph.columns.contains("deleted")) col("deleted") else lit(false)
    val scored = graph
      .select(col("shard"), col("local_idx"), col("vec_id"), col("embedding"),
        col("neighbor_idx"), delCol.as("deleted"))
      .as[(Int, Int, Long, Array[Float], Array[Int], Boolean)]
      .repartition(col("shard"))
      .mapPartitions { rows =>
        val byShard = rows.toArray.groupBy(_._1)
        byShard.iterator.flatMap { case (_, shardRows) =>
          val n = shardRows.length
          val g = new NswGraph(1, 1) // container only; adjacency is restored
          val ids = new Array[Long](n)
          val vecs = new Array[Array[Float]](n)
          val adjs = new Array[Array[Int]](n)
          val dels = new Array[Boolean](n)
          shardRows.foreach { case (_, li, id, vec, nbs, del) =>
            ids(li) = id; vecs(li) = vec; adjs(li) = nbs; dels(li) = del
          }
          var i = 0
          while (i < n) {
            g.ids += ids(i); g.vecs += vecs(i)
            g.adj += (new mutable.ArrayBuffer[Int](adjs(i).length) ++= adjs(i))
            i += 1
          }
          val anyDeleted = dels.exists(identity)
          val allowed: Int => Boolean =
            if (anyDeleted) (i: Int) => !dels(i) else (_: Int) => true
          efs.iterator.flatMap { ef =>
            qs.iterator.flatMap { case (qid, qvec) =>
              g.searchBeam(qvec, ef, allowed).take(k).map { case (d, i) =>
                (ef.toLong, qid, g.ids(i), roundHalfUp4(d))
              }
            }
          }
        }
      }
      .toDF("ef", "query_id", "match_id", "score")
    KnnTopK.boundedTopK(scored, k, asc = true, extraKeys = Seq("ef"))
  }

  /** Binary-quantized graph serving — the beam routes on HAMMING
    * distance over packed sign bits (the 32× cheaper per-hop distance of
    * the BQ cascade, [[Quantize.bqSearchRerank]], applied to the GRAPH
    * traversal), then the ef pool reranks by EXACT cosine inside the
    * same shard task — the float vectors are co-resident, so the rerank
    * costs pool·dim multiplies and ships nothing.
    *
    * Packing matches `VectorExprs.BqPack` bit-for-bit (bit set iff
    * component > 0, 64 components per long word), so the quantization
    * here IS the persisted `bq_code` layout's. Codes are packed at shard
    * restore (one O(n·dim) pass — the cost of a single full-shard
    * distance sweep) and could equally be persisted columns; emitted
    * scores are [[cosineDist]] + 4dp round, directly comparable to the
    * exact twin for recall gating.
    *
    * @param efQuery beam width AND rerank pool size per shard */
  def searchBq(graph: DataFrame, queries: DataFrame, k: Int, efQuery: Int,
               queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    import graph.sparkSession.implicits._
    val qs: Array[(Long, Array[Float])] = queries
      .select(col(queryId).cast("long"), col(queryVec).cast("array<float>"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val ef = math.max(1, efQuery)
    val delCol =
      if (graph.columns.contains("deleted")) col("deleted") else lit(false)
    def pack(v: Array[Float]): Array[Long] = {
      val words = new Array[Long]((v.length + 63) >>> 6)
      var i = 0
      while (i < v.length) {
        if (v(i).toDouble > 0.0) words(i >>> 6) |= 1L << (i & 63)
        i += 1
      }
      words
    }
    val packedQs = qs.map { case (qid, qv) => (qid, qv, pack(qv)) }
    val scored = graph
      .select(col("shard"), col("local_idx"), col("vec_id"), col("embedding"),
        col("neighbor_idx"), delCol.as("deleted"))
      .as[(Int, Int, Long, Array[Float], Array[Int], Boolean)]
      .repartition(col("shard"))
      .mapPartitions { rows =>
        val byShard = rows.toArray.groupBy(_._1)
        byShard.iterator.flatMap { case (_, shardRows) =>
          val n = shardRows.length
          val g = new NswGraph(1, 1)
          val ids = new Array[Long](n)
          val vecs = new Array[Array[Float]](n)
          val adjs = new Array[Array[Int]](n)
          val dels = new Array[Boolean](n)
          shardRows.foreach { case (_, li, id, vec, nbs, del) =>
            ids(li) = id; vecs(li) = vec; adjs(li) = nbs; dels(li) = del
          }
          var i = 0
          while (i < n) {
            g.ids += ids(i); g.vecs += vecs(i)
            g.adj += (new mutable.ArrayBuffer[Int](adjs(i).length) ++= adjs(i))
            i += 1
          }
          val codes = new Array[Array[Long]](n)
          i = 0
          while (i < n) { codes(i) = pack(vecs(i)); i += 1 }
          val anyDeleted = dels.exists(identity)
          val allowed: Int => Boolean =
            if (anyDeleted) (j: Int) => !dels(j) else (_: Int) => true
          packedQs.iterator.flatMap { case (qid, qvec, qcode) =>
            def hamming(j: Int): Double = {
              val c = codes(j)
              var w = 0; var h = 0
              while (w < c.length) {
                h += java.lang.Long.bitCount(qcode(w) ^ c(w)); w += 1
              }
              h.toDouble
            }
            val pool = g.searchBeamWith(hamming, ef, allowed)
            // exact-cosine rerank of the Hamming-routed pool, id tiebreak
            pool.map { case (_, j) => (cosineDist(qvec, vecs(j)), j) }
              .sorted(Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
                .on[(Double, Int)] { case (d, j) => (d, g.ids(j)) })
              .take(k)
              .map { case (d, j) => (qid, g.ids(j), roundHalfUp4(d)) }
          }
        }
      }
      .toDF("query_id", "match_id", "score")
    KnnTopK.boundedTopK(scored, k, asc = true)
  }
}
