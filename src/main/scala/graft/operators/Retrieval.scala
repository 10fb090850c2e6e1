package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Keyword retrieval + hybrid fusion — the text half of a modern
  * retrieval stack (the reference serves only the vector half,
  * `/root/reference/executor.py:73-125`; production search fuses both).
  *
  * Scale shape: BM25 is two hash aggregations (per-doc tf over the
  * query's terms only — the corpus explode is filtered to the handful of
  * query terms BEFORE any shuffle — and a vocabulary-sized df table that
  * broadcasts) plus one top-k. RRF fusion joins two already-reduced
  * top-k lists: driver-trivial at any corpus size.
  *
  * Determinism: BM25 here uses the RATIONAL idf `(N - df + ½)/(df + ½)`
  * — the argument of the textbook log-idf, monotone in it per term —
  * and fixed left-associated arithmetic, with per-term scores summed in
  * decimal. No libm in any score (see text_top_terms for the rationale);
  * rankings for a fixed query match the log form whenever one term
  * dominates and stay deterministic cross-engine always.
  */
object Retrieval {

  /** BM25-shaped top-k keyword search.
    * @return (idCol, score, rank), rank 1-based, score rounded to 4dp
    *         BEFORE ranking with an id tiebreak */
  def bm25(docs: DataFrame, queryTerms: Seq[String], k: Int = 10,
           k1: Double = 1.2, b: Double = 0.75,
           idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val withDl = docs.select(col(idCol), Dedup.tokens(col(textCol)).as("__ts"))
      .select(col(idCol), size(col("__ts")).cast("long").as("__dl"), col("__ts"))
    val stats = withDl.agg(count(lit(1)).as("__n"),
      (sum(col("__dl")).cast("double") / count(lit(1))).as("__avgdl"))
    val termsLit = array(queryTerms.map(lit): _*)
    val tf = withDl
      .select(col(idCol), col("__dl"), explode(col("__ts")).as("__term"))
      .filter(array_contains(termsLit, col("__term")))
      .groupBy(col(idCol), col("__dl"), col("__term"))
      .agg(count(lit(1)).as("__tf"))
    // document frequency as a COUNT WINDOW over the already-reduced tf
    // frame (≤ |terms|·N rows): a separate `tf.groupBy(term)` + join
    // re-executes the whole scan+tokenize subtree — a third full corpus
    // pass at 100 TB — because Spark re-computes shared subtrees rather
    // than splitting the dataflow
    val dfw = Window.partitionBy(col("__term"))
    val scored = tf.withColumn("__df", count(lit(1)).over(dfw))
      .crossJoin(broadcast(stats))
      .withColumn("__s", bm25TermScore(col("__tf"), col("__df"), col("__dl"),
        col("__n"), col("__avgdl"), k1, b))
    val agg = scored.groupBy(col(idCol))
      .agg(round(sum(col("__s")).cast("double"), 4).as("score"))
    rankTopK(agg, k, idCol, col("score"))
  }

  /** Per-(doc, term) BM25 contribution — ONE expression shared by the
    * scan path ([[bm25]]) and the index-served path ([[bm25FromIndex]])
    * so the two are bit-identical by construction, not by review.
    * Parenthesization mirrors the SQL oracle token for token; note
    * k1+1 is COMPUTED (1.2 + 1 != the double literal 2.2 by one ulp). */
  private def bm25TermScore(tf: Column, df: Column, dl: Column,
                            n: Column, avgdl: Column,
                            k1: Double, b: Double): Column = {
    val idf = (n - df + lit(0.5)) / (df + lit(0.5))
    ((idf * (tf * lit(k1 + 1))) /
      (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * dl / avgdl)))
      .cast("decimal(20,10)")
  }

  /** Build + persist a BM25 inverted index — the text analog of the
    * reference's build-once/serve-many vector lifecycle
    * (`/root/reference/executor.py:51-57`): pay the corpus scan,
    * tokenization, and both corpus-wide aggregations ONCE at build time,
    * so every query afterwards touches only its own terms' postings.
    *
    * Layout under `dir`:
    *   - `postings/bucket=<b>/` — (term, idCol, tf, dl): one row per
    *     (document, distinct term), term-bucket-partitioned by
    *     `pmod(xxhash64(term), numBuckets)` so a query's scan prunes to
    *     ≤ |query terms| directories (PartitionFilters, zero data read
    *     outside them);
    *   - `terms/bucket=<b>/` — (term, df): the document-frequency table,
    *     pruned the same way and broadcast at serve time;
    *   - `stats/` — one row (n, avgdl, num_buckets), computed with the
    *     exact arithmetic [[bm25]]'s scan-path stats use.
    *
    * Scale shape: the build is the same two hash aggregations the scan
    * path pays per query, plus the write. At 100 TB the postings table is
    * vocabulary×docs-sparse (far smaller than the corpus — no text), and
    * serving cost is O(postings of the query's terms), independent of
    * corpus size. */
  def buildBm25Index(docs: DataFrame, dir: String, numBuckets: Int = 64,
                     idCol: String = "doc_id", textCol: String = "text"): Unit = {
    require(numBuckets > 0, "numBuckets must be positive")
    val spark = docs.sparkSession
    val withDl = docs.select(col(idCol), Dedup.tokens(col(textCol)).as("__ts"))
      .select(col(idCol), size(col("__ts")).cast("long").as("__dl"), col("__ts"))
    withDl.select(col(idCol), col("__dl"), explode(col("__ts")).as("term"))
      .groupBy(col(idCol), col("__dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .select(col("term"), col(idCol), col("tf"), col("__dl").as("dl"),
        pmod(xxhash64(col("term")), lit(numBuckets.toLong)).cast("int").as("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/postings")
    // df from the WRITTEN postings (one row per (doc, term) ⇒ count = df):
    // re-reading the reduced table avoids re-executing the corpus
    // scan+tokenize subtree a groupBy over the pre-write frame would pay
    spark.read.parquet(s"$dir/postings")
      .groupBy(col("term"), col("bucket")).agg(count(lit(1)).as("df"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/terms")
    // stats arithmetic mirrors bm25's scan-path stats exactly: docs with
    // zero tokens still count toward n and avgdl; sum_dl is kept so
    // incremental appends can extend the EXACT same arithmetic
    withDl.agg(count(lit(1)).as("n"), sum(col("__dl")).as("sum_dl"),
        (sum(col("__dl")).cast("double") / count(lit(1))).as("avgdl"))
      .withColumn("num_buckets", lit(numBuckets))
      .write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** Append a document batch to a saved BM25 index with
    * DELTA-PROPORTIONAL work — the text twin of the ANN side's
    * incremental ingest (`KnnIvf.appendTo`): new postings append under
    * only their term buckets, the df table is recomputed for TOUCHED
    * buckets only (dynamic partition overwrite; untouched buckets'
    * counts cannot have changed), and the stats row extends the exact
    * sums — so an appended index equals a from-scratch rebuild of the
    * union corpus, row for row (spec-pinned, and the driver gate serves
    * from an appended index against the full-corpus scan oracle).
    * Bounded collects: the 1-row stats and the ≤ numBuckets touched
    * bucket ids. */
  def appendToBm25Index(newDocs: DataFrame, dir: String,
                        idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val spark = newDocs.sparkSession
    val st = spark.read.parquet(s"$dir/stats").head()
    val numBuckets = st.getAs[Int]("num_buckets")
    val oldN = st.getAs[Long]("n")
    val oldSum = st.getAs[Long]("sum_dl")
    // pinned: the batch frame feeds postings, touched-bucket discovery,
    // and the stats delta
    val withDl = newDocs.select(col(idCol), Dedup.tokens(col(textCol)).as("__ts"))
      .select(col(idCol), size(col("__ts")).cast("long").as("__dl"), col("__ts"))
      .localCheckpoint(true)
    val delta = withDl.select(col(idCol), col("__dl"), explode(col("__ts")).as("term"))
      .groupBy(col(idCol), col("__dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .select(col("term"), col(idCol), col("tf"), col("__dl").as("dl"),
        pmod(xxhash64(col("term")), lit(numBuckets.toLong)).cast("int").as("bucket"))
    delta.write.mode("append").partitionBy("bucket").parquet(s"$dir/postings")
    val touched = delta.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).toSeq
    if (touched.nonEmpty) {
      spark.read.parquet(s"$dir/postings")
        .filter(col("bucket").isin(touched: _*))
        .groupBy(col("term"), col("bucket")).agg(count(lit(1)).as("df"))
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket").parquet(s"$dir/terms")
    }
    val b = withDl.agg(count(lit(1)).as("c"), sum(col("__dl")).as("s")).head()
    val n2 = oldN + b.getAs[Long]("c")
    val sum2 = oldSum + (if (b.isNullAt(1)) 0L else b.getAs[Long]("s"))
    import spark.implicits._
    // avgdl via the same double division the build's aggregate compiles
    Seq((n2, sum2, sum2.toDouble / n2.toDouble, numBuckets))
      .toDF("n", "sum_dl", "avgdl", "num_buckets")
      .write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** BM25 served from a [[buildBm25Index]] index: no corpus scan, no
    * tokenization, no corpus-wide aggregation in the query path — the
    * postings read prunes to the query terms' bucket directories, the
    * df table broadcasts, and the per-term arithmetic is [[bm25TermScore]],
    * the SAME expression the scan path compiles, so index-served results
    * equal scan results exactly (spec-pinned; the driver entry shares
    * [[bm25]]'s oracle outright).
    * Bounded collects: the 1-row stats frame (numBuckets + broadcast
    * stats) and the ≤ |queryTerms| bucket ids. */
  def bm25FromIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                    queryTerms: Seq[String], k: Int = 10,
                    k1: Double = 1.2, b: Double = 0.75,
                    idCol: String = "doc_id"): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val statsRow = spark.read.parquet(s"$dir/stats")
    val numBuckets = statsRow.select(col("num_buckets")).head().getInt(0)
    import spark.implicits._
    // bucket ids through the same xxhash64 expression the build used,
    // evaluated on a |terms|-row local frame (bounded collect)
    val buckets = queryTerms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(numBuckets.toLong)).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val termsLit = array(queryTerms.map(lit): _*)
    val postings = spark.read.parquet(s"$dir/postings")
      .filter(col("bucket").isin(buckets: _*) && array_contains(termsLit, col("term")))
    val dfTbl = spark.read.parquet(s"$dir/terms")
      .filter(col("bucket").isin(buckets: _*) && array_contains(termsLit, col("term")))
      .select(col("term"), col("df").as("__df"))
    val stats = statsRow.select(col("n").as("__n"), col("avgdl").as("__avgdl"))
    val scored = postings.join(broadcast(dfTbl), "term")
      .crossJoin(broadcast(stats))
      .withColumn("__s", bm25TermScore(col("tf"), col("__df"), col("dl"),
        col("__n"), col("__avgdl"), k1, b))
    val agg = scored.groupBy(col(idCol))
      .agg(round(sum(col("__s")).cast("double"), 4).as("score"))
    rankTopK(agg, k, idCol, col("score"))
  }

  /** Ranking-quality metrics — the evaluation half of the retrieval
    * stack: given a system ranking and a gold relevant set (both
    * (queryCol, idCol[, rank]) frames), emit per-query MRR and nDCG@k.
    * The joins touch only the two top-k-bounded frames (never a corpus),
    * and the arithmetic is engine-replayable: per-rank gains
    * `1/log2(rank+1)` round to 6dp and sum in DECIMAL, the ideal DCG is
    * the same sum over ranks 1..min(k,|gold|), and ndcg = dcg/idcg
    * rounded 4dp half-up in integer-free double division guarded by the
    * 6dp-quantized operands (identical in any engine).
    *
    * @param ranking (queryCol, idCol, rank) — rank 1-based
    * @param gold    (queryCol, idCol) — the relevant set per query
    * @return (queryCol, rr, dcg, idcg, ndcg) one row per query IN GOLD
    *         (queries with no ranked rows score 0) */
  def rankingMetrics(ranking: DataFrame, gold: DataFrame, k: Int,
                     queryCol: String = "query_id",
                     idCol: String = "doc_id"): DataFrame = {
    require(k > 0)
    val r = ranking.filter(col("rank") <= k)
      .select(col(queryCol), col(idCol), col("rank"))
    val hits = gold.join(r, Seq(queryCol, idCol), "left")
    // per-rank gain quantized at 6dp BEFORE the decimal sum — order-free
    val gain = round(lit(1.0) / log2(col("rank") + lit(1.0)), 6)
    val perQuery = hits.groupBy(col(queryCol)).agg(
      coalesce(round(lit(1.0) / min(col("rank")), 6), lit(0.0)).as("rr"),
      coalesce(sum(when(col("rank").isNotNull, gain.cast("decimal(18,6)"))),
        lit(0).cast("decimal(18,6)")).as("__dcg"),
      count(lit(1)).as("__n_gold"))
    // ideal DCG: gains at ranks 1..min(k, |gold|), summed with the same
    // quantization (a sequence explode over ≤ k rows per query)
    val ideal = perQuery.select(col(queryCol), col("__n_gold"))
      .select(col(queryCol),
        explode(sequence(lit(1L), least(col("__n_gold"), lit(k.toLong))))
          .as("__r"))
      .groupBy(col(queryCol))
      .agg(sum(round(lit(1.0) / log2(col("__r") + lit(1.0)), 6)
        .cast("decimal(18,6)")).as("__idcg"))
    perQuery.join(ideal, Seq(queryCol))
      .select(col(queryCol), col("rr"),
        col("__dcg").cast("double").as("dcg"),
        col("__idcg").cast("double").as("idcg"),
        round(col("__dcg").cast("double") / col("__idcg").cast("double"), 4)
          .as("ndcg"))
  }

  /** Top-k + 1-based rank without a whole-result single-partition window:
    * `orderBy(...).limit(k)` plans as TakeOrderedAndProject (per-partition
    * top-k, driver-side merge of ≤ k·partitions rows), and only the ≤ k
    * surviving rows pass through the rank window. The global-window
    * formulation this replaces pushed EVERY scored row through one task —
    * for BM25 that is every document matching any query term, a full
    * corpus subset at 100 TB with one common term. */
  private def rankTopK(scored: DataFrame, k: Int, idCol: String,
                       scoreCol: Column): DataFrame = {
    val top = scored.orderBy(scoreCol.desc, col(idCol).asc).limit(k)
    val w = Window.orderBy(scoreCol.desc, col(idCol).asc)
    top.withColumn("rank", row_number().over(w).cast("long"))
  }

  /** Reciprocal-rank fusion of two ranked lists (Cormack, Clarke,
    * Buettcher, SIGIR 2009): `Σ 1/(kRrf + rank)` over the lists a doc
    * appears in. Inputs are (idCol, rank) frames — already top-k-reduced,
    * so the full-outer join and global window run over at most
    * |a| + |b| rows regardless of corpus size.
    * @return (idCol, rrf, rank) top-k by fused score */
  def rrfFuse(a: DataFrame, bDf: DataFrame, k: Int = 10, kRrf: Int = 60,
              idCol: String = "doc_id"): DataFrame = {
    val l = a.select(col(idCol), col("rank").as("__ra"))
    val r = bDf.select(col(idCol), col("rank").as("__rb"))
    val fused = l.join(r, Seq(idCol), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(kRrf) + col("__ra")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf) + col("__rb")), lit(0.0)), 6))
    // input already ≤ |a| + |b| rows, but keep the bounded rank shape for
    // plan uniformity (no single-partition exchange over the fused list)
    rankTopK(fused.select(col(idCol), col("rrf")), k, idCol, col("rrf"))
  }

  /** Maximal-Marginal-Relevance re-rank (Carbonell & Goldstein, SIGIR
    * 1998): greedily pick the candidate maximizing
    * `λ·rel − (1−λ)·max_sim_to_already_picked` — relevance with a
    * diversity penalty, the standard fix for near-duplicate top-k lists.
    *
    * Scale shape: MMR is inherently sequential, but only WITHIN a query's
    * candidate list — which the upstream k-NN already bounded to `n` rows.
    * So: join candidate vectors (one hash join), then `flatMapGroups` per
    * query — each group is an O(n²·d) in-memory greedy pass over ≤ n
    * candidates, queries run embarrassingly parallel. Nothing quadratic
    * ever touches the corpus.
    *
    * Determinism: relevance is the upstream 4dp score; the greedy argmax
    * tie-breaks on (rounded marginal score, match_id).
    *
    * @param candidates (query_id, match_id, score) — score a cosine
    *                   DISTANCE as produced by the knn operators
    * @param vectors    (idCol, vecCol) lookup side for candidate vectors
    * @return (query_id, match_id, mmr, rank) — `mmr` the 4dp-rounded
    *         marginal score at selection time */
  def mmrRerank(candidates: DataFrame, vectors: DataFrame, k: Int,
                lambda: Double = 0.7,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda $lambda not in [0,1]")
    val joined = candidates
      .join(vectors.select(col(idCol).as("match_id"),
        col(vecCol).cast("array<double>").as("__v")), "match_id")
      .select(col("query_id").cast("long"), col("match_id").cast("long"),
        col("score").cast("double"), col("__v"))
    val spark = joined.sparkSession
    import spark.implicits._
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val denom = math.sqrt(na) * math.sqrt(nb)
      // a zero-norm vector has no direction: its similarity to anything is
      // 0, not 0/0 = NaN (NaN would survive the maxSimToSel refresh below
      // and reach BigDecimal as a NumberFormatException)
      if (denom == 0.0) 0.0 else dp / denom
    }
    joined.as[(Long, Long, Double, Array[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        // candidates in deterministic relevance order (distance asc, id)
        val cands = it.toArray.sortBy(t => (t._3, t._2))
        val nC = cands.length
        val picked = Array.fill(nC)(false)
        // -inf, not 0: a clamp at 0 would erase NEGATIVE max-similarities
        // (anti-correlated candidates) from the diversity term. Every
        // unpicked slot is refreshed right after the first pick, so the
        // sentinel never reaches the formula (r == 1 forces pen = 0).
        val maxSimToSel = Array.fill(nC)(Double.NegativeInfinity)
        val out = Seq.newBuilder[(Long, Long, Double, Long)]
        var r = 1
        var exhausted = false
        while (!exhausted && r <= math.min(k, nC)) {
          var best = -1; var bestScore = Double.NegativeInfinity
          var i = 0
          while (i < nC) {
            if (!picked(i)) {
              val rel = 1.0 - cands(i)._3
              val pen = if (r == 1) 0.0 else maxSimToSel(i)
              // a non-finite marginal (NaN upstream score) ranks strictly
              // worst instead of reaching BigDecimal (which throws on it)
              val raw = lambda * rel - (1.0 - lambda) * pen
              val m = if (java.lang.Double.isFinite(raw))
                BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
              else Double.NegativeInfinity
              if (m > bestScore || (m == bestScore && best >= 0 && cands(i)._2 < cands(best)._2)) {
                best = i; bestScore = m
              }
            }
            i += 1
          }
          if (best < 0) { exhausted = true } else {
          picked(best) = true
          out += ((qid, cands(best)._2, bestScore + 0.0, r.toLong))
          var j = 0
          while (j < nC) {
            if (!picked(j)) {
              val s = cos(cands(j)._4, cands(best)._4)
              if (s > maxSimToSel(j)) maxSimToSel(j) = s
            }
            j += 1
          }
          r += 1
          }
        }
        out.result()
      }
      .toDF("query_id", "match_id", "mmr", "rank")
  }

  /** Brute-force twin of [[mmrRerank]]: the textbook greedy MMR loop
    * (Carbonell & Goldstein eq. 1) with the diversity penalty recomputed
    * FROM SCRATCH over the selected set every round — O(k²·n) cosines vs
    * the flagship's O(k·n) incremental refresh, no sentinel array, no
    * shared state. Deliberately a different formulation of the same
    * definition: [[graft.SparkEntry]]'s `retrieval_mmr_agreement` gates
    * the two producing identical (query_id, match_id, rank) selections,
    * which is only true while both faithfully implement the definition.
    * Verification twin — not a serving path. */
  def mmrRerankBrute(candidates: DataFrame, vectors: DataFrame, k: Int,
                     lambda: Double = 0.7,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda $lambda not in [0,1]")
    val joined = candidates
      .join(vectors.select(col(idCol).as("match_id"),
        col(vecCol).cast("array<double>").as("__v")), "match_id")
      .select(col("query_id").cast("long"), col("match_id").cast("long"),
        col("score").cast("double"), col("__v"))
    val spark = joined.sparkSession
    import spark.implicits._
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) 0.0 else dp / denom
    }
    joined.as[(Long, Long, Double, Array[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val cands = it.toArray.sortBy(t => (t._3, t._2))
        var selected = Vector.empty[Int]
        val out = Seq.newBuilder[(Long, Long, Double, Long)]
        var r = 1
        var done = false
        while (!done && r <= math.min(k, cands.length)) {
          // marginal score of every unselected candidate, from first
          // principles: rel = 1 − distance; pen = max cosine to the
          // CURRENT selected set (empty set → 0)
          val marginals = cands.indices.filterNot(selected.contains).map { i =>
            val rel = 1.0 - cands(i)._3
            val pen = if (selected.isEmpty) 0.0
                      else selected.map(s => cos(cands(i)._4, cands(s)._4)).max
            val raw = lambda * rel - (1.0 - lambda) * pen
            val m = if (java.lang.Double.isFinite(raw))
              BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
            else Double.NegativeInfinity
            (i, m)
          }
          val finite = marginals.filter(_._2 > Double.NegativeInfinity)
          if (finite.isEmpty) { done = true } else {
            val (best, score) = finite.minBy { case (i, m) => (-m, cands(i)._2) }
            selected :+= best
            out += ((qid, cands(best)._2, score + 0.0, r.toLong))
            r += 1
          }
        }
        out.result()
      }
      .toDF("query_id", "match_id", "mmr", "rank")
  }

  /** ColBERT-style late-interaction scoring (Khattab & Zaharia, SIGIR
    * 2020): `score(Q, D) = Σ_{q∈Q} max_{d∈D} cos(q, d)` — each query
    * token keeps only its best-matching document token, and a document's
    * score is the sum of those per-token maxima. This is the multi-vector
    * retrieval model the reference's single-vector `/search`
    * (`/root/reference/executor.py:73-125`) cannot express: a document is
    * a BAG of vectors, not one.
    *
    * Scale shape: the query-token set broadcasts (a query is a handful of
    * vectors), so the token-level similarity join is a broadcast
    * nested-loop over the document-token table — no shuffle of the
    * corpus. Everything after is two hash aggregations with map-side
    * partial combine (token-level max, then doc-level sum), each
    * REDUCING cardinality (token pairs → (query, token, doc) → (query,
    * doc)); the final top-k is the bounded [[KnnTopK.boundedTopK]]
    * heap aggregation, so only Q·k of the (queries × docs) scored rows
    * per partition reach the last shuffle — no per-query full sort.
    *
    * Determinism: per-token maxima are order-independent; each max is
    * rounded to 4 dp and summed in decimal (exact, order-independent),
    * so the score is engine-exact — same contract as [[bm25]].
    *
    * @param queryTokens (query_id, tok_id, qv) — one row per query token
    * @param docTokens   (match_id, dv) — one row per document token
    * @return (query_id, match_id, score, rank), rank 1-based with an id
    *         tiebreak, k rows per query */
  def maxSim(queryTokens: DataFrame, docTokens: DataFrame, k: Int = 10): DataFrame = {
    val sims = docTokens.crossJoin(broadcast(queryTokens))
      .select(col("query_id"), col("tok_id"), col("match_id"),
        VectorOps.cosineSimilarity(col("qv"), col("dv")).as("__sim"))
    val perTok = sims.groupBy(col("query_id"), col("tok_id"), col("match_id"))
      .agg(round(max(col("__sim")), 4).cast("decimal(14,4)").as("__mx"))
    val scored = perTok.groupBy(col("query_id"), col("match_id"))
      // signed-zero canonicalization as in [[Knn.knnExact]]
      .agg((round(sum(col("__mx")).cast("double"), 4) + lit(0.0)).as("score"))
    KnnTopK.boundedTopK(scored, k, asc = false)
  }

  /** Mean-pool a token bag into one vector per key — decimal-accumulated
    * per component (order-free), components re-assembled in position
    * order. The single-vector proxy a multi-vector model serves its
    * first retrieval stage with. */
  private def meanPool(tokens: DataFrame, keyCol: String,
                       vecCol: String): DataFrame =
    tokens.select(col(keyCol), posexplode(col(vecCol)).as(Seq("__p", "__x")))
      .groupBy(col(keyCol), col("__p"))
      .agg((sum(col("__x").cast("decimal(20,10)")) / count(lit(1)))
        .cast("double").as("__m"))
      .groupBy(col(keyCol))
      .agg(transform(array_sort(collect_list(struct(col("__p"), col("__m")))),
        s => s.getField("__m")).as(vecCol))

  /** Two-stage MaxSim — how late-interaction retrieval actually serves
    * at scale (score every doc exactly and the token-pair join IS the
    * corpus): stage 1 ranks docs by cosine of MEAN-POOLED vectors (one
    * vector per doc/query — the cheap single-vector scan every ANN
    * index in this repo can accelerate) and keeps `nCandidates` per
    * query; stage 2 runs the exact [[maxSim]] over the candidate docs'
    * token bags only. Token-level work drops from O(corpus) to
    * O(candidates); quality is a recall-vs-exact contract, gated
    * per-round by `retrieval_maxsim_recall`. */
  def maxSimCascade(queryTokens: DataFrame, docTokens: DataFrame,
                    k: Int = 10, nCandidates: Int = 50): DataFrame = {
    val pooledQ = meanPool(queryTokens, "query_id", "qv")
    val pooledD = meanPool(docTokens, "match_id", "dv")
    val coarse = pooledD.crossJoin(broadcast(pooledQ))
      .select(col("query_id"), col("match_id"),
        (round(VectorOps.cosineSimilarity(col("qv"), col("dv")), 4) + lit(0.0))
          .as("score"))
    val candDocs = KnnTopK.boundedTopK(coarse, nCandidates, asc = false)
      .select(col("match_id")).distinct()
    maxSim(queryTokens, docTokens.join(candDocs, Seq("match_id"), "left_semi"), k)
  }

  /** Hard-negative mining for retrieval training: the ranked documents
    * the system scores HIGH that are NOT gold — exactly the examples a
    * dual-encoder/re-ranker trains against (random negatives are too
    * easy; these sit at the decision boundary). One anti-join of the
    * top-k frame against the gold set: work is O(k·queries), never
    * O(corpus), and each negative keeps its (score, rank) provenance
    * so samplers can curriculum over difficulty.
    *
    * Join keys are ALL of `gold`'s columns — pass (query_id, doc_id)
    * gold for multi-query mining so a doc gold for one query can still
    * be a negative for another. */
  def hardNegatives(ranking: DataFrame, gold: DataFrame): DataFrame =
    ranking.join(gold, gold.columns.toSeq, "left_anti")
}
