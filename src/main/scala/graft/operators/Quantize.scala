package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{VectorOps}

/** Scalar (int8) vector quantization — the storage-side half of a
  * 100 TB similarity-search stack: a 64-dim float corpus shrinks 4x
  * (256 B -> 64 B + 4 B scale per vector), which at petabyte scale is
  * the difference between an index that fits the cluster's disks and one
  * that doesn't. Search re-ranks on the dequantized vectors; the recall
  * cost is bounded and spec-measured rather than assumed.
  *
  * Quantization uses floor(x / scale * 127) with a per-vector symmetric
  * scale (max |x_i|): floor instead of round keeps the arithmetic
  * engine-portable (round's half-case tie-breaking differs across
  * engines; floor does not).
  */
object Quantize {

  /** Per-vector symmetric scale: max |x_i| (0-safe). */
  def sqScale(vec: Column): Column =
    greatest(array_max(transform(vec, x => abs(x.cast("double")))), lit(1e-30))

  /** int8 codes: floor(x / scale * 127), clamped to [-127, 127]. */
  def sqEncode(vec: Column, scale: Column): Column =
    transform(vec, x =>
      greatest(least(floor(x.cast("double") / scale * 127.0), lit(127.0)), lit(-127.0))
        .cast("int"))

  /** Dequantize back to float-space approximations. */
  def sqDecode(codes: Column, scale: Column): Column =
    transform(codes, q => (q.cast("double") * scale / 127.0).cast("float"))

  /** Corpus-level encode: (idCol, vecCol) -> (idCol, sq_scale, sq_codes).
    * Narrow map, no shuffle. */
  def encodeCorpus(corpus: DataFrame, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame =
    corpus
      .withColumn("sq_scale", sqScale(col(vecCol)))
      .withColumn("sq_codes", sqEncode(col(vecCol), col("sq_scale")))
      .drop(vecCol)

  /** Decode a quantized corpus back to an approximate float corpus
    * (vecCol restored), ready for any k-NN operator. */
  def decodeCorpus(encoded: DataFrame, vecCol: String = "embedding"): DataFrame =
    encoded
      .withColumn(vecCol, sqDecode(col("sq_codes"), col("sq_scale")))
      .drop("sq_codes", "sq_scale")

  // ===== binary quantization (sign bits + Hamming) =====
  //
  // The 32x compression form: one SIGN bit per dimension, packed 64 per
  // long word (graft.functions.VectorExprs.BqPack). Hamming distance
  // between packed codes counts sign disagreements — for mean-centered
  // embeddings a monotone-enough proxy for cosine that a
  // Hamming-retrieve -> float-rescore cascade recovers near-exact
  // recall while scanning 1/32nd the bytes. Both stages are
  // deterministic (integer scores, id tiebreaks), so the full cascade
  // is SQL-oracle-able, unlike trained-codebook PQ.

  /** Corpus-level sign-bit encode: adds `bq_code: array<bigint>`.
    * Narrow map, no shuffle; keeps vecCol for rescoring. */
  def bqEncodeCorpus(corpus: DataFrame, vecCol: String = "embedding"): DataFrame =
    corpus.withColumn("bq_code", VectorOps.bqPack(col(vecCol)))

  /** Hamming top-k over sign-bit codes: (query_id, match_id,
    * score = Hamming distance as double, rank). If the corpus already
    * carries a `bq_code` column (a persisted [[bqEncodeCorpus]] layout),
    * the scan projects ONLY id + code — parquet column pruning then
    * reads 1/32nd of the float bytes, which is the point of BQ at
    * 100 TB; otherwise codes are packed on the fly (one narrow
    * projection, correct but float-reading). Ties — frequent, since
    * scores are small integers — break by match_id, same as the
    * oracle's ORDER BY. */
  def bqSearch(queries: DataFrame, corpus: DataFrame, k: Int,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col("query_id"),
      VectorOps.bqPack(col("query_vec")).as("__qcode"))
    val encoded =
      if (corpus.columns.contains("bq_code")) corpus else bqEncodeCorpus(corpus, vecCol)
    val scored = encoded
      .select(col(idCol).as("match_id"), col("bq_code"))
      .join(broadcast(q))
      .select(col("query_id"), col("match_id"),
        VectorOps.bqHamming(col("__qcode"), col("bq_code")).cast("double").as("score"))
    KnnTopK.boundedTopK(scored, k, asc = true)
  }

  /** The production BQ cascade: Hamming-retrieve `candidates` per query
    * over packed codes, then rescore ONLY those candidates with exact
    * float cosine and keep top-k. At 100 TB the first stage is the full
    * scan (popcount over 1/32nd the bytes, Q·candidates rows out) and
    * the second touches Q·candidates float vectors — corpus-size float
    * reads never happen. Output matches [[KnnTopK.knnExact]]'s shape
    * and rounding, so recall against the exact twin is measurable and
    * the whole cascade (both tiebreaks pinned) has a DuckDB oracle. */
  def bqSearchRerank(queries: DataFrame, corpus: DataFrame, k: Int,
                     candidates: Int, metric: String = "cosine",
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(candidates >= k, s"candidate pool $candidates must be >= k=$k")
    // stage-1 output is Q·candidates rows — small by construction, so it
    // BROADCASTS against the corpus (the corpus-side float read then
    // prunes to the candidate ids; no corpus shuffle, no stats guessing)
    val stage1 = bqSearch(queries, corpus, candidates, idCol, vecCol)
      .select(col("query_id"), col("match_id"))
    val rescored = corpus.select(col(idCol).as("match_id"), col(vecCol))
      .join(broadcast(stage1), Seq("match_id"))
      .join(broadcast(queries), Seq("query_id"))
      .select(col("query_id"), col("match_id"),
        (round(graft.functions.VectorOps.distance(metric, col("query_vec"), col(vecCol)), 4)
          + lit(0.0)).as("score"))
    KnnTopK.boundedTopK(rescored, k, asc = true)
  }

  /** IVF × BQ — the binary-IVF serving shape (FAISS `IndexBinaryIVF`'s
    * role, here as plan composition): probe pruning picks nProbe cells
    * per query off the persisted index ([[KnnIvf.probeCells]] — the
    * same handoff IVFPQ uses), the Hamming stage scans ONLY those
    * cells' codes (cell equi-join, no corpus-wide read), and the float
    * rescore touches Q·pool candidate vectors. With a cell-partitioned
    * layout the scan is partition-pruned AND 1/32nd-width — the two
    * byte-reduction axes compose multiplicatively. nProbe = numCells
    * with an exhaustive pool degenerates to [[bqSearchRerank]]
    * (spec-pinned). */
  def bqSearchProbed(index: KnnIvf.IvfIndex, queries: DataFrame, k: Int,
                     nProbe: Int, pool: Int, metric: String = "cosine",
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(pool >= k, s"candidate pool $pool must be >= k=$k")
    val probes = KnnIvf.probeCells(index, queries, nProbe)
      .select(col("query_id"), col("query_vec"), col("cell"))
    val qcodes = probes
      .select(col("query_id"), col("cell"), VectorOps.bqPack(col("query_vec")).as("__qcode"))
    val cells = probes.select("cell").distinct().collect().map(_.getInt(0)).sorted
    val pruned = index.corpusWithCell
      .filter(col("cell").isin(cells.map(Integer.valueOf): _*))
    // honor a persisted code column (layout built from bqEncodeCorpus):
    // the probe then column-prunes the floats away, as in [[bqSearch]]
    val prunedCodes =
      (if (pruned.columns.contains("bq_code")) pruned
       else pruned.withColumn("bq_code", VectorOps.bqPack(col(vecCol))))
        .select(col("cell"), col(idCol).as("match_id"), col("bq_code"))
    val hamming = prunedCodes
      .join(broadcast(qcodes), Seq("cell"))
      .select(col("query_id"), col("match_id"),
        VectorOps.bqHamming(col("__qcode"), col("bq_code")).cast("double").as("score"))
    val stage1 = KnnTopK.boundedTopK(hamming, pool, asc = true)
      .select(col("query_id"), col("match_id"))
    val rescored = index.corpusWithCell.select(col(idCol).as("match_id"), col(vecCol))
      .join(broadcast(stage1), Seq("match_id"))
      .join(broadcast(queries), Seq("query_id"))
      .select(col("query_id"), col("match_id"),
        (round(graft.functions.VectorOps.distance(metric, col("query_vec"), col(vecCol)), 4)
          + lit(0.0)).as("score"))
    KnnTopK.boundedTopK(rescored, k, asc = true)
  }

  /** The whole BQ accuracy-vs-cost curve from ONE Hamming scan and ONE
    * rescore pass: retrieve the LARGEST pool once (each candidate
    * carries its Hamming rank), rescore every candidate once, replicate
    * rescored rows to the pools whose budget admits them (rank <= pool,
    * a tiny broadcast theta-join), and take top-k per (query, pool).
    * Per pool p the result rows are IDENTICAL to [[bqSearchRerank]] at
    * candidates=p (spec-pinned): level-p candidates are exactly the
    * Hamming ranks <= p. Output adds `pool` to the knnExact shape.
    * Recall is provably non-decreasing in pool — candidate sets are
    * nested and the rescore is exact, so a true neighbor admitted at
    * pool p survives every pool >= p (at most k−1 rows beat it
    * globally). */
  def bqSearchRerankMulti(queries: DataFrame, corpus: DataFrame, k: Int,
                          pools: Seq[Int], metric: String = "cosine",
                          idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(pools.nonEmpty, "bqSearchRerankMulti needs at least one pool budget")
    require(pools.min >= k, s"smallest pool ${pools.min} must be >= k=$k")
    val stage1 = bqSearch(queries, corpus, pools.max, idCol, vecCol)
      .select(col("query_id"), col("match_id"), col("rank").as("__hrank"))
    val rescored = corpus.select(col(idCol).as("match_id"), col(vecCol))
      .join(broadcast(stage1), Seq("match_id"))
      .join(broadcast(queries), Seq("query_id"))
      .select(col("query_id"), col("match_id"),
        (round(graft.functions.VectorOps.distance(metric, col("query_vec"), col(vecCol)), 4)
          + lit(0.0)).as("score"),
        col("__hrank"))
    val levels = queries.sparkSession
      .createDataFrame(pools.distinct.sorted.map(p => Tuple1(p.toLong)))
      .toDF("pool")
    val multi = rescored.join(broadcast(levels), col("pool") >= col("__hrank"))
    KnnTopK.boundedTopK(
      multi.select(col("query_id"), col("match_id"), col("score"), col("pool")),
      k, asc = true, extraKeys = Seq("pool"))
  }
}
