package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling + corpus-packing operators for training-data
  * pipelines (SURVEY §2.9 family): every operator here is a pure,
  * shuffle-minimal column expression over a stable content/id hash, so a
  * sample is reproducible run-over-run, engine-over-engine — the property
  * that matters when a 100 TB corpus is subset once and trained on for
  * months. No `rand()`: Spark's sample() draws differently per partition
  * layout, which silently changes the dataset under repartitioning.
  */
object Sampling {

  /** Uniform-in-expectation deterministic keep-predicate: keep a row iff
    * the leading 4 hex digits of md5(id) fall below fraction * 16^4.
    * md5 of the same id string is identical in every engine, so the
    * sampled set is stable and oracle-checkable. */
  def hashKeep(idCol: Column, fraction: Double): Column = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction outside [0,1]")
    val cut = math.floor(fraction * 65536).toLong
    if (cut >= 65536) lit(true)
    else substring(md5(idCol.cast("string")), 1, 4) < lit(f"$cut%04x")
  }

  /** Deterministic ~`fraction` sample by id hash. Narrow map — no
    * shuffle, no state, stable under any partitioning. */
  def sampleByHash(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(hashKeep(col(idCol), fraction))

  /** Per-stratum deterministic sampling: each stratum value keeps its own
    * fraction (e.g. downsample web text, keep all code). Unlisted strata
    * keep `defaultFraction`. */
  def sampleStratified(df: DataFrame, idCol: String, stratumCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 1.0): DataFrame = {
    val keep = fractions.foldLeft(
      when(lit(false), lit(false))) { case (acc, (stratum, f)) =>
        acc.when(col(stratumCol) === stratum, hashKeep(col(idCol), f))
      }.otherwise(hashKeep(col(idCol), defaultFraction))
    df.filter(keep)
  }

  /** Exactly-k-per-group deterministic sample (eval-set carving: "500
    * docs per source"): rows ranked inside each group by the md5 of
    * their id (a stable pseudo-random order), first k kept. One window
    * per group — Spark 4's WindowGroupLimit discards non-qualifying rows
    * before the exchange. */
  def sampleKPerGroup(df: DataFrame, idCol: String, groupCol: String,
                      k: Int): DataFrame = {
    require(k >= 0, s"k $k must be >= 0")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Deterministic train/val/test split assignment: the md5 hash line
    * [0, 16^4) is cut at the cumulative fractions and every row gets the
    * split its hash lands in. Same hash gate as [[hashKeep]], so split
    * membership is stable under repartitioning, engine changes, and
    * incremental corpus growth (a doc's split never changes when other
    * docs are added — the property that keeps eval sets uncontaminated
    * across corpus versions).
    * @param splits (name, fraction) in declaration order; fractions must
    *               sum to 1 (last split absorbs the rounding remainder) */
  def splitAssign(df: DataFrame, idCol: String,
                  splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got $splits")
    val h = substring(md5(col(idCol).cast("string")), 1, 4)
    val cuts = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val assigned = splits.init.zip(cuts.init).foldLeft(when(lit(false), lit(""))) {
      case (acc, ((name, _), cum)) =>
        acc.when(h < lit(f"${math.floor(cum * 65536).toLong}%04x"), lit(name))
    }.otherwise(lit(splits.last._1))
    df.withColumn("split", assigned)
  }

  /** Temperature resampling at T=2 (alpha = 1/T = 0.5): group g keeps
    * docs with acceptance probability sqrt(min_count / count_g), so the
    * sampled group sizes are proportional to sqrt(count) — the standard
    * move to un-skew a multi-source/multi-lingual corpus without
    * flattening it (smallest group keeps ~everything). sqrt is IEEE
    * correctly-rounded everywhere (general-alpha pow is libm-dependent
    * and NOT engine-portable — this operator deliberately fixes
    * alpha = 0.5). The acceptance threshold is floored onto the same
    * 4-hex-digit grid as [[hashKeep]] and capped at 0xffff, so the
    * smallest group's probability is 65535/65536, not exactly 1.
    * Two tiny aggregates (group counts + their min) broadcast into a
    * narrow filter — no corpus shuffle. */
  def sampleTemperature(df: DataFrame, idCol: String,
                        groupCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__cnt"))
    val minC = counts.agg(min(col("__cnt")).as("__minc"))
    df.join(broadcast(counts), groupCol)
      .crossJoin(broadcast(minC))
      .filter(substring(md5(col(idCol).cast("string")), 1, 4) <
        format_string("%04x",
          least(floor(sqrt(col("__minc").cast("double") / col("__cnt")) * 65536),
            lit(65535L))))
      .drop("__cnt", "__minc")
  }

  /** Pack documents into token-budget shards, per `partitionCol`
    * (e.g. source): docs are laid out in id order and
    * shard = floor(exclusive-prefix-sum / budget). Shards are prefix-sum
    * BUCKETS, not greedy bins: a doc straddling a budget boundary stays in
    * the earlier shard, so a shard may overflow the budget by up to one
    * doc (and never underfills by more than one). Deterministic,
    * expressible as one window per partition; partitioning bounds the
    * window's sort to a stratum, which is what keeps a global ordering
    * requirement from serializing the corpus at scale.
    * @return input + (n_tokens, shard) */
  def packByTokenBudget(docs: DataFrame, tokensCol: Column, budget: Long,
                        partitionCol: String, idCol: String = "doc_id"): DataFrame = {
    require(budget > 0, s"token budget $budget must be positive")
    val w = Window.partitionBy(col(partitionCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("n_tokens", tokensCol.cast("long"))
      .withColumn("shard",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / budget))
  }

  /** Deterministic epoch shuffle: the global training-order permutation
    * as a QUERY, not an in-memory shuffle. Every row hashes to a shard
    * (`md5(seed:id)` — a new seed is a fresh, reproducible permutation)
    * and gets its position within the shard by hash order; the training
    * reader consumes shards in any order, positions in order, and the
    * concatenation is the epoch's document order.
    *
    * Scale shape: one hash-partitioned exchange on shard plus a
    * PER-SHARD sort — numShards independent sorts of corpus/numShards
    * rows each, never a single global order-by (the thing that
    * serializes an epoch shuffle at 100 TB). Stability: a doc's
    * (shard, position) never depends on partitioning or engine, only on
    * (seed, id, the shard's member set). */
  def epochShuffle(df: DataFrame, idCol: String, seed: String,
                   numShards: Int): DataFrame = {
    require(numShards >= 1 && numShards <= 256,
      s"numShards $numShards must be in [1, 256] (two hex digits of spread)")
    val h = md5(concat(lit(seed), lit(":"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    df.withColumn("__h", h)
      .withColumn("shard",
        pmod(conv(substring(col("__h"), 1, 2), 16, 10).cast("long"),
          lit(numShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
  }

  /** Rebalance the corpus toward a TARGET group mixture (the "data
    * mixing" step of pretraining-corpus assembly — Pile/Dolma-style
    * source weights): compute, IN-PLAN, the largest achievable total
    * `M = min_g count_g / target_g` and keep each group at acceptance
    * fraction `f_g = min(1, target_g·M / count_g)` via the deterministic
    * md5-hash gate — so the output mix approaches the target shares
    * while the bottleneck group is kept (nearly) whole and no group
    * oversamples. Groups absent from `targets` are dropped (a 0-share
    * mixture component).
    *
    * Scale shape: one group-count aggregation, two broadcast 1-row/
    * group-sized frames, then a narrow hash-gate filter — the corpus is
    * scanned once and never shuffled. Reproducible under any
    * partitioning/engine (same contract as every sampler here) and
    * oracle-replayable: fractions are fixed-parenthesization doubles and
    * the gate is [[hashKeep]]'s 4-hex-digit cut.
    *
    * @return (idCol, groupCol) — the kept rows */
  def sampleToMixture(df: DataFrame, idCol: String, groupCol: String,
                      targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0),
      "targets must be non-empty positive shares")
    val spark = df.sparkSession
    import spark.implicits._
    val t = targets.toSeq.toDF(groupCol, "__t")
    val c = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__c"))
    val withT = c.join(broadcast(t), Seq(groupCol), "inner")
    val m = withT.agg(min(col("__c").cast("double") / col("__t")).as("__m"))
    val f = withT.crossJoin(broadcast(m))
      .select(col(groupCol),
        least(lit(1.0), col("__t") * col("__m") / col("__c").cast("double"))
          .as("__f"))
    df.join(broadcast(f), Seq(groupCol), "inner")
      .filter(substring(md5(col(idCol).cast("string")), 1, 4) <
        format_string("%04x",
          least(floor(col("__f") * 65536), lit(65535.0)).cast("int")))
      .select(col(idCol), col(groupCol))
  }

  /** Weighted sampling WITHOUT replacement — k rows per group drawn with
    * probability proportional to `weightCol` (Efraimidis & Spirakis
    * 2006, exponential-race form): every row draws the md5-derived
    * uniform u(id) and competes with `key = −ln(u)/w`; the k SMALLEST
    * keys per group are an exact weight-proportional without-replacement
    * draw. The quality-weighted subset carve ("keep the 10k best-scored
    * docs per language, diversity preserved") with the same reproducible
    * no-`rand()` contract as every sampler here: the draw depends only on
    * (id, weight), never on partitioning or engine.
    *
    * Scale shape: one narrow projection (md5 + ln per row) and one
    * per-group top-k window — Spark 4's WindowGroupLimit keeps only k
    * candidates per group per partition below the exchange, so the
    * shuffle carries O(groups·k·partitions), not the corpus. Keys round
    * to 6dp before ranking (id tiebreak) — the cross-engine contract
    * [[graft.operators.Dsir.gumbelNoise]] established for ln-derived
    * keys. Rows with weight ≤ 0 never sample (their race key is
    * undefined).
    *
    * @return (groupCol, idCol, key, rank) — rank 1..k inside each group */
  def sampleWeightedPerGroup(df: DataFrame, idCol: String, weightCol: String,
                             groupCol: String, k: Int): DataFrame = {
    require(k > 0, s"k $k must be positive")
    val u = (conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long").cast("double") + lit(0.5)) / lit(4294967296.0)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__key").asc, col(idCol).asc)
    df.filter(col(weightCol) > 0)
      .withColumn("__key", round(-log(u) / col(weightCol).cast("double"), 6))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col(groupCol), col(idCol), col("__key").as("key"),
        col("__rk").cast("long").as("rank"))
  }
}
