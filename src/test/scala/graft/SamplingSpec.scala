package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, Sampling, TextOps}
import graft.sources.Tables

class SamplingSpec extends SparkSuite {

  private lazy val docs = Tables.documents(spark, sfDir)

  test("hash sampling is deterministic and near the requested fraction") {
    val ids1 = Sampling.sampleByHash(docs, "doc_id", 0.25).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.sampleByHash(docs, "doc_id", 0.25).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2)
    val f = ids1.size.toDouble / docs.count()
    assert(f > 0.15 && f < 0.35, s"fraction drift: $f")
    // fraction 1.0 and 0.0 are exact
    assert(Sampling.sampleByHash(docs, "doc_id", 1.0).count() === docs.count())
    assert(Sampling.sampleByHash(docs, "doc_id", 0.0).count() === 0)
  }

  test("smaller fractions sample subsets of larger ones (monotone keep sets)") {
    val s10 = Sampling.sampleByHash(docs, "doc_id", 0.10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s30 = Sampling.sampleByHash(docs, "doc_id", 0.30)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s10.subsetOf(s30))
  }

  test("stratified sampling applies each stratum's own fraction") {
    val sampled = Sampling.sampleStratified(docs, "doc_id", "lang",
      Map("en" -> 1.0, "de" -> 0.0), defaultFraction = 0.5)
    val byLang = sampled.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") === full("en"))        // keep-all stratum intact
    assert(!byLang.contains("de"))             // zero stratum fully dropped
    val others = (full.keySet - "en" - "de").toSeq
    val keptOther = others.map(l => byLang.getOrElse(l, 0L)).sum.toDouble /
      others.map(full).sum
    assert(keptOther > 0.3 && keptOther < 0.7, s"default-fraction drift: $keptOther")
  }

  test("per-group sampling keeps exactly k rows per group, deterministically") {
    val s1 = Sampling.sampleKPerGroup(docs, "doc_id", "source", k = 5)
    val counts = s1.groupBy("source").count().collect().map(_.getLong(1))
    assert(counts.nonEmpty && counts.forall(_ === 5L))
    val ids1 = s1.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.sampleKPerGroup(docs, "doc_id", "source", k = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2)
  }

  test("token-budget packing matches a prefix-sum per-source simulation") {
    val budget = 2000L
    val packed = Sampling.packByTokenBudget(docs,
        TextOps.bpeTokenCount(col("text")), budget, partitionCol = "source")
      .select("source", "doc_id", "n_tokens", "shard").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    packed.groupBy(_._1).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._2).foreach { case (_, id, n, shard) =>
        assert(shard === cum / budget, s"doc $id: shard $shard != ${cum / budget}")
        cum += n
      }
    }
  }

  test("split assignment partitions the corpus and is per-doc stable") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val assigned = Sampling.splitAssign(docs, "doc_id", splits).cache()
    // total partition: every doc in exactly one split
    assert(assigned.count() === docs.count())
    val bySplit = assigned.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet === Set("train", "val", "test"))
    assert(bySplit("train") > bySplit("val") + bySplit("test"))
    // contamination guard: a doc's split never changes when the corpus
    // shrinks/grows — assignment over a subset agrees with the full run
    val subset = Sampling.splitAssign(docs.filter(col("doc_id") % 3 === 0),
      "doc_id", splits)
    val joined = subset.select(col("doc_id"), col("split").as("s2"))
      .join(assigned, "doc_id")
    assert(joined.filter(col("split") =!= col("s2")).isEmpty)
    assigned.unpersist()
  }

  test("temperature resampling un-skews group sizes toward sqrt(count)") {
    val kept = Sampling.sampleTemperature(docs, "doc_id", "lang").cache()
    val before = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minCount = before.values.min
    before.foreach { case (g, n) =>
      val p = math.sqrt(minCount.toDouble / n)
      val observed = after.getOrElse(g, 0L).toDouble / n
      // acceptance is hash-gated at probability ~p; allow binomial noise
      assert(math.abs(observed - p) < 0.15,
        s"group $g: kept $observed of target $p")
    }
    // deterministic: same keep-set on rerun
    val ids1 = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.sampleTemperature(docs, "doc_id", "lang")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2)
    kept.unpersist()
  }

  test("multimodal features compose with dedup: LSH recovers every planted byte-copy") {
    val base = docs.limit(100).select("doc_id", "text")
    val copies = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
    // text-keyed payloads: a byte-copy doc maps to a byte-identical BMP
    // even though its id differs => identical decoded pixels => identical
    // REAL features => cosine exactly 1, sharing every LSH band
    val feats = Multimodal.dhashFeaturesBatched(
      Multimodal.withTextBmpContent(base.unionByName(copies)))
    val pairs = graft.operators.Dedup
      .cosinePairsLsh(feats, dim = Multimodal.dhashFeatureDim(),
        idCol = "doc_id", vecCol = "features",
        planes = 64, bands = 4, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = base.filter(col("doc_id") % 10 === 0).collect()
      .map(r => (r.getLong(0), r.getLong(0) + 10000000L)).toSet
    assert((planted -- pairs).isEmpty,
      s"missed ${(planted -- pairs).size} of ${planted.size} planted copies")
  }

  test("multimodal features compose with k-NN: every doc is its own nearest match") {
    // id-keyed BMPs: ids 0..49 are distinct mod 112, so every payload has
    // a distinct (width, height) pair and the dims channels of the REAL
    // pixel features make the vectors pairwise distinct — self-cosine 1.0
    // is the unique maximum
    val feats = Multimodal.featuresBatched(
      Multimodal.withBmpContent(docs.limit(50)))
    val queries = feats.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"), col("features").as("query_vec"))
    val top1 = graft.operators.KnnTopK
      .knnExact(queries, feats, k = 1, corpusId = "doc_id", corpusVec = "features")
      .collect()
    assert(top1.nonEmpty)
    top1.foreach(r => assert(r.getLong(1) === r.getLong(0),
      s"query ${r.getLong(0)} nearest is ${r.getLong(1)}"))
  }

  test("epochShuffle: exact cover, contiguous per-shard positions, seeded determinism") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sfDir).select("doc_id")
    val n = docs.count()
    val e1 = graft.operators.Sampling.epochShuffle(docs, "doc_id", "seedA", 8)

    // a permutation: every doc exactly once, shards in range
    assert(e1.count() === n)
    assert(e1.select("doc_id").distinct().count() === n)
    assert(e1.filter(col("shard") < 0 || col("shard") >= 8).count() === 0)
    // positions are 1..|shard| with no gaps
    val bad = e1.groupBy("shard")
      .agg(count(lit(1)).as("cnt"), max("pos").as("mx"), min("pos").as("mn"))
      .filter(col("mx") =!= col("cnt") || col("mn") =!= 1L).count()
    assert(bad === 0, "per-shard positions must be contiguous from 1")

    // partitioning-invariant, seed-sensitive
    val again = graft.operators.Sampling
      .epochShuffle(docs.repartition(13), "doc_id", "seedA", 8)
    assert(e1.exceptAll(again).unionAll(again.exceptAll(e1)).count() === 0)
    val other = graft.operators.Sampling.epochShuffle(docs, "doc_id", "seedB", 8)
    assert(e1.join(other, Seq("doc_id", "shard", "pos"), "left_semi").count() < n,
      "a different seed must produce a different permutation")
  }

  test("epochShuffle: id-type-agnostic (string keys get the same permutation contract)") {
    import org.apache.spark.sql.functions._
    // the reference keys by STRING id (executor.py:57); the shuffle
    // hashes id.cast(string), so a long-keyed epoch and the same table
    // re-keyed by the ids' string form produce THE SAME (shard, pos)
    // for every row, and hex-string keys keep the permutation contract
    val docs = graft.sources.Tables.documents(spark, sfDir).select("doc_id")
    val asLong = graft.operators.Sampling.epochShuffle(docs, "doc_id", "seedA", 8)
      .select(col("doc_id").cast("string").as("k"), col("shard"), col("pos"))
    val asStr = graft.operators.Sampling.epochShuffle(
        docs.select(col("doc_id").cast("string").as("k")), "k", "seedA", 8)
    assert(asLong.exceptAll(asStr).unionAll(asStr.exceptAll(asLong)).count() === 0,
      "long ids and their string form must get identical (shard, pos)")
    val hex = docs.select(md5(col("doc_id").cast("string").cast("binary")).as("k"))
    val eHex = graft.operators.Sampling.epochShuffle(hex, "k", "seedA", 8)
    assert(eHex.count() === docs.count())
    assert(eHex.select("k").distinct().count() === docs.count())
  }

  test("mixture sampling: output approaches targets, bottleneck kept ~whole, unlisted groups dropped") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang")
      .unionByName(Seq((990001L, "xx"), (990002L, "xx")).toDF("doc_id", "lang"))
    val targets = Map("en" -> 0.3, "de" -> 0.175, "es" -> 0.175,
      "fr" -> 0.175, "zh" -> 0.175)
    val kept = graft.operators.Sampling
      .sampleToMixture(docs, "doc_id", "lang", targets)
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byLang.contains("xx"), "groups outside the mixture must drop")
    val counts = docs.filter(col("lang") =!= "xx").groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // bottleneck group = argmin count/target; its fraction is 1 (minus
    // the 1/65536 cut-rounding) -> kept nearly whole
    val bottleneck = counts.map { case (g, c) => g -> c / targets(g) }.minBy(_._2)._1
    assert(byLang(bottleneck) >= counts(bottleneck) - 1,
      s"bottleneck $bottleneck: kept ${byLang(bottleneck)} of ${counts(bottleneck)}")
    // achieved shares within a loose hash-sampling band of the targets
    val total = byLang.values.sum.toDouble
    targets.foreach { case (g, t) =>
      val share = byLang.getOrElse(g, 0L) / total
      assert(share > t * 0.6 && share < t * 1.5,
        s"$g share $share vs target $t (kept $byLang)")
    }
    // deterministic under repartition
    val again = graft.operators.Sampling
      .sampleToMixture(docs.repartition(9), "doc_id", "lang", targets)
    assert(kept.exceptAll(again).unionAll(again.exceptAll(kept)).count() === 0)
  }

  test("weighted sampling: overwhelming weight always wins; ranks contiguous; no replacement") {
    import spark.implicits._
    // one row carries ~1e12x the weight of the rest: its race key
    // -ln(u)/w is smaller than any unit-weight key can ever be
    // (-ln(u) >= ~1.2e-10 at the md5-uniform's max), so it must be rank 1
    val rows = (1L to 50L).map(i => (i, "g", 1.0)) :+ (99L, "g", 1.0e12)
    val df = rows.toDF("id", "grp", "wt")
    val out = graft.operators.Sampling
      .sampleWeightedPerGroup(df, "id", "wt", "grp", k = 5).collect()
    assert(out.length === 5)
    assert(out.map(_.getAs[Long]("rank")).sorted.toSeq === (1L to 5L))
    assert(out.map(_.getAs[Long]("id")).distinct.length === 5, "without replacement")
    val rank1 = out.find(_.getAs[Long]("rank") == 1L).get
    assert(rank1.getAs[Long]("id") === 99L, s"heavy row must win: ${out.mkString(",")}")
  }

  test("weighted sampling: partition-invariant; zero/negative weights never sample") {
    import spark.implicits._
    val df = ((1L to 40L).map(i => (i, if (i % 2 == 0) "a" else "b", i.toDouble)) ++
      Seq((100L, "a", 0.0), (101L, "b", -3.0))).toDF("id", "grp", "wt")
    val r1 = graft.operators.Sampling
      .sampleWeightedPerGroup(df, "id", "wt", "grp", k = 3)
      .orderBy("grp", "rank").collect()
    val r2 = graft.operators.Sampling
      .sampleWeightedPerGroup(df.repartition(7), "id", "wt", "grp", k = 3)
      .orderBy("grp", "rank").collect()
    assert(r1.map(_.toSeq).toSeq === r2.map(_.toSeq).toSeq)
    assert(!r1.exists(r => r.getAs[Long]("id") >= 100L),
      "non-positive weights must be excluded from the race")
  }

  test("component-keyed split keeps whole dup clusters in one split") {
    import spark.implicits._
    // ids chosen so PER-DOC hashing scatters at least one cluster across
    // splits (guard below asserts the scenario is non-vacuous), while
    // component-keyed assignment cannot by construction
    val labels = (1L to 200L).map(i => (i, (i / 4L) * 4L)).toDF("doc_id", "component")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val byDoc = Sampling.splitAssign(labels, "doc_id", splits)
      .groupBy("component").agg(countDistinct(col("split")).as("n"))
    assert(byDoc.filter(col("n") > 1).count() > 0,
      "scenario guard: per-doc hashing must actually scatter a cluster")
    val byComp = Sampling.splitAssign(labels, "component", splits)
    assert(byComp.groupBy("component").agg(countDistinct(col("split")).as("n"))
      .filter(col("n") > 1).count() === 0L,
      "a duplicate component must never span splits")
    // same component => same split, and the rule is the split_assign md5
    // rule applied to the component label
    val one = byComp.filter(col("component") === 100L)
      .select("split").distinct().collect()
    assert(one.length === 1)
  }
}
