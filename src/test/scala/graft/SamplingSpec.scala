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

  test("multimodal features compose with k-NN: every doc is its own nearest match") {
    val feats = Multimodal.withBinaryContent(docs.limit(50))
      .select(col("doc_id"), Multimodal.extractFeatures(col("content")).as("features"))
    val queries = feats.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"), col("features").as("query_vec"))
    val top1 = graft.operators.KnnTopK
      .knnExact(queries, feats, k = 1, corpusId = "doc_id", corpusVec = "features")
      .collect()
    assert(top1.nonEmpty)
    top1.foreach(r => assert(r.getLong(1) === r.getLong(0),
      s"query ${r.getLong(0)} nearest is ${r.getLong(1)}"))
  }
}
