package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftExtensions, GraftFunctions, VectorOps}

class GraftFunctionsSpec extends SparkSuite {

  test("registered SQL functions compute the same values as the Column API") {
    GraftFunctions.register(spark)
    spark.read.parquet(s"$sfDir/embeddings.parquet").limit(20)
      .createOrReplaceTempView("emb_fn_spec")
    val viaSql = spark.sql(
      """SELECT vec_id, vec_dot(embedding, embedding) AS d,
                vec_l2sq(embedding, embedding) AS z,
                vec_cosine(embedding, embedding) AS c
         FROM emb_fn_spec""")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val viaCol = spark.table("emb_fn_spec")
      .select(col("vec_id"), VectorOps.dot(col("embedding"), col("embedding")).as("d"),
        VectorOps.l2Sq(col("embedding"), col("embedding")).as("z"),
        VectorOps.cosineSimilarity(col("embedding"), col("embedding")).as("c"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(viaSql === viaCol)
  }

  test("shingle_hashes is callable from SQL with literal width/trailing args") {
    GraftFunctions.register(spark)
    val n = spark.sql(
      """SELECT size(shingle_hashes(array('a', 'b', 'c'), 2, false)) AS n,
                size(shingle_hashes(array('a', 'b', 'c'), 2)) AS nt""")
      .head()
    assert(n.getInt(0) === 2) // complete shingles only
    assert(n.getInt(1) === 3) // trailing default
  }

  test("signature expressions are SQL-callable end-to-end") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT size(minhash_sig(shingle_hashes(array('a','b','c','d'), 3), 16)) AS m,
                size(simhash_bits(shingle_hashes(array('a','b','c','d'), 2))) AS s""").head()
    assert(r.getInt(0) === 16 && r.getInt(1) === 64)
  }

  test("adc_lookup is SQL-callable and sums the right table slots") {
    GraftFunctions.register(spark)
    // m=2, k=3: codes (1, 2) -> lut[0*3+1] + lut[1*3+2] = 20.0 + 60.0
    val r = spark.sql(
      """SELECT adc_lookup(array(1, 2),
                           array(10D, 20D, 30D, 40D, 50D, 60D), 3) AS s""").head()
    assert(r.getDouble(0) === 80.0)
  }

  test("bq_pack / bq_hamming / deflate_ratio are SQL-callable with correct values") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT bq_hamming(bq_pack(array(1.0F, -1.0F, 1.0F)),
                           bq_pack(array(1.0F, 1.0F, -1.0F))) AS hd,
                bq_pack(array(1.0F, -1.0F, 1.0F))[0] AS w,
                deflate_ratio(repeat('ab', 500)) AS rep,
                deflate_ratio('ab', 9) AS tiny""").head()
    assert(r.getLong(0) === 2L)       // dims 2 and 3 disagree
    assert(r.getLong(1) === 5L)       // bits 0 and 2 set = 0b101
    assert(r.getDouble(2) < 0.1)      // repetitive compresses hard
    assert(r.getDouble(3) > 1.0)      // 2 raw bytes deflate to more
  }

  test("GraftExtensions injects the functions into a fresh session") {
    val fresh = spark.newSession()
    // newSession shares the context but not temp functions; extensions
    // apply at build time, so emulate by running the injector directly
    new GraftExtensions() // constructible (spark.sql.extensions contract)
    GraftFunctions.register(fresh)
    assert(fresh.sql("SELECT vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d")
      .head().getDouble(0) === 11.0)
  }
}
