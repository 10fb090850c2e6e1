package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
