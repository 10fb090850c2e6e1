package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract /
  * frame-sample as partition-local batch transforms.
  *
  * The actual byte decoding is a ===== STUB =====: no codec libraries
  * exist in this environment, so [[stubDecode]] derives deterministic fake
  * dimensions from the bytes. Everything around it — binary schema,
  * batched `mapPartitions` shape, metadata struct, frame-sampling
  * explode — is the real, tested Spark plumbing a decoder would plug
  * into.
  */
object Multimodal {

  /** Typed metadata extracted from a media payload. */
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int, height: Int, n_frames: Int)

  implicit val mediaMetaEnc: Encoder[MediaMeta] = Encoders.product[MediaMeta]

  /** Attach a binary content column (fixtures carry no real media; UTF-8
    * bytes of the text stand in — the schema and plan shape are what is
    * exercised). */
  def withBinaryContent(df: DataFrame, textCol: String = "text",
                        outCol: String = "content"): DataFrame =
    df.withColumn(outCol, encode(col(textCol), "UTF-8"))

  /** Expression-level metadata over the binary payload. Width/height are
    * STUB values derived from a byte hash (deterministic); n_bytes and
    * n_frames are real payload arithmetic. */
  def mediaMetaExpr(content: Column): Column = struct(
    length(content).cast("long").as("n_bytes"),
    (pmod(crc32(content), lit(1216)) + lit(64)).cast("int").as("width"),   // STUB dims
    (pmod(xxhash64(content), lit(656)).cast("int") + lit(64)).as("height"), // STUB dims
    (floor(length(content).cast("double") / 1024.0) + 1).cast("int").as("n_frames"))

  /** Partition-local batched decode — the `mapInPandas` analog. The
    * decoder runs once per payload inside `mapPartitions`, so a real
    * codec would amortize model/library init per partition, not per row.
    * Default decoder is the deterministic STUB. */
  def decodeBatched(df: DataFrame, idCol: String = "doc_id",
                    contentCol: String = "content",
                    decoder: (Long, Array[Byte]) => MediaMeta = stubDecode): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real impl: init codec/library once here, then stream the batch
        rows.map { case (id, bytes) => decoder(id, bytes) }
      }
      .toDF()
  }

  /** ===== STUB ===== deterministic fake decode: dimensions from a simple
    * byte checksum. A real build replaces this body with an image/audio
    * codec call; the signature and batching contract stay. */
  def stubDecode(id: Long, bytes: Array[Byte]): MediaMeta = {
    var checksum = 0L
    var i = 0
    while (i < bytes.length) { checksum = checksum * 31 + (bytes(i) & 0xff); i += 1 }
    MediaMeta(
      doc_id = id,
      n_bytes = bytes.length.toLong,
      width = 64 + java.lang.Long.remainderUnsigned(checksum, 1216L).toInt,
      height = 64 + java.lang.Long.remainderUnsigned(checksum >>> 7, 656L).toInt,
      n_frames = bytes.length / 1024 + 1)
  }

  /** ===== STUB ===== feature extraction: a deterministic fake embedding
    * derived from payload hashes stands in for a real vision/audio
    * encoder. The shape is the real contract: fixed-width
    * `array<float>` feature column, computed per payload in one narrow
    * codegen'd projection, ready for the k-NN/dedup operators. */
  def extractFeatures(content: Column, dim: Int = 8): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(i, content), lit(2000L)).cast("double") / 1000.0 - 1.0).cast("float"))

  /** ===== STUB ===== resize plan: recomputes the metadata struct for a
    * target box, preserving aspect ratio — real builds would also
    * transcode the bytes; the dimension arithmetic and schema are the
    * tested part. */
  def resizeMeta(meta: Column, maxW: Int, maxH: Int): Column = {
    val w = meta.getField("width").cast("double")
    val h = meta.getField("height").cast("double")
    val scale = least(lit(maxW) / w, lit(maxH) / h, lit(1.0))
    struct(
      meta.getField("n_bytes").as("n_bytes"),
      floor(w * scale).cast("int").as("width"),
      floor(h * scale).cast("int").as("height"),
      meta.getField("n_frames").as("n_frames"))
  }

  /** Frame sampling plumbing: one row per sampled frame index
    * (0, stride, 2*stride, ... < n_frames). */
  def sampleFrames(meta: DataFrame, stride: Int = 2): DataFrame =
    meta.select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"))
}
