package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** The REAL image-decode path: synthesized BMPs must round-trip through
  * javax.imageio with the exact dims the builder pinned, and undecodable
  * bytes must fall back to the stub rather than fail the batch. */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("bmpBytes builds a payload javax.imageio decodes at the pinned dims") {
    for (id <- Seq(0L, 1L, 6L, 15L, 16L, 111L, 9999L)) {
      val bytes = Multimodal.bmpBytes(id, s"some words for doc $id")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"id $id: ImageIO rejected the payload")
      assert(img.getWidth === (1 + id % 16).toInt, s"id $id width")
      assert(img.getHeight === (1 + id % 7).toInt, s"id $id height")
      // the oracle's size arithmetic: 54-byte headers + padded rows
      val rowSize = ((3 * (1 + id % 16).toInt + 3) / 4) * 4
      assert(bytes.length === 54 + (1 + id % 7).toInt * rowSize, s"id $id n_bytes")
    }
  }

  test("imageDecode reports decoder dims; undecodable bytes fall back to the stub") {
    val meta = Multimodal.imageDecode(5L, Multimodal.bmpBytes(5L, "alpha beta"))
    assert(meta.width === 6 && meta.height === 6 && meta.n_frames === 1)
    // garbage bytes: no reader accepts them -> deterministic stub values
    val junk = "definitely not an image".getBytes("UTF-8")
    assert(Multimodal.imageDecode(7L, junk) === Multimodal.stubDecode(7L, junk))
  }

  test("decodeBatched over withBmpContent runs the real decoder distributed") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta"), (18L, "epsilon zeta"))
      .toDF("doc_id", "text")
    val out = Multimodal.decodeBatched(Multimodal.withBmpContent(docs),
        decoder = Multimodal.imageDecode)
      .select("doc_id", "width", "height").as[(Long, Int, Int)].collect()
      .map { case (id, w, h) => id -> ((w, h)) }.toMap
    assert(out(1L) === ((2, 2)))
    assert(out(2L) === ((3, 3)))
    assert(out(18L) === ((3, 5))) // 1 + 18%16 = 3, 1 + 18%7 = 5
  }
}
