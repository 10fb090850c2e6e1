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

  test("wavBytes builds a payload javax.sound.sampled parses at the pinned format") {
    for (id <- Seq(0L, 1L, 2L, 3L, 32L, 33L, 111L, 9999L)) {
      val bytes = Multimodal.wavBytes(id, s"some words for doc $id")
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      assert(fmt.getSampleRate.toInt === (8000 * (1 + id % 3)).toInt, s"id $id rate")
      assert(fmt.getChannels === (1 + id % 2).toInt, s"id $id channels")
      assert(fmt.getSampleSizeInBits === 16, s"id $id bits")
      assert(in.getFrameLength === 16 + id % 33, s"id $id frames")
      // the oracle's size arithmetic: 44-byte headers + 16-bit frames
      assert(bytes.length === 44 + (16 + id % 33) * (1 + id % 2) * 2, s"id $id n_bytes")
      in.close()
    }
  }

  test("audioDecode reports parser format; undecodable bytes fall back to the stub") {
    val meta = Multimodal.audioDecode(5L, Multimodal.wavBytes(5L, "alpha beta"))
    // id 5: rate 8000*(1+5%3)=24000, channels 1+5%2=2, samples 16+5%33=21
    assert(meta.sample_rate === 24000 && meta.channels === 2 && meta.n_samples === 21L)
    assert(meta.duration_ms === 21L * 1000L / 24000L)
    val junk = "definitely not audio".getBytes("UTF-8")
    assert(Multimodal.audioDecode(7L, junk) === Multimodal.stubAudioDecode(7L, junk))
  }

  test("audioDecodeBatched over withWavContent runs the real parser distributed") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta"), (34L, "epsilon zeta"))
      .toDF("doc_id", "text")
    val out = Multimodal.audioDecodeBatched(Multimodal.withWavContent(docs))
      .select("doc_id", "sample_rate", "channels", "n_samples")
      .as[(Long, Int, Int, Long)].collect()
      .map { case (id, r, c, n) => id -> ((r, c, n)) }.toMap
    assert(out(1L) === ((16000, 2, 17L)))
    assert(out(2L) === ((24000, 1, 18L)))
    assert(out(34L) === ((16000, 1, 17L))) // 8000*(1+34%3)=16000, 1+34%2=1, 16+34%33=17
  }

  test("gifBytes builds an animation the JDK GIF reader counts at the pinned frames") {
    for (id <- Seq(0L, 1L, 4L, 5L, 8L, 9L, 44L, 9999L)) {
      val bytes = Multimodal.gifBytes(id, s"some words for doc $id")
      val meta = Multimodal.animationDecode(id, bytes)
      assert(meta.width === (1 + id % 9).toInt, s"id $id width")
      assert(meta.height === (1 + id % 5).toInt, s"id $id height")
      assert(meta.n_frames === (2 + id % 6).toInt, s"id $id frames")
    }
    // garbage bytes: no reader accepts them -> deterministic stub values
    val junk = "definitely not a gif".getBytes("UTF-8")
    assert(Multimodal.animationDecode(7L, junk) === Multimodal.stubDecode(7L, junk))
  }

  test("imageResize transcodes into the box, never upscales, and re-decodes") {
    // id 15: 16x2 -> scale 1/4 -> 4x1 (floor of 0.5 clamps to >= 1)
    val r = Multimodal.imageResize(15L,
      Multimodal.bmpBytes(15L, "alpha beta gamma"), maxW = 4, maxH = 4)
    assert(r.width === 4 && r.height === 1)
    assert(r.n_bytes === 54 + 1 * (((3 * 4 + 3) / 4) * 4))
    // id 0: 1x1 already inside the box -> untouched dims
    val small = Multimodal.imageResize(0L,
      Multimodal.bmpBytes(0L, "tiny"), maxW = 4, maxH = 4)
    assert(small.width === 1 && small.height === 1)
    // undecodable bytes fall through with stub meta
    val junk = "not an image".getBytes("UTF-8")
    assert(Multimodal.imageResize(3L, junk, 4, 4) === Multimodal.stubDecode(3L, junk))
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

  test("grayHistogram of the gradient payload matches the closed-form replay") {
    for (id <- Seq(0L, 3L, 17L, 112L, 4441L)) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.gradientBmpBytes(id)))
      assert(img != null, s"id $id: gradient BMP rejected")
      val observed = Multimodal.grayHistogram(img, 16)
      // independent replay of the oracle arithmetic: stored byte at
      // linear position p is (id + p) mod 256, rows are rs bytes wide
      val w = (1 + id % 16).toInt; val h = (1 + id % 7).toInt
      val rs = ((3 * w + 3) / 4) * 4
      val expected = new Array[Long](16)
      for (r <- 0 until h; k <- 0 until w) {
        val base = id + r * rs + 3 * k
        val gray = (java.lang.Math.floorMod(base, 256L)
          + java.lang.Math.floorMod(base + 1, 256L)
          + java.lang.Math.floorMod(base + 2, 256L)).toInt / 3
        expected(gray * 16 / 256) += 1
      }
      assert(observed.toSeq === expected.toSeq, s"id $id")
      assert(observed.sum === w.toLong * h, s"id $id: histogram covers every pixel")
    }
  }

  test("audioEnergy of the gradient WAV matches the closed-form replay") {
    for (id <- Seq(0L, 1L, 5L, 34L, 4441L)) {
      val rows = Multimodal.audioEnergy(id, Multimodal.gradientWavBytes(id))
      val n = ((16 + id % 33) * (1 + id % 2)).toInt
      val expected = new Array[Long](8)
      for (i <- 0 until n)
        expected((i.toLong * 8 / n).toInt) += java.lang.Math.floorMod(id + i, 256L) * 97L
      assert(rows.map(_._3) === expected.toSeq, s"id $id")
      assert(rows.map(_._2) === (0 until 8), s"id $id windows")
    }
    // unparseable bytes yield no rows (metadata path covers the fallback)
    assert(Multimodal.audioEnergy(3L, "not audio".getBytes("UTF-8")).isEmpty)
  }

  test("pixelFeatures derive from decoded pixels; undecodable bytes get the zero vector") {
    val bytes = Multimodal.bmpBytes(18L, "epsilon zeta")
    val f = Multimodal.pixelFeatures(bytes)
    assert(f.length === Multimodal.pixelFeatureDim())
    // histogram block is a distribution over the 15 pixels (3x5)
    assert(math.abs(f.take(16).sum - 1f) < 1e-5)
    // dims channels carry the decoder's answer: w=3, h=5
    assert(f(16) === 3f / 16f && f(17) === 5f / 8f)
    // byte-identical payloads => byte-identical features
    assert(Multimodal.pixelFeatures(bytes).toSeq === f.toSeq)
    val junk = "not an image at all".getBytes("UTF-8")
    assert(Multimodal.pixelFeatures(junk).forall(_ === 0f))
  }
}
