package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** The REAL image-decode path: synthesized BMPs must round-trip through
  * javax.imageio with the exact dims the builder pinned, and undecodable
  * bytes must surface as the typed-error row (null dims + reason) rather
  * than fail the batch — or fabricate plausible-looking dims. */
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

  test("imageDecode reports decoder dims; undecodable bytes get the typed-error row") {
    val meta = Multimodal.imageDecode(5L, Multimodal.bmpBytes(5L, "alpha beta"))
    assert(meta.width === Some(6) && meta.height === Some(6) &&
      meta.n_frames === Some(1) && meta.error === None)
    // garbage bytes: no reader accepts them -> null dims + reason, never
    // fabricated dimensions
    val junk = "definitely not an image".getBytes("UTF-8")
    assert(Multimodal.imageDecode(7L, junk) === Multimodal.undecodableMeta(7L, junk))
    assert(Multimodal.undecodableMeta(7L, junk).width === None)
    assert(Multimodal.undecodableMeta(7L, junk).error === Some("undecodable"))
  }

  test("png/jpeg payloads decode at the pinned dims; mixed column drives the error path") {
    for (id <- Seq(0L, 1L, 2L, 15L, 16L, 111L)) {
      val png = Multimodal.imageDecode(id, Multimodal.pngBytes(id))
      val jpg = Multimodal.imageDecode(id, Multimodal.jpegBytes(id))
      for (m <- Seq(png, jpg)) {
        assert(m.width === Some((1 + id % 16).toInt), s"id $id width")
        assert(m.height === Some((1 + id % 7).toInt), s"id $id height")
        assert(m.error === None, s"id $id decoded cleanly")
      }
    }
    // garbageBytes must be rejected by every reader
    assert(Multimodal.imageDecode(3L, Multimodal.garbageBytes(3L)).error
      === Some("undecodable"))
    // the mixed column end-to-end: formats rotate by id, garbage ids get
    // null dims + reason in the SAME plan
    val docs = Seq((0L, "bmp doc"), (1L, "png doc"), (2L, "jpeg doc"), (3L, "junk doc"))
      .toDF("doc_id", "text")
    val out = Multimodal.decodeBatched(Multimodal.withMixedContent(docs),
        decoder = Multimodal.imageDecode)
      .select("doc_id", "width", "height", "error")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(out(0L) === ((Some(1), Some(1), None)))
    assert(out(1L) === ((Some(2), Some(2), None)))
    assert(out(2L) === ((Some(3), Some(3), None)))
    assert(out(3L) === ((None, None, Some("undecodable"))))
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

  test("audioDecode reports parser format; undecodable bytes get the typed-error row") {
    val meta = Multimodal.audioDecode(5L, Multimodal.wavBytes(5L, "alpha beta"))
    // id 5: rate 8000*(1+5%3)=24000, channels 1+5%2=2, samples 16+5%33=21
    assert(meta.sample_rate === Some(24000) && meta.channels === Some(2) &&
      meta.n_samples === Some(21L))
    assert(meta.duration_ms === Some(21L * 1000L / 24000L) && meta.error === None)
    val junk = "definitely not audio".getBytes("UTF-8")
    assert(Multimodal.audioDecode(7L, junk) === Multimodal.undecodableAudio(7L, junk))
    assert(Multimodal.undecodableAudio(7L, junk).sample_rate === None)
    assert(Multimodal.undecodableAudio(7L, junk).error === Some("undecodable"))
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
      assert(meta.width === Some((1 + id % 9).toInt), s"id $id width")
      assert(meta.height === Some((1 + id % 5).toInt), s"id $id height")
      assert(meta.n_frames === Some((2 + id % 6).toInt), s"id $id frames")
    }
    // garbage bytes: no reader accepts them -> typed-error row
    val junk = "definitely not a gif".getBytes("UTF-8")
    assert(Multimodal.animationDecode(7L, junk) === Multimodal.undecodableMeta(7L, junk))
  }

  test("imageResize transcodes into the box, never upscales, and re-decodes") {
    // id 15: 16x2 -> scale 1/4 -> 4x1 (floor of 0.5 clamps to >= 1)
    val r = Multimodal.imageResize(15L,
      Multimodal.bmpBytes(15L, "alpha beta gamma"), maxW = 4, maxH = 4)
    assert(r.width === Some(4) && r.height === Some(1))
    assert(r.n_bytes === 54 + 1 * (((3 * 4 + 3) / 4) * 4))
    // id 0: 1x1 already inside the box -> untouched dims
    val small = Multimodal.imageResize(0L,
      Multimodal.bmpBytes(0L, "tiny"), maxW = 4, maxH = 4)
    assert(small.width === Some(1) && small.height === Some(1))
    // undecodable bytes fall through as the typed-error row
    val junk = "not an image".getBytes("UTF-8")
    assert(Multimodal.imageResize(3L, junk, 4, 4) === Multimodal.undecodableMeta(3L, junk))
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

  test("features are codec-invariant: the same image through BMP and PNG matches") {
    // Render ONE logical image (the pngBytes gradient: pixel (x,y) =
    // (id + y*width + x) mod 256, gray) through both codecs and pin
    // that every pixel-derived feature channel agrees exactly — only
    // the payload-size channel (a byte-length feature, deliberately
    // codec-dependent) may differ. This is what makes media dedup find
    // a re-encoded copy: the feature pipeline reads CONTENT, not
    // container bytes. The BMP side is built channel-equal per PIXEL
    // (bmpBytesWith's lambda runs over raw 24-bit BGR bytes) and
    // row-flipped (BMP stores rows bottom-up), so agreement also pins
    // the decoder's row-order handling.
    val bins = 16
    for (id <- Seq(0L, 5L, 18L, 47L, 103L)) {
      val bmp = Multimodal.grayBmpBytes(id)
      val png = Multimodal.pngBytes(id)
      val fb = Multimodal.pixelFeatures(bmp, bins)
      val fp = Multimodal.pixelFeatures(png, bins)
      val sizeIdx = bins + 2
      assert(fb.zipWithIndex.forall { case (v, i) => i == sizeIdx || v == fp(i) },
        s"id $id: pixel channels diverged across codecs")
      val db = Multimodal.dhashFeatures(bmp, bins)
      val dp = Multimodal.dhashFeatures(png, bins)
      // dHash layout: 64 sign bits + 16 raw grays + histogram + dims +
      // size; everything pixel-derived (all but the final size channel)
      // must match
      val dSizeIdx = db.length - 1
      assert(db.zipWithIndex.forall { case (v, i) => i == dSizeIdx || v == dp(i) },
        s"id $id: dhash channels diverged across codecs")
    }
  }

  test("hostileWavBytes: truncation typed, metadata chunks skipped, never fabricated") {
    // 330 = lcm(5, 3, 2, 33): the selector is coprime to every format
    // modulus, so one full period covers every (rate, channels,
    // samples) combo in every family; two periods for margin. The
    // dangerous cases: id%5=0/4 — the JDK parser ACCEPTS the cut
    // payload and reports the declared frame count, so the decode must
    // verify availability and emit the typed truncation error; and
    // id%5=3 — a LIST/INFO metadata chunk between fmt and data must be
    // SKIPPED (identical decode to the bare encoding), which a
    // canonical-44-byte-offset assumption would mis-read.
    for (id <- 0L until 660L) {
      val meta = Multimodal.audioDecode(id, Multimodal.hostileWavBytes(id))
      (id % 5) match {
        case 1 | 3 =>
          val tag = if (id % 5 == 3) "LIST-tagged" else "intact"
          assert(meta.error.isEmpty, s"id $id: $tag WAV must decode, got $meta")
          assert(meta.n_samples.contains(16L + id % 33) &&
                 meta.sample_rate.contains((8000L * (1 + id % 3)).toInt) &&
                 meta.channels.contains((1L + id % 2).toInt),
            s"id $id: $tag format fields must match the arithmetic, got $meta")
        case 0 | 4 =>
          assert(meta.error.contains(Multimodal.TruncatedReason),
            s"id $id: half-cut data must be the typed truncation row, got $meta")
          assert(meta.n_samples.isEmpty && meta.duration_ms.isEmpty,
            s"id $id: truncated payload must not carry declared duration")
        case _ =>
          assert(meta.error.contains(Multimodal.UndecodableReason),
            s"id $id: mid-header cut must be undecodable, got $meta")
      }
    }
    // the metadata family really decodes through the spliced chunk: the
    // bytes differ from the bare encoding, the parsed PCM does not
    val id3 = 3L * 5 + 3 // family 3
    assert(!java.util.Arrays.equals(
      Multimodal.listChunkWavBytes(id3), Multimodal.gradientWavBytes(id3)))
    assert(Multimodal.audioDecode(id3, Multimodal.listChunkWavBytes(id3)) ===
      Multimodal.audioDecode(id3, Multimodal.gradientWavBytes(id3))
        .copy(n_bytes = Multimodal.listChunkWavBytes(id3).length.toLong))
  }

  test("hostileBytes: every family's outcome is uniform across all dim combos") {
    // 1008 = lcm(9, 16, 7): the selector is coprime to both dim moduli,
    // so one full period covers every (width, height) pair in every
    // family. The pinned contract is exactly what
    // multimodal_decode_hostile oracles: intact metadata-bearing
    // encodings (progressive, 16-bit PNG, ICC, 180°-EXIF) decode at the
    // baseline dims, the 90°-EXIF family decodes TRANSPOSED
    // (orientation normalization), and every body-damaged family —
    // including the one whose metadata says transpose — surfaces the
    // typed error: never fabricated dims, never half-applied metadata,
    // never a thrown task
    for (id <- 0L until 1008L) {
      val meta = Multimodal.imageDecode(id, Multimodal.hostileBytes(id))
      val (w, h) = ((1 + id % 16).toInt, (1 + id % 7).toInt)
      id % 9 match {
        case 1 | 5 | 6 | 7 =>
          assert(meta.error.isEmpty, s"id $id (family ${id % 9}): must decode")
          assert(meta.width.contains(w) && meta.height.contains(h),
            s"id $id (family ${id % 9}): dims must match the baseline arithmetic")
        case 4 =>
          assert(meta.error.isEmpty, s"id $id: 90°-EXIF JPEG must decode")
          assert(meta.width.contains(h) && meta.height.contains(w),
            s"id $id: orientation 6 must report TRANSPOSED dims, got " +
              s"${meta.width}×${meta.height} want $h×$w")
        case _ =>
          assert(meta.error.contains(Multimodal.UndecodableReason),
            s"id $id (family ${id % 9}): damaged payload must be the typed-error row")
          assert(meta.width.isEmpty && meta.height.isEmpty,
            s"id $id: damaged payload must not carry dims")
      }
    }
    // the damage is real: every hostile payload still LOOKS like its
    // format at the signature level (headers intact), so the failure is
    // mid-decode, not at format sniffing
    assert(Multimodal.hostileBytes(0).take(2).sameElements("BM".getBytes)) // BMP
    assert((Multimodal.hostileBytes(2)(0) & 0xff) == 0x89)                 // PNG
    assert((Multimodal.hostileBytes(3)(0) & 0xff) == 0xff &&
           (Multimodal.hostileBytes(3)(1) & 0xff) == 0xd8)                 // JPEG SOI
    assert((Multimodal.hostileBytes(8)(0) & 0xff) == 0xff &&
           (Multimodal.hostileBytes(8)(1) & 0xff) == 0xd8)                 // EXIF JPEG SOI
    // the metadata is real: the EXIF families parse to their planted
    // orientations, the spliced segments never perturb sibling payloads
    assert(Multimodal.jpegExifOrientation(Multimodal.hostileBytes(4L * 9 + 4)) == Some(6))
    assert(Multimodal.jpegExifOrientation(Multimodal.hostileBytes(7L * 9 + 7)) == Some(3))
    assert(Multimodal.jpegExifOrientation(Multimodal.jpegBytes(11)).isEmpty)
  }
}
