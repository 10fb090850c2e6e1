package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract /
  * frame-sample as partition-local batch transforms.
  *
  * IMAGE decode is REAL: [[withBmpContent]] synthesizes valid BMP
  * payloads (this environment ships no media fixtures) and
  * [[imageDecode]] reads them with the JDK's pure-Java `javax.imageio`
  * — true decoder-reported dimensions, oracle-checkable because the
  * synthesized dims derive from id arithmetic. AUDIO decode is REAL the
  * same way: [[withWavContent]] synthesizes valid PCM WAVs and
  * [[audioDecode]] parses them with the JDK's pure-Java
  * `javax.sound.sampled` — rate/channels/frames reported by the
  * decoder. MOVING-IMAGE frame counts are REAL: [[withGifContent]]
  * synthesizes valid multi-frame GIFs and [[animationDecode]] counts
  * frames by walking the JDK GIF reader's image sequence — the closest
  * a video container gets without codec libraries. FEATURE extraction
  * is REAL since r10: [[pixelFeatures]] decodes the payload and derives
  * a grayscale-histogram + dims embedding from actual pixels, and the
  * [[gradientBmpBytes]] fixture gives the histogram a closed form a SQL
  * oracle replays pixel-for-pixel.
  *
  * Undecodable bytes NEVER yield fabricated metadata: since r11 every
  * decode fallback is the TYPED ERROR shape — null dims plus a `reason`
  * in the `error` column ([[undecodableMeta]]/[[undecodableAudio]]) —
  * so no exported API can hand a caller fake media dimensions. (Earlier
  * rounds carried checksum-derived stub dims; the reference accepts
  * arbitrary user payloads, `executor.py:143-148`, and a real corpus
  * WILL contain bytes no reader accepts, which must surface as errors,
  * not plausible-looking numbers.)
  */
object Multimodal {

  /** Typed metadata extracted from a media payload. Dims are None (and
    * `error` carries the reason) when no reader accepts the bytes —
    * the typed-error fallback shape. */
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Option[Int],
                       height: Option[Int], n_frames: Option[Int],
                       error: Option[String] = None)

  object MediaMeta {
    /** Decoded-image row: all dims present, no error. */
    def decoded(id: Long, nBytes: Long, width: Int, height: Int, nFrames: Int): MediaMeta =
      MediaMeta(id, nBytes, Some(width), Some(height), Some(nFrames))
  }

  /** The reason string every undecodable-bytes fallback carries. */
  val UndecodableReason = "undecodable"

  /** Typed-error fallback for bytes no image reader accepts: null dims,
    * reason in `error` — the only thing a decode path may emit for them. */
  def undecodableMeta(id: Long, bytes: Array[Byte]): MediaMeta =
    MediaMeta(id, bytes.length.toLong, None, None, None, Some(UndecodableReason))

  implicit val mediaMetaEnc: Encoder[MediaMeta] = Encoders.product[MediaMeta]

  /** Attach a binary content column (fixtures carry no real media; UTF-8
    * bytes of the text stand in — the schema and plan shape are what is
    * exercised). */
  def withBinaryContent(df: DataFrame, textCol: String = "text",
                        outCol: String = "content"): DataFrame =
    df.withColumn(outCol, encode(col(textCol), "UTF-8"))

  /** Deterministic tiny VALID BMP payload for a doc: dimensions from id
    * arithmetic (width = 1 + id mod 16, height = 1 + id mod 7 — chosen
    * so an oracle can recompute the decoder's answer independently),
    * pixel bytes from the doc's text. 24-bit BI_RGB, bottom-up, rows
    * padded to 4 bytes — the simplest format every BMP reader accepts,
    * including the JDK's pure-Java `javax.imageio` one. */
  def bmpBytes(id: Long, text: String): Array[Byte] = {
    val width = (1L + java.lang.Math.floorMod(id, 16L)).toInt
    val height = (1L + java.lang.Math.floorMod(id, 7L)).toInt
    val tb = text.getBytes("UTF-8")
    bmpBytesWith(width, height,
      p => if (tb.isEmpty) 0 else tb(java.lang.Math.floorMod(p, tb.length)) & 0xff)
  }

  /** Core 24-bit BI_RGB bottom-up BMP builder: `pixelByte(p)` supplies the
    * stored byte at linear position p = row*rowSize + col for col <
    * 3*width (row padding stays zero). All payload builders share this. */
  def bmpBytesWith(width: Int, height: Int, pixelByte: Int => Int): Array[Byte] = {
    val rowSize = ((3 * width + 3) / 4) * 4
    val imageSize = rowSize * height
    val fileSize = 54 + imageSize
    val buf = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putShort(0).putShort(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(imageSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var r = 0
    while (r < height) {
      var c = 0
      while (c < rowSize) {
        val v: Byte = if (c >= 3 * width) 0
          else (pixelByte(r * rowSize + c) & 0xff).toByte
        buf.put(v)
        c += 1
      }
      r += 1
    }
    buf.array()
  }

  /** Gradient BMP: same id-arithmetic dims as [[bmpBytes]], but the stored
    * pixel byte at linear position p is `(id + p) mod 256` — a CLOSED FORM
    * an oracle can replay pixel-for-pixel in SQL, which is what lets the
    * pixel-histogram features be hash-verified end-to-end (payload build →
    * javax.imageio decode → per-pixel gray binning). */
  def gradientBmpBytes(id: Long): Array[Byte] = {
    val width = (1L + java.lang.Math.floorMod(id, 16L)).toInt
    val height = (1L + java.lang.Math.floorMod(id, 7L)).toInt
    bmpBytesWith(width, height,
      p => java.lang.Math.floorMod(id + p, 256L).toInt)
  }

  /** Attach the gradient payload ([[gradientBmpBytes]]) — the
    * oracle-replayable feature fixture. */
  def withGradientBmpContent(df: DataFrame, idCol: String = "doc_id",
                             outCol: String = "content"): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"))
      .as[Long]
      .mapPartitions(rows => rows.map(id => (id, gradientBmpBytes(id))))
      .toDF(idCol, outCol)
  }

  /** Text-keyed BMP: dims derive from the text (not the row id), pixels
    * from the text bytes — so byte-identical documents yield
    * byte-identical payloads regardless of their ids. The canvas is
    * sized to COVER the text (fixed width 16 ⇒ 48 data bytes per row;
    * height grows with length, capped at 64 rows): a mod-16 canvas
    * rendered only the first handful of bytes, which made every
    * prefix-sharing doc pair a byte-identical image and the dedup row
    * degenerate. This is the payload the media-dedup path wants:
    * copy ⇒ same pixels ⇒ same features; different body ⇒ different
    * pixels somewhere on the canvas. */
  def textBmpBytes(text: String): Array[Byte] = {
    val tb = text.getBytes("UTF-8")
    val width = 16
    val height = math.min(64, 1 + math.max(0, tb.length - 1) / (3 * width))
    bmpBytesWith(width, height,
      p => if (tb.isEmpty) 0 else tb(java.lang.Math.floorMod(p, tb.length)) & 0xff)
  }

  /** Attach the text-keyed payload ([[textBmpBytes]]). */
  def withTextBmpContent(df: DataFrame, idCol: String = "doc_id",
                         textCol: String = "text", outCol: String = "content"): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(rows => rows.map { case (id, t) => (id, textBmpBytes(t)) })
      .toDF(idCol, outCol)
  }

  /** Attach a REAL decodable media column: one valid BMP per doc (built
    * by [[bmpBytes]] in the same partition-local batch shape as the
    * decode side). This is what lets `multimodal_decode` run an actual
    * image decoder end-to-end in a codec-library-free environment. */
  def withBmpContent(df: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text", outCol: String = "content"): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(rows => rows.map { case (id, t) => (id, bmpBytes(id, t)) })
      .toDF(idCol, outCol)
  }

  /** Deterministic VALID PNG payload: same id-arithmetic dims as
    * [[bmpBytes]] (width = 1 + id mod 16, height = 1 + id mod 7 — so an
    * oracle recomputes the decoder's answer), gray gradient pixels
    * ((id + p) mod 256), encoded by the JDK's own PNG writer. Unlike
    * BMP the compressed byte count is encoder-dependent, so only the
    * DIMS are oracle-pinned for this format. */
  def pngBytes(id: Long): Array[Byte] = encodeGradientImage(id, "png")

  /** Deterministic VALID JPEG payload — same contract as [[pngBytes]]
    * (dims oracle-pinned, byte count and pixel values encoder-owned;
    * JPEG is lossy, but the header dims survive exactly). */
  def jpegBytes(id: Long): Array[Byte] = encodeGradientImage(id, "jpg")

  /** The in-memory gradient image at the shared id-arithmetic dims —
    * the pixel source every encoder-produced payload family shares. */
  private def gradientImage(id: Long): java.awt.image.BufferedImage = {
    val width = (1L + java.lang.Math.floorMod(id, 16L)).toInt
    val height = (1L + java.lang.Math.floorMod(id, 7L)).toInt
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = java.lang.Math.floorMod(id + y.toLong * width + x, 256L).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Render the gradient image at the shared id-arithmetic dims and hand
    * it to the named JDK ImageIO writer. */
  private def encodeGradientImage(id: Long, format: String): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(gradientImage(id), format, baos)
    baos.toByteArray
  }

  /** Splice one marker segment into a baseline JPEG byte stream, after
    * the SOI and any APP0/JFIF head — how real camera/export pipelines
    * place EXIF (APP1) and ICC (APP2) metadata. Pure byte surgery on
    * the encoder's own output, so the entropy-coded body is untouched. */
  private def insertJpegSegment(jpeg: Array[Byte], marker: Int,
                                payload: Array[Byte]): Array[Byte] = {
    var at = 2 // skip SOI
    while (at + 4 <= jpeg.length && (jpeg(at) & 0xff) == 0xff &&
           (jpeg(at + 1) & 0xff) == 0xe0) // skip APP0 segments
      at += 2 + (((jpeg(at + 2) & 0xff) << 8) | (jpeg(at + 3) & 0xff))
    val seg = java.nio.ByteBuffer.allocate(4 + payload.length) // big-endian
    seg.put(0xff.toByte).put(marker.toByte)
      .putShort((payload.length + 2).toShort).put(payload)
    val out = new Array[Byte](jpeg.length + seg.capacity())
    System.arraycopy(jpeg, 0, out, 0, at)
    System.arraycopy(seg.array(), 0, out, at, seg.capacity())
    System.arraycopy(jpeg, at, out, at + seg.capacity(), jpeg.length - at)
    out
  }

  /** The gradient JPEG with a minimal EXIF APP1 carrying ONLY the
    * orientation tag (0x0112) — the metadata-hostile shape a phone
    * upload serves: stored pixels in sensor order, display shape
    * declared by metadata the decoder itself ignores. Little-endian
    * TIFF, one IFD0 entry, no thumbnail IFD. */
  def exifJpegBytes(id: Long, orientation: Int): Array[Byte] = {
    val tiff = java.nio.ByteBuffer.allocate(26)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    tiff.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
      .putShort(1)                      // IFD0: one entry
      .putShort(0x0112).putShort(3).putInt(1)   // tag, SHORT, count 1
      .putShort(orientation.toShort).putShort(0) // value + pad
      .putInt(0)                        // no next IFD
    insertJpegSegment(jpegBytes(id), 0xe1,
      "Exif\u0000\u0000".getBytes("US-ASCII") ++ tiff.array())
  }

  /** A genuine sRGB ICC profile (the JDK's own), the payload real
    * export pipelines tag images with. ~3 KiB ≪ the 64 KiB APP2 chunk
    * bound, so a single segment carries it whole. */
  private lazy val srgbIccBytes: Array[Byte] =
    java.awt.color.ICC_Profile.getInstance(java.awt.color.ColorSpace.CS_sRGB).getData

  /** The gradient JPEG tagged with the sRGB ICC profile in APP2 — the
    * color-managed metadata shape; dims must decode exactly like the
    * bare baseline's. */
  def iccJpegBytes(id: Long): Array[Byte] =
    insertJpegSegment(jpegBytes(id), 0xe2,
      "ICC_PROFILE\u0000".getBytes("US-ASCII") ++ Array[Byte](1, 1) ++ srgbIccBytes)

  /** 16-bit grayscale PNG at the shared id-arithmetic dims — the bit-
    * depth-hostile shape (scanned documents, medical exports): a
    * baseline-8-bit-only pipeline mishandles it, the JDK reader decodes
    * it, and the dims must come out exactly like every sibling
    * encoding's. Sample (x, y) = (id + y·width + x) mod 65536. */
  def png16Bytes(id: Long): Array[Byte] = {
    val width = (1L + java.lang.Math.floorMod(id, 16L)).toInt
    val height = (1L + java.lang.Math.floorMod(id, 7L)).toInt
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    val r = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        r.setSample(x, y, 0,
          java.lang.Math.floorMod(id + y.toLong * width + x, 65536L).toInt)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Best-effort EXIF orientation of a JPEG payload: walk the marker
    * stream to the APP1/"Exif" segment, then IFD0 for tag 0x0112 —
    * the metadata the JDK decoder itself never applies. None when the
    * bytes aren't a JPEG, carry no EXIF, or the structure is damaged;
    * never throws (hostile-corpus posture: metadata parsing must not
    * take down a decode that succeeded). Standard JPEG/TIFF layout,
    * big- and little-endian TIFF both handled. */
  private[graft] def jpegExifOrientation(b: Array[Byte]): Option[Int] =
    try {
      if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
        return None
      var at = 2
      while (at + 4 <= b.length && (b(at) & 0xff) == 0xff) {
        val marker = b(at + 1) & 0xff
        if (marker == 0xda || marker == 0xd9) return None // scan data: done
        val len = ((b(at + 2) & 0xff) << 8) | (b(at + 3) & 0xff)
        if (marker == 0xe1 && len >= 16 && at + 2 + len <= b.length &&
            new String(b, at + 4, 6, "US-ASCII") == "Exif\u0000\u0000") {
          val t = at + 10 // TIFF header
          val le = (b(t) & 0xff) == 'I'.toInt
          def u16(o: Int): Int =
            if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
            else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
          def u32(o: Int): Long =
            if (le) (u16(o).toLong | (u16(o + 2).toLong << 16)) & 0xffffffffL
            else ((u16(o).toLong << 16) | u16(o + 2).toLong) & 0xffffffffL
          val ifd = t + u32(t + 4).toInt
          val n = u16(ifd)
          var i = 0
          while (i < n) {
            val e = ifd + 2 + 12 * i
            if (u16(e) == 0x0112) return Some(u16(e + 8))
            i += 1
          }
          return None
        }
        at += 2 + len
      }
      None
    } catch { case _: RuntimeException => None } // damaged structure → no metadata

  /** Deterministic bytes NO image reader accepts — the undecodable slice
    * of a mixed-media column (drives the typed-error fallback in-plan). */
  def garbageBytes(id: Long): Array[Byte] =
    s"not-a-media-payload:$id".getBytes("UTF-8")

  /** Deterministic VALID BMP rendering the SAME logical image as
    * [[pngBytes]]: channel-equal gray pixels at the shared id-arithmetic
    * dims, pixel (x,y) = (id + y·width + x) mod 256, rows flipped for
    * BMP's bottom-up storage. One image, two containers — the
    * re-encoded-copy fixture cross-codec dedup must catch. (Distinct
    * from [[gradientBmpBytes]], whose gradient runs across the raw
    * 24-bit BGR bytes — that fixture exists for the byte-level
    * closed-form oracle, not for cross-codec identity.) */
  def grayBmpBytes(id: Long): Array[Byte] = {
    val width = (1L + java.lang.Math.floorMod(id, 16L)).toInt
    val height = (1L + java.lang.Math.floorMod(id, 7L)).toInt
    val rowSize = ((3 * width + 3) / 4) * 4
    bmpBytesWith(width, height, { p =>
      val x = (p % rowSize) / 3
      val y = height - 1 - (p / rowSize) // BMP rows are bottom-up
      java.lang.Math.floorMod(id + y.toLong * width + x, 256L).toInt
    })
  }

  /** Attach a RE-ENCODED-COPY media column: every input id contributes
    * its image as a BMP under the original id AND the byte-different
    * PNG encoding of the SAME pixels under id + 10^7 — the planted
    * cross-codec duplicate set for the media-dedup gate. */
  def withCrossCodecContent(df: DataFrame, idCol: String = "doc_id",
                            outCol: String = "content"): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"))
      .as[Long]
      .mapPartitions(_.flatMap(id =>
        Seq((id, grayBmpBytes(id)), (id + 10000000L, pngBytes(id)))))
      .toDF(idCol, outCol)
  }

  /** Attach a MIXED-format media column — the accept-arbitrary-user-
    * payloads posture of the reference (`executor.py:143-148`): payload
    * format rotates by id (0 → BMP, 1 → PNG, 2 → JPEG, 3 → undecodable
    * garbage), so one column exercises three real decoder families AND
    * the typed-error fallback in a single plan. */
  def withMixedContent(df: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text", outCol: String = "content"): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(rows => rows.map { case (id, t) =>
        val payload = java.lang.Math.floorMod(id, 4L) match {
          case 0L => bmpBytes(id, t)
          case 1L => pngBytes(id)
          case 2L => jpegBytes(id)
          case _ => garbageBytes(id)
        }
        (id, payload)
      })
      .toDF(idCol, outCol)
  }

  /** Deterministic progressive-scan JPEG at the shared id-arithmetic
    * dims: a real scraped corpus serves progressive encodings that a
    * baseline-only pipeline mishandles — the JDK reader decodes them,
    * and the dims must come out EXACTLY like the baseline encoding's. */
  def progressiveJpegBytes(id: Long): Array[Byte] = {
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    try {
      w.setOutput(ios)
      val p = w.getDefaultWriteParam
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      w.write(null, new javax.imageio.IIOImage(gradientImage(id), null, null), p)
    } finally { ios.close(); w.dispose() }
    baos.toByteArray
  }

  /** HOSTILE media payloads — partially-VALID bytes, the shapes a real
    * scraped corpus actually serves (truncated downloads, progressive
    * encodings, storage bit rot), rotating by id. Unlike
    * [[garbageBytes]] every family here starts as a genuine encoder
    * output, so the decoder walks real headers before hitting the
    * damage — stressing the typed-error boundary mid-decode, not at
    * format sniffing. Nine families: four body-hostile (r12), five
    * METADATA-hostile (r13 — the EXIF/depth/ICC half of a scraped
    * corpus). The selector is mod 9, coprime to both dim moduli, so
    * every family covers all 112 dim combinations — probed exhaustively
    * against the JDK readers (ids 0..1007, one full period): each
    * family's outcome is uniform, which is what lets
    * `multimodal_decode_hostile` hash-oracle it.
    *   id%9=0  BMP, valid 54-byte header, pixel body cut in half
    *           → EOFException → typed error
    *   id%9=1  progressive JPEG, intact → decodes, id-arithmetic dims
    *   id%9=2  PNG with ONE bit flipped in the IDAT region
    *           → CRC/inflate failure → typed error
    *   id%9=3  JPEG cut at half length (valid SOI + headers)
    *           → premature-EOF IIOException → typed error
    *   id%9=4  JPEG with EXIF orientation 6 (90° — a phone upload):
    *           decodes; the decode NORMALIZES the declared rotation,
    *           so reported dims are the TRANSPOSED id-arithmetic pair
    *   id%9=5  16-bit grayscale PNG → decodes, id-arithmetic dims
    *   id%9=6  JPEG tagged with a genuine sRGB ICC profile (APP2)
    *           → decodes, id-arithmetic dims
    *   id%9=7  JPEG with EXIF orientation 3 (180° — rotation present
    *           but NON-transposing) → decodes, id-arithmetic dims
    *   id%9=8  EXIF-rotated JPEG cut at half length: metadata says
    *           transpose, body is damaged — the error must win
    *           → typed error (never half-applied metadata) */
  def hostileBytes(id: Long): Array[Byte] =
    java.lang.Math.floorMod(id, 9L) match {
      case 0L =>
        val b = gradientBmpBytes(id)
        java.util.Arrays.copyOf(b, 54 + (b.length - 54) / 2)
      case 1L => progressiveJpegBytes(id)
      case 2L =>
        val b = pngBytes(id)
        b(b.length - 20) = (b(b.length - 20) ^ 0x10).toByte
        b
      case 3L =>
        val b = jpegBytes(id)
        java.util.Arrays.copyOf(b, b.length / 2)
      case 4L => exifJpegBytes(id, orientation = 6)
      case 5L => png16Bytes(id)
      case 6L => iccJpegBytes(id)
      case 7L => exifJpegBytes(id, orientation = 3)
      case _ =>
        val b = exifJpegBytes(id, orientation = 6)
        java.util.Arrays.copyOf(b, b.length / 2)
    }

  /** The hostile-media column: [[hostileBytes]] per row, batched like
    * [[withMixedContent]]. */
  def withHostileContent(df: DataFrame, idCol: String = "doc_id",
                         outCol: String = "content"): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"))
      .as[Long]
      .mapPartitions(rows => rows.map(id => (id, hostileBytes(id))))
      .toDF(idCol, outCol)
  }

  /** REAL image decode via the JDK's `javax.imageio` (its BMP/PNG/GIF/
    * JPEG readers ship in every JRE — no external codec libraries
    * involved): width/height come from the DECODER, not from payload
    * arithmetic. Bytes no reader accepts yield the typed-error row
    * ([[undecodableMeta]]: null dims + reason), so mixed-media columns
    * still produce a row per payload without fabricating dims. A
    * decoded still image is one frame. Streams are memory-cached — no
    * ImageIO temp-file I/O per payload. */
  def imageDecode(id: Long, bytes: Array[Byte]): MediaMeta = {
    val img =
      try javax.imageio.ImageIO.read(
        new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes)))
      catch { case _: java.io.IOException => null }
    if (img == null) undecodableMeta(id, bytes)
    else {
      // EXIF orientation NORMALIZATION: the JDK decoder returns stored
      // (sensor-order) dims and ignores the rotation metadata a phone
      // upload declares — reporting those raw dims would mislabel every
      // rotated image in a scraped corpus. Orientations 5–8 transpose
      // the display shape, so the exported dims swap; 2–4 (mirror/180°)
      // leave the shape unchanged. Applied only when the decode itself
      // succeeded — damaged bytes stay the typed error, never
      // half-applied metadata.
      val transposed = jpegExifOrientation(bytes).exists(o => o >= 5 && o <= 8)
      val (w, h) = if (transposed) (img.getHeight, img.getWidth)
                   else (img.getWidth, img.getHeight)
      MediaMeta.decoded(id, bytes.length.toLong, w, h, 1)
    }
  }

  /** Typed metadata extracted from an audio payload. Format fields are
    * None (and `error` carries the reason) when no parser accepts the
    * bytes — the audio side of the typed-error fallback shape. */
  case class AudioMeta(doc_id: Long, n_bytes: Long, sample_rate: Option[Int],
                       channels: Option[Int], n_samples: Option[Long],
                       duration_ms: Option[Long], error: Option[String] = None)

  object AudioMeta {
    /** Parsed-audio row: all format fields present, no error. */
    def decoded(id: Long, nBytes: Long, rate: Int, channels: Int,
                nSamples: Long, durationMs: Long): AudioMeta =
      AudioMeta(id, nBytes, Some(rate), Some(channels), Some(nSamples), Some(durationMs))
  }

  /** Typed-error fallback for bytes no audio parser accepts. */
  def undecodableAudio(id: Long, bytes: Array[Byte]): AudioMeta =
    AudioMeta(id, bytes.length.toLong, None, None, None, None, Some(UndecodableReason))

  /** Typed-error reason for payloads whose header DECLARES more frames
    * than the bytes actually carry (a cut-short download): the JDK
    * parser accepts them and reports the declared length, so without an
    * availability check the decode would fabricate duration for data
    * that does not exist — the audio twin of the no-fabricated-dims
    * rule. */
  val TruncatedReason = "truncated"
  def truncatedAudio(id: Long, bytes: Array[Byte]): AudioMeta =
    AudioMeta(id, bytes.length.toLong, None, None, None, None, Some(TruncatedReason))

  implicit val audioMetaEnc: Encoder[AudioMeta] = Encoders.product[AudioMeta]

  /** Deterministic tiny VALID 16-bit PCM WAV payload for a doc: format
    * parameters from id arithmetic (sample_rate = 8000·(1 + id mod 3),
    * channels = 1 + id mod 2, samples-per-channel = 16 + id mod 33 —
    * all recomputable by an oracle), sample bytes from the doc's text.
    * Canonical 44-byte RIFF/fmt/data layout — the simplest form every
    * WAV parser accepts, including the JDK's pure-Java
    * `javax.sound.sampled` one. */
  def wavBytes(id: Long, text: String): Array[Byte] = {
    val sampleRate = (8000L * (1L + java.lang.Math.floorMod(id, 3L))).toInt
    val channels = (1L + java.lang.Math.floorMod(id, 2L)).toInt
    val nSamples = (16L + java.lang.Math.floorMod(id, 33L)).toInt
    val blockAlign = channels * 2
    val dataSize = nSamples * blockAlign
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * blockAlign).putShort(blockAlign.toShort).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    val tb = text.getBytes("UTF-8")
    var i = 0
    while (i < nSamples * channels) {
      // 16-bit samples cycle through the text bytes (silence if empty)
      val s: Short = if (tb.isEmpty) 0
        else ((tb(java.lang.Math.floorMod(i, tb.length)) & 0xff) * 97).toShort
      buf.putShort(s)
      i += 1
    }
    buf.array()
  }

  /** Attach a REAL decodable audio column: one valid PCM WAV per doc
    * (built by [[wavBytes]], same partition-local batch shape as the
    * decode side). */
  def withWavContent(df: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text", outCol: String = "content"): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(rows => rows.map { case (id, t) => (id, wavBytes(id, t)) })
      .toDF(idCol, outCol)
  }

  /** Gradient WAV: same id-arithmetic format as [[wavBytes]], but sample
    * i is `((id + i) mod 256) · 97` — a CLOSED FORM a SQL oracle replays
    * sample-for-sample, the audio twin of [[gradientBmpBytes]]. (255·97 =
    * 24735 < 2^15, so every value is an exact int16.) */
  def gradientWavBytes(id: Long): Array[Byte] = {
    val sampleRate = (8000L * (1L + java.lang.Math.floorMod(id, 3L))).toInt
    val channels = (1L + java.lang.Math.floorMod(id, 2L)).toInt
    val nSamples = (16L + java.lang.Math.floorMod(id, 33L)).toInt
    val blockAlign = channels * 2
    val dataSize = nSamples * blockAlign
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * blockAlign).putShort(blockAlign.toShort).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < nSamples * channels) {
      buf.putShort((java.lang.Math.floorMod(id + i, 256L) * 97L).toShort)
      i += 1
    }
    buf.array()
  }

  /** Attach the gradient audio payload ([[gradientWavBytes]]). */
  def withGradientWavContent(df: DataFrame, idCol: String = "doc_id",
                             outCol: String = "content"): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"))
      .as[Long]
      .mapPartitions(rows => rows.map(id => (id, gradientWavBytes(id))))
      .toDF(idCol, outCol)
  }

  /** HOSTILE audio payloads, rotating by id — the WAV shapes a scraped
    * corpus serves: three body-hostile families (r12) plus two
    * METADATA-hostile ones (r13, the audio twin of the EXIF/ICC image
    * families). Selector mod 5, coprime to every format modulus (3, 2,
    * 33), so each family covers all format combos — probed uniform
    * against the JDK parser over the full 330-id period:
    *   id%5=0  gradient WAV with the data chunk cut in half → parses,
    *           but declared frames exceed the surviving bytes → the
    *           typed TRUNCATION error (no fabricated duration)
    *   id%5=1  intact gradient WAV → decodes at the id-arithmetic format
    *   id%5=2  cut mid-header (20 of 44 bytes) → no parser accepts it →
    *           the typed UNDECODABLE error
    *   id%5=3  intact WAV with a LIST/INFO chunk between fmt and data
    *           (what tagging tools leave behind) → the chunk-walking
    *           parser skips it: decodes IDENTICALLY to the bare
    *           encoding — same format, same frames, no false truncation
    *           (a canonical-44-byte-offset assumption would mis-read)
    *   id%5=4  LIST-chunked WAV with the data cut in half → metadata
    *           never rescues missing samples: the typed TRUNCATION
    *           error, exactly like the bare cut */
  def hostileWavBytes(id: Long): Array[Byte] =
    java.lang.Math.floorMod(id, 5L) match {
      case 0L =>
        val b = gradientWavBytes(id)
        java.util.Arrays.copyOf(b, 44 + (b.length - 44) / 2)
      case 1L => gradientWavBytes(id)
      case 2L => java.util.Arrays.copyOf(gradientWavBytes(id), 20)
      case 3L => listChunkWavBytes(id)
      case _ =>
        val b = listChunkWavBytes(id)
        // cut half the SAMPLE bytes (the data chunk starts 26 bytes
        // later than canonical, after the spliced LIST)
        java.util.Arrays.copyOf(b, 70 + (b.length - 70) / 2)
    }

  /** The gradient WAV with a RIFF LIST/INFO metadata chunk spliced
    * between fmt and data — the metadata-hostile shape tagging tools
    * leave behind (title/artist chunks): a parser that assumes the
    * canonical 44-byte layout mis-reads the data offset, while a
    * chunk-walking parser skips it and decodes IDENTICALLY to the bare
    * encoding. 18-byte INFO body (word-aligned), RIFF size field
    * adjusted, sample bytes untouched. */
  def listChunkWavBytes(id: Long): Array[Byte] = {
    val w = gradientWavBytes(id)
    val info = "INFOINAM".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0) ++ ("graft" + " ").getBytes("US-ASCII")
    val out = java.nio.ByteBuffer.allocate(w.length + 8 + info.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val riffSize = java.nio.ByteBuffer.wrap(w, 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    out.put(w, 0, 4).putInt(riffSize + 8 + info.length)
    out.put(w, 8, 28) // "WAVE" + the whole fmt chunk (bytes 8..35)
    out.put("LIST".getBytes("US-ASCII")).putInt(info.length).put(info)
    out.put(w, 36, w.length - 36) // the data chunk, byte-identical
    out.array()
  }

  /** The hostile-audio column: [[hostileWavBytes]] per row. */
  def withHostileWavContent(df: DataFrame, idCol: String = "doc_id",
                            outCol: String = "content"): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"))
      .as[Long]
      .mapPartitions(rows => rows.map(id => (id, hostileWavBytes(id))))
      .toDF(idCol, outCol)
  }

  /** SAMPLE-LEVEL audio features: parse the payload with
    * `javax.sound.sampled`, decode the PCM int16 stream the PARSER hands
    * back (not payload arithmetic), and sum |sample| over `windows`
    * equal index windows — exact integer energy per window, the audio
    * analog of the pixel histogram (and like it, hash-oracleable against
    * a closed-form payload). Output rows: (id, window, sum_abs).
    * Unparseable payloads yield no rows (the metadata path's stub
    * fallback covers them; a features consumer wants real samples). */
  def audioEnergy(id: Long, bytes: Array[Byte], windows: Int = 8): Seq[(Long, Int, Long)] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        // this engine's payloads are 16-bit LITTLE-endian signed PCM; any
        // other parsed format (e.g. big-endian AIFF, which the parser
        // accepts) must yield no rows like undecodable data — the
        // hand-rolled int16 decode below is little-endian-signed only,
        // and byte-swapped energies would be silently wrong rows
        if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
            fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
          Seq.empty
        else {
          val data = in.readAllBytes()
          val n = data.length / 2
          if (n == 0) Seq.empty
          else {
            val sums = new Array[Long](windows)
            val cnts = new Array[Long](windows)
            var i = 0
            while (i < n) {
              val lo = data(2 * i) & 0xff
              val hi = data(2 * i + 1).toInt // sign-extends: int16 value
              val v = (hi << 8) | lo
              val w = (i.toLong * windows / n).toInt
              sums(w) += math.abs(v)
              cnts(w) += 1
              i += 1
            }
            // only windows that CONTAIN samples emit a row (n < windows
            // leaves some empty): a GROUP-BY oracle over the samples can
            // only see populated windows, and an all-zero row for a
            // window no sample mapped to would hash-diverge from it —
            // the same contract as the pixel histogram's n > 0 filter
            (0 until windows).filter(cnts(_) > 0).map(w => (id, w, sums(w)))
          }
        }
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => Seq.empty
      case _: java.io.IOException => Seq.empty
    }

  /** Batched [[audioEnergy]] — one parser pass per payload inside
    * `mapPartitions`, rows exploded per window. */
  def audioEnergyBatched(df: DataFrame, windows: Int = 8,
                         idCol: String = "doc_id",
                         contentCol: String = "content"): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(rows => rows.flatMap { case (id, bytes) =>
        audioEnergy(id, bytes, windows) })
      .toDF(idCol, "window", "sum_abs")
      .select(col(idCol), col("window"), col("sum_abs"))
  }

  /** REAL audio decode via the JDK's `javax.sound.sampled` (its WAV/AIFF
    * parsers are pure Java and ship in every JRE): sample rate, channel
    * count, and frame length come from the DECODER's `AudioFormat`, not
    * from payload arithmetic. duration_ms is floor(frames·1000/rate) in
    * exact integer math (oracle-reproducible). Bytes no parser accepts
    * yield the typed-error row ([[undecodableAudio]]). */
  def audioDecode(id: Long, bytes: Array[Byte]): AudioMeta =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val rate = math.round(fmt.getSampleRate.toDouble).toInt
        val frames = in.getFrameLength
        // getFrameLength is the HEADER'S claim; a payload cut short of
        // it still parses (probed: the JDK reader reports declared
        // frames and hands back only the surviving bytes). Reporting
        // the claim for missing data would fabricate duration, so the
        // decode verifies availability and surfaces the typed
        // truncation error instead. One pass over the (small) payload —
        // the same read the feature extractors already do.
        val frameSize = fmt.getFrameSize
        val actualFrames =
          if (frameSize > 0) in.readAllBytes().length.toLong / frameSize else frames
        if (actualFrames < frames) truncatedAudio(id, bytes)
        else AudioMeta.decoded(id, bytes.length.toLong, rate, fmt.getChannels, frames,
          frames * 1000L / rate)
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException =>
        undecodableAudio(id, bytes)
      case _: java.io.IOException => undecodableAudio(id, bytes)
    }

  /** Deterministic tiny VALID animated GIF for a doc — the moving-image
    * payload (frame-count semantics) in a video-codec-free environment:
    * dims and frame count from id arithmetic (width = 1 + id mod 9,
    * height = 1 + id mod 5, frames = 2 + id mod 6), pixels from the
    * doc's text, encoded by the JDK's own GIF sequence writer. */
  def gifBytes(id: Long, text: String): Array[Byte] = {
    val width = (1L + java.lang.Math.floorMod(id, 9L)).toInt
    val height = (1L + java.lang.Math.floorMod(id, 5L)).toInt
    val nFrames = (2L + java.lang.Math.floorMod(id, 6L)).toInt
    val tb = text.getBytes("UTF-8")
    val baos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            val v = if (tb.isEmpty) 0
              else tb(java.lang.Math.floorMod(f * width * height + y * width + x,
                tb.length)) & 0xff
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    baos.toByteArray
  }

  /** Attach a REAL decodable animated column: one valid multi-frame GIF
    * per doc, same batch shape as the other payload builders. */
  def withGifContent(df: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text", outCol: String = "content"): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(rows => rows.map { case (id, t) => (id, gifBytes(id, t)) })
      .toDF(idCol, outCol)
  }

  /** REAL animation decode: frame COUNT and dims come from the JDK GIF
    * reader walking the image sequence (`getNumImages(allowSearch)` over
    * a seekable memory stream), not from payload arithmetic — the
    * frame-sampling operators downstream consume a decoder-reported
    * n_frames. Bytes no reader accepts yield the typed-error row. */
  def animationDecode(id: Long, bytes: Array[Byte]): MediaMeta = {
    val in = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) undecodableMeta(id, bytes)
      else {
        val reader = readers.next()
        try {
          reader.setInput(in)
          MediaMeta.decoded(id, bytes.length.toLong,
            reader.getWidth(0), reader.getHeight(0),
            reader.getNumImages(true))
        } finally reader.dispose()
      }
    } catch {
      case _: java.io.IOException => undecodableMeta(id, bytes)
    } finally in.close()
  }

  /** Partition-local batched audio decode — [[decodeBatched]]'s shape
    * with the audio metadata row. */
  def audioDecodeBatched(df: DataFrame, idCol: String = "doc_id",
                         contentCol: String = "content"): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(rows => rows.map { case (id, bytes) => audioDecode(id, bytes) })
      .toDF()
  }

  /** Partition-local batched decode — the `mapInPandas` analog. The
    * decoder runs once per payload inside `mapPartitions`, so a real
    * codec would amortize model/library init per partition, not per row. */
  def decodeBatched(df: DataFrame, idCol: String = "doc_id",
                    contentCol: String = "content",
                    decoder: (Long, Array[Byte]) => MediaMeta = imageDecode): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real impl: init codec/library once here, then stream the batch
        rows.map { case (id, bytes) => decoder(id, bytes) }
      }
      .toDF()
  }

  /** Per-pixel grayscale histogram of a DECODED image: gray = (r+g+b)/3
    * in integer arithmetic, bin = gray*bins/256 — every step exact, so an
    * oracle that knows the payload's pixel bytes can recompute the counts
    * to the row. */
  def grayHistogram(img: java.awt.image.BufferedImage, bins: Int): Array[Long] = {
    val counts = new Array[Long](bins)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        val gray = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
        counts(gray * bins / 256) += 1
        x += 1
      }
      y += 1
    }
    counts
  }

  private def decodeImage(bytes: Array[Byte]): java.awt.image.BufferedImage =
    try javax.imageio.ImageIO.read(
      new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes)))
    catch { case _: java.io.IOException => null }

  /** REAL feature extraction (replaces the long-standing stub): decode the
    * payload with `javax.imageio` and derive
    * `bins` histogram fractions ++ [width/16, height/8, clamped-size]
    * — a fixed-width `array<float>` embedding computed from ACTUAL pixels.
    * The histogram block sums to 1, so cosine(a,b)=1 forces byte-identical
    * feature vectors (no cross-doc false ties from proportional vectors);
    * the dims channels separate docs whose gray distributions coincide.
    * Undecodable payloads get the zero vector (documented fallback —
    * cosine 0 against everything, never a spurious match). */
  def pixelFeatures(bytes: Array[Byte], bins: Int = 16): Array[Float] = {
    val img = decodeImage(bytes)
    if (img == null) new Array[Float](bins + 3)
    else {
      val counts = grayHistogram(img, bins)
      val total = (img.getWidth.toLong * img.getHeight).toFloat
      val out = new Array[Float](bins + 3)
      var i = 0
      while (i < bins) { out(i) = counts(i) / total; i += 1 }
      out(bins) = img.getWidth / 16f
      out(bins + 1) = img.getHeight / 8f
      out(bins + 2) = math.min(bytes.length, 4096) / 4096f
      out
    }
  }

  /** Feature dimension of [[pixelFeatures]] at a bin count. */
  def pixelFeatureDim(bins: Int = 16): Int = bins + 3

  /** Perceptual difference-hash (dHash) features: 65 nearest-pixel
    * samples of the decoded image, the SIGN of each consecutive gray
    * difference as ±1 — 64 order-sensitive bits, the standard perceptual
    * image fingerprint. Distribution-level features (histograms, even
    * spatially banded ones) collapse on corpora whose payloads share a
    * byte distribution — all-ASCII text pixels put half the corpus at
    * cosine>0.99 of each other (measured 218k-360k candidate pairs at
    * sf0.1); gradient SIGNS depend on the actual pixel sequence, so
    * unrelated docs decorrelate (cosine ≈ 2·agreement−1 ≈ 0) while a
    * byte-copy stays at exactly 1. A 16-sample RAW-gray block carries
    * content identity for images too small for the sign bits to
    * discriminate; a 16-bin histogram block + dims channels complete
    * the embedding. Undecodable payloads get the zero vector. */
  def dhashFeatures(bytes: Array[Byte], bins: Int = 16): Array[Float] = {
    val dim = 64 + 16 + bins + 3
    val img = decodeImage(bytes)
    if (img == null) new Array[Float](dim)
    else {
      val w = img.getWidth; val h = img.getHeight
      val out = new Array[Float](dim)
      def gray(x: Int, y: Int): Int = {
        val rgb = img.getRGB(x, y)
        (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
      }
      // 65 nearest-pixel samples along the LINEAR pixel index (row-major),
      // 64 consecutive-difference sign bits. A fixed 8x9 spatial grid
      // degenerates on narrow images (width 1 => one column => every bit
      // identical => 61k false pairs at sf0.1 — measured); the linear
      // walk spreads samples over whatever pixels exist, so any image
      // with >1 pixel stays content-dependent. Deterministic integer
      // index arithmetic — no resampling filter to disagree about.
      val n = w * h
      var prev = gray(0, 0)
      var k = 1
      while (k <= 64) {
        val idx = (k.toLong * n / 65).toInt
        val cur = gray(idx % w, idx / w)
        out(k - 1) = if (prev > cur) 1f else -1f
        prev = cur
        k += 1
      }
      // 16 RAW sampled gray values (scaled ±1 around mid-gray): content
      // identity for images too small for gradient bits to discriminate
      // (≤7 pixels leave most consecutive samples equal — 18k residual
      // pairs at sf0.1 without this block). Weighted like the dhash bits
      // so tiny-image collisions actually move the cosine.
      var m = 0
      while (m < 16) {
        val idx = (m.toLong * n / 16).toInt
        out(64 + m) = (gray(idx % w, idx / w) - 128) / 128f
        m += 1
      }
      val counts = grayHistogram(img, bins)
      val total = (w.toLong * h).toFloat
      var b = 0
      while (b < bins) { out(80 + b) = counts(b) / total; b += 1 }
      out(80 + bins) = w / 16f
      out(80 + bins + 1) = h / 8f
      out(80 + bins + 2) = math.min(bytes.length, 4096) / 4096f
      out
    }
  }

  /** Feature dimension of [[dhashFeatures]]. */
  def dhashFeatureDim(bins: Int = 16): Int = 64 + 16 + bins + 3

  /** Batched [[dhashFeatures]] — same shape as [[featuresBatched]]. */
  def dhashFeaturesBatched(df: DataFrame, bins: Int = 16,
                           idCol: String = "doc_id",
                           contentCol: String = "content"): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(rows => rows.map { case (id, bytes) =>
        (id, dhashFeatures(bytes, bins)) })
      .toDF(idCol, "features")
  }

  /** Batched REAL feature extraction — [[decodeBatched]]'s shape with the
    * pixel-feature row: (id, array<float>). The decoder runs once per
    * payload inside `mapPartitions`; a heavier encoder model would init
    * per partition here. */
  def featuresBatched(df: DataFrame, bins: Int = 16,
                      idCol: String = "doc_id",
                      contentCol: String = "content"): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(rows => rows.map { case (id, bytes) =>
        (id, pixelFeatures(bytes, bins)) })
      .toDF(idCol, "features")
  }

  /** Batched raw histogram counts — the EXACT-integer face of the feature
    * path, used by the oracled driver row: (id, array<long> of bin
    * counts). Undecodable payloads yield all-zero counts. */
  def histogramBatched(df: DataFrame, bins: Int = 16,
                       idCol: String = "doc_id",
                       contentCol: String = "content"): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(rows => rows.map { case (id, bytes) =>
        val img = decodeImage(bytes)
        (id, if (img == null) new Array[Long](bins) else grayHistogram(img, bins))
      })
      .toDF(idCol, "counts")
  }

  /** REAL image resize/transcode: decode with [[imageDecode]]'s reader,
    * scale into the aspect-preserving target box (never upscale — the
    * same `least(scale, 1)` rule as [[resizeMeta]]) with AWT's
    * area-averaging draw, re-encode BMP with the JDK writer, and report
    * the DECODED-then-re-DECODED dims so the output contract is what a
    * downstream reader will actually see. Undecodable bytes pass
    * through as the typed-error row. Runs per payload inside the same
    * batched `mapPartitions` contract as the decode paths. */
  def imageResize(id: Long, bytes: Array[Byte], maxW: Int, maxH: Int): MediaMeta = {
    val img =
      try javax.imageio.ImageIO.read(
        new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes)))
      catch { case _: java.io.IOException => null }
    if (img == null) undecodableMeta(id, bytes)
    else {
      val scale = math.min(1.0,
        math.min(maxW.toDouble / img.getWidth, maxH.toDouble / img.getHeight))
      val w = math.max(1, math.floor(img.getWidth * scale).toInt)
      val h = math.max(1, math.floor(img.getHeight * scale).toInt)
      val out = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val g = out.createGraphics()
      try g.drawImage(
        img.getScaledInstance(w, h, java.awt.Image.SCALE_AREA_AVERAGING), 0, 0, null)
      finally g.dispose()
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "bmp", baos)
      imageDecode(id, baos.toByteArray)
    }
  }

  /** Batched resize — [[decodeBatched]]'s shape with the transcode row. */
  def resizeBatched(df: DataFrame, maxW: Int, maxH: Int,
                    idCol: String = "doc_id",
                    contentCol: String = "content"): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(rows => rows.map { case (id, bytes) =>
        imageResize(id, bytes, maxW, maxH) })
      .toDF()
  }

  /** Metadata-only resize plan: recomputes the metadata struct for a
    * target box, preserving aspect ratio, without touching payload
    * bytes — the planning twin of [[imageResize]] (same scale rule). */
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
