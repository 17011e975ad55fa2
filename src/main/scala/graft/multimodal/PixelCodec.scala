package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}

/** REAL pixel/sample decode for the two container formats that need no
  * media libraries — closing the stub seam [[Multimodal.StubCodec]]
  * declared (VERDICT r6 ask #6):
  *
  *  - **BMP** (BITMAPINFOHEADER, uncompressed BI_RGB 24bpp): the pixel
  *    array is raw BGR triples, rows padded to 4-byte stride, stored
  *    bottom-up (or top-down when the header height is negative). Pure
  *    byte arithmetic: offset walking, stride, row-order flip, channel
  *    order.
  *  - **WAV** (PCM, 16-bit mono): the `data` chunk is raw LE int16
  *    samples; the chunk walker (shared shape with
  *    [[HeaderCodec.decode]]) tolerates JUNK/LIST chunks before `fmt `.
  *
  * PNG/JPEG pixel decode stays out of scope (inflate/DCT need real
  * libraries); their header metadata remains covered by
  * [[HeaderCodec]]. The Spark surface is the same partition-batched
  * `mapPartitions` shape as the other codecs — one decoder per
  * partition, rows streamed through it.
  *
  * Reference seam: the reference has no media pipeline at all (Go ETL
  * over JSON rows); this is part of the training-data-pipeline surface
  * the engine adds for multimodal corpora.
  */
object PixelCodec {

  /** Exact integer features of one media object — order-sensitive
    * (`wsum` weights each unit by its logical position), so a decoder
    * that misreads stride, row order, or channel order produces a
    * different value even when plain sums collide.
    *
    * BMP: n_units = w*h; sum1 = ΣR; sum2 = ΣB; wsum = Σ (1+x+31y)·R
    * over LOGICAL coordinates (y=0 the top row, whatever the storage
    * order). WAV: n_units = samples; sum1 = Σs; sum2 = Σ|s|;
    * wsum = Σ (i+1)·s. */
  final case class MediaPixelFeature(media_id: Long, format: String,
      n_units: Long, sum1: Long, sum2: Long, wsum: Long, valid: Boolean)

  private def leU32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def leU16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Decoded BMP: logical-coordinate channel accessor (y=0 = top row).
    * `channel` is the STORED order: 0=B, 1=G, 2=R. */
  final case class BmpPixels(width: Int, height: Int,
      at: (Int, Int, Int) => Int)

  /** Parse an uncompressed 24bpp BITMAPINFOHEADER BMP into a pixel
    * accessor. None for anything else (compressed, other depths,
    * truncated) — decode failures are data, not exceptions. */
  def decodeBmpPixels(b: Array[Byte]): Option[BmpPixels] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val dataOffset = leU32(b, 10)
    val dibSize = leU32(b, 14)
    if (dibSize < 40) return None // BITMAPCOREHEADER: not produced here
    val w = leU32(b, 18).toInt // signed i32
    val hRaw = leU32(b, 22).toInt
    val topDown = hRaw < 0
    val h = math.abs(hRaw.toLong).toInt
    val planes = leU16(b, 26)
    val bpp = leU16(b, 28)
    val compression = leU32(b, 30)
    if (w <= 0 || h <= 0 || planes != 1 || bpp != 24 || compression != 0)
      return None
    // stride in LONG: header width is untrusted, and w*3 in Int wraps
    // for w ≥ ~0x2AAAAAAB — a crafted width would pass an Int-arithmetic
    // bounds check and then throw on pixel access instead of returning
    // None (decode failures are data, not exceptions)
    val strideL = ((w.toLong * 3 + 3) / 4) * 4 // rows pad to 4-byte boundaries
    if (dataOffset < 0 || dataOffset + strideL * h > b.length) return None
    val stride = strideL.toInt // ≤ b.length after the check
    val base = dataOffset.toInt
    Some(BmpPixels(w, h, (x, y, c) => {
      val storedRow = if (topDown) y else h - 1 - y
      b(base + storedRow * stride + x * 3 + c) & 0xff
    }))
  }

  /** Parse a PCM 16-bit mono WAV into its sample array (LE int16).
    * Chunk sizes are untrusted u32: kept as Long with forced forward
    * progress, same hardening as [[HeaderCodec.decode]]. */
  def decodeWavSamples(b: Array[Byte]): Option[Array[Int]] = {
    if (b.length < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
      b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' ||
      b(11) != 'E') return None
    var off = 12L
    var fmtOk = false
    var data: Option[(Int, Int)] = None // (offset, byteLen)
    while (off + 8 <= b.length && data.isEmpty) {
      val o = off.toInt
      val id = new String(b, o, 4, "US-ASCII")
      val sz = leU32(b, o + 4)
      if (id == "fmt " && off + 8 + 16 <= b.length)
        fmtOk = leU16(b, o + 8) == 1 && // PCM
          leU16(b, o + 10) == 1 && // mono
          leU16(b, o + 22) == 16 // 16-bit
      else if (id == "data" && fmtOk && off + 8 + sz <= b.length)
        data = Some((o + 8, sz.toInt))
      off += 8 + sz + (sz & 1)
    }
    data.map { case (start, len) =>
      Array.tabulate(len / 2)(i => leU16(b, start + 2 * i).toShort.toInt)
    }
  }

  /** Pixel-value formula of the synthetic corpus, over LOGICAL
    * coordinates and STORED channel index (0=B,1=G,2=R) — the oracle
    * replays exactly this arithmetic; the decoder must reconstruct the
    * coordinates from the bytes to match. */
  def synthPixel(id: Long, x: Int, y: Int, c: Int): Int =
    ((id * 131 + x * 17 + y * 29 + c * 53) % 251).toInt

  /** Sample-value formula of the synthetic WAV corpus. */
  def synthSample(id: Long, i: Int): Int =
    ((id * 37 + i * 11) % 2048).toInt - 1024

  /** Deterministic synthetic corpus of REAL media files: even ids are
    * valid 24bpp BMPs (odd widths force stride padding; ids ≡ 1 mod 4
    * of the height cycle are stored TOP-DOWN via negative header
    * height), odd ids are PCM16 mono WAVs with a JUNK chunk before
    * `fmt ` (the walker must not assume offsets). Every byte is a
    * function of the id alone — no external data. */
  def syntheticMediaReal(spark: org.apache.spark.sql.SparkSession,
      n: Int): Dataset[Multimodal.MediaRow] = {
    import spark.implicits._
    spark.range(n).as[Long].map { id =>
      if (id % 2 == 0)
        Multimodal.MediaRow(id, "image", buildBmp(id))
      else
        Multimodal.MediaRow(id, "audio", buildWav(id))
    }
  }

  private def le32(v: Long): Array[Byte] =
    Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def le16(v: Int): Array[Byte] = Array[Byte](v.toByte, (v >> 8).toByte)

  /** A complete valid BMP file for `id`: w = 3 + id%5 (3..7 — strides
    * 12,16,20,24,24: both padded and unpadded rows occur), h = 2 +
    * id%4, top-down when id%4 == 1. */
  def buildBmp(id: Long): Array[Byte] = {
    val w = (3 + id % 5).toInt
    val h = (2 + id % 4).toInt
    val topDown = id % 4 == 1
    val stride = ((w * 3 + 3) / 4) * 4
    val pixelBytes = stride * h
    val px = new Array[Byte](pixelBytes) // pad bytes stay 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val storedRow = if (topDown) y else h - 1 - y
      px(storedRow * stride + x * 3 + c) = synthPixel(id, x, y, c).toByte
    }
    "BM".getBytes("US-ASCII") ++ le32(54L + pixelBytes) ++ le32(0) ++
      le32(54) ++ // BITMAPFILEHEADER: size, reserved, data offset
      le32(40) ++ le32(w.toLong) ++
      le32(if (topDown) (-h.toLong) & 0xffffffffL else h.toLong) ++
      le16(1) ++ le16(24) ++ le32(0) ++ le32(pixelBytes.toLong) ++
      le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0) ++ px
  }

  /** A complete valid PCM16 mono WAV for `id`, with a leading JUNK
    * chunk: nSamples = 40 + id%17 (odd counts exercise the word-align
    * skip on the data chunk). */
  def buildWav(id: Long): Array[Byte] = {
    val n = (40 + id % 17).toInt
    val dataBytes = n * 2
    val pad = dataBytes & 1 // always 0 for 16-bit, kept for form
    val junkLen = 6 // odd-ish content before fmt
    val riffLen = 4 + (8 + junkLen) + (8 + 16) + (8 + dataBytes + pad)
    val samples = Array.tabulate(n)(i => synthSample(id, i))
    "RIFF".getBytes("US-ASCII") ++ le32(riffLen.toLong) ++
      "WAVE".getBytes("US-ASCII") ++
      "JUNK".getBytes("US-ASCII") ++ le32(junkLen.toLong) ++
      new Array[Byte](junkLen) ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(dataBytes.toLong) ++
      samples.flatMap(s => le16(s & 0xffff)) ++ new Array[Byte](pad)
  }

  /** Partition-batched exact-feature extraction over real decoded
    * pixels/samples (one decoder per partition, rows streamed). All
    * features are bounded integer sums — exact in Long, replayable by
    * an external oracle from the value formulas. */
  def pixelFeatures(media: Dataset[Multimodal.MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      HeaderCodec.sniff(m.payload) match {
        case "bmp" =>
          decodeBmpPixels(m.payload) match {
            case Some(bmp) =>
              var sumR = 0L; var sumB = 0L; var wsum = 0L
              for (y <- 0 until bmp.height; x <- 0 until bmp.width) {
                val r = bmp.at(x, y, 2)
                sumR += r
                sumB += bmp.at(x, y, 0)
                wsum += (1L + x + 31L * y) * r
              }
              MediaPixelFeature(m.media_id, "bmp",
                bmp.width.toLong * bmp.height, sumR, sumB, wsum, valid = true)
            case None =>
              MediaPixelFeature(m.media_id, "bmp", 0, 0, 0, 0, valid = false)
          }
        case "wav" =>
          decodeWavSamples(m.payload) match {
            case Some(s) =>
              var sum = 0L; var sumAbs = 0L; var wsum = 0L
              var i = 0
              while (i < s.length) {
                sum += s(i); sumAbs += math.abs(s(i)).toLong
                wsum += (i + 1L) * s(i); i += 1
              }
              MediaPixelFeature(m.media_id, "wav", s.length.toLong,
                sum, sumAbs, wsum, valid = true)
            case None =>
              MediaPixelFeature(m.media_id, "wav", 0, 0, 0, 0, valid = false)
          }
        case other =>
          MediaPixelFeature(m.media_id, other, 0, 0, 0, 0, valid = false)
      }
    }).toDF()
  }
}
