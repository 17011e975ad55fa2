package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}

/** REAL (if minimal) media metadata decoders — no external libraries,
  * because the interesting formats put their metadata in fixed-layout
  * headers that are pure byte arithmetic:
  *
  *  - PNG: 8-byte signature, then the IHDR chunk carries width/height
  *    as big-endian u32 at offsets 16/20.
  *  - BMP: 'BM' magic; BITMAPINFOHEADER carries signed little-endian
  *    width at 18 and height at 22 (negative height = top-down rows).
  *  - WAV: 'RIFF' + 'WAVE', then the 'fmt ' chunk (walked, not assumed
  *    at a fixed offset) carries channels / sample rate / bits.
  *  - 'GM': the deterministic synthetic fixture format ([[Multimodal.StubCodec]]).
  *
  * This is the swap-in seam the stub codec documented: full pixel/PCM
  * decode still needs real libraries, but container sniffing + metadata
  * extraction — the part a 100 TB filter/group/dedup pipeline runs over
  * EVERY object before deciding what to decode — is genuinely
  * implemented and tested against hand-built valid files.
  */
object HeaderCodec {

  /** kind, width, height, channels, sampleRate, valid */
  final case class Meta(media_id: Long, format: String, width: Int, height: Int,
      channels: Int, sample_rate: Int, byte_len: Long, valid: Boolean)

  private def beU32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def leU32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def leU16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private val PngSig = Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  def sniff(b: Array[Byte]): String =
    if (b.length >= 8 && PngSig.indices.forall(i => (b(i) & 0xff) == PngSig(i))) "png"
    else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') "bmp"
    else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') "wav"
    else if (b.length >= 4 && b(0) == 'G' && b(1) == 'M') "gm"
    else "unknown"

  /** Dimensions are UNTRUSTED u32/i32 header fields: anything outside
    * (0, 2^31) — including 0x80000000, whose .toInt is Int.MinValue and
    * whose math.abs is STILL negative — must come back invalid, never a
    * negative width/height with valid=true (downstream bounds checks
    * and buffer sizing would see nonsense). */
  private def dims(mediaId: Long, fmt: String, w: Long, h: Long,
      size: Long): Meta = {
    val ok = w > 0 && w <= Int.MaxValue && h > 0 && h <= Int.MaxValue
    if (ok) Meta(mediaId, fmt, w.toInt, h.toInt, 0, 0, size, valid = true)
    else Meta(mediaId, fmt, 0, 0, 0, 0, size, valid = false)
  }

  def decode(mediaId: Long, b: Array[Byte]): Meta = sniff(b) match {
    case "png" if b.length >= 24 &&
        new String(b, 12, 4, "US-ASCII") == "IHDR" =>
      dims(mediaId, "png", beU32(b, 16), beU32(b, 20), b.length.toLong)
    case "bmp" =>
      // BITMAPINFOHEADER: signed LE width@18, height@22 (negative
      // height = top-down bitmap, a LEGAL encoding — |height| is the
      // real dimension); BITMAPCOREHEADER (size 12) uses u16 fields
      val dibSize = leU32(b, 14)
      if (dibSize == 12)
        dims(mediaId, "bmp", leU16(b, 18).toLong, leU16(b, 20).toLong, b.length.toLong)
      else {
        val w = leU32(b, 18).toInt.toLong // signed i32
        val h = math.abs(leU32(b, 22).toInt.toLong) // abs on LONG: no MinValue trap
        dims(mediaId, "bmp", w, h, b.length.toLong)
      }
    case "wav" =>
      // walk RIFF chunks for 'fmt ' (never assume a fixed offset: LIST
      // or JUNK chunks legitimately precede it). Chunk sizes are
      // UNTRUSTED input: keep them as Long (u32 can exceed Int.MaxValue)
      // and force forward progress, or a crafted size of ~0xFFFFFFF8
      // would loop this task forever / step backwards.
      var off = 12L
      while (off + 8 <= b.length) {
        val o = off.toInt
        val id = new String(b, o, 4, "US-ASCII")
        val sz = leU32(b, o + 4)
        if (id == "fmt " && off + 8 + 16 <= b.length) {
          val rate = leU32(b, o + 12) // untrusted u32: > Int range = garbage
          return Meta(mediaId, "wav", 0, 0,
            leU16(b, o + 10), math.min(rate, Int.MaxValue).toInt,
            b.length.toLong, valid = rate <= Int.MaxValue)
        }
        off += 8 + sz + (sz & 1) // chunks are word-aligned
      }
      Meta(mediaId, "wav", 0, 0, 0, 0, b.length.toLong, valid = false)
    case "gm" =>
      val (w, h, ok) = Multimodal.StubCodec.decodeMeta(b)
      Meta(mediaId, "gm", w, h, 0, 0, b.length.toLong, ok)
    case _ =>
      Meta(mediaId, "unknown", 0, 0, 0, 0, b.length.toLong, valid = false)
  }

  /** Partition-batched metadata extraction over any media table with
    * (media_id, payload) — the same mapPartitions shape as
    * [[Multimodal.decodeMeta]], with format sniffing. */
  def decodeMeta(media: Dataset[Multimodal.MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(m => decode(m.media_id, m.payload))).toDF()
  }
}
