package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for training-data pipelines: media as
  * opaque `binary` columns with typed metadata, processed in partition
  * batches.
  *
  * The Spark-side plumbing — schema, batch shape, partition sizing,
  * metadata propagation — is real and tested. Decode coverage:
  * [[HeaderCodec]] parses real PNG/BMP/WAV headers; [[PixelCodec]]
  * decodes real BMP pixels and WAV PCM samples (pure byte arithmetic,
  * no libraries). Only compressed-format pixel decode (PNG inflate,
  * JPEG DCT) remains stubbed behind [[StubCodec]]'s deterministic fake
  * — this container has no image/audio libraries. Swapping in a real
  * codec changes only that object.
  *
  * Batch processing goes through `mapPartitions` on a typed Dataset (the
  * Scala analog of `mapInPandas` batches): one codec instance per
  * partition, rows streamed through it — the shape that amortizes model
  * or codec initialization at scale.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaMeta(media_id: Long, kind: String, byte_len: Long,
      width: Int, height: Int, valid: Boolean)
  case class MediaFeature(media_id: Long, frame: Int, feature: Array[Float])

  /** Deterministic fake codec. Header layout (for the synthetic fixture):
    * bytes 0-1 magic 'G','M'; byte 2 width; byte 3 height. Everything
    * else is treated as payload. A real decoder (javax.imageio, ffmpeg
    * bindings, ...) replaces exactly this object — [[HeaderCodec]]
    * already does so for PNG/BMP/WAV, whose metadata is pure byte
    * arithmetic. */
  object StubCodec {
    def decodeMeta(payload: Array[Byte]): (Int, Int, Boolean) =
      if (payload.length >= 4 && payload(0) == 'G' && payload(1) == 'M')
        ((payload(2) & 0xff), (payload(3) & 0xff), true)
      else (0, 0, false)

    /** Fake frame-sample + feature-extract: `frames` deterministic
      * "frames", each an 8-dim feature from payload byte statistics. */
    def extractFeatures(payload: Array[Byte], frames: Int): Seq[(Int, Array[Float])] =
      (0 until frames).map { f =>
        val slice = payload.drop(4 + f).take(32)
        val feat = Array.tabulate(8) { i =>
          if (slice.isEmpty) 0f
          else slice.map(b => ((b & 0xff) * (i + 1)) % 251).sum.toFloat / slice.length
        }
        (f, feat)
      }
  }

  /** Deterministic synthetic media table (no external data): payload =
    * header + pseudo-random-but-seeded bytes. */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).as[Long].map { id =>
      val w = (16 + id % 64).toInt
      val h = (16 + (id * 7) % 64).toInt
      val body = Array.tabulate(64)(i => (((id * 131 + i * 17) % 251) & 0xff).toByte)
      val corrupt = id % 13 == 5 // some rows fail decode
      val header =
        if (corrupt) Array[Byte]('X', 'X', 0, 0)
        else Array[Byte]('G', 'M', w.toByte, h.toByte)
      MediaRow(id, if (id % 2 == 0) "image" else "audio", header ++ body)
    }
  }

  /** Metadata extraction: one codec per partition, streamed rows. */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec init would happen here (amortized at scale)
      it.map { m =>
        val (w, h, ok) = StubCodec.decodeMeta(m.payload)
        MediaMeta(m.media_id, m.kind, m.payload.length.toLong, w, h, ok)
      }
    }
  }

  /** Frame-sampled feature extraction: 1→N rows per media item. */
  def extractFeatures(media: Dataset[MediaRow], frames: Int): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      StubCodec.extractFeatures(m.payload, frames)
        .map { case (f, feat) => MediaFeature(m.media_id, f, feat) }
    }
  }

  /** Join features back to metadata, drop invalid decodes — the typical
    * downstream shape feeding an embedding/similarity stage. */
  def validFeatures(meta: Dataset[MediaMeta], feats: Dataset[MediaFeature]): DataFrame =
    feats.join(meta.filter(col("valid")).select("media_id", "kind", "width", "height"),
      Seq("media_id"))
}
