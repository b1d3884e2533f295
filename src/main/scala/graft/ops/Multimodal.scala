package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * payloads as opaque `binary` columns with typed metadata, decoded and
  * feature-extracted inside `mapPartitions` batches.
  *
  * The actual codec step is STUBBED with a deterministic fake decoder (no
  * image/audio libraries exist in this sandbox) — the Spark-side plumbing
  * (schema, batch shape, partition-local decoding, frame sampling) is real
  * and tested. Swap `FakeCodec` for a real decoder (e.g. TwelveMonkeys /
  * javacv) on a cluster with the jars.
  */
object Multimodal {

  /** typed metadata travelling with the opaque payload */
  final case class MediaRow(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      n_frames: Int)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      mean_luma: Double, // image/video: fake decoded pixel mean
      rms: Double, // audio: fake decoded sample RMS
      sampled_frames: Seq[Int], // video: deterministic frame indices
      phash: Long) // perceptual-hash stand-in over decoded content

  /** Deterministic fake codec: "decodes" payload bytes into a stable pseudo
    * pixel/sample stream. Replace with a real decoder on a real cluster. */
  object FakeCodec {
    def decodeBytes(payload: Array[Byte]): Array[Int] = {
      // deterministic "decode": xorshift over payload bytes
      val out = new Array[Int](math.min(payload.length, 4096))
      var h = 0x9e3779b9
      var i = 0
      while (i < out.length) {
        h = (h ^ (payload(i) & 0xff)) * 0x01000193
        out(i) = (h >>> 24) & 0xff
        i += 1
      }
      out
    }
  }

  /** evenly-spaced frame sampling (video): k indices in [0, nFrames) */
  def sampleFrames(nFrames: Int, k: Int): Seq[Int] =
    if (nFrames <= 0 || k <= 0) Nil
    else if (nFrames <= k) 0 until nFrames
    else (0 until k).map(i => (i.toLong * nFrames / k).toInt)

  /** partition-batched decode + featurize; the executor-side batch shape
    * mirrors mapInPandas batching: one codec instance per partition. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition "decoder" state (real codecs are expensive to init)
      rows.map { r =>
        val decoded = FakeCodec.decodeBytes(r.payload)
        val mean = if (decoded.isEmpty) 0.0 else decoded.map(_.toDouble).sum / decoded.length
        val rms = if (decoded.isEmpty) 0.0
          else math.sqrt(decoded.map(v => (v - 128.0) * (v - 128.0)).sum / decoded.length)
        var ph = 0L
        var i = 0
        while (i < 64 && i < decoded.length) {
          if (decoded(i) >= mean) ph |= (1L << i)
          i += 1
        }
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
          if (r.kind == "audio") 0.0 else math.rint(mean * 1e6) / 1e6,
          if (r.kind == "audio") math.rint(rms * 1e6) / 1e6 else 0.0,
          if (r.kind == "video") sampleFrames(r.n_frames, 8) else Nil,
          ph)
      }
    }
  }

  /** deterministic synthetic media table for tests/bench */
  def synthetic(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).as[Long].map { i =>
      val kinds = Array("image", "audio", "video")
      val kind = kinds((i % 3).toInt)
      val len = 256 + ((i * 2654435761L) % 1024).toInt.abs
      val payload = Array.tabulate(len)(j => ((i * 31 + j * 7 + seed) & 0xff).toByte)
      MediaRow(i, kind, payload,
        width = if (kind != "audio") 64 else 0,
        height = if (kind != "audio") 64 else 0,
        sample_rate = if (kind == "audio") 16000 else 0,
        n_frames = if (kind == "video") 24 + (i % 100).toInt else if (kind == "image") 1 else 0)
    }
  }
}
