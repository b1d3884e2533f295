package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.AudioSystem

import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * payloads as opaque `binary` columns with typed metadata, decoded and
  * feature-extracted inside `mapPartitions` batches.
  *
  * Codecs (pure JDK, no external jars):
  *  - images: real PNG/JPEG decode via `javax.imageio.ImageIO`; features are
  *    computed from decoded pixels (mean luma, 8x8 average-hash);
  *  - audio: real WAV (RIFF/PCM16) decode via `javax.sound.sampled`; RMS and
  *    a 64-bucket amplitude fingerprint over decoded samples;
  *  - video: STUBBED — no video codec exists in the JDK or this sandbox's
  *    jars; `StubVideoCodec` is a clearly-marked deterministic fake. The
  *    Spark-side plumbing (schema, partition-batched decode, frame
  *    sampling) is real and is what a javacv-backed codec would plug into.
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
      decoded_w: Int, // image: real decoded width (0 otherwise)
      decoded_h: Int,
      mean_luma: Double, // image: mean Rec.601 luma of decoded pixels
      rms: Double, // audio: RMS of decoded samples, normalized to [-1,1]
      sampled_frames: Seq[Int], // video: deterministic frame indices
      phash: Long) // image: 8x8 aHash; audio: amplitude fingerprint

  // ---- image codec (javax.imageio: PNG + JPEG, real decode) -----------------
  object ImageCodec {
    ImageIO.setUseCache(false) // keep encode/decode fully in-memory

    /** decode to (width, height, row-major Rec.601 luma 0..255) */
    def decodeLuma(payload: Array[Byte]): (Int, Int, Array[Int]) = {
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      if (img == null) throw new IllegalArgumentException("undecodable image payload")
      val w = img.getWidth
      val h = img.getHeight
      val luma = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          luma(y * w + x) = (299 * r + 587 * g + 114 * b) / 1000
          x += 1
        }
        y += 1
      }
      (w, h, luma)
    }

    /** 8x8 average-hash: block-average luma to an 8x8 grid, set bit
      * (gy*8+gx) when the cell is >= the grid mean. The standard aHash. */
    def aHash(w: Int, h: Int, luma: Array[Int]): Long = {
      val grid = new Array[Double](64)
      var gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 8) {
          val y0 = gy * h / 8; val y1 = math.max((gy + 1) * h / 8, y0 + 1)
          val x0 = gx * w / 8; val x1 = math.max((gx + 1) * w / 8, x0 + 1)
          var s = 0L; var n = 0
          var y = y0
          while (y < y1 && y < h) {
            var x = x0
            while (x < x1 && x < w) { s += luma(y * w + x); n += 1; x += 1 }
            y += 1
          }
          grid(gy * 8 + gx) = if (n == 0) 0.0 else s.toDouble / n
          gx += 1
        }
        gy += 1
      }
      val mean = grid.sum / 64
      var hash = 0L
      var i = 0
      while (i < 64) {
        if (grid(i) >= mean) hash |= (1L << i)
        i += 1
      }
      hash
    }

    /** 9x8-grid difference hash (dHash): block-average luma to 8 rows of
      * 9 cells, set bit (gy*8+gx) when the right neighbour cell's mean is
      * STRICTLY greater — the standard row-gradient hash. More robust
      * than [[aHash]] to global brightness/contrast shifts (a uniform
      * luma offset preserves every gradient, so the hash is invariant),
      * which is exactly the mutation space web image mirrors live in. */
    def dHash(w: Int, h: Int, luma: Array[Int]): Long = {
      val grid = new Array[Double](8 * 9)
      var gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 9) {
          val y0 = gy * h / 8; val y1 = math.max((gy + 1) * h / 8, y0 + 1)
          val x0 = gx * w / 9; val x1 = math.max((gx + 1) * w / 9, x0 + 1)
          var s = 0L; var n = 0
          var y = y0
          while (y < y1 && y < h) {
            var x = x0
            while (x < x1 && x < w) { s += luma(y * w + x); n += 1; x += 1 }
            y += 1
          }
          grid(gy * 9 + gx) = if (n == 0) 0.0 else s.toDouble / n
          gx += 1
        }
        gy += 1
      }
      var hash = 0L
      var gy2 = 0
      while (gy2 < 8) {
        var gx2 = 0
        while (gx2 < 8) {
          if (grid(gy2 * 9 + gx2 + 1) > grid(gy2 * 9 + gx2))
            hash |= (1L << (gy2 * 8 + gx2))
          gx2 += 1
        }
        gy2 += 1
      }
      hash
    }
  }

  // ---- audio codec (javax.sound.sampled: WAV/PCM16, real decode) ------------
  object AudioCodec {
    /** decode a RIFF/WAV payload to 16-bit samples (first channel) */
    def decodePcm16(payload: Array[Byte]): Array[Short] = {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 16, s"expected PCM16, got $fmt")
        val bytes = in.readAllBytes()
        val frame = fmt.getFrameSize
        val le = !fmt.isBigEndian
        val n = bytes.length / frame
        val out = new Array[Short](n)
        var i = 0
        while (i < n) {
          val o = i * frame
          val lo = bytes(o) & 0xff
          val hi = bytes(o + 1) & 0xff
          out(i) = (if (le) (hi << 8) | lo else (lo << 8) | hi).toShort
          i += 1
        }
        out
      } finally in.close()
    }

    /** RMS over samples normalized to [-1, 1] */
    def rms(samples: Array[Short]): Double = {
      if (samples.isEmpty) return 0.0
      var s = 0.0
      var i = 0
      while (i < samples.length) {
        val v = samples(i) / 32768.0
        s += v * v
        i += 1
      }
      math.sqrt(s / samples.length)
    }

    /** 64-bucket amplitude fingerprint: mean |amplitude| per bucket,
      * bit set when the bucket is >= the overall mean (aHash analog) */
    def fingerprint(samples: Array[Short]): Long = {
      if (samples.isEmpty) return 0L
      val buckets = new Array[Double](64)
      val counts = new Array[Int](64)
      var i = 0
      while (i < samples.length) {
        val b = (i.toLong * 64 / samples.length).toInt
        buckets(b) += math.abs(samples(i).toDouble)
        counts(b) += 1
        i += 1
      }
      var mean = 0.0
      var b = 0
      while (b < 64) {
        if (counts(b) > 0) buckets(b) /= counts(b)
        mean += buckets(b) / 64
        b += 1
      }
      var out = 0L
      b = 0
      while (b < 64) {
        if (buckets(b) >= mean) out |= (1L << b)
        b += 1
      }
      out
    }

    /** minimal RIFF/WAV writer: 16-bit PCM mono little-endian */
    def wavBytes(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(1) // mono
        .putInt(sampleRate)
        .putInt(sampleRate * 2) // byte rate
        .putShort(2) // block align
        .putShort(16) // bits/sample
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }
  }

  /** STUB — deterministic fake "decode" for video payloads only (no video
    * codec exists in the JDK / this sandbox). Swap for javacv/ffmpeg where
    * the jars exist; everything around it (schema, batching, frame
    * sampling) is codec-agnostic. */
  object StubVideoCodec {
    def decodeBytes(payload: Array[Byte]): Array[Int] = {
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

  private def round6(v: Double): Double = math.rint(v * 1e6) / 1e6

  /** partition-batched decode + featurize; one decoder context per
    * partition (mirrors mapInPandas batch shape — real codecs are
    * expensive to init, so init cost amortizes per task, not per row). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        r.kind match {
          case "image" =>
            val (w, h, luma) = ImageCodec.decodeLuma(r.payload)
            val mean = if (luma.isEmpty) 0.0 else luma.map(_.toLong).sum.toDouble / luma.length
            MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, w, h,
              round6(mean), 0.0, Nil, ImageCodec.aHash(w, h, luma))
          case "audio" =>
            val samples = AudioCodec.decodePcm16(r.payload)
            MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, 0, 0,
              0.0, round6(AudioCodec.rms(samples)), Nil, AudioCodec.fingerprint(samples))
          case _ => // video: stubbed decode, real frame-sampling plumbing
            val decoded = StubVideoCodec.decodeBytes(r.payload)
            val mean = if (decoded.isEmpty) 0.0 else decoded.map(_.toDouble).sum / decoded.length
            var ph = 0L
            var i = 0
            while (i < 64 && i < decoded.length) {
              if (decoded(i) >= mean) ph |= (1L << i)
              i += 1
            }
            MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, 0, 0,
              round6(mean), 0.0, sampleFrames(r.n_frames, 8), ph)
        }
      }
    }
  }

  // ---- deterministic synthetic media (real formats) -------------------------
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** deterministic 64x64 RGB test image: smooth gradient + seeded blocks */
  def syntheticImageBytes(seed: Long, i: Long, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 64) {
      var x = 0
      while (x < 64) {
        val block = mix(seed ^ (i * 64) ^ ((y / 8) * 8 + (x / 8))) & 0xff
        val r = (x * 4 + block) & 0xff
        val g = (y * 4) & 0xff
        val b = ((x + y) * 2) & 0xff
        img.setRGB(x, y, (r.toInt << 16) | (g << 8) | b.toInt)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, format, out)
    out.toByteArray
  }

  /** deterministic WAV: PCM16 mono sine, frequency seeded per row */
  def syntheticWavBytes(seed: Long, i: Long): Array[Byte] = {
    val sampleRate = 8000
    val n = 2000
    val freq = 200.0 + (mix(seed ^ i) & 0x3ff).toDouble // 200..1223 Hz
    val amp = 12000 + (mix(seed ^ (i + 7)) & 0x3fff).toInt // 12k..28k
    val samples = Array.tabulate(n)(t =>
      (amp * math.sin(2 * math.Pi * freq * t / sampleRate)).toShort)
    AudioCodec.wavBytes(samples, sampleRate)
  }

  /** deterministic synthetic media table for tests/bench: real PNGs and
    * JPEGs, real WAVs; video payloads are opaque bytes (codec stubbed). */
  def synthetic(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).as[Long].map { i =>
      val kinds = Array("image", "audio", "video")
      val kind = kinds((i % 3).toInt)
      kind match {
        case "image" =>
          val fmt = if (i % 6 == 0) "jpg" else "png" // exercise both decoders
          val payload = syntheticImageBytes(seed, i, fmt)
          MediaRow(i, kind, payload, 64, 64, 0, 1)
        case "audio" =>
          val payload = syntheticWavBytes(seed, i)
          MediaRow(i, kind, payload, 0, 0, 8000, 0)
        case _ =>
          val len = 256 + ((i * 2654435761L) % 1024).toInt.abs
          val payload = Array.tabulate(len)(j => ((i * 31 + j * 7 + seed) & 0xff).toByte)
          MediaRow(i, kind, payload, 64, 64, 0, 24 + (i % 100).toInt)
      }
    }
  }

  /** the mirror-site mutation of [[syntheticImageBytes]]: the SAME pixel
    * plan re-encoded with one 8x8 block's blue channel dimmed (b/2 + 10)
    * — a localized edit (watermark/badge-sized) whose luma impact is
    * small (blue carries 114/1000 of Rec.601), so perceptual hashes land
    * within a few bits of the original. Always PNG (lossless): the
    * perturbation, not codec noise, is the controlled variable. */
  def syntheticImageBytesPerturbed(seed: Long, i: Long): Array[Byte] = {
    val img = ImageIO.read(new ByteArrayInputStream(syntheticImageBytes(seed, i, "png")))
    val bx = (mix(seed ^ (i + 13)) & 7).toInt * 8
    val by = ((mix(seed ^ (i + 17)) >> 3) & 7).toInt * 8
    var y = by
    while (y < by + 8) {
      var x = bx
      while (x < bx + 8) {
        val rgb = img.getRGB(x, y)
        val b = rgb & 0xff
        img.setRGB(x, y, (rgb & 0xffff00) | ((b / 2 + 10) & 0xff))
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** perceptual hashes of every IMAGE row: real decode, aHash + dHash per
    * image. Non-image rows are ignored (they have their own fingerprint
    * families). Output: (media_id, decoded_w, decoded_h, ahash, dhash).
    *
    * Scale shape: per-row kernel work fused with the scan (the
    * extractFeatures discipline — decoder init amortizes per partition);
    * nothing shuffles. */
  def imageHashes(media: Dataset[MediaRow]): org.apache.spark.sql.DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { rows =>
      rows.map { r =>
        val (w, h, luma) = ImageCodec.decodeLuma(r.payload)
        (r.media_id, w, h, ImageCodec.aHash(w, h, luma), ImageCodec.dHash(w, h, luma))
      }
    }.toDF("media_id", "decoded_w", "decoded_h", "ahash", "dhash")
  }

  /** dHash-only kernel pass for the near-dup join — skips the aHash
    * block-average work [[imageHashes]] spends on a column the join
    * immediately drops */
  private def dHashes(media: Dataset[MediaRow]): org.apache.spark.sql.DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { rows =>
      rows.map { r =>
        val (w, h, luma) = ImageCodec.decodeLuma(r.payload)
        (r.media_id, ImageCodec.dHash(w, h, luma))
      }
    }.toDF("doc_id", "simhash")
  }

  /** image near-duplicates by dHash hamming distance — the image-side
    * member of the near-dup family (mirrors/re-encodes/brightness
    * variants of one image collapse). Decode + hash is one kernel pass;
    * pair generation reuses [[Dedup.simhashNearDupsFromHashes]]'s banded
    * join verbatim (nBlocks > maxHamming makes the banding EXACT by
    * pigeonhole — every pair within the radius shares one clean band),
    * so the 64-bit hashes shuffle, never the payloads.
    *
    * Output: (media_a, media_b, hamming), media_a < media_b. */
  def imageNearDups(
      media: Dataset[MediaRow],
      maxHamming: Int = 3,
      nBlocks: Int = 6): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    Dedup.simhashNearDupsFromHashes(dHashes(media), maxHamming, nBlocks)
      .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
        col("hamming"))
  }
}
