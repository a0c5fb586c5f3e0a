package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.PlanSlots.Slotted

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * resize / frame-sample stages.
  *
  * IMAGE decode is REAL: the JDK ships PNG/BMP/JPEG codecs in
  * `javax.imageio`, so [[encodePng]]/[[decodeImageStats]] round-trip
  * actual pixels through an actual codec inside the `mapPartitions`
  * stage a production pipeline uses (codec/model handles initialized
  * once per partition, not per row). AUDIO decode is REAL too:
  * [[asWavMedia]]/[[decodeAudioStats]] round-trip PCM frames through
  * the JDK's `javax.sound.sampled` WAV codec in the same shape.
  * Video decode would drop into the same stage; [[fakeFeatures]]
  * remains only as the byte-stripe stand-in for codecs the JDK does
  * not ship.
  */
object Multimodal {

  /** Media metadata carried alongside every binary column. */
  val metaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("source", StringType, nullable = true)))

  val featureDim = 8

  /** Attach a binary payload + metadata struct to a text corpus —
    * stands in for reading real image/audio blobs.
    */
  def asMedia(docs: DataFrame, idCol: String, textCol: String,
              mediaType: String = "text/plain"): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      expr(s"encode($textCol, 'UTF-8')").as("bin"),
      struct(
        lit(mediaType).as("media_type"),
        expr(s"octet_length(encode($textCol, 'UTF-8'))").as("n_bytes"),
        col(idCol).cast("string").as("source")).as("meta"))

  /** Deterministic stand-in for a codec: average byte value per
    * 1/featureDim stripe of the payload, scaled to [0,1].
    */
  private[ops] def fakeFeatures(bytes: Array[Byte]): Array[Float] = {
    if (bytes.isEmpty) return Array.fill(featureDim)(0f)
    val stripe = math.max(bytes.length / featureDim, 1)
    (0 until featureDim).map { i =>
      val from = math.min(i * stripe, bytes.length)
      val until = if (i == featureDim - 1) bytes.length
                  else math.min((i + 1) * stripe, bytes.length)
      if (until <= from) 0f
      else {
        var s = 0L; var j = from
        while (j < until) { s += (bytes(j) & 0xff); j += 1 }
        (s.toDouble / (until - from) / 255.0).toFloat
      }
    }.toArray
  }

  /** Render a byte payload as a tiny RGB image: pixel (x,y) takes its
    * R/G/B from consecutive payload bytes, cycling. Deterministic by
    * construction — the pixel content of the PNG depends only on the
    * input bytes.
    */
  private[ops] def synthPixels(bytes: Array[Byte], w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val n = math.max(bytes.length, 1)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = 3 * (y * w + x)
        def b(i: Int) = if (bytes.isEmpty) 0 else bytes(i % n) & 0xff
        img.setRGB(x, y, (b(p) << 16) | (b(p + 1) << 8) | b(p + 2))
        x += 1
      }
      y += 1
    }
    img
  }

  /** Real PNG encode via the JDK's built-in ImageIO codec. */
  private[ops] def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Media table of real PNG images synthesized from a text corpus:
    * (media_id, bin = PNG bytes, meta). The encode runs distributed in
    * `mapPartitions`; every downstream consumer sees genuine
    * codec-encoded binary payloads.
    */
  def asPngMedia(docs: DataFrame, idCol: String, textCol: String,
                 w: Int = 8, h: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val png = encodePng(synthPixels(text.getBytes("UTF-8"), w, h))
          (id, png, "image/png", png.length)
        }
      }
      .toDF("media_id", "bin", "media_type", "n_bytes")
  }

  /** REAL image decode + feature extraction: `javax.imageio` parses
    * the PNG/BMP/JPEG payload back to pixels and the stage emits
    * (media_id, width, height, channels, mean_r, mean_g, mean_b,
    * n_bytes, decoded). Payloads ImageIO cannot parse yield
    * `decoded = false` with zeroed stats — a visible flag, not a
    * dropped row. mapPartitions, same shape as [[decodeFeatures]]:
    * at 100 TB the codec warm-up is per-partition, the pixel work is
    * row-local, no shuffle anywhere.
    */
  def decodeImageStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("bin"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: java.io.IOException => null }
          if (img == null)
            (id, 0, 0, 0, 0.0, 0.0, 0.0, bytes.length, false)
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            var (sr, sg, sb) = (0L, 0L, 0L)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
                x += 1
              }
              y += 1
            }
            val n = (w * h).toDouble
            (id, w, h, img.getRaster.getNumBands,
              sr / n, sg / n, sb / n, bytes.length, true)
          }
        }
      }
      .toDF("media_id", "width", "height", "channels",
        "mean_r", "mean_g", "mean_b", "n_bytes", "decoded")
  }

  /** REAL image resize: `javax.imageio` decodes the payload, a
    * box-filter area average (exact integer block sums with floor
    * boundaries — deliberately NOT Graphics2D, whose rendering hints
    * vary across JVMs) downscales to (outW, outH), and the result
    * re-encodes through the PNG codec. Emits the resized payload plus
    * before/after dims, sizes, and output mean channel values.
    * Unparseable payloads yield `decoded = false`, zeroed stats, and
    * an empty output payload — visible, never dropped. Same 100 TB
    * shape as [[decodeImageStats]]: row-local work in `mapPartitions`,
    * no shuffle; output bytes shrink quadratically with the scale
    * factor, which is the point of resizing BEFORE the expensive
    * embedding/caption stages downstream.
    */
  def resizeImages(media: DataFrame, outW: Int, outH: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("bin"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: java.io.IOException => null }
          if (img == null)
            (id, 0, 0, outW, outH, bytes.length, 0, 0.0, 0.0, 0.0, Array.emptyByteArray, false)
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            val out = new java.awt.image.BufferedImage(
              outW, outH, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var (tr, tg, tb) = (0L, 0L, 0L)
            var oy = 0
            while (oy < outH) {
              val y0 = oy * h / outH; val y1 = math.max((oy + 1) * h / outH, y0 + 1)
              var ox = 0
              while (ox < outW) {
                val x0 = ox * w / outW; val x1 = math.max((ox + 1) * w / outW, x0 + 1)
                var (sr, sg, sb) = (0L, 0L, 0L)
                var y = y0
                while (y < y1) {
                  var x = x0
                  while (x < x1) {
                    val rgb = img.getRGB(x, y)
                    sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
                    x += 1
                  }
                  y += 1
                }
                val n = (x1 - x0).toLong * (y1 - y0)
                val (r, g, b) = ((sr / n).toInt, (sg / n).toInt, (sb / n).toInt)
                out.setRGB(ox, oy, (r << 16) | (g << 8) | b)
                tr += r; tg += g; tb += b
                ox += 1
              }
              oy += 1
            }
            val png = encodePng(out)
            val np = (outW * outH).toDouble
            (id, w, h, outW, outH, bytes.length, png.length,
              tr / np, tg / np, tb / np, png, true)
          }
        }
      }
      .toDF("media_id", "width_in", "height_in", "width_out", "height_out",
        "n_bytes_in", "n_bytes_out", "mean_r", "mean_g", "mean_b",
        "bin", "decoded")
  }

  /** Perceptual average-hash (aHash): `javax.imageio` decode →
    * 8×8 box-filter grayscale (the same exact integer area averages as
    * [[resizeImages]], BT.601 luma weights) → 64-bit hash, bit i set
    * iff cell i's gray exceeds the 64-cell mean. The standard cheap
    * perceptual fingerprint: visually identical images collide
    * bit-for-bit, small edits flip few bits, so near-duplicates sit
    * within a small Hamming radius. Row-local in `mapPartitions` —
    * at 100 TB the hash pass is a pure map stage, no shuffle.
    * Unparseable payloads yield `decoded = false` with hash 0.
    */
  def imagePhash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("bin"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: java.io.IOException => null }
          if (img == null) (id, 0L, false)
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            val gray = new Array[Long](64)
            var oy = 0
            while (oy < 8) {
              val y0 = oy * h / 8; val y1 = math.max((oy + 1) * h / 8, y0 + 1)
              var ox = 0
              while (ox < 8) {
                val x0 = ox * w / 8; val x1 = math.max((ox + 1) * w / 8, x0 + 1)
                var s = 0L
                var y = y0
                while (y < y1) {
                  var x = x0
                  while (x < x1) {
                    val rgb = img.getRGB(x, y)
                    s += (((rgb >> 16) & 0xff) * 299L +
                          ((rgb >> 8) & 0xff) * 587L + (rgb & 0xff) * 114L) / 1000L
                    x += 1
                  }
                  y += 1
                }
                gray(oy * 8 + ox) = s / ((x1 - x0).toLong * (y1 - y0))
                ox += 1
              }
              oy += 1
            }
            val mean = gray.sum / 64L
            var hash = 0L
            var i = 0
            while (i < 64) {
              if (gray(i) > mean) hash |= (1L << i)
              i += 1
            }
            (id, hash, true)
          }
        }
      }
      .toDF("media_id", "phash", "decoded")
  }

  /** Image near-duplicate pairs: band the 64-bit perceptual hash into
    * four 16-bit keys (an exact-collision band ⇒ candidate — the
    * pigeonhole guarantee: any pair within Hamming distance 3 shares
    * at least one intact band; radius 4–7 pairs still collide unless
    * their flipped bits spread across all four bands), bucket-join the
    * candidates through the shared capped generator
    * ([[Dedup.bucketPairs]] — identical-image mega-clusters stay
    * bounded), then exact-verify by Hamming distance on the full hash.
    * The multimodal face of the SimHash pipeline: banding shuffles
    * 12-byte (id, band) rows, never pixels.
    */
  def imageNearDup(media: DataFrame, maxHamming: Int = 6,
                   maxBucket: Int = 1000): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming in [0, 64)")
    // MEMORY_ONLY: evictable + lineage-recomputable (see
    // Dedup.exactJaccard for the policy note)
    val ph = imagePhash(media).filter(col("decoded"))
      .select(col("media_id").as("id"), col("phash"))
      .persistSlot("multimodal.imageNearDup.phash")
    val buckets = ph.select(col("id"), explode(expr(
        """transform(sequence(0, 3), b ->
             CAST(b AS BIGINT) * 65536 +
             ((phash >> (b * 16)) & 65535))""")).as("bk"))
    val pairs = Dedup.bucketPairs(buckets, maxBucket)
    pairs
      .join(ph.select(col("id").as("id1"), col("phash").as("h1")), "id1")
      .join(ph.select(col("id").as("id2"), col("phash").as("h2")), "id2")
      .withColumn("hamming", expr("bit_count(h1 ^ h2)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id1"), col("id2"), col("hamming"))
  }

  /** Render a deterministic mono 16-bit PCM sine tone as REAL WAV
    * container bytes (RIFF header via the JDK's own writer) — the
    * frequency derives from the seed, the length from `nSamples`, so
    * payload bytes depend only on the inputs.
    */
  private[ops] def synthWav(seed: Long, nSamples: Int,
                            sampleRate: Int = 8000): Array[Byte] = {
    val freq = 220.0 + (math.floorMod(seed, 16L)) * 55.0
    val data = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = (math.sin(2 * math.Pi * freq * i / sampleRate) * 12000).toInt
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Media table of real WAV payloads synthesized from a corpus:
    * (media_id, bin = WAV bytes, media_type, n_bytes). Distributed in
    * `mapPartitions` like [[asPngMedia]].
    */
  def asWavMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val wav = synthWav(id, 400 + text.length % 400)
          (id, wav, "audio/wav", wav.length)
        }
      }
      .toDF("media_id", "bin", "media_type", "n_bytes")
  }

  /** REAL audio decode: `javax.sound.sampled` parses the WAV container
    * back to format + PCM frames and the stage emits per-clip stats
    * (sample rate, channels, bit depth, frame count, duration, RMS
    * amplitude). Unparseable payloads yield `decoded = false` with
    * zeroed stats — visible, not dropped. Same 100 TB shape as
    * [[decodeImageStats]]: row-local work, no shuffle.
    */
  def decodeAudioStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("bin"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val f = ais.getFormat
            val pcm = ais.readAllBytes()
            // getFrameLength can be NOT_SPECIFIED (-1) for some
            // containers (AU streams) — derive from the decoded bytes
            val nFrames =
              if (ais.getFrameLength >= 0) ais.getFrameLength
              else if (f.getFrameSize > 0) pcm.length.toLong / f.getFrameSize
              else 0L
            // RMS over 16-bit PCM, honoring the container's byte order
            // (AudioSystem also parses AIFF/AU, whose PCM is
            // big-endian — assuming little would yield garbage stats
            // with decoded=true); other depths/encodings decode format
            // metadata only and report rms = 0
            var sumSq = 0.0; var n = 0
            val isPcm =
              f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
            if (isPcm && f.getSampleSizeInBits == 16) {
              val big = f.isBigEndian
              var i = 0
              while (i + 1 < pcm.length) {
                val s = if (big) ((pcm(i) << 8) | (pcm(i + 1) & 0xff)).toShort
                        else ((pcm(i + 1) << 8) | (pcm(i) & 0xff)).toShort
                sumSq += s.toDouble * s; n += 1; i += 2
              }
            }
            val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
            (id, f.getSampleRate.toInt, f.getChannels, f.getSampleSizeInBits,
              nFrames, nFrames * 1000.0 / f.getSampleRate, rms, true)
          } catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException |
                 _: java.io.IOException =>
              (id, 0, 0, 0, 0L, 0.0, 0.0, false)
          }
        }
      }
      .toDF("media_id", "sample_rate", "channels", "bits",
        "n_frames", "duration_ms", "rms", "decoded")
  }

  /** Decode + feature-extract stage: mapPartitions so a real codec /
    * model handle is initialized once per partition. Output schema:
    * (media_id, features array<float>, n_bytes int).
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("bin"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real impl: initialize codec/model HERE, once per partition
        rows.map { case (id, bytes) => (id, fakeFeatures(bytes), bytes.length) }
      }
      .toDF("media_id", "features", "n_bytes")
  }

  /** Frame-sample stage stub: pick every `stride`-th 16-byte block as
    * a "frame" (stands in for video frame sampling; the plumbing —
    * explode to one row per frame with an index — is the real shape).
    */
  def sampleFrames(media: DataFrame, stride: Int = 4): DataFrame =
    media.select(col("media_id"), col("bin"),
      expr(s"octet_length(bin)").as("n_bytes"))
      .withColumn("frame_idx",
        explode(expr(s"sequence(0, greatest(cast(octet_length(bin) / 16 / $stride as int) - 1, 0))")))
      .select(col("media_id"), col("frame_idx"),
        expr(s"substring(hex(bin), frame_idx * $stride * 32 + 1, 32)").as("frame_hex"))
}
