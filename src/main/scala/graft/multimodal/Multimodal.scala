package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: images/audio/video as opaque `binary`
  * payloads with typed metadata, processed in batch via mapPartitions
  * (the JVM analogue of the reference's per-partition object pipelines —
  * object_readers/bioimage_reader.py, directory_reader.py
  * DirectoryImageReader — and of `mapInPandas` batch UDFs in PySpark).
  *
  * IMAGE and WAV-AUDIO decode are REAL: `decodeImage` uses the JDK's
  * `javax.imageio` (PNG/JPEG) and `decodeWav` the JDK's
  * `javax.sound.sampled` (16-bit PCM WAV) — both behind magic-number
  * sniffs, pooling exact pixel/amplitude statistics from the decoded
  * raster/PCM. VIDEO (and non-WAV audio) decode remains a clearly-marked
  * deterministic STUB (`stubDecode` — the container genuinely lacks those
  * codecs); everything around it — schema, batching, partitioning,
  * null/short-payload handling, the feature column contract — is the real
  * pipeline a codec would drop into.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("obj_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true))), nullable = true)))

  /** Deterministic FNV byte stream for media fixtures: payload `seed`'s
    * byte j is bits 24..31 of the running fold
    * `h ← (h xor (j mod 256)) * FNV_PRIME` seeded by
    * `FNV_OFFSET xor seed` (seed < 256 so only the low byte differs).
    * Pure integer arithmetic, so a DuckDB recursive CTE regenerates the
    * exact payload — which is what lets [[stubDecode]]'s signature over a
    * generated fixture be replayed as an oracle, byte for byte, with no
    * files shipped to the oracle side. */
  def fnvBytes(seed: Int, len: Int): Array[Byte] = {
    require(seed >= 0 && seed < 256, s"graft: fnvBytes seed must be a byte, got $seed")
    val out = new Array[Byte](len)
    var h = 0xcbf29ce484222325L ^ seed.toLong
    var j = 0
    while (j < len) {
      h ^= (j & 0xff).toLong
      h *= 0x100000001b3L
      out(j) = ((h >>> 24) & 0xffL).toByte
      j += 1
    }
    out
  }

  /** STUB decoder: a real implementation would decode the payload with an
    * image/audio library and pool activations; this derives `dim` float
    * features from byte n-gram statistics so the pipeline stays
    * deterministic and testable without codecs. */
  def stubDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    if (payload == null || payload.isEmpty) return v
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < payload.length) {
      h ^= (payload(i) & 0xffL); h *= 0x100000001b3L
      val b = (((h % dim) + dim) % dim).toInt
      v(b) += (if (((h >>> 32) & 1L) == 0L) 1.0f else -1.0f)
      i += 1
    }
    val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
    if (n > 0) { var j = 0; while (j < dim) { v(j) /= n; j += 1 } }
    v
  }

  /** Batch feature extraction: (obj_id, modality, payload, meta) →
    * (obj_id, modality, feature: array<float>). Null payloads yield null
    * features (kept, so joins stay total). Runs one partition at a time —
    * at 100 TB this is the unit a codec/model would be loaded per-executor
    * for, exactly like ObjectEmbedding.init(). */
  def extractFeatures(media: DataFrame, dim: Int = 64): DataFrame = {
    require(dim > 0, s"graft: extractFeatures dim must be positive, got $dim")
    import media.sparkSession.implicits._
    media.select(col("obj_id"), col("modality"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-executor init hook would go here (codec/model load)
        it.map { case (id, mod, payload) =>
          (id, mod,
            if (payload == null) null
            else decodeImage(payload) match {
              case Some(img) => imageFeature(img, dim).toSeq
              case None => decodeAudio(payload) match {
                case Some((_, samples)) => audioFeature(samples, dim).toSeq
                case None => videoFeatureOf(payload, dim) match {
                  case Some(v) => v.toSeq
                  case None    => stubDecode(payload, dim).toSeq
                }
              }
            })
        }
      }
      .toDF("obj_id", "modality", "feature")
      .select(col("obj_id"), col("modality"),
        col("feature").cast("array<float>").as("feature"))
  }

  // ----- real image decode (javax.imageio — ships in the JDK, no external
  // codec needed; the reference's image path is
  // image_resnetv2_embedding.py / object_readers/directory_reader.py) -----

  /** PNG (\x89PNG) / JPEG (\xff\xd8\xff) magic-number sniff — the format
    * detection gate in front of [[decodeImage]]; anything else keeps the
    * honest stub path (audio/video codecs are genuinely absent). */
  def isDecodableImage(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 8 &&
      (((payload(0) & 0xff) == 0x89 && payload(1) == 'P' &&
          payload(2) == 'N' && payload(3) == 'G') ||
        ((payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8 &&
          (payload(2) & 0xff) == 0xff))

  /** Decode an image payload with the JDK's ImageIO. None for non-image
    * payloads (magic sniff) or undecodable bytes — callers fall back to
    * [[stubDecode]], so a corrupt file degrades instead of failing the
    * stage. */
  def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (!isDecodableImage(payload)) None
    else try {
      // ImageIO throws (not just returns null) on truncated/corrupt bytes
      // behind a valid magic — catch so the documented stub fallback holds
      // and one bad file cannot fail the stage (decodeWav's contract)
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    } catch { case _: Exception => None }

  /** Pooled feature vector from REAL decoded pixels: per grid-cell RGB
    * channel means (grid chosen so grid²·3 fills `dim`), L2-normalized —
    * the classic pooled-activation shape a model embedding would produce,
    * computed from pixel statistics instead. */
  def imageFeature(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    val grid = math.max(1, math.sqrt(dim / 3.0).toInt)
    val sums = gridChannelSums(img, grid)
    val counts = gridCellCounts(img.getWidth, img.getHeight, grid)
    val v = new Array[Float](dim)
    var c = 0
    while (c < grid * grid && c * 3 + 2 < dim) {
      val n = math.max(counts(c), 1L).toDouble
      v(c * 3) = (sums(c)(0) / n / 255.0).toFloat
      v(c * 3 + 1) = (sums(c)(1) / n / 255.0).toFloat
      v(c * 3 + 2) = (sums(c)(2) / n / 255.0).toFloat
      c += 1
    }
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    if (norm > 0) { var j = 0; while (j < dim) { v(j) = (v(j) / norm).toFloat; j += 1 } }
    v
  }

  /** Exact per-grid-cell RGB sums of a decoded image (cell of pixel (x,y)
    * is `(y·grid div h)·grid + (x·grid div w)` — pure integer arithmetic,
    * so an oracle can replay the sums from a generating formula). */
  def gridChannelSums(img: java.awt.image.BufferedImage, grid: Int): Array[Array[Long]] = {
    val w = img.getWidth; val h = img.getHeight
    val sums = Array.fill(grid * grid)(new Array[Long](3))
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val cell = (y * grid / h) * grid + (x * grid / w)
        sums(cell)(0) += (rgb >> 16) & 0xff
        sums(cell)(1) += (rgb >> 8) & 0xff
        sums(cell)(2) += rgb & 0xff
        x += 1
      }
      y += 1
    }
    sums
  }

  private def gridCellCounts(w: Int, h: Int, grid: Int): Array[Long] = {
    val counts = new Array[Long](grid * grid)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { counts((y * grid / h) * grid + (x * grid / w)) += 1; x += 1 }
      y += 1
    }
    counts
  }

  /** Batch image-decode statistics: (obj_id, payload) → one row per grid
    * cell with exact integer RGB sums from the DECODED pixels. The unit the
    * driver oracle checks: fixtures are real PNGs whose pixels follow an
    * integer formula, PNG is lossless, so a DuckDB replay of the formula
    * must reproduce these sums exactly — any decode defect (channel order,
    * stride, color space) breaks the hash. Undecodable payloads are
    * dropped (count them upstream if loss matters). */
  def decodeImageStats(media: DataFrame, grid: Int = 4): DataFrame = {
    // grid*grid cells must fit an Int: a huge grid would overflow negative
    // and silently emit ZERO rows per image instead of failing
    require(grid > 0 && grid <= 4096,
      s"graft: decodeImageStats grid must be in [1, 4096], got $grid")
    import media.sparkSession.implicits._
    media.select(col("obj_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-executor codec init would go here
        it.flatMap { case (id, payload) =>
          decodeImage(payload).iterator.flatMap { img =>
            val w = img.getWidth; val h = img.getHeight
            val sums = gridChannelSums(img, grid)
            (0 until grid * grid).iterator.map { c =>
              (id, w, h, c, sums(c)(0), sums(c)(1), sums(c)(2))
            }
          }
        }
      }
      .toDF("obj_id", "width", "height", "cell", "r_sum", "g_sum", "b_sum")
  }

  // ----- real audio decode (javax.sound.sampled — also in the JDK; WAV
  // PCM needs no external codec) -----

  /** Container magic sniff — the gate in front of [[decodeAudio]]:
    * RIFF/WAVE, AIFF (`FORM`/`AIFF`) and Sun AU (`.snd`) all decode with
    * the JDK's AudioSystem, no external codec. */
  def isDecodableAudio(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 12 && (
      (payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
        payload(3) == 'F' && payload(8) == 'W' && payload(9) == 'A' &&
        payload(10) == 'V' && payload(11) == 'E') ||
      (payload(0) == 'F' && payload(1) == 'O' && payload(2) == 'R' &&
        payload(3) == 'M' && payload(8) == 'A' && payload(9) == 'I' &&
        payload(10) == 'F' && payload(11) == 'F') ||
      (payload(0) == '.' && payload(1) == 's' && payload(2) == 'n' &&
        payload(3) == 'd'))

  /** Decode a WAV/AIFF/AU payload with the JDK's AudioSystem to
    * `(sampleRate, samples)` — 16-bit PCM in either endianness (WAV is
    * little-endian, AIFF/AU big-endian); anything else returns None and
    * callers fall back to the byte-level stub. Multi-channel frames stay
    * interleaved. */
  def decodeAudio(payload: Array[Byte]): Option[(Int, Array[Int])] =
    if (!isDecodableAudio(payload)) None
    else try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16) None
        else {
          val bytes = in.readAllBytes()
          val n = bytes.length / 2
          val out = new Array[Int](n)
          var i = 0
          if (fmt.isBigEndian)
            while (i < n) {
              out(i) = (bytes(2 * i).toInt << 8) | (bytes(2 * i + 1) & 0xff)
              i += 1
            }
          else
            while (i < n) {
              out(i) = (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)
              i += 1
            }
          Some((fmt.getSampleRate.toInt, out))
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** Back-compat alias (WAV was the first real audio path). */
  def decodeWav(payload: Array[Byte]): Option[(Int, Array[Int])] =
    decodeAudio(payload)

  /** Pooled feature vector from REAL decoded samples: per-window mean
    * absolute amplitude (window of sample j is `j·dim div n`), scaled to
    * [0, 1] and L2-normalized — the audio analogue of [[imageFeature]]. */
  def audioFeature(samples: Array[Int], dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    val n = samples.length
    if (n == 0) return v
    val sums = new Array[Long](dim)
    val counts = new Array[Long](dim)
    var j = 0
    while (j < n) {
      val w = (j.toLong * dim / n).toInt
      sums(w) += math.abs(samples(j)); counts(w) += 1
      j += 1
    }
    var w = 0
    while (w < dim) {
      if (counts(w) > 0) v(w) = (sums(w).toDouble / counts(w) / 32768.0).toFloat
      w += 1
    }
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    if (norm > 0) { var k = 0; while (k < dim) { v(k) = (v(k) / norm).toFloat; k += 1 } }
    v
  }

  /** Batch audio-decode statistics: (obj_id, payload) → one row per
    * amplitude window with the exact integer |sample| sum from the DECODED
    * PCM — the audio twin of [[decodeImageStats]], oracle-checkable when
    * fixtures are [[testToneWav]] formula tones (WAV PCM is lossless). */
  def decodeAudioStats(media: DataFrame, windows: Int = 16): DataFrame = {
    require(windows > 0,
      s"graft: decodeAudioStats windows must be positive, got $windows")
    import media.sparkSession.implicits._
    media.select(col("obj_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          decodeAudio(payload).iterator.flatMap { case (rate, samples) =>
            val n = samples.length
            val sums = new Array[Long](windows)
            var j = 0
            while (j < n) {
              sums((j.toLong * windows / n).toInt) += math.abs(samples(j))
              j += 1
            }
            (0 until windows).iterator.map(w => (id, rate, n.toLong, w, sums(w)))
          }
        }
      }
      .toDF("obj_id", "sample_rate", "n_samples", "window", "abs_sum")
  }

  /** Deterministic REAL-WAV test tone: sample j of tone `seed` is
    * `((j·(3+seed) + 7·seed) mod 2048) − 1024`, encoded as 16-bit mono
    * little-endian PCM through the JDK WAV writer. Decoding anywhere must
    * reproduce the formula exactly — the fixture generator for
    * decode-path oracles and specs. */
  def testToneWav(seed: Int, n: Int, sampleRate: Int = 8000): Array[Byte] = {
    val pcm = new Array[Byte](n * 2)
    var j = 0
    while (j < n) {
      val s = ((j * (3 + seed) + 7 * seed) % 2048) - 1024
      pcm(2 * j) = (s & 0xff).toByte
      pcm(2 * j + 1) = ((s >> 8) & 0xff).toByte
      j += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** [[testToneWav]]'s PCM, containered as big-endian AIFF by the JDK
    * writer — same formula samples, different container + endianness, so
    * one oracle covers all three audio containers. */
  def testToneAiff(seed: Int, n: Int, sampleRate: Int = 8000): Array[Byte] =
    writeTone(seed, n, sampleRate,
      javax.sound.sampled.AudioFileFormat.Type.AIFF, bigEndian = true)

  /** [[testToneWav]]'s PCM as a Sun AU payload (big-endian). */
  def testToneAu(seed: Int, n: Int, sampleRate: Int = 8000): Array[Byte] =
    writeTone(seed, n, sampleRate,
      javax.sound.sampled.AudioFileFormat.Type.AU, bigEndian = true)

  private def writeTone(seed: Int, n: Int, sampleRate: Int,
      tpe: javax.sound.sampled.AudioFileFormat.Type,
      bigEndian: Boolean): Array[Byte] = {
    val pcm = new Array[Byte](n * 2)
    var j = 0
    while (j < n) {
      val v = ((j * (3 + seed) + 7 * seed) % 2048) - 1024
      if (bigEndian) {
        pcm(2 * j) = ((v >> 8) & 0xff).toByte
        pcm(2 * j + 1) = (v & 0xff).toByte
      } else {
        pcm(2 * j) = (v & 0xff).toByte
        pcm(2 * j + 1) = ((v >> 8) & 0xff).toByte
      }
      j += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, bigEndian)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, tpe, out)
    out.toByteArray
  }

  /** Deterministic REAL-PNG test card: pixel (x, y) of card `seed` has
    * channels `r = (3x+5y+7s) mod 256`, `g = (11x+13y+17s) mod 256`,
    * `b = (19x+23y+29s) mod 256`, encoded losslessly with the JDK PNG
    * writer. Decoding anywhere must reproduce the formula exactly — the
    * fixture generator for decode-path oracles and specs. */
  def testCardPng(seed: Int, w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(testCardImage(seed, w, h), "png", out)
    out.toByteArray
  }

  /** The raster behind [[testCardPng]] — reused by the TIFF pyramid
    * fixtures ([[graft.objects.TiffPyramidReader]] specs). */
  def testCardImage(seed: Int, w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (3 * x + 5 * y + 7 * seed) % 256
        val g = (11 * x + 13 * y + 17 * seed) % 256
        val b = (19 * x + 23 * y + 29 * seed) % 256
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  // ----- real video decode: the AVI container is RIFF — a plain
  // length-prefixed chunk format parsed by hand (no codec library needed
  // for the CONTAINER) — and per-frame images decode with javax.imageio.
  // Frames tagged 'MJPG' are JPEGs (classic Motion-JPEG); 'png '-in-AVI
  // frames are lossless PNGs, which is what makes the formula-replay
  // decode oracle possible (JPEG's lossiness would break a hash
  // contract; the MJPG path is spec-checked with a tolerance instead).
  // Reference analogue: object_readers read media through external
  // codecs; here the container walk itself is the engine's code. -----

  /** RIFF/AVI magic sniff — the gate in front of [[parseAviFrames]]. */
  def isDecodableVideo(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 12 &&
      payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
      payload(3) == 'F' && payload(8) == 'A' && payload(9) == 'V' &&
      payload(10) == 'I' && payload(11) == ' '

  /** Parse an AVI payload into `(width, height, usPerFrame, encoded
    * frames)` by walking the RIFF chunk tree: `avih` (inside LIST `hdrl`)
    * carries the geometry, the `00dc`/`00db` chunks inside LIST `movi`
    * carry one encoded frame each, in order. Odd-sized chunks are padded
    * to even offsets per the RIFF rule — a parser that forgets the pad
    * desynchronizes on the first odd JPEG. Returns None for non-AVI or
    * structurally broken payloads (a truncated chunk is a None, not an
    * exception — corrupt media must degrade like corrupt images do). */
  def parseAviFrames(payload: Array[Byte])
      : Option[(Int, Int, Int, Vector[Array[Byte]])] = {
    if (!isDecodableVideo(payload)) return None
    try {
      def le32(off: Int): Int =
        (payload(off) & 0xff) | ((payload(off + 1) & 0xff) << 8) |
          ((payload(off + 2) & 0xff) << 16) | ((payload(off + 3) & 0xff) << 24)
      def fourcc(off: Int): String =
        new String(payload, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      var w = 0; var h = 0; var usPerFrame = 0
      val frames = Vector.newBuilder[Array[Byte]]
      var ok = true
      def walk(start: Int, end: Int): Unit = {
        var off = start
        while (ok && off + 8 <= end) {
          val id = fourcc(off)
          val size = le32(off + 4)
          val dataStart = off + 8
          if (size < 0 || dataStart + size > end) { ok = false }
          else {
            if (id == "LIST") walk(dataStart + 4, dataStart + size)
            else if (id == "avih" && size >= 40) {
              usPerFrame = le32(dataStart)
              w = le32(dataStart + 32)
              h = le32(dataStart + 36)
            } else if (id == "00dc" || id == "00db") {
              frames += java.util.Arrays.copyOfRange(payload, dataStart, dataStart + size)
            }
            off = dataStart + size + (size & 1) // RIFF even-offset pad
          }
        }
      }
      walk(12, math.min(payload.length, 8 + le32(4)))
      if (!ok) None else Some((w, h, usPerFrame, frames.result()))
    } catch { case _: Exception => None }
  }

  /** Batch video-decode statistics: (obj_id, payload) → one row per
    * (frame, grid cell) with exact integer RGB sums from the DECODED
    * frame pixels — the video twin of [[decodeImageStats]]. The container
    * walk is [[parseAviFrames]]; each frame decodes with the image path.
    * Frames that fail to decode are dropped per-frame (the index stays
    * the CONTAINER frame index, so a dropped frame is visible as a gap). */
  def decodeVideoStats(media: DataFrame, grid: Int = 2): DataFrame = {
    require(grid > 0 && grid <= 4096,
      s"graft: decodeVideoStats grid must be in [1, 4096], got $grid")
    import media.sparkSession.implicits._
    media.select(col("obj_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          parseAviFrames(payload).iterator.flatMap { case (_, _, _, frames) =>
            frames.iterator.zipWithIndex.flatMap { case (enc, f) =>
              decodeImage(enc).iterator.flatMap { img =>
                val w = img.getWidth; val h = img.getHeight
                val sums = gridChannelSums(img, grid)
                (0 until grid * grid).iterator.map { c =>
                  (id, f, frames.length, w, h, c, sums(c)(0), sums(c)(1), sums(c)(2))
                }
              }
            }
          }
        }
      }
      .toDF("obj_id", "frame_idx", "n_frames", "width", "height",
        "cell", "r_sum", "g_sum", "b_sum")
  }

  /** Build a minimal structurally-valid AVI around pre-encoded frames:
    * RIFF(AVI ){ LIST(hdrl){ avih, LIST(strl){ strh, strf } },
    * LIST(movi){ 00dc… } }. `fourccCodec` goes into strh/strf ('MJPG'
    * for JPEG frames, 'png ' for PNG frames — both are real VfW codec
    * tags). The writer exists for fixtures and tests; the engine-side
    * artifact under test is [[parseAviFrames]]. */
  def buildAvi(frames: Seq[Array[Byte]], w: Int, h: Int, fps: Int,
      fourccCodec: String = "png "): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def cc(sx: String): Array[Byte] = sx.getBytes("US-ASCII")
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      cc(id) ++ le32(data.length) ++ data ++ pad
    }
    def list(listType: String, data: Array[Byte]): Array[Byte] =
      cc("LIST") ++ le32(data.length + 4) ++ cc(listType) ++ data
    val usPerFrame = if (fps > 0) 1000000 / fps else 0
    val avih = le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0x10) ++
      le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w) ++ le32(h) ++ Array.fill(16)(0.toByte)
    val strh = cc("vids") ++ cc(fourccCodec) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(1) ++ le32(if (fps > 0) fps else 1) ++ le32(0) ++
      le32(frames.length) ++ le32(0) ++ le32(-1) ++ le32(0) ++
      Array.fill(8)(0.toByte)
    val strf = le32(40) ++ le32(w) ++ le32(h) ++
      Array(1.toByte, 0.toByte) ++ Array(24.toByte, 0.toByte) ++
      cc(fourccCodec) ++ le32(w * h * 3) ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(0)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      frames.iterator.map(fd => chunk("00dc", fd)).reduceLeft(_ ++ _))
    val body = cc("AVI ") ++ hdrl ++ movi
    bo.write(cc("RIFF")); bo.write(le32(body.length)); bo.write(body)
    bo.toByteArray
  }

  /** Deterministic REAL-AVI test clip: frame f of clip `seed` is the
    * [[testCardImage]] of `seed + 31·f` (so the per-pixel channel formula
    * extends to (x, y, frame)), PNG-encoded (lossless) inside a
    * hand-built AVI — decode anywhere must reproduce the formula. */
  def testClipAvi(seed: Int, nFrames: Int, w: Int, h: Int, fps: Int = 10): Array[Byte] =
    buildAvi(
      (0 until nFrames).map { f =>
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(testCardImage(seed + 31 * f, w, h), "png", out)
        out.toByteArray
      }, w, h, fps)

  /** Pooled feature from a REAL decoded AVI clip: the mean of the
    * per-frame [[imageFeature]]s over every decodable frame, re-normalized
    * — the temporal-average-pooling shape a video model head would
    * produce, computed from frame pixel statistics instead. None when the
    * payload is not a parseable AVI or no frame decodes (callers keep the
    * stub fallback). */
  def videoFeatureOf(payload: Array[Byte], dim: Int): Option[Array[Float]] =
    parseAviFrames(payload).flatMap { case (_, _, _, frames) =>
      val decoded = frames.flatMap(decodeImage(_))
      if (decoded.isEmpty) None
      else {
        val acc = new Array[Float](dim)
        decoded.foreach { img =>
          val f = imageFeature(img, dim)
          var i = 0
          while (i < dim) { acc(i) += f(i); i += 1 }
        }
        var i = 0
        while (i < dim) { acc(i) /= decoded.length; i += 1 }
        val norm = math.sqrt(acc.map(x => x.toDouble * x).sum)
        if (norm > 0) { var j = 0; while (j < dim) { acc(j) = (acc(j) / norm).toFloat; j += 1 } }
        Some(acc)
      }
    }

  /** Frame sampling for video payloads: emits every `everyN`-th frame as
    * its own row with a frame index. AVI payloads sample REAL container
    * frames ([[parseAviFrames]] — each row's payload is one encoded
    * frame, decodable downstream); other containers fall back to the
    * documented byte-window stub (`frameBytes`) until their codecs exist
    * in the environment. */
  def sampleFrames(media: DataFrame, everyN: Int, frameBytes: Int = 256): DataFrame = {
    require(everyN > 0 && frameBytes > 0,
      s"graft: sampleFrames needs positive everyN/frameBytes, got $everyN/$frameBytes")
    import media.sparkSession.implicits._
    media.where(col("modality") === "video")
      .select(col("obj_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        if (payload == null) Iterator.empty
        else parseAviFrames(payload) match {
          case Some((_, _, _, frames)) =>
            frames.iterator.zipWithIndex
              .filter { case (_, i) => i % everyN == 0 }
              .map { case (frame, i) => (id, i, frame) }
          case None =>
            payload.grouped(frameBytes).zipWithIndex
              .filter { case (_, i) => i % everyN == 0 }
              .map { case (frame, i) => (id, i, frame) }
        }
      }
      .toDF("obj_id", "frame_idx", "frame_payload")
  }

  /** Resize stub for images: records intent in metadata (a codec would
    * rewrite the payload); demonstrates the metadata-rewrite contract. */
  def resizeMeta(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      when(col("modality") === "image",
        struct(lit(w).as("width"), lit(h).as("height"),
          col("meta.sample_rate").as("sample_rate"),
          col("meta.n_frames").as("n_frames")))
        .otherwise(col("meta")))
}
