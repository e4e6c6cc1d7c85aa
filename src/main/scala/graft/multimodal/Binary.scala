package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal plumbing (SURVEY.md §2 rows 37–38): media payloads are
  * opaque `binary` columns with a typed metadata struct riding along.
  * IMAGE decode is REAL: any `javax.imageio`-readable payload
  * (BMP/PNG/GIF/JPEG — all in the stock JDK) is decoded to its actual
  * raster, with true dimensions and a luminance-histogram feature
  * vector ([[decodeImage]]). AUDIO decode is REAL too: any
  * `javax.sound.sampled`-readable payload (WAV/AIFF/AU — stock JDK)
  * yields its true format plus an RMS-energy envelope over the
  * decoded PCM samples ([[decodeAudio]]). Payloads that don't decode
  * (and video, which has no JDK codec) fall back to the
  * clearly-marked deterministic stubs, and every decoded row says
  * which path it took (`real_decode`). The Spark-side contract —
  * schema, batched per-partition processing, partitioning — is the
  * same for all paths.
  */
object Binary {

  /** Typed metadata carried next to every media payload. */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("header_hex", StringType)))

  /** The media table synthesized from documents: payload = utf-8 bytes
    * (a stand-in for image bytes), metadata extracted from the payload
    * itself — the same shape a parquet-of-JPEGs table would have. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        when(col("doc_id") % 3 === 0, "image/jpeg")
          .when(col("doc_id") % 3 === 1, "audio/wav")
          .otherwise("video/mp4").as("media_type"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        lower(substring(hex(encode(col("text"), "UTF-8")), 1, 16)).as("header_hex")
      ).as("meta"))

  // ---------------------------------------------------------------
  // m01: binary column + typed metadata extraction (oracle-checked:
  // byte lengths and headers are engine-portable).
  // ---------------------------------------------------------------
  def m01(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir).select(
      col("media_id"), col("meta.media_type").as("media_type"),
      col("meta.n_bytes").as("n_bytes"), col("meta.header_hex").as("header_hex"))

  val m01Sql: String =
    """SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image/jpeg'
            WHEN doc_id % 3 = 1 THEN 'audio/wav'
            ELSE 'video/mp4' END AS media_type,
       octet_length(encode(text)) AS n_bytes,
       lower(substring(hex(encode(text)), 1, 16)) AS header_hex
       FROM documents"""

  // ---------------------------------------------------------------
  // Decode / feature-extract plumbing. The per-batch shape mirrors a
  // vectorized (Arrow-batched) decode: one iterator per partition,
  // rows processed in streaming fashion, fixed-size feature output.
  // ---------------------------------------------------------------

  case class MediaRow(media_id: Long, payload: Array[Byte], media_type: String)
  case class DecodedRow(media_id: Long, media_type: String,
      width: Int, height: Int, features: Array[Float], real_decode: Boolean)

  /** REAL image decode through `javax.imageio` (BMP, PNG, GIF, JPEG —
    * the stock-JDK codecs; no extra dependency). Returns the decoded
    * raster's true width/height plus a `featureDim`-bin luminance
    * histogram normalized to pixel fractions (size-invariant — the
    * cheap content feature an image-dedup/quality pass starts from).
    * None when the payload is not a readable image. Executor-side
    * only; the in-memory stream keeps ImageIO off its disk cache. */
  def decodeImage(payload: Array[Byte],
      featureDim: Int = 8): Option[(Int, Int, Array[Float])] = {
    // an explicitly memory-backed stream: the default
    // createImageInputStream(InputStream) honors ImageIO.getUseCache
    // (true) and spools every payload to a temp FILE — per-row disk
    // I/O in the executor hot path, and the cache file leaks when no
    // reader matches. Closed in finally for the same reason. The
    // catch is NonFatal, not just IOException: the JDK codecs throw
    // unchecked exceptions (ArrayIndexOutOfBounds, CMMException,
    // NegativeArraySize, IllegalArgument) on corrupt-but-recognized
    // payloads — the NORMAL case in a scraped corpus — and a decode
    // failure must mean "stub fallback", never a dead task.
    val stream = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    val img =
      try javax.imageio.ImageIO.read(stream)
      catch { case scala.util.control.NonFatal(_) => null }
      finally scala.util.Try(stream.close())
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val feats = new Array[Float](featureDim)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
          feats(lum * featureDim / 256) += 1f
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toFloat
      var i = 0
      while (i < featureDim) { feats(i) /= n; i += 1 }
      Some((w, h, feats))
    }
  }

  /** REAL audio decode through `javax.sound.sampled` (WAV/AIFF/AU —
    * the stock-JDK codecs; no extra dependency). Returns the format's
    * true sample rate, channel count and frame length plus a
    * `featureDim`-segment RMS-energy envelope over the decoded PCM
    * samples, normalized to [0,1] (the cheap content feature an
    * audio-dedup/silence-filter pass starts from). Handles 16-bit
    * (either endianness) and 8-bit PCM; None when the payload is not
    * a readable audio file or an unsupported encoding. Same
    * robustness contract as [[decodeImage]]: NonFatal failures mean
    * fallback, never a dead task. */
  def decodeAudio(payload: Array[Byte],
      featureDim: Int = 8): Option[(Int, Int, Long, Array[Float])] = {
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (ais == null) return None
    try {
      val fmt = ais.getFormat
      val enc = fmt.getEncoding
      val pcmSigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
      val pcmUnsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
      val bits = fmt.getSampleSizeInBits
      if (!(pcmSigned || pcmUnsigned) || (bits != 8 && bits != 16)) return None
      val raw = ais.readAllBytes()
      val bytesPerSample = bits / 8
      val n = raw.length / bytesPerSample
      if (n == 0) return None
      // RMS per equal-time segment over all interleaved channels
      val feats = new Array[Float](featureDim)
      val counts = new Array[Int](featureDim)
      var i = 0
      while (i < n) {
        val v: Double =
          if (bits == 16) {
            val b0 = raw(i * 2) & 0xff
            val b1 = raw(i * 2 + 1) & 0xff
            val s = if (fmt.isBigEndian) (b0 << 8) | b1 else (b1 << 8) | b0
            (if (pcmSigned) s.toShort.toInt else s - 32768) / 32768.0
          } else {
            val s = raw(i) & 0xff
            (if (pcmSigned) raw(i).toInt else s - 128) / 128.0
          }
        val seg = (i.toLong * featureDim / n).toInt
        feats(seg) += (v * v).toFloat
        counts(seg) += 1
        i += 1
      }
      var k = 0
      while (k < featureDim) {
        if (counts(k) > 0)
          feats(k) = math.sqrt(feats(k) / counts(k)).toFloat
        k += 1
      }
      Some((fmt.getSampleRate.toInt, fmt.getChannels, ais.getFrameLength, feats))
    } catch { case scala.util.control.NonFatal(_) => None }
    finally scala.util.Try(ais.close())
  }

  case class AudioRow(media_id: Long, sample_rate: Int, channels: Int,
      n_frames: Long, features: Array[Float], real_decode: Boolean)

  /** Distributed audio feature extraction over audio-typed rows only
    * (filter pushes to the scan): real `javax.sound.sampled` decode
    * with the deterministic stub as the flagged fallback — the audio
    * counterpart of [[decodeFeatures]]'s image path. */
  def audioFeatures(media: DataFrame): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.filter(col("meta.media_type").startsWith("audio/"))
      .select(col("media_id"), col("payload"),
        col("meta.media_type").as("media_type")).as[MediaRow]
      .mapPartitions(_.map { r =>
        decodeAudio(r.payload) match {
          case Some((rate, ch, frames, f)) =>
            AudioRow(r.media_id, rate, ch, frames, f, real_decode = true)
          case None =>
            val (w, h, f) = stubDecode(r.payload)
            AudioRow(r.media_id, w * 1000, 1, h.toLong, f, real_decode = false)
        }
      }).toDF()
  }

  /** STUB decode — the fallback for payloads [[decodeImage]] and
    * [[decodeAudio]] can't read (and for video, which has no JDK
    * codec): derives a
    * deterministic fake (dimensions from byte length, features from a
    * rolling byte hash) so the pipeline around it is fully testable
    * on any payload.
    */
  def stubDecode(payload: Array[Byte], featureDim: Int = 8): (Int, Int, Array[Float]) = {
    val w = 16 + (payload.length % 64)
    val h = 9 + (payload.length % 36)
    val feats = new Array[Float](featureDim)
    var i = 0
    while (i < payload.length) {
      feats(i % featureDim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    (w, h, feats)
  }

  /** STUB resize: a real deployment decodes, scales, re-encodes; the
    * stub deterministically subsamples every k-th byte to the target
    * "pixel" budget so output size tracks the requested dimensions. */
  def stubResize(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    val budget = math.max(1, targetW * targetH)
    if (payload.length <= budget) payload
    else {
      val step = payload.length.toDouble / budget
      Array.tabulate(budget)(i => payload((i * step).toInt))
    }
  }

  case class Frame(index: Int, offset: Long, data: Array[Byte])

  /** STUB frame-sample: a real deployment seeks keyframes; the stub
    * slices the payload into fixed-size pseudo-frames and keeps every
    * `everyNth` — the schema (array of frame structs with offsets) and
    * batching are what the pipeline depends on. */
  def stubFrameSample(payload: Array[Byte], frameBytes: Int, everyNth: Int): Seq[Frame] = {
    require(frameBytes > 0 && everyNth > 0)
    payload.grouped(frameBytes).zipWithIndex
      .filter { case (_, i) => i % everyNth == 0 }
      .map { case (chunk, i) => Frame(i, i.toLong * frameBytes, chunk) }
      .toSeq
  }

  case class ResizedRow(media_id: Long, n_bytes_in: Long, n_bytes_out: Long,
      thumb: Array[Byte])
  case class FrameRow(media_id: Long, n_frames: Int, frames: Seq[Frame])

  /** Distributed resize over the media table — narrow mapPartitions,
    * the image-thumbnailing plumbing shape. */
  def resizeAll(media: DataFrame, targetW: Int = 32, targetH: Int = 32): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("media_id"), col("payload"),
        col("meta.media_type").as("media_type")).as[MediaRow]
      .mapPartitions(_.map { r =>
        val out = stubResize(r.payload, targetW, targetH)
        ResizedRow(r.media_id, r.payload.length.toLong, out.length.toLong, out)
      }).toDF()
  }

  /** Distributed frame sampling over video rows only (filter pushes to
    * the scan; non-video rows never reach the decode stub). */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64, everyNth: Int = 4): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.filter(col("meta.media_type") === "video/mp4")
      .select(col("media_id"), col("payload"),
        col("meta.media_type").as("media_type")).as[MediaRow]
      .mapPartitions(_.map { r =>
        val fs = stubFrameSample(r.payload, frameBytes, everyNth)
        FrameRow(r.media_id, fs.length, fs)
      }).toDF()
  }

  /** Distributed decode: mapPartitions over typed rows — executor-side
    * only, one pass, no collect. Repartitions by media_id so payload
    * bytes spread evenly regardless of input file layout. image-typed
    * payloads get the REAL `javax.imageio` decode; anything that
    * doesn't decode (or isn't an image) takes the deterministic stub,
    * flagged per row in `real_decode`. */
  def decodeFeatures(media: DataFrame, partitions: Int = 0): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    val typed = media.select(col("media_id"), col("payload"),
        col("meta.media_type").as("media_type")).as[MediaRow]
    val sized = if (partitions > 0) typed.repartition(partitions, col("media_id")) else typed
    sized.mapPartitions { rows =>
      rows.map { r =>
        val real =
          if (r.media_type != null && r.media_type.startsWith("image/"))
            decodeImage(r.payload)
          else None
        real match {
          case Some((w, h, f)) =>
            DecodedRow(r.media_id, r.media_type, w, h, f, real_decode = true)
          case None =>
            val (w, h, f) = stubDecode(r.payload)
            DecodedRow(r.media_id, r.media_type, w, h, f, real_decode = false)
        }
      }
    }.toDF()
  }

  // ---------------------------------------------------------------
  // m02: perceptual image hashing (dHash) + near-dup pairs — the
  // image counterpart of d04's SimHash text dedup, built on the REAL
  // javax.imageio decode path. The face's images are synthesized
  // 9×8 grayscale BMPs whose pixel values follow an md5 formula both
  // engines can compute, so the oracle replays encode → ImageIO
  // decode → box-sample → gradient bits ARITHMETICALLY: if the JDK
  // codec decoded a single pixel wrong, the 64-bit hashes diverge
  // and the driver's compare fails. That puts a real binary codec
  // inside the correctness gate — the strongest check the multimodal
  // family has.
  //
  // Scale: hashing is a narrow mapPartitions (one decode per row, no
  // shuffle); near-dup pairs use the d04 banding trick — 8 bands ×
  // 8 bits, so any pair at hamming ≤ 7 shares a band by pigeonhole —
  // and candidates meet in a band equi-join, never all-pairs.
  // ---------------------------------------------------------------

  /** Deterministic pixel formula shared with the oracle: gray value
    * of (image id, x, y) = 60-bit md5 prefix of "id:x:y" mod 256. */
  def md5Gray(id: Long, x: Int, y: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id:$x:$y".getBytes("UTF-8"))
    val hex = d.take(8).map(b => f"$b%02x").mkString.take(15)
    (java.lang.Long.parseLong(hex, 16) % 256L).toInt
  }

  /** DHash grid width/height: 9×8 → 8×8 gradient bits. */
  val DhashW = 9
  val DhashH = 8

  /** A real 24-bit uncompressed BMP (9×8, bottom-up rows, 4-byte row
    * padding) whose pixels are [[md5Gray]] grays — built byte-by-byte
    * so the decode side is exercised against a payload no JDK encoder
    * produced. */
  def syntheticBmp(id: Long): Array[Byte] = {
    val rowBytes = DhashW * 3
    val padded = (rowBytes + 3) / 4 * 4
    val imageSize = padded * DhashH
    val fileSize = 54 + imageSize
    val out = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putShort(0).putShort(0).putInt(54)
    out.putInt(40).putInt(DhashW).putInt(DhashH).putShort(1).putShort(24)
      .putInt(0).putInt(imageSize).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    var y = DhashH - 1 // bottom-up
    while (y >= 0) {
      var x = 0
      while (x < DhashW) {
        val g = md5Gray(id, x, y).toByte
        out.put(g).put(g).put(g)
        x += 1
      }
      var p = rowBytes
      while (p < padded) { out.put(0.toByte); p += 1 }
      y -= 1
    }
    out.array()
  }

  /** 64-bit dHash: box-averaged luminance on a 9×8 grid, bit y·8+x
    * set iff grid(x+1, y) > grid(x, y) (row-wise gradients). */
  def dHash64(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val grid = Array.ofDim[Double](DhashH, DhashW)
    var gy = 0
    while (gy < DhashH) {
      val y0 = gy * h / DhashH
      val y1 = math.max((gy + 1) * h / DhashH, y0 + 1)
      var gx = 0
      while (gx < DhashW) {
        val x0 = gx * w / DhashW
        val x1 = math.max((gx + 1) * w / DhashW, x0 + 1)
        var sum = 0.0
        var n = 0
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val rgb = img.getRGB(x, y)
            sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
            n += 1
            x += 1
          }
          y += 1
        }
        grid(gy)(gx) = if (n == 0) 0.0 else sum / n
        gx += 1
      }
      gy += 1
    }
    var bits = 0L
    var y = 0
    while (y < DhashH) {
      var x = 0
      while (x < 8) {
        if (grid(y)(x + 1) > grid(y)(x)) bits |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  case class HashedImage(media_id: Long, width: Int, height: Int,
      dhash: Long, real_decode: Boolean)

  /** Distributed perceptual hashing: narrow mapPartitions, REAL
    * ImageIO decode with the stub-feature fold as flagged fallback. */
  def imageDHash(media: DataFrame): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("media_id"), col("payload"),
        col("meta.media_type").as("media_type")).as[MediaRow]
      .mapPartitions(_.map { r =>
        val img =
          try javax.imageio.ImageIO.read(
            new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(r.payload)))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img != null)
          HashedImage(r.media_id, img.getWidth, img.getHeight,
            dHash64(img), real_decode = true)
        else {
          val (w, h, f) = stubDecode(r.payload)
          val fold = f.foldLeft(1469598103934665603L)((acc, v) =>
            (acc ^ java.lang.Float.floatToIntBits(v)) * 1099511628211L)
          HashedImage(r.media_id, w, h, fold, real_decode = false)
        }
      }).toDF()
  }

  /** Near-dup image pairs at hamming ≤ `maxHamming` (≤ 7 exact by
    * pigeonhole over 8 bands × 8 bits — the d04 candidate scheme). */
  def dhashPairs(hashed: DataFrame, maxHamming: Int = 7): DataFrame = {
    val banded = hashed.select(col("media_id"), col("dhash"),
        explode(array((0 until 8).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("dhash"), b * 8).bitwiseAND(0xFFL).as("key"))): _*))
          .as("bk"))
      .select(col("media_id"), col("dhash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("a"), col("b.media_id").as("b"),
        bit_count(col("a.dhash").bitwiseXOR(col("b.dhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** m02 face: the image-typed media rows re-materialized as real
    * BMPs (one per image id), decoded with the stock JDK codec and
    * perceptually hashed. */
  def m02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = mediaTable(s, dir)
      .filter(col("meta.media_type") === "image/jpeg")
      .select(col("media_id")).as[Long]
    imageDHash(ids.mapPartitions(_.map { id =>
      val payload = syntheticBmp(id)
      (id, payload, "image/bmp")
    }).toDF("media_id", "payload", "media_type")
      .select(col("media_id"), col("payload"),
        struct(col("media_type").as("media_type"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          lit("").as("header_hex")).as("meta")))
  }

  val m02Sql: String = {
    def g(x: Int, y: Int): String =
      s"(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':$x:$y'), 1, 15)) AS BIGINT) % 256)"
    val terms = (for (y <- 0 until DhashH; x <- 0 until 8) yield {
      val b = y * 8 + x
      val pow =
        if (b == 63) "(-9223372036854775807 - 1)" else (1L << b).toString
      s"CASE WHEN ${g(x + 1, y)} > ${g(x, y)} THEN CAST($pow AS BIGINT) ELSE 0 END"
    }).mkString("\n         + ")
    s"""SELECT doc_id AS media_id, $DhashW AS width, $DhashH AS height,
       CAST($terms AS BIGINT) AS dhash,
       TRUE AS real_decode
       FROM documents WHERE doc_id % 3 = 0"""
  }

  // ---------------------------------------------------------------
  // m03: audio energy extraction with the JDK codec driver-checked —
  // the m02 trick applied to javax.sound.sampled: the face's WAVs are
  // real RIFF/PCM16 files synthesized byte-by-byte from an md5 sample
  // formula, decoded through AudioSystem, and reduced to EXACT
  // integer segment energies (sum of |sample| per eighth) — so the
  // DuckDB oracle recomputes the same BIGINTs arithmetically and one
  // wrongly-decoded sample fails the driver compare. Together with
  // m02 this puts BOTH stock-JDK media codecs inside the correctness
  // gate; energy extraction itself is the silence-/clipping-filter
  // primitive an audio corpus pass starts from.
  // ---------------------------------------------------------------

  /** Deterministic PCM sample shared with the oracle: int16 from the
    * 60-bit md5 prefix of "au:id:i". */
  def md5Sample(id: Long, i: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"au:$id:$i".getBytes("UTF-8"))
    val hex = d.take(8).map(b => f"$b%02x").mkString.take(15)
    ((java.lang.Long.parseLong(hex, 16) % 65536L) - 32768L).toInt
  }

  val WavSamples = 64
  val WavRate = 8000
  val EnergySegments = 8

  /** A real RIFF/WAVE PCM16LE mono file (44-byte header + samples)
    * whose samples are [[md5Sample]] values. */
  def syntheticWav(id: Long, n: Int = WavSamples): Array[Byte] = {
    val dataSize = n * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(WavRate).putInt(WavRate * 2).putShort(2).putShort(16)
    out.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < n) { out.putShort(md5Sample(id, i).toShort); i += 1 }
    out.array()
  }

  case class AudioEnergy(media_id: Long, sample_rate: Int, n_samples: Int,
      e0: Long, e1: Long, e2: Long, e3: Long,
      e4: Long, e5: Long, e6: Long, e7: Long, real_decode: Boolean)

  /** Distributed integer energy extraction: REAL javax.sound decode,
    * |sample| summed per eighth — exact BIGINTs, fallback flagged. */
  /** Decode a 16-bit PCM payload through javax.sound and sum
    * |sample| into `nWindows` proportional windows — the shared
    * decode stage of [[audioEnergy]] (8 windows) and
    * [[audioFingerprint]] (65). Returns (sampleRate, nSamples,
    * windows) or None for anything unreadable/non-16-bit. The window
    * index multiplies in LONG: `i * nWindows` wraps Int negative at
    * ~33M samples (~12 min at 44.1 kHz) and the resulting AIOOBE
    * would be swallowed as a fake decode failure. */
  private def decodePcm16Windows(payload: Array[Byte],
      nWindows: Int): Option[(Int, Int, Array[Long])] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16) None
        else {
          val win = new Array[Long](nWindows)
          val raw = ais.readAllBytes()
          val n = raw.length / 2
          var i = 0
          while (i < n) {
            val lo = raw(i * 2) & 0xff
            val hi = raw(i * 2 + 1) & 0xff
            val v =
              (if (fmt.isBigEndian) (lo << 8) | hi else (hi << 8) | lo)
                .toShort.toInt
            win((i.toLong * nWindows / n).toInt.min(nWindows - 1)) +=
              math.abs(v).toLong
            i += 1
          }
          Some((fmt.getSampleRate.toInt, n, win))
        }
      } finally scala.util.Try(ais.close())
    } catch { case scala.util.control.NonFatal(_) => None }

  def audioEnergy(media: DataFrame): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("media_id"), col("payload"),
        col("meta.media_type").as("media_type")).as[MediaRow]
      .mapPartitions(_.map { r =>
        decodePcm16Windows(r.payload, EnergySegments) match {
          case Some((rate, n, segs)) =>
            AudioEnergy(r.media_id, rate, n, segs(0), segs(1), segs(2),
              segs(3), segs(4), segs(5), segs(6), segs(7),
              real_decode = true)
          case None =>
            val (w, h, f) = stubDecode(r.payload)
            AudioEnergy(r.media_id, w * 1000, h,
              f(0).toLong, f(1).toLong, f(2).toLong, f(3).toLong,
              f(4).toLong, f(5).toLong, f(6).toLong, f(7).toLong,
              real_decode = false)
        }
      }).toDF()
  }

  /** m03 face: the audio-typed media rows re-materialized as real
    * WAVs, decoded with the stock JDK codec. */
  def m03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = mediaTable(s, dir)
      .filter(col("meta.media_type") === "audio/wav")
      .select(col("media_id")).as[Long]
    audioEnergy(ids.mapPartitions(_.map { id =>
      (id, syntheticWav(id), "audio/wav")
    }).toDF("media_id", "payload", "media_type")
      .select(col("media_id"), col("payload"),
        struct(col("media_type").as("media_type"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          lit("").as("header_hex")).as("meta")))
  }

  /** The [[md5Sample]] formula as SQL — shared by m03Sql and
    * m04Sql so the two oracles can't drift. */
  private def sampleSql(i: Int): String =
    s"((CAST(('0x' || substring(md5('au:' || CAST(doc_id AS VARCHAR) || ':$i'), 1, 15)) AS BIGINT) % 65536) - 32768)"

  val m03Sql: String = {
    def sample(i: Int): String = sampleSql(i)
    val perSeg = WavSamples / EnergySegments
    val segCols = (0 until EnergySegments).map { k =>
      val terms = (0 until perSeg)
        .map(j => s"abs(${sample(k * perSeg + j)})").mkString(" + ")
      s"CAST($terms AS BIGINT) AS e$k"
    }.mkString(",\n         ")
    s"""SELECT doc_id AS media_id, $WavRate AS sample_rate,
         $WavSamples AS n_samples,
         $segCols,
         TRUE AS real_decode
       FROM documents WHERE doc_id % 3 = 1"""
  }

  // ---------------------------------------------------------------
  // m04: audio fingerprint (envelope dHash) + near-dup pairs — the
  // m02 gradient-hash idea applied to the m03 decode path, completing
  // the multimodal dedup symmetry (images near-dup by dHash since
  // r13; audio had energies but no fingerprint). 65 window energies
  // over the decoded PCM (exact integer |sample| sums, the m03
  // arithmetic at finer granularity) → 64 gradient bits (bit b set
  // iff e_{b+1} > e_b) → one BIGINT — robust to uniform gain changes
  // exactly like dHash is to brightness, and band-joinable by the
  // same 8×8 pigeonhole scheme (dhashPairs, shared verbatim).
  //
  // The face's WAVs are md5-formula synthesized (130 samples → 65
  // 2-sample windows), so the oracle replays decode → window sums →
  // gradient bits ARITHMETICALLY — the third stock-JDK codec check
  // inside the driver gate.
  // ---------------------------------------------------------------
  val AudioFpWindows = 65
  val AudioFpSamples = 2 * AudioFpWindows

  case class AudioFp(media_id: Long, n_samples: Int, fp: Long,
      real_decode: Boolean)

  /** Distributed envelope fingerprinting: REAL javax.sound decode,
    * 65 exact integer window energies, 64 gradient bits. */
  def audioFingerprint(media: DataFrame): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("media_id"), col("payload"),
        col("meta.media_type").as("media_type")).as[MediaRow]
      .mapPartitions(_.map { r =>
        decodePcm16Windows(r.payload, AudioFpWindows) match {
          case Some((_, n, win)) =>
            var fp = 0L
            var b = 0
            while (b < 64) {
              if (win(b + 1) > win(b)) fp |= (1L << b)
              b += 1
            }
            AudioFp(r.media_id, n, fp, real_decode = true)
          case None =>
            val (_, h, f) = stubDecode(r.payload)
            val fold = f.foldLeft(1469598103934665603L)((acc, v) =>
              (acc ^ java.lang.Float.floatToIntBits(v)) * 1099511628211L)
            AudioFp(r.media_id, h, fold, real_decode = false)
        }
      }).toDF()
  }

  /** Near-dup audio pairs — the dhashPairs band scheme verbatim over
    * the envelope fingerprints (output: a, b, hamming). */
  def audioFpPairs(fps: DataFrame, maxHamming: Int = 7): DataFrame =
    dhashPairs(fps.withColumnRenamed("fp", "dhash"), maxHamming)

  /** m04 face: audio-typed media rows as md5-formula WAVs through
    * the fingerprint path. */
  def m04(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = mediaTable(s, dir)
      .filter(col("meta.media_type") === "audio/wav")
      .select(col("media_id")).as[Long]
    audioFingerprint(ids.mapPartitions(_.map { id =>
      (id, syntheticWav(id, AudioFpSamples), "audio/wav")
    }).toDF("media_id", "payload", "media_type")
      .select(col("media_id"), col("payload"),
        struct(col("media_type").as("media_type"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          lit("").as("header_hex")).as("meta")))
  }

  val m04Sql: String = {
    def win(w: Int): String =
      s"(abs(${sampleSql(2 * w)}) + abs(${sampleSql(2 * w + 1)}))"
    val terms = (0 until 64).map { b =>
      val pow =
        if (b == 63) "(-9223372036854775807 - 1)" else (1L << b).toString
      s"CASE WHEN ${win(b + 1)} > ${win(b)} THEN CAST($pow AS BIGINT) ELSE 0 END"
    }.mkString("\n         + ")
    s"""SELECT doc_id AS media_id, $AudioFpSamples AS n_samples,
       CAST($terms AS BIGINT) AS fp,
       TRUE AS real_decode
       FROM documents WHERE doc_id % 3 = 1"""
  }

  // ---------------------------------------------------------------
  // m05: video frame sampling + per-frame features — the face that
  // moves video from "declared stub" to driver-checked PLUMBING.
  // There is no stock-JDK video codec (the honest limit m01-m04's
  // scaladoc declares), so the container is graft's own deterministic
  // GFV1 format: a fixed 8-byte header (magic + frame size + frame
  // count) over fixed-size frames — a stand-in for the keyframe index
  // a real demuxer exposes. What the face actually verifies is the
  // Spark side a production video pass depends on and the brief asks
  // to make real: media-type filter pushed to the scan, typed
  // per-partition decode (one container parse per row, streaming
  // iterator, no collect), every-Nth frame sampling off the container
  // index WITHOUT touching skipped frames' bytes, and fixed-width
  // per-frame features (exact integer energy + the m02/m04 gradient
  // fingerprint at frame level — the scene-dedup key `dhashPairs`
  // can band-join). Frame bytes are md5-formula synthesized (the
  // m03/m04 pattern), so the oracle replays parse → sample → energy
  // → gradient bits arithmetically in DuckDB.
  // ---------------------------------------------------------------
  val VideoFrameBytes = 16
  val VideoFrames = 8
  val VideoEveryNth = 2
  private val VideoMagic = "GFV1".getBytes("US-ASCII")

  /** Deterministic frame byte shared with the oracle: the 60-bit md5
    * prefix of "vid:id:i" mod 256 (i = body byte position). */
  def md5VideoByte(id: Long, i: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"vid:$id:$i".getBytes("UTF-8"))
    val hex = d.take(8).map(b => f"$b%02x").mkString.take(15)
    (java.lang.Long.parseLong(hex, 16) % 256L).toInt
  }

  /** A GFV1 container: magic "GFV1", u16 frameBytes, u16 nFrames
    * (big-endian), then nFrames fixed-size frames of [[md5VideoByte]]
    * bytes. */
  def syntheticVideo(id: Long, nFrames: Int = VideoFrames,
      frameBytes: Int = VideoFrameBytes): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(8 + nFrames * frameBytes)
    out.put(VideoMagic).putShort(frameBytes.toShort).putShort(nFrames.toShort)
    var i = 0
    while (i < nFrames * frameBytes) { out.put(md5VideoByte(id, i).toByte); i += 1 }
    out.array()
  }

  /** Parse a GFV1 container: (frameBytes, body) — None unless the
    * magic matches and the body length is exactly frameBytes·nFrames
    * (a truncated payload is a decode failure, not a short video). */
  def parseVideo(payload: Array[Byte]): Option[(Int, Array[Byte])] = {
    if (payload.length < 8 || !payload.take(4).sameElements(VideoMagic)) None
    else {
      val buf = java.nio.ByteBuffer.wrap(payload, 4, 4)
      val frameBytes = buf.getShort & 0xffff
      val nFrames = buf.getShort & 0xffff
      // expected length in LONG: 65535×65535 header widths overflow
      // an Int product, and the "safety" of every overflowed value
      // happening to be negative is an accident, not a contract
      if (frameBytes <= 0 ||
          payload.length.toLong != 8L + nFrames.toLong * frameBytes) None
      else Some((frameBytes, java.util.Arrays.copyOfRange(payload, 8, payload.length)))
    }
  }

  case class VideoFrameRow(media_id: Long, frame_index: Long,
      offset_bytes: Long, n_bytes: Long, energy: Long, fp: Long,
      parsed: Boolean)

  /** Distributed frame sampling + per-frame features over video rows
    * only (the filter pushes to the scan; other media never reach the
    * parser). Keeps every `everyNth` frame counting from 0 — the
    * sampler indexes the container directly, so a skipped frame's
    * bytes are never read. Per kept frame: exact integer energy
    * (unsigned-byte sum — the blank/black-frame filter primitive) and
    * the gradient fingerprint (bit b set iff byte b+1 > byte b — the
    * m02/m04 dHash idea at frame level, band-joinable for scene
    * dedup). Payloads that don't parse as GFV1 take the
    * [[stubFrameSample]] fallback at the default frame size, flagged
    * `parsed = false` (the decodeFeatures convention). */
  def videoFrameFeatures(media: DataFrame,
      everyNth: Int = VideoEveryNth): DataFrame = {
    require(everyNth > 0)
    val s = media.sparkSession
    import s.implicits._
    def features(mediaId: Long, idx: Int, offset: Long, data: Array[Byte],
        parsed: Boolean): VideoFrameRow = {
      var energy = 0L
      var fp = 0L
      var j = 0
      while (j < data.length) {
        energy += (data(j) & 0xff)
        // gradient bits occupy positions 0-62 only: a frame wider
        // than 63 bytes TRUNCATES its fingerprint to the first 63
        // gradient positions rather than letting `1L << j` wrap
        // (Scala masks the shift to j & 63, which would alias
        // high-byte gradients onto low bits and produce false
        // scene-dedup merges); bit 63 is deliberately never set so
        // the fingerprint stays non-negative (spec-pinned)
        if (j < 63 && j + 1 < data.length &&
            (data(j + 1) & 0xff) > (data(j) & 0xff))
          fp |= (1L << j)
        j += 1
      }
      VideoFrameRow(mediaId, idx.toLong, offset, data.length.toLong, energy, fp, parsed)
    }
    media.filter(col("meta.media_type") === "video/mp4")
      .select(col("media_id"), col("payload"),
        col("meta.media_type").as("media_type")).as[MediaRow]
      .mapPartitions(_.flatMap { r =>
        parseVideo(r.payload) match {
          case Some((frameBytes, body)) =>
            val nFrames = body.length / frameBytes
            (0 until nFrames by everyNth).iterator.map { i =>
              val off = i.toLong * frameBytes
              features(r.media_id, i, off, java.util.Arrays.copyOfRange(
                body, i * frameBytes, (i + 1) * frameBytes), parsed = true)
            }
          case None =>
            stubFrameSample(r.payload, VideoFrameBytes, everyNth).iterator
              .map(f => features(r.media_id, f.index, f.offset, f.data,
                parsed = false))
        }
      }).toDF()
  }

  /** m05 face: video-typed media rows as md5-formula GFV1 containers
    * through the frame-sampling path. */
  def m05(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = mediaTable(s, dir)
      .filter(col("meta.media_type") === "video/mp4")
      .select(col("media_id")).as[Long]
    videoFrameFeatures(ids.mapPartitions(_.map { id =>
      (id, syntheticVideo(id), "video/mp4")
    }).toDF("media_id", "payload", "media_type")
      .select(col("media_id"), col("payload"),
        struct(col("media_type").as("media_type"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          lit("").as("header_hex")).as("meta")))
  }

  val m05Sql: String = {
    def byteSql(j: Int): String =
      s"(CAST(('0x' || substring(md5('vid:' || CAST(doc_id AS VARCHAR) || " +
        s"':' || CAST(idx*$VideoFrameBytes+$j AS VARCHAR)), 1, 15)) AS BIGINT) % 256)"
    val byteCols = (0 until VideoFrameBytes)
      .map(j => s"${byteSql(j)} AS b$j").mkString(",\n         ")
    val energy = (0 until VideoFrameBytes).map(j => s"b$j").mkString(" + ")
    val fp = (0 until VideoFrameBytes - 1).map { b =>
      s"CASE WHEN b${b + 1} > b$b THEN CAST(${1L << b} AS BIGINT) ELSE 0 END"
    }.mkString("\n         + ")
    val idxRows = (0 until VideoFrames by VideoEveryNth)
      .map(i => s"($i)").mkString(", ")
    s"""WITH fr AS (
         SELECT doc_id, idx FROM documents
         CROSS JOIN (VALUES $idxRows) AS f(idx)
         WHERE doc_id % 3 = 2),
       b AS (SELECT doc_id, idx,
         $byteCols
         FROM fr)
       SELECT doc_id AS media_id, CAST(idx AS BIGINT) AS frame_index,
         CAST(idx * $VideoFrameBytes AS BIGINT) AS offset_bytes,
         CAST($VideoFrameBytes AS BIGINT) AS n_bytes,
         CAST($energy AS BIGINT) AS energy,
         CAST($fp AS BIGINT) AS fp,
         TRUE AS parsed
       FROM b"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_binary_meta" -> (m01 _),
    "m02_image_dhash" -> (m02 _),
    "m03_audio_energy" -> (m03 _),
    "m04_audio_fp" -> (m04 _),
    "m05_video_frames" -> (m05 _))

  val oracles: Map[String, String] = Map(
    "m01_binary_meta" -> m01Sql,
    "m02_image_dhash" -> m02Sql,
    "m03_audio_energy" -> m03Sql,
    "m04_audio_fp" -> m04Sql,
    "m05_video_frames" -> m05Sql)
}
