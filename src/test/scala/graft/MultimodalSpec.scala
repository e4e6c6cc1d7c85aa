package graft

import graft.multimodal.Binary
import org.apache.spark.sql.functions._

/** Multimodal plumbing (SURVEY.md §2 row 38): binary payload schema,
  * metadata extraction, and the batched distributed decode path with
  * its stubbed codec. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media table: binary payload + typed metadata struct") {
    val m = Binary.mediaTable(spark, sf("sf0.001"))
    val schema = m.schema
    assert(schema("payload").dataType.typeName == "binary")
    val meta = schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fields.map(f => (f.name, f.dataType)).toSeq ==
      Binary.MediaMetaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val r = m.orderBy("media_id").select("meta.n_bytes", "meta.header_hex").head()
    assert(r.getLong(0) > 0)
    assert(r.getString(1).matches("[0-9a-f]{1,16}"))
  }

  test("stubDecode is deterministic and shape-stable") {
    val bytes = "hello world".getBytes("UTF-8")
    val (w1, h1, f1) = Binary.stubDecode(bytes)
    val (w2, h2, f2) = Binary.stubDecode(bytes)
    assert((w1, h1) == (w2, h2))
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == 8)
  }

  test("resizeAll: output bounded by target pixel budget, deterministic") {
    val m = Binary.mediaTable(spark, sf("sf0.001"))
    val resized = Binary.resizeAll(m, targetW = 8, targetH = 8)
    val rows = resized.select("n_bytes_in", "n_bytes_out").as[(Long, Long)].collect()
    rows.foreach { case (in, out) =>
      assert(out <= math.max(in, 64))
      assert(out <= 64 || in <= 64)
    }
    val again = Binary.resizeAll(m, 8, 8).select("thumb").as[Array[Byte]].collect()
    val first = resized.select("thumb").as[Array[Byte]].collect()
    assert(first.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("sampleFrames: only video rows, offsets and stride correct") {
    val m = Binary.mediaTable(spark, sf("sf0.001"))
    val frames = Binary.sampleFrames(m, frameBytes = 64, everyNth = 4)
    val nVideo = m.filter(col("meta.media_type") === "video/mp4").count()
    assert(frames.count() == nVideo)
    val r = frames.select("frames").head().getSeq[org.apache.spark.sql.Row](0)
    r.zipWithIndex.foreach { case (f, i) =>
      assert(f.getAs[Int]("index") == i * 4)
      assert(f.getAs[Long]("offset") == i.toLong * 4 * 64)
    }
  }

  test("winnowing fingerprints: shared long runs → shared fingerprints") {
    import graft.functions.TextAnalysis
    val common = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = Seq(
      (1L, s"intro words $common closing remarks"),
      (2L, s"totally different start $common and another ending"),
      (3L, "nothing shared here at all with anybody ever truly"))
      .toDF("doc_id", "text")
      .withColumn("_w", split(trim(lower(col("text"))), "\\s+"))
      .select(col("doc_id"),
        TextAnalysis.winnowFingerprints(col("_w")).as("fps"))
    val fps = df.as[(Long, Seq[Long])].collect().toMap
    assert((fps(1L).toSet & fps(2L).toSet).nonEmpty) // shared run found
    assert((fps(1L).toSet & fps(3L).toSet).isEmpty)
    assert(fps(1L).nonEmpty && fps(1L).toSet.size == fps(1L).size)
  }

  test("decodeFeatures: REAL image decode — actual pixel values round-trip (BMP + PNG)") {
    import java.awt.image.BufferedImage
    // 4x2 image, left half black, right half white — known raster
    def imgBytes(fmt: String): Array[Byte] = {
      val img = new BufferedImage(4, 2, BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 4; y <- 0 until 2)
        img.setRGB(x, y, if (x < 2) 0x000000 else 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val media = Seq(
      (1L, imgBytes("bmp"), "image/bmp"),
      (2L, imgBytes("png"), "image/png"),
      (3L, "definitely not an image payload".getBytes("UTF-8"), "image/jpeg"),
      (4L, imgBytes("png"), "audio/wav")) // wrong type → codec never tried
      .toDF("media_id", "payload", "media_type")
      .select(col("media_id"), col("payload"),
        struct(col("media_type").as("media_type"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          lit("").as("header_hex")).as("meta"))
    val out = Binary.decodeFeatures(media, partitions = 2)
      .orderBy("media_id")
      .select("media_id", "width", "height", "features", "real_decode")
      .as[(Long, Int, Int, Array[Float], Boolean)].collect()
    // both encodings decode to the SAME true raster: real dimensions,
    // and the luminance histogram reads the actual pixels — 4 of 8
    // black (bin 0) and 4 of 8 white (bin 7), exactly 0.5 each
    Seq(out(0), out(1)).foreach { case (id, w, h, feats, real) =>
      assert(real, s"media $id did not take the real decode path")
      assert((w, h) == (4, 2), s"media $id decoded wrong dimensions")
      assert(feats(0) == 0.5f && feats(7) == 0.5f,
        s"media $id histogram ${feats.toSeq} does not match the raster")
      assert((1 to 6).forall(feats(_) == 0f))
    }
    // an image-typed payload that is NOT a readable image falls back
    // to the declared stub — flagged, with the stub's derived shape
    val (_, w3, _, _, real3) = out(2)
    assert(!real3 && w3 == 16 + ("definitely not an image payload".length % 64))
    // a non-image media_type never reaches the codec, even if the
    // bytes would decode
    assert(!out(3)._5)
  }

  test("audioFeatures: REAL WAV decode — true format and RMS envelope from actual samples") {
    import javax.sound.sampled._
    // 800 frames of 8 kHz mono 16-bit PCM: first half silence, second
    // half a full-scale square wave — a signal whose RMS envelope is
    // known exactly (0 then ~1) so the features prove REAL sample
    // values round-tripped, not a derived fake
    val n = 800
    val pcm = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val s: Short =
        if (i < n / 2) 0
        else if (i % 2 == 0) 32767 else -32767
      pcm(i * 2) = (s & 0xff).toByte          // little-endian
      pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    val media = Seq(
      (1L, wav, "audio/wav"),
      (2L, "not audio at all".getBytes("UTF-8"), "audio/wav"), // fallback
      (3L, wav, "video/mp4")) // wrong modality → excluded entirely
      .toDF("media_id", "payload", "media_type")
      .select(col("media_id"), col("payload"),
        struct(col("media_type").as("media_type"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          lit("").as("header_hex")).as("meta"))
    val out = Binary.audioFeatures(media).orderBy("media_id")
      .as[(Long, Int, Int, Long, Array[Float], Boolean)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L), "video row must not reach audio decode")
    val (_, rate, ch, frames, feats, real) = out(0)
    assert(real && rate == 8000 && ch == 1 && frames == 800L)
    // silence segments: exactly zero; square-wave segments: RMS at
    // full scale (32767/32768)
    assert(feats.take(4).forall(_ == 0f), s"silence not silent: ${feats.toSeq}")
    assert(feats.drop(4).forall(f => f > 0.999f && f <= 1f),
      s"square wave RMS off: ${feats.toSeq}")
    assert(!out(1)._6, "undecodable audio payload must take the stub path")
  }

  test("m04: envelope fp is gain-invariant; pairs find the near-dup, " +
      "skip the stranger; fallback flagged") {
    import javax.sound.sampled._
    import graft.multimodal.Binary
    def wavOf(samples: Array[Short]): Array[Byte] = {
      val pcm = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        pcm(i * 2) = (s & 0xff).toByte
        pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong),
        AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val n = Binary.AudioFpSamples
    // a rising-envelope signal; its half-gain copy has every window
    // energy halved, so EVERY gradient comparison — and the fp — is
    // identical (the dHash brightness-invariance analog)
    val base = Array.tabulate(n)(i => (i * 37 % 251 + 4 * i).toShort)
    val halfGain = base.map(v => (v / 2).toShort)
    // alternating spikes give a different gradient pattern entirely
    val other = Array.tabulate(n)(i =>
      (if (i / 2 % 2 == 0) 30000 else 10) .toShort)
    val media = Seq(
      (1L, wavOf(base), "audio/wav"),
      (2L, wavOf(halfGain), "audio/wav"),
      (3L, wavOf(other), "audio/wav"),
      (4L, "not audio".getBytes("UTF-8"), "audio/wav"))
      .toDF("media_id", "payload", "media_type")
      .select(col("media_id"), col("payload"),
        struct(col("media_type").as("media_type"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          lit("").as("header_hex")).as("meta"))
    val fps = Binary.audioFingerprint(media)
      .transform(df => { df.cache(); df })
    try {
      val byId = fps.select("media_id", "fp", "real_decode")
        .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3)))
        .toMap
      assert(byId(1L)._2 && byId(2L)._2 && byId(3L)._2)
      assert(!byId(4L)._2, "garbage payload must flag the stub path")
      assert(byId(1L)._1 == byId(2L)._1, "gain change moved the fp")
      assert(byId(1L)._1 != byId(3L)._1)
      // the banded pair join surfaces exactly the planted near-dup
      val pairs = Binary.audioFpPairs(fps)
        .select("a", "b").as[(Long, Long)].collect().toSet
      assert(pairs.contains((1L, 2L)))
      assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    } finally fps.unpersist()
  }

  test("decodeImage: corrupt-but-recognized payloads fall back, never kill the task") {
    // a valid PNG header with a truncated body is the NORMAL failure
    // in a scraped corpus; the JDK codec throws unchecked exceptions
    // on it, which must mean "stub fallback", not a dead task
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val whole = bos.toByteArray
    // truncations at every depth: some may still partially decode
    // (that's codec-dependent and fine) — what must NEVER happen is an
    // escaped unchecked exception
    for (cut <- 8 to whole.length by 7) {
      val r = Binary.decodeImage(whole.take(cut)) // must not throw
      r.foreach { case (w, h, _) => assert(w == 8 && h == 8) }
    }
    // a header-only stub (recognized signature, no image data) is the
    // unchecked-exception shape in the JDK codec: must be None
    assert(Binary.decodeImage(whole.take(20)).isEmpty)
    // and through the distributed path the job survives either way
    val media = Seq((1L, whole.take(20), "image/png"))
      .toDF("media_id", "payload", "media_type")
      .select(col("media_id"), col("payload"),
        struct(col("media_type").as("media_type"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          lit("").as("header_hex")).as("meta"))
    val row = Binary.decodeFeatures(media).select("real_decode")
      .as[Boolean].collect()
    assert(row.toSeq == Seq(false))
  }

  test("decodeFeatures: distributed batch decode with repartitioning") {
    val m = Binary.mediaTable(spark, sf("sf0.001"))
    val decoded = Binary.decodeFeatures(m, partitions = 3)
    assert(decoded.rdd.getNumPartitions == 3)
    val rows = decoded.collect()
    assert(rows.length == m.count())
    // features are a fixed-dim vector derived from payload bytes
    val feats = decoded.select("features").as[Array[Float]].head()
    assert(feats.length == 8)
    // same payload → same features (deterministic stub), join back check
    val joined = decoded.join(m, "media_id")
      .select(col("media_id"), col("width"), octet_length(col("payload")).as("nb"))
      .as[(Long, Int, Int)].collect()
    joined.foreach { case (_, w, nb) => assert(w == 16 + (nb % 64)) }
  }

  // --- m05: GFV1 container parse + frame sampling + features ------

  /** A GFV1 container with caller-chosen frame bytes (frames laid out
    * in order, frame f = frames(f)). */
  private def gfv(frames: Seq[Array[Byte]]): Array[Byte] = {
    val fb = frames.head.length
    val out = java.nio.ByteBuffer.allocate(8 + frames.size * fb)
    out.put("GFV1".getBytes("US-ASCII"))
      .putShort(fb.toShort).putShort(frames.size.toShort)
    frames.foreach(out.put)
    out.array()
  }

  private def videoMedia(rows: Seq[(Long, Array[Byte])]) =
    rows.toDF("media_id", "payload")
      .select(col("media_id"), col("payload"),
        struct(lit("video/mp4").as("media_type"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          lit("").as("header_hex")).as("meta"))

  test("m05: GFV1 parse, every-Nth sampling, exact energy + gradient fp") {
    // 4 frames of 4 bytes: hand-computable energies and gradients
    val frames = Seq(
      Array[Byte](0, 10, 5, 5),                    // e=20, fp: b0 (10>0)
      Array[Byte](100, 100, 100, 100),             // e=400, fp=0
      Array[Byte](1, 2, 3, 4),                     // e=10, fp: b0|b1|b2 = 7
      Array[Byte](-1, -1, 0, 0))                   // 255s: e=510, fp=0
    val got = Binary.videoFrameFeatures(
        videoMedia(Seq((7L, gfv(frames)))), everyNth = 2)
      .orderBy("frame_index")
      .select("frame_index", "offset_bytes", "n_bytes", "energy", "fp", "parsed")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSeq
    // every 2nd frame from 0: indices 0 and 2; frames 1 and 3 skipped
    assert(got == Seq(
      (0L, 0L, 4L, 20L, 1L, true),
      (2L, 8L, 4L, 10L, 7L, true)))
  }

  test("m05: non-GFV1 payload takes the stub fallback, flagged; " +
      "non-video rows never reach the parser") {
    val junk = Array.tabulate[Byte](40)(i => i.toByte) // no magic
    val rows = Binary.videoFrameFeatures(videoMedia(Seq((1L, junk))))
      .select("parsed").as[Boolean].collect()
    assert(rows.nonEmpty && rows.forall(_ == false))
    // truncated container (magic ok, body short) is a decode failure
    val trunc = Binary.syntheticVideo(3L).dropRight(1)
    assert(Binary.parseVideo(trunc).isEmpty)
    // an audio-typed row with a valid GFV1 payload is filtered out
    val audio = videoMedia(Seq((2L, Binary.syntheticVideo(2L))))
      .withColumn("meta", struct(lit("audio/wav").as("media_type"),
        col("meta.n_bytes").as("n_bytes"), col("meta.header_hex").as("header_hex")))
    assert(Binary.videoFrameFeatures(audio).isEmpty)
  }

  test("m05: frames wider than 64 bytes truncate the fingerprint at bit " +
      "62 instead of wrapping high-byte gradients onto low bits") {
    // two 80-byte frames identical in bytes 0..63, differing only in
    // the tail: a wrapped `1L << j` would alias the tail's gradients
    // onto bits 0.. and diverge the fps; truncation keeps them equal
    val base = Array.tabulate[Byte](80)(i => ((i * 13) % 251).toByte)
    val tailDiff = base.clone(); (64 until 80).foreach(i => tailDiff(i) = (255 - (i % 7)).toByte)
    val byId = Binary.videoFrameFeatures(videoMedia(Seq(
        (1L, gfv(Seq(base))), (2L, gfv(Seq(tailDiff))))), everyNth = 1)
      .select("media_id", "fp", "energy").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byId(1L)._1 == byId(2L)._1, "tail gradients leaked into the fp")
    assert(byId(1L)._2 != byId(2L)._2) // energy still sees the tail
    // and no bit at or above 63 is ever set
    assert((byId(1L)._1 & (1L << 63)) == 0L)
  }

  test("m05: identical frames fingerprint identically — the scene-dedup " +
      "band join finds the repeated frame across videos") {
    val shared = Array.tabulate[Byte](16)(i => (i * 7 % 251).toByte)
    val noiseA = Array.tabulate[Byte](16)(i => (200 - i).toByte)
    val noiseB = Array.tabulate[Byte](16)(i => (i * i % 13).toByte)
    val fps = Binary.videoFrameFeatures(videoMedia(Seq(
        (1L, gfv(Seq(shared, noiseA, noiseA, noiseA))),
        (2L, gfv(Seq(noiseB, noiseB, shared, noiseB))))), everyNth = 2)
      .select(concat(col("media_id"), lit(":"), col("frame_index")).as("media_id"),
        col("fp").as("dhash"))
    val pairs = Binary.dhashPairs(fps, maxHamming = 0)
      .as[(String, String, Long)].collect().toSeq
    assert(pairs == Seq(("1:0", "2:2", 0L)))
  }
}
