package graft

import graft.multimodal.Binary
import java.awt.image.BufferedImage
import org.apache.spark.sql.functions._

/** m02 perceptual-hash semantics on real rasters (the oracle pins the
  * synthetic-BMP decode; these pin the HASH's perceptual properties
  * and the banded pair join). */
class DhashSpec extends SparkSpec {
  import spark.implicits._

  /** smooth horizontal+vertical gradient image, values kept well off
    * 0/255 so brightness shifts never clamp. */
  private def gradient(w: Int, h: Int, shift: Int = 0): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = 40 + (x * 120 / w + y * 60 / h + shift)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    img
  }

  private def noise(w: Int, h: Int, seed: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rnd = new scala.util.Random(seed)
    for (y <- 0 until h; x <- 0 until w) {
      val g = rnd.nextInt(256)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    img
  }

  private def bmpBytes(img: BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    bos.toByteArray
  }

  test("dHash is invariant to uniform brightness shift and 2x upscale") {
    val base = Binary.dHash64(gradient(18, 16))
    assert(Binary.dHash64(gradient(18, 16, shift = 25)) == base)
    assert(Binary.dHash64(gradient(36, 32)) == base)
  }

  test("unrelated noise images land far apart") {
    val a = Binary.dHash64(noise(18, 16, seed = 1))
    val b = Binary.dHash64(noise(18, 16, seed = 2))
    assert(java.lang.Long.bitCount(a ^ b) > 7)
  }

  test("syntheticBmp decodes to the exact md5Gray raster") {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Binary.syntheticBmp(42L)))
    assert(img.getWidth == Binary.DhashW && img.getHeight == Binary.DhashH)
    for (y <- 0 until Binary.DhashH; x <- 0 until Binary.DhashW) {
      val g = Binary.md5Gray(42L, x, y)
      assert((img.getRGB(x, y) & 0xff) == g, s"pixel ($x,$y)")
    }
  }

  test("m03: synthetic WAV decodes to the exact md5Sample PCM; energies sum") {
    val id = 7L
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(Binary.syntheticWav(id)))
    val fmt = ais.getFormat
    assert(fmt.getSampleRate.toInt == Binary.WavRate)
    assert(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1)
    val raw = ais.readAllBytes()
    assert(raw.length == Binary.WavSamples * 2)
    (0 until Binary.WavSamples).foreach { i =>
      val v = (((raw(i * 2 + 1) & 0xff) << 8) | (raw(i * 2) & 0xff)).toShort.toInt
      assert(v == Binary.md5Sample(id, i), s"sample $i")
    }
  }

  test("m03 energy separates silence from loud segments") {
    // hand-built WAV: 32 zero samples then 32 full-scale samples
    val n = 64
    val out = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    out.put("data".getBytes("US-ASCII")).putInt(n * 2)
    (0 until n).foreach(i => out.putShort(if (i < 32) 0 else 30000))
    val media = Seq((1L, out.array()))
      .toDF("media_id", "payload")
      .select(col("media_id"), col("payload"),
        struct(lit("audio/wav").as("media_type"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          lit("").as("header_hex")).as("meta"))
    val r = Binary.audioEnergy(media).collect().head
    assert(r.getAs[Boolean]("real_decode"))
    (0 to 3).foreach(k => assert(r.getAs[Long](s"e$k") == 0L, s"e$k"))
    (4 to 7).foreach(k => assert(r.getAs[Long](s"e$k") == 8L * 30000, s"e$k"))
  }

  test("dhashPairs finds exactly the planted near-dup via the band join") {
    val rows = Seq(
      (1L, bmpBytes(gradient(18, 16))),
      (2L, bmpBytes(gradient(18, 16, shift = 25))), // near-dup of 1
      (3L, bmpBytes(noise(18, 16, seed = 7))),
      (4L, bmpBytes(noise(18, 16, seed = 8))))
    val media = rows.toDF("media_id", "payload")
      .select(col("media_id"), col("payload"),
        struct(lit("image/bmp").as("media_type"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          lit("").as("header_hex")).as("meta"))
    val hashed = Binary.imageDHash(media)
    assert(hashed.filter(col("real_decode")).count() == 4)
    val pairs = Binary.dhashPairs(hashed)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }
}
