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
}
