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
