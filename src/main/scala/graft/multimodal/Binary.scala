package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal plumbing (SURVEY.md §2 rows 37–38): media payloads are
  * opaque `binary` columns with a typed metadata struct riding along.
  * The decode step is a clearly-marked deterministic stub (no image /
  * audio codecs in this environment); the Spark-side contract —
  * schema, batched per-partition processing, partitioning — is real.
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
      width: Int, height: Int, features: Array[Float])

  /** STUB decode: a real deployment plugs a codec (JPEG decode, PCM
    * frame-sample, …) into this function; here it derives a
    * deterministic fake (dimensions from byte length, features from a
    * rolling byte hash) so the pipeline around it is fully testable.
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

  /** Distributed decode: mapPartitions over typed rows — executor-side
    * only, one pass, no collect. Repartitions by media_id so payload
    * bytes spread evenly regardless of input file layout. */
  def decodeFeatures(media: DataFrame, partitions: Int = 0): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    val typed = media.select(col("media_id"), col("payload"),
        col("meta.media_type").as("media_type")).as[MediaRow]
    val sized = if (partitions > 0) typed.repartition(partitions, col("media_id")) else typed
    sized.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, f) = stubDecode(r.payload)
        DecodedRow(r.media_id, r.media_type, w, h, f)
      }
    }.toDF()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_binary_meta" -> (m01 _))

  val oracles: Map[String, String] = Map(
    "m01_binary_meta" -> m01Sql)
}
