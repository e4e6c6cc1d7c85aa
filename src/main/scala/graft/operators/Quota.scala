package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** c16: per-source document quota — the CC-style per-domain cap every
  * web-scale corpus applies before mixing (no single domain may
  * contribute more than K documents). Selection is deterministic and
  * content-independent: the K smallest salted-hash values per source
  * survive (the c02 principle applied to capping — reproducible
  * across runs, partitionings and cluster sizes, and unbiased w.r.t.
  * document content).
  *
  * Scale: the naive formulation — row_number() per source, keep
  * rank ≤ K — sorts EVERY document of a domain on one task, and the
  * 100 TB corpus has domains with 10^9 docs. This implementation is
  * the exact two-phase selection instead: bucket the 60-bit hash by
  * its top 10 bits, count per (source, bucket) — a combiner-friendly
  * aggregate whose result is sources × ≤1024 rows — prefix-sum to
  * find each source's cutoff bucket, then sort ONLY the cutoff
  * bucket's rows (~1/1024 of a big source) for the borderline ranks.
  * Everything below the cutoff bucket is kept without sorting;
  * sources under quota skip selection entirely. Equal hashes share a
  * bucket, so the doc_id tiebreak never crosses the bucket boundary —
  * the result is bit-identical to the naive global sort, which is
  * exactly what the DuckDB oracle replays.
  */
object Quota {

  val DefaultQuota = 10
  /** Hash-bucket granularity: top 10 of the 60 hash bits. */
  val BucketShift = 50

  /** Survivors (doc_id, source) of the per-source K-smallest-hash
    * selection over any (doc_id, source) frame. */
  def sourceQuota(docs: DataFrame, quota: Int = DefaultQuota): DataFrame = {
    val s = docs.sparkSession
    val hashed = docs.select(col("doc_id"), col("source"),
        graft.plans.GraftFunctions.md5Prefix60(s, col("doc_id").cast("string"))
          .as("h"))
      .withColumn("bucket", shiftright(col("h"), BucketShift))
      .transform(graft.CacheRegistry.register)
    val counts = hashed.groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val cum = counts.withColumn("cum",
      sum(col("cnt")).over(
        Window.partitionBy(col("source")).orderBy(col("bucket"))))
    // first bucket where the running count reaches the quota; absent
    // (source under quota) → keep everything, no selection needed
    val cut = cum.filter(col("cum") >= quota)
      .groupBy(col("source")).agg(min(col("bucket")).as("cut_bucket"))
    val before = cum.join(cut, "source")
      .filter(col("bucket") < col("cut_bucket"))
      .groupBy(col("source")).agg(max(col("cum")).as("cum_before"))
    val limits = cut.join(before, Seq("source"), "left")
      .select(col("source"), col("cut_bucket"),
        (lit(quota.toLong) - coalesce(col("cum_before"), lit(0L)))
          .as("needed"))
    val withLim = hashed.join(broadcast(limits), Seq("source"), "left")
    val fullKeep = withLim
      .filter(col("cut_bucket").isNull || col("bucket") < col("cut_bucket"))
      .select(col("doc_id"), col("source"))
    val border = withLim.filter(col("bucket") === col("cut_bucket"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))))
      .filter(col("rk") <= col("needed"))
      .select(col("doc_id"), col("source"))
    fullKeep.union(border)
  }

  def c16(s: SparkSession, dir: String): DataFrame =
    sourceQuota(Tables.documents(s, dir))

  /** The oracle IS the naive global sort — "two-phase selection
    * changes nothing" is therefore driver-checked, not just a spec
    * claim (the d12 precedent). */
  val c16Sql: String =
    s"""WITH h AS (SELECT doc_id, source,
                 CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
               FROM documents),
       r AS (SELECT doc_id, source,
               row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
             FROM h)
       SELECT doc_id, source FROM r WHERE rk <= $DefaultQuota"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c16_source_quota" -> (c16 _))

  val oracles: Map[String, String] = Map(
    "c16_source_quota" -> c16Sql)
}
