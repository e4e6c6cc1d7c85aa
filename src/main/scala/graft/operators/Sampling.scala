package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** c14: deterministic stratified sampling — the eval-set / inspection-
  * sample constructor every corpus release needs (a data card quotes
  * per-(source, lang) samples; a manual quality audit reads a fixed
  * per-stratum panel; a held-out calibration set must be reproducible
  * months later). Per stratum, take the first `n` documents ordered by
  * a salted 60-bit md5 hash of the doc id (doc_id tiebreak so the
  * order is total even under hash collisions) — the c02 determinism
  * principle applied to per-stratum selection: re-runs, re-partitioned
  * inputs and engine swaps all pick the SAME sample, and a different
  * salt yields an independent re-draw. Never `rand()`, never
  * `TABLESAMPLE` (both reshuffle the sample between runs), never "take
  * the first n in file order" (file order is crawl order — heavily
  * biased).
  *
  * Scale: one window shuffle keyed by the stratum. The rank-filter on
  * `row_number() <= n` is recognized by Catalyst's WindowGroupLimit
  * rule (Spark 3.5+), which pushes a per-partition top-n BELOW the
  * exchange — each map task forwards at most n rows per stratum it
  * sees, so the shuffle carries O(strata × n × tasks) rows, not the
  * corpus (SamplingSpec plan-asserts the node). Stratum skew therefore
  * never concentrates corpus-scale data on one reducer.
  *
  * Reference anchor: the reference audits listings by sampling recent
  * items per category for manual review (poller cycle +
  * kibana/export.ndjson saved searches); this is that audit sample
  * made deterministic.
  */
object Sampling {

  /** Per-stratum sample size — binding on the larger (source, lang)
    * strata at every SF (en strata run 6-16 docs at sf0.01) while
    * small strata pass through whole, so both branches are exercised
    * under the oracle. */
  val SampleN = 8

  /** Default draw salt; vary for an independent re-draw. */
  val SampleSalt = "audit0"

  /** Deterministic per-(source, lang) sample of any
    * (doc_id, source, lang, ...) frame: (doc_id, source, lang,
    * sample_rank) with sample_rank in 1..n. */
  def stratifiedSample(docs: DataFrame, n: Int = SampleN,
      salt: String = SampleSalt): DataFrame = {
    require(n > 0)
    val s = docs.sparkSession
    val h = graft.plans.GraftFunctions.md5Prefix60(s,
      concat_ws(":", lit(salt), col("doc_id")))
    docs.select(col("doc_id"), col("source"), col("lang"), h.as("skey"))
      .withColumn("sample_rank", row_number().over(
        Window.partitionBy(col("source"), col("lang"))
          .orderBy(col("skey"), col("doc_id"))).cast("long"))
      .filter(col("sample_rank") <= n)
      .select(col("doc_id"), col("source"), col("lang"), col("sample_rank"))
  }

  def c14(s: SparkSession, dir: String): DataFrame =
    stratifiedSample(Tables.documents(s, dir))

  /** The oracle replays the salted 60-bit md5 prefix exactly as c02/c09
    * do (hex-prefix → BIGINT), then the same rank-filter. */
  val c14Sql: String =
    s"""WITH h AS (
         SELECT doc_id, source, lang,
                CAST(('0x' || substring(md5('$SampleSalt:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS skey
         FROM documents)
       SELECT doc_id, source, lang,
              CAST(row_number() OVER (PARTITION BY source, lang
                                      ORDER BY skey, doc_id) AS BIGINT) AS sample_rank
       FROM h
       QUALIFY sample_rank <= $SampleN"""

  // ---------------------------------------------------------------
  // c24: deterministic weighted (Bernoulli) sampling — the consumer
  // that REALIZES d14's soft-dedup weights: keep each doc with
  // probability = its weight, via the same salted-hash coin the
  // whole assembly stack flips (u = salted 60-bit md5 of the doc id
  // scaled to [0, 1), keep iff u < weight — never rand(), so
  // re-runs, re-partitionings and engine swaps keep the SAME rows,
  // and a different salt is an independent re-draw). Composed with
  // d14, every near-dup cluster keeps ONE copy in expectation
  // (csize docs × 1/csize each) but WHICH copy — and occasionally
  // zero or two — varies by hash, which is exactly the soft
  // posture's point: across the corpus the duplication mass is
  // flattened without the hard-dedup bet on min-id being the best
  // copy. The face is the full composition (exhaustive pairs → CC →
  // weights → coin) so the DuckDB replay covers the pipeline a
  // release would actually run; production passes capped/prefix
  // pairs upstream. Scale: d14's shapes + one codegen'd filter.
  //
  // Parity note: u is h/2^60 with h a 60-bit BIGINT — the cast to
  // double rounds identically in both engines (round-to-nearest of
  // the same integer), the division by 2^60 is exact (power of
  // two), and the compared weight is d14's ALREADY-ROUNDED 6-digit
  // value, so the boundary is the same double in both engines.
  // ---------------------------------------------------------------

  /** Coin salt for the weighted draw (independent of c14's). */
  val SoftSampleSalt = "soft0"

  /** Keep each doc with probability `weight`: the kept ledger
    * (doc_id, component, csize, weight) of docs whose salted-hash
    * uniform lands under their weight. `weights` is any
    * (doc_id, weight ∈ [0, 1], ...) frame — d14's output slots in. */
  def weightedSample(weights: DataFrame,
      salt: String = SoftSampleSalt): DataFrame = {
    val s = weights.sparkSession
    val u = graft.plans.GraftFunctions.md5Prefix60(s,
        concat_ws(":", lit(salt), col("doc_id")))
      .cast("double") / lit(1152921504606846976.0) // 2^60, exact
    weights.filter(u < col("weight"))
  }

  def c24(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    weightedSample(
      // routed pair stage — plain on the oracle corpora (d06's note)
      Dedup.softDedupWeights(docs, Dedup.autoPairs(docs))
        .select(col("doc_id"), col("component"), col("csize"), col("weight")))
  }

  /** The oracle wraps d14's SQL with the same salted coin. */
  val c24Sql: String =
    s"""SELECT doc_id, component, csize, weight
       FROM (${Dedup.d14Sql}) w
       WHERE CAST(CAST(('0x' || substring(md5('$SoftSampleSalt:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS DOUBLE)
               / 1152921504606846976.0 < weight"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c14_stratified_sample" -> (c14 _),
    "c24_soft_sample" -> (c24 _))

  val oracles: Map[String, String] = Map(
    "c14_stratified_sample" -> c14Sql,
    "c24_soft_sample" -> c24Sql)
}
