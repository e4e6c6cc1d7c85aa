package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** fp01/fp02: the end-to-end fraud-pipeline COMPOSITION — the
  * `run_pipeline.sh` analog (reference run_pipeline.sh:1-20 chains
  * poller → regex analyzer → bulk ingest → stats generation → risk
  * scoring → ElastAlert), the c10 composition pattern applied to the
  * fraud family. Every stage already exists and is individually
  * checked (f11 extraction, f13 stats generation, f12 scoring, f05
  * alert rule, f10 factors); what a user adopting the library for the
  * reference's actual use case writes FIRST is the one-plan chain —
  * so the chain itself is a face.
  *
  * Two faces, split exactly where oracle-expressibility splits:
  *
  *  - fp01_fraud_pipeline (rows-only by design, like its f11/f12
  *    stages): NDJSON ingest → full-fidelity extraction (Java-regex
  *    lookaheads) → market-stats generation → scoring with
  *    hidden-price correction → the alert filter. Composition ==
  *    staged-stages is spec-pinned row-for-row (FraudPipelineSpec).
  *  - fp02_pipeline_core (oracle-checked): the f01 → f03 → f04 → f05
  *    subchain composed as ONE plan — the f05 alert set enriched with
  *    the analyzer's segment stats (f01) and the z-score view (f03),
  *    replayed in DuckDB as composed CTEs, bit-exact at both SFs.
  *
  * Composition hazard note: fp01's output carries columns computed
  * from the full extraction/scoring tree — a consumer stacking a
  * generator or a computed-column filter directly on it re-inlines
  * that tree per reference (SURVEY §5's pushdown-hazard bullet; an
  * explode(split(risk_factors)) measured 199 MB task binaries).
  * Downstream composition should land on a materialized boundary
  * (write, cache register, or collected rows for driver-side marts).
  *
  * Scale posture: the chain inherits each stage's own discipline —
  * the corpus is read ONCE into a cached slim frame consumed by both
  * the stats and the scoring passes; stats rows are model metadata
  * (bounded by categories × conditions × components), so feeding them
  * back via the driver is the broadcast-a-model shape, not a
  * collect-the-data anti-pattern; the alert filter lands on the
  * scored frame before any ordering.
  */
object FraudPipeline {

  /** f05's rule threshold (elastalert high_risk.yaml). */
  val AlertThreshold = 30

  /** The pipeline corpus: the f12 listing synthesis plus a planted
    * symbolic-price stratum (price 1.0, real price in the text) so
    * the scorePipeline hidden-price correction stage is LIVE in the
    * composition, not dead code. */
  def corpus(s: SparkSession, dir: String): DataFrame =
    RiskEngine.f12Items(s, dir)
      .withColumn("price",
        when(col("item_id") % 97 === 0, lit(1.0))
          .otherwise(col("price").cast("double")))
      .withColumn("description",
        when(col("item_id") % 97 === 0,
          concat(lit("vendo por 450 euros urgente "), col("description")))
          .otherwise(col("description")))

  /** The chain from an already-landed NDJSON corpus dir: schema'd
    * ingest → stats generation → scoring (with hidden-price
    * correction) → alert filter. One cached slim corpus frame feeds
    * both passes. */
  def pipelineFrom(s: SparkSession, ndjsonDir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val items = graft.sources.Ingest.readNdjson(s, ndjsonDir, schema)
      .transform(graft.CacheRegistry.register)
    val statsRows = RiskEngine.generateMarketStats(items)
    val scored = RiskEngine.scorePipeline(items, statsRows)
    scored
      .filter(col("risk_score") >= AlertThreshold)
      .select(col("item_id"), col("price"), col("detected_category"),
        col("detected_condition"), col("composite_z"),
        col("estimated_value"), col("risk_score"),
        array_join(array_sort(col("risk_factors")), "|").as("risk_factors"),
        col("corrected"))
  }

  /** fp01 face: land the corpus as NDJSON (the bulk_ingest stage),
    * then run the chain. */
  def fp01(s: SparkSession, dir: String): DataFrame = {
    val root = graft.PidScratch.fresh(s, "graft-fraudpipe", "ndjson")
    val c = corpus(s, dir)
    graft.sources.Ingest.writeNdjson(c, root)
    pipelineFrom(s, root, c.schema)
  }

  /** fp02 face: the oracle-expressible subchain composed as one plan
    * — f05's alert set (itself f04's scored frame under the rule
    * filter) LEFT-joined with f03's z-score view and f01's segment
    * stats. Left joins preserve the alert set exactly: f03 drops
    * zero-variance segments, f01 drops support-1 segments, and an
    * alert in such a segment must still alert. */
  def fp02(s: SparkSession, dir: String): DataFrame = {
    val alerts = Fraud.f05(s, dir)
    val z = Fraud.f03(s, dir)
      .select(col("p_partkey"), col("z_score"), col("is_cheap"))
    val seg = Fraud.f01(s, dir)
      .select(col("category"), col("cond"), col("median_price"))
    val keys = Tables.part(s, dir)
      .select(col("p_partkey"), col("p_brand"), col("p_type"))
    alerts
      .join(z, Seq("p_partkey"), "left")
      .join(keys, "p_partkey")
      .join(broadcast(seg),
        col("p_brand") === col("category") && col("p_type") === col("cond"),
        "left")
      .select(col("p_partkey"), col("price"), col("composite_z"),
        col("estimated_value"), col("risk_score"), col("z_score"),
        col("is_cheap"), col("median_price"))
  }

  val fp02Sql: String =
    s"""${Fraud.f04Ctes},
       alerts AS (SELECT p_partkey, price, composite_z, estimated_value, risk_score
                  FROM scored WHERE risk_score >= $AlertThreshold
                  ORDER BY risk_score DESC, p_partkey LIMIT 100),
       seg AS (${Fraud.f01Sql}),
       zz AS (${Fraud.f03Sql})
       SELECT a.p_partkey, a.price, a.composite_z, a.estimated_value,
              a.risk_score, zz.z_score, zz.is_cheap, seg.median_price
       FROM alerts a
       LEFT JOIN zz ON a.p_partkey = zz.p_partkey
       JOIN part p ON a.p_partkey = p.p_partkey
       LEFT JOIN seg ON p.p_brand = seg.category AND p.p_type = seg.cond"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fp01_fraud_pipeline" -> (fp01 _),
    "fp02_pipeline_core" -> (fp02 _))

  val oracles: Map[String, String] = Map(
    "fp02_pipeline_core" -> fp02Sql)
}
