package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Numeric bucketing aggregations — the Spark face of the dashboard's
  * range / histogram panels (reference:
  * kibana/dashboard_export.ndjson, dashboard "Wallapop Laptops":
  * "Items by Price" lnsXY range agg, "Risk Score Distribution" lnsPie
  * range agg, "Heatmap (Risk vs Price)" lnsHeatmap with
  * count()/overall_sum(count()) cells).
  *
  * Semantics follow the Elasticsearch range aggregation exactly:
  * buckets are half-open [from, to), a null `from`/`to` means
  * -inf/+inf, and values matching no bucket are dropped (so a
  * risk_score of exactly 100 falls outside a [90, 100) top bucket,
  * as it does on the real dashboard).
  *
  * Scale shape: every operator here is a codegen'd when-chain (or
  * floor arithmetic) followed by ONE partial-aggregated groupBy on a
  * bounded key space (the bucket labels) — the cheapest possible
  * distributed aggregation; no shuffle carries more than
  * #buckets × #map-tasks rows. The heatmap share divides by a windowed
  * total over the aggregated cells (≤ |x-buckets|×|y-buckets| rows),
  * not over the input.
  */
object Histogram {

  /** One range bucket: [from, to) with a display label. */
  case class RangeBucket(from: Option[Double], to: Option[Double], label: String)

  def bucket(from: Double, to: Double, label: String): RangeBucket =
    RangeBucket(Some(from), Some(to), label)
  def bucketFrom(from: Double, label: String): RangeBucket =
    RangeBucket(Some(from), None, label)

  /** Label for the FIRST matching bucket of an ordered, non-overlapping
    * range list; null when no bucket matches (ES drops those docs).
    * One flat CASE WHEN — first match wins, no join, no UDF. (A
    * nested-coalesce fold has the same semantics but builds a tree
    * ~2× deeper per bucket, which pushed the 18-bucket price list out
    * of comfortable codegen size.) */
  def rangeLabel(value: Column, ranges: Seq[RangeBucket]): Column = {
    require(ranges.nonEmpty, "at least one range")
    def cond(r: RangeBucket): Column = {
      val lo = r.from.map(f => value >= f).getOrElse(lit(true))
      val hi = r.to.map(t => value < t).getOrElse(lit(true))
      lo && hi
    }
    ranges.tail.foldLeft(when(cond(ranges.head), ranges.head.label)) {
      (acc, r) => acc.when(cond(r), r.label)
    }
  }

  /** Range-agg bucket counts: (bucket, n), non-matching values
    * dropped. The null-bucket drop is written AFTER the aggregation —
    * same result either way (the null group aggregates, then drops).
    * NOTE this ordering alone is NOT pushdown protection: Catalyst
    * pushes predicates on grouping aliases back below the Aggregate
    * with the same unguarded alias substitution, so when `value` is a
    * heavy computed expression the caller MUST ALSO put a cache
    * boundary under it (f19/f20 consume Fraud.f04Cached — the
    * InMemoryRelation leaf is what stops the scoring tree from
    * re-inlining into a Filter; PlanSpec pins it). Post-agg placement
    * still helps: where the filter does get pushed, its condition is
    * a cheap CASE over the cached attribute, and where it can't be,
    * it runs over ≤ #buckets+1 aggregated rows. */
  def rangeCounts(df: DataFrame, value: Column,
      ranges: Seq[RangeBucket]): DataFrame =
    df.select(rangeLabel(value, ranges).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .filter(col("bucket").isNotNull)

  /** Fixed-width histogram bucket start (the ES histogram agg:
    * floor(value/width)*width), as a double. */
  def fixedWidthStart(value: Column, width: Double): Column =
    floor(value / width) * width

  /** Fixed-width histogram counts: (bucket_start, n). Null drop
    * post-agg, same rationale as [[rangeCounts]]. */
  def fixedWidthCounts(df: DataFrame, value: Column, width: Double): DataFrame =
    df.select(fixedWidthStart(value, width).as("bucket_start"))
      .groupBy(col("bucket_start")).agg(count(lit(1)).as("n"))
      .filter(col("bucket_start").isNotNull)

  /** 2-D cell counts plus each cell's share of the grand total —
    * the lnsHeatmap count()/overall_sum(count()) metric. The window
    * total runs over the AGGREGATED cells (bounded by the bucket
    * cross product), so the single-partition window is a driver-safe
    * constant cost at any input scale. */
  def heatmapShare(df: DataFrame, xLabel: Column, yLabel: Column): DataFrame = {
    // null drop post-agg, same rationale as rangeCounts — and the
    // share total must exclude the dropped cells, so the window runs
    // after the filter (ES computes overall_sum over visible buckets)
    val cells = df.select(xLabel.as("x_bucket"), yLabel.as("y_bucket"))
      .groupBy(col("x_bucket"), col("y_bucket")).agg(count(lit(1)).as("n"))
      .filter(col("x_bucket").isNotNull && col("y_bucket").isNotNull)
    cells.withColumn("share",
      col("n").cast("double") / sum(col("n")).over(Window.partitionBy()))
  }

  // =================================================================
  // Driver query faces — the three dashboard panels, bucket lists
  // copied from the reference's Lens state
  // (kibana/dashboard_export.ndjson).
  // =================================================================

  /** "Items by Price" ranges (price.amount). */
  val PriceRanges: Seq[RangeBucket] = Seq(
    bucket(0, 25, "0-25€"), bucket(25, 50, "25-50€"),
    bucket(50, 100, "50-100€"), bucket(100, 200, "100-200€"),
    bucket(200, 300, "200-300€"), bucket(300, 400, "300-400€"),
    bucket(400, 500, "400-500€"), bucket(500, 600, "500-600€"),
    bucket(600, 700, "600-700€"), bucket(700, 800, "700-800€"),
    bucket(800, 900, "800-900€"), bucket(900, 1000, "900-1000€"),
    bucket(1000, 1200, "1-1.2k€"), bucket(1200, 1400, "1.2-1.4k€"),
    bucket(1400, 1600, "1.4-1.6k€"), bucket(1600, 2000, "1.6-2k€"),
    bucket(2000, 2600, "2-2.6k€"), bucketFrom(2600, ">2.6k€"))

  /** Heatmap price axis (coarser list, open-ended top). */
  val HeatmapPriceRanges: Seq[RangeBucket] = Seq(
    bucket(0, 10, "0-10€"), bucket(10, 50, "10-50€"),
    bucket(50, 100, "50-100€"), bucket(100, 200, "100-200€"),
    bucket(200, 300, "200-300€"), bucket(300, 400, "300-400€"),
    bucket(400, 500, "400-500€"), bucket(500, 600, "500-600€"),
    bucket(600, 700, "600-700€"), bucket(700, 900, "700-900€"),
    bucket(900, 1100, "900-1.1k€"), bucket(1100, 1500, "1.1-1.5k€"),
    bucket(1500, 2000, "1.5-2k"), bucketFrom(2000, ">2k"))

  /** "Risk Score Distribution" pie ranges. */
  val RiskPieRanges: Seq[RangeBucket] = Seq(
    bucket(0, 20, "0-20"), bucket(20, 40, "20-40"),
    bucket(40, 70, "40-70"), bucket(70, 100, "70-100"))

  /** The heatmap's risk axis is uniform width-10 over [0, 100) — the
    * fixed-width histogram, labeled "start-end" exactly as the
    * dashboard's range list spells it. */
  def riskDecadeLabel(risk: Column): Column = {
    val start = fixedWidthStart(risk, 10.0).cast("int")
    when(risk >= 0 && risk < 100,
      concat(start.cast("string"), lit("-"), (start + 10).cast("string")))
  }

  /** f18: "Items by Price" — the range agg over listing prices.
    * p_retailprice spans only [900, 1000) at test scale, so the
    * listing price is widened deterministically (f13b's synthesis
    * convention, mirrored in the oracle SQL) to populate the whole
    * bucket list including the open-ended top and the no-match drop
    * (price 0 lands in "0-25€"). */
  def f18(s: SparkSession, dir: String): DataFrame =
    rangeCounts(graft.Tables.part(s, dir),
      col("p_retailprice") * (col("p_partkey") % 6), PriceRanges)

  private def rangeCaseSql(valueExpr: String, ranges: Seq[RangeBucket]): String =
    ranges.map { r =>
      val lo = r.from.map(f => s"$valueExpr >= $f").getOrElse("TRUE")
      val hi = r.to.map(t => s"$valueExpr < $t").getOrElse("TRUE")
      s"WHEN $lo AND $hi THEN '${r.label}'"
    }.mkString("CASE ", " ", " END")

  val f18Sql: String =
    s"""WITH p AS (SELECT p_retailprice * (p_partkey % 6) AS lp FROM part),
       b AS (SELECT ${rangeCaseSql("lp", PriceRanges)} AS bucket FROM p)
       SELECT bucket, count(*) AS n FROM b WHERE bucket IS NOT NULL GROUP BY 1"""

  /** f19: "Heatmap (Risk vs Price)" — 2-D range×fixed-width cells over
    * the scored corpus with each cell's share of the total. Consumes
    * the CACHED scored frame (Fraud.f04Cached): the cache leaf is what
    * keeps the bucket labels' null checks from re-inlining the whole
    * scoring tree into a Filter (r7's 12 s blowup). */
  def f19(s: SparkSession, dir: String): DataFrame =
    heatmapShare(Fraud.f04Cached(s, dir),
      rangeLabel(col("price"), HeatmapPriceRanges),
      riskDecadeLabel(col("risk_score")))

  val f19Sql: String =
    s"""${Fraud.f04Ctes},
       b AS (SELECT ${rangeCaseSql("price", HeatmapPriceRanges)} AS x_bucket,
               CASE WHEN risk_score >= 0 AND risk_score < 100
                    THEN CAST((risk_score // 10) * 10 AS VARCHAR) || '-' ||
                         CAST((risk_score // 10) * 10 + 10 AS VARCHAR) END AS y_bucket
             FROM scored),
       c AS (SELECT x_bucket, y_bucket, count(*) AS n FROM b
             WHERE x_bucket IS NOT NULL AND y_bucket IS NOT NULL GROUP BY 1, 2)
       SELECT x_bucket, y_bucket, n,
              CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE) AS share
       FROM c"""

  /** f20: "Risk Score Distribution" — the pie's range agg, over the
    * cached scored frame (same rationale as f19). */
  def f20(s: SparkSession, dir: String): DataFrame =
    rangeCounts(Fraud.f04Cached(s, dir), col("risk_score"), RiskPieRanges)

  val f20Sql: String =
    s"""${Fraud.f04Ctes},
       b AS (SELECT ${rangeCaseSql("risk_score", RiskPieRanges)} AS bucket FROM scored)
       SELECT bucket, count(*) AS n FROM b WHERE bucket IS NOT NULL GROUP BY 1"""

  // ---------------------------------------------------------------
  // f38: "Top Users" — the one dashboard panel that had no named
  // face (r16 verdict item 4): an lnsXY bar chart of the top-15
  // user_id terms ordered by record count, split by the risk-score
  // range dimension (dashboard_export.ndjson, layer
  // 73f2708d-…: terms on user_id, size 15, orderAgg count desc;
  // splitAccessor = range on enrichment.risk_score with the five
  // [0,20)…[80,100) buckets). ES nests the aggs: the top-15 terms
  // are chosen by each user's TOTAL record count (all their events,
  // whatever the risk value), then the range sub-agg buckets each
  // user's records and drops out-of-range docs — so n_events (the
  // ordering metric) rides along in the output and Σn ≤ n_events
  // per user.
  //
  // Scale: one combiner-friendly groupBy(user_id) + a global top-15
  // (TakeOrderedAndProject, never a full sort), the 15-row verdict
  // broadcast back as a semi-filter, then a bounded (user × bucket)
  // aggregation — no shuffle carries more than users × map-tasks.
  // ---------------------------------------------------------------

  /** The panel's risk split ranges (five uniform [from, to) buckets). */
  val TopUsersRiskRanges: Seq[RangeBucket] = Seq(
    bucket(0, 20, "0-20"), bucket(20, 40, "20-40"),
    bucket(40, 60, "40-60"), bucket(60, 80, "60-80"),
    bucket(80, 100, "80-100"))

  val TopUsersN = 15

  /** Top-`n` entities of an event frame by record count (ties broken
    * by id asc — the deterministic total order both engines replay),
    * with per-(entity, range-bucket) record counts. */
  def topUsersByRisk(events: DataFrame, user: Column, riskValue: Column,
      n: Int = TopUsersN): DataFrame = {
    val top = events.groupBy(user.as("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("n_events").desc, col("user_id").asc)
      .limit(n)
    events.select(user.as("user_id"),
        rangeLabel(riskValue, TopUsersRiskRanges).as("risk_bucket"))
      .join(broadcast(top), Seq("user_id"))
      .filter(col("risk_bucket").isNotNull)
      .groupBy(col("user_id"), col("n_events"), col("risk_bucket"))
      .agg(count(lit(1)).as("n"))
  }

  def f38(s: SparkSession, dir: String): DataFrame =
    topUsersByRisk(graft.Tables.events(s, dir), col("user_id"), col("value"))

  val f38Sql: String =
    s"""WITH top AS (
         SELECT user_id, count(*) AS n_events FROM events
         GROUP BY 1 ORDER BY n_events DESC, user_id ASC LIMIT $TopUsersN),
       b AS (
         SELECT e.user_id, t.n_events,
           ${rangeCaseSql("e.value", TopUsersRiskRanges)} AS risk_bucket
         FROM events e JOIN top t ON e.user_id = t.user_id)
       SELECT user_id, CAST(n_events AS BIGINT) AS n_events, risk_bucket,
         count(*) AS n
       FROM b WHERE risk_bucket IS NOT NULL GROUP BY 1, 2, 3"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f18_price_histogram" -> (f18 _),
    "f19_risk_heatmap" -> (f19 _),
    "f20_risk_distribution" -> (f20 _),
    "f38_top_users" -> (f38 _))

  val oracles: Map[String, String] = Map(
    "f18_price_histogram" -> f18Sql,
    "f19_risk_heatmap" -> f19Sql,
    "f20_risk_distribution" -> f20Sql,
    "f38_top_users" -> f38Sql)
}
