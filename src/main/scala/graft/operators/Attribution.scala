package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** f28: last-touch revenue attribution — the conversion-credit query
  * every marketing/analytics stack runs and q18's funnel can't
  * answer: each purchase credits its full value to the MOST RECENT
  * preceding engagement touch (click or view) by the same user
  * within a bounded lookback, or to 'direct' when no touch exists in
  * the window. The rollup is credited conversions + revenue per
  * touch type.
  *
  * Parity discipline (the f26/q18 lessons): time comparisons ride on
  * WHOLE MICROSECONDS as BIGINT (`unix_micros`/`epoch_us` — interval
  * arithmetic re-rounds differently per engine), the winning touch
  * is a TOTAL argmax ((ts, event_id) descending — same-timestamp
  * touches can't flip between engines), and revenue sums through
  * DECIMAL (order-independent).
  *
  * Scale: one user-keyed shuffle join bounded by per-user event
  * counts (never a cross join — the lookback predicate prunes inside
  * each user's frame), one per-purchase window whose rank-1 filter
  * triggers WindowGroupLimit below the exchange, and a final
  * touch-type-cardinality rollup. Survives 100x: everything is
  * per-user or per-purchase local.
  */
object Attribution {

  /** Lookback window: 3 days, pinned in exact micros. */
  val LookbackUs: Long = 3L * 86400L * 1000000L

  /** The purchase × in-lookback-touch left join shared by f28 and
    * f36: (p_id, user_id, value, p_us, touch_type, t_us, t_id) — one
    * row per (purchase, touch) pair, a single null-touch row for a
    * direct purchase. */
  private def purchaseTouches(events: DataFrame): DataFrame = {
    val ev = events.select(col("event_id"), col("user_id"),
      col("event_type"), col("value"), unix_micros(col("ts")).as("us"))
      .transform(graft.CacheRegistry.register)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        col("value"), col("us").as("p_us"))
    val touches = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id").as("t_user"), col("event_type").as("touch_type"),
        col("us").as("t_us"), col("event_id").as("t_id"))
    purchases.join(touches,
      col("user_id") === col("t_user") &&
        col("t_us") <= col("p_us") &&
        col("p_us") - col("t_us") <= LookbackUs,
      "left")
  }

  /** Last-touch attribution over any events frame with
    * (event_id, user_id, event_type, value, ts). */
  def lastTouch(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("p_id"))
      .orderBy(col("t_us").desc_nulls_last, col("t_id").desc_nulls_last)
    purchaseTouches(events).withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(coalesce(col("touch_type"), lit("direct")).as("touch_type"))
      .agg(count(lit(1)).as("n_purchases"),
        Relational.dsum(col("value")).as("attributed_revenue"))
  }

  def f28(s: SparkSession, dir: String): DataFrame =
    lastTouch(Tables.events(s, dir))

  val f28Sql: String =
    s"""WITH ev AS (SELECT event_id, user_id, event_type, value,
             epoch_us(ts) AS us FROM events),
       p AS (SELECT event_id AS p_id, user_id, value, us AS p_us
             FROM ev WHERE event_type = 'purchase'),
       t AS (SELECT user_id, event_type AS touch_type, us AS t_us,
               event_id AS t_id
             FROM ev WHERE event_type IN ('click', 'view')),
       j AS (SELECT p.p_id, p.value, t.touch_type, t.t_us, t.t_id
             FROM p LEFT JOIN t ON p.user_id = t.user_id
               AND t.t_us <= p.p_us
               AND p.p_us - t.t_us <= $LookbackUs),
       r AS (SELECT p_id, value, touch_type,
               row_number() OVER (PARTITION BY p_id
                 ORDER BY t_us DESC NULLS LAST, t_id DESC NULLS LAST) AS rn
             FROM j)
       SELECT coalesce(touch_type, 'direct') AS touch_type,
         count(*) AS n_purchases,
         CAST(sum(CAST(value AS DECIMAL(25,4))) AS DOUBLE)
           AS attributed_revenue
       FROM r WHERE rn = 1 GROUP BY 1"""

  // ---------------------------------------------------------------
  // f36: time-decay multi-touch attribution — the credit model
  // completing the family (f28 gives everything to the last touch;
  // time-decay spreads each purchase's value over ALL in-lookback
  // touches with exponentially less credit the older the touch —
  // the standard middle ground between last-touch and linear).
  //
  // Exactness: the decay is DISCRETE — weight 2^(−k) for k = whole
  // elapsed days (integer `div` on the micros delta), carried as the
  // integer eighth w8 = 8 >> k ∈ {8,4,2,1} over the 3-day lookback,
  // so the per-purchase weight total is an exact BIGINT and the
  // credit share (value·w8)/sw is ONE double expression identical in
  // both engines — no pow(), no fractional exponent parity risk. A
  // direct purchase is its own single row at full weight. Credits
  // are rounded then DECIMAL-summed (order-independent).
  //
  // Scale: f28's join shape exactly (the shared purchaseTouches);
  // the weight total is one per-purchase window sum instead of f28's
  // rank-1 filter; the rollup is touch-type-cardinality.
  // ---------------------------------------------------------------

  /** Micros per decay half-life step (1 day). */
  val DecayStepUs: Long = 86400L * 1000000L

  /** Time-decay attribution: (touch_type, n_touches,
    * attributed_revenue) with per-touch credit value·2^(−days)
    * normalized within each purchase. */
  def timeDecay(events: DataFrame): DataFrame = {
    val j = purchaseTouches(events)
      .withColumn("w8", when(col("t_us").isNull, lit(8L))
        .otherwise(expr(
          s"shiftright(8L, int((p_us - t_us) div ${DecayStepUs}L))")))
    val sw = sum(col("w8")).over(Window.partitionBy(col("p_id")))
    j.withColumn("credit", round(
        (col("value").cast("double") * col("w8").cast("double")) /
          sw.cast("double"), 6))
      .groupBy(coalesce(col("touch_type"), lit("direct")).as("touch_type"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("credit").cast("decimal(25,8)")).cast("double")
          .as("attributed_revenue"))
  }

  def f36(s: SparkSession, dir: String): DataFrame =
    timeDecay(Tables.events(s, dir))

  val f36Sql: String =
    s"""WITH ev AS (SELECT event_id, user_id, event_type, value,
             epoch_us(ts) AS us FROM events),
       p AS (SELECT event_id AS p_id, user_id, value, us AS p_us
             FROM ev WHERE event_type = 'purchase'),
       t AS (SELECT user_id, event_type AS touch_type, us AS t_us,
               event_id AS t_id
             FROM ev WHERE event_type IN ('click', 'view')),
       j AS (SELECT p.p_id, p.value, t.touch_type, t.t_us,
               CASE WHEN t.t_us IS NULL THEN 8
                 ELSE (8 >> CAST((p.p_us - t.t_us) // $DecayStepUs AS INT))
                 END AS w8
             FROM p LEFT JOIN t ON p.user_id = t.user_id
               AND t.t_us <= p.p_us
               AND p.p_us - t.t_us <= $LookbackUs),
       c AS (SELECT touch_type,
               round((CAST(value AS DOUBLE) * CAST(w8 AS DOUBLE))
                 / CAST(sum(w8) OVER (PARTITION BY p_id) AS DOUBLE), 6)
                 AS credit
             FROM j)
       SELECT coalesce(touch_type, 'direct') AS touch_type,
         count(*) AS n_touches,
         CAST(sum(CAST(credit AS DECIMAL(25,8))) AS DOUBLE)
           AS attributed_revenue
       FROM c GROUP BY 1"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f28_last_touch" -> (f28 _),
    "f36_time_decay" -> (f36 _))

  val oracles: Map[String, String] = Map(
    "f28_last_touch" -> f28Sql,
    "f36_time_decay" -> f36Sql)
}
