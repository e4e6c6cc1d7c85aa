package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** f23: velocity / burst anomaly detection over the events stream —
  * the frequency-spike rule behind the reference's alerting window
  * (elastalert high_risk.yaml counts events in a sliding frequency
  * window; this is the batch-analytics generalization: find every
  * (user, day) whose event count spikes against that user's own
  * baseline, the classic fraud "velocity check").
  *
  * A day is a burst when n ≥ MinBurst AND n ≥ factor × the user's
  * mean events per ACTIVE day. The mean comparison is kept in exact
  * integer arithmetic — `n · nw ≥ factor · Σn` with factor the
  * rational 2/1 — so the flag boundary has no cross-engine double
  * ties (the g03 lesson); the reported ratio is display-only.
  *
  * Scale: one combiner-friendly shuffle on (user, day); the per-user
  * baseline joins back on user_id with no explicit broadcast hint —
  * the frame is USER-cardinality (10^9 at 100 TB), so the strategy is
  * left to Catalyst/AQE, which broadcasts only when stats say it
  * fits. Nothing event-scale survives the first aggregation; no
  * windows, no sorts.
  */
object Velocity {

  val BurstFactor = 2L
  val MinBurst = 6L

  /** Burst (user, day) rows over any (user_id, ts) frame. */
  def bursts(events: DataFrame): DataFrame = {
    val perDay = events
      .groupBy(col("user_id"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
    val base = perDay.groupBy(col("user_id"))
      .agg(sum(col("n")).as("sum_n"), count(lit(1)).as("nw"))
    perDay.join(base, "user_id")
      .filter(col("n") >= MinBurst &&
        col("n") * col("nw") >= lit(BurstFactor) * col("sum_n"))
      .select(col("user_id"), col("day"), col("n"),
        col("sum_n"), col("nw"),
        round((col("n") * col("nw")).cast("double") / col("sum_n"), 6)
          .as("ratio"))
  }

  def f23(s: SparkSession, dir: String): DataFrame =
    bursts(Tables.events(s, dir))

  val f23Sql: String =
    s"""WITH w AS (SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                 count(*) AS n
               FROM events GROUP BY 1, 2),
       m AS (SELECT user_id, CAST(sum(n) AS BIGINT) AS sum_n, count(*) AS nw
             FROM w GROUP BY 1)
       SELECT w.user_id, day, n, sum_n, nw,
         round(CAST(n * nw AS DOUBLE) / sum_n, 6) AS ratio
       FROM w JOIN m ON w.user_id = m.user_id
       WHERE n >= $MinBurst AND n * nw >= $BurstFactor * sum_n"""

  // ---------------------------------------------------------------
  // f24: two-sample Kolmogorov–Smirnov drift detection — the
  // distribution-shift monitor an ML/fraud pipeline runs between a
  // reference cohort and a live cohort (f21 flags single outlier
  // VALUES; KS flags when the whole SHAPE moved). Per group, the
  // D-statistic between the two sides' empirical CDFs.
  //
  // Exactness: D = max|F1 − F2| is computed as the INTEGER
  // cross-multiplied numerator max|cc1·n2 − cc2·n1| (the g03/f23
  // lesson: comparisons and argmaxes never ride on doubles), with
  // the one rounded division at the very end; `ks_at` is the
  // smallest value attaining the max — a total, deterministic
  // argmax. Magnitudes: cc·n ≤ (rows per group)² < 2^63 far beyond
  // 100 TB group sizes... at true 100 TB pair the counts through
  // DECIMAL instead; here BIGINT holds with 10^9 headroom.
  //
  // Scale: one combiner-friendly (grp, value) count shuffle; the CDF
  // window is PARTITIONED by group (never a global sort) and runs
  // over distinct values per group, not rows; the per-group total
  // frame is broadcast back.
  // ---------------------------------------------------------------

  /** Per-group KS stats over (grp, is_ref boolean, v):
    * (grp, n1, n2, d_num, d_stat, ks_at). */
  def ksDrift(rows: DataFrame): DataFrame = {
    val g = rows.groupBy(col("grp"), col("v"))
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("c1"),
        sum(when(col("is_ref"), 0L).otherwise(1L)).as("c2"))
    val n = g.groupBy(col("grp"))
      .agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    val w = Window.partitionBy(col("grp")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val c = g
      .withColumn("cc1", sum(col("c1")).over(w))
      .withColumn("cc2", sum(col("c2")).over(w))
      .join(broadcast(n), "grp")
      .withColumn("diff", abs(col("cc1") * col("n2") - col("cc2") * col("n1")))
      .transform(graft.CacheRegistry.register)
    val dmax = c.groupBy(col("grp")).agg(max(col("diff")).as("d_num"))
    c.join(broadcast(dmax), "grp")
      .filter(col("diff") === col("d_num"))
      .groupBy(col("grp"), col("n1"), col("n2"), col("d_num"))
      .agg(min(col("v")).as("ks_at"))
      .select(col("grp"), col("n1"), col("n2"), col("d_num"),
        round(col("d_num").cast("double") / (col("n1") * col("n2")), 6)
          .as("d_stat"),
        col("ks_at"))
  }

  /** Face: discount-distribution drift between finished (F) and open
    * (O) lineitems per return flag. */
  def f24(s: SparkSession, dir: String): DataFrame =
    ksDrift(Tables.lineitem(s, dir)
      .filter(col("l_linestatus").isin("F", "O"))
      .select(col("l_returnflag").as("grp"),
        (col("l_linestatus") === "F").as("is_ref"),
        col("l_discount").as("v")))

  val f24Sql: String =
    """WITH s AS (SELECT l_returnflag AS grp, l_linestatus = 'F' AS is_ref,
                l_discount AS v
              FROM lineitem WHERE l_linestatus IN ('F', 'O')),
       g AS (SELECT grp, v,
               CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS c1,
               CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS c2
             FROM s GROUP BY 1, 2),
       n AS (SELECT grp, CAST(sum(c1) AS BIGINT) AS n1,
               CAST(sum(c2) AS BIGINT) AS n2 FROM g GROUP BY 1),
       c AS (SELECT grp, v,
               CAST(sum(c1) OVER (PARTITION BY grp ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cc1,
               CAST(sum(c2) OVER (PARTITION BY grp ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cc2
             FROM g),
       d AS (SELECT c.grp, v, n1, n2, abs(cc1 * n2 - cc2 * n1) AS diff
             FROM c JOIN n ON c.grp = n.grp),
       m AS (SELECT grp, max(diff) AS d_num FROM d GROUP BY 1)
       SELECT d.grp, n1, n2, d.diff AS d_num,
         round(CAST(d.diff AS DOUBLE) / (n1 * n2), 6) AS d_stat,
         min(v) AS ks_at
       FROM d JOIN m ON d.grp = m.grp AND d.diff = m.d_num
       GROUP BY 1, 2, 3, 4"""

  // ---------------------------------------------------------------
  // f25: CUSUM sequential changepoint detection — the drift alarm
  // f23 can't raise: f23 flags a single spiking day against the
  // mean; CUSUM accumulates small persistent excess (a seller whose
  // activity creeps up 30% never trips a 2× day rule but walks the
  // CUSUM up linearly). Classic Page (1954) one-sided CUSUM with the
  // PREFIX-MIN closed form: S_t = max_{0≤j≤t} Σ_{i>j}(x_i − μ − k)
  // = P_t − min_{0≤j≤t} P_j — so the sequential recurrence becomes
  // two stock window functions (running sum, running min), no
  // recursion, no state. The min includes the VIRTUAL P_0 = 0 (the
  // Page recursion's S_0 = 0 anchor): without it the first lattice
  // day could never alarm and S_t is understated whenever the prefix
  // sums stay positive (a day-1 burst). The streaming gate
  // (Alerts.cusumGate, minP seeded at 0) implements the same form,
  // so batch and stream agree row-for-row.
  //
  // Exactness: everything is scaled by the user's lattice size nd —
  // P'_t = nd·ΣX_t − t·(ΣX + k·nd) — all BIGINT (the g03/f23/f24
  // integer discipline); μ never materializes as a double. The day
  // lattice is FILLED (missing days are x = 0 — inactivity must pull
  // the statistic down or a sparse user's two spikes a month apart
  // read as a run).
  //
  // Scale: the lattice explode is bounded by the time span, windows
  // are per-user partitions, and the per-user totals join back on
  // user_id (no explicit broadcast — the frame is user-cardinality;
  // AQE picks the strategy).
  // ---------------------------------------------------------------

  val CusumSlack = 1L // k: per-day allowance above the mean
  val CusumThreshold = 4L // h: alarm at S ≥ h·nd (≥ h events of excess)

  /** The ONE zero-filled per-user day lattice both sequential charts
    * (f25 CUSUM, f32 EWMA) run on: (user_id, day: DATE, x) with every
    * day in each user's [min, max] span present and inactive days at
    * x = 0 — two private copies of this recipe could silently drift
    * (the span or zero-fill rule fixed in one chart but not the
    * other). */
  private def dayLattice(events: DataFrame): DataFrame = {
    val e = events
      .groupBy(col("user_id"),
        date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(count(lit(1)).as("x"))
    val span = e.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val lat = span.select(col("user_id"),
      explode(sequence(col("d0"), col("d1"), expr("interval 1 day")))
        .as("day"))
    lat.join(e, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"), coalesce(col("x"), lit(0L)).as("x"))
  }

  /** Alarm rows (user_id, day, x, cusum_num, nd, cusum) over any
    * (user_id, ts) frame. */
  def cusum(events: DataFrame, slack: Long = CusumSlack,
      threshold: Long = CusumThreshold): DataFrame = {
    val f = dayLattice(events)
    val t = f.groupBy(col("user_id"))
      .agg(count(lit(1)).as("nd"), sum(col("x")).as("sx"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val run = w.rowsBetween(Window.unboundedPreceding, 0)
    val p = f.join(t, "user_id")
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("pp",
        col("nd") * sum(col("x")).over(run) -
          col("i") * (col("sx") + lit(slack) * col("nd")))
    p.withColumn("s", col("pp") - least(lit(0L), min(col("pp")).over(run)))
      .filter(col("s") >= lit(threshold) * col("nd"))
      .select(col("user_id"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("x"), col("s").as("cusum_num"), col("nd"),
        round(col("s").cast("double") / col("nd"), 6).as("cusum"))
  }

  def f25(s: SparkSession, dir: String): DataFrame =
    cusum(Tables.events(s, dir))

  val f25Sql: String =
    s"""WITH e AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
                 count(*) AS x
               FROM events GROUP BY 1, 2),
       span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM e GROUP BY 1),
       lat AS (SELECT user_id,
                 CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
               FROM span),
       f AS (SELECT l.user_id, l.day, CAST(coalesce(e.x, 0) AS BIGINT) AS x
             FROM lat l LEFT JOIN e ON l.user_id = e.user_id AND l.day = e.day),
       t AS (SELECT user_id, count(*) AS nd, CAST(sum(x) AS BIGINT) AS sx
             FROM f GROUP BY 1),
       p AS (SELECT f.user_id, day, x, nd,
               nd * CAST(sum(x) OVER (w ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 - row_number() OVER w * (sx + $CusumSlack * nd) AS pp
             FROM f JOIN t ON f.user_id = t.user_id
             WINDOW w AS (PARTITION BY f.user_id ORDER BY day)),
       c AS (SELECT user_id, day, x, nd,
               CAST(pp - least(0, min(pp) OVER (PARTITION BY user_id ORDER BY day
                 ROWS UNBOUNDED PRECEDING)) AS BIGINT) AS s
             FROM p)
       SELECT user_id, strftime(day, '%Y-%m-%d') AS day, x,
         s AS cusum_num, nd,
         round(CAST(s AS DOUBLE) / nd, 6) AS cusum
       FROM c WHERE s >= $CusumThreshold * nd"""

  // ---------------------------------------------------------------
  // f26: impossible-travel detection — the account-takeover signal
  // every auth/fraud stack runs: consecutive events of one user whose
  // implied ground speed exceeds what any traveler could do. Events
  // carry a deterministic device-location point cloud (the g01
  // derivation keyed on event_id — synthetic data has no geo column;
  // the operator is general over any (user_id, event_id, ts, lat,
  // lon) frame). lag() per user in event-time order, exact g02-style
  // haversine, speed = km / hours with the time delta on WHOLE
  // SECONDS in both engines (Spark's unix_timestamp truncates micros
  // — DuckDB must floor epoch the same way or the doubles diverge).
  // Threshold tuned to the synthetic cloud (5000 km/h) — on real geo
  // the conventional bar is ~900 (airliner).
  //
  // Scale: one per-user window (event-time sort within user
  // partitions), then a narrow codegen'd projection; no joins.
  // ---------------------------------------------------------------

  val MaxSpeedKmh = 5000.0

  def f26(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Column
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val e = Tables.events(s, dir).select(col("user_id"), col("event_id"),
      col("ts"),
      (lit(-90.0) + (col("event_id") * 7919 % 18000) / 100.0).as("lat"),
      (lit(-180.0) + (col("event_id") * 104729 % 36000) / 100.0).as("lon"))
    val p = e
      .withColumn("prev_event", lag(col("event_id"), 1).over(w))
      .withColumn("pts", lag(col("ts"), 1).over(w))
      .withColumn("plat", lag(col("lat"), 1).over(w))
      .withColumn("plon", lag(col("lon"), 1).over(w))
      .filter(col("pts").isNotNull)
    val km = graft.functions.Geo.haversineKm(
      col("plat"), col("plon"), col("lat"), col("lon"))
    val secs = unix_timestamp(col("ts")) - unix_timestamp(col("pts"))
    val hrs = secs.cast("double") / 3600.0
    p.withColumn("km", km).withColumn("secs", secs).withColumn("hrs", hrs)
      .filter(col("secs") > 0 && col("km") / col("hrs") > MaxSpeedKmh)
      .select(col("user_id"), col("prev_event"), col("event_id"),
        date_format(col("pts"), "yyyy-MM-dd HH:mm:ss").as("from_ts"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("to_ts"),
        round(col("km"), 6).as("km"), col("secs"),
        round(col("km") / col("hrs"), 6).as("kmh"))
  }

  val f26Sql: String =
    s"""WITH e AS (SELECT user_id, event_id, ts,
                 -90.0 + (event_id * 7919 % 18000) / 100.0 AS lat,
                 -180.0 + (event_id * 104729 % 36000) / 100.0 AS lon
               FROM events),
       p AS (SELECT *, lag(event_id) OVER w AS prev_event,
               lag(ts) OVER w AS pts, lag(lat) OVER w AS plat,
               lag(lon) OVER w AS plon
             FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       d AS (SELECT user_id, prev_event, event_id, pts, ts,
               CAST('6371.0088' AS DOUBLE) * CAST('2.0' AS DOUBLE) * asin(sqrt(
                 pow(sin(radians(lat - plat) / 2), 2)
               + cos(radians(plat)) * cos(radians(lat))
                 * pow(sin(radians(lon - plon) / 2), 2))) AS km,
               CAST(epoch_ms(ts) // 1000 - epoch_ms(pts) // 1000 AS BIGINT) AS secs
             FROM p WHERE pts IS NOT NULL)
       SELECT user_id, prev_event, event_id,
         strftime(pts, '%Y-%m-%d %H:%M:%S') AS from_ts,
         strftime(ts, '%Y-%m-%d %H:%M:%S') AS to_ts,
         round(km, 6) AS km, secs,
         round(km / (CAST(secs AS DOUBLE) / 3600.0), 6) AS kmh
       FROM d WHERE secs > 0 AND km / (CAST(secs AS DOUBLE) / 3600.0) > $MaxSpeedKmh"""

  // ---------------------------------------------------------------
  // f31: day-of-week seasonal anomaly — f23's burst detection made
  // seasonality-aware. A Monday spike is only anomalous against
  // MONDAYS: the baseline is per (event_type, weekday) (sum of
  // per-day counts + number of such weekdays seen), and each day is
  // scored by its count relative to its own weekday's mean. A fixed
  // threshold face goes vacuous as counts concentrate at scale (at
  // sf0.1 no day deviates 10% from its weekday mean — the law of
  // large numbers working as intended), so the face emits the TOP
  // `DowTopK` most anomalous days per type instead: always
  // non-empty, selective, and rank-deterministic (round-6 ratio
  // desc, then day asc — the ratio is a correctly-rounded double of
  // an exact integer fraction, identical in both engines).
  //
  // The weekday code is pure integer arithmetic (epoch-days mod 7,
  // anchor 1970-01-01 = Thursday = 0), never an engine's locale-
  // dependent dayofweek(). One (type, day) count shuffle; the
  // 7-row-per-type baseline joins back broadcast-small.
  // ---------------------------------------------------------------

  val DowTopK = 3

  /** (event_type, day, _c) per-day counts of an event frame — f31's
    * state, in the value-counts shape so it inherits the whole
    * [[IncrementalStats]] maintenance algebra (merge / retract /
    * generation-versioned fold) unchanged. */
  def dayCounts(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("_c"))

  /** Derive the seasonal-anomaly frame from a (event_type, day, _c)
    * counts state — shared by the batch face and the streaming
    * maintenance path (fold == recompute by construction: the state
    * IS the per-day counts). */
  def dowAnomaliesFromCounts(perDayCounts: DataFrame,
      k: Int = DowTopK): DataFrame = {
    val perDay = perDayCounts.select(col("event_type"), col("day"),
        col("_c").as("n"))
      .withColumn("dow",
        pmod(datediff(to_date(col("day")), to_date(lit("1970-01-01"))),
          lit(7)).cast("int"))
    val base = perDay.groupBy(col("event_type"), col("dow"))
      .agg(sum(col("n")).as("dow_sum"), count(lit(1)).as("dow_days"))
    val wr = Window.partitionBy(col("event_type"))
      .orderBy(col("ratio").desc, col("day").asc)
    perDay.join(base, Seq("event_type", "dow"))
      .withColumn("ratio",
        round((col("n") * col("dow_days")).cast("double") / col("dow_sum"), 6))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .filter(col("rank") <= k)
      .select(col("event_type"), col("rank"), col("day"), col("dow"),
        col("n"), col("dow_sum"), col("dow_days"), col("ratio"))
  }

  def dowAnomalies(events: DataFrame, k: Int = DowTopK): DataFrame =
    // the counts frame feeds BOTH the baseline aggregate and the join
    // probe — cached (it is (types × days)-sized, never event-sized)
    // so the event scan runs ONCE, not once per consumer
    dowAnomaliesFromCounts(
      dayCounts(events).transform(graft.CacheRegistry.register), k)

  /** Streaming seasonal-baseline maintenance (row 41p): fold each
    * micro-batch's (type, day) count delta into the generation-
    * versioned state and republish the derived anomaly frame — the
    * maintainStats/maintainQuantiles lifecycle applied to f31. A
    * replayed batch id overwrites its own generation, so crash-replay
    * re-converges to the identical state (spec-pinned alongside
    * fold == batch-recompute parity). */
  def maintainDowAnomalies(stream: DataFrame, stateDir: String,
      outDir: String, checkpointDir: String,
      k: Int = DowTopK): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val merged = IncrementalStats.foldBatch(stateDir,
          dayCounts(batch), id)
        dowAnomaliesFromCounts(merged, k)
          .write.mode("overwrite").parquet(outDir)
      }
      .start()

  def f31(s: SparkSession, dir: String): DataFrame =
    dowAnomalies(Tables.events(s, dir))

  val f31Sql: String =
    s"""WITH w AS (SELECT event_type,
           strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           ((CAST(CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01' AS BIGINT) % 7) + 7) % 7 AS dow,
           count(*) AS n
         FROM events GROUP BY 1, 2, 3),
       b AS (SELECT event_type, dow, CAST(sum(n) AS BIGINT) AS dow_sum,
               count(*) AS dow_days
             FROM w GROUP BY 1, 2),
       r AS (SELECT w.event_type, day, w.dow, n, dow_sum, dow_days,
               round(CAST(n * dow_days AS DOUBLE) / dow_sum, 6) AS ratio
             FROM w JOIN b ON w.event_type = b.event_type AND w.dow = b.dow),
       t AS (SELECT *, row_number() OVER (PARTITION BY event_type
               ORDER BY ratio DESC, day ASC) AS rank FROM r)
       SELECT event_type, rank, day, CAST(dow AS INT) AS dow, n,
         dow_sum, dow_days, ratio
       FROM t WHERE rank <= $DowTopK"""

  // ---------------------------------------------------------------
  // f32: EWMA control chart — the small-persistent-shift alarm
  // between f23 (single-day spike vs mean) and f25 (CUSUM run
  // accumulation): Roberts (1959) exponentially weighted moving
  // average with the standard time-varying control limits
  // μ ± L·σ·sqrt(λ/(2−λ)·(1−(1−λ)^{2t})) (Hunter 1986; Lucas &
  // Saccucci 1990), λ = 1/4, L = 3, chart seeded at the user's own
  // mean. A seller whose daily activity drifts 30-50% reads as noise
  // to the spike rule and walks the EWMA across the limit in a few
  // days; conversely a one-day outlier the spike rule flags barely
  // moves the smoothed statistic — the two rules are complementary
  // by design.
  //
  // Oracle parity: the EWMA recurrence s_t = λ·x_t + (1−λ)·s_{t−1}
  // has no integer closed form at useful λ ((1−λ)^t denominators
  // overflow any fixed scale past ~20 steps), so this face uses the
  // s13 discipline instead: BOTH engines run the IDENTICAL IEEE
  // double recursion — DuckDB as a recursive CTE stepping rn → rn+1,
  // Spark as a per-user sequential fold inside one grouped map (the
  // sessionize/s13 precedent: per-key sequential logic in a grouped
  // map, not an N-step relational unroll). Every operation appears
  // in the same order with the same literals (λ = 0.25 and
  // (1−λ)² = 0.5625 are exact binary doubles), the limit factor
  // (1−λ)^{2t} is carried THROUGH the recursion as q_t = q_{t−1} ×
  // 0.5625 rather than recomputed via pow() (libm pow is not
  // correctly rounded and may differ across engines; iterated
  // multiplication is IEEE-identical), and μ/σ derive from integer
  // sums in one division each. Rounding is display-only.
  //
  // Scale: the lattice is f25's (bounded by the time span), μ/σ are
  // combiner-friendly integer aggregates, and the grouped map
  // shuffles each user ONCE with per-group state of one (s, q) pair
  // over a time-bounded series — at 100 TB the per-user day lattice
  // is a retention window, not data-sized. Everything outside the
  // fold (limits, alarm filter, rounding) stays declarative and
  // codegen'd.
  // ---------------------------------------------------------------

  /** Chart width: alarm at ±3 asymptotic-σ units (the Shewhart
    * convention carried to EWMA). */
  val EwmaL = 3.0

  /** EWMA alarm rows (user_id, day, x, ewma, ucl, lcl, side) over
    * any (user_id, ts) frame — day lattice filled like f25 (missing
    * days are x = 0: inactivity must pull the average down). */
  def ewmaChart(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    // the shared f25 lattice, cached: it feeds BOTH the moments
    // aggregate and the grouped fold (the s14 convention — one event
    // scan + lattice build, not two)
    val f = dayLattice(events)
      .select(col("user_id"),
        date_format(col("day"), "yyyy-MM-dd").as("day"), col("x"))
      .transform(graft.CacheRegistry.register)
    // per-user moments, integer-exact until one division each:
    // μ = Σx/nd, σ = sqrt((nd·Σx² − (Σx)²)/nd²). The variance
    // numerator runs in DECIMAL(38,0): sx² overflows a silent Long
    // wrap at sx ≥ ~3.04e9 — a bot-scale account would read sd = NaN
    // and be excluded from the very chart that should watch it —
    // while DuckDB's HUGEINT sums are exact, so the decimal path
    // keeps the two engines on the same exact integer → double
    // conversion
    val m = f.groupBy(col("user_id"))
      .agg(count(lit(1)).as("nd"), sum(col("x")).as("sx"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"))
      .select(col("user_id"),
        (col("sx").cast("double") / col("nd")).as("mu"),
        sqrt((col("nd").cast("decimal(38,0)") * col("sxx") -
          col("sx").cast("decimal(38,0)") * col("sx")).cast("double") /
          (col("nd").cast("double") * col("nd"))).as("sd"))
      .transform(graft.CacheRegistry.register)
    // the sequential fold: s ← 0.25·x + 0.75·s (seeded at μ),
    // q ← q·0.5625 — the exact ops the oracle's recursive CTE runs
    val folded = f.join(m.select(col("user_id"), col("mu")), "user_id")
      .select(col("user_id"), col("day"), col("x"), col("mu"))
      .as[(Long, String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (uid, it) =>
        val rows = it.toArray.sortBy(_._2)
        var sAcc = rows.head._4 // mu
        var qAcc = 1.0
        rows.iterator.map { case (_, day, x, _) =>
          qAcc *= 0.5625
          sAcc = 0.25 * x + 0.75 * sAcc
          (uid, day, x, sAcc, qAcc)
        }
      }
      .toDF("user_id", "day", "x", "s", "q")
    val hw = lit(EwmaL) * col("sd") *
      sqrt(lit(0.25) / lit(1.75) * (lit(1.0) - col("q")))
    folded.join(m, "user_id")
      .filter(col("s") > col("mu") + hw || col("s") < col("mu") - hw)
      .select(col("user_id"), col("day"), col("x"),
        round(col("s"), 6).as("ewma"),
        round(col("mu") + hw, 6).as("ucl"),
        round(col("mu") - hw, 6).as("lcl"),
        when(col("s") > col("mu") + hw, lit("high")).otherwise(lit("low"))
          .as("side"))
  }

  def f32(s: SparkSession, dir: String): DataFrame =
    ewmaChart(Tables.events(s, dir))

  val f32Sql: String =
    s"""WITH RECURSIVE e AS (SELECT user_id,
           CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS x
         FROM events GROUP BY 1, 2),
       span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM e GROUP BY 1),
       lat AS (SELECT user_id,
                 CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
               FROM span),
       f0 AS (SELECT l.user_id, l.day, CAST(coalesce(e.x, 0) AS BIGINT) AS x
              FROM lat l LEFT JOIN e ON l.user_id = e.user_id AND l.day = e.day),
       f AS (SELECT user_id, day, x,
               row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
             FROM f0),
       t AS (SELECT user_id, count(*) AS nd, CAST(sum(x) AS BIGINT) AS sx,
               sum(x*x) AS sxx
             FROM f GROUP BY 1),
       -- variance numerator in HUGEINT (sxx stays DuckDB's exact
       -- 128-bit sum) mirroring the Spark side's DECIMAL(38,0): both
       -- engines convert the same exact integer to DOUBLE, and a
       -- bot-scale sx can't silently wrap either side
       m AS (SELECT user_id, CAST(sx AS DOUBLE) / nd AS mu,
               sqrt(CAST(CAST(nd AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                 / (CAST(nd AS DOUBLE) * nd)) AS sd
             FROM t),
       r AS (SELECT f.user_id, f.rn, f.day, f.x,
               0.25 * f.x + 0.75 * m.mu AS s,
               -- q must be DOUBLE here: the recursion's column type is
               -- pinned by this base row, and a bare 0.5625 is
               -- DECIMAL(5,4) — every round's q·0.5625 would be
               -- rounded back to 4 decimals (found as a 6e-6 ucl skew)
               CAST(0.5625 AS DOUBLE) AS q
             FROM f JOIN m ON f.user_id = m.user_id WHERE f.rn = 1
             UNION ALL
             SELECT f.user_id, f.rn, f.day, f.x,
               0.25 * f.x + 0.75 * r.s, r.q * 0.5625
             FROM r JOIN f ON f.user_id = r.user_id AND f.rn = r.rn + 1)
       SELECT r.user_id, strftime(r.day, '%Y-%m-%d') AS day, r.x,
         round(r.s, 6) AS ewma,
         round(m.mu + $EwmaL * m.sd * sqrt(0.25 / 1.75 * (1.0 - r.q)), 6) AS ucl,
         round(m.mu - $EwmaL * m.sd * sqrt(0.25 / 1.75 * (1.0 - r.q)), 6) AS lcl,
         CASE WHEN r.s > m.mu + $EwmaL * m.sd * sqrt(0.25 / 1.75 * (1.0 - r.q))
              THEN 'high' ELSE 'low' END AS side
       FROM r JOIN m ON r.user_id = m.user_id
       WHERE r.s > m.mu + $EwmaL * m.sd * sqrt(0.25 / 1.75 * (1.0 - r.q))
          OR r.s < m.mu - $EwmaL * m.sd * sqrt(0.25 / 1.75 * (1.0 - r.q))"""

  // ---------------------------------------------------------------
  // f37: realert cooldown suppression — the alert-fatigue semantics
  // the reference's ElastAlert rule runs with IMPLICITLY: high_risk
  // .yaml sets no `realert`, so ElastAlert's default (silence
  // duplicate alerts for the same key after a fire until the
  // cooldown passes) governs its email stream. st05 models the
  // frequency threshold; f37 models the suppression: per key, emit
  // an alert iff it is the key's first, or its timestamp is ≥ the
  // LAST EMITTED alert's + cooldown — an anchored chain, not a
  // lag-window (the next anchor depends on which earlier rows were
  // emitted, so no per-row window expresses it).
  //
  // Scale: the f32 grouped-fold posture — one user-keyed exchange,
  // per-key rows sorted and folded in a single pass (per-key alert
  // counts are human-scale by construction — they're ALERTS); the
  // boundary is pinned inclusive (an event exactly cooldown later
  // fires). The oracle advances the same chain as a recursive CTE
  // (one next-anchor join per step, aggregate-in-recursive-term is
  // DuckDB-supported).
  // ---------------------------------------------------------------

  /** ElastAlert's default silence window, scaled to the synthetic
    * stream: 6 h in exact micros. */
  val RealertCooldownUs: Long = 6L * 3600L * 1000000L

  /** Cooldown-suppressed alerts of a (user_id, event_id, ts) stream:
    * (user_id, event_id, us) — the rows that actually fire. */
  def realertFilter(alerts: DataFrame, cooldownUs: Long): DataFrame = {
    val s = alerts.sparkSession
    import s.implicits._
    alerts.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray.sortBy(r => (r._3, r._2))
        val out = Array.newBuilder[(Long, Long, Long)]
        var nextOk = Long.MinValue
        rows.foreach { case r @ (_, _, us) =>
          if (us >= nextOk) { out += r; nextOk = us + cooldownUs }
        }
        out.result().iterator
      }.toDF("user_id", "event_id", "us")
  }

  def f37(s: SparkSession, dir: String): DataFrame =
    realertFilter(
      Tables.events(s, dir).filter(col("event_type") === "error"),
      RealertCooldownUs)

  val f37Sql: String =
    s"""WITH RECURSIVE e AS (
         SELECT user_id, event_id, epoch_us(ts) AS us,
           row_number() OVER (PARTITION BY user_id
             ORDER BY epoch_us(ts), event_id) AS rn
         FROM events WHERE event_type = 'error'),
       emit AS (
         SELECT user_id, event_id, us, rn FROM e WHERE rn = 1
         UNION ALL
         SELECT n.user_id, n.event_id, n.us, n.rn
         FROM (SELECT m.user_id AS u, min(x.rn) AS nrn
               FROM emit m JOIN e x ON x.user_id = m.user_id
                 AND x.us >= m.us + $RealertCooldownUs
               GROUP BY m.user_id, m.rn) nx
         JOIN e n ON n.user_id = nx.u AND n.rn = nx.nrn)
       SELECT user_id, event_id, us FROM emit"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f37_realert" -> (f37 _),
    "f23_user_burst" -> (f23 _),
    "f24_ks_drift" -> (f24 _),
    "f25_cusum" -> (f25 _),
    "f26_impossible_travel" -> (f26 _),
    "f31_dow_anomaly" -> (f31 _),
    "f32_ewma" -> (f32 _))

  val oracles: Map[String, String] = Map(
    "f37_realert" -> f37Sql,
    "f23_user_burst" -> f23Sql,
    "f24_ks_drift" -> f24Sql,
    "f25_cusum" -> f25Sql,
    "f26_impossible_travel" -> f26Sql,
    "f31_dow_anomaly" -> f31Sql,
    "f32_ewma" -> f32Sql)
}
