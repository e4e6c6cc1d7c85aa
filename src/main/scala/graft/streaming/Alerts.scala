package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming re-expression of the reference's alerting layer
  * (SURVEY.md §2 rows 39–41): the ElastAlert frequency rule
  * (elastalert/rules/high_risk.yaml — risk_score ≥ threshold within a
  * 10-minute window) becomes watermark + windowed aggregation;
  * stateful sessionization uses flatMapGroupsWithState.
  */
object Alerts {

  // ---------------------------------------------------------------
  // st01: tumbling-window event counts — the batch-equivalent of the
  // streaming aggregation (identical results by Structured Streaming's
  // unified-batch semantics), oracle-checked.
  // ---------------------------------------------------------------
  def st01(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.operators.Relational.dsum(col("value")).as("total_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("wstart"),
        col("event_type"), col("n"), col("total_value"))

  val st01Sql: String =
    """SELECT strftime(make_timestamp((epoch_us(ts) // 21600000000) * 21600000000), '%Y-%m-%d %H:%M') AS wstart,
       event_type, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(25,4))) AS DOUBLE) AS total_value
       FROM events GROUP BY 1, 2"""

  // ---------------------------------------------------------------
  // Streaming st01 (row 41n): the same tumbling counts maintained on
  // a live stream under a WATERMARK. Late-data contract (the exact
  // Structured Streaming semantics, parity-spec-pinned against the
  // batch aggregation): an event later than already-seen data is
  // still counted as long as its WINDOW'S END is newer than the
  // watermark; once the watermark passes a window's end the window is
  // emitted (append mode, exactly once) and subsequent events for it
  // are DROPPED — so the final stream output equals the batch
  // aggregation over exactly the not-too-late events. Watermark
  // bounds state: one (window, event_type) group per open window.
  // ---------------------------------------------------------------
  def windowedCounts(events: DataFrame, windowLen: String = "6 hours",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n"))

  // ---------------------------------------------------------------
  // The streaming alert rule itself: given any streaming DataFrame of
  // (ts, item_id, risk_score), emit per-10-minute-window alert counts
  // of high-risk items. Watermark bounds state; append mode emits each
  // window once it's final — the frequency-rule semantics.
  //
  // The threshold is CONDITIONAL AGGREGATION, not a pre-agg filter
  // (r15 fix, caught by the st05 stream-vs-batch parity spec):
  // Catalyst pushes a deterministic filter BELOW the
  // EventTimeWatermark operator, so with `.filter(risk >= t)` the
  // watermark tracked only ALERT events — on a stream whose tail
  // goes quiet (low-risk traffic only, the normal state of a fraud
  // stream), the watermark stalled and open alert windows NEVER
  // finalized. Folding the threshold into count(when)/max(when)
  // keeps every event in the watermark stats; zero-alert windows
  // are suppressed post-agg, so emitted rows are unchanged.
  // ---------------------------------------------------------------
  def highRiskAlerts(events: DataFrame, threshold: Int = 80,
      windowLen: String = "10 minutes", watermark: String = "30 minutes"): DataFrame = {
    val hi = col("risk_score") >= threshold
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"))
      .agg(count(when(hi, 1)).as("n_alerts"),
        max(when(hi, col("risk_score"))).as("max_risk"))
      .filter(col("n_alerts") > 0)
      .select(col("w.start").as("wstart"), col("n_alerts"), col("max_risk"))
  }

  // ---------------------------------------------------------------
  // st05: the alert RULE as a driver-checked face (r14 verdict item
  // 8 — highRiskAlerts was spec-only). The scored stream is the
  // events table with a deterministic per-event risk score; the face
  // runs the EXACT streaming plan (same function, watermark and all
  // — watermark is a no-op under batch execution, which is precisely
  // Structured Streaming's unified-semantics contract: the batch
  // result IS the stream's final output; StreamingAlertRuleSpec pins
  // that parity row-for-row on a real stream). Oracle replays
  // filter ≥ threshold → 10-minute tumbling count.
  // ---------------------------------------------------------------
  def scoredEvents(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(col("ts"),
      pmod(col("event_id"), lit(101)).cast("int").as("risk_score"))

  def st05(s: SparkSession, dir: String): DataFrame =
    highRiskAlerts(scoredEvents(s, dir))
      .select(date_format(col("wstart"), "yyyy-MM-dd HH:mm").as("wstart"),
        col("n_alerts"), col("max_risk"))

  val st05Sql: String =
    """SELECT strftime(make_timestamp((epoch_us(ts) // 600000000) * 600000000),
         '%Y-%m-%d %H:%M') AS wstart,
       count(*) AS n_alerts, CAST(max(event_id % 101) AS INT) AS max_risk
       FROM events WHERE event_id % 101 >= 80 GROUP BY 1"""

  // ---------------------------------------------------------------
  // The alert SINK lifecycle (r15 verdict item 6 — the last unwired
  // reference edge): finalized alert windows written through the
  // rolled-segment table layout, i.e. the full ElastAlert → index →
  // ILM path as one composition. The reference fires the frequency
  // rule (elastalert/high_risk.yaml), indexes through the write
  // alias (ingestion/index_alias.json `is_write_index`) and lets ILM
  // roll + expire (ingestion/ilm_policy.json); here each finalized
  // micro-batch appends to the alert table's ACTIVE segment, a
  // size-triggered rollPartition seals it, and expireSegments keeps
  // the newest `keep` sealed segments — all metadata-only FS ops on
  // top of plain parquet (sources.Ingest), so the alert mart scales
  // like any other rolled table and old alerts age out without a
  // data rewrite.
  // ---------------------------------------------------------------

  /** Default hot-segment size — the ilm_policy.json `max_size: 1gb`
    * analog, scaled to the alert mart's tiny row width. */
  val AlertSegmentBytes: Long = 64L * 1024 * 1024
  /** Sealed segments retained — the ILM delete-phase analog. */
  val AlertKeepSegments = 8

  /** One sink generation: append finalized alerts to the active
    * segment, seal it if it outgrew `maxBytes`, and — only when a
    * seal actually happened — run retention (expiry can only become
    * due when a new sealed segment arrives). */
  def alertSinkBatch(alerts: DataFrame, path: String,
      maxBytes: Long = AlertSegmentBytes,
      keep: Int = AlertKeepSegments): Unit = {
    val s = alerts.sparkSession
    graft.sources.Ingest.appendActive(alerts, path)
    if (graft.sources.Ingest.rollPartition(s, path, maxBytes).isDefined)
      graft.sources.Ingest.expireSegments(s, path, keep)
  }

  /** The streaming composition: the alert rule in append mode (only
    * watermark-finalized windows reach the sink — an alert is
    * immutable once indexed, the ES document semantics) feeding
    * [[alertSinkBatch]] per micro-batch. */
  def maintainAlertSink(scored: DataFrame, path: String,
      checkpointDir: String, threshold: Int = 80,
      maxBytes: Long = AlertSegmentBytes,
      keep: Int = AlertKeepSegments): org.apache.spark.sql.streaming.StreamingQuery =
    highRiskAlerts(scored, threshold)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        alertSinkBatch(batch, path, maxBytes, keep)
      }
      .start()

  // ---------------------------------------------------------------
  // Stream-static enrichment: the poller enriches suspicious items
  // with seller reputation before alerting (poller.py:652-661). In
  // Structured Streaming that is a stream-static broadcast join —
  // the static trust table is re-read per micro-batch (picking up
  // refreshes) and joined without any stream-side state.
  // ---------------------------------------------------------------

  /** High-risk alert stream enriched with a static seller-trust frame
    * (seller_id, trust_risk): items are alertable when their own risk
    * clears `threshold` OR their combined item+seller risk clears
    * `combinedThreshold` — the poller's "suspicious seller lowers the
    * alarm bar" behavior. `events` needs (ts, item_id, seller_id,
    * risk_score). */
  def enrichedHighRiskAlerts(events: DataFrame, sellerTrust: DataFrame,
      threshold: Int = 80, combinedThreshold: Int = 120,
      windowLen: String = "10 minutes", watermark: String = "30 minutes"): DataFrame = {
    val alertable = col("risk_score") >= threshold ||
      col("risk_score") + col("_trust") >= combinedThreshold
    events
      .withWatermark("ts", watermark)
      // unhinted stream-static join: the trust table is
      // SELLER-cardinality, so whether it broadcasts is left to
      // Catalyst's stats rather than forced (the f23/41i posture)
      .join(sellerTrust, Seq("seller_id"), "left")
      .withColumn("_trust", coalesce(col("trust_risk"), lit(50)))
      // conditional aggregation, not a pre-agg filter — see
      // highRiskAlerts on the watermark-stall hazard
      .groupBy(window(col("ts"), windowLen).as("w"))
      .agg(count(when(alertable, 1)).as("n_alerts"),
        max(when(alertable, col("risk_score"))).as("max_risk"),
        max(when(alertable, col("risk_score") + col("_trust")))
          .as("max_combined"))
      .filter(col("n_alerts") > 0)
      .select(col("w.start").as("wstart"), col("n_alerts"),
        col("max_risk"), col("max_combined"))
  }

  // ---------------------------------------------------------------
  // Stateful sessionization: gap-based sessions per key via
  // flatMapGroupsWithState with event-time timeout. State per key is
  // one open session — O(keys) state, watermark-expired.
  // ---------------------------------------------------------------
  case class Event(user_id: Long, ts: Timestamp)
  case class SessionState(start: Long, last: Long, n: Long)
  case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  val SessionGapMs: Long = 30 * 60 * 1000

  def sessionizeFunc(userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator(Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n))
    } else {
      val sorted = events.toSeq.sortBy(_.ts.getTime)
      var closed = List.empty[Session]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(st) if t - st.last <= SessionGapMs =>
            cur = Some(st.copy(last = t, n = st.n + 1))
          case Some(st) =>
            closed ::= Session(userId, new Timestamp(st.start), new Timestamp(st.last), st.n)
            cur = Some(SessionState(t, t, 1))
          case None =>
            cur = Some(SessionState(t, t, 1))
        }
      }
      cur.foreach { st =>
        state.update(st)
        // setTimeoutTimestamp throws if the timestamp is ≤ the current
        // watermark. For this single-operator query Spark's late-data
        // filter (same watermark) makes that unreachable, but when the
        // operator is fed from an upstream stateful operator the
        // late-filter watermark can LAG the validation watermark
        // (Spark's dual-watermark semantics), so an admitted event may
        // still have last+gap ≤ watermark. Clamp to watermark+1: the
        // session then times out on the next trigger instead of
        // killing the query.
        state.setTimeoutTimestamp(
          math.max(st.last + SessionGapMs, state.getCurrentWatermarkMs() + 1))
      }
      closed.reverseIterator
    }
  }

  /** Streaming sessionization over a typed event stream. */
  def sessionize(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events.withWatermark("ts", "1 hour").as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(sessionizeFunc)
      .toDF()
  }

  // ---------------------------------------------------------------
  // Streaming velocity gate (row 41i): f23's self-baselined burst
  // rule enforced at ingest. Tumbling event-time windows count each
  // user's events; a static per-user baseline (sum_n, nw — the f23
  // batch frame, refreshed per micro-batch by stream-static join
  // semantics) supplies the mean; the flag boundary is the same
  // exact-integer rule as f23 (n·nw ≥ factor·Σn, absolute floor
  // minBurst). Users ABSENT from the baseline default to 0·0 — the
  // relative test passes vacuously and only the absolute floor
  // gates, the right cold-start posture. Watermark bounds state;
  // append mode emits each window once final. The baseline join is
  // unhinted: the frame is user-cardinality, so whether it
  // broadcasts is left to Catalyst's stats, not forced.
  // ---------------------------------------------------------------
  def burstAlerts(events: DataFrame, baseline: DataFrame,
      windowLen: String = "1 day", watermark: String = "2 days",
      factor: Long = graft.operators.Velocity.BurstFactor,
      minBurst: Long = graft.operators.Velocity.MinBurst): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .join(baseline, Seq("user_id"), "left")
      .filter(col("n") >= minBurst &&
        col("n") * coalesce(col("nw"), lit(0L)) >=
          lit(factor) * coalesce(col("sum_n"), lit(0L)))
      .select(col("w.start").as("wstart"), col("user_id"), col("n"))

  // ---------------------------------------------------------------
  // Streaming CUSUM gate (row 41j): f25's changepoint statistic
  // maintained INCREMENTALLY — the prefix-min closed form needs only
  // (P, min P) per user, so the whole sequential test is O(1) state:
  // fold each completed day into P' += nd·x − (Σn + k·nd), track the
  // running min, alarm when P − minP ≥ h·nd. Exact-integer, the same
  // scaled arithmetic as the batch face, so batch and stream agree
  // row-for-row on the shared lattice (parity spec). Per-user
  // baselines arrive as flatMapGroupsWithState INITIAL STATE (a
  // distributed keyed frame — no driver collect, no closure capture);
  // users without a baseline run an absolute cold-start CUSUM with
  // target rate k/day (sum_n = 0, nd = 1 — the 41i posture). Gap
  // days fold as x = 0 (inactivity drains the statistic, mirroring
  // the batch lattice fill); a pending day folds when a later day's
  // first event arrives.
  // ---------------------------------------------------------------

  case class CusumState(sumN: Long, nd: Long,
      lastDay: Long, x: Long, p: Long, minP: Long, started: Boolean)
  case class CusumAlarm(user_id: Long, day: String, x: Long,
      cusum_num: Long, nd: Long)

  private def epochDay(t: Timestamp): Long = t.getTime / 86400000L

  private def dayStr(d: Long): String =
    java.time.LocalDate.ofEpochDay(d).toString

  /** Fold one completed day into the state; emit an alarm row if the
    * statistic crosses the threshold. */
  private def foldDay(uid: Long, st: CusumState, day: Long, x: Long,
      slack: Long, threshold: Long): (CusumState, Option[CusumAlarm]) = {
    val p = st.p + st.nd * x - (st.sumN + slack * st.nd)
    val minP = math.min(st.minP, p)
    val s = p - minP
    val alarm =
      if (s >= threshold * st.nd)
        Some(CusumAlarm(uid, dayStr(day), x, s, st.nd))
      else None
    (st.copy(p = p, minP = minP), alarm)
  }

  def cusumGateFunc(slack: Long, threshold: Long)(
      userId: Long, events: Iterator[(Timestamp, Long)],
      state: GroupState[CusumState]): Iterator[CusumAlarm] = {
    var st = state.getOption.getOrElse(
      CusumState(0L, 1L, -1L, 0L, 0L, 0L, started = false))
    val out = scala.collection.mutable.ListBuffer.empty[CusumAlarm]
    events.toSeq.sortBy(_._1.getTime).foreach { case (ts, _) =>
      val d = epochDay(ts)
      if (!st.started) st = st.copy(lastDay = d, x = 1L, started = true)
      else if (d == st.lastDay) st = st.copy(x = st.x + 1)
      else if (d > st.lastDay) {
        // fold the completed day, then the empty gap days before d
        val (s1, a1) = foldDay(userId, st, st.lastDay, st.x, slack, threshold)
        a1.foreach(out += _)
        var cur = s1
        var g = st.lastDay + 1
        while (g < d) {
          val (s2, a2) = foldDay(userId, cur, g, 0L, slack, threshold)
          a2.foreach(out += _)
          cur = s2
          g += 1
        }
        st = cur.copy(lastDay = d, x = 1L)
      } // d < lastDay: late event for a folded day — dropped (watermark)
    }
    state.update(st)
    out.iterator
  }

  /** Streaming CUSUM over (ts, user_id) with per-user baselines
    * (user_id, sum_n, nd) as distributed initial state. */
  def cusumGate(events: DataFrame, baseline: DataFrame,
      slack: Long = graft.operators.Velocity.CusumSlack,
      threshold: Long = graft.operators.Velocity.CusumThreshold): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val init = baseline.select(col("user_id"), col("sum_n"), col("nd"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, sumN, nd) =>
        CusumState(sumN, nd, -1L, 0L, 0L, 0L, started = false)
      }
    events.withWatermark("ts", "2 days")
      .select(col("ts"), col("user_id")).as[(Timestamp, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout(), init)(cusumGateFunc(slack, threshold))
      .toDF()
  }

  // ---------------------------------------------------------------
  // Streaming EWMA gate (row 41q): f32's control chart maintained
  // INCREMENTALLY — the recursion is its own O(1) state: (s, q) per
  // user, folded once per completed day with the IDENTICAL IEEE ops
  // the batch face (and its DuckDB oracle) run — s ← 0.25·x +
  // 0.75·s, q ← q·0.5625, alarm outside μ ± 3σ·sqrt((1/7)·(1−q)) —
  // so batch and stream agree row-for-row on the shared lattice
  // (parity spec), rounding included. Per-user (μ, σ) baselines
  // arrive as flatMapGroupsWithState INITIAL STATE (the 41j
  // posture: a distributed keyed frame, no driver collect). Unlike
  // CUSUM there is NO cold-start chart: a control chart's limits
  // are Phase I estimates by definition (Montgomery's convention —
  // estimate μ/σ on a clean window, monitor Phase II against them),
  // so users without a baseline accumulate nothing and never alarm
  // — the honest posture, not a silent absolute-rate guess. Gap
  // days fold as x = 0 (inactivity pulls the chart down, mirroring
  // the batch lattice fill); late events behind the fold drop
  // (watermark).
  // ---------------------------------------------------------------

  case class EwmaState(mu: Double, sd: Double, lastDay: Long, x: Long,
      s: Double, q: Double, started: Boolean)
  case class EwmaAlarm(user_id: Long, day: String, x: Long,
      ewma: Double, ucl: Double, lcl: Double, side: String)

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Fold one completed day; emit an alarm row when the chart exits
    * the limits. The arithmetic is character-for-character the batch
    * fold's (Velocity.ewmaChart) — parity is by construction. */
  private def foldEwmaDay(uid: Long, st: EwmaState, day: Long,
      x: Long): (EwmaState, Option[EwmaAlarm]) = {
    val q = st.q * 0.5625
    val s = 0.25 * x + 0.75 * st.s
    val hw = 3.0 * st.sd * math.sqrt(0.25 / 1.75 * (1.0 - q))
    val alarm =
      if (s > st.mu + hw || s < st.mu - hw)
        Some(EwmaAlarm(uid, dayStr(day), x, round6(s),
          round6(st.mu + hw), round6(st.mu - hw),
          if (s > st.mu + hw) "high" else "low"))
      else None
    (st.copy(s = s, q = q), alarm)
  }

  def ewmaGateFunc(userId: Long, events: Iterator[(Timestamp, Long)],
      state: GroupState[EwmaState]): Iterator[EwmaAlarm] = {
    // no baseline → no Phase I estimates → nothing to monitor; drain
    // the group without creating state
    if (!state.exists) return Iterator.empty
    var st = state.get
    val out = scala.collection.mutable.ListBuffer.empty[EwmaAlarm]
    events.toSeq.sortBy(_._1.getTime).foreach { case (ts, _) =>
      val d = epochDay(ts)
      if (!st.started) st = st.copy(lastDay = d, x = 1L, started = true)
      else if (d == st.lastDay) st = st.copy(x = st.x + 1)
      else if (d > st.lastDay) {
        val (s1, a1) = foldEwmaDay(userId, st, st.lastDay, st.x)
        a1.foreach(out += _)
        var cur = s1
        var g = st.lastDay + 1
        while (g < d) {
          val (s2, a2) = foldEwmaDay(userId, cur, g, 0L)
          a2.foreach(out += _)
          cur = s2
          g += 1
        }
        st = cur.copy(lastDay = d, x = 1L)
      }
      // d < lastDay: dropped. A day folds the moment a NEWER day's
      // first event arrives, so the effective lateness bound is the
      // fold, not the 2-day watermark — an event for an already-
      // folded day cannot be replayed into the recursion (EWMA has
      // no retract). Within-day and gap-day ordering is exact; the
      // batch==stream parity claim therefore holds for delivery
      // that is day-ordered per user ACROSS micro-batches (the
      // 41j CUSUM gate shares this posture).
    }
    state.update(st)
    out.iterator
  }

  /** Streaming EWMA chart over (ts, user_id) with per-user Phase I
    * baselines (user_id, mu, sd) as distributed initial state. */
  def ewmaGate(events: DataFrame, baseline: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val init = baseline.select(col("user_id"), col("mu"), col("sd"))
      .as[(Long, Double, Double)]
      .groupByKey(_._1)
      .mapValues { case (_, mu, sd) =>
        // chart seeded at mu, q at 1.0 — the batch fold's seeds
        EwmaState(mu, sd, -1L, 0L, mu, 1.0, started = false)
      }
    events.withWatermark("ts", "2 days")
      .select(col("ts"), col("user_id")).as[(Timestamp, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout(), init)(ewmaGateFunc)
      .toDF()
  }

  // ---------------------------------------------------------------
  // Streaming quota gate (row 41k): per-source admission control at
  // ingest — the streaming counterpart of c16's per-domain cap. The
  // batch face selects the K smallest salted hashes (content-
  // independent, requires the whole corpus); at ingest the standard
  // policy is FIRST-K-ADMITTED: one counter per source, docs beyond
  // the quota rejected at the door. O(1) state per source; within a
  // micro-batch, docs admit in doc_id order so replays are
  // deterministic. Emits the admission ledger (both outcomes) so the
  // census/debugging side sees rejections too.
  // ---------------------------------------------------------------

  case class QuotaDecision(doc_id: Long, source: String,
      seq: Long, admitted: Boolean)

  def quotaGateFunc(quota: Long)(source: String,
      docs: Iterator[(Long, String)],
      state: GroupState[Long]): Iterator[QuotaDecision] = {
    var n = state.getOption.getOrElse(0L)
    val out = docs.toSeq.sortBy(_._1).map { case (id, _) =>
      val admit = n < quota
      if (admit) n += 1
      QuotaDecision(id, source, n, admit)
    }
    state.update(n)
    out.iterator
  }

  /** Streaming per-source quota over (doc_id, source). */
  def quotaGate(docs: DataFrame,
      quota: Long = graft.operators.Quota.DefaultQuota.toLong): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(quotaGateFunc(quota))
      .toDF()
  }

  // ---------------------------------------------------------------
  // Streaming last-touch attribution (row 41m): f28 enforced at
  // ingest. State per user is O(1) — the single best touch seen so
  // far ((ts, event_id) max, the f28 total argmax) — so a purchase
  // is credited the moment it arrives instead of by a corpus-wide
  // join. Parity contract: ROW-FOR-ROW equal to batch f28 for
  // event-time-ordered arrival (the spec feeds ts-ordered batches);
  // within a micro-batch events are processed in (ts, purchases-
  // after-touches, event_id) order so a same-timestamp touch credits
  // the purchase exactly as the batch predicate t_us <= p_us does.
  // ---------------------------------------------------------------

  case class TouchState(tUs: Long, tId: Long, touchType: String)
  case class Credit(user_id: Long, p_id: Long, value: Double,
      touch_type: String)

  def attributionGateFunc(lookbackUs: Long)(userId: Long,
      events: Iterator[(Long, String, Double, Timestamp)],
      state: GroupState[TouchState]): Iterator[Credit] = {
    var st = state.getOption.orNull
    val out = scala.collection.mutable.ListBuffer.empty[Credit]
    events.toSeq
      .map { case (id, typ, value, ts) =>
        // full microsecond precision: getTime truncates to millis,
        // getNanos carries the fractional second (the f26 lesson —
        // epoch micros, never a lossy unit)
        val us = math.floorDiv(ts.getTime, 1000L) * 1000000L +
          ts.getNanos / 1000L
        (id, typ, value, us)
      }
      .sortBy { case (id, typ, _, us) => (us, typ == "purchase", id) }
      .foreach { case (id, typ, value, us) =>
        typ match {
          case "click" | "view" =>
            if (st == null || us > st.tUs || (us == st.tUs && id > st.tId))
              st = TouchState(us, id, typ)
          case "purchase" =>
            val credited =
              if (st != null && us - st.tUs <= lookbackUs) st.touchType
              else "direct"
            out += Credit(userId, id, value, credited)
          case _ => ()
        }
      }
    if (st != null) state.update(st)
    out.iterator
  }

  /** Streaming last-touch attribution over (event_id, user_id,
    * event_type, value, ts): emits one credit row per purchase. */
  def attributionGate(events: DataFrame,
      lookbackUs: Long = graft.operators.Attribution.LookbackUs): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events.select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts"))
      .as[(Long, Long, String, Double, Timestamp)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[(Long, Long, String, Double, Timestamp)],
            st: GroupState[TouchState]) =>
          attributionGateFunc(lookbackUs)(uid,
            it.map(e => (e._1, e._3, e._4, e._5)), st)
      }
      .toDF()
  }

  // ---------------------------------------------------------------
  // Streaming realert gate (row 41t): f37's cooldown chain enforced
  // LIVE — the posture the reference's ElastAlert actually runs in
  // (its realert silencing is stream-side state, not a batch sweep).
  // State per key is ONE long: the next allowed fire time; in-batch
  // rows sort by (us, event_id) and fold with the batch operator's
  // exact rule, cross-batch the anchor rides GroupState — so batch
  // and stream agree row-for-row on a ts-ordered feed (parity
  // spec). EventTimeTimeout expires anchors once their cooldown has
  // lapsed (an expired anchor suppresses nothing), bounding state by
  // keys ACTIVE within a cooldown, not all keys ever seen.
  // ---------------------------------------------------------------
  case class AlertEvent(user_id: Long, event_id: Long, ts: Timestamp)
  case class RealertEmit(user_id: Long, event_id: Long, us: Long)

  /** unix_micros of a java.sql.Timestamp — the batch operator's time
    * axis, exactly. */
  private def tsMicros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L

  def realertGateFunc(cooldownUs: Long)(userId: Long,
      events: Iterator[AlertEvent],
      state: GroupState[Long]): Iterator[RealertEmit] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val sorted = events.toSeq
        .sortBy(e => (tsMicros(e.ts), e.event_id))
      var nextOk = state.getOption.getOrElse(Long.MinValue)
      val out = scala.collection.mutable.ListBuffer.empty[RealertEmit]
      sorted.foreach { e =>
        val us = tsMicros(e.ts)
        if (us >= nextOk) {
          out += RealertEmit(userId, e.event_id, us)
          nextOk = us + cooldownUs
        }
      }
      if (nextOk != Long.MinValue) {
        state.update(nextOk)
        // the anchor is inert once nextOk has passed — let it expire
        // (clamped above the watermark, the sessionize rule)
        state.setTimeoutTimestamp(math.max(nextOk / 1000L,
          state.getCurrentWatermarkMs() + 1))
      }
      out.iterator
    }
  }

  /** Streaming cooldown suppression over a (user_id, event_id, ts)
    * alert stream. */
  def realertGate(alerts: DataFrame,
      cooldownUs: Long = graft.operators.Velocity.RealertCooldownUs): DataFrame = {
    val s = alerts.sparkSession
    import s.implicits._
    alerts.withWatermark("ts", "1 hour").as[AlertEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(realertGateFunc(cooldownUs))
      .toDF()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st01_windowed_counts" -> (st01 _),
    "st05_alert_rule" -> (st05 _))

  val oracles: Map[String, String] = Map(
    "st01_windowed_counts" -> st01Sql,
    "st05_alert_rule" -> st05Sql)
}
