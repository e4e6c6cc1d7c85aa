package graft

import graft.operators.Attribution
import org.apache.spark.sql.functions._

/** f28 last-touch semantics on a hand-built event log — the anchor
  * selections an oracle can't independently confirm (the same SQL
  * mistake would hide on both engines). */
class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private val Day = 86400L * 1000000L

  private def ev(id: Long, user: Long, typ: String, value: Double,
      usOffset: Long): (Long, Long, String, Double, java.sql.Timestamp) =
    (id, user, typ, value, new java.sql.Timestamp(usOffset / 1000))

  private def run(rows: Seq[(Long, Long, String, Double, java.sql.Timestamp)])
      : Map[String, (Long, Double)] =
    Attribution.lastTouch(
      rows.toDF("event_id", "user_id", "event_type", "value", "ts"))
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("credits the latest in-window touch; ties break on event_id") {
    val rows = Seq(
      ev(1, 7, "view", 0, 1 * Day),
      ev(2, 7, "click", 0, 2 * Day),         // latest touch -> wins
      ev(3, 7, "purchase", 10.0, 3 * Day),
      // same-timestamp touches: higher event_id wins deterministically
      ev(4, 8, "view", 0, 1 * Day),
      ev(5, 8, "click", 0, 1 * Day),
      ev(6, 8, "purchase", 20.0, 2 * Day))
    val got = run(rows)
    assert(got("click") == ((2L, 30.0)))
    assert(!got.contains("view") && !got.contains("direct"))
  }

  test("touches outside the lookback or after the purchase do not count") {
    val rows = Seq(
      ev(1, 7, "click", 0, 1 * Day),
      ev(2, 7, "purchase", 10.0, 5 * Day),   // click 4 days before: stale
      ev(3, 8, "purchase", 20.0, 2 * Day),
      ev(4, 8, "click", 0, 3 * Day),         // click AFTER purchase
      ev(5, 9, "click", 0, 2 * Day),
      ev(6, 9, "purchase", 30.0, 2 * Day + 1000L)) // in window -> credited
    val got = run(rows)
    assert(got("direct") == ((2L, 30.0)))
    assert(got("click") == ((1L, 30.0)))
  }

  test("another user's touch never gets credit") {
    val rows = Seq(
      ev(1, 7, "click", 0, 1 * Day),
      ev(2, 8, "purchase", 10.0, 2 * Day))
    assert(run(rows) == Map("direct" -> ((1L, 10.0))))
  }

  test("streaming gate: batch/stream parity ROW-FOR-ROW on ts-ordered feed") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // the real sf0.001 event log, fed in event-time order as 3 batches
    val ev = Tables.events(spark, sf("sf0.001"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts"))
      .as[(Long, Long, String, Double, java.sql.Timestamp)]
      .collect().sortBy(e => (e._5.getTime, e._5.getNanos, e._1))
    val input = MemoryStream[(Long, Long, String, Double, java.sql.Timestamp)]
    val q = graft.streaming.Alerts.attributionGate(
      input.toDF().toDF("event_id", "user_id", "event_type", "value", "ts"))
      .writeStream.format("memory").queryName("attr_gate")
      .outputMode("append").start()
    try {
      val third = ev.length / 3
      input.addData(ev.take(third).toSeq: _*); q.processAllAvailable()
      input.addData(ev.slice(third, 2 * third).toSeq: _*); q.processAllAvailable()
      input.addData(ev.drop(2 * third).toSeq: _*); q.processAllAvailable()
      // per-purchase credits rolled up == the batch f28 report
      val got = spark.table("attr_gate")
        .groupBy(col("touch_type"))
        .agg(count(lit(1)).as("n_purchases"),
          graft.operators.Relational.dsum(col("value"))
            .as("attributed_revenue"))
        .as[(String, Long, Double)].collect().toSet
      val batch = Attribution.f28(spark, sf("sf0.001"))
        .as[(String, Long, Double)].collect().toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("f28 face: full credit conservation, all buckets populated") {
    val df = Attribution.f28(spark, sf("sf0.001"))
      .as[(String, Long, Double)].collect()
    val byType = df.map(r => r._1 -> r._2).toMap
    // every purchase is credited exactly once
    val purchases = Tables.events(spark, sf("sf0.001"))
      .filter(col("event_type") === "purchase").count()
    assert(df.map(_._2).sum == purchases)
    assert(byType.keySet == Set("click", "view", "direct"))
  }

  test("f36: hand-computed decay credits; lookback edge at exactly 3 days") {
    def dec6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = Seq(
      // user 7: purchase 100 at day 10; touches at ages 0/1/2 days
      // (w8 = 8/4/2, sw = 14) and one outside the lookback
      ev(1, 7, "click", 0, 10 * Day),        // k=0 -> 8
      ev(2, 7, "view", 0, 9 * Day),          // k=1 -> 4
      ev(3, 7, "click", 0, 8 * Day),         // k=2 -> 2
      ev(4, 7, "view", 0, 6 * Day),          // 4 days old -> excluded
      ev(5, 7, "purchase", 100.0, 10 * Day),
      // user 8: touch at EXACTLY the lookback bound (3 days, k=3 ->
      // w8 = 1, its only touch) — must be included at weight 1
      ev(6, 8, "view", 0, 7 * Day),
      ev(7, 8, "purchase", 40.0, 10 * Day),
      // user 9: no touches -> direct, full credit
      ev(8, 9, "purchase", 50.0, 10 * Day))
    val got = Attribution.timeDecay(
      rows.toDF("event_id", "user_id", "event_type", "value", "ts"))
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // user 7 credits: clicks 100·8/14 + 100·2/14, view 100·4/14;
    // user 8: view 40 (sole touch); user 9: direct 50
    assert(got("click") ==
      ((2L, dec6(100.0 * 8 / 14) + dec6(100.0 * 2 / 14))))
    assert(got("view") == ((2L, dec6(100.0 * 4 / 14) + 40.0)))
    assert(got("direct") == ((1L, 50.0)))
    // and conservation: total credited revenue == total purchase value
    // up to the per-touch rounding (≤ 0.5e-6 each)
    val total = got.values.map(_._2).sum
    assert(math.abs(total - 190.0) < 1e-5, s"total $total")
  }
}
