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
}
