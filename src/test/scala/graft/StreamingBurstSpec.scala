package graft

import graft.streaming.Alerts
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Row 41i: the f23 velocity rule enforced at ingest — planted burst
  * flags once, baselined steady traffic stays silent, cold-start
  * users gate on the absolute floor only. */
class StreamingBurstSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, hour: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-$day%02d $hour%02d:00:00")

  test("planted burst alerts once; baselined mean suppresses; cold user floors") {
    implicit val sqlCtx = spark.sqlContext
    // baselines: user 1 averages 2/day over 10 days; user 2 averages
    // 8/day (chatty — 8 events in a day is NOT a burst for them)
    val baseline = Seq((1L, 20L, 10L), (2L, 80L, 10L))
      .toDF("user_id", "sum_n", "nw")
    val input = MemoryStream[(Timestamp, Long)]
    val q = Alerts.burstAlerts(input.toDF().toDF("ts", "user_id"), baseline)
      .writeStream.format("memory").queryName("bursts")
      .outputMode("append").start()
    try {
      // day 1: user 1 fires 8 events (8·10 = 80 ≥ 2·20 ∧ 8 ≥ 6 → burst);
      // user 2 fires 8 (8·10 = 80 < 2·80 → silent);
      // user 99 (no baseline) fires 7 → absolute floor only → burst;
      // user 98 (no baseline) fires 5 < minBurst → silent
      input.addData(
        (0 until 8).map(h => (ts(1, h), 1L)) ++
        (0 until 8).map(h => (ts(1, h), 2L)) ++
        (0 until 7).map(h => (ts(1, h), 99L)) ++
        (0 until 5).map(h => (ts(1, h), 98L)): _*)
      // advance the watermark past day 1 so its window finalizes
      input.addData((ts(4, 0), 1L))
      q.processAllAvailable()
      val got = spark.table("bursts")
        .select(date_format(col("wstart"), "yyyy-MM-dd").as("d"),
          col("user_id"), col("n"))
        .as[(String, Long, Long)].collect().toSet
      assert(got == Set(("2026-01-01", 1L, 8L), ("2026-01-01", 99L, 7L)))
    } finally q.stop()
  }
}
