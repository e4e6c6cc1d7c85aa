package graft

import graft.streaming.Alerts
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Row 41n: watermarked tumbling counts — late-data parity with the
  * batch aggregation (r13 verdict item 7). Plants one late-but-
  * within-watermark event (must be counted) and one too-late event
  * (must be dropped), and asserts the final streaming output equals
  * the batch groupBy over exactly the not-dropped events. */
class StreamingWindowSpec extends SparkSpec {
  import spark.implicits._

  private def ts(hm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hm:00")

  test("late event within watermark counts; too-late event is dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val q = Alerts.windowedCounts(
        input.toDF().toDF("ts", "event_type"),
        windowLen = "1 hour", watermark = "30 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("append").start()
    try {
      // b1: two on-time events in the 10:00 window; 11:05 advances
      // the watermark (post-batch) to 10:35
      input.addData((ts("10:00"), "view"), (ts("10:10"), "view"),
        (ts("11:05"), "view"))
      q.processAllAvailable()
      // b2: 10:20 is LATE (older than max seen) but its window end
      // 11:00 > watermark 10:35 → must be counted; 13:00 then moves
      // the watermark to 12:30, finalizing the 10:00 and 11:00 windows
      input.addData((ts("10:20"), "view"), (ts("13:00"), "view"))
      q.processAllAvailable()
      // b3: 10:40 is TOO LATE (window end 11:00 < watermark 12:30) →
      // dropped; 15:00 advances the watermark to finalize 13:00
      input.addData((ts("10:40"), "view"), (ts("15:00"), "view"))
      q.processAllAvailable()
      val got = spark.table("win_counts")
        .select(date_format(col("wstart"), "HH:mm").as("w"),
          col("event_type"), col("n"))
        .as[(String, String, Long)].collect().toSet
      // batch oracle over exactly the not-too-late events (the
      // streamed rows minus the dropped 10:40), finalized windows only
      val kept = Seq("10:00", "10:10", "11:05", "10:20", "13:00")
        .map(h => (ts(h), "view"))
      val batch = kept.toDF("ts", "event_type")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(date_format(col("window.start"), "HH:mm").as("w"),
          col("event_type"), col("n"))
        .as[(String, String, Long)].collect().toSet
      assert(got == batch)
      // and the two planted behaviors, explicitly:
      assert(got.contains(("10:00", "view", 3L)),
        "the within-watermark late 10:20 event was not counted")
      assert(!got.exists { case (w, _, n) => w == "10:00" && n == 4L },
        "the too-late 10:40 event leaked into a finalized window")
    } finally q.stop()
  }
}
