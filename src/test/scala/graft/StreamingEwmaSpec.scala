package graft

import graft.streaming.Alerts
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Row 41q: streaming EWMA control chart — O(1)-state Phase II
  * monitoring with exact batch/stream parity on the shared lattice
  * (the 41j CUSUM pattern applied to f32's recursion). */
class StreamingEwmaSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, i: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d ${i % 24}%02d:00:00")

  /** f32's gap timeline: 20 days at 4/day, a 3-day silent gap, 5 days
    * at 9/day — alarms LOW on gap day 23 (zero-fill pulls the chart
    * out the bottom) and HIGH on day 28. */
  private val gappy: Seq[(Timestamp, Long)] =
    (1 to 20).flatMap(d => (0 until 4).map(i => (ts(d, i), 1L))) ++
      (24 to 28).flatMap(d => (0 until 9).map(i => (ts(d, i), 1L)))

  /** Phase I estimates exactly as the batch face derives them. */
  private def phase1(xs: Seq[Long]): (Double, Double) = {
    val nd = xs.size
    val sx = xs.sum
    val sxx = xs.map(x => x * x).sum
    (sx.toDouble / nd,
      math.sqrt((nd * sxx - sx * sx).toDouble / (nd.toDouble * nd)))
  }

  test("stream alarms == batch f32 alarms on the same data + baseline") {
    implicit val sqlCtx = spark.sqlContext
    val batch = graft.operators.Velocity
      .ewmaChart(gappy.toDF("ts", "user_id"))
      .as[(Long, String, Long, Double, Double, Double, String)]
      .collect().toSet
    // non-vacuous, and the gap day itself alarms low
    assert(batch.map(r => (r._2, r._7)) ==
      Set(("2024-01-23", "low"), ("2024-01-28", "high")))
    val (mu, sd) = phase1(Seq.fill(20)(4L) ++ Seq.fill(3)(0L) ++
      Seq.fill(5)(9L))
    val baseline = Seq((1L, mu, sd)).toDF("user_id", "mu", "sd")
    val input = MemoryStream[(Timestamp, Long)]
    val q = Alerts.ewmaGate(input.toDF().toDF("ts", "user_id"), baseline)
      .writeStream.format("memory").queryName("ewma_gate")
      .outputMode("append").start()
    try {
      // two triggers: (s, q) must carry across micro-batches, and the
      // split lands MID-GAP so the zero-fill spans a trigger boundary;
      // a sentinel far past the end folds the final day (comparison is
      // on the shared lattice)
      input.addData(gappy.takeWhile(_._1.getTime <= ts(22, 0).getTime): _*)
      q.processAllAvailable()
      input.addData(gappy.dropWhile(_._1.getTime <= ts(22, 0).getTime) :+
        ((Timestamp.valueOf("2024-02-10 00:00:00"), 1L)): _*)
      q.processAllAvailable()
      val got = spark.table("ewma_gate")
        .filter(col("day") <= "2024-01-28")
        .as[(Long, String, Long, Double, Double, Double, String)]
        .collect().toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("no Phase I baseline: the gate accumulates nothing and never alarms") {
    implicit val sqlCtx = spark.sqlContext
    val baseline = Seq.empty[(Long, Double, Double)]
      .toDF("user_id", "mu", "sd")
    val input = MemoryStream[(Timestamp, Long)]
    val q = Alerts.ewmaGate(input.toDF().toDF("ts", "user_id"), baseline)
      .writeStream.format("memory").queryName("ewma_cold")
      .outputMode("append").start()
    try {
      // a wild burst that would alarm any chart — but there are no
      // limits without Phase I estimates (Montgomery's convention)
      input.addData((1 to 5).flatMap(d =>
        (0 until 20).map(i => (ts(d, i), 7L))) :+ ((ts(9, 0), 7L)): _*)
      q.processAllAvailable()
      assert(spark.table("ewma_cold").isEmpty)
    } finally q.stop()
  }
}
