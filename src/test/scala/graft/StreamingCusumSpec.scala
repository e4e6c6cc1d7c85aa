package graft

import graft.streaming.Alerts
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Row 41j: streaming CUSUM — O(1)-state changepoint detection with
  * exact batch/stream parity on the shared lattice. */
class StreamingCusumSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, i: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d ${i % 24}%02d:00:00")

  /** the f25 creep timeline: 10 days at 1/day then 10 at 4/day. */
  private val creep: Seq[(Timestamp, Long)] =
    (1 to 10).map(d => (ts(d, 0), 1L)) ++
      (11 to 20).flatMap(d => (0 until 4).map(i => (ts(d, i), 1L)))

  test("stream alarms == batch f25 alarms on the same data + baseline") {
    implicit val sqlCtx = spark.sqlContext
    val batch = graft.operators.Velocity.cusum(creep.toDF("ts", "user_id"))
      .select(col("user_id"), col("day"), col("x"),
        col("cusum_num"), col("nd"))
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty)
    // the stream gets the SAME baseline the batch derives (sum over
    // the lattice, lattice size), plus a sentinel far past the end so
    // the final day folds; comparison is on the shared lattice
    val baseline = Seq((1L, creep.size.toLong, 20L))
      .toDF("user_id", "sum_n", "nd")
    val input = MemoryStream[(Timestamp, Long)]
    val q = Alerts.cusumGate(input.toDF().toDF("ts", "user_id"), baseline)
      .writeStream.format("memory").queryName("cusum_gate")
      .outputMode("append").start()
    try {
      // two triggers: state must carry P/minP across micro-batches
      input.addData(creep.take(25): _*)
      q.processAllAvailable()
      input.addData(creep.drop(25) :+ ((ts(28, 0), 1L)): _*)
      q.processAllAvailable()
      val got = spark.table("cusum_gate")
        .filter(col("day") <= "2024-01-20")
        .as[(Long, String, Long, Long, Long)].collect().toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("day-1 excess: stream and batch both alarm on the first lattice day") {
    implicit val sqlCtx = spark.sqlContext
    // 10 events on day 1, 1 on day 10 — the virtual-P_0 case: the
    // very first folded day must alarm in BOTH engines (the batch
    // prefix min includes 0; the stream's minP is seeded at 0)
    val burst: Seq[(Timestamp, Long)] =
      (0 until 10).map(i => (ts(1, i), 1L)) :+ ((ts(10, 0), 1L))
    val batch = graft.operators.Velocity.cusum(burst.toDF("ts", "user_id"))
      .select(col("user_id"), col("day"), col("x"),
        col("cusum_num"), col("nd"))
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(batch.exists(_._2 == "2024-01-01"))
    val baseline = Seq((1L, 11L, 10L)).toDF("user_id", "sum_n", "nd")
    val input = MemoryStream[(Timestamp, Long)]
    val q = Alerts.cusumGate(input.toDF().toDF("ts", "user_id"), baseline)
      .writeStream.format("memory").queryName("cusum_day1")
      .outputMode("append").start()
    try {
      input.addData(burst :+ ((ts(12, 0), 1L)): _*)
      q.processAllAvailable()
      val got = spark.table("cusum_day1")
        .filter(col("day") <= "2024-01-10")
        .as[(Long, String, Long, Long, Long)].collect().toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("cold-start user (no baseline) runs the absolute k/day CUSUM") {
    implicit val sqlCtx = spark.sqlContext
    val baseline = Seq.empty[(Long, Long, Long)]
      .toDF("user_id", "sum_n", "nd")
    val input = MemoryStream[(Timestamp, Long)]
    val q = Alerts.cusumGate(input.toDF().toDF("ts", "user_id"), baseline)
      .writeStream.format("memory").queryName("cusum_cold")
      .outputMode("append").start()
    try {
      // 3/day for 3 days: excess (3-1)/day accumulates 2, 4, 6 ≥ h=4
      // from day 2 onward (nd=1 scaling)
      input.addData((1 to 3).flatMap(d =>
        (0 until 3).map(i => (ts(d, i), 9L))) :+ ((ts(9, 0), 9L)): _*)
      q.processAllAvailable()
      val got = spark.table("cusum_cold")
        .select("day").as[String].collect().toSet
      assert(got.contains("2024-01-02") && got.contains("2024-01-03"))
      assert(!got.contains("2024-01-01"))
    } finally q.stop()
  }

  test("41k quota gate: first-K admitted, counter survives triggers") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.Alerts.quotaGate(
        input.toDF().toDF("doc_id", "source"), quota = 3)
      .writeStream.format("memory").queryName("quota_gate")
      .outputMode("append").start()
    try {
      input.addData((1L, "a"), (2L, "a"), (5L, "b"))
      q.processAllAvailable()
      // second trigger crosses a's quota: only one more admit
      input.addData((3L, "a"), (4L, "a"), (6L, "b"))
      q.processAllAvailable()
      val got = spark.table("quota_gate")
        .select("doc_id", "source", "admitted")
        .as[(Long, String, Boolean)].collect().toSet
      assert(got == Set(
        (1L, "a", true), (2L, "a", true), (3L, "a", true),
        (4L, "a", false), // quota 3 crossed — state carried over
        (5L, "b", true), (6L, "b", true)))
    } finally q.stop()
  }
}