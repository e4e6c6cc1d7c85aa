package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * baseline is a second tiny aggregate broadcast back. Nothing
  * event-scale survives the first aggregation; no windows, no sorts.
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
    perDay.join(broadcast(base), "user_id")
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f23_user_burst" -> (f23 _))

  val oracles: Map[String, String] = Map(
    "f23_user_burst" -> f23Sql)
}
