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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f23_user_burst" -> (f23 _),
    "f24_ks_drift" -> (f24 _))

  val oracles: Map[String, String] = Map(
    "f23_user_burst" -> f23Sql,
    "f24_ks_drift" -> f24Sql)
}
