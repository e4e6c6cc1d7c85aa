package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q28: session path analysis — the "what do users actually DO"
  * report q10's session counts can't answer: per session, the
  * ordered sequence of event types (capped at the first `MaxSteps`
  * steps), then the top paths by session count with their share —
  * the navigation-flow table behind every product-analytics funnel
  * exploration.
  *
  * Sessions are q10's rule verbatim (30-min inactivity gap, (ts,
  * event_id) order); the session id is the running sum of
  * new-session flags per user — a second window on the SAME
  * partitioning, so no extra shuffle. The path string is an ORDERED
  * aggregation — made engine-portable by ranking events inside the
  * session and string-aggregating rank-filtered rows (Spark:
  * sort_array over (rank, type) structs; DuckDB: string_agg ORDER
  * BY), with (ts, event_id) the total tie-break.
  *
  * Scale: two windows on one user-keyed shuffle, a per-session
  * rollup, and a path-cardinality count (combiner-friendly — path
  * strings repeat heavily, which is the point of the report). The
  * top-k cut is a distributed TakeOrdered; nothing global sorts.
  */
object Paths {

  val GapUs = 1800000000L // 30 min, the q10 constant
  val MaxSteps = 8
  val TopK = 25

  def q28(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val sessions = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("us") - col("prev_us") > GapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
    val ws = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    val paths = sessions
      .withColumn("step", row_number().over(ws))
      .filter(col("step") <= MaxSteps)
      .groupBy(col("user_id"), col("session_id"))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("step"), col("event_type")))),
        e => e.getField("event_type")), "->").as("path"))
    // counts feeds BOTH the top-k cut and the total — cache it or the
    // whole session pipeline (scan + two windows + path build) runs
    // twice (plan-asserted: one user exchange in the shared subtree)
    val counts = paths.groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .transform(graft.CacheRegistry.register)
    val total = counts.agg(sum(col("n_sessions")).as("total"))
    counts.orderBy(col("n_sessions").desc, col("path").asc).limit(TopK)
      .crossJoin(broadcast(total))
      .select(col("path"), col("n_sessions"),
        round(col("n_sessions").cast("double") / col("total"), 6).as("share"))
  }

  val q28Sql: String =
    s"""WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
             FROM events),
       flagged AS (SELECT user_id, event_id, event_type, us,
                CASE WHEN lag(us) OVER w IS NULL
                          OR us - lag(us) OVER w > $GapUs
                     THEN 1 ELSE 0 END AS new_session
              FROM ev
              WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
       sess AS (SELECT user_id, event_id, event_type, us,
                  sum(new_session) OVER (PARTITION BY user_id
                    ORDER BY us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS session_id
                FROM flagged),
       stepped AS (SELECT user_id, session_id, event_type, us, event_id,
                     row_number() OVER (PARTITION BY user_id, session_id
                       ORDER BY us, event_id) AS step
                   FROM sess),
       paths AS (SELECT user_id, session_id,
                   string_agg(event_type, '->' ORDER BY step) AS path
                 FROM stepped WHERE step <= $MaxSteps GROUP BY 1, 2),
       counts AS (SELECT path, count(*) AS n_sessions FROM paths GROUP BY 1),
       t AS (SELECT CAST(sum(n_sessions) AS BIGINT) AS total FROM counts),
       top AS (SELECT path, n_sessions FROM counts
               ORDER BY n_sessions DESC, path LIMIT $TopK)
       SELECT path, n_sessions,
         round(CAST(n_sessions AS DOUBLE) / total, 6) AS share
       FROM top CROSS JOIN t"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_top_paths" -> (q28 _))

  val oracles: Map[String, String] = Map(
    "q28_top_paths" -> q28Sql)
}
