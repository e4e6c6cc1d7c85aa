package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** f22: Benford first-digit analysis — the classic forensic-accounting
  * fraud signal (fabricated prices/amounts systematically violate the
  * logarithmic first-digit law that organic transaction amounts
  * follow; a seller whose price book is invented shows a flat or
  * spiked digit histogram). Per group, the face emits the full
  * first-digit distribution (all 9 digits — a zero-count digit is
  * evidence, so the lattice is completed before comparison) plus the
  * chi-square goodness-of-fit statistic against the Benford
  * expectation p(d) = log10(1 + 1/d).
  *
  * Reference anchor: extends the reference's price-plausibility family
  * (regex_analyzer.py market-stats z-scores flag WHICH price is
  * anomalous; Benford flags WHOSE price generator is anomalous) — the
  * per-seller/per-segment aggregate view its dashboard-level fraud
  * review needs.
  *
  * Oracle-parity rules applied (SURVEY §4): the Benford probabilities
  * are shipped to BOTH engines as shortest-round-trip string-cast
  * double literals (computed once here in Scala); every chi-square
  * term is rounded to 6 then summed through DECIMAL so the group
  * statistic is aggregation-order-independent; counts stay BIGINT
  * end-to-end.
  *
  * Scale: one combiner-friendly shuffle on (group, digit) — 9 cells
  * per group; the digit lattice completion is a broadcast join against
  * the tiny distinct-group frame; the chi-square is a 9-row window per
  * group. Nothing corpus-scale survives the first aggregation.
  */
object Benford {

  /** Benford expectation per digit, pinned once in Scala — the Spark
    * plan takes the Double, the oracle its shortest-round-trip string
    * form (`CAST('<p>' AS DOUBLE)` — a bare SQL decimal literal would
    * be DECIMAL-typed and could re-round mid-expression). */
  val BenfordP: Seq[(Int, Double)] =
    (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d))

  /** First-digit distribution + chi-square per group of any
    * (group, amount) frame: one row per (group, digit 1..9) with the
    * observed count, group total, Benford-expected count and the
    * group's chi-square statistic. Amounts < 1 are excluded (no
    * leading digit in the integer part). */
  def benford(rows: DataFrame): DataFrame = {
    val obs = rows.filter(col("amount") >= 1)
      .select(col("grp"),
        substring(floor(col("amount")).cast("bigint").cast("string"), 1, 1)
          .cast("bigint").as("digit"))
      .groupBy(col("grp"), col("digit"))
      .agg(count(lit(1)).as("obs"))
    val lattice = obs.select(col("grp")).distinct()
      .select(col("grp"),
        explode(sequence(lit(1L), lit(9L))).as("digit"))
    val pCol = BenfordP.foldLeft(lit(0.0)) { case (acc, (d, p)) =>
      when(col("digit") === d, lit(p)).otherwise(acc)
    }
    val wg = Window.partitionBy(col("grp"))
    val full = lattice.join(obs, Seq("grp", "digit"), "left")
      .select(col("grp"), col("digit"),
        coalesce(col("obs"), lit(0L)).as("obs"))
      .withColumn("n", sum(col("obs")).over(wg).cast("bigint"))
      .withColumn("expected", col("n").cast("double") * pCol)
    full
      .withColumn("term",
        round(((col("obs").cast("double") - col("expected")) *
          (col("obs").cast("double") - col("expected"))) / col("expected"), 6))
      .withColumn("chi2",
        sum(col("term").cast("decimal(25,8)")).over(wg).cast("double"))
      .select(col("grp"), col("digit"), col("obs"), col("n"),
        round(col("expected"), 6).as("expected"), col("chi2"))
  }

  /** f22 face: order totals by priority class. */
  def f22(s: SparkSession, dir: String): DataFrame =
    benford(Tables.orders(s, dir).select(
      col("o_orderpriority").as("grp"), col("o_totalprice").as("amount")))

  val f22Sql: String = {
    val pCase = BenfordP.map { case (d, p) =>
      s"WHEN $d THEN CAST('$p' AS DOUBLE)"
    }.mkString(" ")
    s"""WITH src AS (SELECT o_orderpriority AS grp, o_totalprice AS amount
                   FROM orders WHERE o_totalprice >= 1),
       o AS (SELECT grp,
               CAST(substring(CAST(CAST(floor(amount) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
               count(*) AS obs
             FROM src GROUP BY 1, 2),
       lat AS (SELECT grp, CAST(g.digit AS BIGINT) AS digit
               FROM (SELECT DISTINCT grp FROM o),
                    LATERAL (SELECT unnest(generate_series(1, 9)) AS digit) g),
       full0 AS (SELECT l.grp, l.digit,
                   CAST(coalesce(o.obs, 0) AS BIGINT) AS obs
                 FROM lat l LEFT JOIN o ON l.grp = o.grp AND l.digit = o.digit),
       full1 AS (SELECT grp, digit, obs,
                   CAST(sum(obs) OVER (PARTITION BY grp) AS BIGINT) AS n
                 FROM full0),
       e AS (SELECT grp, digit, obs, n,
               CAST(n AS DOUBLE) * (CASE digit $pCase END) AS expected
             FROM full1),
       t AS (SELECT grp, digit, obs, n, expected,
               round(((CAST(obs AS DOUBLE) - expected) * (CAST(obs AS DOUBLE) - expected)) / expected, 6) AS term
             FROM e)
       SELECT grp, digit, obs, n, round(expected, 6) AS expected,
         CAST(sum(CAST(term AS DECIMAL(25,8))) OVER (PARTITION BY grp) AS DOUBLE) AS chi2
       FROM t"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f22_benford" -> (f22 _))

  val oracles: Map[String, String] = Map(
    "f22_benford" -> f22Sql)
}
