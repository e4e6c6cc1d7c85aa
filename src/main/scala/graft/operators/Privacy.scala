package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** c18: differentially-private census release — the Laplace mechanism
  * over per-source document counts, the noised data-card numbers a
  * corpus release publishes when exact per-domain counts would leak
  * membership (c13 publishes the exact census; c18 is its private
  * counterpart at sensitivity 1).
  *
  * The mechanism is the REAL inverse-CDF Laplace transform; only the
  * underlying uniform is derandomized — u = (md5-prefix mod 2^52 +
  * 0.5) / 2^52 of a salted source key — so the release is
  * reproducible across runs/engines and the whole face stays
  * oracle-checkable (true RNG noise would be unverifiable; the
  * Gumbel-key precedent from c02/c14 applied to noise). The +0.5
  * half-step keeps u strictly inside (0,1) and off the 0.5 atom, so
  * ln(1 − 2|u−1/2|) is always finite. ε ships string-pinned; the
  * noised count is rounded to 6 (the ln precedent).
  *
  * Scale: one combiner-friendly count shuffle; the noise is a narrow
  * per-group projection — nothing corpus-scale survives the
  * aggregation.
  */
object Privacy {

  val Epsilon = 1.0
  /** 2^52 — the derandomized uniform's resolution. */
  val UniformScale = 4503599627370496L

  /** Derandomized Laplace(1/ε) noise keyed on a string column. */
  def laplaceNoise(s: SparkSession, key: Column, eps: Double): Column = {
    val u = (pmod(graft.plans.GraftFunctions.md5Prefix60(s,
      concat(lit("dp:"), key)), lit(UniformScale)).cast("double") + lit(0.5)) /
      lit(UniformScale.toDouble)
    val d = u - lit(0.5)
    -(lit(1.0) / lit(eps)) * signum(d) * log(lit(1.0) - lit(2.0) * abs(d))
  }

  def c18(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"))
      .select(col("source"), col("n"),
        round(col("n") + laplaceNoise(s, col("source"), Epsilon), 6)
          .as("noisy_n"),
        lit(Epsilon).as("epsilon"))

  val c18Sql: String = {
    val eps = s"CAST('$Epsilon' AS DOUBLE)"
    s"""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
       u AS (SELECT source, n,
               ((CAST(('0x' || substring(md5('dp:' || source), 1, 15)) AS BIGINT)
                 % $UniformScale) + 0.5) / $UniformScale AS u
             FROM c)
       SELECT source, n,
         round(n + (-(1.0 / $eps) * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5))), 6) AS noisy_n,
         $eps AS epsilon
       FROM u"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c18_dp_census" -> (c18 _))

  val oracles: Map[String, String] = Map(
    "c18_dp_census" -> c18Sql)
}
