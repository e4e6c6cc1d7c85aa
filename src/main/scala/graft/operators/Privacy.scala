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

  // ---------------------------------------------------------------
  // c25: k-anonymous census release — the privacy family's SECOND
  // mechanism (c18 answers "publish noisy exact-granularity counts";
  // c25 answers "publish exact counts at the coarsest granularity
  // that is safe"): every released row aggregates ≥ k documents, via
  // the classic generalization ladder over the quasi-identifier pair
  // (source, lang) — Sweeney's k-anonymity applied to the data-card
  // census. Groups of ≥ k release at full granularity (level 2);
  // smaller groups pool per source and release as (source, '*') when
  // the pool reaches k (level 1); still-small pools merge into the
  // global ('*', '*') remainder (level 0), which itself is DROPPED
  // when under k — suppression, never a small-count leak. Each
  // document is counted at EXACTLY one level (the levels partition
  // the under-k residue), deterministic end-to-end — no noise, no
  // RNG, fully oracle-checkable.
  //
  // Scale: three combiner-friendly aggregates over frames that only
  // shrink (group-cardinality after the first); nothing corpus-scale
  // survives the first shuffle.
  // ---------------------------------------------------------------

  val AnonK = 8

  /** k-anonymous (source, lang) census of a documents frame:
    * (source, lang, n, level) — released rows only, each with
    * n ≥ k; generalized cells carry '*'. */
  def kAnonymize(docs: DataFrame, k: Int = AnonK): DataFrame = {
    val g2 = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n"))
      .transform(graft.CacheRegistry.register) // feeds rel2 AND sup2
    val rel2 = g2.filter(col("n") >= k)
      .select(col("source"), col("lang"), col("n"), lit(2).as("level"))
    val g1 = g2.filter(col("n") < k)
      .groupBy(col("source")).agg(sum(col("n")).as("n"))
      .transform(graft.CacheRegistry.register) // feeds rel1 AND g0
    val rel1 = g1.filter(col("n") >= k)
      .select(col("source"), lit("*").as("lang"), col("n"), lit(1).as("level"))
    val rel0 = g1.filter(col("n") < k)
      .agg(sum(col("n")).as("n"))
      .filter(col("n").isNotNull && col("n") >= k)
      .select(lit("*").as("source"), lit("*").as("lang"), col("n"),
        lit(0).as("level"))
    rel2.unionByName(rel1).unionByName(rel0)
  }

  def c25(s: SparkSession, dir: String): DataFrame =
    kAnonymize(Tables.documents(s, dir))

  val c25Sql: String =
    s"""WITH g2 AS (SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2),
       rel2 AS (SELECT source, lang, n, 2 AS level FROM g2 WHERE n >= $AnonK),
       sup2 AS (SELECT source, n FROM g2 WHERE n < $AnonK),
       g1 AS (SELECT source, CAST(sum(n) AS BIGINT) AS n FROM sup2 GROUP BY 1),
       rel1 AS (SELECT source, '*' AS lang, n, 1 AS level FROM g1 WHERE n >= $AnonK),
       g0 AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM g1 WHERE n < $AnonK),
       rel0 AS (SELECT '*' AS source, '*' AS lang, n, 0 AS level
                FROM g0 WHERE n IS NOT NULL AND n >= $AnonK)
       SELECT source, lang, n, CAST(level AS INT) AS level FROM rel2
       UNION ALL SELECT source, lang, n, CAST(level AS INT) FROM rel1
       UNION ALL SELECT source, lang, n, CAST(level AS INT) FROM rel0"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c18_dp_census" -> (c18 _),
    "c25_k_anonymity" -> (c25 _))

  val oracles: Map[String, String] = Map(
    "c18_dp_census" -> c18Sql,
    "c25_k_anonymity" -> c25Sql)
}
