package graft.operators

import graft.Tables
import graft.functions.TextAnalysis._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis queries over the documents corpus (SURVEY.md §2 rows
  * 26–29). Each oracle SQL is generated from the same constants as the
  * Spark expressions, so both engines evaluate the identical function.
  *
  * Scale: every query is scan → narrow codegen'd projection → one
  * groupBy shuffle on a low-cardinality key. No UDFs, no collect.
  */
object TextOps {

  // ---- shared SQL fragments (same constants as the Column exprs) ----

  private[operators] def sqlHits(words: Seq[String]): String =
    s"len(list_distinct(regexp_extract_all(t, '${stopwordRegex(words)}', 1)))"

  /** DuckDB needs the 'g' flag for global regexp_replace (Spark is
    * global by default). */
  private[operators] val sqlFingerprint =
    "md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')))"

  private[operators] val sqlNw =
    "CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END"

  /** Language-ID decision CASE over hit-count columns s_en/s_es/s_de/
    * s_fr and a `han` boolean — the shared fragment of t01 and the
    * corpus-clean cascade. */
  private[operators] val sqlPredLang: String =
    """CASE WHEN han THEN 'zh'
         WHEN s_en + s_es + s_de + s_fr = 0 THEN 'und'
         WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
         WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
         WHEN s_de >= s_fr THEN 'de'
         ELSE 'fr' END"""

  /** Quality-score arithmetic over columns nw/sh/pc/nc — shared by t02
    * and the corpus-clean cascade. */
  private[operators] val sqlQuality: String =
    """0.4 * CAST(least(nw, 200) AS DOUBLE)/200.0
     + 0.4 * CAST(sh AS DOUBLE)/CAST(greatest(nw, 1) AS DOUBLE)
     + 0.2 * (1.0 - least(CAST(pc AS DOUBLE)/CAST(greatest(nc, 1) AS DOUBLE), 1.0))"""

  // ---------------------------------------------------------------
  // t01: language ID confusion matrix — labeled lang × predicted.
  // ---------------------------------------------------------------
  def t01(s: SparkSession, dir: String): DataFrame =
    withLangId(Tables.documents(s, dir), col("text"), "pred_lang")
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))

  val t01Sql: String = {
    val m = StopwordSets.toMap
    s"""WITH d AS (SELECT lang, lower(text) AS t FROM documents),
       s AS (SELECT lang, ${sqlHits(m("en"))} AS s_en, ${sqlHits(m("es"))} AS s_es,
               ${sqlHits(m("de"))} AS s_de, ${sqlHits(m("fr"))} AS s_fr,
               regexp_matches(t, '$HanRange') AS han FROM d)
       SELECT lang, $sqlPredLang AS pred_lang,
         count(*) AS n
       FROM s GROUP BY 1, 2"""
  }

  // ---------------------------------------------------------------
  // t02: quality scoring — per-bucket counts + mean score.
  // ---------------------------------------------------------------
  def t02(s: SparkSession, dir: String): DataFrame = {
    withQuality(Tables.documents(s, dir), col("text"), "quality")
      .select(col("doc_id"), col("quality"))
      .withColumn("bucket", qualityBucket(col("quality")))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("quality"), 6).cast("decimal(25,8)")).cast("double") /
          count(lit(1))).as("mean_quality"))
  }

  val t02Sql: String =
    s"""WITH d AS (SELECT doc_id, lower(text) AS t, text, len(text) AS nc FROM documents),
       c AS (SELECT doc_id, $sqlNw AS nw,
               len(regexp_extract_all(t, '${stopwordRegex(QualityStopwords)}')) AS sh,
               len(regexp_extract_all(t, '[^a-z0-9\\s]')) AS pc, nc FROM d),
       q AS (SELECT doc_id, $sqlQuality AS quality
             FROM c)
       SELECT CASE WHEN quality >= 0.45 THEN 'HIGH'
                   WHEN quality >= 0.30 THEN 'MEDIUM' ELSE 'LOW' END AS bucket,
              count(*) AS n,
              CAST(sum(CAST(round(quality, 6) AS DECIMAL(25,8))) AS DOUBLE)/count(*) AS mean_quality
       FROM q GROUP BY 1"""

  // ---------------------------------------------------------------
  // t03: token counting per source — whitespace + BPE-ish regex.
  // ---------------------------------------------------------------
  def t03(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"), wsTokenCount(col("text")).as("ws"),
        reTokenCount(lower(col("text"))).as("re"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"), sum(col("ws")).as("ws_tokens"),
        sum(col("re")).as("re_tokens"))

  val t03Sql: String =
    s"""SELECT source, count(*) AS docs,
       CAST(sum($sqlNw) AS BIGINT) AS ws_tokens,
       CAST(sum(len(regexp_extract_all(lower(text), '$ReTokenPattern'))) AS BIGINT) AS re_tokens
       FROM documents GROUP BY 1"""

  // ---------------------------------------------------------------
  // t04: document fingerprinting — canonical digest per doc.
  // ---------------------------------------------------------------
  def t04(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        graft.plans.GraftFunctions.fingerprint(s, col("text")).as("fp"),
        col("n_chars"))

  val t04Sql: String =
    s"SELECT doc_id, $sqlFingerprint AS fp, n_chars FROM documents"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t01_lang_id" -> (t01 _),
    "t02_quality_score" -> (t02 _),
    "t03_token_count" -> (t03 _),
    "t04_fingerprint" -> (t04 _))

  val oracles: Map[String, String] = Map(
    "t01_lang_id" -> t01Sql,
    "t02_quality_score" -> t02Sql,
    "t03_token_count" -> t03Sql,
    "t04_fingerprint" -> t04Sql)
}
