package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** c13: the corpus census / data card — the per-(source, lang) mart a
  * dataset release ships with (and the first artifact a 100 TB
  * curation run produces before anyone decides mixture weights):
  * volume (docs, whitespace tokens), exact-duplicate pressure (docs
  * whose canonical fingerprint appears more than once), degeneracy
  * (t05 repetition flags), and mean heuristic quality (t02) — each
  * signal an existing operator's column, composed into one grouped
  * report. c04's mixture weights and c12's importance targets are
  * chosen BY READING this table.
  *
  * The face corpus plants the t05 phrase-repeat degenerates (every
  * 7th doc), which are simultaneously exact dups of each other — so
  * every census column is non-vacuous under the oracle (the d08
  * lesson: an all-zero column proves nothing).
  *
  * Scale: fingerprint dup counts are a self-join on the fp key (one
  * shuffle, combiner-friendly); repetition metrics are t05's
  * two-phase rollup; quality and token counts are narrow codegen'd
  * projections; the final rollup groups ~sources x langs rows. Joins
  * are doc_id-keyed merges of per-doc signal frames.
  */
object Census {

  /** Face corpus: the t05 planting, with source/lang retained. */
  private def faceCorpus(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"), col("lang"),
      when(col("doc_id") % 7 === 0,
        rtrim(lit((TextOps.RepeatPhrase + " ") * TextOps.RepeatCount)))
        .otherwise(col("text")).as("text"))

  /** Per-(source, lang) census over any (doc_id, source, lang, text)
    * frame. */
  def census(base: DataFrame): DataFrame = {
    val s = base.sparkSession
    val withSignals = graft.functions.TextAnalysis.withQuality(
      base, col("text"), "quality")
      .select(col("doc_id"), col("source"), col("lang"),
        graft.functions.TextAnalysis.wsTokenCount(col("text")).as("nw"),
        graft.plans.GraftFunctions.fingerprint(s, col("text")).as("fp"),
        col("quality"))
      .transform(graft.CacheRegistry.register)
    val dupc = withSignals.groupBy(col("fp"))
      .agg(count(lit(1)).as("fpc"))
    val rep = TextOps.repetitionMetrics(base.select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("repetitive"))
    withSignals
      .join(dupc, "fp")
      .join(rep, Seq("doc_id"), "left")
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("docs"),
        sum(col("nw")).cast("bigint").as("tokens"),
        sum(when(col("fpc") > 1, 1L).otherwise(0L)).as("dup_docs"),
        sum(coalesce(col("repetitive"), lit(0L))).as("rep_docs"),
        (sum(round(col("quality"), 6).cast("decimal(25,8)")).cast("double") /
          count(lit(1))).as("mean_quality"))
  }

  def c13(s: SparkSession, dir: String): DataFrame =
    census(faceCorpus(Tables.documents(s, dir)))

  val c13Sql: String = {
    import TextOps.{RepeatCount, RepeatPhrase}
    raw"""WITH src AS (SELECT doc_id, source, lang,
             CASE WHEN doc_id % 7 = 0 THEN rtrim(repeat('$RepeatPhrase ', $RepeatCount))
                  ELSE text END AS text FROM documents),
       d AS (SELECT doc_id, source, lang, lower(text) AS t, text, len(text) AS nc FROM src),
       c AS (SELECT doc_id, source, lang, ${TextOps.sqlNw} AS nw,
               len(regexp_extract_all(t, '${graft.functions.TextAnalysis.stopwordRegex(graft.functions.TextAnalysis.QualityStopwords)}')) AS sh,
               len(regexp_extract_all(t, '[^a-z0-9\s]')) AS pc, nc,
               ${TextOps.sqlFingerprint} AS fp
             FROM d),
       q AS (SELECT doc_id, source, lang, nw, fp, ${TextOps.sqlQuality} AS quality FROM c),
       dupc AS (SELECT fp, count(*) AS fpc FROM q GROUP BY 1),
       ${TextOps.repetitionCtes("src")}
       SELECT source, lang, count(*) AS docs,
         CAST(sum(nw) AS BIGINT) AS tokens,
         CAST(sum(CASE WHEN fpc > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs,
         CAST(sum(coalesce(repetitive, 0)) AS BIGINT) AS rep_docs,
         CAST(sum(CAST(round(quality, 6) AS DECIMAL(25,8))) AS DOUBLE)/count(*) AS mean_quality
       FROM q
       JOIN dupc USING (fp)
       LEFT JOIN rep USING (doc_id)
       GROUP BY 1, 2"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c13_corpus_census" -> (c13 _))

  val oracles: Map[String, String] = Map(
    "c13_corpus_census" -> c13Sql)
}
