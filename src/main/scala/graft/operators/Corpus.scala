package graft.operators

import graft.Tables
import graft.functions.TextAnalysis._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus cleaning — the composition an LLM training-data
  * pipeline actually runs over a raw crawl, assembled from the
  * individually oracle-checked pieces (t01 language ID, t02 quality
  * score, d01 exact dedup, d02 near-dup pairs):
  *
  *   1. language ID (narrow map) — drop undetermined docs;
  *   2. quality gate (narrow map) — drop docs below MinQuality;
  *   3. exact dedup — keep the lowest doc_id per canonical
  *      fingerprint (ONE shuffle: window over fp, not groupBy+join);
  *   4. near-dup removal — of each high-Jaccard pair among the
  *      survivors, drop the higher doc_id.
  *
  * Scale: steps 1–2 are codegen'd projections that fuse into the scan;
  * step 3 is one hash shuffle on the digest; step 4 inherits d02's
  * bounded-candidates plan (maxDf cap by default). Nothing touches
  * the driver.
  */
object Corpus {

  val MinQuality = 0.30

  /** Survivors of the cleaning cascade: (doc_id, pred_lang, quality).
    * `docs` needs (doc_id, text). */
  def clean(docs: DataFrame,
      maxDf: Option[Int] = Some(Dedup.DefaultMaxDf)): DataFrame = {
    // Cache the SLIM scored state (3 narrow columns, never text)
    // BEFORE the gate filter: a trailing filter on computed columns
    // substitutes the whole scoring tree into the Filter (the §5
    // pushdown hazard — 45 static graft_textstats references when the
    // gate sat directly on the scoring projection), while a filter
    // over InMemoryTableScan attributes leaves the fused pass
    // evaluated exactly ONCE per row in the cache build. The text
    // consumers (fingerprint window, pairing) re-read (doc_id, text)
    // from the source scan via semi joins on the gated/surviving ids —
    // at 100 TB a text-bearing cache is a memory hazard, and the
    // doc_id semi joins prune those scans instead. PlanSpec pins the
    // reference count.
    val scored = withLangQuality(docs, col("text"), "pred_lang", "quality")
      .select(col("doc_id"), col("pred_lang"), col("quality"))
      .transform(graft.CacheRegistry.register)
    val gated = scored
      .filter(col("pred_lang") =!= "und" && col("quality") >= MinQuality)
    val gatedText = docs.select(col("doc_id"), col("text"))
      .join(gated.select(col("doc_id")), Seq("doc_id"), "left_semi")
    val w = Window.partitionBy(col("fp")).orderBy(col("doc_id").asc)
    val uniqIds = gatedText
      .withColumn("fp", graft.plans.GraftFunctions.fingerprint(
        docs.sparkSession, col("text")))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("doc_id"))
    val survivors = gated.join(uniqIds, Seq("doc_id"), "left_semi")
    val survivorText = docs.select(col("doc_id"), col("text"))
      .join(survivors.select(col("doc_id")), Seq("doc_id"), "left_semi")
    val drops = Dedup.jaccardPairs(survivorText, maxDf)
      .select(col("b").as("doc_id")).distinct()
    survivors.join(drops, Seq("doc_id"), "left_anti")
  }

  def c01(s: SparkSession, dir: String): DataFrame =
    // oracle face pins maxDf = None (DuckDB replays exhaustive pairs)
    clean(Tables.documents(s, dir), maxDf = None)

  lazy val c01Sql: String = {
    val m = StopwordSets.toMap
    raw"""WITH d0 AS (SELECT doc_id, text, lower(text) AS t, len(text) AS nc FROM documents),
       hits AS (SELECT *, ${TextOps.sqlHits(m("en"))} AS s_en, ${TextOps.sqlHits(m("es"))} AS s_es,
                ${TextOps.sqlHits(m("de"))} AS s_de, ${TextOps.sqlHits(m("fr"))} AS s_fr,
                regexp_matches(t, '$HanRange') AS han,
                ${TextOps.sqlNw} AS nw,
                len(regexp_extract_all(t, '${stopwordRegex(QualityStopwords)}')) AS sh,
                len(regexp_extract_all(t, '[^a-z0-9\s]')) AS pc
                FROM d0),
       scored AS (SELECT doc_id, text,
                ${TextOps.sqlPredLang} AS pred_lang,
                ${TextOps.sqlQuality} AS quality
                FROM hits),
       gated AS (SELECT * FROM scored WHERE pred_lang <> 'und' AND quality >= $MinQuality),
       uniq AS (SELECT doc_id, text, pred_lang, quality FROM
                (SELECT *, ${TextOps.sqlFingerprint} AS fp FROM gated)
                QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1),
       toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w FROM uniq),
       sh2 AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
               FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(w)-2, 0))) AS i)),
       sizes AS (SELECT doc_id, count(*) AS n FROM sh2 GROUP BY 1),
       inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
                 FROM sh2 a JOIN sh2 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                 GROUP BY 1, 2),
       drops AS (SELECT DISTINCT b AS doc_id FROM inter
                 JOIN sizes sa ON a = sa.doc_id JOIN sizes sb ON b = sb.doc_id
                 WHERE CAST(inter AS DOUBLE)/(sa.n + sb.n - inter) >= ${Dedup.JaccardThreshold})
       SELECT doc_id, pred_lang, quality FROM uniq
       WHERE doc_id NOT IN (SELECT doc_id FROM drops)"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c01_corpus_clean" -> (c01 _))

  val oracles: Map[String, String] = Map(
    "c01_corpus_clean" -> c01Sql)
}
