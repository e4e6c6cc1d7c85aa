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
  * bounded-candidates plan (census-routed gear by default). Nothing touches
  * the driver.
  */
object Corpus {

  val MinQuality = 0.30

  // ---------------------------------------------------------------
  // c08: line-level boilerplate removal — the RefinedWeb/CCNet-style
  // pass d09 motivates but nothing previously REMOVED: d02/d09 find
  // template-heavy near-DUPLICATE DOCS, while the shared template
  // lines themselves (headers/footers/nav text repeated across many
  // docs) stay in every survivor's text. stripBoilerplate drops the
  // lines, not the docs: explode docs to lines, census line document-
  // frequency, drop lines appearing in more than MaxLineDf distinct
  // docs, reassemble each doc's surviving lines in original order.
  //
  // Scale shape (100 TB): the census is ONE shuffle on the line string
  // with partial aggregation (distinct lines compress per partition —
  // boilerplate is by definition massively repeated, so the map-side
  // combine does most of the work); the hot set (lines with df >
  // MaxLineDf) is small by construction — bounded by total_lines /
  // MaxLineDf distinct values and in practice a handful of template
  // strings — so AQE turns the anti-join into a broadcast; reassembly
  // is one doc_id shuffle. The exploded lines frame is deliberately
  // NOT cached (two source scans instead): a text-bearing cache is a
  // memory hazard at corpus scale — the same rationale as clean()'s
  // slim scored cache.
  // ---------------------------------------------------------------

  /** A line is boilerplate when it appears in more than this many
    * distinct docs. Absolute-df convention (RefinedWeb-style); tune
    * per corpus scale. */
  val MaxLineDf = 10

  /** Tokens per body line in the planted test corpus. */
  val LineTokens = 8

  // Planted lines for the c08 face: the documents table is single-line
  // by construction, so the face derives a deterministic line-
  // structured corpus (the d09 pattern applied at line level). The
  // header is on EVERY doc (df = corpus size), the promo on every 3rd
  // (df ~ n/3 — boilerplate at any tested sf), the rare notice on
  // every 100th (df = 5 at sf0.01 — under MaxLineDf, must survive).
  private[graft] val HeaderLine =
    "graft header line shared across every document in this corpus"
  private[graft] val PromoLine =
    "promotional banner planted on every third document"
  private[graft] val RareLine =
    "rare archival notice shared by a handful of documents"

  /** Column expr: single-line `text` re-chunked into
    * `lineTokens`-token lines joined by \n — the line-structured view
    * of a token stream. */
  private def chunkedBody(lineTokens: Int): org.apache.spark.sql.Column = {
    val w = split(col("text"), " ")
    val nLines = greatest(ceil(size(w) / lit(lineTokens.toDouble)), lit(1))
      .cast("int")
    array_join(
      transform(sequence(lit(0), nLines - 1),
        i => array_join(slice(w, i * lineTokens + 1, lit(lineTokens)), " ")),
      "\n")
  }

  /** Single-line corpus → line-structured corpus (token-chunked body,
    * no planting) — turns e.g. the d09 boilerplate corpus's leading
    * template block into repeated whole lines stripBoilerplate can
    * census. */
  def chunkLines(docs: DataFrame, lineTokens: Int = LineTokens): DataFrame =
    docs.select(col("doc_id"), chunkedBody(lineTokens).as("text"))

  /** Deterministic line-structured derivation of a single-line corpus:
    * body split into [[LineTokens]]-token lines (per-doc unique except
    * exact-dup docs), header/promo/rare lines planted by doc_id. */
  def plantedLineCorpus(docs: DataFrame): DataFrame =
    // concat_ws skips NULL args in both engines, so the conditional
    // lines drop out of non-matching docs without an empty-line gap
    docs.select(col("doc_id"),
      concat_ws("\n",
        lit(HeaderLine),
        when(col("doc_id") % 3 === 0, PromoLine),
        chunkedBody(LineTokens),
        when(col("doc_id") % 100 === 0, RareLine)).as("text"))

  /** Line-level boilerplate removal over any (doc_id, text) frame.
    * Returns (doc_id, clean_text, n_kept); a doc whose every line was
    * boilerplate disappears (nothing left to train on). Blank lines
    * are structure, not content: excluded from the census (so they
    * can never be "boilerplate") and always kept. */
  def stripBoilerplate(docs: DataFrame,
      maxLineDf: Int = MaxLineDf): DataFrame = {
    val lines = docs.select(col("doc_id"),
      posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
    val hot = lines
      .filter(trim(col("line")) =!= "")
      .groupBy(col("line"))
      .agg(countDistinct(col("doc_id")).as("line_df"))
      .filter(col("line_df") > maxLineDf)
      .select(col("line"))
    val kept = lines.join(hot, Seq("line"), "left_anti")
    kept.groupBy(col("doc_id"))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")), "\n").as("clean_text"),
        count(lit(1)).as("n_kept"))
  }

  def c08(s: SparkSession, dir: String): DataFrame =
    stripBoilerplate(plantedLineCorpus(Tables.documents(s, dir)))

  /** The plantedLineCorpus replay as CTE text over `src` (doc_id,
    * text): defines `base` and `lc(doc_id, text)`. */
  def lineCorpusCtes(src: String): String =
    raw"""base AS (SELECT doc_id, string_split(text, ' ') AS w FROM $src),
       lc AS (SELECT doc_id, concat_ws(chr(10),
               '$HeaderLine',
               CASE WHEN doc_id % 3 = 0 THEN '$PromoLine' END,
               array_to_string(list_transform(
                 generate_series(0, greatest(CAST(ceil(len(w)/$LineTokens.0) AS INT), 1)-1),
                 i -> array_to_string(w[i*$LineTokens+1 : i*$LineTokens+$LineTokens], ' ')), chr(10)),
               CASE WHEN doc_id % 100 = 0 THEN '$RareLine' END) AS text
             FROM base)"""

  /** The stripBoilerplate replay as CTE text over `src` (doc_id,
    * text): defines `lines/census/hot/kept` and
    * `stripped(doc_id, clean_text, n_kept)`. */
  def stripCtes(src: String, maxLineDf: Int = MaxLineDf): String =
    raw"""lines AS (SELECT doc_id, i-1 AS pos, ln[i] AS line FROM
                 (SELECT doc_id, string_split(text, chr(10)) AS ln FROM $src),
                 LATERAL (SELECT unnest(generate_series(1, len(ln))) AS i)),
       census AS (SELECT line, count(DISTINCT doc_id) AS line_df FROM lines
                  WHERE trim(line) <> '' GROUP BY 1),
       hot AS (SELECT line FROM census WHERE line_df > $maxLineDf),
       kept AS (SELECT * FROM lines WHERE line NOT IN (SELECT line FROM hot)),
       stripped AS (SELECT doc_id,
              string_agg(line, chr(10) ORDER BY pos) AS clean_text,
              CAST(count(*) AS BIGINT) AS n_kept
              FROM kept GROUP BY doc_id)"""

  val c08Sql: String =
    s"""WITH ${lineCorpusCtes("documents")},
       ${stripCtes("lc")}
       SELECT doc_id, clean_text, n_kept FROM stripped"""

  /** Survivors of the cleaning cascade: (doc_id, pred_lang, quality).
    * `docs` needs (doc_id, text). `stripLineDf`: when set, run
    * [[stripBoilerplate]] at that df threshold BEFORE the gates, so
    * language/quality scoring, dedup fingerprints and near-dup pairing
    * all see boilerplate-free text (shared template lines otherwise
    * drag every doc's shingle sets toward each other — the d09
    * failure shape). `repetitionGate`: drop docs TextOps.
    * repetitionMetrics flags as repetitive BEFORE the cascade — the
    * phrase-repeat degenerates t02's score cannot see (they read as
    * long, punctuation-free, stopword-bearing = HIGH). */
  /** The pre-cascade gate pipeline (strip → repetition → Gopher) —
    * shared verbatim by [[clean]] (in-plan) and [[cleanStaged]]
    * (materialized), so the two postures can never drift. */
  private def preStages(docs: DataFrame,
      stripLineDf: Option[Int],
      repetitionGate: Boolean,
      gopherGate: Boolean): DataFrame = {
    val stripped = stripLineDf match {
      case Some(k) => stripBoilerplate(docs, k)
        .select(col("doc_id"), col("clean_text").as("text"))
      case None => docs
    }
    val afterRep =
      if (!repetitionGate) stripped
      else stripped.join(
        TextOps.repetitionMetrics(stripped)
          .filter(col("repetitive") === 1L).select(col("doc_id")),
        Seq("doc_id"), "left_anti")
    // optional Gopher rule battery (t11), the batch twin of the 41o
    // ingest gate: any failed rule rejects the doc before the cascade
    if (!gopherGate) afterRep
    else afterRep.join(
      TextOps.gopherFlags(afterRep.select(col("doc_id"), col("text")))
        .filter(TextOps.gopherFail)
        .select(col("doc_id")),
      Seq("doc_id"), "left_anti")
  }

  def clean(docs: DataFrame,
      gear: Dedup.GearSpec = Dedup.Routed,
      stripLineDf: Option[Int] = None,
      repetitionGate: Boolean = false,
      gopherGate: Boolean = false): DataFrame = {
    val input = preStages(docs, stripLineDf, repetitionGate, gopherGate)
    // the cascade reads its input THREE times (scoring, gated text,
    // survivor text) — cheap re-scans when the input is a raw source,
    // but with strip/repetition stages ahead each consumer would
    // re-execute the whole pre-pipeline (measured: c10 isolated at
    // sf0.1 21.2 s uncached vs 13.5 s cached — the remainder is the
    // sum of the constituent faces). A text-bearing cache is the
    // documented 100 TB hazard, so this is the in-plan composition
    // convenience only — at corpus scale run [[cleanStaged]], which
    // materializes the pre-stage output to storage instead (parity
    // spec-pinned, benched as c10_clean_staged).
    val prestaged =
      if (stripLineDf.isEmpty && !repetitionGate && !gopherGate) input
      else input.transform(graft.CacheRegistry.register)
    cleanImpl(prestaged, gear)
  }

  /** [[clean]] in the 100 TB posture (r15 verdict item 2, now code
    * instead of a comment): the pre-stage output (doc_id, text after
    * strip + gates) is MATERIALIZED to `stageDir` as parquet and the
    * cascade re-reads it from storage — the writeTrainingShards
    * pattern — so no text-bearing cache exists anywhere and each of
    * the cascade's three text consumers is a plain columnar scan
    * with doc_id semi-join pruning. Identical rows to [[clean]]
    * (spec-pinned): the stage boundary changes WHERE the
    * intermediate lives, not what flows through it. */
  def cleanStaged(docs: DataFrame, stageDir: String,
      gear: Dedup.GearSpec = Dedup.Routed,
      stripLineDf: Option[Int] = None,
      repetitionGate: Boolean = false,
      gopherGate: Boolean = false): DataFrame = {
    val input = preStages(docs, stripLineDf, repetitionGate, gopherGate)
    if (stripLineDf.isEmpty && !repetitionGate && !gopherGate)
      cleanImpl(input, gear) // no pre-stage → nothing to materialize
    else {
      input.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(stageDir)
      cleanImpl(docs.sparkSession.read.parquet(stageDir), gear)
    }
  }

  private def cleanImpl(docs: DataFrame, gear: Dedup.GearSpec): DataFrame = {
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
    val drops = Dedup.pairsByGear(survivorText, gear)
      .select(col("b").as("doc_id")).distinct()
    survivors.join(drops, Seq("doc_id"), "left_anti")
  }

  def c01(s: SparkSession, dir: String): DataFrame =
    // oracle face pins the exhaustive gear (DuckDB replays it)
    clean(Tables.documents(s, dir), Dedup.Pinned(None))

  // ---------------------------------------------------------------
  // c10: the FULL cleaning composition — every gate this engine has,
  // in shipping order, as ONE declarative plan (the c07 pattern
  // applied to cleaning): line-level boilerplate strip (c08) →
  // repetition gate (t05) → language/quality gates → exact dedup →
  // near-dup removal (c01). The face's corpus layers BOTH failure
  // modes the new gates exist for: the planted line corpus (header/
  // promo boilerplate the cascade alone cannot remove) over a corpus
  // where every 11th doc is a PER-DOC-UNIQUE phrase repeat — unique
  // lines survive the df census (c08 cannot see them), the phrase
  // carries a stopword so language/quality pass it (t02 cannot see
  // it), and only the repetition gate rejects it. Defense in depth,
  // each layer catching what the previous one structurally misses.
  // ---------------------------------------------------------------

  /** Every 11th doc degenerates to a per-doc-unique phrase repeat —
    * invisible to the line-df census AND to t02, en-classified,
    * flagged only by t05. */
  private[graft] def degenerateCorpus(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      when(col("doc_id") % 11 === 0,
        array_join(array_repeat(
          concat(lit("claim the offer now x"), col("doc_id")), 30), " "))
        .otherwise(col("text")).as("text"))

  def c10(s: SparkSession, dir: String): DataFrame =
    clean(plantedLineCorpus(degenerateCorpus(Tables.documents(s, dir))),
      Dedup.Pinned(None), stripLineDf = Some(MaxLineDf), repetitionGate = true)

  /** c10's exact composition through [[cleanStaged]] — the benched
    * 100 TB posture twin (same planted input, same gates, the stage
    * boundary on storage instead of cache). */
  def c10Staged(s: SparkSession, dir: String, stageDir: String): DataFrame =
    cleanStaged(plantedLineCorpus(degenerateCorpus(Tables.documents(s, dir))),
      stageDir,
      Dedup.Pinned(None), stripLineDf = Some(MaxLineDf), repetitionGate = true)

  val c10Sql: String =
    s"""WITH src0 AS (SELECT doc_id,
             CASE WHEN doc_id % 11 = 0
                  THEN rtrim(repeat('claim the offer now x' || doc_id || ' ', 30))
                  ELSE text END AS text FROM documents),
       ${lineCorpusCtes("src0")},
       ${stripCtes("lc")},
       sdocs AS (SELECT doc_id, clean_text AS text FROM stripped),
       ${TextOps.repetitionCtes("sdocs")},
       gate AS (SELECT doc_id, text FROM sdocs
                WHERE doc_id NOT IN
                  (SELECT doc_id FROM rep WHERE repetitive = 1)),
       ${cascadeSql("gate")}"""

  /** The full cleaning-cascade replay (gates → fp dedup → near-dup
    * drop) over `src` (doc_id, text): CTE chain + final SELECT. */
  def cascadeSql(src: String): String = {
    val m = StopwordSets.toMap
    raw"""d0 AS (SELECT doc_id, text, lower(text) AS t, len(text) AS nc FROM $src),
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

  lazy val c01Sql: String = s"WITH ${cascadeSql("documents")}"

  // ---------------------------------------------------------------
  // c22: drop audit — the provenance mart for the c01 cascade. c01
  // answers "what survived"; c22 answers the question a data-ops
  // on-call actually gets: "WHY did doc X disappear". One row per
  // INPUT doc with its scores and the first gate that dropped it
  // (lang → quality → exact_dup → near_dup → kept), using the
  // cascade's own precedence so audit and cleaner can never disagree
  // (the spec reconciles kept == c01 exactly).
  //
  // Scale: the same plan as c01 plus two doc_id-keyed flag joins —
  // the audit adds no new corpus-scale pass.
  // ---------------------------------------------------------------

  /** Per-doc audit over any (doc_id, text) frame (exhaustive pair
    * join — the oracle face; production routes via the census). */
  def dropAudit(docs: DataFrame,
      gear: Dedup.GearSpec = Dedup.Routed): DataFrame = {
    val scored = withLangQuality(docs, col("text"), "pred_lang", "quality")
      .select(col("doc_id"), col("pred_lang"), col("quality"))
      .transform(graft.CacheRegistry.register)
    val gated = scored
      .filter(col("pred_lang") =!= "und" && col("quality") >= MinQuality)
    val gatedText = docs.select(col("doc_id"), col("text"))
      .join(gated.select(col("doc_id")), Seq("doc_id"), "left_semi")
    val w = Window.partitionBy(col("fp")).orderBy(col("doc_id").asc)
    val ranked = gatedText
      .withColumn("fp", graft.plans.GraftFunctions.fingerprint(
        docs.sparkSession, col("text")))
      .withColumn("_rn", row_number().over(w))
      .select(col("doc_id"), (col("_rn") > 1).as("is_exact_dup"))
      .transform(graft.CacheRegistry.register)
    val survivorText = docs.select(col("doc_id"), col("text"))
      .join(ranked.filter(!col("is_exact_dup")).select(col("doc_id")),
        Seq("doc_id"), "left_semi")
    val ndDrops = Dedup.pairsByGear(survivorText, gear)
      .select(col("b").as("doc_id")).distinct()
      .withColumn("_nd", lit(true))
    scored
      .join(ranked, Seq("doc_id"), "left")
      .join(ndDrops, Seq("doc_id"), "left")
      .select(col("doc_id"), col("pred_lang"), col("quality"),
        when(col("pred_lang") === "und", "lang")
          .when(col("quality") < MinQuality, "quality")
          .when(col("is_exact_dup"), "exact_dup")
          .when(coalesce(col("_nd"), lit(false)), "near_dup")
          .otherwise("kept").as("stage"))
  }

  def c22(s: SparkSession, dir: String): DataFrame =
    dropAudit(Tables.documents(s, dir), Dedup.Pinned(None))

  lazy val c22Sql: String = {
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
       ranked AS (SELECT doc_id, text,
                row_number() OVER (PARTITION BY fp ORDER BY doc_id) > 1 AS is_exact_dup
                FROM (SELECT *, ${TextOps.sqlFingerprint} AS fp FROM gated)),
       toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
                FROM ranked WHERE NOT is_exact_dup),
       sh2 AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
               FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(w)-2, 0))) AS i)),
       sizes AS (SELECT doc_id, count(*) AS n FROM sh2 GROUP BY 1),
       inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
                 FROM sh2 a JOIN sh2 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                 GROUP BY 1, 2),
       drops AS (SELECT DISTINCT b AS doc_id FROM inter
                 JOIN sizes sa ON a = sa.doc_id JOIN sizes sb ON b = sb.doc_id
                 WHERE CAST(inter AS DOUBLE)/(sa.n + sb.n - inter) >= ${Dedup.JaccardThreshold})
       SELECT s.doc_id, pred_lang, quality,
         CASE WHEN pred_lang = 'und' THEN 'lang'
              WHEN quality < $MinQuality THEN 'quality'
              WHEN r.is_exact_dup THEN 'exact_dup'
              WHEN s.doc_id IN (SELECT doc_id FROM drops) THEN 'near_dup'
              ELSE 'kept' END AS stage
       FROM scored s LEFT JOIN ranked r ON s.doc_id = r.doc_id"""
  }

  // ---------------------------------------------------------------
  // d15: cross-document paragraph dedup — first-occurrence-wins at
  // LINE granularity: every repeated paragraph keeps exactly its
  // first occurrence (by (doc_id, pos)) and later copies are cut
  // from their docs. The syndication/quotation cleanup c08 cannot
  // express: c08's df threshold drops a hot line from EVERY doc
  // (including the original) and only once it crosses MaxLineDf; d15
  // removes the 2nd+ copy of ANY repeated paragraph while always
  // preserving the original — the Lee-et-al exact-substring dedup
  // applied at paragraph granularity with a deterministic keeper.
  // Blank lines are structure, not content: exempt (the c08 stance).
  //
  // Scale: one shuffle on the line string (the same combiner
  // argument as c08's census — repeats compress map-side), one
  // doc_id shuffle to reassemble. The keeper window partitions by
  // LINE — a pathological line repeated 10^9 times puts its copies
  // on one task; at that scale the first-occurrence rank is computed
  // as min-aggregate + semi-join instead (same semantics), which is
  // why the operator takes the window path only below the df cap.
  // ---------------------------------------------------------------

  /** First-occurrence paragraph dedup over (doc_id, text with \n):
    * (doc_id, clean_text, n_kept, n_cut). Docs losing every line
    * disappear. */
  def paraDedup(docs: DataFrame): DataFrame = {
    val lines = docs.select(col("doc_id"),
      posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
    val w = Window.partitionBy(col("line"))
      .orderBy(col("doc_id").asc, col("pos").asc)
    val flagged = lines
      .withColumn("_rn", row_number().over(w))
      .withColumn("_keep", col("_rn") === 1 || trim(col("line")) === "")
    flagged.groupBy(col("doc_id"))
      .agg(
        array_join(
          transform(
            filter(array_sort(collect_list(
              struct(col("pos"), col("_keep"), col("line")))),
              x => x.getField("_keep")),
            x => x.getField("line")), "\n").as("clean_text"),
        sum(when(col("_keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("_keep"), 0L).otherwise(1L)).as("n_cut"))
      .filter(col("n_kept") > 0)
  }

  def d15(s: SparkSession, dir: String): DataFrame =
    paraDedup(plantedLineCorpus(Tables.documents(s, dir)))

  val d15Sql: String =
    s"""WITH ${lineCorpusCtes("documents")},
       lines AS (SELECT doc_id, i-1 AS pos, ln[i] AS line FROM
                 (SELECT doc_id, string_split(text, chr(10)) AS ln FROM lc),
                 LATERAL (SELECT unnest(generate_series(1, len(ln))) AS i)),
       flagged AS (SELECT doc_id, pos, line,
                 (row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) = 1
                  OR trim(line) = '') AS keep
               FROM lines),
       out AS (SELECT doc_id,
                 string_agg(line, chr(10) ORDER BY pos)
                   FILTER (keep) AS clean_text,
                 CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                 CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_cut
               FROM flagged GROUP BY 1)
       SELECT doc_id, clean_text, n_kept, n_cut FROM out WHERE n_kept > 0"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c01_corpus_clean" -> (c01 _),
    "c08_strip_boilerplate" -> (c08 _),
    "c10_clean_full" -> (c10 _),
    "c22_drop_audit" -> (c22 _),
    "d15_para_dedup" -> (d15 _))

  val oracles: Map[String, String] = Map(
    "c01_corpus_clean" -> c01Sql,
    "c08_strip_boilerplate" -> c08Sql,
    "c10_clean_full" -> c10Sql,
    "c22_drop_audit" -> c22Sql,
    "d15_para_dedup" -> d15Sql)
}
