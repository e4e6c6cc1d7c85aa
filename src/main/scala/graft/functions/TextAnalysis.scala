package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-corpus analysis primitives for training-data pipelines:
  * language ID, quality scoring, tokenization counts, fingerprinting.
  *
  * Everything is a codegen'd Column expression (no UDFs), and every
  * heuristic is defined from the shared constants below so the DuckDB
  * oracle SQL (TextOps) and the Spark plan compute the identical
  * function — integer scores and int-ratio doubles only, so results
  * are bit-identical across engines.
  */
object TextAnalysis {

  /** Per-language function-word lists for the hit-count language ID.
    * Small closed-class words, whole-word matched. */
  val StopwordSets: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "to", "and", "is", "in", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "una", "por"),
    "de" -> Seq("der", "die", "und", "das", "ist", "mit", "von", "ein"),
    "fr" -> Seq("le", "les", "des", "une", "et", "est", "dans", "pour"))

  /** English stopwords used for the quality stop-ratio signal. */
  val QualityStopwords: Seq[String] =
    Seq("the", "a", "of", "to", "and", "is", "in", "that", "for", "it")

  def stopwordRegex(words: Seq[String]): String =
    words.mkString("\\b(", "|", ")\\b")

  /** CJK detection — explicit BMP Han range, expressible in both Java
    * regex and RE2 as a literal character class. */
  val HanRange = "[一-鿿]"

  /** Number of distinct stopwords of `words` present in lowercase
    * text — ONE regex pass (extract-all + distinct) rather than one
    * rlike per word (8× fewer regex scans per row). */
  def stopwordHits(textLower: Column, words: Seq[String]): Column =
    size(array_distinct(
      regexp_extract_all(textLower, lit(stopwordRegex(words)), lit(1))))

  /** The language decision CASE over already-computed hit counts —
    * priority zh (Han), 'und' on no signal, then en ≥ es ≥ de ≥ fr. */
  def langDecision(han: Column, en: Column, es: Column,
      de: Column, fr: Column): Column =
    when(han, "zh")
      .when(en + es + de + fr === 0, "und")
      .when(en >= es && en >= de && en >= fr, "en")
      .when(es >= de && es >= fr, "es")
      .when(de >= fr, "de")
      .otherwise("fr")

  /** Deterministic priority-argmax language ID: zh on any Han char,
    * then en ≥ es ≥ de ≥ fr on stopword hit counts, 'und' when no
    * signal at all.
    *
    * This monolithic Column form re-evaluates hit counts per CaseWhen
    * branch (conditional branches are excluded from codegen
    * subexpression elimination — up to 16 regex scans/row on the
    * worst path). Hot paths should use [[withLangId]], which stages
    * the four scans as named columns so each runs once per row. */
  def langId(textLower: Column): Column = {
    val s = StopwordSets.toMap
    langDecision(textLower.rlike(HanRange),
      stopwordHits(textLower, s("en")), stopwordHits(textLower, s("es")),
      stopwordHits(textLower, s("de")), stopwordHits(textLower, s("fr")))
  }

  /** The staged scans use fixed `_lid_*`/`_q_*` column names; a caller
    * frame already carrying one of those would be silently overwritten
    * and then dropped — corrupting the caller's column. Fail loudly
    * instead (the underscore prefix makes accidental collision
    * near-impossible, so a clash is a bug worth surfacing). */
  private def requireStagingFree(df: org.apache.spark.sql.DataFrame,
      names: Seq[String]): Unit = {
    val clash = names.filter(df.columns.contains)
    require(clash.isEmpty,
      s"TextAnalysis staging name collision: ${clash.mkString(", ")} already in ${df.columns.mkString("[", ",", "]")}")
  }

  /** Staged language ID: appends `out` to `df`. Since round 9 the
    * signals come from ONE native fused pass (graft_textstats) staged
    * as a struct column (multi-referenced non-cheap producer —
    * CollapseProject keeps the boundary, so the pass runs once per
    * row); the decision tree over the fields is unchanged. Same
    * values as [[langId]], bit for bit — pinned by PropertySpec
    * against [[withLangIdColumns]] on adversarial text. */
  def withLangId(df: org.apache.spark.sql.DataFrame, text: Column,
      out: String): org.apache.spark.sql.DataFrame = {
    requireStagingFree(df, Seq("_ts"))
    df.withColumn("_ts",
        graft.plans.GraftFunctions.textStats(df.sparkSession, text))
      .withColumn(out, langDecision(col("_ts.han"), col("_ts.en"),
        col("_ts.es"), col("_ts.de"), col("_ts.fr")))
      .drop("_ts")
  }

  /** The pre-round-9 regex-staged formulation — kept as the
    * equivalence REFERENCE for the native fused pass (the oracle SQL
    * replays these semantics definitionally). */
  def withLangIdColumns(df: org.apache.spark.sql.DataFrame, text: Column,
      out: String): org.apache.spark.sql.DataFrame = {
    requireStagingFree(df, Seq("_lid_han", "_lid_en", "_lid_es", "_lid_de", "_lid_fr"))
    val s = StopwordSets.toMap
    val t = lower(text)
    df.withColumns(Map(
        "_lid_han" -> t.rlike(HanRange),
        "_lid_en" -> stopwordHits(t, s("en")),
        "_lid_es" -> stopwordHits(t, s("es")),
        "_lid_de" -> stopwordHits(t, s("de")),
        "_lid_fr" -> stopwordHits(t, s("fr"))))
      .withColumn(out, langDecision(col("_lid_han"), col("_lid_en"),
        col("_lid_es"), col("_lid_de"), col("_lid_fr")))
      .drop("_lid_han", "_lid_en", "_lid_es", "_lid_de", "_lid_fr")
  }

  /** Characteristic character-trigram profiles per language (drawn
    * from high-frequency function-word shapes — public linguistic
    * knowledge). Used by the char-n-gram language ID variant. */
  val CharTrigramProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", " th", "he ", "ing", "nd ", "and", " of", "ion"),
    "es" -> Seq(" de", "de ", " la", "la ", "que", " qu", "os ", "ión"),
    "de" -> Seq("der", " de", "ie ", "ein", "ich", "sch", "und", "en "),
    "fr" -> Seq(" le", "les", " et", "ent", "que", "ais", "ous", "eur"))

  /** Char-n-gram language ID: count how many of each language's
    * characteristic trigrams occur in the text, argmax with the same
    * deterministic priority/tie order as langId. One contains() per
    * trigram — no regex at all. */
  def langIdCharNgram(textLower: Column): Column = {
    val scores = CharTrigramProfiles.map { case (lang, tris) =>
      lang -> tris.map(t => when(textLower.contains(t), 1).otherwise(0)).reduce(_ + _)
    }.toMap
    val (en, es, de, fr) = (scores("en"), scores("es"), scores("de"), scores("fr"))
    when(textLower.rlike(HanRange), "zh")
      .when(en + es + de + fr === 0, "und")
      .when(en >= es && en >= de && en >= fr, "en")
      .when(es >= de && es >= fr, "es")
      .when(de >= fr, "de")
      .otherwise("fr")
  }

  /** Whitespace token count; 0 for blank text. */
  def wsTokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword-boundary token count: alphanumeric runs plus each
    * individual non-space symbol. */
  val ReTokenPattern = "[a-z0-9]+|[^a-z0-9\\s]"
  def reTokenCount(textLower: Column): Column =
    regexp_count(textLower, lit(ReTokenPattern))

  /** The quality arithmetic over already-computed integer counts. */
  def qualityExpr(nw: Column, stopHits: Column, punct: Column,
      nChars: Column): Column =
    lit(0.4) * least(nw, lit(200)).cast("double") / 200.0 +
      lit(0.4) * stopHits.cast("double") / greatest(nw, lit(1)).cast("double") +
      lit(0.2) * (lit(1.0) - least(punct.cast("double") / greatest(nChars, lit(1)).cast("double"), lit(1.0)))

  /** Quality score in [0,1]: length saturation + stopword ratio +
    * punctuation penalty. All inputs are integer counts so the double
    * arithmetic is engine-identical. Hot paths should use
    * [[withQuality]] (the token count is referenced twice — staging
    * runs the split once per row). */
  def qualityScore(text: Column): Column = {
    val lower_ = lower(text)
    qualityExpr(wsTokenCount(text),
      regexp_count(lower_, lit(stopwordRegex(QualityStopwords))),
      regexp_count(lower_, lit("[^a-z0-9\\s]")), length(text))
  }

  /** Staged quality score: appends `out` to `df`. The counts come
    * from the same native fused pass as [[withLangId]] (one struct
    * stage, one pass per row). Same values as [[qualityScore]], bit
    * for bit — pinned by PropertySpec against [[withQualityColumns]]
    * on adversarial text. */
  def withQuality(df: org.apache.spark.sql.DataFrame, text: Column,
      out: String): org.apache.spark.sql.DataFrame = {
    requireStagingFree(df, Seq("_ts"))
    df.withColumn("_ts",
        graft.plans.GraftFunctions.textStats(df.sparkSession, text))
      .withColumn(out, qualityExpr(col("_ts.nw"), col("_ts.qsh"),
        col("_ts.pc"), col("_ts.nc")))
      .drop("_ts")
  }

  /** The pre-round-9 regex-staged formulation — the equivalence
    * REFERENCE for the native fused pass. */
  def withQualityColumns(df: org.apache.spark.sql.DataFrame, text: Column,
      out: String): org.apache.spark.sql.DataFrame = {
    requireStagingFree(df, Seq("_q_nw", "_q_sh", "_q_pc", "_q_nc"))
    val t = lower(text)
    df.withColumns(Map(
        "_q_nw" -> wsTokenCount(text),
        "_q_sh" -> regexp_count(t, lit(stopwordRegex(QualityStopwords))),
        "_q_pc" -> regexp_count(t, lit("[^a-z0-9\\s]")),
        "_q_nc" -> length(text)))
      .withColumn(out, qualityExpr(col("_q_nw"), col("_q_sh"),
        col("_q_pc"), col("_q_nc")))
      .drop("_q_nw", "_q_sh", "_q_pc", "_q_nc")
  }

  /** Language ID + quality in ONE staged fused pass — for cascades
    * (corpus cleaning) that need both: the separate staged helpers
    * would each run the pass once. */
  def withLangQuality(df: org.apache.spark.sql.DataFrame, text: Column,
      langOut: String, qualityOut: String): org.apache.spark.sql.DataFrame = {
    requireStagingFree(df, Seq("_ts"))
    df.withColumn("_ts",
        graft.plans.GraftFunctions.textStats(df.sparkSession, text))
      .withColumn(langOut, langDecision(col("_ts.han"), col("_ts.en"),
        col("_ts.es"), col("_ts.de"), col("_ts.fr")))
      .withColumn(qualityOut, qualityExpr(col("_ts.nw"), col("_ts.qsh"),
        col("_ts.pc"), col("_ts.nc")))
      .drop("_ts")
  }

  def qualityBucket(score: Column): Column =
    when(score >= 0.45, "HIGH").when(score >= 0.30, "MEDIUM").otherwise("LOW")

  /** Canonical-text digest: lowercase, strip non-alnum, collapse
    * whitespace, md5 (md5 is the one hash both engines share). */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " ")))

  /** Winnowing fingerprint (the rolling-hash document signature of
    * Schleimer/Wilkerson/Aiken): hash every word k-gram, then keep the
    * minimum hash of each sliding window of `window` consecutive
    * k-gram hashes. Guarantees any shared run of ≥ window+k-1 tokens
    * between two docs yields a shared fingerprint, at ~2/(window+1)
    * selection density. Pure column expressions over a pre-staged
    * token array (same no-retokenize rule as Dedup.shinglesFromTokens).
    */
  def winnowFingerprints(tokens: Column, k: Int = 3, window: Int = 4): Column =
    winnowSelect(transform(winnowGrams(tokens, k), g => xxhash64(g)), window)

  /** Non-distinct ordered word k-grams — the winnow selection input.
    * Also the building block of Dedup.winnowPairs' RELATIONAL winnow
    * (posexplode → native md5-prefix hash → doc-window minima), which
    * is the portable/scale face: the array formulation above runs its
    * lambdas interpreted, fine for a per-doc signature column, ~6x
    * slower as a corpus-wide pair query. */
  private[graft] def winnowGrams(tokens: Column, k: Int): Column =
    when(size(tokens) < k, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(tokens) - k),
        i => concat_ws(" ", (0 until k).map(j => element_at(tokens, i + j + 1)): _*)))

  private def winnowSelect(hashes: Column, window: Int): Column = {
    val sel = when(size(hashes) < window, hashes)
      .otherwise(transform(sequence(lit(0), size(hashes) - window),
        i => array_min(slice(hashes, i + 1, lit(window)))))
    array_distinct(sel)
  }
}
