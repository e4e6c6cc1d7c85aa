package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental corpus maintenance: latest-wins upsert of a CDC-style
  * update batch (puts + deletes, versioned) into a base snapshot —
  * the engine-side analog of the reference's re-index/update cycle
  * (its pollers re-PUT changed listings into Elasticsearch by `_id`
  * and the index keeps the latest document version; deletes arrive as
  * tombstones). A 100 TB training corpus is maintained the same way:
  * periodic crawl deltas merged into the canonical snapshot.
  *
  * Merge semantics (Delta-style MERGE, CDC flavor):
  *   1. within the update batch, the highest `version` per key wins
  *      (so a later put overrides an earlier tombstone of the same
  *      key, and vice versa);
  *   2. base rows whose key appears in the batch are replaced;
  *   3. surviving winner rows with op='delete' drop the key.
  *
  * Scale design: the per-key "latest" window runs over the UPDATE
  * BATCH ONLY (deltas are orders of magnitude smaller than the base);
  * the base is never windowed and never shuffled — it flows through
  * one broadcast LEFT ANTI join on the batch's key set plus a union.
  * When a delta outgrows broadcast, the same plan runs as a bucketed
  * sort-merge anti join over `Ingest.writeBucketed` snapshots
  * (exchange-free on the base side) — the join shape is the tuning
  * knob, the algebra is unchanged.
  */
object Upsert {

  /** Latest-wins merge of `updates` (doc_id, text, version, op) into
    * `base` (doc_id, text, version): returns (doc_id, text, version)
    * after applying puts and tombstones. */
  def upsert(base: DataFrame, updates: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("version").desc)
    val latest = updates
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("doc_id"), col("text"), col("version"), col("op"))
      .transform(graft.CacheRegistry.register)
    val untouched = base
      .join(broadcast(latest.select(col("doc_id"))), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("text"), col("version"))
    untouched.unionByName(
      latest.filter(col("op") =!= "delete")
        .select(col("doc_id"), col("text"), col("version")))
  }

  /** Deterministic synthetic CDC batch for the c11 face — every update
    * class represented: tombstones (%13), single puts (%10), a
    * higher-version put that must override same-batch rows (%20 —
    * including some tombstoned keys, exercising rule 1), and inserts
    * of brand-new keys (%25, offset ids). */
  def updatesFor(docs: DataFrame): DataFrame = {
    val d = docs.select(col("doc_id"), col("text"))
    val deletes = d.filter(col("doc_id") % 13 === 0)
      .select(col("doc_id"), lit(null).cast("string").as("text"),
        lit(1L).as("version"), lit("delete").as("op"))
    val rev2 = d.filter(col("doc_id") % 13 =!= 0 && col("doc_id") % 10 === 0)
      .select(col("doc_id"), concat(col("text"), lit(" [rev2]")).as("text"),
        lit(1L).as("version"), lit("put").as("op"))
    val rev3 = d.filter(col("doc_id") % 20 === 0)
      .select(col("doc_id"), concat(col("text"), lit(" [rev3]")).as("text"),
        lit(2L).as("version"), lit("put").as("op"))
    val fresh = d.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(lit("replacement listing: "), col("text")).as("text"),
        lit(1L).as("version"), lit("put").as("op"))
    deletes.unionByName(rev2).unionByName(rev3).unionByName(fresh)
  }

  def c11(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val base = docs.select(col("doc_id"), col("text"), lit(0L).as("version"))
    upsert(base, updatesFor(docs))
      .select(col("doc_id"), col("version"),
        length(col("text")).cast("long").as("n_chars"),
        md5(col("text").cast("binary")).as("fp"))
  }

  /** base/upd/latest/merged CTEs shared VERBATIM by c11Sql and
    * c26Sql (the Spark sides share `upsert` + `updatesFor` the same
    * way). */
  private val mergeCtes: String =
    """base AS (SELECT doc_id, text, CAST(0 AS BIGINT) AS version FROM documents),
       upd AS (
         SELECT doc_id, CAST(NULL AS VARCHAR) AS text,
                CAST(1 AS BIGINT) AS version, 'delete' AS op
         FROM documents WHERE doc_id % 13 = 0
         UNION ALL
         SELECT doc_id, text || ' [rev2]', CAST(1 AS BIGINT), 'put'
         FROM documents WHERE doc_id % 13 <> 0 AND doc_id % 10 = 0
         UNION ALL
         SELECT doc_id, text || ' [rev3]', CAST(2 AS BIGINT), 'put'
         FROM documents WHERE doc_id % 20 = 0
         UNION ALL
         SELECT doc_id + 1000000, 'replacement listing: ' || text,
                CAST(1 AS BIGINT), 'put'
         FROM documents WHERE doc_id % 25 = 0),
       latest AS (SELECT * FROM upd
         QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY version DESC) = 1),
       merged AS (
         SELECT doc_id, text, version FROM base
         WHERE doc_id NOT IN (SELECT doc_id FROM latest)
         UNION ALL
         SELECT doc_id, text, version FROM latest WHERE op <> 'delete')"""

  val c11Sql: String =
    s"""WITH $mergeCtes
       SELECT doc_id, version, CAST(len(text) AS BIGINT) AS n_chars,
         md5(text) AS fp
       FROM merged"""

  // ---------------------------------------------------------------
  // c26: corpus release diff — the governance report next to the
  // merge itself (c11 PRODUCES the next snapshot; c26 answers "what
  // did this release actually change?", the audit a dataset card or
  // a rollback decision needs): full-outer join of two snapshots on
  // doc_id, status from presence + text-hash equality (added /
  // removed / modified / unchanged), rolled up with the exact
  // integer character delta per status. At 100 TB both sides are
  // (doc_id, md5, len) projections — the text never shuffles, only
  // 48-byte rows through one doc_id-keyed join and a 4-group
  // aggregate.
  // ---------------------------------------------------------------

  /** Release diff between two (doc_id, text) snapshots: (status,
    * n_docs, chars_delta). */
  def corpusDiff(old: DataFrame, newer: DataFrame): DataFrame = {
    // presence rides its own non-null marker, NOT the hash: a doc
    // present with NULL text would otherwise read as absent and
    // misclassify; hash equality is null-safe for the same reason
    def slim(df: DataFrame, tag: String) = df.select(col("doc_id"),
      lit(true).as(s"in_$tag"),
      md5(col("text").cast("binary")).as(s"h_$tag"),
      length(col("text")).cast("long").as(s"len_$tag"))
    slim(old, "old").join(slim(newer, "new"), Seq("doc_id"), "full_outer")
      .select(
        when(col("in_old").isNull, "added")
          .when(col("in_new").isNull, "removed")
          .when(col("h_old") <=> col("h_new"), "unchanged")
          .otherwise("modified").as("status"),
        (coalesce(col("len_new"), lit(0L)) -
          coalesce(col("len_old"), lit(0L))).as("delta"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("delta")).as("chars_delta"))
  }

  def c26(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val base = docs.select(col("doc_id"), col("text"))
    val merged = upsert(base.withColumn("version", lit(0L)),
      updatesFor(docs)).select(col("doc_id"), col("text"))
    corpusDiff(base, merged)
  }

  val c26Sql: String =
    s"""WITH $mergeCtes,
       a AS (SELECT doc_id, TRUE AS in_old, md5(text) AS h_old,
               CAST(len(text) AS BIGINT) AS len_old FROM base),
       b AS (SELECT doc_id, TRUE AS in_new, md5(text) AS h_new,
               CAST(len(text) AS BIGINT) AS len_new FROM merged),
       d AS (SELECT CASE WHEN in_old IS NULL THEN 'added'
               WHEN in_new IS NULL THEN 'removed'
               WHEN h_old IS NOT DISTINCT FROM h_new THEN 'unchanged'
               ELSE 'modified' END AS status,
               coalesce(len_new, 0) - coalesce(len_old, 0) AS delta
             FROM a FULL OUTER JOIN b USING (doc_id))
       SELECT status, count(*) AS n_docs,
         CAST(sum(delta) AS BIGINT) AS chars_delta
       FROM d GROUP BY 1"""

  // ---------------------------------------------------------------
  // c15: SCD Type-2 history — the other consumer of the same CDC log.
  // c11 answers "what is the corpus NOW" (latest-wins snapshot); c15
  // answers "what was row X at version V" (the slowly-changing-
  // dimension history a warehouse keeps for time-travel joins, audit
  // and training-data provenance: WHICH revision of a document went
  // into WHICH training run). Standard SCD2 construction: one row per
  // PUT with [valid_from, valid_to) version bounds; the next change
  // of the same key (put OR tombstone) closes the interval; an open
  // interval carries the conventional high sentinel, so `is_current`
  // is derivable and the column stays non-null (driver-hash-friendly).
  //
  // Scale: the lead() window runs over the CDC LOG ONLY (log ≪
  // corpus, like c11's batch window) partitioned by the key — one
  // log-sized shuffle, nothing corpus-scale. At 100 TB the log is
  // append-only date-partitioned parquet (rows 42-43) and the history
  // table is rebuilt incrementally per partition.
  // ---------------------------------------------------------------

  /** Open-interval sentinel (the "9999-12-31" of version space). */
  val OpenVersion = 9999L

  /** SCD2 history of a (doc_id, text, version, op) change log: one row
    * per put with version-interval bounds; tombstones close intervals
    * but emit no row. */
  def scd2(log: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("version"))
    log
      .withColumn("valid_to",
        coalesce(lead(col("version"), 1).over(w), lit(OpenVersion)))
      .filter(col("op") =!= "delete")
      .select(col("doc_id"), col("version").as("valid_from"),
        col("valid_to"),
        when(col("valid_to") === OpenVersion, 1L).otherwise(0L)
          .as("is_current"),
        length(col("text")).cast("long").as("n_chars"))
  }

  /** c15 face: the full history of the c11 log (base as version-0
    * puts + the same CDC batch). */
  def c15(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val base = docs.select(col("doc_id"), col("text"),
      lit(0L).as("version"), lit("put").as("op"))
    scd2(base.unionByName(updatesFor(docs)))
  }

  val c15Sql: String =
    s"""WITH log AS (
         SELECT doc_id, text, CAST(0 AS BIGINT) AS version, 'put' AS op
         FROM documents
         UNION ALL
         SELECT doc_id, CAST(NULL AS VARCHAR), CAST(1 AS BIGINT), 'delete'
         FROM documents WHERE doc_id % 13 = 0
         UNION ALL
         SELECT doc_id, text || ' [rev2]', CAST(1 AS BIGINT), 'put'
         FROM documents WHERE doc_id % 13 <> 0 AND doc_id % 10 = 0
         UNION ALL
         SELECT doc_id, text || ' [rev3]', CAST(2 AS BIGINT), 'put'
         FROM documents WHERE doc_id % 20 = 0
         UNION ALL
         SELECT doc_id + 1000000, 'replacement listing: ' || text,
                CAST(1 AS BIGINT), 'put'
         FROM documents WHERE doc_id % 25 = 0),
       closed AS (
         SELECT doc_id, text, version, op,
                coalesce(lead(version) OVER (PARTITION BY doc_id
                                             ORDER BY version),
                         $OpenVersion) AS valid_to
         FROM log)
       SELECT doc_id, version AS valid_from, valid_to,
         CAST(CASE WHEN valid_to = $OpenVersion THEN 1 ELSE 0 END AS BIGINT) AS is_current,
         CAST(len(text) AS BIGINT) AS n_chars
       FROM closed WHERE op <> 'delete'"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c11_corpus_upsert" -> (c11 _),
    "c15_scd2_history" -> (c15 _),
    "c26_corpus_diff" -> (c26 _))

  val oracles: Map[String, String] = Map(
    "c11_corpus_upsert" -> c11Sql,
    "c15_scd2_history" -> c15Sql,
    "c26_corpus_diff" -> c26Sql)
}
