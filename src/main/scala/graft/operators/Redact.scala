package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PII scrubbing (c05) — the compliance pass a training corpus runs
  * before anything is retained: detect and redact emails, phone
  * numbers and IPv4 addresses, reporting per-doc counts plus a
  * fingerprint of the REDACTED text (so downstream exact-dedup keys on
  * scrubbed content and two docs differing only in their PII collapse).
  *
  * Patterns are deliberately RE2-safe (no lookarounds, no
  * backreferences) so Java regex (Spark) and RE2 (DuckDB) match the
  * same spans, and replacement order is fixed (email → ip → phone) so
  * overlapping candidates resolve identically in both engines. One
  * narrow codegen'd projection — no shuffle, no UDF.
  *
  * The synthetic documents corpus contains no natural PII, which would
  * make the oracle vacuous (the d08 lesson) — so the c05 face plants
  * PII DETERMINISTICALLY on every 5th doc (id-derived email/phone/ip
  * appended identically in the Spark face and the oracle SQL), and the
  * spec asserts the redacted text is match-free.
  */
object Redact {

  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val Ipv4Pattern = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** Phone = optional '+', then 7-15 digits with at most TWO
    * separator chars (space/paren/dash) between consecutive digits —
    * covers "+1 555 0102000", "(555) 123-4567", "555-123-4567".
    * Bounding TOTAL DIGITS (not filler length, the r10 shape) stops
    * the worst over-redaction: unbounded digit runs, long ID lists
    * and score dumps no longer match. Remaining bias is deliberately
    * CONSERVATIVE for a compliance pass: a benign 7-15-digit
    * separated run ("1887 2024 123") still redacts — preferring
    * recall over precision on possible phone numbers. */
  val PhonePattern = "\\+?[0-9]([ ()-]{0,2}[0-9]){6,14}"

  /** Counts + redaction of one text column: (n_emails, n_ips,
    * n_phones, redacted). Order fixed: email → ip → phone. */
  def redactions(text: Column): (Column, Column, Column, Column) = {
    val nEmails = size(regexp_extract_all(text, lit(EmailPattern), lit(0)))
    val afterEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    // each count runs on the text AFTER the earlier redactions, so a
    // span consumed by one category is never double-reported by the
    // next (an IPv4-shaped substring inside an email domain, a digit
    // run inside an address) — counts always describe exactly what
    // the matching replace redacted
    val nIps = size(regexp_extract_all(afterEmail, lit(Ipv4Pattern), lit(0)))
    val afterIp = regexp_replace(afterEmail, Ipv4Pattern, "<IP>")
    val nPhones = size(regexp_extract_all(afterIp, lit(PhonePattern), lit(0)))
    val redacted = regexp_replace(afterIp, PhonePattern, "<PHONE>")
    (nEmails, nIps, nPhones, redacted)
  }

  /** Scrub any (doc_id, text) frame: doc_id, counts, and the
    * canonical fingerprint of the redacted text. */
  def scrub(docs: DataFrame): DataFrame = {
    val (ne, ni, np, red) = redactions(col("text"))
    docs.select(col("doc_id"), ne.as("n_emails"), ni.as("n_ips"),
      np.as("n_phones"),
      md5(red.cast("binary")).as("redacted_fp"))
  }

  /** The c05 input: every 5th doc gets id-derived PII appended —
    * keeps the oracle non-vacuous on the synthetic corpus. */
  def plantedDocs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"), col("source"),
      when(pmod(col("doc_id"), lit(5)) === 0,
        concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or +1 555 010"), col("doc_id").cast("string"),
          lit(" from host 10.0."),
          pmod(col("doc_id"), lit(250)).cast("string"), lit(".7")))
        .otherwise(col("text")).as("text"))

  def c05(s: SparkSession, dir: String): DataFrame =
    scrub(plantedDocs(s, dir))

  val c05Sql: String =
    s"""WITH planted AS (
         SELECT doc_id,
                CASE WHEN doc_id % 5 = 0
                     THEN text || ' contact user' || doc_id || '@example.com or +1 555 010' || doc_id || ' from host 10.0.' || (doc_id % 250) || '.7'
                     ELSE text END AS text
         FROM documents),
       r AS (
         SELECT doc_id, text,
                regexp_replace(text, '$EmailPattern', '<EMAIL>', 'g') AS after_email
         FROM planted),
       r2 AS (
         SELECT doc_id, text, after_email,
                regexp_replace(after_email, '$Ipv4Pattern', '<IP>', 'g') AS after_ip
         FROM r)
       SELECT doc_id,
              len(regexp_extract_all(text, '$EmailPattern')) AS n_emails,
              len(regexp_extract_all(after_email, '$Ipv4Pattern')) AS n_ips,
              len(regexp_extract_all(after_ip, '$PhonePattern')) AS n_phones,
              md5(regexp_replace(after_ip, '$PhonePattern', '<PHONE>', 'g')) AS redacted_fp
       FROM r2"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c05_redact_pii" -> (c05 _))

  val oracles: Map[String, String] = Map(
    "c05_redact_pii" -> c05Sql)
}
