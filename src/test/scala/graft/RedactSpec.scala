package graft

import graft.operators.Redact
import org.apache.spark.sql.functions._

/** PII scrubbing (SURVEY.md §2 c05). */
class RedactSpec extends SparkSpec {
  import spark.implicits._

  test("c05: planted PII is counted and the redacted text is match-free") {
    val df = Seq(
      (1L, "write to alice.smith+spam@mail.example.org or call +34 612 345 678 today"),
      (2L, "server 192.168.0.17 answered; backup at 10.1.2.3 did not"),
      (3L, "no personal data in this sentence at all"))
      .toDF("doc_id", "text")
    val (ne, ni, np, red) = Redact.redactions(col("text"))
    val rows = df.select(col("doc_id"), ne.as("e"), ni.as("i"), np.as("p"),
        red.as("red"))
      .as[(Long, Int, Int, Int, String)].collect().sortBy(_._1)
    assert(rows(0)._2 == 1 && rows(0)._4 == 1, s"doc 1: ${rows(0)}")
    assert(rows(1)._3 == 2 && rows(1)._2 == 0)
    assert(rows(2) == ((3L, 0, 0, 0, "no personal data in this sentence at all")))
    // redaction is complete: re-running detection on redacted text
    // finds nothing
    val re = df.select(red.as("text"))
    val (ne2, ni2, np2, _) = Redact.redactions(col("text"))
    val residue = re.select((ne2 + ni2 + np2).as("n")).as[Int].collect().sum
    assert(residue == 0, "redacted text still matches a PII pattern")
    // markers are present where PII was
    assert(rows(0)._5.contains("<EMAIL>") && rows(0)._5.contains("<PHONE>"))
    assert(rows(1)._5.contains("<IP>"))
    // counts describe what was actually redacted: an IPv4-shaped
    // substring inside an email domain is consumed by the email
    // redaction and must NOT also be reported as an IP
    val (ne3, ni3, _, red3) = Redact.redactions(col("text"))
    val phantom = Seq((9L, "mail bob@1.2.3.4evil.com now"))
      .toDF("doc_id", "text")
      .select(ne3.as("e"), ni3.as("i"), red3.as("r"))
      .as[(Int, Int, String)].head()
    assert(phantom._1 == 1 && phantom._2 == 0,
      s"phantom IP reported: $phantom")
    assert(!phantom._3.contains("1.2.3.4"))

    // the c05 face is non-vacuous on the synthetic corpus: every 5th
    // doc carries planted PII and is detected
    val face = Redact.c05(spark, sf("sf0.001"))
    val planted = face.filter(col("doc_id") % 5 === 0)
    assert(planted.filter(col("n_emails") =!= 1).count() == 0,
      "planted email not detected exactly once")
    assert(planted.filter(col("n_ips") =!= 1).count() == 0)
    assert(planted.filter(col("n_phones") < 1).count() == 0)
  }
}
