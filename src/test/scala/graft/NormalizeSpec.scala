package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** t06 Unicode normalization: pinned NFC composition, control-char and
  * whitespace stages, and corpus-face selectivity. */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def norm(texts: String*): Seq[String] =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(TextOps.normalizeText(spark, col("text")).as("n"))
      .as[String].collect().toSeq

  test("t06: NFC composes, controls stripped, spaces collapsed, trimmed") {
    // decomposed e + U+0301 (2 code points) -> composed é (1); BEL
    // dropped; double spaces collapsed; edges trimmed
    val Seq(a) = norm("Cafe\u0301\u0007  x  y ")
    assert(a == "Caf\u00e9 x y", s"got ${a.map(_.toInt)}")
    assert(a.length == 8, "composed é must be one code point")
    // tab and newline are NOT controls to strip (document structure)
    val Seq(b) = norm("a\tb\nc")
    assert(b == "a\tb\nc")
    // already-normalized text passes through unchanged
    val Seq(c) = norm("plain ascii text")
    assert(c == "plain ascii text")
  }

  test("t06 before t04: composed/decomposed variants fingerprint identically") {
    // the reason normalization runs FIRST in a pipeline: the same
    // visible text in NFC vs NFD falls into different dedup buckets
    // without it (the canonical fingerprint keeps the decomposed base
    // letter 'e' but drops the composed 'é', so the digests differ)
    val variants = Seq((1L, "Caf\u00e9 price"), (2L, "Cafe\u0301 price"))
      .toDF("doc_id", "text")
    val raw = variants
      .select(graft.plans.GraftFunctions.fingerprint(spark, col("text")).as("fp"))
      .as[String].collect()
    assert(raw(0) != raw(1), "un-normalized variants should (sadly) differ")
    val normed = variants
      .select(graft.plans.GraftFunctions.fingerprint(spark,
        TextOps.normalizeText(spark, col("text"))).as("fp"))
      .as[String].collect()
    assert(normed(0) == normed(1),
      "after t06 both variants must land in the same dedup bucket")
  }

  test("t06 face: exactly the planted docs change, and shrink") {
    val out = TextOps.t06(spark, sf()).cache()
    try {
      val total = Tables.documents(spark, sf()).count()
      val planted = Tables.documents(spark, sf())
        .filter(col("doc_id") % 5 === 0).count()
      assert(out.count() == total)
      assert(out.filter(col("changed") === 1L).count() == planted,
        "natural corpus text must already be normalized")
      // every planted doc loses the BEL + 1 code point to composition
      // + 2 collapsed spaces + the trailing-space trim
      assert(out.filter(col("changed") === 1L)
        .filter(col("n_after") >= col("n_before")).count() == 0)
    } finally out.unpersist()
  }
}
