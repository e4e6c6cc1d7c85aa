package graft

import graft.operators.Vocab
import org.apache.spark.sql.functions._

/** c17 vocabulary-fit semantics on a planted corpus. */
class VocabSpec extends SparkSpec {
  import spark.implicits._

  test("rank order, shares and coverage on a hand-computed corpus") {
    val docs = Seq(
      (1L, "a a a b b c"),
      (2L, "a b d"),
      (3L, "")) // blank doc contributes nothing
      .toDF("doc_id", "text")
    // freqs: a=4, b=3, c=1, d=1 (tie → term asc), total 9
    val got = Vocab.fitVocab(docs, k = 3)
      .as[(Long, String, Long, Double, Double)].collect().toList
    assert(got == List(
      (1L, "a", 4L, 0.444444, 0.444444),
      (2L, "b", 3L, 0.333333, 0.777778),
      (3L, "c", 1L, 0.111111, 0.888889)))
  }

  test("c17 face: coverage is monotone; full-vocab corpus covers ~1") {
    val rows = Vocab.c17(spark, sf("sf0.001"))
      .orderBy("rank")
      .as[(Long, String, Long, Double, Double)].collect()
    // the synthetic corpus has 31 distinct terms < VocabK, so the
    // whole vocabulary fits and coverage closes at ~1 (rounded
    // 6-digit shares may land a hair either side of 1.0)
    assert(rows.length == 31)
    assert(rows.length <= Vocab.VocabK)
    // monotone non-increasing freq, strictly increasing coverage
    assert(rows.sliding(2).forall { case Array(a, b) =>
      a._3 >= b._3 && b._5 > a._5 })
    assert(math.abs(rows.last._5 - 1.0) < 1e-4)
  }

  test("c21: temperature upsamples the tail; alpha=1 is the identity") {
    import graft.operators.Vocab
    val docs = ((1 to 90).map(i => (i.toLong, "big")) ++
      (91 to 100).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source").withColumn("text", lit("x"))
    val t = Vocab.mixtureWeights(docs, 0.7)
      .select("source", "p", "weight", "sample_factor")
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // alpha < 1: the small source is upsampled, the big one damped
    assert(t("small")._4 > 1.0 && t("big")._4 < 1.0)
    assert(math.abs(t("small")._3 + t("big")._3 - 1.0) < 1e-4)
    val id = Vocab.mixtureWeights(docs, 1.0)
      .select("source", "p", "weight")
      .as[(String, Double, Double)].collect()
    id.foreach { case (src, p, w) =>
      assert(math.abs(w - p) < 1e-4, src) } // identity at alpha = 1
  }
}