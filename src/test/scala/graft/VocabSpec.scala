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
}
