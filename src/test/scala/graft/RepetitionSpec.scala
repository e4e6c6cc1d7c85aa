package graft

import graft.operators.{Corpus, Dedup, TextOps}
import org.apache.spark.sql.functions._

/** t05 repetition signals: pinned metric values, the t02 blind spot
  * they exist to close, and the clean() gate integration. */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def metrics(rows: (Long, String)*) =
    TextOps.repetitionMetrics(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getLong(5))).toMap

  test("t05: metric values pinned; each flag condition fires independently") {
    val m = metrics(
      1L -> "a b a b c d e f g h", // top-bigram flag only
      2L -> Seq.fill(3)("p q r s t u v").mkString(" "), // dup-trigram flag only
      3L -> "the quick brown fox jumps over a lazy dog", // natural negative
      4L -> "hello", // degenerate sizes: no bigrams/trigrams
      5L -> "   ") // blank: dropped
    assert(m(1L) == ((10L, 0.2, 0.4, 0.0, 1L)),
      s"top2-only doc mis-measured: ${m(1L)}")
    // 21 tokens; top1 3/21; top bigram 3 -> 6/21 under the 0.35 bar;
    // every trigram occurrence duplicated -> dup3 = 1.0 flags
    assert(m(2L) == ((21L, 0.142857, 0.285714, 1.0, 1L)),
      s"dup3-only doc mis-measured: ${m(2L)}")
    assert(m(3L)._5 == 0L, s"natural doc flagged: ${m(3L)}")
    assert(m(4L) == ((1L, 1.0, 0.0, 0.0, 0L)),
      s"single-token doc mis-measured: ${m(4L)}")
    assert(!m.contains(5L), "blank doc should be dropped, not scored")
  }

  test("t05 closes the t02 blind spot: phrase-repeat scores HIGH on t02") {
    val degenerate =
      (TextOps.RepeatPhrase + " ") * TextOps.RepeatCount
    val q = graft.functions.TextAnalysis.withQuality(
      Seq((1L, degenerate.trim)).toDF("doc_id", "text"),
      col("text"), "quality")
      .select("quality").as[Double].head()
    // t02 verdict: comfortably above the clean() gate AND the HIGH cut
    assert(q >= 0.45, s"expected t02 to score the repeat doc HIGH, got $q")
    val m = metrics(1L -> degenerate.trim)
    assert(m(1L)._5 == 1L && m(1L)._3 == 0.4 && m(1L)._4 == 1.0,
      s"t05 must flag what t02 cannot see: ${m(1L)}")
  }

  test("clean(repetitionGate): drops the degenerate the default cascade keeps") {
    // stopword-bearing repeat: passes the language gate (en) and the
    // quality gate, near-dups with nothing — only t05 can reject it
    val phrase = "click here now to claim the offer"
    val docs = Tables.documents(spark, sf())
      .select(col("doc_id"),
        when(col("doc_id") === 3L, rtrim(lit((phrase + " ") * 40)))
          .otherwise(col("text")).as("text"))
    try {
      val flagged = TextOps.repetitionMetrics(docs)
        .filter(col("repetitive") === 1L).select("doc_id").as[Long]
        .collect().toSet
      assert(flagged == Set(3L),
        s"only the planted doc should flag at this sf, got $flagged")
      val default = Corpus.clean(docs, Dedup.Pinned(None))
        .select("doc_id").as[Long].collect().toSet
      val gated = Corpus.clean(docs, Dedup.Pinned(None), repetitionGate = true)
        .select("doc_id").as[Long].collect().toSet
      assert(default.contains(3L),
        "the degenerate doc must slip through the default cascade")
      assert(gated == default - 3L,
        "the gate must drop exactly the flagged doc")
    } finally CacheRegistry.unpersistAll()
  }
}
