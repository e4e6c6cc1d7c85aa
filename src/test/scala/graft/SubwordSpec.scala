package graft

import graft.plans.{GraftFunctions, SubwordCount}
import org.apache.spark.sql.functions._

/** WordPiece-style subword tokenizer (plans.SubwordCount): pinned
  * tokenizations, algorithm properties, codegen parity, and the c03c
  * packing-basis invariant. */
class SubwordSpec extends SparkSpec {
  import spark.implicits._

  test("subword: pinned greedy tokenizations (incl. greedy overlap + UNK)") {
    val pinned = Map(
      "the" -> Seq("the"),
      "a" -> Seq("a"),
      "scan" -> Seq("scan"),
      // greedy takes the LONGER start "tab" over "ta" (then ##le,
      // not ##ble) — the overlap pair planted in the vocab
      "table" -> Seq("tab", "##le"),
      "fast" -> Seq("fas", "##t"),
      "batch" -> Seq("ba", "##tch"),
      "value" -> Seq("val", "##ue"),
      "customer" -> Seq("cus", "##tom", "##er"),
      "window" -> Seq("win", "##dow"),
      // uncovered word -> whole-word UNK
      "dup" -> Seq(SubwordCount.Unk),
      // over MaxWordChars -> UNK without matching
      ("x" * (SubwordCount.MaxWordChars + 1)) -> Seq(SubwordCount.Unk))
    pinned.foreach { case (w, exp) =>
      assert(SubwordCount.encode(w) == exp,
        s"$w -> ${SubwordCount.encode(w)}, expected $exp")
    }
  }

  test("subword: encode properties over the full corpus word inventory") {
    val words = Tables.documents(spark, sf())
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .distinct().as[String].collect()
    assert(words.nonEmpty)
    val vocabSet = SubwordCount.Vocab.toSet
    var unks = 0
    words.foreach { w =>
      val pieces = SubwordCount.encode(w)
      if (pieces == Seq(SubwordCount.Unk)) unks += 1
      else {
        // pieces reassemble the word and all come from the vocab
        assert(pieces.head + pieces.tail.map(_.drop(2)).mkString == w)
        assert(pieces.forall(vocabSet.contains), s"$w -> $pieces")
        // greediness: at each step no LONGER vocab piece also matches
        var pos = 0
        pieces.zipWithIndex.foreach { case (p, i) =>
          val raw = if (i == 0) p else p.drop(2)
          val longer = SubwordCount.Vocab
            .filter(v => (i == 0) == !v.startsWith("##"))
            .map(v => if (i == 0) v else v.drop(2))
            .filter(v => v.length > raw.length && w.substring(pos).startsWith(v))
          assert(longer.isEmpty, s"$w: $p not greedy at $pos ($longer)")
          pos += raw.length
        }
      }
    }
    // the corpus exercises the UNK path non-vacuously ("dup")
    assert(unks >= 1, "expected at least one uncovered word")
  }

  test("subword: codegen'd expression equals driver-side encode sums") {
    val rows = Tables.documents(spark, sf())
      .select(col("doc_id"), col("text"),
        GraftFunctions.subwordCount(spark, col("text")).as("n"))
      .as[(Long, String, Long)].collect()
    rows.foreach { case (id, text, n) =>
      val exp = text.toLowerCase.trim.split("\\s+")
        .filter(_.nonEmpty).map(SubwordCount.encode(_).length.toLong).sum
      assert(n == exp, s"doc $id: expression $n != reference $exp")
    }
    // edge rows through the same expression (null-safety + empties)
    val edge = Seq((1L, ""), (2L, "   "), (3L, "dup dup")).toDF("doc_id", "text")
      .select(GraftFunctions.subwordCount(spark, col("text")).as("n"))
      .as[Long].collect().toSeq
    assert(edge == Seq(0L, 0L, 2L))
  }

  test("c03c: subword counts are the packing basis and dominate ws counts") {
    val df = operators.Split.c03c(spark, sf())
      .join(Tables.documents(spark, sf()).select(col("doc_id"),
        graft.functions.TextAnalysis.wsTokenCount(col("text"))
          .cast("long").as("ws")), Seq("doc_id"))
    // every word is >= 1 piece, so subword tokens >= whitespace tokens;
    // strictly greater somewhere (multi-piece words exist in corpus)
    assert(df.filter(col("tokens") < col("ws")).isEmpty)
    assert(df.filter(col("tokens") > col("ws")).count() > 0)
    // the budget invariant c03 pins, on the subword basis: a doc's
    // offset is its shard-running total mod budget
    assert(df.filter(col("offset") >= operators.Split.PackBudget).isEmpty)
  }

  test("t14 fertility: >= 1 everywhere (a word is at least one piece), " +
      "per-lang ratio matches a hand rollup") {
    import spark.implicits._
    val f = operators.TextOps.t14(spark, sf())
      .as[(String, Long, Long, Long, Double)].collect()
    assert(f.nonEmpty)
    f.foreach { case (lang, n, w, sw, fert) =>
      assert(n > 0 && w > 0 && sw >= w, s"lang $lang")
      assert(fert >= 1.0)
      assert(math.abs(fert - math.rint(sw.toDouble / w * 1e6) / 1e6) < 1e-9)
    }
    // totals reconcile with the corpus-wide counts (no doc dropped by
    // the lang grouping)
    val docs = Tables.documents(spark, sf())
    assert(f.map(_._2).sum == docs.count())
  }
}
