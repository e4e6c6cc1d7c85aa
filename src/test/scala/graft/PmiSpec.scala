package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** PMI collocation semantics the corpus oracle can't isolate: a
  * planted corpus with one hand-computable survivor, the min-count
  * floor, and the tie-break order. */
class PmiSpec extends SparkSpec {
  import spark.implicits._

  test("t12 core: hand-computed PMI on a planted corpus; floor binds") {
    // doc1: a b ×5 → bigrams (a,b)=5, (b,a)=4; doc2: c ×5 → (c,c)=4
    // unigrams a=5 b=5 c=5 (N_u=15), bigrams N_b=13. minCount=5 keeps
    // ONLY (a,b): pmi = ln((5/13) / ((5/15)·(5/15))) = ln(45/13)
    val docs = Seq("a b a b a b a b a b", "c c c c c").toDF("text")
    val got = TextOps.pmiCollocations(docs, minCount = 5, topK = 100)
      .as[(Long, String, String, Long, Double)].collect()
    assert(got.length == 1)
    val (rank, x, y, cxy, pmi) = got.head
    assert((rank, x, y, cxy) == ((1L, "a", "b", 5L)))
    // the identical IEEE expression, rounded the way the operator does
    val raw = (5.0 / 13.0) / ((5.0 / 15.0) * (5.0 / 15.0))
    val exp = BigDecimal(math.log(raw))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(pmi == exp, s"pmi $pmi != $exp")
    // floor at 4 admits all three pairs. (b,a) and (c,c) share the
    // joint count 4 AND the unigram product (5/15)² → identical PMI
    // ln(36/13), below (a,b)'s ln(45/13); their tie breaks on x
    // (b < c). Pin the full order:
    val all = TextOps.pmiCollocations(docs, minCount = 4, topK = 100)
      .select("x", "y").as[(String, String)].collect().toSeq
    assert(all == Seq(("a", "b"), ("b", "a"), ("c", "c")))
  }

  test("t12: ties on pmi break by (x, y); topK truncates") {
    // four symmetric pairs with identical counts → identical PMI;
    // order must be lexicographic and stable under topK
    val docs = Seq.fill(5)(Seq("p q", "r s", "t u", "v w")).flatten
      .toDF("text")
    val all = TextOps.pmiCollocations(docs, minCount = 5, topK = 100)
      .as[(Long, String, String, Long, Double)].collect().toSeq
    assert(all.map(r => (r._2, r._3)) ==
      Seq(("p", "q"), ("r", "s"), ("t", "u"), ("v", "w")))
    assert(all.map(_._5).toSet.size == 1, "symmetric pairs tie on pmi")
    val top2 = TextOps.pmiCollocations(docs, minCount = 5, topK = 2)
      .as[(Long, String, String, Long, Double)].collect().toSeq
    assert(top2.map(r => (r._1, r._2, r._3)) ==
      Seq((1L, "p", "q"), (2L, "r", "s")))
  }

  test("t13 core: perfect power law fits slope -1; flat source pins 0") {
    // source zipf: counts 6/3/2 over ranks 1/2/3 — exactly c = 6/r,
    // so ln c = ln 6 - 1·ln r: slope -1, r² 1 (up to the 1e-6
    // contribution rounding). source flat: three equal counts — zero
    // covariance and the vy≤0 guard must pin r² to 0, not divide.
    val docs = Seq(
      ("zipf", (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c"))
        .mkString(" ")),
      ("flat", "p q r p q r p q r"))
      .toDF("source", "text")
    val got = TextOps.zipfFit(docs, minCount = 1)
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val (nz, slope, intercept, r2) = got("zipf")
    assert(nz == 3L)
    assert(math.abs(slope + 1.0) < 1e-4, s"slope $slope")
    assert(math.abs(intercept - math.log(6.0)) < 1e-4, s"intercept $intercept")
    assert(r2 > 0.9999, s"r2 $r2")
    val (nf, fSlope, fIntercept, fR2) = got("flat")
    assert(nf == 3L && fSlope == 0.0 && fR2 == 0.0, s"flat $fSlope $fR2")
    // zero slope -> intercept is the mean of y = ln 3
    assert(math.abs(fIntercept - math.log(3.0)) < 1e-4)
  }
}
