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
}
