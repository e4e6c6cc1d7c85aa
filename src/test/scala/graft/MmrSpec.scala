package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** s13 MMR semantics: diversification actually demotes a redundant
  * hit — the behavior an oracle can't independently confirm. */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  test("step 2 skips the near-duplicate of the first pick") {
    // q along x. c1 and c3 are mirror images (equal relevance 0.8,
    // tie broken to c1 by vec_id; near-orthogonal to each other);
    // c2 is a near-duplicate of c1 with relevance just below. Pure
    // relevance would rank c1, c2, c3 — MMR's step 2 must demote the
    // duplicate: score(c2) = .7*.79 - .3*~1.0 ≈ .25 loses to
    // score(c3) = .7*.80 - .3*.28 ≈ .48.
    val e = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f)),        // the query itself
      (1L, Array(0.8f, 0.6f, 0.0f)),          // c1: rel .8
      (2L, Array(0.79f, 0.61f, 0.0f)),        // c2: rel ~.7915, sim(c1) ~.9999
      (3L, Array(0.8f, -0.6f, 0.0f)))         // c3: rel .8, sim(c1) = .28
      .toDF("vec_id", "embedding")
    val q = Seq((100L, Array(1.0f, 0.0f, 0.0f))).toDF("qid", "qe")
    val got = Similarity.mmr(e, q)
      .orderBy("step")
      .as[(Long, Int, Long, Double)].collect()
    assert(got.map(_._3).take(3).toSeq == Seq(1L, 3L, 2L))
    // first-pick score is lambda * rel = .7 * .8
    assert(math.abs(got.head._4 - 0.56) < 1e-3)
    // scores never exceed lambda (rel <= 1)
    got.foreach(r => assert(r._4 <= 0.7 + 1e-9))
  }

  test("s13 face: 5 picks per query, step-1 is the s01 top hit") {
    val rows = Similarity.s13(spark, sf("sf0.001"))
      .as[(Long, Int, Long, Double)].collect()
    val byQ = rows.groupBy(_._1)
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, picks) =>
      assert(picks.map(_._2).sorted.toSeq == (1 to Similarity.MmrK).toSeq, s"q=$q")
      assert(picks.map(_._3).distinct.length == Similarity.MmrK, s"q=$q dup pick")
    }
    // step 1 == the s01 rank-1 hit for every query
    val top1 = Similarity.s01(spark, sf("sf0.001"))
      .filter(col("rank") === 1)
      .as[(Long, Int, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    byQ.foreach { case (q, picks) =>
      assert(picks.find(_._2 == 1).get._3 == top1(q), s"q=$q") }
  }
}
