package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** s11 kNN-classification semantics on planted geometry (the oracle
  * pins cross-engine parity; the synthetic table's labels are
  * independent of its geometry, so signal must be planted here). */
class KnnSpec extends SparkSpec {
  import spark.implicits._

  /** three orthogonal-axis clusters; vec i of cluster c points along
    * axis c with a tiny distinct perturbation on axis 3+i. */
  private def cluster(c: Int, n: Int, base: Long): Seq[(Long, Array[Float], Int)] =
    (0 until n).map { i =>
      val v = Array.fill(8)(0.0f)
      v(c) = 1.0f
      v(3 + i) = 0.05f
      (base + i, v, c)
    }

  test("planted clusters: every prediction is the cluster label") {
    val rows = cluster(0, 4, 0L) ++ cluster(1, 4, 100L) ++ cluster(2, 4, 200L)
    val e = rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    // every 100th id is a query: 0, 100, 200 — one per cluster
    val q = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val topk = Similarity.annBruteForce(e, q, k = 3)
    val got = Similarity.knnClassify(topk, e)
      .select("qid", "pred_label", "correct")
      .as[(Long, Int, Boolean)].collect().toSet
    assert(got == Set((0L, 0, true), (100L, 1, true), (200L, 2, true)))
  }

  test("vote tie breaks to the nearest neighbor's label") {
    // query 0 along axis 0; one label-7 vector very close, one
    // label-8 vector slightly further: k=2 → 1 vote each, label 7
    // must win via best_rank even though 8 > 7 would also tie-break
    // the other way if ranks were ignored — so flip: make the CLOSER
    // one the LARGER label to prove rank beats label order
    val rows = Seq(
      (0L, Array(1.0f, 0f, 0f, 0f), 0),
      (1L, Array(0.99f, 0.1f, 0f, 0f), 8),  // closer, larger label
      (2L, Array(0.9f, 0.3f, 0f, 0f), 7))   // further, smaller label
    val e = rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val q = e.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val got = Similarity.knnClassify(
      Similarity.annBruteForce(e, q, k = 2), e)
      .select("qid", "pred_label").as[(Long, Int)].collect().toSet
    assert(got == Set((0L, 8)))
  }

  test("s11 face is total over the query set and matches s01's qids") {
    val s11 = Similarity.s11(spark, sf("sf0.001"))
    val qids = Similarity.s01(spark, sf("sf0.001"))
      .select("qid").distinct().as[Long].collect().toSet
    val got = s11.select("qid").as[Long].collect().toSeq
    assert(got.toSet == qids && got.size == qids.size) // one row per query
  }

  // --- s20: hard-negative mining ----------------------------------

  test("s20: negatives are cross-label only, the planted near-miss " +
      "ranks first, margin = pos_cos - cos, self excluded") {
    val rows = Seq(
      (0L, Array(1.0f, 0f, 0f, 0f), 0),       // the query
      (1L, Array(0.9f, 0.05f, 0f, 0f), 0),    // its positive
      (2L, Array(0.99f, 0.01f, 0f, 0f), 1),   // HARD negative (closest of all)
      (3L, Array(0.5f, 0.5f, 0f, 0f), 1),     // softer negative
      (4L, Array(0f, 0f, 1.0f, 0f), 2))       // far negative
    val e = rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val q = e.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("label").as("qlabel"))
    val got = Similarity.hardNegatives(e, q, k = 3)
      .orderBy("rank")
      .select("rank", "vec_id", "label").as[(Int, Long, Int)].collect().toSeq
    // same-label vec 1 and the query itself never appear
    assert(got == Seq((1, 2L, 1), (2, 3L, 1), (3, 4L, 2)))
    val m = Similarity.hardNegatives(e, q, k = 3)
      .filter(col("rank") === 1)
      .select("cos", "pos_cos", "margin").as[(Double, Double, Double)].head()
    assert(m._3 == m._2 - m._1)
    // the hard negative genuinely beats the positive: margin < 0
    assert(m._3 < 0)
  }

  test("s22: recall is monotone in the probe budget and hits are " +
      "bounded by expected") {
    val curve = Similarity.s22(spark, sf("sf0.001"))
      .orderBy("probes")
      .select("probes", "expected", "hits", "recall")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(curve.map(_._1) == Seq(1L, 2L, 4L))
    // widening the probe set can only ADD candidates → recall is
    // non-decreasing, and each budget's hits stay within bounds
    curve.sliding(2).foreach { case Seq(a, b) => assert(a._4 <= b._4) }
    curve.foreach { case (_, exp, hits, r) =>
      assert(hits >= 0 && hits <= exp)
      assert(r == math.rint(hits.toDouble / exp * 1e6) / 1e6 ||
        math.abs(r - hits.toDouble / exp) < 1e-6)
    }
  }

  test("s20: a query with no same-label partner gets null pos_cos/margin") {
    val rows = Seq(
      (0L, Array(1.0f, 0f, 0f, 0f), 9),       // singleton label
      (2L, Array(0.9f, 0.1f, 0f, 0f), 1))
    val e = rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val q = e.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("label").as("qlabel"))
    val r = Similarity.hardNegatives(e, q, k = 2)
      .select("vec_id", "pos_cos", "margin").collect()
    assert(r.length == 1 && r(0).getLong(0) == 2L)
    assert(r(0).isNullAt(1) && r(0).isNullAt(2))
  }
}
