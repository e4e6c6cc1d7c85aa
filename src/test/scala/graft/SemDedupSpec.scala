package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** d13 semantic-dedup semantics on planted geometry. */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private def vec(axis: Int, eps: Float, at: Int): Array[Float] = {
    val v = Array.fill(64)(0.0f)
    v(axis) = 1.0f
    v(at) = eps
    v
  }

  test("keep-first chain: lowest id survives, the rest report dup_of") {
    // ids 10, 20, 30 nearly identical: same axis, perturbed at the
    // SAME index with different magnitudes — perturbing different
    // indices can flip the argmax cell between codebook near-ties
    // (the classic SemDeDup boundary effect, deliberately avoided
    // here); id 40 orthogonal
    val rows = Seq(
      (10L, vec(0, 0.01f, 32)), (20L, vec(0, 0.02f, 32)),
      (30L, vec(0, 0.03f, 32)), (40L, vec(1, 0.01f, 32)))
    val e = rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val got = Similarity.semanticDedup(e)
      .select("vec_id", "dup_of", "n_dups")
      .as[(Long, Long, Long)].collect().toSet
    // 10 survives (no lower id); 20 dups-of 10; 30 dups-of 10 (min of
    // {10, 20}) with two near-neighbors below it
    assert(got == Set((20L, 10L, 1L), (30L, 10L, 2L)))
  }

  test("cross-cell near-dups are not candidates (blocking is the cell)") {
    // two vectors on DIFFERENT dominant axes land in different cells
    // even though their cosine to each other is below threshold —
    // sanity that nothing pairs across cells
    val rows = Seq((1L, vec(0, 0.3f, 10)), (2L, vec(1, 0.3f, 10)))
    val e = rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val asg = Similarity.assignCells(e)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    if (asg(1L) != asg(2L))
      assert(Similarity.semanticDedup(e).count() == 0)
  }

  test("d13 face: removals are a strict subset of the corpus, deterministic") {
    val a = Similarity.d13(spark, sf("sf0.001"))
      .as[(Long, Int, Long, Long)].collect().toSet
    val b = Similarity.d13(spark, sf("sf0.001"))
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(a == b)
    assert(a.forall { case (v, _, d, _) => d < v })
  }

  test("s14: the cluster's most central member is pruned, the outlier never") {
    // label 0: four tight x-axis vectors + one y-axis outlier (n=5 →
    // prune floor(5·20/100) = exactly 1); label 1: four vectors (n=4
    // → prune floor(0.8) = 0, the boundary case)
    val rows = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.9f, 0.1f), 0),
      (3L, Array(1.0f, 0.1f), 0), (4L, Array(0.95f, 0.05f), 0),
      (5L, Array(0.0f, 1.0f), 0), // the outlier
      (11L, Array(1.0f, 0.0f), 1), (12L, Array(0.9f, 0.1f), 1),
      (13L, Array(1.0f, 0.1f), 1), (14L, Array(0.95f, 0.05f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.centroidPrune(rows)
      .select(col("label"), col("vec_id"), col("rank"), col("n_label"),
        col("pruned"))
      .as[(Int, Long, Long, Long, Boolean)].collect()
    val l0 = got.filter(_._1 == 0)
    assert(l0.map(_._4).toSet == Set(5L))
    // exactly one pruned in label 0, and it is the rank-1 prototype
    assert(l0.filter(_._5).map(_._3).toSeq == Seq(1L))
    // the orthogonal outlier ranks dead last and is never pruned
    val outlier = l0.find(_._2 == 5L).get
    assert(outlier._3 == 5L && !outlier._5)
    // n=4 cluster: the 20% floor rounds to zero — nothing pruned
    assert(got.filter(_._1 == 1).forall(!_._5))
  }

  test("s14: partition-independence (decimal-summed centroid accumulation)") {
    val e = graft.Tables.embeddings(spark, sf("sf0.001"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Int, Long, Double, Long, Long, Boolean)].collect().toSet
    val a = rows(Similarity.centroidPrune(e))
    val b = rows(Similarity.centroidPrune(e.repartition(13, col("vec_id"))))
    assert(a == b)
    assert(a.nonEmpty)
  }
}
