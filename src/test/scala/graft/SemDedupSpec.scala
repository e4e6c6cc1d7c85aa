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
}
