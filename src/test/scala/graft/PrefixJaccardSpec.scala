package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** d02p prefix-filtered exact Jaccard (the AllPairs/PPJoin prefix
  * principle): completeness and exactness vs the exhaustive
  * generator, the ceil-boundary math, and the binding claim —
  * boilerplate shingles never generate a candidate. */
class PrefixJaccardSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(df: DataFrame): Set[(Long, Long, Long, Double)] =
    df.select("a", "b", "inter", "jacc")
      .as[(Long, Long, Long, Double)].collect().toSet

  test("prefix == exhaustive on the documents table (bit-identical rows)") {
    try {
      val exhaustive = pairs(Dedup.d02(spark, sf("sf0.001"), maxDf = None))
      val prefix = pairs(Dedup.d02p(spark, sf("sf0.001")))
      assert(exhaustive.nonEmpty, "corpus must contain planted near-dups")
      assert(prefix == exhaustive)
    } finally CacheRegistry.unpersistAll()
  }

  test("prefix == exhaustive on the boilerplate corpus; template shingles generate ZERO candidates") {
    // the corpus the df cap exists for: every doc shares a ~90-shingle
    // template block (df == corpus size). Under the rarity order those
    // shingles sort LAST in every doc and fall outside every prefix,
    // so the candidate set is exactly the planted near-dup pairs —
    // the quadratic the exhaustive face pays never exists, and unlike
    // the cap there is no loss mode to document.
    try {
      val corpus = Dedup.boilerplateCorpus((1L to 200L).toDF("doc_id"), 200)
      val exhaustive = pairs(Dedup.jaccardPairs(corpus, maxDf = None))
      val prefix = pairs(Dedup.jaccardPairsPrefix(corpus))
      assert(prefix == exhaustive)
      // planted pairs (ids 50,100,150,200 re-planted with a suffix
      // edit) are all reported
      val planted = (1L to 200L).filter(_ % 50 == 0)
        .map(id => (id, id + Dedup.BoilerplateIdOffset)).toSet
      assert(prefix.map(p => (p._1, p._2)) == planted)
      // the binding claim as a COUNT: candidates == the planted pairs,
      // nothing from the template quadratic (C(204,2) ≈ 20k pairs
      // co-occur on template shingles; none survive the prefix filter)
      val cand = Dedup.prefixCandidates(
        Dedup.shingleFrame(corpus), Dedup.JaccardThreshold)
      assert(cand.count() == planted.size.toLong,
        "prefix candidates must be exactly the planted pairs")
    } finally CacheRegistry.unpersistAll()
  }

  test("ceil-boundary exactness: a pair sitting exactly AT the threshold is kept") {
    // A ⊂ B with |A|=2, |B|=4 shared-2 → jacc = 2/(2+4-2) = 0.5
    // exactly: the prefix length n - ceil(t·n) + 1 and the size-ratio
    // filter must both admit the boundary pair (an off-by-one in the
    // ceil math would drop it — completeness, not a rounding nicety)
    try {
      val docs = Seq(
        (1L, "w1 w2 w3 w4"),
        (2L, "w1 w2 w3 w4 w5 w6")).toDF("doc_id", "text")
      val got = pairs(Dedup.jaccardPairsPrefix(docs))
      assert(got == Set((1L, 2L, 2L, 0.5)))
      // and the same pair through the exhaustive gear — contract equal
      assert(pairs(Dedup.jaccardPairs(docs, maxDf = None)) == got)
    } finally CacheRegistry.unpersistAll()
  }

  test("property: prefix == exhaustive on random small-alphabet corpora across thresholds") {
    // small token alphabet → high shingle dfs and plenty of accidental
    // overlap: the regime where an unsound prefix (too short, wrong
    // order, broken tie-break) loses pairs. Non-binary thresholds
    // (0.3, 0.7) exercise the PrefixEps guard around ceil(t·n).
    val rnd = new scala.util.Random(20260815L)
    for (round <- 0 until 3; t <- Seq(0.3, 0.5, 0.7)) {
      val docs = (1L to 120L).map { id =>
        val len = 3 + rnd.nextInt(23)
        (id, (0 until len).map(_ => s"t${rnd.nextInt(40)}").mkString(" "))
      }.toDF("doc_id", "text")
      try {
        val exhaustive = pairs(
          Dedup.jaccardPairs(docs, maxDf = None, threshold = t))
        val prefix = pairs(Dedup.jaccardPairsPrefix(docs, threshold = t))
        assert(prefix == exhaustive,
          s"round $round t=$t: prefix ${prefix.size} pairs vs " +
            s"exhaustive ${exhaustive.size}")
      } finally CacheRegistry.unpersistAll()
    }
  }
}
