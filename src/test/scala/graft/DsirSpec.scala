package graft

import graft.operators.Dsir
import org.apache.spark.sql.functions._

/** c12 DSIR importance resampling: weight direction, target-domain
  * enrichment, and sampling determinism. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("c12: target-like docs outscore non-target-like docs") {
    // target exemplars use one vocabulary, the pool splits between a
    // target-like doc and an alien one — the LLR must separate them
    val docs = Seq(
      (1L, "alpha beta alpha gamma", 1),
      (2L, "beta gamma alpha beta", 1),
      (3L, "alpha beta gamma alpha", 0), // target-like pool doc
      (4L, "zulu yankee xray whisky", 0)) // alien pool doc
      .toDF("doc_id", "text", "t")
    try {
      val m = Dsir.importanceScores(docs, col("t") === 1)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // absolute sign is smoothing-dominated on a 4-doc corpus (the
      // +1/+Buckets terms swamp real counts) — the contract is the
      // ORDERING: target-vocabulary docs above alien-vocabulary docs,
      // by a clear margin
      assert(m(3L) > m(4L) + 1.0, s"LLR ordering wrong: $m")
      assert(m(1L) > m(4L) && m(2L) > m(4L),
        s"exemplars themselves must outscore the alien doc: $m")
    } finally CacheRegistry.unpersistAll()
  }

  test("c12: selected sample is target-enriched over the base rate") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    try {
      val langOf = docs.select(col("doc_id"), col("lang"))
      // noiseless selection: the weights alone find the domain
      val noiseless = Dsir.importanceScores(docs, col("lang") === "en")
        .orderBy(col("score").desc, col("doc_id")).limit(Dsir.TopK)
        .join(langOf, "doc_id")
      val enNoiseless = noiseless.filter(col("lang") === "en").count()
      assert(enNoiseless >= 42, // observed 47/50; base rate would be ~22
        s"noiseless top-${Dsir.TopK} only $enNoiseless en docs")
      // Gumbel-sampled selection: noisier by design, still enriched
      val sampled = Dsir.c12(spark, sf("sf0.01")).join(langOf, "doc_id")
      val enSampled = sampled.filter(col("lang") === "en").count()
      assert(enSampled >= 26, // observed 33/50 vs 21.8 expected at base
        s"sampled top-${Dsir.TopK} only $enSampled en docs")
    } finally CacheRegistry.unpersistAll()
  }

  test("c12: sampling is deterministic and partition-independent") {
    val docs = Tables.documents(spark, sf())
    try {
      val a = Dsir.importanceScores(docs, col("lang") === "en")
        .transform(Dsir.withGumbelKey(_, Dsir.GumbelSalt))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
        .sortBy(_._1)
      CacheRegistry.unpersistAll()
      val b = Dsir.importanceScores(docs.repartition(7, col("lang")),
          col("lang") === "en")
        .transform(Dsir.withGumbelKey(_, Dsir.GumbelSalt))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
        .sortBy(_._1)
      assert(a.sameElements(b), "scores/keys must not depend on partitioning")
      // a different salt is a fresh draw: same scores, different keys
      CacheRegistry.unpersistAll()
      val c = Dsir.importanceScores(docs, col("lang") === "en")
        .transform(Dsir.withGumbelKey(_, "other:"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
        .sortBy(_._1)
      assert(a.map(x => (x._1, x._2)).sameElements(c.map(x => (x._1, x._2))))
      assert(a.map(_._3).toSeq != c.map(_._3).toSeq)
    } finally CacheRegistry.unpersistAll()
  }
}
