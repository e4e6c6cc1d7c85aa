package graft

import graft.operators.{Corpus, Dedup}
import org.apache.spark.sql.functions._

/** Semantics of the corpus-cleaning cascade beyond the DuckDB oracle:
  * invariants of the survivor set. */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("clean: survivors carry no remaining near-dup pair and one id per fp group") {
    val docs = Tables.documents(spark, sf())
    val survivors = Corpus.clean(docs, maxDf = None).cache()
    try {
      val ids = survivors.select("doc_id").as[Long].collect().toSet
      assert(ids.nonEmpty && ids.size < docs.count())

      // re-running near-dup pairing over the survivors finds nothing:
      // every high-Jaccard pair among the deduped set had its b side
      // dropped, and pairwise similarity is monotone under subsetting
      val residual = Dedup.jaccardPairs(
        docs.filter(col("doc_id").isin(ids.toSeq: _*))
          .select(col("doc_id"), col("text")), maxDf = None)
      assert(residual.count() == 0)

      // at most one survivor per canonical fingerprint group
      val fpGroups = docs.filter(col("doc_id").isin(ids.toSeq: _*))
        .select(graft.functions.TextAnalysis.fingerprint(col("text")).as("fp"))
        .groupBy("fp").count().filter(col("count") > 1).count()
      assert(fpGroups == 0)
    } finally {
      // the ad-hoc whole-result cache would otherwise shadow every
      // later suite's c01 plan (CacheManager matches by sameResult
      // across the shared session)
      survivors.unpersist(blocking = true)
      CacheRegistry.unpersistAll()
    }
  }

  test("clean: capped default equals exhaustive at test scale") {
    try {
      val a = Corpus.clean(Tables.documents(spark, sf()))
        .select("doc_id").as[Long].collect().toSet
      val b = Corpus.clean(Tables.documents(spark, sf()), maxDf = None)
        .select("doc_id").as[Long].collect().toSet
      assert(a == b)
    } finally CacheRegistry.unpersistAll()
  }
}
