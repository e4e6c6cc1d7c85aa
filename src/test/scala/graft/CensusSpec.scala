package graft

import graft.operators.Census
import org.apache.spark.sql.functions._

/** c13 corpus census: signal accounting against independently computed
  * expectations, and the all-clean negative control. */
class CensusSpec extends SparkSpec {
  import spark.implicits._

  test("c13: planted degenerates are counted as both dups and repetitive") {
    val out = Census.c13(spark, sf()).cache()
    try {
      val docs = Tables.documents(spark, sf())
      val groups = docs.select(col("source"), col("lang")).distinct().count()
      assert(out.count() == groups, "one census row per (source, lang)")
      val planted = docs.filter(col("doc_id") % 7 === 0).count()
      assert(out.agg(sum(col("rep_docs"))).as[Long].head() == planted,
        "every planted phrase-repeat doc must be flagged repetitive")
      // the planted docs all share one fingerprint, so each is an
      // exact dup; natural dup pressure can only add to that
      assert(out.agg(sum(col("dup_docs"))).as[Long].head() >= planted)
      assert(out.agg(sum(col("docs"))).as[Long].head() == docs.count())
      val mq = out.agg(min(col("mean_quality")), max(col("mean_quality")))
        .as[(Double, Double)].head()
      assert(mq._1 > 0.0 && mq._2 <= 1.0, s"quality out of range: $mq")
    } finally { out.unpersist(); CacheRegistry.unpersistAll() }
  }

  test("c13: census over the natural corpus reports zero degeneracy") {
    val docs = Tables.documents(spark, sf())
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
    try {
      val out = Census.census(docs)
      assert(out.agg(sum(col("rep_docs"))).as[Long].head() == 0L,
        "t05 is calibrated for zero natural false positives")
    } finally CacheRegistry.unpersistAll()
  }
}
