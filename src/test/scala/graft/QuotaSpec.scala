package graft

import graft.operators.Quota
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** c16 semantics the oracle alone can't pin: equivalence of the
  * two-phase bucketed selection with the naive global sort on a
  * SKEWED planted frame (the oracle corpus is uniform), quota
  * binding, and partition-independence. */
class QuotaSpec extends SparkSpec {
  import spark.implicits._

  /** naive reference: row_number over (h, doc_id) per source. */
  private def naive(docs: org.apache.spark.sql.DataFrame, quota: Int) = {
    docs.select(col("doc_id"), col("source"),
        graft.plans.GraftFunctions.md5Prefix60(spark,
          col("doc_id").cast("string")).as("h"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))))
      .filter(col("rk") <= quota)
      .select(col("doc_id"), col("source"))
  }

  test("two-phase selection == naive sort on a skewed frame") {
    // one giant source (hits many hash buckets), one exactly-at-quota,
    // one under quota
    val docs = ((1L to 5000L).map(i => (i, "giant")) ++
      (6000L to 6006L).map(i => (i, "at")) ++
      (7000L to 7002L).map(i => (i, "small")))
      .toDF("doc_id", "source")
    val quota = 7
    val got = Quota.sourceQuota(docs, quota)
      .as[(Long, String)].collect().toSet
    val want = naive(docs, quota).as[(Long, String)].collect().toSet
    assert(got == want)
    val bySrc = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySrc == Map("giant" -> 7, "at" -> 7, "small" -> 3))
  }

  test("under-quota sources pass through untouched") {
    val docs = (1L to 5L).map(i => (i, "only")).toDF("doc_id", "source")
    val got = Quota.sourceQuota(docs, 10).as[(Long, String)].collect().toSet
    assert(got == (1L to 5L).map(i => (i, "only")).toSet)
  }

  test("c16 face: exactly quota survivors per source at sf0.001") {
    val got = Quota.c16(spark, sf("sf0.001"))
    val bySrc = got.groupBy("source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(bySrc.size == 20)
    assert(bySrc.values.forall(_ == Quota.DefaultQuota.toLong))
  }

  test("partition-independence of the selection") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val a = Quota.sourceQuota(docs).as[(Long, String)].collect().toSet
    val b = Quota.sourceQuota(docs.repartition(13, col("doc_id")))
      .as[(Long, String)].collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
