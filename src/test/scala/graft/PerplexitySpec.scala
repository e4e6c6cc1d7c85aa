package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** t08 CCNet-style perplexity: the filter's discriminating property —
  * target-domain docs score lower perplexity — plus model edges. */
class PerplexitySpec extends SparkSpec {
  import spark.implicits._

  test("t08: target-language docs score lower perplexity than the rest") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    try {
      val ppl = TextOps.perplexity(docs, col("lang") === "en")
        .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      val byLang = ppl.groupBy(col("lang"))
        .agg((sum(col("ppl").cast("decimal(25,8)")).cast("double") /
          count(lit(1))).as("mean_ppl"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val en = byLang("en")
      byLang.filterNot(_._1 == "en").foreach { case (lang, m) =>
        assert(en + 1.5 < m,
          s"en mean $en should sit well under $lang mean $m")
      }
    } finally CacheRegistry.unpersistAll()
  }

  test("t08: seen bigrams outscore unseen; OOV still finite") {
    // model fit on doc 1; doc 2 repeats its bigrams, doc 3 is OOV
    val docs = Seq(
      (1L, "the cat sat on the mat", 1),
      (2L, "the cat sat", 0),
      (3L, "zulu yankee xray", 0)).toDF("doc_id", "text", "t")
    try {
      val m = TextOps.perplexity(docs, col("t") === 1)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(m(2L) < m(3L),
        s"in-model doc must be less perplexing: $m")
      assert(m(3L).isFinite && m(3L) > 0, s"OOV ppl must stay finite: $m")
      // one-token docs are not scored (no bigrams)
      val one = TextOps.perplexity(
        Seq((9L, "single", 0)).toDF("doc_id", "text", "t"), col("t") === 1)
      assert(one.count() == 0)
    } finally CacheRegistry.unpersistAll()
  }
}
