package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch profiling entry (test scope only — never ships):
  * `sbt "Test/runMain graft.tools.ProfMain"`. */
object ProfMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    spark.range(1000000).selectExpr("sum(id*2)").collect()
    val cw = spark.range(100000).toDF("id").cache(); cw.count(); cw.unpersist(true)
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PHASE $name%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    import graft.functions.TextAnalysis._
    val docs = graft.Tables.documents(spark, dir)
    val scored = withQuality(withLangId(docs, col("text"), "pred_lang"),
        col("text"), "quality")
      .filter(col("pred_lang") =!= "und" && col("quality") >= 0.30)
    val w = Window.partitionBy(col("fp")).orderBy(col("doc_id").asc)
    val uniq = scored
      .withColumn("fp", graft.plans.GraftFunctions.fingerprint(spark, col("text")))
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .drop("_rn", "fp")
    val survivors = uniq.select(col("doc_id"), col("pred_lang"), col("quality")).cache()
    t("1 survivors (gates+window)") { println("  n=" + survivors.count()) }
    val survivorText = docs.select(col("doc_id"), col("text"))
      .join(survivors.select(col("doc_id")), Seq("doc_id"), "left_semi")
    val sh = survivorText.select(col("doc_id"),
      explode(graft.plans.GraftFunctions.shingles(spark, col("text"), 3)).as("shingle")).cache()
    t("2 shingle cache") { println("  sh=" + sh.count()) }
    t("3 sizes") { println("  " + sh.groupBy(col("doc_id")).agg(count(lit(1))).count()) }
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a"), col("b.doc_id").as("b"))
      .agg(count(lit(1)).as("inter"))
    t("4 inter pairs (self-join)") { println("  inter=" + inter.count()) }
    t("5 c01 full (second time, warm)") {
      println("  out=" + graft.operators.Corpus.c01(spark, dir).count())
    }
    graft.CacheRegistry.unpersistAll()
    t("6 c01 full again") {
      println("  out=" + graft.operators.Corpus.c01(spark, dir).count())
    }
    graft.CacheRegistry.unpersistAll()
    t("7 d06 cold-ish") {
      println("  out=" + graft.operators.Dedup.d06(spark, dir).count())
    }
    graft.CacheRegistry.unpersistAll()
    t("8 d06 warm") {
      println("  out=" + graft.operators.Dedup.d06(spark, dir).count())
    }
    spark.stop()
  }
}
