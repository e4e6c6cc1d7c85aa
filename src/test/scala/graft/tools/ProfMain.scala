package graft.tools

import org.apache.spark.sql.SparkSession
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
    spark.read.parquet(s"$dir/region.parquet").count()
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // FIRST real op in this JVM: the f05 path exactly as benched
    t("f05 full FIRST (cache build + top100)") {
      graft.operators.Fraud.f05(spark, dir).count()
    }
    graft.CacheRegistry.unpersistAll()
    t("trivial cache build (range)") {
      val d = spark.range(100000).toDF("id").cache(); d.count(); d.unpersist(true)
    }
    t("f05 rebuild") {
      graft.operators.Fraud.f05(spark, dir).count()
    }
    graft.CacheRegistry.unpersistAll()
    t("f05 rebuild 2") {
      graft.operators.Fraud.f05(spark, dir).count()
    }
    spark.stop()
  }
}
