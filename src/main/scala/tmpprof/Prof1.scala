import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Prof1 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    spark.range(1000000).selectExpr("sum(id*2)").collect()
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f; println(f"$name%-30s ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    import graft.functions.TextAnalysis._
    import org.apache.spark.sql.expressions.Window
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
    t("1 survivors materialize") { println("  n=" + survivors.count()) }
    val survivorText = docs.select(col("doc_id"), col("text"))
      .join(survivors.select(col("doc_id")), Seq("doc_id"), "left_semi")
    val sh = survivorText.select(col("doc_id"),
      explode(graft.plans.GraftFunctions.shingles(spark, col("text"), 3)).as("shingle")).cache()
    t("2 shingle cache") { println("  sh=" + sh.count()) }
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n")).cache()
    t("3 sizes") { println("  " + sizes.count()) }
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a"), col("b.doc_id").as("b"))
      .agg(count(lit(1)).as("inter")).cache()
    t("4 inter pairs") { println("  inter=" + inter.count()) }
    val jacc = inter
      .join(sizes.select(col("doc_id"), col("n").as("na")), col("a") === col("doc_id")).drop("doc_id")
      .join(sizes.select(col("doc_id"), col("n").as("nb")), col("b") === col("doc_id")).drop("doc_id")
      .select(col("a"), col("b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jacc"))
      .filter(col("jacc") >= 0.5)
    val drops = jacc.select(col("b").as("doc_id")).distinct()
    t("5 drops") { println("  drops=" + drops.count()) }
    t("6 final anti join") { println("  out=" + survivors.join(drops, Seq("doc_id"), "left_anti").count()) }
    spark.stop()
  }
}
