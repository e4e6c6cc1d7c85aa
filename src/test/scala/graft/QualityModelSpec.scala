package graft

import graft.ml.QualityModel
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.sql.functions._

/** The ML distillation of the corpus-quality gates (t02 + language +
  * t05 repetition) must actually learn the gates' signal. */
class QualityModelSpec extends SparkSpec {

  test("quality classifier distills the gate verdict (AUC >> 0.5)") {
    val f = QualityModel.features(spark, sf("sf0.01"))
    val pos = f.filter(col("label") === 1.0).count()
    val neg = f.filter(col("label") === 0.0).count()
    assert(pos > 10 && neg > 10,
      s"needs both label classes, got pos=$pos neg=$neg")

    val Array(train, test) = f.randomSplit(Array(0.7, 0.3), seed = 42)
    val model = QualityModel.pipeline().fit(train)
    val scored = model.transform(test)
    val auc = new BinaryClassificationEvaluator()
      .setRawPredictionCol("rawPrediction").setLabelCol("label")
      .evaluate(scored)
    assert(auc > 0.85, s"AUC $auc too low — features carry the signal")

    // the planted degenerates (the t05 class) must be priced LOW: the
    // linear scorer separates every phrase-repeat doc from the bulk
    val degScores = model.transform(f.filter(col("doc_id") % 7 === 0))
    assert(degScores.filter(col("prediction") === 1.0).count() == 0,
      "a phrase-repeat degenerate was scored as keepable")
  }

  test("quality model is deterministic across runs") {
    val a = QualityModel.trainAndScore(spark, sf("sf0.001"))
      .select("doc_id", "prediction")
      .as[(Long, Double)](org.apache.spark.sql.Encoders.product[(Long, Double)])
      .collect().toMap
    val b = QualityModel.trainAndScore(spark, sf("sf0.001"))
      .select("doc_id", "prediction")
      .as[(Long, Double)](org.apache.spark.sql.Encoders.product[(Long, Double)])
      .collect().toMap
    assert(a == b)
  }
}
