package graft

import graft.ml.FraudModel
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.sql.functions._

/** The ML distillation of the rule-based risk engine must actually
  * learn the rules' signal: AUC well above chance on held-out rows. */
class FraudModelSpec extends SparkSpec {

  test("logistic model distills the rule engine (AUC >> 0.5)") {
    val f = FraudModel.features(spark, sf("sf0.01"))
    assert(f.filter(col("label") === 1.0).count() > 10, "needs positive examples")

    val Array(train, test) = f.randomSplit(Array(0.7, 0.3), seed = 42)
    val model = FraudModel.pipeline().fit(train)
    val scored = model.transform(test)
    val auc = new BinaryClassificationEvaluator()
      .setRawPredictionCol("rawPrediction").setLabelCol("label")
      .evaluate(scored)
    assert(auc > 0.85, s"AUC $auc too low — features carry the signal")
  }

  test("trainAndScore is deterministic across runs") {
    val a = FraudModel.trainAndScore(spark, sf("sf0.001"))
      .select("p_partkey", "prediction")
      .as[(Long, Double)](org.apache.spark.sql.Encoders.product[(Long, Double)])
      .collect().toMap
    val b = FraudModel.trainAndScore(spark, sf("sf0.001"))
      .select("p_partkey", "prediction")
      .as[(Long, Double)](org.apache.spark.sql.Encoders.product[(Long, Double)])
      .collect().toMap
    assert(a == b)
  }
}
