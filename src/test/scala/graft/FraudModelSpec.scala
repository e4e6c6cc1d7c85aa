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

  test("model artifact round-trip: save -> load -> identical predictions") {
    // the ML analog of the market_stats.json artifact: the trained
    // PipelineModel persists through the Hadoop FS API and reloads to
    // the exact same scoring function (cluster-deployable artifact)
    val f = FraudModel.features(spark, sf("sf0.001"))
    val model = FraudModel.pipeline().fit(f)
    val path = java.nio.file.Files.createTempDirectory("graft-model")
      .resolve("fraud-lr").toString
    model.write.overwrite().save(path)
    val loaded = org.apache.spark.ml.PipelineModel.load(path)
    val want = model.transform(f).select("p_partkey", "prediction", "probability")
      .collect().map(_.toString).sorted
    val got = loaded.transform(f).select("p_partkey", "prediction", "probability")
      .collect().map(_.toString).sorted
    assert(got.sameElements(want))
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
