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

  test("pinned serving model (ml02b) is honest and IS a fit of this " +
      "pipeline") {
    val f = QualityModel.features(spark, sf("sf0.01"))
    // honesty: the shipped literals still rank gate-positives above
    // negatives, and price every planted degenerate low
    val scored = graft.ml.FraudModel.scoreCore(f,
      QualityModel.Ml02Intercept, QualityModel.Ml02Coefs, idCol = "doc_id")
    val auc = new BinaryClassificationEvaluator()
      .setRawPredictionCol("raw").setLabelCol("label")
      .evaluate(scored.select(col("label").cast("double").as("label"),
        col("margin").as("raw")))
    assert(auc > 0.95, s"pinned-model AUC $auc — artifact gone stale?")
    assert(scored.filter(col("doc_id") % 7 === 0 &&
      col("prediction") === 1).count() == 0,
      "a phrase-repeat degenerate was scored keepable by the pinned model")
    // provenance: a re-fit on the same frame reproduces the literals
    // to float-reduction noise — the quality features flow through a
    // shuffle, so the L-BFGS gradient tree-aggregation order (and the
    // last ~2 ulps of each coefficient) depends on the session's
    // partition layout; 1e-12 relative still proves the literals are
    // a genuine fit of THIS pipeline, not folklore (ml01's fit is
    // shuffle-free and pins exact — see FraudModelSpec)
    val lr = QualityModel.pipeline().fit(f).stages(1)
      .asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel]
    def close(a: Double, b: Double): Boolean =
      math.abs(a - b) <= 1e-12 * math.max(math.abs(a), math.abs(b))
    assert(close(lr.intercept, QualityModel.Ml02Intercept),
      s"intercept ${lr.intercept} vs pinned ${QualityModel.Ml02Intercept}")
    lr.coefficients.toArray.zip(QualityModel.Ml02Coefs.map(_._2))
      .foreach { case (got, want) =>
        assert(close(got, want), s"coefficient $got vs pinned $want") }
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
