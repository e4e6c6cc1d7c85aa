package graft.ml

import graft.operators.Fraud
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spark ML layer over the fraud features: the risk engine's signals
  * (composite z, price/estimate ratio, price) become a feature vector
  * and train a logistic model for high-risk prediction — the
  * "feature engineering + model training" path the reference's
  * rule-based scorer feeds at scale.
  *
  * Scale notes: feature extraction is the same broadcast-join plan as
  * f04 (no extra shuffles); LogisticRegression trains with
  * tree-aggregated gradients (driver holds only the coefficient
  * vector). Deterministic: fixed seed, fixed feature order, L-BFGS.
  */
object FraudModel {

  /** Feature frame from the risk engine — the same signals the rules
    * see (price stats, listing-text flags), so the model can distill
    * them. Label = rule-engine high-risk (in production the label
    * would come from confirmed-fraud feedback). */
  def features(s: SparkSession, dir: String): DataFrame =
    Fraud.f04WithFactors(s, dir).select(
      col("p_partkey"),
      col("composite_z"),
      when(col("estimated_value") > 0, col("price") / col("estimated_value"))
        .otherwise(1.0).as("price_ratio"),
      col("price"),
      length(col("p_name")).cast("double").as("name_len"),
      col("p_name").rlike("red|hot").cast("double").as("contact_kw"),
      (col("risk_score") >= 30).cast("double").as("label"))

  def pipeline(): Pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols(Array("composite_z", "price_ratio", "price",
        "name_len", "contact_kw"))
      .setOutputCol("features")
    val lr = new LogisticRegression()
      .setMaxIter(25).setRegParam(0.01).setStandardization(true)
    new Pipeline().setStages(Array(assembler, lr))
  }

  /** Train on one scale factor, return the scored frame. */
  def trainAndScore(s: SparkSession, dir: String): DataFrame = {
    val f = features(s, dir)
    val model = pipeline().fit(f)
    model.transform(f)
      .select(col("p_partkey"), col("label"), col("prediction"),
        col("probability"))
  }

  /** Driver faces (rows-only by design — L-BFGS is deterministic up
    * to float-reduction order, so per-item predictions near the
    * decision boundary are not portable-SQL material; the AUC ≥ 0.95
    * distillation gate stays in FraudModelSpec / QualityModelSpec):
    * the rule-distillation scored frames, one row per item/document.
    * These put the ML family's end-to-end train→score path under the
    * driver's execution gate (r17 verdict item 7). */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml01_rule_distill" -> ((s: SparkSession, dir: String) =>
      trainAndScore(s, dir)
        .select(col("p_partkey"), col("label"), col("prediction"))),
    "ml02_quality_distill" -> ((s: SparkSession, dir: String) =>
      QualityModel.trainAndScore(s, dir)
        .select(col("doc_id"), col("label"), col("prediction"))))
}
