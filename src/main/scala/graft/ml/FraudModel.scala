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

  /** Train on one scale factor, return the scored frame.
    *
    * The feature frame is CACHED across fit and transform (r20): the
    * fit consumes it once (a cached input also makes Spark ML skip
    * its internal instance persist) and the scoring transform
    * otherwise re-executed the whole feature plan a second time.
    * Numerics are untouched — same rows, same partitioning, same
    * tree-aggregation order, so the fit is bit-identical (the
    * determinism/provenance specs pin this). */
  def trainAndScore(s: SparkSession, dir: String): DataFrame = {
    val f = features(s, dir).transform(graft.CacheRegistry.register)
    val model = pipeline().fit(f)
    model.transform(f)
      .select(col("p_partkey"), col("label"), col("prediction"),
        col("probability"))
  }

  // ---------------------------------------------------------------
  // ml01b: the pinned-coefficient SERVING twin (the f12b pattern
  // applied to the model artifact, r18 verdict item 5). Training is
  // L-BFGS — deterministic in one JVM but not portable-SQL material
  // (float-reduction order), so ml01 stays rows-only with its AUC
  // gate. SERVING, though, is pure column arithmetic: one dot
  // product + a margin threshold, written as the identical
  // left-associated IEEE expression in both engines — so the shipped
  // model's scoring path is hash-checked by the DuckDB oracle at
  // both SFs, and the artifact lifecycle (write → read → score) gets
  // the s05b round-trip treatment.
  // ---------------------------------------------------------------

  /** Pinned production model: ONE deterministic fit of [[pipeline]]
    * on the sf0.01 feature frame (fixed seed/feature order; the fit
    * is bit-reproducible in-JVM — see "trainAndScore is
    * deterministic" in FraudModelSpec). Shipped as source literals
    * the way RiskEngine pins its f12b stats; FraudModelSpec's
    * distillation gate keeps the pinned numbers honest (AUC of the
    * pinned margin against the rule labels). Feature order IS the
    * VectorAssembler order. */
  val Ml01Intercept: Double = 10.669896772983169
  val Ml01Coefs: Seq[(String, Double)] = Seq(
    "composite_z" -> -0.34140585868356266,
    "price_ratio" -> -10.00950026860751,
    "price" -> -0.0015891187007965497,
    "name_len" -> -0.28280393722631414,
    "contact_kw" -> 6.43949101741209)

  /** Score a feature frame with a linear model as plain columns:
    * margin = intercept + Σ coef·feature, LEFT-ASSOCIATED in coef
    * order (the cross-engine bit-exactness contract — DuckDB's
    * parser folds `a + b + c` the same way), prediction = margin > 0
    * (≡ sigmoid(margin) > 0.5 without the libm exp portability
    * hazard). Whole-stage-codegen arithmetic, no vector UDF, no ML
    * runtime on the serving path. */
  def scoreCore(feat: DataFrame, intercept: Double,
      coefs: Seq[(String, Double)], idCol: String = "p_partkey"): DataFrame = {
    val margin = coefs.foldLeft(lit(intercept)) {
      case (acc, (f, c)) => acc + lit(c) * col(f)
    }
    feat.select(col(idCol), col("label").cast("int").as("label"),
      when(margin > 0.0, 1).otherwise(0).as("prediction"),
      margin.as("margin"))
  }

  /** The shipped-model artifact (s05b treatment): one tiny parquet of
    * (position, feature, coef) rows with the intercept at position
    * -1 — bounded model metadata, the RiskEngine stats-artifact
    * shape. Read restores the exact coefficient ORDER (the margin
    * sum is order-sensitive by the bit-exactness contract). */
  def writeModel(s: SparkSession, path: String, intercept: Double,
      coefs: Seq[(String, Double)]): Unit = {
    val rows = ((-1, "__intercept__", intercept) +:
      coefs.zipWithIndex.map { case ((f, c), i) => (i, f, c) })
    import s.implicits._
    rows.toDF("position", "feature", "coef")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def readModel(s: SparkSession, path: String): (Double, Seq[(String, Double)]) = {
    import s.implicits._
    val rows = s.read.parquet(path)
      .select(col("position"), col("feature"), col("coef"))
      .as[(Int, String, Double)].collect().sortBy(_._1)
    val (icept, feats) = rows.partition(_._1 < 0)
    require(icept.length == 1, s"model artifact at $path has ${icept.length} intercept rows")
    (icept.head._3, feats.map(r => r._2 -> r._3).toSeq)
  }

  /** The ml01b oracle face: pinned-model serving over the ml01
    * feature frame — (p_partkey, label, prediction, margin). */
  def ml01bScoreCore(s: SparkSession, dir: String): DataFrame =
    scoreCore(features(s, dir), Ml01Intercept, Ml01Coefs)

  /** DuckDB double literals go through a string cast: a bare decimal
    * literal parses as DECIMAL, and DuckDB's decimal→double
    * conversion is not guaranteed correctly rounded at 17
    * significant digits — CAST('…' AS DOUBLE) is strtod on both
    * engines, exact by round-trip. */
  private[ml] def dlit(d: Double): String =
    s"CAST('${java.lang.Double.toString(d)}' AS DOUBLE)"

  /** The margin as SQL text — the same left-associated chain
    * [[scoreCore]] builds as Columns. */
  private[ml] def marginSql(intercept: Double,
      coefs: Seq[(String, Double)]): String =
    coefs.foldLeft(dlit(intercept)) {
      case (acc, (f, c)) => s"$acc + ${dlit(c)} * $f"
    }

  private val ml01bSql: String = {
    val margin = marginSql(Ml01Intercept, Ml01Coefs)
    s"""${Fraud.f04Ctes},
       feat AS (SELECT r.p_partkey,
           r.composite_z,
           CASE WHEN r.estimated_value > 0 THEN r.price / r.estimated_value
                ELSE 1.0 END AS price_ratio,
           r.price,
           CAST(length(r.p_name) AS DOUBLE) AS name_len,
           CASE WHEN regexp_matches(r.p_name, 'red|hot') THEN 1.0
                ELSE 0.0 END AS contact_kw,
           CASE WHEN sc.risk_score >= 30 THEN 1 ELSE 0 END AS label
         FROM risk r JOIN scored sc ON r.p_partkey = sc.p_partkey),
       m AS (SELECT p_partkey, label, $margin AS margin FROM feat)
       SELECT p_partkey, label,
              CASE WHEN margin > 0.0 THEN 1 ELSE 0 END AS prediction,
              margin
       FROM m"""
  }

  val oracles: Map[String, String] = Map(
    "ml01b_score_core" -> ml01bSql,
    "ml02b_score_core" -> QualityModel.ml02bSql)

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
        .select(col("doc_id"), col("label"), col("prediction"))),
    "ml01b_score_core" -> (ml01bScoreCore _),
    "ml02b_score_core" -> ((s: SparkSession, dir: String) =>
      QualityModel.ml02bScoreCore(s, dir)))
}
