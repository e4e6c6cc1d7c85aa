package graft.ml

import graft.Tables
import graft.operators.{Corpus, TextOps}
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spark ML layer over the corpus-quality signals — the fasttext-style
  * "quality classifier" pattern every large-scale corpus pipeline
  * ships: distill the rule gates (t02 quality score + language gate +
  * t05 repetition flag, the clean() verdict) into one linear scorer
  * that prices a document with a single dot product instead of the
  * full scoring cascade. In production the teacher labels come from
  * a curated seed corpus; here they come from the oracle-checked rule
  * gates themselves, which makes the distillation spec-checkable.
  *
  * Scale notes: the feature frame is the same narrow codegen'd
  * scoring pass + one repetition rollup the gates already pay;
  * LogisticRegression trains with tree-aggregated gradients (driver
  * holds only the coefficient vector). Deterministic: fixed seed,
  * fixed feature order, L-BFGS.
  */
object QualityModel {

  /** Feature frame over the repetition face corpus (documents with
    * planted phrase-repeat degenerates — both label classes present
    * on every tested sf): cheap per-doc signals, label = the full
    * gate verdict (language != und AND quality >= MinQuality AND not
    * repetitive). */
  def features(s: SparkSession, dir: String): DataFrame = {
    val docs = TextOps.repetitionCorpus(Tables.documents(s, dir))
    val scored = graft.functions.TextAnalysis
      .withLangQuality(docs, col("text"), "pred_lang", "quality")
      .select(col("doc_id"), col("pred_lang"), col("quality"),
        length(col("text")).cast("double").as("n_chars"))
    val rep = TextOps.repetitionMetrics(docs)
      .select(col("doc_id"), col("ntok").cast("double").as("ntok"),
        col("top1_frac"), col("top2_frac"), col("dup3_frac"),
        col("repetitive"))
    scored.join(rep, Seq("doc_id"))
      .select(col("doc_id"), col("n_chars"), col("ntok"),
        col("top1_frac"), col("top2_frac"), col("dup3_frac"),
        (col("pred_lang") =!= "und" && col("quality") >= Corpus.MinQuality
          && col("repetitive") === 0L).cast("double").as("label"))
  }

  def pipeline(): Pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols(Array("n_chars", "ntok", "top1_frac", "top2_frac",
        "dup3_frac"))
      .setOutputCol("features")
    val lr = new LogisticRegression()
      .setMaxIter(25).setRegParam(0.01).setStandardization(true)
    new Pipeline().setStages(Array(assembler, lr))
  }

  /** Train on one scale factor, return the scored frame. The feature
    * frame is cached across fit and transform (see
    * [[FraudModel.trainAndScore]] — one feature pass instead of two,
    * fit numerics bit-identical). */
  def trainAndScore(s: SparkSession, dir: String): DataFrame = {
    val f = features(s, dir).transform(graft.CacheRegistry.register)
    val model = pipeline().fit(f)
    model.transform(f)
      .select(col("doc_id"), col("label"), col("prediction"),
        col("probability"))
  }

  /** Pinned serving model (the ml01b pattern — see
    * [[FraudModel.Ml01Coefs]] for the full rationale): ONE
    * deterministic fit of [[pipeline]] on the sf0.01 feature frame,
    * shipped as source literals; QualityModelSpec gates honesty
    * (pinned-margin AUC) and provenance (a re-fit reproduces the
    * literals). Feature order IS the VectorAssembler order. */
  val Ml02Intercept: Double = 1.9792983058706906
  val Ml02Coefs: Seq[(String, Double)] = Seq(
    "n_chars" -> 0.0044456573838341585,
    "ntok" -> 0.02175240904669952,
    "top1_frac" -> -21.168053740383634,
    "top2_frac" -> -15.032756981583955,
    "dup3_frac" -> -4.017496382765778)

  /** The ml02b oracle face: pinned-model serving over the quality
    * feature frame — (doc_id, label, prediction, margin). */
  def ml02bScoreCore(s: SparkSession, dir: String): DataFrame =
    FraudModel.scoreCore(features(s, dir), Ml02Intercept, Ml02Coefs,
      idCol = "doc_id")

  val ml02bSql: String = {
    val margin = FraudModel.marginSql(Ml02Intercept, Ml02Coefs)
    s"""WITH ${graft.operators.TextOps.qualityFeatureCtes},
       m AS (SELECT doc_id, label, $margin AS margin FROM qfeat)
       SELECT doc_id, label,
              CASE WHEN margin > 0.0 THEN 1 ELSE 0 END AS prediction,
              margin
       FROM m"""
  }
}
