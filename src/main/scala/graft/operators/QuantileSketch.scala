package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded-memory quantile sketch — the scale escape hatch for the one
  * place [[IncrementalStats]]' exact value-counts state can grow
  * unboundedly: a continuous value column with ~all-distinct values
  * (timings, ratios), where "one row per distinct value" IS the fact
  * table again. DDSketch-style (Masson et al., VLDB'19) relative-
  * accuracy log buckets: a positive value lands in bucket
  * ceil(ln x / ln γ) with γ = (1+α)/(1−α), so any quantile estimated
  * by the bucket midpoint 2γ^b/(γ+1) carries relative error ≤ α
  * BY CONSTRUCTION, and the per-group state is O(log(range)/α)
  * buckets no matter how many distinct values arrive.
  *
  * The state is the same (keys…, bucket, _c) shape as the exact
  * value-counts state, so it inherits the whole maintenance algebra
  * unchanged: exactly mergeable (sum _c), exactly retractable
  * (subtract _c), foldable into generations. Deterministic end to
  * end — no sampling, no RNG — so merge(fit(a), fit(b)) ==
  * fit(a ∪ b) holds EXACTLY (integer counts), not just
  * approximately; property-tested in `QuantileSketchSpec` alongside
  * the α error bound against exact quantiles.
  *
  * Zero and negative values fold into a sentinel bucket estimated as
  * 0.0 — adequate for the price/measure domains here; a full
  * negative mirror is the same construction with a sign split.
  */
object QuantileSketch {

  val DefaultAlpha = 0.01

  def gamma(alpha: Double): Double = (1 + alpha) / (1 - alpha)

  /** Sentinel bucket for values <= 0. */
  val ZeroBucket: Int = Int.MinValue + 1

  def bucketOf(x: Column, alpha: Double): Column =
    when(x > 0, ceil(log(x) / log(lit(gamma(alpha)))).cast("int"))
      .otherwise(lit(ZeroBucket))

  /** Sketch state of `df`: one row per (keys…, _qb) with count `_c`. */
  def fit(df: DataFrame, keys: Seq[String], value: String,
      alpha: Double = DefaultAlpha): DataFrame =
    df.select(keys.map(col) :+
        bucketOf(col(value).cast("double"), alpha).as("_qb"): _*)
      .groupBy((keys :+ "_qb").map(col): _*)
      .agg(count(lit(1)).as("_c"))

  /** Exact merge — the value-counts algebra on the bucket column. */
  def merge(states: Seq[DataFrame]): DataFrame =
    IncrementalStats.merge(states)

  /** Exact retraction of an expired slice's sketch. */
  def retract(state: DataFrame, expired: DataFrame): DataFrame =
    IncrementalStats.retract(state, expired)

  /** Quantile estimates from a sketch state: one row per (keys…, q)
    * with the ≤α-relative-error estimate. `qs` uses the lower order
    * statistic convention (rank = ceil(q·n), q in (0, 1]). */
  def quantiles(state: DataFrame, keys: Seq[String], qs: Seq[Double],
      alpha: Double = DefaultAlpha): DataFrame = {
    val g = gamma(alpha)
    val k = keys.map(col)
    val w = Window.partitionBy(k: _*).orderBy(col("_qb").asc)
    val wAll = Window.partitionBy(k: _*)
    val cum = state
      .withColumn("_cum", sum(col("_c")).over(w))
      .withColumn("_n", sum(col("_c")).over(wAll))
    val qdf = state.sparkSession
      .createDataset(qs)(org.apache.spark.sql.Encoders.scalaDouble).toDF("q")
    cum.crossJoin(broadcast(qdf))
      .filter(col("_cum") >= ceil(col("q") * col("_n")))
      .groupBy(k :+ col("q"): _*)
      .agg(min(col("_qb")).as("_qb"))
      .select(k ++ Seq(col("q"),
        when(col("_qb") === ZeroBucket, lit(0.0))
          .otherwise(lit(2.0) * pow(lit(g), col("_qb")) / lit(g + 1))
          .as("estimate")): _*)
  }

  /** Upper bound on buckets a (minPos, maxPos) positive range can
    * occupy — the state-size guarantee the spec asserts. */
  def maxBuckets(minPos: Double, maxPos: Double, alpha: Double): Long =
    math.ceil(math.log(maxPos / minPos) / math.log(gamma(alpha))).toLong + 2

  /** Maintain sketch quantiles over a stream — identical lifecycle to
    * `IncrementalStats.maintainStats` (the state shares its shape, so
    * `foldBatch`'s generation-versioned exactly-once fold applies
    * verbatim): each micro-batch's sketch delta folds into the state,
    * the quantile frame is republished. Replay of a batch id rebuilds
    * the identical generation (overwrite from the same parent), so a
    * crash between fold and publish re-converges. */
  def maintainQuantiles(stream: DataFrame, keys: Seq[String], value: String,
      qs: Seq[Double], stateDir: String, outDir: String,
      checkpointDir: String,
      alpha: Double = DefaultAlpha): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val merged = IncrementalStats.foldBatch(stateDir,
          fit(batch, keys, value, alpha), id)
        quantiles(merged, keys, qs, alpha)
          .write.mode("overwrite").parquet(outDir)
      }
      .start()
}
