package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  // ---------------------------------------------------------------
  // f30: the sketch's driver-checked face (r14 verdict item 5 — the
  // last major operator with no oracle row). Fit the sketch per
  // return flag over l_quantity on the two l_orderkey-parity HALVES
  // of lineitem, MERGE the halves, estimate five quantiles. The
  // oracle replays fit-on-all — so the exact-merge property itself
  // (merge(fit(a), fit(b)) == fit(a ∪ b)) is driver-checked, not
  // just spec-asserted.
  //
  // Bit-exactness across engines (the s03b centroid-inline pattern):
  // DuckDB never computes ln/pow — the (value → bucket, estimate)
  // mapping for the face's integer value domain (l_quantity is
  // 1..50 by TPC-H construction) is precomputed HERE with the same
  // java.lang.Math calls Spark's codegen emits and inlined as a
  // VALUES table; a value outside the domain drops from the oracle
  // join and fails the row-count gate loudly. Rank arithmetic
  // (ceil(q·n)) runs in DOUBLE on both sides — IEEE multiply/ceil
  // are deterministic, so the selected bucket is identical even at
  // the 0.95·n ulp boundary. Estimates are HALF_UP-rounded to 6
  // here (Spark's round semantics) and emitted as round-tripping
  // literals.
  // ---------------------------------------------------------------

  val F30Qs = Seq(0.25, 0.5, 0.75, 0.95, 0.99)

  def f30(s: SparkSession, dir: String): DataFrame = {
    val li = graft.Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_quantity"), col("l_orderkey"))
    val halves = Seq(0, 1).map(h =>
      fit(li.filter(pmod(col("l_orderkey"), lit(2)) === h),
        Seq("l_returnflag"), "l_quantity"))
    quantiles(merge(halves), Seq("l_returnflag"), F30Qs)
      .select(col("l_returnflag"), col("q"),
        round(col("estimate"), 6).as("estimate"))
  }

  /** Spark-arithmetic twin of [[bucketOf]]/the estimate, used to
    * build the oracle's inline mapping (and spec-pinned against the
    * live Spark expressions on the full 1..50 domain). */
  private[graft] def bucketOfInt(x: Int,
      alpha: Double = DefaultAlpha): Int =
    if (x > 0)
      math.ceil(java.lang.Math.log(x.toDouble) /
        java.lang.Math.log(gamma(alpha))).toInt
    else ZeroBucket

  private[graft] def estimateOf(b: Int,
      alpha: Double = DefaultAlpha): Double = {
    val g = gamma(alpha)
    val raw = if (b == ZeroBucket) 0.0
      else 2.0 * java.lang.Math.pow(g, b) / (g + 1)
    BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  lazy val f30Sql: String = {
    val mapRows = (1 to 50).map(x =>
      s"($x, ${bucketOfInt(x)}, ${estimateOf(bucketOfInt(x))}::DOUBLE)")
      .mkString(",\n         ")
    val qRows = F30Qs.map(q => s"(${q}::DOUBLE)").mkString(", ")
    s"""WITH map(x, qb, est) AS (VALUES
         $mapRows),
       qv(q) AS (VALUES $qRows),
       vc AS (SELECT l_returnflag, CAST(l_quantity AS INT) AS x,
                count(*) AS c
              FROM lineitem GROUP BY 1, 2),
       b AS (SELECT l_returnflag, qb, sum(c) AS c
             FROM vc JOIN map USING (x) GROUP BY 1, 2),
       cum AS (SELECT l_returnflag, qb,
                 sum(c) OVER (PARTITION BY l_returnflag ORDER BY qb) AS cum,
                 sum(c) OVER (PARTITION BY l_returnflag) AS n
               FROM b),
       sel AS (SELECT l_returnflag, q, min(qb) AS qb
               FROM cum CROSS JOIN qv
               WHERE cum >= ceil(q * n) GROUP BY 1, 2)
       SELECT sel.l_returnflag, sel.q, m.est AS estimate
       FROM sel JOIN (SELECT DISTINCT qb, est FROM map) m USING (qb)"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f30_quantile_sketch" -> (f30 _))

  val oracles: Map[String, String] = Map(
    "f30_quantile_sketch" -> f30Sql)

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
