package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** f27: HyperLogLog distinct-cardinality census — the mergeable
  * "how many distinct active users" sketch (Flajolet et al. 2007;
  * the HLL every warehouse ships as approx_count_distinct). The
  * exact answer needs a corpus-wide shuffle of every distinct item;
  * the sketch needs 256 BIGINT
  * registers per group, and — because registers combine by MAX,
  * which is idempotent/commutative/associative — sketch(a ∪ b) ==
  * merge(sketch(a), sketch(b)) EXACTLY, the IncrementalStats
  * fold==recompute contract: a crawl delta updates the census with
  * no rescan of the base corpus.
  *
  * Engine-portable by construction (the house integer discipline):
  * the hash is the c02/c09/c14 60-bit md5 prefix, bucket = top 8
  * bits, and the register value rho = leading-zero count of the
  * 52-bit remainder + 1 is computed by an UNROLLED integer CASE
  * chain (never floor(log2(w)) — libm doubles at a power-of-two
  * boundary would flip a register). The harmonic-mean denominator
  * sum(2^-rho) is kept EXACT by scaling to 2^53: each term is the
  * BIGINT 1<<(53-rho), so the sum is order-independent integer
  * arithmetic; doubles appear only in the final one-shot estimate
  * division (deterministic IEEE ops on exact inputs). The raw-vs-
  * linear-counting branch compares SCALED INTEGERS (sum_scaled vs
  * a pinned threshold), so both engines take the same branch even
  * when the double estimate differs in the last ulp.
  *
  * Scale: one combiner-friendly (source, bucket) max-shuffle over
  * the token stream — repeated tokens collapse map-side because
  * max(rho) is computed per partition first; the register frame is
  * sources × 256 rows, driver-negligible at any corpus size. The
  * exact_distinct companion column (the accuracy witness the face
  * carries) is the expensive path the sketch replaces — kept in the
  * face because at sf it is cheap and it makes the estimate's error
  * auditable by the oracle, but the PRODUCTION artifact is
  * `fitRegisters` alone.
  */
object Sketch {

  /** log2(m) — 256 buckets, the standard 1.04/sqrt(256) ≈ 6.5% rse. */
  val HllP = 8
  val HllM: Int = 1 << HllP // 256
  /** remainder width: 60-bit hash minus the p bucket bits. */
  val HllW: Int = 60 - HllP // 52

  /** bitlen(w) for w in [0, 2^52): unrolled descending threshold
    * chain, k if 2^(k-1) <= w < 2^k, 0 for w == 0. */
  private def bitLen(w: Column): Column =
    ((HllW - 1) to 1 by -1)
      .foldLeft(when(w >= (1L << (HllW - 1)), HllW)) { (acc, k) =>
        acc.when(w >= (1L << (k - 1)), k)
      }
      .otherwise(0)

  /** The same chain as DuckDB SQL, generated from the same loop. */
  private def bitLenSql(w: String): String = {
    val branches = (HllW to 1 by -1)
      .map(k => s"WHEN $w >= ${1L << (k - 1)} THEN $k")
      .mkString(" ")
    s"CASE $branches ELSE 0 END"
  }

  /** Mergeable register artifact over any (source, term) stream:
    * (source, bucket, r) with r = max rho. Merge rule: union +
    * groupBy(source, bucket) max(r). */
  def fitRegisters(terms: DataFrame): DataFrame = {
    val s = terms.sparkSession
    val h = graft.plans.GraftFunctions.md5Prefix60(s, col("term"))
    val w = h.bitwiseAND(lit((1L << HllW) - 1))
    terms
      .select(col("source"), shiftright(h, HllW).as("bucket"),
        (lit(HllW + 1) - bitLen(w)).cast("int").as("rho"))
      .groupBy(col("source"), col("bucket"))
      .agg(max(col("rho")).as("r"))
  }

  /** Register union + the merge law: max per (source, bucket). */
  def mergeRegisters(frames: Seq[DataFrame]): DataFrame =
    frames.reduce(_ unionAll _)
      .groupBy(col("source"), col("bucket")).agg(max(col("r")).as("r"))

  /** Parquet register artifact (the lexicon convention: fit once,
    * merge deltas, never rescan the base). */
  def writeRegisters(registers: DataFrame, path: String): Unit =
    registers.write.mode("overwrite").parquet(path)

  def readRegisters(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)

  /** Internal: per-source state + the UNROUNDED estimate column `e`
    * (shared by the production estimate and the witnessed report so
    * err_frac rides the unrounded value, matching the oracle). */
  private def estimated(registers: DataFrame): DataFrame = {
    val m = HllM
    // alpha_m for m >= 128, pinned as string-cast doubles (c21 rule)
    val alpha = lit("0.7213").cast("double") /
      (lit(1.0) + lit("1.079").cast("double") / m)
    val agg = registers.groupBy(col("source"))
      .agg(count(lit(1)).as("buckets_used"),
        sum(expr(s"shiftleft(cast(1 as bigint), ${HllW + 1} - r)"))
          .cast("bigint").as("present_scaled"))
    // absent buckets carry rho = 0 => 2^-0 = 1 => 2^53 each, exactly
    val sumScaled = (col("present_scaled") +
      (lit(m.toLong) - col("buckets_used")) * (1L << (HllW + 1))).as("sum_scaled")
    val zeros = (lit(m.toLong) - col("buckets_used")).as("zeros")
    val withState = agg.select(col("source"), col("buckets_used"),
      zeros, sumScaled)
    // raw estimate: alpha * m^2 * 2^53 / sum_scaled. The 2.5m small-
    // range branch is decided on INTEGERS: raw <= 2.5m  <=>
    // sum_scaled >= alpha*m^2*2^53/(2.5m) — but alpha is a double, so
    // pin the threshold as the exact integer floor computed once here
    // (both engines inline the same literal).
    val raw = alpha * lit(m.toDouble * m) * lit((1L << (HllW + 1)).toDouble) /
      col("sum_scaled").cast("double")
    val est = when(col("sum_scaled") >= SmallRangeThreshold && col("zeros") > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / col("zeros").cast("double")))
      .otherwise(raw)
    withState.withColumn("e", est)
  }

  /** Production estimate from a register frame alone (no exact
    * witness — the thing the sketch exists to avoid computing). */
  def hllEstimate(registers: DataFrame): DataFrame =
    estimated(registers)
      .select(col("source"), col("buckets_used"), col("zeros"),
        col("sum_scaled"), round(col("e"), 4).as("hll_estimate"))

  /** Per-source estimate report from a register frame + the exact
    * distinct witness. */
  def hllReport(registers: DataFrame, exact: DataFrame): DataFrame =
    estimated(registers).join(exact, Seq("source"))
      .select(col("source"), col("exact_distinct"), col("buckets_used"),
        col("zeros"), col("sum_scaled"),
        round(col("e"), 4).as("hll_estimate"),
        round((col("e") - col("exact_distinct").cast("double")) /
          col("exact_distinct"), 4).as("err_frac"))

  /** Streaming census maintenance: each micro-batch's registers fold
    * into the generation-versioned state by the MAX merge law (the
    * maintainStats/maintainQuantiles pattern on foldBatchWith —
    * replay of a batch id overwrites its own generation, so the
    * at-least-once foreachBatch callback yields exactly-once state),
    * and the published estimate is re-derived from the merged
    * registers — no history rescan, ever. */
  def maintainHll(stream: DataFrame, stateDir: String, outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val merged = IncrementalStats.foldBatchWith(stateDir,
          fitRegisters(batch), id)(mergeRegisters)
        hllEstimate(merged).write.mode("overwrite").parquet(outDir)
      }
      .start()

  /** Integer branch threshold: sum_scaled values AT OR ABOVE this mean
    * the raw estimate is <= 2.5m (the linear-counting regime). Pinned
    * as a literal so both engines compare BIGINTs, never doubles. */
  val SmallRangeThreshold: Long = {
    val alpha = 0.7213 / (1.0 + 1.079 / HllM)
    // raw = alpha*m^2*2^53/sum <= 2.5m  <=>  sum >= alpha*m*2^53/2.5
    math.ceil(alpha * HllM * (1L << (HllW + 1)).toDouble / 2.5).toLong
  }

  /** The face stream: distinct active USER-DAYS per event type (the
    * canonical "distinct visitors" cardinality HLL was built for) —
    * item = `user_id:yyyy-MM-dd`, the q08 date idiom. ~1.6k distinct
    * per group at sf0.01 and ~16k at sf0.1, so the face exercises the
    * HARMONIC estimator branch (not just linear counting), with
    * per-group cardinalities that genuinely differ. */
  private def userDays(events: DataFrame): DataFrame =
    events.select(col("event_type").as("source"),
      concat(col("user_id").cast("string"), lit(":"),
        date_format(col("ts"), "yyyy-MM-dd")).as("term"))

  def f27(s: SparkSession, dir: String): DataFrame = {
    val t = userDays(Tables.events(s, dir))
      .transform(graft.CacheRegistry.register)
    val exact = t.groupBy(col("source"))
      .agg(countDistinct(col("term")).as("exact_distinct"))
    hllReport(fitRegisters(t), exact)
      .withColumnRenamed("source", "event_type")
  }

  val f27Sql: String = {
    val m = HllM
    val mask = (1L << HllW) - 1
    val scale = 1L << (HllW + 1)
    val alpha = s"(CAST('0.7213' AS DOUBLE)/(1 + CAST('1.079' AS DOUBLE)/$m))"
    raw"""WITH toks AS (SELECT event_type AS source,
               user_id || ':' || strftime(ts, '%Y-%m-%d') AS term
             FROM events),
       h AS (SELECT source,
               CAST(('0x' || substring(md5(term), 1, 15)) AS BIGINT) AS hv
             FROM toks),
       b AS (SELECT source, hv >> ${HllW} AS bucket,
               ${HllW + 1} - ${bitLenSql(s"(hv & $mask)")} AS rho
             FROM h),
       reg AS (SELECT source, bucket, max(rho) AS r FROM b GROUP BY 1, 2),
       agg AS (SELECT source, count(*) AS buckets_used,
                 CAST(sum(CAST(1 AS BIGINT) << (${HllW + 1} - r)) AS BIGINT)
                   AS present_scaled
               FROM reg GROUP BY 1),
       st AS (SELECT source, buckets_used,
                CAST($m - buckets_used AS BIGINT) AS zeros,
                CAST(present_scaled + ($m - buckets_used) *
                  CAST($scale AS BIGINT) AS BIGINT) AS sum_scaled
              FROM agg),
       ex AS (SELECT source, count(DISTINCT term) AS exact_distinct
              FROM toks GROUP BY 1),
       est AS (SELECT source, buckets_used, zeros, sum_scaled,
                 CASE WHEN sum_scaled >= $SmallRangeThreshold AND zeros > 0
                      THEN CAST($m AS DOUBLE) *
                           ln(CAST($m AS DOUBLE) / zeros)
                      ELSE $alpha * CAST($m AS DOUBLE) * $m *
                           CAST($scale AS DOUBLE) / CAST(sum_scaled AS DOUBLE)
                 END AS e
               FROM st)
       SELECT source AS event_type, exact_distinct, buckets_used, zeros,
         sum_scaled, round(e, 4) AS hll_estimate,
         round((e - CAST(exact_distinct AS DOUBLE)) / exact_distinct, 4)
           AS err_frac
       FROM est JOIN ex USING (source)"""
  }

  // =================================================================
  // f29: Count-Min sketch — the FREQUENCY twin of the HLL (Cormode &
  // Muthukrishnan 2005): per-key occurrence estimates from d=4 rows
  // of w=1024 BIGINT counters instead of a full per-key census.
  // Registers combine by SUM (the counters are linear), so
  // cms(a ∪ b) == register-sum(cms(a), cms(b)) exactly — a delta
  // folds in with no rescan, same contract as the HLL/lexicon.
  // Estimates are min over the d row counters: ALWAYS >= the true
  // count (one-sided error, the property the spec pins), within
  // e·N/w with probability 1 - e^-d. Integer end-to-end — hashes are
  // the salted 60-bit md5 prefix mod w, counters BIGINTs; no doubles
  // anywhere, so parity is trivial. Scale: one combiner-friendly
  // (row, bucket) shuffle over d× the stream (d=4 constant); the
  // register table is d·w rows total. Probes join registers on
  // (row, bucket) — register side broadcast-sized by construction.
  // =================================================================

  /** Count-Min depth (hash rows) and width (counters per row). */
  val CmsD = 4
  val CmsW = 1024

  private def cmsBucket(s: SparkSession, row: Column, key: Column): Column =
    pmod(graft.plans.GraftFunctions.md5Prefix60(s,
      concat(lit("cms"), row, lit(":"), key)), lit(CmsW.toLong))

  /** Mergeable CMS registers over any (key) frame: one counter row
    * per (row, bucket); absent cells are implicit zeros. */
  def cmsFit(keys: DataFrame): DataFrame = {
    val s = keys.sparkSession
    keys.select(col("key"), explode(lit((0 until CmsD).toArray)).as("row"))
      .select(col("row"), cmsBucket(s, col("row"), col("key")).as("bucket"))
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** SUM-merge — the CMS register law. */
  def cmsMerge(frames: Seq[DataFrame]): DataFrame =
    frames.reduce(_ unionAll _)
      .groupBy(col("row"), col("bucket")).agg(sum(col("cnt")).as("cnt"))

  /** Point estimates for a probe key frame: min over row counters. */
  def cmsEstimate(registers: DataFrame, probes: DataFrame): DataFrame = {
    val s = registers.sparkSession
    probes.select(col("key"), explode(lit((0 until CmsD).toArray)).as("row"))
      .select(col("key"), col("row"),
        cmsBucket(s, col("row"), col("key")).as("bucket"))
      .join(registers, Seq("row", "bucket"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_estimate"))
  }

  /** Streaming CMS maintenance — identical contract to
    * [[maintainHll]], with the SUM merge law: batch registers fold
    * into generation-versioned state, replay of a batch id
    * overwrites its own generation (exactly-once counters on an
    * at-least-once callback — the linearity of the counters is what
    * makes overwrite-not-refold the correct replay rule). */
  def maintainCms(stream: DataFrame, stateDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        IncrementalStats.foldBatchWith(stateDir, cmsFit(batch), id)(cmsMerge)
        ()
      }
      .start()

  /** The face: per-USER-DAY event-count estimates for a
    * deterministic probe subset (user_id % 13 == 0), exact witness
    * alongside, and the one-sided overestimate — never negative BY
    * CONSTRUCTION. The user-day domain (~1.6k keys at sf0.01, ~16k
    * at sf0.1) loads the 4×1024 registers past one key per cell, so
    * collisions — the thing the min-over-rows estimate exists to
    * survive — actually occur (an all-zero overestimate column would
    * prove nothing). */
  def f29(s: SparkSession, dir: String): DataFrame = {
    val keys = Tables.events(s, dir)
      .select(concat(col("user_id").cast("string"), lit(":"),
        date_format(col("ts"), "yyyy-MM-dd")).as("key"))
      .transform(graft.CacheRegistry.register)
    val registers = cmsFit(keys)
    val probes = keys
      .filter(split(col("key"), ":").getItem(0).cast("bigint") % 13 === 0)
      .distinct()
    val exact = keys.groupBy(col("key")).agg(count(lit(1)).as("exact_n"))
    cmsEstimate(registers, probes)
      .join(exact, Seq("key"))
      .select(col("key"), col("exact_n"), col("cms_estimate"),
        (col("cms_estimate") - col("exact_n")).as("overestimate"))
  }

  val f29Sql: String =
    raw"""WITH keys AS (SELECT user_id || ':' || strftime(ts, '%Y-%m-%d') AS key
                 FROM events),
       cells AS (SELECT key, row FROM keys
                 CROSS JOIN (SELECT unnest(range(0, $CmsD)) AS row)),
       hashed AS (SELECT key, row,
                    CAST(('0x' || substring(md5('cms' || row || ':' || key), 1, 15)) AS BIGINT) % $CmsW AS bucket
                  FROM cells),
       reg AS (SELECT row, bucket, count(*) AS cnt FROM hashed GROUP BY 1, 2),
       probes AS (SELECT DISTINCT key FROM keys
                  WHERE CAST(string_split(key, ':')[1] AS BIGINT) % 13 = 0),
       pcells AS (SELECT key, row,
                    CAST(('0x' || substring(md5('cms' || row || ':' || key), 1, 15)) AS BIGINT) % $CmsW AS bucket
                  FROM probes CROSS JOIN (SELECT unnest(range(0, $CmsD)) AS row)),
       est AS (SELECT p.key, min(coalesce(r.cnt, 0)) AS cms_estimate
               FROM pcells p LEFT JOIN reg r USING (row, bucket)
               GROUP BY 1),
       ex AS (SELECT key, count(*) AS exact_n FROM keys GROUP BY 1)
       SELECT key, exact_n,
         CAST(cms_estimate AS BIGINT) AS cms_estimate,
         CAST(cms_estimate - exact_n AS BIGINT) AS overestimate
       FROM est JOIN ex USING (key)"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f27_hll_users" -> (f27 _),
    "f29_cms_counts" -> (f29 _))

  val oracles: Map[String, String] = Map(
    "f27_hll_users" -> f27Sql,
    "f29_cms_counts" -> f29Sql)
}
