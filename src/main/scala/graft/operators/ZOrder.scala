package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** z01: Z-order (Morton-curve) layout clustering — the
  * OPTIMIZE-ZORDER write pattern (Delta/Iceberg's multidimensional
  * clustering): interleave the bits of two bounded integer sort keys
  * so that range predicates on EITHER dimension prune files by their
  * parquet min/max footer stats. A single-column sort gives perfect
  * pruning on one dimension and none on the other; the Morton curve
  * bounds the x/y extent of every contiguous z-run, so both
  * dimensions prune.
  *
  * The interleave is pure integer Column arithmetic — an unrolled
  * per-bit fold of shifts/masks (the Geo.geohash generation pattern),
  * identical in the oracle SQL, BIGINT end-to-end: no UDF, no
  * doubles, codegen-friendly.
  *
  * The face profiles the curve itself (engine-portable): per z-block
  * (top bits of z), the row count and the x/y bounding box — whose
  * bounded spans ARE the pruning guarantee. The write path
  * (`writeZOrdered`) is repartitionByRange + sortWithinPartitions on
  * z: a total range partitioning over the curve, so each output file
  * covers one contiguous z-run. Scale: the range exchange samples z
  * (AQE-sized), the block profile is one combiner-friendly shuffle;
  * nothing driver-side.
  */
object ZOrder {

  /** Bits per dimension — 16 covers the g01 integer point cloud
    * (x < 18000, y < 36000 needs 16 bits). */
  val ZBits = 16

  /** Morton z-value of two non-negative ints, bit k of x → bit 2k,
    * bit k of y → bit 2k+1. */
  def zValue(x: Column, y: Column): Column =
    (0 until ZBits).map { k =>
      (shiftright(x, k).bitwiseAND(lit(1)) * (1L << (2 * k))) +
        (shiftright(y, k).bitwiseAND(lit(1)) * (1L << (2 * k + 1)))
    }.reduce(_ + _).cast("bigint")

  /** The same unrolled interleave as SQL, generated from one loop. */
  def zValueSql(x: String, y: String): String =
    (0 until ZBits).map { k =>
      s"((($x >> $k) & 1) * ${1L << (2 * k)} + " +
        s"(($y >> $k) & 1) * ${1L << (2 * k + 1)})"
    }.mkString("(", " + ", ")")

  /** Sequential reference for specs. */
  def zValueRef(x: Long, y: Long): Long =
    (0 until ZBits).foldLeft(0L) { (acc, k) =>
      acc | (((x >> k) & 1L) << (2 * k)) | (((y >> k) & 1L) << (2 * k + 1))
    }

  /** The g01 deterministic integer point cloud, kept in integers
    * (the lat/lon scaling never happens — z-order wants the raw
    * bounded ints). */
  def points(s: SparkSession, dir: String): DataFrame =
    graft.Tables.customer(s, dir).select(
      (col("c_custkey") * 7919 % 18000).cast("bigint").as("x"),
      (col("c_custkey") * 104729 % 36000).cast("bigint").as("y"))

  /** Per-z-block locality profile: count + x/y bounding box + its
    * area — the bounded spans a z-run guarantees (and a plain
    * single-column sort does not). Block = top bits of z (each block
    * is a 2^6 x 2^6 x/y tile at ZBits=16, shift 12). */
  val BlockShift = 12

  def blockProfile(pts: DataFrame): DataFrame =
    pts.select(col("x"), col("y"), zValue(col("x"), col("y")).as("z"))
      .groupBy(shiftright(col("z"), BlockShift).as("z_block"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
      .withColumn("bbox_area",
        (col("max_x") - col("min_x") + 1) * (col("max_y") - col("min_y") + 1))

  def z01(s: SparkSession, dir: String): DataFrame =
    blockProfile(points(s, dir))

  val z01Sql: String =
    s"""WITH pts AS (SELECT
         CAST(c_custkey * 7919 % 18000 AS BIGINT) AS x,
         CAST(c_custkey * 104729 % 36000 AS BIGINT) AS y
       FROM customer),
       z AS (SELECT x, y, ${zValueSql("x", "y")} AS z FROM pts)
       SELECT z >> $BlockShift AS z_block, count(*) AS n,
         min(x) AS min_x, max(x) AS max_x,
         min(y) AS min_y, max(y) AS max_y,
         (max(x) - min(x) + 1) * (max(y) - min(y) + 1) AS bbox_area
       FROM z GROUP BY 1"""

  /** Z-order clustered write: total range partitioning over z, sorted
    * within each file — every output file covers one contiguous z-run
    * whose x/y footer stats are tight on BOTH dimensions. */
  def writeZOrdered(df: DataFrame, x: Column, y: Column, outDir: String,
      files: Int): Unit =
    df.withColumn("__z", zValue(x, y))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "z01_zorder" -> (z01 _))

  val oracles: Map[String, String] = Map(
    "z01_zorder" -> z01Sql)
}
