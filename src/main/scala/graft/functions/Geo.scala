package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geo bucketing for the map-dashboard analog (SURVEY.md §1: Kibana
  * geo_point aggregation; the test tables carry no geo columns, so
  * this module is ScalaTest-covered only).
  *
  * Geohash encoding is the standard public algorithm (bit-interleaved
  * lat/lon, base32 alphabet) expressed as pure Column arithmetic —
  * per-precision-bit range halving, no UDF.
  */
object Geo {

  val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Geohash of (lat, lon) at `chars` precision (≤ 12). Bit i (0-based,
    * even = longitude) is the outcome of successive interval halving —
    * computed closed-form: bit = floor(frac · 2^(k+1)) mod 2 where
    * frac is the normalized coordinate and k the per-axis bit index. */
  def geohash(lat: Column, lon: Column, chars: Int = 6): Column = {
    require(chars >= 1 && chars <= 12, "precision 1..12")
    // clamp below 1.0 so +90/+180 fall in the last cell (the halving
    // convention) instead of wrapping the closed form to 0
    val latF = least((lat + 90.0) / 180.0, lit(1.0 - 1e-12))
    val lonF = least((lon + 180.0) / 360.0, lit(1.0 - 1e-12))
    val chunks = (0 until chars).map { c =>
      val v = (0 until 5).map { b =>
        val i = c * 5 + b // global bit index, MSB-first
        val axisF = if (i % 2 == 0) lonF else latF
        val k = i / 2 // per-axis bit index
        val bit = floor(axisF * pow(lit(2.0), lit(k + 1))).cast("long") % 2
        bit.cast("int") * (1 << (4 - b))
      }.reduce(_ + _)
      element_at(lit(Base32.toCharArray.map(_.toString)), v + 1)
    }
    concat(chunks: _*)
  }

  /** Bounding-box containment predicate. */
  def inBoundingBox(lat: Column, lon: Column,
      minLat: Double, maxLat: Double, minLon: Double, maxLon: Double): Column =
    lat >= minLat && lat <= maxLat && lon >= minLon && lon <= maxLon

  /** Haversine great-circle distance in kilometers. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(6371.0088) * lit(2.0) * asin(sqrt(a))
  }

  /** Map-dashboard bucketing: count per geohash cell — the geo_point
    * terms aggregation shape (one shuffle on the cell id). */
  def geohashBuckets(df: org.apache.spark.sql.DataFrame, lat: String,
      lon: String, chars: Int = 5): org.apache.spark.sql.DataFrame =
    df.groupBy(geohash(col(lat), col(lon), chars).as("cell"))
      .agg(count(lit(1)).as("n"))

  // =================================================================
  // Driver query face — the Kibana "Geo Map" panel
  // (kibana/dashboard_export.ndjson; poller.py:707-710 builds the
  // location geo_point). The test tables carry no geo columns, so
  // coordinates are synthesized deterministically from `customer`
  // (integer arithmetic, identical in the oracle SQL) — the same
  // convention f13b uses for items.
  // =================================================================

  /** Deterministic point frame: lat ∈ [-90, 90), lon ∈ [-180, 180)
    * derived from c_custkey with two coprime multipliers. */
  def g01Points(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    graft.Tables.customer(s, dir).select(
      (lit(-90.0) + (col("c_custkey") * 7919 % 18000) / 100.0).as("lat"),
      (lit(-180.0) + (col("c_custkey") * 104729 % 36000) / 100.0).as("lon"))

  def g01(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    geohashBuckets(g01Points(s, dir), "lat", "lon")

  /** The oracle replays the geohash closed form bit-for-bit: every
    * arithmetic step (normalize, clamp, floor(frac·2^(k+1)) mod 2,
    * base32 lookup) is the same IEEE-double expression DuckDB
    * evaluates, so the hash strings compare exactly. Generated
    * programmatically per precision bit. */
  private def geohashSqlChars(chars: Int): String =
    (0 until chars).map { c =>
      val v = (0 until 5).map { b =>
        val i = c * 5 + b
        val axis = if (i % 2 == 0) "lonf" else "latf"
        val p2 = math.pow(2.0, (i / 2) + 1) // exact power of two
        s"(CAST(floor($axis * $p2) AS BIGINT) % 2) * ${1 << (4 - b)}"
      }.mkString("(", " + ", ")")
      s"substr('$Base32', CAST($v AS INT) + 1, 1)"
    }.mkString(" || ")

  lazy val g01Sql: String =
    s"""WITH pts AS (SELECT
         -90.0 + (c_custkey * 7919 % 18000) / 100.0 AS lat,
         -180.0 + (c_custkey * 104729 % 36000) / 100.0 AS lon
       FROM customer),
       f AS (SELECT least((lat + 90.0) / 180.0, 1.0 - 1e-12) AS latf,
                    least((lon + 180.0) / 360.0, 1.0 - 1e-12) AS lonf
             FROM pts),
       g AS (SELECT ${geohashSqlChars(5)} AS cell FROM f)
       SELECT cell, count(*) AS n FROM g GROUP BY 1"""

  // =================================================================
  // g02: radius search — "everything within R km of a point" (the
  // map-dashboard drill-down / geo_distance filter analog). The scale
  // shape is the spatial candidate/verify pattern: a sargable
  // bounding-box prefilter (pure column comparisons — pushes to the
  // scan when coordinates are stored columns, prunes ~97% of the
  // globe here) followed by the exact haversine predicate on the
  // survivors. The bbox is widened to the circle's max-|lat| edge so
  // the longitude span stays conservative away from the equator.
  // =================================================================

  /** Madrid — the reference marketplace's home market. */
  val QLat = 40.42
  val QLon = -3.70
  val RadiusKm = 2000.0
  private val EarthR = 6371.0088

  /** Conservative bbox half-spans (degrees), computed once on the
    * driver and shipped identically to both engines. */
  val DLatDeg: Double = math.toDegrees(RadiusKm / EarthR)
  val DLonDeg: Double = math.toDegrees(
    RadiusKm / (EarthR * math.cos(math.toRadians(
      math.min(90.0, math.abs(QLat) + DLatDeg)))))

  private def pointsWithId(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    graft.Tables.customer(s, dir).select(
      col("c_custkey").as("cust_id"),
      (lit(-90.0) + (col("c_custkey") * 7919 % 18000) / 100.0).as("lat"),
      (lit(-180.0) + (col("c_custkey") * 104729 % 36000) / 100.0).as("lon"))

  def g02(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    pointsWithId(s, dir)
      .filter(inBoundingBox(col("lat"), col("lon"),
        QLat - DLatDeg, QLat + DLatDeg, QLon - DLonDeg, QLon + DLonDeg))
      .withColumn("dist_km",
        haversineKm(lit(QLat), lit(QLon), col("lat"), col("lon")))
      .filter(col("dist_km") <= RadiusKm)
      .select(col("cust_id"), col("lat"), col("lon"),
        round(col("dist_km"), 6).as("dist_km"))

  /** Token-for-token haversine replay (same association order as
    * [[haversineKm]]); bbox constants shipped as exact round-trip
    * string casts so the prefilter admits identical rows. */
  lazy val g02Sql: String = {
    def d(x: Double) = s"CAST('$x' AS DOUBLE)"
    val dist = s"""${d(EarthR)} * ${d(2.0)} * asin(sqrt(
         pow(sin(radians(lat - ${d(QLat)}) / 2), 2)
       + cos(radians(${d(QLat)})) * cos(radians(lat))
         * pow(sin(radians(lon - ${d(QLon)}) / 2), 2)))"""
    s"""WITH pts AS (SELECT c_custkey AS cust_id,
         -90.0 + (c_custkey * 7919 % 18000) / 100.0 AS lat,
         -180.0 + (c_custkey * 104729 % 36000) / 100.0 AS lon
       FROM customer),
       b AS (SELECT * FROM pts
             WHERE lat >= ${d(QLat - DLatDeg)} AND lat <= ${d(QLat + DLatDeg)}
               AND lon >= ${d(QLon - DLonDeg)} AND lon <= ${d(QLon + DLonDeg)}),
       h AS (SELECT cust_id, lat, lon, $dist AS dist_km FROM b)
       SELECT cust_id, lat, lon, round(dist_km, 6) AS dist_km
       FROM h WHERE dist_km <= ${d(RadiusKm)}"""
  }

  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame] =
    Map("g01_geo_buckets" -> (g01 _),
      "g02_geo_radius" -> (g02 _))

  val oracles: Map[String, String] = Map("g01_geo_buckets" -> g01Sql,
    "g02_geo_radius" -> g02Sql)
}
