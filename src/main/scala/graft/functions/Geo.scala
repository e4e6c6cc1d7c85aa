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
}
