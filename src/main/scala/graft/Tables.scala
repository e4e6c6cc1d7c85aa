package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema'd loaders for the driver-generated test tables
  * (TESTDATA.md). Each table is a single parquet file under the
  * scale-factor directory; at cluster scale these would be
  * directory-partitioned datasets — the loaders take any path Spark
  * can scan, so nothing here is single-file-specific.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.ts normalization — the generated parquet has carried two
    * physical types across driver revisions, both loaded here to one
    * logical shape (session-tz TIMESTAMP, microsecond precision):
    *
    *  - TIMESTAMP(NANOS), which Spark 4 rejects as a timestamp type:
    *    read as raw nanos (`nanosAsLong`) and truncate to micros —
    *    the same truncation DuckDB's epoch_us does. `div` keeps the
    *    arithmetic in Long (a double loses precision above 2^53 ns).
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4 reads
    *    as TIMESTAMP_NTZ: cast to TIMESTAMP. Every graft entry point
    *    pins spark.sql.session.timeZone=UTC, so the cast reinterprets
    *    the naive micros as epoch micros — exactly how DuckDB's
    *    epoch_us treats a naive timestamp, keeping oracle parity.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // The NTZ→TIMESTAMP cast below reinterprets naive micros in the
    // SESSION timezone; every graft entry point pins UTC, but an
    // external caller that doesn't would silently shift every
    // NTZ-sourced timestamp by the host offset. Fail fast instead.
    // Semantically-UTC aliases ("Etc/UTC", "GMT", "+00:00", "Z") are
    // accepted via ZoneId normalization — only a zone that would
    // actually shift the micros is rejected.
    val zone = s.conf.get("spark.sql.session.timeZone")
    val normalized =
      try Some(java.time.ZoneId.of(zone).normalized())
      catch { case _: java.time.DateTimeException => None }
    require(normalized.contains(java.time.ZoneOffset.UTC),
      s"Tables.events requires a UTC session timeZone, got '$zone' " +
        "(the NTZ branch reinterprets naive micros as epoch micros; " +
        "any other session zone silently shifts them)")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          raw("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
