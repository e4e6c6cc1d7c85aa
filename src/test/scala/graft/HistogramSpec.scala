package graft

import graft.operators.Histogram
import graft.operators.Histogram.{bucket, bucketFrom}
import org.apache.spark.sql.functions._

/** ES range-agg / histogram semantics pinned beyond the driver's
  * DuckDB gate: half-open [from, to) edges, open-ended ranges, the
  * no-match drop, fixed-width bucketing and the heatmap share. */
class HistogramSpec extends SparkSpec {
  import spark.implicits._

  test("rangeLabel: half-open edges, open-ended top, no-match drop") {
    val ranges = Seq(bucket(0, 10, "a"), bucket(10, 20, "b"), bucketFrom(50, "c"))
    val got = Seq(-1.0, 0.0, 9.999, 10.0, 19.999, 20.0, 49.0, 50.0, 1e9)
      .toDF("v")
      .select(col("v"), Histogram.rangeLabel(col("v"), ranges).as("l"))
      .as[(Double, Option[String])].collect().toMap
    assert(got(-1.0).isEmpty)            // below every range
    assert(got(0.0).contains("a"))       // from-edge inclusive
    assert(got(9.999).contains("a"))
    assert(got(10.0).contains("b"))      // to-edge exclusive / next from
    assert(got(19.999).contains("b"))
    assert(got(20.0).isEmpty)            // gap between ranges drops
    assert(got(49.0).isEmpty)
    assert(got(50.0).contains("c"))      // open-ended from
    assert(got(1e9).contains("c"))
  }

  test("dashboard bucket lists: every exact boundary lands one bucket down") {
    // risk_score 100 is OUTSIDE the heatmap's [90, 100) top decade —
    // the real dashboard drops it too
    val risks = Seq(0, 9, 10, 99, 100).toDF("r")
      .select(col("r"), Histogram.riskDecadeLabel(col("r")).as("l"))
      .as[(Int, Option[String])].collect().toMap
    assert(risks(0).contains("0-10"))
    assert(risks(9).contains("0-10"))
    assert(risks(10).contains("10-20"))
    assert(risks(99).contains("90-100"))
    assert(risks(100).isEmpty)

    // riskDecadeLabel reproduces the dashboard's range list exactly
    val viaRanges = Histogram.rangeLabel(col("r"),
      (0 until 10).map(d => bucket(d * 10, d * 10 + 10, s"${d * 10}-${d * 10 + 10}")))
    val both = (0 to 100).toDF("r")
      .select(Histogram.riskDecadeLabel(col("r")).as("a"), viaRanges.as("b"))
      .filter(!(col("a") <=> col("b"))).count()
    assert(both == 0)
  }

  test("fixedWidthCounts equals a hand-rolled floor groupBy") {
    val df = (0 until 500).map(i => i * 3.7).toDF("v")
    val got = Histogram.fixedWidthCounts(df, col("v"), 100.0)
      .as[(Double, Long)].collect().toMap
    val expected = (0 until 500).map(i => math.floor(i * 3.7 / 100.0) * 100.0)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == expected)
  }

  test("heatmapShare: shares sum to 1 over matched cells only") {
    val df = Seq((5.0, 5), (5.0, 15), (15.0, 5), (200.0, 5), (5.0, 100))
      .toDF("x", "y") // (200, 5) x-drops; (5, 100) y-drops
    val ranges = Seq(bucket(0, 10, "lo"), bucket(10, 100, "hi"))
    val cells = Histogram.heatmapShare(df,
      Histogram.rangeLabel(col("x"), ranges),
      Histogram.riskDecadeLabel(col("y")))
      .as[(String, String, Long, Double)].collect()
    assert(cells.map(_._3).sum == 3) // only the 3 fully-matched rows
    assert(math.abs(cells.map(_._4).sum - 1.0) < 1e-12)
    assert(cells.forall(c => math.abs(c._4 - c._3 / 3.0) < 1e-12))
  }

  test("f38 top users: selection counts ALL records, sub-buckets drop " +
      "out-of-range, ties break by id") {
    // user 1: 3 events (one out-of-range) — top by total count even
    // though only 2 land in buckets; users 2 and 3 tie at 2 events
    // (id asc keeps 2 when n=2); user 4 has 1 event
    val ev = Seq(
      (1L, 10.0), (1L, 30.0), (1L, 150.0), // 150 drops from sub-buckets
      (2L, 10.0), (2L, 10.0),
      (3L, 85.0), (3L, 99.9),
      (4L, 50.0)).toDF("user_id", "value")
    val got = Histogram.topUsersByRisk(ev, col("user_id"), col("value"), n = 2)
      .orderBy("user_id", "risk_bucket")
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, "0-20", 1L),   // n_events counts the dropped 150 too
      (1L, 3L, "20-40", 1L),
      (2L, 2L, "0-20", 2L)))  // tie 2-vs-3 broken by user_id asc
  }
}
