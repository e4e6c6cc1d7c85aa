package graft

import graft.operators.Sketch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** f27 HyperLogLog register semantics: sequential-reference replay,
  * the exact merge law, and both estimator branches. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  /** In-memory reference registers: the same 60-bit md5 prefix,
    * bucket = top 8 bits, rho = nlz of the 52-bit remainder + 1. */
  private def refRegisters(items: Seq[(String, String)]): Map[(String, Long), Int] =
    items.foldLeft(Map.empty[(String, Long), Int]) { case (acc, (src, term)) =>
      val h = graft.plans.Md5Prefix60.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(term))
      val bucket = h >>> Sketch.HllW
      val w = h & ((1L << Sketch.HllW) - 1)
      val rho =
        if (w == 0) Sketch.HllW + 1
        else Sketch.HllW + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      val k = (src, bucket)
      acc.updated(k, math.max(acc.getOrElse(k, 0), rho))
    }

  private def regMap(df: DataFrame): Map[(String, Long), Int] =
    df.as[(String, Long, Int)].collect()
      .map { case (s, b, r) => (s, b) -> r }.toMap

  test("fitRegisters replays the sequential reference register-for-register") {
    val items = (1 to 2000).map(i => (s"g${i % 3}", s"item_${i % 701}"))
    val got = regMap(Sketch.fitRegisters(items.toDF("source", "term")))
    assert(got == refRegisters(items))
  }

  test("merge law: max-union of half sketches == sketch of the union, exactly") {
    val a = (1 to 1500).map(i => ("g", s"a_$i"))
    val b = (1 to 1500).map(i => ("g", s"b_$i")) ++
      (1 to 500).map(i => ("g", s"a_$i")) // overlap
    val ra = Sketch.fitRegisters(a.toDF("source", "term"))
    val rb = Sketch.fitRegisters(b.toDF("source", "term"))
    val merged = regMap(ra.unionAll(rb)
      .groupBy(col("source"), col("bucket")).agg(max(col("r")).as("r")))
    val whole = regMap(Sketch.fitRegisters((a ++ b).toDF("source", "term")))
    assert(merged == whole)
  }

  test("harmonic branch: 5000 distinct estimated within 3x the HLL rse") {
    val items = (1 to 5000).map(i => ("g", s"u_$i"))
    val exact = Seq(("g", 5000L)).toDF("source", "exact_distinct")
    val row = Sketch.hllReport(Sketch.fitRegisters(items.toDF("source", "term")), exact)
      .as[(String, Long, Long, Long, Long, Double, Double)].collect().head
    val rse = 1.04 / math.sqrt(Sketch.HllM) // ~6.5% for m=256
    assert(math.abs(row._7) < 3 * rse,
      s"estimate ${row._6} err ${row._7} beyond 3x rse")
  }

  test("linear-counting branch: tiny cardinality is near-exact") {
    val items = (1 to 10).flatMap(i => Seq(("g", s"v_$i"), ("g", s"v_$i")))
    val exact = Seq(("g", 10L)).toDF("source", "exact_distinct")
    val row = Sketch.hllReport(Sketch.fitRegisters(items.toDF("source", "term")), exact)
      .as[(String, Long, Long, Long, Long, Double, Double)].collect().head
    // zeros > 0 and the scaled sum sits in the small-range regime,
    // so the linear-counting branch fires: m * ln(m / zeros)
    assert(row._4 > 0 && row._5 >= Sketch.SmallRangeThreshold)
    val expected = Sketch.HllM *
      math.log(Sketch.HllM.toDouble / row._4.toDouble)
    assert(math.abs(row._6 - expected) < 1e-4) // row._6 is round(·, 4)
    assert(math.abs(row._6 - 10.0) < 2.0)
  }

  // at sf0.001 the ~160 user-days/type sit in the linear-counting
  // regime; sf0.01+ (the oracle gate) exercises the harmonic branch
  test("f27 face: five event types, sane errors") {
    val rows = Sketch.f27(spark, sf("sf0.001"))
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
    assert(rows.map(_._1).toSet ==
      Set("view", "click", "purchase", "signup", "error"))
    rows.foreach { r =>
      assert(r._2 > 0)
      assert(math.abs(r._7) < 0.25, s"${r._1}: err ${r._7}")
    }
  }
}
