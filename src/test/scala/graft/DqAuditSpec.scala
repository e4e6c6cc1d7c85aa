package graft

import graft.operators.DqAudit

/** q27 constraint-audit semantics on hand-built tables. */
class DqAuditSpec extends SparkSpec {
  import spark.implicits._

  private def ordersDf(rows: Seq[(Long, Option[Double], String)]) =
    rows.toDF("o_orderkey", "o_totalprice", "o_orderstatus")

  private def lineitemDf(rows: Seq[(Long, Long, Double)]) =
    rows.toDF("l_orderkey", "l_partkey", "l_quantity")

  private def report(o: Seq[(Long, Option[Double], String)],
      l: Seq[(Long, Long, Double)]): Map[String, (Long, Long, Boolean)] =
    DqAudit.audit(ordersDf(o), lineitemDf(l))
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("clean tables: every constraint passes with zero violations") {
    val got = report(
      Seq((1L, Some(10.0), "O"), (2L, Some(20.0), "F")),
      Seq((1L, 7L, 5.0), (2L, 8L, 50.0), (2L, 9L, 1.0)))
    assert(got.size == 5)
    got.foreach { case (name, (_, viol, pass)) =>
      assert(viol == 0L && pass, name) }
    assert(got("not_null_o_totalprice")._1 == 2L)
    assert(got("fk_lineitem_orders")._1 == 3L)
  }

  test("each planted violation is caught with its exact count") {
    val got = report(
      Seq((1L, Some(10.0), "O"),
        (1L, Some(11.0), "O"),      // duplicate key (1 extra copy)
        (2L, None, "F"),            // null price
        (3L, Some(5.0), "X"),       // out-of-domain status
        (4L, Some(6.0), "P")),
      Seq((1L, 7L, 5.0),
        (2L, 8L, 0.0),              // below range
        (3L, 9L, 51.0),             // above range
        (99L, 10L, 2.0)))           // dangling FK
    assert(got("not_null_o_totalprice") == ((5L, 1L, false)))
    assert(got("unique_o_orderkey") == ((5L, 1L, false)))
    assert(got("domain_o_orderstatus") == ((5L, 1L, false)))
    assert(got("range_l_quantity_1_50") == ((4L, 2L, false)))
    assert(got("fk_lineitem_orders") == ((4L, 1L, false)))
  }

  test("q27 face: all five constraints present and non-vacuous") {
    val got = DqAudit.q27(spark, sf("sf0.001"))
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got.keySet == Set("not_null_o_totalprice", "unique_o_orderkey",
      "domain_o_orderstatus", "range_l_quantity_1_50", "fk_lineitem_orders"))
    // the plantings guarantee every constraint catches something
    got.foreach { case (name, viol) => assert(viol > 0L, name) }
  }
}
