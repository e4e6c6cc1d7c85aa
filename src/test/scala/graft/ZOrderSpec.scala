package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._

/** z01 Morton-curve semantics + the layout-locality promise. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue replays the sequential interleave reference row-for-row") {
    val pts = ZOrder.points(spark, sf("sf0.001"))
    val got = pts.select(col("x"), col("y"),
      ZOrder.zValue(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (x, y, z) =>
      assert(z == ZOrder.zValueRef(x, y), s"($x, $y)") }
  }

  test("zValue is injective on the bounded domain") {
    val pts = ZOrder.points(spark, sf("sf0.001")).distinct()
    val nPts = pts.count()
    val nZ = pts.select(ZOrder.zValue(col("x"), col("y"))).distinct().count()
    assert(nZ == nPts)
  }

  test("z-ordered files bound BOTH dimensions; x-sorted files do not") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val pts = ZOrder.points(spark, sf("sf0.001"))
    ZOrder.writeZOrdered(pts, col("x"), col("y"), s"$dir/z", files = 8)
    pts.repartitionByRange(8, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(s"$dir/x")
    def fileSpans(path: String): Seq[(Long, Long)] = {
      val files = new java.io.File(path).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.toString).toSeq
      files.map { f =>
        val r = spark.read.parquet(f)
          .agg(max(col("x")) - min(col("x")),
            max(col("y")) - min(col("y")))
          .as[(Long, Long)].head()
        r
      }
    }
    val zSpans = fileSpans(s"$dir/z")
    val xSpans = fileSpans(s"$dir/x")
    assert(zSpans.size == 8 && xSpans.size == 8)
    // x-sort prunes x perfectly (tiny per-file x-extent) but leaves
    // the y-extent near the full 36000 domain — a y-range predicate
    // hits every file. z-order bounds the y-extent of EVERY file
    // strictly below the loosest x-sorted file: y predicates prune.
    // (At sf0.001's 19 points/file the spans are sample-loose; the
    // ordering between the two layouts is the invariant.)
    assert(xSpans.forall(_._1 <= 18000 / 4), "x-sort should prune x")
    val worstZ = zSpans.map(_._2).max
    val bestX = xSpans.map(_._2).min
    assert(worstZ < bestX,
      s"every z file y-span ($worstZ) must beat the best x-sorted file ($bestX)")
    assert(zSpans.forall(_._2 <= 25000L), s"z y-spans: $zSpans")
  }

  test("z01 face: blocks cover all rows, bbox areas are tile-bounded") {
    val rows = ZOrder.z01(spark, sf("sf0.001"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length > 1)
    val total = Tables.customer(spark, sf("sf0.001")).count()
    assert(rows.map(_._2).sum == total)
    // a z-block is a 2^6 x 2^6 tile: the bbox can never exceed it
    rows.foreach { r => assert(r._7 <= 64L * 64L, s"block ${r._1}") }
  }
}
