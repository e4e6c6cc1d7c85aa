package graft

import graft.functions.Geo
import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Geo bucketing (SURVEY.md §1 geo-map row — no geo columns in the
  * test tables, so ScalaTest-only) and skew-mitigation utilities. */
class GeoSkewSpec extends SparkSpec {
  import spark.implicits._

  test("geohash matches known reference values") {
    // public reference points (standard geohash test vectors)
    val df = Seq(
      (57.64911, 10.40744, "u4pruydqqvj"), // Jutland
      (42.6, -5.6, "ezs42"),               // León
      (38.897, -77.036, "dqcjr")           // White House area
    ).toDF("lat", "lon", "expected")
    val got = df.select(col("expected"),
      Geo.geohash(col("lat"), col("lon"), 5).as("g")).collect()
    got.foreach { r =>
      assert(r.getString(1) == r.getString(0).take(5),
        s"expected ${r.getString(0).take(5)} got ${r.getString(1)}")
    }
  }

  test("geohash 11-char precision and edge coordinates") {
    val df = Seq((57.64911, 10.40744)).toDF("lat", "lon")
    val g = df.select(Geo.geohash(col("lat"), col("lon"), 11)).head().getString(0)
    assert(g == "u4pruydqqvj")
    val edges = Seq((90.0, 180.0), (-90.0, -180.0), (0.0, 0.0))
      .toDF("lat", "lon")
      .select(Geo.geohash(col("lat"), col("lon"), 6).as("g"))
      .collect().map(_.getString(0))
    assert(edges.forall(_.length == 6))
    assert(edges(0) == "zzzzzz") // north-east corner = last cell
  }

  test("bounding box + haversine") {
    val df = Seq((40.4168, -3.7038), (48.8566, 2.3522)).toDF("lat", "lon") // Madrid, Paris
    val inIberia = df.filter(Geo.inBoundingBox(col("lat"), col("lon"), 36, 44, -10, 4))
    assert(inIberia.count() == 1)
    val d = Seq((40.4168, -3.7038, 48.8566, 2.3522)).toDF("a", "b", "c", "d")
      .select(Geo.haversineKm(col("a"), col("b"), col("c"), col("d"))).head().getDouble(0)
    assert(d > 1020 && d < 1070) // Madrid–Paris ≈ 1053 km
  }

  test("g02: bbox prune is sound — equals brute-force haversine over all points") {
    // the prune's correctness property: the conservative bounding box
    // must never reject a point the exact predicate would keep
    val pts = Tables.customer(spark, sf("sf0.01")).select(
      col("c_custkey").as("cust_id"),
      (lit(-90.0) + (col("c_custkey") * 7919 % 18000) / 100.0).as("lat"),
      (lit(-180.0) + (col("c_custkey") * 104729 % 36000) / 100.0).as("lon"))
    val brute = pts.withColumn("dist",
        Geo.haversineKm(lit(Geo.QLat), lit(Geo.QLon), col("lat"), col("lon")))
      .filter(col("dist") <= Geo.RadiusKm)
      .select(col("cust_id")).collect().map(_.getLong(0)).toSet
    val pruned = Geo.g02(spark, sf("sf0.01"))
      .select(col("cust_id")).collect().map(_.getLong(0)).toSet
    assert(pruned == brute, s"prune changed the answer: ${brute -- pruned}")
    assert(brute.nonEmpty, "vacuous: no points in radius")
    // and the prune actually prunes (it's why the bbox exists)
    assert(brute.size < pts.count() / 10)
  }

  test("geohashBuckets groups nearby points into one cell") {
    val df = Seq(
      (40.4168, -3.7038), (40.4170, -3.7040), (40.4169, -3.7039), // Madrid cluster
      (48.8566, 2.3522)) // Paris
      .toDF("lat", "lon")
    val cells = Geo.geohashBuckets(df, "lat", "lon", chars = 5)
      .as[(String, Long)].collect().toMap
    assert(cells.size == 2)
    assert(cells.values.toSet == Set(3L, 1L))
  }

  test("saltedJoin equals plain join for inner and left") {
    val big = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i))
      .toDF("k", "v")
    val small = Seq(("hot", 99), ("k1", 1), ("absent", 0)).toDF("k", "w")
    val plainInner = big.join(small, Seq("k")).select("k", "v", "w")
      .as[(String, Int, Int)].collect().sorted.toSeq
    val saltedInner = Skew.saltedJoin(big, small, Seq("k"), salt = 8)
      .select("k", "v", "w").as[(String, Int, Int)].collect().sorted.toSeq
    assert(saltedInner == plainInner)

    val plainLeft = big.join(small, Seq("k"), "left")
      .select("k", "v", "w").as[(String, Int, Option[Int])].collect().sorted.toSeq
    val saltedLeft = Skew.saltedJoin(big, small, Seq("k"), salt = 8, "left")
      .select("k", "v", "w").as[(String, Int, Option[Int])].collect().sorted.toSeq
    assert(saltedLeft == plainLeft)
  }

  test("saltedJoin: hot-key scatter is real and survives AQE at weight") {
    // A salted join whose shards AQE quietly re-merges is theater at
    // scale. Two pins: (a) the join's shuffle keys INCLUDE the salt
    // column, so one hot key hashes into `salt` distinct reducer
    // buckets; (b) when shards carry real weight relative to AQE's
    // advisory partition size (the 100 TB condition, simulated by
    // advisory=1b so no shard is "small"), the post-AQE read keeps the
    // hot key spread over many partitions, where the plain join pins
    // every hot row to ONE. AQE coalescing is size-targeted: it only
    // merges below-advisory shards, so at scale the scatter stands.
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.shuffle.partitions",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.parallelismFirst",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      // force the shuffle-join path: a broadcast join has no exchange
      // to salt (and needs no salting)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      // the 100 TB simulation: make every byte-bearing shard count as
      // "at weight" so coalescing behaves as it would on real shards.
      // parallelismFirst=true (the default) ignores the advisory size
      // and merges anything under minPartitionSize — at test scale
      // that folds ALL shards into one, which is exactly the
      // size-targeted behavior (tiny shards merge; big ones never do).
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1b")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1b")
      // key must be data-derived (non-foldable): a literal key would
      // constant-fold out of the join condition and the control join
      // below would not hash-partition on it at all
      val big = spark.range(0, 2000)
        .selectExpr("CASE WHEN id >= 0 THEN 'hot' ELSE 'cold' END AS k", "id AS v")
      val small = Seq(("hot", 1)).toDF("k", "w")
      val joined = Skew.saltedJoin(big, small, Seq("k"), salt = 8)

      val p = joined.queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning\\([^)]*_salt".r.findFirstIn(p).isDefined,
        s"join exchange does not partition on the salt column:\n${p.take(1500)}")

      // runtime: the single hot key's rows land in >= 4 distinct
      // post-AQE partitions (8 salts into 32 buckets — >= 4 distinct
      // even with hash collisions among salt values)...
      val saltedParts = joined.select(spark_partition_id().as("p"))
        .distinct().count()
      assert(saltedParts >= 4,
        s"salted hot key occupies only $saltedParts partitions")
      // ...where the plain shuffle join pins them all to ONE reducer
      val plainParts = big.join(small, Seq("k"))
        .select(spark_partition_id().as("p")).distinct().count()
      assert(plainParts == 1L,
        s"plain-join control landed in $plainParts partitions, expected 1")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("keyHistogram surfaces the hot key") {
    val big = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i))
      .toDF("k", "v")
    val top = Skew.keyHistogram(big, Seq("k"), topN = 1)
      .as[(String, Long)].head()
    assert(top == ("hot", 100L))
  }
}
