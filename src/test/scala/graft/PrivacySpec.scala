package graft

import graft.operators.Privacy
import org.apache.spark.sql.functions._

/** c18 Laplace-mechanism semantics: the transform is the real
  * inverse CDF (hand-replayed), noise is nonzero, bounded by the
  * mechanism's worst case, and keyed only on the salted source. */
class PrivacySpec extends SparkSpec
    with org.scalatest.BeforeAndAfterEach {

  // suite convention: every cache-registering operator call is
  // released between tests so frames never accumulate in the shared
  // suite JVM (idempotent with the per-test try/finally blocks)
  override def afterEach(): Unit =
    try CacheRegistry.unpersistAll() finally super.afterEach()

  import spark.implicits._

  /** Scala replay of the derandomized mechanism for one key. */
  private def expectedNoise(key: String, eps: Double): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"dp:$key".getBytes("UTF-8"))
    val hex = d.take(8).map(b => f"$b%02x").mkString.take(15)
    val h = java.lang.Long.parseLong(hex, 16)
    val u = ((h % Privacy.UniformScale) + 0.5) / Privacy.UniformScale.toDouble
    val dd = u - 0.5
    -(1.0 / eps) * math.signum(dd) * math.log(1.0 - 2.0 * math.abs(dd))
  }

  test("noise matches the hand-replayed inverse-CDF transform") {
    val got = Seq("alpha", "beta", "gamma").toDF("k")
      .select(col("k"),
        Privacy.laplaceNoise(spark, col("k"), Privacy.Epsilon).as("noise"))
      .as[(String, Double)].collect().toMap
    Seq("alpha", "beta", "gamma").foreach { k =>
      assert(math.abs(got(k) - expectedNoise(k, Privacy.Epsilon)) < 1e-12, k)
      assert(got(k) != 0.0, s"$k noise degenerated to zero")
    }
  }

  test("c18 face: every count is perturbed, within the mechanism's range") {
    val rows = Privacy.c18(spark, sf("sf0.001"))
      .select("source", "n", "noisy_n")
      .as[(String, Long, Double)].collect()
    assert(rows.length == 20)
    // |noise| <= (1/eps) * ln(2^52) ≈ 36: the derandomized uniform's
    // worst case
    rows.foreach { case (src, n, noisy) =>
      assert(noisy != n.toDouble, s"$src unperturbed")
      assert(math.abs(noisy - n) <= 37.0, s"$src noise out of range")
    }
    // determinism: the release is a pure function of the key set
    val again = Privacy.c18(spark, sf("sf0.001"))
      .select("source", "n", "noisy_n")
      .as[(String, Long, Double)].collect()
    assert(rows.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("c25: the generalization ladder on a planted census, all levels") {
    // src A: (en 10) releases at level 2; (de 3, fr 2) pool to 5 < k=6
    //   -> fall through to the global remainder
    // src B: (en 4, de 3) pool to 7 >= 6 -> level 1 as (B, *)
    // src C: (en 2) -> remainder. Global remainder 5 + 2 = 7 >= 6
    //   -> level 0 as (*, *)
    def docs(rows: (String, String, Int)*) =
      rows.flatMap { case (s, l, n) => (1 to n).map(_ => (s, l)) }
        .zipWithIndex.map { case ((s, l), i) => (i.toLong, s, l) }
        .toDF("doc_id", "source", "lang")
    val d = docs(("A","en",10), ("A","de",3), ("A","fr",2),
      ("B","en",4), ("B","de",3), ("C","en",2))
    val got = Privacy.kAnonymize(d, k = 6)
      .as[(String, String, Long, Int)].collect().toSet
    assert(got == Set(("A","en",10L,2), ("B","*",7L,1), ("*","*",7L,0)))
    // every released row meets k; released docs cover the corpus
    assert(got.forall(_._3 >= 6) && got.toSeq.map(_._3).sum == 24)
    // total suppression: remainder below k is DROPPED, not leaked
    val d2 = docs(("A","en",10), ("C","en",2))
    val got2 = Privacy.kAnonymize(d2, k = 6)
      .as[(String, String, Long, Int)].collect().toSet
    assert(got2 == Set(("A","en",10L,2)))
    // k at-or-below the smallest group: everything at level 2
    val got3 = Privacy.kAnonymize(d, k = 2)
      .as[(String, String, Long, Int)].collect()
    assert(got3.forall(_._4 == 2) && got3.map(_._3).sum == 24)
  }

  test("c25 face: every release meets k and levels partition the residue") {
    val rows = Privacy.c25(spark, sf("sf0.001"))
      .as[(String, String, Long, Int)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._3 >= Privacy.AnonK))
    // generalized rows carry '*' exactly per level
    rows.foreach { case (s, l, _, lvl) =>
      if (lvl == 2) assert(s != "*" && l != "*")
      if (lvl == 1) assert(s != "*" && l == "*")
      if (lvl == 0) assert(s == "*" && l == "*")
    }
    // released docs never exceed the corpus (suppression only drops)
    val total = graft.Tables.documents(spark, sf("sf0.001")).count()
    assert(rows.map(_._3).sum <= total)
  }
}
