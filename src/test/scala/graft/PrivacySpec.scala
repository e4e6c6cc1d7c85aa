package graft

import graft.operators.Privacy
import org.apache.spark.sql.functions._

/** c18 Laplace-mechanism semantics: the transform is the real
  * inverse CDF (hand-replayed), noise is nonzero, bounded by the
  * mechanism's worst case, and keyed only on the salted source. */
class PrivacySpec extends SparkSpec {
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
}
