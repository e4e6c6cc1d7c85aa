package graft

import graft.operators.RiskEngine
import org.apache.spark.sql.functions._

/** Replays the risk-engine expectations pinned from RUNNING the
  * reference (tools/risk_fidelity_gen.py → risk_cases.json, computed
  * with the reference's own market_stats.json) through
  * RiskEngine.scoreItems — exact on score, rounded z / estimate,
  * factor strings, and detected category/condition/specs. */
class RiskFidelitySpec extends SparkSpec {

  private val StatsPath = "/root/reference/market_stats.json"

  private case class Case(itemId: Long, title: String, description: String,
      price: Double, riskScore: Int, factors: Seq[String],
      z: Double, est: Double, category: String, condition: String,
      cpu: Option[String], ram: Option[String], gpu: Option[String])

  private def loadCases(): Seq[Case] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/risk_cases.json"), "UTF-8")
    val json = try src.mkString finally src.close()
    val objRe = """\{[^{}]*\}""".r
    def str(obj: String, name: String): Option[String] = {
      val re = ("\"" + name + "\":\\s*(null|\"(?:[^\"\\\\]|\\\\.)*\")").r
      re.findFirstMatchIn(obj).flatMap(_.group(1) match {
        case "null" => None
        case q => Some(q.substring(1, q.length - 1)
          .replace("\\\"", "\"").replace("\\\\", "\\").replace("\\n", "\n"))
      })
    }
    def num(obj: String, name: String): Double = {
      val re = ("\"" + name + "\":\\s*(-?[0-9.eE+]+)").r
      re.findFirstMatchIn(obj).map(_.group(1).toDouble).get
    }
    def arr(obj: String, name: String): Seq[String] = {
      // factor strings may contain ']' — anchor the array end on the
      // following key instead of the first bracket
      val re = ("(?s)\"" + name + "\":\\s*\\[(.*?)\\]\\s*,\\s*\"composite_z\"").r
      re.findFirstMatchIn(obj).map(_.group(1).trim).filter(_.nonEmpty)
        .map(_.split("\",\\s*\"").toSeq
          .map(_.stripPrefix("\"").stripSuffix("\"")))
        .getOrElse(Seq.empty)
    }
    objRe.findAllIn(json).toSeq.map { o =>
      Case(num(o, "item_id").toLong, str(o, "title").get,
        str(o, "description").getOrElse(""), num(o, "price"),
        num(o, "risk_score").toInt, arr(o, "risk_factors"),
        num(o, "composite_z"), num(o, "estimated_value"),
        str(o, "detected_category").get, str(o, "detected_condition").get,
        str(o, "cpu"), str(o, "ram"), str(o, "gpu"))
    }
  }

  test("risk engine matches the reference on all pinned cases") {
    import spark.implicits._
    val cases = loadCases()
    assert(cases.size >= 20)
    val items = cases.map(c => (c.itemId, c.title, c.description, c.price))
      .toDF("item_id", "title", "description", "price")
    val got = RiskEngine.scoreItems(items, StatsPath).collect()
      .map(r => r.getAs[Long]("item_id") -> r).toMap
    val failures = cases.flatMap { c =>
      val r = got(c.itemId)
      val diffs = Seq(
        ("risk_score", r.getAs[Int]("risk_score").toString, c.riskScore.toString),
        ("composite_z", r.getAs[Double]("composite_z").toString, c.z.toString),
        ("estimated_value", r.getAs[Double]("estimated_value").toString, c.est.toString),
        ("factors", r.getAs[Seq[String]]("risk_factors").mkString("|"), c.factors.mkString("|")),
        ("category", r.getAs[String]("detected_category"), c.category),
        ("condition", r.getAs[String]("detected_condition"), c.condition),
        ("cpu", Option(r.getAs[String]("cpu")).getOrElse("-"), c.cpu.getOrElse("-")),
        ("ram", Option(r.getAs[String]("ram")).getOrElse("-"), c.ram.getOrElse("-")),
        ("gpu", Option(r.getAs[String]("gpu")).getOrElse("-"), c.gpu.getOrElse("-"))
      ).collect { case (f, a, e) if a != e => s"$f: got $a want $e" }
      if (diffs.isEmpty) None
      else Some(s"item ${c.itemId} '${c.title}': ${diffs.mkString("; ")}")
    }
    assert(failures.isEmpty, failures.mkString("\n", "\n", ""))
  }
}
