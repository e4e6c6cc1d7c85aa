package graft

import graft.operators.RiskEngine
import org.apache.spark.sql.functions._

/** Replays market-stats generation expectations pinned from RUNNING
  * the reference's process_data (tools/stats_fidelity_gen.py →
  * statsgen_cases.json): same item corpus in, identical flat stat
  * rows out — routing (JUNK/UNCERTAIN/secondary/PRIME), min-support,
  * api-condition priority, and python-rounded mean/median/stdev. */
class StatsGenFidelitySpec extends SparkSpec {

  private def json(): String = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/statsgen_cases.json"), "UTF-8")
    try src.mkString finally src.close()
  }

  private def objects(section: String, doc: String): Seq[String] = {
    val start = doc.indexOf("\"" + section + "\":")
    val end = doc.indexOf("]", start)
    val body = doc.substring(start, end)
    """\{[^{}]*\}""".r.findAllIn(body).toSeq
  }

  private def str(obj: String, name: String): Option[String] = {
    val re = ("\"" + name + "\":\\s*(null|true|false|\"(?:[^\"\\\\]|\\\\.)*\")").r
    re.findFirstMatchIn(obj).flatMap(_.group(1) match {
      case "null" => None
      case "true" => Some("true")
      case "false" => Some("false")
      case q => Some(q.substring(1, q.length - 1))
    })
  }

  private def num(obj: String, name: String): Option[Double] = {
    val re = ("\"" + name + "\":\\s*(null|-?[0-9.eE+]+)").r
    re.findFirstMatchIn(obj).flatMap(m =>
      if (m.group(1) == "null") None else Some(m.group(1).toDouble))
  }

  test("stats generation matches the reference's process_data output") {
    import spark.implicits._
    val doc = json()
    val items = objects("items", doc).zipWithIndex.map { case (o, i) =>
      (i.toLong, str(o, "title").get, str(o, "description").getOrElse(""),
        num(o, "price").get, str(o, "api_condition").orNull,
        str(o, "is_refurbished").contains("true"))
    }.toDF("item_id", "title", "description", "price", "api_condition", "is_refurbished")

    val got = RiskEngine.generateMarketStats(items)
      .collect()
      .map(r => (
        r.getAs[String]("category"), Option(r.getAs[String]("condition")),
        Option(r.getAs[String]("comp_type")), Option(r.getAs[String]("comp_name")),
        Option(r.getAs[Any]("mean")).map(_.toString),
        Option(r.getAs[Any]("median")).map(_.toString),
        Option(r.getAs[Any]("stdev")).map(_.toString),
        r.getAs[Long]("count"))).toSet

    val expected = objects("expected", doc).map { o =>
      (str(o, "category").get, str(o, "condition"),
        str(o, "comp_type"), str(o, "comp_name"),
        num(o, "mean").map(_.toString), num(o, "median").map(_.toString),
        num(o, "stdev").map(_.toString), num(o, "count").get.toLong)
    }.toSet

    val missing = expected -- got
    val extra = got -- expected
    assert(missing.isEmpty && extra.isEmpty,
      s"\nmissing from spark: ${missing.mkString("\n  ", "\n  ", "")}" +
        s"\nunexpected from spark: ${extra.mkString("\n  ", "\n  ", "")}")
  }

  test("scorePipeline: hidden-price correction + sub-1€ drop before scoring") {
    import spark.implicits._
    val doc = json()
    val corpus = objects("items", doc).zipWithIndex.map { case (o, i) =>
      (i.toLong, str(o, "title").get, str(o, "description").getOrElse(""),
        num(o, "price").get, str(o, "api_condition").orNull,
        str(o, "is_refurbished").contains("true"))
    }.toDF("item_id", "title", "description", "price", "api_condition", "is_refurbished")
    val stats = RiskEngine.generateMarketStats(corpus)

    val probes = Seq(
      // symbolic price, real price recoverable from the text →
      // corrected and scored at 300
      (1L, "macbook air m1 8gb simbolico", "precio real: 300 euros", 1.0),
      // symbolic, nothing recoverable, < 1 → dropped
      (2L, "portatil regalo", "sin precio en el texto", 0.0),
      // symbolic, nothing recoverable, but >= 1 → kept as symbolic
      (3L, "portatil simbolico", "sin menciones de dinero", 2.0),
      // normal item untouched
      (4L, "thinkpad i5 8gb", "portatil de empresa correcto", 200.0))
      .toDF("item_id", "title", "description", "price")

    val got = RiskEngine.scorePipeline(probes, stats).collect()
      .map(r => r.getAs[Long]("item_id") ->
        (r.getAs[Double]("price"), r.getAs[Boolean]("corrected"),
          r.getAs[String]("detected_category"))).toMap
    assert(!got.contains(2L)) // dropped
    assert(got(1L)._1 == 300.0 && got(1L)._2) // corrected to hidden price
    assert(got(3L) == ((2.0, false, "UNCERTAIN_PRICE"))) // stays symbolic
    assert(got(4L)._1 == 200.0 && !got(4L)._2)
  }

  test("end-to-end: generate stats then score probes — matches the reference doing the same") {
    import spark.implicits._
    val doc = json()
    val items = objects("items", doc).zipWithIndex.map { case (o, i) =>
      (i.toLong, str(o, "title").get, str(o, "description").getOrElse(""),
        num(o, "price").get, str(o, "api_condition").orNull,
        str(o, "is_refurbished").contains("true"))
    }.toDF("item_id", "title", "description", "price", "api_condition", "is_refurbished")
    val stats = RiskEngine.generateMarketStats(items)

    val probeObjs = objects("probes", doc)
    assert(probeObjs.size >= 5)
    val probes = probeObjs.map { o =>
      (num(o, "item_id").get.toLong, str(o, "title").get,
        str(o, "description").getOrElse(""), num(o, "price").get)
    }.toDF("item_id", "title", "description", "price")

    val got = RiskEngine.scoreItemsWith(probes, stats).collect()
      .map(r => r.getAs[Long]("item_id") -> (
        r.getAs[Int]("risk_score"),
        r.getAs[Double]("composite_z"),
        r.getAs[Double]("estimated_value"),
        r.getAs[String]("detected_condition"))).toMap

    val failures = probeObjs.flatMap { o =>
      val id = num(o, "item_id").get.toLong
      val want = (num(o, "risk_score").get.toInt, num(o, "composite_z").get,
        num(o, "estimated_value").get, str(o, "detected_condition").get)
      if (got(id) == want) None
      else Some(s"probe $id: got ${got(id)} want $want")
    }
    assert(failures.isEmpty, failures.mkString("\n", "\n", ""))
  }
}
