package graft.operators

import graft.functions.TextSpecs
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's item-level risk engine, field-exact
  * (poller.calculate_risk_base, poller.py:333-495): spec extraction →
  * market-stats lookup with condition fallback → composite weighted-z
  * → heuristic points → clamp. Validated by RiskFidelitySpec, which
  * replays outputs pinned from RUNNING the reference.
  *
  * The market-stats JSON is parsed on the DRIVER (it is broadcast
  * configuration — the reference holds it as a process-global) and
  * joined as two broadcast lookup tables; everything per-item is
  * codegen'd column arithmetic. Works unchanged over a 100 TB item
  * table: one broadcast join per signal, no shuffle at all.
  */
object RiskEngine {

  /** WEIGHTS (poller.py:69-74). */
  val W = Map("cpu" -> 0.5, "gpu" -> 0.3, "ram" -> 0.1, "category" -> 0.1)

  case class SegStats(category: String, condition: String,
      mean: Double, stdev: Double, fallback: Boolean)
  case class CompStats(category: String, condition: String,
      compType: String, compName: String, mean: Double, stdev: Double)

  /** Parse market_stats.json (CATEGORY → CONDITION → {mean, stdev,
    * components{cpu|gpu|ram → NAME → {mean, stdev}}}) and resolve the
    * reference's condition fallback chain (poller.py:383-392:
    * NEW→LIKE_NEW→USED, LIKE_NEW→USED) into flat lookup rows keyed by
    * the REQUESTED condition. */
  def loadStats(path: String): (Seq[SegStats], Seq[CompStats]) = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(new java.io.File(path))
    val rawSegs = Map.newBuilder[(String, String), (Double, Double)]
    val rawComps = Map.newBuilder[(String, String), Seq[(String, String, Double, Double)]]
    root.properties().forEach { catEntry =>
      val cat = catEntry.getKey
      catEntry.getValue.properties().forEach { condEntry =>
        val n = condEntry.getValue
        // flat SECONDARY/UNCERTAIN nodes carry only {mean, count} and
        // are never scoring targets — skip anything without stdev
        if (n.has("stdev")) {
          rawSegs += (cat, condEntry.getKey) ->
            (n.get("mean").asDouble, n.get("stdev").asDouble)
          val comps = Seq.newBuilder[(String, String, Double, Double)]
          Option(n.get("components")).foreach { cn =>
            Seq("cpu", "gpu", "ram").foreach { t =>
              Option(cn.get(t)).foreach(_.properties().forEach { e =>
                comps += ((t, e.getKey,
                  e.getValue.get("mean").asDouble, e.getValue.get("stdev").asDouble))
              })
            }
          }
          rawComps += (cat, condEntry.getKey) -> comps.result()
        }
      }
    }
    resolveFallbacks(rawSegs.result(), rawComps.result())
  }

  /** Resolve the reference's condition-fallback chain over raw
    * (category, condition) stat entries. Shared by the JSON loader and
    * the generated-stats path. */
  def resolveFallbacks(
      rawSegs: Map[(String, String), (Double, Double)],
      rawComps: Map[(String, String), Seq[(String, String, Double, Double)]])
      : (Seq[SegStats], Seq[CompStats]) = {
    val segs = Seq.newBuilder[SegStats]
    val comps = Seq.newBuilder[CompStats]
    val conditions = Seq("NEW", "LIKE_NEW", "USED", "BROKEN")
    val categories = rawSegs.keys.map(_._1).toSeq.distinct
    categories.foreach { cat =>
      def node(c: String) = rawSegs.get((cat, c)).map(v => (c, v))
      conditions.foreach { reqCond =>
        val (resolved, fallback) = node(reqCond) match {
          case Some(n) => (Some(n), false)
          case None => reqCond match {
            case "NEW" => (node("LIKE_NEW").orElse(node("USED")), true)
            case "LIKE_NEW" => (node("USED"), true)
            case _ => (None, false)
          }
        }
        resolved.foreach { case (srcCond, (mean, stdev)) =>
          segs += SegStats(cat, reqCond, mean, stdev, fallback)
          rawComps.getOrElse((cat, srcCond), Seq.empty).foreach {
            case (t, name, m, sd) => comps += CompStats(cat, reqCond, t, name, m, sd)
          }
        }
      }
    }
    (segs.result(), comps.result())
  }

  /** Stats lookup from a generateMarketStats output frame — the
    * standalone path: the engine regenerates its own market stats and
    * scores against them, no reference JSON involved. The stats frame
    * is model metadata (categories × conditions × components), so the
    * collect is bounded and tiny. */
  def statsFromRows(statsRows: DataFrame): (Seq[SegStats], Seq[CompStats]) = {
    val rows = statsRows.collect()
    val rawSegs = rows.filter(r => r.getAs[String]("comp_type") == null &&
        r.getAs[String]("condition") != null)
      .map(r => (r.getAs[String]("category"), r.getAs[String]("condition")) ->
        (r.getAs[Double]("mean"), r.getAs[Double]("stdev"))).toMap
    val rawComps = rows.filter(_.getAs[String]("comp_type") != null)
      .groupBy(r => (r.getAs[String]("category"), r.getAs[String]("condition")))
      .map { case (k, rs) => k -> rs.toSeq.map(r =>
        (r.getAs[String]("comp_type"), r.getAs[String]("comp_name"),
          r.getAs[Double]("mean"), r.getAs[Double]("stdev")))
      }
    resolveFallbacks(rawSegs, rawComps)
  }

  /** Score against self-generated stats (the standalone pipeline:
    * generateMarketStats → scoreItemsWith). */
  def scoreItemsWith(items: DataFrame, statsRows: DataFrame): DataFrame = {
    val (segs, comps) = statsFromRows(statsRows)
    scoreItemsResolved(items, segs, comps)
  }

  /** Score an item table (item_id, title, description, price) against
    * a market-stats JSON. Output mirrors the reference's result dict:
    * risk_score, composite_z / estimated_value (rounded to 2 as the
    * reference rounds its output), factors, detected category /
    * condition / specs. */
  def scoreItems(items: DataFrame, statsJsonPath: String): DataFrame = {
    val (segs, comps) = loadStats(statsJsonPath)
    scoreItemsResolved(items, segs, comps)
  }

  private def scoreItemsResolved(items: DataFrame,
      segs: Seq[SegStats], comps: Seq[CompStats]): DataFrame = {
    val s = items.sparkSession
    import s.implicits._
    val segDf = segs.toDF("category", "condition", "seg_mean", "seg_stdev", "fallback")
    val compDf = comps.toDF("category", "condition", "comp_type", "comp_name",
      "c_mean", "c_stdev")

    val specced = TextSpecs.withSpecs(items, col("title"), col("description"))

    var df = specced.join(broadcast(segDf), Seq("category", "condition"), "left")
    for (t <- Seq("cpu", "gpu", "ram")) {
      val lookup = compDf.filter(col("comp_type") === t)
        .select(col("category").as(s"_${t}_cat"), col("condition").as(s"_${t}_cond"),
          col("comp_name").as(s"_${t}_name"),
          col("c_mean").as(s"${t}_mean"), col("c_stdev").as(s"${t}_stdev"))
      df = df.join(broadcast(lookup),
        col("category") === col(s"_${t}_cat") &&
          col("condition") === col(s"_${t}_cond") &&
          col(t) === col(s"_${t}_name"), "left")
        .drop(s"_${t}_cat", s"_${t}_cond", s"_${t}_name")
    }

    // weighted signals, in the reference's summation order:
    // cpu, gpu, ram, category (adding 0.0 for absent signals is an
    // exact identity, so FP results match the python loop bit-for-bit)
    def valid(t: String): Column = col(s"${t}_stdev").isNotNull && col(s"${t}_stdev") > 0
    def z(t: String): Column = (col("price") - col(s"${t}_mean")) / col(s"${t}_stdev")
    val segValid = col("seg_stdev").isNotNull && col("seg_stdev") > 0
    val segZ = (col("price") - col("seg_mean")) / col("seg_stdev")

    val wz = when(valid("cpu"), z("cpu") * W("cpu")).otherwise(0.0) +
      when(valid("gpu"), z("gpu") * W("gpu")).otherwise(0.0) +
      when(valid("ram"), z("ram") * W("ram")).otherwise(0.0) +
      when(segValid, segZ * W("category")).otherwise(0.0)
    val wp = when(valid("cpu"), col("cpu_mean") * W("cpu")).otherwise(0.0) +
      when(valid("gpu"), col("gpu_mean") * W("gpu")).otherwise(0.0) +
      when(valid("ram"), col("ram_mean") * W("ram")).otherwise(0.0) +
      when(segValid, col("seg_mean") * W("category")).otherwise(0.0)
    val tw = when(valid("cpu"), W("cpu")).otherwise(0.0) +
      when(valid("gpu"), W("gpu")).otherwise(0.0) +
      when(valid("ram"), W("ram")).otherwise(0.0) +
      when(segValid, W("category")).otherwise(0.0)

    // Stage the shared big expressions as NAMED columns: the final
    // select references finalZ/est many times, and re-inlined copies
    // of the whole join lineage per reference blow Catalyst's
    // optimization time from <1 s to ~30 s (same pathology as
    // TextSpecs.withSpecs staging).
    val staged = df
      .withColumn("_tw", tw)
      .withColumn("_z0", when(col("_tw") > 0, wz / col("_tw")).otherwise(0.0))
      .withColumn("_est0", when(col("_tw") > 0, wp / col("_tw")).otherwise(0.0))
      // NEW-fallback adjustment (poller.py:452-456): est +20%, z
      // rebased on the fallback node's stdev
      .withColumn("_adjust",
        col("fallback") && col("condition") === "NEW" && col("_tw") > 0)
      .withColumn("_est", when(col("_adjust"), col("_est0") * 1.2).otherwise(col("_est0")))
      .withColumn("_final_z", when(col("_adjust"),
        (col("price") - col("_est0") * 1.2) / coalesce(col("seg_stdev"), lit(100.0)))
        .otherwise(col("_z0")))

    val finalZ = col("_final_z")
    val est = col("_est")
    val price = col("price")
    val desc = col("description")
    val contact = desc.rlike("(?i)(whatsapp|6\\d{8})")
    val score =
      when(finalZ < -1.5, 30).otherwise(0) +
        when(finalZ < -2.5, 40).otherwise(0) +
        when(length(desc) < 30 && price > 200, 15).otherwise(0) +
        when(contact, 30).otherwise(0)

    val factors = filter(array(
      when(finalZ < -1.5, format_string("Statistically Cheap (Z=%.2f) [%s]",
        finalZ, col("condition"))),
      when(finalZ < -2.5, lit("EXTREME Price Anomaly")),
      when(length(desc) < 30 && price > 200, lit("Short Desc")),
      when(contact, lit("External Contact"))), _.isNotNull)

    // Python-round parity on the rounded output fields (see PyRound)
    def pyRound2(c: Column): Column = graft.plans.GraftFunctions.pyRound(s, c, 2)

    staged.select(
      col("item_id"), col("title"), price.as("price"),
      col("cpu"), col("ram"), col("gpu"),
      // symbolic price reports the sentinel category (poller.py:401)
      when(price < 5.0, "UNCERTAIN_PRICE").otherwise(col("category")).as("detected_category"),
      col("condition").as("detected_condition"),
      when(price < 5.0, 0.0).otherwise(pyRound2(finalZ)).as("composite_z"),
      when(price < 5.0, 0.0).otherwise(pyRound2(est)).as("estimated_value"),
      when(price < 5.0, 0).otherwise(least(score, lit(100))).as("risk_score"),
      when(price < 5.0, array(lit("Symbolic Price"))).otherwise(factors).as("risk_factors"))
  }

  /** The poller loop's pre-scoring data path (poller.py:595-612):
    * symbolic-price items get the hidden price recovered from the
    * text; items still under 1 with no correction are dropped; then
    * the risk engine runs on the effective price. Adds a `corrected`
    * flag like the reference's corrected_price. */
  def scorePipeline(items: DataFrame, statsRows: DataFrame): DataFrame = {
    val hidden = TextSpecs.extractHiddenPrice(col("title"), col("description"))
    val prepared = items
      .withColumn("_hidden", when(col("price") < 5.0, hidden))
      .withColumn("corrected", col("_hidden").isNotNull)
      .withColumn("price",
        when(col("corrected"), col("_hidden")).otherwise(col("price")))
      .filter(col("price") >= 1.0 || col("corrected"))
      .drop("_hidden")
    val (segs, comps) = statsFromRows(statsRows)
    scoreItemsResolved(prepared, segs, comps)
      .join(prepared.select(col("item_id"), col("corrected")), Seq("item_id"))
  }

  /** Driver query face (rows-only): synthesize a listing-shaped item
    * table from `part` (same construction as f11) and score it with
    * the reference's own market-stats file. Exact semantics are pinned
    * by RiskFidelitySpec. */
  def f12(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    scoreItems(f12Items(s, dir), "/root/reference/market_stats.json")

  // =================================================================
  // Market-stats GENERATION — the other half of the reference pipeline
  // (regex_analyzer.process_data, regex_analyzer.py:849-1022): items →
  // routed segments → per-(category, condition) price stats with
  // nested per-component stats. Output is the flat-row form of the
  // reference's market_stats.json tree; RiskFidelitySpec replays a
  // pinned corpus. One shuffle per aggregation level, all
  // combiner-friendly.
  // =================================================================

  /** Routing per the reference's loop (regex_analyzer.py:929-953):
    * JUNK dropped; UNCERTAIN (segment, or no cpu AND no ram — checked
    * BEFORE broken/accessory); BROKEN/ACCESSORY secondary; else PRIME.
    */
  def generateMarketStats(items: DataFrame): DataFrame = {
    val s = items.sparkSession
    import s.implicits._
    val withApi = Seq("api_condition" -> "string", "is_refurbished" -> "boolean")
      .foldLeft(items) { case (df, (c, t)) =>
        if (df.columns.contains(c)) df else df.withColumn(c, lit(null).cast(t))
      }
    // Cache boundary directly after extraction: the routing cascade
    // (route → segment → cond) references extraction columns that are
    // each single-use, so CollapseProject would re-inline the whole
    // regex-extraction tree into every routing branch (a 140 MB plan /
    // 152 MB task binaries when this boundary is absent). With the
    // cache, routing expressions sit on InMemoryRelation attributes.
    val specced = TextSpecs.withSpecs(withApi, col("title"), col("description")).cache()
    // condition here uses the RAW full text (process_data does not
    // sanitize/truncate for condition, unlike the spec extraction path)
    val rawFull = lower(concat(col("title"), lit(" "), col("description")))
    val routed = specced
      .withColumn("cond", TextSpecs.detectConditionWithApi(
        col("api_condition"), col("is_refurbished"), rawFull))
      .withColumn("segment", TextSpecs.marketSegment(
        lower(col("title")), col("price"), col("cond")))
      .withColumn("route",
        when(col("segment") === "JUNK", "JUNK")
          .when(col("segment") === "UNCERTAIN" ||
            (col("cpu").isNull && col("ram").isNull), "UNCERTAIN")
          .when(col("segment").isin("BROKEN", "ACCESSORY"), col("segment"))
          .otherwise("PRIME"))
      .filter(col("route") =!= "JUNK")
      // NOT cached: above the specced cache boundary the routing
      // expressions are small attribute arithmetic — recomputing them
      // per branch is cheaper than another materialization barrier

    def pyR(c: Column): Column = graft.plans.GraftFunctions.pyRound(s, c, 2)
    def sx(c: Column): Column = sum(c.cast("decimal(25,4)")).cast("double")
    def stdev(sxC: Column, sxxC: Column, n: Column): Column =
      sqrt((sxxC - sxC * sxC / n) / (n - 1))

    val prime = routed.filter(col("route") === "PRIME")
      .select(col("category"), col("cond"), col("price"),
        col("cpu"), col("ram"), col("gpu"))

    def statsOf(df: DataFrame, keys: Seq[String]): DataFrame = {
      val agg = df.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("count"), sx(col("price")).as("_sx"),
          sx(col("price") * col("price")).as("_sxx"))
        .filter(col("count") >= 2)
      val med = Fraud.groupMedian(df.select((keys.map(col) :+ col("price")): _*),
        keys, "price", "_med")
      agg.join(med, keys)
        .select(keys.map(col) :+
          pyR(col("_sx") / col("count")).as("mean") :+
          pyR(col("_med")).as("median") :+
          pyR(stdev(col("_sx"), col("_sxx"), col("count"))).as("stdev") :+
          col("count"): _*)
    }

    val segRows = statsOf(prime, Seq("category", "cond"))
      .select(col("category"), col("cond").as("condition"),
        lit(null).cast("string").as("comp_type"),
        lit(null).cast("string").as("comp_name"),
        col("mean"), col("median"), col("stdev"), col("count"))

    val compExploded = prime.select(col("category"), col("cond"), col("price"),
        explode(filter(array(
          struct(lit("cpu").as("t"), col("cpu").as("name")),
          struct(lit("ram").as("t"), col("ram").as("name")),
          struct(lit("gpu").as("t"), col("gpu").as("name"))),
          x => x("name").isNotNull)).as("c"))
      .select(col("category"), col("cond"),
        col("c.t").as("comp_type"), col("c.name").as("comp_name"), col("price"))
    val compRows = statsOf(compExploded,
        Seq("category", "cond", "comp_type", "comp_name"))
      .select(col("category"), col("cond").as("condition"),
        col("comp_type"), col("comp_name"),
        col("mean"), col("median"), col("stdev"), col("count"))

    val flat = routed.filter(col("route") =!= "PRIME")
      .groupBy(col("route"))
      .agg(count(lit(1)).as("count"), sx(col("price")).as("_sx"))
      .filter(col("count") > 3)
      .select(col("route").as("category"),
        lit(null).cast("string").as("condition"),
        lit(null).cast("string").as("comp_type"),
        lit(null).cast("string").as("comp_name"),
        pyR(col("_sx") / col("count")).as("mean"),
        lit(null).cast("double").as("median"),
        lit(null).cast("double").as("stdev"), col("count"))

    segRows.union(compRows).union(flat)
  }

  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] =
    Map("f12_score_items" -> (f12 _),
      "f13_generate_stats" -> ((s: org.apache.spark.sql.SparkSession, dir: String) =>
        generateMarketStats(f12Items(s, dir))))

  /** The f12 synthetic item table, reused as stats-generation input. */
  def f12Items(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val p = graft.Tables.part(s, dir)
    val title = concat(col("p_name"),
      when(col("p_partkey") % 5 === 0, lit(" macbook air m1 8gb"))
        .when(col("p_partkey") % 5 === 1, lit(" portatil gaming i7 rtx 3060 16gb ram"))
        .when(col("p_partkey") % 5 === 2, lit(" thinkpad i5 8gb"))
        .when(col("p_partkey") % 5 === 3, lit(" chromebook celeron 4gb nuevo precintado"))
        .otherwise(lit(" xps 13 i7 16gb")))
    val desc = when(col("p_partkey") % 7 === 0, lit("whatsapp 612345678"))
      .when(col("p_partkey") % 3 === 0, lit("impecable funciona perfecto sin detalles"))
      .otherwise(lit("portatil en buen estado funcionando correctamente"))
    p.select(col("p_partkey").as("item_id"), title.as("title"),
      desc.as("description"), col("p_retailprice").as("price"))
  }
}
