package graft

import graft.functions.TextSpecs
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Full-fidelity spec-extraction semantics (Java-regex lookaheads etc.)
  * that the DuckDB oracle can't express (SURVEY.md §2 row 25, §4).
  * Reference behaviors: poller/regex_analyzer.py:108-663.
  */
class TextSpecsSpec extends SparkSpec {
  import spark.implicits._

  private def specsOf(title: String, desc: String): Row = {
    val df = Seq((title, desc)).toDF("title", "description")
    TextSpecs.withSpecs(df, col("title"), col("description"))
      .select("cpu", "ram", "gpu", "category", "condition")
      .head()
  }

  test("RAM negative lookahead rejects storage sizes") {
    val r = specsOf("portatil 16gb ram", "disco 512 gb ssd y 1000gb hdd")
    assert(r.getAs[String]("ram") == "16GB")
  }

  test("RAM accepts only plausible sizes, takes the max") {
    assert(specsOf("laptop 8gb o 16gb", "").getAs[String]("ram") == "16GB")
    assert(specsOf("laptop 13gb", "").getAs[String]("ram") == null) // not a real size
  }

  test("RE2-safe RAM twin (f11b core) == lookahead gear on the " +
      "rejection battery") {
    // the neutralize+scan twin must agree with the negative
    // lookahead wherever both are defined — storage suffixes with
    // every connector form the lookahead covers, mixed mentions,
    // plausibility filtering, caps
    val texts = Seq(
      "portatil 16gb ram",
      "disco 512 gb ssd y 1000gb hdd",
      "16gb ram y 512gb ssd",
      "32 gb de nvme",                    // storage → rejected
      "8gb, 512gb - ssd",                 // punctuation connector
      "64gb / hdd",                       // slash connector
      "24 gigas y 512 gigas de disco",
      "laptop 13gb",                      // implausible size
      "surface 48gb",
      "sin memoria mencionada")
    val df = texts.toDF("t").withColumn("t", lower(col("t")))
    val both = df.select(
      TextSpecs.ramFromScan(
        TextSpecs.ramScan(col("t"), lit(128))).as("lookahead"),
      TextSpecs.ramFromScan(
        TextSpecs.ramScanRe2(col("t"), lit(128))).as("re2"))
      .collect()
    both.zip(texts).foreach { case (r, t) =>
      assert(r.getAs[String]("lookahead") == r.getAs[String]("re2"),
        s"gears diverged on '$t'")
    }
  }

  test("SSD M.2 is not an Apple M2 CPU") {
    val r = specsOf("thinkpad con ssd m.2 de 1tb", "intel i5")
    assert(r.getAs[String]("cpu") == "INTEL I5")
    assert(r.getAs[String]("category") == "WORKSTATION")
    // reference quirk (regex_analyzer.py:609-624): "core i5" joins to
    // "corei5" and is dropped — only bare "i5" counts
    assert(specsOf("thinkpad ssd m.2", "intel core i5").getAs[String]("cpu") == null)
  }

  test("Apple M2 detected when genuine, vetoed by Intel/AMD presence") {
    assert(specsOf("macbook pro m2 max", "").getAs[String]("cpu") == "APPLE M2 MAX")
    // veto is per-text: an m2 WITH amd in the same text reads as AMD
    assert(specsOf("portatil m2 amd ryzen 5", "").getAs[String]("cpu") == "AMD RYZEN 5")
    // but title priority wins before the description is consulted
    // (regex_analyzer.py:752-760: specs_title.cpu short-circuits)
    assert(specsOf("portatil m2", "amd ryzen 5").getAs[String]("cpu") == "APPLE M2")
  }

  test("GPU model normalization inserts space and brand") {
    assert(specsOf("torre gaming rtx3080", "").getAs[String]("gpu") == "NVIDIA RTX 3080")
    assert(specsOf("pc con gtx 1660ti", "").getAs[String]("gpu") == "NVIDIA GTX 1660TI")
  }

  test("spam line truncation drops SEO keyword dumps") {
    val spam = "buen estado\nrtx gtx amd intel ryzen i7 ps5 xbox iphone\nintel i9 oculto"
    // everything from the spam line on is dropped, so i9 is never seen
    val r = specsOf("portatil basico", spam)
    assert(r.getAs[String]("cpu") == null)
  }

  test("category priority: title keywords beat generic text") {
    assert(specsOf("chromebook acer", "gaming top").getAs[String]("category") == "CHROMEBOOK")
    assert(specsOf("macbook air", "").getAs[String]("category") == "APPLE")
    // GAMING is skipped in the keyword loop (regex_analyzer.py:711-713):
    // only a literal "gaming" mention or a GPU triggers it
    assert(specsOf("portatil msi", "").getAs[String]("category") == "GENERICO")
    assert(specsOf("portatil gaming msi", "").getAs[String]("category") == "GAMING")
    assert(specsOf("lenovo yoga slim", "").getAs[String]("category") == "PREMIUM_ULTRABOOK")
  }

  test("GPU presence implies GAMING unless Quadro → WORKSTATION") {
    assert(specsOf("portatil rtx 4060", "").getAs[String]("category") == "GAMING")
  }

  test("chromebook RAM capped at 16GB") {
    val r = specsOf("chromebook 32gb", "tambien 8gb")
    assert(r.getAs[String]("ram") == "8GB")
  }

  test("chromebook i7 downgrades to Celeron when mentioned") {
    val r = specsOf("chromebook i7", "realmente celeron n4020")
    assert(r.getAs[String]("cpu") == "INTEL CELERON")
  }

  test("condition priority BROKEN > NEW > LIKE_NEW > USED") {
    assert(specsOf("portatil roto", "nuevo precintado").getAs[String]("condition") == "BROKEN")
    assert(specsOf("portatil", "nuevo precintado impecable").getAs[String]("condition") == "NEW")
    assert(specsOf("portatil", "impecable").getAs[String]("condition") == "LIKE_NEW")
    assert(specsOf("portatil", "va bien").getAs[String]("condition") == "USED")
  }

  test("API condition beats text (reference structured-field priority)") {
    val df = Seq(("as_good_as_new", "portatil roto")).toDF("api_cond", "text")
    val got = df.select(TextSpecs.detectConditionWithApi(
      col("api_cond"), lit(null), col("text")).as("c")).head().getString(0)
    assert(got == "LIKE_NEW")
  }

  test("hidden price: structured mention wins, loose range-filtered") {
    val df = Seq(
      ("vendo por 450 euros", "otros 9999 euros"),
      ("precio simbolico", "lo dejo en 300 euros"),
      ("sin nada", "30 euros de funda")) // loose < 50 rejected
      .toDF("title", "description")
    val got = df.select(TextSpecs.extractHiddenPrice(col("title"), col("description")).as("p"))
      .collect().map(r => Option(r.get(0)))
    assert(got(0).contains(450.0))
    assert(got(1).contains(300.0))
    assert(got(2).isEmpty)
  }

  test("market segment gate") {
    val df = Seq(
      (1.0, "portatil gaming", "USED"),
      (20000.0, "portatil", "USED"),
      (500.0, "portatil hp", "BROKEN"),
      (20.0, "funda de portatil", "USED"),
      (800.0, "portatil lenovo", "USED"))
      .toDF("price", "title", "cond")
    val got = df.select(TextSpecs.marketSegment(
      lower(col("title")), col("price"), col("cond")).as("s"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("UNCERTAIN", "JUNK", "BROKEN", "ACCESSORY", "PRIME"))
  }
}
