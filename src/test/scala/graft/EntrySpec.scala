package graft

/** Guards the driver contract: entry() must return rows at sf0.001,
  * every query name has a runnable function, and every oracle key
  * names a real query. */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001 (driver smoke shape)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"orphan oracles: ${o -- q}")
  }

  test("every query runs and yields a non-empty schema at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf("sf0.001"))
      assert(df.schema.nonEmpty, s"$name has empty schema")
    }
  }
}
