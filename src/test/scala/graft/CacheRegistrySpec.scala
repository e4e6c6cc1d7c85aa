package graft

/** Cache-lifetime hook: library-internal caches register themselves
  * and a host can bulk-unpersist at its query-face boundary, so
  * long-lived sessions running stats queries repeatedly don't
  * accumulate pins. */
class CacheRegistrySpec extends SparkSpec {

  test("sequential stats queries register caches; unpersistAll frees and recompute still works") {
    CacheRegistry.unpersistAll() // start clean of other suites' pins
    val r1 = operators.Fraud.f01(spark, sf()).collect()
    val n1 = CacheRegistry.registeredCount
    assert(n1 >= 1) // the value-counts state

    operators.RiskEngine.f13b(spark, sf()).collect()
    assert(CacheRegistry.registeredCount > n1) // routed frame + counts

    val freed = CacheRegistry.unpersistAll()
    assert(freed >= 2)
    assert(CacheRegistry.registeredCount == 0)

    // after the bulk unpersist the same query recomputes correctly
    // (and re-registers its state)
    val r2 = operators.Fraud.f01(spark, sf()).collect()
    assert(r2.map(_.toSeq).toSet == r1.map(_.toSeq).toSet)
    assert(CacheRegistry.registeredCount >= 1)
    CacheRegistry.unpersistAll()
  }
}
