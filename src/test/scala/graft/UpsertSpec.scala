package graft

import graft.operators.Upsert
import org.apache.spark.sql.functions._

/** c11 latest-wins upsert: every merge rule exercised on a pinned
  * frame, plus the base-side-never-shuffled plan shape. */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("c11: puts replace, tombstones drop, later version overrides, inserts land") {
    val base = Seq(
      (1L, "one", 0L), (2L, "two", 0L), (3L, "three", 0L), (4L, "four", 0L))
      .toDF("doc_id", "text", "version")
    val updates = Seq(
      (1L, null.asInstanceOf[String], 1L, "delete"), // tombstone...
      (1L, "one-b", 2L, "put"), // ...overridden by a later put
      (2L, "two-b", 1L, "put"), // plain replace
      (3L, null.asInstanceOf[String], 1L, "delete"), // effective delete
      (5L, "five", 1L, "put")) // brand-new key
      .toDF("doc_id", "text", "version", "op")
    try {
      val got = Upsert.upsert(base, updates).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == Set(
        (1L, "one-b", 2L), // rule 1: v2 put beats v1 tombstone
        (2L, "two-b", 1L),
        (4L, "four", 0L), // untouched keeps base version
        (5L, "five", 1L)), s"got $got")
    } finally CacheRegistry.unpersistAll()
  }

  test("c11: base side flows through a broadcast anti join, no shuffle") {
    val docs = Tables.documents(spark, sf())
    val base = docs.select(col("doc_id"), col("text"), lit(0L).as("version"))
    try {
      val merged = Upsert.upsert(base, Upsert.updatesFor(docs))
      val plan = merged.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
        s"expected broadcast LeftAnti on the base side:\n$plan")
      // the base scan must not feed an Exchange (only the tiny update
      // batch may shuffle, for its per-key window)
      val rows = merged.count()
      val expectedGone = docs // tombstoned and NOT revived by rev3 (%20)
        .filter(col("doc_id") % 13 === 0 && col("doc_id") % 20 =!= 0).count()
      val inserts = docs.filter(col("doc_id") % 25 === 0).count()
      assert(rows == docs.count() - expectedGone + inserts,
        s"row accounting off: $rows")
    } finally CacheRegistry.unpersistAll()
  }
}
