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

  test("c15: SCD2 intervals on a hand-built log — closure, tombstones, sentinel") {
    import spark.implicits._
    // key 1: put v0 -> put v2 -> delete v5  (two closed rows, none open)
    // key 2: put v0 only                    (one open row)
    // key 3: put v0 -> delete v1 -> put v2  (closed, then re-opened)
    val log = Seq(
      (1L, "a", 0L, "put"), (1L, "aa", 2L, "put"),
      (1L, null.asInstanceOf[String], 5L, "delete"),
      (2L, "b", 0L, "put"),
      (3L, "c", 0L, "put"), (3L, null.asInstanceOf[String], 1L, "delete"),
      (3L, "ccc", 2L, "put")
    ).toDF("doc_id", "text", "version", "op")
    val got = Upsert.scd2(log).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.size == 5, "tombstones must not emit rows")
    assert(got((1L, 0L)) == (2L, 0L, 1L)) // closed by the v2 put
    assert(got((1L, 2L)) == (5L, 0L, 2L)) // closed by the tombstone
    assert(got((2L, 0L)) == (Upsert.OpenVersion, 1L, 1L))
    assert(got((3L, 0L)) == (1L, 0L, 1L)) // closed by the tombstone
    assert(got((3L, 2L)) == (Upsert.OpenVersion, 1L, 3L)) // revived key open
  }

  test("c15 + c11 agree: current SCD2 rows == the latest-wins snapshot keys") {
    try {
      val docs = Tables.documents(spark, sf())
      val base = docs.select(col("doc_id"), col("text"), lit(0L).as("version"))
      val snapshot = Upsert.upsert(base, Upsert.updatesFor(docs))
        .select(col("doc_id"), col("version"))
      val current = Upsert.c15(spark, sf())
        .filter(col("is_current") === 1L)
        .select(col("doc_id"), col("valid_from").as("version"))
      // the history's open intervals must be EXACTLY the snapshot —
      // two independently-built views of the same log
      assert(current.exceptAll(snapshot).isEmpty &&
        snapshot.exceptAll(current).isEmpty,
        "open SCD2 intervals diverge from the c11 snapshot")
    } finally CacheRegistry.unpersistAll()
  }

  test("c26: every diff status classified and counted on a planted pair") {
    import graft.operators.Upsert
    val old = Seq((1L, "same"), (2L, "was-short"), (3L, "gone"))
      .toDF("doc_id", "text")
    val newer = Seq((1L, "same"), (2L, "is-longer-now"), (4L, "brand-new"))
      .toDF("doc_id", "text")
    val got = Upsert.corpusDiff(old, newer)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      "unchanged" -> ((1L, 0L)),
      "modified" -> ((1L, "is-longer-now".length.toLong - "was-short".length)),
      "removed" -> ((1L, -"gone".length.toLong)),
      "added" -> ((1L, "brand-new".length.toLong))))
    // NULL text is presence, not absence: (5, NULL) -> (5, "x") is a
    // modification, and NULL -> NULL is unchanged — never added
    val o2 = Seq((5L, null: String), (6L, null: String)).toDF("doc_id", "text")
    val n2 = Seq((5L, "x"), (6L, null: String)).toDF("doc_id", "text")
    val g2 = Upsert.corpusDiff(o2, n2)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(g2 == Map("modified" -> 1L, "unchanged" -> 1L))
  }
}
