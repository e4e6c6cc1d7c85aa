package graft

import graft.operators.Relational
import java.sql.Timestamp

/** q18 funnel: strict step ordering on a hand-built event log — the
  * semantics an oracle can't independently confirm (the same SQL
  * mistake would hide on both engines). */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  test("q18: only strictly-ordered view -> click -> purchase converts") {
    val events = Seq(
      // user 1: full ordered funnel (view 1, click 3, purchase 5)
      (1L, "view", ts(1)), (1L, "click", ts(3)), (1L, "purchase", ts(5)),
      // user 2: click BEFORE any view — click must not count
      (2L, "click", ts(1)), (2L, "view", ts(2)), (2L, "purchase", ts(4)),
      // user 3: purchase before the click — purchase must not count
      (3L, "view", ts(1)), (3L, "purchase", ts(2)), (3L, "click", ts(3)),
      // user 4: view only
      (4L, "view", ts(9)),
      // user 5: second click is the anchor-eligible one; earliest
      // qualifying purchase is AFTER the first qualifying click
      (5L, "click", ts(1)), (5L, "view", ts(2)), (5L, "click", ts(4)),
      (5L, "purchase", ts(3)), (5L, "purchase", ts(6)))
      .toDF("user_id", "event_type", "ts")
    try {
      val r = Relational.funnel(events).collect().head
      assert(r.getLong(0) == 5L, "all five users viewed")
      // qualifying clicks: user 1 (3>1), user 3 (3>1), user 5 (4>2)
      assert(r.getLong(1) == 3L, s"users_click: ${r.getLong(1)}")
      // qualifying purchases: user 1 (5>3), user 5 (6>4)
      assert(r.getLong(2) == 2L, s"users_purchase: ${r.getLong(2)}")
      // convert time: user 1 view(1)->purchase(5) = 4 min, user 5
      // view(2)->purchase(6) = 4 min -> 8 min total in micros
      assert(r.getLong(5) == 8L * 60 * 1000000, s"total: ${r.getLong(5)}")
    } finally CacheRegistry.unpersistAll()
  }

  test("q19: cohort = first-signup week; pre-signup activity excluded") {
    def t(d: String) = Timestamp.valueOf(s"2026-01-$d 10:00:00")
    val events = Seq(
      // user 1 signs up Mon Jan 5 week; active that week and week+2
      (1L, "view", t("02")), // BEFORE signup: must not count anywhere
      (1L, "signup", t("06")), (1L, "click", t("07")),
      (1L, "view", t("20")), // Jan 19 week = +2
      // user 2: two signups — cohort is the FIRST (Jan 5 week)
      (2L, "signup", t("08")), (2L, "signup", t("15")),
      // user 3: never signs up — in no cohort
      (3L, "view", t("06")))
      .toDF("user_id", "event_type", "ts")
    try {
      val m = Relational.retention(events).collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3)))).toMap
      // one cohort (week of Jan 5), 2 users; week 0 active: both
      // (signup itself is activity); week 1: user 2's second signup;
      // week 2: user 1's view
      assert(m == Map(
        ("2026-01-05", 0L) -> ((2L, 2L)),
        ("2026-01-05", 1L) -> ((1L, 2L)),
        ("2026-01-05", 2L) -> ((1L, 2L))), s"got $m")
    } finally CacheRegistry.unpersistAll()
  }

  test("q30: the conversion window binds on each step, boundary inclusive") {
    val gapUs = 2L * 60 * 1000000 // 2 minutes
    val events = Seq(
      // user 1: click 2 min after the view — EXACTLY the gap, fires
      // (inclusive); purchase 1 min later, inside its window
      (1L, "view", ts(1)), (1L, "click", ts(3)), (1L, "purchase", ts(4)),
      // user 2: click 3 min after the view — outside, whole funnel dies
      (2L, "view", ts(1)), (2L, "click", ts(4)), (2L, "purchase", ts(5)),
      // user 3: click in window, purchase 3 min after the click — the
      // SECOND window binds independently
      (3L, "view", ts(1)), (3L, "click", ts(2)), (3L, "purchase", ts(5)))
      .toDF("user_id", "event_type", "ts")
    try {
      val r = Relational.funnel(events, Some(gapUs)).collect().head
      assert(r.getLong(0) == 3L)
      assert(r.getLong(1) == 2L, s"users_click: ${r.getLong(1)}") // 1, 3
      assert(r.getLong(2) == 1L, s"users_purchase: ${r.getLong(2)}") // 1
      // and the unbounded funnel converts all three — the window is
      // what drops users 2 and 3
      val u = Relational.funnel(events).collect().head
      assert(u.getLong(2) == 3L)
    } finally CacheRegistry.unpersistAll()
  }

  test("q29 core: hand-computed audience overlaps on planted events") {
    try {
      // X={1,2,3}, Y={2,3,4} (overlap 2, union 4), Z={9} disjoint;
      // duplicate (X,1) rows must not inflate the sets
      val ev = Seq(("X", 1L), ("X", 1L), ("X", 2L), ("X", 3L),
        ("Y", 2L), ("Y", 3L), ("Y", 4L), ("Z", 9L))
        .toDF("event_type", "user_id")
      val got = Relational.audienceOverlap(ev)
        .as[(String, String, Long, Long, Long, Double)].collect()
      assert(got.toSeq == Seq(("X", "Y", 3L, 3L, 2L, 0.5)),
        "only the overlapping pair appears; jaccard = 2/4")
    } finally CacheRegistry.unpersistAll()
  }
}
