package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Ordered-funnel and cohort-retention semantics on planted fixtures. */
class BehaviorSuite extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  // u1 converts fully in order; u2 purchases BEFORE first view (ordered
  // funnel must not credit it); u3 views only; u4 clicks with no view.
  private lazy val events = Seq(
    (1L, ts(0), "view"), (1L, ts(10), "click"), (1L, ts(20), "purchase"),
    (2L, ts(5), "purchase"), (2L, ts(10), "view"), (2L, ts(15), "click"),
    (3L, ts(1), "view"),
    (4L, ts(2), "click")
  ).toDF("user_id", "ts", "event_type")

  test("funnelCounts: strictly-ordered stage semantics") {
    val out = Behavior.funnelCounts(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .as[(Int, String, Long)].collect().sortBy(_._1)
    assert(out === Seq(
      (1, "view", 3),     // u1, u2, u3
      (2, "click", 2),    // u1, u2 (u4 clicked but never viewed)
      (3, "purchase", 1))) // only u1 — u2's purchase preceded the view
  }

  test("funnelTimes: later stages are NULL after fallout; order enforced") {
    val t = Behavior.funnelTimes(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("user_id")
      .select("user_id", "t_view", "t_click", "t_purchase")
      .as[(Long, Option[Timestamp], Option[Timestamp], Option[Timestamp])]
      .collect()
    assert(t(0) === ((1L, Some(ts(0)), Some(ts(10)), Some(ts(20)))))
    assert(t(1) === ((2L, Some(ts(10)), Some(ts(15)), None))) // no 2nd buy
    assert(t(2) === ((3L, Some(ts(1)), None, None)))
    assert(t(3) === ((4L, None, None, None)))
  }

  test("retentionCohorts: offsets are whole weeks from the user's first event") {
    // 2020-01-06 is a Monday; day numbers via epoch-minute fixtures
    def at(day: Int, min: Int) = new Timestamp(
      Timestamp.valueOf("2020-01-06 00:00:00").getTime +
        day * 86400000L + min * 60000L)
    val ev = Seq(
      (1L, at(0, 10), "view"),  // cohort Mon wk0
      (1L, at(6, 0), "click"),  // day 6 → offset 0
      (1L, at(7, 0), "view"),   // day 7 → offset 1
      (2L, at(9, 0), "view"),   // cohort wk1 (Wed), offset 0
      (2L, at(15, 0), "view")   // 6 days later → offset 0 (not a week)
    ).toDF("user_id", "ts", "event_type")
    val out = Behavior.retentionCohorts(ev, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .select(col("cohort_week").cast("string"), col("week_offset"),
        col("n_users"))
      .as[(String, Long, Long)].collect()
    assert(out === Seq(
      ("2020-01-06", 0L, 1L), ("2020-01-06", 1L, 1L),
      ("2020-01-13", 0L, 1L)))
  }

  test("retentionCohorts raises on a NULL timestamp instead of emitting " +
      "a (cohort_week, NULL, user) retention cell") {
    val ev = Seq(
      (1L, Option(Timestamp.valueOf("2020-01-06 00:10:00"))),
      (1L, None: Option[Timestamp])).toDF("user_id", "ts")
    val e = intercept[Exception] {
      Behavior.retentionCohorts(ev, "user_id", "ts").collect()
    }
    assert(e.getMessage.contains("NULL in time column"), e.getMessage)
  }

  test("transitionCounts: per-user lag pairs, row-normalized probabilities") {
    val ev = Seq(
      (1L, ts(0), "a", 1L), (1L, ts(1), "b", 2L), (1L, ts(2), "a", 3L),
      (2L, ts(0), "b", 4L), (2L, ts(1), "a", 5L),
      (3L, ts(0), "a", 6L), (3L, ts(1), "c", 7L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val out = Behavior.transitionCounts(ev, "user_id", "ts", "event_type",
        "event_id")
      .orderBy("from_evt", "to_evt")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out === Seq(
      ("a", "b", 1L, 0.5), ("a", "c", 1L, 0.5), ("b", "a", 2L, 1.0)))
    // same-timestamp events order deterministically on event_id
    val tie = Seq(
      (1L, ts(0), "x", 2L), (1L, ts(0), "y", 1L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val t = Behavior.transitionCounts(tie, "user_id", "ts", "event_type",
      "event_id").collect()
    assert(t.length === 1 &&
      t.head.getString(0) === "y" && t.head.getString(1) === "x")
  }

  test("touchAttribution: strictly-preceding first/last view per purchase") {
    val ev = Seq(
      (1L, ts(0), "view", 1L), (1L, ts(5), "view", 2L),
      (1L, ts(10), "purchase", 3L), (1L, ts(15), "view", 4L),
      (1L, ts(20), "purchase", 5L),
      (2L, ts(0), "purchase", 6L) // converts with no prior touch
    ).toDF("user_id", "ts", "event_type", "event_id")
    val out = Behavior.touchAttribution(ev, "user_id", "ts", "event_type",
        "event_id", "view", "purchase")
      .collect().map(r => r.getLong(1) ->
        (Option(r.get(3)), Option(r.get(4)))).toMap
    val m = 60000000L // minutes → µs
    assert(out(3L) === ((Some(0L), Some(5L * m))))
    assert(out(5L) === ((Some(0L), Some(15L * m)))) // later view now counts
    assert(out(6L) === ((None, None)))
  }

  test("userGrowth: new vs active vs cumulative per day") {
    def day(d: Int, min: Long) = new Timestamp(
      (d.toLong * 1440 + min) * 60000L)
    val ev = Seq(
      (1L, day(0, 0)), (2L, day(0, 5)),  // day 0: users 1, 2 debut
      (1L, day(1, 0)), (3L, day(1, 5)),  // day 1: 3 debuts, 1 returns
      (2L, day(3, 0))                    // day 3: only a returnee
    ).toDF("user_id", "ts")
    val out = Behavior.userGrowth(ev, "user_id", "ts")
      .orderBy("day").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // (n_active, n_new, cum_users) per day
    assert(out === Seq((2L, 2L, 2L), (2L, 1L, 3L), (1L, 0L, 3L)))
  }

  test("funnel rides one user-keyed exchange (no sort, no join)") {
    val plan = Behavior.funnelCounts(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("BroadcastHashJoin"), plan)
    val exchanges = "Exchange hashpartitioning\\(user_id".r
      .findAllIn(plan).size
    assert(exchanges === 1, s"expected 1 user-keyed exchange:\n$plan")
  }
  test("funnelTimes handles stage names with dots (generated t_ columns " +
      "are backtick-quoted on read)") {
    val ev = Seq((1L, 10L, "view"), (1L, 20L, "cart.add"),
      (1L, 30L, "purchase.done"))
      .toDF("user_id", "ts", "event_type")
    val t = Behavior.funnelTimes(ev, "user_id", "ts", "event_type",
      Seq("view", "cart.add", "purchase.done")).collect().head
    assert(t.getAs[Long]("t_view") === 10L)
    assert(t.getAs[Long]("t_cart.add") === 20L)
    assert(t.getAs[Long]("t_purchase.done") === 30L)
    val c = Behavior.funnelCounts(ev, "user_id", "ts", "event_type",
      Seq("view", "cart.add", "purchase.done"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(c === Map("view" -> 1L, "cart.add" -> 1L, "purchase.done" -> 1L))
  }

}
