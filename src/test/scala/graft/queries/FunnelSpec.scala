package graft.queries

import java.sql.Timestamp

import graft.SparkSpec

/** Planted-event semantics for the step-wise conversion funnel. */
class FunnelSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel keeps in-window conversions and drops late or out-of-order steps") {
    import spark.implicits._
    val events = Seq(
      // user 1: converts — click 2h after first view, purchase 3h after click
      (1L, "view", ts("2024-01-01 08:00:00")),
      (1L, "click", ts("2024-01-01 10:00:00")),
      (1L, "purchase", ts("2024-01-01 13:00:00")),
      // user 2: click comes 30h after the view — outside the 1-day window
      (2L, "view", ts("2024-01-01 08:00:00")),
      (2L, "click", ts("2024-01-02 14:00:00")),
      (2L, "purchase", ts("2024-01-02 15:00:00")),
      // user 3: purchase precedes the click — wrong order, no conversion
      (3L, "view", ts("2024-01-01 08:00:00")),
      (3L, "purchase", ts("2024-01-01 09:00:00")),
      (3L, "click", ts("2024-01-01 10:00:00")),
      // user 4: two clicks in window — the FIRST one anchors the next step
      (4L, "view", ts("2024-01-01 08:00:00")),
      (4L, "click", ts("2024-01-01 09:00:00")),
      (4L, "click", ts("2024-01-01 20:00:00")),
      (4L, "purchase", ts("2024-01-02 08:30:00")))  // 23.5h after first click
      .toDF("user_id", "event_type", "ts")
    val out = Relational.funnelSteps(events, Seq("view", "click", "purchase"), "INTERVAL 1 DAY")
      .orderBy("user_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 4L))
    val u4 = out.find(_.getLong(0) == 4L).get
    assert(u4.getTimestamp(2) === ts("2024-01-01 09:00:00")) // first click anchors
  }

  test("a user missing a middle step never converts") {
    import spark.implicits._
    val events = Seq(
      (9L, "view", ts("2024-01-01 08:00:00")),
      (9L, "purchase", ts("2024-01-01 09:00:00")))
      .toDF("user_id", "event_type", "ts")
    val out = Relational.funnelSteps(events, Seq("view", "click", "purchase"), "INTERVAL 1 DAY")
    assert(out.count() === 0L)
  }
}
