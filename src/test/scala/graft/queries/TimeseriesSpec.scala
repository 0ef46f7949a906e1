package graft.queries

import java.sql.Timestamp

import graft.SparkSpec

/** Planted-series semantics for the B2 time-series smoothing/anomaly
  * surface: bounded-window EWMA and trailing-window z-score. */
class TimeseriesSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("ewma: constant series stays at the constant; head row equals its value") {
    import spark.implicits._
    val ev = (1 to 20).map(i =>
      (7L, i.toLong, ts(f"2024-01-01 08:${i}%02d:00"), 42.0))
      .toDF("user_id", "event_id", "ts", "value")
    val out = Relational.ewmaSeries(ev, 0.3, 8).collect()
    assert(out.length === 20)
    assert(out.forall(r => r.getDouble(3) === 42.0))
  }

  test("ewma: hand-computed two-row series, weights normalized at the head") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 08:00:00"), 10.0),
      (1L, 2L, ts("2024-01-01 08:01:00"), 20.0))
      .toDF("user_id", "event_id", "ts", "value")
    val out = Relational.ewmaSeries(ev, 0.3, 8)
      .orderBy("seq").collect()
    assert(out(0).getDouble(3) === 10.0) // head: only w0, normalizes away
    // row 2: (0.3*20 + 0.21*10) / 0.51 = 8.1 / 0.51
    assert(math.abs(out(1).getDouble(3) - 15.882353) < 1e-9)
  }

  test("ewma: recent observations dominate older ones") {
    import spark.implicits._
    // step from 0 to 100 at row 9: ewma must move most of the way up
    val ev = ((1 to 8).map(i => (2L, i.toLong, ts(f"2024-01-01 09:${i}%02d:00"), 0.0)) ++
      (9 to 12).map(i => (2L, i.toLong, ts(f"2024-01-01 09:${i}%02d:00"), 100.0)))
      .toDF("user_id", "event_id", "ts", "value")
    val out = Relational.ewmaSeries(ev, 0.3, 8).orderBy("seq").collect()
    val last = out.last.getDouble(3)
    assert(last > 75.0 && last < 100.0) // α=0.3, 4 rows at 100: 1-0.7^4 ≈ 0.76
  }

  test("aligned trend: offset-30 buckets split on the half hour, not the hour") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 08:20:00"), "click", 10.0),   // [07:30, 08:30)
      (2L, ts("2024-01-01 08:29:59"), "click", 20.0),   // [07:30, 08:30)
      (3L, ts("2024-01-01 08:30:00"), "click", 30.0),   // [08:30, 09:30)
      (4L, ts("2024-01-01 09:29:00"), "click", 40.0))   // [08:30, 09:30)
      .toDF("event_id", "ts", "event_type", "value")
    val out = Relational.alignedTrend(ev, offsetMinutes = 30).collect()
    assert(out.length === 2)
    assert(out(0).getTimestamp(0) === ts("2024-01-01 07:30:00") && out(0).getLong(2) === 2)
    assert(out(1).getTimestamp(0) === ts("2024-01-01 08:30:00") && out(1).getLong(2) === 2)
    assert(out(0).getDouble(3) === 30.0 && out(1).getDouble(3) === 70.0)
  }

  test("zscore: constant series yields null z and no anomalies") {
    import spark.implicits._
    val ev = (1 to 10).map(i =>
      ("m", i.toLong, ts(f"2024-01-01 08:${i}%02d:00"), 5.0))
      .toDF("event_type", "event_id", "ts", "value")
    val out = Relational.rollingZscore(ev, 3600000000L, 2.5).collect()
    assert(out.forall(_.isNullAt(5))) // zscore column
    assert(out.forall(!_.getBoolean(6))) // is_anomaly column
  }

  test("zscore: a planted spike against a flat-ish window is flagged; window slides") {
    import spark.implicits._
    val base = (1 to 30).map(i =>
      ("m", i.toLong, ts(f"2024-01-01 08:${i}%02d:00"), if (i % 2 == 0) 10.0 else 12.0))
    val spike = Seq(("m", 31L, ts("2024-01-01 08:31:00"), 500.0))
    val ev = (base ++ spike).toDF("event_type", "event_id", "ts", "value")
    val out = Relational.rollingZscore(ev, 3600000000L, 2.5)
      .orderBy("event_id").collect()
    val spikeRow = out.last
    assert(!spikeRow.isNullAt(5) && spikeRow.getDouble(5) > 2.5)
    assert(spikeRow.getBoolean(6))
    assert(out.init.forall(!_.getBoolean(6)))
    // events >1h before the spike are outside its frame: n for the spike row
    // counts only in-window rows (31 rows all within the hour here)
    assert(spikeRow.getLong(4) === 31L)
  }

  test("zscore: trailing frame excludes events older than the window") {
    import spark.implicits._
    val ev = Seq(
      ("m", 1L, ts("2024-01-01 06:00:00"), 1.0),
      ("m", 2L, ts("2024-01-01 08:00:00"), 2.0),
      ("m", 3L, ts("2024-01-01 08:30:00"), 3.0))
      .toDF("event_type", "event_id", "ts", "value")
    val out = Relational.rollingZscore(ev, 3600000000L, 2.5)
      .orderBy("event_id").collect()
    assert(out.map(_.getLong(4)).toSeq === Seq(1L, 1L, 2L)) // n per row
  }
}
