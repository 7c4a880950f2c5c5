package graft

import graft.operators.Windows

class WindowsSpec extends SparkSuiteBase {

  test("sessionize: strict-gap boundary — exactly prev+gap extends, +1µs breaks") {
    import spark.implicits._
    def ts(us: Long) = {
      val t = new java.sql.Timestamp(us / 1000)
      t.setNanos(((us % 1000000) * 1000).toInt)
      t
    }
    val gap = 60L * 1000000 // 1 minute
    val events = Seq(
      // user 1: 0, +gap (extends), +gap+1µs from there (breaks)
      (1L, ts(0L), 1L, 10.0),
      (2L, ts(gap), 1L, 20.0),
      (3L, ts(2 * gap + 1), 1L, 40.0),
      // user 2: single event
      (4L, ts(500L), 2L, 1.0))
      .toDF("event_id", "ts", "user_id", "value")
    val got = Windows.sessionize(events, gap).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got((1L, 1L)) === ((0L, 2L, 30.0)))          // events 1+2 merge
    assert(got((1L, 2L)) === ((2 * gap + 1, 1L, 40.0))) // event 3 breaks
    assert(got((2L, 1L)) === ((500L, 1L, 1.0)))
    assert(got.size === 3)
  }

  test("fill forward: purchase values carry; NULL before the first purchase") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val events = Seq(
      (1L, ts(10), 1L, "view", 0.0),
      (2L, ts(20), 1L, "purchase", 9.5),
      (3L, ts(30), 1L, "click", 0.0),     // carries 9.5
      (4L, ts(40), 1L, "purchase", 3.25),
      (5L, ts(50), 1L, "view", 0.0),      // carries 3.25
      (6L, ts(15), 2L, "click", 0.0))     // user 2 never purchases
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = graft.operators.Windows.fillForward(events).collect()
      .map(r => r.getLong(1) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(got(1L) === None)
    assert(got(2L) === Some(9.5) && got(3L) === Some(9.5))
    assert(got(4L) === Some(3.25) && got(5L) === Some(3.25))
    assert(got(6L) === None)
  }

  test("rank: at most 3 per customer, rank 1 is that customer's max price") {
    val rows = Windows.rankTopN(spark, sf).collect()
    val byC = rows.groupBy(_.getLong(0))
    byC.foreach { case (_, rs) =>
      assert(rs.length <= 3)
      val r1 = rs.minBy(_.getLong(3))
      assert(rs.forall(_.getDouble(2) <= r1.getDouble(2)))
    }
  }

  test("running total: per-customer prefix sums are monotone for positive prices") {
    val rows = Windows.runningTotal(spark, sf).collect()
    // prev_price null exactly once per customer (the first row)
    val nulls = rows.count(_.isNullAt(3))
    val nCust = rows.map(_.getLong(0)).distinct.length
    assert(nulls === nCust)
  }
}
