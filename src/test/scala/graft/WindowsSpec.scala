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
