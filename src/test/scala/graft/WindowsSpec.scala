package graft

import graft.operators.Windows

class WindowsSpec extends SparkSuiteBase {

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
