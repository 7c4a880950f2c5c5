package graft

/** q_winnow_stats_indexed (round 13): the stats-grain staged serve
  * must equal the live winnowStats bit-for-bit — integer columns and
  * the double division round-trip identically through the artifact. */
class WinnowStatsIndexedSpec extends SparkSuiteBase {
  test("winnowStatsIndexed ≡ live winnowStats bit-for-bit") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    val live = graft.operators.TextOps.winnowStats(spark, sf)
      .collect().map(key).toSet
    val idx = graft.operators.TextOps.winnowStatsIndexed(spark, sf)
      .collect().map(key).toSet
    assert(idx === live)
    assert(live.nonEmpty)
  }
}
