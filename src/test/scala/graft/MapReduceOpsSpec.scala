package graft

import graft.operators.MapReduceOps
import graft.functions.NetQtyAggregator

class MapReduceOpsSpec extends SparkSuiteBase {

  test("fnv buckets are in [0, 8) and words are distinct") {
    val rows = MapReduceOps.fnvBuckets(spark, sf).collect()
    assert(rows.map(_.getString(0)).distinct.length === rows.length)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) < 8)
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 0xFFFFFFFFL)
    }
  }

  test("typed aggregator equals builtin expression aggregation") {
    import org.apache.spark.sql.functions._
    val typed = MapReduceOps.typedAgg(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val builtin = graft.sources.Tables(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(round(sum(col("l_quantity") * (lit(1) - col("l_discount"))), 2).as("x"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    typed.foreach { case (k, v) =>
      assert(math.abs(v - builtin(k)) < 0.011, s"flag $k: $v vs ${builtin(k)}")
    }
  }

  test("bigram explode emits size-1 docs nothing, n-1 bigrams otherwise") {
    import spark.implicits._
    val total = MapReduceOps.bigramCounts(spark, sf).collect()
      .map(_.getLong(1)).sum
    val wantTotal = graft.sources.Tables(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.expr(
        s"greatest(size(${graft.operators.TextOps.TokensSql}) - 1, 0)").as("n"))
      .collect().map(_.getInt(0).toLong).sum
    assert(total === wantTotal)
  }

  test("native Generator bigrams equal the typed-flatMap bigrams") {
    val viaFlatMap = MapReduceOps.bigramCounts(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaGen = MapReduceOps.bigramCountsNative(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaGen === viaFlatMap)
    // planner placed it as a Generate node (no typed SerializeFromObject)
    val plan = MapReduceOps.bigramCountsNative(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), s"plan:\n$plan")
    assert(!plan.contains("SerializeFromObject"), s"plan:\n$plan")
  }

  test("cogroup reconcile: both/one-sided keys classified; sums match a join reference") {
    val got = MapReduceOps.cogroupReconcile(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toMap
    import org.apache.spark.sql.functions._
    val o = graft.sources.Tables(spark, sf, "orders")
      .groupBy("o_orderkey").agg(count(lit(1)).as("no"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val l = graft.sources.Tables(spark, sf, "lineitem")
      .groupBy("l_orderkey").agg(count(lit(1)).as("nl"),
        sum(col("l_quantity").cast("long")).as("sq"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet === (o.keySet ++ l.keySet))
    got.foreach { case (k, (no, nl, sq, side)) =>
      assert(no === o.getOrElse(k, 0L))
      assert((nl, sq) === l.getOrElse(k, (0L, 0L)))
      val expectSide =
        if (o.contains(k) && l.contains(k)) "both"
        else if (o.contains(k)) "order_only" else "lines_only"
      assert(side === expectSide)
    }
  }
}
