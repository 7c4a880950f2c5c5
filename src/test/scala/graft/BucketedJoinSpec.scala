package graft

import org.apache.spark.sql.functions._

/** Bucketing: the pre-shuffle co-location technique for repeated
  * fact ⋈ fact joins (SURVEY §2 scale notes). Writing both sides
  * bucketed by the join key lets the join run with ZERO exchanges —
  * at 100 TB this converts the dominant shuffle of every join on that
  * key into a one-time layout cost at write time. */
class BucketedJoinSpec extends SparkSuiteBase {

  test("join of tables bucketed on the key plans without a shuffle") {
    // managed tables land in the session's default warehouse; DROP TABLE
    // below removes their files (warehouse.dir is static config)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    graft.sources.Tables(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    graft.sources.Tables(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")
    // disable auto-broadcast so the shuffle-free claim is about bucketing
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      val want = graft.sources.Tables(spark, sf, "lineitem").count()
      assert(joined.count() === want) // every lineitem has its order
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("q_join_bucketed: declared join runs exchange-free on both sides") {
    import graft.operators.Joins
    // the join subtree over the staged bucketed tables must have NO
    // Exchange and NO Sort (bucketBy + sortBy cover both)
    val (ot, ct) = Joins.stagedBuckets(spark, sf)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table(ot)
        .join(spark.table(ct), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join side shuffles:\n$plan")
      // the per-task Sort over a single bucket's rows remains: Spark 3+
      // ignores bucket sortBy order at scan time unless the legacy conf
      // spark.sql.legacy.bucketedTableScan.outputOrdering is set
      // (SPARK-28632) — the scale claim here is the absent EXCHANGE
      assert(plan.contains("SelectedBucketsCount: 8 out of 8"),
        s"scan is not bucket-aware:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // and the full declared query agrees with the plain-join aggregate
    val got = Joins.bucketedJoin(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val want = graft.sources.Tables(spark, sf, "orders")
      .join(graft.sources.Tables(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("sum_price"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === want)
  }
}
