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
}
