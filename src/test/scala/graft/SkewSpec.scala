package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSuiteBase {

  test("salted join equals plain join on a skewed key distribution") {
    import spark.implicits._
    // hot key: 9000 of 10000 rows share key 1
    val fact = spark.range(10000)
      .select(when(col("id") < 9000, 1L).otherwise(col("id")).as("k"),
        col("id").as("v"))
    val dim = Seq((1L, "hot"), (9500L, "cold"), (9999L, "cold2"))
      .toDF("k", "name")
    val plain = fact.join(dim, Seq("k"), "inner")
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val salted = Skew.saltedJoin(fact, dim, "k", salts = 8)
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted === plain)
    assert(plain("hot")._1 === 9000L)
  }

  test("q_skew_join equals the plain fact-dim join rollup") {
    val plain = graft.sources.Tables(spark, sf, "lineitem")
      .select(col("l_suppkey").as("s_suppkey"), col("l_quantity"))
      .join(graft.sources.Tables(spark, sf, "supplier")
        .select(col("s_suppkey"), col("s_nationkey").cast("long").as("s_nationkey")),
        Seq("s_suppkey"), "inner")
      .groupBy("s_nationkey")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = Skew.skewedJoin(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted === plain)
  }

  test("salted aggregation equals direct aggregation") {
    import spark.implicits._
    val df = spark.range(5000)
      .select((col("id") % 3).as("k"), col("id").cast("double").as("v"))
    val direct = df.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = Skew.saltedSumCount(df, "k", "v", salts = 8)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted.keySet === direct.keySet)
    salted.foreach { case (k, (s, c)) =>
      assert(c === direct(k)._2)
      assert(math.abs(s - direct(k)._1) < 1e-6)
    }
  }
}
