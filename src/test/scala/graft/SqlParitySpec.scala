package graft

/** The SQL front door: `Tables.registerAll` + `spark.sql` must agree
  * with the DataFrame operators (one Catalyst underneath — this guards
  * the temp-view catalog path). */
class SqlParitySpec extends SparkSuiteBase {

  test("spark.sql over registered views matches DataFrame operators") {
    graft.sources.Tables.registerAll(spark, sf)
    val sqlCnt = spark.sql(
      """SELECT l_returnflag, count(*) AS cnt
        |FROM lineitem WHERE l_quantity > 30 GROUP BY l_returnflag""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dfCnt = graft.sources.Tables(spark, sf, "lineitem")
      .where(org.apache.spark.sql.functions.col("l_quantity") > 30)
      .groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sqlCnt === dfCnt)
  }

  test("events view exposes converted micros timestamps") {
    graft.sources.Tables.registerAll(spark, sf)
    val t = spark.sql("SELECT typeof(ts) FROM events LIMIT 1")
      .collect()(0).getString(0)
    assert(t === "timestamp")
  }
}
