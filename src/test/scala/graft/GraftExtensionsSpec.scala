package graft

class GraftExtensionsSpec extends SparkSuiteBase {

  test("fnv32a is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val got = spark.sql("SELECT fnv32a('foobar') AS h").collect()(0).getLong(0)
    assert(got === 0xbf9cf968L)
  }
}
