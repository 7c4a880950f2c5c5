package graft

import org.apache.spark.sql.AnalysisException

class GraftExtensionsSpec extends SparkSuiteBase {

  test("fnv32a is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val got = spark.sql("SELECT fnv32a('foobar') AS h").collect()(0).getLong(0)
    assert(got === 0xbf9cf968L)
  }

  test("wrong arity is an analysis error, not a builder crash") {
    GraftExtensions.register(spark)
    val e0 = intercept[AnalysisException](spark.sql("SELECT fnv32a()"))
    assert(e0.getMessage.contains("fnv32a"))
    val e2 = intercept[AnalysisException](spark.sql("SELECT fnv32a('a', 'b')"))
    assert(e2.getMessage.contains("fnv32a"))
  }

  test("vector kernels are callable from SQL; binary arity enforced") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT dot_f64(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d,
        |       sqdist_f64(array(1.0D, 2.0D), array(4.0D, 6.0D)) AS s""".stripMargin)
      .collect()(0)
    assert(r.getDouble(0) === 32.0)
    assert(r.getDouble(1) === 25.0)
    val e = intercept[AnalysisException](spark.sql("SELECT dot_f64(array(1.0D))"))
    assert(e.getMessage.contains("dot_f64"))
    // exact integer kernel (the fixed-point q_kmeans distance)
    val i = spark.sql(
      "SELECT sqdist_i64(array(1L, 2L), array(4L, 6L)) AS s").collect()(0)
    assert(i.getLong(0) === 25L)
    // ragged arrays are NULL, same as the double kernels
    val ragged = spark.sql(
      "SELECT sqdist_i64(array(1L), array(1L, 2L)) AS s").collect()(0)
    assert(ragged.isNullAt(0))
  }

  test("poly_fingerprint is callable from SQL and matches the Column API") {
    GraftExtensions.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lower}
    val texts = Seq((1L, "The quick brown fox"), (2L, "ab"), (3L, ""))
    texts.toDF("doc_id", "text").createOrReplaceTempView("pf_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, poly_fingerprint(lower(text)).full_fp AS f,
        |       poly_fingerprint(lower(text)).win_fp AS w
        |FROM pf_docs ORDER BY doc_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val viaCol = texts.toDF("doc_id", "text")
      .withColumn("fp", graft.functions.PolyFingerprint.fp(lower(col("text"))))
      .select(col("doc_id"), col("fp.full_fp"), col("fp.win_fp"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(viaSql.toSeq === viaCol.toSeq)
    val e = intercept[AnalysisException](spark.sql("SELECT poly_fingerprint()"))
    assert(e.getMessage.contains("poly_fingerprint"))
  }

  test("bigrams generator works from SQL via LATERAL VIEW") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1L, "a b c"), (2L, "solo"), (3L, "x  y")).toDF("doc_id", "text")
      .createOrReplaceTempView("bg_docs")
    val got = spark.sql(
      """SELECT doc_id, bigram FROM bg_docs
        |LATERAL VIEW bigrams(text) g AS bigram
        |ORDER BY doc_id, bigram""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq((1L, "a b"), (1L, "b c"), (3L, "x y")))
  }
}
