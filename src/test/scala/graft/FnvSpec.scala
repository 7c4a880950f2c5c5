package graft

import org.apache.spark.sql.functions.col
import graft.functions.Fnv32a

/** FNV-1a 32-bit — parity with the reference partitioner
  * (`/root/reference/test.go:77-81`) and with published FNV test
  * vectors. */
class FnvSpec extends SparkSuiteBase {

  // Published FNV-1a 32-bit vectors
  val vectors: Seq[(String, Long)] = Seq(
    "" -> 0x811c9dc5L,      // offset basis
    "a" -> 0xe40c292cL,
    "b" -> 0xe70c2de5L,
    "foobar" -> 0xbf9cf968L)

  test("interpreted eval matches known vectors") {
    vectors.foreach { case (s, want) =>
      assert(Fnv32a.hash(s.getBytes("UTF-8")) === want, s"fnv32a($s)")
    }
  }

  test("codegen path (DataFrame) matches interpreted eval") {
    import spark.implicits._
    val df = vectors.map(_._1).toDF("s")
      .select(col("s"), Fnv32a.fnv32a(col("s")).as("h"))
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    vectors.foreach { case (s, want) => assert(got(s) === want) }
  }

  test("null-safe: null input gives null hash") {
    import spark.implicits._
    val df = Seq(Some("a"), None).toDF("s")
      .select(Fnv32a.fnv32a(col("s")).as("h"))
    val rows = df.collect()
    assert(!rows(0).isNullAt(0) && rows(1).isNullAt(0))
  }
}
