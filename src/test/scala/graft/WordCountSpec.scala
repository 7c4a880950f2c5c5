package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** B3 word count — includes the reference's implicit golden answer over
  * its shipped sample input (reference source .dat files ⇒
  * {a:8, b:2, c:2, d:2, e:2}, FIXTURES.md §1). */
class WordCountSpec extends SparkSuiteBase {

  test("reference golden: source/*.dat replay") {
    import spark.implicits._
    // source/1.dat + 2.dat = a b c d e each, 3.dat = a*6 (one token/line)
    val lines = (Seq("a", "b", "c", "d", "e") ++ Seq("a", "b", "c", "d", "e")
      ++ Seq.fill(6)("a")).toDF("text")
    val got = lines
      .select(explode(TextOps.tokens(col("text"))).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 8L, "b" -> 2L, "c" -> 2L, "d" -> 2L, "e" -> 2L))
  }

  test("generic mapReduce entry point replays the reference golden") {
    import spark.implicits._
    import graft.operators.MapReduceOps
    val lines = (Seq("a", "b", "c", "d", "e") ++ Seq("a", "b", "c", "d", "e")
      ++ Seq.fill(6)("a")).toDS()
    // the reference's TestMap/TestReduce shapes, verbatim semantics:
    // map: line -> (token, 1) per whitespace token; reduce: sum
    val got = MapReduceOps.mapReduce[String, Long](lines, r = 2,
      line => line.toLowerCase.split("\\s+").filter(_.nonEmpty).map(_ -> 1L),
      _ + _).collect().toMap
    assert(got === Map("a" -> 8L, "b" -> 2L, "c" -> 2L, "d" -> 2L, "e" -> 2L))
  }

  test("mapReduce is partition-invariant: same result for any R") {
    import spark.implicits._
    import graft.operators.MapReduceOps
    val lines = (1 to 200).map(i => s"k${i % 7} v").toDS()
    def mr(r: Int) = MapReduceOps.mapReduce[String, Long](lines, r,
      l => l.split(" ").map(_ -> 1L), _ + _)
    def run(r: Int) = mr(r).collect().toMap
    val base = run(1)
    assert(run(4) === base && run(13) === base)
    // r really is the reduce-task count (one shuffle, exactly r tasks)
    assert(mr(4).rdd.getNumPartitions === 4)
    assert(mr(13).rdd.getNumPartitions === 13)
  }

  test("tokenizer drops empties and splits on all whitespace incl VT") {
    import spark.implicits._
    val df = Seq("  Hello\u000Bworld\t x ").toDF("text")
    val toks = df.select(expr(TextOps.TokensSql).as("t"))
      .collect()(0).getSeq[String](0)
    assert(toks === Seq("hello", "world", "x"))
  }

  test("q_wordcount counts sf0.001 corpus") {
    val rows = TextOps.wordCount(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(1)).sum > 0)
  }
}
