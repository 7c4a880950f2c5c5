package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Text-analysis operators over the `documents` table.
  *
  * `wordCount` is the reference's flagship (and only proven) workload —
  * distributed word count (`/root/reference/test.go:13-71`): mapper
  * pre-aggregates counts per line (`test.go:15,22-25`), hash-buckets by
  * key (`test.go:77-81`), reducer sums partials (`test.go:51,58-65`).
  * Spark-first this is one declarative chain: the planner splits the
  * aggregation into partial (map-side combine) and final automatically,
  * and the shuffle replaces the reference's tmp-file exchange.
  */
object TextOps {

  /** Tokenization shared by wordcount / text stats / dedup: lowercase,
    * split on whitespace runs. Mirrors the reference's record model where
    * a token is a whole line (`test.go:22-25`) — generalized to whitespace
    * tokens for real documents. May contain empty strings at the text
    * boundaries; consumers filter post-explode (codegen-friendly relational
    * filter) or drop empties in their own array logic. */
  def tokens(text: Column): Column = split(lower(text), WsRun)

  /** Whitespace-run pattern spelled as an explicit character class so the
    * Java regex engine and the oracle's RE2 agree: Java's `\s` includes
    * vertical tab (U+000B); RE2's is exactly `[\t\n\f\r ]`. */
  val WsRun = "[ \\t\\n\\r\\f\\x0B]+"

  /** B3 q_wordcount: token → count, ordered for determinism.
    * The empty-token filter runs AFTER explode as a relational predicate so
    * the whole pipeline stays inside whole-stage codegen (an array-lambda
    * `filter()` would force interpreted per-row eval of the subtree). */
  def wordCount(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(explode(tokens(col("text"))).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("word")
}
