package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 has one entry in
  * `queries`; the DuckDB-oracle SQL (when expressible) lives in
  * `oracleSql` under the same key with identical output column names.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * B3 q_wordcount — the reference's proven workload end-to-end. */
  def entry(spark: SparkSession): DataFrame =
    TextOps.wordCount(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_wordcount" -> ((s, dir) => TextOps.wordCount(s, dir))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver rows-only check. */
  def oracleSql: Map[String, String] = Map(
    "q_wordcount" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split_regex(lower(text), '[ \t\n\r\f\x0B]+')) AS word
        |      FROM documents)
        |WHERE length(word) > 0
        |GROUP BY word
        |ORDER BY word""".stripMargin
  )
}
